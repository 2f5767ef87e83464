#!/bin/bash
# Render ONE real 1920x1152 frame with the wavefront tracer and time the
# full .bin -> tiles -> model -> stitch -> EXR path through
# scripts/denoise.py (VERDICT r3 missing-item 3 / next-round item 6;
# reference protocol: /root/reference/scripts/denoise.py:138-165).
#
# The 08:17 attempt this window burned its 2400s timeout with zero tiles:
# root-caused to a tunnel wedge right after launch (the 08:17 probe
# failed), not to frame size — at 8 recorded + 8 gt spp a 135-tile frame
# costs ~0.7 s/tile device time at the corpus-measured rate. Scene index
# 200000 keeps the frame disjoint from the training seeds (the earlier
# attempt's default index 0 collided with train scene_00000).
#
# Usage: bash scripts/run_frame_e2e.sh   (TPU healthy, no other TPU user)
set -eu
cd "${REPO:-$(dirname "$0")/..}"
QDIR=${QDIR:-.qrun}
LOG=${LOG:-.hwlog}
CKPT=${CKPT:-$QDIR/ckpt}
mkdir -p "$LOG" results/r4_logs

if [ "$(ls "$QDIR/frame1080/scene_200000"/*.bin 2>/dev/null | wc -l)" \
     -ne 135 ]; then
    rm -rf "$QDIR/frame1080/scene_200000"
    timeout "${RENDER_TIMEOUT:-1800}" python \
        scripts/generate_training_data.py - - - "$QDIR/frame1080" \
        --renderer wavefront --count 1 --spp 8 --gt_spp 8 \
        --width 1920 --height 1152 --tile_size 128 --start_index 200000 \
        --obj_dir assets/objs --tex_dir assets/textures \
        --env_dir assets/envmaps >> "$LOG/datagen.log" 2>&1
fi
ls "$QDIR/frame1080/scene_200000"/*.bin | wc -l

timeout "${DENOISE_TIMEOUT:-1200}" python scripts/denoise.py \
    --input "$QDIR/frame1080" --checkpoint "$CKPT" \
    --output "$QDIR/frame1080_out.exr" --spp 4 --uniform_tiles \
    --tile_size 640x2048 --tile_pad 50x64 --verbose \
    > "$LOG/real_frame_1080.log" 2>&1
tail -5 "$LOG/real_frame_1080.log"
cp -f "$LOG/real_frame_1080.log" results/r4_logs/
