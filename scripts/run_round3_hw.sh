#!/bin/bash
# Unattended hardware-window driver (round 3).
#
# Converts any healthy TPU-tunnel window into the round-3 queue
# (VERDICT.md "Next round"), strictly serially (ONE TPU process at a
# time; memory: tpu-tunnel-behavior — a wedge heals only after 30+ min
# of COMPLETE idleness, so probes are short and sleeps long):
#
#   1. probe-wait
#   2. KPCN bench ladder              -> $LOG/bench_kpcn.json
#   3. corpus datagen (obj meshes + textures), resumable
#                                     -> $QDIR/train, $QDIR/test
#   4. variable-spp bench rungs 8/16/32 -> $LOG/bench_spp{N}.json
#   5. tpu_session: kernel validation + op ladder (exp2 A/B) + train
#      steps                          -> $LOG/tpu_session.log
#   6. one real 1920x1152 frame rendered + timed through
#      scripts/denoise.py end-to-end  -> $LOG/real_frame.log
#   7. segmented flagship training (--device_reservoir) until
#      $TRAIN_UNTIL                   -> $QDIR/ckpt
#   8. LBF baseline training          -> $QDIR/ckpt_lbf
#   9. held-out eval at 4/8 spp       -> $QDIR/eval{4,8}_r3
#
# Usage: TRAIN_UNTIL=$(date -d '+9 hours' +%s) bash scripts/run_round3_hw.sh
set -u
# REPO override: the driver is usually launched from a frozen copy in
# /tmp (editing a running bash script corrupts its execution), so the
# repo root cannot be derived from $0 there.
cd "${REPO:-$(dirname "$0")/..}"
LOG=${LOG:-/tmp/hw_round3}
QDIR=${QDIR:-/tmp/qrun}
TRAIN_UNTIL=${TRAIN_UNTIL:?set TRAIN_UNTIL (epoch seconds)}
SCENES=${SCENES:-320}
TEST_SCENES=${TEST_SCENES:-16}
GT_SPP=${GT_SPP:-512}
SEG_SECONDS=${SEG_SECONDS:-2700}
MAX_STEPS=${MAX_STEPS:-40000}
RESERVOIR=${RESERVOIR:-192}
PROBE_TIMEOUT=${PROBE_TIMEOUT:-120}
PROBE_SLEEP=${PROBE_SLEEP:-2400}
mkdir -p "$LOG" "$QDIR"

probe() {
    timeout "$PROBE_TIMEOUT" python - <<'EOF'
from sbmc_tpu.utils.platform import honor_env_platform; honor_env_platform()
import jax, jax.numpy as jnp
x = jax.jit(lambda a: (a @ a).sum())(jnp.ones((256, 256)))
assert float(x) == 256.0 ** 3, float(x)
print("probe ok")
EOF
}

wait_healthy() {
    until probe >> "$LOG/driver.log" 2>&1; do
        if [ "$(date +%s)" -ge "$TRAIN_UNTIL" ]; then
            echo "$(date +%T) window closed while waiting" >> "$LOG/driver.log"
            exit 1
        fi
        echo "$(date +%T) tunnel wedged; sleeping ${PROBE_SLEEP}s" \
            >> "$LOG/driver.log"
        sleep "$PROBE_SLEEP"
    done
    echo "$(date +%T) TPU healthy" >> "$LOG/driver.log"
}

# Drop scene dirs that were killed mid-render (incomplete tile grids) so
# a datagen restart regenerates them deterministically (seed = index).
clean_partial() {
    local dir="$1" want="$2"
    [ -d "$dir" ] || return 0
    for d in "$dir"/scene_*; do
        [ -d "$d" ] || continue
        n=$(ls "$d"/*.bin 2>/dev/null | wc -l)
        [ "$n" -ne "$want" ] && { echo "rm partial $d ($n tiles)" \
            >> "$LOG/driver.log"; rm -rf "$d"; }
    done
}

echo "$(date +%T) round-3 driver start (until $(date -d @$TRAIN_UNTIL +%T))" \
    >> "$LOG/driver.log"
wait_healthy

# --- 2. KPCN bench (never measured; short) ---------------------------------
if [ ! -s "$LOG/bench_kpcn.json" ]; then
    SBMC_BENCH_MODEL=kpcn timeout 3000 python bench.py \
        > "$LOG/bench_kpcn.json" 2> "$LOG/bench_kpcn.err"
    echo "$(date +%T) kpcn bench rc=$? $(cat "$LOG/bench_kpcn.json")" \
        >> "$LOG/driver.log"
fi

# --- 3. corpus datagen (resumable; harder distribution: obj meshes +
#        procedural textures via --obj_dir) --------------------------------
clean_partial "$QDIR/train" 4
have=$(ls -d "$QDIR/train"/scene_* 2>/dev/null | wc -l)
if [ "$have" -lt "$SCENES" ]; then
    echo "$(date +%T) datagen train: $have/$SCENES scenes" >> "$LOG/driver.log"
    timeout 14400 python scripts/generate_training_data.py - - - \
        "$QDIR/train" --renderer wavefront --count $(( SCENES - have )) \
        --spp 8 --gt_spp "$GT_SPP" --width 256 --height 256 \
        --tile_size 128 --start_index "$have" --obj_dir assets/objs \
        --verbose >> "$LOG/datagen.log" 2>&1
    echo "$(date +%T) datagen train rc=$?" >> "$LOG/driver.log"
fi
clean_partial "$QDIR/test" 4
have=$(ls -d "$QDIR/test"/scene_* 2>/dev/null | wc -l)
if [ "$have" -lt "$TEST_SCENES" ]; then
    timeout 3600 python scripts/generate_training_data.py - - - \
        "$QDIR/test" --renderer wavefront --count $(( TEST_SCENES - have )) \
        --spp 8 --gt_spp "$GT_SPP" --width 256 --height 256 \
        --tile_size 128 --start_index $(( 100000 + have )) \
        --obj_dir assets/objs --verbose >> "$LOG/datagen.log" 2>&1
    echo "$(date +%T) datagen test rc=$?" >> "$LOG/driver.log"
fi
wait_healthy

# --- 4. variable-spp bench rungs (BASELINE.md configs) ----------------------
for spp in 8 16 32; do
    if [ ! -s "$LOG/bench_spp${spp}.json" ]; then
        SBMC_BENCH_SPP=$spp timeout 3000 python bench.py \
            > "$LOG/bench_spp${spp}.json" 2> "$LOG/bench_spp${spp}.err"
        echo "$(date +%T) spp$spp bench rc=$? $(cat "$LOG/bench_spp${spp}.json")" \
            >> "$LOG/driver.log"
    fi
done

# --- 5. kernel validation + op ladder + train-step timing -------------------
if [ ! -s "$LOG/tpu_session.log" ]; then
    timeout 3600 python scripts/tpu_session.py --no-bench_model \
        > "$LOG/tpu_session.log" 2>&1
    echo "$(date +%T) tpu_session rc=$?" >> "$LOG/driver.log"
fi
wait_healthy

# --- 6. render one real 1920x1152 frame (15x9 tiles of 128^2, 8 spp
#        recorded, tiny gt — the denoise timing runs after training) --------
nf=$(ls "$QDIR/frame1080/scene_00000"/*.bin 2>/dev/null | wc -l)
if [ "$nf" -ne 135 ]; then
    rm -rf "$QDIR/frame1080/scene_00000"
    timeout 5400 python scripts/generate_training_data.py - - - \
        "$QDIR/frame1080" --renderer wavefront --count 1 --spp 8 \
        --gt_spp 8 --width 1920 --height 1152 --tile_size 128 \
        --obj_dir assets/objs --verbose >> "$LOG/datagen.log" 2>&1
    echo "$(date +%T) real-frame render rc=$?" >> "$LOG/driver.log"
fi

# --- 7. segmented flagship training (HBM reservoir) -------------------------
LBF_SECONDS=${LBF_SECONDS:-1500}
KPCN_BUDGET=${KPCN_SECONDS:-1500}
EVAL_SECONDS=${EVAL_SECONDS:-4200}
FLAGSHIP_UNTIL=$(( TRAIN_UNTIL - LBF_SECONDS - KPCN_BUDGET - EVAL_SECONDS ))
while [ "$(date +%s)" -lt "$FLAGSHIP_UNTIL" ]; do
    left=$(( FLAGSHIP_UNTIL - $(date +%s) ))
    seg=$(( left < SEG_SECONDS ? left : SEG_SECONDS ))
    [ "$seg" -lt 300 ] && break
    echo "$(date +%T) train segment (${seg}s)" >> "$LOG/driver.log"
    timeout "$seg" python scripts/train.py "$QDIR/train" "$QDIR/ckpt" \
        --spp 8 --ksize 21 --bs 4 --max_steps "$MAX_STEPS" \
        --device_reservoir "$RESERVOIR" --log_interval 50 \
        --checkpoint_interval 250 --num_worker_threads 4 \
        >> "$LOG/train.log" 2>&1
    rc=$?
    echo "$(date +%T) segment rc=$rc" >> "$LOG/driver.log"
    if [ "$rc" -ne 124 ] && [ "$rc" -ne 0 ]; then
        sleep 600
        probe >> "$LOG/driver.log" 2>&1 || sleep 900
    fi
    [ "$rc" -eq 0 ] && break   # hit MAX_STEPS
done

# --- 8. LBF + KPCN baseline training (honest TPU budgets; the
#        reference's bako2017_finetuned role) -------------------------------
if [ "$LBF_SECONDS" -ge 300 ] && [ ! -d "$QDIR/ckpt_lbf" ]; then
    echo "$(date +%T) lbf train (${LBF_SECONDS}s)" >> "$LOG/driver.log"
    timeout "$LBF_SECONDS" python scripts/train.py "$QDIR/train" \
        "$QDIR/ckpt_lbf" --lbf_mode --spp 8 --bs 8 --max_steps 6000 \
        --log_interval 50 --checkpoint_interval 250 \
        --num_worker_threads 4 >> "$LOG/train_lbf.log" 2>&1
    echo "$(date +%T) lbf rc=$?" >> "$LOG/driver.log"
fi
KPCN_SECONDS=${KPCN_SECONDS:-1500}
if [ "$KPCN_SECONDS" -ge 300 ] && [ ! -d "$QDIR/ckpt_kpcn" ]; then
    echo "$(date +%T) kpcn train (${KPCN_SECONDS}s)" >> "$LOG/driver.log"
    timeout "$KPCN_SECONDS" python scripts/train.py "$QDIR/train" \
        "$QDIR/ckpt_kpcn" --kpcn_mode --spp 8 --bs 8 --max_steps 6000 \
        --log_interval 50 --checkpoint_interval 250 \
        --num_worker_threads 4 >> "$LOG/train_kpcn.log" 2>&1
    echo "$(date +%T) kpcn rc=$?" >> "$LOG/driver.log"
fi
LBF_FLAG=""
[ -d "$QDIR/ckpt_lbf" ] && LBF_FLAG="--lbf_checkpoint $QDIR/ckpt_lbf"
[ -d "$QDIR/ckpt_kpcn" ] && \
    LBF_FLAG="$LBF_FLAG --kpcn_checkpoint $QDIR/ckpt_kpcn"

# --- 8.5 real-frame end-to-end denoise timing (reference protocol:
#         scripts/denoise.py setup/denoising-time logs) ---------------------
if [ ! -s "$LOG/real_frame.log" ] && [ -d "$QDIR/ckpt" ]; then
    timeout 3000 python scripts/denoise.py \
        --input "$QDIR/frame1080" --checkpoint "$QDIR/ckpt" \
        --output "$QDIR/frame1080_out.exr" --spp 4 --uniform_tiles \
        --tile_size 640x2048 --tile_pad 50x64 --verbose \
        > "$LOG/real_frame.log" 2>&1
    echo "$(date +%T) real-frame denoise rc=$?" >> "$LOG/driver.log"
fi

# --- 9. held-out evals --------------------------------------------------------
for spp in 4 8; do
    timeout 3000 python scripts/eval_suite.py --data "$QDIR/test" \
        --checkpoint "$QDIR/ckpt" --output "$QDIR/eval${spp}_r3" \
        --spp "$spp" --tile_size 256 --tile_pad 0 --verbose $LBF_FLAG \
        >> "$LOG/eval${spp}.log" 2>&1
    echo "$(date +%T) eval ${spp}spp rc=$?" >> "$LOG/driver.log"
done
echo "$(date +%T) queue complete" >> "$LOG/driver.log"
