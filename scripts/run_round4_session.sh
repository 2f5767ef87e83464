#!/bin/bash
# Round-4 session driver: fresh-VM recovery path.
#
# The 2026-08-20 01:56 VM recreation wiped the gitignored scratch
# (.qrun: corpus + full checkpoints) again. This wrapper rebuilds the
# corpus from scratch, warm-starts the flagship checkpoint from the
# committed f16 snapshot, then hands off to the probe-gated takeover
# driver (scripts/run_round4_takeover.sh) which runs the attribution
# A/B *before* committing the long training leg to bf16/reservoir —
# the 2026-08-19 step-9000 run proved unattended fast-config training
# without a health gate can burn a whole window without learning.
#
# Usage: UNTIL=$(date -d '+10 hours' +%s) \
#        nohup bash scripts/run_round4_session.sh >> .hwlog/session.log 2>&1 &
set -u
cd "${REPO:-$(dirname "$0")/..}"
LOG=${LOG:-.hwlog}
QDIR=${QDIR:-.qrun}
UNTIL=${UNTIL:?set UNTIL (epoch seconds)}
SCENES=${SCENES:-320}
TEST_SCENES=${TEST_SCENES:-16}
GT_SPP=${GT_SPP:-256}
TEST_GT_SPP=${TEST_GT_SPP:-512}
DATAGEN_BUDGET=${DATAGEN_BUDGET:-11700}
PROBE_TIMEOUT=${PROBE_TIMEOUT:-120}
PROBE_SLEEP=${PROBE_SLEEP:-1200}
DG_FLAGS="--obj_dir assets/objs --tex_dir assets/textures --env_dir assets/envmaps"
mkdir -p "$LOG" "$QDIR" weights

logln() { echo "$(date +%T) $*" >> "$LOG/driver.log"; }

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
        if [ "$(date +%s)" -ge "$UNTIL" ]; then
            logln "window closed while waiting for the tunnel"
            exit 0
        fi
        logln "tunnel wedged; sleeping ${PROBE_SLEEP}s"
        sleep "$PROBE_SLEEP"
    done
    logln "TPU healthy"
}

clean_partial() {
    local dir="$1" want="$2"
    [ -d "$dir" ] || return 0
    for d in "$dir"/scene_*; do
        [ -d "$d" ] || continue
        n=$(ls "$d"/*.bin 2>/dev/null | wc -l)
        [ "$n" -ne "$want" ] && { logln "rm partial $d ($n tiles)"; rm -rf "$d"; }
    done
}

logln "session driver start (until $(date -d @$UNTIL +%T))"
wait_healthy

# --- 1. train corpus ---------------------------------------------------------
DG_DEADLINE=$(( $(date +%s) + DATAGEN_BUDGET ))
while :; do
    clean_partial "$QDIR/train" 4
    have=$(ls -d "$QDIR/train"/scene_* 2>/dev/null | wc -l)
    [ "$have" -ge "$SCENES" ] && break
    left=$(( DG_DEADLINE - $(date +%s) ))
    [ "$left" -lt 120 ] && { logln "datagen budget exhausted ($have/$SCENES)"; break; }
    logln "datagen train: $have/$SCENES scenes (${left}s left)"
    timeout "$left" python scripts/generate_training_data.py - - - \
        "$QDIR/train" --renderer wavefront --count $(( SCENES - have )) \
        --spp 8 --gt_spp "$GT_SPP" --width 256 --height 256 \
        --tile_size 128 --start_index "$have" $DG_FLAGS \
        >> "$LOG/datagen.log" 2>&1
    rc=$?
    logln "datagen train rc=$rc"
    [ "$rc" -eq 124 ] && break
    [ "$rc" -ne 0 ] && { sleep 60; wait_healthy; }
done

# --- 2. held-out test corpus (gt 512, 32 spp recorded for 4/8/16/32 evals) ---
TEST_DEADLINE=$(( $(date +%s) + 3600 ))
while :; do
    clean_partial "$QDIR/test" 4
    have=$(ls -d "$QDIR/test"/scene_* 2>/dev/null | wc -l)
    [ "$have" -ge "$TEST_SCENES" ] && break
    left=$(( TEST_DEADLINE - $(date +%s) ))
    [ "$left" -lt 120 ] && break
    wait_healthy
    timeout "$left" python scripts/generate_training_data.py - - - \
        "$QDIR/test" --renderer wavefront --count $(( TEST_SCENES - have )) \
        --spp 32 --gt_spp "$TEST_GT_SPP" --width 256 --height 256 \
        --tile_size 128 --start_index $(( 100000 + have )) $DG_FLAGS \
        >> "$LOG/datagen.log" 2>&1
    rc=$?
    logln "datagen test rc=$rc"
    [ "$rc" -eq 124 ] && break
    [ "$rc" -ne 0 ] && { sleep 60; wait_healthy; }
done

# --- 3. one real 1920x1152 frame (135 tiles, 8 spp recorded) -----------------
for attempt in 1 2; do
    nf=$(ls "$QDIR/frame1080/scene_00000"/*.bin 2>/dev/null | wc -l)
    [ "$nf" -eq 135 ] && break
    [ "$(( UNTIL - $(date +%s) ))" -lt 14400 ] && break
    rm -rf "$QDIR/frame1080/scene_00000"
    wait_healthy
    timeout 2400 python scripts/generate_training_data.py - - - \
        "$QDIR/frame1080" --renderer wavefront --count 1 --spp 8 \
        --gt_spp 8 --width 1920 --height 1152 --tile_size 128 \
        $DG_FLAGS >> "$LOG/datagen.log" 2>&1
    logln "real-frame render rc=$? (attempt $attempt)"
done

# --- 4. warm-start the flagship ckpt from the committed snapshot --------------
if [ ! -d "$QDIR/ckpt" ] && [ -f weights/flagship_f16/params_f16.msgpack ]
then
    python scripts/export_params.py import weights/flagship_f16 \
        "$QDIR/ckpt" >> "$LOG/driver.log" 2>&1
    cp -f weights/flagship_f16/train_log.csv "$QDIR/ckpt/train_log.csv" \
        2>/dev/null
    logln "warm-started ckpt from weights/flagship_f16"
fi

# --- 5. hand off: A/B -> long flagship leg -> baselines -> evals -> bench ----
logln "handing off to takeover driver"
exec bash scripts/run_round4_takeover.sh
