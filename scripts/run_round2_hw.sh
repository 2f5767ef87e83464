#!/bin/bash
# Unattended hardware-window driver (round 2).
#
# The axon TPU tunnel wedges for long stretches (memory:
# tpu-tunnel-behavior); this script converts whatever healthy window
# appears into round-2 deliverables, strictly serially (ONE TPU process
# at a time):
#
#   1. wait for the tunnel to answer a trivial jit probe
#   2. KPCN bench ladder  -> $LOG/bench_kpcn.json
#   3. segmented flagship training (resume from /tmp/qrun/ckpt) until
#      $TRAIN_UNTIL (epoch seconds)
#   4. held-out eval at 4 and 8 spp -> /tmp/qrun/eval{4,8}_r2
#
# Usage: TRAIN_UNTIL=$(date -d '+5 hours' +%s) bash scripts/run_round2_hw.sh
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/hw_round2}
QDIR=${QDIR:-/tmp/qrun}
TRAIN_UNTIL=${TRAIN_UNTIL:?set TRAIN_UNTIL (epoch seconds)}
SEG_SECONDS=${SEG_SECONDS:-2700}
MAX_STEPS=${MAX_STEPS:-25000}
# A hard tunnel wedge heals only after 20-30+ min of COMPLETE idleness,
# and a hung probe holds a connection open for its whole timeout — so the
# idle gap must be long and the probe short (measured 2026-08-17).
PROBE_TIMEOUT=${PROBE_TIMEOUT:-120}
PROBE_SLEEP=${PROBE_SLEEP:-2400}
mkdir -p "$LOG"

probe() {
    timeout "$PROBE_TIMEOUT" python - <<'EOF'
from sbmc_tpu.utils.platform import honor_env_platform; honor_env_platform()
import jax, jax.numpy as jnp
x = jax.jit(lambda a: (a @ a).sum())(jnp.ones((256, 256)))
# ones @ ones has every entry == 256; the full sum is 256^3.
assert float(x) == 256.0 ** 3, float(x)
print("probe ok")
EOF
}

echo "$(date +%T) waiting for TPU..." >> "$LOG/driver.log"
until probe >> "$LOG/driver.log" 2>&1; do
    if [ "$(date +%s)" -ge "$TRAIN_UNTIL" ]; then
        echo "$(date +%T) window never opened" >> "$LOG/driver.log"
        exit 1
    fi
    sleep "$PROBE_SLEEP"   # full idle: frequent probes reset the heal
done
echo "$(date +%T) TPU healthy" >> "$LOG/driver.log"

# --- 2. KPCN bench (short; dedicated ladder) -------------------------------
if [ ! -s "$LOG/bench_kpcn.json" ]; then
    SBMC_BENCH_MODEL=kpcn timeout 3000 python bench.py \
        > "$LOG/bench_kpcn.json" 2> "$LOG/bench_kpcn.err"
    echo "$(date +%T) kpcn bench rc=$? $(cat "$LOG/bench_kpcn.json")" \
        >> "$LOG/driver.log"
fi

# --- 3. segmented training -------------------------------------------------
# The last LBF_SECONDS of the window are reserved for the LBF baseline
# (Kalantari2015) so the eval tables can carry all four comparison methods.
LBF_SECONDS=${LBF_SECONDS:-1500}
FLAGSHIP_UNTIL=$(( TRAIN_UNTIL - LBF_SECONDS ))
while [ "$(date +%s)" -lt "$FLAGSHIP_UNTIL" ]; do
    left=$(( FLAGSHIP_UNTIL - $(date +%s) ))
    seg=$(( left < SEG_SECONDS ? left : SEG_SECONDS ))
    [ "$seg" -lt 300 ] && break
    echo "$(date +%T) train segment (${seg}s)" >> "$LOG/driver.log"
    timeout "$seg" python scripts/train.py "$QDIR/train" "$QDIR/ckpt" \
        --spp 8 --ksize 21 --bs 4 --max_steps "$MAX_STEPS" \
        --log_interval 50 --checkpoint_interval 250 \
        --num_worker_threads 4 >> "$LOG/train.log" 2>&1
    rc=$?
    echo "$(date +%T) segment rc=$rc" >> "$LOG/driver.log"
    # rc 124 = segment timeout (expected); anything else: probe before
    # retrying so a wedged tunnel gets idle time instead of hammering.
    if [ "$rc" -ne 124 ] && [ "$rc" -ne 0 ]; then
        sleep 600
        probe >> "$LOG/driver.log" 2>&1 || sleep 900
    fi
    [ "$rc" -eq 0 ] && break   # hit MAX_STEPS
done

# --- 3b. LBF baseline training ---------------------------------------------
if [ "$LBF_SECONDS" -ge 300 ]; then
    echo "$(date +%T) lbf train (${LBF_SECONDS}s)" >> "$LOG/driver.log"
    timeout "$LBF_SECONDS" python scripts/train.py "$QDIR/train" \
        "$QDIR/ckpt_lbf" --lbf_mode --spp 8 --bs 8 --max_steps 6000 \
        --log_interval 50 --checkpoint_interval 250 \
        --num_worker_threads 4 >> "$LOG/train_lbf.log" 2>&1
    echo "$(date +%T) lbf rc=$?" >> "$LOG/driver.log"
fi
LBF_FLAG=""
[ -d "$QDIR/ckpt_lbf" ] && LBF_FLAG="--lbf_checkpoint $QDIR/ckpt_lbf"

# --- 4. held-out evals -----------------------------------------------------
for spp in 4 8; do
    timeout 3000 python scripts/eval_suite.py --data "$QDIR/test" \
        --checkpoint "$QDIR/ckpt" --output "$QDIR/eval${spp}_r2" \
        --spp "$spp" --tile_size 256 --tile_pad 0 --verbose $LBF_FLAG \
        >> "$LOG/eval${spp}.log" 2>&1
    echo "$(date +%T) eval ${spp}spp rc=$?" >> "$LOG/driver.log"
done
echo "$(date +%T) done" >> "$LOG/driver.log"
