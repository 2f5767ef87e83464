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
mkdir -p "$LOG"

probe() {
    timeout 360 python - <<'EOF'
from sbmc_tpu.utils.platform import honor_env_platform; honor_env_platform()
import jax, jax.numpy as jnp
x = jax.jit(lambda a: (a @ a).sum())(jnp.ones((256, 256)))
assert float(x) == 256.0 * 256.0
print("probe ok")
EOF
}

echo "$(date +%T) waiting for TPU..." >> "$LOG/driver.log"
until probe >> "$LOG/driver.log" 2>&1; do
    if [ "$(date +%s)" -ge "$TRAIN_UNTIL" ]; then
        echo "$(date +%T) window never opened" >> "$LOG/driver.log"
        exit 1
    fi
    sleep 900   # full idle between probes: frequent probes reset the heal
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
while [ "$(date +%s)" -lt "$TRAIN_UNTIL" ]; do
    left=$(( TRAIN_UNTIL - $(date +%s) ))
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

# --- 4. held-out evals -----------------------------------------------------
for spp in 4 8; do
    timeout 3000 python scripts/eval_suite.py --data "$QDIR/test" \
        --checkpoint "$QDIR/ckpt" --output "$QDIR/eval${spp}_r2" \
        --spp "$spp" --tile_size 256 --tile_pad 0 --verbose \
        >> "$LOG/eval${spp}.log" 2>&1
    echo "$(date +%T) eval ${spp}spp rc=$?" >> "$LOG/driver.log"
done
echo "$(date +%T) done" >> "$LOG/driver.log"
