#!/bin/bash
# Round-4 window takeover driver.
#
# Replaces run_round4_hw.sh + run_round4_extend.sh after the 01:01 tunnel
# wedge (segment 2 hung on the first post-resume device call; zero bytes
# flowing on the tunnel socket). Differences from the overnight driver:
#
#   * EVERY phase is probe-gated (wait_healthy), so a wedged tunnel costs
#     probe sleeps, not whole phase timeouts.
#   * Train segments get a WATCHDOG: if train_log.csv grows no rows
#     within WEDGE_GRACE, the segment is killed by PID early instead of
#     burning its full timeout.
#   * Phases are idempotent (marker files / output presence) so the
#     driver can be restarted.
#   * Order: A/B attribution first (unlocks the fast config + measures
#     the reservoir on chip, VERDICT item 3), then corpus growth, then
#     the long flagship leg, then baselines/evals/timings/bench.
#
# Usage: UNTIL=$(date -d 'today 10:10' +%s) nohup bash scripts/run_round4_takeover.sh &
set -u
cd "${REPO:-$(dirname "$0")/..}"
LOG=${LOG:-.hwlog}
QDIR=${QDIR:-.qrun}
UNTIL=${UNTIL:?set UNTIL (epoch seconds)}
SEG_SECONDS=${SEG_SECONDS:-2700}
MAX_STEPS=${MAX_STEPS:-60000}
RESERVOIR=${RESERVOIR:-192}
AB_STEPS=${AB_STEPS:-600}
AB_SECONDS=${AB_SECONDS:-1500}
LBF_SECONDS=${LBF_SECONDS:-1500}
KPCN_SECONDS=${KPCN_SECONDS:-1500}
EVAL_SECONDS=${EVAL_SECONDS:-2250}
DATAGEN_EXT_BUDGET=${DATAGEN_EXT_BUDGET:-3900}
SCENES_EXT=${SCENES_EXT:-240}
WEDGE_GRACE=${WEDGE_GRACE:-1200}
PROBE_TIMEOUT=${PROBE_TIMEOUT:-120}
PROBE_SLEEP=${PROBE_SLEEP:-1200}
SNAP_MIN_STEPS=${SNAP_MIN_STEPS:-2000}
DG_FLAGS="--obj_dir assets/objs --tex_dir assets/textures --env_dir assets/envmaps"
mkdir -p "$LOG" "$QDIR" weights results/bench_r4 results/quality_r4 results/ab_r4

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

left_s() { echo $(( UNTIL - $(date +%s) )); }

snapshot_commit() {
    [ -d "$QDIR/ckpt" ] || return 0
    python scripts/export_params.py export "$QDIR/ckpt" \
        weights/flagship_f16 >> "$LOG/driver.log" 2>&1 || return 0
    cp -f "$QDIR/ckpt/train_log.csv" weights/flagship_f16/train_log.csv \
        2>/dev/null
    step=$(python -c "import json;print(json.load(open(
        'weights/flagship_f16/snapshot.json'))['step'])" 2>/dev/null || echo 0)
    last=$(cat "$LOG/.last_snap_step" 2>/dev/null || echo -999999)
    if [ "${1:-}" != "force" ] && \
       [ $(( step - last )) -lt "$SNAP_MIN_STEPS" ]; then
        logln "snapshot exported (step $step), commit deferred"
        return 0
    fi
    git add weights/flagship_f16 >> "$LOG/driver.log" 2>&1
    git commit -q -m "Flagship weights snapshot (f16) at step $step" \
        >> "$LOG/driver.log" 2>&1 && echo "$step" > "$LOG/.last_snap_step"
}

# Run a train command in the background and watchdog it: kill by PID if
# its train_log.csv grows no rows within WEDGE_GRACE, or at the deadline.
#   watchdog_train <seconds> <logcsv> <outlog> <train.py args...>
watchdog_train() {
    local seconds="$1" logcsv="$2" outlog="$3"; shift 3
    local deadline=$(( $(date +%s) + seconds ))
    local rows0 lastgrow now rows
    rows0=$(wc -l < "$logcsv" 2>/dev/null || echo 0)
    lastgrow=$(date +%s)
    python scripts/train.py "$@" >> "$outlog" 2>&1 &
    local pid=$!
    while kill -0 "$pid" 2>/dev/null; do
        sleep 60
        now=$(date +%s)
        rows=$(wc -l < "$logcsv" 2>/dev/null || echo 0)
        if [ "$rows" -gt "$rows0" ]; then
            rows0=$rows; lastgrow=$now
        fi
        if [ "$now" -ge "$deadline" ]; then
            logln "watchdog: segment deadline; stopping $pid"
            kill "$pid" 2>/dev/null; sleep 20
            kill -9 "$pid" 2>/dev/null
            wait "$pid" 2>/dev/null
            return 124
        fi
        if [ $(( now - lastgrow )) -ge "$WEDGE_GRACE" ]; then
            logln "watchdog: no train_log growth in ${WEDGE_GRACE}s; " \
                "killing wedged segment $pid"
            kill "$pid" 2>/dev/null; sleep 20
            kill -9 "$pid" 2>/dev/null
            wait "$pid" 2>/dev/null
            return 99
        fi
    done
    wait "$pid"
}

logln "takeover driver start (until $(date -d @$UNTIL +%T))"

# --- 1. attribution A/B (fresh inits; control = $QDIR/ckpt's curve) -------
if [ ! -f "$QDIR/ab_bf16/train_log.csv" ] && [ "$(left_s)" -gt 14000 ]; then
    wait_healthy
    logln "A/B: bf16/host ($AB_STEPS steps)"
    watchdog_train "$AB_SECONDS" "$QDIR/ab_bf16/train_log.csv" \
        "$LOG/ab_bf16.log" "$QDIR/train" "$QDIR/ab_bf16" \
        --spp 8 --ksize 21 --bs 4 --bf16 --trust_bf16 \
        --max_steps "$AB_STEPS" --log_interval 25 \
        --checkpoint_interval 100000 --num_worker_threads 4
    logln "A/B bf16 rc=$?"
fi
if [ ! -f "$QDIR/ab_res/train_log.csv" ] && [ "$(left_s)" -gt 12000 ]; then
    wait_healthy
    logln "A/B: f32/reservoir ($AB_STEPS steps)"
    # The reservoir fill device_puts ~6 GB through the tunnel before the
    # first step; give it a longer no-progress grace.
    WEDGE_GRACE=2400 \
    watchdog_train "$AB_SECONDS" "$QDIR/ab_res/train_log.csv" \
        "$LOG/ab_res.log" "$QDIR/train" "$QDIR/ab_res" \
        --spp 8 --ksize 21 --bs 4 \
        --device_reservoir "$RESERVOIR" --trust_reservoir \
        --max_steps "$AB_STEPS" --log_interval 25 \
        --checkpoint_interval 100000 --num_worker_threads 4
    logln "A/B reservoir rc=$?"
fi
cp -f "$QDIR/ab_bf16/train_log.csv" results/ab_r4/ab_bf16.csv 2>/dev/null
cp -f "$QDIR/ab_res/train_log.csv" results/ab_r4/ab_res.csv 2>/dev/null
head -c 400000 "$QDIR/ckpt/train_log.csv" > results/ab_r4/control_f32_host.csv \
    2>/dev/null
git add results/ab_r4 2>/dev/null && git commit -q -m \
    "Attribution A/B train logs: bf16/host + f32/reservoir vs f32/host control" \
    >> "$LOG/driver.log" 2>&1 || true

FAST_FLAGS=""
if python scripts/judge_ab.py "$QDIR/ab_bf16/train_log.csv" --json \
        >> "$LOG/driver.log" 2>&1; then
    FAST_FLAGS="--bf16 --trust_bf16"
fi
if python scripts/judge_ab.py "$QDIR/ab_res/train_log.csv" --json \
        >> "$LOG/driver.log" 2>&1; then
    FAST_FLAGS="$FAST_FLAGS --device_reservoir $RESERVOIR --trust_reservoir"
fi
logln "fast config from A/B: [$FAST_FLAGS]"

# --- 2. corpus growth (time-boxed; skipped when the window shrank) --------
if [ "$(left_s)" -gt 18000 ]; then
    DG_EXT_DEADLINE=$(( $(date +%s) + DATAGEN_EXT_BUDGET ))
    while :; do
        for d in "$QDIR/train"/scene_*; do
            [ -d "$d" ] || continue
            n=$(ls "$d"/*.bin 2>/dev/null | wc -l)
            [ "$n" -ne 4 ] && { logln "rm partial $d ($n tiles)"; rm -rf "$d"; }
        done
        have=$(ls -d "$QDIR/train"/scene_* 2>/dev/null | wc -l)
        [ "$have" -ge "$SCENES_EXT" ] && break
        dleft=$(( DG_EXT_DEADLINE - $(date +%s) ))
        [ "$dleft" -lt 180 ] && { logln "datagen-ext budget done " \
            "($have/$SCENES_EXT scenes)"; break; }
        wait_healthy
        logln "datagen ext: $have/$SCENES_EXT scenes (${dleft}s left)"
        timeout "$dleft" python scripts/generate_training_data.py - - - \
            "$QDIR/train" --renderer wavefront \
            --count $(( SCENES_EXT - have )) \
            --spp 8 --gt_spp 256 --width 256 --height 256 --tile_size 128 \
            --start_index "$have" $DG_FLAGS >> "$LOG/datagen.log" 2>&1
        rc=$?
        logln "datagen ext rc=$rc"
        [ "$rc" -eq 124 ] && break
        [ "$rc" -ne 0 ] && sleep 120
    done
else
    logln "skipping corpus growth (window too small: $(left_s)s)"
fi

# --- 3. long flagship leg (fast config + health checks + rollback) --------
# Tail cushion: real-frame 1800 + flagship bench 1500 + probe/commit slack
# (the op ladder is opt-in now — see phase 7 — so its 2400s lives in the
# training leg instead).
TAIL_RESERVE=$(( LBF_SECONDS + KPCN_SECONDS + 2 * EVAL_SECONDS + 3900 ))
if [ -n "$FAST_FLAGS" ]; then
    rm -rf "$QDIR/ckpt_backup"
    cp -r "$QDIR/ckpt" "$QDIR/ckpt_backup" 2>/dev/null
fi
while [ "$(left_s)" -gt "$TAIL_RESERVE" ]; do
    seg_left=$(( $(left_s) - TAIL_RESERVE ))
    seg=$(( seg_left < SEG_SECONDS ? seg_left : SEG_SECONDS ))
    [ "$seg" -lt 300 ] && break
    wait_healthy
    rows_before=$(wc -l < "$QDIR/ckpt/train_log.csv" 2>/dev/null || echo 1)
    logln "train segment (${seg}s) [$FAST_FLAGS]"
    watchdog_train "$seg" "$QDIR/ckpt/train_log.csv" "$LOG/train.log" \
        "$QDIR/train" "$QDIR/ckpt" \
        --spp 8 --ksize 21 --bs 4 --max_steps "$MAX_STEPS" $FAST_FLAGS \
        --log_interval 50 --checkpoint_interval 250 --num_worker_threads 4
    rc=$?
    logln "segment rc=$rc"
    if [ -n "$FAST_FLAGS" ]; then
        { head -1 "$QDIR/ckpt/train_log.csv";
          tail -n +$(( rows_before + 1 )) "$QDIR/ckpt/train_log.csv"; } \
            > "$LOG/.seg_rows.csv" 2>/dev/null
        newrows=$(( $(wc -l < "$LOG/.seg_rows.csv") - 1 ))
        if [ "$newrows" -ge 4 ]; then
            if python scripts/judge_ab.py "$LOG/.seg_rows.csv" \
                    --beats_input_only --min_rows 4 --json \
                    >> "$LOG/driver.log" 2>&1; then
                rm -rf "$QDIR/ckpt_backup"
                cp -r "$QDIR/ckpt" "$QDIR/ckpt_backup"
            else
                logln "fast config regressed; rollback + f32/host"
                rm -rf "$QDIR/ckpt"
                mv "$QDIR/ckpt_backup" "$QDIR/ckpt"
                FAST_FLAGS=""
            fi
        fi
    fi
    snapshot_commit
    [ "$rc" -eq 0 ] && break   # hit MAX_STEPS
done
snapshot_commit force

# --- 4. LBF + KPCN baselines ------------------------------------------------
if [ ! -f "$QDIR/ckpt_lbf/train_log.csv" ] && [ "$(left_s)" -gt 9000 ]; then
    wait_healthy
    logln "lbf train (${LBF_SECONDS}s)"
    watchdog_train "$LBF_SECONDS" "$QDIR/ckpt_lbf/train_log.csv" \
        "$LOG/train_lbf.log" "$QDIR/train" "$QDIR/ckpt_lbf" \
        --lbf_mode --spp 8 --bs 8 --max_steps 6000 \
        --log_interval 50 --checkpoint_interval 250 --num_worker_threads 4
    logln "lbf rc=$?"
fi
if [ ! -f "$QDIR/ckpt_kpcn/train_log.csv" ] && [ "$(left_s)" -gt 7500 ]; then
    wait_healthy
    logln "kpcn train (${KPCN_SECONDS}s)"
    watchdog_train "$KPCN_SECONDS" "$QDIR/ckpt_kpcn/train_log.csv" \
        "$LOG/train_kpcn.log" "$QDIR/train" "$QDIR/ckpt_kpcn" \
        --kpcn_mode --spp 8 --bs 8 --max_steps 6000 \
        --log_interval 50 --checkpoint_interval 250 --num_worker_threads 4
    logln "kpcn rc=$?"
fi
LBF_FLAG=""
[ -f "$QDIR/ckpt_lbf/meta.json" ] && LBF_FLAG="--lbf_checkpoint $QDIR/ckpt_lbf"
[ -f "$QDIR/ckpt_kpcn/meta.json" ] && \
    LBF_FLAG="$LBF_FLAG --kpcn_checkpoint $QDIR/ckpt_kpcn"

# --- 5. held-out evals + commit ----------------------------------------------
for spp in 4 8; do
    [ "$(left_s)" -lt 3000 ] && break
    wait_healthy
    logln "eval ${spp}spp (${EVAL_SECONDS}s)"
    timeout "$EVAL_SECONDS" python scripts/eval_suite.py \
        --data "$QDIR/test" --checkpoint "$QDIR/ckpt" \
        --output "$QDIR/eval${spp}_r4" --spp "$spp" --tile_size 256 \
        --tile_pad 0 --verbose $LBF_FLAG >> "$LOG/eval${spp}.log" 2>&1
    logln "eval ${spp}spp rc=$?"
    if [ -f "$QDIR/eval${spp}_r4/metrics.csv" ]; then
        cp -f "$QDIR/eval${spp}_r4/metrics.csv" \
            "results/quality_r4/metrics_${spp}spp.csv"
        cp -f "$QDIR/eval${spp}_r4/metrics.md" \
            "results/quality_r4/metrics_${spp}spp.md" 2>/dev/null
        python scripts/update_quality_md.py >> "$LOG/driver.log" 2>&1
        git add results/quality_r4 QUALITY.md >> "$LOG/driver.log" 2>&1
        git commit -q -m \
            "Held-out quality tables at ${spp}spp (round-4 corpus)" \
            >> "$LOG/driver.log" 2>&1 || true
    fi
done

# --- 6. real-frame end-to-end denoise timing ---------------------------------
if [ ! -s "$LOG/real_frame.log" ] && [ -d "$QDIR/ckpt" ] && \
   [ "$(left_s)" -gt 2400 ]; then
    wait_healthy
    timeout 1800 python scripts/denoise.py \
        --input "$QDIR/frame1080" --checkpoint "$QDIR/ckpt" \
        --output "$QDIR/frame1080_out.exr" --spp 4 --uniform_tiles \
        --tile_size 640x2048 --tile_pad 50x64 --verbose \
        > "$LOG/real_frame.log" 2>&1
    logln "real-frame denoise rc=$?"
fi

# --- 7. op ladder (exp2 / staged-splat A/Bs) ----------------------------------
# Opt-in (RUN_LADDER=1): the 2026-08-19 window already measured every rung
# (exp2 slower, staged/bf16-logit variants — PERF_TPU.md session 6); on a
# wedge-shortened day the 2400s buys more in the training leg instead.
if [ "${RUN_LADDER:-0}" = "1" ] && \
   [ ! -s "$LOG/tpu_session.log" ] && [ "$(left_s)" -gt 2700 ]; then
    wait_healthy
    timeout 2400 python scripts/tpu_session.py --no-bench_model \
        > "$LOG/tpu_session.log" 2>&1
    logln "tpu_session rc=$?"
fi

# --- 8. live flagship bench rung, committed -----------------------------------
if [ ! -s results/bench_r4/bench_flagship_r4.json ] && \
   [ "$(left_s)" -gt 600 ]; then
    wait_healthy
    timeout 1500 python bench.py > "$LOG/bench_flagship.out" 2> \
        "$LOG/bench_flagship.err"
    if [ -s "$LOG/bench_flagship.out" ]; then
        tail -1 "$LOG/bench_flagship.out" \
            > results/bench_r4/bench_flagship_r4.json
        git add results/bench_r4/bench_flagship_r4.json \
            >> "$LOG/driver.log" 2>&1
        git commit -q -m "Live flagship 4spp bench rung (round-4 window)" \
            >> "$LOG/driver.log" 2>&1 || true
    fi
    logln "flagship bench rc=$?"
fi

# --- 9. 32-spp bench rung (the one BASELINE.md config never measured) ----------
if [ ! -s results/bench_r4/bench_spp32_r4.json ] && \
   [ "$(left_s)" -gt 1800 ]; then
    wait_healthy
    SBMC_BENCH_SPP=32 timeout 1500 python bench.py \
        > "$LOG/bench_spp32.out" 2> "$LOG/bench_spp32.err"
    if [ -s "$LOG/bench_spp32.out" ]; then
        tail -1 "$LOG/bench_spp32.out" > results/bench_r4/bench_spp32_r4.json
        git add results/bench_r4/bench_spp32_r4.json \
            >> "$LOG/driver.log" 2>&1
        git commit -q -m "First 32-spp bench rung (round-4 window)" \
            >> "$LOG/driver.log" 2>&1 || true
    fi
    logln "spp32 bench rc=$?"
fi

# --- 10. harvest the window's evidence into the repo ---------------------------
# Quality tables, A/B CSVs, bench rungs and weight snapshots are committed
# by their own phases; this catches the rest (timings, ladder output,
# train-throughput logs) so the round's measurements survive the VM.
mkdir -p results/r4_logs
cp -f "$LOG/real_frame.log" results/r4_logs/ 2>/dev/null
cp -f "$LOG/tpu_session.log" results/r4_logs/ 2>/dev/null
cp -f "$LOG/driver.log" results/r4_logs/ 2>/dev/null
tail -c 200000 "$LOG/train.log" > results/r4_logs/train_tail.log 2>/dev/null
tail -c 100000 "$LOG/datagen.log" > results/r4_logs/datagen_tail.log \
    2>/dev/null
cp -f "$QDIR/ckpt/train_log.csv" results/r4_logs/flagship_train_log.csv \
    2>/dev/null
cp -f "$QDIR/ckpt_lbf/train_log.csv" results/r4_logs/lbf_train_log.csv \
    2>/dev/null
cp -f "$QDIR/ckpt_kpcn/train_log.csv" results/r4_logs/kpcn_train_log.csv \
    2>/dev/null
python scripts/plot_train_log.py "$QDIR/ckpt/train_log.csv" \
    -o results/r4_logs/flagship_loss_curve.png >> "$LOG/driver.log" 2>&1 \
    || true
git add results/r4_logs >> "$LOG/driver.log" 2>&1
git commit -q -m "Round-4 window evidence: timing, ladder, and train logs" \
    >> "$LOG/driver.log" 2>&1 || true
logln "takeover queue complete"
