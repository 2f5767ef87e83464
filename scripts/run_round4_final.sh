#!/bin/bash
# Round-4 final-window driver (training-first rebalance).
#
# Replaces run_round4_cut.sh -> run_round4_takeover.sh for the tail of
# the 2026-08-20 window. The takeover's schedule had a fatal flaw for a
# wedge-shortened day: its two standalone 1500s A/B phases pushed
# left_s below TAIL_RESERVE (11400s), so the long flagship training
# leg — VERDICT round-3 item #1 — would have received zero seconds.
# Also the 1080p frame render burned 2400s with zero tiles written and
# was about to be retried for another 2400s.
#
# Rebalance:
#   * The flagship training leg runs FIRST and gets every second above
#     a slimmed tail reserve.
#   * The f32/reservoir A/B is folded into the first judged training
#     segment (warm-started, backed up, rolled back on regression) —
#     so the reservoir's on-chip step-rate measurement (VERDICT item 3)
#     lands in the flagship train_log.csv instead of a throwaway run.
#   * bf16 stays out of the flagship leg (zero validated training runs)
#     and runs as a fresh-init 600-step A/B only if time remains.
#   * The 1080p frame render is dropped; the end-to-end .bin->EXR
#     timing evidence (VERDICT item 6) comes from scripts/denoise.py on
#     a real rendered held-out 256^2 scene instead.
#
# Usage: UNTIL=$(date -d 'today 12:50' +%s) \
#        nohup bash scripts/run_round4_final.sh >> .hwlog/final.log 2>&1 &
set -u
cd "${REPO:-$(dirname "$0")/..}"
LOG=${LOG:-.hwlog}
QDIR=${QDIR:-.qrun}
UNTIL=${UNTIL:?set UNTIL (epoch seconds)}
SEG_SECONDS=${SEG_SECONDS:-2400}
PROBE_SEG_SECONDS=${PROBE_SEG_SECONDS:-1500}
MAX_STEPS=${MAX_STEPS:-60000}
RESERVOIR=${RESERVOIR:-192}
LBF_SECONDS=${LBF_SECONDS:-1200}
KPCN_SECONDS=${KPCN_SECONDS:-1200}
EVAL_SECONDS=${EVAL_SECONDS:-2250}
WEDGE_GRACE=${WEDGE_GRACE:-1200}
PROBE_TIMEOUT=${PROBE_TIMEOUT:-120}
PROBE_SLEEP=${PROBE_SLEEP:-600}
SNAP_MIN_STEPS=${SNAP_MIN_STEPS:-1500}
# Tail reserve: LBF + evals + e2e-denoise(600) + bench(900) + slack(800).
# KPCN is conditional and budgeted at its own gate, not reserved here.
TAIL_RESERVE=$(( LBF_SECONDS + 2 * EVAL_SECONDS + 600 + 900 + 800 ))
mkdir -p "$LOG" "$QDIR" weights results/bench_r4 results/quality_r4 \
    results/ab_r4 results/r4_logs

logln() { echo "$(date +%T) final: $*" >> "$LOG/driver.log"; }

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
            logln "watchdog: no train_log growth in ${WEDGE_GRACE}s;" \
                "killing wedged segment $pid"
            kill "$pid" 2>/dev/null; sleep 20
            kill -9 "$pid" 2>/dev/null
            wait "$pid" 2>/dev/null
            return 99
        fi
    done
    wait "$pid"
}

logln "final driver start (until $(date -d @$UNTIL +%T)," \
    "tail reserve ${TAIL_RESERVE}s)"

# --- 0. warm-start the flagship ckpt from the committed snapshot ----------
if [ ! -d "$QDIR/ckpt" ] && [ -f weights/flagship_f16/params_f16.msgpack ]
then
    python scripts/export_params.py import weights/flagship_f16 \
        "$QDIR/ckpt" >> "$LOG/driver.log" 2>&1
    cp -f weights/flagship_f16/train_log.csv "$QDIR/ckpt/train_log.csv" \
        2>/dev/null
    logln "warm-started ckpt from weights/flagship_f16"
fi

# --- 1. long flagship leg ---------------------------------------------------
# Segment 1 doubles as the f32/reservoir A/B: judged on its own rows,
# rolled back from backup on regression. Later segments keep whatever
# config survived.
FAST_FLAGS="--device_reservoir $RESERVOIR --trust_reservoir"
first=1
while [ "$(left_s)" -gt "$TAIL_RESERVE" ]; do
    seg_left=$(( $(left_s) - TAIL_RESERVE ))
    if [ "$first" = "1" ] && [ -n "$FAST_FLAGS" ]; then
        seg=$PROBE_SEG_SECONDS
        grace=2400   # reservoir fill device_puts ~6 GB before step 1
    else
        seg=$SEG_SECONDS
        grace=$WEDGE_GRACE
    fi
    [ "$seg" -gt "$seg_left" ] && seg=$seg_left
    [ "$seg" -lt 300 ] && break
    wait_healthy
    if [ -n "$FAST_FLAGS" ]; then
        rm -rf "$QDIR/ckpt_backup"
        cp -r "$QDIR/ckpt" "$QDIR/ckpt_backup" 2>/dev/null
    fi
    rows_before=$(wc -l < "$QDIR/ckpt/train_log.csv" 2>/dev/null || echo 1)
    logln "train segment (${seg}s) [$FAST_FLAGS]"
    WEDGE_GRACE=$grace watchdog_train "$seg" "$QDIR/ckpt/train_log.csv" \
        "$LOG/train.log" "$QDIR/train" "$QDIR/ckpt" \
        --spp 8 --ksize 21 --bs 4 --max_steps "$MAX_STEPS" $FAST_FLAGS \
        --log_interval 25 --checkpoint_interval 250 --num_worker_threads 4
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
                logln "reservoir segment healthy; keeping config"
                rm -rf "$QDIR/ckpt_backup"
            else
                logln "fast config regressed; rollback + f32/host"
                rm -rf "$QDIR/ckpt"
                mv "$QDIR/ckpt_backup" "$QDIR/ckpt"
                FAST_FLAGS=""
            fi
        elif [ "$first" = "1" ]; then
            logln "reservoir probe segment produced <4 rows; f32/host"
            rm -rf "$QDIR/ckpt"
            mv "$QDIR/ckpt_backup" "$QDIR/ckpt" 2>/dev/null
            FAST_FLAGS=""
        fi
    fi
    first=0
    snapshot_commit
    [ "$rc" -eq 0 ] && break   # hit MAX_STEPS
done
snapshot_commit force
cp -f "$QDIR/ckpt/train_log.csv" results/ab_r4/flagship_leg.csv 2>/dev/null

# --- 2. LBF baseline ---------------------------------------------------------
if [ ! -f "$QDIR/ckpt_lbf/train_log.csv" ] && [ "$(left_s)" -gt 7500 ]; then
    wait_healthy
    logln "lbf train (${LBF_SECONDS}s)"
    watchdog_train "$LBF_SECONDS" "$QDIR/ckpt_lbf/train_log.csv" \
        "$LOG/train_lbf.log" "$QDIR/train" "$QDIR/ckpt_lbf" \
        --lbf_mode --spp 8 --bs 8 --max_steps 6000 \
        --log_interval 50 --checkpoint_interval 250 --num_worker_threads 4
    logln "lbf rc=$?"
fi

# --- 3. KPCN baseline (conditional on the tail actually fitting) --------------
if [ ! -f "$QDIR/ckpt_kpcn/train_log.csv" ] && [ "$(left_s)" -gt 7800 ]; then
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

# --- 4. held-out evals + commit ------------------------------------------------
for spp in 4 8; do
    [ "$(left_s)" -lt 2200 ] && break
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

# --- 5. end-to-end .bin -> EXR denoise timing on a real rendered scene --------
if [ ! -s "$LOG/real_frame.log" ] && [ -d "$QDIR/ckpt" ] && \
   [ "$(left_s)" -gt 1800 ]; then
    wait_healthy
    rm -rf "$QDIR/e2e_one"; mkdir -p "$QDIR/e2e_one"
    one=$(ls -d "$QDIR/test"/scene_* 2>/dev/null | head -1)
    [ -n "$one" ] && ln -s "$(readlink -f "$one")" "$QDIR/e2e_one/scene_0"
    timeout 900 python scripts/denoise.py \
        --input "$QDIR/e2e_one" --checkpoint "$QDIR/ckpt" \
        --output "$QDIR/e2e_one_out.exr" --spp 4 --uniform_tiles \
        --tile_size 256 --tile_pad 0 --verbose \
        > "$LOG/real_frame.log" 2>&1
    logln "e2e denoise rc=$?"
fi

# --- 6. live flagship bench rung, committed -----------------------------------
if [ ! -s results/bench_r4/bench_flagship_r4.json ] && \
   [ "$(left_s)" -gt 600 ]; then
    wait_healthy
    timeout 1200 python bench.py > "$LOG/bench_flagship.out" 2> \
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

# --- 7. bf16 attribution A/B (fresh init; only if time genuinely remains) -----
if [ ! -f "$QDIR/ab_bf16/train_log.csv" ] && [ "$(left_s)" -gt 2400 ]; then
    wait_healthy
    logln "A/B: bf16/host (600 steps)"
    watchdog_train 1500 "$QDIR/ab_bf16/train_log.csv" \
        "$LOG/ab_bf16.log" "$QDIR/train" "$QDIR/ab_bf16" \
        --spp 8 --ksize 21 --bs 4 --bf16 --trust_bf16 \
        --max_steps 600 --log_interval 25 \
        --checkpoint_interval 100000 --num_worker_threads 4
    logln "A/B bf16 rc=$?"
    cp -f "$QDIR/ab_bf16/train_log.csv" results/ab_r4/ab_bf16.csv 2>/dev/null
fi

# --- 8. harvest the window's evidence into the repo ----------------------------
cp -f "$LOG/real_frame.log" results/r4_logs/ 2>/dev/null
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
git add results/ab_r4 results/r4_logs >> "$LOG/driver.log" 2>&1
git commit -q -m "Round-4 window evidence: timing, A/B, and train logs" \
    >> "$LOG/driver.log" 2>&1 || true
logln "final queue complete"
