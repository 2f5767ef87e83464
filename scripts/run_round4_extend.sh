#!/bin/bash
# Post-queue extension (round 4): after run_round4_hw.sh prints "queue
# complete", spend the rest of the session window on:
#
#   1. The bf16-vs-reservoir ATTRIBUTION A/B (the 2026-08-19 flagship run
#      trained with both and never beat the trivial input mean — see
#      scripts/train.py guards). Two ~600-step runs from fresh inits on
#      tonight's corpus; tonight's main f32/host run is the healthy
#      control curve. Verdict = compare the loss-vs-input_loss columns in
#      each train_log.csv.
#   2. More flagship training steps (resuming $QDIR/ckpt) on the fastest
#      config the A/B VALIDATED (judge_ab.py), with per-segment health
#      checks + checkpoint rollback if the fast config regresses.
#   3. A refreshed 4-spp held-out table with the extended weights.
#
# Usage: EXTEND_UNTIL=$(date -d '+2 hours' +%s) bash scripts/run_round4_extend.sh
#
# Strictly serial (one TPU process at a time; memory: tpu-tunnel-behavior);
# every phase is timeout-bounded so nothing outlives the session.
set -u
cd "${REPO:-$(dirname "$0")/..}"
LOG=${LOG:-.hwlog}
QDIR=${QDIR:-.qrun}
EXTEND_UNTIL=${EXTEND_UNTIL:?set EXTEND_UNTIL (epoch seconds)}
SEG_SECONDS=${SEG_SECONDS:-2700}
EVAL_SECONDS=${EVAL_SECONDS:-2400}
AB_STEPS=${AB_STEPS:-600}
AB_SECONDS=${AB_SECONDS:-1800}
MAX_STEPS=${MAX_STEPS:-60000}

snapshot_commit() {
    [ -d "$QDIR/ckpt" ] || return 0
    python scripts/export_params.py export "$QDIR/ckpt" \
        weights/flagship_f16 >> "$LOG/driver.log" 2>&1 || return 0
    cp -f "$QDIR/ckpt/train_log.csv" weights/flagship_f16/train_log.csv \
        2>/dev/null
    step=$(python -c "import json;print(json.load(open(
        'weights/flagship_f16/snapshot.json'))['step'])" 2>/dev/null || echo 0)
    git add weights/flagship_f16 >> "$LOG/driver.log" 2>&1
    git commit -q -m "Flagship weights snapshot (f16) at step $step" \
        >> "$LOG/driver.log" 2>&1 || true
}

echo "$(date +%T) round-4 extension start (until $(date -d @$EXTEND_UNTIL +%T))" \
    >> "$LOG/driver.log"

# --- 1. attribution A/B: bf16/host and f32/reservoir, fresh inits --------
# (tonight's $QDIR/ckpt run is the f32/host control). Commit the two
# train logs as round-4 evidence.
if [ ! -f "$QDIR/ab_bf16/train_log.csv" ]; then
    echo "$(date +%T) A/B: bf16/host ($AB_STEPS steps)" >> "$LOG/driver.log"
    timeout "$AB_SECONDS" python scripts/train.py "$QDIR/train" \
        "$QDIR/ab_bf16" --spp 8 --ksize 21 --bs 4 --bf16 --trust_bf16 \
        --max_steps "$AB_STEPS" --log_interval 25 \
        --checkpoint_interval 100000 --num_worker_threads 4 \
        >> "$LOG/ab_bf16.log" 2>&1
    echo "$(date +%T) A/B bf16 rc=$?" >> "$LOG/driver.log"
fi
if [ ! -f "$QDIR/ab_res/train_log.csv" ]; then
    echo "$(date +%T) A/B: f32/reservoir ($AB_STEPS steps)" >> "$LOG/driver.log"
    timeout "$AB_SECONDS" python scripts/train.py "$QDIR/train" \
        "$QDIR/ab_res" --spp 8 --ksize 21 --bs 4 \
        --device_reservoir 192 --trust_reservoir \
        --max_steps "$AB_STEPS" --log_interval 25 \
        --checkpoint_interval 100000 --num_worker_threads 4 \
        >> "$LOG/ab_res.log" 2>&1
    echo "$(date +%T) A/B reservoir rc=$?" >> "$LOG/driver.log"
fi
mkdir -p results/ab_r4
cp -f "$QDIR/ab_bf16/train_log.csv" results/ab_r4/ab_bf16.csv 2>/dev/null
cp -f "$QDIR/ab_res/train_log.csv" results/ab_r4/ab_res.csv 2>/dev/null
head -c 400000 "$QDIR/ckpt/train_log.csv" > results/ab_r4/control_f32_host.csv \
    2>/dev/null
git add results/ab_r4 2>/dev/null && git commit -q -m \
    "Attribution A/B train logs: bf16/host + f32/reservoir vs f32/host control" \
    || true

# --- 1.5 grow the corpus (time-boxed) --------------------------------------
# 85 scenes / 340 tiles is overfitting territory for a 10k+-step run; the
# shape-collapsed + tile-batched datagen path (round-4 commits d5ed7b7,
# fb3f3f7) should also get its on-chip s/scene measurement here. New
# scenes continue the same seed sequence (--start_index), same assets.
DATAGEN_EXT_BUDGET=${DATAGEN_EXT_BUDGET:-4200}
SCENES_EXT=${SCENES_EXT:-240}
DG_FLAGS="--obj_dir assets/objs --tex_dir assets/textures --env_dir assets/envmaps"
DG_EXT_DEADLINE=$(( $(date +%s) + DATAGEN_EXT_BUDGET ))
while :; do
    have=$(ls -d "$QDIR/train"/scene_* 2>/dev/null | wc -l)
    [ "$have" -ge "$SCENES_EXT" ] && break
    left=$(( DG_EXT_DEADLINE - $(date +%s) ))
    hard_left=$(( EXTEND_UNTIL - EVAL_SECONDS - 3600 - $(date +%s) ))
    [ "$hard_left" -lt "$left" ] && left=$hard_left
    [ "$left" -lt 180 ] && { echo "$(date +%T) datagen-ext budget done " \
        "($have/$SCENES_EXT scenes)" >> "$LOG/driver.log"; break; }
    echo "$(date +%T) datagen ext: $have/$SCENES_EXT scenes (${left}s left)" \
        >> "$LOG/driver.log"
    timeout "$left" python scripts/generate_training_data.py - - - \
        "$QDIR/train" --renderer wavefront --count $(( SCENES_EXT - have )) \
        --spp 8 --gt_spp 256 --width 256 --height 256 --tile_size 128 \
        --start_index "$have" $DG_FLAGS >> "$LOG/datagen.log" 2>&1
    rc=$?
    echo "$(date +%T) datagen ext rc=$rc" >> "$LOG/driver.log"
    [ "$rc" -eq 124 ] && break
    [ "$rc" -ne 0 ] && sleep 120
    # Partial scenes from a crash: drop them so --start_index resumes
    # deterministic seeds.
    for d in "$QDIR/train"/scene_*; do
        [ -d "$d" ] || continue
        n=$(ls "$d"/*.bin 2>/dev/null | wc -l)
        [ "$n" -ne 4 ] && { echo "rm partial $d ($n tiles)" \
            >> "$LOG/driver.log"; rm -rf "$d"; }
    done
done

# --- 2. more flagship training (fastest VALIDATED config, resume) ----------
# The A/B verdicts pick the config: bf16 and/or the HBM reservoir engage
# only if their 600-step run out-trained the input baseline
# (scripts/judge_ab.py — the mechanized form of the 2026-08-19 guard).
FAST_FLAGS=""
if python scripts/judge_ab.py "$QDIR/ab_bf16/train_log.csv" --json \
        >> "$LOG/driver.log" 2>&1; then
    FAST_FLAGS="--bf16 --trust_bf16"
fi
if python scripts/judge_ab.py "$QDIR/ab_res/train_log.csv" --json \
        >> "$LOG/driver.log" 2>&1; then
    FAST_FLAGS="$FAST_FLAGS --device_reservoir 192 --trust_reservoir"
fi
echo "$(date +%T) extension config: [$FAST_FLAGS]" >> "$LOG/driver.log"
# Rollback net for the (combined) fast config: back up the checkpoint,
# and after each segment judge ONLY the segment's new log rows
# (beats-input contract; "improving" is wrong for a plateaued resume).
# On regression: restore the backup and finish the window on the proven
# f32/host config.
if [ -n "$FAST_FLAGS" ]; then
    rm -rf "$QDIR/ckpt_backup"
    cp -r "$QDIR/ckpt" "$QDIR/ckpt_backup" 2>/dev/null
fi
TRAIN_UNTIL_EXT=$(( EXTEND_UNTIL - EVAL_SECONDS ))
while [ "$(date +%s)" -lt "$TRAIN_UNTIL_EXT" ]; do
    left=$(( TRAIN_UNTIL_EXT - $(date +%s) ))
    seg=$(( left < SEG_SECONDS ? left : SEG_SECONDS ))
    [ "$seg" -lt 300 ] && break
    rows_before=$(wc -l < "$QDIR/ckpt/train_log.csv" 2>/dev/null || echo 1)
    echo "$(date +%T) extension train segment (${seg}s) [$FAST_FLAGS]" \
        >> "$LOG/driver.log"
    timeout "$seg" python scripts/train.py "$QDIR/train" "$QDIR/ckpt" \
        --spp 8 --ksize 21 --bs 4 --max_steps "$MAX_STEPS" $FAST_FLAGS \
        --log_interval 50 --checkpoint_interval 250 \
        --num_worker_threads 4 >> "$LOG/train.log" 2>&1
    rc=$?
    echo "$(date +%T) extension segment rc=$rc" >> "$LOG/driver.log"
    if [ -n "$FAST_FLAGS" ]; then
        { head -1 "$QDIR/ckpt/train_log.csv";
          tail -n +$(( rows_before + 1 )) "$QDIR/ckpt/train_log.csv"; } \
            > "$LOG/.seg_rows.csv" 2>/dev/null
        newrows=$(( $(wc -l < "$LOG/.seg_rows.csv") - 1 ))
        if [ "$newrows" -ge 4 ]; then
            if python scripts/judge_ab.py "$LOG/.seg_rows.csv" \
                    --beats_input_only --min_rows 4 --json \
                    >> "$LOG/driver.log" 2>&1; then
                # Healthy fast segment: advance the rollback point.
                rm -rf "$QDIR/ckpt_backup"
                cp -r "$QDIR/ckpt" "$QDIR/ckpt_backup"
            else
                echo "$(date +%T) fast config regressed; rolling back to " \
                    "the pre-segment checkpoint + f32/host" \
                    >> "$LOG/driver.log"
                rm -rf "$QDIR/ckpt"
                mv "$QDIR/ckpt_backup" "$QDIR/ckpt"
                FAST_FLAGS=""
            fi
        fi
    fi
    snapshot_commit
    if [ "$rc" -ne 124 ] && [ "$rc" -ne 0 ]; then
        sleep 300
    fi
    [ "$rc" -eq 0 ] && break
done
snapshot_commit

# --- 3. refreshed 4-spp held-out table with the extended weights -----------
LBF_FLAG=""
[ -d "$QDIR/ckpt_lbf" ] && LBF_FLAG="--lbf_checkpoint $QDIR/ckpt_lbf"
[ -d "$QDIR/ckpt_kpcn" ] && \
    LBF_FLAG="$LBF_FLAG --kpcn_checkpoint $QDIR/ckpt_kpcn"
if [ -d "$QDIR/test" ] && [ "$EVAL_SECONDS" -ge 600 ]; then
    timeout "$EVAL_SECONDS" python scripts/eval_suite.py \
        --data "$QDIR/test" --checkpoint "$QDIR/ckpt" \
        --output "$QDIR/eval4_ext" --spp 4 --tile_size 256 --tile_pad 0 \
        --verbose $LBF_FLAG >> "$LOG/eval4_ext.log" 2>&1
    echo "$(date +%T) extension eval4 rc=$?" >> "$LOG/driver.log"
    if [ -f "$QDIR/eval4_ext/metrics.csv" ]; then
        mkdir -p results/quality_r4
        cp -f "$QDIR/eval4_ext/metrics.csv" \
            results/quality_r4/metrics_4spp.csv
        cp -f "$QDIR/eval4_ext/metrics.md" \
            results/quality_r4/metrics_4spp.md 2>/dev/null
        git add results/quality_r4 && git commit -q -m \
            "Held-out 4spp quality table refreshed with extended weights" \
            || true
    fi
fi
echo "$(date +%T) extension complete" >> "$LOG/driver.log"
