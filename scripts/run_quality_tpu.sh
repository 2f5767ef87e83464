#!/bin/bash
# Full quality run on one TPU chip: generate wavefront training data, train
# the flagship model at the paper config, and evaluate held-out scenes
# against the noisy input and the native baselines.
#
# The round-1 VERDICT's "quality evidence" protocol: done when the held-out
# PSNR/relMSE of `ours` strictly beats the 4spp noisy input
# (scripts/eval_suite.py writes the table).
#
# Each phase is resumable; artifacts land under $QDIR.

set -x
QDIR=${QDIR:-/tmp/qrun}
SCENES=${SCENES:-192}
TEST_SCENES=${TEST_SCENES:-12}
GT_SPP=${GT_SPP:-512}
STEPS=${STEPS:-20000}
mkdir -p "$QDIR"

# Phase 0: probe datagen throughput (sizes the run; see
# scripts/datagen_tpu_probe.py output in $QDIR/probe.log).
python scripts/datagen_tpu_probe.py 2>&1 | tee "$QDIR/probe.log"

# Phase 1: data (256x256 frames as 2x2 tiles of 128^2, 8 spp recorded).
python scripts/generate_training_data.py - - - "$QDIR/train" \
  --renderer wavefront --count "$SCENES" --spp 8 --gt_spp "$GT_SPP" \
  --width 256 --height 256 --tile_size 128 --verbose
python scripts/generate_training_data.py - - - "$QDIR/test" \
  --renderer wavefront --count "$TEST_SCENES" --spp 8 --gt_spp "$GT_SPP" \
  --width 256 --height 256 --tile_size 128 --start_index 100000 --verbose

# Phase 2: train at the paper config (ksize 21, width 128, randomized spp).
python scripts/train.py "$QDIR/train" "$QDIR/ckpt" \
  --spp 8 --ksize 21 --bs 4 --max_steps "$STEPS" \
  --log_interval 50 --checkpoint_interval 500 --num_worker_threads 4

# Phase 3: held-out evaluation at 4 spp.
python scripts/eval_suite.py --data "$QDIR/test" \
  --checkpoint "$QDIR/ckpt" --output "$QDIR/eval" --spp 4 \
  --tile_size 256 --tile_pad 0 --verbose
