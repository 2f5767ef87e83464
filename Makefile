# Convenience targets (the role of the reference Makefile's test/demo
# targets, minus docker: this framework runs directly on the host/TPU).

DATA_DIR ?= /tmp/sbmc_tpu_demo/data
CKPT_DIR ?= /tmp/sbmc_tpu_demo/ckpt
OUT_DIR  ?= /tmp/sbmc_tpu_demo/output

.PHONY: test test-fast test-slow demo/data demo/train demo/denoise demo/eval \
	demo/visualize demo/train_kpcn demo/comparisons demo demo/parity \
	demo/pretrained bench

# Default suite: everything except interpret-mode Pallas runs (those are
# orders of magnitude slower than the oracle off-TPU; run `make test-slow`
# for the full matrix).
test:
	python -m pytest tests -q -m "not slow"

test-slow:
	python -m pytest tests -q

test-fast:
	python -m pytest tests -q -x -m "not slow" --ignore=tests/test_ops.py

# Generate a small synthetic dataset (no external renderer needed).
demo/data:
	python -c "from sbmc_tpu.data.synthetic import generate_dataset; \
	generate_dataset('$(DATA_DIR)/train', n_scenes=4, ts=64, tiles_per_side=2, spp=8, gt_spp=64, seed=0); \
	generate_dataset('$(DATA_DIR)/test', n_scenes=1, ts=64, tiles_per_side=2, spp=8, gt_spp=64, seed=123)"

# Train the SBMC model briefly on the synthetic data.
demo/train:
	python scripts/train.py $(DATA_DIR)/train $(CKPT_DIR) \
	  --spp 8 --bs 1 --max_steps 200 --log_interval 10 \
	  --checkpoint_interval 50

# Denoise the held-out scene with the trained checkpoint.
demo/denoise:
	python scripts/denoise.py --input $(DATA_DIR)/test \
	  --checkpoint $(CKPT_DIR) --output $(OUT_DIR)/4spp_ours/scene_0000.exr \
	  --spp 4

# Score the denoised output against the ground truth.
demo/eval:
	python - <<-'EOF'
	import os
	from sbmc_tpu.data import FullImagesDataset
	from sbmc_tpu.utils import exr
	d = FullImagesDataset("$(DATA_DIR)/test", spp=4)
	os.makedirs("$(OUT_DIR)/ref", exist_ok=True)
	exr.write("$(OUT_DIR)/ref/scene_0000.exr",
	          d[0]["target_image"].transpose(1, 2, 0), pixel_type="float")
	EOF
	python scripts/compute_metrics.py $(OUT_DIR)/ref /tmp/sbmc_tpu_demo/scores.csv \
	  --methods $(OUT_DIR)/4spp_ours --scenes scene_0000.exr --pad 4 \
	  --stats /tmp/sbmc_tpu_demo/stats.csv

# Dump target/low-spp PNGs (+ per-feature channels) from the demo data
# (reference: Makefile demo/visualize).
demo/visualize:
	python scripts/visualize_dataset.py $(DATA_DIR)/test \
	  $(OUT_DIR)/viz --spp 4 --dump_features

# Train the KPCN baseline briefly (reference: Makefile demo/train_kpcn).
demo/train_kpcn:
	python scripts/train.py $(DATA_DIR)/train $(CKPT_DIR)_kpcn \
	  --kpcn_mode --spp 8 --bs 1 --max_steps 50 --log_interval 10 \
	  --checkpoint_interval 25

# Run the native classical baselines on the held-out scene (reference:
# Makefile demo/comparisons, minus the dockerized external builds).
demo/comparisons:
	python scripts/denoise_baselines.py --input $(DATA_DIR)/test \
	  --output $(OUT_DIR)/4spp_nlm/scene_0000.exr --method nlm --spp 4
	python scripts/denoise_baselines.py --input $(DATA_DIR)/test \
	  --output $(OUT_DIR)/4spp_rpf/scene_0000.exr --method rpf --spp 4
	python scripts/denoise_baselines.py --input $(DATA_DIR)/test \
	  --output $(OUT_DIR)/4spp_nfor/scene_0000.exr --method nfor --spp 4

demo: demo/data demo/train demo/denoise demo/eval

# Denoise with the committed flagship weights (weights/flagship_f16, an
# f16 params-only snapshot exported by scripts/export_params.py — the
# reference's released-final.pth role, Makefile:187,213-217): rebuilds a
# loadable checkpoint from the snapshot, renders a small wavefront scene,
# denoises it. Works from a fresh clone with no training.
demo/pretrained: demo/data
	python scripts/export_params.py import weights/flagship_f16 \
	  $(CKPT_DIR)_pretrained
	python scripts/denoise.py --input $(DATA_DIR)/test \
	  --checkpoint $(CKPT_DIR)_pretrained \
	  --output $(OUT_DIR)/4spp_pretrained_ours/scene_0000.exr --spp 4

# One-command parity check against the reference's released pretrained
# weights (reference: Makefile:187,213-217). Blocked on this host only by
# missing network egress (PARITY.md); armed so it runs the moment the
# artifact is reachable (or dropped at $(PRETRAINED_DIR) manually).
REMOTE ?= https://data.csail.mit.edu/graphics/sbmc
PRETRAINED_DIR ?= /tmp/sbmc_tpu_demo/pretrained_models
demo/parity: demo/data
	python scripts/download.py $(REMOTE)/pretrained_models.zip \
	  $(PRETRAINED_DIR).zip --extract
	python scripts/convert_checkpoint.py \
	  $(PRETRAINED_DIR)/gharbi2019_sbmc/final.pth \
	  assets/parity/gharbi2019_sbmc_meta.json $(CKPT_DIR)_gharbi2019
	python scripts/denoise.py --input $(DATA_DIR)/test \
	  --checkpoint $(CKPT_DIR)_gharbi2019 \
	  --output $(OUT_DIR)/4spp_pretrained/scene_0000.exr --spp 4

bench:
	python bench.py
