#!/usr/bin/env python
"""Headline benchmark: full-frame 1080p denoise throughput at 4 spp on one
chip (the BASELINE.json north-star metric), using the reference's tiled
inference protocol (scripts/denoise.py: overlap-tiled full frames,
wall-clock with device-sync fences).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference repo publishes no numbers (BASELINE.md), so ``vs_baseline``
is computed against a documented estimate of the reference CUDA/Halide
pipeline on a V100: the SBMC paper reports multi-second full-frame denoises
at 1080p-class resolutions; we use 0.5 frames/s as the V100 reference
point. This constant is an estimate, recorded here for transparency.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402
from sbmc_tpu.utils.platform import honor_env_platform  # noqa: E402

honor_env_platform()


V100_BASELINE_FPS = 0.5  # documented estimate, see module docstring

# Benchmark configuration: flagship model, reference demo-scale inputs.
# (Env overrides exist so the harness logic can be smoke-tested on CPU.)
H = int(os.environ.get("SBMC_BENCH_H", 1080))
W = int(os.environ.get("SBMC_BENCH_W", 1920))
SPP = int(os.environ.get("SBMC_BENCH_SPP", 4))
N_FEATURES = 93         # all sample features enabled (sbmc mode)
N_GLOBAL = 3
TILE_SIZE = int(os.environ.get("SBMC_BENCH_TILE", 1024))
TILE_PAD = int(os.environ.get("SBMC_BENCH_PAD", 256))
ITERS = int(os.environ.get("SBMC_BENCH_ITERS", 3))
KSIZE = int(os.environ.get("SBMC_BENCH_KSIZE", 21))


def main():
    import jax
    from sbmc_tpu.models import Multisteps
    from sbmc_tpu.parallel.tiles import split_tiles_uniform

    rng = np.random.RandomState(0)
    batch = {
        "radiance": rng.rand(1, SPP, 3, H, W).astype(np.float32),
        "features": rng.rand(1, SPP, N_FEATURES, H, W).astype(np.float32),
        "global_features": rng.rand(1, N_GLOBAL, 1, 1).astype(np.float32),
    }

    conv_dtype = "bfloat16" if os.environ.get("SBMC_BENCH_BF16") else None
    kernel_dtype = "bfloat16" if os.environ.get("SBMC_BENCH_BF16_KERNELS") \
        else None
    model = Multisteps(n_features=N_FEATURES, n_global_features=N_GLOBAL,
                       ksize=KSIZE, conv_dtype=conv_dtype,
                       kernel_dtype=kernel_dtype)

    def run(tile_size, tile_pad):
        # Uniform tiles: one compiled apply per tile shape; tiles run
        # back-to-back on the chip (a per-tile loop bounds peak HBM).
        stacked, _info = split_tiles_uniform(batch, tile=tile_size,
                                             pad=tile_pad)
        n_tiles = stacked["features"].shape[0]
        tiles = [{k: v[i:i + 1] for k, v in stacked.items()}
                 for i in range(n_tiles)]
        params = model.init(jax.random.PRNGKey(0), tiles[0])
        apply_fn = jax.jit(model.apply)

        def denoise_frame():
            outs = [apply_fn(params, tb)["radiance"] for tb in tiles]
            jax.block_until_ready(outs)
            return outs

        denoise_frame()  # warmup/compile (single tile shape)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            denoise_frame()
        return (time.perf_counter() - t0) / ITERS

    # Fall back to smaller tiles if the device runs out of memory.
    dt = None
    for tile_size, tile_pad in [(TILE_SIZE, TILE_PAD), (768, 192),
                                (512, 128)]:
        try:
            dt = run(tile_size, min(tile_pad, tile_size // 4))
            break
        except Exception as e:
            if "RESOURCE_EXHAUSTED" not in str(e) or tile_size == 512:
                raise
            print(f"# tile {tile_size} OOM, retrying smaller",
                  file=sys.stderr)
    assert dt is not None

    fps = 1.0 / dt
    print(json.dumps({
        "metric": "1080p_4spp_denoise_frames_per_sec_per_chip",
        "value": round(fps, 4),
        "unit": "frames/s",
        "vs_baseline": round(fps / V100_BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
