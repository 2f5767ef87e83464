#!/usr/bin/env python
"""Instrumented wavefront-datagen probe: times compile vs per-tile render
vs fetch at increasing gt_spp so TPU data-generation throughput can be
sized before a long run (the tunnel gives no signal otherwise)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax

    from sbmc_tpu.render import pathtracer

    ts = int(os.environ.get("PROBE_TS", 128))
    rng = np.random.RandomState(0)
    scene = pathtracer.random_tracer_scene(rng)
    for spp, gt in [(2, 8), (8, 64), (8, 256), (8, 512)]:
        t0 = time.time()
        tile = pathtracer.render_tile_wavefront(
            scene, jax.random.PRNGKey(0), ts=ts, spp=spp, gt_spp=gt)
        t1 = time.time()
        print("spp=%d gt=%d ts=%d: first (compile+run+fetch) %.1fs"
              % (spp, gt, ts, t1 - t0), flush=True)
        tile = pathtracer.render_tile_wavefront(
            scene, jax.random.PRNGKey(1), ts=ts, spp=spp, gt_spp=gt)
        print("   steady tile: %.2fs (finite=%s)"
              % (time.time() - t1, bool(np.isfinite(tile.features).all())),
              flush=True)


if __name__ == "__main__":
    main()
