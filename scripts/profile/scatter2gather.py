#!/usr/bin/env python
"""Microbenchmark of the scatter2gather op, forward + backward
(reference: scripts/profile/scatter2gather.py)."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import numpy as np  # noqa: E402
from sbmc_tpu.utils.platform import honor_env_platform  # noqa: E402

honor_env_platform()



def main(args):
    import jax
    import jax.numpy as jnp
    from sbmc_tpu import ops

    rng = np.random.RandomState(0)
    wts = jnp.array(
        rng.randn(args.bs, args.ksize ** 2, args.size, args.size),
        jnp.float32)
    backend = args.backend

    fwd = jax.jit(lambda w: ops.scatter2gather(w, backend=backend))
    bwd = jax.jit(jax.grad(
        lambda w: ops.scatter2gather(w, backend=backend).sum()))

    for name, fn in [("forward", fwd), ("fwd+bwd", bwd)]:
        out = jax.block_until_ready(fn(wts))
        for _ in range(args.warmup):
            out = fn(wts)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(wts)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"scatter2gather {name}: {dt * 1e3:.3f} ms "
              f"({2 * wts.nbytes / 1e9 / dt:.0f} GB/s)")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--bs", type=int, default=4)
    parser.add_argument("--size", type=int, default=128)
    parser.add_argument("--ksize", type=int, default=21)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--warmup", type=int, default=5)
    parser.add_argument("--backend", default=None,
                        choices=[None, "pallas", "xla"])
    main(parser.parse_args())
