#!/usr/bin/env python
"""Microbenchmark of the kernel_weighting op, forward + backward
(reference: scripts/profile/kernel_weighting.py)."""

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
    data = jnp.array(rng.randn(args.bs, 3, args.size, args.size), jnp.float32)
    wts = jnp.array(
        rng.randn(args.bs, args.ksize ** 2, args.size, args.size),
        jnp.float32)
    backend = args.backend

    fwd = jax.jit(lambda d, w: ops.kernel_weighting(d, w, backend=backend))
    bwd = jax.jit(jax.grad(
        lambda d, w: ops.kernel_weighting(d, w, backend=backend)[0].sum(),
        argnums=(0, 1)))

    for name, fn, arity in [("forward", fwd, 2), ("fwd+bwd", bwd, 2)]:
        out = jax.block_until_ready(fn(data, wts))  # warmup/compile
        for _ in range(args.warmup):
            out = fn(data, wts)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(data, wts)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        traffic = (wts.nbytes + data.nbytes) / 1e9
        print(f"kernel_weighting {name}: {dt * 1e3:.3f} ms "
              f"({traffic / dt:.0f}+ GB/s)")


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
