#!/usr/bin/env python
"""Per-stage timing of the flagship Multisteps model on one tile.

Times each architectural stage of the SBMC model in isolation at the
headline bench tile shape (1216x768 strip, 4 spp, width 128, k=21),
using the tunnel-proof chain-timer protocol (see scripts/tpu_session.py):
the stage's *parameters* are perturbed by the loop carry (so the work
cannot be hoisted out of the scan) while the input tensor stays a
loop-invariant jit operand (so per-iteration HBM traffic matches what the
real model pays to read its input).

Stages (reference: sbmc/models.py:107-218 structure):
  embed      one per-sample embedding ConvChain (1x1, depth 3, width 128)
             over bs*spp images                       [x3 steps in model]
  unet       one propagation Autoencoder (3 levels, 3x3, width 128/256/512)
             over the reduced image                   [x3 steps in model]
  regress    kernel_regressor ConvChain (1x1 -> k^2 logits, NCHW epilogue)
             over bs*spp images                       [x1 in model]
  splat      the progressive splat scan over spp samples (Pallas fused
             kernel + online-softmax carry)           [x1 in model]
  model      the full Multisteps forward (cross-check: the stage sum plus
             reductions/broadcasts/resizes should approach this)

Usage:
  python scripts/profile/model_stages.py [--h 1216] [--w 768] [--spp 4]
         [--f32] [--iters 4]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import numpy as np  # noqa: E402

from sbmc_tpu.utils.platform import honor_env_platform  # noqa: E402

honor_env_platform()


def chain_timer(step_fn, init_carry, consts=(), iters=4):
    """Per-iteration seconds of ``carry, *consts -> carry`` chains."""
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames="k")
    def run(c0, cs, k):
        c, _ = jax.lax.scan(lambda c, _: (step_fn(c, *cs), None), c0, None,
                            length=k)
        leaves = jax.tree_util.tree_leaves(c)
        return sum(jnp.sum(l.ravel()[:1].astype(jnp.float32))
                   for l in leaves)

    def timed(k):
        t0 = time.perf_counter()
        float(run(init_carry, consts, k))
        return time.perf_counter() - t0

    timed(1)
    timed(1 + iters)
    t1 = min(timed(1) for _ in range(2))
    t2 = timed(1 + iters)
    return max(t2 - t1, 1e-9) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=1216)
    ap.add_argument("--w", type=int, default=768)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--ksize", type=int, default=21)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--stages", default="embed,unet,regress,splat,model")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from sbmc_tpu.models import Multisteps
    from sbmc_tpu.nn.layers import Autoencoder, ConvChain
    from sbmc_tpu.nn.kernel_apply import (progressive_init,
                                          progressive_kernel_apply)

    h, w, spp, width = args.h, args.w, args.spp, args.width
    k2 = args.ksize * args.ksize
    dt = None if args.f32 else "bfloat16"
    cdt = jnp.float32 if args.f32 else jnp.bfloat16
    key = jax.random.PRNGKey(0)
    print(f"# stage timings: {h}x{w} spp={spp} k={args.ksize} "
          f"dtype={'f32' if args.f32 else 'bf16'}", flush=True)

    def perturb(params, s):
        return jax.tree_util.tree_map(
            lambda p: p + (s * 1e-30).astype(p.dtype), params)

    def time_stage(name, mod, x_shape, n_repeat=1):
        x = jax.random.normal(key, x_shape, cdt)
        # Params are spatial-size independent: init on a tiny tile (a
        # full-size un-jitted init would allocate the f32 activations
        # eagerly — the regressor's 4x441xHxW f32 output OOMs the chip).
        tiny = x_shape[:1] + (32, 32) + x_shape[3:]
        params = mod.init(jax.random.PRNGKey(1), jnp.zeros(tiny, jnp.float32))

        def step(carry, x, params):
            y = mod.apply(perturb(params, carry), x)
            return y.ravel()[0].astype(jnp.float32)

        dt_s = chain_timer(step, jnp.float32(0.0), (x, params),
                           iters=args.iters)
        print(f"{name:10s} {dt_s*1e3:8.2f} ms/call  x{n_repeat} in model "
              f"= {dt_s*n_repeat*1e3:8.2f} ms", flush=True)
        return dt_s * n_repeat

    stages = args.stages.split(",")
    total = 0.0

    if "embed" in stages:
        # steps 1..n see [features(93) + propagated(width)] channels.
        emb = ConvChain(width, width=width, depth=3, ksize=1, pad=False,
                        dtype=dt, name="embedding")
        total += time_stage("embed", emb, (spp, h, w, 93 + width), 3)

    if "unet" in stages:
        unet = Autoencoder(width, num_levels=3, increase_factor=2.0,
                           num_convs=3, width=width, ksize=3,
                           output_type="leaky_relu", pooling="max", dtype=dt,
                           name="propagation")
        total += time_stage("unet", unet, (1, h, w, width), 3)

    if "regress" in stages:
        reg = ConvChain(k2, depth=3, width=width, ksize=1,
                        activation="leaky_relu", pad=False,
                        output_type="linear", dtype=dt, out_layout="NCHW",
                        name="kernel_regressor")
        total += time_stage("regress", reg, (spp, h, w, 2 * width), 1)

    if "splat" in stages:
        # The progressive splat scan alone: per-sample kernels from HBM
        # (the real model streams them out of the regressor's epilogue).
        kdt = jnp.float32 if args.f32 else jnp.bfloat16
        kern = jax.random.normal(key, (spp, 1, k2, h, w), kdt)
        rad = jax.random.normal(key, (spp, 1, 3, h, w), jnp.float32)

        def splat_step(carry, kern, rad):
            state = progressive_init(1, 3, h, w, jnp.float32)

            def body(st, xs):
                kk, rr = xs
                return progressive_kernel_apply(
                    rr, kk + carry.astype(kk.dtype) * 1e-30, st,
                    splat=True), None
            state, _ = jax.lax.scan(body, state, (kern, rad))
            return (state.sum_r.ravel()[0] / (state.sum_w.ravel()[0] + 1e-8)
                    ).astype(jnp.float32)

        dt_s = chain_timer(splat_step, jnp.float32(0.0), (kern, rad),
                           iters=args.iters)
        print(f"{'splat':10s} {dt_s*1e3:8.2f} ms/call  x1 in model "
              f"= {dt_s*1e3:8.2f} ms", flush=True)
        total += dt_s

    print(f"{'stage sum':10s} {'':8s}              = {total*1e3:8.2f} ms",
          flush=True)

    if "model" in stages:
        model = Multisteps(n_features=93, n_global_features=3,
                           ksize=args.ksize, conv_dtype=dt, kernel_dtype=dt)
        batch = {
            "radiance": jax.random.uniform(key, (1, spp, 3, h, w)),
            "features": jax.random.uniform(key, (1, spp, 93, h, w)),
            "global_features": jax.random.uniform(key, (1, 3, 1, 1)),
        }
        params = model.init(jax.random.PRNGKey(1), {
            k_: np.zeros(v.shape[:-2] + (min(v.shape[-2], 32),
                                         min(v.shape[-1], 32)), np.float32)
            for k_, v in batch.items()})

        def model_step(carry, batch, params):
            out = model.apply(perturb(params, carry), batch)["radiance"]
            return out.ravel()[0].astype(jnp.float32)

        dt_s = chain_timer(model_step, jnp.float32(0.0), (batch, params),
                           iters=args.iters)
        print(f"{'model':10s} {dt_s*1e3:8.2f} ms/tile "
              f"(unexplained: {(dt_s-total)*1e3:.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
