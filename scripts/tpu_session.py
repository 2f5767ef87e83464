#!/usr/bin/env python
"""TPU acceptance + performance session.

One self-contained run that, on a healthy TPU: (1) validates every Pallas
kernel (incl. the fused progressive-splat path) against a numpy oracle,
(2) micro-benchmarks the ops at demo and 1080p scales across tile sizes,
(3) times the full-model tiled 1080p denoise (the bench protocol), and
(4) runs a few real train steps. Prints a summary; used to (re)tune
kernel tile sizes whenever hardware is available.

Timing methodology: remote/tunneled TPU backends do not fence on
``block_until_ready`` and a host fetch costs a large fixed round trip, so
every measurement chains K iterations inside one jit (``lax.scan`` with a
data dependence between iterations) and reports the wall-clock difference
between a long and a short chain — fixed overhead cancels (same protocol
as bench.py).
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def np_patches(data, k):
    bs, c, h, w = data.shape
    o = (k - 1) // 2
    dp = np.pad(data, ((0, 0), (0, 0), (o, o), (o, o)))
    return np.stack([dp[:, :, dy:dy + h, dx:dx + w]
                     for dy in range(k) for dx in range(k)], 2)


def np_fwd(data, wts):
    k = int(round(wts.shape[1] ** 0.5))
    p = np_patches(data, k)
    return np.einsum("nkyx,nckyx->ncyx", wts, p), wts.sum(1)


def np_s2g(wts):
    bs, k2, h, w = wts.shape
    k = int(round(k2 ** 0.5))
    o = (k - 1) // 2
    wf = wts.reshape(bs, k, k, h, w)[:, ::-1, ::-1].reshape(bs, k2, h, w)
    wp = np.pad(wf, ((0, 0), (0, 0), (o, o), (o, o)))
    return np.stack([wp[:, dy * k + dx, dy:dy + h, dx:dx + w]
                     for dy in range(k) for dx in range(k)], 1)


def chain_timer(step_fn, init_carry, consts=(), iters=8):
    """Per-iteration seconds of ``carry, *consts -> carry`` via scan-chain
    timing.

    ``consts`` are loop-invariant operands passed as explicit jit arguments
    — closing over large concrete device arrays instead would embed them as
    graph constants and stall compilation.

    Compiles two chains (1 and 1+iters), runs each and fetches one scalar;
    returns ``(t_long - t_short) / iters``.
    """
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

    timed(1)              # compile short chain
    timed(1 + iters)      # compile long chain
    t1 = min(timed(1) for _ in range(2))
    t2 = timed(1 + iters)
    return max(t2 - t1, 1e-9) / iters


def validate(jax, jnp, ops):
    rng = np.random.RandomState(0)
    print("== correctness vs numpy oracle ==", flush=True)
    for k, h, w in [(3, 33, 150), (5, 16, 128), (21, 64, 130)]:
        data = rng.randn(1, 3, h, w).astype(np.float32)
        wts = rng.randn(1, k * k, h, w).astype(np.float32)
        dj, wj = jnp.array(data), jnp.array(wts)
        out_p, sw_p = jax.jit(
            lambda d, w: ops.kernel_weighting(d, w, backend="pallas"))(dj, wj)
        out_n, sw_n = np_fwd(data, wts)
        s_p = np.array(jax.jit(
            lambda w: ops.scatter2gather(w, backend="pallas"))(wj))
        s_n = np_s2g(wts)
        g_p, km_p = jax.jit(
            lambda w: ops.scatter2gather_max(w, backend="pallas"))(wj)
        dout = rng.randn(1, 3, h, w).astype(np.float32)
        dsw = rng.randn(1, h, w).astype(np.float32)

        def f(d, w):
            o_, s_ = ops.kernel_weighting(d, w, backend="pallas")
            return jnp.vdot(o_, dout) + jnp.vdot(s_, dsw)
        gp = jax.jit(jax.grad(f, argnums=(0, 1)))(dj, wj)
        gd_n = np_fwd(dout, np_s2g(wts))[0]
        gw_n = np.einsum("nckyx,ncyx->nkyx", np_patches(data, k),
                         dout) + dsw[:, None]

        # fused progressive update vs composed numpy
        sr0 = rng.randn(1, 3, h, w).astype(np.float32)
        sw0 = np.abs(rng.randn(1, 1, h, w)).astype(np.float32)
        mw0 = rng.randn(1, 1, h, w).astype(np.float32)
        fsr, fsw, fmw = jax.jit(
            lambda *a: ops.progressive_splat_update(*a, backend="pallas"))(
            dj, wj, jnp.array(sr0), jnp.array(sw0), jnp.array(mw0))
        g_n = np_s2g(wts)
        km_n = g_n.max(1, keepdims=True)
        nm_n = np.maximum(km_n, mw0)
        sc_n = np.exp(mw0 - nm_n)
        e_n = np.exp(g_n - nm_n)
        r_n, w_n = np_fwd(data, e_n)
        fsr_n = sr0 * sc_n + r_n
        fsw_n = sw0 * sc_n + w_n[:, None]

        def md(a, b):
            return float(np.abs(np.array(a) - b).max())
        print(f" k={k} {h}x{w}: fwd {md(out_p, out_n):.2e}"
              f" sw {md(sw_p, sw_n):.2e} s2g {md(s_p, s_n):.2e}"
              f" s2gmax {md(km_p, km_n[:,0]):.2e}"
              f" gd {md(gp[0], gd_n):.2e} gw {md(gp[1], gw_n):.2e}"
              f" fused_r {md(fsr, fsr_n):.2e} fused_w {md(fsw, fsw_n):.2e}",
              flush=True)


def validate_bwd(jax, jnp, ops):
    """Gradcheck the FUSED progressive-splat backward (the training
    default) against the composed numpy derivation, at k=21 and a width
    that exercises the VMEM-budgeted backward tile pick (_psb_pick_tw
    landed during the round-2 tunnel outage with no on-chip run)."""
    rng = np.random.RandomState(1)
    print("== fused progressive backward vs numpy oracle ==", flush=True)
    for k, h, w in [(5, 16, 128), (21, 32, 640)]:
        data = rng.randn(1, 3, h, w).astype(np.float32)
        lg = rng.randn(1, k * k, h, w).astype(np.float32)
        sr0 = rng.randn(1, 3, h, w).astype(np.float32)
        sw0 = np.abs(rng.randn(1, 1, h, w)).astype(np.float32)
        mw0 = rng.randn(1, 1, h, w).astype(np.float32)
        ct_r = rng.randn(1, 3, h, w).astype(np.float32)
        ct_w = rng.randn(1, 1, h, w).astype(np.float32)

        def f(d, l):
            sr, sw, _ = ops.progressive_splat_update(
                d, l, jnp.array(sr0), jnp.array(sw0), jnp.array(mw0),
                backend="pallas")
            return jnp.vdot(sr, ct_r) + jnp.vdot(sw, ct_w)

        gd, gl = jax.jit(jax.grad(f, argnums=(0, 1)))(
            jnp.array(data), jnp.array(lg))

        # Composed numpy derivation (the VJP treats the softmax shift as a
        # constant; see ops._psu_bwd).
        g = np_s2g(lg)
        new_max = np.maximum(g.max(1, keepdims=True), mw0)
        e = np.exp(g - new_max)
        d_r, d_w = ct_r, ct_w[:, 0]
        gd_n = np_fwd(d_r, np_s2g(e))[0]
        d_e_n = np.einsum("nckyx,ncyx->nkyx", np_patches(data, k),
                          d_r) + d_w[:, None]
        gl_n = np_s2g(e * d_e_n)

        def md(a, b):
            return float(np.abs(np.array(a) - b).max())
        print(f" k={k} {h}x{w}: d_data {md(gd, gd_n):.2e} "
              f"d_logits {md(gl, gl_n):.2e}", flush=True)


def bench_ops(jax, jnp, ops, pallas_kernels):
    import jax
    print("== op micro-benchmarks (k=21, scan-chain timing) ==", flush=True)
    for bs, h, w in [(4, 512, 512), (1, 1088, 1920)]:
        # Generate on device: multi-GB host uploads stall on tunneled links.
        k0, k1 = jax.random.split(jax.random.PRNGKey(0))
        data = jax.random.normal(k0, (bs, 3, h, w), jnp.float32)
        wts = jax.random.normal(k1, (bs, 441, h, w), jnp.float32)
        nbytes = wts.size * 4

        def report(name, dt):
            gbs = nbytes / 1e9 / dt
            print(f"  {name} {bs}x{h}x{w}: {dt*1e3:7.2f} ms"
                  f" ({gbs:5.0f} GB/s per kernel-tensor pass)", flush=True)

        # kw_fwd across block heights: chain via data' = out.
        for bh in (None, 8, 16, 32):
            try:
                def step(d, w, bh=bh):
                    out, _ = pallas_kernels.kernel_weighting_fwd_pallas(
                        d, w, block_h=bh)
                    return out
                report(f"kw_fwd  bh={bh}", chain_timer(step, data, (wts,)))
            except Exception as e:
                print(f"  kw_fwd bh={bh} failed: {str(e)[:80]}", flush=True)

        # fused-exp kernel (the inference hot path): chain via data' = out.
        maxes = jnp.zeros((bs, h, w))
        for bh in (None, 8, 16, 32):
            try:
                def step(d, w, m, bh=bh):
                    out, _ = pallas_kernels.kernel_weighting_exp_pallas(
                        d, w, m, block_h=bh)
                    return out
                report(f"kw_exp  bh={bh}",
                       chain_timer(step, data, (wts, maxes)))
            except Exception as e:
                print(f"  kw_exp bh={bh} failed: {str(e)[:80]}", flush=True)

        # s2g / s2g+max: chain via weights' = out.
        try:
            report("s2g        ", chain_timer(
                lambda w: ops.scatter2gather(w, backend="pallas"), wts))
            report("s2g_max    ", chain_timer(
                lambda w: ops.scatter2gather_max(w, backend="pallas")[0],
                wts))
        except Exception as e:
            print(f"  s2g failed: {str(e)[:80]}", flush=True)

        # d_weights kernel: chain via d_output' = dw[:, :3].
        try:
            def step(dout, d):
                dw = pallas_kernels.kernel_weighting_dw_pallas(
                    d, dout, dout[:, 0], 441)
                return dw[:, :3]
            report("kw_dw      ", chain_timer(step, data, (data,)))
        except Exception as e:
            print(f"  kw_dw failed: {str(e)[:80]}", flush=True)

        # Fused progressive splat step: the state is a natural carry.
        try:
            st = (jnp.zeros((bs, 3, h, w)), jnp.zeros((bs, 1, h, w)),
                  jnp.full((bs, 1, h, w), -1e30))

            def step(c, d, w):
                return ops.progressive_splat_update(d, w, *c,
                                                    backend="pallas")
            report("fused_step ", chain_timer(step, st, (data, wts)))

            from sbmc_tpu.nn.kernel_apply import (ProgressiveState,
                                                  progressive_kernel_apply)

            def step_u(c, d, w):
                return tuple(progressive_kernel_apply(
                    d, w, ProgressiveState(*c), splat=True,
                    fused=False))
            report("unfused    ", chain_timer(step_u, st, (data, wts)))

            def step_f(c, d, w):
                return pallas_kernels.progressive_splat_fused_pallas(
                    d, w, *c)
            st4 = (st[0], st[1], st[2])
            report("fullyfused ", chain_timer(step_f, st4, (data, wts)))

            # Fused progressive-splat BACKWARD (the training hot path;
            # round-2 landed it during the outage with no on-chip
            # timing). Consume both outputs so neither pallas_call is
            # dead-code-eliminated; d_klogits dominates (k2-plane
            # blocked output).
            nmax = jnp.zeros((bs, 1, h, w))

            def step_b(c, w, m):
                dd, dl = pallas_kernels.progressive_splat_bwd_pallas(
                    c, w, m, c, c[:, :1])
                return dd + dl[:, :3]
            report("fused_bwd  ", chain_timer(step_b, data, (wts, nmax)))

            # exp-vs-exp2 lowering A/B on the same kernel (the flag is
            # read at trace time, so flipping the module global and
            # tracing a fresh callable compiles the exp2 variant).
            exp2_prev = pallas_kernels._USE_EXP2
            pallas_kernels._USE_EXP2 = True
            try:
                def step_f2(c, d, w):
                    return pallas_kernels.progressive_splat_fused_pallas(
                        d, w, *c)
                report("fused_exp2 ", chain_timer(step_f2, st4,
                                                  (data, wts)))
            finally:
                pallas_kernels._USE_EXP2 = exp2_prev

            # Staged-tap A/B (SBMC_PSF_STAGED): the max pass writes each
            # lane-shifted logits slice to an aligned VMEM scratch so the
            # exp pass re-reads it without a second cross-lane relayout —
            # the "shift the accumulator, not the operand" experiment from
            # PERF_TPU's residual-gap accounting. f32 and bf16 logits.
            def step_fs(c, d, w):
                return pallas_kernels.progressive_splat_fused_pallas(
                    d, w, *c, staged=True)
            report("fusedstaged", chain_timer(step_fs, st4, (data, wts)))
            wts16 = wts.astype(jnp.bfloat16)

            def step_f16(c, d, w):
                return pallas_kernels.progressive_splat_fused_pallas(
                    d, w, *c)

            def step_fs16(c, d, w):
                return pallas_kernels.progressive_splat_fused_pallas(
                    d, w, *c, staged=True)
            report("fused_bf16 ", chain_timer(step_f16, st4, (data, wts16)))
            report("fstaged_b16", chain_timer(step_fs16, st4,
                                              (data, wts16)))

            # Tile-height sweep: the TH=32 default came from the blocked
            # -VMEM kernels' sweep, but the fused kernel's logits stream
            # through ANY-space scratch, so taller tiles fit easily and
            # cut the halo overfetch on the dominant stream
            # ((RH*RW)/(TH*TW): 2.03x at TH=32/TW=512 -> 1.64x at 64 ->
            # 1.44x at 128). Wider lanes (TW=1024) only where the frame
            # width doesn't pad.
            geoms = [(64, None), (128, None)]
            if -(-w // 1024) * 1024 == -(-w // 512) * 512:
                # TW=1024 pads no more than 512 at this width (e.g.
                # w=1920 -> 2048 either way) but halves the lane halo.
                geoms += [(None, 1024), (64, 1024)]
            for gh, gw in geoms:
                def step_g(c, d, wt, gh=gh, gw=gw):
                    return pallas_kernels.progressive_splat_fused_pallas(
                        d, wt, *c, block_h=gh, block_w=gw)
                try:
                    report(f"ff_th{gh or 32}_tw{gw or 'auto'}",
                           chain_timer(step_g, st4, (data, wts16)))
                except Exception as e:
                    print(f"  ff_th{gh}_tw{gw} failed: {str(e)[:80]}",
                          flush=True)
        except Exception as e:
            print(f"  fused failed: {str(e)[:80]}", flush=True)


def model_variants(jax, jnp):
    """Time the flagship model per 512^2 4spp tile across precision
    variants to pick bench defaults."""
    print("== full-model variants (512^2, 4 spp, one tile, chain timing) ==",
          flush=True)
    from sbmc_tpu.models import Multisteps
    rng = np.random.RandomState(0)
    batch = {
        "radiance": jnp.array(rng.rand(1, 4, 3, 512, 512), jnp.float32),
        "features": jnp.array(rng.rand(1, 4, 93, 512, 512), jnp.float32),
        "global_features": jnp.array(rng.rand(1, 3, 1, 1), jnp.float32),
    }
    for name, kw in [
            ("f32", {}),
            ("conv_bf16", {"conv_dtype": "bfloat16"}),
            ("kernel_bf16", {"kernel_dtype": "bfloat16"}),
            ("both_bf16", {"conv_dtype": "bfloat16",
                           "kernel_dtype": "bfloat16"})]:
        try:
            model = Multisteps(n_features=93, n_global_features=3, **kw)
            params = model.init(jax.random.PRNGKey(0), batch)

            def step(acc, p, b):
                b = dict(b)
                b["global_features"] = b["global_features"] + acc * 1e-30
                out = model.apply(p, b)["radiance"]
                return acc + jnp.mean(out)

            dt = chain_timer(step, jnp.float32(0), (params, batch), iters=4)
            print(f"  {name:12s}: {dt*1e3:7.1f} ms/tile", flush=True)
        except Exception as e:
            print(f"  {name:12s}: FAILED {str(e)[:100]}", flush=True)


def bench_model(jax, jnp):
    print("== full-model 1080p 4spp tiled denoise ==", flush=True)
    import subprocess
    out = subprocess.check_output(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..",
                                      "bench.py")])
    print(" ", out.decode().strip(), flush=True)


def train_steps(jax, jnp):
    """Real train-step timing at the paper config (ksize=21, width=128,
    nsteps=3) on synthetic data: difference between an 11-step and a 1-step
    enqueue burst (single fetch each) isolates device step time."""
    print("== train steps (synthetic, paper config) ==", flush=True)
    import tempfile

    from sbmc_tpu.data import Loader, TilesDataset
    from sbmc_tpu.data.synthetic import generate_dataset
    from sbmc_tpu.models import Multisteps
    from sbmc_tpu.train import DenoiserInterface

    d = tempfile.mkdtemp()
    generate_dataset(d, n_scenes=1, ts=128, tiles_per_side=1, spp=8,
                     gt_spp=32, seed=0)
    data = TilesDataset(d, spp=8)
    loader = Loader(data, batch_size=4, shuffle=True, num_threads=2,
                    drop_last=False)
    model = Multisteps(n_features=data.num_features,
                       n_global_features=data.num_global_features)
    iface = DenoiserInterface(model)
    batch = next(iter(loader))
    state = iface.init(jax.random.PRNGKey(0), batch)
    t0 = time.perf_counter()
    state, m = iface.train_step(state, batch)
    loss0 = float(m["loss"])
    print("  first step (compile+run): %.1f s, loss %.5f"
          % (time.perf_counter() - t0, loss0), flush=True)

    def burst(n):
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(n):
            state, m = iface.train_step(state, batch)
        float(m["loss"])
        return time.perf_counter() - t0

    burst(1)
    t1 = min(burst(1) for _ in range(2))
    t10 = burst(11)
    print("  steady step (bs=4, 128^2, 8 spp, ksize 21): %.1f ms"
          % ((t10 - t1) / 10 * 1e3), flush=True)


def main(args):
    import jax
    import jax.numpy as jnp

    from sbmc_tpu import ops
    from sbmc_tpu.ops import pallas_kernels

    print("devices:", jax.devices(), flush=True)
    if args.validate:
        validate(jax, jnp, ops)
        validate_bwd(jax, jnp, ops)
    if args.bench_ops:
        bench_ops(jax, jnp, ops, pallas_kernels)
    if args.train:
        train_steps(jax, jnp)
    if args.model_variants:
        model_variants(jax, jnp)
    if args.bench_model:
        bench_model(jax, jnp)
    print("TPU_SESSION_DONE", flush=True)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--validate", action="store_true", default=True)
    parser.add_argument("--no-validate", dest="validate",
                        action="store_false")
    parser.add_argument("--bench_ops", action="store_true", default=True)
    parser.add_argument("--no-bench_ops", dest="bench_ops",
                        action="store_false")
    parser.add_argument("--train", action="store_true", default=True)
    parser.add_argument("--no-train", dest="train", action="store_false")
    parser.add_argument("--bench_model", action="store_true", default=True)
    parser.add_argument("--no-bench_model", dest="bench_model",
                        action="store_false")
    parser.add_argument("--model_variants", action="store_true",
                        default=True)
    parser.add_argument("--no-model_variants", dest="model_variants",
                        action="store_false")
    main(parser.parse_args())
