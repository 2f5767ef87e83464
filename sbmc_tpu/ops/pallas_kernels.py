"""Pallas TPU kernels for the splat/gather operators.

TPU-first design notes
----------------------

The three hot ops (reference: src/kernel_weighting.cpp, src/scatter2gather.cpp
— Halide generators with CUDA/CPU schedules) are all per-pixel stencils over a
``k x k`` tap window with per-pixel weights, so the FLOPs are VPU work (no
shared operand to feed the MXU) and the speed of light is HBM bandwidth on the
``k^2``-plane kernel tensor. The kernels below are structured accordingly:

- Layout is *spatial-last* (``[bs, c, h, w]`` / ``[bs, k2, h, w]``) so that
  the (8, 128) VPU tiles map onto image rows/columns, not onto the tiny
  3-channel radiance axis.
- The grid is ``(bs, h/TH, w/TW)``; each step streams the full
  ``(k^2, TH, TW)`` weight block for its tile through VMEM exactly once
  (double-buffered by the Pallas pipeline) — that block is the dominant HBM
  stream and is read/written exactly once, which is the bandwidth lower bound
  of the algorithm.
- The shifted ``data`` window (a halo band) is fetched with an explicit async
  DMA from an ``ANY``-space operand. Mosaic requires sublane-aligned slice
  offsets, so the DMA fetches ``(C, RH, RW)`` with ``RH/RW`` rounded up to
  the (8, 128) tile and all tap shifts are applied as *static* in-kernel
  slices (a fully unrolled ``k^2`` tap loop -> lane/sublane shifts, no
  dynamic-offset addressing anywhere). Over-fetch on the data stream is
  negligible: it is ``C=3`` planes vs ``k^2=441`` weight planes.

All kernels compute in float32 (radiance accumulation precision).
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "kernel_weighting_fwd_pallas",
    "kernel_weighting_exp_pallas",
    "kernel_weighting_dw_pallas",
    "scatter2gather_pallas",
    "scatter2gather_max_pallas",
    "progressive_splat_fused_pallas",
]


def _round_up(x, m):
    return ((x + m - 1) // m) * m


# A/B experiment knob for the splat kernels' hot transcendental: with
# SBMC_PALLAS_EXP2=1 every softmax exponential lowers as exp2(x*log2 e)
# (one extra vmult per tap) instead of exp(x) — a win iff Mosaic's exp is
# NOT already a scaled exp2 on the VPU's pow2 unit. Measure on chip via
# scripts/tpu_session.py; numerically equivalent up to 1-ulp rounding.
_USE_EXP2 = bool(os.environ.get("SBMC_PALLAS_EXP2"))
_LOG2E = 1.4426950408889634


def _vexp(x):
    """Softmax exponential in the splat kernels (see _USE_EXP2)."""
    if _USE_EXP2:
        return jnp.exp2(x * _LOG2E)
    return jnp.exp(x)


# Fused splat tap loop, staged variant (DEFAULT ON since the 2026-08-20
# on-chip A/B): the row-max pass stages each lane-shifted logits slice
# into an aligned VMEM scratch as it reads it, so the exp+FMA pass
# re-reads the taps lane-aligned instead of re-slicing the halo buffer
# at lane offsets dx in [0, k) — halving the misaligned reads on the
# dominant stream (every non-128-multiple lane offset costs a cross-lane
# VPU relayout). Measured at the 1080p/4spp headline tile: 1.6305 ->
# 1.7107 frames/s (585.6 ms/frame, -29 ms — matching the ~7 ms/step
# residual-gap accounting in PERF_TPU.md). SBMC_PSF_STAGED=0 opts back
# out for A/Bs.
_USE_PSF_STAGED = os.environ.get("SBMC_PSF_STAGED", "1") not in (
    "0", "false", "")


# v5e (and v4) cores have 128 MiB of VMEM, but the compiler's default
# *scoped* allowance for a custom kernel's working set is only 16 MiB —
# round 1's 1080p bench died on exactly that (22.03M > 16M at k=21,
# TH=8, TW=256). We size blocks against an explicit byte budget and raise
# the scoped limit to match via ``CompilerParams(vmem_limit_bytes=...)``,
# leaving headroom for XLA's own scoped buffers around the call.
_VMEM_LIMIT = 96 * 1024 * 1024


def _compiler_params():
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _pick_blocks(h, w, block_h, block_w, k2=1, streams=3, dtype=None):
    """(TH, TW) tile sizes aligned to the vector tile of ``dtype``
    ((8, 128) for f32, (16, 128) for bf16), sized so the kernel's VMEM
    working set stays within the scoped budget.

    ``streams`` is the kernel's VMEM multiplier on its dominant
    ``k2 x TH x TW`` buffer: double-buffered pipeline copies plus in-kernel
    temporaries (the fused-exp kernel measured 6.4x at k=21/TH=8/TW=256 on
    v5e, hence the conservative per-kernel values at the call sites).
    """
    sub = 16 if dtype == jnp.bfloat16 else 8
    itemsize = 2 if dtype == jnp.bfloat16 else 4
    if block_h is not None or block_w is not None:
        return (block_h if block_h is not None else sub,
                block_w if block_w is not None else (128 if w <= 256
                                                     else 256))
    # The width axis is padded up to a TW multiple, and the dominant
    # k2-plane stream pays for every padded column: at w=1056, TW=256
    # pads to 1280 (+21%) while TW=128 pads to 1152 (+9%). Prefer the
    # TW with the least padding (256 on ties: wider blocks amortize the
    # data-halo DMA, RW = TW + k - 1 rounded to 128). Same principle,
    # measured on the fused splat's wider tiles: 87.8 -> 77.0 ms at
    # 1184x1056/k21 (_psf_pick_tw, 2026-08-17).
    tw = 256 if _round_up(w, 256) <= _round_up(w, 128) else 128
    # Taller tiles amortize the halo overfetch; the v5e sweep
    # (scripts/tpu_session.py, 2026-08-16) measured TH=32 fastest for every
    # kernel that fits (kw_fwd 3.78 ms vs 3.97 at TH=8; kw_exp 3.52 vs 7.41).
    for th in (4 * sub, 2 * sub, sub):
        if streams * k2 * th * tw * itemsize <= _VMEM_LIMIT:
            return th, tw
    return sub, 128


def _ksize(k2):
    k = int(round(k2 ** 0.5))
    if k * k != k2 or k % 2 == 0:
        raise ValueError(f"tap count {k2} must be an odd square")
    return k


def _pad_halo(x, o, hp, wp, rh, rw, th, tw, fill=0):
    """Pad ``x`` (spatial-last) with ``fill`` so that for every tile origin
    ``(iy*TH, ix*TW)`` the aligned window ``[iy*TH : iy*TH+RH,
    ix*TW : ix*TW+RW]`` is in bounds and centered: padded[o + y] = x[y]."""
    h, w = x.shape[-2], x.shape[-1]
    pad = [(0, 0)] * (x.ndim - 2)
    pad.append((o, hp - th + rh - (h + o)))
    pad.append((o, wp - tw + rw - (w + o)))
    return jnp.pad(x, pad, constant_values=fill)


# ---------------------------------------------------------------------------
# kernel_weighting forward
# ---------------------------------------------------------------------------

def _kw_fwd_kernel(dp_ref, w_ref, out_ref, sw_ref, scratch, sem, *,
                   K, TH, TW, RH, RW):
    n = pl.program_id(0)
    iy = pl.program_id(1)
    ix = pl.program_id(2)

    cp = pltpu.make_async_copy(
        dp_ref.at[n, :, pl.ds(iy * TH, RH), pl.ds(ix * TW, RW)],
        scratch, sem)
    cp.start()

    w = w_ref[0].astype(jnp.float32)  # (K2, TH, TW); f32 accumulation
    sw_ref[0] = jnp.sum(w, axis=0)

    cp.wait()
    c = scratch.shape[0]
    acc = jnp.zeros((c, TH, TW), jnp.float32)
    for dy in range(K):
        band = scratch[:, dy:dy + TH, :]  # (C, TH, RW), static offset
        for dx in range(K):
            acc += w[dy * K + dx][None] * band[:, :, dx:dx + TW]
    out_ref[0] = acc


def kernel_weighting_fwd_pallas(data, weights, *, block_h=None, block_w=None,
                                interpret=False):
    """Forward kernel weighting on TPU.

    Args:
      data: ``[bs, c, h, w]`` float32.
      weights: ``[bs, k2, h, w]`` float32, tap ``i = dy*k + dx``.

    Returns:
      ``(output [bs, c, h, w], sum_w [bs, h, w])``.
    """
    bs, c, h, w = data.shape
    k2 = weights.shape[1]
    K = _ksize(k2)
    o = (K - 1) // 2
    TH, TW = _pick_blocks(h, w, block_h, block_w, k2=k2, streams=3,
                          dtype=weights.dtype)
    hp, wp = _round_up(h, TH), _round_up(w, TW)
    RH = _round_up(TH + K - 1, 8)
    RW = _round_up(TW + K - 1, 128)

    dp = _pad_halo(data, o, hp, wp, RH, RW, TH, TW)
    wts = jnp.pad(weights, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))

    grid = (bs, hp // TH, wp // TW)
    out, sum_w = pl.pallas_call(
        functools.partial(_kw_fwd_kernel, K=K, TH=TH, TW=TW, RH=RH, RW=RW),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, k2, TH, TW), lambda n, iy, ix: (n, 0, iy, ix),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, c, TH, TW), lambda n, iy, ix: (n, 0, iy, ix),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TH, TW), lambda n, iy, ix: (n, iy, ix),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bs, c, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((bs, hp, wp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((c, RH, RW), data.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(dp, wts)
    return out[:, :, :h, :w], sum_w[:, :h, :w]


# ---------------------------------------------------------------------------
# kernel_weighting with fused exp (the progressive-softmax hot path)
# ---------------------------------------------------------------------------

def _kw_exp_kernel(dp_ref, w_ref, m_ref, out_ref, sw_ref, scratch, sem, *,
                   K, TH, TW, RH, RW):
    n = pl.program_id(0)
    iy = pl.program_id(1)
    ix = pl.program_id(2)

    cp = pltpu.make_async_copy(
        dp_ref.at[n, :, pl.ds(iy * TH, RH), pl.ds(ix * TW, RW)],
        scratch, sem)
    cp.start()

    m = m_ref[0, 0]                       # (TH, TW)
    w = _vexp(w_ref[0].astype(jnp.float32) - m[None])   # fused softmax-exp
    sw_ref[0] = jnp.sum(w, axis=0)

    cp.wait()
    c = scratch.shape[0]
    acc = jnp.zeros((c, TH, TW), jnp.float32)
    for dy in range(K):
        band = scratch[:, dy:dy + TH, :]
        for dx in range(K):
            acc += w[dy * K + dx][None] * band[:, :, dx:dx + TW]
    out_ref[0] = acc


def kernel_weighting_exp_pallas(data, logits, maxes, *, block_h=None,
                                block_w=None, interpret=False):
    """Kernel weighting with the softmax exponential fused in:
    ``weights = exp(logits - maxes)`` is computed in VMEM per tile, so the
    exponentiated kernel tensor never round-trips HBM (the progressive
    online-softmax hot path, reference: sbmc/modules.py:439-465).

    Args:
      data: ``[bs, c, h, w]`` float32.
      logits: ``[bs, k2, h, w]`` float32 gather-kernel logits.
      maxes: ``[bs, h, w]`` float32 per-pixel running max.

    Returns:
      ``(output [bs, c, h, w], sum_w [bs, h, w])``.
    """
    bs, c, h, w = data.shape
    k2 = logits.shape[1]
    K = _ksize(k2)
    o = (K - 1) // 2
    TH, TW = _pick_blocks(h, w, block_h, block_w, k2=k2, streams=6.5,
                          dtype=logits.dtype)
    hp, wp = _round_up(h, TH), _round_up(w, TW)
    RH = _round_up(TH + K - 1, 8)
    RW = _round_up(TW + K - 1, 128)

    dp = _pad_halo(data, o, hp, wp, RH, RW, TH, TW)
    lg = jnp.pad(logits, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))
    mx = jnp.pad(maxes, ((0, 0), (0, hp - h), (0, wp - w)))[:, None]

    grid = (bs, hp // TH, wp // TW)
    out, sum_w = pl.pallas_call(
        functools.partial(_kw_exp_kernel, K=K, TH=TH, TW=TW, RH=RH, RW=RW),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, k2, TH, TW), lambda n, iy, ix: (n, 0, iy, ix),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TH, TW), lambda n, iy, ix: (n, 0, iy, ix),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, c, TH, TW), lambda n, iy, ix: (n, 0, iy, ix),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TH, TW), lambda n, iy, ix: (n, iy, ix),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bs, c, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((bs, hp, wp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((c, RH, RW), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(dp, lg, mx)
    return out[:, :, :h, :w], sum_w[:, :h, :w]


# ---------------------------------------------------------------------------
# kernel_weighting d_weights
# ---------------------------------------------------------------------------

def _kw_dw_kernel(dp_ref, dout_ref, dsw_ref, dw_ref, scratch, sem, *,
                  K, TH, TW, RH, RW):
    n = pl.program_id(0)
    iy = pl.program_id(1)
    ix = pl.program_id(2)

    cp = pltpu.make_async_copy(
        dp_ref.at[n, :, pl.ds(iy * TH, RH), pl.ds(ix * TW, RW)],
        scratch, sem)
    cp.start()
    dout = dout_ref[0]  # (C, TH, TW)
    dsw = dsw_ref[0]    # (TH, TW)
    cp.wait()
    for dy in range(K):
        band = scratch[:, dy:dy + TH, :]
        for dx in range(K):
            dw_ref[0, dy * K + dx] = dsw + jnp.sum(
                band[:, :, dx:dx + TW] * dout, axis=0)


def kernel_weighting_dw_pallas(data, d_output, d_sum_w, k2, *, block_h=None,
                               block_w=None, interpret=False):
    """``d_weights`` of kernel weighting (reference:
    src/kernel_weighting.cpp:107-117).

    ``d_weights[n, dy*k+dx, y, x] = d_sum_w[n, y, x] +
    sum_c data_pad[n, c, y+dy-o, x+dx-o] * d_output[n, c, y, x]``.

    Returns:
      ``d_weights [bs, k2, h, w]``.
    """
    bs, c, h, w = data.shape
    K = _ksize(k2)
    o = (K - 1) // 2
    TH, TW = _pick_blocks(h, w, block_h, block_w, k2=k2, streams=3)
    hp, wp = _round_up(h, TH), _round_up(w, TW)
    RH = _round_up(TH + K - 1, 8)
    RW = _round_up(TW + K - 1, 128)

    dp = _pad_halo(data, o, hp, wp, RH, RW, TH, TW)
    dout = jnp.pad(d_output, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))
    dsw = jnp.pad(d_sum_w, ((0, 0), (0, hp - h), (0, wp - w)))

    grid = (bs, hp // TH, wp // TW)
    dw = pl.pallas_call(
        functools.partial(_kw_dw_kernel, K=K, TH=TH, TW=TW, RH=RH, RW=RW),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, c, TH, TW), lambda n, iy, ix: (n, 0, iy, ix),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TH, TW), lambda n, iy, ix: (n, iy, ix),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k2, TH, TW),
                               lambda n, iy, ix: (n, 0, iy, ix),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bs, k2, hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((c, RH, RW), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(dp, dout, dsw)
    return dw[:, :, :h, :w]


# ---------------------------------------------------------------------------
# scatter2gather
# ---------------------------------------------------------------------------

def _s2g_kernel(wp_ref, out_ref, scratch, sems, *, K, TH, TW, RH, RW):
    n = pl.program_id(0)
    iy = pl.program_id(1)
    ix = pl.program_id(2)

    def fetch(dy, slot):
        # Source taps for output tap row dy are the flipped row (K-1-dy);
        # tap-dim offsets are on an untiled dim so dynamic values are fine,
        # spatial offsets are tile-aligned (reference:
        # src/scatter2gather.cpp:40-47).
        return pltpu.make_async_copy(
            wp_ref.at[n, pl.ds((K - 1 - dy) * K, K),
                      pl.ds(iy * TH, RH), pl.ds(ix * TW, RW)],
            scratch.at[slot], sems.at[slot])

    fetch(0, 0).start()
    for dy in range(K):
        slot = dy % 2
        if dy + 1 < K:
            fetch(dy + 1, 1 - slot).start()
        fetch(dy, slot).wait()
        for dx in range(K):
            out_ref[0, dy * K + dx] = \
                scratch[slot, K - 1 - dx, dy:dy + TH, dx:dx + TW]


def _s2g_max_kernel(wp_ref, out_ref, kmax_ref, scratch, sems, *,
                    K, TH, TW, RH, RW):
    n = pl.program_id(0)
    iy = pl.program_id(1)
    ix = pl.program_id(2)

    def fetch(dy, slot):
        return pltpu.make_async_copy(
            wp_ref.at[n, pl.ds((K - 1 - dy) * K, K),
                      pl.ds(iy * TH, RH), pl.ds(ix * TW, RW)],
            scratch.at[slot], sems.at[slot])

    fetch(0, 0).start()
    m = jnp.full((TH, TW), -jnp.inf, jnp.float32)
    for dy in range(K):
        slot = dy % 2
        if dy + 1 < K:
            fetch(dy + 1, 1 - slot).start()
        fetch(dy, slot).wait()
        for dx in range(K):
            v = scratch[slot, K - 1 - dx, dy:dy + TH, dx:dx + TW]
            out_ref[0, dy * K + dx] = v
            m = jnp.maximum(m, v.astype(jnp.float32))
    kmax_ref[0] = m


def scatter2gather_max_pallas(weights, *, block_h=None, block_w=None,
                              interpret=False):
    """Scatter-to-gather transpose that also emits the per-pixel max over
    the transposed taps in the same pass (saves the separate reduction pass
    of the progressive softmax, reference: sbmc/modules.py:429).

    Returns:
      ``(gather [bs, k2, h, w], kmax [bs, h, w])``.
    """
    bs, k2, h, w = weights.shape
    K = _ksize(k2)
    o = (K - 1) // 2
    dt = weights.dtype
    sub = 16 if dt == jnp.bfloat16 else 8
    TH, TW = _pick_blocks(h, w, block_h, block_w, k2=k2, streams=4, dtype=dt)
    hp, wp = _round_up(h, TH), _round_up(w, TW)
    RH = _round_up(TH + K - 1, sub)
    RW = _round_up(TW + K - 1, 128)

    wpad = _pad_halo(weights, o, hp, wp, RH, RW, TH, TW)

    grid = (bs, hp // TH, wp // TW)
    out, kmax = pl.pallas_call(
        functools.partial(_s2g_max_kernel, K=K, TH=TH, TW=TW, RH=RH, RW=RW),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, k2, TH, TW), lambda n, iy, ix: (n, 0, iy, ix),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TH, TW), lambda n, iy, ix: (n, iy, ix),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bs, k2, hp, wp), dt),
            jax.ShapeDtypeStruct((bs, hp, wp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, K, RH, RW), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(wpad)
    return out[:, :, :h, :w], kmax[:, :h, :w]


def scatter2gather_pallas(weights, *, block_h=None, block_w=None,
                          interpret=False):
    """Transpose splat kernels into gather kernels on TPU.

    Args:
      weights: ``[bs, k2, h, w]`` float32.

    Returns:
      ``[bs, k2, h, w]`` gather kernels.
    """
    bs, k2, h, w = weights.shape
    K = _ksize(k2)
    o = (K - 1) // 2
    dt = weights.dtype
    TH, TW = _pick_blocks(h, w, block_h, block_w, k2=k2, streams=4, dtype=dt)
    hp, wp = _round_up(h, TH), _round_up(w, TW)
    RH = _round_up(TH + K - 1, 16 if dt == jnp.bfloat16 else 8)
    RW = _round_up(TW + K - 1, 128)

    wpad = _pad_halo(weights, o, hp, wp, RH, RW, TH, TW)

    grid = (bs, hp // TH, wp // TW)
    out = pl.pallas_call(
        functools.partial(_s2g_kernel, K=K, TH=TH, TW=TW, RH=RH, RW=RW),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, k2, TH, TW),
                               lambda n, iy, ix: (n, 0, iy, ix),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bs, k2, hp, wp), dt),
        scratch_shapes=[
            pltpu.VMEM((2, K, RH, RW), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(wpad)
    return out[:, :, :h, :w]


# ---------------------------------------------------------------------------
# fully-fused progressive splat update
# ---------------------------------------------------------------------------

def _psf_kernel(dp_ref, lp_ref, sr_ref, sw_ref, mw_ref,
                or_ref, ow_ref, om_ref, dscr, wscr, *rest, K, TH, TW,
                RH, RW, STAGED=False):
    if STAGED:
        vscr, dsem, wsems = rest
    else:
        (dsem, wsems), vscr = rest, None
    n = pl.program_id(0)
    iy = pl.program_id(1)
    ix = pl.program_id(2)

    dcp = pltpu.make_async_copy(
        dp_ref.at[n, :, pl.ds(iy * TH, RH), pl.ds(ix * TW, RW)], dscr, dsem)
    dcp.start()

    def fetch(dy, slot):
        # Source planes for output tap row dy are the flipped row (K-1-dy),
        # exactly the scatter2gather indexing (src/scatter2gather.cpp:40-47)
        # — but here the transposed tensor never materializes in HBM.
        return pltpu.make_async_copy(
            lp_ref.at[n, pl.ds((K - 1 - dy) * K, K),
                      pl.ds(iy * TH, RH), pl.ds(ix * TW, RW)],
            wscr.at[slot], wsems.at[slot])

    fetch(0, 0).start()
    m = mw_ref[0, 0].astype(jnp.float32)        # (TH, TW) carry running max
    accw = jnp.zeros((TH, TW), jnp.float32)
    dcp.wait()
    c = dscr.shape[0]
    accr = jnp.zeros((c, TH, TW), jnp.float32)

    for dy in range(K):
        slot = dy % 2
        if dy + 1 < K:
            fetch(dy + 1, 1 - slot).start()
        fetch(dy, slot).wait()
        dband = dscr[:, dy:dy + TH, :]          # (C, TH, RW)
        # Pass 1: row max over this output-tap row (one rescale per row
        # instead of per tap keeps the online softmax cheap). In STAGED
        # mode each lane-shifted slice is written to an aligned scratch
        # as it is read, so pass 2 re-reads it without a second
        # cross-lane relayout (see _USE_PSF_STAGED).
        rowmax = m
        for dx in range(K):
            v = wscr[slot, K - 1 - dx, dy:dy + TH, dx:dx + TW]
            v = v.astype(jnp.float32)
            if STAGED:
                vscr[dx] = v
            rowmax = jnp.maximum(rowmax, v)
        s = _vexp(m - rowmax)
        accw = accw * s
        accr = accr * s[None]
        m = rowmax
        # Pass 2: accumulate this row's exponentiated taps.
        for dx in range(K):
            if STAGED:
                v = vscr[dx]
            else:
                v = wscr[slot, K - 1 - dx, dy:dy + TH,
                         dx:dx + TW].astype(jnp.float32)
            e = _vexp(v - m)
            accw += e
            accr += e[None] * dband[:, :, dx:dx + TW]

    scale = _vexp(mw_ref[0, 0].astype(jnp.float32) - m)
    or_ref[0] = sr_ref[0] * scale[None] + accr
    ow_ref[0, 0] = sw_ref[0, 0] * scale + accw
    om_ref[0, 0] = m


def _psf_pick_tw(w):
    """Lane-tile width minimizing the padded width (every padded column
    costs a full k^2-plane stream pass); ties go to the widest tile,
    which cuts the halo overfetch on the dominant logits stream. The old
    "widest that divides or is much smaller than w" rule picked TW=512
    at w=1056 (pad to 1536, +45% splat work — measured 87.8 vs 77.0 ms
    at 1184x1056/k21 on v5e, 2026-08-17)."""
    best_wp, best_tw = None, 256
    for tw in (512, 384, 256, 128):
        wp = _round_up(w, tw)
        if best_wp is None or wp < best_wp:
            best_wp, best_tw = wp, tw
    return best_tw


def progressive_splat_fused_pallas(data, logits, sum_r, sum_w, max_w, *,
                                   block_h=None, block_w=None,
                                   staged=None, interpret=False):
    """One fused step of the progressive online-softmax splat accumulation
    (reference semantics: sbmc/modules.py:417-473 = scatter2gather + tap max
    + exp + kernel_weighting + rescale-accumulate).

    The kernel gathers *directly from the splat logits* with the flipped
    shifted indexing of scatter2gather and keeps a running (max, sum)
    online softmax per pixel, so the ``k^2``-plane kernel tensor crosses
    HBM exactly once — vs three crossings for the composed path (s2g write,
    s2g read, exp read). The tap max is folded into the same pass
    (row-block rescaling, flash-attention style).

    Args:
      data: ``[bs, c, h, w]`` float32 sample radiance.
      logits: ``[bs, k2, h, w]`` raw splat-kernel logits (f32 or bf16).
      sum_r: ``[bs, c, h, w]`` running radiance sum.
      sum_w: ``[bs, 1, h, w]`` running weight sum.
      max_w: ``[bs, 1, h, w]`` running max.
      staged: stage lane-shifted tap slices through an aligned VMEM
        scratch between the max and exp passes (default: the
        ``SBMC_PSF_STAGED`` env knob; see ``_USE_PSF_STAGED``).

    Returns:
      ``(sum_r', sum_w', max_w')`` with the same shapes/dtypes (float32).
    """
    if staged is None:
        staged = _USE_PSF_STAGED
    bs, c, h, w = data.shape
    k2 = logits.shape[1]
    K = _ksize(k2)
    o = (K - 1) // 2
    dt = logits.dtype
    TH = block_h or 32
    TW = block_w or _psf_pick_tw(w)
    hp, wp = _round_up(h, TH), _round_up(w, TW)
    RH = _round_up(TH + K - 1, 8)
    RW = _round_up(TW + K - 1, 128)

    dp = _pad_halo(data, o, hp, wp, RH, RW, TH, TW)
    lp = _pad_halo(logits, o, hp, wp, RH, RW, TH, TW)

    def sp(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))

    scratches = [
        pltpu.VMEM((c, RH, RW), jnp.float32),
        pltpu.VMEM((2, K, RH, RW), dt),
    ]
    if staged:
        scratches.append(pltpu.VMEM((K, TH, TW), jnp.float32))
    scratches += [
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA((2,)),
    ]
    grid = (bs, hp // TH, wp // TW)
    out_r, out_w, out_m = pl.pallas_call(
        functools.partial(_psf_kernel, K=K, TH=TH, TW=TW, RH=RH, RW=RW,
                          STAGED=staged),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, c, TH, TW), lambda n, iy, ix: (n, 0, iy, ix),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TH, TW), lambda n, iy, ix: (n, 0, iy, ix),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TH, TW), lambda n, iy, ix: (n, 0, iy, ix),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, c, TH, TW), lambda n, iy, ix: (n, 0, iy, ix),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TH, TW), lambda n, iy, ix: (n, 0, iy, ix),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TH, TW), lambda n, iy, ix: (n, 0, iy, ix),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bs, c, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((bs, 1, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((bs, 1, hp, wp), jnp.float32),
        ],
        scratch_shapes=scratches,
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(dp, lp, sp(sum_r), sp(sum_w), sp(max_w))
    return (out_r[:, :, :h, :w], out_w[:, :, :h, :w], out_m[:, :, :h, :w])


# ---------------------------------------------------------------------------
# fused progressive splat backward
# ---------------------------------------------------------------------------
#
# The composed backward needs three scatter2gather HBM round trips of the
# k^2-plane tensor (e, s2g(e), s2g(e*d_e)). Substituting the transpose
# indexing into the gradient formulas eliminates every halo on the logits:
#
#   d_data[c, p]    = sum_j exp(L[flip j, p] - m[p - d_j]) * d_r[c, p - d_j]
#   d_klogits[t, p] = exp(L[t, p] - m[p + d_t])
#                     * (d_w[p + d_t] + sum_c data[c, p] * d_r[c, p + d_t])
#
# (L = splat logits, m = the forward's running max AFTER the update, d_j the
# tap displacement). Both kernels stream L exactly once as a *blocked* VMEM
# operand — the halos land on the (c+2)-plane cotangent/max tensors instead
# of the 441-plane logits.

def _psb_ddata_kernel(hal_ref, l_ref, out_ref, scratch, sem, *,
                      K, TH, TW, RH, RW):
    n = pl.program_id(0)
    iy = pl.program_id(1)
    ix = pl.program_id(2)

    cp = pltpu.make_async_copy(
        hal_ref.at[n, :, pl.ds(iy * TH, RH), pl.ds(ix * TW, RW)],
        scratch, sem)
    cp.start()
    lg = l_ref[0]                  # (K2, TH, TW) splat logits, blocked
    cp.wait()
    c = scratch.shape[0] - 1
    acc = jnp.zeros((c, TH, TW), jnp.float32)
    for dy in range(K):
        sy = K - 1 - dy            # slice for p - (dy - o)
        m_band = scratch[0, sy:sy + TH, :]        # (TH, RW)
        dr_band = scratch[1:, sy:sy + TH, :]      # (C, TH, RW)
        for dx in range(K):
            sx = K - 1 - dx
            flip = (K - 1 - dy) * K + (K - 1 - dx)
            e = _vexp(lg[flip].astype(jnp.float32)
                        - m_band[:, sx:sx + TW])
            acc += e[None] * dr_band[:, :, sx:sx + TW]
    out_ref[0] = acc


def _psb_dlogits_kernel(hal_ref, l_ref, d_ref, out_ref, scratch, sem, *,
                        K, TH, TW, RH, RW):
    n = pl.program_id(0)
    iy = pl.program_id(1)
    ix = pl.program_id(2)

    cp = pltpu.make_async_copy(
        hal_ref.at[n, :, pl.ds(iy * TH, RH), pl.ds(ix * TW, RW)],
        scratch, sem)
    cp.start()
    lg = l_ref[0]                  # (K2, TH, TW)
    dat = d_ref[0]                 # (C, TH, TW) data at p, blocked
    cp.wait()
    c = dat.shape[0]
    for dy in range(K):
        m_band = scratch[0, dy:dy + TH, :]
        dw_band = scratch[1, dy:dy + TH, :]
        dr_band = scratch[2:, dy:dy + TH, :]
        for dx in range(K):
            t = dy * K + dx
            e = _vexp(lg[t].astype(jnp.float32)
                        - m_band[:, dx:dx + TW])
            inner = dw_band[:, dx:dx + TW] + sum(
                dat[i] * dr_band[i, :, dx:dx + TW] for i in range(c))
            out_ref[0, t] = e * inner


def _psb_pick_tw(w, k2, lg_itemsize, th=32):
    """Backward tile width: like :func:`_psf_pick_tw` (minimize padded
    columns) but budget-checked. Unlike the forward — whose k2-plane
    logits stream through an ANY-space scratch — the backward has the
    logits as a *blocked* VMEM input and (for d_klogits) a blocked k2-plane
    f32 output, both double-buffered by the Pallas pipeline; at TW=512,
    k2=441, f32 that is ~115 MiB > the 96 MiB scoped limit."""
    def fits(tw):
        blocked = 2 * k2 * th * tw * (lg_itemsize + 4)
        return blocked <= int(0.85 * _VMEM_LIMIT)

    candidates = [tw for tw in (512, 384, 256, 128) if fits(tw)] or [128]
    best_wp, best_tw = None, candidates[-1]
    for tw in candidates:
        wp = _round_up(w, tw)
        if best_wp is None or wp < best_wp:
            best_wp, best_tw = wp, tw
    return best_tw


def progressive_splat_bwd_pallas(data, logits, new_max, d_r, d_w, *,
                                 block_h=None, block_w=None,
                                 interpret=False):
    """Backward of the fused progressive splat step (see module comment):
    returns ``(d_data, d_klogits)`` given the forward residuals.

    Args:
      data: ``[bs, c, h, w]``; logits: ``[bs, k2, h, w]`` splat logits.
      new_max: ``[bs, 1, h, w]`` the forward's updated running max.
      d_r: ``[bs, c, h, w]`` cotangent of the *incremental* radiance sum.
      d_w: ``[bs, 1, h, w]`` cotangent of the incremental weight sum.
    """
    bs, c, h, w = data.shape
    k2 = logits.shape[1]
    K = _ksize(k2)
    o = (K - 1) // 2
    TH = block_h or 32
    TW = block_w or _psb_pick_tw(w, k2, logits.dtype.itemsize, th=TH)
    hp, wp = _round_up(h, TH), _round_up(w, TW)
    RH = _round_up(TH + K - 1, 8)
    RW = _round_up(TW + K - 1, 128)

    def sp(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))

    # Out-of-image positions must contribute zero: pad m with +inf so
    # exp(L - inf) = 0 kills their taps; d_r/d_w zero-padded.
    mp = _pad_halo(new_max, o, hp, wp, RH, RW, TH, TW, fill=3e38)
    drp = _pad_halo(d_r, o, hp, wp, RH, RW, TH, TW)
    dwp = _pad_halo(d_w, o, hp, wp, RH, RW, TH, TW)

    grid = (bs, hp // TH, wp // TW)

    halo1 = jnp.concatenate([mp, drp], axis=1)   # (bs, 1+c, ...)
    d_data = pl.pallas_call(
        functools.partial(_psb_ddata_kernel, K=K, TH=TH, TW=TW, RH=RH,
                          RW=RW),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, k2, TH, TW), lambda n, iy, ix: (n, 0, iy, ix),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, TH, TW),
                               lambda n, iy, ix: (n, 0, iy, ix),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bs, c, hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1 + c, RH, RW), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(halo1, sp(logits))

    halo2 = jnp.concatenate([mp, dwp, drp], axis=1)  # (bs, 2+c, ...)
    d_klogits = pl.pallas_call(
        functools.partial(_psb_dlogits_kernel, K=K, TH=TH, TW=TW, RH=RH,
                          RW=RW),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, k2, TH, TW), lambda n, iy, ix: (n, 0, iy, ix),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, TH, TW), lambda n, iy, ix: (n, 0, iy, ix),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k2, TH, TW),
                               lambda n, iy, ix: (n, 0, iy, ix),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bs, k2, hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 + c, RH, RW), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(halo2, sp(logits), sp(data))

    return d_data[:, :, :h, :w], d_klogits[:, :, :h, :w]
