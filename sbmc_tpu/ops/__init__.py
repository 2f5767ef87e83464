"""Splat/gather operators with custom VJPs and backend dispatch.

Public API (mirrors the capability of the reference autograd layer,
sbmc/functions.py:39-115, on top of the Halide ops):

- ``kernel_weighting(data, weights) -> (output, sum_w)``: locally-weighted
  average with per-pixel ``k x k`` kernels, differentiable in both arguments
  with a hand-derived backward (``d_data`` reuses the forward kernel on
  transposed kernels; ``d_weights`` is a dedicated kernel).
- ``scatter2gather(weights)``: transposes splat kernels into gather kernels;
  self-adjoint, so its VJP applies the same op to the cotangent.

Backends:
- ``"pallas"``: Pallas TPU kernels (production path).
- ``"xla"``: pure-XLA oracle (portable fallback; also the test oracle).
- ``"pallas_interpret"``: Pallas kernels in interpreter mode (for testing the
  kernel logic off-TPU).

The default backend is ``"pallas"`` on TPU and ``"xla"`` elsewhere; override
globally with ``set_backend`` or per call with the ``backend=`` keyword.
"""

import functools

import jax
import jax.numpy as jnp

from sbmc_tpu.ops import reference
from sbmc_tpu.ops import pallas_kernels

__all__ = [
    "kernel_weighting",
    "scatter2gather",
    "scatter2gather_max",
    "kernel_weighting_exp",
    "progressive_splat_update",
    "set_backend",
    "get_backend",
]

_BACKEND = None  # None = auto-detect


def set_backend(backend):
    """Set the global op backend: 'pallas', 'xla', 'pallas_interpret' or
    None for auto-detection."""
    global _BACKEND
    if backend not in (None, "pallas", "xla", "pallas_interpret"):
        raise ValueError(f"unknown backend {backend!r}")
    _BACKEND = backend


def get_backend():
    if _BACKEND is not None:
        return _BACKEND
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def _kw_fwd_impl(data, weights, backend):
    if backend == "xla":
        return reference.kernel_weighting_ref(data, weights)
    return pallas_kernels.kernel_weighting_fwd_pallas(
        data, weights, interpret=(backend == "pallas_interpret"))


def _kw_dw_impl(data, d_output, d_sum_w, k2, backend):
    if backend == "xla":
        patches = reference.extract_patches(data, int(round(k2 ** 0.5)))
        dw = jnp.einsum("nckyx,ncyx->nkyx", patches, d_output)
        return dw + d_sum_w[:, None]
    return pallas_kernels.kernel_weighting_dw_pallas(
        data, d_output, d_sum_w, k2,
        interpret=(backend == "pallas_interpret"))


def _s2g_impl(weights, backend):
    if backend == "xla":
        return reference.scatter2gather_ref(weights)
    return pallas_kernels.scatter2gather_pallas(
        weights, interpret=(backend == "pallas_interpret"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _kernel_weighting(data, weights, backend):
    return _kw_fwd_impl(data, weights, backend)


def _kernel_weighting_fwd(data, weights, backend):
    out = _kw_fwd_impl(data, weights, backend)
    return out, (data, weights)


def _kernel_weighting_bwd(backend, res, cts):
    data, weights = res
    d_output, d_sum_w = cts
    # d_data is the forward op applied to the cotangent with the kernels
    # transposed to gather form (reference: src/kernel_weighting.cpp:93-105).
    d_data, _ = _kw_fwd_impl(d_output, _s2g_impl(weights, backend), backend)
    d_weights = _kw_dw_impl(data, d_output, d_sum_w, weights.shape[1], backend)
    return d_data, d_weights


_kernel_weighting.defvjp(_kernel_weighting_fwd, _kernel_weighting_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _scatter2gather(weights, backend):
    return _s2g_impl(weights, backend)


def _scatter2gather_fwd(weights, backend):
    return _s2g_impl(weights, backend), None


def _scatter2gather_bwd(backend, _, ct):
    # Self-adjoint (reference: sbmc/functions.py:62-71).
    return (_s2g_impl(ct, backend),)


_scatter2gather.defvjp(_scatter2gather_fwd, _scatter2gather_bwd)


def _s2g_max_impl(weights, backend):
    if backend == "xla":
        g = reference.scatter2gather_ref(weights)
        return g, jnp.max(g.astype(jnp.float32), axis=1)
    return pallas_kernels.scatter2gather_max_pallas(
        weights, interpret=(backend == "pallas_interpret"))


def _kw_exp_impl(data, logits, maxes, backend):
    if backend == "xla":
        return reference.kernel_weighting_ref(
            data, jnp.exp(logits.astype(jnp.float32) - maxes[:, None]))
    return pallas_kernels.kernel_weighting_exp_pallas(
        data, logits, maxes, interpret=(backend == "pallas_interpret"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _progressive_splat_update(data, klogits, sum_r, sum_w, max_w, backend):
    out, _res = _psu_fwd(data, klogits, sum_r, sum_w, max_w, backend)
    return out


def _psu_fwd(data, klogits, sum_r, sum_w, max_w, backend):
    if backend != "xla":
        # Fully-fused Pallas path: the kernel tensor crosses HBM exactly
        # once (gather-from-splat indexing + in-register online softmax).
        new_sum_r, new_sum_w, new_max = \
            pallas_kernels.progressive_splat_fused_pallas(
                data, klogits, sum_r, sum_w, max_w,
                interpret=(backend == "pallas_interpret"))
        scaler = jnp.exp(max_w - new_max)
        out = (new_sum_r, new_sum_w, new_max)
        return out, (data, klogits, new_max, scaler)
    g, kmax = _s2g_max_impl(klogits, backend)
    new_max = jnp.maximum(kmax[:, None], max_w)       # [bs, 1, h, w]
    scaler = jnp.exp(max_w - new_max)
    r, w = _kw_exp_impl(data, g, new_max[:, 0], backend)
    new_sum_r = sum_r * scaler + r
    new_sum_w = sum_w * scaler + w[:, None]
    out = (new_sum_r, new_sum_w, new_max)
    return out, (data, klogits, new_max, scaler)


def _psu_bwd(backend, res, cts):
    # The softmax shift (new_max/scaler) is treated as a constant: its
    # gradient contributions cancel exactly in the normalized output
    # sum_r / sum_w (softmax shift invariance; the flash-attention
    # stop-gradient-on-max argument), so dropping them reproduces the
    # reference autograd up to the 1e-8 normalizer epsilon.
    data, klogits, new_max, scaler = res
    d_sum_r_new, d_sum_w_new, _d_max = cts
    d_sum_r = d_sum_r_new * scaler
    d_sum_w = d_sum_w_new * scaler
    d_r = d_sum_r_new
    d_w = d_sum_w_new[:, 0]
    d_max_w = jnp.zeros_like(new_max)
    if backend != "xla":
        # Fused backward: two Pallas kernels whose flip/shift algebra puts
        # every halo on the small cotangent tensors, so the k^2-plane
        # logits stream is read blocked exactly once per kernel (the
        # composed path needs three scatter2gather HBM round trips).
        d_data, d_klogits = pallas_kernels.progressive_splat_bwd_pallas(
            data, klogits, new_max, d_r, d_w[:, None],
            interpret=(backend == "pallas_interpret"))
        return (d_data, d_klogits.astype(klogits.dtype), d_sum_r, d_sum_w,
                d_max_w)
    g, _ = _s2g_max_impl(klogits.astype(jnp.float32), backend)
    e = jnp.exp(g - new_max)
    d_data, _ = _kw_fwd_impl(d_r, _s2g_impl(e, backend), backend)
    d_e = _kw_dw_impl(data, d_r, d_w, klogits.shape[1], backend)
    d_klogits = _s2g_impl(e * d_e, backend).astype(klogits.dtype)
    return d_data, d_klogits, d_sum_r, d_sum_w, d_max_w


_progressive_splat_update.defvjp(_psu_fwd, _psu_bwd)


def progressive_splat_update(data, klogits, sum_r, sum_w, max_w,
                             backend=None):
    """One fused step of the progressive online-softmax splat accumulation.

    Equivalent to ``scatter2gather`` + tap-max + rescale + ``exp`` +
    ``kernel_weighting`` + accumulate (reference: sbmc/modules.py:417-473),
    but the transposed-kernel tensor makes a single HBM round trip: the tap
    max is produced inside the transpose kernel and the exponential is fused
    into the weighting kernel.

    Args:
      data: ``[bs, c, h, w]`` sample radiance.
      klogits: ``[bs, k2, h, w]`` raw splat-kernel logits.
      sum_r, sum_w, max_w: running state (``[bs, c, h, w]``,
        ``[bs, 1, h, w]``, ``[bs, 1, h, w]``).

    Returns:
      ``(sum_r', sum_w', max_w')``.
    """
    return _progressive_splat_update(data, klogits, sum_r, sum_w, max_w,
                                     backend or get_backend())


def scatter2gather_max(weights, backend=None):
    """Transpose splat->gather kernels and return the per-pixel tap max in
    the same pass. Not differentiable (used inside fused ops)."""
    return _s2g_max_impl(weights, backend or get_backend())


def kernel_weighting_exp(data, logits, maxes, backend=None):
    """Kernel weighting of ``exp(logits - maxes)`` with the exponential
    fused into the kernel. Not differentiable (used inside fused ops)."""
    return _kw_exp_impl(data, logits, maxes, backend or get_backend())


def kernel_weighting(data, weights, backend=None):
    """Locally-weighted average of ``data`` with per-pixel kernels.

    Args:
      data: ``[bs, c, h, w]`` input values.
      weights: ``[bs, k2, h, w]`` kernels; tap ``i`` unflattens to
        ``(dy, dx) = divmod(i, k)``; ``output[n, c, y, x] = sum_i
        weights[n, i, y, x] * data[n, c, y + dy - o, x + dx - o]``.

    Returns:
      ``(output [bs, c, h, w], sum_w [bs, h, w])`` where ``sum_w`` is the
      per-pixel sum of weights.
    """
    return _kernel_weighting(data, weights, backend or get_backend())


def scatter2gather(weights, backend=None):
    """Convert splat kernels to gather kernels (and vice versa).

    Weights at ``(y, x)`` for offset ``(dy, dx)`` move to
    ``(y + dy - o, x + dx - o)`` at the flipped tap ``(k-1-dy, k-1-dx)``.

    Args:
      weights: ``[bs, k2, h, w]``.

    Returns:
      ``[bs, k2, h, w]`` transposed kernels.
    """
    return _scatter2gather(weights, backend or get_backend())
