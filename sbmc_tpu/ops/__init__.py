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
