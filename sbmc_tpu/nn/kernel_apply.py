"""Kernel application operators (reference: sbmc/modules.py:323-473).

``kernel_apply`` is the one-shot version (used by KPCN), and
``progressive_kernel_apply`` is the streaming online-softmax accumulator that
lets the SBMC model add per-sample splat contributions with O(1) memory in
the sample count — the same numerically-stable trick as flash-attention
accumulation. The JAX formulation replaces the reference's stateful python
loop with an explicit carry ``(sum_r, sum_w, max_w)`` suitable for
``lax.scan``; a zero-initialized carry (``max_w = -1e30``) makes the update
rule exactly reproduce the reference's separate init step.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from sbmc_tpu import ops

__all__ = [
    "KernelApply",
    "ProgressiveKernelApply",
    "ProgressiveState",
    "kernel_apply",
    "progressive_kernel_apply",
    "progressive_init",
]

_NEG_INF = -1e30  # finite stand-in for -inf: exp(x - _NEG_INF) == 0 in f32


class ProgressiveState(NamedTuple):
    """Running accumulators of the progressive (online softmax) apply."""
    sum_r: jax.Array  # [bs, c, h, w]
    sum_w: jax.Array  # [bs, 1, h, w]
    max_w: jax.Array  # [bs, 1, h, w]


def kernel_apply(data, kernels, softmax=True, splat=True, backend=None):
    """Apply per-pixel kernels to data (reference: sbmc/modules.py:323-361).

    Args:
      data: ``[bs, c, h, w]``.
      kernels: ``[bs, k2, h, w]`` flat kernels.
      softmax: softmax-normalize contributions per output pixel.
      splat: if True the kernels are splat kernels; they are transposed to
        gather form before application.

    Returns:
      ``(output [bs, c, h, w], sum_w [bs, 1, h, w])``.
    """
    if splat:
        kernels = ops.scatter2gather(kernels, backend=backend)
    if softmax:
        kernels = jax.nn.softmax(kernels, axis=1)
    output, sum_w = ops.kernel_weighting(data, kernels, backend=backend)
    return output, sum_w[:, None]


def progressive_init(bs, c, h, w, dtype=jnp.float32):
    """Zero-initialized carry; feeding it to ``progressive_kernel_apply``
    reproduces the reference's initialization step exactly."""
    return ProgressiveState(
        sum_r=jnp.zeros((bs, c, h, w), dtype),
        sum_w=jnp.zeros((bs, 1, h, w), dtype),
        max_w=jnp.full((bs, 1, h, w), _NEG_INF, dtype),
    )


def progressive_kernel_apply(data, kernels, state, splat=False, valid=None,
                             backend=None, fused=True):
    """Add one sample's kernel-weighted contribution to the running sums.

    The final reconstruction is ``state.sum_r / state.sum_w``; kernels are
    softmax-normalized across *all* taps of *all* samples via the running-max
    rescaling (reference: sbmc/modules.py:364-473).

    Args:
      data: ``[bs, c, h, w]`` this sample's values.
      kernels: ``[bs, k2, h, w]`` raw kernel logits.
      state: ``ProgressiveState`` (use :func:`progressive_init` to start).
      splat: transpose splat kernels to gather form first.
      valid: optional ``[bs]`` bool; invalid samples contribute exactly zero
        and leave the state unchanged (used to pad variable-spp batches to a
        static sample count).

    Returns:
      Updated ``ProgressiveState``.
    """
    if splat and fused:
        # Fused path: single HBM round trip for the transposed kernels
        # (transpose + tap-max + exp + weighting in two Pallas kernels).
        # Masked samples are handled by selecting the old state wholesale,
        # which is exactly "contribute nothing".
        sum_r, sum_w, max_w = ops.progressive_splat_update(
            data, kernels, state.sum_r, state.sum_w, state.max_w,
            backend=backend)
        new_state = ProgressiveState(sum_r=sum_r, sum_w=sum_w, max_w=max_w)
        if valid is None:
            return new_state
        v = valid.reshape(valid.shape + (1, 1, 1))
        return ProgressiveState(
            sum_r=jnp.where(v, new_state.sum_r, state.sum_r),
            sum_w=jnp.where(v, new_state.sum_w, state.sum_w),
            max_w=jnp.where(v, new_state.max_w, state.max_w),
        )

    if splat:
        kernels = ops.scatter2gather(kernels, backend=backend)
    if valid is not None:
        v = valid.reshape(valid.shape + (1,) * (kernels.ndim - valid.ndim))
        kernels = jnp.where(v, kernels, _NEG_INF)
    kmax = jnp.max(kernels, axis=1, keepdims=True)  # [bs, 1, h, w]

    new_max = jnp.maximum(kmax, state.max_w)
    scaler = jnp.exp(state.max_w - new_max)
    kexp = jnp.exp(kernels - new_max)
    new_r, new_w = ops.kernel_weighting(data, kexp, backend=backend)
    sum_r = state.sum_r * scaler + new_r
    sum_w = state.sum_w * scaler + new_w[:, None]
    return ProgressiveState(sum_r=sum_r, sum_w=sum_w, max_w=new_max)


class KernelApply:
    """Object-style wrapper matching the reference module's interface."""

    def __init__(self, softmax=True, splat=True):
        self.softmax = softmax
        self.splat = splat

    def __call__(self, data, kernels):
        return kernel_apply(data, kernels, softmax=self.softmax,
                            splat=self.splat)


class ProgressiveKernelApply:
    """Object-style wrapper matching the reference module's interface.

    Call with ``state=None`` for the first sample (initialization), then
    thread the returned state through subsequent calls.
    """

    def __init__(self, splat=False):
        self.splat = splat

    def __call__(self, data, kernels, state=None, valid=None):
        if state is None:
            bs, c, h, w = data.shape
            state = progressive_init(bs, c, h, w, data.dtype)
        return progressive_kernel_apply(data, kernels, state,
                                        splat=self.splat, valid=valid)
