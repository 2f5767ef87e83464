"""Pure-XLA (jnp) reference implementations of the splat/gather operators.

These play the role the CPU Halide schedules play in the reference
implementation (reference: src/kernel_weighting.cpp:28-124,
src/scatter2gather.cpp:28-52): a single, obviously-correct algorithm used as
the oracle that validates the fast TPU (Pallas) kernels, and as a portable
fallback backend on non-TPU platforms.

Conventions (all spatial-last, which is the natural TPU vector layout for
these per-pixel ops):

- ``data``:    ``[bs, c, h, w]`` values to be locally averaged.
- ``weights``: ``[bs, k2, h, w]`` per-pixel kernels; the flat tap index
  ``i`` unflattens to ``(dy, dx) = divmod(i, k)``.
- ``output[n, c, y, x] = sum_{dy,dx} weights[n, dy*k+dx, y, x]
  * data[n, c, y+dy-o, x+dx-o]`` with ``o = (k-1)//2`` and zero boundary.
- ``sum_w[n, y, x] = sum_i weights[n, i, y, x]`` (the reference computes this
  through a homogeneous all-ones channel that is *not* zero-padded, so the
  sum is over all taps regardless of image bounds).
"""

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "kernel_weighting_ref",
    "kernel_weighting_grad_ref",
    "scatter2gather_ref",
    "extract_patches",
]


def _ksize(weights):
    k2 = weights.shape[1]
    k = int(round(k2 ** 0.5))
    if k * k != k2:
        raise ValueError(f"weights tap dim {k2} is not a square")
    if k % 2 == 0:
        raise ValueError("kernel size must be odd")
    return k


def extract_patches(data, k):
    """Extract k*k shifted copies of ``data`` (zero padded).

    Args:
      data: ``[bs, c, h, w]``.
      k: odd kernel width.

    Returns:
      ``[bs, c, k*k, h, w]`` where ``out[n, c, i, y, x] =
      data_pad[n, c, y + i//k - o, x + i%k - o]``.
    """
    bs, c, h, w = data.shape
    o = (k - 1) // 2
    dp = jnp.pad(data, ((0, 0), (0, 0), (o, o), (o, o)))

    # A scan over taps (rather than an unrolled python loop) keeps the HLO
    # graph O(1) in k^2 — at the flagship k=21 an unrolled loop is 441
    # dynamic-slices per op and makes CPU-backend compiles of the full model
    # take tens of minutes.
    def tap(_, i):
        dy, dx = i // k, i % k
        return None, lax.dynamic_slice(dp, (0, 0, dy, dx), (bs, c, h, w))

    _, taps = lax.scan(tap, None, jnp.arange(k * k))  # [k2, bs, c, h, w]
    return taps.transpose(1, 2, 0, 3, 4)


def kernel_weighting_ref(data, weights):
    """Forward kernel weighting (reference: src/kernel_weighting.cpp:28-64).

    Args:
      data: ``[bs, c, h, w]``.
      weights: ``[bs, k2, h, w]``.

    Returns:
      ``(output [bs, c, h, w], sum_w [bs, h, w])``.
    """
    k = _ksize(weights)
    patches = extract_patches(data, k)  # [bs, c, k2, h, w]
    output = jnp.einsum("nkyx,nckyx->ncyx", weights, patches)
    sum_w = jnp.sum(weights, axis=1)
    return output, sum_w


def scatter2gather_ref(weights):
    """Transpose splat kernels into gather kernels.

    ``out[n, dy*k+dx, y, x] = weights_pad[n, (k-1-dy)*k + (k-1-dx),
    y+dy-o, x+dx-o]`` (reference: src/scatter2gather.cpp:28-52). The operator
    is self-adjoint, so it is its own VJP.

    Args:
      weights: ``[bs, k2, h, w]``.

    Returns:
      ``[bs, k2, h, w]`` gather kernels.
    """
    k = _ksize(weights)
    bs, k2, h, w = weights.shape
    o = (k - 1) // 2
    # Flip the tap axes: wf[n, dy, dx] = weights[n, k-1-dy, k-1-dx].
    wf = weights.reshape(bs, k, k, h, w)[:, ::-1, ::-1].reshape(bs, k2, h, w)
    wf = jnp.pad(wf, ((0, 0), (0, 0), (o, o), (o, o)))

    # Scan over taps: see extract_patches for why this is not unrolled.
    def tap(_, i):
        dy, dx = i // k, i % k
        return None, lax.dynamic_slice(wf, (0, i, dy, dx), (bs, 1, h, w))

    _, taps = lax.scan(tap, None, jnp.arange(k2))  # [k2, bs, 1, h, w]
    return taps[:, :, 0].transpose(1, 0, 2, 3)


def kernel_weighting_grad_ref(data, weights, d_output, d_sum_w):
    """Backward pass (reference: src/kernel_weighting.cpp:67-124).

    ``d_data`` is the forward op applied to the cotangent with transposed
    kernels; ``d_weights[n, i, y, x] = d_sum_w[n, y, x] +
    sum_c data_pad[n, c, y+dy-o, x+dx-o] * d_output[n, c, y, x]``.

    Returns:
      ``(d_data [bs, c, h, w], d_weights [bs, k2, h, w])``.
    """
    k = _ksize(weights)
    d_data, _ = kernel_weighting_ref(d_output, scatter2gather_ref(weights))
    patches = extract_patches(data, k)  # [bs, c, k2, h, w]
    d_weights = jnp.einsum("nckyx,ncyx->nkyx", patches, d_output)
    d_weights = d_weights + d_sum_w[:, None]
    return d_data, d_weights
