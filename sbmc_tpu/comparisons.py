"""Native comparison denoisers (prior-work baselines).

The reference ships docker builds of four prior methods as patched external
binaries (Sen2011 RPF, Rousselle2012 NLM, Kalantari2015 LBF, Bitterli2016
NFOR — reference: dockerfiles/cuda-sbmc.dockerfile:53-90 and
pbrt_patches/2011_sen_rpf.diff et al.). This module provides TPU-native,
``jit``-able re-implementations of the two classical filters so the
evaluation harness has runnable baselines without CUDA-era builds:

- :func:`nlm_denoise` — dual-buffer non-local means with variance
  cancellation, the core estimator of Rousselle/Knaus/Zwicker 2012
  ("Adaptive rendering with non-local means filtering"). Simplifications
  vs the paper: single scale, fixed (non-adaptive) sampling budget.
- :func:`cross_bilateral_denoise` — a feature-weighted cross-bilateral
  filter over the g-buffer (albedo/normal/depth), the family Sen2011 RPF
  belongs to; the mutual-information feature weighting of RPF proper is
  replaced by fixed feature bandwidths.

Learned baselines are covered natively elsewhere: KPCN (Bako2017) is a
first-class model (sbmc_tpu/models/kpcn.py), and NFOR runs through
``scripts/denoise_nfor.py`` against Tungsten's external ``denoiser``.
Outputs drop into the same ``<spp>spp_<method>`` folders that
``scripts/compute_metrics.py`` consumes.

All filters operate on ``[c, h, w]`` buffers and expand the search window
with a ``lax.scan`` over offsets (graph size O(1) in window area).
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["nlm_denoise", "cross_bilateral_denoise", "denoise_buffers"]


def _box_filter(x, r):
    """Separable (2r+1)^2 mean filter over the trailing 2 dims, 'same' size,
    normalized by the in-bounds sample count at borders."""
    win = 2 * r + 1

    def filt1d(v, axis):
        pad = [(0, 0)] * v.ndim
        pad[axis] = (1, 0)
        c = jnp.cumsum(jnp.pad(v, pad), axis=axis)
        pad2 = [(0, 0)] * v.ndim
        pad2[axis] = (r, r + 1)
        c = jnp.pad(c, pad2, mode="edge")
        n = v.shape[axis]
        hi = lax.slice_in_dim(c, win, win + n, axis=axis)
        lo = lax.slice_in_dim(c, 0, n, axis=axis)
        return hi - lo

    s = filt1d(filt1d(x, -1), -2)
    ones = jnp.ones(x.shape[-2:], x.dtype)
    cnt = filt1d(filt1d(ones, -1), -2)
    return s / cnt


def _shifted(x, dy, dx, r):
    """x shifted by (dy - r, dx - r) with edge padding; dy/dx may be traced
    (dynamic_slice over a statically padded array)."""
    pad = [(0, 0)] * (x.ndim - 2) + [(r, r), (r, r)]
    xp = jnp.pad(x, pad, mode="edge")
    start = [0] * (x.ndim - 2) + [dy, dx]
    return lax.dynamic_slice(xp, start, x.shape)


@functools.partial(jax.jit, static_argnames=("patch_r", "window_r"))
def nlm_denoise(buf_a, buf_b, var, patch_r=3, window_r=7, k=0.45,
                alpha=0.5):
    """Dual-buffer non-local means with variance cancellation
    (Rousselle2012 family).

    Args:
      buf_a, buf_b: ``[c, h, w]`` independent half-buffer means.
      var: ``[c, h, w]`` variance of each half-buffer's *mean* estimate.
      patch_r: patch radius (7x7 patches by default).
      window_r: search-window radius (15x15 window).
      k: filter sensitivity (paper's ``k``).
      alpha: variance cancellation factor.

    Returns:
      ``[c, h, w]`` denoised image (average of the two cross-filtered
      half buffers).
    """
    eps = 1e-10

    def filter_one(src, guide):
        """Filter ``src`` with weights measured on ``guide`` (cross
        filtering decorrelates the weights from the noise being averaged).
        """
        def offset(carry, i):
            acc, wsum = carry
            dy, dx = i // (2 * window_r + 1), i % (2 * window_r + 1)
            g_q = _shifted(guide, dy, dx, window_r)
            v_q = _shifted(var, dy, dx, window_r)
            d2 = ((guide - g_q) ** 2 - alpha * (var + jnp.minimum(var, v_q))
                  ) / (eps + k * k * (var + v_q))
            d2 = _box_filter(d2, patch_r).mean(0)      # patch + channel avg
            w = jnp.exp(-jnp.maximum(d2, 0.0))         # [h, w]
            s_q = _shifted(src, dy, dx, window_r)
            return (acc + w[None] * s_q, wsum + w), None

        n = (2 * window_r + 1) ** 2
        (acc, wsum), _ = lax.scan(
            offset, (jnp.zeros_like(src), jnp.zeros(src.shape[-2:])),
            jnp.arange(n))
        return acc / (wsum[None] + eps)

    return 0.5 * (filter_one(buf_a, buf_b) + filter_one(buf_b, buf_a))


@functools.partial(jax.jit, static_argnames=("window_r",))
def cross_bilateral_denoise(color, var, albedo, normal, depth, window_r=7,
                            sigma_s=5.0, sigma_c=0.65, sigma_a=0.1,
                            sigma_n=0.25, sigma_z=0.01):
    """Feature-weighted cross-bilateral filter (RPF/Sen2011 family).

    Args:
      color: ``[c, h, w]`` noisy mean radiance.
      var: ``[c, h, w]`` variance of the mean estimate (range kernel is
        noise-aware: color differences are normalized by it).
      albedo: ``[3, h, w]``; normal: ``[3, h, w]``; depth: ``[1, h, w]``
        g-buffer guides.
      window_r: search-window radius.
      sigma_*: spatial / color / albedo / normal / depth bandwidths.

    Returns:
      ``[c, h, w]`` filtered radiance.
    """
    eps = 1e-10
    win = 2 * window_r + 1

    def offset(carry, i):
        acc, wsum = carry
        dy, dx = i // win, i % win
        fy = (dy - window_r).astype(jnp.float32)
        fx = (dx - window_r).astype(jnp.float32)
        w = jnp.exp(-(fy * fy + fx * fx) / (2 * sigma_s ** 2))
        c_q = _shifted(color, dy, dx, window_r)
        v_q = _shifted(var, dy, dx, window_r)
        # Noise-aware range kernel: subtract the expected squared noise
        # difference so equal-signal pairs keep weight ~1 at any noise level.
        d2 = jnp.maximum((color - c_q) ** 2 - (var + v_q), 0.0)
        dc = (d2 / (eps + 2 * sigma_c ** 2 * (var + v_q + 1e-4))).mean(0)
        a_q = _shifted(albedo, dy, dx, window_r)
        da = ((albedo - a_q) ** 2).sum(0) / (2 * sigma_a ** 2)
        n_q = _shifted(normal, dy, dx, window_r)
        dn = jnp.maximum(1.0 - (normal * n_q).sum(0), 0.0) / sigma_n
        z_q = _shifted(depth, dy, dx, window_r)
        dz = ((depth - z_q) ** 2).sum(0) / (2 * sigma_z ** 2)
        w = w * jnp.exp(-dc - da - dn - dz)
        return (acc + w[None] * c_q, wsum + w), None

    (acc, wsum), _ = lax.scan(
        offset, (jnp.zeros_like(color), jnp.zeros(color.shape[-2:])),
        jnp.arange(win * win))
    return acc / (wsum[None] + eps)


def denoise_buffers(features, labels, method="nlm", **kw):
    """Run a baseline on raw sample records (RAW_MODE feature stacks).

    Args:
      features: ``[spp, n_features, h, w]`` raw per-sample features (the
        RAW_MODE layout; same source as scripts/denoise_nfor.py).
      labels: feature-label list (``TilesDataset.labels``).
      method: "nlm" or "cbf".

    Returns:
      ``[3, h, w]`` numpy radiance.
    """
    import numpy as np

    spp = features.shape[0]
    half = max(spp // 2, 1)

    def planes(name, n=3):
        i = labels.index(name)
        return np.maximum(features[:, i:i + n], 0.0)

    color = planes("diffuse_r") + planes("specular_r")
    buf_a = color[:half].mean(0)
    buf_b = color[half:].mean(0) if spp > 1 else color[:half].mean(0)
    # Variance of each half-buffer mean.
    var = color.var(0) / max(half, 1)

    if method == "nlm":
        out = nlm_denoise(jnp.asarray(buf_a), jnp.asarray(buf_b),
                          jnp.asarray(var), **kw)
    elif method == "cbf":
        albedo = planes("albedo_first_r").mean(0)
        normal = features[:, labels.index("normal_first_x"):
                          labels.index("normal_first_x") + 3].mean(0)
        depth = planes("depth_first", 1).mean(0)
        out = cross_bilateral_denoise(
            jnp.asarray(color.mean(0)), jnp.asarray(var),
            jnp.asarray(albedo), jnp.asarray(normal), jnp.asarray(depth),
            **kw)
    else:
        raise ValueError("unknown baseline method %r" % method)
    return np.asarray(out)
