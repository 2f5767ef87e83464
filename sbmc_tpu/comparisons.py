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
  belongs to, with fixed feature bandwidths (a cheap variant).
- :func:`rpf_denoise` — Random Parameter Filtering (Sen & Darabi 2012)
  proper: per-region histogram mutual information between sample colors /
  scene features and the sampler's random parameters (subpixel, lens,
  time) decides per-feature bilateral bandwidths, iterated over a
  coarse-to-fine window ladder. Simplifications vs the paper, documented
  at the function: MI statistics are pooled over pixel cells rather than
  per-pixel sliding blocks (one-hot joint histograms become MXU matmuls),
  and the bilateral pass filters each sample against neighbor-pixel
  sample means rather than all sample pairs.

- :func:`nfor_denoise` — Bitterli2016 NFOR ("Nonlinearly Weighted
  First-order Regression"): NL-means weights drive a collaborative
  per-window first-order regression of radiance on the (prefiltered)
  auxiliary features, cross-filtered between the two half buffers, with
  dual-bandwidth candidates selected per pixel by a dual-buffer MSE
  estimate. Simplifications documented at the function.

Learned baselines are covered natively elsewhere: KPCN (Bako2017) and
LBF (Kalantari2015) are first-class trainable models
(sbmc_tpu/models/kpcn.py, sbmc_tpu/models/lbf.py). NFOR can also run
through ``scripts/denoise_nfor.py`` against Tungsten's external
``denoiser`` for parity checks. Outputs drop into the same
``<spp>spp_<method>`` folders that ``scripts/compute_metrics.py``
consumes.

All filters operate on ``[c, h, w]`` buffers and expand the search window
with a ``lax.scan`` over offsets (graph size O(1) in window area).
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["nlm_denoise", "cross_bilateral_denoise", "rpf_denoise",
           "nfor_denoise", "denoise_buffers"]


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
    # Cross filtering (weights measured on the *other* buffer)
    # decorrelates the weights from the noise being averaged.
    return 0.5 * (_nlm_filter(buf_a, buf_b, var, patch_r, window_r, k,
                              alpha=alpha)
                  + _nlm_filter(buf_b, buf_a, var, patch_r, window_r, k,
                                alpha=alpha))


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


def _cell_pool(x, cell):
    """[q, h, w] -> per-cell values [n_cells, q, cell*cell] (h, w must be
    multiples of ``cell``; callers pad)."""
    q, h, w = x.shape
    hc, wc = h // cell, w // cell
    x = x.reshape(q, hc, cell, wc, cell).transpose(1, 3, 0, 2, 4)
    return x.reshape(hc * wc, q, cell * cell)


def _cell_broadcast(v, cell, h, w):
    """[n_cells, q] per-cell scalars -> [q, h, w] (nearest upsample)."""
    hc, wc = h // cell, w // cell
    v = v.reshape(hc, wc, -1).transpose(2, 0, 1)
    return jnp.repeat(jnp.repeat(v, cell, axis=-2), cell, axis=-1)


def _pool_samples(vals, cell):
    """[s, q, h, w] -> per-cell sample values [n_cells, q, s*cell^2]."""
    s = vals.shape[0]
    return jnp.concatenate(
        [_cell_pool(vals[i], cell) for i in range(s)], -1)


def _mi_cells(pooled, hc, wc, n_bins):
    """Pairwise histogram mutual information per cell, with statistics
    aggregated over each cell's 3x3 cell neighborhood.

    Disjoint-cell statistics fail when an edge lies on a cell boundary
    (each cell's interior is then statistically flat and no dependency is
    detected); aggregating the joint-histogram *counts* over overlapping
    3x3 neighborhoods guarantees the statistics region covers the filter
    window, like the paper's per-pixel sliding blocks.

    Args:
      pooled: ``[n_cells, q, n]`` consistently standardized values (the
        same value->bin mapping must hold across cells for counts to add).
      hc, wc: cell-grid shape (``n_cells == hc * wc``).
      n_bins: histogram quantization (values clipped to +-2 sigma).

    Returns:
      ``[n_cells, q, q]`` MI estimates (nats). The one-hot joint-histogram
      contraction is a batched matmul — this is where RPF's statistics land
      on the MXU instead of the scatter loops of the CPU original
      (reference role: the RPF exe built by dockerfiles/cuda-sbmc.dockerfile).
    """
    q = pooled.shape[1]
    bins = jnp.clip((pooled / 4.0 + 0.5) * n_bins, 0, n_bins - 1e-3)
    one = jax.nn.one_hot(bins.astype(jnp.int32), n_bins)  # [nc, q, n, B]
    joint = jnp.einsum("cqnb,crnd->cqrbd", one, one)      # counts
    # Sum counts over the 3x3 cell neighborhood (edge-padded).
    jg = joint.reshape(hc, wc, q, q, n_bins, n_bins)
    jp = jnp.pad(jg, [(1, 1), (1, 1)] + [(0, 0)] * 4, mode="edge")
    agg = sum(jp[dy:dy + hc, dx:dx + wc]
              for dy in range(3) for dx in range(3))
    agg = agg.reshape(hc * wc, q, q, n_bins, n_bins)
    p = agg / agg.sum((-1, -2), keepdims=True)
    pa = p.sum(-1, keepdims=True)
    pb = p.sum(-2, keepdims=True)
    eps = 1e-9
    return (p * (jnp.log(p + eps) - jnp.log(pa * pb + eps))).sum((-1, -2))


@functools.partial(jax.jit, static_argnames=("radii", "cell", "n_bins"))
def rpf_denoise(colors, feats, randoms, radii=(7, 5, 3, 2), cell=8,
                n_bins=8, sigma_c=0.45, sigma_f=0.45):
    """Random Parameter Filtering (Sen & Darabi 2012).

    Per iteration ``t`` (coarse-to-fine window radii, the paper's 55/35/17/7
    block ladder scaled to tile inference):

    1. Standardize sample colors, scene features and random parameters
       within ``cell x cell`` pixel cells and estimate the pairwise
       histogram mutual information of every quantity pair per cell
       (:func:`_mi_matrix`).
    2. Fractional color dependency on the random parameters
       ``W^r_c = D^r_c / (D^r_c + D^p_c + D^f_c)`` gives the color
       bandwidth scale ``alpha = max(1 - 2 (1 + 0.1 t) W^r_c, 0)``; each
       feature's weight is ``beta_k = W^{f_k}_c * max(1 - (1 + 0.1 t)
       W^r_{f_k}, 0)`` (paper eqs. 6-9).
    3. Cross-bilateral filter the *samples*: each sample's color is
       re-estimated from neighbor-pixel sample means weighted by
       ``exp(-sum_k alpha_k dc_k^2 / 2 sig_c^2 - sum_k beta_k df_k^2 /
       2 sig_f^2)`` on the standardized values.

    Documented simplifications vs the paper: statistics use overlapping
    3x3-cell neighborhoods around each pixel cell (joint-histogram counts
    aggregated across cells) instead of per-pixel sliding blocks;
    quantities are standardized frame-globally (per within-cell offset for
    position) rather than per block; the bilateral pass compares each
    sample to neighbor *pixel means* (not every sample pair); fixed sigma
    on standardized values replaces the paper's variance-derived
    bandwidths.

    Args:
      colors: ``[s, 3, h, w]`` per-sample radiance.
      feats: ``[s, f, h, w]`` scene features (albedo/normal/depth...).
      randoms: ``[s, r, h, w]`` random parameters (subpixel/lens/time).

    Returns:
      ``[3, h, w]`` denoised radiance.
    """
    s, _, h, w = colors.shape
    pad_h, pad_w = (-h) % cell, (-w) % cell
    if pad_h or pad_w:
        grow = lambda x: jnp.pad(  # noqa: E731
            x, [(0, 0), (0, 0), (0, pad_h), (0, pad_w)], mode="edge")
        out = rpf_denoise(grow(colors), grow(feats), grow(randoms),
                          radii=radii, cell=cell, n_bins=n_bins,
                          sigma_c=sigma_c, sigma_f=sigma_f)
        return out[..., :h, :w]

    hc, wc = h // cell, w // cell

    def global_std(v):
        # Frame-global standardization: one consistent value->bin mapping
        # for every cell (required for 3x3 count aggregation) and
        # cross-cell-comparable filter distances.
        mu = v.mean((0, 2, 3), keepdims=True)
        sd = v.std((0, 2, 3), keepdims=True) + 1e-6
        return (v - mu) / sd

    # position quantities (the paper's p): within-cell pixel offsets — the
    # same distribution in every cell, so the standardized mapping is
    # consistent across cells and counts aggregate coherently.
    p_sd = float(((cell * cell - 1) / 12.0) ** 0.5) + 1e-6
    loc = (jnp.arange(h, dtype=colors.dtype) % cell - (cell - 1) / 2) / p_sd
    locx = (jnp.arange(w, dtype=colors.dtype) % cell - (cell - 1) / 2) / p_sd
    pos = jnp.broadcast_to(
        jnp.stack(jnp.meshgrid(loc, locx, indexing="ij"))[None],
        (s, 2, h, w))

    f_std = global_std(feats)
    f_pool = _pool_samples(f_std, cell)
    r_pool = _pool_samples(global_std(randoms), cell)
    p_pool = _pool_samples(pos, cell)

    nf, nr = feats.shape[1], randoms.shape[1]
    for t, radius in enumerate(radii):
        c_std = global_std(colors)
        c_pool = _pool_samples(c_std, cell)
        mi = _mi_cells(jnp.concatenate([c_pool, f_pool, r_pool, p_pool], 1),
                       hc, wc, n_bins)
        sl_c = slice(0, 3)
        sl_f = slice(3, 3 + nf)
        sl_r = slice(3 + nf, 3 + nf + nr)
        sl_p = slice(3 + nf + nr, 3 + nf + nr + 2)
        d_rc = mi[:, sl_c, sl_r].sum(-1)                  # [nc, 3]
        d_pc = mi[:, sl_c, sl_p].sum(-1)
        d_fc = mi[:, sl_c, sl_f].sum(-1)
        w_rc = d_rc / (d_rc + d_pc + d_fc + 1e-9)
        alpha = jnp.maximum(1.0 - 2.0 * (1 + 0.1 * t) * w_rc, 0.0)
        d_rf = mi[:, sl_f, sl_r].sum(-1)                  # [nc, nf]
        d_pf = mi[:, sl_f, sl_p].sum(-1)
        d_cf = mi[:, sl_f, sl_c].sum(-1)
        w_rf = d_rf / (d_rf + d_pf + d_cf + 1e-9)
        w_fc = d_cf / (d_cf.sum(-1, keepdims=True) + 1e-9)
        beta = w_fc * jnp.maximum(1.0 - (1 + 0.1 * t) * w_rf, 0.0)
        alpha_f = _cell_broadcast(alpha, cell, h, w)      # [3, h, w]
        beta_f = _cell_broadcast(beta, cell, h, w)        # [nf, h, w]

        c_mean = c_std.mean(0)                            # [3, h, w]
        f_mean = f_std.mean(0)
        raw_mean = colors.mean(0)
        inv2c = 1.0 / (2.0 * sigma_c ** 2)
        inv2f = 1.0 / (2.0 * sigma_f ** 2)

        def offset(carry, i, radius=radius, alpha_f=alpha_f, beta_f=beta_f,
                   c_std=c_std, c_mean=c_mean, f_mean=f_mean,
                   raw_mean=raw_mean):
            acc, wsum = carry
            win = 2 * radius + 1
            dy, dx = i // win, i % win
            cq = _shifted(c_mean, dy, dx, radius)         # [3, h, w]
            fq = _shifted(f_mean, dy, dx, radius)
            dc = (alpha_f[None] * (c_std - cq[None]) ** 2).sum(1) * inv2c
            df = (beta_f * (f_mean - fq) ** 2).sum(0) * inv2f
            wgt = jnp.exp(-dc - df[None])                 # [s, h, w]
            raw_q = _shifted(raw_mean, dy, dx, radius)
            return (acc + wgt[:, None] * raw_q[None],
                    wsum + wgt), None

        win = 2 * radius + 1
        (acc, wsum), _ = lax.scan(
            offset, (jnp.zeros_like(colors), jnp.zeros((s, h, w))),
            jnp.arange(win * win))
        colors = acc / (wsum[:, None] + 1e-9)
    return colors.mean(0)


def _nlm_weight_field(guide, var, dy, dx, window_r, patch_r, k, alpha=0.5):
    """Per-pixel NL-means weight for the window offset ``(dy, dx)``,
    measured on ``guide`` with variance cancellation (the weight of
    Rousselle2012 that NFOR reuses as its regression weight)."""
    eps = 1e-10
    g_q = _shifted(guide, dy, dx, window_r)
    v_q = _shifted(var, dy, dx, window_r)
    d2 = ((guide - g_q) ** 2 - alpha * (var + jnp.minimum(var, v_q))
          ) / (eps + k * k * (var + v_q))
    d2 = _box_filter(d2, patch_r).mean(0)
    return jnp.exp(-jnp.maximum(d2, 0.0))               # [h, w]


def _nlm_filter(src, guide, var, patch_r, window_r, k, alpha=0.5):
    """NL-means filter of ``src`` with weights measured on ``guide``
    (nlm_denoise's per-buffer pass; also NFOR's feature prefilter)."""
    def offset(carry, i):
        acc, wsum = carry
        dy, dx = i // (2 * window_r + 1), i % (2 * window_r + 1)
        w = _nlm_weight_field(guide, var, dy, dx, window_r, patch_r, k,
                              alpha=alpha)
        s_q = _shifted(src, dy, dx, window_r)
        return (acc + w[None] * s_q, wsum + w), None

    n = (2 * window_r + 1) ** 2
    (acc, wsum), _ = lax.scan(
        offset, (jnp.zeros_like(src), jnp.zeros(src.shape[-2:])),
        jnp.arange(n))
    return acc / (wsum[None] + 1e-10)


def _regression_filter(y, guide, var, feat, window_r, patch_r, k):
    """Collaborative NL-means-weighted first-order regression filter of
    ``y`` (NFOR's core estimator).

    For every window center ``p`` a weighted least-squares fit
    ``y_q ~ beta_0(p) + beta(p)^T (f_q - f_p)`` is solved over the
    ``(2R+1)^2`` window with NL-means weights ``w_pq`` measured on
    ``guide``; each pixel's output averages the predictions of every
    window containing it, weighted by the same ``w_pq`` (the paper's
    collaborative reconstruction).

    Args:
      y: ``[c, h, w]`` buffer to filter.
      guide: ``[c, h, w]`` the *other* half buffer (weight source).
      var: ``[c, h, w]`` variance of the half-buffer means.
      feat: ``[nf, h, w]`` noise-free (prefiltered), standardized features.
      window_r: regression window radius ``R``.
      patch_r: NL-means patch radius.
      k: NL-means sensitivity (the candidate bandwidth).

    Returns:
      ``[c, h, w]`` filtered buffer.
    """
    c, h, w = y.shape
    nf = feat.shape[0]
    d = 1 + nf
    win = 2 * window_r + 1
    one = jnp.ones((1, h, w), y.dtype)

    def wfield(dy, dx):
        return _nlm_weight_field(guide, var, dy, dx, window_r, patch_r, k)

    # Pass 1: accumulate the normal equations per window center.
    def moments(carry, i):
        m_acc, b_acc = carry
        dy, dx = i // win, i % win
        wgt = wfield(dy, dx)                            # [h, w]
        df = _shifted(feat, dy, dx, window_r) - feat    # f_q - f_p
        phi = jnp.concatenate([one, df], 0)             # [d, h, w]
        outer = (phi[:, None] * phi[None]).reshape(d * d, h, w)
        y_q = _shifted(y, dy, dx, window_r)
        rhs = (phi[:, None] * y_q[None]).reshape(d * c, h, w)
        return (m_acc + wgt[None] * outer, b_acc + wgt[None] * rhs), None

    (m_acc, b_acc), _ = lax.scan(
        moments,
        (jnp.zeros((d * d, h, w)), jnp.zeros((d * c, h, w))),
        jnp.arange(win * win))

    # Tikhonov-regularized batched solve (features are standardized, so a
    # scale-free ridge keeps rank-deficient windows — e.g. flat feature
    # regions, where the fit degrades to the weighted mean — stable).
    mat = m_acc.reshape(d, d, h, w).transpose(2, 3, 0, 1)
    mat = mat + 1e-3 * jnp.eye(d)
    rhs = b_acc.reshape(d, c, h, w).transpose(2, 3, 0, 1)
    beta = jnp.linalg.solve(mat, rhs)                   # [h, w, d, c]
    beta = beta.transpose(2, 3, 0, 1).reshape(d * c, h, w)

    # Pass 2: collaborative reconstruction — each output pixel q averages
    # beta_0(p) + beta(p)^T (f_q - f_p) over all centers p = q - offset.
    def reconstruct(carry, i):
        acc, wsum = carry
        dy, dx = i // win, i % win
        rdy, rdx = win - 1 - dy, win - 1 - dx           # reverse shift
        w_at = _shifted(wfield(dy, dx), rdy, rdx, window_r)
        b_at = _shifted(beta, rdy, rdx, window_r).reshape(d, c, h, w)
        f_p = _shifted(feat, rdy, rdx, window_r)
        df = feat - f_p                                 # f_q - f_p at q
        pred = b_at[0] + jnp.einsum("jhw,jchw->chw", df, b_at[1:])
        return (acc + w_at[None] * pred, wsum + w_at), None

    (acc, wsum), _ = lax.scan(
        reconstruct, (jnp.zeros_like(y), jnp.zeros((h, w))),
        jnp.arange(win * win))
    return acc / (wsum[None] + 1e-10)


@functools.partial(jax.jit,
                   static_argnames=("window_r", "patch_r", "ks",
                                    "prefilter_r"))
def nfor_denoise(buf_a, buf_b, var, feat_a, feat_b, feat_var,
                 window_r=8, patch_r=3, ks=(0.5, 1.0), prefilter_r=3):
    """Nonlinearly weighted first-order regression (Bitterli et al. 2016),
    the fourth comparison denoiser of the reference (built from
    pbrt_patches/2016_bitterli_nfor.diff + Tungsten in
    dockerfiles/cuda-sbmc.dockerfile:53-90), re-implemented TPU-native.

    Pipeline (paper sections 5-6):

    1. *Feature prefiltering*: each half buffer's auxiliary features are
       NL-means filtered with weights measured on the other half buffer;
       the two results are averaged into one near-noise-free feature set.
    2. *Candidates*: for each bandwidth ``k`` the half buffers are
       cross-filtered (A with weights from B and vice versa) by
       :func:`_regression_filter` — collaborative first-order regression
       on the features with NL-means weights.
    3. *Selection*: per-pixel MSE of each candidate is estimated from the
       dual buffers (``E[(F_A - B)^2] = MSE + Var(B)``), smoothed, and the
       binary argmin map (also smoothed) blends the candidates.

    Documented simplifications vs the Tungsten build: features are
    standardized frame-globally instead of per-window min-max; the MSE and
    selection maps are box-smoothed rather than NL-means-smoothed; no
    second-pass re-filtering of the final image.

    Args:
      buf_a, buf_b: ``[c, h, w]`` independent half-buffer radiance means.
      var: ``[c, h, w]`` variance of each half-buffer's mean.
      feat_a, feat_b: ``[nf, h, w]`` half-buffer feature means
        (albedo/normal/depth...).
      feat_var: ``[nf, h, w]`` variance of the feature half-buffer means.
      window_r: regression window radius.
      patch_r: NL-means patch radius.
      ks: candidate NL-means sensitivities (the paper's {0.5, 1.0}).
      prefilter_r: feature-prefilter window radius.

    Returns:
      ``[c, h, w]`` denoised radiance.
    """
    # 1. Feature prefiltering (cross NL-means, k=1, small patches).
    f_a = _nlm_filter(feat_a, feat_b, feat_var, 1, prefilter_r, 1.0)
    f_b = _nlm_filter(feat_b, feat_a, feat_var, 1, prefilter_r, 1.0)
    feat = 0.5 * (f_a + f_b)
    mu = feat.mean((1, 2), keepdims=True)
    sd = feat.std((1, 2), keepdims=True) + 1e-6
    feat = (feat - mu) / sd

    # 2. Dual-bandwidth cross-filtered candidates.
    cands, mses = [], []
    for k in ks:
        filt_a = _regression_filter(buf_a, buf_b, var, feat,
                                    window_r, patch_r, k)
        filt_b = _regression_filter(buf_b, buf_a, var, feat,
                                    window_r, patch_r, k)
        cands.append(0.5 * (filt_a + filt_b))
        # Dual-buffer residual MSE estimate, box-smoothed.
        res = 0.5 * (((filt_a - buf_b) ** 2 - var)
                     + ((filt_b - buf_a) ** 2 - var))
        mses.append(_box_filter(res.mean(0)[None], 2)[0])

    # 3. Per-pixel selection with smoothed binary maps.
    out = cands[0]
    mse = mses[0]
    for cand, m in zip(cands[1:], mses[1:]):
        sel = _box_filter((m < mse).astype(out.dtype)[None], 2)[0]
        out = (1.0 - sel)[None] * out + sel[None] * cand
        mse = jnp.minimum(mse, m)
    return out


def denoise_buffers(features, labels, method="nlm", **kw):
    """Run a baseline on raw sample records (RAW_MODE feature stacks).

    Args:
      features: ``[spp, n_features, h, w]`` raw per-sample features (the
        RAW_MODE layout; same source as scripts/denoise_nfor.py).
      labels: feature-label list (``TilesDataset.labels``).
      method: "nlm", "cbf", "rpf", or "nfor".

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
    elif method == "nfor":
        feats = np.concatenate([
            planes("albedo_first_r"),
            features[:, labels.index("normal_first_x"):
                     labels.index("normal_first_x") + 3],
            planes("depth_first", 1)], 1)
        feat_a = feats[:half].mean(0)
        feat_b = feats[half:].mean(0) if spp > 1 else feat_a
        feat_var = feats.var(0) / max(half, 1)
        out = nfor_denoise(jnp.asarray(buf_a), jnp.asarray(buf_b),
                           jnp.asarray(var), jnp.asarray(feat_a),
                           jnp.asarray(feat_b), jnp.asarray(feat_var),
                           **kw)
    elif method == "rpf":
        feats = np.concatenate([
            planes("albedo_first_r"),
            features[:, labels.index("normal_first_x"):
                     labels.index("normal_first_x") + 3],
            planes("depth_first", 1)], 1)
        rand_names = [n for n in ("dx", "dy", "lens_u", "lens_v", "t")
                      if n in labels]
        if rand_names:
            randoms = np.stack([features[:, labels.index(n)]
                                for n in rand_names], 1)
        else:
            # Coordinate features absent (load_coords=False): fall back to
            # the per-sample radiance deviation as the randomness proxy.
            randoms = color - color.mean(0, keepdims=True)
        out = rpf_denoise(jnp.asarray(color), jnp.asarray(feats),
                          jnp.asarray(randoms), **kw)
    elif method == "cbf":
        albedo = planes("albedo_first_r").mean(0)
        normal = features[:, labels.index("normal_first_x"):
                          labels.index("normal_first_x") + 3].mean(0)
        depth = planes("depth_first", 1).mean(0)
        # cbf filters the FULL-spp mean, whose variance is var(0)/spp —
        # not the half-buffer-mean variance the nlm/nfor paths use.
        var_full = color.var(0) / max(spp, 1)
        out = cross_bilateral_denoise(
            jnp.asarray(color.mean(0)), jnp.asarray(var_full),
            jnp.asarray(albedo), jnp.asarray(normal), jnp.asarray(depth),
            **kw)
    else:
        raise ValueError("unknown baseline method %r" % method)
    return np.asarray(out)
