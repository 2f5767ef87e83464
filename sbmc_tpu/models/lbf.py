"""LBF learned-bilateral-filter baseline (Kalantari, Bako & Sen 2015,
"A Machine Learning Approach for Filtering Monte Carlo Noise").

The reference repo ships LBF only as a dockerized CUDA binary
(dockerfiles/cuda-sbmc.dockerfile:53-90, pbrt_patches/2015_kalantari_lbf);
here it is a first-class flax model sharing the SBMC batch contract
(``radiance``/``features``/``global_features``/``sample_mask``), so it
trains through ``scripts/train.py``, denoises through ``scripts/denoise.py``
and drops into the evaluation tables like any other method.

Paper structure kept: a small per-pixel network maps sample *statistics*
(means + variances) to the parameters of an edge-aware cross-bilateral
filter, trained end-to-end through the (differentiable) filter against the
reference image. TPU-first redesign notes:

- The per-pixel MLP is a stack of 1x1 convs (pixels on the MXU lanes), not
  the paper's per-pixel loop.
- The filter guides are a learned linear projection of the mean feature
  vector to ``n_guides`` channels rather than the paper's hand-picked
  albedo/normal/depth blocks: the projection subsumes that choice and
  keeps the window scan's HBM stream at ``n_guides`` planes instead of the
  full feature stack.
- The window loop is a ``lax.scan`` over offsets (graph size O(1) in
  window area), matching the other comparison filters
  (sbmc_tpu/comparisons.py).
"""

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from sbmc_tpu.nn.layers import ConvChain

__all__ = ["LBF"]


class LBF(nn.Module):
    """Learned cross-bilateral filter denoiser.

    Call with the SBMC sample dict:
      "radiance": ``[bs, spp, 3, h, w]``
      "features": ``[bs, spp, n_features, h, w]``
      "global_features": ``[bs, n_global_features, 1, 1]`` (or ``[bs, n]``)
      "sample_mask" (optional): ``[bs, spp]`` validity mask.

    Returns ``{"radiance": [bs, 3, h - 2*window_r, w - 2*window_r]}`` (the
    un-producible filter border is cropped, same convention as Multisteps).
    """
    n_features: int
    n_global_features: int
    window_r: int = 8
    n_guides: int = 8
    width: int = 64
    depth: int = 3
    conv_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, samples):
        dt = jnp.dtype(self.conv_dtype) if self.conv_dtype else jnp.float32
        radiance = samples["radiance"]
        features = samples["features"].astype(dt)
        gfeatures = samples["global_features"]
        mask = samples.get("sample_mask", None)

        bs, spp = features.shape[0], features.shape[1]
        h, w = features.shape[-2], features.shape[-1]
        if h <= 2 * self.window_r or w <= 2 * self.window_r:
            raise ValueError(
                "LBF(window_r=%d) needs inputs larger than %dx%d (got %dx%d)"
                % (self.window_r, 2 * self.window_r, 2 * self.window_r, h, w))

        if mask is None:
            mask = jnp.ones((bs, spp), bool)
        m = mask.astype(dt)[:, :, None, None, None]
        n_valid = jnp.maximum(m.sum(1, keepdims=True), 1.0)

        def mean_var(x):
            mu = (x * m).sum(1) / n_valid[:, 0]
            var = ((x - mu[:, None]) ** 2 * m).sum(1) / n_valid[:, 0]
            return mu, var

        r_mu, r_var = mean_var(radiance.astype(dt))
        f_mu, f_var = mean_var(features)

        # --- per-pixel parameter network (NHWC 1x1 convs) ----------------
        gf = jnp.broadcast_to(
            gfeatures.reshape(bs, 1, 1, -1).astype(dt),
            (bs, h, w, self.n_global_features))
        stats = jnp.concatenate(
            [f_mu.transpose(0, 2, 3, 1), f_var.transpose(0, 2, 3, 1),
             r_mu.transpose(0, 2, 3, 1), r_var.transpose(0, 2, 3, 1), gf],
            axis=-1)
        x = ConvChain(self.n_guides + 1, depth=self.depth, width=self.width,
                      ksize=1, activation="leaky_relu", pad=False,
                      output_type="linear", dtype=dt,
                      name="param_net")(stats)
        # Inverse squared bandwidths, per pixel: n_guides feature terms +
        # one spatial term. softplus keeps them positive; the -1 bias makes
        # the initial filter broad (strong smoothing) so early training
        # gets gradient from the whole window.
        inv_bw = nn.softplus(x - 1.0).astype(jnp.float32)
        inv_bw = inv_bw.transpose(0, 3, 1, 2)             # [bs, G+1, h, w]

        # --- guides: learned projection of the mean features --------------
        guides = nn.Conv(self.n_guides, (1, 1), use_bias=True, dtype=dt,
                         name="guide_proj")(f_mu.transpose(0, 2, 3, 1))
        guides = guides.transpose(0, 3, 1, 2).astype(jnp.float32)

        # --- cross-bilateral window scan ----------------------------------
        r = self.window_r
        win = 2 * r + 1
        r_mu32 = r_mu.astype(jnp.float32)
        pad = [(0, 0), (0, 0), (r, r), (r, r)]
        g_pad = jnp.pad(guides, pad, mode="edge")
        c_pad = jnp.pad(r_mu32, pad, mode="edge")
        a_g = inv_bw[:, :self.n_guides]
        a_s = inv_bw[:, self.n_guides] / float(r * r)     # [bs, h, w]

        def offset(carry, i):
            acc, wsum = carry
            dy, dx = i // win, i % win
            g_q = lax.dynamic_slice(g_pad, (0, 0, dy, dx), guides.shape)
            c_q = lax.dynamic_slice(c_pad, (0, 0, dy, dx), r_mu32.shape)
            d = (a_g * (guides - g_q) ** 2).sum(1)
            fy = (dy - r).astype(jnp.float32)
            fx = (dx - r).astype(jnp.float32)
            d = d + a_s * (fy * fy + fx * fx)
            wgt = jnp.exp(-d)                             # [bs, h, w]
            return (acc + wgt[:, None] * c_q, wsum + wgt), None

        (acc, wsum), _ = lax.scan(
            offset,
            (jnp.zeros_like(r_mu32), jnp.zeros((bs, h, w), jnp.float32)),
            jnp.arange(win * win))
        out = acc / (wsum[:, None] + 1e-8)
        return {"radiance": out[..., r:h - r, r:w - r]}
