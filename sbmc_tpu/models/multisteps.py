"""The SBMC sample-based denoiser (reference: sbmc/models.py:35-218).

``Multisteps`` alternates per-sample 1x1-conv embeddings with a pixel-space
U-Net for ``nsteps`` rounds (the sample/pixel coordination of Algorithm 1 in
the paper), then regresses a ``ksize x ksize`` splatting kernel per sample
and accumulates sample contributions with the progressive online-softmax
splat operator.

TPU-first notes:
- Convolutions run in NHWC (features on lanes -> MXU); the splat/gather ops
  run spatial-last (pixels on lanes -> VPU). The layout conversion happens
  once per sample at the kernel-regressor boundary.
- The per-sample accumulation loop is a ``lax.scan`` (via ``nn.scan``) with
  the ``(sum_r, sum_w, max_w)`` carry, which keeps memory O(1) in the sample
  count — this single code path replaces both the reference's training loop
  and its ``limit_memory_usage`` inference path (sbmc/models.py:133-169).
- Variable sample counts are supported under a single compiled graph by
  padding the sample axis and passing a ``sample_mask``; masked samples
  contribute exactly zero.
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from sbmc_tpu.nn.layers import Autoencoder, ConvChain
from sbmc_tpu.nn.kernel_apply import progressive_init, progressive_kernel_apply
from sbmc_tpu.utils.image import crop_like

__all__ = ["Multisteps"]


def _dt(name):
    """Resolve an optional dtype name ("bfloat16") to a jnp dtype."""
    return jnp.dtype(name) if name else None


class _KernelStage(nn.Module):
    """One scan step: regress a sample's kernels and splat its radiance."""
    k2: int
    width: int
    splat: bool
    emit_kernels: bool = False
    conv_dtype: Optional[str] = None
    kernel_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, carry, xs):
        state, propagated = carry
        f_s, r_s, valid = xs  # [bs,h,w,e], [bs,3,h,w], [bs]
        f_in = jnp.concatenate([f_s, propagated], axis=-1)
        # The prediction layer writes NCHW directly: the splat ops want
        # spatial-last, and emitting it from the conv epilogue saves a full
        # read+write pass over the k^2-plane tensor per sample.
        kernels = ConvChain(self.k2, depth=3, width=self.width, ksize=1,
                            activation="leaky_relu", pad=False,
                            output_type="linear", dtype=_dt(self.conv_dtype),
                            out_layout="NCHW",
                            name="kernel_regressor")(f_in)
        # Logit safety clamp: the online softmax is shift-invariant, so this
        # is a no-op for any sane magnitude, but it turns a float32 overflow
        # (which would make the max subtraction produce inf - inf = NaN)
        # into a saturating kernel instead. Fuses into the conv epilogue.
        kernels = jnp.clip(kernels, -3e4, 3e4)
        if self.kernel_dtype:
            kernels = kernels.astype(jnp.dtype(self.kernel_dtype))
        state = progressive_kernel_apply(
            crop_like(r_s, kernels), kernels, state, splat=self.splat,
            valid=valid)
        ys = kernels if self.emit_kernels else None
        return (state, propagated), ys


class Multisteps(nn.Module):
    """Sample-based kernel-splatting denoiser.

    Args:
      n_features: per-sample input feature count.
      n_global_features: global (per-scene) feature count.
      width: channels per conv layer.
      embedding_width: per-sample embedding channels.
      ksize: spatial extent of the square splatting kernel (odd, >= 3).
      splat: if False, predicts gather kernels instead (ablation).
      nsteps: number of sample/pixel coordination steps.
      pixel: if True, averages samples into a 1-spp image first (ablation).

    Call with a dict:
      "radiance": ``[bs, spp, 3, h, w]``
      "features": ``[bs, spp, n_features, h, w]``
      "global_features": ``[bs, n_global_features, 1, 1]`` (or ``[bs, ngf]``)
      "sample_mask" (optional): ``[bs, spp]`` bool validity mask for padded
        sample slots.

    Returns a dict with "radiance": ``[bs, 3, h - 2*o, w - 2*o]`` where
    ``o = (ksize - 1) // 2`` (the invalid kernel border is cropped,
    reference: sbmc/models.py:215-216).
    """
    n_features: int
    n_global_features: int
    width: int = 128
    embedding_width: int = 128
    ksize: int = 21
    splat: bool = True
    nsteps: int = 3
    pixel: bool = False
    eps: float = 1e-8
    return_kernels: bool = False  # also return per-sample kernel logits
    #: compute dtype for the conv stacks (params stay float32); use
    #: jnp.bfloat16 on TPU for MXU-native throughput. The splat/gather
    #: kernel path always accumulates in float32.
    conv_dtype: Optional[str] = None
    #: rematerialize the embedding/propagation stacks in the backward pass
    #: (trades FLOPs for activation memory; lets larger batches/tiles train)
    remat: bool = False
    #: dtype of the kernel-logits stream through the splat ops ("bfloat16"
    #: halves the dominant HBM traffic; ~1% weight noise — inference knob,
    #: accumulation stays float32)
    kernel_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, samples):
        if self.ksize < 3 or self.ksize % 2 == 0:
            raise ValueError("Kernel size should be odd and > 3.")
        if self.nsteps < 1:
            raise ValueError("Multisteps requires at least one sample/pixel "
                             "step.")

        radiance = samples["radiance"]
        # Features may arrive float16 (halved host->device transfer, see
        # data/loader.py collate); promote to the conv compute dtype here.
        features = samples["features"].astype(
            _dt(self.conv_dtype) or jnp.float32)
        gfeatures = samples["global_features"]
        mask = samples.get("sample_mask", None)

        bs, spp = features.shape[0], features.shape[1]
        h, w = features.shape[-2], features.shape[-1]

        if mask is None:
            mask = jnp.ones((bs, spp), bool)
        mask_f = mask.astype(features.dtype)
        n_valid = jnp.maximum(jnp.sum(mask_f, axis=1), 1.0)  # [bs]

        if self.pixel:
            # Collapse samples to a 1-spp average (masked mean).
            m = mask_f[:, :, None, None, None]
            radiance = (jnp.sum(radiance * m, axis=1, keepdims=True)
                        / n_valid[:, None, None, None, None])
            features = (jnp.sum(features * m, axis=1, keepdims=True)
                        / n_valid[:, None, None, None, None])
            spp = 1
            mask = jnp.ones((bs, 1), bool)
            mask_f = mask.astype(features.dtype)
            n_valid = jnp.ones((bs,), features.dtype)

        # NHWC for the conv stacks.
        feats = features.transpose(0, 1, 3, 4, 2)  # [bs, spp, h, w, nf]
        gf = gfeatures.reshape(bs, 1, 1, -1)        # [bs, 1, 1, ngf]

        propagated = None
        for step in range(self.nsteps):
            flat = feats.reshape(bs * spp, h, w, feats.shape[-1])
            if step == 0:
                extra = jnp.broadcast_to(
                    gf[:, None], (bs, spp, 1, 1, gf.shape[-1])
                ).reshape(bs * spp, 1, 1, -1)
                extra = jnp.broadcast_to(extra,
                                         (bs * spp, h, w, gf.shape[-1]))
            else:
                extra = jnp.broadcast_to(
                    propagated[:, None], (bs, spp, h, w, self.width)
                ).reshape(bs * spp, h, w, self.width)
            flat = jnp.concatenate([flat, extra], axis=-1)
            Embed = nn.remat(ConvChain) if self.remat else ConvChain
            flat = Embed(self.embedding_width, width=self.width, depth=3,
                         ksize=1, pad=False, dtype=_dt(self.conv_dtype),
                         name=f"embedding_{step:02d}")(flat)
            feats = flat.reshape(bs, spp, h, w, self.embedding_width)
            # Permutation-invariant masked mean over samples
            # (reference: sbmc/models.py:179).
            reduced = (jnp.sum(feats * mask_f[:, :, None, None, None], axis=1)
                       / n_valid[:, None, None, None])
            Prop = nn.remat(Autoencoder) if self.remat else Autoencoder
            propagated = Prop(
                self.width, num_levels=3, increase_factor=2.0, num_convs=3,
                width=self.width, ksize=3, output_type="leaky_relu",
                pooling="max", dtype=_dt(self.conv_dtype),
                name=f"propagation_{step:02d}")(reduced)

        # Per-sample kernel regression + progressive splatting, O(1) memory
        # in spp via scan.
        state0 = progressive_init(bs, radiance.shape[2], h, w,
                                  radiance.dtype)
        xs = (
            feats.transpose(1, 0, 2, 3, 4),      # [spp, bs, h, w, e]
            radiance.transpose(1, 0, 2, 3, 4),   # [spp, bs, 3, h, w]
            mask.transpose(1, 0),                # [spp, bs]
        )
        scan = nn.scan(
            _KernelStage,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )
        (state, _), ys = scan(
            k2=self.ksize * self.ksize, width=self.width, splat=self.splat,
            emit_kernels=self.return_kernels, conv_dtype=self.conv_dtype,
            kernel_dtype=self.kernel_dtype,
            name="kernel_stage")((state0, propagated), xs)

        output = state.sum_r / (state.sum_w + self.eps)

        crop = (self.ksize - 1) // 2
        output = output[..., crop:-crop, crop:-crop]
        out = {"radiance": output}
        if self.return_kernels:
            out["kernels"] = ys.transpose(1, 0, 2, 3, 4)  # [bs,spp,k2,h,w]
        return out
