"""KPCN per-pixel baseline denoiser (reference: sbmc/models.py:221-291,
re-implementing Bako et al. 2017).

Two independent 9-layer, width-100, 5x5 valid-conv chains predict 21x21
gather kernels for the diffuse and specular streams; kernels are
softmax-normalized and applied as gathers, then the streams are recombined
as ``albedo * diffuse + (exp(specular) - 1)``.
"""

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from sbmc_tpu.nn.layers import ConvChain
from sbmc_tpu.nn.kernel_apply import kernel_apply
from sbmc_tpu.utils.image import crop_like

__all__ = ["KPCN"]


class KPCN(nn.Module):
    """Kernel-Predicting Convolutional Network baseline.

    Call with a dict (all CHW, like the reference data pipeline emits):
      "kpcn_diffuse_in":  ``[bs, n_in, h, w]``
      "kpcn_specular_in": ``[bs, n_in, h, w]``
      "kpcn_diffuse_buffer": ``[bs, 3, h, w]``
      "kpcn_specular_buffer": ``[bs, 3, h, w]``
      "kpcn_albedo": ``[bs, 3, h, w]``

    Returns a dict with "radiance", "diffuse", "specular" (all cropped to the
    valid conv output size).
    """
    n_in: int = 27
    ksize: int = 21
    depth: int = 9
    width: int = 100
    #: compute dtype for the conv stacks (params stay float32).
    conv_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, data):
        k2 = self.ksize * self.ksize
        h, w = data["kpcn_diffuse_in"].shape[-2:]
        shrink = self.depth * 4  # depth valid 5x5 convs
        if h - shrink <= 0 or w - shrink <= 0:
            raise ValueError(
                "KPCN with depth=%d needs inputs larger than %dx%d "
                "(got %dx%d): the valid convolutions consume a %d-pixel "
                "border." % (self.depth, shrink, shrink, h, w, shrink // 2))

        def chain(name):
            dt = jnp.dtype(self.conv_dtype) if self.conv_dtype else None
            return ConvChain(k2, depth=self.depth, width=self.width, ksize=5,
                             activation="relu", weight_norm=False, pad=False,
                             output_type="linear", dtype=dt, name=name)

        # NHWC in the conv stacks, spatial-last for the kernel ops.
        d_in = data["kpcn_diffuse_in"].transpose(0, 2, 3, 1)
        s_in = data["kpcn_specular_in"].transpose(0, 2, 3, 1)
        k_diffuse = chain("diffuse")(d_in).transpose(0, 3, 1, 2)
        k_specular = chain("specular")(s_in).transpose(0, 3, 1, 2)

        b_diffuse = crop_like(data["kpcn_diffuse_buffer"], k_diffuse)
        b_specular = crop_like(data["kpcn_specular_buffer"], k_specular)

        r_diffuse, _ = kernel_apply(b_diffuse, k_diffuse, softmax=True,
                                    splat=False)
        r_specular, _ = kernel_apply(b_specular, k_specular, softmax=True,
                                     splat=False)

        albedo = crop_like(data["kpcn_albedo"], r_diffuse)
        final_specular = jnp.exp(r_specular) - 1
        final_diffuse = albedo * r_diffuse
        final_radiance = final_diffuse + final_specular

        return {"radiance": final_radiance, "diffuse": r_diffuse,
                "specular": r_specular}
