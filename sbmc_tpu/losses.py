"""Loss functions and metrics (reference: sbmc/losses.py:23-121).

All losses are plain functions over jnp arrays; class-style wrappers mirror
the reference module names.
"""

import jax
import jax.numpy as jnp

from sbmc_tpu.utils.image import tonemap

__all__ = ["relative_mse", "smape", "tonemapped_mse",
           "tonemapped_relative_mse",
           "RelativeMSE", "SMAPE", "TonemappedMSE", "TonemappedRelativeMSE"]


def relative_mse(im, ref, eps=1e-2):
    """0.5 * mean((im - ref)^2 / (ref^2 + eps))."""
    mse = (im - ref) ** 2
    return 0.5 * jnp.mean(mse / (ref ** 2 + eps))


def smape(im, ref, eps=1e-2):
    """Symmetric mean absolute error; the denominator only scales the loss
    and contributes no gradient (reference: sbmc/losses.py:64-70)."""
    denom = eps + jax.lax.stop_gradient(jnp.abs(im)) + \
        jax.lax.stop_gradient(jnp.abs(ref))
    return jnp.mean(jnp.abs(im - ref) / denom)


def tonemapped_mse(im, ref, eps=1e-2):
    im = tonemap(im)
    ref = tonemap(ref)
    return 0.5 * jnp.mean((im - ref) ** 2)


def tonemapped_relative_mse(im, ref, eps=1e-2):
    """The reference training loss (reference: sbmc/interfaces.py:50)."""
    im = tonemap(im)
    ref = tonemap(ref)
    mse = (im - ref) ** 2
    return 0.5 * jnp.mean(mse / (ref ** 2 + eps))


def _cls(fn):
    class _Loss:
        def __init__(self, eps=1e-2):
            self.eps = eps

        def __call__(self, im, ref):
            return fn(im, ref, eps=self.eps)
    return _Loss


RelativeMSE = _cls(relative_mse)
SMAPE = _cls(smape)
TonemappedMSE = _cls(tonemapped_mse)
TonemappedRelativeMSE = _cls(tonemapped_relative_mse)
