"""Small image helpers (the role ttools.modules.image_operators plays for the
reference, e.g. ``crop_like`` used in sbmc/models.py:27 and
sbmc/interfaces.py:26)."""

import jax.numpy as jnp

__all__ = ["crop_like", "tonemap"]


def crop_like(src, tgt):
    """Center-crop the last two (spatial) dims of ``src`` to match ``tgt``.

    Works for arrays whose spatial dims are the last two axes, any rank.
    """
    sh, sw = src.shape[-2], src.shape[-1]
    th, tw = tgt.shape[-2], tgt.shape[-1]
    if (sh, sw) == (th, tw):
        return src
    if sh < th or sw < tw:
        raise ValueError(f"cannot crop {src.shape} to larger {tgt.shape}")
    dy, dx = (sh - th) // 2, (sw - tw) // 2
    return src[..., dy:dy + th, dx:dx + tw]


def tonemap(im, eps=None):
    """Reinhard tonemap ``x / (1 + x)`` after clamping negatives (reference:
    sbmc/losses.py:111-121)."""
    im = jnp.maximum(im, 0)
    return im / (1.0 + im)
