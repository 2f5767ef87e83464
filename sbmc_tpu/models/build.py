"""Model construction from checkpoint metadata, so inference needs no flags
(reference: scripts/denoise.py:107-123 reconstructing the model from
``ttools.Checkpointer.load_meta``)."""

from sbmc_tpu.models.kpcn import KPCN
from sbmc_tpu.models.multisteps import Multisteps

__all__ = ["build_model", "model_meta"]


def build_model(meta):
    """Instantiate the model described by a checkpoint ``meta`` dict."""
    params = dict(meta["model_params"])
    if meta.get("kpcn_mode", False):
        return KPCN(**params)
    return Multisteps(**params)


def model_meta(kpcn_mode, model_params, data_params):
    """Assemble the meta dict persisted with checkpoints (reference:
    scripts/train.py:84-87)."""
    return {
        "kpcn_mode": bool(kpcn_mode),
        "model_params": dict(model_params),
        "data_params": dict(data_params),
    }
