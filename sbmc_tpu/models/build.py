"""Model construction from checkpoint metadata, so inference needs no flags
(reference: scripts/denoise.py:107-123 reconstructing the model from
``ttools.Checkpointer.load_meta``)."""

from sbmc_tpu.models.kpcn import KPCN
from sbmc_tpu.models.lbf import LBF
from sbmc_tpu.models.multisteps import Multisteps

__all__ = ["build_model", "model_meta"]


def build_model(meta):
    """Instantiate the model described by a checkpoint ``meta`` dict."""
    params = dict(meta["model_params"])
    arch = meta.get("arch")
    if arch is None:  # round-1 checkpoints carry only kpcn_mode
        arch = "kpcn" if meta.get("kpcn_mode", False) else "sbmc"
    if arch == "kpcn":
        return KPCN(**params)
    if arch == "lbf":
        return LBF(**params)
    return Multisteps(**params)


def model_meta(kpcn_mode, model_params, data_params, arch=None):
    """Assemble the meta dict persisted with checkpoints (reference:
    scripts/train.py:84-87)."""
    if arch is None:
        arch = "kpcn" if kpcn_mode else "sbmc"
    return {
        "arch": arch,
        "kpcn_mode": arch == "kpcn",
        "model_params": dict(model_params),
        "data_params": dict(data_params),
    }
