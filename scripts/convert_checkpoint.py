#!/usr/bin/env python
"""Convert a reference (adobe/sbmc, PyTorch/ttools) checkpoint into this
framework's checkpoint format.

Reads the ``.pth`` with torch, maps names/layouts via
``sbmc_tpu.train.convert``, validates shapes against a freshly-initialized
model, and writes a loadable checkpoint directory with meta.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from sbmc_tpu.utils.platform import honor_env_platform  # noqa: E402

honor_env_platform()


def main(args):
    import jax
    import torch

    from sbmc_tpu.models.build import build_model
    from sbmc_tpu.train import Checkpointer, DenoiserInterface, TrainState
    from sbmc_tpu.train.convert import torch_state_dict_to_flax

    blob = torch.load(args.pth, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "model" in blob:
        state_dict = blob["model"]
    elif isinstance(blob, dict) and "state_dict" in blob:
        state_dict = blob["state_dict"]
    else:
        state_dict = blob

    with open(args.meta) as f:
        meta = json.load(f)

    model = build_model(meta)
    spp, h, w = 2, 48, 48
    rng = np.random.RandomState(0)
    if meta.get("kpcn_mode", False):
        n_in = meta["model_params"].get("n_in", 27)
        batch = {k: rng.rand(1, c, h, w).astype(np.float32) for k, c in [
            ("kpcn_diffuse_in", n_in), ("kpcn_specular_in", n_in),
            ("kpcn_diffuse_buffer", 3), ("kpcn_specular_buffer", 3),
            ("kpcn_albedo", 3)]}
    else:
        nf = meta["model_params"]["n_features"]
        ngf = meta["model_params"]["n_global_features"]
        batch = {
            "radiance": rng.rand(1, spp, 3, h, w).astype(np.float32),
            "features": rng.rand(1, spp, nf, h, w).astype(np.float32),
            "global_features": rng.rand(1, ngf, 1, 1).astype(np.float32),
        }
    template = model.init(jax.random.PRNGKey(0), batch)
    params = torch_state_dict_to_flax(state_dict, template=template)

    interface = DenoiserInterface(model)
    state = TrainState(params=params, opt_state=interface.tx.init(params),
                       step=np.zeros((), np.int32))
    ckpt = Checkpointer(args.output, meta=meta)
    ckpt.save(state, 0, tag="final")
    print("converted %d tensors -> %s" % (len(state_dict), args.output))


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("pth", help="reference .pth checkpoint file")
    parser.add_argument("meta", help="meta .json describing the model "
                        "(kpcn_mode, model_params, data_params)")
    parser.add_argument("output", help="output checkpoint directory")
    main(parser.parse_args())
