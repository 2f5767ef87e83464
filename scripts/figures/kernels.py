#!/usr/bin/env python
"""Visualize the per-sample splatting kernels predicted by a trained SBMC
model (maintained replacement for the reference's legacy
scripts/figures/kernels.py).

Loads a checkpoint, re-runs the model with ``return_kernels=True``, and
writes per-sample kernel grids: each pixel's k x k kernel rendered as a
k-times-enlarged exp-normalized image, plus the denoised output.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import numpy as np  # noqa: E402
from sbmc_tpu.utils.platform import honor_env_platform  # noqa: E402

honor_env_platform()


def kernels_to_image(kernels):
    """[k2, h, w] kernel logits -> [h*k, w*k] exp-normalized grid image."""
    k2, h, w = kernels.shape
    k = int(round(k2 ** 0.5))
    img = kernels.reshape(k, k, h, w).transpose(2, 0, 3, 1).reshape(
        h * k, w * k)
    return np.exp(img - img.max())


def main(args):
    import dataclasses

    import imageio.v2 as imageio
    import jax

    from sbmc_tpu.data import FullImagesDataset
    from sbmc_tpu.models.build import build_model
    from sbmc_tpu.train import Checkpointer, DenoiserInterface, TrainState

    meta = Checkpointer.load_meta(args.checkpoint)
    if meta.get("kpcn_mode", False):
        raise SystemExit("kernel visualization requires an SBMC "
                         "(Multisteps) checkpoint; KPCN predicts per-pixel "
                         "gather kernels without the per-sample scan.")
    data = FullImagesDataset(args.input, **meta["data_params"])
    model = dataclasses.replace(build_model(meta), return_kernels=True)

    item = data[0]
    batch = {k: v[None] for k, v in item.items()
             if isinstance(v, np.ndarray)}
    if args.crop:
        for k in ("radiance", "features"):
            batch[k] = batch[k][..., :args.crop, :args.crop]

    params = model.init(jax.random.PRNGKey(0), batch)
    interface = DenoiserInterface(model)
    ckpt = Checkpointer(args.checkpoint)
    state_t = TrainState(params=params,
                         opt_state=interface.tx.init(params),
                         step=np.zeros((), np.int32))
    state, step = ckpt.load_latest(state_t)
    if step is None:
        state, _ = ckpt.load_tag(state_t, "final")

    out = model.apply(state.params, batch)
    os.makedirs(args.output, exist_ok=True)

    rad = np.asarray(out["radiance"])[0].transpose(1, 2, 0)
    imageio.imwrite(os.path.join(args.output, "output.png"),
                    (np.clip(rad / (1 + rad), 0, 1) * 255).astype(np.uint8))

    kernels = np.asarray(out["kernels"])[0]  # [spp, k2, h, w]
    for s in range(min(args.samples, kernels.shape[0])):
        grid = kernels_to_image(kernels[s])
        imageio.imwrite(
            os.path.join(args.output, "kernels_sample%02d.png" % s),
            (np.clip(grid, 0, 1) * 255).astype(np.uint8))
    print("wrote kernel grids for %d samples to %s"
          % (min(args.samples, kernels.shape[0]), args.output))


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True,
                        help=".bin scene folder")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--samples", type=int, default=4)
    parser.add_argument("--crop", type=int, default=64,
                        help="crop size to keep the kernel grids small")
    main(parser.parse_args())
