#!/usr/bin/env python
"""Dump PNG visualizations of a .bin dataset: reference image and optional
per-feature channels (reference: scripts/visualize_dataset.py)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from sbmc_tpu.utils.platform import honor_env_platform  # noqa: E402

honor_env_platform()



def _save(outdir, name, im, dtype=np.uint8):
    """Clip to [0,1] and write a PNG (uint8; uint16 for single-channel —
    the PIL backend cannot encode multi-channel 16-bit PNGs)."""
    import imageio.v2 as imageio
    im = np.asarray(im)
    if im.ndim == 3:  # [c, h, w] -> [h, w, c]
        im = im.transpose(1, 2, 0)
        if im.shape[-1] == 1:
            im = im[..., 0]
    if im.ndim == 3 and dtype != np.uint8:
        dtype = np.uint8
    im = np.clip(im, 0, 1)
    maxval = np.iinfo(dtype).max
    os.makedirs(outdir, exist_ok=True)
    imageio.imwrite(os.path.join(outdir, name),
                    (im * maxval).astype(dtype))


def main(args):
    from sbmc_tpu.data import FullImagesDataset
    from sbmc_tpu.utils.logging import get_logger, set_logger
    set_logger()
    log = get_logger("sbmc_tpu.visualize")

    data = FullImagesDataset(args.data_dir, spp=args.spp)
    log.info("Visualizing dataset with %d spp (gt_spp = %d)", data.spp,
             data.gt_sample_count)
    for idx in range(len(data)):
        sample = data[idx]
        im = sample["target_image"]
        log.info("sample %d target radiance: %.2f -- %.2f", idx, im.min(),
                 im.max())
        _save(args.output, "%04d_reference.png" % idx, im)
        _save(args.output, "%04d_low_spp.png" % idx, sample["low_spp"])

        if not args.dump_features:
            continue
        feats = sample["features"]  # [spp, nf, h, w]
        for i, k in enumerate(data.labels):
            if k in ("diffuse_r", "specular_r", "albedo_r",
                     "albedo_first_r"):
                vis = feats[:, i:i + 3]
                k = k[:-2]
            elif k in ("depth", "depth_first", "visibility", "hasHit"):
                vis = feats[:, i:i + 1]
            elif k in ("normal_x", "normal_first_x"):
                vis = (feats[:, i:i + 3] + 1.0) * 0.5
                k = k[:-2]
            else:
                continue
            vis = vis.mean(0)
            log.info("  %s (feature): %.2f -- %.2f", k, vis.min(), vis.max())
            _save(args.output, "%04d_%s.png" % (idx, k), vis,
                  dtype=np.uint16)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("data_dir",
                        help="folder containing the scenes to visualize")
    parser.add_argument("output", help="output folder for the PNGs")
    parser.add_argument("--spp", type=int)
    parser.add_argument("--dump_features", action="store_true",
                        default=False)
    main(parser.parse_args())
