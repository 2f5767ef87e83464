#!/usr/bin/env python
"""Denoise .bin samples with the native prior-work baselines (NLM /
cross-bilateral / RPF / NFOR), producing the same .exr/.png outputs as
scripts/denoise.py so scripts/compute_metrics.py can score them alongside
the SBMC model.

Plays the role of the reference's dockerized prior-method binaries
(reference: dockerfiles/cuda-sbmc.dockerfile:53-90) for the two classical
filters; see sbmc_tpu/comparisons.py for fidelity notes.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from sbmc_tpu.utils.platform import honor_env_platform  # noqa: E402

honor_env_platform()


def main(args):
    if not args.output.endswith(".exr"):
        raise SystemExit("--output must be a .exr path, got %r"
                         % args.output)
    import imageio.v2 as imageio
    from sbmc_tpu.comparisons import denoise_buffers
    from sbmc_tpu.data import FullImagesDataset, TilesDataset
    from sbmc_tpu.utils import exr
    from sbmc_tpu.utils.logging import get_logger, set_logger
    import time

    set_logger(args.verbose)
    log = get_logger("sbmc_tpu.baselines")

    data = FullImagesDataset(args.input, mode=TilesDataset.RAW_MODE,
                             spp=args.spp)
    for scene_id in range(len(data)):
        item = data[scene_id]
        scene = os.path.basename(data.get_scene_name(scene_id))
        out_path = args.output if len(data) == 1 else \
            args.output.replace(".exr", "_%s.exr" % scene)
        t0 = time.time()
        out = denoise_buffers(item["features"], data.labels,
                              method=args.method)
        log.info("  %s: %s denoise %.1f ms", scene, args.method,
                 (time.time() - t0) * 1000)
        out_radiance = out.transpose(1, 2, 0)
        outdir = os.path.dirname(out_path)
        if outdir:
            os.makedirs(outdir, exist_ok=True)
        exr.write(out_path, out_radiance)
        png = out_path.replace(".exr", ".png")
        imageio.imwrite(
            png, (np.clip(out_radiance, 0, 1) * 255).astype(np.uint8))
        log.info("    wrote %s / %s", out_path, png)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", type=str, required=True,
                        help="folder containing the sample .bin files.")
    parser.add_argument("--output", type=str, required=True,
                        help="output .exr destination.")
    parser.add_argument("--method", choices=["nlm", "cbf", "rpf", "nfor"],
                        default="nlm")
    parser.add_argument("--spp", type=int, default=None,
                        help="number of samples to use as input.")
    parser.add_argument("--verbose", action="store_true")
    main(parser.parse_args())
