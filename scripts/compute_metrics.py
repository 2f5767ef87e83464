#!/usr/bin/env python
"""Compute image quality metrics over .exr outputs (reference:
scripts/compute_metrics.py)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sbmc_tpu import evaluation  # noqa: E402
from sbmc_tpu.utils.logging import set_logger  # noqa: E402

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("ref", help="folder with reference .exr images")
    parser.add_argument("output", help="output .csv path")
    parser.add_argument("--methods", nargs="+", required=True,
                        help="folders with method outputs (or a .txt list)")
    parser.add_argument("--scenes", nargs="+", required=True,
                        help=".exr scene filenames (or a .txt list)")
    parser.add_argument("--pad", type=int, default=21,
                        help="border pixels to exclude")
    parser.add_argument("--stats", help="optional aggregated stats .csv")
    parser.add_argument("--latex", help="optional LaTeX table output path")
    args = parser.parse_args()
    set_logger()
    evaluation.compute(args.ref, args.output, args.methods, args.scenes,
                       pad=args.pad)
    if args.stats or args.latex:
        mean_df, _ = evaluation.stats(
            [args.output], args.stats or args.output + ".stats.csv")
        if args.latex:
            evaluation.to_latex(mean_df, args.latex)
