#!/usr/bin/env python
"""Plots + LaTeX tables from metric CSVs (maintained replacement for the
reference's legacy scripts/figures/_legacy_big_metrics.py: per-method error
distributions, aggregate tables).

Inputs are the CSVs produced by scripts/compute_metrics.py / train_log.csv.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


def main(args):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import pandas as pd

    from sbmc_tpu import evaluation

    os.makedirs(args.output, exist_ok=True)
    df = pd.concat([pd.read_csv(p, index_col=0) for p in args.scores],
                   ignore_index=True)
    df = df[df["valid"]]

    metrics = [m for m in evaluation.METRIC_OPS if m in df]
    methods = sorted(df["method"].unique())

    # Per-metric box plots of the per-scene error distribution by method.
    fig, axes = plt.subplots(1, len(metrics),
                             figsize=(3.2 * len(metrics), 3.4))
    if len(metrics) == 1:
        axes = [axes]
    for ax, m in zip(axes, metrics):
        data = [df[df["method"] == meth][m].values for meth in methods]
        ax.boxplot(data, tick_labels=methods)
        ax.set_title(evaluation.METRIC_LABELS.get(m, m))
        ax.set_yscale("log")
        ax.tick_params(axis="x", rotation=45)
    fig.tight_layout()
    dist_path = os.path.join(args.output, "error_distributions.png")
    fig.savefig(dist_path, dpi=150)
    print("wrote", dist_path)

    # Aggregate table (CSV + LaTeX).
    mean_df, std_df = evaluation.stats(
        args.scores, os.path.join(args.output, "stats.csv"))
    evaluation.to_latex(mean_df, os.path.join(args.output, "stats.tex"))
    print("wrote", os.path.join(args.output, "stats.csv"), "and .tex")

    # Optional training-curve plot from train_log.csv files.
    for log_csv in args.train_logs or []:
        tl = pd.read_csv(log_csv)
        fig, ax = plt.subplots(figsize=(5, 3.2))
        for col in tl.columns:
            if col == "step":
                continue
            ax.plot(tl["step"], tl[col], label=col)
        ax.set_xlabel("step")
        ax.set_yscale("log")
        ax.legend()
        fig.tight_layout()
        name = os.path.splitext(os.path.basename(log_csv))[0]
        path = os.path.join(args.output, f"{name}_curves.png")
        fig.savefig(path, dpi=150)
        print("wrote", path)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("output", help="output folder for plots/tables")
    parser.add_argument("--scores", nargs="+", required=True,
                        help="per-scene metric CSVs from compute_metrics.py")
    parser.add_argument("--train_logs", nargs="*",
                        help="optional train_log.csv files to plot")
    main(parser.parse_args())
