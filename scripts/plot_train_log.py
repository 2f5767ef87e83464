#!/usr/bin/env python
"""Render train_log.csv loss curves (with the input_loss sanity baseline)
to a PNG for the quality docs.

The reference exposes live training curves through its visdom server
(reference: scripts/train.py:99-106 log_keys + ttools); this is the
file-artifact equivalent: smoothed loss / rmse vs steps, the trivial
input-mean baseline overlaid when the log carries the round-4
``input_loss`` column, and multiple logs on one axis for A/B comparisons
(e.g. the bf16-vs-reservoir attribution runs).

Usage:
  python scripts/plot_train_log.py ckpt/train_log.csv [more.csv ...] \
      -o curve.png [--ema 0.97]
"""

import argparse
import csv
import os


def read_log(path):
    cols = {}
    with open(path) as f:
        for row in csv.DictReader(f):
            for k, v in row.items():
                if v is None or v == "":
                    continue
                try:
                    cols.setdefault(k, []).append(float(v))
                except ValueError:
                    pass
    return cols


def ema(xs, alpha):
    out, m = [], None
    for x in xs:
        m = x if m is None else alpha * m + (1 - alpha) * x
        out.append(m)
    return out


def main(args):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 4.5), dpi=120)
    for path in args.logs:
        cols = read_log(path)
        if "step" not in cols or "loss" not in cols:
            print(f"skip {path}: no step/loss columns")
            continue
        label = args.labels.pop(0) if args.labels else \
            os.path.basename(os.path.dirname(os.path.abspath(path))) or path
        steps = cols["step"]
        ln, = ax.plot(steps, ema(cols["loss"], args.ema),
                      label=f"{label} loss")
        if "input_loss" in cols and len(cols["input_loss"]) == len(steps):
            ax.plot(steps, ema(cols["input_loss"], args.ema), "--",
                    color=ln.get_color(), alpha=0.6,
                    label=f"{label} input baseline")
    ax.set_xlabel("step")
    ax.set_ylabel(f"loss (EMA {args.ema})")
    ax.set_yscale("log")
    ax.grid(True, alpha=0.25)
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(args.output)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("logs", nargs="+", help="train_log.csv paths")
    p.add_argument("-o", "--output", default="train_curve.png")
    p.add_argument("--ema", type=float, default=0.97)
    p.add_argument("--labels", nargs="*", default=[],
                   help="legend labels (positional, one per log)")
    main(p.parse_args())
