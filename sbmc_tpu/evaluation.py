"""Offline quality evaluation over rendered ``.exr`` images (reference:
sbmc/evaluation.py:32-310).

Computes MSE / relative MSE / DSSIM / L1 / relative L1 between method
outputs and references, excluding a border, writing per-scene rows to CSV
and mean/std aggregates. SSIM is implemented in numpy (uniform 7x7 window,
K1=0.01, K2=0.03, channel-averaged) to match the legacy
``skimage.measure.compare_ssim(multichannel=True)`` the reference calls —
including its float-input convention ``data_range = 2``.
"""

import os
import re

import numpy as np
import pandas as pd

from sbmc_tpu.utils import exr
from sbmc_tpu.utils.logging import get_logger

LOG = get_logger(__name__)

__all__ = ["compute", "stats", "METRIC_OPS", "METRIC_LABELS", "ssim"]


def _mse(im, ref):
    return float(np.square(im - ref).mean())


def _rmse(im, ref, eps=1e-4):
    diff = np.square(im - ref) / (np.square(ref) + eps)
    diff = np.ravel(diff)
    diff = diff[~np.isnan(diff)]
    return float(diff.mean())


def _l1(im, ref):
    return float(np.abs(im - ref).mean())


def _rl1(im, ref, eps=1e-4):
    return float((np.abs(im - ref) / (np.abs(ref) + eps)).mean())


def _uniform_filter(x, win):
    """Separable uniform (box) filter with 'valid' output region."""
    c = np.cumsum(np.pad(x, [(1, 0), (0, 0), (0, 0)], mode="constant"),
                  axis=0)
    x = (c[win:] - c[:-win]) / win
    c = np.cumsum(np.pad(x, [(0, 0), (1, 0), (0, 0)], mode="constant"),
                  axis=1)
    return (c[:, win:] - c[:, :-win]) / win


def ssim(im, ref, win_size=7, k1=0.01, k2=0.03, data_range=2.0):
    """Mean structural similarity over channels (legacy-skimage style)."""
    im = np.asarray(im, np.float64)
    ref = np.asarray(ref, np.float64)
    if im.ndim == 2:
        im, ref = im[..., None], ref[..., None]
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    # "Sample" (unbiased-style) moments like skimage's use_sample_covariance.
    n = win_size * win_size
    cov_norm = n / (n - 1)
    ux = _uniform_filter(im, win_size)
    uy = _uniform_filter(ref, win_size)
    uxx = _uniform_filter(im * im, win_size)
    uyy = _uniform_filter(ref * ref, win_size)
    uxy = _uniform_filter(im * ref, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    num = (2 * ux * uy + c1) * (2 * vxy + c2)
    den = (ux ** 2 + uy ** 2 + c1) * (vx + vy + c2)
    return float((num / den).mean())


def _dssim(im, ref):
    return 1.0 - ssim(im, ref)


METRIC_LABELS = {"mse": "MSE", "rmse": "rMSE", "ssim": "DSSIM",
                 "l1": r"$L_1$", "relative_l1": r"relative $L_1$"}

METRIC_OPS = {"mse": _mse, "rmse": _rmse, "ssim": _dssim, "l1": _l1,
              "relative_l1": _rl1}


def _get_spp(method_name):
    """Extract the spp count from a "<N>spp_<method>" directory name."""
    method_name = method_name.strip()
    m = re.match(r"^(\d+)spp(?:_(.*))?$", method_name)
    if not m:
        raise ValueError("unexpected spp format for '%s'" % method_name)
    spp = int(m.group(1))
    return m.group(2) or "input", spp


def _parse_list_or_txt(_input):
    if len(_input) == 1 and os.path.splitext(_input[0])[-1] == ".txt":
        with open(_input[0]) as fid:
            return [line.strip() for line in fid if line.strip()]
    return list(_input)


def compute(ref_folder, output, methods, scenes, pad=21):
    """Compute metrics for each (method, scene) pair; write a CSV.

    Args:
      ref_folder: folder with reference ``.exr`` images.
      output: output ``.csv`` path.
      methods: folders with method outputs, named ``<N>spp_<method>``.
      scenes: scene ``.exr`` filenames (list or ``.txt``).
      pad: border pixels excluded from the metrics.
    """
    scenes = _parse_list_or_txt(scenes)
    methods = _parse_list_or_txt(methods)
    if os.path.splitext(output)[-1] != ".csv":
        raise RuntimeError("Metric computation expects a .csv output path.")
    os.makedirs(os.path.dirname(output) or ".", exist_ok=True)

    LOG.info("Evaluating %d scenes and %d methods", len(scenes), len(methods))
    rows = []
    for scene in scenes:
        sname = os.path.splitext(scene)[0]
        ref = exr.read(os.path.join(ref_folder, scene))[..., :3]
        if ref.sum() == 0:
            raise ValueError("got an all zero reference image %s" % scene)
        if pad > 0:
            ref = ref[pad:-pad, pad:-pad, :]
        for m in methods:
            mname, spp = _get_spp(os.path.split(m)[-1])
            row = {"method": mname, "scene": sname, "spp": spp}
            try:
                im = exr.read(os.path.join(m, scene))[..., :3]
                if pad > 0:
                    im = im[pad:-pad, pad:-pad, :]
                if im.sum() == 0:
                    raise ValueError("all-zero output image")
                row["valid"] = True
                for k, op in METRIC_OPS.items():
                    row[k] = op(im, ref)
            except Exception as e:
                LOG.error("invalid %s/%s: %s", m, scene, e)
                row["valid"] = False
                for k in METRIC_OPS:
                    row[k] = -1.0
            rows.append(row)
    scores = pd.DataFrame(rows)
    scores.to_csv(output)
    return scores


def stats(csv_files, output):
    """Aggregate per-scene CSVs into per-(spp, method) mean/std tables
    (invalid scenes pruned entirely, reference: sbmc/evaluation.py:139-180).
    """
    df = pd.concat([pd.read_csv(p, index_col=0) for p in csv_files],
                   ignore_index=True)
    invalid_scenes = df.loc[~df["valid"]]["scene"].unique()
    if len(invalid_scenes):
        LOG.warning("%d invalid scenes %s", len(invalid_scenes),
                    invalid_scenes)
    df = df[~df["scene"].isin(invalid_scenes)]
    df = df[df["valid"]]

    metric_cols = list(METRIC_OPS.keys())
    mean_rows, std_rows = [], []
    for spp in df["spp"].unique():
        cur = df[df["spp"] == spp]
        for m in cur["method"].unique():
            mdata = cur[cur["method"] == m]
            mean = {k: mdata[k].mean() for k in metric_cols}
            std = {k: mdata[k].std() for k in metric_cols}
            for row, agg in ((mean, mean_rows), (std, std_rows)):
                row["method"] = m
                row["spp"] = spp
                agg.append(row)
    mean_df = pd.DataFrame(mean_rows)
    std_df = pd.DataFrame(std_rows)
    LOG.info("Averages:\n%s", mean_df)
    mean_df.to_csv(output)
    return mean_df, std_df


def to_latex(mean_df, path=None):
    """Render a mean-metrics table as LaTeX (the reference's legacy
    figure-table exporter role, scripts/figures/_legacy_big_metrics.py)."""
    cols = ["method", "spp"] + [c for c in METRIC_LABELS if c in mean_df]
    df = mean_df[cols].rename(columns=METRIC_LABELS)
    try:
        tex = df.to_latex(index=False, float_format="%.5f")
    except AttributeError:  # pandas without DataFrame.to_latex
        tex = df.style.format(precision=5).to_latex()
    if path is not None:
        with open(path, "w") as f:
            f.write(tex)
    return tex
