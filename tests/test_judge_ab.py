"""The A/B health judge (scripts/judge_ab.py) that gates unattended
config promotion (the 2026-08-19 non-learning-run guard, mechanized)."""

import csv
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "scripts"))

from judge_ab import judge  # noqa: E402


def _write(path, rows):
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["step", "input_loss", "loss", "rmse"])
        for r in rows:
            w.writerow(r)


def test_healthy_declining_run(tmp_path):
    p = tmp_path / "log.csv"
    # Loss declines through the input baseline (the overnight control's
    # shape): healthy.
    _write(p, [(25 * (i + 1), 0.034, 0.05 * 0.93 ** i, 0.1)
               for i in range(24)])
    v = judge(str(p))
    assert v["healthy"] and v["beats_input"] and v["improving"]


def test_stuck_above_input_is_unhealthy(tmp_path):
    p = tmp_path / "log.csv"
    # Declining but plateaued ABOVE the input baseline (the 2026-08-19
    # 9000-step failure's shape): unhealthy.
    _write(p, [(25 * (i + 1), 0.019, 0.04 - 0.001 * min(i, 8), 0.1)
               for i in range(24)])
    v = judge(str(p))
    assert not v["healthy"] and not v["beats_input"]


def test_diverging_run_is_unhealthy(tmp_path):
    p = tmp_path / "log.csv"
    _write(p, [(25 * (i + 1), 0.034, 0.01 * 1.2 ** i, 0.1)
               for i in range(24)])
    assert not judge(str(p))["healthy"]


def test_too_few_rows_and_missing_file(tmp_path):
    p = tmp_path / "log.csv"
    _write(p, [(25, 0.03, 0.01, 0.1)])
    assert not judge(str(p))["healthy"]
    assert not judge(str(tmp_path / "nope.csv"))["healthy"]


def test_cli_exit_codes(tmp_path):
    good = tmp_path / "good.csv"
    _write(good, [(25 * (i + 1), 0.034, 0.05 * 0.93 ** i, 0.1)
                  for i in range(24)])
    bad = tmp_path / "bad.csv"
    _write(bad, [(25 * (i + 1), 0.019, 0.04, 0.1) for i in range(24)])
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    rc_good = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "judge_ab.py"),
         str(good), "--json"], env=env, capture_output=True).returncode
    rc_bad = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "judge_ab.py"),
         str(bad)], env=env, capture_output=True).returncode
    assert rc_good == 0 and rc_bad == 1
