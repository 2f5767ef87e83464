#!/usr/bin/env python
"""Judge a training run's health from its train_log.csv.

The 2026-08-19 incident (a 9000-step flagship run that never beat the
trivial input mean — see scripts/train.py's --trust_bf16 /
--trust_reservoir guards) showed that unattended runs need a mechanical
health verdict before a config graduates to long budgets. The criterion
mirrors the guard's contract: by the end of the run the model must (a)
out-denoise its own network input (tail-mean loss < tail-mean
input_loss) and (b) still be improving relative to its first third.

Exit code 0 = healthy, 1 = unhealthy/unreadable (shell-friendly:
``if python scripts/judge_ab.py log.csv; then ...``). ``--json`` prints
the evidence either way.

Reference role: the manual loss-curve read a human would do on the
reference's visdom plots (scripts/train.py:70-72 there); here it gates
the round-4 extension driver's config choice.
"""

import argparse
import csv
import json
import sys


def judge(path, tail_frac=1.0 / 3.0, min_rows=6, beats_input_only=False):
    """Return a verdict dict for one train_log.csv.

    ``beats_input_only`` drops the "still improving" criterion — the
    right contract for judging a *resumed* segment late in training,
    where a healthy run plateaus but must never fall back above the
    input baseline.
    """
    try:
        with open(path) as f:
            rows = [r for r in csv.DictReader(f)
                    if r.get("loss") and r.get("input_loss")]
    except OSError as e:
        return {"healthy": False, "reason": "unreadable: %s" % e,
                "path": path}
    if len(rows) < min_rows:
        return {"healthy": False,
                "reason": "only %d rows (< %d)" % (len(rows), min_rows),
                "path": path}
    k = max(2, int(len(rows) * tail_frac))
    mean = lambda rs, key: (  # noqa: E731
        sum(float(r[key]) for r in rs) / len(rs))
    head, tail = rows[:k], rows[-k:]
    loss_tail = mean(tail, "loss")
    input_tail = mean(tail, "input_loss")
    loss_head = mean(head, "loss")
    beats_input = loss_tail < input_tail
    improving = loss_tail < loss_head
    return {
        "healthy": bool(beats_input and (improving or beats_input_only)),
        "beats_input": bool(beats_input),
        "improving": bool(improving),
        "loss_tail": loss_tail,
        "input_loss_tail": input_tail,
        "loss_head": loss_head,
        "rows": len(rows),
        "last_step": int(float(rows[-1]["step"])),
        "path": path,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("csv", help="train_log.csv to judge")
    ap.add_argument("--tail_frac", type=float, default=1.0 / 3.0,
                    help="fraction of rows in the head/tail windows")
    ap.add_argument("--min_rows", type=int, default=6)
    ap.add_argument("--beats_input_only", action="store_true",
                    help="only require tail loss < tail input_loss "
                    "(segment checks on resumed, plateaued runs)")
    ap.add_argument("--json", action="store_true",
                    help="print the full verdict as JSON")
    args = ap.parse_args()
    v = judge(args.csv, tail_frac=args.tail_frac, min_rows=args.min_rows,
              beats_input_only=args.beats_input_only)
    if args.json:
        print(json.dumps(v))
    else:
        print("healthy" if v["healthy"]
              else "unhealthy (%s)" % v.get("reason", "see --json"))
    sys.exit(0 if v["healthy"] else 1)


if __name__ == "__main__":
    main()
