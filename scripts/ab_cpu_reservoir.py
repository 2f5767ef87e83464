"""CPU-scale host-vs-reservoir attribution A/B on the real corpus.

The round-4 evidence (VERDICT missing #1 / weak #2): fresh-init f32/host
training beat `input_loss` by step 250-500 on the round-4 corpus, while
the warm-started f32/reservoir segment (steps 504-1325) and the
2026-08-19 9000-step f32/reservoir run never did. This script reproduces
both regimes at a reduced-but-real scale (real TilesDataset tiles,
real Multisteps model, identical DenoiserInterface) on CPU so the
difference can be attributed and root-caused without chip time.

Usage:
  JAX_PLATFORMS=cpu python scripts/ab_cpu_reservoir.py .qrun/train out_dir \
      [--steps 400] [--arm host|reservoir|both]

Writes out_dir/{host,reservoir}.csv with step,input_loss,loss rows and a
verdict line per arm (scripts/judge_ab.py semantics: tail loss vs tail
input_loss).
"""

import argparse
import csv
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from sbmc_tpu.utils.platform import honor_env_platform  # noqa: E402

honor_env_platform()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from sbmc_tpu.data.datasets import TilesDataset  # noqa: E402
from sbmc_tpu.data.loader import Loader  # noqa: E402
from sbmc_tpu.models.multisteps import Multisteps  # noqa: E402
from sbmc_tpu.train.interface import DenoiserInterface  # noqa: E402


class CropDataset:
    """Spatial crop wrapper: keeps items aligned (features/radiance/target
    share the same window) while cutting CPU cost 4x at crop=64."""

    def __init__(self, base, crop):
        self.base = base
        self.crop = crop

    def __len__(self):
        return len(self.base)

    def __getitem__(self, i):
        it = dict(self.base[i])
        c = self.crop
        it["features"] = np.ascontiguousarray(it["features"][..., :c, :c])
        it["radiance"] = np.ascontiguousarray(it["radiance"][..., :c, :c])
        it["target_image"] = np.ascontiguousarray(
            it["target_image"][..., :c, :c])
        return it

    def __getattr__(self, k):
        return getattr(self.base, k)


def run_arm(name, iface, data, args, out_csv):
    rows = []
    t0 = time.time()
    rng = jax.random.PRNGKey(0)

    if name == "host":
        loader = Loader(data, batch_size=args.bs, shuffle=True,
                        num_threads=2, random_mask_spp=(2, args.spp),
                        seed=1)
        first = next(iter(loader))
        state = iface.init(rng, first)
        step = 0
        it = iter(loader)
        while step < args.steps:
            try:
                batch = next(it)
            except StopIteration:
                it = iter(loader)
                continue
            state, m = iface.train_step(state, batch)
            step += 1
            if step % args.log_every == 0:
                rows.append((step, float(m["input_loss"]),
                             float(m["loss"])))
                print(f"{name} step {step}: loss {rows[-1][2]:.5f} "
                      f"input {rows[-1][1]:.5f} "
                      f"({(time.time()-t0)/step:.2f}s/step)", flush=True)
    else:
        from sbmc_tpu.train.reservoir import (DeviceReservoir,
                                              ReservoirFeeder)
        cap = min(args.capacity, len(data))
        res = DeviceReservoir(iface, capacity=cap, batch_size=args.bs,
                              spp_mask_range=(2, args.spp), seed=0)
        res.fill([data[i] for i in range(cap)])
        feeder = None
        if cap < len(data):
            feeder = ReservoirFeeder(data, depth=2).start()
        first = {k: np.stack([data[0][k]] * args.bs)
                 for k in ("features", "radiance", "global_features",
                           "target_image")}
        state = iface.init(rng, first)
        try:
            for step in range(1, args.steps + 1):
                if feeder is not None:
                    item = feeder.poll()
                    if item is not None:
                        res.refresh(item)
                state, m = res.train_step(state)
                if step % args.log_every == 0:
                    rows.append((step, float(m["input_loss"]),
                                 float(m["loss"])))
                    print(f"{name} step {step}: loss {rows[-1][2]:.5f} "
                          f"input {rows[-1][1]:.5f} "
                          f"({(time.time()-t0)/step:.2f}s/step)",
                          flush=True)
        finally:
            if feeder is not None:
                feeder.stop()

    with open(out_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["step", "input_loss", "loss"])
        w.writerows(rows)
    tail = max(1, len(rows) // 4)
    loss_tail = float(np.mean([r[2] for r in rows[-tail:]]))
    input_tail = float(np.mean([r[1] for r in rows[-tail:]]))
    verdict = "BEATS_INPUT" if loss_tail < input_tail else "NOT_LEARNING"
    print(f"ARM {name}: tail loss {loss_tail:.5f} vs input "
          f"{input_tail:.5f} -> {verdict}", flush=True)
    return verdict


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("data")
    ap.add_argument("out")
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--bs", type=int, default=4)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--crop", type=int, default=64)
    ap.add_argument("--width", type=int, default=32)
    ap.add_argument("--ksize", type=int, default=11)
    ap.add_argument("--nsteps", type=int, default=2)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--capacity", type=int, default=64)
    ap.add_argument("--log_every", type=int, default=10)
    ap.add_argument("--arm", choices=["host", "reservoir", "both"],
                    default="both")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    base = TilesDataset(args.data, spp=args.spp, cache_preprocessed=True)
    data = CropDataset(base, args.crop)
    print(f"dataset: {len(data)} tiles, {base.num_features} features",
          flush=True)

    arms = ["host", "reservoir"] if args.arm == "both" else [args.arm]
    verdicts = {}
    for name in arms:
        model = Multisteps(n_features=base.num_features,
                           n_global_features=base.num_global_features,
                           width=args.width, embedding_width=args.width,
                           ksize=args.ksize, nsteps=args.nsteps)
        iface = DenoiserInterface(model, lr=args.lr)
        verdicts[name] = run_arm(name, iface, data, args,
                                 os.path.join(args.out, f"{name}.csv"))
    print("VERDICTS:", verdicts, flush=True)


if __name__ == "__main__":
    main()
