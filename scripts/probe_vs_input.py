#!/usr/bin/env python
"""Training-sanity probe: score a checkpoint (or f16 snapshot) against the
trivial predictor — the plain per-pixel sample mean, i.e. the noisy input —
on tiles from a dataset, under the training loss.

A denoiser that has learned anything beats the input mean decisively (the
round-2 run did within hundreds of steps). This probe is how the broken
2026-08-19 bf16+reservoir flagship run was diagnosed: after 9000 steps it
scored 0.103 vs 0.011 for the input mean on its own training tiles. The
same signal is now also logged per-step as the ``input_loss`` column in
train_log.csv (sbmc_tpu/train/interface.py _input_baseline).

Usage:
  python scripts/probe_vs_input.py <data_dir> <ckpt_or_snapshot_dir> \
      [--spp 8] [--tiles 4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from sbmc_tpu.utils.platform import honor_env_platform  # noqa: E402

honor_env_platform()


def load_params(src, model, probe_batch):
    """Params from a Checkpointer dir or an export_params f16 snapshot."""
    import flax.serialization
    import jax

    from sbmc_tpu.train import Checkpointer, DenoiserInterface, TrainState

    params = model.init(jax.random.PRNGKey(0), probe_batch)
    snap = os.path.join(src, "params_f16.msgpack")
    if os.path.exists(snap):
        with open(snap, "rb") as f:
            f16 = flax.serialization.from_bytes(
                jax.tree_util.tree_map(
                    lambda x: np.asarray(x).astype(np.float16), params),
                f.read())
        return jax.tree_util.tree_map(
            lambda t, s: np.asarray(s).astype(np.asarray(t).dtype),
            params, f16)
    iface = DenoiserInterface(model)
    tmpl = TrainState(params=params, opt_state=iface.tx.init(params),
                      step=np.zeros((), np.int32))
    ckpt = Checkpointer(src)
    state, step = ckpt.load_latest(tmpl)
    if step is None:
        state, step = ckpt.load_tag(tmpl, "final")
    if step is None:
        raise SystemExit(f"no checkpoint found in {src}")
    print(f"loaded checkpoint step {step}")
    return state.params


def main(args):
    import jax
    import jax.numpy as jnp

    from sbmc_tpu import losses
    from sbmc_tpu.data import TilesDataset
    from sbmc_tpu.models.build import build_model
    from sbmc_tpu.train import Checkpointer

    meta = Checkpointer.load_meta(args.checkpoint)
    model = build_model(meta)
    ds = TilesDataset(args.data, spp=args.spp)
    it0 = ds[0]
    probe = {k: np.asarray(v)[None] for k, v in it0.items()
             if isinstance(v, np.ndarray)}
    params = load_params(args.checkpoint, model, probe)
    apply_fn = jax.jit(model.apply)

    idxs = np.linspace(0, len(ds) - 1, args.tiles).astype(int)
    lm, li = [], []
    for i in idxs:
        it = ds[int(i)]
        batch = {k: np.asarray(v)[None] for k, v in it.items()
                 if isinstance(v, np.ndarray)}
        t0 = time.time()
        out = np.asarray(apply_fn(params, batch)["radiance"])
        h, w = out.shape[-2:]
        th, tw = it["target_image"].shape[-2:]
        oy, ox = (th - h) // 2, (tw - w) // 2
        tgt = np.asarray(it["target_image"])[None][
            :, :, oy:oy + h, ox:ox + w]
        pin = np.asarray(it["radiance"]).mean(0, keepdims=True)[
            :, :, oy:oy + h, ox:ox + w]
        a = float(losses.tonemapped_relative_mse(jnp.array(out),
                                                 jnp.array(tgt)))
        b = float(losses.tonemapped_relative_mse(jnp.array(pin),
                                                 jnp.array(tgt)))
        lm.append(a)
        li.append(b)
        print(f"tile {i}: model {a:.5f} vs input-mean {b:.5f} "
              f"({time.time() - t0:.0f}s)", flush=True)
    mm, mi = float(np.mean(lm)), float(np.mean(li))
    verdict = "BEATS" if mm < mi else "LOSES TO"
    print(f"MEAN over {len(idxs)} tiles: model {mm:.5f} vs input {mi:.5f} "
          f"-> model {verdict} the trivial input mean")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("data", help=".bin tile folder")
    p.add_argument("checkpoint", help="checkpoint dir or f16 snapshot dir")
    p.add_argument("--spp", type=int, default=8)
    p.add_argument("--tiles", type=int, default=4)
    main(p.parse_args())
