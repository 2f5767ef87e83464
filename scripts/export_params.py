#!/usr/bin/env python
"""Export / import committable parameter snapshots.

A full training checkpoint (params + Adam state, float32) for the flagship
model is ~420 MB — too large to commit, while the scratch disk holding it
does not survive between sessions. ``export`` writes a params-only
float16 msgpack (~70 MB for the flagship) plus the checkpoint's meta.json;
``import`` rebuilds a loadable checkpoint directory from such a snapshot
(params upcast to float32, optimizer state freshly initialized), usable by
``scripts/denoise.py`` / ``scripts/eval_suite.py`` and as a training
warm start (reference role: the released ``final.pth`` artifacts,
reference Makefile:187,213-217).

Usage:
  python scripts/export_params.py export <ckpt_dir> <out_dir> [--tag final]
  python scripts/export_params.py import <snapshot_dir> <ckpt_dir>
"""

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from sbmc_tpu.utils.platform import honor_env_platform  # noqa: E402

honor_env_platform()

SNAP_FILE = "params_f16.msgpack"


def export(args):
    import flax.serialization
    import jax

    from sbmc_tpu.models.build import build_model
    from sbmc_tpu.train import Checkpointer, DenoiserInterface, TrainState

    meta = Checkpointer.load_meta(args.src)
    model = build_model(meta)
    iface = DenoiserInterface(model)
    params = model.init(jax.random.PRNGKey(0), _probe_batch(meta))
    tmpl = TrainState(params=params, opt_state=iface.tx.init(params),
                      step=np.zeros((), np.int32))
    ckpt = Checkpointer(args.src)
    state, step = (None, None)
    if args.tag is not None:
        # An explicitly requested tag (e.g. a curated "final"/"best"
        # snapshot) wins over rotating step checkpoints.
        state, step = ckpt.load_tag(tmpl, args.tag)
    if step is None:
        state, step = ckpt.load_latest(tmpl)
    if step is None:
        raise SystemExit("no checkpoint found in %s" % args.src)
    f16 = jax.tree_util.tree_map(
        lambda x: np.asarray(x).astype(np.float16), state.params)
    os.makedirs(args.dst, exist_ok=True)
    blob = flax.serialization.to_bytes(f16)
    with open(os.path.join(args.dst, SNAP_FILE), "wb") as f:
        f.write(blob)
    shutil.copy(os.path.join(args.src, Checkpointer.META_FILE),
                os.path.join(args.dst, Checkpointer.META_FILE))
    with open(os.path.join(args.dst, "snapshot.json"), "w") as f:
        json.dump({"step": int(step), "dtype": "float16"}, f)
    print("exported step %d -> %s (%.1f MB)"
          % (step, args.dst, len(blob) / 1e6))


def _probe_batch(meta, spp=2, h=48, w=48):
    rng = np.random.RandomState(0)
    if meta.get("kpcn_mode", False):
        n_in = meta["model_params"].get("n_in", 27)
        return {k: rng.rand(1, c, h, w).astype(np.float32) for k, c in [
            ("kpcn_diffuse_in", n_in), ("kpcn_specular_in", n_in),
            ("kpcn_diffuse_buffer", 3), ("kpcn_specular_buffer", 3),
            ("kpcn_albedo", 3)]}
    nf = meta["model_params"]["n_features"]
    ngf = meta["model_params"]["n_global_features"]
    return {
        "radiance": rng.rand(1, spp, 3, h, w).astype(np.float32),
        "features": rng.rand(1, spp, nf, h, w).astype(np.float32),
        "global_features": rng.rand(1, ngf, 1, 1).astype(np.float32),
    }


def import_(args):
    import flax.serialization
    import jax

    from sbmc_tpu.models.build import build_model
    from sbmc_tpu.train import Checkpointer, DenoiserInterface, TrainState

    meta = Checkpointer.load_meta(args.src)
    model = build_model(meta)
    iface = DenoiserInterface(model)
    params = model.init(jax.random.PRNGKey(0), _probe_batch(meta))
    with open(os.path.join(args.src, SNAP_FILE), "rb") as f:
        f16 = flax.serialization.from_bytes(
            jax.tree_util.tree_map(
                lambda x: np.asarray(x).astype(np.float16), params),
            f.read())
    restored = jax.tree_util.tree_map(
        lambda t, s: np.asarray(s).astype(np.asarray(t).dtype), params, f16)
    with open(os.path.join(args.src, "snapshot.json")) as f:
        step = int(json.load(f)["step"])
    state = TrainState(params=restored,
                       opt_state=iface.tx.init(restored),
                       step=np.asarray(step, np.int32))
    ckpt = Checkpointer(args.dst, meta=meta)
    ckpt.save(state, step, tag="final")
    print("imported snapshot (step %d) -> %s" % (step, args.dst))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    pe = sub.add_parser("export")
    pe.add_argument("src", help="checkpoint directory")
    pe.add_argument("dst", help="snapshot output directory")
    pe.add_argument("--tag", default=None,
                    help="prefer this tagged checkpoint (e.g. 'final'); "
                    "default: latest numbered step checkpoint.")
    pi = sub.add_parser("import")
    pi.add_argument("src", help="snapshot directory")
    pi.add_argument("dst", help="checkpoint directory to create")
    args = p.parse_args()
    export(args) if args.cmd == "export" else import_(args)
