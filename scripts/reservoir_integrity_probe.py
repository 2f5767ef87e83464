"""On-chip DeviceReservoir buffer-integrity probe.

The reservoir passes its CPU unit tests, but both long on-chip runs under
it failed to learn (flat at/above `input_loss`; round-4 VERDICT weak #2)
while f32/host runs on the same corpus learned. One hardware-specific
failure mode the CPU tests cannot see: the donated in-place slot update
(`jax.jit(_update, donate_argnums=0)` +
``lax.dynamic_update_index_in_dim``) corrupting or mis-sequencing HBM
buffers on the experimental `axon` TPU platform, which would feed the
train step garbage (features,target) pairs — exactly the "learned coarse
blur, not feature-adaptive kernels" signature.

This probe simulates the exact refresh/sample interleaving against a
host-side numpy mirror and fails loudly on the first divergence:

  1. fill(capacity) with deterministic slot-keyed items;
  2. for each round: dispatch a sampled gather (the train step's read
     pattern), then refresh one slot, mirroring both on the host;
  3. every ``check_every`` rounds, download the full bufs and compare
     bit-exactly with the mirror; also check the gathered batches.

Run on the TPU when the tunnel is healthy:
    python scripts/reservoir_integrity_probe.py --rounds 200
Exit 0 = buffers bit-exact; exit 1 = corruption (prints first diff).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from sbmc_tpu.utils.platform import honor_env_platform  # noqa: E402

honor_env_platform()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from sbmc_tpu.train.reservoir import DeviceReservoir, TRAIN_KEYS  # noqa


def make_item(seed, spp, nf, ngf, h, w):
    """Deterministic, slot-identifiable item (seed baked into values)."""
    rng = np.random.RandomState(seed)
    return {
        "features": rng.randn(spp, nf, h, w).astype(np.float32),
        "radiance": rng.rand(spp, 3, h, w).astype(np.float32),
        "global_features": rng.randn(ngf).astype(np.float32),
        "target_image": rng.rand(3, h, w).astype(np.float32),
    }


class _NullInterface:
    """Stands in for DenoiserInterface: the probe's 'train step' is the
    sampled gather itself, returned so the host can check it."""

    @staticmethod
    def _train_step_impl(state, batch):
        return state, batch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--capacity", type=int, default=48)
    ap.add_argument("--bs", type=int, default=4)
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--nf", type=int, default=93)
    ap.add_argument("--hw", type=int, default=64)
    ap.add_argument("--ngf", type=int, default=3)
    ap.add_argument("--rounds", type=int, default=200)
    ap.add_argument("--check_every", type=int, default=25)
    args = ap.parse_args()

    print(f"platform: {jax.devices()[0].platform} {jax.devices()[0]}",
          flush=True)
    res = DeviceReservoir(_NullInterface(), capacity=args.capacity,
                          batch_size=args.bs, seed=0)
    items = [make_item(i, args.spp, args.nf, args.ngf, args.hw, args.hw)
             for i in range(args.capacity)]
    res.fill(items)

    # Host-side mirror with identical dtypes (features f16).
    mirror = {}
    for k in TRAIN_KEYS:
        stack = np.stack([res._item_arrays(it)[k] for it in items])
        mirror[k] = stack

    def compare_full(tag):
        ok = True
        for k, host in mirror.items():
            # Chunked d2h: whole-buffer np.asarray over the axon tunnel
            # aborts on ~40 MB arrays; per-slot slices are reliable.
            dev = np.stack([np.asarray(res._bufs[k][s])
                            for s in range(args.capacity)])
            if not np.array_equal(dev, host):
                bad = np.argwhere(dev != host)
                slot = int(bad[0][0])
                print(f"CORRUPT [{tag}] key={k}: {len(bad)} mismatched "
                      f"elements, first at slot {slot} index "
                      f"{tuple(bad[0])}", flush=True)
                ok = False
        return ok

    if not compare_full("after-fill"):
        sys.exit(1)
    print("fill: bit-exact", flush=True)

    next_seed = args.capacity
    state = jnp.zeros(())
    ok = True
    for r in range(1, args.rounds + 1):
        # Train-step read (async dispatch, like the real loop)...
        state, batch = res.train_step(state)
        # ...then a refresh racing it, like trainer.train_reservoir.
        item = make_item(next_seed, args.spp, args.nf, args.ngf,
                         args.hw, args.hw)
        slot = res._next_slot
        res.refresh(item)
        for k in TRAIN_KEYS:
            mirror[k][slot] = res._item_arrays(item)[k]
        next_seed += 1
        if r % args.check_every == 0:
            # Also validate the sampled batch against the mirror state it
            # was drawn from (pre-refresh of this round's slot: the read
            # was dispatched first, but the slot refreshed this round may
            # or may not land before it -- exclude it from the check).
            got = {k: np.asarray(v) for k, v in batch.items()
                   if k in TRAIN_KEYS}
            matched = 0
            for k in ("target_image",):
                for b in range(args.bs):
                    row = got[k][b]
                    hits = [s for s in range(args.capacity)
                            if np.array_equal(mirror[k][s], row)]
                    if hits:
                        matched += 1
            if not compare_full(f"round-{r}"):
                ok = False
                break
            print(f"round {r}: bufs bit-exact; sampled batch rows "
                  f"matched {matched}/{args.bs} reservoir slots",
                  flush=True)

    if ok:
        print("INTEGRITY OK: donation/in-place updates are bit-exact on "
              "this platform", flush=True)
        sys.exit(0)
    sys.exit(1)


if __name__ == "__main__":
    main()
