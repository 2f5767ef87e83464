"""Probe: in-place updates / gathers on >2 GiB HBM buffers (axon).

The reservoir's features buffer at the flagship config is 4.6 GiB f16
([192, 8, 93, 128, 128]); its round-robin slot refresh crosses the
2^31-byte offset line at slot ~86 — right where the round-4 on-chip
learning curves start degrading (.hwlog/.seg_rows.csv; healthy ratios
through step ~925, regressing after). If the TPU runtime (or the axon
tunnel's DMA path) computes buffer offsets in int32, refreshes beyond
2 GiB corrupt feature slots while the (1.2 GiB, in-range) radiance and
target buffers stay intact — exactly the observed "input_loss normal,
model learns unconditional blur" signature.

This isolates that: a [cap, 12.4M] f16 buffer (24.8 MiB/slot) with
cap=100 (2.48 GiB total; slots >= 87 sit beyond 2^31 bytes) and a
control at cap=64 (1.6 GiB). For each: donated in-place update of a low
slot and a high slot with slot-keyed patterns, then (a) tiny-slice d2h
readback of the written slots and neighbors, (b) a jnp.take gather of
the same slots into a fresh array, checked via small slices.

Run on a healthy tunnel: python scripts/bigbuf_probe.py
Exit 0 = both sizes bit-exact; 1 = corruption (prints where).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from sbmc_tpu.utils.platform import honor_env_platform  # noqa: E402

honor_env_platform()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

SLOT_ELEMS = 12_400_000          # 24.8 MB per slot in f16
PROBE = 4096                     # elements checked per position


def pattern(slot, n=SLOT_ELEMS):
    # Slot-keyed, f16-exact pattern (small ints).
    return ((np.arange(n, dtype=np.int32) + 7 * slot) % 251
            ).astype(np.float16)


def run_case(cap):
    print(f"--- cap={cap} ({cap * SLOT_ELEMS * 2 / 2**30:.2f} GiB)",
          flush=True)
    # Build on device: base value = slot index broadcast (cheap iota, no
    # giant h2d upload through the tunnel).
    @jax.jit
    def make():
        s = jax.lax.broadcasted_iota(jnp.float16, (cap, SLOT_ELEMS), 0)
        return s

    buf = make()
    buf.block_until_ready()

    upd = jax.jit(
        lambda b, slot, v: jax.lax.dynamic_update_index_in_dim(
            b, v, slot, 0),
        donate_argnums=0)

    take2 = jax.jit(lambda b, idx: jnp.take(b, idx, axis=0))

    low, high = 5, cap - 3        # high slot sits past 2 GiB when cap=100
    ok = True
    for slot in (low, high):
        buf = upd(buf, slot, jnp.asarray(pattern(slot)))
    buf.block_until_ready()

    for slot, expect_pat in [(low, True), (high, True),
                             (low - 1, False), (high - 1, False)]:
        want = pattern(slot)[:PROBE] if expect_pat else \
            np.full(PROBE, float(slot), np.float16)
        got = np.asarray(buf[slot, :PROBE])
        tail_want = (pattern(slot)[-PROBE:] if expect_pat else
                     np.full(PROBE, float(slot), np.float16))
        tail_got = np.asarray(buf[slot, -PROBE:])
        if not (np.array_equal(got, want)
                and np.array_equal(tail_got, tail_want)):
            nbad = int((got != want).sum() + (tail_got != tail_want).sum())
            print(f"  CORRUPT direct-read slot {slot}: {nbad}/"
                  f"{2 * PROBE} probe elements wrong "
                  f"(head got {got[:4]}, want {want[:4]})", flush=True)
            ok = False
        else:
            print(f"  slot {slot}: direct read bit-exact", flush=True)

    g = take2(buf, jnp.asarray([low, high, 0]))
    for j, slot in enumerate([low, high, 0]):
        want = (pattern(slot)[:PROBE] if slot in (low, high)
                else np.full(PROBE, float(slot), np.float16))
        got = np.asarray(g[j, :PROBE])
        if not np.array_equal(got, want):
            nbad = int((got != want).sum())
            print(f"  CORRUPT gather slot {slot}: {nbad}/{PROBE} wrong "
                  f"(got {got[:4]}, want {want[:4]})", flush=True)
            ok = False
        else:
            print(f"  slot {slot}: gather bit-exact", flush=True)
    del buf, g
    return ok


def main():
    print(f"platform: {jax.devices()[0]}", flush=True)
    ok_small = run_case(64)       # 1.59 GiB control, all offsets < 2^31
    ok_big = run_case(100)        # 2.48 GiB, high slots past 2^31
    if ok_small and ok_big:
        print("BIGBUF OK: >2GiB in-place update + gather bit-exact",
              flush=True)
        sys.exit(0)
    print(f"BIGBUF FAIL: small={ok_small} big={ok_big}", flush=True)
    sys.exit(1)


if __name__ == "__main__":
    main()
