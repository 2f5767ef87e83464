"""Device-resident tile reservoir: HBM-cached training data.

The training bottleneck on a 1-core host is NOT the chip (the compiled
step runs ~0.9 s at the paper config) but the per-step host work: stacking
a ~100 MB batch and pushing it through the tunneled link every step
(PERF_TPU.md "Quality-run operational numbers"). The reference hides this
behind torch DataLoader worker *processes* (reference scripts/train.py:70-72)
— a host-side fix that a 1-core machine cannot replicate.

The TPU-native fix is to move the shuffle buffer into HBM:

- A **reservoir** of N preprocessed tiles lives on device as one stacked
  array per batch key (features float16, [N, spp, F, h, w]).
- Each step, the compiled train step draws ``bs`` tile indices from the
  reservoir on device (jax PRNG), gathers the batch HBM->HBM (fast), and
  runs the usual loss/grad/update — one jit, zero host bytes on the
  critical path.
- A host thread keeps decoding tiles in the background; whenever one is
  ready, a donated ``update_slot`` jit overwrites one reservoir slot
  in place (~26 MB instead of ~100 MB per step, fully overlapped with
  device execution).

This changes sampling semantics from epoch-shuffling to a sliding
shuffle-buffer (sample-with-replacement from the newest N tiles), the same
trade tf.data's ``shuffle(buffer_size)`` makes; with N a sizable fraction
of the corpus the difference is statistical noise.

Randomized sample count (the reference MultiSampleCountDataset role) is
drawn on device: per item k ~ U{lo..hi} and samples >= k are masked out of
``sample_mask`` — numerically identical to training on fewer samples
(masked samples contribute exactly zero; see tests/test_train.py).

**Scope: single-device by design.** Under a data-parallel mesh the
trainer keeps the host loader (scripts/train.py logs this): the mesh
path exists for multi-host pods where every process has its *own* host
and NIC, so per-step host stacking is already parallel and the
single-host bottleneck this reservoir removes does not exist there. A
sharded reservoir (one slice per device, per-shard feeders, slot updates
addressed through the sharding) would buy nothing on the 1-chip bench
target while complicating the donation/in-place-update contract, so it
is deliberately out of scope rather than unfinished.
"""

import queue
import threading

import jax
import jax.numpy as jnp
import numpy as np

from sbmc_tpu.utils.logging import get_logger

LOG = get_logger(__name__)

__all__ = ["DeviceReservoir", "ReservoirFeeder"]

# Keys the sbmc/lbf train step actually consumes; everything else in a
# dataset item (image_data, low_spp, block offsets, paths) never needs to
# reach the device.
TRAIN_KEYS = ("features", "radiance", "global_features", "target_image")


class DeviceReservoir:
    """HBM reservoir of preprocessed tiles + compiled sample-and-step.

    Args:
      interface: a ``DenoiserInterface`` (single-device; the data-parallel
        mesh path keeps the regular host loader).
      capacity: number of tiles held in HBM.
      batch_size: tiles per training batch.
      spp_mask_range: optional (lo, hi) for on-device randomized sample
        count; None trains at the full recorded spp.
      seed: PRNG seed for on-device index/spp draws.
    """

    def __init__(self, interface, capacity, batch_size, spp_mask_range=None,
                 seed=0):
        self.interface = interface
        self.capacity = int(capacity)
        self.batch_size = int(batch_size)
        self.spp_mask_range = spp_mask_range
        self._key = jax.random.PRNGKey(seed)
        self._bufs = None
        self._next_slot = 0

        iface = interface

        def _step(state, bufs, key):
            k_idx, k_spp = jax.random.split(key)
            idx = jax.random.choice(k_idx, self.capacity,
                                    (self.batch_size,), replace=False)
            batch = {k: jnp.take(v, idx, axis=0) for k, v in bufs.items()}
            spp = batch["radiance"].shape[1]
            if self.spp_mask_range is not None:
                lo, hi = self.spp_mask_range
                ks = jax.random.randint(k_spp, (self.batch_size,), lo,
                                        hi + 1)
                batch["sample_mask"] = (jnp.arange(spp)[None]
                                        < ks[:, None])
            else:
                batch["sample_mask"] = jnp.ones(
                    (self.batch_size, spp), bool)
            return iface._train_step_impl(state, batch)

        # bufs are NOT donated here (they are reused every step); state is.
        self._step = jax.jit(_step, donate_argnums=0)

        def _update(bufs, slot, item):
            out = {}
            for k, v in bufs.items():
                out[k] = jax.lax.dynamic_update_index_in_dim(
                    v, item[k].astype(v.dtype), slot, 0)
            return out

        # Donating bufs makes the slot write an in-place HBM update.
        self._update = jax.jit(_update, donate_argnums=0)

    @staticmethod
    def _item_arrays(item):
        out = {}
        for k in TRAIN_KEYS:
            v = np.asarray(item[k])
            if k == "features" and v.dtype == np.float32:
                v = v.astype(np.float16)
            out[k] = v
        return out

    def fill(self, items):
        """Initial upload: stack ``capacity`` items and device_put once."""
        if len(items) < self.capacity:
            raise ValueError(
                f"need {self.capacity} tiles to fill the reservoir, got "
                f"{len(items)}; lower --device_reservoir")
        stacked = {}
        # Convert each item exactly once (the f16 cast is the expensive
        # part); index the cached dicts when stacking per key.
        items_np = [self._item_arrays(it) for it in items[:self.capacity]]
        for k, v0 in items_np[0].items():
            buf = np.empty((self.capacity,) + v0.shape, v0.dtype)
            for i in range(self.capacity):
                buf[i] = items_np[i][k]
            stacked[k] = buf
        self._bufs = {k: jax.device_put(v) for k, v in stacked.items()}
        for v in self._bufs.values():
            v.block_until_ready()
        nbytes = sum(np.prod(v.shape) * v.dtype.itemsize
                     for v in self._bufs.values())
        LOG.info("reservoir filled: %d tiles, %.2f GiB HBM",
                 self.capacity, nbytes / 2 ** 30)

    def refresh(self, item):
        """Overwrite the next slot (round-robin) with a freshly decoded
        tile; returns immediately (async dispatch)."""
        slot = self._next_slot
        self._next_slot = (slot + 1) % self.capacity
        self._bufs = self._update(self._bufs, slot, self._item_arrays(item))

    def train_step(self, state):
        """One compiled sample-from-reservoir optimization step."""
        self._key, sub = jax.random.split(self._key)
        return self._step(state, self._bufs, sub)


class ReservoirFeeder:
    """Background decode thread: iterates the dataset (shuffled epochs) and
    keeps at most ``depth`` decoded tiles ready for :meth:`poll`."""

    def __init__(self, dataset, depth=2, seed=1):
        self.dataset = dataset
        self._q = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._rng = np.random.RandomState(seed)
        self._thread = threading.Thread(target=self._run, daemon=True)

    def start(self):
        self._thread.start()
        return self

    def _run(self):
        n = len(self.dataset)
        while not self._stop.is_set():
            order = self._rng.permutation(n)
            for i in order:
                item = self.dataset[int(i)]
                while not self._stop.is_set():
                    try:
                        self._q.put(item, timeout=0.5)
                        break
                    except queue.Full:
                        continue
                if self._stop.is_set():
                    return

    def poll(self):
        """A decoded tile if one is ready, else None (never blocks)."""
        try:
            return self._q.get_nowait()
        except queue.Empty:
            return None

    def stop(self):
        self._stop.set()
