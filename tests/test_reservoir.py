"""Device-reservoir training (sbmc_tpu/train/reservoir.py): the HBM
shuffle-buffer that replaces the per-step host stack+upload on TPU."""

import numpy as np

import jax

from sbmc_tpu.train import Trainer
from sbmc_tpu.train.reservoir import DeviceReservoir, ReservoirFeeder
from tests.test_train import _batch, _small_interface


def _items(rng, n, spp=2, nf=8, ngf=3, h=16, w=16):
    out = []
    for _ in range(n):
        b = _batch(rng, bs=1, spp=spp, nf=nf, ngf=ngf, h=h, w=w)
        item = {k: v[0] for k, v in b.items()}
        item["features"] = item["features"].astype(np.float16)
        item["path"] = "synthetic"  # non-array metadata must be ignored
        out.append(item)
    return out


class TestDeviceReservoir:
    def test_training_decreases_loss(self, rng):
        iface = _small_interface(lr=1e-2)
        items = _items(rng, 8)
        res = DeviceReservoir(iface, capacity=8, batch_size=2, seed=0)
        res.fill(items)
        state = iface.init(jax.random.PRNGKey(0), _batch(rng, bs=2))
        state, first = res.train_step(state)
        losses = [float(first["loss"])]
        for _ in range(10):
            state, m = res.train_step(state)
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert min(losses[5:]) < losses[0]
        assert int(np.asarray(state.step)) == 11

    def test_refresh_overwrites_slot_in_place(self, rng):
        iface = _small_interface()
        items = _items(rng, 4)
        res = DeviceReservoir(iface, capacity=4, batch_size=2)
        res.fill(items)
        before = {k: np.asarray(v) for k, v in res._bufs.items()}
        new = _items(rng, 1)[0]
        res.refresh(new)  # slot 0
        after = res._bufs
        np.testing.assert_allclose(
            np.asarray(after["radiance"][0]), new["radiance"], rtol=1e-6)
        # Other slots untouched; shapes/dtypes preserved (donation safety).
        np.testing.assert_array_equal(
            np.asarray(after["radiance"][1]), before["radiance"][1])
        for k in before:
            assert after[k].shape == before[k].shape
            assert after[k].dtype == before[k].dtype
        assert res._next_slot == 1

    def test_spp_mask_range_trains(self, rng):
        """Randomized-spp reservoir training stays finite and matches the
        regular step's loss scale (masked samples contribute zero)."""
        iface = _small_interface(lr=1e-3)
        items = _items(rng, 4, spp=4)
        res = DeviceReservoir(iface, capacity=4, batch_size=2,
                              spp_mask_range=(2, 4), seed=3)
        res.fill(items)
        state = iface.init(jax.random.PRNGKey(0), _batch(rng, bs=2, spp=4))
        for _ in range(4):
            state, m = res.train_step(state)
            assert np.isfinite(float(m["loss"]))
        assert int(np.asarray(state.step)) == 4

    def test_trainer_loop_with_feeder(self, rng, tmp_path):
        iface = _small_interface(lr=1e-2)

        class ListDataset:
            def __init__(self, items):
                self.items = items

            def __len__(self):
                return len(self.items)

            def __getitem__(self, i):
                return self.items[i]

        data = ListDataset(_items(rng, 6))
        res = DeviceReservoir(iface, capacity=4, batch_size=2)
        res.fill([data[i] for i in range(4)])
        feeder = ReservoirFeeder(data, depth=2).start()
        state = iface.init(jax.random.PRNGKey(0), _batch(rng, bs=2))
        trainer = Trainer(iface)
        state = trainer.train_reservoir(state, res, feeder=feeder,
                                        max_steps=6)
        assert int(np.asarray(state.step)) == 6

    def test_trainer_loop_with_real_callback_suite(self, rng, tmp_path):
        """The reservoir loop emits no epoch_start; the full callback set
        scripts/train.py attaches must survive that (regression: the
        2026-08-19 CPU smoke crashed in ProgressCallback.batch_end on an
        uninitialized _n0 two steps into what would have been the big
        hardware run)."""
        from sbmc_tpu.train import Checkpointer, callbacks

        iface = _small_interface(lr=1e-2)
        items = _items(rng, 4)
        res = DeviceReservoir(iface, capacity=4, batch_size=2)
        res.fill(items)
        first = _batch(rng, bs=2)
        state = iface.init(jax.random.PRNGKey(0), first)
        ckpt = Checkpointer(str(tmp_path / "ckpt"), meta={"arch": "test"})
        trainer = Trainer(iface, [
            callbacks.ProgressCallback(interval=2),
            callbacks.CheckpointingCallback(
                ckpt, lambda: trainer.state, interval_steps=3),
            callbacks.ScalarLogCallback(
                str(tmp_path / "log.csv"), interval=2),
            callbacks.DenoisingDisplayCallback(
                iface, lambda: trainer.state, lambda: first,
                str(tmp_path / "viz")),
        ])
        state = trainer.train_reservoir(state, res, max_steps=5,
                                        epoch_emit_every=4)
        assert int(np.asarray(state.step)) == 5
        assert (tmp_path / "log.csv").exists()
        # epoch_emit_every=4 -> one display strip + checkpoint epoch event
        assert (tmp_path / "viz" / "epoch_0001.png").exists()
