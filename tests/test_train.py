"""Training-stack tests: compiled train step, NaN guard, checkpointing,
data-parallel mesh (8 virtual CPU devices), and the full trainer loop on a
tiny synthetic dataset."""

import os

import jax

import numpy as np
import pytest

from sbmc_tpu import ops
from sbmc_tpu.models import Multisteps
from sbmc_tpu.parallel.mesh import make_mesh, shard_batch
from sbmc_tpu.train import (Checkpointer, DenoiserInterface, Trainer,
                            TrainState)

ops.set_backend("xla")


def _batch(rng, bs=1, spp=2, nf=8, ngf=3, h=16, w=16):
    return {
        "radiance": rng.rand(bs, spp, 3, h, w).astype(np.float32),
        "features": rng.rand(bs, spp, nf, h, w).astype(np.float32),
        "global_features": rng.rand(bs, ngf, 1, 1).astype(np.float32),
        "target_image": rng.rand(bs, 3, h, w).astype(np.float32),
    }


def _small_interface(mesh=None, lr=1e-3):
    model = Multisteps(n_features=8, n_global_features=3, width=8,
                       embedding_width=8, ksize=3, nsteps=1)
    return DenoiserInterface(model, lr=lr, mesh=mesh)


class TestInterface:
    def test_train_step_decreases_loss(self, rng):
        iface = _small_interface(lr=1e-2)
        b = _batch(rng)
        state = iface.init(jax.random.PRNGKey(0), b)
        losses = []
        for _ in range(10):
            state, metrics = iface.train_step(state, b)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]
        assert int(np.asarray(state.step)) == 10

    def test_nan_guard(self):
        with pytest.raises(RuntimeError):
            DenoiserInterface.check_finite({"loss": float("nan")})
        with pytest.raises(RuntimeError):
            DenoiserInterface.check_finite({"loss": float("inf")})
        DenoiserInterface.check_finite({"loss": 1.0})

    def test_eval_step(self, rng):
        iface = _small_interface()
        b = _batch(rng)
        state = iface.init(jax.random.PRNGKey(0), b)
        m = iface.eval_step(state.params, b)
        assert np.isfinite(float(m["loss"]))

    def test_kpcn_train_step_decreases_loss(self, rng):
        """The interface is model-agnostic: the KPCN baseline trains
        through the same compiled step (reference: scripts/train.py
        --kpcn_mode path)."""
        from sbmc_tpu.models import KPCN
        model = KPCN(depth=2, width=8, ksize=3)
        h = w = 24
        b = {
            "kpcn_diffuse_in": rng.rand(1, 27, h, w).astype(np.float32),
            "kpcn_specular_in": rng.rand(1, 27, h, w).astype(np.float32),
            "kpcn_diffuse_buffer": rng.rand(1, 3, h, w).astype(np.float32),
            "kpcn_specular_buffer": rng.rand(1, 3, h, w).astype(np.float32),
            "kpcn_albedo": rng.rand(1, 3, h, w).astype(np.float32),
            "target_image": rng.rand(1, 3, h, w).astype(np.float32),
        }
        iface = DenoiserInterface(model, lr=1e-2)
        state = iface.init(jax.random.PRNGKey(0), b)
        losses = []
        for _ in range(8):
            state, metrics = iface.train_step(state, b)
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

    def test_alternative_losses(self, rng):
        for loss in ["relative_mse", "smape", "tonemapped_mse"]:
            iface = _small_interface()
            iface2 = DenoiserInterface(iface.model, loss=loss)
            b = _batch(rng)
            state = iface2.init(jax.random.PRNGKey(0), b)
            state, m = iface2.train_step(state, b)
            assert np.isfinite(float(m["loss"]))


class TestDataParallel:
    def test_sharded_train_step_matches_single(self, rng):
        """The data-parallel step over an 8-device mesh must produce the same
        update as the single-device step on the same global batch."""
        assert jax.device_count() >= 8, "conftest should force 8 cpu devices"
        b = _batch(rng, bs=8)

        iface1 = _small_interface()
        state1 = iface1.init(jax.random.PRNGKey(0), b)
        state1, m1 = iface1.train_step(state1, b)

        mesh = make_mesh(8)
        iface8 = DenoiserInterface(iface1.model, lr=1e-3, mesh=mesh)
        state8 = iface8.init(jax.random.PRNGKey(0), b)
        state8, m8 = iface8.train_step(state8, b)

        assert np.isclose(float(m1["loss"]), float(m8["loss"]), atol=1e-5)
        for a, c in zip(jax.tree.leaves(state1.params),
                        jax.tree.leaves(state8.params)):
            assert np.allclose(np.array(a), np.array(c), atol=1e-4)

    def test_shard_batch_places_data(self, rng):
        mesh = make_mesh(8)
        b = shard_batch(_batch(rng, bs=8), mesh)
        shard_shapes = [s.data.shape for s in b["features"].addressable_shards]
        assert all(s[0] == 1 for s in shard_shapes)
        assert len(shard_shapes) == 8


class TestCheckpointer:
    def test_save_load_roundtrip(self, tmp_path, rng):
        iface = _small_interface()
        b = _batch(rng)
        state = iface.init(jax.random.PRNGKey(0), b)
        state, _ = iface.train_step(state, b)

        ckpt = Checkpointer(str(tmp_path / "ckpt"),
                            meta={"model_params": {"ksize": 3}})
        ckpt.save(state, 1)
        template = iface.init(jax.random.PRNGKey(1), b)
        restored, step = ckpt.load_latest(template)
        assert step == 1
        for a, c in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(restored.params)):
            np.testing.assert_array_equal(np.array(a), np.array(c))
        meta = Checkpointer.load_meta(str(tmp_path / "ckpt"))
        assert meta["model_params"]["ksize"] == 3

    def test_rotation_and_tag(self, tmp_path, rng):
        iface = _small_interface()
        b = _batch(rng)
        state = iface.init(jax.random.PRNGKey(0), b)
        ckpt = Checkpointer(str(tmp_path / "c"), meta={}, max_files=2)
        for s in range(5):
            ckpt.save(state, s)
        ckpt.save(state, 5, tag="final")
        files = sorted(os.listdir(str(tmp_path / "c")))
        steps = [f for f in files if f.startswith("ckpt_")]
        assert len(steps) == 2
        assert "final.msgpack" in files
        _, step = ckpt.load_latest(state)
        assert step == 5

    def test_load_empty_returns_none(self, tmp_path, rng):
        iface = _small_interface()
        b = _batch(rng)
        state = iface.init(jax.random.PRNGKey(0), b)
        ckpt = Checkpointer(str(tmp_path / "nope"))
        restored, step = ckpt.load_latest(state)
        assert step is None


class TestTrainer:
    def test_full_loop(self, rng, tmp_path):
        iface = _small_interface(lr=1e-2)
        batches = [_batch(rng) for _ in range(4)]
        state = iface.init(jax.random.PRNGKey(0), batches[0])
        trainer = Trainer(iface)
        state = trainer.train(state, batches, num_epochs=2,
                              val_dataloader=batches[:2])
        assert int(np.asarray(state.step)) == 8
        val = trainer.validate(state, batches[:2])
        assert np.isfinite(val["loss"]) and val["n"] == 2


class TestCheckpointCompat:
    def test_incompatible_checkpoint_raises(self, tmp_path, rng):
        """Restoring a checkpoint from a differently-shaped model must fail
        loudly (flax's from_bytes is silently lenient)."""
        b = _batch(rng)
        big = DenoiserInterface(Multisteps(
            n_features=8, n_global_features=3, width=16, embedding_width=16,
            ksize=3, nsteps=1))
        small = DenoiserInterface(Multisteps(
            n_features=8, n_global_features=3, width=8, embedding_width=8,
            ksize=3, nsteps=1))
        state_big = big.init(jax.random.PRNGKey(0), b)
        ckpt = Checkpointer(str(tmp_path / "c"), meta={})
        ckpt.save(state_big, 1)
        template = small.init(jax.random.PRNGKey(0), b)
        with pytest.raises(ValueError):
            ckpt.load_latest(template)

    def test_crash_does_not_save_final(self, tmp_path, rng):
        """A NaN-loss abort must not write an end-of-training checkpoint."""
        from sbmc_tpu.train import Trainer, callbacks
        iface = _small_interface()
        b = _batch(rng)
        bad = {k: v.copy() for k, v in b.items()}
        bad["target_image"] = bad["target_image"] * np.nan
        state = iface.init(jax.random.PRNGKey(0), b)
        ckpt = Checkpointer(str(tmp_path / "c"), meta={})
        trainer = Trainer(iface, [callbacks.CheckpointingCallback(
            ckpt, lambda: trainer.state, interval_steps=10**9)])
        with pytest.raises(RuntimeError):
            trainer.train(state, [b, bad, b], num_epochs=1)
        assert ckpt.load_latest(state)[1] is None  # nothing was saved

    def test_checkpoint_callback_skips_nonfinite(self, tmp_path, rng):
        from sbmc_tpu.train import callbacks
        iface = _small_interface()
        b = _batch(rng)
        state = iface.init(jax.random.PRNGKey(0), b)
        bad_params = jax.tree.map(lambda x: x * np.nan, state.params)
        bad_state = TrainState(params=bad_params, opt_state=state.opt_state,
                               step=state.step)
        ckpt = Checkpointer(str(tmp_path / "c"), meta={})
        cb = callbacks.CheckpointingCallback(ckpt, lambda: bad_state,
                                             interval_steps=1)
        cb.epoch_end(0)
        assert ckpt.load_latest(state)[1] is None


class TestUniformTileSPMD:
    def test_multi_device_uniform_tile_denoise_matches_single(self, rng):
        """Uniform-tile SPMD denoise (scripts/denoise.py --uniform_tiles):
        a frame split into 8 uniform tiles sharded over the 8-device mesh
        must reproduce the single-device full-frame inference on the
        interior (VERDICT round-1 weak #5)."""
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P
        from sbmc_tpu.models import Multisteps
        from sbmc_tpu.parallel.mesh import (data_sharding, make_mesh,
                                            replicate, shard_batch)
        from sbmc_tpu.parallel.tiles import (merge_tiles_uniform,
                                             split_tiles_uniform)

        assert jax.device_count() >= 8
        # pad must exceed the model's receptive field (3-level U-Net ~21 px
        # + splat halo 2) and step must align to the pooling grid (4 px) so
        # tile and full-frame pooling windows coincide.
        ksize, tile, pad = 5, 64, 26
        step = tile - 2 * pad
        fh, fw = 2 * step + 2 * pad, 4 * step + 2 * pad  # 2x4 = 8 tiles
        spp, nf = 2, 8
        frame = {
            "radiance": rng.rand(1, spp, 3, fh, fw).astype(np.float32),
            "features": rng.rand(1, spp, nf, fh, fw).astype(np.float32),
            "global_features": rng.rand(1, 3, 1, 1).astype(np.float32),
        }
        model = Multisteps(n_features=nf, n_global_features=3, width=8,
                           embedding_width=8, ksize=ksize, nsteps=1)

        stacked, info = split_tiles_uniform(frame, tile=tile, pad=pad)
        assert stacked["features"].shape[0] == 8
        params = model.init(jax.random.PRNGKey(0),
                            {k: v[:1] for k, v in stacked.items()})

        mesh = make_mesh(8)
        out = jax.jit(
            lambda p, b: model.apply(p, b)["radiance"],
            out_shardings=data_sharding(mesh))(
            replicate(params, mesh), shard_batch(stacked, mesh))
        merged = merge_tiles_uniform(np.asarray(out), info)[0]

        full = np.asarray(model.apply(params, frame)["radiance"])[0]
        crop = (ksize - 1) // 2
        # Interior equality: the sharded tiled result equals the full-frame
        # result away from the frame border the model cannot produce.
        # Tolerance covers online-softmax accumulation-order noise (the
        # running max/rescale sequence differs between tiled and full runs).
        np.testing.assert_allclose(
            merged[:, crop:-crop, crop:-crop],
            full, rtol=1e-3, atol=1e-3)


class TestScalarLogCallback:
    def test_new_csv_has_wall_time(self, tmp_path):
        from sbmc_tpu.train import callbacks
        p = str(tmp_path / "log.csv")
        cb = callbacks.ScalarLogCallback(p, interval=1)
        cb.batch_end(1, {"loss": 0.5, "input_loss": 0.7})
        import csv as _csv
        rows = list(_csv.DictReader(open(p)))
        assert "wall_time" in rows[0]
        assert float(rows[0]["wall_time"]) > 0
        assert float(rows[0]["loss"]) == 0.5

    def test_resume_extends_legacy_header(self, tmp_path):
        # Warm-started checkpoints carry train_log.csv files written
        # before the wall_time column existed; the resume must extend the
        # header (padding old rows) instead of silently dropping the new
        # evidence columns forever (round-4 advisor finding).
        from sbmc_tpu.train import callbacks
        p = str(tmp_path / "log.csv")
        with open(p, "w") as f:
            f.write("step,input_loss,loss,rmse\n")
            f.write("50,0.01,0.02,0.1\n")
        cb = callbacks.ScalarLogCallback(p, interval=1)
        cb.batch_end(100, {"input_loss": 0.011, "loss": 0.019,
                           "rmse": 0.09})
        import csv as _csv
        rows = list(_csv.DictReader(open(p)))
        assert len(rows) == 2
        assert rows[0]["step"] == "50"
        assert rows[0]["wall_time"] == ""        # padded legacy row
        assert rows[1]["step"] == "100"
        assert rows[1]["loss"] == "0.019"
        assert float(rows[1]["wall_time"]) > 0   # new column survives

    def test_existing_empty_file_gets_header(self, tmp_path):
        # A zero-byte log (touch / crashed run) must be treated as new:
        # appending headerless rows breaks every DictReader consumer
        # (judge_ab.py, plot_train_log.py).
        from sbmc_tpu.train import callbacks
        p = str(tmp_path / "log.csv")
        open(p, "w").close()
        cb = callbacks.ScalarLogCallback(p, interval=1)
        cb.batch_end(1, {"loss": 0.5})
        import csv as _csv
        rows = list(_csv.DictReader(open(p)))
        assert rows and rows[0]["loss"] == "0.5"
        # Every data line has exactly the header's column count.
        lines = open(p).read().strip().split("\n")
        ncol = len(lines[0].split(","))
        assert all(len(l.split(",")) == ncol for l in lines[1:])
