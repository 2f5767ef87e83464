"""Tests for LZ4-frame IO, the .bin tile format, datasets and the loader
(reference capability: sbmc/datasets.py; test strategy per SURVEY.md §4 —
golden-file round trips through our writer, which doubles as the
data-generation path)."""

import os

import numpy as np
import pytest

from sbmc_tpu.data import bin_format, lz4f
from sbmc_tpu.data.datasets import (FullImagesDataset,
                                    MultiSampleCountDataset, TilesDataset)
from sbmc_tpu.data.loader import Loader, collate


def test_lz4_roundtrip(rng):
    for n in [0, 1, 100, 1 << 16]:
        data = rng.bytes(n)
        assert lz4f.decompress(lz4f.compress(data)) == data


def test_lz4_known_frame():
    # A frame produced by the reference's lz4 frame writer decodes the same
    # bytes: verify magic + self-consistency.
    payload = b"sbmc" * 1000
    frame = lz4f.compress(payload)
    assert frame[:4] == b"\x04\x22\x4d\x18"  # LZ4 frame magic
    assert lz4f.decompress(frame) == payload


def _make_tile(rng, ts=16, spp=4, bx=0, by=0, iw=None, ih=None, seed_off=0):
    return bin_format.Tile(
        tile_size=ts, image_width=iw or ts, image_height=ih or ts,
        sample_count=spp, gt_sample_count=64,
        focus_distance=1.5, aperture_radius=0.1, fov=0.35,
        scene_radius=10.0, block_x=bx, block_y=by,
        pixel_data=rng.rand(30, ts, ts).astype(np.float32),
        features=rng.rand(spp, 27, ts, ts).astype(np.float32),
        p=rng.rand(spp, 24, ts, ts).astype(np.float32),
        ld=rng.rand(spp, 12, ts, ts).astype(np.float32),
        bt=rng.randint(0, 32, (spp, 6, ts, ts)).astype(np.int16),
    )


class TestBinFormat:
    def test_roundtrip(self, tmp_path, rng):
        tile = _make_tile(rng)
        path = str(tmp_path / "t.bin")
        bin_format.write_tile(path, tile)
        back = bin_format.read_tile(path)
        assert back.tile_size == tile.tile_size
        assert back.sample_count == tile.sample_count
        assert back.block_x == tile.block_x
        np.testing.assert_array_equal(back.pixel_data, tile.pixel_data)
        np.testing.assert_array_equal(back.features, tile.features)
        np.testing.assert_array_equal(back.p, tile.p)
        np.testing.assert_array_equal(back.ld, tile.ld)
        np.testing.assert_array_equal(back.bt, tile.bt)
        assert np.isclose(back.fov, tile.fov)

    def test_partial_spp_read(self, tmp_path, rng):
        tile = _make_tile(rng, spp=6)
        path = str(tmp_path / "t.bin")
        bin_format.write_tile(path, tile)
        back = bin_format.read_tile(path, spp=3)
        assert back.features.shape[0] == 3
        np.testing.assert_array_equal(back.features, tile.features[:3])

    def test_rejects_bad_version(self, tmp_path, rng):
        tile = _make_tile(rng)
        tile.version = 123
        path = str(tmp_path / "t.bin")
        bin_format.write_tile(path, tile)
        with pytest.raises(ValueError):
            bin_format.read_tile(path)

    def test_nan_focus_distance_zeroed(self, tmp_path, rng):
        tile = _make_tile(rng)
        tile.aperture_radius = 0.0
        tile.focus_distance = float("nan")
        path = str(tmp_path / "t.bin")
        bin_format.write_tile(path, tile)
        back = bin_format.read_tile(path)
        assert back.focus_distance == 0.0

    def test_decode_bounce_types(self):
        bt = np.array([[[[0b10101]]]], np.int16)  # (1, 1, 1, 1)
        planes = bin_format.decode_bounce_types(bt)
        assert planes.shape == (1, 5, 1, 1)
        np.testing.assert_array_equal(planes[0, :, 0, 0], [1, 0, 1, 0, 1])


def _write_scene(root, name, rng, tiles=4, ts=16, spp=4):
    sdir = os.path.join(root, name)
    os.makedirs(sdir, exist_ok=True)
    per_row = 2
    for i in range(tiles):
        bx, by = (i % per_row) * ts, (i // per_row) * ts
        tile = _make_tile(rng, ts=ts, spp=spp, bx=bx, by=by,
                          iw=per_row * ts, ih=(tiles // per_row) * ts)
        bin_format.write_tile(os.path.join(sdir, "t_%02d.bin" % i), tile)
    return sdir


class TestTilesDataset:
    def test_folder_mode(self, tmp_path, rng):
        _write_scene(str(tmp_path), "scene0", rng)
        _write_scene(str(tmp_path), "scene1", rng)
        d = TilesDataset(str(tmp_path), spp=4)
        assert len(d) == 8
        item = d[0]
        assert item["features"].shape == (4, 93, 16, 16)
        assert item["radiance"].shape == (4, 3, 16, 16)
        assert item["global_features"].shape == (3, 1, 1)
        assert item["target_image"].shape == (3, 16, 16)
        assert d.num_features == 93
        assert d.num_global_features == 3

    def test_filelist_mode(self, tmp_path, rng):
        sdir = _write_scene(str(tmp_path), "scene0", rng)
        lst = str(tmp_path / "list.txt")
        with open(lst, "w") as f:
            for fn in sorted(os.listdir(sdir)):
                f.write(os.path.join("scene0", fn) + "\n")
        d = TilesDataset(lst, spp=2)
        assert len(d) == 4
        assert d[0]["features"].shape[0] == 2

    def test_feature_flags(self, tmp_path, rng):
        _write_scene(str(tmp_path), "s", rng)
        d = TilesDataset(str(tmp_path), spp=2, load_coords=False,
                         load_p=False, load_ld=False, load_bt=False)
        # radiance (6) + gbuffer (16)
        assert d.num_features == 22
        assert d[0]["features"].shape[1] == 22

    def test_sbmc_log_tonemap(self, tmp_path, rng):
        """The diffuse slot holds log(1+diffuse+specular)/10 (reference:
        sbmc/datasets.py:741-778)."""
        _write_scene(str(tmp_path), "s", rng)
        raw = TilesDataset(str(tmp_path), spp=2, mode="raw")
        std = TilesDataset(str(tmp_path), spp=2, mode="sbmc")
        r, s = raw[0], std[0]
        i_d = std.labels.index("diffuse_r")
        i_s = std.labels.index("specular_r")
        # raw mode drops coords so indices differ; look up in raw labels
        j_d = raw.labels.index("diffuse_r")
        j_s = raw.labels.index("specular_r")
        diffuse = np.maximum(r["features"][:, j_d:j_d + 3], 0)
        specular = np.maximum(r["features"][:, j_s:j_s + 3], 0)
        expected = np.log(1 + diffuse + specular) / 10.0
        np.testing.assert_allclose(s["features"][:, i_d:i_d + 3], expected,
                                   atol=1e-6)
        # radiance key holds the *raw* (pre-tonemap) sum
        np.testing.assert_allclose(s["radiance"], diffuse + specular,
                                   atol=1e-6)

    def test_kpcn_mode(self, tmp_path, rng):
        _write_scene(str(tmp_path), "s", rng)
        d = TilesDataset(str(tmp_path), spp=4, mode="kpcn")
        item = d[0]
        assert item["kpcn_diffuse_in"].shape == (27, 16, 16)
        assert item["kpcn_specular_in"].shape == (27, 16, 16)
        assert item["kpcn_albedo"].shape == (3, 16, 16)
        assert d.num_features == 27
        assert d.num_global_features == 0
        for k, v in item.items():
            if isinstance(v, np.ndarray):
                assert np.isfinite(v).all(), k

    def test_kpcn_depth_scale_invariance(self, tmp_path, rng):
        """The reference's PathKPCNIntegrator records *unnormalized*
        distances (sbmc_pbrt.diff path_kpcn integrator) while our tracer
        normalizes by 1/(10*scene_radius) at record time. KPCN
        preprocessing divides depth by the per-tile max (and depth_v by
        max^2, reference: sbmc/datasets.py:789-795), which cancels any
        constant record-time scale exactly — so a dedicated
        unnormalized-distance recording path would produce identical
        model inputs. This test pins that equivalence."""
        state = rng.get_state()
        _write_scene(str(tmp_path), "a", rng)
        rng2 = np.random.RandomState(0)
        rng2.set_state(state)
        sdir = _write_scene(str(tmp_path / "scaled"), "a", rng2)
        i_df = bin_format.SAMPLE_FEATURE_LABELS.index("depth_first")
        i_d = bin_format.SAMPLE_FEATURE_LABELS.index("depth")
        for fn in sorted(os.listdir(sdir)):
            path = os.path.join(sdir, fn)
            t = bin_format.read_tile(path)
            t.features[:, i_df] *= 120.0   # "unnormalized" distances
            t.features[:, i_d] *= 120.0
            bin_format.write_tile(path, t)
        d1 = TilesDataset(str(tmp_path), spp=4, mode="kpcn")
        d2 = TilesDataset(str(tmp_path / "scaled"), spp=4, mode="kpcn")
        for k in ["kpcn_diffuse_in", "kpcn_specular_in",
                  "kpcn_diffuse_buffer", "kpcn_specular_buffer",
                  "kpcn_albedo"]:
            np.testing.assert_allclose(d1[0][k], d2[0][k], rtol=2e-5,
                                       atol=1e-6, err_msg=k)

    def test_spp_too_high_raises(self, tmp_path, rng):
        _write_scene(str(tmp_path), "s", rng)
        with pytest.raises(RuntimeError):
            TilesDataset(str(tmp_path), spp=100)


class TestFullImagesDataset:
    def test_assembles_tiles(self, tmp_path, rng):
        _write_scene(str(tmp_path), "scene0", rng, tiles=4, ts=16)
        d = FullImagesDataset(str(tmp_path), spp=2)
        assert len(d) == 1
        item = d[0]
        assert item["features"].shape[-2:] == (32, 32)
        assert item["target_image"].shape == (3, 32, 32)
        # block (16, 16) belongs to tile 3
        tiles = TilesDataset(str(tmp_path), spp=2)
        t3 = tiles[3]
        np.testing.assert_array_equal(
            item["target_image"][:, 16:, 16:], t3["target_image"])


class TestMultiSampleCountDataset:
    def test_concat(self, tmp_path, rng):
        _write_scene(str(tmp_path), "s", rng, tiles=2, spp=4)
        d = MultiSampleCountDataset(str(tmp_path), spp=4)
        # spp 2, 3, 4 -> 3 datasets x 2 tiles
        assert len(d) == 6
        assert d[0]["features"].shape[0] == 2
        assert d[5]["features"].shape[0] == 4


class TestLoader:
    def test_collate_pads_spp(self, tmp_path, rng):
        _write_scene(str(tmp_path), "s", rng, tiles=2, spp=4)
        d = MultiSampleCountDataset(str(tmp_path), spp=4)
        batch = collate([d[0], d[5]], pad_spp=4)
        assert batch["features"].shape == (2, 4, 93, 16, 16)
        assert batch["sample_mask"].shape == (2, 4)
        assert batch["sample_mask"][0].sum() == 2
        assert batch["sample_mask"][1].sum() == 4
        # padded slots are zero
        assert np.abs(batch["features"][0, 2:]).max() == 0

    def test_loader_iterates_all(self, tmp_path, rng):
        _write_scene(str(tmp_path), "s", rng, tiles=4, spp=2)
        d = TilesDataset(str(tmp_path), spp=2)
        loader = Loader(d, batch_size=2, shuffle=True, num_threads=2)
        batches = list(loader)
        assert len(batches) == 2
        assert batches[0]["features"].shape[0] == 2

    def test_loader_deterministic_order(self, tmp_path, rng):
        _write_scene(str(tmp_path), "s", rng, tiles=4, spp=2)
        d = TilesDataset(str(tmp_path), spp=2)
        a = [b["path"] for b in Loader(d, batch_size=1, shuffle=True, seed=1)]
        b = [b["path"] for b in Loader(d, batch_size=1, shuffle=True, seed=1)]
        assert a == b


class TestLoaderSharding:
    def test_shards_partition_dataset(self, tmp_path, rng):
        _write_scene(str(tmp_path), "s", rng, tiles=4, spp=2)
        d = TilesDataset(str(tmp_path), spp=2)
        seen = []
        for shard in range(2):
            loader = Loader(d, batch_size=1, shuffle=False, shard_id=shard,
                            num_shards=2, drop_last=False)
            assert len(loader) == 2
            for b in loader:
                seen.extend(b["path"])
        assert sorted(seen) == sorted(d.files)
