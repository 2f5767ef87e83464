"""Tests for the TPU-native wavefront path tracer."""

import jax
import numpy as np

from sbmc_tpu.data import TilesDataset, bin_format
from sbmc_tpu.render import pathtracer
from sbmc_tpu.render.pathtracer import (TracerScene, random_tracer_scene,
                                        render_tile_wavefront)


def _simple_scene(mirror=0.0, aperture=0.0, motion=0.0):
    return TracerScene(
        centers=np.array([[0.0, 1.0, 5.0]]),
        radii=np.array([1.0]),
        albedos=np.array([[0.8, 0.2, 0.2]]),
        mirror=np.array([mirror]),
        roughness=np.array([1.0]),
        motion=np.array([[motion, 0.0, 0.0]]),
        ground_albedo=np.array([0.5, 0.5, 0.5]),
        light_pos=np.array([0.0, 6.0, 3.0]),
        light_radius=0.5,
        light_emission=np.array([60.0, 60.0, 60.0]),
        sky=np.array([0.1, 0.1, 0.1]),
        fov=45.0,
        aperture=aperture,
        focus_distance=5.0,
    )


class TestWavefront:
    def test_tile_is_valid_and_roundtrips(self, tmp_path):
        scene = _simple_scene()
        tile = render_tile_wavefront(scene, jax.random.PRNGKey(0), ts=16,
                                     spp=2, gt_spp=4)
        assert tile.features.shape == (2, 27, 16, 16)
        for arr in [tile.features, tile.pixel_data, tile.p, tile.ld]:
            assert np.isfinite(arr).all()
        assert (tile.features[:, 5:11] >= 0).all()  # radiance positive
        path = str(tmp_path / "t.bin")
        bin_format.write_tile(path, tile)
        back = bin_format.read_tile(path)
        np.testing.assert_array_equal(back.features, tile.features)

    def test_sphere_visible_in_gbuffer(self):
        scene = _simple_scene()
        tile = render_tile_wavefront(scene, jax.random.PRNGKey(1), ts=24,
                                     spp=1, gt_spp=1)
        has_hit = tile.features[0, 20]  # hasHit plane
        assert has_hit.max() == 1.0  # something is hit (sphere or ground)
        # center of the image should see the sphere (albedo red-ish)
        albedo_r = tile.features[0, 21]
        albedo_g = tile.features[0, 22]
        c = albedo_r.shape[0] // 2
        assert albedo_r[c, c] > albedo_g[c, c]

    def test_mirror_sets_specular_flags(self):
        scene = _simple_scene(mirror=1.0)
        tile = render_tile_wavefront(scene, jax.random.PRNGKey(2), ts=24,
                                     spp=1, gt_spp=1)
        bt0 = tile.bt[0, 0]  # first-vertex flags
        assert (bt0 == (pathtracer.BT_REFLECTION
                        | pathtracer.BT_SPECULAR)).any()
        assert (bt0 == (pathtracer.BT_REFLECTION
                        | pathtracer.BT_DIFFUSE)).any()  # ground

    def test_diffuse_flags_without_mirror(self):
        scene = _simple_scene(mirror=0.0)
        tile = render_tile_wavefront(scene, jax.random.PRNGKey(3), ts=16,
                                     spp=1, gt_spp=1)
        flags = set(np.unique(tile.bt[0, 0]).tolist())
        assert flags <= {0, pathtracer.BT_REFLECTION | pathtracer.BT_DIFFUSE}

    def test_gt_correlates_with_samples(self):
        rng = np.random.RandomState(0)
        scene = random_tracer_scene(rng)
        tile = render_tile_wavefront(scene, jax.random.PRNGKey(4), ts=32,
                                     spp=4, gt_spp=16)
        gt = tile.pixel_data[:3] + tile.pixel_data[3:6]
        low = (tile.features[:, 5:8] + tile.features[:, 8:11]).mean(0)
        corr = np.corrcoef(gt.ravel(), low.ravel())[0, 1]
        assert corr > 0.5

    def test_loads_through_dataset(self, tmp_path):
        pathtracer.generate_wavefront_dataset(
            str(tmp_path), n_scenes=1, ts=16, tiles_per_side=2, spp=2,
            gt_spp=2, seed=0)
        d = TilesDataset(str(tmp_path), spp=2)
        assert len(d) == 4
        item = d[0]
        assert item["features"].shape == (2, 93, 16, 16)
        for k, v in item.items():
            if isinstance(v, np.ndarray):
                assert np.isfinite(v).all(), k

    def test_motion_blur_spreads_samples(self):
        """With motion, per-sample hit masks at different times differ."""
        still = _simple_scene(motion=0.0)
        moving = _simple_scene(motion=3.0)

        def hit_variance(scene):
            tile = render_tile_wavefront(scene, jax.random.PRNGKey(5),
                                         ts=24, spp=4, gt_spp=1)
            return tile.features[:, 20].std(axis=0).mean()  # hasHit spread

        assert hit_variance(moving) > hit_variance(still) + 1e-4

    def test_glossy_flags(self):
        scene = _simple_scene()
        scene.roughness = np.array([0.2])  # glossy sphere
        tile = render_tile_wavefront(scene, jax.random.PRNGKey(6), ts=24,
                                     spp=1, gt_spp=1)
        flags = set(np.unique(tile.bt[0, 0]).tolist())
        assert (pathtracer.BT_REFLECTION | pathtracer.BT_GLOSSY) in flags
