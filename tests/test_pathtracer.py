"""Tests for the TPU-native wavefront path tracer."""

import os

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

    def test_loads_through_dataset_nonsquare(self, tmp_path):
        """tiles_y gives non-square frames (the 1080p-class end-to-end
        denoise path uses a 15x9 grid)."""
        pathtracer.generate_wavefront_dataset(
            str(tmp_path), n_scenes=1, ts=16, tiles_per_side=3, tiles_y=2,
            spp=2, gt_spp=2, seed=0)
        d = TilesDataset(str(tmp_path), spp=2)
        assert len(d) == 6
        assert d.image_width == 48 and d.image_height == 32
        assert np.isfinite(d[0]["features"]).all()

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


class TestExtendedPhysics:
    """Round-2 tracer upgrades: MIS pdf records, new materials/geometry,
    scene-radius normalization (VERDICT round-1 items 5/6)."""

    def test_mis_pdf_layout(self):
        """p stores 4 pdfs per vertex, vertex-major, normalized
        log(p + 1e-8)/30: (light_pdf, bsdf_pdf(w_light),
        bsdf_pdf(w_sampled), light_pdf(w_sampled))."""
        scene = _simple_scene()
        tile = render_tile_wavefront(scene, jax.random.PRNGKey(7), ts=16,
                                     spp=1, gt_spp=1)
        p = tile.p[0]  # [4*D, ts, ts]
        assert p.shape[0] == 4 * bin_format.PATH_DEPTH
        hit = tile.features[0, 20] > 0.5
        assert hit.any()
        raw = np.exp(30.0 * p) - 1e-8  # invert the writer normalization
        lpdf0, bpdf_l0, bpdf_o0 = raw[0], raw[1], raw[2]
        # Light pdf of an area light at finite distance is strictly
        # positive on hit pixels; ~0 (log(1e-8)) on misses.
        assert (lpdf0[hit] > 1e-6).all()
        assert np.allclose(p[0][~hit], np.log(1e-8) / 30.0, atol=1e-5)
        # Diffuse-at-first-vertex pixels: bsdf pdf at the light direction
        # is a cosine lobe, bounded by 1/pi.
        diffuse = tile.bt[0, 0] == (pathtracer.BT_REFLECTION
                                    | pathtracer.BT_DIFFUSE)
        assert diffuse.any()
        assert (bpdf_l0[diffuse] <= 1.0 / np.pi + 1e-4).all()
        # The sampled-direction bsdf pdf is positive wherever we hit.
        assert (bpdf_o0[hit] > 1e-6).all()

    def test_glass_transmission_flags(self):
        scene = _simple_scene()
        scene.centers = np.array([[0.0, 1.0, 4.0]])
        scene.radii = np.array([1.4])
        scene.mat_type = np.array([pathtracer.MAT_GLASS])
        tile = render_tile_wavefront(scene, jax.random.PRNGKey(8), ts=24,
                                     spp=2, gt_spp=1)
        flags = set(np.unique(tile.bt[:, :2]).tolist())
        assert (pathtracer.BT_TRANSMISSION | pathtracer.BT_SPECULAR) in flags
        assert np.isfinite(tile.features).all()

    def test_box_in_gbuffer(self):
        scene = _simple_scene()
        scene.centers = np.array([[100.0, 1.0, 5.0]])  # sphere out of view
        scene.box_centers = np.array([[0.0, 1.0, 5.0]])
        scene.box_half = np.array([[1.0, 1.0, 1.0]])
        scene.mat_type = np.array([pathtracer.MAT_DIFFUSE,
                                   pathtracer.MAT_DIFFUSE])
        scene.albedos = np.array([[0.1, 0.1, 0.1], [0.9, 0.1, 0.1]])
        scene.roughness = np.array([1.0, 1.0])
        scene.motion = np.zeros((2, 3))
        tile = render_tile_wavefront(scene, jax.random.PRNGKey(9), ts=24,
                                     spp=1, gt_spp=1)
        c = 12
        # Center pixel sees the box front face: red-ish albedo, normal -z.
        assert tile.features[0, 21, c, c] > 0.5  # albedo_first_r
        assert tile.features[0, 13, c, c] < -0.9  # normal_first_z faces cam
        assert np.isfinite(tile.features).all()

    def test_texture_kinds_modulate_albedo(self):
        """Procedural textures (checker/noise/stripes — the Imagemap/
        Checkerboard role) vary the recorded albedo across the surface
        without changing its un-textured mean scale."""
        alb = {}
        for kind in (None, pathtracer.TEX_CHECKER3D, pathtracer.TEX_NOISE,
                     pathtracer.TEX_STRIPES):
            s = _simple_scene()
            if kind is not None:
                s.tex_scale = np.array([4.0])
                s.tex_kind = np.array([kind])
            t = render_tile_wavefront(s, jax.random.PRNGKey(31), ts=24,
                                      spp=1, gt_spp=1)
            i_alb = pathtracer.SAMPLE_FEATURE_IDX["albedo_first_r"]
            hit = (t.features[0, pathtracer.SAMPLE_FEATURE_IDX["hasHit"]]
                   > 0.5)
            # Restrict to the sphere: ground albedo is checkered too.
            i_n = pathtracer.SAMPLE_FEATURE_IDX["normal_first_y"]
            sphere = hit & (np.abs(t.features[0, i_n] - 1.0) > 1e-3)
            assert sphere.sum() > 20
            alb[kind] = t.features[0, i_alb][sphere]
        assert alb[None].std() < 1e-6          # flat albedo, no texture
        for kind in (pathtracer.TEX_CHECKER3D, pathtracer.TEX_NOISE,
                     pathtracer.TEX_STRIPES):
            assert alb[kind].std() > 0.01, kind
            assert np.all(alb[kind] <= alb[None].max() + 1e-6)
            assert np.all(alb[kind] > 0)
        # Distinct kinds give distinct patterns.
        a = alb[pathtracer.TEX_CHECKER3D][:20]
        b = alb[pathtracer.TEX_NOISE][:20]
        assert not np.allclose(a, b, atol=1e-3)

    def test_ground_texture_randomization(self):
        """Ground-plane texture kind/scale vary the recorded ground
        albedo pattern (the ground is the dominant surface in the
        distribution)."""
        albs = []
        for kind, scale in ((pathtracer.TEX_CHECKER3D, 1.0),
                            (pathtracer.TEX_NOISE, 0.7),
                            (pathtracer.TEX_STRIPES, 1.6)):
            s = _simple_scene()
            s.ground_tex_kind = kind
            s.ground_tex_scale = scale
            t = render_tile_wavefront(s, jax.random.PRNGKey(32), ts=24,
                                      spp=1, gt_spp=1)
            i_alb = pathtracer.SAMPLE_FEATURE_IDX["albedo_first_r"]
            i_n = pathtracer.SAMPLE_FEATURE_IDX["normal_first_y"]
            hit = (t.features[0, pathtracer.SAMPLE_FEATURE_IDX["hasHit"]]
                   > 0.5)
            ground = hit & (np.abs(t.features[0, i_n] - 1.0) < 1e-3)
            assert ground.sum() > 50
            albs.append(t.features[0, i_alb][ground])
        for a in albs:
            assert a.std() > 0.01       # every kind shows a pattern
        assert not np.allclose(albs[0][:40], albs[1][:40], atol=1e-3)
        assert not np.allclose(albs[1][:40], albs[2][:40], atol=1e-3)

    def test_ground_checker_is_spatially_coherent(self):
        """The y=0 ground plane must not speckle under TEX_CHECKER3D:
        hit points have y ~ +-eps, so the y lattice coordinate is pinned
        mid-cell and neighboring pixels inside one checker cell share
        albedo (regression for the floor(q_y) parity-flip bug)."""
        s = _simple_scene()
        s.centers = np.array([[100.0, 1.0, 5.0]])  # sphere out of view
        s.ground_tex_kind = pathtracer.TEX_CHECKER3D
        s.ground_tex_scale = 0.25  # cells span many pixels
        t = render_tile_wavefront(s, jax.random.PRNGKey(33), ts=32,
                                  spp=1, gt_spp=1)
        i_alb = pathtracer.SAMPLE_FEATURE_IDX["albedo_first_r"]
        i_n = pathtracer.SAMPLE_FEATURE_IDX["normal_first_y"]
        hit = (t.features[0, pathtracer.SAMPLE_FEATURE_IDX["hasHit"]]
               > 0.5)
        ground = hit & (np.abs(t.features[0, i_n] - 1.0) < 1e-3)
        assert ground.sum() > 200
        alb = t.features[0, i_alb]
        # Horizontally adjacent ground pixels nearly always agree: only
        # pixel pairs straddling a cell boundary may differ. Check the
        # bottom third of the tile (near-field ground, many pixels per
        # cell) — toward the horizon a single pixel legitimately spans
        # several cells, which is aliasing, not the parity-flip bug.
        near = slice(2 * alb.shape[0] // 3, None)
        both = ground[near, :-1] & ground[near, 1:]
        same = np.abs(alb[near, :-1] - alb[near, 1:]) < 1e-3
        assert both.sum() > 100
        frac_same = (same & both).sum() / max(both.sum(), 1)
        # Rows that straddle a z cell boundary legitimately speckle under
        # 1-spp jitter; the parity-flip bug speckled EVERY row (~0.5).
        assert frac_same > 0.8

    def test_kpcn_mode_records_raw_distances_and_pdfs(self):
        """kpcn_mode reproduces PathKPCNIntegrator conventions
        (sbmc_pbrt.diff pathkpcn.cpp): unnormalized distances, no
        log-probability compression (VERDICT r1 §2.1 PathKPCN row)."""
        scene = _simple_scene(aperture=0.02)
        std = render_tile_wavefront(scene, jax.random.PRNGKey(30), ts=16,
                                    spp=2, gt_spp=1)
        kp = render_tile_wavefront(scene, jax.random.PRNGKey(30), ts=16,
                                   spp=2, gt_spp=1, kpcn_mode=True)
        denorm = 10.0 * scene.scene_radius
        i_depth = pathtracer.SAMPLE_FEATURE_IDX["depth_first"]
        hit = std.features[:, pathtracer.SAMPLE_FEATURE_IDX["hasHit"]] > 0.5
        assert hit.any()
        # Distances: kpcn = standard * (10 * scene_radius), incl. the
        # pixel-buffer depth mean/variance and the lens/header globals.
        np.testing.assert_allclose(
            kp.features[:, i_depth][hit],
            std.features[:, i_depth][hit] * denorm, rtol=1e-4)
        d_pix = pathtracer.PIXEL_DEPTH_IDX
        np.testing.assert_allclose(
            kp.pixel_data[d_pix], std.pixel_data[d_pix] * denorm,
            rtol=1e-4)
        np.testing.assert_allclose(
            kp.pixel_data[d_pix + bin_format.PIXEL_FEATURES // 2],
            std.pixel_data[d_pix + bin_format.PIXEL_FEATURES // 2]
            * denorm * denorm, rtol=1e-3)
        np.testing.assert_allclose(kp.aperture_radius,
                                   std.aperture_radius * denorm, rtol=1e-5)
        np.testing.assert_allclose(kp.focus_distance,
                                   std.focus_distance * denorm, rtol=1e-5)
        # Probabilities: standard applies log(p + 1e-8) / 30; kpcn is raw.
        np.testing.assert_allclose(
            std.p, np.log(np.minimum(kp.p, 1e12) + 1e-8) / 30.0,
            atol=1e-5)
        # Everything not distance/probability shaped is identical.
        np.testing.assert_array_equal(kp.bt, std.bt)
        np.testing.assert_allclose(kp.ld, std.ld, atol=1e-6)
        i_alb = pathtracer.SAMPLE_FEATURE_IDX["albedo_r"]
        np.testing.assert_allclose(kp.features[:, i_alb:i_alb + 3],
                                   std.features[:, i_alb:i_alb + 3])

    def test_scene_radius_normalizes_depth(self):
        """Depth features scale with 1/(10*scene_radius) — round 1
        hardcoded 12.0 (VERDICT weak #4)."""
        a = _simple_scene()
        b = _simple_scene()
        b.scene_radius = 24.0  # a uses the 12.0 default
        ta = render_tile_wavefront(a, jax.random.PRNGKey(10), ts=16,
                                   spp=1, gt_spp=1)
        tb = render_tile_wavefront(b, jax.random.PRNGKey(10), ts=16,
                                   spp=1, gt_spp=1)
        da, db = ta.features[0, 17], tb.features[0, 17]  # depth_first
        hit = ta.features[0, 20] > 0.5
        assert hit.any()
        np.testing.assert_allclose(db[hit], 0.5 * da[hit], rtol=1e-4)

    def test_sun_adds_energy(self):
        base = _simple_scene()
        sunny = _simple_scene()
        sunny.sun_color = np.array([20.0, 20.0, 20.0])
        sunny.sun_dir = np.array([0.0, 1.0, 0.0])
        sunny.sun_exp = 30.0

        def mean_radiance(s):
            t = render_tile_wavefront(s, jax.random.PRNGKey(11), ts=16,
                                      spp=2, gt_spp=1)
            return (t.features[:, 5:8] + t.features[:, 8:11]).mean()

        assert mean_radiance(sunny) > mean_radiance(base) + 1e-4

    def test_env_lobes_add_directional_energy(self):
        """Procedural envmap lobes (role of the reference's random HDR
        envmaps): a lobe adds radiance along its direction, and a
        lobe-free scene is bit-identical to the pre-envmap tracer."""
        import jax.numpy as jnp
        base = _simple_scene()
        lit = _simple_scene()
        lit.env_dirs = np.array([[1.0, 0.2, 0.0]])
        lit.env_colors = np.array([[5.0, 0.0, 0.0]])
        lit.env_exps = np.array([8.0])
        sb, sl = base.as_jax(), lit.as_jax()
        d_to = np.array([[1.0, 0.2, 0.0]], np.float32)
        d_to /= np.linalg.norm(d_to)
        d_away = -d_to
        r_to = np.asarray(pathtracer._sky_radiance(sl, jnp.asarray(d_to)))
        r_away = np.asarray(pathtracer._sky_radiance(sl,
                                                     jnp.asarray(d_away)))
        r_base = np.asarray(pathtracer._sky_radiance(sb, jnp.asarray(d_to)))
        assert r_to[0, 0] > r_base[0, 0] + 1.0       # lobe color arrives
        np.testing.assert_allclose(r_away, np.asarray(
            pathtracer._sky_radiance(sb, jnp.asarray(d_away))), atol=1e-6)
        # Disabled lobes (zero colors) change nothing anywhere.
        np.testing.assert_allclose(
            r_base, np.asarray(pathtracer._sky_radiance(
                sb, jnp.asarray(d_to))), atol=0)

    def test_random_scene_material_mix(self):
        rng = np.random.RandomState(3)
        mats = np.concatenate([
            random_tracer_scene(rng, n_spheres=20, n_boxes=10).mat_type
            for _ in range(8)])
        # All five material classes appear in a large sample.
        assert set(np.unique(mats)) == {
            pathtracer.MAT_DIFFUSE, pathtracer.MAT_MIRROR,
            pathtracer.MAT_GLASS, pathtracer.MAT_METAL,
            pathtracer.MAT_PLASTIC}

    def test_random_scene_renders_finite(self):
        rng = np.random.RandomState(4)
        scene = random_tracer_scene(rng)
        tile = render_tile_wavefront(scene, jax.random.PRNGKey(12), ts=16,
                                     spp=2, gt_spp=2)
        for arr in [tile.features, tile.pixel_data, tile.p, tile.ld]:
            assert np.isfinite(arr).all()
        assert (tile.features[:, 5:11] >= 0).all()


class TestCylinders:
    """Capped y-axis cylinder primitive (reference:
    sbmc/scene_generator/geometry.py Cylinder)."""

    def _cyl_scene(self):
        scene = _simple_scene()
        scene.centers = np.array([[100.0, 1.0, 5.0]])  # sphere out of view
        scene.cyl_centers = np.array([[0.0, 1.0, 5.0]])
        scene.cyl_radius = np.array([0.8])
        scene.cyl_half = np.array([1.0])
        scene.mat_type = np.array([pathtracer.MAT_DIFFUSE,
                                   pathtracer.MAT_DIFFUSE])
        scene.albedos = np.array([[0.1, 0.1, 0.1], [0.9, 0.1, 0.1]])
        scene.roughness = np.array([1.0, 1.0])
        scene.motion = np.zeros((2, 3))
        return scene

    def test_side_and_cap_normals(self):
        import jax.numpy as jnp
        scn = self._cyl_scene().as_jax()
        org = np.array([[0.0, 1.0, 0.0],   # at side height -> side hit
                        [0.0, 5.0, 5.0]],  # above the axis -> top cap
                       np.float32)
        dirs = np.array([[0.0, 0.0, 1.0], [0.0, -1.0, 0.0]], np.float32)
        h = pathtracer._intersect(scn, jnp.asarray(org), jnp.asarray(dirs),
                                  jnp.zeros(2))
        hit = np.asarray(h["hit"])
        t = np.asarray(h["t"])
        n = np.asarray(h["normal"])
        assert hit.all()
        np.testing.assert_allclose(t, [4.2, 3.0], atol=1e-4)
        np.testing.assert_allclose(n[0], [0.0, 0.0, -1.0], atol=1e-5)
        np.testing.assert_allclose(n[1], [0.0, 1.0, 0.0], atol=1e-5)

    def test_cylinder_in_gbuffer(self):
        scene = self._cyl_scene()
        tile = render_tile_wavefront(scene, jax.random.PRNGKey(13), ts=24,
                                     spp=1, gt_spp=1)
        c = 12
        # Center pixel sees the cylinder side: red-ish albedo, -z normal.
        assert tile.features[0, 21, c, c] > 0.5   # albedo_first_r
        assert tile.features[0, 13, c, c] < -0.9  # normal_first_z
        assert np.isfinite(tile.features).all()

    def test_cylinder_casts_shadow(self):
        import jax.numpy as jnp
        scn = self._cyl_scene().as_jax()
        org = np.array([[0.0, 0.01, 5.0],    # under the cylinder
                        [3.0, 0.01, 5.0]],   # off to the side
                       np.float32)
        up = np.array([[0.0, 1.0, 0.0]] * 2, np.float32)
        occ = np.asarray(pathtracer._occluded(
            scn, jnp.asarray(org), jnp.asarray(up), jnp.full(2, 50.0)))
        assert occ[0] and not occ[1]

    def test_random_scene_has_cylinders(self):
        rng = np.random.RandomState(5)
        scene = random_tracer_scene(rng)
        assert scene.cyl_centers.shape[0] > 0
        tile = render_tile_wavefront(scene, jax.random.PRNGKey(14), ts=16,
                                     spp=2, gt_spp=2)
        assert np.isfinite(tile.features).all()


class TestTriangleMeshes:
    """Triangle-soup meshes (reference: arbitrary OBJ props via
    sbmc/scene_generator/converters.py; here Moeller-Trumbore over a flat
    triangle list with a per-triangle primitive-slot map)."""

    def _tri_scene(self):
        scene = _simple_scene()
        scene.centers = np.array([[100.0, 1.0, 5.0]])  # sphere out of view
        # One big triangle facing the camera at z=5.
        scene.tri_v0 = np.array([[-2.0, 0.0, 5.0]])
        scene.tri_e1 = np.array([[4.0, 0.0, 0.0]])
        scene.tri_e2 = np.array([[0.0, 4.0, 0.0]])
        scene.tri_prim = np.array([1], np.int32)
        scene.n_meshes = 1
        scene.mat_type = np.array([pathtracer.MAT_DIFFUSE,
                                   pathtracer.MAT_DIFFUSE])
        scene.albedos = np.array([[0.1, 0.1, 0.1], [0.9, 0.1, 0.1]])
        scene.roughness = np.array([1.0, 1.0])
        scene.motion = np.zeros((2, 3))
        return scene

    def test_triangle_hit_normal_and_material(self):
        import jax.numpy as jnp
        scn = self._tri_scene().as_jax()
        org = np.array([[0.0, 1.0, 0.0],    # hits the triangle
                        [0.0, 1.0, 10.0]],  # behind it, pointing away
                       np.float32)
        dirs = np.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]], np.float32)
        h = pathtracer._intersect(scn, jnp.asarray(org), jnp.asarray(dirs),
                                  jnp.zeros(2))
        assert np.asarray(h["hit"])[0]
        assert not np.asarray(h["hit"])[1]
        np.testing.assert_allclose(np.asarray(h["t"])[0], 5.0, atol=1e-4)
        # Normal faces the incoming ray (-z); albedo from slot 1.
        np.testing.assert_allclose(np.asarray(h["normal"])[0],
                                   [0.0, 0.0, -1.0], atol=1e-5)
        np.testing.assert_allclose(np.asarray(h["albedo"])[0],
                                   [0.9, 0.1, 0.1], atol=1e-5)

    def test_backface_hit_flags_inside(self):
        """cross(e1, e2) = +z is the winding normal, so a ray travelling +z
        hits the back face (inside=True for a closed mesh) and a ray
        travelling -z hits the front (inside=False)."""
        import jax.numpy as jnp
        scn = self._tri_scene().as_jax()
        org = np.array([[0.0, 1.0, 0.0],
                        [0.0, 1.0, 10.0]], np.float32)
        dirs = np.array([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]], np.float32)
        h = pathtracer._intersect(scn, jnp.asarray(org), jnp.asarray(dirs),
                                  jnp.zeros(2))
        assert np.asarray(h["hit"]).all()
        assert np.asarray(h["inside"])[0]
        assert not np.asarray(h["inside"])[1]

    def test_triangle_in_gbuffer_and_shadow(self):
        import jax.numpy as jnp
        scene = self._tri_scene()
        tile = render_tile_wavefront(scene, jax.random.PRNGKey(15), ts=24,
                                     spp=1, gt_spp=1)
        c = 12
        assert tile.features[0, 21, c, c] > 0.5   # albedo_first_r
        assert np.isfinite(tile.features).all()
        scn = scene.as_jax()
        org = np.array([[0.0, 1.0, 0.0],     # triangle blocks +z
                        [5.0, 1.0, 0.0]],    # off to the side
                       np.float32)
        fwd = np.array([[0.0, 0.0, 1.0]] * 2, np.float32)
        occ = np.asarray(pathtracer._occluded(
            scn, jnp.asarray(org), jnp.asarray(fwd), jnp.full(2, 50.0)))
        assert occ[0] and not occ[1]

    def test_random_scene_has_meshes_and_renders(self):
        rng = np.random.RandomState(7)
        scene = random_tracer_scene(rng)
        assert scene.tri_v0.shape[0] >= 8      # >= 2 platonic props
        assert scene.n_meshes == 2
        # Mesh slots are addressable by every per-primitive array.
        p = scene._n_prims()
        assert scene.tri_prim.max() == p - 1
        tile = render_tile_wavefront(scene, jax.random.PRNGKey(16), ts=16,
                                     spp=2, gt_spp=2)
        assert np.isfinite(tile.features).all()


class TestImageTextures:
    """Image textures / HDR envmaps from disk (the reference's Imagemap +
    random_envmap roles, sbmc/scene_generator/textures.py:30-139,
    randomizers.py:27-93)."""

    def test_sample_image_stack_exact_at_pixel_centers(self):
        import jax.numpy as jnp
        s = pathtracer.TEX_IMG_RES
        rng = np.random.RandomState(0)
        img = rng.rand(2, s, s, 3).astype(np.float32)
        ij = [(0, 0), (3, 7), (s - 1, s - 1), (10, 0)]
        u = jnp.array([(j + 0.5) / s for _, j in ij], jnp.float32)
        v = jnp.array([(i + 0.5) / s for i, _ in ij], jnp.float32)
        ids = jnp.array([0, 1, 0, 1], jnp.int32)
        out = np.asarray(pathtracer._sample_image_stack(
            jnp.asarray(img), ids, u, v))
        expect = np.stack([img[t, i, j]
                           for t, (i, j) in zip([0, 1, 0, 1], ij)])
        np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-6)
        # Wrap addressing: +1 in u and +2 in v sample the same texels.
        out_w = np.asarray(pathtracer._sample_image_stack(
            jnp.asarray(img), ids, u + 1.0, v + 2.0))
        np.testing.assert_allclose(out_w, out, rtol=1e-4, atol=1e-5)

    def test_ground_image_texture_colors_albedo(self):
        s = _simple_scene()
        s.centers = np.array([[100.0, 1.0, 5.0]])   # sphere out of view
        img = np.zeros((1, pathtracer.TEX_IMG_RES, pathtracer.TEX_IMG_RES,
                        3), np.float32)
        img[..., 1] = 1.0                            # constant green
        s.tex_images = img
        s.ground_tex_image_id = 0
        t = render_tile_wavefront(s, jax.random.PRNGKey(41), ts=24,
                                  spp=1, gt_spp=1)
        i_r = pathtracer.SAMPLE_FEATURE_IDX["albedo_first_r"]
        i_g = pathtracer.SAMPLE_FEATURE_IDX["albedo_first_g"]
        i_n = pathtracer.SAMPLE_FEATURE_IDX["normal_first_y"]
        hit = t.features[0, pathtracer.SAMPLE_FEATURE_IDX["hasHit"]] > 0.5
        ground = hit & (np.abs(t.features[0, i_n] - 1.0) < 1e-3)
        assert ground.sum() > 100
        # ground_albedo 0.5 * (0, 1, 0) image
        assert np.abs(t.features[0, i_r][ground]).max() < 1e-5
        np.testing.assert_allclose(t.features[0, i_g][ground], 0.5,
                                   atol=1e-4)

    def test_object_image_texture_varies_and_leaves_others_flat(self):
        s = _simple_scene()
        rng = np.random.RandomState(3)
        img = rng.rand(1, pathtracer.TEX_IMG_RES, pathtracer.TEX_IMG_RES,
                       3).astype(np.float32)
        s.tex_images = img
        s.tex_image_id = np.array([0], np.int32)
        t = render_tile_wavefront(s, jax.random.PRNGKey(42), ts=24,
                                  spp=1, gt_spp=1)
        i_r = pathtracer.SAMPLE_FEATURE_IDX["albedo_first_r"]
        i_n = pathtracer.SAMPLE_FEATURE_IDX["normal_first_y"]
        hit = t.features[0, pathtracer.SAMPLE_FEATURE_IDX["hasHit"]] > 0.5
        sphere = hit & (np.abs(t.features[0, i_n] - 1.0) > 1e-3)
        assert sphere.sum() > 20
        a = t.features[0, i_r][sphere]
        assert a.std() > 0.01                      # image varies albedo
        assert np.all(a <= 0.8 + 1e-5)             # modulation only dims
        # With id -1 the same scene stays flat.
        s2 = _simple_scene()
        s2.tex_images = img
        s2.tex_image_id = np.array([-1], np.int32)
        t2 = render_tile_wavefront(s2, jax.random.PRNGKey(42), ts=24,
                                   spp=1, gt_spp=1)
        a2 = t2.features[0, i_r][sphere]
        assert a2.std() < 1e-6

    def test_env_image_tints_escaping_rays(self):
        import jax.numpy as jnp
        s = _simple_scene()
        env = np.zeros((64, 128, 3), np.float32)
        env[..., 0] = 2.0                            # red dome
        s.env_image = env
        s.env_image_scale = 1.0
        scn = s.as_jax()
        d = jnp.asarray(np.array([[0.0, 1.0, 0.0], [0.7, 0.1, 0.7]],
                                 np.float32))
        d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
        rad = np.asarray(pathtracer._sky_radiance(scn, d))
        base = np.asarray(pathtracer._sky_radiance(_simple_scene().as_jax(),
                                                   d))
        np.testing.assert_allclose(rad[:, 0] - base[:, 0], 2.0, atol=1e-4)
        np.testing.assert_allclose(rad[:, 1:], base[:, 1:], atol=1e-5)

    def test_pools_load_committed_assets(self):
        from sbmc_tpu.render.assets import EnvmapPool, TexturePool
        root = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "assets")
        rng = np.random.RandomState(0)
        tp = TexturePool(os.path.join(root, "textures"))
        im = tp.sample(rng)
        assert im.shape == (pathtracer.TEX_IMG_RES, pathtracer.TEX_IMG_RES,
                            3)
        assert im.min() >= 0.0 and im.max() <= 1.0 and im.std() > 0.01
        ep = EnvmapPool(os.path.join(root, "envmaps"))
        env = ep.sample(rng)
        assert env.shape == (64, 128, 3)
        assert env.min() >= 0.0 and np.isfinite(env).all()

    def test_random_scene_with_pools_renders(self):
        from sbmc_tpu.render.assets import EnvmapPool, TexturePool
        root = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "assets")
        rng = np.random.RandomState(11)
        scene = random_tracer_scene(
            rng, tex_pool=TexturePool(os.path.join(root, "textures")),
            env_pool=EnvmapPool(os.path.join(root, "envmaps")),
            img_prob=1.0, env_img_prob=1.0)
        assert scene.tex_images is not None
        assert (np.asarray(scene.tex_image_id) >= 0).all()
        assert scene.env_image is not None
        assert float(np.abs(scene.env_colors).sum()) == 0.0
        tile = render_tile_wavefront(scene, jax.random.PRNGKey(43), ts=16,
                                     spp=2, gt_spp=2)
        assert np.isfinite(tile.features).all()
        assert np.isfinite(tile.pixel_data).all()


class TestTriangleMXUFormulation:
    """The MXU plane+dual-basis triangle test must agree with a direct
    Moeller-Trumbore oracle (the formulation it replaced) on random ray x
    triangle products, including motion blur and backface/inside flags."""

    @staticmethod
    def _mt_oracle(scn, org, dirs, t):
        e1, e2 = scn["tri_e1"], scn["tri_e2"]
        off = t[:, None, None] * np.asarray(scn["motion"])[
            np.asarray(scn["tri_prim"])][None]
        o = org[:, None, :] - np.asarray(scn["tri_v0"])[None] - off
        d = dirs[:, None, :]
        pvec = np.cross(d, np.asarray(e2)[None])
        det = np.sum(pvec * np.asarray(e1)[None], -1)
        inv_det = np.where(np.abs(det) > 1e-9, 1.0 / np.where(
            np.abs(det) > 1e-9, det, 1.0), 0.0)
        u = np.sum(o * pvec, -1) * inv_det
        qvec = np.cross(o, np.asarray(e1)[None])
        v = np.sum(d * qvec, -1) * inv_det
        ts = np.sum(np.asarray(e2)[None] * qvec, -1) * inv_det
        ok = ((np.abs(det) > 1e-9) & (u >= 0) & (v >= 0) & (u + v <= 1)
              & (ts > 1e-3))
        ts = np.where(ok, ts, 1e10)
        return ts, ok & (det < 0), u, v

    def test_matches_moeller_trumbore_on_random_product(self):
        import jax.numpy as jnp
        rng = np.random.RandomState(3)
        nt, n = 37, 256
        v0 = rng.randn(nt, 3).astype(np.float32) * 2
        e1 = rng.randn(nt, 3).astype(np.float32)
        e2 = rng.randn(nt, 3).astype(np.float32)
        motion = rng.randn(nt, 3).astype(np.float32) * 0.1
        scn = {"tri_v0": jnp.asarray(v0), "tri_e1": jnp.asarray(e1),
               "tri_e2": jnp.asarray(e2),
               "tri_prim": jnp.arange(nt, dtype=jnp.int32),
               "motion": jnp.asarray(motion)}
        org = rng.randn(n, 3).astype(np.float32) * 3
        dirs = rng.randn(n, 3).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        t = rng.rand(n).astype(np.float32)
        ts, inside = pathtracer._tri_ts(scn, jnp.asarray(org),
                                        jnp.asarray(dirs), jnp.asarray(t))
        ts_ref, inside_ref, u, v = self._mt_oracle(
            {k: np.asarray(val) for k, val in scn.items()}, org, dirs, t)
        ts = np.asarray(ts)
        # Skip pairs within a whisker of a barycentric/epsilon boundary
        # (both formulations are correct there, they may just disagree on
        # which side of the edge the f32 rounding lands).
        margin = 1e-3
        stable = ((np.abs(u) > margin) & (np.abs(v) > margin)
                  & (np.abs(u + v - 1) > margin)
                  & (np.abs(ts_ref - 1e-3) > margin))
        hit_ref = ts_ref < 1e9
        agree = (ts < 1e9) == hit_ref
        assert agree[stable].all()
        both = stable & hit_ref & (ts < 1e9)
        np.testing.assert_allclose(ts[both], ts_ref[both], rtol=2e-4,
                                   atol=2e-4)
        assert (np.asarray(inside)[both] == inside_ref[both]).all()


class TestTileBatchedRender:
    """render_tiles_wavefront: B tiles per traced call (vmapped pass
    stack) must reproduce the serial per-tile renderer — same fold_in
    RNG streams, same records — including through a ragged final chunk
    (padded by repeating the last tile, then dropped)."""

    def test_batched_matches_serial_with_ragged_chunk(self):
        from sbmc_tpu.render.pathtracer import render_tiles_wavefront
        rng = np.random.RandomState(0)
        scene = random_tracer_scene(rng, n_spheres=2, n_boxes=1, n_cyls=1,
                                    n_meshes=1)
        base = jax.random.PRNGKey(7)
        ts, spp, gt = 16, 2, 4
        coords = [(i, (i % 2) * ts, (i // 2) * ts) for i in range(4)]
        batched = render_tiles_wavefront(
            scene, base, coords, ts=ts, spp=spp, gt_spp=gt,
            image_width=32, image_height=32, tile_batch=3)
        assert len(batched) == 4
        for (i, bx, by), tb in zip(coords, batched):
            k = jax.random.fold_in(base, i)
            ser = render_tile_wavefront(
                scene, k, ts=ts, spp=spp, gt_spp=gt, block_x=bx,
                block_y=by, image_width=32, image_height=32)
            np.testing.assert_allclose(tb.pixel_data, ser.pixel_data,
                                       rtol=2e-5, atol=2e-5)
            np.testing.assert_allclose(tb.features, ser.features,
                                       rtol=2e-5, atol=2e-5)
            np.testing.assert_allclose(tb.p, ser.p, rtol=2e-5, atol=2e-5)
            np.testing.assert_allclose(tb.ld, ser.ld, rtol=2e-5,
                                       atol=2e-5)
            np.testing.assert_array_equal(tb.bt, ser.bt)
            assert tb.block_x == bx and tb.block_y == by

    def test_tile_batch_one_dispatches_serial_graph(self):
        # tile_batch=1 must route through the single-tile jit (the
        # TPU-proven graph) and still reproduce the per-tile renderer's
        # records and fold_in RNG streams in coords order.
        from sbmc_tpu.render.pathtracer import render_tiles_wavefront
        scene = _simple_scene()
        base = jax.random.PRNGKey(11)
        ts, spp, gt = 16, 2, 2
        coords = [(1, 16, 0), (0, 0, 0)]   # deliberately out of raster order
        tiles = render_tiles_wavefront(scene, base, coords, ts=ts, spp=spp,
                                       gt_spp=gt, image_width=32,
                                       image_height=16, tile_batch=1)
        assert len(tiles) == 2
        for (i, bx, by), tb in zip(coords, tiles):
            k = jax.random.fold_in(base, i)
            ser = render_tile_wavefront(
                scene, k, ts=ts, spp=spp, gt_spp=gt, block_x=bx,
                block_y=by, image_width=32, image_height=16)
            np.testing.assert_allclose(tb.pixel_data, ser.pixel_data,
                                       rtol=2e-5, atol=2e-5)
            np.testing.assert_allclose(tb.features, ser.features,
                                       rtol=2e-5, atol=2e-5)
            assert tb.block_x == bx and tb.block_y == by

    def test_env_knob_overrides_batch(self, monkeypatch):
        from sbmc_tpu.render.pathtracer import render_tiles_wavefront
        monkeypatch.setenv("SBMC_TILE_BATCH", "2")
        scene = _simple_scene()
        base = jax.random.PRNGKey(3)
        tiles = render_tiles_wavefront(scene, base, [(0, 0, 0), (1, 16, 0)],
                                       ts=16, spp=1, gt_spp=1,
                                       image_width=32, image_height=16,
                                       tile_batch=64)
        assert len(tiles) == 2
        assert np.isfinite(tiles[0].features).all()
