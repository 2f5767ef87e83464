"""OBJ ingestion (sbmc_tpu/render/assets.py): the native-tracer side of
the reference's random .obj prop placement (sbmc/scene_generator/
generators.py, converters.py:44-224)."""

import numpy as np
import pytest

import jax

from sbmc_tpu.render import pathtracer
from sbmc_tpu.render.assets import ObjPool, load_obj, normalize_mesh
from sbmc_tpu.render.pathtracer import (random_tracer_scene,
                                        render_tile_wavefront)

CUBE_OBJ = """# simple cube
v -1 -1 -1
v  1 -1 -1
v  1  1 -1
v -1  1 -1
v -1 -1  1
v  1 -1  1
v  1  1  1
v -1  1  1
f 1 2 3 4
f 5 8 7 6
f 1 5 6 2
f 2 6 7 3
f 3 7 8 4
f 5 1 4 8
"""

QUAD_NEG_OBJ = """v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
f -4/1/1 -3/2/1 -2/3/1 -1/4/1
"""


class TestLoadObj:
    def test_cube_parses_and_triangulates(self, tmp_path):
        p = tmp_path / "cube.obj"
        p.write_text(CUBE_OBJ)
        v, f = load_obj(str(p))
        assert v.shape == (8, 3)
        assert f.shape == (12, 3)  # 6 quads -> 12 triangles
        assert f.min() >= 0 and f.max() < 8

    def test_negative_indices_and_vtn_syntax(self, tmp_path):
        p = tmp_path / "quad.obj"
        p.write_text(QUAD_NEG_OBJ)
        v, f = load_obj(str(p))
        assert v.shape == (4, 3)
        np.testing.assert_array_equal(f, [[0, 1, 2], [0, 2, 3]])

    def test_max_faces_guard(self, tmp_path):
        p = tmp_path / "cube.obj"
        p.write_text(CUBE_OBJ)
        with pytest.raises(ValueError):
            load_obj(str(p), max_faces=4)

    def test_empty_rejected(self, tmp_path):
        p = tmp_path / "empty.obj"
        p.write_text("# nothing\n")
        with pytest.raises(ValueError):
            load_obj(str(p))

    def test_normalize(self):
        v = np.array([[0, 0, 0], [4, 0, 0]], np.float32)
        n = normalize_mesh(v)
        assert np.abs(np.linalg.norm(n, axis=1).max() - 1.0) < 1e-6
        np.testing.assert_allclose(n.mean(0), 0, atol=1e-6)


class TestObjPool:
    def test_pool_samples_and_skips_bad(self, tmp_path):
        (tmp_path / "good.obj").write_text(CUBE_OBJ)
        (tmp_path / "bad.obj").write_text("not an obj\nf 1 2\n")
        pool = ObjPool(str(tmp_path))
        assert len(pool) == 2
        rng = np.random.RandomState(0)
        for _ in range(6):
            v, f = pool.sample(rng)
            assert f.shape == (12, 3)  # only the cube ever loads

    def test_scene_uses_pool_meshes_and_buckets_tris(self, tmp_path):
        (tmp_path / "cube.obj").write_text(CUBE_OBJ)
        pool = ObjPool(str(tmp_path))
        rng = np.random.RandomState(7)
        s = random_tracer_scene(rng, obj_pool=pool, obj_prob=1.0,
                                tri_bucket=64)
        # 2 mesh slots x 12 cube tris = 24, padded to the 64 bucket.
        assert s.tri_v0.shape[0] == 64
        # Padding is degenerate: zero-area triangles.
        area = np.linalg.norm(np.cross(s.tri_e1[24:], s.tri_e2[24:]),
                              axis=1)
        np.testing.assert_array_equal(area, 0)

    def test_pool_scene_renders_finite(self, tmp_path):
        (tmp_path / "cube.obj").write_text(CUBE_OBJ)
        pool = ObjPool(str(tmp_path))
        rng = np.random.RandomState(3)
        s = random_tracer_scene(rng, n_spheres=1, n_boxes=1, n_cyls=1,
                                n_meshes=1, obj_pool=pool, obj_prob=1.0)
        t = render_tile_wavefront(s, jax.random.PRNGKey(5), ts=16, spp=1,
                                  gt_spp=1)
        assert np.isfinite(t.features).all()
        assert np.isfinite(t.pixel_data).all()

    def test_bucket_keeps_tri_count_stable_across_scenes(self, tmp_path):
        (tmp_path / "cube.obj").write_text(CUBE_OBJ)
        pool = ObjPool(str(tmp_path))
        counts = set()
        for seed in range(4):
            rng = np.random.RandomState(seed)
            s = random_tracer_scene(rng, obj_pool=pool, obj_prob=0.5,
                                    tri_bucket=64)
            counts.add(s.tri_v0.shape[0])
        # Mixed procedural (tet=4..ico=20 tris) and cube (12) draws all
        # land in the same 64-triangle bucket -> one XLA compile.
        assert counts == {64}


class TestFidelityKnobs:
    """Corpus-fidelity env knobs (SBMC_MAX_FACES / SBMC_ENV_RES /
    SBMC_TEX_RES): tracer asset resolution caps are tunable per-corpus
    without code edits, so raising fidelity for a future corpus is a
    queue-script decision measured in datagen s/scene (VERDICT r3
    weak-item 7; reference corpus: scene_generator/randomizers.py:27-93).
    Defaults stay at the round-3 values — a running datagen that restarts
    mid-corpus must keep producing identical scenes."""

    def test_max_faces_env_default(self, tmp_path, monkeypatch):
        (tmp_path / "cube.obj").write_text(CUBE_OBJ)
        monkeypatch.setenv("SBMC_MAX_FACES", "7")
        pool = ObjPool(str(tmp_path))
        assert pool.max_faces == 7
        rng = np.random.RandomState(0)
        with pytest.raises(ValueError):
            pool._load(pool.paths[0])  # 12-tri cube > 7-face cap
        # Explicit arg still wins over the env knob.
        assert ObjPool(str(tmp_path), max_faces=99).max_faces == 99
        del rng

    def test_env_res_knob(self, tmp_path, monkeypatch):
        from sbmc_tpu.render.assets import EnvmapPool
        from sbmc_tpu.utils import exr
        im = np.random.RandomState(0).rand(32, 48, 3).astype(np.float32)
        exr.write(str(tmp_path / "e.exr"), im)
        pool = EnvmapPool([str(tmp_path / "e.exr")])
        rng = np.random.RandomState(1)
        assert pool.sample(rng).shape == (64, 128, 3)
        monkeypatch.setenv("SBMC_ENV_RES", "128")
        pool2 = EnvmapPool([str(tmp_path / "e.exr")])
        assert pool2.sample(rng).shape == (128, 256, 3)

    def test_tex_res_default_unchanged(self):
        # TEX_IMG_RES is read at import time; the committed default must
        # stay 64 until a corpus regeneration flips it deliberately.
        assert pathtracer.TEX_IMG_RES == 64


def _fan_obj(n_faces):
    """A triangle fan with ``n_faces`` faces (arbitrary face counts for
    bucket tests)."""
    lines = ["v 0 0 1"]
    for i in range(n_faces + 1):
        a = 2 * np.pi * i / (n_faces + 1)
        lines.append("v %f %f 1" % (np.cos(a), np.sin(a)))
    for i in range(n_faces):
        lines.append("f 1 %d %d" % (i + 2, i + 3))
    return "\n".join(lines) + "\n"


class TestStaticShapes:
    """Per-scene traced shapes must collapse to a handful of variants:
    XLA compilation was 40-55% of datagen wall clock on the round-4
    overnight corpus because fixed-multiple tri buckets x optional env
    image produced an executable zoo."""

    def test_tri_bucket_pow2_rungs(self, tmp_path):
        (tmp_path / "fan.obj").write_text(_fan_obj(150))
        pool = ObjPool(str(tmp_path))
        counts = set()
        for seed in range(8):
            rng = np.random.RandomState(seed)
            s = random_tracer_scene(rng, obj_pool=pool, obj_prob=0.5,
                                    tri_bucket=64)
            counts.add(s.tri_v0.shape[0])
        # 0-2 fans of 150 tris (+ tiny procedural meshes) -> every count
        # lands on a power-of-two rung, and only a few rungs exist.
        assert counts <= {64, 128, 256, 512}
        for c in counts:
            assert c & (c - 1) == 0  # power of two

    def test_env_image_shape_static_with_pool(self, tmp_path):
        from sbmc_tpu.render.assets import EnvmapPool
        from sbmc_tpu.utils import exr
        im = np.random.RandomState(0).rand(32, 64, 3).astype(np.float32)
        exr.write(str(tmp_path / "e.exr"), im)
        pool = EnvmapPool([str(tmp_path / "e.exr")])
        shapes, scales = set(), []
        for seed in range(12):
            rng = np.random.RandomState(seed)
            s = random_tracer_scene(rng, env_pool=pool, env_img_prob=0.4)
            assert s.env_image is not None
            shapes.add(s.env_image.shape)
            scales.append(s.env_image_scale)
        assert shapes == {pool.res + (3,)}
        # Both branches occur across seeds; the no-image branch is a
        # zero image at scale 0 (contributes exactly nothing).
        assert any(sc == 0.0 for sc in scales)
        assert any(sc > 0.0 for sc in scales)
        for seed, sc in enumerate(scales):
            if sc == 0.0:
                rng = np.random.RandomState(seed)
                s = random_tracer_scene(rng, env_pool=pool,
                                        env_img_prob=0.4)
                np.testing.assert_array_equal(s.env_image, 0.0)

    def test_no_pool_scenes_keep_env_image_none(self):
        s = random_tracer_scene(np.random.RandomState(0))
        assert s.env_image is None
