"""TPU-native wavefront path tracer for sample-data generation.

The reference generates training data with an instrumented C++ PBRTv2
(pbrt_patches/sbmc_pbrt.diff: ``PathRendernetIntegrator`` records, per
camera sample, the radiance decomposition, two-bounce g-buffer, per-vertex
sampling probabilities, light directions and bounce-type flags;
``RendernetRenderer`` runs a ground-truth pass and a recorded pass per
tile). This module is the TPU-first equivalent: a fully vectorized,
``jit``-able wavefront tracer — one ray per pixel per sample pass, a
``lax.scan`` over path vertices (fixed depth, matching the reference's
no-russian-roulette ``maxdepth`` design).

Scene model (all analytic, so the tracer stays a fixed-shape jit graph):

- Geometry: moving spheres, moving axis-aligned boxes, capped cylinders,
  triangle meshes (flat triangle soup with a per-triangle primitive-slot
  map — the role of the reference's OBJ meshes,
  sbmc/scene_generator/converters.py), and a checkered ground plane.
- Materials (mapped from the reference's material mixture,
  sbmc/scene_generator/randomizers.py:194-227): diffuse (matte/uber),
  mirror, glass (Fresnel dielectric with refraction), metal (colored Phong
  gloss), plastic (diffuse base + glossy coat). Objects can carry a
  procedural 3D checker texture.
- Lighting: one spherical area light with next-event estimation,
  multiple-importance-sampled against BSDF sampling (power heuristic, the
  same estimator family as PBRT's ``EstimateDirect``), plus a
  gradient-sky + sun environment picked up by escaping rays.

It records the exact per-sample feature surface of the ``.bin`` format
(sbmc_tpu/data/bin_format.py): 27 sample features, ``4 * depth`` path
probabilities — per vertex ``(light_pdf, bsdf_pdf(w_light),
bsdf_pdf(w_sampled), light_pdf(w_sampled))``, the four MIS pdfs of the
reference's ``LightQueryRecord`` (sbmc_pbrt.diff integrator.cpp
instrumentation) — normalized ``log(p + 1e-8) / 30`` like SampleRecord,
``2 * depth`` light directions (theta, phi) and per-vertex bounce-type
bitmasks. Distance-like features (depth, lens coordinates, focus distance)
are normalized by ``1 / (10 * scene_radius)`` exactly like
``SampleRecord::normalize_distances``.

Scenes are flat arrays (:class:`TracerScene`), so rendering runs unchanged
on CPU or TPU and scales over devices by splitting sample passes.
"""

import dataclasses
import os as _os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sbmc_tpu.data import bin_format

__all__ = ["TracerScene", "random_tracer_scene", "render_pass",
           "render_tile_wavefront", "render_tiles_wavefront",
           "generate_wavefront_dataset",
           "MAT_DIFFUSE", "MAT_MIRROR", "MAT_GLASS", "MAT_METAL",
           "MAT_PLASTIC", "TEX_CHECKER3D", "TEX_NOISE", "TEX_STRIPES",
           "N_TEX_IMAGES", "TEX_IMG_RES"]

MAX_DEPTH = bin_format.PATH_DEPTH  # 6 vertices: camera hit + 5 bounces

SAMPLE_FEATURE_IDX = {n: i for i, n in
                      enumerate(bin_format.SAMPLE_FEATURE_LABELS)}
PIXEL_DEPTH_IDX = bin_format.PIXEL_CHANNEL_LABELS.index("depth")

# Bounce-type bitmask (reference: BxDF flags recorded per vertex).
BT_REFLECTION = 1
BT_TRANSMISSION = 1 << 1
BT_DIFFUSE = 1 << 2
BT_GLOSSY = 1 << 3
BT_SPECULAR = 1 << 4

# Material classes (the reference's 7 scene-generator materials collapse
# onto these scattering models: matte/uber -> diffuse, mirror -> mirror,
# glass -> glass, metal -> metal, plastic/substrate -> plastic).
#: Static count of procedural-envmap lobes (padded; zero color = off).
N_ENV_LOBES = 4

MAT_DIFFUSE = 0
MAT_MIRROR = 1
MAT_GLASS = 2
MAT_METAL = 3
MAT_PLASTIC = 4

# Procedural albedo textures (the role of the reference's Imagemap /
# Checkerboard textures, sbmc/scene_generator/textures.py:30-139 and
# randomizers.py random_texture — 99% of reference materials are
# textured). Active when ``tex_scale > 0``.
TEX_CHECKER3D = 0
TEX_NOISE = 1      # 2-octave hash-lattice value noise (image-map role)
TEX_STRIPES = 2

#: Per-scene image-texture slots (static count: a jit cache key). Scenes
#: with fewer images pad with zeros; slots are referenced by
#: ``tex_image_id`` (-1 = procedural/flat only).
N_TEX_IMAGES = 4
#: Side of every image texture (square, wrap-addressed). Overridable via
#: SBMC_TEX_RES: the 64 default is a VPU-cost trade from the pre-MXU
#: tracer; corpus-fidelity headroom (vs the reference's full-res Imagemap
#: corpus, sbmc/scene_generator/randomizers.py:27-93) is a datagen
#: s/scene measurement away (see scripts/run_round5 queue notes).
TEX_IMG_RES = int(_os.environ.get("SBMC_TEX_RES", "64"))

#: Wall-clock seconds of the last tile's device render + fetch (set by
#: :func:`render_tile_wavefront`; lets the datagen loop split device time
#: from host assembly + LZ4 write when profiling s/scene).
LAST_DEVICE_S = 0.0

#: Share of plastic samples that pick the diffuse base lobe (vs the coat).
_PLASTIC_DIFFUSE_P = 0.7


@dataclasses.dataclass
class TracerScene:
    """Flat-array scene for the wavefront tracer.

    Primitive arrays (``albedos``, ``roughness``, ``motion``, ``mat_type``,
    ``tex_scale``) cover spheres first, then boxes, then capped y-axis
    cylinders, then triangle meshes: length ``n_spheres + n_boxes +
    n_cylinders + n_meshes`` (the reference scene generator's
    Sphere/Cylinder/Plane/TriangleMesh primitive set,
    sbmc/scene_generator/geometry.py:26-188). Meshes are a flat triangle
    soup (``tri_v0/e1/e2``) whose ``tri_prim`` column maps every triangle
    to its mesh's primitive slot for materials/motion — the wavefront
    analog of the reference's per-material OBJ splits
    (sbmc/scene_generator/converters.py:44-224).
    """
    centers: np.ndarray      # [s, 3] sphere centers
    radii: np.ndarray        # [s]
    albedos: np.ndarray      # [p, 3]
    mirror: np.ndarray       # [s] legacy flag; folded into mat_type
    roughness: np.ndarray    # [p] in (0, 1]: glossy lobe width (1 = diffuse)
    motion: np.ndarray       # [p, 3] linear velocity over the shutter
    ground_albedo: np.ndarray  # [3]
    light_pos: np.ndarray    # [3]
    light_radius: float
    light_emission: np.ndarray  # [3]
    sky: np.ndarray          # [3] horizon sky radiance
    fov: float               # degrees
    aperture: float
    focus_distance: float
    cam_pos: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([0.0, 1.2, 0.0]))
    scene_radius: float = 12.0
    # --- extended scene surface (defaults reproduce the v1 tracer) -------
    mat_type: Optional[np.ndarray] = None  # [p] MAT_*; derived if None
    tex_scale: Optional[np.ndarray] = None  # [p] texture freq; 0 = none
    #: [p] texture kind per primitive (TEX_*); defaults to 3D checker for
    #: every primitive with ``tex_scale > 0`` (the v1/v2 behavior). The
    #: procedural kinds play the role of the reference's Imagemap /
    #: Checkerboard textures (sbmc/scene_generator/textures.py:30-139).
    tex_kind: Optional[np.ndarray] = None
    ground_tex_kind: int = TEX_CHECKER3D
    ground_tex_scale: float = 1.0
    box_centers: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros((0, 3)))
    box_half: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros((0, 3)))
    cyl_centers: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros((0, 3)))
    cyl_radius: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros((0,)))
    cyl_half: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros((0,)))
    tri_v0: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros((0, 3)))
    tri_e1: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros((0, 3)))
    tri_e2: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros((0, 3)))
    tri_prim: np.ndarray = dataclasses.field(  # [T] primitive slot per tri
        default_factory=lambda: np.zeros((0,), np.int32))
    n_meshes: int = 0
    sky_zenith: Optional[np.ndarray] = None  # defaults to ``sky`` (constant)
    sun_dir: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([0.0, 1.0, 0.0]))
    sun_color: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3))
    sun_exp: float = 200.0
    glass_ior: float = 1.5
    #: Procedural environment lobes: up to ``N_ENV_LOBES`` cosine-power
    #: blobs added to the gradient sky — the role of the reference's random
    #: HDR envmaps (sbmc/scene_generator/randomizers.py random_envmap).
    #: Rows beyond the count are zero-color (disabled).
    env_dirs: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros((0, 3)))
    env_colors: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros((0, 3)))
    env_exps: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros((0,)))
    #: Image textures loaded from disk (the reference's Imagemap /
    #: random texture files, sbmc/scene_generator/textures.py:30-139,
    #: randomizers.py:27-93): [n <= N_TEX_IMAGES, TEX_IMG_RES,
    #: TEX_IMG_RES, 3] linear RGB in [0, 1]; padded to N_TEX_IMAGES
    #: slots on device. ``None`` ships a 0-slot array (separate jit
    #: variant with zero gather cost).
    tex_images: Optional[np.ndarray] = None
    tex_image_id: Optional[np.ndarray] = None  # [p] int32; -1 = none
    ground_tex_image_id: int = -1
    #: Equirectangular HDR environment image [EH, EW, 3] (the reference's
    #: random HDR envmaps, randomizers.py random_envmap); added to the
    #: gradient sky when present.
    env_image: Optional[np.ndarray] = None
    env_image_scale: float = 1.0

    def _n_prims(self):
        return (self.centers.shape[0] + self.box_centers.shape[0]
                + self.cyl_centers.shape[0] + self.n_meshes)

    def as_jax(self):
        p = self._n_prims()
        s = self.centers.shape[0]
        mat = self.mat_type
        if mat is None:
            # Legacy derivation from the v1 (mirror, roughness) encoding.
            mat = np.where(np.asarray(self.mirror) > 0.5, MAT_MIRROR,
                           np.where(np.asarray(self.roughness)[:s] < 0.999,
                                    MAT_METAL, MAT_DIFFUSE))
        mat = np.asarray(mat)
        if mat.shape[0] < p:
            mat = np.concatenate([mat, np.zeros(p - mat.shape[0], mat.dtype)])

        def fit(x, shape, fill=0.0):
            x = np.asarray(x, np.float32)
            if x.shape[0] < shape[0]:
                pad = np.full((shape[0] - x.shape[0],) + x.shape[1:], fill,
                              np.float32)
                x = np.concatenate([x, pad])
            return x

        tex = (np.zeros(p) if self.tex_scale is None
               else fit(self.tex_scale, (p,)))
        kind = (np.full(p, TEX_CHECKER3D, np.int32) if self.tex_kind is None
                else np.asarray(fit(self.tex_kind, (p,)), np.int32))
        zen = self.sky if self.sky_zenith is None else self.sky_zenith
        # Environment lobes padded to a static count (jit cache key).
        ed = np.asarray(self.env_dirs, np.float32).reshape(-1, 3)
        ec = np.asarray(self.env_colors, np.float32).reshape(-1, 3)
        ee = np.asarray(self.env_exps, np.float32).reshape(-1)
        ed, ec, ee = ed[:N_ENV_LOBES], ec[:N_ENV_LOBES], ee[:N_ENV_LOBES]
        ed = ed / np.maximum(np.linalg.norm(ed, axis=1, keepdims=True), 1e-8)
        m = ed.shape[0]
        if m < N_ENV_LOBES:
            ed = np.concatenate([ed, np.zeros((N_ENV_LOBES - m, 3),
                                              np.float32)])
            ec = np.concatenate([ec, np.zeros((N_ENV_LOBES - m, 3),
                                              np.float32)])
            ee = np.concatenate([ee, np.ones(N_ENV_LOBES - m, np.float32)])
        # Image textures: pad to the static N_TEX_IMAGES slot count (one
        # jit variant for any textured scene, a separate zero-slot
        # variant when the pool is off).
        if self.tex_images is not None and len(self.tex_images):
            ti = np.asarray(self.tex_images, np.float32)
            if ti.shape[1:] != (TEX_IMG_RES, TEX_IMG_RES, 3):
                raise ValueError("tex_images must be [n, %d, %d, 3], got %s"
                                 % (TEX_IMG_RES, TEX_IMG_RES, ti.shape))
            ti = ti[:N_TEX_IMAGES]
            if ti.shape[0] < N_TEX_IMAGES:
                ti = np.concatenate([ti, np.zeros(
                    (N_TEX_IMAGES - ti.shape[0],) + ti.shape[1:],
                    np.float32)])
        else:
            ti = np.zeros((0, TEX_IMG_RES, TEX_IMG_RES, 3), np.float32)
        tid = (np.full(p, -1, np.int32) if self.tex_image_id is None
               else np.asarray(fit(self.tex_image_id, (p,), -1), np.int32))
        ei = (np.zeros((0, 0, 3), np.float32) if self.env_image is None
              else np.asarray(self.env_image, np.float32))
        # Column -> primitive-slot map for the concatenated hit candidates
        # (spheres, boxes, cylinders are their own slot; each triangle maps
        # to its mesh's slot).
        base = (self.centers.shape[0] + self.box_centers.shape[0]
                + self.cyl_centers.shape[0])
        col_slot = np.concatenate([
            np.arange(base, dtype=np.int32),
            np.asarray(self.tri_prim, np.int32).reshape(-1)])
        return {
            "centers": jnp.asarray(self.centers, jnp.float32).reshape(-1, 3),
            "radii": jnp.asarray(self.radii, jnp.float32),
            "box_centers": jnp.asarray(self.box_centers,
                                       jnp.float32).reshape(-1, 3),
            "box_half": jnp.asarray(self.box_half,
                                    jnp.float32).reshape(-1, 3),
            "cyl_centers": jnp.asarray(self.cyl_centers,
                                       jnp.float32).reshape(-1, 3),
            "cyl_radius": jnp.asarray(self.cyl_radius,
                                      jnp.float32).reshape(-1),
            "cyl_half": jnp.asarray(self.cyl_half,
                                    jnp.float32).reshape(-1),
            "tri_v0": jnp.asarray(self.tri_v0, jnp.float32).reshape(-1, 3),
            "tri_e1": jnp.asarray(self.tri_e1, jnp.float32).reshape(-1, 3),
            "tri_e2": jnp.asarray(self.tri_e2, jnp.float32).reshape(-1, 3),
            "tri_prim": jnp.asarray(self.tri_prim, jnp.int32).reshape(-1),
            "col_slot": jnp.asarray(col_slot, jnp.int32),
            "albedos": jnp.asarray(fit(self.albedos, (p, 3), 0.5)),
            "roughness": jnp.asarray(fit(self.roughness, (p,), 1.0)),
            "motion": jnp.asarray(fit(self.motion, (p, 3))),
            "mat_type": jnp.asarray(mat, jnp.int32),
            "tex_scale": jnp.asarray(tex, jnp.float32),
            "tex_kind": jnp.asarray(kind, jnp.int32),
            "ground_tex_kind": jnp.int32(self.ground_tex_kind),
            "ground_tex_scale": jnp.float32(self.ground_tex_scale),
            "tex_images": jnp.asarray(ti, jnp.float32),
            "tex_image_id": jnp.asarray(tid, jnp.int32),
            "ground_tex_image_id": jnp.int32(self.ground_tex_image_id),
            "env_image": jnp.asarray(ei, jnp.float32),
            "env_image_scale": jnp.float32(self.env_image_scale),
            "ground_albedo": jnp.asarray(self.ground_albedo, jnp.float32),
            "light_pos": jnp.asarray(self.light_pos, jnp.float32),
            "light_radius": jnp.float32(self.light_radius),
            "light_emission": jnp.asarray(self.light_emission, jnp.float32),
            "sky": jnp.asarray(self.sky, jnp.float32),
            "sky_zenith": jnp.asarray(zen, jnp.float32),
            "sun_dir": jnp.asarray(self.sun_dir, jnp.float32),
            "sun_color": jnp.asarray(self.sun_color, jnp.float32),
            "sun_exp": jnp.float32(self.sun_exp),
            "env_dirs": jnp.asarray(ed, jnp.float32),
            "env_colors": jnp.asarray(ec, jnp.float32),
            "env_exps": jnp.asarray(ee, jnp.float32),
            "glass_ior": jnp.float32(self.glass_ior),
            "fov": jnp.float32(self.fov),
            "aperture": jnp.float32(self.aperture),
            "focus_distance": jnp.float32(self.focus_distance),
            "cam_pos": jnp.asarray(self.cam_pos, jnp.float32),
            "scene_radius": jnp.float32(self.scene_radius),
        }


#: Platonic-solid templates for random prop meshes (vertices, faces).
_MESH_TEMPLATES = None


def _mesh_templates():
    global _MESH_TEMPLATES
    if _MESH_TEMPLATES is None:
        tet_v = np.array([[1, 1, 1], [1, -1, -1], [-1, 1, -1], [-1, -1, 1]],
                         np.float64) / np.sqrt(3)
        tet_f = np.array([[0, 1, 2], [0, 3, 1], [0, 2, 3], [1, 3, 2]])
        oct_v = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                          [0, 0, 1], [0, 0, -1]], np.float64)
        oct_f = np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                          [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]])
        g = (1 + np.sqrt(5)) / 2
        ico_v = np.array([[-1, g, 0], [1, g, 0], [-1, -g, 0], [1, -g, 0],
                          [0, -1, g], [0, 1, g], [0, -1, -g], [0, 1, -g],
                          [g, 0, -1], [g, 0, 1], [-g, 0, -1], [-g, 0, 1]],
                         np.float64)
        ico_v /= np.linalg.norm(ico_v[0])
        ico_f = np.array([[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10],
                          [0, 10, 11], [1, 5, 9], [5, 11, 4], [11, 10, 2],
                          [10, 7, 6], [7, 1, 8], [3, 9, 4], [3, 4, 2],
                          [3, 2, 6], [3, 6, 8], [3, 8, 9], [4, 9, 5],
                          [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]])
        _MESH_TEMPLATES = [(tet_v, tet_f), (oct_v, oct_f), (ico_v, ico_f)]
    return _MESH_TEMPLATES


def _random_mesh(rng):
    """A jittered, rotated, scaled platonic solid resting above the ground
    (the wavefront stand-in for the reference's random OBJ props,
    sbmc/scene_generator/generators.py random model placement)."""
    verts, faces = _mesh_templates()[rng.randint(3)]
    verts = verts.copy() * rng.uniform(0.4, 1.1)
    verts += rng.normal(0, 0.08, verts.shape)      # break the symmetry
    # Random rotation from a QR decomposition.
    q, r = np.linalg.qr(rng.normal(size=(3, 3)))
    q *= np.sign(np.diag(r))
    verts = verts @ q.T
    center = np.array([rng.uniform(-3.5, 3.5),
                       0.0,
                       rng.uniform(3.0, 9.0)])
    verts += center
    verts[:, 1] += 0.05 - verts[:, 1].min()        # rest on the ground
    return verts, faces


def _place_mesh(rng, verts):
    """Scale / rotate / drop a normalized mesh onto the ground plane (the
    shared placement law for procedural and .obj props)."""
    verts = verts.copy() * rng.uniform(0.4, 1.1)
    q, r = np.linalg.qr(rng.normal(size=(3, 3)))
    q *= np.sign(np.diag(r))
    verts = verts @ q.T
    verts += np.array([rng.uniform(-3.5, 3.5), 0.0,
                       rng.uniform(3.0, 9.0)])
    verts[:, 1] += 0.05 - verts[:, 1].min()
    return verts


def random_tracer_scene(rng, n_spheres=6, n_boxes=3, n_cyls=2, n_meshes=2,
                        obj_pool=None, obj_prob=0.6, tri_bucket=64,
                        tex_pool=None, img_prob=0.5, env_pool=None,
                        env_img_prob=0.4):
    """Sample a random scene with the reference's material-mixture spirit
    (sbmc/scene_generator/randomizers.py:194-227: 5% mirror, 5% glass,
    10% metal, 20% plastic, 10% substrate, 30% uber, 20% diffuse — the
    pbrt-only classes collapse onto our five scattering models).

    ``obj_pool`` (a :class:`sbmc_tpu.render.assets.ObjPool`) substitutes
    ingested .obj geometry for the procedural platonic solids with
    probability ``obj_prob`` per mesh slot (the reference's random model
    placement, sbmc/scene_generator/generators.py). Triangle arrays are
    padded with degenerate (never-hit) triangles to the next power-of-two
    rung at least ``tri_bucket`` so scenes with different meshes share XLA
    compilations (<= 5 distinct shapes per corpus).

    ``tex_pool`` (:class:`sbmc_tpu.render.assets.TexturePool`) draws up to
    ``N_TEX_IMAGES`` image textures per scene and assigns them to textured
    slots (and the ground) with probability ``img_prob`` — the reference's
    randomized Imagemap materials (randomizers.py:27-93, 99% of materials
    textured). ``env_pool`` (:class:`EnvmapPool`) substitutes an equirect
    HDR image for the procedural envmap lobes with probability
    ``env_img_prob`` (randomizers.py random_envmap).
    """
    p = n_spheres + n_boxes + n_cyls + n_meshes
    mat = rng.choice(
        [MAT_DIFFUSE, MAT_MIRROR, MAT_GLASS, MAT_METAL, MAT_PLASTIC],
        size=p, p=[0.50, 0.05, 0.05, 0.10, 0.30])
    do_motion = rng.rand(p) < 0.25
    sunny = rng.rand() < 0.5
    sun = rng.normal(size=3)
    sun[1] = abs(sun[1]) + 0.3
    sun /= np.linalg.norm(sun)
    # Procedural envmap: 1..N_ENV_LOBES colored blobs 60% of the time
    # (reference: random envmap textures, scene_generator/randomizers.py).
    n_lobes = rng.randint(1, N_ENV_LOBES + 1)
    env_on = rng.rand() < 0.6
    env_dirs = rng.normal(size=(n_lobes, 3))
    env_dirs[:, 1] = np.abs(env_dirs[:, 1]) + 0.1
    env_colors = rng.uniform(0.2, 2.5, (n_lobes, 3)) * env_on
    env_exps = np.exp(rng.uniform(np.log(2.0), np.log(64.0), n_lobes))
    env_image = None
    env_image_scale = 1.0
    if env_pool is not None:
        if rng.rand() < env_img_prob:
            env_image = env_pool.sample(rng)
            env_image_scale = float(np.exp(rng.uniform(np.log(0.3),
                                                       np.log(2.0))))
            env_colors = env_colors * 0.0  # the image replaces the lobes
        else:
            # Keep the traced shape identical to the image-envmap case
            # (a zero image at scale 0 contributes exactly nothing):
            # with an env pool in play, image-vs-lobes otherwise doubles
            # the XLA executable count across a datagen corpus.
            env_image = np.zeros(env_pool.res + (3,), np.float32)
            env_image_scale = 0.0

    tex_images = None
    tex_image_id = None
    ground_tex_image_id = -1
    if tex_pool is not None:
        n_img = int(rng.randint(1, N_TEX_IMAGES + 1))
        tex_images = np.stack([tex_pool.sample(rng) for _ in range(n_img)])
        tex_image_id = np.where(
            rng.rand(p) < img_prob, rng.randint(0, n_img, p),
            -1).astype(np.int32)
        if rng.rand() < img_prob:
            ground_tex_image_id = int(rng.randint(0, n_img))

    centers = np.stack([rng.uniform(-3, 3, n_spheres),
                        rng.uniform(0.4, 2.5, n_spheres),
                        rng.uniform(3.0, 9.0, n_spheres)], 1)
    radii = rng.uniform(0.3, 1.0, n_spheres)
    box_half = np.stack([rng.uniform(0.25, 0.9, n_boxes),
                         rng.uniform(0.25, 1.2, n_boxes),
                         rng.uniform(0.25, 0.9, n_boxes)], 1)
    box_centers = np.stack([rng.uniform(-3.5, 3.5, n_boxes),
                            box_half[:, 1] * (1 + 1.5 * rng.rand(n_boxes)),
                            rng.uniform(3.0, 9.0, n_boxes)], 1)
    cyl_radius = rng.uniform(0.2, 0.7, n_cyls)
    cyl_half = rng.uniform(0.3, 1.3, n_cyls)
    cyl_centers = np.stack([rng.uniform(-3.5, 3.5, n_cyls),
                            cyl_half * (1 + 1.5 * rng.rand(n_cyls)),
                            rng.uniform(3.0, 9.0, n_cyls)], 1)

    tri_v0, tri_e1, tri_e2, tri_prim = [], [], [], []
    mesh_verts = []
    base = n_spheres + n_boxes + n_cyls
    for mi in range(n_meshes):
        if obj_pool is not None and rng.rand() < obj_prob:
            nverts, faces = obj_pool.sample(rng)
            verts = _place_mesh(rng, nverts)
        else:
            verts, faces = _random_mesh(rng)
        mesh_verts.append(verts)
        v0 = verts[faces[:, 0]]
        tri_v0.append(v0)
        tri_e1.append(verts[faces[:, 1]] - v0)
        tri_e2.append(verts[faces[:, 2]] - v0)
        tri_prim.append(np.full(len(faces), base + mi, np.int32))
    cat = lambda xs, d: (np.concatenate(xs)  # noqa: E731
                         if xs else np.zeros((0,) + d, np.float32))
    tri_v0 = cat(tri_v0, (3,))
    tri_e1 = cat(tri_e1, (3,))
    tri_e2 = cat(tri_e2, (3,))
    tri_prim = (np.concatenate(tri_prim) if tri_prim
                else np.zeros((0,), np.int32))
    if tri_bucket and len(tri_v0):
        # Pad to a power-of-two rung (at least ``tri_bucket``) with
        # zero-area triangles (det == 0 in _tri_ts -> never hit). A
        # fixed-multiple bucket still produced ~17 distinct triangle
        # counts across a mixed obj/procedural corpus, and the resulting
        # executable zoo made XLA compilation 40-55% of datagen wall
        # clock (round-4 overnight logs); pow2 rungs collapse that to
        # <= 5 shapes at a mean ~1.3x padding cost on the (MXU-batched)
        # triangle intersection only.
        target = max(tri_bucket, 1 << int(np.ceil(np.log2(len(tri_v0)))))
        pad = target - len(tri_v0)
        if pad:
            zeros3 = np.zeros((pad, 3), np.float32)
            tri_v0 = np.concatenate([tri_v0, zeros3])
            tri_e1 = np.concatenate([tri_e1, zeros3])
            tri_e2 = np.concatenate([tri_e2, zeros3])
            tri_prim = np.concatenate(
                [tri_prim, np.full(pad, base, np.int32)])

    # Scene radius: the reference PBRT computes it from the world bound;
    # use the camera-to-farthest-surface distance (plus light) here.
    cam = np.array([rng.uniform(-1, 1), rng.uniform(0.8, 2.2),
                    rng.uniform(-1, 1)])
    light_pos = np.array([rng.uniform(-4, 4), rng.uniform(4, 8),
                          rng.uniform(0, 6)])
    ext = max(
        float(np.max(np.linalg.norm(centers - cam, axis=1) + radii)),
        float(np.max(np.linalg.norm(box_centers - cam, axis=1)
                     + np.linalg.norm(box_half, axis=1))),
        float(np.max(np.linalg.norm(cyl_centers - cam, axis=1)
                     + np.hypot(cyl_radius, cyl_half))) if n_cyls else 0.0,
        max((float(np.max(np.linalg.norm(v - cam, axis=1)))
             for v in mesh_verts), default=0.0),
        float(np.linalg.norm(light_pos - cam)))

    return TracerScene(
        centers=centers,
        radii=radii,
        albedos=rng.uniform(0.1, 0.9, (p, 3)),
        mirror=(mat[:n_spheres] == MAT_MIRROR).astype(np.float32),
        roughness=np.where(
            np.isin(mat, [MAT_METAL, MAT_PLASTIC]),
            rng.uniform(0.05, 0.4, p), 1.0),
        motion=rng.normal(0, 0.15, (p, 3)) * do_motion[:, None],
        mat_type=mat,
        # 70% textured (the reference leaves only 1% untextured, but its
        # image maps are often low-contrast; keep some flat albedos).
        tex_scale=np.where(rng.rand(p) < 0.7, rng.uniform(0.5, 3.0, p), 0.0),
        tex_kind=rng.choice([TEX_CHECKER3D, TEX_NOISE, TEX_STRIPES],
                            size=p, p=[0.4, 0.35, 0.25]),
        ground_tex_kind=int(rng.choice(
            [TEX_CHECKER3D, TEX_NOISE, TEX_STRIPES], p=[0.5, 0.3, 0.2])),
        ground_tex_scale=float(rng.uniform(0.3, 2.0)),
        box_centers=box_centers,
        box_half=box_half,
        cyl_centers=cyl_centers,
        cyl_radius=cyl_radius,
        cyl_half=cyl_half,
        tri_v0=tri_v0,
        tri_e1=tri_e1,
        tri_e2=tri_e2,
        tri_prim=tri_prim,
        n_meshes=n_meshes,
        ground_albedo=rng.uniform(0.2, 0.8, 3),
        light_pos=light_pos,
        light_radius=float(rng.uniform(0.2, 0.8)),
        light_emission=rng.uniform(30, 120, 3),
        sky=rng.uniform(0.05, 0.35, 3),
        sky_zenith=rng.uniform(0.05, 0.6, 3),
        sun_dir=sun,
        sun_color=rng.uniform(3, 30, 3) * sunny,
        sun_exp=float(rng.uniform(50, 500)),
        env_dirs=env_dirs,
        env_colors=env_colors,
        env_exps=env_exps,
        tex_images=tex_images,
        tex_image_id=tex_image_id,
        ground_tex_image_id=ground_tex_image_id,
        env_image=env_image,
        env_image_scale=env_image_scale,
        fov=float(rng.uniform(25, 60)),
        aperture=(float(np.exp(rng.uniform(np.log(1e-3), np.log(0.05))))
                  if rng.rand() < 0.5 else 0.0),
        focus_distance=float(rng.uniform(3, 8)),
        cam_pos=cam,
        scene_radius=float(max(ext * 1.1, 4.0)),
    )


#: Rays are truncated at this multiple of the scene radius: grazing hits on
#: the infinite ground plane otherwise record unbounded depth features,
#: which destabilize training (the reference's PBRT scenes are bounded, so
#: its depth normalization implicitly assumes this).
MAX_RAY_FACTOR = 4.0

_INF = jnp.float32(1e10)


def _sphere_ts(scn, org, dirs, t):
    """Sphere hit distances [N, S] (entry root, or exit root when inside)
    and the inside flags."""
    c = scn["centers"][None] + t[:, None, None] * scn["motion"][None, :len(
        scn["radii"])]
    oc = org[:, None, :] - c                       # [N, S, 3]
    b = jnp.sum(oc * dirs[:, None, :], -1)         # [N, S]
    cc = jnp.sum(oc * oc, -1) - scn["radii"][None] ** 2
    disc = b * b - cc
    root = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_near, t_far = -b - root, -b + root
    inside = (disc > 0) & (t_near <= 1e-3) & (t_far > 1e-3)
    ts = jnp.where(disc > 0,
                   jnp.where(t_near > 1e-3, t_near,
                             jnp.where(inside, t_far, _INF)), _INF)
    return ts, inside, c


def _box_ts(scn, org, dirs, t):
    """Axis-aligned box hit distances [N, B] and inside flags."""
    nb = scn["box_centers"].shape[0]
    ns = scn["radii"].shape[0]
    cb = (scn["box_centers"][None]
          + t[:, None, None] * scn["motion"][None, ns:ns + nb])
    inv = jnp.where(jnp.abs(dirs) > 1e-9, 1.0 / dirs,
                    jnp.where(dirs >= 0, 1e9, -1e9))  # signed big number
    o = org[:, None, :] - cb                          # [N, B, 3]
    t1 = (-scn["box_half"][None] - o) * inv[:, None, :]
    t2 = (scn["box_half"][None] - o) * inv[:, None, :]
    tn = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tf = jnp.min(jnp.maximum(t1, t2), axis=-1)
    valid = (tf > jnp.maximum(tn, 1e-3)) & (tf > 1e-3)
    inside = valid & (tn <= 1e-3)
    ts = jnp.where(valid, jnp.where(inside, tf, tn), _INF)
    return ts, inside, cb


def _cyl_ts(scn, org, dirs, t):
    """Capped y-axis cylinder hit distances [N, C] and inside flags.

    Side hits solve the (x, z) quadratic clipped to ``|y - cy| <= half``;
    cap hits intersect the y = cy +- half discs. Nearest valid wins
    (reference primitive: sbmc/scene_generator/geometry.py Cylinder)."""
    ns = scn["radii"].shape[0]
    nb = scn["box_centers"].shape[0]
    nc = scn["cyl_radius"].shape[0]
    cc = (scn["cyl_centers"][None]
          + t[:, None, None] * scn["motion"][None, ns + nb:ns + nb + nc])
    o = org[:, None, :] - cc                       # [N, C, 3]
    dx, dy, dz = dirs[:, 0:1], dirs[:, 1:2], dirs[:, 2:3]  # [N, 1]
    a = dx * dx + dz * dz                          # [N, 1]
    b = o[..., 0] * dx + o[..., 2] * dz            # [N, C]
    r2 = scn["cyl_radius"][None] ** 2
    c_ = o[..., 0] ** 2 + o[..., 2] ** 2 - r2
    disc = b * b - a * c_
    root = jnp.sqrt(jnp.maximum(disc, 0.0))
    sa = jnp.maximum(a, 1e-12)
    half = scn["cyl_half"][None]

    def side_ok(ts):
        y = o[..., 1] + ts * dy
        return (disc > 0) & (ts > 1e-3) & (jnp.abs(y) <= half)

    def cap_ok(ts):
        x = o[..., 0] + ts * dx
        z = o[..., 2] + ts * dz
        return (ts > 1e-3) & (x * x + z * z <= r2)

    t1, t2 = (-b - root) / sa, (-b + root) / sa
    inv_dy = jnp.where(jnp.abs(dy) > 1e-9, 1.0 / dy,
                       jnp.where(dy >= 0, 1e12, -1e12))
    tc1 = (half - o[..., 1]) * inv_dy
    tc2 = (-half - o[..., 1]) * inv_dy
    cand = jnp.stack([jnp.where(side_ok(t1), t1, _INF),
                      jnp.where(side_ok(t2), t2, _INF),
                      jnp.where(cap_ok(tc1), tc1, _INF),
                      jnp.where(cap_ok(tc2), tc2, _INF)], 0)
    ts = jnp.min(cand, 0)
    inside = (c_ < 0) & (jnp.abs(o[..., 1]) < half) & (ts < _INF)
    return ts, inside, cc


def _tri_ts(scn, org, dirs, t):
    """Triangle hit distances [N, T] via a plane + dual-basis barycentric
    formulation that rides the MXU.

    Moeller-Trumbore materializes several [N, T, 3] intermediates (the
    per-pair cross products) — pure VPU work streaming ~100s of MB through
    HBM per bounce, which dominated datagen pass time. Algebraically the
    same test needs only six ray/constant dot products: with per-triangle
    constants n = e1 x e2 (the unnormalized MT determinant scale) and the
    dual basis g1 = (e2 x n)/|n|^2, g2 = (n x e1)/|n|^2,

        t_hit = (n.v0 + t_time (n.m) - n.o) / (n.d)
        u     = w.g1,  v = w.g2,   w = o + t_hit d - v0 - t_time m

    so the whole [N, T] product reduces to two [N, 3] @ [3, 3T] matmuls
    (MXU) plus O(NT) elementwise epilogue. The per-triangle constant math
    is O(T) and loop-invariant (XLA hoists it out of the pass scan).
    Meshes here are small props, so no BVH."""
    e1, e2, v0 = scn["tri_e1"], scn["tri_e2"], scn["tri_v0"]  # [T, 3]
    n = jnp.cross(e1, e2)                                     # [T, 3]
    nn = jnp.sum(n * n, -1, keepdims=True)
    inv_nn = jnp.where(nn > 1e-18, 1.0 / jnp.maximum(nn, 1e-18), 0.0)
    g1 = jnp.cross(e2, n) * inv_nn
    g2 = jnp.cross(n, e1) * inv_nn
    m = scn["motion"][scn["tri_prim"]]                        # [T, 3]
    K = jnp.concatenate([n, g1, g2], 0)                       # [3T, 3]
    dims = (((1,), (1,)), ((), ()))
    hi = jax.lax.Precision.HIGHEST  # geometry needs true f32 matmuls
    ok_ = jax.lax.dot_general(org, K, dims, precision=hi)     # [N, 3T]
    dk_ = jax.lax.dot_general(dirs, K, dims, precision=hi)
    nt = n.shape[0]
    o_n, o_g1, o_g2 = ok_[:, :nt], ok_[:, nt:2 * nt], ok_[:, 2 * nt:]
    d_n, d_g1, d_g2 = dk_[:, :nt], dk_[:, nt:2 * nt], dk_[:, 2 * nt:]
    cn = jnp.sum(n * v0, -1)                                  # [T]
    c1 = jnp.sum(g1 * v0, -1)
    c2 = jnp.sum(g2 * v0, -1)
    mn = jnp.sum(n * m, -1)
    m1 = jnp.sum(g1 * m, -1)
    m2 = jnp.sum(g2 * m, -1)
    tt = t[:, None]                                           # [N, 1]
    den = d_n  # == -MT determinant, so thresholds match the MT test
    valid = jnp.abs(den) > 1e-9
    ts = ((cn[None] + tt * mn[None] - o_n)
          / jnp.where(valid, den, 1.0))
    u = o_g1 - c1[None] - tt * m1[None] + ts * d_g1
    v = o_g2 - c2[None] - tt * m2[None] + ts * d_g2
    ok = valid & (u >= 0) & (v >= 0) & (u + v <= 1) & (ts > 1e-3)
    ts = jnp.where(ok, ts, _INF)
    # Backface hit (ray along the outward normal under outward winding)
    # = the ray is inside the closed mesh; drives the glass eta flip.
    return ts, ok & (den > 0)


def _intersect(scn, org, dirs, t):
    """Nearest-hit for ray bundles [N, 3]. Returns hit dict."""
    t_max = scn["scene_radius"] * MAX_RAY_FACTOR
    ns = scn["radii"].shape[0]
    nb = scn["box_centers"].shape[0]
    nc = scn["cyl_radius"].shape[0]

    # Ground plane y = 0 (treated as environment beyond t_max).
    dy = dirs[:, 1]
    tg = jnp.where(jnp.abs(dy) > 1e-8, -org[:, 1] / dy, _INF)
    tg = jnp.where((tg > 1e-3) & (tg < t_max), tg, _INF)

    nt = scn["tri_v0"].shape[0]
    ts_s, in_s, c_s = _sphere_ts(scn, org, dirs, t)
    ts_all, inside_all = [ts_s], [in_s]
    if nb > 0:
        ts_b, in_b, c_b = _box_ts(scn, org, dirs, t)
        ts_all.append(ts_b)
        inside_all.append(in_b)
    if nc > 0:
        ts_c, in_c, c_c = _cyl_ts(scn, org, dirs, t)
        ts_all.append(ts_c)
        inside_all.append(in_c)
    if nt > 0:
        ts_t, in_t = _tri_ts(scn, org, dirs, t)
        ts_all.append(ts_t)
        inside_all.append(in_t)
    ts_all = jnp.concatenate(ts_all, 1)             # [N, S+B+C+T]
    inside_all = jnp.concatenate(inside_all, 1)

    p_idx = jnp.argmin(ts_all, axis=1)                  # [N]
    p_t = jnp.take_along_axis(ts_all, p_idx[:, None], 1)[:, 0]
    p_inside = jnp.take_along_axis(inside_all, p_idx[:, None], 1)[:, 0]

    hit_prim = p_t < tg
    best_t = jnp.where(hit_prim, p_t, tg)
    hit = best_t < _INF
    # id: -1 = miss, -2 = ground, >= 0 = primitive
    hid = jnp.where(hit, jnp.where(hit_prim, p_idx, -2), -1)

    p = org + best_t[:, None] * dirs

    # Sphere outward normal.
    s_idx = jnp.clip(p_idx, 0, ns - 1)
    sc = jnp.take_along_axis(c_s, s_idx[:, None, None].repeat(3, -1),
                             1)[:, 0]
    n_sphere = (p - sc) / jnp.maximum(scn["radii"][s_idx][:, None], 1e-8)
    n_prim = n_sphere
    if nb > 0:
        # Box outward normal: dominant axis of the local coordinates.
        b_idx = jnp.clip(p_idx - ns, 0, nb - 1)
        bc = jnp.take_along_axis(c_b, b_idx[:, None, None].repeat(3, -1),
                                 1)[:, 0]
        q = (p - bc) / jnp.maximum(scn["box_half"][b_idx], 1e-8)
        ax = jnp.argmax(jnp.abs(q), axis=-1)
        n_box = (jax.nn.one_hot(ax, 3, dtype=q.dtype)
                 * jnp.sign(jnp.take_along_axis(q, ax[:, None], 1)))
        n_prim = jnp.where((p_idx < ns)[:, None], n_prim, n_box)
    if nc > 0:
        # Cylinder outward normal: cap (+-y) vs side (radial), picked by
        # which normalized local coordinate sits on its surface (~1).
        cy_idx = jnp.clip(p_idx - ns - nb, 0, nc - 1)
        cyc = jnp.take_along_axis(c_c, cy_idx[:, None, None].repeat(3, -1),
                                  1)[:, 0]
        q = p - cyc
        half = jnp.maximum(scn["cyl_half"][cy_idx], 1e-8)
        rad = jnp.maximum(scn["cyl_radius"][cy_idx], 1e-8)
        u = jnp.abs(q[:, 1]) / half
        rxz = jnp.sqrt(q[:, 0] ** 2 + q[:, 2] ** 2)
        v = rxz / rad
        side = jnp.stack([q[:, 0], jnp.zeros_like(q[:, 0]), q[:, 2]],
                         -1) / jnp.maximum(rxz, 1e-8)[:, None]
        cap = jnp.stack([jnp.zeros_like(q[:, 1]), jnp.sign(q[:, 1]),
                         jnp.zeros_like(q[:, 1])], -1)
        n_cyl = jnp.where((u > v)[:, None], cap, side)
        n_prim = jnp.where((p_idx < ns + nb)[:, None], n_prim, n_cyl)
    if nt > 0:
        # Triangle geometric normal (two-sided; flipped towards the ray
        # below like every other primitive).
        t_idx = jnp.clip(p_idx - ns - nb - nc, 0, nt - 1)
        n_tri = jnp.cross(scn["tri_e1"], scn["tri_e2"])
        n_tri = n_tri / (jnp.linalg.norm(n_tri, axis=-1, keepdims=True)
                         + 1e-12)
        n_prim = jnp.where((p_idx < ns + nb + nc)[:, None], n_prim,
                           n_tri[t_idx])
    n_geo = jnp.where(hit_prim[:, None], n_prim,
                      jnp.array([0.0, 1.0, 0.0])[None])
    # Shading normal faces the incoming ray.
    normal = jnp.where(jnp.sum(n_geo * dirs, -1, keepdims=True) > 0,
                       -n_geo, n_geo)

    # Albedo: checkered ground; optional 3D-checker texture on primitives.
    # Material lookups go through the column->slot map (triangles share
    # their mesh's slot).
    slot = scn["col_slot"][p_idx]
    # The ground plane sits exactly at y=0, so hit points have
    # y ~ +-eps and floor(q_y) would flip the checker parity (and hash
    # lattice cell) per ray. Pin the y lattice coordinate to mid-cell so
    # the ground texture depends only on x/z.
    g_q = p * scn["ground_tex_scale"]
    g_q = g_q.at[:, 1].set(0.5)
    g_mod = _tex_mod(scn["ground_tex_kind"], g_q, 0.0)
    g_alb = scn["ground_albedo"][None] * g_mod[:, None]
    a_prim = scn["albedos"][slot]
    freq = scn["tex_scale"][slot]
    mod = _tex_mod(scn["tex_kind"][slot], p * freq[:, None],
                   slot.astype(jnp.float32) * 2.39996)
    a_prim = jnp.where((freq > 0)[:, None], a_prim * mod[:, None], a_prim)
    if scn["tex_images"].shape[0] > 0:
        # Image textures from disk (Imagemap role): RGB modulation of the
        # slot albedo, planar-projected along the dominant geometric-normal
        # axis (cheap, single bilinear gather; projection distortion on
        # slanted faces is acceptable scene variety for training data).
        tid = scn["tex_image_id"][slot]
        iscale = jnp.where(freq > 0, freq, 1.0)
        qi = p * iscale[:, None]
        axis = jnp.argmax(jnp.abs(n_geo), axis=1)
        u = jnp.where(axis == 0, qi[:, 1], qi[:, 0])
        v = jnp.where(axis == 2, qi[:, 1], qi[:, 2])
        rgb = _sample_image_stack(scn["tex_images"], tid, u, v)
        a_prim = jnp.where((tid >= 0)[:, None],
                           scn["albedos"][slot] * rgb, a_prim)
        gid = scn["ground_tex_image_id"]
        g_rgb = _sample_image_stack(
            scn["tex_images"],
            jnp.broadcast_to(gid, slot.shape).astype(jnp.int32),
            g_q[:, 0], g_q[:, 2])
        g_alb = jnp.where(gid >= 0,
                          scn["ground_albedo"][None] * g_rgb, g_alb)
    albedo = jnp.where(hit_prim[:, None], a_prim, g_alb)
    albedo = jnp.where(hit[:, None], albedo, 0.0)

    mat = jnp.where(hit_prim, scn["mat_type"][slot], MAT_DIFFUSE)
    mat = jnp.where(hit, mat, MAT_DIFFUSE)
    rough = jnp.where(hit_prim, scn["roughness"][slot], 1.0)
    inside = hit_prim & p_inside

    return {"hit": hit, "id": hid, "t": jnp.where(hit, best_t, 0.0),
            "p": p, "normal": normal, "albedo": albedo, "mat": mat,
            "roughness": rough, "inside": inside}


def _occluded(scn, org, dirs, dist):
    """Any primitive hit closer than dist (t=0 geometry for shadow rays)."""
    zeros = jnp.zeros(org.shape[0])
    ts_s, _, _ = _sphere_ts(scn, org, dirs, zeros)
    ok = (ts_s < dist[:, None] - 1e-3)
    if scn["box_centers"].shape[0] > 0:
        ts_b, _, _ = _box_ts(scn, org, dirs, zeros)
        ok = jnp.concatenate([ok, ts_b < dist[:, None] - 1e-3], 1)
    if scn["cyl_radius"].shape[0] > 0:
        ts_c, _, _ = _cyl_ts(scn, org, dirs, zeros)
        ok = jnp.concatenate([ok, ts_c < dist[:, None] - 1e-3], 1)
    if scn["tri_v0"].shape[0] > 0:
        ts_t, _ = _tri_ts(scn, org, dirs, zeros)
        ok = jnp.concatenate([ok, ts_t < dist[:, None] - 1e-3], 1)
    return jnp.any(ok, axis=1)


def _value_noise(q):
    """Trilinear hash-lattice value noise in [0, 1) for points [N, 3]
    (sin-dot lattice hash; cheap VPU-only texture synthesis)."""
    qf = jnp.floor(q)
    f = q - qf
    f = f * f * (3.0 - 2.0 * f)              # smoothstep fade

    def corner(dx, dy, dz):
        h = jnp.sin((qf[:, 0] + dx) * 127.1 + (qf[:, 1] + dy) * 311.7
                    + (qf[:, 2] + dz) * 74.7)
        return jnp.abs(h * 43758.5453) % 1.0

    n = jnp.zeros(q.shape[0])
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                w = ((f[:, 0] if dx else 1 - f[:, 0])
                     * (f[:, 1] if dy else 1 - f[:, 1])
                     * (f[:, 2] if dz else 1 - f[:, 2]))
                n = n + w * corner(dx, dy, dz)
    return n


def _bilinear_gather(flat_rgb, row, col, h, w, base, wrap_rows):
    """Bilinear lookup into a flattened [*, 3] image at fractional (row,
    col) pixel coords; ``base`` [N] offsets into a stacked image array.
    Columns always wrap; rows wrap or clamp (equirect poles)."""
    r0 = jnp.floor(row)
    c0 = jnp.floor(col)
    fr = (row - r0)[:, None]
    fc = (col - c0)[:, None]

    def at(ri, ci):
        ri = ri.astype(jnp.int32)
        ci = jnp.mod(ci.astype(jnp.int32), w)
        ri = jnp.mod(ri, h) if wrap_rows else jnp.clip(ri, 0, h - 1)
        return flat_rgb[base + ri * w + ci]

    return (at(r0, c0) * (1 - fr) * (1 - fc)
            + at(r0, c0 + 1) * (1 - fr) * fc
            + at(r0 + 1, c0) * fr * (1 - fc)
            + at(r0 + 1, c0 + 1) * fr * fc)


def _sample_image_stack(images, ids, u, v):
    """Wrap-addressed bilinear sample of per-ray image slots.

    ``images`` [T, S, S, 3]; ``ids`` [N] int32 (callers mask invalid ids
    themselves — they are clipped here so the gather stays in bounds);
    ``u, v`` [N] unbounded texture coords (1.0 = one tile repeat).
    """
    t, s = images.shape[0], images.shape[1]
    flat = images.reshape(-1, 3)
    base = jnp.clip(ids, 0, t - 1) * (s * s)
    row = (v % 1.0) * s - 0.5
    col = (u % 1.0) * s - 0.5
    return _bilinear_gather(flat, row, col, s, s, base, wrap_rows=True)


def _sample_equirect(img, d):
    """Equirectangular lookup for directions [N, 3] (the reference's HDR
    envmap role): u from atan2(z, x), v from acos(y); rows clamp at the
    poles, columns wrap in azimuth."""
    eh, ew = img.shape[0], img.shape[1]
    u = jnp.arctan2(d[:, 2], d[:, 0]) / (2 * jnp.pi) + 0.5
    v = jnp.arccos(jnp.clip(d[:, 1], -1.0, 1.0)) / jnp.pi
    row = v * eh - 0.5
    col = (u % 1.0) * ew - 0.5
    base = jnp.zeros(d.shape[0], jnp.int32)
    return _bilinear_gather(img.reshape(-1, 3), row, col, eh, ew, base,
                            wrap_rows=False)


def _tex_mod(kind, q, phase):
    """Albedo modulation in (0, 1] for texture ``kind`` at scaled points
    ``q`` [N, 3] (see TEX_*); ``phase`` decorrelates stripe patterns."""
    ch3 = (jnp.floor(q[:, 0]) + jnp.floor(q[:, 1])
           + jnp.floor(q[:, 2])) % 2.0
    m_checker = 0.55 + 0.45 * ch3
    m_noise = 0.4 + 0.6 * jnp.clip(
        0.65 * _value_noise(q) + 0.35 * _value_noise(q * 2.7 + 13.1),
        0.0, 1.0)
    m_stripes = 0.55 + 0.45 * jnp.sin(
        2 * jnp.pi * (q[:, 0] * 0.8 + q[:, 2] * 0.6) + phase)
    return jnp.where(kind == TEX_NOISE, m_noise,
                     jnp.where(kind == TEX_STRIPES, m_stripes, m_checker))


def _frame(normal):
    """Orthonormal (tangent, bitangent) around per-ray vectors [N, 3]."""
    up = jnp.where(jnp.abs(normal[:, 1:2]) < 0.9,
                   jnp.array([0.0, 1.0, 0.0])[None],
                   jnp.array([1.0, 0.0, 0.0])[None])
    tang = jnp.cross(up, normal)
    tang = tang / (jnp.linalg.norm(tang, axis=-1, keepdims=True) + 1e-12)
    bitan = jnp.cross(normal, tang)
    return tang, bitan


def _cosine_sample(key, normal):
    """Cosine-weighted hemisphere sample around per-ray normals [N,3]."""
    k1, k2 = jax.random.split(key)
    u1 = jax.random.uniform(k1, normal.shape[:1])
    u2 = jax.random.uniform(k2, normal.shape[:1])
    r = jnp.sqrt(u1)
    phi = 2 * jnp.pi * u2
    tang, bitan = _frame(normal)
    local = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi),
                       jnp.sqrt(jnp.maximum(1 - u1, 0.0))], -1)
    d = (local[:, 0:1] * tang + local[:, 1:2] * bitan
         + local[:, 2:3] * normal)
    pdf = jnp.maximum(local[:, 2], 1e-6) / jnp.pi
    return d, pdf


def _phong_sample(key, axis, n_exp):
    """Phong-lobe sample around per-ray axes [N, 3] with exponent [N]."""
    k1, k2 = jax.random.split(key)
    u1 = jax.random.uniform(k1, axis.shape[:1])
    u2 = jax.random.uniform(k2, axis.shape[:1])
    cos_a = u1 ** (1.0 / (n_exp + 1.0))
    sin_a = jnp.sqrt(jnp.maximum(1 - cos_a ** 2, 0.0))
    phi = 2 * jnp.pi * u2
    tang, bitan = _frame(axis)
    d = (sin_a[:, None] * jnp.cos(phi)[:, None] * tang
         + sin_a[:, None] * jnp.sin(phi)[:, None] * bitan
         + cos_a[:, None] * axis)
    return d


def _phong_pdf(d, axis, n_exp):
    cos_a = jnp.maximum(jnp.sum(d * axis, -1), 0.0)
    return (n_exp + 1.0) / (2 * jnp.pi) * cos_a ** n_exp


def _sphere_dir(key, center, radius, p):
    """Sample a direction towards a spherical light; returns dir, dist,
    pdf (solid-angle)."""
    k1, _ = jax.random.split(key)
    # sample point on sphere surface
    u = jax.random.normal(k1, p.shape)
    u = u / (jnp.linalg.norm(u, axis=-1, keepdims=True) + 1e-12)
    lp = center[None] + radius * u
    v = lp - p
    dist = jnp.linalg.norm(v, axis=-1) + 1e-8
    d = v / dist[:, None]
    # pdf over solid angle of the visible cone (approx: full sphere area)
    area = 4 * jnp.pi * radius ** 2
    cos_l = jnp.abs(jnp.sum(u * -d, -1)) + 1e-6
    pdf = (dist ** 2) / (area * cos_l)
    return d, dist, pdf


def _light_pdf_towards(scn, p, d):
    """Solid-angle pdf that :func:`_sphere_dir` would assign to direction
    ``d`` from ``p`` (0 if the ray misses the light sphere). Also returns
    the hit distance (inf on miss)."""
    oc = p - scn["light_pos"][None]
    b = jnp.sum(oc * d, -1)
    cc = jnp.sum(oc * oc, -1) - scn["light_radius"] ** 2
    disc = b * b - cc
    t_l = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
    hit_l = (disc > 0) & (t_l > 1e-3)
    lp = p + t_l[:, None] * d
    u = (lp - scn["light_pos"][None]) / jnp.maximum(scn["light_radius"],
                                                    1e-8)
    area = 4 * jnp.pi * scn["light_radius"] ** 2
    cos_l = jnp.abs(jnp.sum(u * -d, -1)) + 1e-6
    pdf = jnp.where(hit_l, (t_l ** 2) / (area * cos_l), 0.0)
    return pdf, jnp.where(hit_l, t_l, _INF)


def _sky_radiance(scn, d):
    """Gradient sky + sun + procedural envmap lobes for escaping
    directions [N, 3] (lobes: cosine-power blobs, the role of the
    reference's random HDR envmaps)."""
    h = jnp.clip(d[:, 1], 0.0, 1.0)[:, None]
    base = scn["sky"][None] * (1 - h) + scn["sky_zenith"][None] * h
    cos_sun = jnp.maximum(jnp.sum(d * scn["sun_dir"][None], -1), 0.0)
    sun = scn["sun_color"][None] * (cos_sun[:, None] ** scn["sun_exp"])
    cos_l = jnp.maximum(d @ scn["env_dirs"].T, 0.0)       # [N, M]
    lobes = (cos_l ** scn["env_exps"][None]) @ scn["env_colors"]
    out = base + sun + lobes
    if scn["env_image"].shape[0] > 0:
        # Equirect HDR environment image from disk (the reference's random
        # HDR envmaps); the scene generator zeroes the procedural lobes
        # when it picks an image.
        out = out + _sample_equirect(scn["env_image"],
                                     d) * scn["env_image_scale"]
    return out


def _power_w(pdf_a, pdf_b):
    """Power heuristic (beta=2), the PBRT EstimateDirect weighting."""
    a2 = pdf_a * pdf_a
    return a2 / jnp.maximum(a2 + pdf_b * pdf_b, 1e-12)


def render_pass(scene, key, ts, block_x, block_y, image_width, image_height):
    """Trace one sample per pixel of a tile; returns per-pixel records.

    Returns a dict with "radiance_diffuse", "radiance_specular", g-buffer
    planes, "p" [4*D], "ld" [2*D], "bt" [D] and the sample coordinates —
    everything the SampleRecord writer stores (all ``[ts*ts, ...]``).
    """
    scn = scene
    n = ts * ts
    keys = jax.random.split(key, 8)

    ys, xs = jnp.meshgrid(jnp.arange(ts), jnp.arange(ts), indexing="ij")
    px = (xs.reshape(-1) + block_x).astype(jnp.float32)
    py = (ys.reshape(-1) + block_y).astype(jnp.float32)

    dx = jax.random.uniform(keys[0], (n,))
    dy = jax.random.uniform(keys[1], (n,))
    r_lens = jnp.sqrt(jax.random.uniform(keys[2], (n,)))
    phi_lens = jax.random.uniform(keys[3], (n,)) * 2 * jnp.pi
    lens_u = r_lens * jnp.cos(phi_lens) * scn["aperture"]
    lens_v = r_lens * jnp.sin(phi_lens) * scn["aperture"]
    t_time = jax.random.uniform(keys[4], (n,))

    tan_half = jnp.tan(jnp.deg2rad(scn["fov"]) / 2)
    u = ((px + dx) / image_width * 2 - 1) * tan_half * (
        image_width / image_height)
    v = -((py + dy) / image_height * 2 - 1) * tan_half
    dirs = jnp.stack([u, v, jnp.ones(n)], -1)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    org = jnp.broadcast_to(scn["cam_pos"][None], (n, 3))

    def with_lens(_):
        focus_t = scn["focus_distance"] / dirs[:, 2]
        focal_p = dirs * focus_t[:, None]
        o = jnp.stack([lens_u, lens_v, jnp.zeros(n)], -1)
        d = focal_p - o
        return (o + scn["cam_pos"][None],
                d / jnp.linalg.norm(d, axis=-1, keepdims=True))

    org, dirs = jax.lax.cond(scn["aperture"] > 0, with_lens,
                             lambda _: (org, dirs), None)

    # Wavefront state carried across path vertices.
    state = {
        "org": org, "dirs": dirs,
        "beta": jnp.ones((n, 3)),          # path throughput
        "alive": jnp.ones((n,), bool),
        "specular_chain": jnp.zeros((n,), bool),  # after 1st vertex: came
                                                  # through delta only
        # MIS bookkeeping for BSDF-sampled light hits: the pdf of the last
        # BSDF sample (0 marks a delta bounce -> weight 1).
        "prev_bsdf_pdf": jnp.zeros((n,)),
        "L_diffuse": jnp.zeros((n, 3)),
        "L_specular": jnp.zeros((n, 3)),
        "first": {},  # filled below
        "key": keys[5],
    }

    zeros = jnp.zeros((n,))
    first = {
        "normal_first": jnp.zeros((n, 3)), "normal": jnp.zeros((n, 3)),
        "depth_first": zeros, "depth": zeros,
        "albedo_first": jnp.zeros((n, 3)), "albedo": jnp.zeros((n, 3)),
        "visibility": zeros, "has_hit": zeros,
        "got_first": jnp.zeros((n,), bool),
        "got_diffuse": jnp.zeros((n,), bool),
        "dist_so_far": zeros,
    }
    state["first"] = first

    emit = scn["light_emission"][None]

    def vertex(state, d_idx):
        k_all = jax.random.fold_in(state["key"], d_idx)
        k_nee, k_bsdf, k_lobe, k_fres = jax.random.split(k_all, 4)

        rec = _intersect(scn, state["org"], state["dirs"], t_time)
        alive = state["alive"]
        hit = rec["hit"] & alive
        mat = rec["mat"]
        is_mirror = mat == MAT_MIRROR
        is_glass = mat == MAT_GLASS
        is_delta = is_mirror | is_glass
        is_metal = mat == MAT_METAL
        is_plastic = mat == MAT_PLASTIC
        is_glossy = is_metal | is_plastic

        to_spec = state["specular_chain"] & (d_idx > 0)

        # Environment contribution for escaping rays (sky is only reached
        # by BSDF samples, so no MIS weight applies).
        escaped = alive & ~rec["hit"]
        env = state["beta"] * _sky_radiance(scn, state["dirs"])
        L_diffuse = state["L_diffuse"] + jnp.where(
            (escaped & ~to_spec)[:, None], env, 0.0)
        L_specular = state["L_specular"] + jnp.where(
            (escaped & to_spec)[:, None], env, 0.0)

        # --- next-event estimation to the spherical light ----------------
        ldir, ldist, lpdf = _sphere_dir(
            k_nee, scn["light_pos"], scn["light_radius"], rec["p"])
        shadowed = _occluded(scn, rec["p"] + 1e-3 * ldir, ldir, ldist)
        cos_s = jnp.maximum(jnp.sum(rec["normal"] * ldir, -1), 0.0)

        # BSDF value and pdf in the light direction (for MIS).
        d_mirr = state["dirs"] - 2 * jnp.sum(
            state["dirs"] * rec["normal"], -1,
            keepdims=True) * rec["normal"]
        n_exp = 2.0 / jnp.clip(rec["roughness"], 0.05, 1.0) ** 2
        pdf_cos_l = cos_s / jnp.pi
        pdf_ph_l = _phong_pdf(ldir, d_mirr, n_exp)
        f_diff = rec["albedo"] / jnp.pi
        f_phong = (n_exp + 2.0) / (2 * jnp.pi) * jnp.maximum(
            jnp.sum(ldir * d_mirr, -1), 0.0) ** n_exp
        f_l = jnp.where(
            is_metal[:, None], rec["albedo"] * f_phong[:, None],
            jnp.where(is_plastic[:, None],
                      f_diff * _PLASTIC_DIFFUSE_P
                      + (1 - _PLASTIC_DIFFUSE_P) * f_phong[:, None],
                      jnp.where(is_delta[:, None], 0.0, f_diff)))
        bpdf_l = jnp.where(
            is_metal, pdf_ph_l,
            jnp.where(is_plastic,
                      _PLASTIC_DIFFUSE_P * pdf_cos_l
                      + (1 - _PLASTIC_DIFFUSE_P) * pdf_ph_l,
                      jnp.where(is_delta, 0.0, pdf_cos_l)))
        w_nee = _power_w(lpdf, bpdf_l)

        vis = (~shadowed) & hit & ~is_delta
        contrib = (state["beta"] * f_l * emit
                   * (w_nee * cos_s / jnp.maximum(lpdf, 1e-6))[:, None])
        contrib = jnp.where(vis[:, None], contrib, 0.0)
        L_diffuse = L_diffuse + jnp.where(to_spec[:, None], 0.0, contrib)
        L_specular = L_specular + jnp.where(to_spec[:, None], contrib, 0.0)

        # --- record first-geometric / first-diffuse bounce features ------
        f = dict(state["first"])
        dist_here = f["dist_so_far"] + rec["t"]
        new_first = hit & ~f["got_first"]
        f["normal_first"] = jnp.where(new_first[:, None], rec["normal"],
                                      f["normal_first"])
        f["depth_first"] = jnp.where(new_first, dist_here, f["depth_first"])
        f["albedo_first"] = jnp.where(new_first[:, None], rec["albedo"],
                                      f["albedo_first"])
        f["has_hit"] = jnp.where(new_first, 1.0, f["has_hit"])
        f["got_first"] = f["got_first"] | hit

        new_diffuse = hit & ~is_delta & ~f["got_diffuse"]
        f["normal"] = jnp.where(new_diffuse[:, None], rec["normal"],
                                f["normal"])
        f["depth"] = jnp.where(new_diffuse, dist_here, f["depth"])
        f["albedo"] = jnp.where(new_diffuse[:, None], rec["albedo"],
                                f["albedo"])
        f["visibility"] = jnp.where(new_diffuse,
                                    jnp.where(shadowed, 0.0, 1.0),
                                    f["visibility"])
        f["got_diffuse"] = f["got_diffuse"] | new_diffuse
        f["dist_so_far"] = jnp.where(hit, dist_here, f["dist_so_far"])

        # --- sample the BSDF for the next segment -------------------------
        d_diff, pdf_diff = _cosine_sample(k_bsdf, rec["normal"])
        d_ph = _phong_sample(k_lobe, d_mirr, n_exp)
        # Glossy samples below the horizon carry zero BRDF: fall back to the
        # diffuse lobe so the path continues (energy handled by f/pdf).
        ph_below = jnp.sum(d_ph * rec["normal"], -1) <= 0
        u_f = jax.random.uniform(k_fres, (n,))

        # Glass: Fresnel-weighted reflect/refract (Schlick).
        cos_i = jnp.maximum(-jnp.sum(state["dirs"] * rec["normal"], -1),
                            1e-6)
        eta = jnp.where(rec["inside"], scn["glass_ior"],
                        1.0 / scn["glass_ior"])
        sin2_t = eta ** 2 * (1.0 - cos_i ** 2)
        tir = sin2_t > 1.0
        r0 = ((1 - scn["glass_ior"]) / (1 + scn["glass_ior"])) ** 2
        fres = r0 + (1 - r0) * (1 - cos_i) ** 5
        reflect_glass = tir | (u_f < fres)
        d_refr = (eta[:, None] * state["dirs"]
                  + (eta * cos_i - jnp.sqrt(jnp.maximum(1 - sin2_t, 0.0))
                     )[:, None] * rec["normal"])
        d_refr = d_refr / (jnp.linalg.norm(d_refr, axis=-1, keepdims=True)
                           + 1e-12)
        d_glass = jnp.where(reflect_glass[:, None], d_mirr, d_refr)

        # Plastic: pick base diffuse lobe vs glossy coat.
        pl_diffuse = u_f < _PLASTIC_DIFFUSE_P
        d_plastic = jnp.where((pl_diffuse | ph_below)[:, None], d_diff, d_ph)

        next_dir = jnp.where(
            is_mirror[:, None], d_mirr,
            jnp.where(is_glass[:, None], d_glass,
                      jnp.where(is_metal[:, None],
                                jnp.where(ph_below[:, None], d_diff, d_ph),
                                jnp.where(is_plastic[:, None], d_plastic,
                                          d_diff))))

        # pdf of the sampled direction (0 marks delta lobes).
        cos_o = jnp.maximum(jnp.sum(next_dir * rec["normal"], -1), 0.0)
        pdf_cos_o = cos_o / jnp.pi
        pdf_ph_o = _phong_pdf(next_dir, d_mirr, n_exp)
        bsdf_pdf = jnp.where(
            is_metal, jnp.where(ph_below, pdf_cos_o, pdf_ph_o),
            jnp.where(is_plastic,
                      _PLASTIC_DIFFUSE_P * pdf_cos_o
                      + (1 - _PLASTIC_DIFFUSE_P) * pdf_ph_o,
                      jnp.where(is_delta, 0.0, pdf_cos_o)))

        # BSDF value along the sampled direction -> throughput update.
        f_ph_o = (n_exp + 2.0) / (2 * jnp.pi) * jnp.maximum(
            jnp.sum(next_dir * d_mirr, -1), 0.0) ** n_exp
        f_o = jnp.where(
            is_metal[:, None], rec["albedo"] * f_ph_o[:, None],
            jnp.where(is_plastic[:, None],
                      rec["albedo"] / jnp.pi * _PLASTIC_DIFFUSE_P
                      + (1 - _PLASTIC_DIFFUSE_P) * f_ph_o[:, None],
                      rec["albedo"] / jnp.pi))
        thr = f_o * (cos_o / jnp.maximum(bsdf_pdf, 1e-6))[:, None]
        thr = jnp.where(is_delta[:, None],
                        jnp.where(is_mirror[:, None], rec["albedo"], 1.0),
                        jnp.clip(thr, 0.0, 4.0))
        beta = jnp.where(hit[:, None], state["beta"] * thr, state["beta"])

        # --- BSDF-sampled light hit (the other MIS branch) ---------------
        lpdf_o, t_l = _light_pdf_towards(scn, rec["p"], next_dir)
        blocked = _occluded(scn, rec["p"] + 1e-3 * next_dir, next_dir,
                            jnp.minimum(t_l, _INF))
        hits_light = hit & (t_l < _INF) & ~blocked
        w_bsdf = jnp.where(is_delta, 1.0, _power_w(bsdf_pdf, lpdf_o))
        l_contrib = beta * emit * w_bsdf[:, None]
        l_contrib = jnp.where(hits_light[:, None], l_contrib, 0.0)
        next_spec = jnp.where(d_idx == 0, is_delta,
                              state["specular_chain"] & is_delta)
        to_spec_next = next_spec & hit
        L_diffuse = L_diffuse + jnp.where(to_spec_next[:, None], 0.0,
                                          l_contrib)
        L_specular = L_specular + jnp.where(to_spec_next[:, None],
                                            l_contrib, 0.0)

        # --- per-vertex records (p, ld, bt) -------------------------------
        # The four MIS pdfs of the reference's LightQueryRecord
        # (sbmc_pbrt.diff integrator.cpp: EstimateDirect's light/bsdf pdf
        # pairs for the light-sampled and bsdf-sampled strategies).
        theta = jnp.arccos(jnp.clip(ldir[:, 1], -1, 1))
        phi = jnp.arctan2(ldir[:, 2], ldir[:, 0])
        ld_rec = jnp.where(hit[:, None], jnp.stack([theta, phi], -1), 0.0)
        bsdf_pdf_rec = jnp.where(is_delta, 1.0, bsdf_pdf)  # delta -> 1
        p_rec = jnp.stack([
            jnp.where(hit, lpdf, 0.0),
            jnp.where(hit, bpdf_l, 0.0),
            jnp.where(hit, bsdf_pdf_rec, 0.0),
            jnp.where(hit, lpdf_o, 0.0)], -1)
        refracted = is_glass & ~reflect_glass
        bt = jnp.where(
            hit,
            jnp.where(refracted, BT_TRANSMISSION | BT_SPECULAR,
                      jnp.where(is_mirror | is_glass,
                                BT_REFLECTION | BT_SPECULAR,
                                jnp.where(is_glossy,
                                          BT_REFLECTION | BT_GLOSSY,
                                          BT_REFLECTION | BT_DIFFUSE))),
            0).astype(jnp.int16)

        new_state = {
            "org": jnp.where(hit[:, None], rec["p"] + 1e-3 * next_dir,
                             state["org"]),
            "dirs": jnp.where(hit[:, None], next_dir, state["dirs"]),
            "beta": beta,
            "alive": hit,
            "specular_chain": next_spec,
            "prev_bsdf_pdf": bsdf_pdf,
            "L_diffuse": L_diffuse,
            "L_specular": L_specular,
            "first": f,
            "key": state["key"],
        }
        return new_state, (p_rec, ld_rec, bt)

    state, (p_recs, ld_recs, bt_recs) = jax.lax.scan(
        vertex, state, jnp.arange(MAX_DEPTH))

    f = state["first"]
    # 1 / (10 * scene_radius): SampleRecord::normalize_distances.
    inv_norm = 1.0 / (10.0 * scn["scene_radius"])
    return {
        "dx": dx, "dy": dy,
        "lens_u": lens_u * inv_norm, "lens_v": lens_v * inv_norm,
        "t": t_time,
        "diffuse": state["L_diffuse"], "specular": state["L_specular"],
        "normal_first": f["normal_first"], "normal": f["normal"],
        "depth_first": f["depth_first"] * inv_norm,
        "depth": f["depth"] * inv_norm,
        "visibility": f["visibility"], "has_hit": f["has_hit"],
        "albedo_first": f["albedo_first"], "albedo": f["albedo"],
        # [D, N, 4] -> [N, 4*D] etc.
        "p": p_recs.transpose(1, 0, 2).reshape(n, -1),
        "ld": ld_recs.transpose(1, 0, 2).reshape(n, -1),
        "bt": bt_recs.transpose(1, 0),
    }


def _tile_passes(scn, key, ts, block_x, block_y, image_width,
                 image_height, spp, gt_spp):
    """All passes of one tile: gt statistics (Welford over gt_spp passes
    via scan) + spp recorded passes. Traced body shared by the
    single-tile jit and the vmapped tile-batch jit."""

    def pix_features(rec):
        return jnp.concatenate([
            rec["diffuse"], rec["specular"], rec["albedo_first"],
            rec["normal_first"], rec["depth_first"][:, None],
            rec["visibility"][:, None], rec["has_hit"][:, None]], -1)

    def gt_step(carry, k):
        mean, m2, cnt = carry
        rec = render_pass(scn, k, ts, block_x, block_y, image_width,
                          image_height)
        x = pix_features(rec)
        cnt = cnt + 1
        delta = x - mean
        mean = mean + delta / cnt
        m2 = m2 + delta * (x - mean)
        return (mean, m2, cnt), None

    keys = jax.random.split(key, gt_spp + spp)
    init = (jnp.zeros((ts * ts, 15)), jnp.zeros((ts * ts, 15)),
            jnp.float32(0))
    (mean, m2, cnt), _ = jax.lax.scan(gt_step, init, keys[:spp + gt_spp][
        spp:])
    var = m2 / cnt

    def rec_step(_, k):
        rec = render_pass(scn, k, ts, block_x, block_y, image_width,
                          image_height)
        feats = jnp.concatenate([
            rec["dx"][:, None], rec["dy"][:, None], rec["lens_u"][:, None],
            rec["lens_v"][:, None], rec["t"][:, None],
            rec["diffuse"], rec["specular"], rec["normal_first"],
            rec["normal"], rec["depth_first"][:, None],
            rec["depth"][:, None], rec["visibility"][:, None],
            rec["has_hit"][:, None], rec["albedo_first"], rec["albedo"]],
            -1)  # [N, 27]
        return None, (feats, rec["p"], rec["ld"], rec["bt"])

    _, (feats, p, ld, bt) = jax.lax.scan(rec_step, None, keys[:spp])
    return mean, var, feats, p, ld, bt


@partial(jax.jit, static_argnames=("ts", "image_width", "image_height",
                                   "spp", "gt_spp"))
def _render_tile_jit(scn, key, ts, block_x, block_y, image_width,
                     image_height, spp, gt_spp):
    return _tile_passes(scn, key, ts, block_x, block_y, image_width,
                        image_height, spp, gt_spp)


@partial(jax.jit, static_argnames=("ts", "image_width", "image_height",
                                   "spp", "gt_spp"))
def _render_tiles_jit(scn, keys, block_xs, block_ys, ts, image_width,
                      image_height, spp, gt_spp):
    """Tile-batched render: vmap the whole per-tile pass stack over the
    tile axis. One 128^2 tile is only a 16k-ray wavefront — far below
    what keeps the chip busy; batching B tiles widens every pass (and
    the MXU triangle intersection) to B*16k rays while amortizing the
    scan/dispatch overhead. Per-tile RNG keys are the same
    ``fold_in(base, tile_index)`` streams as the serial path, so batched
    and serial corpora match."""
    return jax.vmap(
        lambda k, bx, by: _tile_passes(scn, k, ts, bx, by, image_width,
                                       image_height, spp, gt_spp)
    )(keys, block_xs, block_ys)


def render_tile_wavefront(scene, key, ts=128, spp=8, gt_spp=64, block_x=0,
                          block_y=0, image_width=None, image_height=None,
                          kpcn_mode=False):
    """Render one tile with the wavefront tracer into a
    :class:`bin_format.Tile` (drop-in for the PBRT sample renderer).

    ``kpcn_mode=True`` reproduces the reference's ``PathKPCNIntegrator``
    recording conventions (sbmc_pbrt.diff pathkpcn.cpp: distances stay
    unnormalized and ``SampleRecord::normalize_probabilities`` is skipped);
    the default matches ``PathRendernetIntegrator``."""
    image_width = image_width or ts
    image_height = image_height or ts
    scn = scene.as_jax()
    # Single device_get for all outputs: on tunneled TPU backends each
    # host fetch pays a large fixed round trip.
    import time as _time
    _t0 = _time.time()
    mean, var, feats, p, ld, bt = jax.device_get(_render_tile_jit(
        scn, key, ts, block_x, block_y, image_width, image_height, spp,
        gt_spp))
    global LAST_DEVICE_S
    LAST_DEVICE_S = _time.time() - _t0
    return _tile_from_arrays(scene, ts, spp, gt_spp, block_x, block_y,
                             image_width, image_height, kpcn_mode,
                             mean, var, feats, p, ld, bt)


def render_tiles_wavefront(scene, base_key, coords, ts=128, spp=8,
                           gt_spp=64, image_width=None, image_height=None,
                           kpcn_mode=False, tile_batch=1):
    """Render several tiles of one scene per traced call (vmapped over
    the tile axis — see :func:`_render_tiles_jit`).

    ``coords`` is a list of ``(tile_index, block_x, block_y)``; each
    tile's RNG key is ``fold_in(base_key, tile_index)``, matching the
    serial path exactly. Tiles are processed in chunks of ``tile_batch``
    (bounding HBM for the recorded-pass outputs); a ragged final chunk
    is padded by repeating its last tile — the pad renders and is
    dropped — so one extra executable shape is never compiled.

    Returns the tiles in ``coords`` order. The env knob
    ``SBMC_TILE_BATCH`` overrides ``tile_batch`` corpus-wide.
    """
    image_width = image_width or ts
    image_height = image_height or ts
    tile_batch = int(_os.environ.get("SBMC_TILE_BATCH", tile_batch))
    tile_batch = max(1, tile_batch)
    scn = scene.as_jax()
    global LAST_DEVICE_S
    LAST_DEVICE_S = 0.0
    import time as _time
    if tile_batch == 1:
        # SBMC_TILE_BATCH=1 dispatches the round-3-proven single-tile
        # graph (_render_tile_jit) rather than a 1-wide vmap: the vmapped
        # executable crashed the TPU worker on the 2026-08-20 window
        # ("kernel fault") while the serial graph had rendered a
        # 314-scene corpus the night before. RNG matches the batched
        # path exactly (fold_in(base_key, tile_index) per tile).
        out = []
        for idx, bx, by in coords:
            k = jax.random.fold_in(base_key, idx)
            _t0 = _time.time()
            mean, var, feats, p, ld, bt = jax.device_get(_render_tile_jit(
                scn, k, ts, jnp.float32(bx), jnp.float32(by), image_width,
                image_height, spp, gt_spp))
            LAST_DEVICE_S += _time.time() - _t0
            out.append(_tile_from_arrays(
                scene, ts, spp, gt_spp, int(bx), int(by), image_width,
                image_height, kpcn_mode, mean, var, feats, p, ld, bt))
        return out
    out = []
    for c0 in range(0, len(coords), tile_batch):
        chunk = list(coords[c0:c0 + tile_batch])
        n_real = len(chunk)
        while len(chunk) < tile_batch:
            chunk.append(chunk[-1])
        keys = jnp.stack([jax.random.fold_in(base_key, idx)
                          for idx, _, _ in chunk])
        bxs = jnp.asarray([bx for _, bx, _ in chunk], jnp.float32)
        bys = jnp.asarray([by for _, _, by in chunk], jnp.float32)
        _t0 = _time.time()
        mean, var, feats, p, ld, bt = jax.device_get(_render_tiles_jit(
            scn, keys, bxs, bys, ts, image_width, image_height, spp,
            gt_spp))
        LAST_DEVICE_S += _time.time() - _t0
        for i in range(n_real):
            _, bx, by = chunk[i]
            out.append(_tile_from_arrays(
                scene, ts, spp, gt_spp, int(bx), int(by), image_width,
                image_height, kpcn_mode, mean[i], var[i], feats[i], p[i],
                ld[i], bt[i]))
    return out


def _tile_from_arrays(scene, ts, spp, gt_spp, block_x, block_y,
                      image_width, image_height, kpcn_mode,
                      mean, var, feats, p, ld, bt):
    """Host post-processing of one tile's device arrays into a
    :class:`bin_format.Tile` (shared by the serial and tile-batched
    renderers)."""

    def clean(x):
        # The reference writer zeroes NaN/infinite radiance before saving
        # (samplerecord.cpp check_radiance); rare degenerate paths (grazing
        # refractions, pdf underflow) can emit non-finite records here too.
        return np.nan_to_num(np.asarray(x), nan=0.0, posinf=0.0,
                             neginf=0.0)

    def img(x):  # [N, C] -> [C, ts, ts]
        return clean(x).reshape(ts, ts, -1).transpose(2, 0, 1)

    def simg(x):  # [spp, N, C] -> [spp, C, ts, ts]
        return clean(x).reshape(spp, ts, ts, -1).transpose(0, 3, 1, 2)

    # Probability normalization like the reference writer
    # (samplerecord normalize_probabilities): log(p + 1e-8) / 30 — skipped
    # in kpcn mode like the reference's pathkpcn recording path.
    p_n = clean(p)
    if not kpcn_mode:
        p_n = np.log(np.minimum(p_n, 1e12) + 1e-8) / 30.0

    inv_norm = 1.0 / (10.0 * scene.scene_radius)
    feats = simg(feats).astype(np.float32)
    pix = np.concatenate([img(mean), img(np.maximum(var, 0))], 0
                         ).astype(np.float32)
    if kpcn_mode:
        # render_pass normalizes distance-like features inline; undo it so
        # the records carry raw distances (PathKPCNIntegrator convention).
        denorm = np.float32(10.0 * scene.scene_radius)
        for name in ("lens_u", "lens_v", "depth_first", "depth"):
            feats[:, SAMPLE_FEATURE_IDX[name]] *= denorm
        d_pix = PIXEL_DEPTH_IDX
        pix[d_pix] *= denorm                       # mean depth channel
        pix[d_pix + bin_format.PIXEL_FEATURES // 2] *= denorm * denorm
    return bin_format.Tile(
        tile_size=ts, image_width=image_width, image_height=image_height,
        sample_count=spp, gt_sample_count=gt_spp,
        focus_distance=(scene.focus_distance * (1.0 if kpcn_mode
                                                else inv_norm)
                        if scene.aperture > 0 else 0.0),
        aperture_radius=scene.aperture * (1.0 if kpcn_mode else inv_norm),
        fov=scene.fov / 100.0,
        scene_radius=scene.scene_radius,
        block_x=block_x, block_y=block_y,
        pixel_data=pix,
        features=feats,
        p=simg(p_n).astype(np.float32),
        ld=simg(ld).astype(np.float32),
        bt=simg(bt).astype(np.int16),
    )


def generate_wavefront_dataset(outdir, n_scenes=2, ts=128, tiles_per_side=1,
                               spp=8, gt_spp=64, seed=0, start_index=0,
                               key=None, kpcn_mode=False, obj_pool=None,
                               tiles_y=None, tex_pool=None, env_pool=None):
    """Write a folder-of-scenes dataset rendered by the wavefront tracer
    (drop-in replacement for the PBRT data-generation path when no external
    renderer is available, or to generate data directly on TPU).

    ``tiles_per_side`` sets the tile-grid width; ``tiles_y`` (default:
    square) sets its height, for non-square frames (e.g. a real
    1920x1152 frame as a 15x9 grid for the end-to-end denoise timing,
    reference protocol scripts/denoise.py:138-165)."""
    import os

    import jax

    import time
    t_start = time.time()
    tiles_x = tiles_per_side
    if tiles_y is None:
        tiles_y = tiles_per_side
    # Per-phase accounting (VERDICT r3 item 4: where does the s/scene go?).
    # "device" counts the jit dispatch + execution + tunnel fetch of every
    # tile; a tile far above the running median is a bucket compile, whose
    # excess is attributed to "compile" instead.
    acc = {"sample": 0.0, "device": 0.0, "compile": 0.0, "host": 0.0,
           "write": 0.0}
    steady = None
    for s in range(n_scenes):
        idx = start_index + s
        t0 = time.time()
        rng = np.random.RandomState(seed + idx)
        scene = random_tracer_scene(rng, obj_pool=obj_pool,
                                    tex_pool=tex_pool, env_pool=env_pool)
        acc["sample"] += time.time() - t0
        sdir = os.path.join(outdir, "scene_%05d" % idx)
        os.makedirs(sdir, exist_ok=True)
        if s and s % 10 == 0:
            done = time.time() - t_start
            print("wavefront datagen: %d/%d scenes (%.1f s/scene; "
                  "device %.0f%% compile %.0f%% host %.0f%% write %.0f%% "
                  "sample %.0f%%)"
                  % (s, n_scenes, done / s,
                     *(100.0 * acc[k] / max(done, 1e-9)
                       for k in ("device", "compile", "host", "write",
                                 "sample"))), flush=True)
        w, h = ts * tiles_x, ts * tiles_y
        base_key = jax.random.PRNGKey(seed + idx) if key is None else key
        coords = [(ty * tiles_x + tx, tx * ts, ty * ts)
                  for ty in range(tiles_y) for tx in range(tiles_x)]
        # Tiles are rendered ``SBMC_TILE_BATCH`` per traced call; >=2
        # widens every pass to B*16k rays via vmap (per-tile RNG keys
        # match the serial path). Default is 1: the vmapped executable
        # faulted the TPU worker on 2026-08-20 while the serial graph is
        # corpus-proven, so batching is opt-in until that is root-caused.
        tb = max(1, int(_os.environ.get("SBMC_TILE_BATCH", "1")))
        for c0 in range(0, len(coords), tb):
            chunk = coords[c0:c0 + tb]
            t0 = time.time()
            tiles = render_tiles_wavefront(
                scene, base_key, chunk, ts=ts, spp=spp, gt_spp=gt_spp,
                image_width=w, image_height=h, kpcn_mode=kpcn_mode,
                tile_batch=tb)
            t1 = time.time()
            dev = LAST_DEVICE_S
            if steady is None:
                steady = dev
            if dev > 3.0 * steady + 1.0:           # bucket compile outlier
                acc["compile"] += dev - steady
                acc["device"] += steady
            else:
                acc["device"] += dev
                steady = 0.9 * steady + 0.1 * dev
            acc["host"] += (t1 - t0) - dev
            for (_, bx, by), tile in zip(chunk, tiles):
                bin_format.write_tile(
                    os.path.join(sdir, "tile_%04d_%04d.bin"
                                 % (by // ts, bx // ts)), tile)
            acc["write"] += time.time() - t1
    return outdir
