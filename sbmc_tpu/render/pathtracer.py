"""TPU-native wavefront path tracer for sample-data generation.

The reference generates training data with an instrumented C++ PBRTv2
(pbrt_patches/sbmc_pbrt.diff: ``PathRendernetIntegrator`` records, per
camera sample, the radiance decomposition, two-bounce g-buffer, per-vertex
sampling probabilities, light directions and bounce-type flags;
``RendernetRenderer`` runs a ground-truth pass and a recorded pass per
tile). This module is the TPU-first equivalent: a fully vectorized,
``jit``-able wavefront tracer — one ray per pixel per sample pass, a
``lax.scan`` over path vertices (fixed depth, matching the reference's
no-russian-roulette ``maxdepth`` design), analytic sphere/ground-plane
geometry, Lambertian + mirror BSDFs with next-event estimation to a
spherical area light, and a constant-sky environment term.

It records the exact per-sample feature surface of the ``.bin`` format
(sbmc_tpu/data/bin_format.py): 27 sample features, ``4 * depth`` path
probabilities (normalized ``log(p + 1e-8) / 30`` like SampleRecord), ``2 *
depth`` light directions (theta, phi) and per-vertex bounce-type bitmasks.

Scenes are flat arrays (:class:`TracerScene`), so rendering runs unchanged
on CPU or TPU and scales over devices by splitting sample passes.
"""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sbmc_tpu.data import bin_format

__all__ = ["TracerScene", "random_tracer_scene", "render_pass",
           "render_tile_wavefront"]

MAX_DEPTH = bin_format.PATH_DEPTH  # 6 vertices: camera hit + 5 bounces

# Bounce-type bitmask (reference: BxDF flags recorded per vertex).
BT_REFLECTION = 1
BT_TRANSMISSION = 1 << 1
BT_DIFFUSE = 1 << 2
BT_GLOSSY = 1 << 3
BT_SPECULAR = 1 << 4


@dataclasses.dataclass
class TracerScene:
    """Flat-array scene for the wavefront tracer."""
    centers: np.ndarray      # [n, 3] sphere centers
    radii: np.ndarray        # [n]
    albedos: np.ndarray      # [n, 3]
    mirror: np.ndarray       # [n] in {0,1}: perfect mirror spheres
    roughness: np.ndarray    # [n] in (0, 1]: glossy lobe width (1 = diffuse)
    motion: np.ndarray       # [n, 3] linear velocity over the shutter
    ground_albedo: np.ndarray  # [3]
    light_pos: np.ndarray    # [3]
    light_radius: float
    light_emission: np.ndarray  # [3]
    sky: np.ndarray          # [3] constant environment radiance
    fov: float               # degrees
    aperture: float
    focus_distance: float
    cam_pos: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([0.0, 1.2, 0.0]))
    scene_radius: float = 12.0

    def as_jax(self):
        return {k: jnp.asarray(v) for k, v in dataclasses.asdict(self).items()
                if isinstance(v, np.ndarray)} | {
            "light_radius": jnp.float32(self.light_radius),
            "fov": jnp.float32(self.fov),
            "aperture": jnp.float32(self.aperture),
            "focus_distance": jnp.float32(self.focus_distance),
        }


def random_tracer_scene(rng, n_spheres=6):
    mirror = (rng.rand(n_spheres) < 0.15).astype(np.float32)
    # Material mixture in the spirit of the reference randomizers
    # (sbmc/scene_generator/randomizers.py): some glossy, mostly diffuse.
    glossy = (rng.rand(n_spheres) < 0.3) & (mirror < 0.5)
    roughness = np.where(glossy, rng.uniform(0.05, 0.4, n_spheres), 1.0)
    do_motion = rng.rand(n_spheres) < 0.25
    return TracerScene(
        centers=np.stack([rng.uniform(-3, 3, n_spheres),
                          rng.uniform(0.4, 2.5, n_spheres),
                          rng.uniform(3.0, 9.0, n_spheres)], 1),
        radii=rng.uniform(0.3, 1.0, n_spheres),
        albedos=rng.uniform(0.1, 0.9, (n_spheres, 3)),
        mirror=mirror,
        roughness=roughness,
        motion=rng.normal(0, 0.15, (n_spheres, 3)) * do_motion[:, None],
        ground_albedo=rng.uniform(0.2, 0.8, 3),
        light_pos=np.array([rng.uniform(-4, 4), rng.uniform(4, 8),
                            rng.uniform(0, 6)]),
        light_radius=float(rng.uniform(0.2, 0.8)),
        light_emission=rng.uniform(30, 120, 3),
        sky=rng.uniform(0.05, 0.35, 3),
        fov=float(rng.uniform(25, 60)),
        aperture=(float(np.exp(rng.uniform(np.log(1e-3), np.log(0.05))))
                  if rng.rand() < 0.5 else 0.0),
        focus_distance=float(rng.uniform(3, 8)),
        cam_pos=np.array([rng.uniform(-1, 1), rng.uniform(0.8, 2.2),
                          rng.uniform(-1, 1)]),
    )


#: Rays are truncated at this multiple of the scene radius: grazing hits on
#: the infinite ground plane otherwise record unbounded depth features,
#: which destabilize training (the reference's PBRT scenes are bounded, so
#: its depth normalization implicitly assumes this).
MAX_RAY_FACTOR = 4.0


def _intersect(scn, org, dirs, t):
    """Nearest-hit for ray bundles [N, 3]. Returns hit dict."""
    n = org.shape[0]
    inf = jnp.float32(1e10)
    t_max = jnp.float32(12.0 * MAX_RAY_FACTOR)

    # Ground plane y = 0 (treated as environment beyond t_max).
    dy = dirs[:, 1]
    tg = jnp.where(jnp.abs(dy) > 1e-8, -org[:, 1] / dy, inf)
    tg = jnp.where((tg > 1e-3) & (tg < t_max), tg, inf)

    # Spheres (moved by t * motion).
    c = scn["centers"][None] + t[:, None, None] * scn["motion"][None]
    oc = org[:, None, :] - c                       # [N, S, 3]
    b = jnp.sum(oc * dirs[:, None, :], -1)         # [N, S]
    cc = jnp.sum(oc * oc, -1) - scn["radii"][None] ** 2
    disc = b * b - cc
    ts = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
    ts = jnp.where((disc > 0) & (ts > 1e-3), ts, inf)
    s_idx = jnp.argmin(ts, axis=1)
    s_t = jnp.take_along_axis(ts, s_idx[:, None], 1)[:, 0]

    hit_sphere = s_t < tg
    best_t = jnp.where(hit_sphere, s_t, tg)
    hit = best_t < inf
    # id: -1 = miss, -2 = ground, >= 0 = sphere
    hid = jnp.where(hit, jnp.where(hit_sphere, s_idx, -2), -1)

    p = org + best_t[:, None] * dirs
    sc = jnp.take_along_axis(c, s_idx[:, None, None].repeat(3, -1),
                             1)[:, 0]  # hit sphere center
    sr = scn["radii"][s_idx]
    n_sphere = (p - sc) / sr[:, None]
    normal = jnp.where(hit_sphere[:, None], n_sphere,
                       jnp.array([0.0, 1.0, 0.0])[None])
    # face the incoming ray
    normal = jnp.where(jnp.sum(normal * dirs, -1, keepdims=True) > 0,
                       -normal, normal)

    checker = (jnp.floor(p[:, 0]) + jnp.floor(p[:, 2])) % 2.0
    g_alb = scn["ground_albedo"][None] * (0.5 + 0.5 * checker[:, None])
    s_alb = scn["albedos"][s_idx]
    albedo = jnp.where(hit_sphere[:, None], s_alb, g_alb)
    albedo = jnp.where(hit[:, None], albedo, 0.0)
    is_mirror = jnp.where(hit_sphere, scn["mirror"][s_idx] > 0.5, False)
    rough = jnp.where(hit_sphere, scn["roughness"][s_idx], 1.0)

    return {"hit": hit, "id": hid, "t": jnp.where(hit, best_t, 0.0),
            "p": p, "normal": normal, "albedo": albedo,
            "mirror": is_mirror, "roughness": rough}


def _occluded(scn, org, dirs, dist):
    """Any sphere hit closer than dist (t=0 geometry for shadow rays)."""
    oc = org[:, None, :] - scn["centers"][None]
    b = jnp.sum(oc * dirs[:, None, :], -1)
    cc = jnp.sum(oc * oc, -1) - scn["radii"][None] ** 2
    disc = b * b - cc
    ts = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
    ok = (disc > 0) & (ts > 1e-3) & (ts < dist[:, None] - 1e-3)
    return jnp.any(ok, axis=1)


def _cosine_sample(key, normal):
    """Cosine-weighted hemisphere sample around per-ray normals [N,3]."""
    k1, k2 = jax.random.split(key)
    u1 = jax.random.uniform(k1, normal.shape[:1])
    u2 = jax.random.uniform(k2, normal.shape[:1])
    r = jnp.sqrt(u1)
    phi = 2 * jnp.pi * u2
    # local frame
    up = jnp.where(jnp.abs(normal[:, 1:2]) < 0.9,
                   jnp.array([0.0, 1.0, 0.0])[None],
                   jnp.array([1.0, 0.0, 0.0])[None])
    tang = jnp.cross(up, normal)
    tang = tang / (jnp.linalg.norm(tang, axis=-1, keepdims=True) + 1e-12)
    bitan = jnp.cross(normal, tang)
    local = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi),
                       jnp.sqrt(jnp.maximum(1 - u1, 0.0))], -1)
    d = (local[:, 0:1] * tang + local[:, 1:2] * bitan
         + local[:, 2:3] * normal)
    pdf = jnp.maximum(local[:, 2], 1e-6) / jnp.pi
    return d, pdf


def _sphere_dir(key, center, radius, p):
    """Sample a direction towards a spherical light; returns dir, dist,
    pdf (solid-angle)."""
    k1, k2 = jax.random.split(key)
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
                                                  # through specular only
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

    def vertex(state, d_idx):
        k_all = jax.random.fold_in(state["key"], d_idx)
        k_nee, k_bsdf, k_next = jax.random.split(k_all, 3)

        rec = _intersect(scn, state["org"], state["dirs"], t_time)
        alive = state["alive"]
        hit = rec["hit"] & alive

        # Environment contribution for escaping rays.
        escaped = alive & ~rec["hit"]
        env = state["beta"] * scn["sky"][None]
        to_spec = state["specular_chain"] & (d_idx > 0)
        L_diffuse = state["L_diffuse"] + jnp.where(
            (escaped & ~to_spec)[:, None], env, 0.0)
        L_specular = state["L_specular"] + jnp.where(
            (escaped & to_spec)[:, None], env, 0.0)

        # --- next-event estimation to the spherical light ---------------
        ldir, ldist, lpdf = _sphere_dir(
            k_nee, scn["light_pos"], scn["light_radius"], rec["p"])
        shadowed = _occluded(scn, rec["p"] + 1e-3 * ldir, ldir, ldist)
        cos_s = jnp.maximum(jnp.sum(rec["normal"] * ldir, -1), 0.0)
        emit = scn["light_emission"][None]
        f_diffuse = rec["albedo"] / jnp.pi
        vis = (~shadowed) & hit & ~rec["mirror"]
        contrib = (state["beta"] * f_diffuse * emit
                   * (cos_s / jnp.maximum(lpdf, 1e-6))[:, None])
        contrib = jnp.where(vis[:, None], contrib, 0.0)
        L_diffuse = L_diffuse + jnp.where(to_spec[:, None], 0.0, contrib)
        L_specular = L_specular + jnp.where(to_spec[:, None], contrib, 0.0)

        # --- record first-geometric / first-diffuse bounce features -----
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

        new_diffuse = hit & ~rec["mirror"] & ~f["got_diffuse"]
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

        # --- sample the BSDF for the next segment ------------------------
        # Diffuse: cosine lobe around the normal. Glossy: the same sampler
        # around the mirror direction, blended by roughness (a cheap
        # Phong-style lobe). Mirror: delta reflection.
        d_mirr = state["dirs"] - 2 * jnp.sum(
            state["dirs"] * rec["normal"], -1, keepdims=True) * rec["normal"]
        d_diff, pdf_diff = _cosine_sample(k_bsdf, rec["normal"])
        d_gloss, _ = _cosine_sample(
            jax.random.fold_in(k_bsdf, 1), d_mirr)
        r1 = rec["roughness"][:, None]
        d_rough = d_mirr * (1 - r1) + d_gloss * r1
        d_rough = d_rough / (jnp.linalg.norm(d_rough, -1, keepdims=True)
                             + 1e-12)
        # Keep glossy bounces above the surface.
        below = jnp.sum(d_rough * rec["normal"], -1, keepdims=True) < 0
        d_rough = jnp.where(below, d_diff, d_rough)
        is_glossy = (~rec["mirror"]) & (rec["roughness"] < 0.999)
        next_dir = jnp.where(rec["mirror"][:, None], d_mirr,
                             jnp.where(is_glossy[:, None], d_rough, d_diff))
        bsdf_pdf = jnp.where(rec["mirror"], 1.0, pdf_diff)
        # Lambertian throughput: albedo (cosine-weighted pdf cancels cos/pi)
        beta = state["beta"] * jnp.where(rec["mirror"][:, None], 1.0,
                                         rec["albedo"])
        beta = jnp.where(hit[:, None], beta, state["beta"])

        # --- per-vertex records (p, ld, bt) -------------------------------
        theta = jnp.arccos(jnp.clip(ldir[:, 1], -1, 1))
        phi = jnp.arctan2(ldir[:, 2], ldir[:, 0])
        ld_rec = jnp.where(hit[:, None], jnp.stack([theta, phi], -1), 0.0)
        p_rec = jnp.stack([
            jnp.where(hit, bsdf_pdf, 0.0),
            jnp.where(hit, lpdf, 0.0),
            jnp.where(hit, cos_s, 0.0),
            jnp.where(vis, 1.0, 0.0)], -1)
        bt = jnp.where(
            hit,
            jnp.where(rec["mirror"], BT_REFLECTION | BT_SPECULAR,
                      jnp.where(is_glossy, BT_REFLECTION | BT_GLOSSY,
                                BT_REFLECTION | BT_DIFFUSE)),
            0).astype(jnp.int16)

        new_state = {
            "org": jnp.where(hit[:, None], rec["p"] + 1e-3 * next_dir,
                             state["org"]),
            "dirs": jnp.where(hit[:, None], next_dir, state["dirs"]),
            "beta": beta,
            "alive": hit,
            "specular_chain": jnp.where(
                d_idx == 0, rec["mirror"],
                state["specular_chain"] & rec["mirror"]),
            "L_diffuse": L_diffuse,
            "L_specular": L_specular,
            "first": f,
            "key": state["key"],
        }
        return new_state, (p_rec, ld_rec, bt)

    state, (p_recs, ld_recs, bt_recs) = jax.lax.scan(
        vertex, state, jnp.arange(MAX_DEPTH))

    f = state["first"]
    inv_norm = 1.0 / (10.0 * 12.0)  # 1/(10 * scene_radius), like the writer
    return {
        "dx": dx, "dy": dy, "lens_u": lens_u, "lens_v": lens_v, "t": t_time,
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


@partial(jax.jit, static_argnames=("ts", "image_width", "image_height",
                                   "spp", "gt_spp"))
def _render_tile_jit(scn, key, ts, block_x, block_y, image_width,
                     image_height, spp, gt_spp):
    """All passes of one tile under a single jit: gt statistics (Welford
    over gt_spp passes via scan) + spp recorded passes."""

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


def render_tile_wavefront(scene, key, ts=128, spp=8, gt_spp=64, block_x=0,
                          block_y=0, image_width=None, image_height=None):
    """Render one tile with the wavefront tracer into a
    :class:`bin_format.Tile` (drop-in for the PBRT sample renderer)."""
    image_width = image_width or ts
    image_height = image_height or ts
    scn = scene.as_jax()
    mean, var, feats, p, ld, bt = _render_tile_jit(
        scn, key, ts, block_x, block_y, image_width, image_height, spp,
        gt_spp)

    def img(x):  # [N, C] -> [C, ts, ts]
        return np.asarray(x).reshape(ts, ts, -1).transpose(2, 0, 1)

    def simg(x):  # [spp, N, C] -> [spp, C, ts, ts]
        return np.asarray(x).reshape(spp, ts, ts, -1).transpose(0, 3, 1, 2)

    # Probability normalization like the reference writer
    # (samplerecord normalize_probabilities): log(p + 1e-8) / 30.
    p_n = np.log(np.asarray(p) + 1e-8) / 30.0

    return bin_format.Tile(
        tile_size=ts, image_width=image_width, image_height=image_height,
        sample_count=spp, gt_sample_count=gt_spp,
        focus_distance=(scene.focus_distance if scene.aperture > 0 else 0.0),
        aperture_radius=scene.aperture, fov=scene.fov / 100.0,
        scene_radius=scene.scene_radius,
        block_x=block_x, block_y=block_y,
        pixel_data=np.concatenate([img(mean), img(np.maximum(var, 0))], 0
                                  ).astype(np.float32),
        features=simg(feats).astype(np.float32),
        p=simg(p_n).astype(np.float32),
        ld=simg(ld).astype(np.float32),
        bt=simg(bt).astype(np.int16),
    )


def generate_wavefront_dataset(outdir, n_scenes=2, ts=128, tiles_per_side=1,
                               spp=8, gt_spp=64, seed=0, start_index=0,
                               key=None):
    """Write a folder-of-scenes dataset rendered by the wavefront tracer
    (drop-in replacement for the PBRT data-generation path when no external
    renderer is available, or to generate data directly on TPU)."""
    import os

    import jax

    for s in range(n_scenes):
        idx = start_index + s
        rng = np.random.RandomState(seed + idx)
        scene = random_tracer_scene(rng)
        sdir = os.path.join(outdir, "scene_%05d" % idx)
        os.makedirs(sdir, exist_ok=True)
        size = ts * tiles_per_side
        base_key = jax.random.PRNGKey(seed + idx) if key is None else key
        for ty in range(tiles_per_side):
            for tx in range(tiles_per_side):
                k = jax.random.fold_in(base_key, ty * tiles_per_side + tx)
                tile = render_tile_wavefront(
                    scene, k, ts=ts, spp=spp, gt_spp=gt_spp,
                    block_x=tx * ts, block_y=ty * ts, image_width=size,
                    image_height=size)
                bin_format.write_tile(
                    os.path.join(sdir, "tile_%04d_%04d.bin" % (ty, tx)),
                    tile)
    return outdir
