#!/usr/bin/env python
"""Generate the committed image-texture / envmap asset packs.

The reference's training distribution draws Imagemap textures and HDR
envmaps from large external collections (reference:
sbmc/scene_generator/randomizers.py:27-93, random_envmap) that cannot be
redistributed; this script synthesizes a small, committed stand-in pack
with comparable variety (wood rings, marble fbm, bricks, dots, plaid,
voronoi cells; sky/sunset/interior-ish equirect HDR domes). Outputs are
deterministic (seeded) so re-running reproduces the committed files.

Usage: python scripts/make_asset_textures.py [--outdir assets]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

S = 128          # source resolution (pools resample to the tracer's size)


def _fbm(rng, shape, octaves=4):
    """Cheap fractal noise: sum of nearest-upsampled random grids."""
    out = np.zeros(shape, np.float32)
    amp, total = 1.0, 0.0
    for o in range(octaves):
        n = 2 ** (o + 2)
        g = rng.rand(n, n).astype(np.float32)
        ys = (np.arange(shape[0]) * n // shape[0]) % n
        xs = (np.arange(shape[1]) * n // shape[1]) % n
        # Bilinear upsample of the torus grid.
        fy = (np.arange(shape[0]) * n / shape[0]) % 1.0
        fx = (np.arange(shape[1]) * n / shape[1]) % 1.0
        g2 = np.roll(g, -1, 0)
        g3 = np.roll(g, -1, 1)
        g4 = np.roll(g2, -1, 1)
        up = (g[ys][:, xs] * np.outer(1 - fy, 1 - fx)
              + g2[ys][:, xs] * np.outer(fy, 1 - fx)
              + g3[ys][:, xs] * np.outer(1 - fy, fx)
              + g4[ys][:, xs] * np.outer(fy, fx))
        out += amp * up
        total += amp
        amp *= 0.5
    return out / total


def _grid():
    y, x = np.mgrid[0:S, 0:S].astype(np.float32) / S
    return y, x


def tex_wood(rng):
    y, x = _grid()
    r = np.hypot(x - 0.3, y - 0.45) * 9 + 2.5 * _fbm(rng, (S, S))
    rings = 0.5 + 0.5 * np.sin(2 * np.pi * r)
    base = np.array([0.45, 0.27, 0.13])
    dark = np.array([0.26, 0.15, 0.07])
    return base[None, None] * rings[..., None] \
        + dark[None, None] * (1 - rings[..., None])


def tex_marble(rng):
    y, x = _grid()
    v = np.sin(2 * np.pi * (x * 2 + 4.0 * _fbm(rng, (S, S), 5)))
    v = 0.55 + 0.45 * np.abs(v)
    tint = rng.uniform(0.75, 1.0, 3)
    return (v[..., None] * tint[None, None]).astype(np.float32)


def tex_bricks(rng):
    y, x = _grid()
    by = np.floor(y * 8)
    xx = (x + (by % 2) * 0.0625) % 1.0
    bx = np.floor(xx * 4)
    mortar = ((y * 8) % 1.0 < 0.12) | ((xx * 4) % 1.0 < 0.08)
    h = np.abs(np.sin(by * 12.99 + bx * 78.23)) * 0.3
    brick = np.stack([0.45 + h, 0.18 + 0.5 * h, 0.12 + 0.3 * h], -1)
    out = np.where(mortar[..., None], 0.65, brick)
    return out * (0.85 + 0.3 * _fbm(rng, (S, S)))[..., None]


def tex_dots(rng):
    y, x = _grid()
    fy, fx = (y * 6) % 1.0 - 0.5, (x * 6) % 1.0 - 0.5
    d = np.hypot(fy, fx)
    dot = (d < 0.3).astype(np.float32)
    c1 = rng.uniform(0.1, 0.9, 3)
    c2 = rng.uniform(0.1, 0.9, 3)
    return c1[None, None] * dot[..., None] \
        + c2[None, None] * (1 - dot[..., None])


def tex_plaid(rng):
    y, x = _grid()
    a = 0.5 + 0.5 * np.sin(2 * np.pi * x * 5)
    b = 0.5 + 0.5 * np.sin(2 * np.pi * y * 5)
    c1 = rng.uniform(0.1, 0.9, 3)
    c2 = rng.uniform(0.1, 0.9, 3)
    out = np.minimum(a, b)[..., None] * c1[None, None] \
        + np.maximum(a, b)[..., None] * 0.5 * c2[None, None]
    return np.clip(out, 0, 1)


def tex_cells(rng):
    pts = rng.rand(18, 2).astype(np.float32)
    y, x = _grid()
    d = np.min((y[..., None] - pts[None, None, :, 1]) ** 2
               + (x[..., None] - pts[None, None, :, 0]) ** 2, -1)
    v = np.clip(np.sqrt(d) * 6, 0, 1)
    tint = rng.uniform(0.3, 1.0, 3)
    return ((0.25 + 0.75 * v)[..., None] * tint[None, None])


def tex_noisegrain(rng):
    v = _fbm(rng, (S, S), 5)
    c1 = rng.uniform(0.1, 0.9, 3)
    c2 = rng.uniform(0.1, 0.9, 3)
    return c1[None, None] * v[..., None] + c2[None, None] \
        * (1 - v[..., None])


def env_dome(rng, kind):
    """64x128 equirect HDR dome: gradient + sun blob (+ colored lobes)."""
    eh, ew = 64, 128
    v = (np.arange(eh, dtype=np.float32)[:, None] + 0.5) / eh  # 0=up
    u = (np.arange(ew, dtype=np.float32)[None, :] + 0.5) / ew
    elev = np.cos(v * np.pi)          # y component
    out = np.zeros((eh, ew, 3), np.float32)
    if kind == "day":
        zen = np.array([0.2, 0.4, 0.9]) * rng.uniform(0.5, 1.5)
        hor = np.array([0.7, 0.75, 0.8])
        out += zen[None, None] * np.clip(elev, 0, 1)[..., None] \
            + hor[None, None] * np.clip(1 - np.abs(elev), 0, 1)[..., None]
    elif kind == "sunset":
        zen = np.array([0.15, 0.1, 0.3])
        hor = np.array([1.8, 0.6, 0.2]) * rng.uniform(0.7, 1.6)
        out += zen[None, None] * np.clip(elev, 0, 1)[..., None] \
            + hor[None, None] * np.exp(-4 * np.abs(elev))[..., None]
    else:  # interior-ish: dim base + bright rectangular "windows"
        out += np.array([0.08, 0.08, 0.1])[None, None]
        for _ in range(rng.randint(2, 5)):
            u0 = rng.uniform(0, 1)
            du = rng.uniform(0.04, 0.14)
            v0 = rng.uniform(0.25, 0.6)
            dv = rng.uniform(0.08, 0.2)
            mask = ((np.abs(((u - u0 + 0.5) % 1.0) - 0.5) < du)
                    & (np.abs(v - v0) < dv))
            out += mask[..., None] * rng.uniform(2.0, 14.0, 3)[None, None]
    # sun blob
    if kind != "interior":
        su = rng.uniform(0, 1)
        sv = rng.uniform(0.15, 0.45)
        d2 = (np.abs(((u - su + 0.5) % 1.0) - 0.5) * 2) ** 2 \
            + ((v - sv) * 2) ** 2
        out += np.exp(-d2 / 0.002)[..., None] \
            * rng.uniform(20, 80) * np.array([1.0, 0.9, 0.7])[None, None]
    return out.astype(np.float32)


def main(outdir):
    import imageio.v2 as imageio

    from sbmc_tpu.utils import exr

    tdir = os.path.join(outdir, "textures")
    edir = os.path.join(outdir, "envmaps")
    os.makedirs(tdir, exist_ok=True)
    os.makedirs(edir, exist_ok=True)

    makers = [("wood", tex_wood), ("marble", tex_marble),
              ("bricks", tex_bricks), ("dots", tex_dots),
              ("plaid", tex_plaid), ("cells", tex_cells),
              ("grain", tex_noisegrain)]
    idx = 0
    for variant in range(2):
        for name, fn in makers:
            rng = np.random.RandomState(100 + idx)
            im = np.clip(fn(rng), 0, 1)
            # sRGB-encode for the 8-bit container (pools linearize back).
            png = (im ** (1 / 2.2) * 255).astype(np.uint8)
            imageio.imwrite(os.path.join(
                tdir, "%s_%d.png" % (name, variant)), png)
            idx += 1
    for i, kind in enumerate(["day", "day", "sunset", "sunset",
                              "interior", "interior"]):
        rng = np.random.RandomState(500 + i)
        exr.write(os.path.join(edir, "%s_%d.exr" % (kind, i)),
                  env_dome(rng, kind))
    print("wrote %d textures -> %s, 6 envmaps -> %s" % (idx, tdir, edir))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets"))
    main(ap.parse_args().outdir)
