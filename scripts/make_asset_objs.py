#!/usr/bin/env python
"""Generate the built-in .obj prop pack (assets/objs/).

The reference ships no geometry either — its generator downloads/borrows
external model corpora at runtime (sbmc/scene_generator/generators.py
random .obj placement). This environment has no network, so we commit a
small parametric pack: tori, capsules, star prisms, bumpy spheres and
L-brackets. Concave and genus-1 shapes produce the self-shadowing and
interreflections the platonic-solid stand-ins cannot, which hardens the
training distribution. All meshes stay under the ObjPool face cap.
"""

import os
import sys

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "assets", "objs")


def write_obj(path, verts, faces):
    with open(path, "w") as f:
        f.write("# generated parametric prop (scripts/make_asset_objs.py)\n")
        for v in verts:
            f.write("v %.6f %.6f %.6f\n" % tuple(v))
        for a, b, c in faces:
            f.write("f %d %d %d\n" % (a + 1, b + 1, c + 1))


def grid_faces(nu, nv, wrap_u=False, wrap_v=False):
    faces = []
    mu = nu if wrap_u else nu - 1
    mv = nv if wrap_v else nv - 1
    for i in range(mu):
        for j in range(mv):
            a = i * nv + j
            b = ((i + 1) % nu) * nv + j
            c = ((i + 1) % nu) * nv + (j + 1) % nv
            d = i * nv + (j + 1) % nv
            faces += [[a, b, c], [a, c, d]]
    return np.array(faces, np.int32)


def torus(R=1.0, r=0.4, nu=12, nv=8):
    u = np.linspace(0, 2 * np.pi, nu, endpoint=False)
    v = np.linspace(0, 2 * np.pi, nv, endpoint=False)
    uu, vv = np.meshgrid(u, v, indexing="ij")
    x = (R + r * np.cos(vv)) * np.cos(uu)
    y = r * np.sin(vv)
    z = (R + r * np.cos(vv)) * np.sin(uu)
    verts = np.stack([x, y, z], -1).reshape(-1, 3)
    return verts, grid_faces(nu, nv, wrap_u=True, wrap_v=True)


def bumpy_sphere(n=10, amp=0.18, seed=0):
    rng = np.random.RandomState(seed)
    u = np.linspace(0, 2 * np.pi, 2 * n, endpoint=False)
    v = np.linspace(1e-3, np.pi - 1e-3, n)
    uu, vv = np.meshgrid(u, v, indexing="ij")
    rad = 1.0 + amp * np.sin(3 * uu) * np.sin(2 * vv) \
        + amp * 0.5 * rng.rand()
    x = rad * np.sin(vv) * np.cos(uu)
    y = rad * np.cos(vv)
    z = rad * np.sin(vv) * np.sin(uu)
    verts = np.stack([x, y, z], -1).reshape(-1, 3)
    return verts, grid_faces(2 * n, n, wrap_u=True)


def capsule(r=0.45, h=1.2, nu=10, nv=12):
    u = np.linspace(0, 2 * np.pi, nu, endpoint=False)
    t = np.linspace(0, 1, nv)
    rows = []
    for ti in t:
        # Sweep: bottom cap, cylinder, top cap.
        if ti < 0.25:
            a = ti / 0.25 * np.pi / 2
            y, rr = -h / 2 - r * np.cos(a), r * np.sin(a)
        elif ti > 0.75:
            a = (ti - 0.75) / 0.25 * np.pi / 2
            y, rr = h / 2 + r * np.sin(a), r * np.cos(a)
        else:
            y, rr = -h / 2 + (ti - 0.25) / 0.5 * h, r
        rows.append(np.stack([rr * np.cos(u), np.full_like(u, y),
                              rr * np.sin(u)], -1))
    verts = np.stack(rows, 1).reshape(-1, 3)  # [nu, nv, 3] -> flat
    return verts, grid_faces(nu, nv, wrap_u=True)


def star_prism(points=6, r_out=1.0, r_in=0.45, h=0.6):
    ang = np.linspace(0, 2 * np.pi, 2 * points, endpoint=False)
    rad = np.where(np.arange(2 * points) % 2 == 0, r_out, r_in)
    ring = np.stack([rad * np.cos(ang), np.zeros_like(ang),
                     rad * np.sin(ang)], -1)
    top = ring + [0, h / 2, 0]
    bot = ring - [0, h / 2, 0]
    verts = [np.array([0, h / 2, 0]), np.array([0, -h / 2, 0])]
    verts = np.concatenate([np.stack(verts), top, bot])
    n = 2 * points
    faces = []
    for i in range(n):
        j = (i + 1) % n
        faces += [[0, 2 + i, 2 + j],             # top fan
                  [1, 2 + n + j, 2 + n + i],     # bottom fan
                  [2 + i, 2 + n + i, 2 + n + j],  # side
                  [2 + i, 2 + n + j, 2 + j]]
    return verts, np.array(faces, np.int32)


def l_bracket(w=1.0, d=0.5, t=0.35):
    # Two boxes sharing an edge: an L cross-section extruded in z.
    def box(x0, x1, y0, y1, z0, z1, base):
        v = np.array([[x0, y0, z0], [x1, y0, z0], [x1, y1, z0],
                      [x0, y1, z0], [x0, y0, z1], [x1, y0, z1],
                      [x1, y1, z1], [x0, y1, z1]])
        quads = [[0, 1, 2, 3], [4, 7, 6, 5], [0, 4, 5, 1],
                 [1, 5, 6, 2], [2, 6, 7, 3], [3, 7, 4, 0]]
        f = []
        for q in quads:
            f += [[base + q[0], base + q[1], base + q[2]],
                  [base + q[0], base + q[2], base + q[3]]]
        return v, f
    v1, f1 = box(-w / 2, w / 2, 0, t, -d / 2, d / 2, 0)
    v2, f2 = box(-w / 2, -w / 2 + t, t, w, -d / 2, d / 2, 8)
    return np.concatenate([v1, v2]), np.array(f1 + f2, np.int32)


def main():
    os.makedirs(OUT, exist_ok=True)
    packs = {
        "torus_fat.obj": torus(1.0, 0.45),
        "torus_thin.obj": torus(1.0, 0.22, nu=16, nv=8),
        "bumpy_sphere_a.obj": bumpy_sphere(seed=1),
        "bumpy_sphere_b.obj": bumpy_sphere(n=8, amp=0.3, seed=2),
        "capsule.obj": capsule(),
        "capsule_squat.obj": capsule(r=0.7, h=0.5),
        "star6.obj": star_prism(6),
        "star4_tall.obj": star_prism(4, h=1.4),
        "l_bracket.obj": l_bracket(),
        "l_bracket_thick.obj": l_bracket(t=0.5, d=0.9),
    }
    for name, (v, f) in packs.items():
        if f.max() >= len(v):
            raise AssertionError(name)
        write_obj(os.path.join(OUT, name), v, f)
        print("%-22s %4d verts %4d tris" % (name, len(v), len(f)))


if __name__ == "__main__":
    sys.exit(main())
