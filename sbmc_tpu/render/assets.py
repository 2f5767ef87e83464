"""OBJ mesh ingestion for the wavefront tracer.

The reference's training distribution leans on random .obj props placed in
the frustum (reference: sbmc/scene_generator/generators.py random model
placement via ObjConverter, converters.py:44-224). The wavefront tracer
consumes raw triangle arrays, so ingestion here is a direct .obj ->
(vertices, faces) parse plus normalization — no pbrt round-trip needed.

Design constraints of the tracer (no BVH; ray x triangle broadcast on the
VPU) make triangle COUNT the cost driver, so the pool enforces a per-mesh
face cap, and scenes pad their triangle arrays to a fixed bucket so every
scene compiles to the same XLA graph (degenerate zero-area triangles never
hit: Moeller-Trumbore det == 0, pathtracer._tri_ts).
"""

import os

import numpy as np

__all__ = ["load_obj", "normalize_mesh", "ObjPool"]


def load_obj(path, max_faces=None):
    """Parse a Wavefront .obj into (verts [V,3] f32, faces [F,3] i32).

    Supports ``v`` / ``f`` records, ``v/vt/vn`` face syntax, negative
    (relative) indices, and polygon fan triangulation. Everything else
    (normals, texcoords, materials, groups) is ignored — the tracer
    computes geometric normals and assigns its own materials.
    """
    verts, faces = [], []
    with open(path, "r", errors="replace") as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                verts.append([float(parts[1]), float(parts[2]),
                              float(parts[3])])
            elif line.startswith("f "):
                idx = []
                nv = len(verts)
                for tok in line.split()[1:]:
                    i = int(tok.split("/")[0])
                    idx.append(i - 1 if i > 0 else nv + i)
                for k in range(1, len(idx) - 1):   # fan triangulation
                    faces.append([idx[0], idx[k], idx[k + 1]])
                    if max_faces is not None and len(faces) > max_faces:
                        raise ValueError(
                            f"{path}: more than {max_faces} triangles")
    if not verts or not faces:
        raise ValueError(f"{path}: no geometry")
    v = np.asarray(verts, np.float32)
    f = np.asarray(faces, np.int32)
    if f.min() < 0 or f.max() >= len(v):
        raise ValueError(f"{path}: face index out of range")
    return v, f


def normalize_mesh(verts):
    """Center at the origin and scale to unit max-radius (so pool meshes
    compose with the same placement law as the procedural props)."""
    v = verts - verts.mean(0, keepdims=True)
    r = float(np.linalg.norm(v, axis=1).max())
    return v / max(r, 1e-8)


class ObjPool:
    """A lazily-loaded pool of .obj meshes for random scene synthesis.

    Args:
      source: a directory (searched recursively for ``*.obj``) or an
        explicit list of paths.
      max_faces: skip meshes with more triangles than this (brute-force
        tracer cost guard).
    """

    def __init__(self, source, max_faces=512):
        if isinstance(source, (list, tuple)):
            self.paths = list(source)
        else:
            self.paths = sorted(
                os.path.join(r, n)
                for r, _, names in os.walk(source)
                for n in names if n.lower().endswith(".obj"))
        if not self.paths:
            raise ValueError(f"no .obj files under {source!r}")
        self.max_faces = max_faces
        self._cache = {}
        self._bad = set()

    def __len__(self):
        return len(self.paths)

    def _load(self, path):
        if path in self._cache:
            return self._cache[path]
        v, f = load_obj(path, max_faces=self.max_faces)
        v = normalize_mesh(v)
        self._cache[path] = (v, f)
        return v, f

    def sample(self, rng):
        """A random (normalized_verts, faces) pair; unparseable/oversized
        entries are skipped (and remembered) rather than fatal."""
        order = rng.permutation(len(self.paths))
        for i in order:
            path = self.paths[int(i)]
            if path in self._bad:
                continue
            try:
                return self._load(path)
            except (ValueError, OSError, IndexError):
                self._bad.add(path)
        raise ValueError("every mesh in the pool failed to load")
