"""Minimal OBJ mesh I/O and surface sampling (replaces trimesh/open3d, which are
not available in this environment).

Covers what the pipeline needs: vertex/face read-write (reference loads meshes
with trimesh/o3d at PMVO_utils.py:176-181,341-362; HairGrow.py:880-884) and
uniform area-weighted surface sampling with normals (o3d
`sample_points_uniformly` equivalent).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def load_obj(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Parse an OBJ file -> (vertices (V,3) float64, faces (F,3) int64).

    Handles `v x y z` and `f a b c` / `f a/b/c ...` lines; polygons are
    fan-triangulated. Ignores normals/uvs/materials.
    """
    v, fa, _, _ = load_obj_with_uv(path)
    return v, fa


def load_obj_with_uv(path: str):
    """Parse an OBJ with texture coordinates.

    Returns (vertices (V,3), faces (F,3), uvs (T,2), face_uvs (F,3) int64 or
    None) — face_uvs index into uvs per face corner.
    """
    verts, faces, uvs, face_uvs = [], [], [], []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                verts.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif line.startswith("vt "):
                parts = line.split()
                uvs.append([float(parts[1]), float(parts[2])])
            elif line.startswith("f "):
                toks = line.split()[1:]
                vidx, tidx = [], []
                for p in toks:
                    comp = p.split("/")
                    i = int(comp[0])
                    vidx.append(i - 1 if i > 0 else len(verts) + i)
                    if len(comp) > 1 and comp[1]:
                        t = int(comp[1])
                        tidx.append(t - 1 if t > 0 else len(uvs) + t)
                for k in range(1, len(vidx) - 1):
                    faces.append([vidx[0], vidx[k], vidx[k + 1]])
                    if len(tidx) == len(vidx):
                        face_uvs.append([tidx[0], tidx[k], tidx[k + 1]])
    v = np.array(verts, dtype=np.float64)
    fa = np.array(faces, dtype=np.int64) if faces else np.zeros((0, 3), np.int64)
    uv = np.array(uvs, dtype=np.float64) if uvs else np.zeros((0, 2))
    fuv = (np.array(face_uvs, dtype=np.int64)
           if face_uvs and len(face_uvs) == len(faces) else None)
    return v, fa, uv, fuv


def save_obj(path: str, vertices: np.ndarray, faces: Optional[np.ndarray] = None) -> None:
    with open(path, "w") as f:
        for v in vertices:
            f.write(f"v {v[0]:.8f} {v[1]:.8f} {v[2]:.8f}\n")
        if faces is not None:
            for face in faces:
                f.write(f"f {face[0] + 1} {face[1] + 1} {face[2] + 1}\n")


def face_normals(vertices: np.ndarray, faces: np.ndarray) -> np.ndarray:
    e1 = vertices[faces[:, 1]] - vertices[faces[:, 0]]
    e2 = vertices[faces[:, 2]] - vertices[faces[:, 0]]
    n = np.cross(e1, e2)
    return n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)


def vertex_normals(vertices: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals."""
    e1 = vertices[faces[:, 1]] - vertices[faces[:, 0]]
    e2 = vertices[faces[:, 2]] - vertices[faces[:, 0]]
    fn = np.cross(e1, e2)  # magnitude = 2*area
    vn = np.zeros_like(vertices)
    for k in range(3):
        np.add.at(vn, faces[:, k], fn)
    return vn / np.maximum(np.linalg.norm(vn, axis=-1, keepdims=True), 1e-12)


def sample_mesh_surface(vertices: np.ndarray, faces: np.ndarray, num_points: int,
                        rng: Optional[np.random.Generator] = None
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Uniform area-weighted surface sampling -> (points (N,3), normals (N,3)).

    Equivalent of o3d.sample_points_uniformly (used at HairGrow.py:881-884 to
    draw 60k scalp seeds and PMVO_utils.py:346 for colmap-mesh points).
    """
    rng = rng or np.random.default_rng(0)
    e1 = vertices[faces[:, 1]] - vertices[faces[:, 0]]
    e2 = vertices[faces[:, 2]] - vertices[faces[:, 0]]
    fn = np.cross(e1, e2)
    areas = 0.5 * np.linalg.norm(fn, axis=-1)
    probs = areas / max(areas.sum(), 1e-12)
    fidx = rng.choice(len(faces), size=num_points, p=probs)
    u = rng.random(num_points)
    v = rng.random(num_points)
    flip = u + v > 1.0
    u = np.where(flip, 1.0 - u, u)
    v = np.where(flip, 1.0 - v, v)
    pts = (vertices[faces[fidx, 0]]
           + u[:, None] * e1[fidx]
           + v[:, None] * e2[fidx])
    normals = fn[fidx] / np.maximum(np.linalg.norm(fn[fidx], axis=-1, keepdims=True), 1e-12)
    return pts, normals
