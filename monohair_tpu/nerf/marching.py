"""Marching tetrahedra iso-surface extraction (vectorized numpy/JAX).

Replaces instant-ngp's CUDA marching cubes export (run.py:272-276). Each grid
cube splits into 6 tetrahedra; each tet contributes 0-2 triangles from a
16-case table. The mesh feeds surface *sampling* and depth rasterization only
(PMVO_utils.py:341-362, Render_utils.py:310-347), so triangle winding is
irrelevant and tetrahedra quality is equivalent to MC.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

# 6-tetrahedra cube decomposition sharing the 0-7 diagonal
# (corner k has coordinates _CUBE[k])
_TETS = np.array([[0, 1, 3, 7], [0, 1, 5, 7], [0, 2, 3, 7],
                  [0, 2, 6, 7], [0, 4, 5, 7], [0, 4, 6, 7]])

_CUBE = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
                  [0, 0, 1], [1, 0, 1], [0, 1, 1], [1, 1, 1]])

# tet edges: (vertex pair) indexed e0..e5
_TET_EDGES = np.array([[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]])

# case -> up to 2 triangles of edge ids (-1 = unused). bit i set = vertex i inside.
_CASES = -np.ones((16, 2, 3), np.int64)
_CASES[0b0001, 0] = [0, 1, 2]
_CASES[0b1110, 0] = [0, 2, 1]
_CASES[0b0010, 0] = [0, 3, 4]
_CASES[0b1101, 0] = [0, 4, 3]
_CASES[0b0100, 0] = [1, 3, 5]
_CASES[0b1011, 0] = [1, 5, 3]
_CASES[0b1000, 0] = [2, 4, 5]
_CASES[0b0111, 0] = [2, 5, 4]
_CASES[0b0011] = [[1, 2, 4], [1, 4, 3]]
_CASES[0b1100] = [[1, 4, 2], [1, 3, 4]]
_CASES[0b0101] = [[0, 2, 5], [0, 5, 3]]
_CASES[0b1010] = [[0, 5, 2], [0, 3, 5]]
_CASES[0b1001] = [[0, 1, 5], [0, 5, 4]]
_CASES[0b0110] = [[0, 5, 1], [0, 4, 5]]


def marching_tetrahedra(grid: np.ndarray, iso: float, chunk_z: int = 32,
                        use_native: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """(X, Y, Z) scalar grid -> (vertices (V, 3) in grid coords, faces (F, 3)).

    Prefers the C++ host kernel (monohair_tpu/native, ~100x the numpy path at
    256^3); this numpy implementation is the reference/fallback. Streams over
    z-slabs to bound memory. Vertices are not deduplicated (triangle soup) —
    fine for sampling/rasterization consumers.
    """
    if use_native:
        from ..native import marching_tetrahedra_native
        out = marching_tetrahedra_native(grid, iso)
        if out is not None:
            return out
    X, Y, Z = grid.shape
    verts_out = []
    for z0 in range(0, Z - 1, chunk_z):
        z1 = min(z0 + chunk_z + 1, Z)
        sub = grid[:, :, z0:z1]
        nx, ny, nz = X - 1, Y - 1, sub.shape[2] - 1
        base = np.stack(np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                                    indexing="ij"), -1).reshape(-1, 3)   # (C, 3)
        # cube corner values (C, 8) and positions
        cidx = base[:, None, :] + _CUBE[None]                            # (C, 8, 3)
        vals = sub[cidx[..., 0], cidx[..., 1], cidx[..., 2]]             # (C, 8)
        # skip cubes with no crossing
        inside8 = vals > iso
        active = inside8.any(1) & (~inside8.all(1))
        if not active.any():
            continue
        cidx, vals = cidx[active], vals[active]
        pos = cidx.astype(np.float64)
        pos[..., 2] += z0

        for tet in _TETS:
            tv = vals[:, tet]                                            # (C, 4)
            tp = pos[:, tet]                                             # (C, 4, 3)
            case = ((tv > iso) << np.arange(4)).sum(1)                   # (C,)
            hit = (case > 0) & (case < 15)
            if not hit.any():
                continue
            tvh, tph, caseh = tv[hit], tp[hit], case[hit]
            # all 6 edge intersection points (C, 6, 3)
            a = tvh[:, _TET_EDGES[:, 0]]
            b = tvh[:, _TET_EDGES[:, 1]]
            t = np.clip((iso - a) / np.where(np.abs(b - a) < 1e-12, 1e-12, b - a), 0, 1)
            pa = tph[:, _TET_EDGES[:, 0]]
            pb = tph[:, _TET_EDGES[:, 1]]
            epts = pa + (pb - pa) * t[..., None]                         # (C, 6, 3)
            tris = _CASES[caseh]                                         # (C, 2, 3)
            for k in range(2):
                sel = tris[:, k, 0] >= 0
                if not sel.any():
                    continue
                eids = tris[sel, k]                                      # (M, 3)
                tri_pts = epts[sel][np.arange(sel.sum())[:, None], eids]  # (M, 3, 3)
                verts_out.append(tri_pts.reshape(-1, 3))
    if not verts_out:
        return np.zeros((0, 3)), np.zeros((0, 3), np.int64)
    verts = np.concatenate(verts_out, 0)
    faces = np.arange(len(verts), dtype=np.int64).reshape(-1, 3)
    return verts, faces
