"""Raw point-cloud preparation for PMVO.

Mirror of load_colmap_points / SamplePointsAroundmesh (PMVO_utils.py:316-362):
sample the coarse NGP mesh surface uniformly (5x its vertex count), bin the
samples into a fine (512, 512, 384) grid, and emit `num_per_grid` jittered
samples per occupied voxel.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..constants import BUST_TO_ORIGIN, VOXEL_MIN
from ..io.mesh_io import load_obj, sample_mesh_surface


def sample_points_around_mesh(points_world: np.ndarray, bbox_min: np.ndarray,
                              vsize: float, num_per_grid: int = 4,
                              grid_resolution=(512, 512, 384),
                              rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Voxel-bin world points and draw jittered samples per occupied voxel
    (PMVO_utils.py:316-339). Jitter is uniform in [0, 1) voxel (corner anchor)."""
    rng = rng or np.random.default_rng(0)
    res = np.asarray(grid_resolution)
    p = points_world.copy()
    p[:, 1:] *= -1
    idx = np.round((p - bbox_min) / vsize).astype(np.int64)
    idx = np.clip(idx, 0, res - 1)
    flat = (idx[:, 0] * res[1] + idx[:, 1]) * res[2] + idx[:, 2]
    uniq = np.unique(flat)
    ux = uniq // (res[1] * res[2])
    uy = (uniq // res[2]) % res[1]
    uz = uniq % res[2]
    base = np.stack([ux, uy, uz], -1).astype(np.float64)
    base = np.repeat(base, num_per_grid, 0)
    sample = base + rng.random(base.shape)
    sample = sample * vsize + bbox_min
    sample[:, 1:] *= -1
    return sample.astype(np.float32)


def load_colmap_points(path: str, bbox_min=VOXEL_MIN,
                       bust_to_origin=BUST_TO_ORIGIN, vsize: float = 0.005 / 4,
                       grid_resolution=(512, 512, 384), num_per_grid: int = 4,
                       seed: int = 0) -> np.ndarray:
    """Load the coarse mesh and produce the PMVO query samples
    (PMVO_utils.py:341-362 + PMVO.py:843-845 call site)."""
    verts, faces = load_obj(path)
    rng = np.random.default_rng(seed)
    if len(faces):
        pts, _ = sample_mesh_surface(verts, faces, num_points=5 * len(verts), rng=rng)
    else:
        pts = verts
    pts = pts + np.asarray(bust_to_origin)
    return sample_points_around_mesh(pts, np.asarray(bbox_min), vsize,
                                     num_per_grid, grid_resolution, rng)
