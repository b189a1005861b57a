"""World <-> voxel coordinate transforms and the NeRF/NGP frame converters.

The world->voxel map *negates y and z*, then rescales into grid indices
(reference: PMVO_utils.py:386-421 `p2v`/`points_to_voxel`/`voxel_to_points`,
HairGrow.py:22-36). All functions here are pure and jittable; numpy arrays also
work (jnp ops accept them).

NGP frame converters mirror Utils/ingp_utils.py:9-44 (`nerf_to_ngp`/`ngp_to_nerf`):
NGP stores camera matrices with axes swapped (x,y,z)->(y,z,x), translation scaled
by 0.33 and offset by 0.5, and the y/z columns negated.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from .constants import GRID_RESOLUTION, VOXEL_MIN, VOXEL_SIZE


def world_to_voxel(points: jnp.ndarray, voxel_min=VOXEL_MIN, voxel_size=VOXEL_SIZE) -> jnp.ndarray:
    """(..., 3) world points -> continuous voxel coordinates (PMVO_utils.py:415-421)."""
    points = jnp.asarray(points, jnp.float32)
    flipped = points * jnp.array([1.0, -1.0, -1.0], points.dtype)
    return (flipped - jnp.asarray(voxel_min, points.dtype)) / voxel_size


def voxel_to_world(voxels: jnp.ndarray, voxel_min=VOXEL_MIN, voxel_size=VOXEL_SIZE) -> jnp.ndarray:
    """(..., 3) continuous voxel coordinates -> world points (PMVO_utils.py:407-413)."""
    voxels = jnp.asarray(voxels, jnp.float32)  # host float64 arrays truncate anyway
    pts = voxels * voxel_size + jnp.asarray(voxel_min, voxels.dtype)
    return pts * jnp.array([1.0, -1.0, -1.0], pts.dtype)


def world_dir_to_voxel(dirs: jnp.ndarray) -> jnp.ndarray:
    """Direction vectors transform with the y/z negation only (HairGrow.py:894)."""
    return dirs * jnp.array([1.0, -1.0, -1.0], dirs.dtype)


voxel_dir_to_world = world_dir_to_voxel  # the map is an involution


def voxel_indices(points: jnp.ndarray, voxel_min=VOXEL_MIN, voxel_size=VOXEL_SIZE,
                  grid_resolution=GRID_RESOLUTION) -> jnp.ndarray:
    """(..., 3) world points -> integer (x, y, z) grid indices, rounded and clamped.

    Mirror of `p2v` (PMVO_utils.py:386-404), which rounds to nearest.
    """
    idx = jnp.round(world_to_voxel(points, voxel_min, voxel_size)).astype(jnp.int32)
    res = jnp.asarray(grid_resolution, jnp.int32)
    return jnp.clip(idx, 0, res - 1)


def flat_voxel_id(idx: jnp.ndarray, grid_resolution=GRID_RESOLUTION) -> jnp.ndarray:
    """(..., 3) integer indices -> flat ids x*(Ry*Rz) + y*Rz + z."""
    rx, ry, rz = int(grid_resolution[0]), int(grid_resolution[1]), int(grid_resolution[2])
    del rx
    return (idx[..., 0] * ry + idx[..., 1]) * rz + idx[..., 2]


# ---------------------------------------------------------------------------
# NeRF <-> NGP camera-matrix conversions (numpy; host-side plumbing).
# ---------------------------------------------------------------------------

_NGP_OFFSET = np.array([0.5, 0.5, 0.5])
_NGP_SCALE = 0.33


def nerf_to_ngp(xf: np.ndarray) -> np.ndarray:
    """4x4 (or 3x4) NeRF c2w matrix -> 3x4 NGP matrix (ingp_utils.py:9-22)."""
    mat = np.array(xf, dtype=np.float64)[:3, :].copy()
    mat[:, 1] *= -1
    mat[:, 2] *= -1
    mat[:, 3] = mat[:, 3] * _NGP_SCALE + _NGP_OFFSET
    return mat[[1, 2, 0], :]


def ngp_to_nerf(rot: np.ndarray, trans: np.ndarray) -> np.ndarray:
    """3x3 rotation + 3 translation in NGP frame -> 4x4 NeRF c2w (ingp_utils.py:35-44)."""
    mat = np.eye(4)
    mat[:3, :3] = rot
    mat[:3, 3] = trans
    mat = mat[[2, 0, 1, 3], :]
    mat[:3, 3] -= _NGP_OFFSET
    mat[:3, 3] /= _NGP_SCALE
    mat[:, 2] *= -1
    mat[:, 1] *= -1
    return mat


def grid_world_bounds() -> Tuple[np.ndarray, np.ndarray]:
    """World-frame AABB covered by the Occ/Ori grid (accounting for y/z flips)."""
    lo_v = VOXEL_MIN
    hi_v = VOXEL_MIN + VOXEL_SIZE * GRID_RESOLUTION.astype(np.float32)
    corners_v = np.array([lo_v, hi_v])
    corners_w = corners_v * np.array([1.0, -1.0, -1.0])
    return corners_w.min(0), corners_w.max(0)
