"""Voxel-bucket neighborhood gathering — the TPU replacement for the reference's
scipy KDTree 100-NN queries in the PMVO refine pass (PMVO.py:608-641).

Points are bucketed into the reconstruction grid (capped entries per voxel via a
sort + rank), and each query point gathers all entries of its 3x3x3 surrounding
voxels. At the fine grid resolution (2.5 mm voxels, ~4-32 samples per occupied
voxel) this covers the same support as the reference's 100-NN with no host
round-trip and no tree build.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import GRID_RESOLUTION, VOXEL_MIN, VOXEL_SIZE
from ..coords import flat_voxel_id, voxel_indices


class VoxelBuckets(NamedTuple):
    table: jnp.ndarray        # (num_voxels * cap,) int32 point indices, -1 = empty
    cap: int
    grid_resolution: Tuple[int, int, int]
    voxel_min: jnp.ndarray
    voxel_size: float


def build_buckets(points: jnp.ndarray, cap: int = 8,
                  grid_resolution=None, voxel_min=None,
                  voxel_size: float = VOXEL_SIZE) -> VoxelBuckets:
    """Bucket (N, 3) world points into the grid, keeping at most `cap` per voxel."""
    res = tuple(int(x) for x in (GRID_RESOLUTION if grid_resolution is None else grid_resolution))
    vmin = VOXEL_MIN if voxel_min is None else voxel_min
    n = points.shape[0]
    ids = flat_voxel_id(voxel_indices(points, vmin, voxel_size, np.array(res)), np.array(res))
    order = jnp.argsort(ids)
    sorted_ids = ids[order]
    first = jnp.searchsorted(sorted_ids, sorted_ids, side="left")
    rank = jnp.arange(n) - first
    keep = rank < cap
    nvox = res[0] * res[1] * res[2]
    slot = jnp.where(keep, sorted_ids * cap + rank, nvox * cap)  # overflow -> dropped
    table = jnp.full(nvox * cap + 1, -1, jnp.int32).at[slot].set(
        order.astype(jnp.int32))[:-1]
    return VoxelBuckets(table, cap, res, jnp.asarray(vmin), voxel_size)


_OFFSETS_3 = np.stack(np.meshgrid(*[np.arange(-1, 2)] * 3, indexing="ij"), -1).reshape(-1, 3)


def gather_neighbors(buckets: VoxelBuckets, query_points: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """For (M, 3) query points, return (M, 27*cap) neighbor point indices and a
    validity mask (False where the slot was empty or out of grid)."""
    res = np.array(buckets.grid_resolution)
    idx = voxel_indices(query_points, buckets.voxel_min, buckets.voxel_size, res)
    nb = idx[:, None, :] + jnp.asarray(_OFFSETS_3)            # (M, 27, 3)
    in_grid = jnp.all((nb >= 0) & (nb < jnp.asarray(res)), -1)
    nb = jnp.clip(nb, 0, jnp.asarray(res) - 1)
    vox = flat_voxel_id(nb, res)                              # (M, 27)
    slots = vox[..., None] * buckets.cap + jnp.arange(buckets.cap)  # (M, 27, cap)
    entries = buckets.table[slots.reshape(slots.shape[0], -1)]      # (M, 27*cap)
    valid = (entries >= 0) & jnp.repeat(in_grid, buckets.cap, -1)
    return jnp.where(valid, entries, 0), valid


def neighborhood_consensus_direction(buckets: VoxelBuckets, all_dirs: jnp.ndarray,
                                     query_points: jnp.ndarray,
                                     query_dirs: jnp.ndarray) -> jnp.ndarray:
    """Sign-agnostic consensus direction over each query's spatial neighborhood.

    TPU equivalent of the refine pass's `ori[KDTree.query(p, 100)]` +
    compute_points_similarity (PMVO.py:612-626): canonicalize neighbors against
    the query's own direction, average, renormalize.
    """
    entries, valid = gather_neighbors(buckets, query_points)
    nbr = all_dirs[entries]                                   # (M, K, 3)
    ref = query_dirs[:, None, :]
    sgn = jnp.sign(jnp.sum(nbr * ref, -1, keepdims=True))
    sgn = jnp.where(sgn == 0, 1.0, sgn)
    aligned = nbr * sgn * valid[..., None]
    mean = jnp.sum(aligned, 1)
    norm = jnp.linalg.norm(mean, axis=-1, keepdims=True)
    return jnp.where(norm > 1e-6, mean / jnp.maximum(norm, 1e-6), query_dirs)
