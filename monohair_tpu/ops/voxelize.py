"""Scatter-based voxelization of oriented point clouds.

The reference voxelizes with a Python dict keyed by "x_y_z" strings and runs a
per-voxel medoid-direction selection (PMVO.py:707-726 + PMVO_utils.py:366-382
`compute_points_similarity`). Here the whole operation is scatters over flat
voxel ids — O(N) with no host loop.

Direction aggregation is the principal eigenvector of the per-voxel orientation
matrix sum(d d^T) (power iteration, fully vectorized): the textbook
sign-agnostic axis average. Measured against the reference's medoid on
realistic bundles (tests/test_ops.py::test_voxelize_mean_vs_medoid_deviation_stat):
the eigenvector lands *closer to the true direction than the medoid itself*
(median 4.2 deg vs 6.0 deg error at ~15 deg member noise); a naive
y<=0-canonicalized mean is NOT safe — it cancels catastrophically for
directions near the y=0 plane (p95 55 deg), which is why this module does not
use it.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import GRID_RESOLUTION, VOXEL_MIN, VOXEL_SIZE
from ..coords import flat_voxel_id, voxel_indices


def canonicalize_down(dirs: jnp.ndarray) -> jnp.ndarray:
    """Flip direction vectors so the y component is <= 0 (PMVO.py:702-703)."""
    return jnp.where(dirs[..., 1:2] > 0, -dirs, dirs)


@partial(jax.jit, static_argnames=("grid_resolution",))
def voxelize_directions(points: jnp.ndarray, dirs: jnp.ndarray,
                        weights: Optional[jnp.ndarray] = None,
                        grid_resolution: Tuple[int, int, int] = tuple(int(x) for x in GRID_RESOLUTION),
                        voxel_min=None, voxel_size: float = VOXEL_SIZE
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Voxelize (N, 3) world points with (N, 3) directions.

    Returns (occ (X,Y,Z) float32 in {0,1}, ori (X,Y,Z,3) unit mean directions).
    ``weights`` (N,) optionally masks out points (0 = ignore).
    """
    res = np.array(grid_resolution, np.int32)
    vmin = VOXEL_MIN if voxel_min is None else voxel_min
    idx = voxel_indices(points, vmin, voxel_size, res)
    ids = flat_voxel_id(idx, res)
    nvox = int(res[0] * res[1] * res[2])

    d = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
    w = jnp.ones(points.shape[0], points.dtype) if weights is None else weights
    counts = jnp.zeros(nvox, points.dtype).at[ids].add(w)
    # orientation (scatter) matrix: the 6 unique entries of sum(w * d d^T)
    outer = jnp.stack([d[:, 0] * d[:, 0], d[:, 1] * d[:, 1], d[:, 2] * d[:, 2],
                       d[:, 0] * d[:, 1], d[:, 0] * d[:, 2], d[:, 1] * d[:, 2]],
                      -1) * w[:, None]
    M6 = jnp.zeros((nvox, 6), points.dtype).at[ids].add(outer)

    occ = (counts > 0).astype(jnp.float32)
    ori = principal_axis(M6)
    # store with y <= 0 like the reference's pre-voxelize flip (PMVO.py:702-703)
    ori = canonicalize_down(ori) * occ[:, None]
    X, Y, Z = grid_resolution
    return occ.reshape(X, Y, Z), ori.reshape(X, Y, Z, 3)


def principal_axis(M6: jnp.ndarray, iters: int = 12) -> jnp.ndarray:
    """Largest eigenvector of symmetric 3x3 matrices given as (..., 6) packed
    [xx, yy, zz, xy, xz, yz] — power iteration, initialized from the column
    with the largest diagonal entry (never orthogonal to the principal axis)."""
    xx, yy, zz, xy, xz, yz = jnp.moveaxis(M6, -1, 0)
    M = jnp.stack([jnp.stack([xx, xy, xz], -1),
                   jnp.stack([xy, yy, yz], -1),
                   jnp.stack([xz, yz, zz], -1)], -2)          # (..., 3, 3)
    diag = jnp.stack([xx, yy, zz], -1)
    start = jnp.argmax(diag, -1)
    v = jnp.take_along_axis(M, start[..., None, None], -1)[..., 0]
    v = v + 1e-12
    for _ in range(iters):
        v = jnp.einsum("...ij,...j->...i", M, v)
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    return v


def mean_direction(dirs: jnp.ndarray) -> jnp.ndarray:
    """Sign-agnostic consensus direction of (N, K, 3) neighbor bundles -> (N, 3).

    TPU replacement for `compute_points_similarity` (PMVO_utils.py:366-382):
    canonicalize to a common hemisphere against the bundle's principal member,
    average, then snap to the member with maximal |cos| to the mean (the
    reference returns an actual member, the medoid).
    """
    # canonicalize against the first member to avoid sign cancellation
    ref = dirs[:, :1]
    sgn = jnp.sign(jnp.sum(dirs * ref, -1, keepdims=True))
    sgn = jnp.where(sgn == 0, 1.0, sgn)
    aligned = dirs * sgn
    mean = jnp.sum(aligned, 1)
    mean = mean / jnp.maximum(jnp.linalg.norm(mean, axis=-1, keepdims=True), 1e-6)
    # snap to nearest member (sign-agnostic)
    cos = jnp.abs(jnp.sum(dirs * mean[:, None], -1) /
                  jnp.maximum(jnp.linalg.norm(dirs, axis=-1), 1e-6))
    best = jnp.argmax(cos, 1)
    return jnp.take_along_axis(dirs, best[:, None, None], 1)[:, 0]
