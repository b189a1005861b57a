"""Voxel/world transform inverses and NGP frame converter round trips."""

import jax.numpy as jnp
import numpy as np

from monohair_tpu.coords import (flat_voxel_id, nerf_to_ngp, ngp_to_nerf,
                                 voxel_indices, voxel_to_world, world_to_voxel,
                                 world_dir_to_voxel)
from monohair_tpu.constants import GRID_RESOLUTION, VOXEL_MIN, VOXEL_SIZE


def test_world_voxel_roundtrip(rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32) * 0.2
    v = world_to_voxel(jnp.asarray(pts))
    back = voxel_to_world(v)
    np.testing.assert_allclose(np.asarray(back), pts, rtol=1e-4, atol=1e-5)


def test_world_to_voxel_matches_reference_p2v(rng):
    """p2v (PMVO_utils.py:386-404): flip y/z, offset, scale, round, clip."""
    pts = (rng.normal(size=(200, 3)) * 0.3).astype(np.float32)
    idx = np.asarray(voxel_indices(jnp.asarray(pts)))
    ref_pts = pts.copy()
    ref_pts[:, 1:] *= -1
    ref = np.round((ref_pts - VOXEL_MIN) / VOXEL_SIZE).astype(np.int32)
    ref = np.clip(ref, 0, np.asarray(GRID_RESOLUTION) - 1)
    np.testing.assert_array_equal(idx, ref)


def test_direction_flip_involution(rng):
    d = rng.normal(size=(10, 3)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(world_dir_to_voxel(world_dir_to_voxel(jnp.asarray(d)))), d)


def test_flat_voxel_id_unique_within_grid():
    res = np.array([4, 5, 6])
    xs, ys, zs = np.meshgrid(np.arange(4), np.arange(5), np.arange(6), indexing="ij")
    idx = np.stack([xs, ys, zs], -1).reshape(-1, 3)
    ids = np.asarray(flat_voxel_id(jnp.asarray(idx), res))
    assert len(np.unique(ids)) == 4 * 5 * 6
    assert ids.max() == 4 * 5 * 6 - 1


def test_ngp_roundtrip(rng):
    # random rotation via QR
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    c2w = np.eye(4)
    c2w[:3, :3] = q
    c2w[:3, 3] = rng.normal(size=3)
    m = nerf_to_ngp(c2w)
    back = ngp_to_nerf(m[:, :3], m[:, 3])
    np.testing.assert_allclose(back, c2w, rtol=1e-6, atol=1e-8)
