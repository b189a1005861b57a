"""Training-sample generation for the occupancy/orientation nets.

Mirror of sampleOcc (submodules/DeepMVSHair/sampleOcc.py:128-169): positives
inside occupied voxels (6/voxel), near-negatives in the one-ring shell (4/voxel),
far negatives subsampled 10x (1/voxel), each jittered uniformly inside its voxel.
The reference ships these samplers but not the training loop; see train.py.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.pool3d import max_pool3d


def rand_samples_from_grid(indices: np.ndarray, per_grid: int,
                           rng: np.random.Generator) -> np.ndarray:
    base = np.repeat(indices.astype(np.float32), per_grid, 0)
    return base + rng.random(base.shape).astype(np.float32)


def sample_occ_training_points(occ: np.ndarray, kernel: int = 5, seed: int = 0,
                               pos_per_grid: int = 6, near_per_grid: int = 4,
                               far_stride: int = 10
                               ) -> Tuple[np.ndarray, np.ndarray]:
    """(voxel-space points (N, 3), labels (N,) int) from an (X, Y, Z) occ grid."""
    rng = np.random.default_rng(seed)
    occ_j = jnp.asarray(occ)
    enlarged = np.asarray(max_pool3d(occ_j, kernel))
    pos_idx = np.argwhere(occ > 0)
    near_idx = np.argwhere((enlarged > 0) & (occ == 0))
    far_idx = np.argwhere(enlarged == 0)[::far_stride]

    pos = rand_samples_from_grid(pos_idx, pos_per_grid, rng)
    near = rand_samples_from_grid(near_idx, near_per_grid, rng)
    far = rand_samples_from_grid(far_idx, 1, rng)
    pts = np.concatenate([pos, near, far], 0)
    labels = np.concatenate([np.ones(len(pos)), np.zeros(len(near) + len(far))])
    return pts, labels.astype(np.int32)


def sample_ori_training_points(occ: np.ndarray, ori: np.ndarray, seed: int = 0,
                               per_grid: int = 6) -> Tuple[np.ndarray, np.ndarray]:
    """Points inside occupied voxels paired with the voxel's direction
    (OriDataset semantics: supervised only where occupancy is positive)."""
    rng = np.random.default_rng(seed)
    # occ may be a morphologically closed volume (make_mvs_cases.py) whose
    # interior voxels carry no direction; supervise only where ori is defined
    pos_idx = np.argwhere((occ > 0) & (np.linalg.norm(ori, axis=-1) > 1e-6))
    pts = rand_samples_from_grid(pos_idx, per_grid, rng)
    dirs = np.repeat(ori[pos_idx[:, 0], pos_idx[:, 1], pos_idx[:, 2]], per_grid, 0)
    return pts, dirs.astype(np.float32)
