"""Chunked drivers for the PMVO stage: optimize -> refine -> voxelize.

Mirrors the stage flow of PMVO.py main (:805-880): filter raw samples, run the
line search per chunk, KNN-consensus refine, threshold, voxelize to the
256x256x192 Occ/Ori grids. Artifacts (optimize/select_p.npy etc., refine/*.npy,
Ori3D.mat/Occ3D.mat) keep the reference names so stages are interchangeable.

The chunk loop is a host loop over a single jitted step; pass a
`jax.sharding.Mesh` to shard each chunk over the point axis across devices.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import GRID_RESOLUTION, VOXEL_MIN, VOXEL_SIZE
from ..ops.neighbors import build_buckets, neighborhood_consensus_direction
from ..ops.voxelize import canonicalize_down, voxelize_directions
from ..parallel.sharding import shard_batch
from .solver import (PMVOMaps, compute_unvisible_points, filter_points,
                     pmvo_forward, pmvo_refine_loss)


def _pad_to(arr: np.ndarray, size: int):
    pad = size - arr.shape[0]
    if pad <= 0:
        return arr, arr.shape[0]
    reps = np.repeat(arr[-1:], pad, 0)
    return np.concatenate([arr, reps], 0), size - pad


def auto_chunk(num_views: int, target: int = 8192, base_views: int = 16,
               minimum: int = 2048) -> int:
    """Point-chunk size scaled to the view count: the working set is
    O(V * N * S), so a 150-view capture (big_wavy1 after frame selection) gets
    ~1/9 the chunk of the 16-view rig. Rounded to a multiple of 1024."""
    n = int(target * base_views / max(num_views, 1))
    return max(minimum, (n // 1024) * 1024)


def optimize_points(maps: PMVOMaps, points: np.ndarray, patch_size: int,
                    conf_threshold: float, chunk: Optional[int] = None,
                    mesh: Optional[jax.sharding.Mesh] = None,
                    save_root: Optional[str] = None
                    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Run the PMVO line search over all points in fixed-size chunks.

    Returns (points, ori, min_loss, high_conf). Mirror of `optimize`
    (PMVO.py:565-595) with the 5000-point chunks replaced by padded chunks
    (auto-sized from the view count when not given; one compiled program,
    optionally sharded over a mesh).
    """
    if chunk is None:
        chunk = auto_chunk(maps.cameras.num_views)
    fwd = partial(pmvo_forward, patch_size=patch_size, conf_threshold=conf_threshold)
    fwd = jax.jit(fwd)

    out_p, out_o, out_l, out_h = [], [], [], []
    n = points.shape[0]
    for beg in range(0, n, chunk):
        sub = points[beg:beg + chunk].astype(np.float32)
        sub_padded, valid = _pad_to(sub, chunk)
        batch = shard_batch(jnp.asarray(sub_padded), mesh)
        p, o, l, h = fwd(maps, batch)
        out_p.append(np.asarray(p)[:valid])
        out_o.append(np.asarray(o)[:valid])
        out_l.append(np.asarray(l)[:valid])
        out_h.append(np.asarray(h)[:valid])
    points_o = np.concatenate(out_p)
    ori = np.concatenate(out_o)
    loss = np.concatenate(out_l)
    high_conf = np.concatenate(out_h)
    if save_root:
        os.makedirs(save_root, exist_ok=True)
        np.save(os.path.join(save_root, "select_p.npy"), points_o)
        np.save(os.path.join(save_root, "select_o.npy"), ori)
        np.save(os.path.join(save_root, "min_loss.npy"), loss)
        np.save(os.path.join(save_root, "high_conf_index.npy"), high_conf)
    return points_o, ori, loss, high_conf


def filter_raw_points(maps: PMVOMaps, points: np.ndarray, patch_size: int,
                      conf_threshold: float, visible_threshold: float,
                      chunk: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
    """Chunked boolean classification of raw samples (PMVO.py:535-557)."""
    if chunk is None:
        chunk = 8 * auto_chunk(maps.cameras.num_views)  # no S axis here
    fp = jax.jit(partial(filter_points, patch_size=patch_size,
                         conf_threshold=conf_threshold,
                         visible_threshold=visible_threshold))
    surf, filt = [], []
    for beg in range(0, points.shape[0], chunk):
        sub, valid = _pad_to(points[beg:beg + chunk].astype(np.float32), chunk)
        s, f = fp(maps, jnp.asarray(sub))
        surf.append(np.asarray(s)[:valid])
        filt.append(np.asarray(f)[:valid])
    return np.concatenate(surf), np.concatenate(filt)


def filter_head_points_mask(maps: PMVOMaps, points: jnp.ndarray,
                            visible_threshold: float,
                            scalp_points: Optional[np.ndarray] = None,
                            scalp_max_z: Optional[float] = None) -> jnp.ndarray:
    """Device part of PMVO.filter_head_points (PMVO.py:96-144): True = drop.

    A point is dropped when at least half of its visible views see it outside
    the hair mask; points within 4 cm of the scalp (and below its top) are
    always kept (host KD-query when scalp_points given).
    """
    from ..camera import pixel_index_and_validity, project
    from ..ops.grid_sample import gather_pixels
    H, W = maps.image_size
    uv, z = project(maps.cameras, points)
    rc, _ = pixel_index_and_validity(uv, (H, W))
    d = jax.vmap(gather_pixels)(maps.depth, rc)
    m = jax.vmap(gather_pixels)(maps.mask, rc)
    m = jnp.where(m > 0.2, 1.0, m)
    unvis = jnp.where((-z / 2.0 * 255.0) - d >= visible_threshold, 1.0, 0.0)
    vis = 1.0 - unvis
    index = vis * m
    filt = ~((jnp.sum(vis, 0) - jnp.sum(index, 0)) < jnp.sum(vis, 0) * 0.5)

    if scalp_points is not None and len(scalp_points):
        from scipy.spatial import cKDTree
        tree = cKDTree(scalp_points)
        dist, _ = tree.query(np.asarray(points), k=1)
        top = scalp_max_z if scalp_max_z is not None else scalp_points[:, 2].max()
        head_top = (dist < 0.04) & (np.asarray(points)[:, 2] < top - 0.01)
        filt = filt & ~jnp.asarray(head_top)
    return filt


def refine_and_voxelize(maps: PMVOMaps, points: np.ndarray, ori: np.ndarray,
                        loss: np.ndarray, filter_unvisible_points: np.ndarray,
                        patch_size: int, conf_threshold: float,
                        visible_threshold: float, threshold: float,
                        scalp_points: Optional[np.ndarray] = None,
                        coarse_raw: Optional[np.ndarray] = None,
                        chunk: int = 65536, save_root: Optional[str] = None
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Consensus-refine directions, add near-surface/interior points, voxelize.

    Mirror of `refine` (PMVO.py:602-764). Returns (occ (X,Y,Z), ori (X,Y,Z,3))
    in this framework's in-memory layout; the caller saves via mat_io.

    - consensus: voxel-bucket neighborhood mean (replaces scipy 100-NN)
    - replace a point's direction when its consensus disagrees (cos < 0.95)
    - re-score all directions with the single-sample projection loss
    - select loss < threshold; attach filtered-unvisible points with consensus
      directions; optionally fuse coarse interior points (raw.npy) that are
      invisible in fewer than 3 views
    """
    pts_j = jnp.asarray(points.astype(np.float32))
    ori_j = jnp.asarray(ori.astype(np.float32))
    buckets = build_buckets(pts_j)

    refine_step = jax.jit(partial(pmvo_refine_loss, patch_size=patch_size,
                                  conf_threshold=conf_threshold))
    new_ori = np.empty_like(ori, dtype=np.float32)
    new_loss = np.empty_like(loss, dtype=np.float32)
    n = points.shape[0]
    for beg in range(0, n, chunk):
        end = min(beg + chunk, n)
        q = pts_j[beg:end]
        qd = ori_j[beg:end]
        center = neighborhood_consensus_direction(buckets, ori_j, q, qd)
        sim = jnp.abs(jnp.sum(center * qd, -1))
        cand = jnp.where((sim < 0.95)[:, None], center, qd)
        q_pad, valid = _pad_to(np.asarray(q), chunk)
        c_pad, _ = _pad_to(np.asarray(cand), chunk)
        l = refine_step(maps, jnp.asarray(q_pad), jnp.asarray(c_pad))[:valid]
        head = filter_head_points_mask(maps, q, visible_threshold, scalp_points)
        l = jnp.where(head, 0.5, l)  # reference sets -1 then maps -1 -> 0.5
        new_ori[beg:end] = np.asarray(cand)
        new_loss[beg:end] = np.asarray(l)

    if save_root:
        os.makedirs(save_root, exist_ok=True)
        np.save(os.path.join(save_root, "select_p.npy"), points)
        np.save(os.path.join(save_root, "select_o.npy"), new_ori)
        np.save(os.path.join(save_root, "min_loss.npy"), new_loss)

    keep = new_loss < threshold
    sel_p = points[keep].astype(np.float32)
    sel_o = new_ori[keep]

    # near-surface invisible points inherit the consensus of selected neighbors
    if filter_unvisible_points is not None and len(filter_unvisible_points):
        sel_buckets = build_buckets(jnp.asarray(sel_p))
        fu = jnp.asarray(filter_unvisible_points.astype(np.float32))
        fu_dir = neighborhood_consensus_direction(
            sel_buckets, jnp.asarray(sel_o), fu,
            jnp.zeros_like(fu).at[:, 1].set(-1.0))
        head = filter_head_points_mask(maps, fu, visible_threshold, scalp_points)
        keep_fu = ~np.asarray(head)
        fu_np = np.asarray(fu)[keep_fu]
        fu_dir_np = np.asarray(fu_dir)[keep_fu]
        if save_root:
            np.save(os.path.join(save_root, "filter_unvisible.npy"), fu_np)
            np.save(os.path.join(save_root, "filter_unvisible_ori.npy"), fu_dir_np)
        sel_p = np.concatenate([sel_p, fu_np], 0)
        sel_o = np.concatenate([sel_o, fu_dir_np], 0)

    sel_o = np.asarray(canonicalize_down(jnp.asarray(sel_o)))
    occ, ori_grid = voxelize_directions(jnp.asarray(sel_p), jnp.asarray(sel_o))
    # np.array (copy): np.asarray of a device array is a read-only view and the
    # coarse-fusion branch writes into these grids
    occ, ori_grid = np.array(occ), np.array(ori_grid)

    # fuse coarse interior (infer_inner branch, PMVO.py:733-751)
    if coarse_raw is not None and len(coarse_raw):
        c_pts = coarse_raw[:, :3].astype(np.float32)
        c_ori = coarse_raw[:, 3:6].astype(np.float32)
        c_ori = np.asarray(canonicalize_down(jnp.asarray(c_ori)))
        unvis = []
        import time as _time
        _t0 = _time.monotonic()
        n_chunks = (len(c_pts) + chunk - 1) // chunk
        for k, beg in enumerate(range(0, len(c_pts), chunk)):
            sub, valid = _pad_to(c_pts[beg:beg + chunk], chunk)
            u = compute_unvisible_points(maps, jnp.asarray(sub))
            unvis.append(np.asarray(u)[:valid])
            if k % 64 == 0:
                # device-bound loops look like hangs from the host without
                # progress at log points (CLAUDE.md)
                print(f"[pmvo] fuse chunk {k + 1}/{n_chunks} "
                      f"({_time.monotonic() - _t0:.0f}s)", flush=True)
        unvis = np.concatenate(unvis)
        from ..coords import voxel_indices as vidx
        iv = np.asarray(vidx(jnp.asarray(c_pts[unvis])))
        occ[iv[:, 0], iv[:, 1], iv[:, 2]] = 1
        ori_grid[iv[:, 0], iv[:, 1], iv[:, 2]] = c_ori[unvis]
        if save_root:
            np.save(os.path.join(save_root, "coarse.npy"), c_pts[unvis])
            np.save(os.path.join(save_root, "coarse_ori.npy"), c_ori[unvis])

    return occ, ori_grid
