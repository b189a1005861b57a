"""Core PMVO math as pure jittable functions.

Reference: PMVO.py class PMVO (:13-533). Shapes: V views, N points (a chunk),
S = 90 depth samples, P = patch_size**2 patch taps.

The reference's `forward` (PMVO.py:39-78) projects each 5000-point chunk into
every view with Python loops over views and candidate base views, materializing
(V, N, S, P) intermediates. Here:
  * view loops    -> stacked (V, ...) tensors, one gather per map
  * base-view loop-> `lax.scan` over the 10 candidates (constant memory)
  * patch loop    -> `lax.fori_loop` streaming min over the P taps
so peak memory is O(V*N*S) and everything fuses under one jit.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..camera import (Cameras, depth_to_z, ndc_to_pixel, pixel_index_and_validity,
                      pixel_to_ndc, project, unproject)
from ..ops.grid_sample import gather_pixels


class PMVOMaps(NamedTuple):
    """Per-view observation maps, stacked over the view axis.

    depth: (V, H, W) on the 0..255 disk scale; ori2d: (V, H, W, 2) = (sin, cos);
    conf: (V, H, W) in [0, 1]; mask: (V, H, W) in [0, 1].
    """
    cameras: Cameras
    depth: jnp.ndarray
    ori2d: jnp.ndarray
    conf: jnp.ndarray
    mask: jnp.ndarray

    @property
    def image_size(self) -> Tuple[int, int]:
        return self.depth.shape[1], self.depth.shape[2]

    def astype(self, dtype) -> "PMVOMaps":
        """Cast map storage (bf16 halves HBM for ~150-view captures; the loss
        math upcasts to f32 after the gathers)."""
        return PMVOMaps(self.cameras, self.depth.astype(dtype),
                        self.ori2d.astype(dtype), self.conf.astype(dtype),
                        self.mask.astype(dtype))


def depth_sample_offsets(num_sample: int = 90) -> np.ndarray:
    """The 90 non-uniform depth offsets of the line search (PMVO.py:274-278):
    coarse on [-5, -1]mm and [1, 5]mm, dense on [-1, 1]mm."""
    s1 = np.arange(-0.005, -0.001, 0.004 / (num_sample / 4))
    s2 = np.arange(-0.001, 0.001, 0.002 / (num_sample / 2))
    s3 = np.arange(0.001, 0.005, 0.004 / (num_sample / 4))
    return np.concatenate([s1, s2, s3])[:num_sample].astype(np.float32)


def compute_visible(render_depth: jnp.ndarray, z255: jnp.ndarray) -> jnp.ndarray:
    """Soft visibility in [-1, 1] (PMVO.py:525-529): 1 at the surface, ramping
    to 0 over 0.1 depth units behind it, -1 when occluded."""
    vis = jnp.where(z255 - render_depth < 0.1, 1.0 - (z255 - render_depth) / 0.1, -1.0)
    return jnp.clip(vis, -1.0, 1.0)


def observe_points(maps: PMVOMaps, points: jnp.ndarray, patch_size: int,
                   use_pallas: Optional[bool] = None):
    """Project (N, 3) points into all views and gather every per-view quantity.

    Mirror of Compute_Visible_and_Ori (PMVO.py:346-376). Returns a dict of
    (V, N, ...) arrays: uv (NDC), z, rc, invalid, depth, visible, ori, conf,
    mask, ori_patch (V,N,P,2), conf_patch (V,N,P).

    On TPU the patch fetch runs as per-window strided DMA
    (ops/pallas_kernels.patch_gather_dma) — the XLA per-element gather was
    ~half the whole PMVO forward (426 ms / 879 ms at V=16, N=32k).
    """
    from ..ops.pallas_kernels import patch_gather_dma, patch_gather_reference
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    H, W = maps.image_size
    uv, z = project(maps.cameras, points)                     # (V,N,2),(V,N)
    rc, invalid = pixel_index_and_validity(uv, (H, W))

    # one packed 8-channel map: every per-pixel quantity rides the same window
    # DMA (channel 8-alignment keeps HBM rows 32-byte aligned)
    half = patch_size // 2
    zeros = jnp.zeros_like(maps.conf)
    packed = jnp.stack([maps.ori2d[..., 0], maps.ori2d[..., 1], maps.conf,
                        maps.depth, maps.mask, zeros, zeros, zeros], -1)
    padded = jnp.pad(packed, ((0, 0), (half, half), (half, half), (0, 0)),
                     mode="edge")
    gather = patch_gather_dma if use_pallas else patch_gather_reference
    patch = gather(padded, rc, patch_size).astype(jnp.float32)  # (V,N,P,8)

    center = patch[:, :, (half * patch_size) + half, :]       # the (0,0) tap
    op = patch[..., 0:2]
    cp = patch[..., 2]
    o = center[..., 0:2]
    c = center[..., 2]
    d = center[..., 3]
    m = center[..., 4]
    vis = compute_visible(d, -z / 2.0 * 255.0)
    vis = jnp.where(invalid, -1.0, vis)
    return dict(uv=uv, z=z, rc=rc, invalid=invalid, depth=d, visible=vis,
                ori=o, conf=jnp.clip(c, 1e-6, 1.0), mask=m,
                ori_patch=op, conf_patch=jnp.clip(cp, 1e-6, 1.0))


def find_base_views(visible: jnp.ndarray, conf: jnp.ndarray, k: int = 20
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k views per point by visibility-weighted confidence
    (PMVO.py:339-343). Returns (idx (k, N), conf (k, N))."""
    weighted = jnp.where(visible < 1.0, conf * jnp.maximum(visible, 0.0), conf)
    k = min(k, visible.shape[0])
    vals, idx = jax.lax.top_k(weighted.T, k)                  # (N, k)
    return idx.T, vals.T


def reproject_directions(maps: PMVOMaps, points: jnp.ndarray,
                         samples: jnp.ndarray) -> jnp.ndarray:
    """2D pixel-space direction of the line point->sample in every view.

    points: (N, 3); samples: (N, S, 3) -> (V, N, S, 2) in (d_row, d_col).
    Mirror of compute_reproject_ori (PMVO.py:219-241), which projects through
    uv2pixel (returning (row, col) pixel coords).
    """
    H, W = maps.image_size
    N, S = samples.shape[:2]
    uv_s, _ = project(maps.cameras, samples.reshape(-1, 3))   # (V, N*S, 2)
    rc_s = ndc_to_pixel(uv_s, (H, W)).reshape(-1, N, S, 2)
    uv_p, _ = project(maps.cameras, points)
    rc_p = ndc_to_pixel(uv_p, (H, W))                         # (V, N, 2)
    return rc_s - rc_p[:, :, None, :]


def patch_min_loss(prj_dir: jnp.ndarray, obs, conf_threshold: float,
                   use_pallas: Optional[bool] = None
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Aggregate the per-patch orientation agreement into a per-(point, sample)
    loss, then pick the best sample. Mirror of compute_prj_loss (PMVO.py:151-209).

    prj_dir: (V, N, S, 2) reprojected directions. Returns
    (min_loss (N,), best_sample (N,), high_conf (N,) bool).

    The tap loop + view reduction runs as a fused Pallas kernel on TPU
    (ops/pallas_kernels.py, ~P x less HBM traffic); plain XLA elsewhere.
    """
    from ..ops.pallas_kernels import patch_min_loss_fused, patch_min_loss_reference
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    fn = patch_min_loss_fused if use_pallas else patch_min_loss_reference
    num, sum_w, sum_wp_raw = fn(prj_dir, obs["ori_patch"], obs["conf_patch"],
                                obs["visible"], conf_threshold)

    sum_wp = jnp.maximum(sum_wp_raw, 1e-6)
    positive = (sum_w / sum_wp) > conf_threshold              # (N,S)
    low_conf = jnp.sum(positive, -1) < 5                      # (N,)

    agg = num / jnp.maximum(sum_w, 1e-6)                      # (N,S)
    masked = jnp.where(positive, agg, 1.0)
    final = jnp.where(low_conf[:, None], agg, masked)
    best_sample = jnp.argmin(final, -1)
    min_val = jnp.take_along_axis(final, best_sample[:, None], -1)[:, 0]
    high_conf = jnp.take_along_axis(positive, best_sample[:, None], -1)[:, 0]
    return min_val, best_sample, high_conf


def sample_candidate_positions(maps: PMVOMaps, points: jnp.ndarray,
                               base_view: jnp.ndarray, offsets: jnp.ndarray,
                               ori_lookup: jnp.ndarray
                               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """For each point, march 2 px along its base view's 2D orientation and lift
    the target pixel back to 3D at 90 candidate depths around the point's depth.

    Mirror of sample_next_3d_pos (PMVO.py:263-335). base_view: (N,) view index;
    ori_lookup: (V, N, 2) the per-view 2D orientation at each point's pixel.
    Returns (samples (N, S, 3), surface (N, 3)).

    Note: the reference's `surface_points` writes are chained advanced-indexing
    no-ops (PMVO.py:333-334), so its effective surface is the input point; we
    reproduce that (surface = points).
    """
    H, W = maps.image_size
    N = points.shape[0]
    cam_sel = Cameras(maps.cameras.ndc[base_view], maps.cameras.w2c[base_view])  # (N,...)

    # project each point in its own base view
    def proj_one(cam_ndc, cam_w2c, p):
        c1 = Cameras(cam_ndc[None], cam_w2c[None])
        uv, z = project(c1, p[None])
        return uv[0, 0], z[0, 0]

    uv, z = jax.vmap(proj_one)(cam_sel.ndc, cam_sel.w2c, points)  # (N,2),(N,)
    # pixel coords as (col, row) like the reference's unflipped uv
    rc = ndc_to_pixel(uv, (H, W))                             # (N,2) (row,col)
    ori = jnp.take_along_axis(ori_lookup, base_view[None, :, None], 0)[0]  # (N,2)
    # ori is (sin, cos) = (d_row, d_col); march 2 px
    rc_next = rc + ori * 2.0
    uv_next = pixel_to_ndc(rc_next, (H, W))

    # depth at the *rounded* pixel of the point (PMVO.py:306-311)
    rci = jnp.stack([jnp.clip(jnp.round(rc[:, 0]), 0, H - 1),
                     jnp.clip(jnp.round(rc[:, 1]), 0, W - 1)], -1).astype(jnp.int32)
    depth_sel = maps.depth[base_view, rci[:, 0], rci[:, 1]]   # (N,)
    del depth_sel  # kept for parity documentation; see surface note above

    z_samples = z[:, None] + offsets[None, :]                 # (N,S)

    def unproj_one(cam_ndc, cam_w2c, uvn, zs):
        c1 = Cameras(cam_ndc[None], cam_w2c[None])
        S = zs.shape[0]
        return unproject(c1, jnp.broadcast_to(uvn, (1, S, 2)), zs[None])[0]

    samples = jax.vmap(unproj_one)(cam_sel.ndc, cam_sel.w2c, uv_next, z_samples)
    return samples, points


def pmvo_forward(maps: PMVOMaps, points: jnp.ndarray, patch_size: int,
                 conf_threshold: float, num_sample: int = 90,
                 num_base_candidates: int = 10,
                 use_pallas: Optional[bool] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One PMVO chunk: best 3D line direction per point.

    Returns (points (N,3), ori (N,3) unit, min_loss (N,), high_conf (N,) bool).
    Mirror of PMVO.forward (PMVO.py:39-78): candidate base views are every other
    entry of the top-20 visibility-weighted-confidence views.
    """
    obs = observe_points(maps, points, patch_size, use_pallas)
    base_idx, base_conf = find_base_views(obs["visible"], obs["conf"])
    offsets = jnp.asarray(depth_sample_offsets(num_sample))

    num_base = min(num_base_candidates, base_idx.shape[0] // 2)
    cand_idx = base_idx[0:2 * num_base:2]                     # (B, N)
    cand_conf = base_conf[0:2 * num_base:2]

    def evaluate(b_view):
        samples, surface = sample_candidate_positions(maps, points, b_view,
                                                      offsets, obs["ori"])
        prj = reproject_directions(maps, points, samples)
        loss, best_s, high_conf = patch_min_loss(prj, obs, conf_threshold,
                                                 use_pallas)
        best_pts = jnp.take_along_axis(
            samples, best_s[:, None, None], 1)[:, 0]          # (N,3)
        return loss, best_pts, surface, high_conf

    loss0, pts0, surf0, hc0 = evaluate(cand_idx[0])

    def step(carry, inp):
        min_loss, best_pts, best_surf, high_conf = carry
        b_view, b_conf = inp
        loss, pts, surf, hc = evaluate(b_view)
        take = (loss < min_loss) & (b_conf > 0)
        return (jnp.where(take, loss, min_loss),
                jnp.where(take[:, None], pts, best_pts),
                jnp.where(take[:, None], surf, best_surf),
                jnp.where(take, hc, high_conf)), None

    (min_loss, best_pts, best_surf, high_conf), _ = jax.lax.scan(
        step, (loss0, pts0, surf0, hc0), (cand_idx[1:], cand_conf[1:]))

    line = best_pts - best_surf
    ori = line / jnp.maximum(jnp.linalg.norm(line, axis=-1, keepdims=True), 1e-12)
    return points, ori, min_loss, high_conf


def pmvo_refine_loss(maps: PMVOMaps, points: jnp.ndarray, ori: jnp.ndarray,
                     patch_size: int, conf_threshold: float) -> jnp.ndarray:
    """Projection loss of a *given* direction (the KNN-consensus candidate),
    used by the refine pass. Mirror of PMVO.refine (PMVO.py:81-93) minus the
    bust/scalp filtering, which the caller applies (host-side KD-trees)."""
    obs = observe_points(maps, points, patch_size)
    next_points = points + ori * (0.005 / 4.0)
    prj = reproject_directions(maps, points, next_points[:, None, :])
    loss, _, _ = patch_min_loss(prj, obs, conf_threshold)
    return loss


def filter_points(maps: PMVOMaps, points: jnp.ndarray, patch_size: int,
                  conf_threshold: float, visible_threshold: float
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Classify raw samples into surface candidates vs near-surface-invisible.

    Mirror of PMVO.filter_points (PMVO.py:402-459). Returns boolean masks
    (surface_index, filter_index) over the N points.
    """
    obs = observe_points(maps, points, patch_size)
    z255 = -obs["z"] / 2.0 * 255.0
    d = obs["depth"]
    invalid = obs["invalid"]

    cmax = jnp.max(obs["conf_patch"], -1)
    cmax = jnp.where(invalid, 0.0, cmax)
    unvis = jnp.where(z255 - d > 0.1, 1.0, 0.0)
    unvis = jnp.where(invalid, 1.0, unvis)
    unvis1 = jnp.where(z255 - d > visible_threshold, 1.0, 0.0)
    unvis1 = jnp.where(invalid, 1.0, unvis1)
    low_c = (cmax < conf_threshold).astype(z255.dtype)
    m = jnp.where(obs["mask"] > 0.2, 1.0, obs["mask"])

    vis = 1.0 - unvis
    vis1 = 1.0 - unvis1
    low_conf_count = jnp.sum((1.0 - unvis) * low_c, 0) > 4
    hair = (jnp.sum(vis, 0) - jnp.sum(vis * m, 0)) < jnp.sum(vis, 0) * 0.5
    hair1 = (jnp.sum(vis1, 0) - jnp.sum(vis1 * m, 0)) < jnp.sum(vis1, 0) * 0.5
    surface = jnp.sum(vis, 0) > 1
    filt = (jnp.sum(vis1, 0) > 1) & ~surface
    surface = surface & ~low_conf_count & hair
    filt = filt & ~low_conf_count & hair1
    return surface, filt


def compute_unvisible_points(maps: PMVOMaps, points: jnp.ndarray) -> jnp.ndarray:
    """True for points visible in fewer than 3 views at a 0.9 depth tolerance
    (PMVO.py:461-480); used to keep only interior MVS points when fusing."""
    H, W = maps.image_size
    uv, z = project(maps.cameras, points)
    rc, invalid = pixel_index_and_validity(uv, (H, W))
    d = jax.vmap(gather_pixels)(maps.depth, rc)
    unvis = jnp.where((-z / 2.0 * 255.0) - d > 0.9, 1.0, 0.0)
    unvis = jnp.where(invalid, 1.0, unvis)
    visible_count = jnp.sum(1.0 - unvis, 0)
    return ~(visible_count > 2)
