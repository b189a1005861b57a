"""Batched strand tracing through the (occ, ori) voxel field.

The reference traces one seed at a time with Python while-loops over GPU scalar
reads (HairGrow.py:59-149 `trace`, :154-223 `traceFromScalp`) — ~60k scalp seeds
plus 3 sweeps over every occupied voxel, each up to 512 sequential torch calls.
Here *all* seeds advance together inside one `lax.scan` over the step axis, with
per-seed active masks; each scan step is a batched gather into the HBM-resident
grids. The seed-coverage `flag` (which suppresses re-tracing voxels already
covered 3+ times) is honored between *chunks* of seeds rather than between
individual seeds — a round-based equivalent of the reference's sequential flag.

All positions here are continuous voxel coordinates; `ori` must already be in
the voxel direction frame (world dirs * [1,-1,-1], HairGrow.py:55-56).
"""

from __future__ import annotations

from functools import partial
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class TraceResult(NamedTuple):
    positions: jnp.ndarray   # (K, L, 3) voxel coords, padded
    lengths: jnp.ndarray     # (K,) valid point counts
    valid: jnp.ndarray       # (K,) strand kept at all


def _grid_lookup(grid: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """Nearest (floor) lookup of (X, Y, Z[,C]) grid at (K, 3) voxel coords,
    clamped — matching `seedPos.type(torch.long)` + clamp (HairGrow.py:66-69)."""
    res = jnp.asarray(grid.shape[:3])
    idx = jnp.clip(pos.astype(jnp.int32), 0, res - 1)
    return grid[idx[:, 0], idx[:, 1], idx[:, 2]]


def _march(occ: jnp.ndarray, ori: jnp.ndarray, pos0: jnp.ndarray,
           tan0: jnp.ndarray, thr_dot: float, max_steps: int, sign: float,
           live0: Optional[jnp.ndarray] = None
           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One direction of the bidirectional trace (HairGrow.py:77-143).

    Returns (points (max_steps, K, 3), taken (max_steps, K) bool): point s is
    appended iff taken[s]. Marching stops per-seed when the current voxel is
    empty or the field turns more than thr_dot.
    """

    def step(carry, _):
        pos, tan, active = carry
        occ_here = _grid_lookup(occ, pos)
        active = active & (occ_here > 0)
        nxt = pos + sign * tan
        ntan = _grid_lookup(ori, nxt)
        ok = jnp.sum(ntan * tan, -1) >= thr_dot
        take = active & ok
        pos = jnp.where(take[:, None], nxt, pos)
        tan = jnp.where(take[:, None], ntan, tan)
        return (pos, tan, take), (pos, take)

    init_live = (jnp.ones(pos0.shape[0], bool) if live0 is None else live0)
    (_, _, _), (pts, taken) = jax.lax.scan(
        step, (pos0, tan0, init_live), None, length=max_steps)
    return pts, taken


@partial(jax.jit, static_argnames=("max_steps", "min_points"))
def trace_bidirectional(occ: jnp.ndarray, ori: jnp.ndarray, seeds: jnp.ndarray,
                        noise: jnp.ndarray, thr_dot: float,
                        max_steps: int = 256, min_points: int = 5,
                        live: Optional[jnp.ndarray] = None) -> TraceResult:
    """Trace every seed voxel forward and backward along the field.

    seeds: (K, 3) integer voxel indices; noise: (K, 3) uniform [0,1) used to
    jitter the start inside the voxel (seed + 0.5 + 0.5*noise, HairGrow.py:62-63).
    Output positions are ordered root-to-tip: backward points reversed, then the
    seed, then forward points (HairGrow.py:75-149).
    """
    K = seeds.shape[0]
    pos0 = seeds.astype(jnp.float32) + 0.5 + 0.5 * noise
    tan0 = _grid_lookup(ori, pos0)

    fwd_pts, fwd_take = _march(occ, ori, pos0, tan0, thr_dot, max_steps, +1.0,
                               live)
    bwd_pts, bwd_take = _march(occ, ori, pos0, tan0, thr_dot, max_steps, -1.0,
                               live)

    # per-seed step counts: consecutive takes from step 0
    def run_length(taken):
        ok = jnp.cumprod(taken.astype(jnp.int32), axis=0)
        return jnp.sum(ok, axis=0)

    n_fwd = run_length(fwd_take)     # (K,)
    n_bwd = run_length(bwd_take)
    total = n_bwd + 1 + n_fwd
    L = 2 * max_steps + 1

    # layout: index i in [0, L): backward point (n_bwd-1 - j) at i=j ... seed at n_bwd
    pos_axis = jnp.arange(L)[:, None]                       # (L, 1)
    # backward section: i < n_bwd -> bwd step (n_bwd - 1 - i)
    bwd_idx = jnp.clip(n_bwd[None, :] - 1 - pos_axis, 0, max_steps - 1)
    fwd_idx = jnp.clip(pos_axis - n_bwd[None, :] - 1, 0, max_steps - 1)
    take_b = pos_axis < n_bwd[None, :]
    take_s = pos_axis == n_bwd[None, :]
    take_f = (pos_axis > n_bwd[None, :]) & (pos_axis < total[None, :])

    gather = jnp.take_along_axis  # over step axis
    b_part = gather(bwd_pts, bwd_idx[..., None], 0)
    f_part = gather(fwd_pts, fwd_idx[..., None], 0)
    pts = jnp.where(take_b[..., None], b_part,
                    jnp.where(take_s[..., None], pos0[None],
                              jnp.where(take_f[..., None], f_part, 0.0)))
    pts = jnp.transpose(pts, (1, 0, 2))                     # (K, L, 3)
    keep = total >= min_points
    if live is not None:
        keep = keep & live
    return TraceResult(pts, total, keep)


@partial(jax.jit, static_argnames=("max_steps", "inner_steps"))
def trace_from_scalp(occ: jnp.ndarray, ori: jnp.ndarray, seeds: jnp.ndarray,
                     normals: jnp.ndarray, thr_dot: float,
                     max_steps: int = 256, inner_steps: int = 25) -> TraceResult:
    """Grow guide strands from scalp seeds (HairGrow.py:154-223).

    seeds: (K, 3) continuous voxel coords on the scalp; normals: (K, 3) voxel-
    frame scalp normals. Phase 1 ("Grow_Inner") pushes through the empty shell
    along a gravity-blended normal for up to `inner_steps`; once the field is
    reached the trace follows it with sign-flip tolerance. Seeds that never
    reach the field are invalid.
    """
    K = seeds.shape[0]
    d = jnp.array([0.0, 1.0, 0.0])   # voxel-frame "down" (world -y)
    blend = jnp.minimum(jnp.sum(normals * d, -1, keepdims=True) + 1.0, 1.0)
    n0 = normals + d * blend
    n0 = n0 / jnp.maximum(jnp.linalg.norm(n0, axis=-1, keepdims=True), 1e-8)

    def step(carry, i):
        pos, tan, inner, active = carry
        occ_here = _grid_lookup(occ, pos)
        active = active & ((occ_here > 0) | inner)
        nxt = pos + tan
        ntan = _grid_lookup(ori, nxt)
        empty_next = jnp.linalg.norm(ntan, axis=-1) < 0.1

        # empty & still inner: keep pushing along the blended normal
        keep_dir = jnp.sum(tan * n0, -1) < 0.85
        blended = tan + d * blend
        blended = blended / jnp.maximum(
            jnp.linalg.norm(blended, axis=-1, keepdims=True), 1e-8)
        inner_tan = jnp.where(keep_dir[:, None], tan, blended)

        dot = jnp.sum(ntan * tan, -1)
        flip_ok = -dot >= thr_dot
        field_tan = jnp.where((dot < thr_dot)[:, None] & flip_ok[:, None], -ntan, ntan)
        stop_field = (dot < thr_dot) & ~flip_ok & ~inner
        field_tan = jnp.where((inner & (dot < 0))[:, None], -field_tan, field_tan)

        use_inner = empty_next & inner
        new_tan = jnp.where(use_inner[:, None], inner_tan, field_tan)
        new_inner = inner & use_inner
        stop_inner_budget = new_inner & (i + 1 >= inner_steps)
        take = active & ~stop_field & ~stop_inner_budget
        pos = jnp.where(take[:, None], nxt, pos)
        tan = jnp.where(take[:, None], new_tan, tan)
        inner = jnp.where(take, new_inner, inner)
        return (pos, tan, inner, take), (pos, take, inner)

    init = (seeds.astype(jnp.float32), n0, jnp.ones(K, bool), jnp.ones(K, bool))
    _, (pts, taken, inner_hist) = jax.lax.scan(step, init, jnp.arange(max_steps))

    ok = jnp.cumprod(taken.astype(jnp.int32), 0)
    n_steps = jnp.sum(ok, 0)
    # valid strands escaped the inner phase (HairGrow.py:219-223)
    last = jnp.clip(n_steps - 1, 0, max_steps - 1)
    still_inner = jnp.take_along_axis(inner_hist, last[None], 0)[0] | (n_steps == 0)

    L = max_steps + 1
    pts_full = jnp.concatenate([seeds.astype(jnp.float32)[None], pts], 0)
    pts_full = jnp.where((jnp.arange(L)[:, None] <= n_steps[None])[..., None],
                         pts_full, 0.0)
    return TraceResult(jnp.transpose(pts_full, (1, 0, 2)), n_steps + 1, ~still_inner)


@partial(jax.jit, static_argnames=("min_points",))
def _compact_trace(positions: jnp.ndarray, lengths: jnp.ndarray,
                   valid: jnp.ndarray, min_points: int):
    """Stream-compact kept strands' valid points into a dense (sum lens, 3)
    prefix of a (K*L+1, 3) buffer (last row is the dump slot)."""
    K, L = positions.shape[:2]
    keep = valid & (lengths >= min_points)
    lens = jnp.where(keep, lengths, 0)
    offs = jnp.cumsum(lens) - lens
    col = jnp.arange(L)[None]
    dst = jnp.where(col < lens[:, None], offs[:, None] + col, K * L)
    buf = jnp.zeros((K * L + 1, 3), positions.dtype)
    buf = buf.at[dst.reshape(-1)].set(positions.reshape(-1, 3))
    return buf, lens


def strands_to_list(result: TraceResult, min_points: int = 2) -> List[np.ndarray]:
    """Convert a padded TraceResult to a host list of (Ni, 3) arrays.

    Compacts on device and downloads only ~sum(lens) rows (bucketed to powers
    of two to bound recompiles): the padded (K, L, 3) buffer is ~10x the real
    data, and the axon tunnel moves device->host at ~10 MB/s — at trace
    scale (16k seeds x 513 steps) the naive download was ~10 s per chunk."""
    buf, lens = _compact_trace(result.positions, result.lengths, result.valid,
                               min_points)
    lens_h = np.asarray(lens).astype(np.int64)
    total = int(lens_h.sum())
    if total == 0:
        return []
    cap = buf.shape[0] - 1
    pad = min(1 << (total - 1).bit_length(), cap)
    pts = np.asarray(buf[:pad])
    out, off = [], 0
    for ln in lens_h:
        if ln:
            out.append(pts[off:off + ln])
            off += ln
    return out


def update_flag(flag: jnp.ndarray, result: TraceResult) -> jnp.ndarray:
    """Scatter-add coverage of traced strands into the seed-suppression flag
    (HairGrow.py:288-293)."""
    res = jnp.asarray(flag.shape)
    pts = result.positions.reshape(-1, 3)
    idx = jnp.clip(pts.astype(jnp.int32), 0, res - 1)
    K, L = result.positions.shape[:2]
    in_range = (jnp.arange(L)[None] < result.lengths[:, None]) & result.valid[:, None]
    w = in_range.reshape(-1).astype(flag.dtype)
    return flag.at[idx[:, 0], idx[:, 1], idx[:, 2]].add(w)


def generate_segments(occ: np.ndarray, ori_voxel: np.ndarray, thr_dot: float,
                      sweeps: int = 3, chunk: int = 16384, flag_cap: int = 3,
                      seed: int = 0, max_steps: int = 256,
                      flag_init: Optional[np.ndarray] = None
                      ) -> List[np.ndarray]:
    """Trace strands from every occupied voxel, `sweeps` times over the grid,
    suppressing seeds whose voxel is already covered >= flag_cap times.

    Round-based equivalent of randomlyGenerateSegments (HairGrow.py:269-299):
    within a chunk all seeds see the same flag snapshot; the flag updates
    between chunks.
    """
    occ_j = jnp.asarray(occ)
    ori_j = jnp.asarray(ori_voxel)
    flag = jnp.zeros_like(occ_j) if flag_init is None else jnp.asarray(flag_init)
    seeds_all = np.argwhere(np.asarray(occ) > 0)
    rng = np.random.default_rng(seed)
    strands: List[np.ndarray] = []
    for sweep in range(sweeps):
        for beg in range(0, len(seeds_all), chunk):
            sub = seeds_all[beg:beg + chunk]
            flag_here = np.asarray(_grid_lookup(flag, jnp.asarray(sub, jnp.float32)))
            sub = sub[flag_here < flag_cap]
            if len(sub) == 0:
                continue
            # pad to the fixed chunk size: a varying seed count means a fresh
            # XLA compile per chunk (minutes each over the axon tunnel). Pad
            # seeds carry live=False -> never take a step, excluded from the
            # coverage flag and the output list.
            n_real = len(sub)
            if n_real < chunk:
                sub = np.concatenate(
                    [sub, np.zeros((chunk - n_real, 3), sub.dtype)], 0)
            live = jnp.asarray(np.arange(chunk) < n_real)
            noise = rng.random((chunk, 3)).astype(np.float32)
            res = trace_bidirectional(occ_j, ori_j, jnp.asarray(sub),
                                      jnp.asarray(noise), thr_dot, max_steps,
                                      live=live)
            flag = update_flag(flag, res)
            strands.extend(strands_to_list(res, min_points=5))
    return strands


def generate_guide_and_segments(occ: np.ndarray, ori_voxel: np.ndarray,
                                scalp_points_voxel: np.ndarray,
                                scalp_normals_voxel: np.ndarray, thr_dot: float,
                                chunk: int = 16384, seed: int = 0
                                ) -> Tuple[List[np.ndarray], int]:
    """GenerateGuideStrandFromScalp (HairGrow.py:226-265): scalp-rooted guide
    strands first, then two sweeps of free segments over voxels not yet covered.
    Returns (strands, num_root) — the first num_root strands are scalp-rooted.
    """
    occ_j = jnp.asarray(occ)
    ori_j = jnp.asarray(ori_voxel)
    guides: List[np.ndarray] = []
    flag = jnp.zeros_like(occ_j)
    for beg in range(0, len(scalp_points_voxel), chunk):
        sp = jnp.asarray(scalp_points_voxel[beg:beg + chunk], jnp.float32)
        sn = jnp.asarray(scalp_normals_voxel[beg:beg + chunk], jnp.float32)
        res = trace_from_scalp(occ_j, ori_j, sp, sn, thr_dot)
        flag = update_flag(flag, res)
        guides.extend(strands_to_list(res, min_points=2))
    num_root = len(guides)
    flag = jnp.minimum(flag, 1.0)  # guides mark coverage once (HairGrow.py:246)
    segs = generate_segments(occ, ori_voxel, thr_dot, sweeps=2, chunk=chunk,
                             seed=seed, flag_init=np.asarray(flag))
    return guides + segs, num_root
