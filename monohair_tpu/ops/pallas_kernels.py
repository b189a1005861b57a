"""Pallas TPU kernels for the PMVO hot loop.

`patch_min_loss_fused` replaces the tap-streaming stage of
pmvo.solver.patch_min_loss (the (V, N, S, P) projection-loss work that SURVEY
§3.2 flags as the #1 kernel target, reference PMVO.py:151-209). The XLA
fori_loop version materializes (V, N, S) temporaries in HBM on every one of the
P=49/81 taps; this kernel keeps the whole tap loop in VMEM — one read of the
inputs, one write of the (N, S) view-reduced outputs, ~P x less HBM traffic.

Layout: the candidate-sample axis S is padded to the 128-lane boundary; the
grid runs over N tiles; V and P are static in-kernel loops on VMEM blocks.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(prj_r_ref, prj_c_ref, ori_r_ref, ori_c_ref, conf_ref, vis_ref,
            thr_ref, num_ref, den_ref, cnt_ref, *, V: int, P: int):
    thr = thr_ref[0]
    prj_r = prj_r_ref[:]                     # (V, TN, S)
    prj_c = prj_c_ref[:]
    prnorm = jnp.sqrt(prj_r * prj_r + prj_c * prj_c)

    def tap(p):
        o_r = ori_r_ref[:, :, p][:, :, None]     # (V, TN, 1)
        o_c = ori_c_ref[:, :, p][:, :, None]
        onorm = jnp.sqrt(o_r * o_r + o_c * o_c)
        sim = jnp.abs(o_r * prj_r + o_c * prj_c) / jnp.maximum(onorm * prnorm, 1e-8)
        return 1.0 - sim, conf_ref[:, :, p][:, :, None]

    conf_all = conf_ref[:]                   # (V, TN, P)
    # all masks as f32 {0,1} arithmetic — Mosaic cannot lower broadcasted
    # boolean selects ("unsupported target bitwidth for truncation")
    hc = jnp.where(jnp.max(conf_all, -1, keepdims=True) > thr, 1.0, 0.0)

    min_loss, conf0 = tap(0)
    best_conf = conf0 * jnp.ones_like(min_loss)
    for p in range(1, P):
        loss_p, conf_p = tap(p)
        better = jnp.where(loss_p < min_loss, 1.0, 0.0)
        accept = jnp.where(conf_p > thr, 1.0, 0.0)
        take = hc * (better * accept) + (1.0 - hc) * better
        min_loss = take * loss_p + (1.0 - take) * min_loss
        best_conf = take * conf_p + (1.0 - take) * best_conf

    vis = vis_ref[:]                         # (V, TN, 1)
    weight = jnp.where(vis == -1.0, 0.0, 1.0) * best_conf
    num_ref[:] = jnp.sum(weight * min_loss, 0)
    den_ref[:] = jnp.sum(weight, 0)
    cnt_ref[:] = jnp.sum(jnp.where(weight > 0, 1.0, 0.0), 0)


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def patch_min_loss_fused(prj_dir: jnp.ndarray, ori_patch: jnp.ndarray,
                         conf_patch: jnp.ndarray, visible: jnp.ndarray,
                         conf_threshold: float, tile_n: int = 32,
                         interpret: bool = False
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    # tile_n=32 measured optimal on v5e (8 is grid-overhead bound ~28x slower;
    # 64 overflows VMEM at V=16, S_pad=128)
    """Fused tap loop + view reduction.

    prj_dir: (V, N, S, 2); ori_patch: (V, N, P, 2); conf_patch: (V, N, P);
    visible: (V, N). Returns (agg_num, agg_den, pos_cnt), each (N, S):
    the weighted loss sum, weight sum and positive-weight count over views —
    the aggregation tail (positive mask, argmin) stays in XLA.
    """
    V, N, S, _ = prj_dir.shape
    P = ori_patch.shape[2]
    S_pad = int(np.ceil(S / 128) * 128)
    N_pad = int(np.ceil(N / tile_n) * tile_n)

    def pad(x, n_axis, extra_axis=None, extra_to=None):
        cfg = [(0, 0)] * x.ndim
        cfg[n_axis] = (0, N_pad - N)
        if extra_axis is not None:
            cfg[extra_axis] = (0, extra_to - x.shape[extra_axis])
        return jnp.pad(x, cfg)

    prj_r = pad(prj_dir[..., 0], 1, 2, S_pad)
    prj_c = pad(prj_dir[..., 1], 1, 2, S_pad)
    ori_r = pad(ori_patch[..., 0], 1)
    ori_c = pad(ori_patch[..., 1], 1)
    conf = pad(conf_patch, 1)
    vis = pad(visible, 1)[..., None]   # (V, N_pad, 1): TPU blocks need a lane dim
    thr = jnp.asarray([conf_threshold], jnp.float32)

    grid = (N_pad // tile_n,)
    bs_vns = pl.BlockSpec((V, tile_n, S_pad), lambda i: (0, i, 0),
                          memory_space=pltpu.VMEM)
    bs_vnp = pl.BlockSpec((V, tile_n, P), lambda i: (0, i, 0),
                          memory_space=pltpu.VMEM)
    bs_vn = pl.BlockSpec((V, tile_n, 1), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    bs_out = pl.BlockSpec((tile_n, S_pad), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((N_pad, S_pad), jnp.float32)

    num, den, cnt = pl.pallas_call(
        functools.partial(_kernel, V=V, P=P),
        grid=grid,
        in_specs=[bs_vns, bs_vns, bs_vnp, bs_vnp, bs_vnp, bs_vn,
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(bs_out, bs_out, bs_out),
        out_shape=(out_shape, out_shape, out_shape),
        interpret=interpret,
    )(prj_r, prj_c, ori_r, ori_c, conf, vis, thr)
    return num[:N, :S], den[:N, :S], cnt[:N, :S]


# -----------------------------------------------------------------------------
# DMA patch gather (the observe_points hot spot, reference PMVO.py:482-529).
#
# XLA lowers image[rows, cols] to per-element gathers — measured 426 ms for the
# (V=16, N=32k, P=49, C) patch fetch at 1920x1080, ~half the whole PMVO
# forward. Each point's taps are a contiguous (patch, patch) window, so the
# DMA engine can fetch the whole window with ONE strided descriptor per point.
#
# Hardware constraints: HBM DMA slices must be 8-aligned x multiple-of-8 on
# the sublane (row) dim and 128-aligned x multiple-of-128 on the lane dim —
# but window origins are arbitrary pixels. So channels fold into the lane
# axis (map row = W*C lanes), each DMA fetches the ALIGNED 16-row x 256-lane
# span covering the window, and the residual (row, lane) shifts resolve
# on-chip as two one-hot MXU contractions — vector shifts expressed as
# matmuls, which the MXU does for free relative to the DMA time. Edge
# clamping via a pre-padded map.
# -----------------------------------------------------------------------------

_GATHER_SPAN = 256  # two 128-lane groups always cover a (patch*C <= 128) window
_ROW_SPAN = 16      # two 8-row groups always cover a (patch <= 8) window


def _gather_kernel(rc_smem, rc_vmem, maps_ref, out_ref, scratch, sems, *,
                   tile_n: int, patch: int, C: int, wave: int):
    v = pl.program_id(0)

    def start(i):
        row0 = pl.multiple_of(rc_smem[0, i, 0] // 8 * 8, 8)
        lane0 = pl.multiple_of((rc_smem[0, i, 1] * C) // 128 * 128, 128)
        dma = pltpu.make_async_copy(
            maps_ref.at[v].at[pl.ds(row0, _ROW_SPAN),
                              pl.ds(lane0, _GATHER_SPAN)],
            scratch.at[i], sems.at[i % (2 * wave)])
        dma.start()
        return dma

    # software pipeline: keep one wave in flight while the previous drains
    inflight = [start(i) for i in range(min(wave, tile_n))]
    for i in range(wave, tile_n):
        inflight.append(start(i))
        inflight.pop(0).wait()
    for dma in inflight:
        dma.wait()

    # residual shifts as one-hot contractions:
    #   rows:  rsel[i, p, r] = (r == roff_i + p)    (TN, patch, 16)
    #   lanes: lsel[i, l, k] = (l == loff_i + k)    (TN, 256, patch*C)
    K = patch * C
    roff = rc_vmem[0, :, 0] % 8
    loff = (rc_vmem[0, :, 1] * C) % 128
    p_idx = jax.lax.broadcasted_iota(jnp.int32, (tile_n, patch, _ROW_SPAN), 1)
    r_idx = jax.lax.broadcasted_iota(jnp.int32, (tile_n, patch, _ROW_SPAN), 2)
    rsel = jnp.where(r_idx == roff[:, None, None] + p_idx, 1.0, 0.0)
    l_idx = jax.lax.broadcasted_iota(jnp.int32, (tile_n, _GATHER_SPAN, K), 1)
    k_idx = jax.lax.broadcasted_iota(jnp.int32, (tile_n, _GATHER_SPAN, K), 2)
    lsel = jnp.where(l_idx == loff[:, None, None] + k_idx, 1.0, 0.0)
    # HIGHEST precision: the default bf16 MXU pass would truncate the gathered
    # VALUES (these matmuls are data movement, not math)
    rows = jax.lax.dot_general(rsel, scratch[:], (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
    out_ref[0] = jax.lax.dot_general(
        rows, lsel, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("patch_size", "tile_n", "interpret"))
def patch_gather_dma(padded_maps: jnp.ndarray, rc: jnp.ndarray,
                     patch_size: int, tile_n: int = 32,
                     interpret: bool = False) -> jnp.ndarray:
    """Gather (patch x patch) windows from every view via strided DMA.

    padded_maps: (V, H + patch - 1, W + patch - 1, C) edge-padded maps,
    C * patch_size <= 128; rc: (V, N, 2) int32 window CENTERS in unpadded
    coords, already clamped to [0, H-1] x [0, W-1] (padding makes
    center-anchored windows in-bounds, reproducing gather_patches' per-tap edge
    clamp). Returns (V, N, P, C) with taps in row-major offset order.
    """
    V, Hp, Wp, C = padded_maps.shape
    _, N, _ = rc.shape
    # worst-case residual offsets: 7 rows, 128 - C lanes
    assert patch_size + 7 <= _ROW_SPAN, "window rows must fit the row span"
    assert C * patch_size + 128 - C <= _GATHER_SPAN, "window must fit the span"
    N_pad = int(np.ceil(N / tile_n) * tile_n)
    rc_p = jnp.pad(rc, ((0, 0), (0, N_pad - N), (0, 0)))

    # fold channels into lanes; margins so the aligned 16-row x 256-lane span
    # never overruns the bottom/right edge
    lanes = Wp * C
    lanes_pad = int(np.ceil((lanes + _GATHER_SPAN) / 128) * 128)
    rows_pad = int(np.ceil((Hp + _ROW_SPAN) / 8) * 8)
    maps_flat = jnp.pad(padded_maps.reshape(V, Hp, lanes),
                        ((0, 0), (0, rows_pad - Hp), (0, lanes_pad - lanes)))

    grid = (V, N_pad // tile_n)
    out_shape = jax.ShapeDtypeStruct((V, N_pad, patch_size, patch_size * C),
                                     jnp.float32)
    wave = 16
    out = pl.pallas_call(
        functools.partial(_gather_kernel, tile_n=tile_n, patch=patch_size,
                          C=C, wave=wave),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_n, 2), lambda v, i: (v, i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tile_n, 2), lambda v, i: (v, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),        # maps stay in HBM
        ],
        out_specs=pl.BlockSpec((1, tile_n, patch_size, patch_size * C),
                               lambda v, i: (v, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((tile_n, _ROW_SPAN, _GATHER_SPAN),
                                   jnp.float32),
                        pltpu.SemaphoreType.DMA((2 * wave,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(rc_p, rc_p, maps_flat)
    return out[:, :N].reshape(V, N, patch_size * patch_size, C)


def patch_gather_reference(padded_maps: jnp.ndarray, rc: jnp.ndarray,
                           patch_size: int) -> jnp.ndarray:
    """Plain-XLA equivalent of patch_gather_dma (A/B tests and CPU)."""
    half = patch_size // 2
    offs = jnp.arange(0, patch_size)
    orow = jnp.repeat(offs, patch_size)
    ocol = jnp.tile(offs, patch_size)
    rows = rc[..., 0:1] + orow          # padded coords: center rc -> rc + off
    cols = rc[..., 1:2] + ocol
    return jax.vmap(lambda m, r, c: m[r, c])(padded_maps, rows, cols)


def patch_min_loss_reference(prj_dir, ori_patch, conf_patch, visible,
                             conf_threshold):
    """Plain-XLA equivalent of the fused kernel (for A/B tests and CPU)."""
    prnorm = jnp.linalg.norm(prj_dir, axis=-1)
    high_conf = jnp.max(conf_patch, -1)[..., None] > conf_threshold

    def tap(p):
        o = ori_patch[:, :, p, :]
        cosv = jnp.einsum("vnc,vnsc->vns", o, prj_dir)
        denom = jnp.maximum(jnp.linalg.norm(o, axis=-1)[:, :, None] * prnorm, 1e-8)
        return 1.0 - jnp.abs(cosv) / denom, conf_patch[:, :, p][:, :, None]

    min_loss, conf0 = tap(0)
    best_conf = conf0 * jnp.ones_like(min_loss)
    for p in range(1, ori_patch.shape[2]):
        loss_p, conf_p = tap(p)
        better = loss_p < min_loss
        take = jnp.where(high_conf, better & (conf_p > conf_threshold), better)
        min_loss = jnp.where(take, loss_p, min_loss)
        best_conf = jnp.where(take, conf_p * jnp.ones_like(loss_p), best_conf)
    weight = jnp.where(visible[:, :, None] == -1.0, 0.0, 1.0) * best_conf
    return (jnp.sum(weight * min_loss, 0), jnp.sum(weight, 0),
            jnp.sum((weight > 0).astype(jnp.float32), 0))
