"""Dense multiscale feature-grid field — the TPU-first coarse-geometry NeRF.

Why this exists: instant-ngp's multiresolution *hash* encoding is designed for
GPUs, where random 8-byte table loads are cheap and FLOPs are the budget. On
TPU the tradeoff inverts — XLA gathers/scatters run at a fixed ~120M rows/s
regardless of row width (measured, see CLAUDE.md), so the hash encode's
14 levels x 8 corners = 112 gather rows per sample point dominate the train
step (~2.4 s at 8192 rays x 64 samples). The fix is architectural, not a
kernel: a *dense* grid admits a layout where all 8 trilinear corners of a cell
are fetched by ONE gather offset.

Layout trick: store each level as (R, R, R*F) with the feature axis packed
into z ("z-packed"). Both z-corners' features of cell (ix,iy,iz) then live in
ONE contiguous 2F-wide row starting at (ix, iy, iz*F), so a point needs only
the 4 xy-corner row gathers per level instead of 8 element gathers — and TPU
gathers cost per ROW, not per byte (measured ~120M rows/s regardless of row
width). Three dense levels cost 12 row offsets per point vs the hash encode's
112: measured 7.8x faster fwd+bwd at 524k points (tools/tune_grid_encode.py).
Multi-dim slice gathers (slice_sizes=(2,2,2F)) are NOT the answer — measured
7x SLOWER than the hash encode; the slice only ever spans the minor axis
here. Gather output rides as (2F, 4N) — big axis minor — so no tile blowups
(CLAUDE.md layout rules).

Convergence: dense voxel grids with small MLP heads converge as fast as hash
grids at coarse-geometry scales (the DVGO/Plenoxels result); the pipeline
reads the field through a 256^3 marching-cubes export (run.py:272-276), which
a 256-resolution finest level matches exactly.

Replaces: instant-ngp testbed (reference run.py:24-26,91,184-206) — same role
as ngp.NGPField (which remains available as `field=ngp` for parity study).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .ngp import sh_encoding_deg4


class DenseGridConfig(NamedTuple):
    resolutions: Tuple[int, ...] = (64, 160, 256)
    features_per_level: int = 4


def grid_encode_level(grid_zf: jnp.ndarray, points01: jnp.ndarray,
                      features: int) -> jnp.ndarray:
    """One level: (R0, R1, R2*F) z-packed grid, (N, 3) points in [0,1] ->
    (F, N) trilinear features. 4 row offsets per point (see module doc)."""
    F = features
    N = points01.shape[0]
    R = (grid_zf.shape[0], grid_zf.shape[1], grid_zf.shape[2] // F)
    p = points01.astype(jnp.float32)
    x = p[:, 0] * (R[0] - 1)
    y = p[:, 1] * (R[1] - 1)
    z = p[:, 2] * (R[2] - 1)
    ix = jnp.clip(jnp.floor(x), 0, R[0] - 2).astype(jnp.int32)
    iy = jnp.clip(jnp.floor(y), 0, R[1] - 2).astype(jnp.int32)
    iz = jnp.clip(jnp.floor(z), 0, R[2] - 2).astype(jnp.int32)
    wx = (x - ix).astype(grid_zf.dtype)
    wy = (y - iy).astype(grid_zf.dtype)
    wz = (z - iz).astype(grid_zf.dtype)

    # (4, N, 3) xy-corner starts -> (4N, 3); each gathers one 2F-wide row
    # holding both z corners' features of that xy column.
    starts = jnp.stack([
        jnp.stack([ix + cx, iy + cy, iz * F], -1)
        for cx in (0, 1) for cy in (0, 1)], 0).reshape(4 * N, 3)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(0,), collapsed_slice_dims=(0, 1),
        start_index_map=(0, 1, 2))
    # offset_dims=(0,): output (2F, 4N) — big axis minor (tile-friendly)
    rows = jax.lax.gather(
        grid_zf, starts, dn, slice_sizes=(1, 1, 2 * F),
        mode=jax.lax.GatherScatterMode.CLIP)
    rows = rows.reshape(2, F, 4, N)            # (dz, f, xy-corner, point)

    out = jnp.zeros((F, N), grid_zf.dtype)
    for c, (cx, cy) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        wxy = (wx if cx else 1.0 - wx) * (wy if cy else 1.0 - wy)   # (N,)
        out = out + (rows[0, :, c] * (1.0 - wz) + rows[1, :, c] * wz) * wxy
    return out


# Chunking the point axis keeps every gather AND its backward scatter-add
# under the axon fault boundary (platform_limits.MAX_SCATTER_ROWS; bisect in
# tools/debug_dense_step2.py). Chunk count is static (shapes are traced), so
# jit sees a short unrolled loop.
from ..platform_limits import ENCODE_CHUNK


def grid_encode(grids, points01: jnp.ndarray, cfg: DenseGridConfig
                ) -> jnp.ndarray:
    """All levels -> (N, L*F) features (same output convention as
    ngp.hash_encode; levels looped in Python — shapes differ per level)."""
    N = points01.shape[0]
    if N > ENCODE_CHUNK:
        return jnp.concatenate(
            [grid_encode(grids, points01[beg:beg + ENCODE_CHUNK], cfg)
             for beg in range(0, N, ENCODE_CHUNK)], 0)
    feats = [grid_encode_level(g, points01, cfg.features_per_level)
             for g in grids]
    return jnp.concatenate(feats, 0).T                         # (N, L*F)


def grid_tv_loss(grids) -> jnp.ndarray:
    """Mean squared finite-difference (total-variation) regularizer over every
    level — the Plenoxels/DVGO smoothness prior that keeps unobserved voxels
    from free-floating. Elementwise over the grids: VPU-cheap."""
    total = 0.0
    for g in grids:
        for ax in range(3):
            d = jnp.diff(g, axis=ax)
            total = total + jnp.mean(d * d)
    return total / (3 * len(grids))


class DenseGridField(nn.Module):
    """Drop-in NGPField replacement: same density/__call__ API, dense grids.

    The MLP heads mirror NGPField (sigma 2-layer -> 1+geo_feat, color 3-layer
    on SH(dir) ++ geo_feat) so train/render/export paths are shared.
    """
    cfg: DenseGridConfig = DenseGridConfig()
    hidden: int = 64
    geo_feat: int = 15

    def setup(self):
        F = self.cfg.features_per_level
        self.grids = [
            self.param(f"grid{i}", nn.initializers.uniform(2e-4), (r, r, r * F))
            for i, r in enumerate(self.cfg.resolutions)]
        self.sigma1 = nn.Dense(self.hidden)
        self.sigma2 = nn.Dense(1 + self.geo_feat)
        self.rgb1 = nn.Dense(self.hidden)
        self.rgb2 = nn.Dense(self.hidden)
        self.rgb3 = nn.Dense(3)

    def density(self, points01: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        enc = grid_encode(self.grids, points01, self.cfg)
        h = self.sigma2(nn.relu(self.sigma1(enc)))
        sigma = jnp.exp(jnp.clip(h[:, 0], -15.0, 12.0))
        return sigma, h[:, 1:]

    def tv(self) -> jnp.ndarray:
        return grid_tv_loss(self.grids)

    def __call__(self, points01: jnp.ndarray, dirs: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        sigma, feat = self.density(points01)
        d = sh_encoding_deg4(dirs)
        h = jnp.concatenate([d, feat], -1)
        h = nn.relu(self.rgb1(h))
        h = nn.relu(self.rgb2(h))
        rgb = nn.sigmoid(self.rgb3(h))
        return sigma, rgb
