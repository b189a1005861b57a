"""Hash-grid NeRF — the instant-ngp replacement (SURVEY.md §2.5 N1).

Multiresolution hash encoding + small fused MLPs + volume rendering, all plain
XLA: the encoding is a batched gather + trilinear blend (MXU-friendly matmuls
behind it), rays batch over the device mesh. Replaces the CUDA testbed the
reference drives through pyngp (run.py:24-26,91,184-206,272-305).

Coordinates: the field lives in the NGP unit cube; NeRF world points map in via
p * 0.33 + 0.5 (the same convention as coords.nerf_to_ngp translations).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

NGP_SCALE = 0.33
NGP_OFFSET = 0.5

_PRIMES = np.array([1, 2654435761, 805459861], dtype=np.uint32)
_CORNERS = np.stack(np.meshgrid(*[np.arange(2)] * 3, indexing="ij"), -1).reshape(8, 3)


class HashGridConfig(NamedTuple):
    num_levels: int = 14
    features_per_level: int = 2
    log2_table_size: int = 19
    base_resolution: int = 16
    finest_resolution: int = 1024


def level_resolutions(cfg: HashGridConfig) -> np.ndarray:
    b = math.exp(math.log(cfg.finest_resolution / cfg.base_resolution)
                 / max(cfg.num_levels - 1, 1))
    return np.floor(cfg.base_resolution * b ** np.arange(cfg.num_levels)).astype(np.int32)


def hash_encode(table: jnp.ndarray, points01: jnp.ndarray,
                cfg: HashGridConfig) -> jnp.ndarray:
    """(L, F, T) feature-major table, (N, 3) points in [0,1] -> (N, L*F).

    Spatial hash: xor of coordinate * prime, modulo table size — per level,
    trilinear blend of the 8 hashed corners.

    Layout rules (measured on the axon v5e backend):
    - levels run under lax.scan so peak memory is one level's intermediates;
    - every large tensor keeps its BIG axis minor. TPU tiles pad the last
      two dims to (8, 128): a (N, 2) feature temp expands 64x (an OOM report
      showed f32[16.7M, 2] costing 8 GB), (N, 8) corner temps 16x, and a
      (T, 2)-stored table makes every optimizer pass 64x more HBM traffic
      (measured: adam on the (L, T, 2) table added 2 s/step). Hence the
      table is stored (L, F, T), corners are a static python loop producing
      (N,)/(F, N) arrays, and gathers read along the minor T axis."""
    res = level_resolutions(cfg).astype(np.float32)           # (L,)
    mask = jnp.uint32(2 ** cfg.log2_table_size - 1)
    points01 = points01.astype(jnp.float32)  # fixed accumulator dtype
    x, y, z = points01[:, 0], points01[:, 1], points01[:, 2]

    def level(_, inp):
        tbl_t, r = inp                                        # (F, T), scalar
        px, py, pz = x * r, y * r, z * r
        ix = jnp.floor(px)
        iy = jnp.floor(py)
        iz = jnp.floor(pz)
        wx, wy, wz = px - ix, py - iy, pz - iz
        ix = ix.astype(jnp.uint32)
        iy = iy.astype(jnp.uint32)
        iz = iz.astype(jnp.uint32)
        out = jnp.zeros((cfg.features_per_level, x.shape[0]), x.dtype)
        for cx in (0, 1):
            for cy in (0, 1):
                for cz in (0, 1):
                    h = (((ix + cx) * _PRIMES[0]) ^ ((iy + cy) * _PRIMES[1])
                         ^ ((iz + cz) * _PRIMES[2]))
                    idx = (h & mask).astype(jnp.int32)        # (N,)
                    w = ((wx if cx else 1.0 - wx)
                         * (wy if cy else 1.0 - wy)
                         * (wz if cz else 1.0 - wz))          # (N,)
                    out = out + tbl_t[:, idx] * w[None]       # (F, N)
        return None, out

    _, out = jax.lax.scan(level, None, (table, jnp.asarray(res)))  # (L, F, N)
    return out.reshape(cfg.num_levels * cfg.features_per_level, -1).T


def sh_encoding_deg4(dirs: jnp.ndarray) -> jnp.ndarray:
    """Real spherical harmonics up to degree 3 (16 coeffs) of unit (N, 3) dirs —
    instant-ngp's default direction encoding."""
    x, y, z = dirs[:, 0], dirs[:, 1], dirs[:, 2]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    one = jnp.ones_like(x)
    return jnp.stack([
        0.28209479177387814 * one,
        -0.48860251190291987 * y, 0.48860251190291987 * z, -0.48860251190291987 * x,
        1.0925484305920792 * xy, -1.0925484305920792 * yz,
        0.94617469575755997 * zz - 0.31539156525251999,
        -1.0925484305920792 * xz, 0.54627421529603959 * (xx - yy),
        0.59004358992664352 * y * (-3.0 * xx + yy),
        2.8906114426405538 * xy * z,
        0.45704579946446572 * y * (1.0 - 5.0 * zz),
        0.3731763325901154 * z * (5.0 * zz - 3.0),
        0.45704579946446572 * x * (1.0 - 5.0 * zz),
        1.4453057213202769 * z * (xx - yy),
        0.59004358992664352 * x * (-xx + 3.0 * yy),
    ], -1)


class NGPField(nn.Module):
    """Hash table + density/color MLPs."""
    cfg: HashGridConfig = HashGridConfig()
    hidden: int = 64
    geo_feat: int = 15

    def setup(self):
        # feature-major (L, F, T): minor dim = table axis, so the param, its
        # grad and the adam moments tile without padding (see hash_encode)
        self.hash_table = self.param(
            "hash_table", nn.initializers.uniform(2e-4),
            (self.cfg.num_levels, self.cfg.features_per_level,
             2 ** self.cfg.log2_table_size))
        self.sigma1 = nn.Dense(self.hidden)
        self.sigma2 = nn.Dense(1 + self.geo_feat)
        self.rgb1 = nn.Dense(self.hidden)
        self.rgb2 = nn.Dense(self.hidden)
        self.rgb3 = nn.Dense(3)

    def density(self, points01: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        enc = hash_encode(self.hash_table, points01, self.cfg)
        h = self.sigma2(nn.relu(self.sigma1(enc)))
        sigma = jnp.exp(jnp.clip(h[:, 0], -15.0, 12.0))
        return sigma, h[:, 1:]

    def __call__(self, points01: jnp.ndarray, dirs: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        sigma, feat = self.density(points01)
        d = sh_encoding_deg4(dirs)
        h = jnp.concatenate([d, feat], -1)
        h = nn.relu(self.rgb1(h))
        h = nn.relu(self.rgb2(h))
        rgb = nn.sigmoid(self.rgb3(h))
        return sigma, rgb


def nerf_to_unit(p: jnp.ndarray) -> jnp.ndarray:
    return p * NGP_SCALE + NGP_OFFSET


def camera_rays(c2w: jnp.ndarray, fx: float, fy: float, cx: float, cy: float,
                pix: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """NeRF-convention rays for (N, 2) pixel (row, col) centers.

    dirs_cam = [(col-cx)/fx, -(row-cy)/fy, -1] (OpenGL: +y up, -z forward).
    """
    x = (pix[:, 1] + 0.5 - cx) / fx
    y = -(pix[:, 0] + 0.5 - cy) / fy
    d = jnp.stack([x, y, -jnp.ones_like(x)], -1)
    d = jnp.einsum("ij,nj->ni", c2w[:3, :3], d, precision="highest")
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(c2w[:3, 3], d.shape)
    return o, d


def ray_aabb(o: jnp.ndarray, d: jnp.ndarray, lo: float = -1.5, hi: float = 1.5
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Entry/exit t of rays against the NeRF-world AABB."""
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)
    t0 = (lo - o) * inv
    t1 = (hi - o) * inv
    tmin = jnp.max(jnp.minimum(t0, t1), -1)
    tmax = jnp.min(jnp.maximum(t0, t1), -1)
    tmin = jnp.maximum(tmin, 0.05)
    # rays that MISS the box have tmax < tmin; clamp to a degenerate segment
    # at tmin so deltas stay positive (a negative delta flips the absorption
    # exponent sign -> exp overflow -> NaN loss when most rays miss, e.g.
    # far-orbit captures)
    return tmin, jnp.maximum(tmax, tmin + 0.01)


def render_rays(field: NGPField, variables, o: jnp.ndarray, d: jnp.ndarray,
                num_samples: int = 192, rng: Optional[jax.Array] = None,
                bound: float = 1.5, background: Optional[jnp.ndarray] = None
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Stratified uniform sampling + emission-absorption compositing.

    `background` (3,) is composited behind the volume: rgb += (1-opacity)*bg
    (instant-ngp's --background_color). Without it, a capture whose backdrop
    is bright but has NO geometry inside the bound is unexplainable — the
    optimizer fabricates in-volume fog to fake the backdrop, the sparsity
    prior fights it, and the loss floors (~9e-3 at bg 0.92) while the real
    surface density never clears the mesh threshold (r4/r5 e2e failure).

    Returns (rgb (N,3), depth (N,), opacity (N,)). Depth is the expected
    distance along the (unit) ray direction.
    """
    N = o.shape[0]
    tmin, tmax = ray_aabb(o, d, -bound, bound)
    u = jnp.linspace(0.0, 1.0, num_samples + 1)[:-1]
    if rng is not None:
        u = u[None] + jax.random.uniform(rng, (N, num_samples)) / num_samples
    else:
        u = jnp.broadcast_to(u[None] + 0.5 / num_samples, (N, num_samples))
    t = tmin[:, None] + (tmax - tmin)[:, None] * u            # (N, S)
    pts = o[:, None] + d[:, None] * t[..., None]
    dirs = jnp.broadcast_to(d[:, None], pts.shape)
    sigma, rgb = field.apply(variables, nerf_to_unit(pts.reshape(-1, 3)),
                             dirs.reshape(-1, 3))
    sigma = sigma.reshape(N, num_samples)
    rgb = rgb.reshape(N, num_samples, 3)
    delta = (tmax - tmin)[:, None] / num_samples * NGP_SCALE  # density in unit-cube scale
    alpha = 1.0 - jnp.exp(-sigma * delta)
    trans = jnp.cumprod(1.0 - alpha + 1e-10, -1)
    trans = jnp.concatenate([jnp.ones_like(trans[:, :1]), trans[:, :-1]], -1)
    w = alpha * trans
    rgb_out = jnp.sum(w[..., None] * rgb, 1)
    depth = jnp.sum(w * t, 1)
    opacity = jnp.sum(w, 1)
    if background is not None:
        rgb_out = rgb_out + (1.0 - opacity)[:, None] * background
    return rgb_out, depth, opacity


# -----------------------------------------------------------------------------
# Occupancy-grid accelerated sampling (instant-ngp's density bitfield, N1).
#
# The CUDA original DDA-marches a multiscale bitfield per ray — serial and
# divergent, hostile to XLA. The TPU-native equivalent keeps static shapes:
# (1) an EMA density grid updated from jittered cell-center queries every few
#     steps (same update rule: max(decay * old, fresh), instant-ngp
#     nerf/testbed_nerf.cu density-grid update);
# (2) at render time, S_coarse cheap grid *lookups* per ray build a piecewise-
#     constant PDF over the ray, and S_fine MLP samples are placed by inverse-
#     CDF — empty space costs one gather instead of a hash+MLP evaluation.
# -----------------------------------------------------------------------------


def init_occupancy_grid(resolution: int = 128) -> jnp.ndarray:
    """EMA density grid over the NeRF-world cube [-bound, bound]^3."""
    return jnp.zeros((resolution,) * 3, jnp.float32)


def update_occupancy_grid(field: NGPField, variables, values: jnp.ndarray,
                          rng: jax.Array, bound: float = 1.5,
                          decay: float = 0.95) -> jnp.ndarray:
    """One EMA update: sample sigma at a jittered point per cell,
    new = max(decay * old, sigma). Jit-friendly (fixed R^3 batch)."""
    R = values.shape[0]
    cell = 2.0 * bound / R
    ax = jnp.arange(R, dtype=jnp.float32)
    grid = jnp.stack(jnp.meshgrid(ax, ax, ax, indexing="ij"), -1).reshape(-1, 3)
    jitter = jax.random.uniform(rng, grid.shape)
    pts = -bound + (grid + jitter) * cell
    sigma, _ = field.apply(variables, nerf_to_unit(pts), method=field.density)
    return jnp.maximum(decay * values, sigma.reshape(values.shape))


def occupancy_threshold(values: jnp.ndarray) -> jnp.ndarray:
    """Adaptive cell threshold: min(mean, 2.0) — early in training (uniform low
    density) everything stays occupied, so sampling degrades gracefully to
    uniform; once the field sharpens, only real surfaces survive."""
    return jnp.minimum(jnp.mean(values), 2.0)


def _grid_lookup(values: jnp.ndarray, pts: jnp.ndarray, bound: float
                 ) -> jnp.ndarray:
    R = values.shape[0]
    idx = jnp.clip(((pts + bound) / (2 * bound) * R).astype(jnp.int32), 0, R - 1)
    return values[idx[..., 0], idx[..., 1], idx[..., 2]]


def occupancy_sample_ts(values: jnp.ndarray, o: jnp.ndarray, d: jnp.ndarray,
                        num_coarse: int, num_fine: int, bound: float,
                        rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """(N, S_fine) sample distances concentrated in occupied cells.

    Coarse midpoints probe the grid; occupied bins get weight 1, empty bins a
    small floor (so mistakes can still be carved away by training); inverse-CDF
    with stratified u places the fine samples.
    """
    N = o.shape[0]
    tmin, tmax = ray_aabb(o, d, -bound, bound)
    dt = (tmax - tmin) / num_coarse                            # (N,)
    mid = tmin[:, None] + (jnp.arange(num_coarse) + 0.5) * dt[:, None]
    pts = o[:, None] + d[:, None] * mid[..., None]
    occ = _grid_lookup(values, pts, bound) > occupancy_threshold(values)
    w = occ.astype(jnp.float32) + 0.02
    cdf = jnp.cumsum(w, -1)
    cdf = cdf / cdf[:, -1:]
    u = (jnp.arange(num_fine) + 0.5) / num_fine
    if rng is not None:
        u = (jnp.arange(num_fine) / num_fine
             + jax.random.uniform(rng, (N, num_fine)) / num_fine)
    else:
        u = jnp.broadcast_to(u, (N, num_fine))
    bins = jax.vmap(jnp.searchsorted)(cdf, u)                  # (N, S_f)
    bins = jnp.clip(bins, 0, num_coarse - 1)
    # place inside the chosen bin proportionally to u's position in the bin
    cdf_lo = jnp.where(bins > 0,
                       jnp.take_along_axis(cdf, jnp.maximum(bins - 1, 0), 1), 0.0)
    cdf_hi = jnp.take_along_axis(cdf, bins, 1)
    frac = (u - cdf_lo) / jnp.maximum(cdf_hi - cdf_lo, 1e-9)
    t = tmin[:, None] + (bins + frac) * dt[:, None]
    return jnp.sort(t, -1)


def render_rays_occ(field: NGPField, variables, values: jnp.ndarray,
                    o: jnp.ndarray, d: jnp.ndarray, num_coarse: int = 128,
                    num_fine: int = 64, rng: Optional[jax.Array] = None,
                    bound: float = 1.5, background: Optional[jnp.ndarray] = None
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Occupancy-guided volume rendering: same compositing as render_rays but
    with S_fine MLP evaluations placed by the grid instead of S uniform ones."""
    N = o.shape[0]
    t = occupancy_sample_ts(values, o, d, num_coarse, num_fine, bound, rng)
    pts = o[:, None] + d[:, None] * t[..., None]
    dirs = jnp.broadcast_to(d[:, None], pts.shape)
    sigma, rgb = field.apply(variables, nerf_to_unit(pts.reshape(-1, 3)),
                             dirs.reshape(-1, 3))
    sigma = sigma.reshape(N, num_fine)
    rgb = rgb.reshape(N, num_fine, 3)
    delta = jnp.diff(t, axis=-1, append=t[:, -1:] + 1e-3) * NGP_SCALE
    alpha = 1.0 - jnp.exp(-sigma * delta)
    trans = jnp.cumprod(1.0 - alpha + 1e-10, -1)
    trans = jnp.concatenate([jnp.ones_like(trans[:, :1]), trans[:, :-1]], -1)
    w = alpha * trans
    rgb_out = jnp.sum(w[..., None] * rgb, 1)
    opacity = jnp.sum(w, 1)
    if background is not None:
        rgb_out = rgb_out + (1.0 - opacity)[:, None] * background
    return rgb_out, jnp.sum(w * t, 1), opacity


def density_grid(field: NGPField, variables, resolution: int = 256,
                 chunk: int = 262144, bound: float = 1.5) -> np.ndarray:
    """Sample sigma over a NeRF-world grid for mesh extraction
    (run.py:272-276 marching-cubes export equivalent)."""
    axes = np.linspace(-bound, bound, resolution)
    out = np.empty((resolution ** 3,), np.float32)
    pts = np.stack(np.meshgrid(axes, axes, axes, indexing="ij"), -1).reshape(-1, 3)
    # variables ride as a jit arg: captured device arrays bake into the HLO
    # as constants (the hash grid is tens of MB — blows the axon payload cap).
    density_fn = jax.jit(lambda v, p: field.apply(v, nerf_to_unit(p),
                                                  method=field.density)[0])
    for beg in range(0, len(pts), chunk):
        sub = pts[beg:beg + chunk]
        pad = chunk - sub.shape[0]
        if pad:
            sub = np.concatenate([sub, np.zeros((pad, 3), np.float32)])
        out[beg:beg + chunk - pad] = np.asarray(density_fn(variables, jnp.asarray(
            sub.astype(np.float32))))[:chunk - pad]
    return out.reshape(resolution, resolution, resolution)
