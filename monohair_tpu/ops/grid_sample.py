"""Bilinear grid sampling and clamped patch gathers.

`grid_sample_2d` matches torch.nn.functional.grid_sample(align_corners=False,
padding_mode='zeros') — the op the reference uses for pixel-aligned feature
lookup in DeepMVSHair (models/UnetSimple.py:88, pifu_attn.py:245).

`gather_patches` is the clamped integer patch gather used throughout PMVO
(PMVO.py:491-515 get_ori_patch/get_c_patch): for each point it reads a
(patch*patch) window around its pixel, clamping rows/cols independently.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def grid_sample_2d(feat: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample (C, H, W) features at (N, 2) NDC (x, y) coords -> (N, C).

    align_corners=False: pixel = ((coord + 1) * size - 1) / 2 (x -> W, y -> H).
    Out-of-bounds taps contribute zero (padding_mode='zeros').
    """
    C, H, W = feat.shape
    x = ((coords[:, 0] + 1.0) * W - 1.0) * 0.5
    y = ((coords[:, 1] + 1.0) * H - 1.0) * 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def tap(yi, xi, w):
        inb = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        vals = feat[:, yc, xc]              # (C, N)
        return vals * (w * inb)[None, :]

    out = (tap(y0, x0, (1 - wy) * (1 - wx))
           + tap(y0, x0 + 1, (1 - wy) * wx)
           + tap(y0 + 1, x0, wy * (1 - wx))
           + tap(y0 + 1, x0 + 1, wy * wx))
    return out.T  # (N, C)


def grid_sample_views(feats: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """vmap of grid_sample_2d over a view axis: (V, C, H, W), (V, N, 2) -> (V, N, C)."""
    return jax.vmap(grid_sample_2d)(feats, coords)


@partial(jax.jit, static_argnames=("patch_size",))
def gather_patches(image: jnp.ndarray, rc: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """Gather clamped (patch_size x patch_size) windows.

    image: (H, W) or (H, W, C); rc: (..., 2) integer (row, col).
    Returns (..., patch_size**2) or (..., patch_size**2, C).
    PMVO clamps row/col independently to the image bounds (PMVO.py:496-497).
    """
    H, W = image.shape[:2]
    half = patch_size // 2
    offs = jnp.arange(-half, half + 1)
    # reference iterates i (rows) outer, j (cols) inner -> index p = i*patch+j
    orow = jnp.repeat(offs, patch_size)
    ocol = jnp.tile(offs, patch_size)
    rows = jnp.clip(rc[..., 0:1] + orow, 0, H - 1)
    cols = jnp.clip(rc[..., 1:2] + ocol, 0, W - 1)
    return image[rows, cols]


def gather_pixels(image: jnp.ndarray, rc: jnp.ndarray) -> jnp.ndarray:
    """Point lookup image[(row, col)] with rc already clamped; (H, W[, C]) -> (...)."""
    return image[rc[..., 0], rc[..., 1]]
