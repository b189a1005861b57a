"""Z-buffer rasterization of strand line segments and triangle meshes on TPU.

Replaces the reference's moderngl/EGL GLSL renderer (Utils/Render_utils.py:
StrandsObj/BustObj/Renderer, :8-266) — no GL on TPU hosts. Design:

- Geometry becomes *fragments* (pixel id, camera depth, attribute) with static
  shapes: each line segment is sampled at S points with a 3x3 footprint
  (line_width 3, Render_utils.py:28); each triangle is rasterized exactly over a
  K x K pixel window at the finest mip level where its bbox fits (larger
  triangles render coarser and are upsampled), so coverage has no holes.
- Depth resolution is a scatter-min into the z-buffer; attributes resolve in a
  second pass keeping fragments whose depth matches the winning depth.
- Both phases stream over fragment chunks, so memory is bounded and the same
  jitted kernels serve any scene size.

Conventions match the GL pipeline: depth = -z_cam (DEPTH_RANGE-normalized on
write), NDC x right / y up, pixel row = (1 - y_ndc)/2 * H (GL flips vertically
on readback, Render_utils.py:257).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..camera import Cameras, project

DEPTH_EPS = 1e-4


def _pixel_from_ndc(uv: jnp.ndarray, image_size) -> jnp.ndarray:
    """NDC -> continuous (row, col) with GL vertical flip: row = (1 - v)/2 * H.

    Note this differs from camera.ndc_to_pixel (the PMVO map convention, which
    negates u instead): the renderer must match GL's framebuffer orientation.
    """
    H, W = image_size
    col = (uv[..., 0] * 0.5 + 0.5) * W
    row = (1.0 - (uv[..., 1] * 0.5 + 0.5)) * H
    return jnp.stack([row, col], -1)


# -----------------------------------------------------------------------------
# Line segments
# -----------------------------------------------------------------------------

_FOOT3 = np.stack(np.meshgrid(np.arange(-1, 2), np.arange(-1, 2), indexing="ij"),
                  -1).reshape(-1, 2)


@partial(jax.jit, static_argnames=("image_size", "samples"))
def _line_fragments(cam: Cameras, p0: jnp.ndarray, p1: jnp.ndarray,
                    image_size: Tuple[int, int], samples: int = 6):
    """Fragments of (M, 3)x(M, 3) segments in one view: returns
    (pix_flat (M*samples*9,), depth, valid)."""
    H, W = image_size
    uv0, z0 = project(cam, p0)
    uv1, z1 = project(cam, p1)
    uv0, z0, uv1, z1 = uv0[0], z0[0], uv1[0], z1[0]
    t = jnp.linspace(0.0, 1.0, samples)
    uv = uv0[:, None, :] * (1 - t[None, :, None]) + uv1[:, None, :] * t[None, :, None]
    z = z0[:, None] * (1 - t[None]) + z1[:, None] * t[None]
    rc = _pixel_from_ndc(uv, (H, W))                     # (M, S, 2)
    rci = jnp.round(rc).astype(jnp.int32)
    rcf = rci[:, :, None, :] + jnp.asarray(_FOOT3)       # (M, S, 9, 2)
    depth = -z                                           # positive in front
    valid = ((depth[..., None] > 0)
             & (rcf[..., 0] >= 0) & (rcf[..., 0] < H)
             & (rcf[..., 1] >= 0) & (rcf[..., 1] < W))
    pix = jnp.clip(rcf[..., 0], 0, H - 1) * W + jnp.clip(rcf[..., 1], 0, W - 1)
    d = jnp.broadcast_to(depth[..., None], valid.shape)
    return pix.reshape(-1), d.reshape(-1), valid.reshape(-1)


@partial(jax.jit, static_argnames=("image_size", "samples"))
def _line_zpass(cam, p0, p1, zbuf, image_size, samples=6):
    pix, d, valid = _line_fragments(cam, p0, p1, image_size, samples)
    d = jnp.where(valid, d, jnp.inf)
    return zbuf.at[pix].min(d)


@partial(jax.jit, static_argnames=("image_size", "samples"))
def _line_attr_pass(cam, p0, p1, attr0, zbuf, out, image_size, samples=6):
    """Write per-segment attributes where the fragment wins the depth test."""
    pix, d, valid = _line_fragments(cam, p0, p1, image_size, samples)
    M = p0.shape[0]
    a = jnp.broadcast_to(attr0[:, None, None, None, :],
                         (M, samples, 9, 1, attr0.shape[-1])).reshape(-1, attr0.shape[-1])
    win = valid & (d <= zbuf.reshape(-1)[pix] + DEPTH_EPS)
    pix_w = jnp.where(win, pix, out.size // out.shape[-1])   # overflow row dropped
    padded = jnp.concatenate([out.reshape(-1, out.shape[-1]),
                              jnp.zeros((1, out.shape[-1]), out.dtype)], 0)
    padded = padded.at[pix_w].set(a)
    return padded[:-1].reshape(out.shape)


def segment_tangent_colors(cam: Cameras, p0: np.ndarray, tangent: np.ndarray,
                           mode: int) -> jnp.ndarray:
    """Per-segment color replicating the strand fragment shader
    (Render_utils.py:56-107): theta from the NDC-space projection of a 0.01-long
    step along the tangent; mode 1 = angle color, 2 = double angle, 3 = white.
    """
    step = tangent / np.maximum(np.linalg.norm(tangent, axis=-1, keepdims=True), 1e-12) * 0.01
    uv0, _ = project(cam, jnp.asarray(p0))
    uv1, _ = project(cam, jnp.asarray(p0 + step))
    t2d = (uv1 - uv0)[0]
    theta = jnp.arctan2(t2d[:, 1], t2d[:, 0])
    if mode == 1:
        rgb = jnp.stack([(jnp.cos(theta) + 1) * 0.5, (jnp.sin(theta) + 1) * 0.5,
                         jnp.zeros_like(theta)], -1)
    elif mode == 2:
        rgb = jnp.stack([(jnp.cos(2 * theta) + 1) * 0.5, (jnp.sin(2 * theta) + 1) * 0.5,
                         jnp.zeros_like(theta)], -1)
    else:
        rgb = jnp.ones((theta.shape[0], 3), jnp.float32)
    return rgb


# -----------------------------------------------------------------------------
# Triangles — mip-leveled exact bbox raster
# -----------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("image_size", "window", "scale"))
def _tri_zpass(cam: Cameras, v0, v1, v2, zbuf_level, image_size, window: int,
               scale: int):
    """Rasterize (F, 3) triangles into a (H/scale, W/scale) z-buffer level.

    Each face covers an exact `window` x `window` pixel block anchored at its
    bbox min in level coords; faces whose bbox exceeds the window are masked out
    (they belong to a coarser level). Depth is barycentric-interpolated camera
    depth (screen-space linear — adequate at these triangle sizes).
    """
    H, W = image_size
    Hl, Wl = max(H // scale, 1), max(W // scale, 1)
    uv = [project(cam, v)[0][0] for v in (v0, v1, v2)]
    z = [-project(cam, v)[1][0] for v in (v0, v1, v2)]
    rc = [_pixel_from_ndc(u, (H, W)) / scale for u in uv]    # level coords
    rc_all = jnp.stack(rc, 1)                                # (F, 3, 2)
    z_all = jnp.stack(z, 1)                                  # (F, 3)
    lim = jnp.asarray([Hl, Wl], jnp.float32)
    bb_min = jnp.clip(jnp.floor(jnp.min(rc_all, 1)), 0.0, lim)   # (F, 2)
    bb_max = jnp.clip(jnp.ceil(jnp.max(rc_all, 1)), 0.0, lim)
    size = jnp.max(bb_max - bb_min, -1)
    fits = size <= window
    if scale > 1:
        # only faces that did NOT fit one level finer (avoid re-rendering small
        # faces coarsely, which would dilate silhouettes)
        fits = fits & (size > window / 2)
    front = jnp.all(z_all > 0, -1)
    use = fits & front

    offs = jnp.stack(jnp.meshgrid(jnp.arange(window), jnp.arange(window),
                                  indexing="ij"), -1).reshape(-1, 2)     # (P, 2)
    pix = bb_min[:, None, :] + offs[None] + 0.5              # (F, P, 2) centers

    def edge(a, b, p):
        return ((p[..., 1] - a[:, None, 1]) * (b[:, 0] - a[:, 0])[:, None]
                - (p[..., 0] - a[:, None, 0]) * (b[:, 1] - a[:, 1])[:, None])

    a, b, c = rc
    w0 = edge(b, c, pix)
    w1 = edge(c, a, pix)
    w2 = edge(a, b, pix)
    area = edge(b, c, a[:, None, :])[:, 0]                   # (F,)
    area = jnp.where(jnp.abs(area) < 1e-12, 1e-12, area)
    l0, l1, l2 = w0 / area[:, None], w1 / area[:, None], w2 / area[:, None]
    inside = (l0 >= 0) & (l1 >= 0) & (l2 >= 0)
    depth = l0 * z_all[:, 0:1] + l1 * z_all[:, 1:2] + l2 * z_all[:, 2:3]

    r = pix[..., 0].astype(jnp.int32)
    cc = pix[..., 1].astype(jnp.int32)
    valid = inside & use[:, None] & (r >= 0) & (r < Hl) & (cc >= 0) & (cc < Wl)
    flat = jnp.clip(r, 0, Hl - 1) * Wl + jnp.clip(cc, 0, Wl - 1)
    d = jnp.where(valid, depth, jnp.inf)
    return zbuf_level.at[flat.reshape(-1)].min(d.reshape(-1))


def rasterize_mesh_depth(cam: Cameras, vertices: np.ndarray, faces: np.ndarray,
                         image_size: Tuple[int, int], window: int = 16,
                         levels: Optional[int] = None, chunk: int = 65536
                         ) -> jnp.ndarray:
    """(H, W) camera-depth buffer (+inf = background) of a triangle mesh."""
    H, W = image_size
    if levels is None:
        # enough levels that a full-image bbox fits the window at the coarsest
        levels = max(1, int(np.ceil(np.log2(max(H, W) / window))) + 1)
    v = jnp.asarray(vertices, jnp.float32)
    f = np.asarray(faces)
    zbufs = []
    for level in range(levels):
        scale = 2 ** level
        Hl, Wl = max(H // scale, 1), max(W // scale, 1)
        zb = jnp.full(Hl * Wl, jnp.inf, jnp.float32)
        for beg in range(0, len(f), chunk):
            sub = f[beg:beg + chunk]
            zb = _tri_zpass(cam, v[sub[:, 0]], v[sub[:, 1]], v[sub[:, 2]], zb,
                            (H, W), window, scale)
        zbufs.append(zb.reshape(Hl, Wl))
    out = zbufs[0]
    for level in range(1, levels):
        up = jnp.repeat(jnp.repeat(zbufs[level], 2 ** level, 0), 2 ** level, 1)
        up = up[:H, :W]
        # non-power-of-two sizes: (W // s) * s can fall short of W (e.g.
        # 720 at level 5 -> 704); pad the uncovered edge strip with inf
        # (level 0 always covers every pixel, so only conservative-z help
        # from coarse levels is lost there)
        ph, pw = H - up.shape[0], W - up.shape[1]
        if ph or pw:
            up = jnp.pad(up, ((0, ph), (0, pw)), constant_values=jnp.inf)
        out = jnp.minimum(out, up)
    return out


def rasterize_strands(cam: Cameras, strands_flat: np.ndarray, seg_starts: np.ndarray,
                      seg_ends: np.ndarray, colors: Optional[jnp.ndarray],
                      image_size: Tuple[int, int], chunk: int = 262144,
                      samples: int = 6) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Depth buffer (+ optional color buffer) of strand segments in one view.

    seg_starts/seg_ends: (M, 3) world endpoints; colors: (M, C) per segment.
    """
    del strands_flat
    H, W = image_size
    zbuf = jnp.full(H * W, jnp.inf, jnp.float32)
    p0 = jnp.asarray(seg_starts, jnp.float32)
    p1 = jnp.asarray(seg_ends, jnp.float32)
    M = p0.shape[0]
    for beg in range(0, M, chunk):
        zbuf = _line_zpass(cam, p0[beg:beg + chunk], p1[beg:beg + chunk], zbuf,
                           (H, W), samples)
    zimg = zbuf.reshape(H, W)
    if colors is None:
        return zimg, None
    out = jnp.zeros((H, W, colors.shape[-1]), jnp.float32)
    for beg in range(0, M, chunk):
        out = _line_attr_pass(cam, p0[beg:beg + chunk], p1[beg:beg + chunk],
                              colors[beg:beg + chunk], zimg, out, (H, W), samples)
    return zimg, out


def compose_depth_to_image(depth: jnp.ndarray, background: float = 1.0,
                           depth_range: float = 2.0) -> jnp.ndarray:
    """Camera depth buffer -> normalized image like the GL depth shader
    (depth/depth_range, background = clear color)."""
    return jnp.where(jnp.isinf(depth), background, depth / depth_range)
