"""Differentiable soft mesh rasterization for the bust-fit losses.

The reference renders the SMPL-X mesh with PyTorch3D's CUDA soft rasterizer
(SoftSilhouetteShader, 50 faces/pixel, multiview_optimization.py:396-403) for
the silhouette loss, and with DELTA's SRenderY for the image/albedo losses.
Neither exists on TPU; this module re-designs both as scatter-add fragment
passes (the same static-shape window trick as ops/rasterize.py, but *soft*):

- Each face emits a fixed ``window`` x ``window`` block of fragments anchored at
  its screen bbox min. Per fragment we compute barycentrics and a signed pixel
  distance to the triangle boundary — both smooth functions of the projected
  vertices, so gradients flow to the mesh.
- Silhouette (SoftRas-style): per-fragment coverage D = sigmoid(dist/sigma);
  pixels aggregate 1 - prod(1 - D) via a scatter-add of log(1 - D). This is a
  single segment-sum — ideal for XLA — instead of a per-pixel face list.
- Color: softmax depth blending. w = D * exp(zn/gamma) with zn the normalized
  inverse depth; numerator/denominator accumulate by scatter-add, background
  gets weight exp(eps/gamma). Matches SoftRas aggregation semantics.

Everything is jittable with static shapes; chunking over faces keeps memory
bounded for the 10k-face SMPL-X head at full views.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..camera import Cameras, project
from ..ops.rasterize import _pixel_from_ndc


def vertex_normals(verts: jnp.ndarray, faces: np.ndarray) -> jnp.ndarray:
    """Area-weighted vertex normals via scatter-add of face normals
    (util.vertex_normals equivalent used at multiview_optimization.py:594)."""
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    fn = jnp.cross(v1 - v0, v2 - v0)                     # area-weighted
    n = jnp.zeros_like(verts)
    for k in range(3):
        n = n.at[faces[:, k]].add(fn)
    # eps inside the sqrt: norm(0)'s backward is NaN and maximum can't stop
    # it (same where-backward trap as _soft_fragments.elen) — an isolated or
    # fully-degenerate vertex otherwise poisons the whole image-loss grad
    return n / jnp.sqrt(jnp.sum(n * n, -1, keepdims=True) + 1e-24)


@partial(jax.jit, static_argnames=("image_size", "window", "scale"))
def _soft_fragments(cam: Cameras, v0, v1, v2, image_size, window: int,
                    scale: int, sigma_px: float):
    """Per-face soft fragments in every view.

    Returns (flat pixel ids (V, F*P), coverage D in [0,1), barycentrics
    (V, F*P, 3), depth (V, F*P), valid mask). P = window**2.
    """
    H, W = image_size
    Hl, Wl = max(H // scale, 1), max(W // scale, 1)
    uvs, zs = zip(*(project(cam, v) for v in (v0, v1, v2)))
    rc = [_pixel_from_ndc(u, (H, W)) / scale for u in uvs]   # (V, F, 2) each
    z_all = jnp.stack([-z for z in zs], -1)                  # (V, F, 3), >0 front
    a, b, c = rc

    bb_min = jnp.floor(jnp.minimum(jnp.minimum(a, b), c))
    offs = jnp.stack(jnp.meshgrid(jnp.arange(window), jnp.arange(window),
                                  indexing="ij"), -1).reshape(-1, 2)
    pix = jax.lax.stop_gradient(bb_min)[:, :, None, :] + offs[None, None] + 0.5

    def edge(p, q, x):
        """Signed 2x-area of (p, q, x); >0 when x is left of p->q (CCW)."""
        return ((x[..., 1] - p[..., None, 1]) * (q[..., 0] - p[..., 0])[..., None]
                - (x[..., 0] - p[..., None, 0]) * (q[..., 1] - p[..., 1])[..., None])

    w0, w1, w2 = edge(b, c, pix), edge(c, a, pix), edge(a, b, pix)
    area = edge(b, c, a[..., None, :])[..., 0]               # (V, F)
    sgn = jnp.where(area >= 0, 1.0, -1.0)[..., None]         # handle either winding
    area_abs = jnp.maximum(jnp.abs(area), 1e-9)[..., None]
    # barycentrics over the SIGN-SAFE area: a degenerate face (area==0) is
    # masked out of the forward by `valid` below, but dividing by the raw
    # area still produces inf/NaN here and jnp.where cannot stop NaN in the
    # BACKWARD — with optax.zero_nans that silently froze the whole bust fit
    # (r5 e2e: loss bit-identical for 500 iters). Clamp |area| at the source.
    area_safe = sgn * area_abs
    l0, l1, l2 = (w0 / area_safe, w1 / area_safe, w2 / area_safe)

    # signed pixel distance to the triangle boundary: min over edges of the
    # edge-function value normalized by edge length (exact in edge regions).
    def elen(p, q):
        # eps INSIDE the sqrt: jnp.linalg.norm(0)'s backward is 0/0 = NaN
        # and jnp.maximum cannot stop it (third where-backward trap here)
        sq = jnp.sum((q - p) ** 2, -1)
        return jnp.sqrt(sq + 1e-18)[..., None]

    d = jnp.minimum(jnp.minimum(sgn * w0 / elen(b, c), sgn * w1 / elen(c, a)),
                    sgn * w2 / elen(a, b))                   # (V, F, P), px units
    D = jax.nn.sigmoid(d * scale / sigma_px)

    # depth from *clipped* barycentrics: outside-face fragments take the depth
    # of the nearest boundary point instead of extrapolating toward the camera
    lc = jnp.stack([l0, l1, l2], -1)
    lc = jnp.clip(lc, 0.0, 1.0)
    lc = lc / jnp.maximum(lc.sum(-1, keepdims=True), 1e-9)
    depth = (lc[..., 0] * z_all[..., 0:1] + lc[..., 1] * z_all[..., 1:2]
             + lc[..., 2] * z_all[..., 2:3])
    front = jnp.all(z_all > 0, -1)[..., None]
    degenerate = (area_abs < 1e-8)
    r = pix[..., 0].astype(jnp.int32)
    cc = pix[..., 1].astype(jnp.int32)
    inb = (r >= 0) & (r < Hl) & (cc >= 0) & (cc < Wl)
    valid = front & inb & ~degenerate
    flat = jnp.clip(r, 0, Hl - 1) * Wl + jnp.clip(cc, 0, Wl - 1)
    V, F, P = D.shape
    bary = jnp.stack([l0, l1, l2], -1)
    return (flat.reshape(V, F * P), D.reshape(V, F * P),
            bary.reshape(V, F * P, 3), depth.reshape(V, F * P),
            valid.reshape(V, F * P))


def soft_silhouette_mesh(cam: Cameras, verts: jnp.ndarray, faces: np.ndarray,
                         image_size: Tuple[int, int], scale: int = 8,
                         window: int = 8, sigma_px: float = 2.0,
                         chunk: int = 8192) -> jnp.ndarray:
    """(V, H/scale, W/scale) soft mesh coverage in [0, 1], differentiable.

    Replaces the PyTorch3D SoftSilhouetteShader pass of the reference
    (multiview_optimization.py:396-403, 583-589).
    """
    H, W = image_size
    Hl, Wl = max(H // scale, 1), max(W // scale, 1)
    V = cam.num_views
    f = np.asarray(faces)
    acc = jnp.zeros((V, Hl * Wl), jnp.float32)
    for beg in range(0, len(f), chunk):
        sub = f[beg:beg + chunk]
        flat, D, _, _, valid = _soft_fragments(
            cam, verts[sub[:, 0]], verts[sub[:, 1]], verts[sub[:, 2]],
            (H, W), window, scale, sigma_px)
        contrib = jnp.where(valid, jnp.log1p(-jnp.clip(D, 0.0, 1.0 - 1e-6)), 0.0)
        acc = jax.vmap(lambda a, p, x: a.at[p].add(x))(acc, flat, contrib)
    return (1.0 - jnp.exp(acc)).reshape(V, Hl, Wl)


def soft_render_colors(cam: Cameras, verts: jnp.ndarray, faces: np.ndarray,
                       vert_colors: jnp.ndarray, image_size: Tuple[int, int],
                       scale: int = 8, window: int = 8, sigma_px: float = 1.0,
                       gamma: float = 1e-2, z_range: Tuple[float, float] = (0.1, 3.0),
                       background: float = 0.0, chunk: int = 8192
                       ) -> jnp.ndarray:
    """(V, H/scale, W/scale, C) softmax-depth-blended vertex-color rendering.

    The TPU-native stand-in for SRenderY's textured mesh pass (the reference's
    image/albedo losses, multiview_optimization.py:691-694): colors live on
    vertices (see texture.FlameTex) and interpolate barycentrically; per-pixel
    blending weight is coverage x exp(zn/gamma) with zn the normalized
    inverse depth, so near surfaces dominate as gamma -> 0.
    """
    H, W = image_size
    Hl, Wl = max(H // scale, 1), max(W // scale, 1)
    V = cam.num_views
    C = vert_colors.shape[-1]
    f = np.asarray(faces)
    znear, zfar = z_range

    def frag(sub):
        flat, D, bary, depth, valid = _soft_fragments(
            cam, verts[sub[:, 0]], verts[sub[:, 1]], verts[sub[:, 2]],
            (H, W), window, scale, sigma_px)
        zn = jnp.clip((zfar - depth) / (zfar - znear), 0.0, 1.0)
        return flat, D, bary, zn, valid

    # pass 1: per-pixel max of zn (softmax shift; background sits at zn = 0,
    # so empty pixels keep m = 0 and the background weight exp(0) dominates)
    m = jnp.zeros((V, Hl * Wl), jnp.float32)
    for beg in range(0, len(f), chunk):
        flat, D, _, zn, valid = frag(f[beg:beg + chunk])
        m = jax.vmap(lambda a, p, x: a.at[p].max(x))(
            m, flat, jnp.where(valid, zn, 0.0))
    m = jax.lax.stop_gradient(m)

    # pass 2: shifted softmax accumulation
    num = jnp.zeros((V, Hl * Wl, C), jnp.float32)
    den = jnp.exp(-m / gamma)                     # background term (zn = 0)
    num = num + background * den[..., None]
    for beg in range(0, len(f), chunk):
        sub = f[beg:beg + chunk]
        flat, D, bary, zn, valid = frag(sub)
        c0 = vert_colors[sub[:, 0]][None]                     # (1, F, C)
        c1 = vert_colors[sub[:, 1]][None]
        c2 = vert_colors[sub[:, 2]][None]
        P = flat.shape[1] // len(sub)
        # barycentric clipping (SoftRas): fragments outside the face would
        # otherwise extrapolate colors arbitrarily far
        b3 = jnp.clip(bary.reshape(V, len(sub), P, 3), 0.0, 1.0)
        b3 = b3 / jnp.maximum(b3.sum(-1, keepdims=True), 1e-9)
        col = (b3[..., 0:1] * c0[:, :, None] + b3[..., 1:2] * c1[:, :, None]
               + b3[..., 2:3] * c2[:, :, None]).reshape(V, -1, C)
        mg = jnp.take_along_axis(m, flat, axis=1)
        # exponent clamp: every VALID fragment has zn <= mg (mg is the
        # scatter-max over valid zn at that pixel) so clamping at 0 is a
        # no-op on the forward — but an INVALID fragment (zn > all valid)
        # otherwise overflows exp to inf, and jnp.where cannot stop inf*0
        # = NaN in the backward (same trap as the area division above).
        ex = jnp.exp(jnp.minimum((zn - mg) / gamma, 0.0))
        w = jnp.where(valid, D * ex, 0.0)
        num = jax.vmap(lambda a, p, x: a.at[p].add(x))(num, flat, w[..., None] * col)
        den = jax.vmap(lambda a, p, x: a.at[p].add(x))(den, flat, w)
    img = num / jnp.maximum(den, 1e-12)[..., None]
    return img.reshape(V, Hl, Wl, C)
