"""Pixel-aligned implicit occupancy/orientation models.

Flax port of Occ_attn / Ori_attn (submodules/DeepMVSHair/models/pifu_attn.py:
147-371): UNet backbone features sampled at each point's projection in every
view, fused by the OccViT view transformer with NeRF positional encodings of
the world- and view-space point coordinates.

The eval-time split API matches the reference (`get_feat` once per view set,
`forward_with_feat` streamed over point batches, pifu_attn.py:240-256).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.grid_sample import grid_sample_views
from .unet import UNetSimple
from .vit import OccViT


def positional_encoding(x: jnp.ndarray, num_freqs: int = 5) -> jnp.ndarray:
    """NeRF positional encoding (pifu_attn.py:10-58): [x, sin(2^k x), cos(2^k x)]
    for k = 0..num_freqs-1 (log-sampled), appended per frequency as (sin, cos).
    (..., D) -> (..., D * (1 + 2*num_freqs))."""
    out = [x]
    for k in range(num_freqs):
        f = 2.0 ** k
        out.append(jnp.sin(x * f))
        out.append(jnp.cos(x * f))
    return jnp.concatenate(out, -1)


def pt_embed_dim(input_dims: int = 3, num_freqs: int = 5) -> int:
    return input_dims * (1 + 2 * num_freqs)


class _PifuBase(nn.Module):
    output_dim: int = 2
    in_feat: int = 4
    vit_dim: int = 128
    vit_depth: int = 3
    vit_heads: int = 8
    num_views: int = 16
    pt_res: int = 5
    fuse_func: str = "vit"
    use_pos: bool = True
    use_pt: bool = True

    def setup(self):
        self.backbone = UNetSimple(ksize=5, name="backbone")
        self.vit = OccViT(output_dim=self.output_dim, token_dim=self.vit_dim,
                          feat_dim=self.backbone.output_feat,
                          pt_dim=pt_embed_dim(3, self.pt_res), depth=self.vit_depth,
                          heads=self.vit_heads, dim_head=self.vit_dim,
                          mlp_dim=self.vit_dim, num_views=self.num_views,
                          use_pos=self.use_pos, use_pt=self.use_pt,
                          fuse_func=self.fuse_func, name="vit")

    def get_feat(self, imgs: jnp.ndarray, train: bool = False):
        """imgs: (V, H, W, C) -> tuple of 4 NHWC multi-scale feature maps."""
        return self.backbone(imgs, train)

    def _fuse(self, feats: Sequence[jnp.ndarray], pts_world: jnp.ndarray,
              pts_view: jnp.ndarray, sample_coord: jnp.ndarray) -> jnp.ndarray:
        """feats: 4 x (V, h, w, c); pts_world (N, 3); pts_view (V, N, 3);
        sample_coord (V, N, 2) NDC (x=width, y=height, grid_sample convention).
        """
        sampled = [grid_sample_views(jnp.transpose(f, (0, 3, 1, 2)), sample_coord)
                   for f in feats]                       # each (V, N, c)
        img_feat = jnp.concatenate(sampled, -1)          # (V, N, 240)
        img_feat = jnp.transpose(img_feat, (1, 0, 2))    # (N, V, 240)
        pw = positional_encoding(pts_world, self.pt_res)[:, None, :]
        pv = jnp.transpose(positional_encoding(pts_view, self.pt_res), (1, 0, 2))
        return self.vit(img_feat, pw, pv)

    def __call__(self, imgs, pts_world, pts_view, sample_coord, train: bool = False):
        feats = self.get_feat(imgs, train)
        return self.forward_with_feat(feats, pts_world, pts_view, sample_coord)

    def forward_with_feat(self, feats, pts_world, pts_view, sample_coord):
        raise NotImplementedError


class OccAttn(_PifuBase):
    """2-class occupancy head (pifu_attn.py:147-256). Returns logits (N, 2)."""
    output_dim: int = 2

    def forward_with_feat(self, feats, pts_world, pts_view, sample_coord):
        return self._fuse(feats, pts_world, pts_view, sample_coord)

    @staticmethod
    def loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
        """Cross-entropy (pifu_attn.py:185,216)."""
        logp = jax.nn.log_softmax(logits, -1)
        return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], -1))


class OriAttn(_PifuBase):
    """Unit 3-vector orientation head (pifu_attn.py:259-371). Returns (N, 3)."""
    output_dim: int = 3

    def forward_with_feat(self, feats, pts_world, pts_view, sample_coord):
        out = self._fuse(feats, pts_world, pts_view, sample_coord)
        return out / jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)

    @staticmethod
    def loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
        """Sign-agnostic L1 (pifu_attn.py:327-331)."""
        pos = jnp.mean(jnp.abs(pred - gt), -1)
        neg = jnp.mean(jnp.abs(pred + gt), -1)
        return jnp.mean(jnp.minimum(pos, neg))


def mvs_projection(w2c: jnp.ndarray, ndc: jnp.ndarray, pts: jnp.ndarray
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Project (N, 3) world points for grid_sample lookup + view-space coords.

    Mirror of getProjPoints (DeepMVSHair util.py / Utils.py:76-95): divide by
    w = -z and flip y, giving (x_gs, y_gs) where x_gs = -(fx x/z + cx) and
    y_gs = fy y/z + cy — the grid_sample convention (x->width, y->height).
    Returns (sample_coord (V, N, 2), pts_view (V, N, 3)).
    """
    cam = jnp.einsum("vij,nj->vni", w2c[:, :3, :3], pts,
                     precision="highest") + w2c[:, None, :3, 3]
    z = cam[..., 2]
    fx, fy, cx, cy = jnp.moveaxis(ndc, -1, 0)
    u = -(fx[:, None] * cam[..., 0] / z + cx[:, None])
    v = fy[:, None] * cam[..., 1] / z + cy[:, None]
    return jnp.stack([u, v], -1), cam


def check_pts_in_views(sample_coord: jnp.ndarray, mode: str = "any") -> jnp.ndarray:
    """In-frustum mask (Utils.py:98-207): (V, N, 2) -> (N,)."""
    inb = jnp.all(jnp.abs(sample_coord) < 1.0, -1)
    return jnp.any(inb, 0) if mode == "any" else jnp.all(inb, 0)
