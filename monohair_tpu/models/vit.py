"""View-fusion transformer with DeepViT re-attention.

Flax port of OccViT (submodules/DeepMVSHair/models/ViT.py:145-231): fuses V
per-view tokens (pixel-aligned image feature ⊕ view-space point encoding) with a
cls token (⊕ world-space point encoding) through `depth` re-attention blocks
(ViT.py:40-98) and reads the cls token through a 3-layer MLP head.

The sequence length is tiny (V+1 = 17 tokens); the batch axis (query points) is
where the parallelism lives — everything is written batch-first so `pjit` over
points shards cleanly.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


class ReAttention(nn.Module):
    """Multi-head attention with learned cross-head re-mixing (ViT.py:40-82)."""
    dim: int
    heads: int = 8
    dim_head: int = 64

    @nn.compact
    def __call__(self, x):
        b, n, _ = x.shape
        inner = self.dim_head * self.heads
        qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, -1)

        def heads(t):
            return t.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        scale = self.dim_head ** -0.5
        dots = jnp.einsum("bhid,bhjd->bhij", q, k) * scale
        attn = nn.softmax(dots, axis=-1)
        # re-attention: mix attention maps across heads, then LayerNorm over heads
        reattn_w = self.param("reattn_weights", nn.initializers.normal(1.0),
                              (self.heads, self.heads))
        attn = jnp.einsum("bhij,hg->bgij", attn, reattn_w)
        attn = attn.transpose(0, 2, 3, 1)                  # b i j h
        attn = nn.LayerNorm(name="reattn_norm")(attn)
        attn = attn.transpose(0, 3, 1, 2)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        return nn.Dense(self.dim, name="to_out")(out)


class TransformerBlock(nn.Module):
    dim: int
    heads: int
    dim_head: int
    mlp_dim: int

    @nn.compact
    def __call__(self, x):
        x = x + ReAttention(self.dim, self.heads, self.dim_head, name="attn")(
            nn.LayerNorm(name="norm1")(x))
        h = nn.LayerNorm(name="norm2")(x)
        h = nn.Dense(self.mlp_dim, name="ff1")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, name="ff2")(h)
        return x + h


class OccViT(nn.Module):
    """View-fusion head. output_dim=2 for occupancy logits, 3 for orientation."""
    output_dim: int
    token_dim: int = 128
    feat_dim: int = 240
    pt_dim: int = 33
    depth: int = 3
    heads: int = 8
    dim_head: int = 128       # the reference passes dim_head = vit_dim
    mlp_dim: int = 128
    num_views: int = 16
    use_pos: bool = True
    use_pt: bool = True
    fuse_func: str = "vit"    # vit | avg

    @nn.compact
    def __call__(self, img_feat: jnp.ndarray,
                 pts_world_feat: Optional[jnp.ndarray] = None,
                 pts_view_feat: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """img_feat: (N, V, C_ft); pts_world_feat: (N, 1, pt_dim);
        pts_view_feat: (N, V, pt_dim) -> (N, output_dim)."""
        n = img_feat.shape[0]
        x = (jnp.concatenate([img_feat, pts_view_feat], -1)
             if self.use_pt else img_feat)
        view_tokens = nn.Dense(self.token_dim, name="view_fuse_pt")(x)

        if self.fuse_func == "avg":
            token = jnp.mean(view_tokens, 1)
        else:
            cls = self.param("cls_token", nn.initializers.normal(1.0),
                             (1, 1, self.token_dim))
            cls = jnp.broadcast_to(cls, (n, 1, self.token_dim))
            if self.use_pt:
                cls = jnp.concatenate([cls, pts_world_feat], -1)
            cls = nn.Dense(self.token_dim, name="cls_fuse_pt")(cls)
            y = jnp.concatenate([cls, view_tokens], 1)    # (N, V+1, tk)
            if self.use_pos:
                pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                                 (1, self.num_views + 1, self.token_dim))
                y = y + pos
            for d in range(self.depth):
                y = TransformerBlock(self.token_dim, self.heads, self.dim_head,
                                     self.mlp_dim, name=f"block{d}")(y)
            token = y[:, 0]

        h = nn.LayerNorm(name="head_norm")(token)
        h = nn.relu(nn.Dense(self.token_dim, name="head1")(h))
        h = nn.relu(nn.Dense(self.token_dim, name="head2")(h))
        return nn.Dense(self.output_dim, name="head_out")(h)
