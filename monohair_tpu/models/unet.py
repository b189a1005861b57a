"""4-level UNet backbone with multi-scale pixel-aligned feature output.

Flax port of DeepMVSHair's UNetSimple (submodules/DeepMVSHair/models/
UnetSimple.py:63-102): channels (16, 32, 64, 128), ksize 5 on the encoder
(pifu_attn.py:162), 3 on the decoder; returns the four feature maps
[d3 (/8, 128ch), u1 (/4, 64ch), u2 (/2, 32ch), u3 (/1, 16ch)] whose
grid-sampled concat is the 240-dim pixel-aligned feature.

Layout is NHWC (TPU-native); the checkpoint converter transposes from torch's
NCHW weights.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvTranspose2dTorch(nn.Module):
    """Exact torch ConvTranspose2d(k, stride=2, padding=1, output_padding=1)
    semantics (a clean 2x upsample) via input-dilated convolution:
    out = conv(dilate(x, s), K, pad=(k-1-p, k-1-p+op)) with K the spatially
    flipped torch kernel. Kernel stored as (kh, kw, in, out) HWIO."""
    out_ch: int
    ksize: int = 3
    stride: int = 2
    padding: int = 1
    output_padding: int = 1

    @nn.compact
    def __call__(self, x):
        k, s, p, op = self.ksize, self.stride, self.padding, self.output_padding
        kern = self.param("kernel", nn.initializers.lecun_normal(),
                          (k, k, x.shape[-1], self.out_ch))
        bias = self.param("bias", nn.initializers.zeros, (self.out_ch,))
        pad = (k - 1 - p, k - 1 - p + op)
        y = jax.lax.conv_general_dilated(
            x, kern, window_strides=(1, 1), padding=(pad, pad),
            lhs_dilation=(s, s), dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias


class DoubleConv(nn.Module):
    out_ch: int
    ksize: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(2):
            x = nn.Conv(self.out_ch, (self.ksize, self.ksize), padding="SAME",
                        use_bias=True, name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


class UNetSimple(nn.Module):
    ksize: int = 5
    num_chan: Sequence[int] = (16, 32, 64, 128)

    @property
    def output_feat(self) -> int:
        return sum(self.num_chan)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """x: (V, H, W, C) -> four NHWC feature maps (coarsest first)."""
        c = self.num_chan
        f0 = DoubleConv(c[0], self.ksize, name="inc")(x, train)
        d1 = DoubleConv(c[1], self.ksize, name="down1")(nn.max_pool(f0, (2, 2), (2, 2)), train)
        d2 = DoubleConv(c[2], self.ksize, name="down2")(nn.max_pool(d1, (2, 2), (2, 2)), train)
        d3 = DoubleConv(c[3], self.ksize, name="down3")(nn.max_pool(d2, (2, 2), (2, 2)), train)

        def up(x_deep, skip, out_ch, name):
            y = ConvTranspose2dTorch(x_deep.shape[-1] // 2, name=f"{name}_up")(x_deep)
            y = y[:, :skip.shape[1], :skip.shape[2], :]
            y = jnp.concatenate([skip, y], -1)
            return DoubleConv(out_ch, 3, name=f"{name}_conv")(y, train)

        u1 = up(d3, d2, c[2], "up1")
        u2 = up(u1, d1, c[1], "up2")
        u3 = up(u2, f0, c[0], "up3")
        return d3, u1, u2, u3


class ShallowEncoder(nn.Module):
    """Encoder-only ablation backbone (UnetSimple.py:104-143): three conv
    stages, no decoder; 112-dim pixel-aligned feature."""
    ksize: int = 5
    num_chan: Sequence[int] = (16, 32, 64)

    @property
    def output_feat(self) -> int:
        return sum(self.num_chan)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        c = self.num_chan
        f0 = DoubleConv(c[0], self.ksize, name="inc")(x, train)
        d1 = DoubleConv(c[1], self.ksize, name="down1")(nn.max_pool(f0, (2, 2), (2, 2)), train)
        d2 = DoubleConv(c[2], self.ksize, name="down2")(nn.max_pool(d1, (2, 2), (2, 2)), train)
        return f0, d1, d2
