"""Shared Flax building blocks for the segmentation/annotation nets.

These re-create the block vocabulary of the external checkpoints the reference
loads (calc_masks.py:21-28, dataprocess.py:453-537): IBNorm (half-BatchNorm /
half-InstanceNorm channel split), squeeze-excitation, and ConvBNReLU. Layout
is NHWC throughout (TPU-native); `segment/convert.py` transposes torch weights.

torch semantic notes (so eval-mode equivalence holds):
 - BatchNorm: running stats, momentum irrelevant at eval, eps 1e-5.
 - InstanceNorm2d(affine=True, track_running_stats=False): per-sample spatial
   stats even at eval -> flax GroupNorm(num_groups=C).
 - ReLU6 for MobileNetV2.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """bilinear, align_corners=False — matches F.interpolate(scale_factor=2,
    mode='bilinear') used throughout MODNet/BiSeNet inference."""
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, 2 * h, 2 * w, c), method="bilinear")


def resize_bilinear(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """antialias=False matches torch F.interpolate(bilinear), which never
    low-pass filters on downsample (jax's default triangle filter does)."""
    n, _, _, c = x.shape
    return jax.image.resize(x, (n, size[0], size[1], c), method="bilinear",
                            antialias=False)


class IBNorm(nn.Module):
    """MODNet's IBNorm: BatchNorm on the first half of channels, InstanceNorm
    (affine) on the rest."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        bc = c // 2
        xb = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, name="bnorm")(x[..., :bc])
        xi = nn.GroupNorm(num_groups=c - bc, epsilon=1e-5,
                          name="inorm")(x[..., bc:])
        return jnp.concatenate([xb, xi], axis=-1)


class ConvIBNormRelu(nn.Module):
    """MODNet Conv2dIBNormRelu."""
    out_ch: int
    ksize: int = 3
    stride: int = 1
    with_ibn: bool = True
    with_relu: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.ksize // 2
        x = nn.Conv(self.out_ch, (self.ksize, self.ksize),
                    strides=(self.stride, self.stride),
                    padding=[(pad, pad), (pad, pad)],
                    use_bias=not self.with_ibn, name="conv")(x)
        if self.with_ibn:
            x = IBNorm(name="ibn")(x, train)
        if self.with_relu:
            x = nn.relu(x)
        return x


class SEBlock(nn.Module):
    """Squeeze-excitation (MODNet LRBranch se_block)."""
    reduction: int = 4

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        w = jnp.mean(x, axis=(1, 2))                      # (N, C)
        w = nn.relu(nn.Dense(max(c // self.reduction, 1), name="fc1")(w))
        w = nn.sigmoid(nn.Dense(c, name="fc2")(w))
        return x * w[:, None, None, :]


class ConvBNReLU(nn.Module):
    """BiSeNet ConvBNReLU (conv no-bias + BN + ReLU)."""
    out_ch: int
    ksize: int = 3
    stride: int = 1
    with_relu: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.ksize // 2
        x = nn.Conv(self.out_ch, (self.ksize, self.ksize),
                    strides=(self.stride, self.stride),
                    padding=[(pad, pad), (pad, pad)],
                    use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn")(x)
        return nn.relu(x) if self.with_relu else x
