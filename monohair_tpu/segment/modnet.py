"""MODNet portrait matting network in Flax.

The reference obtains silhouette mattes from MODNet (calc_masks.py:38-64,
144-155; dataprocess.py:253-324). The architecture is re-derived from the
MODNet paper ("Is a Green Screen Really Necessary for Real-Time Portrait
Matting?") and the module structure named in the checkpoint the reference
loads: a MobileNetV2 encoder with three decoders —

  LRBranch    semantic (/8): SE on enc32x, two 5x5 ConvIBNormRelu stages with
              2x upsamples -> lr8x (hr-branch guidance) + semantic head
  HRBranch    detail (/1): fuses downsampled images with enc2x/enc4x and the
              upsampled semantics through 3x3 ConvIBNormRelu stacks
  FusionBranch matte: merges lr and hr streams, sigmoid head

Inference contract (what the pipeline uses): `apply(params, img)` with img
(N, H, W, 3) already normalized to [-1, 1], H/W multiples of 32; returns the
matte (N, H, W, 1) in [0, 1]. Channel widths scale with `width`
(1.0 = published net; hr_channels = 32 * width).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .backbones import MobileNetV2
from .nn_blocks import ConvIBNormRelu, SEBlock, resize_bilinear, upsample2x


class LRBranch(nn.Module):
    width: float = 1.0

    @nn.compact
    def __call__(self, enc32x, train: bool = False):
        w = self.width
        x = SEBlock(name="se_block")(enc32x)
        x = upsample2x(x)
        x = ConvIBNormRelu(max(int(96 * w), 8), 5, name="conv_lr16x")(x, train)
        x = upsample2x(x)
        lr8x = ConvIBNormRelu(max(int(32 * w), 4), 5, name="conv_lr8x")(x, train)
        sem = ConvIBNormRelu(1, 3, with_ibn=False, with_relu=False,
                             name="conv_lr")(lr8x, train)
        return nn.sigmoid(sem), lr8x


class HRBranch(nn.Module):
    width: float = 1.0

    @nn.compact
    def __call__(self, img, enc2x, enc4x, lr8x, train: bool = False):
        hr = max(int(32 * self.width), 4)
        n, H, W, _ = img.shape
        img2x = resize_bilinear(img, (H // 2, W // 2))
        img4x = resize_bilinear(img, (H // 4, W // 4))

        enc2x = ConvIBNormRelu(hr, 1, name="tohr_enc2x")(enc2x, train)
        hr4x = ConvIBNormRelu(hr, 3, stride=2, name="conv_enc2x")(
            jnp.concatenate([img2x, enc2x], -1), train)
        enc4x = ConvIBNormRelu(hr, 1, name="tohr_enc4x")(enc4x, train)
        hr4x = ConvIBNormRelu(2 * hr, 3, name="conv_enc4x")(
            jnp.concatenate([hr4x, enc4x], -1), train)

        lr4x = upsample2x(lr8x)
        x = jnp.concatenate([hr4x, lr4x, img4x], -1)
        for i, c in enumerate((2 * hr, 2 * hr, hr)):
            x = ConvIBNormRelu(c, 3, name=f"conv_hr4x_{i}")(x, train)
        hr2x = upsample2x(x)
        x = jnp.concatenate([hr2x, enc2x], -1)
        for i, c in enumerate((2 * hr, hr, hr, hr)):
            x = ConvIBNormRelu(c, 3, name=f"conv_hr2x_{i}")(x, train)
        hr2x = x

        d = ConvIBNormRelu(hr, 3, name="conv_hr_0")(
            jnp.concatenate([upsample2x(hr2x), img], -1), train)
        d = ConvIBNormRelu(1, 1, with_ibn=False, with_relu=False,
                           name="conv_hr_1")(d, train)
        return nn.sigmoid(d), hr2x


class FusionBranch(nn.Module):
    width: float = 1.0

    @nn.compact
    def __call__(self, img, lr8x, hr2x, train: bool = False):
        hr = max(int(32 * self.width), 4)
        lr4x = ConvIBNormRelu(hr, 5, name="conv_lr4x")(upsample2x(lr8x), train)
        lr2x = upsample2x(lr4x)
        f2x = ConvIBNormRelu(hr, 3, name="conv_f2x")(
            jnp.concatenate([lr2x, hr2x], -1), train)
        f = jnp.concatenate([upsample2x(f2x), img], -1)
        f = ConvIBNormRelu(max(hr // 2, 2), 3, name="conv_f_0")(f, train)
        f = ConvIBNormRelu(1, 1, with_ibn=False, with_relu=False,
                           name="conv_f_1")(f, train)
        return nn.sigmoid(f)


class MODNet(nn.Module):
    width: float = 1.0

    @nn.compact
    def __call__(self, img, train: bool = False):
        """img (N,H,W,3) in [-1,1] -> (semantic /8, detail /1, matte /1)."""
        enc2x, enc4x, enc32x = MobileNetV2(self.width, name="backbone")(img, train)
        semantic, lr8x = LRBranch(self.width, name="lr_branch")(enc32x, train)
        detail, hr2x = HRBranch(self.width, name="hr_branch")(
            img, enc2x, enc4x, lr8x, train)
        matte = FusionBranch(self.width, name="f_branch")(img, lr8x, hr2x, train)
        return semantic, detail, matte
