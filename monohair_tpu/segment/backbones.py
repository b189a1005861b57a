"""Flax backbones for the segmentation/annotation nets.

MobileNetV2 — MODNet's encoder (the reference loads MODNet(backbone_pretrained
=False) at calc_masks.py:145; the standard t/c/n/s table below). Exposes the
feature taps MODNet consumes: enc2x (/2, 16ch), enc4x (/4, 24ch), enc32x
(/32, 1280ch).

ResNet-18 — face-parsing BiSeNet's context path (dataprocess.py:453-537 loads
BiSeNet(n_classes=19) whose Resnet18 taps feat8/feat16/feat32 after
layer2/3/4).

A `width` multiplier scales every channel count (1.0 = the published nets);
tests use narrow variants so golden fixtures stay small.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .nn_blocks import ConvBNReLU


def make_divisible(v: float, divisor: int = 8) -> int:
    """torchvision's channel rounding for width-scaled MobileNetV2."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class _ConvBNReLU6(nn.Module):
    out_ch: int
    ksize: int = 3
    stride: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.ksize // 2
        x = nn.Conv(self.out_ch, (self.ksize, self.ksize),
                    strides=(self.stride, self.stride),
                    padding=[(pad, pad), (pad, pad)], use_bias=False,
                    feature_group_count=self.groups, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn")(x)
        return jnp.minimum(nn.relu(x), 6.0)


class InvertedResidual(nn.Module):
    out_ch: int
    stride: int
    expand: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        hidden = int(round(in_ch * self.expand))
        y = x
        if self.expand != 1:
            y = _ConvBNReLU6(hidden, 1, name="pw")(y, train)
        y = _ConvBNReLU6(hidden, 3, self.stride, groups=hidden, name="dw")(y, train)
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, name="pwl")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="pwl_bn")(y)
        if self.stride == 1 and in_ch == self.out_ch:
            y = x + y
        return y


# (expand t, channels c, repeats n, stride s) — the MobileNetV2 paper table
MBV2_CFG: Sequence[Tuple[int, int, int, int]] = (
    (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
    (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1))


class MobileNetV2(nn.Module):
    width: float = 1.0

    def tap_channels(self) -> Tuple[int, int, int]:
        # head channel floor keeps narrow test nets functional
        return (make_divisible(16 * self.width), make_divisible(24 * self.width),
                max(make_divisible(1280 * self.width), 32))

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x (N,H,W,3) -> (enc2x, enc4x, enc32x)."""
        w = self.width
        ch = make_divisible(32 * w)
        x = _ConvBNReLU6(ch, 3, 2, name="stem")(x, train)
        taps = {}
        idx = 0
        for t, c, n, s in MBV2_CFG:
            out_ch = make_divisible(c * w)
            for i in range(n):
                x = InvertedResidual(out_ch, s if i == 0 else 1, t,
                                     name=f"block{idx}")(x, train)
                idx += 1
            if c == 16:
                taps["enc2x"] = x
            elif c == 24:
                taps["enc4x"] = x
        head = max(make_divisible(1280 * w), 32)
        x = _ConvBNReLU6(head, 1, name="head")(x, train)
        return taps["enc2x"], taps["enc4x"], x


class BasicBlock(nn.Module):
    out_ch: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBNReLU(self.out_ch, 3, self.stride, name="conv1")(x, train)
        y = ConvBNReLU(self.out_ch, 3, 1, with_relu=False, name="conv2")(y, train)
        if self.stride != 1 or x.shape[-1] != self.out_ch:
            x = ConvBNReLU(self.out_ch, 1, self.stride, with_relu=False,
                           name="down")(x, train)
        return nn.relu(x + y)


class ResNet18(nn.Module):
    width: float = 1.0

    def tap_channels(self) -> Tuple[int, int, int]:
        return (int(128 * self.width), int(256 * self.width),
                int(512 * self.width))

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = self.width
        x = ConvBNReLU(int(64 * w), 7, 2, name="stem")(x, train)
        x = nn.max_pool(x, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])
        feats = []
        for li, (c, s) in enumerate(((64, 1), (128, 2), (256, 2), (512, 2))):
            for bi in range(2):
                x = BasicBlock(int(c * w), s if bi == 0 else 1,
                               name=f"layer{li + 1}_{bi}")(x, train)
            feats.append(x)
        return feats[1], feats[2], feats[3]   # feat8, feat16, feat32
