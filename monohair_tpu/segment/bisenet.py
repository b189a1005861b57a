"""BiSeNet face/hair parsing network in Flax.

The reference runs face-parsing.PyTorch's BiSeNet(n_classes=19) for per-frame
face parsing (dataprocess.py:453-537) and CDGNet for hair parsing
(calc_masks.py:157-233). Both external repos are unvendored submodules; this
module provides the parsing capability TPU-natively with one net: the
face-parsing variant of BiSeNet (ResNet-18 context path, no separate spatial
path — feat8 doubles as the spatial stream), whose CelebAMask-HQ label set
includes `hair` (class 17), so it serves both the face-parsing annotation
backend and — wrapped in the reference's 3-scale + horizontal-flip ensemble
protocol (calc_masks.py:89-119) — the hair-mask stage.

Inference contract: `apply(params, img)` with img (N, H, W, 3) ImageNet-
normalized; returns (out, out16, out32) logits, each (N, H, W, n_classes)
upsampled to input size.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .backbones import ResNet18
from .nn_blocks import ConvBNReLU, resize_bilinear, upsample2x


class AttentionRefinement(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat = ConvBNReLU(self.out_ch, 3, name="conv")(x, train)
        att = jnp.mean(feat, axis=(1, 2), keepdims=True)
        att = nn.Conv(self.out_ch, (1, 1), use_bias=False, name="conv_atten")(att)
        att = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                           name="bn_atten")(att)
        return feat * nn.sigmoid(att)


class ContextPath(nn.Module):
    width: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = max(int(128 * self.width), 8)
        feat8, feat16, feat32 = ResNet18(self.width, name="resnet")(x, train)
        h16, w16 = feat16.shape[1:3]
        h32, w32 = feat32.shape[1:3]

        avg = jnp.mean(feat32, axis=(1, 2), keepdims=True)
        avg = ConvBNReLU(mid, 1, name="conv_avg")(avg, train)
        avg_up = jnp.broadcast_to(avg, (avg.shape[0], h32, w32, mid))

        f32 = AttentionRefinement(mid, name="arm32")(feat32, train) + avg_up
        f32_up = resize_bilinear(f32, (h16, w16))
        f32_up = ConvBNReLU(mid, 3, name="conv_head32")(f32_up, train)

        f16 = AttentionRefinement(mid, name="arm16")(feat16, train) + f32_up
        f16_up = resize_bilinear(f16, feat8.shape[1:3])
        f16_up = ConvBNReLU(mid, 3, name="conv_head16")(f16_up, train)

        return feat8, f16_up, f32_up   # spatial, cp8, cp16


class FeatureFusion(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, fsp, fcp, train: bool = False):
        feat = ConvBNReLU(self.out_ch, 1, name="convblk")(
            jnp.concatenate([fsp, fcp], -1), train)
        att = jnp.mean(feat, axis=(1, 2), keepdims=True)
        att = nn.relu(nn.Conv(self.out_ch // 4, (1, 1), use_bias=False,
                              name="conv1")(att))
        att = nn.sigmoid(nn.Conv(self.out_ch, (1, 1), use_bias=False,
                                 name="conv2")(att))
        return feat + feat * att


class SegHead(nn.Module):
    mid_ch: int
    n_classes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNReLU(self.mid_ch, 3, name="conv")(x, train)
        return nn.Conv(self.n_classes, (1, 1), use_bias=False, name="conv_out")(x)


class BiSeNet(nn.Module):
    n_classes: int = 19
    width: float = 1.0

    @nn.compact
    def __call__(self, img, train: bool = False):
        H, W = img.shape[1:3]
        mid = max(int(128 * self.width), 8)
        fuse = max(int(256 * self.width), 16)
        feat_sp, feat_cp8, feat_cp16 = ContextPath(self.width, name="cp")(img, train)
        feat_fuse = FeatureFusion(fuse, name="ffm")(feat_sp, feat_cp8, train)
        out = SegHead(fuse, self.n_classes, name="conv_out")(feat_fuse, train)
        out16 = SegHead(max(int(64 * self.width), 8), self.n_classes,
                        name="conv_out16")(feat_cp8, train)
        out32 = SegHead(max(int(64 * self.width), 8), self.n_classes,
                        name="conv_out32")(feat_cp16, train)
        out = resize_bilinear(out, (H, W))
        out16 = resize_bilinear(out16, (H, W))
        out32 = resize_bilinear(out32, (H, W))
        return out, out16, out32


# CelebAMask-HQ label ids (face-parsing.PyTorch ordering)
FACE_CLASSES = ("background", "skin", "l_brow", "r_brow", "l_eye", "r_eye",
                "eye_g", "l_ear", "r_ear", "ear_r", "nose", "mouth", "u_lip",
                "l_lip", "neck", "neck_l", "cloth", "hair", "hat")
HAIR_CLASS = 17
SKIN_CLASSES = (1, 2, 3, 4, 5, 10, 11, 12, 13)
