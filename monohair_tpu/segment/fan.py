"""FAN (Face Alignment Network) 2D landmark detector in Flax.

The reference generates per-frame 68-point landmarks with the face_alignment
package (dataprocess.py:327-373), whose detector is Bulat & Tzimiropoulos'
FAN: stacked hourglass modules over 3-branch residual ConvBlocks, emitting
68 heatmaps at 1/4 input resolution. Re-derived here from the paper ("How far
are we from solving the 2D & 3D Face Alignment problem?"); `segment/convert.py`
maps the torch state_dict.

Contract: `apply(params, img)` with img (N, 256, 256, 3) in [0,1] -> list of
(N, 64, 64, 68) heatmaps (one per module; use the last). `decode_heatmaps`
reproduces face_alignment's sub-pixel argmax (+0.25 toward the gradient).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class ConvBlock(nn.Module):
    """FAN's 3-branch residual block: out = cat(c1, c2, c3) + shortcut."""
    out_ch: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                                name=name)

        def conv(ch, k, name):
            p = k // 2
            return nn.Conv(ch, (k, k), padding=[(p, p), (p, p)],
                           use_bias=False, name=name)

        o = self.out_ch
        y1 = conv(o // 2, 3, "conv1")(nn.relu(bn("bn1")(x)))
        y2 = conv(o // 4, 3, "conv2")(nn.relu(bn("bn2")(y1)))
        y3 = conv(o // 4, 3, "conv3")(nn.relu(bn("bn3")(y2)))
        out = jnp.concatenate([y1, y2, y3], -1)
        if x.shape[-1] != o:
            x = conv(o, 1, "down_conv")(nn.relu(bn("down_bn")(x)))
        return out + x


class HourGlass(nn.Module):
    depth: int
    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.features

        def recurse(level, inp):
            up1 = ConvBlock(f, name=f"b1_{level}")(inp, train)
            low = nn.avg_pool(inp, (2, 2), (2, 2))
            low = ConvBlock(f, name=f"b2_{level}")(low, train)
            if level > 1:
                low = recurse(level - 1, low)
            else:
                low = ConvBlock(f, name=f"b2_plus_{level}")(low, train)
            low = ConvBlock(f, name=f"b3_{level}")(low, train)
            n, h, w, c = low.shape
            up2 = jnp.repeat(jnp.repeat(low, 2, axis=1), 2, axis=2)  # nearest 2x
            return up1 + up2

        return recurse(self.depth, x)


class FAN(nn.Module):
    num_modules: int = 4
    depth: int = 4
    width: float = 1.0
    num_landmarks: int = 68

    @nn.compact
    def __call__(self, x, train: bool = False) -> Sequence[jnp.ndarray]:
        f = max(int(256 * self.width), 16)

        def bn(name):
            return nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                                name=name)

        x = nn.Conv(max(int(64 * self.width), 8), (7, 7), strides=(2, 2),
                    padding=[(3, 3), (3, 3)], name="conv1")(x)
        x = nn.relu(bn("bn1")(x))
        x = ConvBlock(max(int(128 * self.width), 8), name="conv2")(x, train)
        x = nn.avg_pool(x, (2, 2), (2, 2))
        x = ConvBlock(max(int(128 * self.width), 8), name="conv3")(x, train)
        x = ConvBlock(f, name="conv4")(x, train)

        outputs = []
        for m in range(self.num_modules):
            hg = HourGlass(self.depth, f, name=f"m{m}")(x, train)
            ll = ConvBlock(f, name=f"top_m_{m}")(hg, train)
            ll = nn.Conv(f, (1, 1), name=f"conv_last{m}")(ll)
            ll = nn.relu(bn(f"bn_end{m}")(ll))
            heat = nn.Conv(self.num_landmarks, (1, 1), name=f"l{m}")(ll)
            outputs.append(heat)
            if m < self.num_modules - 1:
                x = (x + nn.Conv(f, (1, 1), name=f"bl{m}")(ll)
                     + nn.Conv(f, (1, 1), name=f"al{m}")(heat))
        return outputs


def decode_heatmaps(heat: np.ndarray) -> np.ndarray:
    """(N, Hh, Wh, L) heatmaps -> (N, L, 2) (x, y) in heatmap pixels, with
    face_alignment's quarter-pixel shift toward the neighboring gradient."""
    heat = np.asarray(heat)
    n, hh, wh, L = heat.shape
    flat = heat.reshape(n, hh * wh, L)
    idx = np.argmax(flat, axis=1)                       # (N, L)
    ys, xs = np.divmod(idx, wh)
    out = np.zeros((n, L, 2), np.float32)
    for i in range(n):
        for l in range(L):
            x, y = int(xs[i, l]), int(ys[i, l])
            px, py = float(x), float(y)
            if 0 < x < wh - 1:
                px += 0.25 * np.sign(heat[i, y, x + 1, l] - heat[i, y, x - 1, l])
            if 0 < y < hh - 1:
                py += 0.25 * np.sign(heat[i, y + 1, x, l] - heat[i, y - 1, x, l])
            out[i, l] = (px, py)
    return out
