"""Fused Gabor-bank orientation/confidence maps.

The reference (preprocess_capture_data/GaborFilter.py) loops over 180 orientations
issuing one cuDNN conv each (GaborFilter.py:31-37) and keeps all 180 response maps
alive. Here the bank is a single (180, 1, 17, 17) filter tensor and one
`lax.conv_general_dilated`, which XLA lowers to one big MXU matmul; the argmax /
variance confidence statistics fuse behind it. ~180x fewer kernel launches and a
single pass over HBM.

Semantics (matched to GaborFilter.py:29-113):
- preprocess: difference-of-gaussians (sigma 0.4, 10) of the gray image in [0, 1]
- response(o) = |conv(image, gabor(theta_o))|, theta_o = pi*o/180
- best orientation = argmax_o response
- orient_diff(o) = circular distance(best, theta_o) on [0, pi)
- variance = sqrt( sum_o orient_diff(o) * (response(o) - max_response)^2 )
- confidence = clamp(variance / max(variance) / 0.2, 0, 1)

Kernel geometry: the gabor x axis runs along image *rows*, y along *columns*
(GaborFilter.py:127-133), grid offsets are (i - k//2 - 0.5).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import GABOR_NUM_ORIENTATIONS

CLAMP_CONF_LOW = 0.0    # GaborFilter.py:24
CLAMP_CONF_HIGH = 0.2   # GaborFilter.py:25


def gabor_bank(kernel_size: int = 17, num_orientations: int = GABOR_NUM_ORIENTATIONS,
               sigma_x: float = 1.8, sigma_y: float = 2.4, lam: float = 4.0,
               phase: float = 0.0) -> np.ndarray:
    """Build the (O, 1, k, k) oriented Gabor filter bank (GaborFilter.py:115-145)."""
    half = kernel_size // 2
    coords = np.arange(-half, half + 1, dtype=np.float64) - 0.5
    x = coords[:, None]  # rows
    y = coords[None, :]  # cols
    thetas = math.pi * np.arange(num_orientations, dtype=np.float64) / num_orientations
    ct, st = np.cos(thetas)[:, None, None], np.sin(thetas)[:, None, None]
    x_t = x[None] * ct + y[None] * st
    y_t = -x[None] * st + y[None] * ct
    gb = (np.exp(-0.5 * (x_t ** 2 / sigma_x ** 2 + y_t ** 2 / sigma_y ** 2))
          * np.cos(2.0 * math.pi * x_t / lam + phase))
    return gb[:, None].astype(np.float32)


def gaussian_kernel1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(image: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable gaussian blur of (H, W) with edge ('nearest') padding, matching
    scipy.ndimage/skimage defaults used by the reference's DoG."""
    k = jnp.asarray(gaussian_kernel1d(sigma))
    r = (k.shape[0] - 1) // 2

    def conv1d(img, axis):
        pad = [(0, 0), (0, 0)]
        pad[axis] = (r, r)
        padded = jnp.pad(img, pad, mode="edge")
        kshape = (k.shape[0], 1) if axis == 0 else (1, k.shape[0])
        return jax.lax.conv_general_dilated(
            padded[None, None], k.reshape(1, 1, *kshape), (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"), precision="highest")[0, 0]

    return conv1d(conv1d(image, 0), 1)


def difference_of_gaussians(image: jnp.ndarray, low_sigma: float = 0.4,
                            high_sigma: float = 10.0) -> jnp.ndarray:
    """DoG band-pass of a (H, W) image in [0, 1] (GaborFilter.py:192)."""
    return gaussian_blur(image, low_sigma) - gaussian_blur(image, high_sigma)


@partial(jax.jit, static_argnames=("num_orientations", "kernel_size", "chunk"))
def gabor_orientation(image: jnp.ndarray, num_orientations: int = GABOR_NUM_ORIENTATIONS,
                      kernel_size: int = 17, chunk: int = 45
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel dominant orientation + confidence of a DoG-filtered (H, W) image.

    Returns (orientation in radians [0, pi), confidence in [0, 1]).

    Two-pass streaming over orientation chunks keeps peak memory at
    (chunk, H, W) instead of (180, H, W): pass 1 finds max response + argmax,
    pass 2 accumulates the orientation-weighted response variance.
    """
    bank = jnp.asarray(gabor_bank(kernel_size, num_orientations))
    img = image[None, None].astype(jnp.float32)  # (1, 1, H, W)
    H, W = image.shape
    n_chunks = num_orientations // chunk
    assert n_chunks * chunk == num_orientations

    def respond(c):
        filt = jax.lax.dynamic_slice_in_dim(bank, c * chunk, chunk, 0)
        r = jax.lax.conv_general_dilated(
            img, filt, (1, 1), [(kernel_size // 2,) * 2] * 2,
            dimension_numbers=("NCHW", "OIHW", "NCHW"), precision="highest")
        return jnp.abs(r[0])  # (chunk, H, W)

    def pass1(c, carry):
        max_resp, argmax = carry
        r = respond(c)
        c_max = jnp.max(r, 0)
        c_arg = jnp.argmax(r, 0).astype(jnp.int32) + c * chunk
        take_new = r.max(0) > max_resp
        return jnp.where(take_new, c_max, max_resp), jnp.where(take_new, c_arg, argmax)

    max_resp, best_idx = jax.lax.fori_loop(
        0, n_chunks, pass1,
        (jnp.full((H, W), -jnp.inf, jnp.float32), jnp.zeros((H, W), jnp.int32)))

    best_orient = best_idx.astype(jnp.float32) * (math.pi / num_orientations)

    def pass2(c, acc):
        r = respond(c)
        o = (jnp.arange(chunk, dtype=jnp.float32) + c * chunk) * (math.pi / num_orientations)
        diff = jnp.abs(best_orient[None] - o[:, None, None])
        diff = jnp.minimum(diff, jnp.minimum(jnp.abs(diff - math.pi), jnp.abs(diff + math.pi)))
        rd = r - max_resp[None]
        return acc + jnp.sum(diff * rd * rd, 0)

    variance = jnp.sqrt(jax.lax.fori_loop(0, n_chunks, pass2, jnp.zeros((H, W), jnp.float32)))
    variance = variance / jnp.maximum(jnp.max(variance), 1e-12)
    confidence = jnp.clip((variance - CLAMP_CONF_LOW) / (CLAMP_CONF_HIGH - CLAMP_CONF_LOW), 0.0, 1.0)
    return best_orient, confidence


def orientation_maps(gray01: jnp.ndarray, threshold: float = 0.0
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full per-frame path: DoG -> gabor -> (two-channel ori, angle, confidence).

    gray01: (H, W) grayscale in [0, 1]. Mirror of calOrientationGabor.forward
    (GaborFilter.py:98-113). Returns ((H, W, 2) [sin, cos], angle radians, conf).
    """
    dog = difference_of_gaussians(gray01)
    angle, conf = gabor_orientation(dog)
    conf = jnp.where(conf < threshold, 0.0, conf)
    two = jnp.stack([jnp.sin(angle), jnp.cos(angle)], -1)
    return two, angle, conf
