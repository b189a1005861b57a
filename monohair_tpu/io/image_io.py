"""Per-view map loading: 2D orientation, confidence, depth, hair mask.

These mirror the decode conventions of the reference exactly:
- orientation images store the Gabor angle in degrees as grayscale; decode is
  theta = (180 - g)/180 * pi, vector = (sin theta, cos theta)
  (PMVO_utils.py:255-276 `Load_Ori_And_Conf`)
- confidence images are grayscale / 255
- depth is a (H, W, 3) .npy holding 255 * (-z_cam)/2 (PMVO_utils.py:278-295)
- masks binarize at 50/255 (PMVO_utils.py:297-313)
"""

from __future__ import annotations

import math
import os
from typing import Dict, List, Tuple

import cv2
import numpy as np

_SUFFIXES = (".JPG", ".png", ".jpg")


def _find(path_no_ext: str) -> str:
    for s in _SUFFIXES:
        if os.path.exists(path_no_ext + s):
            return path_no_ext + s
    raise FileNotFoundError(path_no_ext + " (.JPG/.png/.jpg)")


def decode_orientation_image(gray: np.ndarray) -> np.ndarray:
    """(H, W) uint8/float angle-in-degrees image -> (H, W, 2) (sin, cos) vectors."""
    theta = (180.0 - gray.astype(np.float32)) / 180.0 * math.pi
    return np.stack([np.sin(theta), np.cos(theta)], -1)


def encode_orientation_image(theta: np.ndarray) -> np.ndarray:
    """Angle in radians [0, pi) -> uint8 degree image (inverse of decode up to
    the 180-g flip; used when writing best_ori maps, GaborFilter.py:209)."""
    return np.clip(theta / math.pi * 180.0, 0, 255).astype(np.uint8)


def load_orientation_and_confidence(views: List[str], ori_dir: str, conf_dir: str
                                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Stacked (V, H, W, 2) orientation vectors and (V, H, W) confidences."""
    oris, confs = [], []
    for view in views:
        g = cv2.imread(_find(os.path.join(ori_dir, view)), cv2.IMREAD_GRAYSCALE)
        oris.append(decode_orientation_image(g))
        c = cv2.imread(_find(os.path.join(conf_dir, view)), cv2.IMREAD_GRAYSCALE)
        confs.append(c.astype(np.float32) / 255.0)
    return np.stack(oris), np.stack(confs)


def load_depth_maps(views: List[str], depth_dir: str) -> np.ndarray:
    """Stacked (V, H, W) depth maps on the 0..255 scale (channel 0 of the npy)."""
    out = []
    for view in views:
        d = np.load(os.path.join(depth_dir, view + ".npy")).astype(np.float32)
        if d.ndim == 3:
            d = d[..., 0]
        out.append(d)
    return np.stack(out)


def load_masks(views: List[str], mask_dir: str) -> np.ndarray:
    """Stacked (V, H, W) float masks; values <50/255 zeroed (PMVO_utils.py:303-304)."""
    out = []
    for view in views:
        m = cv2.imread(_find(os.path.join(mask_dir, view)))
        m = m[..., 0].astype(np.float32)
        m[m < 50] = 0
        out.append(m / 255.0)
    return np.stack(out)
