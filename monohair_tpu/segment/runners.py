"""Jitted inference runners for the segmentation/annotation nets.

Reproduces the reference's inference protocols on TPU:
 - MattingRunner   — MODNet matte at ref 512, input scaled to a multiple of 32
                     with area interpolation, [-1,1] normalize
                     (calc_masks.py:38-64, dataprocess.py:253-324)
 - ParsingRunner   — multi-scale (0.66/0.80/1.0) + horizontal-flip ensemble
                     with left/right class swap, mean-fused, argmax
                     (calc_masks.py:67-124 protocol; net is BiSeNet whose
                     CelebAMask labels include hair=17, so one parser serves
                     the hair-mask stage and the face-parsing backend)
 - LandmarkRunner  — FAN heatmaps on a square face crop at 256, sub-pixel
                     argmax decode (dataprocess.py:327-373 / face_alignment)

Checkpoints are flattened-npz Flax trees written by tools/convert_checkpoints.py
(a torch-only process); this module never imports torch.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional, Sequence, Tuple

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from .bisenet import BiSeNet, HAIR_CLASS
from .fan import FAN, decode_heatmaps
from .modnet import MODNet

# CelebAMask-HQ left/right pairs swapped under horizontal flip
# (l_brow/r_brow, l_eye/r_eye, l_ear/r_ear)
FLIP_PAIRS = ((2, 3), (4, 5), (7, 8))

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def save_flax_tree(path: str, tree: dict):
    flat = {}

    def walk(node, prefix):
        for k, v in node.items():
            p = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, p)
            else:
                flat[p] = np.asarray(v)

    walk(tree, "")
    np.savez(path, **flat)


def load_flax_tree(path: str) -> dict:
    d = np.load(path)
    tree: dict = {}
    for k in d.files:
        node = tree
        parts = k.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = d[k]
    return tree


def _area_resize(img: np.ndarray, size_wh: Tuple[int, int]) -> np.ndarray:
    return cv2.resize(img, size_wh, interpolation=cv2.INTER_AREA)


def _modnet_size(h: int, w: int, ref: int = 512) -> Tuple[int, int]:
    """obtain_modnet_mask's resize rule (calc_masks.py:45-57): scale the short
    side to ref when outside [ref..], then floor both to multiples of 32."""
    if max(h, w) < ref or min(h, w) > ref:
        if w >= h:
            rh, rw = ref, int(w / h * ref)
        else:
            rw, rh = ref, int(h / w * ref)
    else:
        rh, rw = h, w
    return rh - rh % 32, rw - rw % 32


class MattingRunner:
    def __init__(self, ckpt_path: str, width: float = 1.0, ref_size: int = 512):
        tree = load_flax_tree(ckpt_path)
        self.variables = {"params": tree["params"],
                          "batch_stats": tree.get("batch_stats", {})}
        self.net = MODNet(width=width)
        self.ref_size = ref_size
        self._fwd = jax.jit(lambda v, x: self.net.apply(v, x)[2])

    def matte(self, images: np.ndarray) -> np.ndarray:
        """images (N, H, W, 3) uint8 RGB -> (N, H, W) float32 matte in [0,1]."""
        n, H, W, _ = images.shape
        rh, rw = _modnet_size(H, W, self.ref_size)
        x = np.stack([_area_resize(im, (rw, rh)) for im in images])
        x = (x.astype(np.float32) / 255.0 - 0.5) / 0.5
        m = np.asarray(self._fwd(self.variables, jnp.asarray(x)))[..., 0]
        return np.stack([_area_resize(mi, (W, H)) for mi in m])


class ParsingRunner:
    def __init__(self, ckpt_path: str, n_classes: int = 19, width: float = 1.0,
                 input_size: int = 512,
                 scales: Sequence[float] = (0.66, 0.80, 1.0)):
        tree = load_flax_tree(ckpt_path)
        self.variables = {"params": tree["params"],
                          "batch_stats": tree.get("batch_stats", {})}
        self.net = BiSeNet(n_classes=n_classes, width=width)
        self.input_size = input_size
        self.scales = tuple(scales)
        self.n_classes = n_classes

        def fwd(v, x):
            logits = self.net.apply(v, x)[0]
            flipped = self.net.apply(v, x[:, :, ::-1, :])[0][:, :, ::-1, :]
            # left/right class swap under the flip (calc_masks.py:106-109)
            perm = np.arange(n_classes)
            for a, b in FLIP_PAIRS:
                if a < n_classes and b < n_classes:
                    perm[a], perm[b] = b, a
            flipped = flipped[..., jnp.asarray(perm)]
            return 0.5 * (logits + flipped)

        self._fwd = jax.jit(fwd)

    def class_probs(self, images: np.ndarray) -> np.ndarray:
        """images (N, H, W, 3) uint8 RGB -> (N, H, W, C) ensemble logits."""
        n, H, W, _ = images.shape
        s0 = self.input_size
        base = np.stack([cv2.resize(im, (s0, s0), interpolation=cv2.INTER_LINEAR)
                         for im in images])
        base = (base.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        fused = None
        for s in self.scales:
            side = int(s0 * s)
            if side == s0:
                x = base
            else:
                x = np.stack([cv2.resize(b, (side, side),
                                         interpolation=cv2.INTER_LINEAR)
                              for b in base])
            out = np.asarray(self._fwd(self.variables, jnp.asarray(x)))
            out = np.stack([cv2.resize(o, (s0, s0),
                                       interpolation=cv2.INTER_LINEAR)
                            for o in out])
            fused = out if fused is None else fused + out
        fused /= len(self.scales)
        return np.stack([cv2.resize(f, (W, H), interpolation=cv2.INTER_CUBIC)
                         for f in fused])

    def parse(self, images: np.ndarray) -> np.ndarray:
        """-> (N, H, W) uint8 class-id map."""
        return np.argmax(self.class_probs(images), axis=-1).astype(np.uint8)

    def hair_mask(self, images: np.ndarray,
                  matte: Optional[np.ndarray] = None) -> np.ndarray:
        """Hair-class mask modulated by the person matte
        (calc_masks.py:217-224) -> (N, H, W) uint8 in [0,255]."""
        hair = (self.parse(images) == HAIR_CLASS).astype(np.float32)
        if matte is not None:
            hair = hair * matte
        return (hair * 255.0 + 0.5).astype(np.uint8)


class LandmarkRunner:
    def __init__(self, ckpt_path: str, width: float = 1.0,
                 num_modules: int = 4, depth: int = 4, crop_size: int = 256):
        tree = load_flax_tree(ckpt_path)
        self.variables = {"params": tree["params"],
                          "batch_stats": tree.get("batch_stats", {})}
        self.net = FAN(num_modules=num_modules, depth=depth, width=width)
        self.crop_size = crop_size
        self._fwd = jax.jit(lambda v, x: self.net.apply(v, x)[-1])

    def landmarks(self, images: np.ndarray, boxes: np.ndarray) -> np.ndarray:
        """images (N, H, W, 3) uint8; boxes (N, 4) [x0, y0, x1, y1] square face
        crops -> (N, 68, 2) landmark pixels (x, y) in the original image."""
        cs = self.crop_size
        crops, origins, sides = [], [], []
        for im, (x0, y0, x1, y1) in zip(images, boxes.astype(int)):
            side = max(x1 - x0, y1 - y0, 1)
            pad = np.zeros((side, side, 3), im.dtype)
            sx0, sy0 = max(x0, 0), max(y0, 0)
            sx1 = min(x0 + side, im.shape[1])
            sy1 = min(y0 + side, im.shape[0])
            pad[sy0 - y0:sy1 - y0, sx0 - x0:sx1 - x0] = im[sy0:sy1, sx0:sx1]
            crops.append(cv2.resize(pad, (cs, cs),
                                    interpolation=cv2.INTER_LINEAR))
            origins.append((x0, y0))
            sides.append(side)
        x = np.stack(crops).astype(np.float32) / 255.0
        heat = np.asarray(self._fwd(self.variables, jnp.asarray(x)))
        pts = decode_heatmaps(heat)                       # heatmap px (x, y)
        hm = heat.shape[1]
        out = np.zeros_like(pts)
        for i, ((ox, oy), side) in enumerate(zip(origins, sides)):
            out[i] = pts[i] * (side / hm) + (ox, oy)
        return out


def face_box_from_mask(mask: np.ndarray, thresh: float = 0.5) -> np.ndarray:
    """Square crop box from a person/skin mask (our stand-in for the
    reference's SFD face detector): bbox of mask, squared about its center."""
    ys, xs = np.nonzero(mask > thresh)
    if len(ys) == 0:
        h, w = mask.shape
        return np.array([0, 0, w, h], np.float32)
    x0, x1, y0, y1 = xs.min(), xs.max() + 1, ys.min(), ys.max() + 1
    side = max(x1 - x0, y1 - y0)
    cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
    return np.array([cx - side / 2, cy - side / 2,
                     cx + side / 2, cy + side / 2], np.float32)
