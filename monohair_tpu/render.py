"""The four per-view render passes feeding DeepMVSHair and PMVO.

TPU replacement of render_data / render_bust_hair_depth (Utils/Render_utils.py:
269-347): bust_depth, undirectional_map (double-angle strand color over black
bust), mask (white strands over black bust), hair_depth (strand depth over white
bust), plus the colmap+bust depth .npy maps. Depth composition between strands
and mesh happens by z-buffer minimum, matching GL depth test.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import cv2
import numpy as np
import jax.numpy as jnp

from .camera import Cameras
from .constants import DEPTH_RANGE
from .io.hair_io import strand_directions
from .ops.rasterize import (compose_depth_to_image, rasterize_mesh_depth,
                            rasterize_strands, segment_tangent_colors)


def strands_to_segments(strands: Sequence[np.ndarray]
                        ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Split strands into segments with per-segment tangents (the reference
    builds GL LINES with per-vertex forward-difference tangents,
    Render_utils.py:14-27)."""
    starts, ends, tans = [], [], []
    for s in strands:
        if s.shape[0] < 2:
            continue
        starts.append(s[:-1])
        ends.append(s[1:])
        tans.append(strand_directions(s)[:-1])
    if not starts:
        z = np.zeros((0, 3), np.float32)
        return z, z.copy(), z.copy()
    return (np.concatenate(starts).astype(np.float32),
            np.concatenate(ends).astype(np.float32),
            np.concatenate(tans).astype(np.float32))


def _imwrite_rgb(path: str, img01: np.ndarray) -> None:
    arr = np.clip(np.asarray(img01) * 255.0, 0, 255).astype(np.uint8)
    if arr.ndim == 2:
        cv2.imwrite(path, arr)
    else:
        cv2.imwrite(path, arr[..., ::-1])


def render_data(cameras: Cameras, names: List[str], strands: Sequence[np.ndarray],
                bust_vertices: np.ndarray, bust_faces: np.ndarray,
                image_size: Tuple[int, int] = (1280, 720),
                save_root: Optional[str] = None) -> Dict[str, Dict[str, np.ndarray]]:
    """Render the 4 MVS input maps per view (Render_utils.py:269-307).

    image_size = (H, W). Returns {view: {bust_depth, undirectional_map, mask,
    hair_depth}} images in [0, 1]; also writes <save_root>/<view>/<name>.png.
    """
    H, W = image_size
    seg_s, seg_e, seg_t = strands_to_segments(strands)
    out: Dict[str, Dict[str, np.ndarray]] = {}
    for v, view in enumerate(names):
        cam = cameras[v]
        bust_z = rasterize_mesh_depth(cam, bust_vertices, bust_faces, (H, W))
        colors = segment_tangent_colors(cam, seg_s, seg_t, mode=2)
        hair_z, hair_col = rasterize_strands(cam, None, seg_s, seg_e, colors, (H, W))
        hair_wins = hair_z < bust_z
        bust_seen = ~jnp.isinf(bust_z)

        bust_depth = compose_depth_to_image(bust_z, background=1.0, depth_range=DEPTH_RANGE)
        undir = jnp.where(hair_wins[..., None], hair_col, 0.0)  # bust+bg black
        mask = jnp.where(hair_wins, 1.0, 0.0)
        hair_depth = jnp.where(hair_wins, hair_z / DEPTH_RANGE,
                               jnp.ones_like(hair_z))           # bust+bg white
        del bust_seen
        imgs = {"bust_depth": np.asarray(bust_depth),
                "undirectional_map": np.asarray(undir),
                "mask": np.asarray(mask),
                "hair_depth": np.asarray(hair_depth)}
        out[view] = imgs
        if save_root:
            d = os.path.join(save_root, view)
            os.makedirs(d, exist_ok=True)
            for k, img in imgs.items():
                _imwrite_rgb(os.path.join(d, k + ".png"), img)
    return out


def render_bust_hair_depth(cameras: Cameras, names: List[str],
                           colmap_vertices: np.ndarray, colmap_faces: np.ndarray,
                           save_root: Optional[str] = None,
                           image_size: Tuple[int, int] = (1280, 720),
                           capture_imgs: bool = False,
                           bust_vertices: Optional[np.ndarray] = None,
                           bust_faces: Optional[np.ndarray] = None
                           ) -> Dict[str, np.ndarray]:
    """Per-view depth of the coarse colmap mesh (+ optional bust), the
    `render_depth/<view>.npy` maps PMVO consumes (Render_utils.py:310-347).

    Returns {view: (H, W) image in [0,1]}; with capture_imgs writes
    <save_root>/<view>.npy scaled by 255 as (H, W, 3) plus a .JPG preview.
    """
    H, W = image_size
    out = {}
    for v, view in enumerate(names):
        cam = cameras[v]
        z = rasterize_mesh_depth(cam, colmap_vertices, colmap_faces, (H, W))
        if bust_vertices is not None:
            zb = rasterize_mesh_depth(cam, bust_vertices, bust_faces, (H, W))
            z = jnp.minimum(z, zb)
        img = np.asarray(compose_depth_to_image(z, background=1.0,
                                                depth_range=DEPTH_RANGE))
        out[view] = img
        if save_root:
            os.makedirs(save_root, exist_ok=True)
            if capture_imgs:
                depth_save = np.repeat(img[..., None] * 255.0, 3, -1).astype(np.float32)
                np.save(os.path.join(save_root, view + ".npy"), depth_save)
                cv2.imwrite(os.path.join(save_root, view + ".JPG"),
                            np.clip(depth_save, 0, 255).astype(np.uint8))
            else:
                d = os.path.join(save_root, view)
                os.makedirs(d, exist_ok=True)
                _imwrite_rgb(os.path.join(d, "bust_hair_depth.png"), img)
    return out
