"""Union training-data packing: per-view PNG stacks -> single binary files.

Mirror of integrate_fix_view_data (Utils/Utils.py:671-751): training IO reads
one memory-mappable .dat per modality instead of V small PNGs. Layouts match
the reference ('orient_union' is NCHW uint8 over the first two RGB channels;
the rest are (V, H, W) uint8).
"""

from __future__ import annotations

import os
import shutil
from typing import Dict, List, Optional

import numpy as np


def pack_case(case_views_dir: str, dst_case_dir: str,
              modalities=("dir", "conf", "mask", "depth"),
              model_tsfm_src: Optional[str] = None) -> List[str]:
    """Pack one case's views directory into union .dat files."""
    import cv2
    os.makedirs(dst_case_dir, exist_ok=True)
    views = sorted(os.listdir(case_views_dir))
    written = []
    if model_tsfm_src and os.path.exists(model_tsfm_src):
        shutil.copyfile(model_tsfm_src, os.path.join(dst_case_dir, "model_tsfm.dat"))
        written.append("model_tsfm.dat")

    def read(view, name, gray=True):
        p = os.path.join(case_views_dir, view, name)
        img = cv2.imread(p, cv2.IMREAD_GRAYSCALE if gray else cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(p)
        return img if gray else img[..., ::-1]  # BGR -> RGB

    if "dir" in modalities:
        orient = np.stack([read(v, "dense.png", gray=False)[..., :2] for v in views])
        orient.transpose(0, 3, 1, 2).astype(np.uint8).tofile(
            os.path.join(dst_case_dir, "orient_union.dat"))
        written.append("orient_union.dat")
    if "conf" in modalities:
        np.stack([read(v, "raw_conf.png") for v in views]).astype(np.uint8).tofile(
            os.path.join(dst_case_dir, "conf_union.dat"))
        written.append("conf_union.dat")
    if "mask" in modalities:
        np.stack([read(v, "mask.png") for v in views]).astype(np.uint8).tofile(
            os.path.join(dst_case_dir, "mask_union.dat"))
        written.append("mask_union.dat")
    if "depth" in modalities:
        np.stack([read(v, "bust_depth.png") for v in views]).astype(np.uint8).tofile(
            os.path.join(dst_case_dir, "depth_union.dat"))
        np.stack([read(v, "bust_hair_depth.png") for v in views]).astype(np.uint8).tofile(
            os.path.join(dst_case_dir, "bust_hair_depth_union.dat"))
        written.extend(["depth_union.dat", "bust_hair_depth_union.dat"])
    return written


def load_union_case(case_dir: str, num_views: int, image_size) -> Dict[str, np.ndarray]:
    """Read union .dat files back as float arrays in [0, 1]
    (BaseDataset.read_union_data semantics): orient (V, H, W, 2), others (V, H, W)."""
    H, W = image_size
    out = {}
    p = os.path.join(case_dir, "orient_union.dat")
    if os.path.exists(p):
        arr = np.fromfile(p, np.uint8).reshape(num_views, 2, H, W)
        out["orient"] = arr.transpose(0, 2, 3, 1).astype(np.float32) / 255.0
    for key, fname in (("conf", "conf_union.dat"), ("mask", "mask_union.dat"),
                       ("depth", "depth_union.dat"),
                       ("hair_depth", "bust_hair_depth_union.dat")):
        p = os.path.join(case_dir, fname)
        if os.path.exists(p):
            out[key] = (np.fromfile(p, np.uint8).reshape(num_views, H, W)
                        .astype(np.float32) / 255.0)
    tsfm = os.path.join(case_dir, "model_tsfm.dat")
    if os.path.exists(tsfm):
        out["model_tsfm"] = np.fromfile(tsfm, np.float32).reshape(4, 4).T
    return out
