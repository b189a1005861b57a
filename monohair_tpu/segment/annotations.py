"""Per-frame annotation pipeline for bust fitting (dataprocess.py equivalent).

The reference's DataProcessor (dataprocess.py:554-576) runs four models per
frame — MODNet matting (:253-324), face-alignment 2D landmarks (:327-373),
fdlite iris detection (:376-450), BiSeNet face parsing (:453-537) — each
skipped when its output directory already exists. This module reproduces that
idempotent-by-directory contract and the file formats the bust-fit dataset
reads, backed by the converted Flax nets (segment.runners):

  matting/<name>.png       RGBA: image + matte alpha
  landmark2d/<name>.txt    (68, 2) np.savetxt pixels
  iris/<name>.txt          (2, 3) [x, y, conf] — derived geometrically from
                           the FAN eye-ring landmarks (centroids of points
                           36-41 / 42-47) instead of a separate fdlite net;
                           the bust fit consumes only the two iris centers
                           (multiview_optimization.py:660-667)
  face_parsing/<name>.png  uint8 class-id map (CelebAMask-HQ labels)

Backends are callables (image_paths, out_dir) -> None so each step batches all
frames through one jitted net.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional

import numpy as np


class AnnotationProcessor:
    """Idempotent annotation runner over <case>/capture_images."""

    STEPS = ("matting", "landmark2d", "iris", "face_parsing")

    def __init__(self, case_root: str, image_folder: str = "capture_images",
                 backends: Optional[Dict[str, Callable]] = None):
        self.root = case_root
        self.image_dir = os.path.join(case_root, image_folder)
        self.out_root = os.path.join(case_root, "optimize")
        self.backends = backends or {}

    def _done(self, step: str) -> bool:
        d = os.path.join(self.out_root, step)
        return os.path.isdir(d) and len(os.listdir(d)) > 0

    def run(self, steps: Optional[List[str]] = None) -> Dict[str, str]:
        """Run missing steps; returns {step: status}."""
        status = {}
        files = sorted(os.listdir(self.image_dir)) \
            if os.path.isdir(self.image_dir) else []
        paths = [os.path.join(self.image_dir, f) for f in files]
        for step in steps or self.STEPS:
            if self._done(step):
                status[step] = "cached"
                continue
            backend = self.backends.get(step)
            if backend is None:
                status[step] = "skipped (no backend configured)"
                continue
            out_dir = os.path.join(self.out_root, step)
            os.makedirs(out_dir, exist_ok=True)
            backend(paths, out_dir)
            status[step] = "computed"
        return status


def _read_rgb(path: str) -> np.ndarray:
    import cv2
    return cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)


def refine_pupil(gray: np.ndarray, ring: np.ndarray,
                 power: float = 4.0) -> np.ndarray:
    """Pupil center inside one eye-ring polygon.

    The reference runs fdlite iris detection (dataprocess.py:376-450); here the
    pupil is recovered photometrically: inside the eyelid-ring polygon the
    pupil is the dark blob, so its center is the darkness-weighted centroid
    ((1 - luminance)^power emphasizes the pupil over sclera/skin). Falls back
    to the ring centroid when the polygon is degenerate or uniformly bright.

    gray: (H, W) float or uint8 luminance image. ring: (K, 2) [x, y] eyelid
    landmarks (FAN points 36-41 / 42-47). Returns (2,) [x, y] pixels."""
    import cv2
    centroid = ring.mean(0)
    x0 = int(np.floor(ring[:, 0].min())) - 2
    x1 = int(np.ceil(ring[:, 0].max())) + 3
    y0 = int(np.floor(ring[:, 1].min())) - 2
    y1 = int(np.ceil(ring[:, 1].max())) + 3
    H, W = gray.shape[:2]
    x0, y0 = max(x0, 0), max(y0, 0)
    x1, y1 = min(x1, W), min(y1, H)
    if x1 - x0 < 3 or y1 - y0 < 3:
        return centroid.astype(np.float32)
    crop = gray[y0:y1, x0:x1].astype(np.float32)
    if crop.max() > 1.5:                     # uint8-range input
        crop = crop / 255.0
    poly = np.round(ring - [x0, y0]).astype(np.int32)
    mask = np.zeros(crop.shape, np.uint8)
    cv2.fillPoly(mask, [poly], 1)
    w = mask * np.clip(1.0 - crop, 0.0, 1.0) ** power
    total = w.sum()
    if total < 1e-6:
        return centroid.astype(np.float32)
    ys, xs = np.mgrid[y0:y1, x0:x1]
    return np.array([(w * xs).sum() / total,
                     (w * ys).sum() / total], np.float32)


def _stem(path: str) -> str:
    return os.path.splitext(os.path.basename(path))[0]


def default_backends(cfg: dict) -> Dict[str, Callable]:
    """Build the four backends from segment.* checkpoint config. Only steps
    whose checkpoints exist are returned (others stay 'skipped')."""
    import cv2
    from .runners import (LandmarkRunner, MattingRunner, ParsingRunner,
                          face_box_from_mask)

    seg = cfg.get("segment", {}) or {}
    backends: Dict[str, Callable] = {}

    def ck(key):
        p = seg.get(key)
        return p if p and os.path.exists(p) else None

    modnet = ck("modnet_flax")
    if modnet:
        def matting(paths, out_dir, _p=modnet):
            runner = MattingRunner(_p, width=float(seg.get("modnet_width", 1.0)))
            imgs = np.stack([_read_rgb(p) for p in paths])
            matte = runner.matte(imgs)
            for p, im, m in zip(paths, imgs, matte):
                rgba = np.dstack([im[..., ::-1],
                                  np.clip(m * 255, 0, 255).astype(np.uint8)])
                cv2.imwrite(os.path.join(out_dir, _stem(p) + ".png"), rgba)
        backends["matting"] = matting

    fan = ck("fan_flax")
    if fan:
        def landmark2d(paths, out_dir, _p=fan):
            runner = LandmarkRunner(_p, width=float(seg.get("fan_width", 1.0)),
                                    num_modules=int(seg.get("fan_modules", 4)),
                                    depth=int(seg.get("fan_depth", 4)))
            imgs = np.stack([_read_rgb(p) for p in paths])
            # face box from the matte when available, else whole frame
            boxes = []
            mat_dir = os.path.join(os.path.dirname(out_dir), "matting")
            for p, im in zip(paths, imgs):
                mp = os.path.join(mat_dir, _stem(p) + ".png")
                if os.path.exists(mp):
                    alpha = cv2.imread(mp, cv2.IMREAD_UNCHANGED)[..., 3] / 255.0
                    boxes.append(face_box_from_mask(alpha))
                else:
                    boxes.append(np.array([0, 0, im.shape[1], im.shape[0]],
                                          np.float32))
            lmk = runner.landmarks(imgs, np.stack(boxes))
            for p, k in zip(paths, lmk):
                np.savetxt(os.path.join(out_dir, _stem(p) + ".txt"), k)
        backends["landmark2d"] = landmark2d

        def iris(paths, out_dir):
            """Iris centers: rows (right, left) matching the reference's
            iris_rois[::-1] ordering (dataprocess.py:421-436). Pupil position
            is refined photometrically inside each FAN eye-ring polygon
            (refine_pupil) — the eyelid centroid alone is NOT the pupil when
            the gaze is off-center."""
            lmk_dir = os.path.join(os.path.dirname(out_dir), "landmark2d")
            for p in paths:
                lp = os.path.join(lmk_dir, _stem(p) + ".txt")
                out = np.zeros((2, 3), np.float32)
                if os.path.exists(lp):
                    k = np.loadtxt(lp)
                    gray = _read_rgb(p).astype(np.float32).mean(-1)
                    out[0, :2] = refine_pupil(gray, k[36:42])  # right eye
                    out[1, :2] = refine_pupil(gray, k[42:48])  # left eye
                    out[:, 2] = 1.0
                np.savetxt(os.path.join(out_dir, _stem(p) + ".txt"), out)
        backends["iris"] = iris

    parser = ck("parser_flax")
    if parser:
        def face_parsing(paths, out_dir, _p=parser):
            runner = ParsingRunner(_p,
                                   n_classes=int(seg.get("parser_classes", 19)),
                                   width=float(seg.get("parser_width", 1.0)),
                                   input_size=int(seg.get("parse_size", 512)))
            # reference parses the matted images composed on white
            # (dataprocess.py:453-537)
            mat_dir = os.path.join(os.path.dirname(out_dir), "matting")
            imgs = []
            for p in paths:
                mp = os.path.join(mat_dir, _stem(p) + ".png")
                if os.path.exists(mp):
                    rgba = cv2.imread(mp, cv2.IMREAD_UNCHANGED)
                    a = rgba[..., 3:4].astype(np.float32) / 255.0
                    rgb = rgba[..., 2::-1].astype(np.float32)
                    imgs.append((rgb * a + 255.0 * (1 - a)).astype(np.uint8))
                else:
                    imgs.append(_read_rgb(p))
            parsing = runner.parse(np.stack(imgs))
            for p, cls in zip(paths, parsing):
                cv2.imwrite(os.path.join(out_dir, _stem(p) + ".png"), cls)
        backends["face_parsing"] = face_parsing

    return backends


def landmarks_to_training_targets(lmk_dir: str, views: List[str]) -> np.ndarray:
    """Stack per-view landmark files -> (V, L, 2) pixel targets for fit_bust."""
    out = []
    for v in views:
        out.append(np.load(os.path.join(lmk_dir, v + ".npy")))
    return np.stack(out).astype(np.float32)
