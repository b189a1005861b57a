"""Hair segmentation stage (calc_masks.py:128-233 equivalent).

Writes mask/ (person matte), hair_mask/ (hair class), mask_hair/ (blend) for
every capture image. The reference ensembles MODNet matting with CDGNet's
3-scale + horizontal-flip hair parse. Here:

- if hair_mask/ already exists for all frames, the step is a no-op
  (idempotent-by-directory, exactly the reference's dataprocess contract).
- if converted Flax checkpoints are configured (segment.modnet_flax +
  segment.parser_flax, npz trees from tools/convert_checkpoints.py), the
  MODNet matte and the BiSeNet hair parse run batched under jit with the
  reference's ensemble protocol (ParsingRunner).
- otherwise a classical fallback (luminance/texture statistics + morphology)
  produces coarse masks so the pipeline stays runnable end-to-end; quality
  callers should supply the neural checkpoints.
"""

from __future__ import annotations

import os
from typing import List

import cv2
import numpy as np

from ..config import Config


def _fallback_hair_mask(img: np.ndarray) -> np.ndarray:
    """Coarse classical segmentation: dark/texture-rich regions near the top of
    the largest foreground blob. Fallback when no neural checkpoints are set."""
    gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    # texture response: local variance of a high-pass
    hp = cv2.Laplacian(gray, cv2.CV_32F, ksize=3)
    tex = cv2.GaussianBlur(hp * hp, (0, 0), 5)
    tex = tex / max(tex.max(), 1e-6)
    m = ((tex > 0.02) & (gray < 140)).astype(np.uint8) * 255
    m = cv2.morphologyEx(m, cv2.MORPH_CLOSE, np.ones((9, 9), np.uint8))
    m = cv2.morphologyEx(m, cv2.MORPH_OPEN, np.ones((5, 5), np.uint8))
    num, labels, stats, _ = cv2.connectedComponentsWithStats(m)
    if num > 1:
        largest = 1 + int(np.argmax(stats[1:, cv2.CC_STAT_AREA]))
        m = np.where(labels == largest, 255, 0).astype(np.uint8)
    return m


def _fallback_person_mask(img: np.ndarray, hair: np.ndarray) -> np.ndarray:
    """Coarse person matte (distinct from the hair mask — mask/ feeds PMVO's
    point filtering as the *person* silhouette, calc_masks.py:144-155):
    foreground = pixels far from the border background color, largest blob,
    holes filled, forced to contain the hair mask."""
    border = np.concatenate([img[0], img[-1], img[:, 0], img[:, -1]], 0)
    bg = np.median(border.reshape(-1, 3), axis=0)
    dist = np.linalg.norm(img.astype(np.float32) - bg[None, None], axis=-1)
    m = (dist > 45.0).astype(np.uint8) * 255
    m = cv2.morphologyEx(m, cv2.MORPH_CLOSE, np.ones((15, 15), np.uint8))
    num, labels, stats, _ = cv2.connectedComponentsWithStats(m)
    if num > 1:
        largest = 1 + int(np.argmax(stats[1:, cv2.CC_STAT_AREA]))
        m = np.where(labels == largest, 255, 0).astype(np.uint8)
    # fill interior holes: anything not reachable from the border is person
    inv = (m == 0).astype(np.uint8)
    ff = inv.copy()
    ffmask = np.zeros((img.shape[0] + 2, img.shape[1] + 2), np.uint8)
    cv2.floodFill(ff, ffmask, (0, 0), 0)
    m = np.where((m > 0) | (ff > 0), 255, 0).astype(np.uint8)
    return np.maximum(m, hair)


def _neural_masks(files: List[str], img_dir: str, cfg: Config):
    """MODNet matte + BiSeNet hair parse, reference ensemble protocol."""
    from .runners import MattingRunner, ParsingRunner

    seg = cfg.get("segment", {})
    matting = MattingRunner(seg["modnet_flax"],
                            width=float(seg.get("modnet_width", 1.0)),
                            ref_size=int(seg.get("matte_size", 512)))
    parser = ParsingRunner(seg["parser_flax"],
                           n_classes=int(seg.get("parser_classes", 19)),
                           width=float(seg.get("parser_width", 1.0)),
                           input_size=int(seg.get("parse_size", 512)))
    imgs = np.stack([cv2.cvtColor(cv2.imread(os.path.join(img_dir, f)),
                                  cv2.COLOR_BGR2RGB) for f in files])
    matte = matting.matte(imgs)                               # (N, H, W)
    hair = parser.hair_mask(imgs, matte)                      # (N, H, W) u8
    return matte, hair


def calculate_masks(args: Config) -> List[str]:
    root = args.data.root
    img_dir = os.path.join(root, "capture_images")
    files = sorted(os.listdir(img_dir)) if os.path.isdir(img_dir) else []
    hair_dir = os.path.join(root, "hair_mask")
    mask_dir = os.path.join(root, "mask")
    blend_dir = os.path.join(root, "mask_hair")
    if files and os.path.isdir(hair_dir) and all(
            os.path.exists(os.path.join(hair_dir, f)) for f in files):
        print("[segment] hair_mask/ complete — skipping (idempotent)")
        return files
    for d in (hair_dir, mask_dir, blend_dir):
        os.makedirs(d, exist_ok=True)

    seg = args.get("segment", {}) or {}
    neural = (seg.get("modnet_flax") and os.path.exists(seg["modnet_flax"])
              and seg.get("parser_flax") and os.path.exists(seg["parser_flax"]))
    if neural:
        matte, hair = _neural_masks(files, img_dir, args)
        for i, f in enumerate(files):
            img = cv2.imread(os.path.join(img_dir, f))
            cv2.imwrite(os.path.join(mask_dir, f),
                        np.clip(matte[i] * 255.0, 0, 255).astype(np.uint8))
            cv2.imwrite(os.path.join(hair_dir, f), hair[i])
            blend = (hair[i][..., None].astype(np.float32) * 0.5
                     + img.astype(np.float32) * 0.5)
            cv2.imwrite(os.path.join(blend_dir, f),
                        blend.astype(np.uint8))
        return files

    print("[segment] no neural checkpoints configured — classical fallback")
    for f in files:
        img = cv2.imread(os.path.join(img_dir, f))
        hair = _fallback_hair_mask(img)
        cv2.imwrite(os.path.join(hair_dir, f), hair)
        cv2.imwrite(os.path.join(mask_dir, f), _fallback_person_mask(img, hair))
        blend = img.copy()
        blend[hair > 0] = 0.5 * blend[hair > 0] + np.array([0, 0, 127.5])
        cv2.imwrite(os.path.join(blend_dir, f), blend)
    return files
