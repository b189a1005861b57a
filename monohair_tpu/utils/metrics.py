"""Quality metrics: occupancy precision/recall (Utils/Utils.py:336-363
OccMetric), strand direction cosine error, PSNR/SSIM (run.py:212-270 harness)."""

from __future__ import annotations

from typing import Dict

import numpy as np


class OccMetric:
    """Accumulating precision/recall over boolean occupancy predictions."""

    def __init__(self):
        self.tp = 0
        self.pred_pos = 0
        self.gt_pos = 0

    def update(self, pred: np.ndarray, gt: np.ndarray) -> None:
        pred = np.asarray(pred) > 0
        gt = np.asarray(gt) > 0
        self.tp += int((pred & gt).sum())
        self.pred_pos += int(pred.sum())
        self.gt_pos += int(gt.sum())

    def precision(self) -> float:
        return self.tp / max(self.pred_pos, 1)

    def recall(self) -> float:
        return self.tp / max(self.gt_pos, 1)

    def summary(self) -> Dict[str, float]:
        return {"precision": self.precision(), "recall": self.recall()}


def direction_cosine_error(pred: np.ndarray, gt: np.ndarray) -> float:
    """Mean (1 - |cos|) between predicted and GT unit directions."""
    p = pred / np.maximum(np.linalg.norm(pred, axis=-1, keepdims=True), 1e-12)
    g = gt / np.maximum(np.linalg.norm(gt, axis=-1, keepdims=True), 1e-12)
    return float(np.mean(1.0 - np.abs(np.sum(p * g, -1))))


def psnr(img: np.ndarray, ref: np.ndarray) -> float:
    mse = float(np.mean((np.asarray(img, np.float64) - np.asarray(ref, np.float64)) ** 2))
    return -10.0 * float(np.log10(max(mse, 1e-12)))


def ssim(img: np.ndarray, ref: np.ndarray, c1: float = 0.01 ** 2,
         c2: float = 0.03 ** 2, win: int = 7) -> float:
    """Mean structural similarity over a uniform window (grayscale or mean-RGB)."""
    import cv2
    a = np.asarray(img, np.float64)
    b = np.asarray(ref, np.float64)
    if a.ndim == 3:
        a = a.mean(-1)
        b = b.mean(-1)
    k = (win, win)
    mu_a = cv2.blur(a, k)
    mu_b = cv2.blur(b, k)
    var_a = cv2.blur(a * a, k) - mu_a ** 2
    var_b = cv2.blur(b * b, k) - mu_b ** 2
    cov = cv2.blur(a * b, k) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)
         / ((mu_a ** 2 + mu_b ** 2 + c1) * (var_a + var_b + c2)))
    return float(s.mean())
