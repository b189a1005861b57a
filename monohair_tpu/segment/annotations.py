"""Per-frame annotation pipeline for bust fitting (dataprocess.py equivalent).

The reference's DataProcessor (dataprocess.py:554-576) runs four external
models per frame — MODNet matting (:253-324), face-alignment 2D/3D landmarks
(:327-373), fdlite iris detection (:376-450), BiSeNet face parsing (:453-537) —
each skipped when its output directory already exists. This module reproduces
that idempotent-by-directory contract; each step is backed by a converted-
checkpoint runner when assets are configured, and degrades to a documented
no-op otherwise (the annotations are only needed for human captures; wig
reconstructions skip bust fitting entirely, prepare_data.py:127-128).
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
            for f in sorted(os.listdir(self.image_dir)):
                backend(os.path.join(self.image_dir, f), out_dir)
            status[step] = "computed"
        return status


def landmarks_to_training_targets(lmk_dir: str, views: List[str]) -> np.ndarray:
    """Stack per-view landmark files -> (V, L, 2) pixel targets for fit_bust."""
    out = []
    for v in views:
        out.append(np.load(os.path.join(lmk_dir, v + ".npy")))
    return np.stack(out).astype(np.float32)
