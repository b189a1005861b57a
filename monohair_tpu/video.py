"""Video frame extraction: per-interval sharpest frame by Laplacian variance
(video_preprocess/process_video.py:4-61 equivalent)."""

from __future__ import annotations

import os
from typing import List

import cv2


def extract_sharpest_frames(video_path: str, out_dir: str, interval: int = 5,
                            name_fmt: str = "frame_{:05d}.png") -> List[str]:
    """Decode the video, keep the sharpest frame of every `interval` frames."""
    os.makedirs(out_dir, exist_ok=True)
    cap = cv2.VideoCapture(video_path)
    kept = []
    best, best_frame, count = 0.0, None, 0
    idx = 0
    while True:
        ret, frame = cap.read()
        if not ret:
            break
        gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
        sharp = cv2.Laplacian(gray, cv2.CV_64F).var()
        if sharp > best:
            best, best_frame = sharp, frame
        count += 1
        if count == interval:
            name = name_fmt.format(idx)
            cv2.imwrite(os.path.join(out_dir, name), best_frame)
            kept.append(name)
            idx += 1
            best, best_frame, count = 0.0, None, 0
    cap.release()
    return kept
