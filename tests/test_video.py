"""Video frame extraction (process_video.py equivalent)."""

import os

import cv2
import numpy as np

from monohair_tpu.video import extract_sharpest_frames


def test_extract_sharpest_frames(tmp_path, rng):
    # 12-frame video: frames 2, 7 are sharp (noise), others flat gray
    path = str(tmp_path / "v.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 64))
    for i in range(12):
        if i in (2, 7):
            frame = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        else:
            frame = np.full((64, 64, 3), 128, np.uint8)
        w.write(frame)
    w.release()
    out = str(tmp_path / "frames")
    kept = extract_sharpest_frames(path, out, interval=6)
    assert len(kept) == 2
    # the kept frames are the sharp ones (high variance after codec noise)
    for name in kept:
        img = cv2.imread(os.path.join(out, name), cv2.IMREAD_GRAYSCALE)
        assert img.std() > 20
