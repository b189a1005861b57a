"""cam_params.json camera I/O.

JSON schema (reference: camera/calib_data/wky07-22/cam_params.json,
Camera_utils.py:141-163): {"cam_list": [{"file": str, "ndc_prj": [fx,fy,cx,cy],
"pose": 4x4 camera-to-world, ...}, ...]}.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..camera import Cameras


def load_cam_params(path: str) -> Tuple[List[str], Cameras]:
    """Load cam_params.json -> (view names, Cameras with w2c poses)."""
    with open(path) as f:
        cam = json.load(f)
    cam_list = cam["cam_list"]
    names = [c["file"] for c in cam_list]
    return names, Cameras.from_json_list(cam_list)


def save_cam_params(path: str, names: Sequence[str], ndc: np.ndarray,
                    c2w: np.ndarray) -> None:
    """Write cam_params.json from (V,4) NDC intrinsics and (V,4,4) c2w poses."""
    cam_list = []
    for name, nd, pose in zip(names, np.asarray(ndc), np.asarray(c2w)):
        cam_list.append({
            "file": str(name),
            "intrin": [0.0, 0.0, 0.0, 0.0],
            "dist": [0.0] * 5,
            "ndc_prj": [float(x) for x in nd],
            "pose": [[float(x) for x in row] for row in pose],
        })
    with open(path, "w") as f:
        json.dump({"cam_list": cam_list}, f, indent=2)


def subsample_views(names: List[str], cameras: Cameras,
                    image_dir: Optional[str] = None) -> Tuple[List[str], Cameras]:
    """Thin dense captures: step 4 if >500 frames, 2 if >300; keep only views whose
    image exists. Mirror of `parsing_camera` (Camera_utils.py:148-163)."""
    step = 1
    files = None
    if image_dir is not None and os.path.isdir(image_dir):
        files = set(os.listdir(image_dir))
        n = len(files)
        if n > 500:
            step = 4
        elif n > 300:
            step = 2
    keep = []
    for i in range(0, len(names), step):
        if files is not None:
            if not any(names[i] + ext in files for ext in (".png", ".JPG", ".jpg")):
                continue
        keep.append(i)
    return [names[i] for i in keep], cameras[np.array(keep, dtype=np.int64)]
