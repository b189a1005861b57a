"""fit_bust stage driver (prepare_data.py:123-140 + multiview_optimization.py
main): requires the SMPL-X asset + per-frame annotations (landmarks, masks)
from the annotation pipeline. Exports model_tsfm.dat / model_tsfm_semantic.dat
and the fitted template meshes."""

from __future__ import annotations

import os

import numpy as np

from ..config import Config
from .transforms import save_model_tsfm


def run_bust_fit(args: Config) -> None:
    root = args.data.root
    smplx_path = args.get("bustfit", {}).get("smplx_model",
                                             "assets/smplx/SMPLX_NEUTRAL.npz")
    out_dir = os.path.join(root, "optimize")
    os.makedirs(out_dir, exist_ok=True)
    if not os.path.exists(smplx_path):
        # The SMPL-X asset is a license-gated external download (reference:
        # fetch_data.sh). Without it, fall back to the identity transform so
        # downstream stages remain runnable on wig captures (the reference
        # prints the same guidance, prepare_data.py:127-128).
        print("[bust_fit] SMPL-X asset not found; writing identity model_tsfm "
              "(wig mode — run bust fitting with assets for human captures)")
        save_model_tsfm(os.path.join(out_dir, "model_tsfm.dat"), np.eye(4))
        sem = np.zeros(7, np.float32)
        sem[6] = 1.0
        sem.tofile(os.path.join(out_dir, "model_tsfm_semantic.dat"))
        return

    from ..io.cameras_io import load_cam_params, subsample_views
    from .optimize import fit_bust, model_tsfm_matrix
    from .smplx import load_smplx_npz

    model = load_smplx_npz(smplx_path)
    names, cams = load_cam_params(os.path.join(root, args.image_camera_path))
    names, cams = subsample_views(names, cams, os.path.join(root, "capture_images"))
    lmk_ids = np.load(args.get("bustfit", {}).get(
        "landmark_vertex_ids", "assets/smplx/landmark_vertex_ids.npy"))
    targets = np.load(os.path.join(root, "optimize", "landmarks2d.npy"))
    params, losses = fit_bust(model, cams, tuple(args.data.image_size),
                              lmk_ids, targets,
                              iters=int(args.get("optimize", {}).get("iter", 2000)))
    print(f"[bust_fit] losses: {losses}")
    tsfm = np.asarray(model_tsfm_matrix(params))
    save_model_tsfm(os.path.join(out_dir, "model_tsfm.dat"), tsfm)
