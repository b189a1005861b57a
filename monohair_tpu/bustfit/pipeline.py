"""fit_bust stage driver (prepare_data.py:123-140 + multiview_optimization.py
main): runs the per-frame annotation pipeline if needed, assembles the
NerfDataset-equivalent targets (multiview_optimization.py:80-238), optimizes
the full SMPL-X objective, and exports model_tsfm.dat /
model_tsfm_semantic.dat plus the fitted template mesh.

Degradation ladder (each step falls back to the next when inputs are absent):
  1. full objective — landmarks + iris + matting/parsing masks + image losses
  2. landmark-only fit — landmark2d files but no masks/parsing
  3. identity transform — no SMPL-X asset (wig captures; same guidance the
     reference prints, prepare_data.py:127-128)
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from ..config import Config
from ..constants import BUST_TO_ORIGIN
from .transforms import matrix_to_semantic, save_model_tsfm

# SMPL-X iris vertex ids (right, left) — multiview_optimization.py:421
IRIS_VERTEX_IDS = np.array([9503, 10049], np.int64)
# CelebAMask-HQ face-region labels (NerfDataset, multiview_optimization.py:188-191)
FACE_LABELS = (1, 2, 3, 4, 5, 6, 10, 11, 12, 13)
HAIR_LABEL = 17


def _write_identity(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    save_model_tsfm(os.path.join(out_dir, "model_tsfm.dat"), np.eye(4))
    sem = np.zeros(7, np.float32)
    sem[6] = 1.0
    sem.tofile(os.path.join(out_dir, "model_tsfm_semantic.dat"))


def _resize_to(img: np.ndarray, hw: Tuple[int, int]) -> np.ndarray:
    import cv2
    return cv2.resize(img, (hw[1], hw[0]), interpolation=cv2.INTER_AREA)


def gather_targets(root: str, names: List[str], image_size, sil_scale: int,
                   image_folder: str = "capture_images"):
    """Build FitTargets from the optimize/ annotation outputs for the frames
    in `names` (only frames with a landmark file participate; the reference
    drops frames whose detector failed, dataprocess.py:345-349)."""
    import cv2
    from .optimize import FitTargets

    H, W = image_size
    h, w = H // sil_scale, W // sil_scale
    opt = os.path.join(root, "optimize")
    keep, lmks, iris, masks, hairs, faces_m, images = [], [], [], [], [], [], []
    have_masks = True
    for i, name in enumerate(names):
        lp = os.path.join(opt, "landmark2d", name + ".txt")
        if not os.path.exists(lp):
            continue
        k = np.loadtxt(lp, ndmin=2).astype(np.float32)
        if k.shape[0] < 68:
            continue
        keep.append(i)
        lmks.append(k[:68, [1, 0]])            # txt is (x, y) -> (row, col)
        ip = os.path.join(opt, "iris", name + ".txt")
        if os.path.exists(ip):
            ir = np.loadtxt(ip, ndmin=2).astype(np.float32)
            ok = ir.shape == (2, 3) and (ir[:, 2] > 0).all()
            iris.append(ir[:, [1, 0]] if ok else None)
        else:
            iris.append(None)
        mp = os.path.join(opt, "matting", name + ".png")
        pp = os.path.join(opt, "face_parsing", name + ".png")
        if os.path.exists(mp) and os.path.exists(pp):
            rgba = cv2.imread(mp, cv2.IMREAD_UNCHANGED)
            alpha = rgba[..., 3].astype(np.float32) / 255.0
            mask = (alpha > 0.5).astype(np.float32)   # :136-139
            sem = cv2.imread(pp, cv2.IMREAD_GRAYSCALE)
            skin_cloth = np.ones_like(mask)
            skin_cloth[sem == HAIR_LABEL] = 0.0        # :184-186
            skin_cloth[alpha < 100 / 255.0] = 0.0
            hair = mask * (1.0 - skin_cloth)           # :196
            face = np.isin(sem, FACE_LABELS).astype(np.float32)
            masks.append(_resize_to(mask, (h, w)))
            hairs.append(_resize_to(hair, (h, w)))
            faces_m.append(_resize_to(face, (h, w)))
            img = rgba[..., 2::-1].astype(np.float32) / 255.0
            images.append(_resize_to(img, (h, w)))
        else:
            have_masks = False
    if not keep:
        return None, []
    lmk_px = np.stack(lmks)
    iris_px = (np.stack([x for x in iris]) if all(x is not None for x in iris)
               else None)
    tgt = FitTargets(
        lmk_px=lmk_px, iris_px=iris_px,
        mask=np.stack(masks) if have_masks and masks else None,
        hair_mask=np.stack(hairs) if have_masks and hairs else None,
        face_mask=np.stack(faces_m) if have_masks and faces_m else None,
        image=np.stack(images) if have_masks and images else None)
    return tgt, keep


def export_fit(out_dir: str, model, params, losses) -> None:
    from ..io.mesh_io import save_obj
    from .optimize import (default_init_pose, effective_pose, free_joint_mask,
                           model_tsfm_matrix, posed_vertices)
    import jax.numpy as jnp

    tsfm = np.asarray(model_tsfm_matrix(params))
    if not np.isfinite(tsfm).all():
        print("[bust_fit] non-finite fit result; exporting identity "
              "(downstream stages must not inherit NaNs)")
        _write_identity(out_dir)
        return
    save_model_tsfm(os.path.join(out_dir, "model_tsfm.dat"), tsfm)
    matrix_to_semantic(tsfm).tofile(
        os.path.join(out_dir, "model_tsfm_semantic.dat"))
    if len(model.faces):
        # fitted template in the bust frame (final_template.obj,
        # multiview_optimization.py:771-777)
        init_pose = jnp.asarray(default_init_pose(model.num_joints))
        jm = jnp.asarray(free_joint_mask(model.num_joints))
        verts = np.asarray(posed_vertices(model, params, init_pose, jm))
        save_obj(os.path.join(out_dir, "final_template.obj"),
                 verts - BUST_TO_ORIGIN, model.faces)
    np.savetxt(os.path.join(out_dir, "fit_losses.txt"), np.asarray(losses))


def run_bust_fit(args: Config) -> None:
    root = args.data.root
    bf = args.get("bustfit", {}) or {}
    smplx_path = bf.get("smplx_model", "assets/smplx/SMPLX_NEUTRAL.npz")
    out_dir = os.path.join(root, "optimize")
    os.makedirs(out_dir, exist_ok=True)
    if not os.path.exists(smplx_path):
        print("[bust_fit] SMPL-X asset not found; writing identity model_tsfm "
              "(wig mode — run bust fitting with assets for human captures)")
        _write_identity(out_dir)
        return

    from ..io.cameras_io import load_cam_params, subsample_views
    from ..segment.annotations import AnnotationProcessor, default_backends
    from .optimize import fit_bust_full
    from .smplx import load_smplx_npz
    from .texture import load_flame_tex

    # per-frame annotations (DataProcessor.run, dataprocess.py:554-576)
    proc = AnnotationProcessor(root, backends=default_backends(args))
    status = proc.run()
    print(f"[bust_fit] annotations: {status}")

    model = load_smplx_npz(smplx_path,
                           num_betas=int(bf.get("n_shape", 10)),
                           num_expr=int(bf.get("n_exp", 10)))
    names, cams = load_cam_params(os.path.join(root, args.image_camera_path))
    names, cams = subsample_views(names, cams,
                                  os.path.join(root, "capture_images"))
    image_size = tuple(args.data.image_size)
    sil_scale = int(bf.get("sil_scale", 8))
    targets, keep = gather_targets(root, names, image_size, sil_scale)
    if targets is None:
        print("[bust_fit] no frames with landmarks; writing identity model_tsfm")
        _write_identity(out_dir)
        return
    cams = cams[np.asarray(keep)]

    lmk_ids = np.load(bf.get("landmark_vertex_ids",
                             "assets/smplx/landmark_vertex_ids.npy"))
    tex_model = None
    if targets.image is not None:
        tex_model = load_flame_tex(
            bf.get("flame_tex") if bf.get("flame_tex")
            and os.path.exists(bf.get("flame_tex")) else None,
            model.v_template.shape[0], n_tex=int(bf.get("n_tex", 50)))
    iris_ids = IRIS_VERTEX_IDS if model.v_template.shape[0] > int(
        IRIS_VERTEX_IDS.max()) else None

    params, losses = fit_bust_full(
        model, cams, image_size, targets, lmk_ids,
        iris_vertex_ids=iris_ids if targets.iris_px is not None else None,
        tex_model=tex_model,
        iters=int(args.get("optimize", {}).get("iter", 2000)),
        sil_scale=sil_scale, log_every=200)
    print(f"[bust_fit] losses: {losses}")
    export_fit(out_dir, model, params, losses)
