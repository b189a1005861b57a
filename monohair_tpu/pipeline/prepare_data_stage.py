"""Stage 1 — data preparation (reference prepare_data.py :36-184).

Sub-steps (each gated by a config flag, idempotent over the case dir):
  select_images  — per-interval sharpest frame by Laplacian variance
  process_camera — 16 fixed NGP views + per-capture-image MVS poses
  run_ngp        — coarse hash-grid NeRF: train/render/mesh (models/ngp)
  fit_bust       — SMPL-X bust optimization (models/smplx + bustfit)
  process_bust   — transform bust/scalp meshes by the fitted model_tsfm
  render_depth   — colmap-mesh depth maps for every capture view
  process_imgs   — hair segmentation masks + Gabor orientation/confidence
"""

from __future__ import annotations

import os
import shutil
import time
from typing import List

import cv2
import numpy as np

from ..config import Config
from ..constants import BUST_TO_ORIGIN
from ..io.cameras_io import load_cam_params, subsample_views
from ..io.mesh_io import load_obj
from ..render import render_bust_hair_depth


def select_sharpest_frames(raw_root: str, out_root: str, interval: int) -> List[str]:
    """Keep the sharpest frame (max Laplacian variance) of every `interval`
    frames (prepare_data.py:56-72)."""
    files = sorted(os.listdir(raw_root),
                   key=lambda x: int(x.split(".")[0].split("_")[-1]))
    os.makedirs(out_root, exist_ok=True)
    kept = []
    best, best_file = 0.0, None
    for i, f in enumerate(files):
        img = cv2.imread(os.path.join(raw_root, f))
        sharp = cv2.Laplacian(cv2.cvtColor(img, cv2.COLOR_BGR2GRAY), cv2.CV_64F).var()
        if sharp > best:
            best, best_file = sharp, f
        if (i + 1) % interval == 0:
            shutil.copyfile(os.path.join(raw_root, best_file),
                            os.path.join(out_root, best_file))
            kept.append(best_file)
            best, best_file = 0.0, None
    return kept


def process_images(root: str, image_folder: str = "capture_images",
                   mask_folder: str = "hair_mask") -> None:
    """Gabor orientation + confidence for every capture image
    (GaborFilter.batch_generate :231-237): writes best_ori/<img> (degrees),
    conf/<img>, Ori/<img> (color)."""
    import jax.numpy as jnp
    from ..ops.gabor import orientation_maps
    from ..io.image_io import encode_orientation_image

    img_dir = os.path.join(root, image_folder)
    for sub in ("best_ori", "conf", "Ori"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    for f in sorted(os.listdir(img_dir)):
        gray = cv2.imread(os.path.join(img_dir, f), cv2.IMREAD_GRAYSCALE)
        two, angle, conf = orientation_maps(jnp.asarray(gray.astype(np.float32) / 255.0))
        jpg_q = ([int(cv2.IMWRITE_JPEG_QUALITY), 100]
                 if f.lower().endswith((".jpg", ".jpeg")) else [])
        cv2.imwrite(os.path.join(root, "best_ori", f),
                    encode_orientation_image(np.asarray(angle)), jpg_q)
        cv2.imwrite(os.path.join(root, "conf", f),
                    np.clip(np.asarray(conf) * 255, 0, 255).astype(np.uint8))
        ori01 = (np.asarray(two) + 1.0) / 2.0
        color = np.concatenate([np.ones_like(ori01[..., :1]), ori01], -1)
        cv2.imwrite(os.path.join(root, "Ori", f),
                    (color[..., ::-1] * 255).astype(np.uint8), jpg_q)


def promote_fit_artifacts(args: Config) -> None:
    """Copy the bust-fit outputs up to the case root and build Bust/ from the
    fitted template (prepare_data.py:127-140): model_tsfm[.semantic].dat at
    the root, then bust_long/scalp/flame_bust meshes cut from
    optimize/final_template.obj. Skips quietly in wig mode (no fitted
    template) — process_bust then falls back to identity."""
    root = args.data.root
    opt = os.path.join(root, "optimize")
    for f in ("model_tsfm.dat", "model_tsfm_semantic.dat"):
        src = os.path.join(opt, f)
        if os.path.exists(src):
            shutil.copyfile(src, os.path.join(root, f))
    tmpl = os.path.join(opt, "final_template.obj")
    if not os.path.exists(tmpl):
        return
    bf = args.get("bustfit", {}) or {}
    bust_root = os.path.join(root, "Bust")
    os.makedirs(bust_root, exist_ok=True)
    verts, faces = load_obj(tmpl)
    from ..bustfit.scalp import cut_bust_long, extract_flame_bust, extract_scalp
    cut_bust_long(verts, faces, os.path.join(bust_root, "bust_long.obj"),
                  y_cut=float(bf.get("bust_cut_y", -0.6)))
    flame_tmpl = bf.get("flame_template", "assets/data/head_template.obj")
    flame_ids = bf.get("flame_vertex_ids",
                       "assets/data/SMPL-X__FLAME_vertex_ids.npy")
    scalp_mask = bf.get("scalp_mask", "assets/data/scalp_mask.png")
    if os.path.exists(flame_ids) and os.path.exists(flame_tmpl):
        extract_flame_bust(verts, flame_ids, flame_tmpl,
                           os.path.join(bust_root, "flame_bust.obj"))
        if os.path.exists(scalp_mask):
            ids = np.load(flame_ids)
            extract_scalp(flame_tmpl, scalp_mask,
                          os.path.join(bust_root, "scalp.obj"),
                          verts_override=verts[ids])


def run_prepare_data(args: Config) -> None:
    t0 = time.monotonic()
    root = args.data.root

    if args.prepare_data.select_images:
        select_sharpest_frames(os.path.join(root, "colmap/images"),
                               os.path.join(root, "capture_images"),
                               args.data.frame_interval)

    if args.prepare_data.process_camera:
        from ..nerf.poses import (generate_base_cam_from_key_frame,
                                  generate_mvs_pose_from_base_cam)
        colmap_dir = os.path.join(root, "colmap")
        generate_base_cam_from_key_frame(colmap_dir, args.camera_path,
                                         os.path.join(colmap_dir, "base_cam.json"))
        select_files = [f[:-4] for f in os.listdir(os.path.join(root, "capture_images"))]
        generate_mvs_pose_from_base_cam(colmap_dir, select_files, args.camera_path,
                                        image_size=args.data.image_size)
        os.makedirs(os.path.join(root, "ours"), exist_ok=True)
        shutil.copyfile(os.path.join(colmap_dir, "cam_params.json"),
                        os.path.join(root, "ours", "cam_params.json"))

    if args.prepare_data.run_ngp:
        from ..nerf.pipeline import run_ngp_stage
        run_ngp_stage(args)

    if args.prepare_data.get("fit_bust"):
        from ..bustfit.pipeline import run_bust_fit
        run_bust_fit(args)
        promote_fit_artifacts(args)

    if args.prepare_data.process_bust:
        from ..bustfit.transforms import process_bust_meshes
        process_bust_meshes(args)

    if args.prepare_data.render_depth:
        # colmap-mesh depth for the 16 fixed views (imgs/) and for every
        # capture view (render_depth/<view>.npy) — prepare_data.py:161-176
        colmap_path = os.path.join(root, "ours/colmap_points.obj")
        cv_verts, cv_faces = load_obj(colmap_path)
        if len(cv_verts) == 0:
            raise RuntimeError(
                f"{colmap_path} is empty — the coarse NeRF produced no "
                "density above ngp.marching_cubes_density_thresh. Train "
                "longer (ngp.train_steps) or lower the threshold.")
        cv_verts = cv_verts + BUST_TO_ORIGIN
        bust_path = os.path.join(root, "ours/bust_long_tsfm.obj")
        bust_v = bust_f = None
        if os.path.exists(bust_path):
            bust_v, bust_f = load_obj(bust_path)
            bust_v = bust_v + BUST_TO_ORIGIN
        names, cams = load_cam_params(args.camera_path)
        names, cams = subsample_views(names, cams)
        render_bust_hair_depth(cams, names, cv_verts, cv_faces,
                               save_root=os.path.join(root, "imgs"),
                               image_size=(1280, 720),
                               bust_vertices=bust_v, bust_faces=bust_f)
        cap_cam = os.path.join(root, "ours", "cam_params.json")
        names2, cams2 = load_cam_params(cap_cam)
        names2, cams2 = subsample_views(names2, cams2,
                                        os.path.join(root, "capture_images"))
        H, W = args.data.image_size
        render_bust_hair_depth(cams2, names2, cv_verts, cv_faces,
                               save_root=os.path.join(root, "render_depth"),
                               image_size=(H, W), capture_imgs=True)

    if args.prepare_data.process_imgs:
        from ..segment.pipeline import calculate_masks
        calculate_masks(args)
        process_images(root)
    print(f"[prepare_data] done in {time.monotonic() - t0:.1f}s")
