#!/usr/bin/env python
"""Build a complete on-disk synthetic case directory for driving the stage
CLIs end-to-end (the artifact contract of SURVEY.md §1): capture images,
cam_params.json, best_ori/conf/hair_mask images, render_depth npys, coarse
colmap mesh, bust + scalp meshes, and a per-case YAML config.

Usage: python tests/make_synthetic_case.py <data_root> [case_name]
"""

import math
import os
import sys

import numpy as np


def main(data_root: str, case: str = "synthwig"):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import cv2
    import jax.numpy as jnp
    from monohair_tpu.camera import ndc_to_pixel, project
    from monohair_tpu.constants import BUST_TO_ORIGIN
    from monohair_tpu.io.cameras_io import save_cam_params
    from monohair_tpu.io.mesh_io import save_obj
    from tests.test_e2e_synthetic import make_wig, ring_cameras

    H = W = 128
    root = os.path.join(data_root, case)
    rng = np.random.default_rng(0)
    cams = ring_cameras()
    strands = make_wig(rng=rng)
    names = [f"{v:03d}" for v in range(cams.num_views)]

    os.makedirs(os.path.join(root, "capture_images"), exist_ok=True)
    for sub in ("best_ori", "conf", "hair_mask", "render_depth", "ours"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)

    # cameras (ours/cam_params.json): stored pose is c2w
    c2w = np.linalg.inv(np.asarray(cams.w2c))
    save_cam_params(os.path.join(root, "ours/cam_params.json"), names,
                    np.asarray(cams.ndc), c2w)

    # per-view maps in the PMVO conventions
    pts = np.concatenate([s[:-1] for s in strands])
    nxt = np.concatenate([s[1:] for s in strands])
    uv_p, _ = project(cams, jnp.asarray(pts))
    uv_n, _ = project(cams, jnp.asarray(nxt))
    rc_p = np.asarray(ndc_to_pixel(uv_p, (H, W)))
    d2 = np.asarray(ndc_to_pixel(uv_n, (H, W))) - rc_p
    d2 /= np.maximum(np.linalg.norm(d2, axis=-1, keepdims=True), 1e-9)

    for v, name in enumerate(names):
        ori_img = np.zeros((H, W), np.uint8)
        conf_img = np.zeros((H, W), np.uint8)
        mask_img = np.zeros((H, W), np.uint8)
        rc = np.round(rc_p[v]).astype(int)
        ok = (rc[:, 0] >= 1) & (rc[:, 0] < H - 1) & (rc[:, 1] >= 1) & (rc[:, 1] < W - 1)
        # angle image: decode is theta=(180-g)/180*pi, vec=(sin t, cos t)=(drow, dcol)
        theta = np.arctan2(d2[v][ok, 0], d2[v][ok, 1]) % math.pi
        g = np.clip(180.0 - theta * 180.0 / math.pi, 0, 255).astype(np.uint8)
        r, c = rc[ok, 0], rc[ok, 1]
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                ori_img[r + dr, c + dc] = g
                conf_img[r + dr, c + dc] = 230
                mask_img[r + dr, c + dc] = 255
        cv2.imwrite(os.path.join(root, "best_ori", name + ".png"), ori_img)
        cv2.imwrite(os.path.join(root, "conf", name + ".png"), conf_img)
        cv2.imwrite(os.path.join(root, "hair_mask", name + ".png"), mask_img)
        np.save(os.path.join(root, "render_depth", name + ".npy"),
                np.full((H, W, 3), 230.0, np.float32))
        cv2.imwrite(os.path.join(root, "capture_images", name + ".png"),
                    np.zeros((H, W, 3), np.uint8))

    # coarse "colmap" mesh: a thin open tube of quads through the strand circle
    ring, rows = 24, 12
    vs, fs = [], []
    ys = np.linspace(0.075, -0.075, rows)
    for yi, y in enumerate(ys):
        for k in range(ring):
            a = 2 * math.pi * k / ring
            vs.append([0.05 * math.cos(a), y, 0.05 * math.sin(a)])
    for yi in range(rows - 1):
        for k in range(ring):
            a0 = yi * ring + k
            a1 = yi * ring + (k + 1) % ring
            b0 = (yi + 1) * ring + k
            b1 = (yi + 1) * ring + (k + 1) % ring
            fs.extend([[a0, a1, b0], [a1, b1, b0]])
    tube = np.array(vs) - BUST_TO_ORIGIN  # loader re-adds bust_to_origin
    save_obj(os.path.join(root, "ours/colmap_points.obj"), tube, np.array(fs))

    # scalp: small cap above the wig; bust: plate far below (kd-tree targets)
    cap_vs, cap_fs = [], []
    for k in range(ring):
        a = 2 * math.pi * k / ring
        cap_vs.append([0.05 * math.cos(a), 0.075, 0.05 * math.sin(a)])
    cap_vs.append([0.0, 0.09, 0.0])
    for k in range(ring):
        cap_fs.append([k, (k + 1) % ring, ring])
    cap = np.array(cap_vs) - BUST_TO_ORIGIN
    save_obj(os.path.join(root, "ours/scalp_tsfm.obj"), cap, np.array(cap_fs))
    plate = np.array([[-0.2, -0.25, -0.2], [0.2, -0.25, -0.2],
                      [0.2, -0.25, 0.2], [-0.2, -0.25, 0.2]]) - BUST_TO_ORIGIN
    save_obj(os.path.join(root, "ours/bust_long_tsfm.obj"), plate,
             np.array([[0, 1, 2], [0, 2, 3]]))

    cfg = f"""_parent_: configs/reconstruct/base.yaml

name: verify
data:
  root: {data_root}
  case: {case}
  image_size: [128, 128]

image_camera_path: ours/cam_params.json
camera_path: {root}/ours/cam_params.json

PMVO:
  patch_size: 3
  conf_threshold: 0.4
  num_sample_per_grid: 2
  threshold: 0.1
  infer_inner: false

HairGenerate:
  grow_threshold: 0.7
  connect_threshold: 0.005
  connect_dot_threshold: 0.7
  out_ratio: 0.3
"""
    os.makedirs("configs/reconstruct", exist_ok=True)
    with open(f"configs/reconstruct/{case}.yaml", "w") as f:
        f.write(cfg)
    print(f"case written to {root}; config configs/reconstruct/{case}.yaml")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_data",
         sys.argv[2] if len(sys.argv) > 2 else "synthwig")
