"""CPU-scale regression test that drives run_ngp_stage ITSELF (not a
lookalike) and asserts a non-empty, on-surface coarse mesh — the tripwire
VERDICT r4 item 3 asked for after the round-4 e2e shipped a config drift that
made this exact stage produce an empty colmap_points.obj and kill the
pipeline (reference contract: run.py:272-276 marching-cubes mesh feeding
PMVO_utils.py:341-362 candidate seeding).

The case is an analytic lambertian head ball orbited by 8 views; the field is
a reduced-capacity FourierField patched through the REAL make_field registry
(same lr/tv resolution path), so everything run_ngp_stage does — dataset
load, train_nerf, fixed-view renders, density export, marching tetrahedra,
NeRF->MVS frame conversion — is the deployed code. Calibrated on this host:
~80 s with a warm compile cache, shell recall 0.97.
"""

import json
import math
import os

import numpy as np
import pytest

HEAD_R = 0.72
# close wide-fov orbit: the capture case's far-narrow geometry (6.67, 24deg)
# needs the full-capacity field + thousands of steps to bootstrap density —
# fine on the chip, not in a CPU test. Close cameras make most rays hit the
# head, so the reduced field localizes the surface within the test budget.
CAM_R = 2.0
FOV_Y = 40.0
HH = WW = 96
N_FRAMES = 8


def _orbit_pose(a, elev=0.12):
    eye = np.array([math.cos(a), elev, math.sin(a)])
    eye = eye / np.linalg.norm(eye) * CAM_R
    fwd = -eye / np.linalg.norm(eye)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    c2w = np.eye(4)
    c2w[:3, :3] = np.stack([right, np.cross(right, fwd), -fwd], 1)
    c2w[:3, 3] = eye
    return c2w


def _render_view(c2w, f_pix):
    rows, cols = np.meshgrid(np.arange(HH, dtype=np.float32) + 0.5,
                             np.arange(WW, dtype=np.float32) + 0.5,
                             indexing="ij")
    x = (cols - WW / 2) / f_pix
    y = -(rows - HH / 2) / f_pix
    d = np.stack([x, y, -np.ones_like(x)], -1) @ c2w[:3, :3].T
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = c2w[:3, 3]
    b = d @ o
    disc = b * b - (o @ o - HEAD_R ** 2)
    hit = disc > 0
    t = -b - np.sqrt(np.maximum(disc, 0.0))
    p = o[None, None] + d * t[..., None]
    n = p / HEAD_R
    light = np.array([0.4, 0.7, 0.45]) / np.linalg.norm([0.4, 0.7, 0.45])
    shade = np.clip(n @ light, 0.0, 1.0) * 0.75 + 0.25
    img = np.full((HH, WW, 3), 0.92, np.float32)
    img[hit] = (np.array([0.8, 0.62, 0.52])[None] * shade[hit, None])
    return img


def _build_case(root):
    import cv2

    from monohair_tpu.coords import nerf_to_ngp
    from monohair_tpu.nerf.poses import _se3, mvs_to_ngp_rot, save_base_cam

    os.makedirs(os.path.join(root, "colmap/images"), exist_ok=True)
    f_pix = (HH / 2) / math.tan(math.radians(FOV_Y) / 2)
    poses = [_orbit_pose(2 * math.pi * j / N_FRAMES) for j in range(N_FRAMES)]
    frames = []
    for j, c2w in enumerate(poses):
        name = f"frame_{j:04d}"
        cv2.imwrite(os.path.join(root, "colmap/images", name + ".png"),
                    (_render_view(c2w, f_pix)[..., ::-1] * 255).astype(np.uint8))
        frames.append({"file_path": f"images/{name}.png",
                       "transform_matrix": c2w.tolist()})
    with open(os.path.join(root, "colmap/transforms.json"), "w") as f:
        json.dump({"camera_angle_x": 2 * math.atan(WW / (2 * f_pix)),
                   "camera_angle_y": math.radians(FOV_Y),
                   "fl_x": f_pix, "fl_y": f_pix, "cx": WW / 2, "cy": HH / 2,
                   "w": WW, "h": HH, "frames": frames}, f)
    B = [nerf_to_ngp(p) for p in poses]
    save_base_cam(os.path.join(root, "colmap/key_frame.json"),
                  [_se3(B[0][:, :3], B[0][:, 3])], [FOV_Y])
    save_base_cam(os.path.join(root, "colmap/base_cam.json"),
                  [_se3(B[0][:, :3], B[0][:, 3]),
                   _se3(B[2][:, :3], B[2][:, 3])], [FOV_Y, FOV_Y])
    ndc = [2 * f_pix / WW, 2 * f_pix / HH, 0.0, 0.0]
    cam_list = []
    for k, j in enumerate(range(0, N_FRAMES, 2)):
        rot = mvs_to_ngp_rot(B[j][:, :3])
        trans = (B[j][:, 3] + 1.5) / 2.0 - 1.0
        cam_list.append({"file": f"{k:03d}", "intrin": [0.0] * 4,
                         "intrin_op": [200.0, 200.0, 0.0, 0.0],
                         "dist": [0.0] * 5,
                         "pose": _se3(rot, trans).tolist(), "ndc_prj": ndc})
    calib = os.path.join(root, "calib_cam_params.json")
    with open(calib, "w") as f:
        json.dump({"cam_list": cam_list}, f)
    return calib


def test_run_ngp_stage_produces_on_surface_mesh(tmp_path, monkeypatch):
    from monohair_tpu.config import Config
    from monohair_tpu.io.mesh_io import load_obj
    from monohair_tpu.nerf import pipeline as npipe
    from monohair_tpu.nerf.fourier import FourierField

    root = str(tmp_path / "case")
    calib = _build_case(root)

    # reduced-capacity field through the REAL registry (keeps the per-field
    # lr/tv resolution that r4's regression clobbered), ~20x less compute
    real_make_field = npipe.make_field

    def small_make_field(kind):
        field, tv, lr = real_make_field(kind)
        if kind == "fourier":
            field = FourierField(num_features=32, hidden=32, depth=3,
                                 geo_feat=7,
                                 sparsity_weight=field.sparsity_weight)
        return field, tv, lr

    monkeypatch.setattr(npipe, "make_field", small_make_field)

    mesh_res = 48
    args = Config({
        "data": {"root": root, "image_size": [HH, WW]},
        "camera_path": calib,
        "infer_inner": {"render_size": [48, 64]},
        "ngp": {"train_steps": 1500, "rays_per_batch": 128,
                "mesh_resolution": mesh_res,
                # scene metadata: the mini case's backdrop is bright 0.92 —
                # without the composite, background rays demand in-volume fog
                # (ngp.render_rays docstring; the r4/r5 e2e failure mode)
                "background": [0.92, 0.92, 0.92],
                "log_every": 500, "scan_block": 4},
    })
    npipe.run_ngp_stage(args)

    # the two meshes the pipeline contract requires (empty colmap_points.obj
    # is exactly the committed r4 e2e failure mode)
    verts, faces = load_obj(os.path.join(root, "colmap/base.obj"))
    assert len(verts) > 0 and len(faces) > 0, "base.obj is empty"
    mvs_verts, _ = load_obj(os.path.join(root, "ours/colmap_points.obj"))
    assert len(mvs_verts) == len(verts), "MVS-frame mesh lost vertices"

    # fixed-view renders exist (the imgs/ origin contract for DeepMVSHair)
    assert os.path.exists(os.path.join(
        root, "trainning_images/capture_images/000.png"))
    assert os.path.exists(os.path.join(root, "imgs/000/origin.png"))

    # shell recall at export resolution: the mesh must cover the true
    # surface (fog floaters in the unobserved cube corners are tolerated —
    # the 8-view 24-deg-fov mini orbit leaves most of the volume unseen)
    bound = npipe.DEFAULT_MESH_BOUND
    vox = 2 * bound / mesh_res
    ax = np.linspace(-bound, bound, mesh_res)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    rr = np.sqrt(X ** 2 + Y ** 2 + Z ** 2)
    shell = np.abs(rr - HEAD_R) < 1.5 * vox
    vi = np.clip(np.round((verts + bound) / (2 * bound) * (mesh_res - 1)),
                 0, mesh_res - 1).astype(int)
    pred = np.zeros((mesh_res,) * 3, bool)
    pred[vi[:, 0], vi[:, 1], vi[:, 2]] = True
    for axis in range(3):
        pred |= np.roll(pred, 1, axis) | np.roll(pred, -1, axis)
    recall = (pred & shell).sum() / shell.sum()
    assert recall >= 0.8, f"coarse mesh misses the surface: recall={recall:.3f}"
