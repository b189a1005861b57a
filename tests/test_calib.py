"""Calibration spherification invariants."""

import numpy as np

from monohair_tpu.calib import (min_line_dist_point, norm_cam_intrin,
                                spherify_cam_poses)


def look_at(eye, target=np.zeros(3)):
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0, 1.0, 0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    m = np.eye(4)
    m[:3, :3] = np.stack([right, np.cross(right, fwd), -fwd], 1)
    m[:3, 3] = eye
    return m


def test_min_line_dist_converging_rays(rng):
    target = np.array([0.3, -0.2, 0.5])
    origins = rng.normal(size=(8, 3)) * 2
    dirs = target - origins
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    p = min_line_dist_point(origins[..., None], dirs[..., None])
    np.testing.assert_allclose(p, target, atol=1e-8)


def test_spherify_radius_and_orientation(rng):
    # ring of cameras looking at a common center offset from the origin
    center = np.array([0.5, 1.0, -0.3])
    poses = []
    for k in range(8):
        a = 2 * np.pi * k / 8
        eye = center + np.array([np.cos(a), 0.1, np.sin(a)]) * 2.0
        poses.append(look_at(eye, center))
    poses = np.stack(poses)
    # the spherify convention expects +z as the view direction column; OpenGL
    # look_at has -z forward, so rays toward the center are -col2 — the
    # function solves least squares over lines, sign-independent
    rec, recover = spherify_cam_poses(poses, front_vid=0, norm_rad=0.8)
    radii = np.linalg.norm(rec[:, :3, 3], axis=-1)
    np.testing.assert_allclose(radii.mean(), 0.8, rtol=1e-6)
    # recover transform maps back: recover @ (undo flips) ~ original translation
    undone = rec.copy()
    undone[:, :3, 1:3] *= -1
    back = recover @ undone
    np.testing.assert_allclose(back[:, :3, 3], poses[:, :3, 3], atol=1e-6)


def test_norm_cam_intrin_roundtrip():
    intrin = np.zeros((2, 3, 3))
    intrin[:, 0, 0] = 1000.0
    intrin[:, 1, 1] = 1000.0
    intrin[:, 0, 2] = 960.0
    intrin[:, 1, 2] = 540.0
    pix, ndc = norm_cam_intrin(intrin, (1080, 1920), (800, 1200), scale=0.5)
    # centered principal point stays centered
    np.testing.assert_allclose(pix[:, 2], 600.0)
    np.testing.assert_allclose(pix[:, 3], 400.0)
    np.testing.assert_allclose(ndc[:, 0], 2 * 500 / 1200)
    np.testing.assert_allclose(ndc[:, 2], 0.0, atol=1e-12)
