"""Golden tests for camera math against an independent numpy transcription of the
reference semantics (Utils/Camera_utils.py), plus round-trip invariants."""

import jax.numpy as jnp
import numpy as np
import pytest

from monohair_tpu.camera import (Cameras, depth_to_z, ndc_to_pixel, normalized_depth,
                                 pixel_index_and_validity, pixel_to_ndc, project,
                                 projection_matrix, unproject)


def make_cameras(rng, num_views=4):
    """Random look-at cameras on a ring around the origin."""
    ndc, c2w = [], []
    for v in range(num_views):
        angle = 2 * np.pi * v / num_views + 0.1
        eye = np.array([np.cos(angle), 0.15, np.sin(angle)]) * 1.2
        forward = -eye / np.linalg.norm(eye)          # camera looks at origin
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(forward, up)
        right /= np.linalg.norm(right)
        true_up = np.cross(right, forward)
        # OpenGL convention: camera z axis points backwards (away from scene)
        R = np.stack([right, true_up, -forward], axis=1)
        mat = np.eye(4)
        mat[:3, :3] = R
        mat[:3, 3] = eye
        c2w.append(mat)
        ndc.append([1.55 + 0.1 * v, 1.05, 0.01 * v, -0.02 * v])
    cam_list = [{"file": f"{v:03d}", "ndc_prj": ndc[v], "pose": c2w[v].tolist()}
                for v in range(num_views)]
    return Cameras.from_json_list(cam_list)


def reference_project(ndc, w2c, pts):
    """Numpy transcription of Camera.projection (Camera_utils.py:38-58)."""
    fx, fy, cx, cy = ndc
    proj = np.array([[fx, 0, cx, 0], [0, fy, cy, 0],
                     [0, 0, (-100.0 - 0.1) / (100.0 - 0.1), -2 * 100.0 * 0.1 / (100.0 - 0.1)],
                     [0, 0, -1, 0]])
    homo = np.concatenate([pts, np.ones((len(pts), 1))], 1).T
    cam_v = w2c @ homo
    z = cam_v[2]
    uv = proj @ cam_v
    uv[:2] /= z
    return uv[:2].T, z


def test_project_matches_reference(rng):
    cams = make_cameras(rng)
    pts = rng.normal(size=(50, 3)) * 0.2
    uv, z = project(cams, jnp.asarray(pts, jnp.float32))
    for v in range(cams.num_views):
        uv_ref, z_ref = reference_project(np.asarray(cams.ndc[v]),
                                          np.asarray(cams.w2c[v]), pts)
        np.testing.assert_allclose(np.asarray(uv[v]), uv_ref, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(z[v]), z_ref, rtol=1e-4, atol=1e-5)


def test_projection_matrix_shape():
    cams = make_cameras(np.random.default_rng(0))
    P = projection_matrix(cams.ndc)
    assert P.shape == (4, 4, 4)
    np.testing.assert_allclose(np.asarray(P[0, 3]), [0, 0, -1, 0], atol=1e-6)


def test_unproject_roundtrip(rng):
    cams = make_cameras(rng)
    pts = rng.normal(size=(64, 3)).astype(np.float32) * 0.25
    uv, z = project(cams, jnp.asarray(pts))
    back = unproject(cams, uv, z)
    np.testing.assert_allclose(np.asarray(back),
                               np.broadcast_to(pts, back.shape), rtol=1e-3, atol=1e-4)


def test_pixel_roundtrip(rng):
    image_size = (192, 108)
    rc = rng.random((100, 2)).astype(np.float32) * np.array([192, 108], np.float32)
    uv = pixel_to_ndc(jnp.asarray(rc), image_size)
    rc_back = ndc_to_pixel(uv, image_size)
    np.testing.assert_allclose(np.asarray(rc_back), rc, rtol=1e-4, atol=1e-3)


def test_pixel_index_validity():
    image_size = (100, 200)
    uv = jnp.array([[0.0, 0.0],     # center -> (50, 100)
                    [1.5, 0.0],     # off-image left (u>1 maps to col<0)
                    [0.0, 1.5]])    # off-image bottom
    rc, invalid = pixel_index_and_validity(uv, image_size)
    assert not bool(invalid[0])
    assert bool(invalid[1]) and bool(invalid[2])
    assert rc[0, 0] == 50 and rc[0, 1] == 100
    assert (np.asarray(rc) >= 0).all()
    assert (np.asarray(rc[:, 0]) <= 99).all() and (np.asarray(rc[:, 1]) <= 199).all()


def test_depth_conventions():
    z = jnp.array([-1.0, -2.0])
    d = normalized_depth(z)
    np.testing.assert_allclose(np.asarray(d), [0.5, 1.0])
    np.testing.assert_allclose(np.asarray(depth_to_z(d * 255.0)), np.asarray(z), rtol=1e-6)
