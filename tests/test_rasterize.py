"""Rasterizer validation: analytic triangle/line coverage, occlusion, passes."""

import jax.numpy as jnp
import numpy as np

from monohair_tpu.camera import Cameras
from monohair_tpu.ops.rasterize import (compose_depth_to_image, rasterize_mesh_depth,
                                        rasterize_strands, segment_tangent_colors)
from monohair_tpu.render import render_data, strands_to_segments


def identity_camera(fx=1.0, fy=1.0):
    """Camera at origin looking down -z (OpenGL forward)."""
    return Cameras.from_json_list([
        {"file": "000", "ndc_prj": [fx, fy, 0.0, 0.0], "pose": np.eye(4).tolist()}])


def test_triangle_depth_analytic():
    cam = identity_camera()
    H = W = 64
    # big triangle at z=-1 covering the image center
    verts = np.array([[-0.8, -0.8, -1.0], [0.8, -0.8, -1.0], [0.0, 0.9, -1.0]],
                     np.float32)
    faces = np.array([[0, 1, 2]])
    z = np.asarray(rasterize_mesh_depth(cam, verts, faces, (H, W)))
    # center pixel is inside, depth 1.0
    assert abs(z[H // 2, W // 2] - 1.0) < 1e-4
    # corners are outside -> background inf
    assert np.isinf(z[0, 0]) and np.isinf(z[-1, -1])
    # coverage fraction = triangle area in NDC / screen: 1.6*1.7/2 / 4 = 0.34
    frac = np.isfinite(z).mean()
    assert 0.28 < frac < 0.40


def test_triangle_occlusion():
    cam = identity_camera()
    H = W = 32
    near = np.array([[-0.9, -0.9, -0.5], [0.9, -0.9, -0.5], [0.0, 0.9, -0.5]])
    far = near.copy()
    far[:, 2] = -1.5
    verts = np.concatenate([near, far]).astype(np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]])
    z = np.asarray(rasterize_mesh_depth(cam, verts, faces, (H, W)))
    assert abs(z[H // 2, W // 2] - 0.5) < 1e-4  # near triangle wins


def test_large_triangle_uses_coarse_level():
    cam = identity_camera()
    H = W = 128
    # triangle spanning nearly the whole image: bbox >> 16 px -> level >= 1
    verts = np.array([[-1.5, -1.5, -1.0], [1.5, -1.5, -1.0], [0.0, 1.8, -1.0]],
                     np.float32)
    faces = np.array([[0, 1, 2]])
    z = np.asarray(rasterize_mesh_depth(cam, verts, faces, (H, W)))
    assert abs(z[H // 2, W // 2] - 1.0) < 1e-3
    # interior must be hole-free: the finite run across the center row is contiguous
    finite = np.isfinite(z[H // 2])
    assert finite.mean() > 0.6
    idx = np.nonzero(finite)[0]
    assert finite[idx[0]:idx[-1] + 1].all()


def test_line_rasterization_column():
    cam = identity_camera()
    H = W = 64
    # vertical line at x=0: NDC u=0 -> col = W/2; 3px wide footprint
    strand = np.stack([np.zeros(10), np.linspace(-0.5, 0.5, 10),
                       np.full(10, -1.0)], -1).astype(np.float32)
    s, e, t = strands_to_segments([strand])
    z, col = rasterize_strands(cam, None, s, e,
                               segment_tangent_colors(cam, s, t, mode=3), (H, W))
    z = np.asarray(z)
    cols = np.isfinite(z).any(0)
    assert cols[W // 2] and cols[W // 2 - 1] and cols[W // 2 + 1]
    assert not cols[W // 2 + 4] and not cols[W // 2 - 4]
    np.testing.assert_allclose(z[np.isfinite(z)], 1.0, atol=1e-5)
    # white color written where covered
    assert np.asarray(col)[np.isfinite(z)].min() == 1.0


def test_tangent_colors_double_angle():
    cam = identity_camera()
    p = np.zeros((2, 3), np.float32)
    p[:, 2] = -1.0
    # tangent along +x (NDC theta=0) vs +y (theta=90deg)
    t = np.array([[1.0, 0, 0], [0, 1.0, 0]], np.float32)
    c = np.asarray(segment_tangent_colors(cam, p, t, mode=2))
    np.testing.assert_allclose(c[0], [1.0, 0.5, 0.0], atol=1e-4)   # cos0=1
    np.testing.assert_allclose(c[1], [0.0, 0.5, 0.0], atol=1e-4)   # cos180=-1


def test_render_data_passes(tmp_path):
    cam = identity_camera()
    H = W = 48
    # bust quad at z=-1.2 behind a strand at z=-0.8
    bv = np.array([[-0.9, -0.9, -1.2], [0.9, -0.9, -1.2], [0.9, 0.9, -1.2],
                   [-0.9, 0.9, -1.2]], np.float32)
    bf = np.array([[0, 1, 2], [0, 2, 3]])
    strand = np.stack([np.linspace(-0.4, 0.4, 12), np.zeros(12),
                       np.full(12, -0.8)], -1).astype(np.float32)
    out = render_data(cam, ["000"], [strand], bv, bf, (H, W), str(tmp_path))
    imgs = out["000"]
    mid = (H // 2, W // 2)
    assert abs(imgs["bust_depth"][mid] - 0.6) < 0.01          # 1.2/2
    assert imgs["mask"][mid] == 1.0                           # strand in front
    assert abs(imgs["hair_depth"][mid] - 0.4) < 0.01          # 0.8/2
    # horizontal strand -> double angle (1, 0.5, 0) in the undirectional map
    np.testing.assert_allclose(imgs["undirectional_map"][mid], [1.0, 0.5, 0.0],
                               atol=0.02)
    # background of hair_depth is white, of mask black
    assert imgs["hair_depth"][2, 2] == 1.0
    assert imgs["mask"][2, 2] == 0.0
    assert (tmp_path / "000" / "undirectional_map.png").exists()


def test_compose_depth():
    z = jnp.array([[1.0, jnp.inf]])
    img = np.asarray(compose_depth_to_image(z, background=1.0, depth_range=2.0))
    np.testing.assert_allclose(img, [[0.5, 1.0]])
