"""PMVO solver validation on an analytic synthetic multi-view scene."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from monohair_tpu.camera import Cameras, ndc_to_pixel, project
from monohair_tpu.pmvo.solver import (PMVOMaps, depth_sample_offsets, filter_points,
                                      find_base_views, observe_points, pmvo_forward,
                                      pmvo_refine_loss)


def ring_cameras(num_views=24, radius=1.1, fx=1.6, fy=1.6):
    cam_list = []
    for v in range(num_views):
        a = 2 * math.pi * v / num_views
        eye = np.array([math.cos(a), 0.0, math.sin(a)]) * radius
        forward = -eye / np.linalg.norm(eye)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(forward, up)
        right /= np.linalg.norm(right)
        true_up = np.cross(right, forward)
        c2w = np.eye(4)
        c2w[:3, :3] = np.stack([right, true_up, -forward], 1)
        c2w[:3, 3] = eye
        cam_list.append({"file": f"{v:03d}", "ndc_prj": [fx, fy, 0.0, 0.0],
                         "pose": c2w.tolist()})
    return Cameras.from_json_list(cam_list)


def synthetic_maps(direction, H=128, W=128, num_views=24, conf=0.8):
    """Constant-orientation maps: every view's 2D orientation equals the
    projection of `direction`; depth far behind everything (all visible)."""
    cams = ring_cameras(num_views)
    d = np.asarray(direction, np.float32)
    d = d / np.linalg.norm(d)
    p0 = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 0.0]], np.float32)
    p0[1] += d * 1e-3
    uv, _ = project(cams, jnp.asarray(p0))
    rc = np.asarray(ndc_to_pixel(uv, (H, W)))      # (V, 2, 2)
    delta = rc[:, 1] - rc[:, 0]                    # (V, 2) (d_row, d_col)
    delta /= np.maximum(np.linalg.norm(delta, axis=-1, keepdims=True), 1e-9)
    ori2d = np.broadcast_to(delta[:, None, None, :], (num_views, H, W, 2)).copy()
    depth = np.full((num_views, H, W), 220.0, np.float32)
    confm = np.full((num_views, H, W), conf, np.float32)
    mask = np.ones((num_views, H, W), np.float32)
    return PMVOMaps(cams, jnp.asarray(depth), jnp.asarray(ori2d),
                    jnp.asarray(confm), jnp.asarray(mask))


def test_depth_sample_offsets_match_reference():
    """Transcription of torch.arange concatenation (PMVO.py:274-278)."""
    off = depth_sample_offsets(90)
    assert off.shape == (90,)
    s1 = np.arange(-0.005, -0.001, 0.004 / 22.5)
    s2 = np.arange(-0.001, 0.001, 0.002 / 45)
    s3 = np.arange(0.001, 0.005, 0.004 / 22.5)
    ref = np.concatenate([s1, s2, s3])[:90]
    np.testing.assert_allclose(off, ref, rtol=1e-5)
    assert (np.abs(off) <= 0.005 + 1e-9).all()


def test_observe_visibility():
    maps = synthetic_maps([0, -1, 0])
    pts = jnp.asarray(np.random.default_rng(0).normal(size=(16, 3)).astype(np.float32) * 0.03)
    obs = observe_points(maps, pts, patch_size=3)
    assert obs["visible"].shape == (24, 16)
    # depth map is far behind every point -> fully visible everywhere
    assert float(jnp.min(obs["visible"])) == 1.0
    idx, conf = find_base_views(obs["visible"], obs["conf"])
    assert idx.shape == (20, 16)
    np.testing.assert_allclose(np.asarray(conf), 0.8, rtol=1e-6)


@pytest.mark.parametrize("direction", [[0, -1, 0], [0.5, -0.85, 0.15]])
def test_forward_recovers_direction(direction):
    maps = synthetic_maps(direction)
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.normal(size=(24, 3)).astype(np.float32) * 0.02)
    _, ori, loss, high_conf = pmvo_forward(maps, pts, patch_size=3,
                                           conf_threshold=0.4)
    d = np.asarray(direction, np.float64)
    d /= np.linalg.norm(d)
    cos = np.abs(np.asarray(ori) @ d)
    assert np.median(cos) > 0.95, f"cos={cos}"
    assert float(np.median(np.asarray(loss))) < 0.05
    assert np.asarray(high_conf).all()


def test_refine_loss_discriminates():
    maps = synthetic_maps([0, -1, 0])
    pts = jnp.zeros((8, 3), jnp.float32)
    good = jnp.asarray(np.tile([0, -1.0, 0], (8, 1)).astype(np.float32))
    bad = jnp.asarray(np.tile([1.0, 0, 0], (8, 1)).astype(np.float32))
    lg = np.asarray(pmvo_refine_loss(maps, pts, good, 3, 0.4))
    lb = np.asarray(pmvo_refine_loss(maps, pts, bad, 3, 0.4))
    assert lg.mean() < 0.05
    assert lb.mean() > 0.5


def test_filter_points_masks():
    maps = synthetic_maps([0, -1, 0])
    # one point in front of the depth (visible), one far behind it (occluded)
    near = np.zeros((1, 3), np.float32)
    # a point pushed far along +x so it leaves every ring camera's frustum
    far = np.array([[0.0, 0.0, 0.0]], np.float32)
    occluded_maps = PMVOMaps(maps.cameras, jnp.zeros_like(maps.depth), maps.ori2d,
                             maps.conf, maps.mask)  # depth 0 -> everything occluded
    surf, filt = filter_points(maps, jnp.asarray(near), 3, 0.4, 1.0)
    assert bool(surf[0])
    surf2, _ = filter_points(occluded_maps, jnp.asarray(far), 3, 0.4, 1.0)
    assert not bool(surf2[0])


def test_forward_with_few_views():
    """V < 20 exercises the top-k clamp in find_base_views (the reference
    hard-codes top-20, PMVO.py:341, and would crash)."""
    maps = synthetic_maps([0, -1, 0], num_views=8)
    pts = jnp.asarray(np.random.default_rng(2).normal(size=(12, 3)).astype(np.float32) * 0.02)
    _, ori, loss, _ = pmvo_forward(maps, pts, patch_size=3, conf_threshold=0.4)
    cos = np.abs(np.asarray(ori) @ np.array([0.0, -1.0, 0.0]))
    assert np.median(cos) > 0.95


def test_optimize_points_sharded_over_mesh():
    """The scaling path: chunks sharded over an 8-device mesh (SURVEY §2.6)."""
    from monohair_tpu.parallel.sharding import data_mesh
    from monohair_tpu.pmvo.driver import optimize_points
    maps = synthetic_maps([0, -1, 0])
    rng = np.random.default_rng(3)
    pts = (rng.normal(size=(64, 3)) * 0.02).astype(np.float32)
    mesh = data_mesh()
    _, ori, loss, _ = optimize_points(maps, pts, 3, 0.4, chunk=32, mesh=mesh)
    cos = np.abs(ori @ np.array([0.0, -1.0, 0.0]))
    assert np.median(cos) > 0.95
    assert ori.shape == (64, 3)


def test_forward_bf16_maps_close_to_f32():
    maps = synthetic_maps([0, -1, 0])
    pts = jnp.asarray(np.random.default_rng(4).normal(size=(16, 3)).astype(np.float32) * 0.02)
    _, o32, l32, _ = pmvo_forward(maps, pts, patch_size=3, conf_threshold=0.4)
    _, o16, l16, _ = pmvo_forward(maps.astype(jnp.bfloat16), pts, patch_size=3,
                                  conf_threshold=0.4)
    cos = np.abs(np.sum(np.asarray(o32) * np.asarray(o16), -1))
    assert np.median(cos) > 0.99
