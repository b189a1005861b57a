"""Tiny NeRF training smoke test: a synthetic two-tone scene must be learnable
(loss drops, rendered PSNR beats the initial render)."""

import math

import numpy as np
import pytest

from monohair_tpu.nerf.ngp import HashGridConfig, NGPField
from monohair_tpu.nerf.train import NerfDataset, psnr, render_image, train_nerf

TINY = HashGridConfig(num_levels=4, features_per_level=2, log2_table_size=12,
                      base_resolution=4, finest_resolution=32)


def make_scene(H=40, W=40, num_views=6):
    """Views of a 'red ball at origin on black': analytic target images."""
    imgs, poses = [], []
    f = 40.0
    for v in range(num_views):
        a = 2 * math.pi * v / num_views
        eye = np.array([math.cos(a), 0.2, math.sin(a)]) * 2.0
        fwd = -eye / np.linalg.norm(eye)
        up = np.array([0, 1.0, 0])
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = np.stack([right, np.cross(right, fwd), -fwd], 1)
        c2w[:3, 3] = eye
        # analytic render: pixel red iff its ray passes within r of origin
        rows, cols = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        x = (cols + 0.5 - W / 2) / f
        y = -(rows + 0.5 - H / 2) / f
        d = np.stack([x, y, -np.ones_like(x)], -1) @ c2w[:3, :3].T
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        t_close = -(d @ eye)
        closest = eye + d * t_close[..., None]
        hit = np.linalg.norm(closest, axis=-1) < 0.35
        img = np.zeros((H, W, 3), np.float32)
        img[hit] = [0.9, 0.2, 0.1]
        imgs.append(img)
        poses.append(c2w)
    return NerfDataset(np.stack(imgs), np.stack(poses), f, f, W / 2, H / 2)


@pytest.mark.slow
def test_nerf_overfits_tiny_scene():
    import jax
    ds = make_scene()
    field = NGPField(cfg=TINY, hidden=16, geo_feat=7)
    init_vars = field.init(jax.random.PRNGKey(0), np.zeros((4, 3)), np.zeros((4, 3)))
    rgb0, _ = render_image(field, init_vars, ds.c2w[0], 40, 40,
                           ds.fx, ds.fy, ds.cx, ds.cy, chunk=1600)
    p0 = psnr(rgb0, ds.images[0])

    field, variables, losses = train_nerf(
        ds, steps=300, rays_per_batch=1024, lr=5e-3, log_every=100, field=field)
    assert losses[-1] < losses[0] * 0.5, losses

    rgb, _ = render_image(field, variables, ds.c2w[0], 40, 40,
                          ds.fx, ds.fy, ds.cx, ds.cy, chunk=1600)
    p = psnr(rgb, ds.images[0])
    assert p > p0 + 3.0, (p0, p)  # training clearly improves the render
