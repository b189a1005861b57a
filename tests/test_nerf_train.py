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

    field, variables, losses, _ = train_nerf(
        ds, steps=300, rays_per_batch=1024, lr=5e-3, log_every=100, field=field,
        use_occupancy=False)
    assert losses[-1] < losses[0] * 0.5, losses

    rgb, _ = render_image(field, variables, ds.c2w[0], 40, 40,
                          ds.fx, ds.fy, ds.cx, ds.cy, chunk=1600)
    p = psnr(rgb, ds.images[0])
    assert p > p0 + 3.0, (p0, p)  # training clearly improves the render


def test_occupancy_sampler_concentrates_samples():
    """occupancy_sample_ts places ~all fine samples inside occupied cells."""
    import jax.numpy as jnp
    from monohair_tpu.nerf.ngp import occupancy_sample_ts

    R, bound = 32, 1.5
    values = np.zeros((R, R, R), np.float32)
    # occupied slab: |x| < 0.25 (center cells along the x axis)
    xs = (np.arange(R) + 0.5) / R * 2 * bound - bound
    values[np.abs(xs) < 0.25] = 10.0
    o = jnp.asarray(np.tile([-1.4, 0.0, 0.0], (8, 1)).astype(np.float32))
    d = jnp.asarray(np.tile([1.0, 0.0, 0.0], (8, 1)).astype(np.float32))
    t = np.asarray(occupancy_sample_ts(jnp.asarray(values), o, d,
                                       num_coarse=64, num_fine=32, bound=bound))
    x_hit = -1.4 + t
    inside = np.abs(x_hit) < 0.3
    assert inside.mean() > 0.85, f"only {inside.mean():.2f} of samples in slab"
    assert (np.diff(t, axis=-1) >= 0).all()  # sorted


def test_occupancy_grid_update_marks_density():
    """update_occupancy_grid EMA: cells over the learned ball become occupied,
    far-field stays empty; render through the grid matches the uniform render."""
    import jax
    import jax.numpy as jnp
    from monohair_tpu.nerf.ngp import (init_occupancy_grid, occupancy_threshold,
                                       render_rays_occ, render_rays,
                                       update_occupancy_grid)

    ds = make_scene()
    field = NGPField(cfg=TINY, hidden=16, geo_feat=7)
    field, variables, losses, occ_grid = train_nerf(
        ds, steps=220, rays_per_batch=1024, lr=5e-3, log_every=100, field=field,
        use_occupancy=True, occ_resolution=24, occ_warmup=80,
        occ_update_every=8)
    assert occ_grid is not None and occ_grid.shape == (24, 24, 24)
    occ = np.asarray(occ_grid) > float(occupancy_threshold(occ_grid))
    assert 0.0 < occ.mean() < 0.9, f"degenerate occupancy {occ.mean()}"

    # guided and uniform renders agree on the trained scene
    o = jnp.asarray(np.tile([2.0, 0.2, 0.0], (64, 1)).astype(np.float32))
    dirs = np.tile([-1.0, -0.1, 0.0], (64, 1))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    d = jnp.asarray(dirs.astype(np.float32))
    rgb_u, _, op_u = render_rays(field, variables, o, d, 128)
    rgb_o, _, op_o = render_rays_occ(field, variables, occ_grid, o, d,
                                     num_coarse=128, num_fine=64)
    assert np.abs(np.asarray(rgb_u) - np.asarray(rgb_o)).mean() < 0.08


def test_ray_aabb_miss_keeps_gradients_finite(rng):
    """Rays that miss the AABB must not produce negative deltas (exp overflow
    -> NaN loss on far-orbit captures; glue-run regression)."""
    import jax
    import jax.numpy as jnp
    from monohair_tpu.nerf.dense_grid import DenseGridConfig, DenseGridField
    from monohair_tpu.nerf.ngp import ray_aabb, render_rays

    o = jnp.asarray(np.tile([6.0, 0.5, 0.0], (8, 1)).astype(np.float32))
    d = np.tile([0.0, 1.0, 0.0], (8, 1)).astype(np.float32)  # all miss
    tmin, tmax = ray_aabb(o, jnp.asarray(d))
    assert np.all(np.asarray(tmax) >= np.asarray(tmin))

    field = DenseGridField(cfg=DenseGridConfig(resolutions=(8, 12),
                                               features_per_level=2),
                           hidden=8, geo_feat=3)
    variables = field.init(jax.random.PRNGKey(0), jnp.zeros((4, 3)),
                           jnp.zeros((4, 3)))
    g = jax.grad(lambda v: jnp.sum(render_rays(
        field, v, o, jnp.asarray(d), 8)[0]))(variables)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
