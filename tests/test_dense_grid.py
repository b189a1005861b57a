"""Dense multiscale grid field (nerf/dense_grid.py): the z-packed single-offset
gather encode must match naive trilinear interpolation exactly, propagate
gradients to every level, and train end-to-end like the hash field."""

import numpy as np
import pytest

from monohair_tpu.nerf.dense_grid import (DenseGridConfig, DenseGridField,
                                          grid_encode, grid_encode_level,
                                          grid_tv_loss)
from monohair_tpu.nerf.train import psnr, render_image, train_nerf

from test_nerf_train import make_scene

TINY = DenseGridConfig(resolutions=(8, 16, 24), features_per_level=2)


def naive_trilinear(grid, p):
    """grid (R0,R1,R2,F), p (N,3) in [0,1] -> (N,F) reference interpolation."""
    R = grid.shape[:3]
    out = np.zeros((p.shape[0], grid.shape[3]), np.float32)
    for n, (px, py, pz) in enumerate(p):
        x, y, z = px * (R[0] - 1), py * (R[1] - 1), pz * (R[2] - 1)
        ix = min(int(np.floor(x)), R[0] - 2)
        iy = min(int(np.floor(y)), R[1] - 2)
        iz = min(int(np.floor(z)), R[2] - 2)
        wx, wy, wz = x - ix, y - iy, z - iz
        for cx in (0, 1):
            for cy in (0, 1):
                for cz in (0, 1):
                    w = ((wx if cx else 1 - wx) * (wy if cy else 1 - wy)
                         * (wz if cz else 1 - wz))
                    out[n] += w * grid[ix + cx, iy + cy, iz + cz]
    return out


def zpack(grid):
    """(R0,R1,R2,F) -> (R0,R1,R2*F) z-packed layout."""
    return grid.reshape(grid.shape[0], grid.shape[1], -1)


def test_grid_encode_matches_naive_trilinear():
    rng = np.random.default_rng(0)
    R, F = (5, 7, 6), 3
    grid = rng.normal(size=R + (F,)).astype(np.float32)
    p = rng.random((64, 3)).astype(np.float32)
    # include exact corners and boundary points
    p[:8] = np.array([[0, 0, 0], [1, 1, 1], [0, 1, 0], [1, 0, 1],
                      [0.5, 0.5, 0.5], [1, 1, 0], [0, 0, 1], [1, 0, 0]])
    import jax.numpy as jnp
    got = np.asarray(grid_encode_level(jnp.asarray(zpack(grid)),
                                       jnp.asarray(p), F)).T   # (N, F)
    want = naive_trilinear(grid, p)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_grid_encode_multi_level_shape_and_grads():
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(1)
    cfg = TINY
    grids = [jnp.asarray(rng.normal(size=(r, r, r * cfg.features_per_level))
                         .astype(np.float32)) for r in cfg.resolutions]
    p = jnp.asarray(rng.random((32, 3)).astype(np.float32))
    out = grid_encode(grids, p, cfg)
    assert out.shape == (32, len(cfg.resolutions) * cfg.features_per_level)

    def loss(gs):
        return jnp.sum(grid_encode(gs, p, cfg) ** 2)

    gr = jax.grad(loss)(grids)
    for g, r in zip(gr, cfg.resolutions):
        assert g.shape == (r, r, r * cfg.features_per_level)
        assert float(jnp.abs(g).max()) > 0.0  # every level gets gradient


def test_grid_tv_loss():
    import jax.numpy as jnp
    const = [jnp.ones((4, 4, 8))]
    assert float(grid_tv_loss(const)) == 0.0
    rng = np.random.default_rng(2)
    noisy = [jnp.asarray(rng.normal(size=(4, 4, 8)).astype(np.float32))]
    assert float(grid_tv_loss(noisy)) > 0.1


@pytest.mark.slow
def test_dense_field_overfits_tiny_scene():
    import jax
    ds = make_scene()
    field = DenseGridField(cfg=TINY, hidden=16, geo_feat=7)
    init_vars = field.init(jax.random.PRNGKey(0), np.zeros((4, 3)),
                           np.zeros((4, 3)))
    rgb0, _ = render_image(field, init_vars, ds.c2w[0], 40, 40,
                           ds.fx, ds.fy, ds.cx, ds.cy, chunk=1600)
    p0 = psnr(rgb0, ds.images[0])

    field, variables, losses, _ = train_nerf(
        ds, steps=300, rays_per_batch=1024, lr=5e-3, log_every=100,
        field=field, use_occupancy=False, tv_weight=1e-4)
    assert losses[-1] < losses[0] * 0.5, losses

    rgb, _ = render_image(field, variables, ds.c2w[0], 40, 40,
                          ds.fx, ds.fy, ds.cx, ds.cy, chunk=1600)
    p = psnr(rgb, ds.images[0])
    assert p > p0 + 3.0, (p0, p)


def test_grid_encode_chunked_matches_unchunked(rng):
    """The ENCODE_CHUNK split (axon scatter-fault workaround) must be a pure
    reshape of the work: identical features and grid gradients."""
    import jax
    import jax.numpy as jnp
    from monohair_tpu.nerf import dense_grid as dg

    cfg = dg.DenseGridConfig(resolutions=(8, 12), features_per_level=2)
    grids = [jnp.asarray(rng.normal(size=(r, r, r * 2)).astype(np.float32))
             for r in cfg.resolutions]
    pts = jnp.asarray(rng.random((50, 3)).astype(np.float32))

    ref = dg.grid_encode(grids, pts, cfg)
    old = dg.ENCODE_CHUNK
    try:
        dg.ENCODE_CHUNK = 16          # force 4 chunks
        got = dg.grid_encode(grids, pts, cfg)
        g_ref = jax.grad(lambda g: jnp.sum(dg.grid_encode(g, pts, cfg) ** 2))(grids)
    finally:
        dg.ENCODE_CHUNK = old
    g_unchunked = jax.grad(lambda g: jnp.sum(dg.grid_encode(g, pts, cfg) ** 2))(grids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)
    for a, b in zip(g_ref, g_unchunked):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
