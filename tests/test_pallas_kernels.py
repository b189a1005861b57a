"""Pallas fused patch-loss kernel vs the plain-XLA reference (interpret mode on
CPU; the compiled path runs on TPU via bench.py)."""

import jax.numpy as jnp
import numpy as np

from monohair_tpu.ops.pallas_kernels import (patch_min_loss_fused,
                                             patch_min_loss_reference)


def test_fused_matches_reference(rng):
    V, N, S, P = 4, 10, 24, 9
    prj = jnp.asarray(rng.normal(size=(V, N, S, 2)).astype(np.float32))
    ori = jnp.asarray(rng.normal(size=(V, N, P, 2)).astype(np.float32))
    conf = jnp.asarray(rng.random((V, N, P)).astype(np.float32))
    vis = jnp.asarray(np.where(rng.random((V, N)) > 0.3, 1.0, -1.0).astype(np.float32))
    thr = 0.4
    num_r, den_r, cnt_r = patch_min_loss_reference(prj, ori, conf, vis, thr)
    num_f, den_f, cnt_f = patch_min_loss_fused(prj, ori, conf, vis, thr,
                                               interpret=True)
    np.testing.assert_allclose(np.asarray(num_f), np.asarray(num_r),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(den_f), np.asarray(den_r),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(cnt_f), np.asarray(cnt_r))


def test_patch_gather_dma_matches_reference(rng):
    """Strided-DMA window gather == XLA gather on an edge-padded map,
    including windows clamped at every border."""
    from monohair_tpu.ops.pallas_kernels import (patch_gather_dma,
                                                 patch_gather_reference)
    V, H, W, C, N, patch = 3, 20, 17, 8, 70, 5
    half = patch // 2
    maps = rng.normal(size=(V, H, W, C)).astype(np.float32)
    padded = np.pad(maps, ((0, 0), (half, half), (half, half), (0, 0)),
                    mode="edge")
    rc = np.stack([rng.integers(0, H, (V, N)), rng.integers(0, W, (V, N))],
                  -1).astype(np.int32)
    rc[:, :4] = [[0, 0], [H - 1, W - 1], [0, W - 1], [H - 1, 0]]  # corners
    ref = patch_gather_reference(jnp.asarray(padded), jnp.asarray(rc), patch)
    dma = patch_gather_dma(jnp.asarray(padded), jnp.asarray(rc), patch,
                           tile_n=16, interpret=True)
    assert dma.shape == (V, N, patch * patch, C)
    np.testing.assert_array_equal(np.asarray(dma), np.asarray(ref))


def test_observe_points_pallas_path_matches(rng):
    """observe_points with the DMA gather (interpret) == the XLA path."""
    import jax
    from tests.test_camera import make_cameras
    from monohair_tpu.pmvo.solver import PMVOMaps, observe_points

    V, H, W, N = 2, 24, 20, 12
    cams = make_cameras(rng, num_views=V)
    maps = PMVOMaps(cams,
                    jnp.asarray(rng.random((V, H, W)).astype(np.float32) * 255),
                    jnp.asarray(rng.normal(size=(V, H, W, 2)).astype(np.float32)),
                    jnp.asarray(rng.random((V, H, W)).astype(np.float32)),
                    jnp.asarray(rng.random((V, H, W)).astype(np.float32)))
    pts = jnp.asarray((rng.random((N, 3)).astype(np.float32) - 0.5) * 0.2)
    a = observe_points(maps, pts, 5, use_pallas=False)
    # interpret-mode DMA on CPU: monkeypatch the gather to interpret
    from monohair_tpu.ops import pallas_kernels as pk
    orig = pk.patch_gather_dma
    pk.patch_gather_dma = lambda m, rc, p, **kw: orig(m, rc, p, tile_n=8,
                                                      interpret=True)
    try:
        b = observe_points(maps, pts, 5, use_pallas=True)
    finally:
        pk.patch_gather_dma = orig
    for k in a:
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                   rtol=1e-6, atol=1e-6, err_msg=k)
