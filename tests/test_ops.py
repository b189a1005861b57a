"""grid_sample (vs torch golden), patch gathers, pool3d, voxelize."""

import jax.numpy as jnp
import numpy as np

from monohair_tpu.ops.grid_sample import (gather_patches, gather_pixels,
                                          grid_sample_2d, grid_sample_views)
from monohair_tpu.ops.pool3d import avg_pool3d, close_volume, max_pool3d, shell_voxels
from monohair_tpu.ops.voxelize import canonicalize_down, mean_direction, voxelize_directions


def _golden(name):
    import os
    return np.load(os.path.join(os.path.dirname(__file__), "golden", name))


def test_grid_sample_matches_torch():
    """Golden fixture from torch F.grid_sample(align_corners=False, zeros);
    regenerate with tests/golden/generate_golden.py (torch is not imported at
    test time — its thread pool deadlocks flakily against XLA's)."""
    d = _golden("grid_sample.npz")
    out = grid_sample_2d(jnp.asarray(d["feat"][0]), jnp.asarray(d["coords"][0, :, 0, :]))
    np.testing.assert_allclose(np.asarray(out), d["ref"], rtol=1e-4, atol=1e-5)


def test_grid_sample_views_shape(rng):
    feats = jnp.asarray(rng.normal(size=(3, 5, 8, 8)).astype(np.float32))
    coords = jnp.asarray(rng.random((3, 17, 2)).astype(np.float32) - 0.5)
    out = grid_sample_views(feats, coords)
    assert out.shape == (3, 17, 5)


def test_gather_patches_matches_reference_loop(rng):
    """Reference get_c_patch (PMVO.py:504-515): clamped double loop, row-major."""
    img = rng.normal(size=(10, 14)).astype(np.float32)
    rc = np.array([[0, 0], [5, 7], [9, 13]], dtype=np.int32)
    size = 3
    out = np.asarray(gather_patches(jnp.asarray(img), jnp.asarray(rc), size))
    for n, (r, c) in enumerate(rc):
        p = 0
        for i in range(-(size // 2), size // 2 + 1):
            for j in range(-(size // 2), size // 2 + 1):
                rr = np.clip(r + i, 0, 9)
                cc = np.clip(c + j, 0, 13)
                assert out[n, p] == img[rr, cc]
                p += 1


def test_gather_pixels(rng):
    img = rng.normal(size=(6, 7, 2)).astype(np.float32)
    rc = np.array([[2, 3], [5, 6]])
    out = np.asarray(gather_pixels(jnp.asarray(img), jnp.asarray(rc)))
    np.testing.assert_allclose(out[0], img[2, 3])
    np.testing.assert_allclose(out[1], img[5, 6])


def test_pool3d_matches_torch():
    d = _golden("pool3d.npz")
    vol = jnp.asarray(d["vol"])
    for k in (3, 5):
        np.testing.assert_allclose(np.asarray(max_pool3d(vol, k)), d[f"max{k}"],
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(avg_pool3d(vol, k)), d[f"avg{k}"],
                                   rtol=1e-5, atol=1e-6)


def test_shell_voxels_surrounds_volume():
    occ = np.zeros((12, 12, 12), np.float32)
    occ[4:8, 4:8, 4:8] = 1
    shell = np.asarray(shell_voxels(jnp.asarray(occ), kernel=3, close=False))
    assert shell[3, 5, 5] == 1 and shell[8, 5, 5] == 1
    assert shell[5, 5, 5] == 0 and shell[0, 0, 0] == 0
    closed = np.asarray(close_volume(jnp.asarray(occ)))
    assert closed[5, 5, 5] == 1


def test_voxelize_directions(rng):
    res = (16, 16, 12)
    # two clusters of points at exact voxel centers (so jitter can't straddle a
    # rounding boundary) in distinct voxels, with coherent directions
    vmin, vsize = np.array([-0.32, -0.32, -0.24]), 0.04
    base1 = (vmin + np.array([3, 4, 5]) * vsize) * np.array([1, -1, -1])
    base2 = (vmin + np.array([8, 2, 1]) * vsize) * np.array([1, -1, -1])
    pts = np.concatenate([base1 + rng.normal(size=(20, 3)) * 1e-4,
                          base2 + rng.normal(size=(20, 3)) * 1e-4]).astype(np.float32)
    dirs = np.concatenate([np.tile([0, -1.0, 0], (20, 1)),
                           np.tile([1.0, 0, 0], (20, 1))]).astype(np.float32)
    # randomize signs; canonicalization must undo it for the y-dominant cluster
    signs = np.where(rng.random(40) > 0.5, 1.0, -1.0)[:, None]
    occ, ori = voxelize_directions(jnp.asarray(pts), jnp.asarray(dirs * signs),
                                   grid_resolution=res, voxel_size=0.04)
    occ, ori = np.asarray(occ), np.asarray(ori)
    assert occ.sum() == 2
    xs, ys, zs = np.nonzero(occ)
    for x, y, z in zip(xs, ys, zs):
        d = ori[x, y, z]
        assert abs(np.linalg.norm(d) - 1) < 1e-4
        assert max(abs(d[0]), abs(d[1])) > 0.99


def test_canonicalize_down():
    d = jnp.array([[0.0, 1.0, 0.0], [0.0, -1.0, 0.0], [1.0, 0.0, 0.0]])
    out = np.asarray(canonicalize_down(d))
    assert (out[:, 1] <= 0).all()
    np.testing.assert_allclose(out[2], [1, 0, 0])


def test_mean_direction_sign_agnostic(rng):
    true = np.array([0.6, -0.8, 0.0], np.float32)
    bundle = np.tile(true, (1, 50, 1)) + rng.normal(size=(1, 50, 3)).astype(np.float32) * 0.05
    signs = np.where(rng.random((1, 50, 1)) > 0.5, 1.0, -1.0).astype(np.float32)
    out = np.asarray(mean_direction(jnp.asarray(bundle * signs)))[0]
    cos = abs(out @ true) / np.linalg.norm(out)
    assert cos > 0.99


def test_voxelize_mean_vs_medoid_deviation_stat():
    """VERDICT weak-item 7: A/B the voxel direction consensus against the
    reference's per-voxel medoid (compute_points_similarity,
    PMVO_utils.py:366-382) on realistic bundles: a dominant direction + ~15 deg
    angular noise + random sign flips, 2-32 members per voxel.

    Measured (this test): principal_axis median 4.2 deg from the TRUE
    direction vs the medoid's 6.0 deg — the eigenvector consensus beats the
    reference's estimator. (A y<=0-canonicalized mean cancels near the y=0
    plane: p95 55 deg — rejected, see ops/voxelize.py docstring.)"""
    import jax.numpy as jnp
    from monohair_tpu.ops.voxelize import principal_axis

    rng = np.random.default_rng(0)
    bundles, mains, medoids = [], [], []
    for _ in range(300):
        k = int(rng.integers(2, 33))
        main = rng.normal(size=3)
        main /= np.linalg.norm(main)
        dirs = main[None] + rng.normal(size=(k, 3)) * 0.25
        dirs *= rng.choice([-1.0, 1.0], (k, 1))          # sign-agnostic storage
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        cos = np.abs(dirs @ dirs.T)
        medoids.append(dirs[np.argmax(cos.mean(1))])
        M = dirs.T @ dirs
        bundles.append([M[0, 0], M[1, 1], M[2, 2], M[0, 1], M[0, 2], M[1, 2]])
        mains.append(main)
    axes = np.asarray(principal_axis(jnp.asarray(np.array(bundles, np.float32))))

    def dev(a, b):
        return np.degrees(np.arccos(np.clip(np.abs(np.sum(a * b, -1)), 0, 1)))

    d_eig = dev(axes, np.array(mains))
    d_med = dev(np.array(medoids), np.array(mains))
    assert np.median(d_eig) <= np.median(d_med) + 0.5, (
        f"eig {np.median(d_eig):.2f} deg vs medoid {np.median(d_med):.2f} deg")
    assert np.percentile(d_eig, 95) < 15.0
