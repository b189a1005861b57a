"""Strand resampling + scalp diffusion."""

import jax.numpy as jnp
import numpy as np

from monohair_tpu.strands.resample import pad_strands, resample_strand, resample_strands
from monohair_tpu.strands.scalp_diffusion import diffuse_scalp


def test_resample_preserves_shape(rng):
    t = np.linspace(0, 1, 20)
    strand = np.stack([np.sin(t * 3), t, np.cos(t * 2)], -1)
    out = resample_strand(strand, 100)
    assert out.shape == (100, 3)
    np.testing.assert_allclose(out[0], strand[0], atol=1e-6)
    np.testing.assert_allclose(out[-1], strand[-1], atol=1e-6)
    # resampled curve stays near the original control points (their spacing is
    # ~0.17, so mid-segment spline points can sit ~half that from a vertex)
    from scipy.spatial import cKDTree
    d, _ = cKDTree(strand).query(out, 1)
    assert d.max() < 0.12


def test_resample_drops_short():
    out = resample_strands([np.zeros((3, 3)), np.random.default_rng(0).random((10, 3))])
    assert len(out) == 1


def test_pad_strands():
    s = [np.ones((4, 3)), np.ones((7, 3))]
    arr, lens = pad_strands(s)
    assert arr.shape == (2, 7, 3)
    assert list(lens) == [4, 7]
    assert arr[0, 4:].sum() == 0


def test_diffuse_scalp_fills_gap():
    """Empty gap between scalp and field gets occupied along the bridge."""
    occ = np.zeros((32, 32, 32), np.float32)
    occ[:, 20:28, :] = 0.0
    occ[10:22, 20:26, 10:22] = 1.0       # field slab at y >= 20
    ori = np.zeros((32, 32, 32, 3), np.float32)
    ori[..., 1] = 1.0
    ori *= occ[..., None]
    scalp_pts = np.stack([np.linspace(12, 20, 8), np.full(8, 14.0),
                          np.full(8, 16.0)], -1).astype(np.float32)
    normals = np.tile([0.0, 1.0, 0.0], (8, 1)).astype(np.float32)
    new_ori, new_occ = diffuse_scalp(jnp.asarray(occ), jnp.asarray(ori),
                                     jnp.asarray(scalp_pts), jnp.asarray(normals))
    new_occ = np.asarray(new_occ)
    new_ori = np.asarray(new_ori)
    # the gap column between scalp (y=14) and slab (y=20) is now occupied
    assert new_occ[16, 15:20, 16].sum() >= 4
    # diffusion never erases existing field
    assert (new_occ >= occ - 1e-6).all()
    # bridge directions point along +y
    ys = np.nonzero(new_occ[16, 15:20, 16])[0] + 15
    assert (new_ori[16, ys, 16, 1] > 0.5).all()
