"""deep_mvs_eval at unit scale: artifact contract (voxels.dat header, raw.npy,
Voxel_hair mats) and occupancy thresholding."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from monohair_tpu.models.pifu import OccAttn, OriAttn
from monohair_tpu.mvs.eval import MVSInputs, deep_mvs_eval, sample_grid_corners


def tiny_setup(rng):
    V, H, W = 2, 16, 16
    imgs = jnp.asarray(rng.normal(size=(V, H, W, 4)).astype(np.float32))
    masks = jnp.ones((V, H, W, 1), jnp.float32)
    w2c = jnp.asarray(np.stack([np.eye(4)] * V).astype(np.float32))
    ndc = jnp.asarray(np.tile([1.0, 1.0, 0.0, 0.0], (V, 1)).astype(np.float32))
    tsfm = np.eye(4, dtype=np.float32)
    inputs = MVSInputs(imgs, masks, w2c, ndc, tsfm)
    occ = OccAttn(num_views=V, vit_depth=1, vit_dim=16, vit_heads=2)
    ori = OriAttn(num_views=V, vit_depth=1, vit_dim=16, vit_heads=2)
    dummy = (imgs, jnp.zeros((4, 3)), jnp.zeros((V, 4, 3)), jnp.zeros((V, 4, 2)))
    occ_vars = occ.init(jax.random.PRNGKey(0), *dummy)
    ori_vars = ori.init(jax.random.PRNGKey(1), *dummy)
    return inputs, occ, occ_vars, ori, ori_vars


def test_sample_grid_corners_counts():
    g = sample_grid_corners(0.1, (-0.2, -0.2, -0.1), (0.2, 0.2, 0.1))
    assert g.shape == (5 * 5 * 3, 3)
    assert g.min() == -0.2 and g.max() == 0.2


def test_deep_mvs_eval_artifacts(tmp_path, rng):
    inputs, occ, occ_vars, ori, ori_vars = tiny_setup(rng)
    queries = (rng.random((50, 3)).astype(np.float32) - 0.5) * 0.2
    queries[:, 2] -= 1.0  # in front of the identity cameras
    pts, orients, occ_mask = deep_mvs_eval(
        inputs, occ, occ_vars, ori, ori_vars, save_folder=str(tmp_path),
        query_points=queries, batch=32, vsize=0.1,
        bbox_min=np.array([-0.32, -0.32, -1.24], np.float32),
        bbox_max=np.array([0.32, 0.32, -0.76], np.float32))
    assert pts.shape == (50, 3) and orients.shape == (50, 3)
    np.testing.assert_allclose(np.linalg.norm(orients, axis=-1), 1.0, rtol=1e-4)

    # artifact contract: voxels.dat = [res(3), bbox_min(3), vsize, count, data]
    raw = np.fromfile(tmp_path / "voxels.dat", dtype=np.float32)
    res = raw[:3]
    np.testing.assert_allclose(res, [6.4, 6.4, 4.8], rtol=1e-5)
    count = int(raw[7])
    assert count == int(occ_mask.sum())
    assert len(raw) == 8 + count * 6

    data = np.load(tmp_path / "raw.npy")
    assert data.shape == (50, 7)
    np.testing.assert_allclose(data[:, 6], occ_mask.astype(np.float32))

    assert (tmp_path / "Voxel_hair" / "Occ3D.mat").exists()
    assert (tmp_path / "Voxel_hair" / "Ori3D.mat").exists()


def test_colmap_guided_queries(tmp_path):
    """EvalDataset.py:39-52 semantics: fine vsize/4 grid over the mesh bbox +
    one jittered sample per vsize/8 voxel around the mesh surface."""
    from monohair_tpu.constants import BUST_TO_ORIGIN
    from monohair_tpu.io.mesh_io import save_obj
    from monohair_tpu.mvs.eval import colmap_guided_queries

    # a small quad patch near the head region (world frame, pre bust shift)
    s = 0.02
    v = np.array([[-s, -s, 0], [s, -s, 0], [s, s, 0], [-s, s, 0]], np.float32)
    v = v - BUST_TO_ORIGIN
    f = np.array([[0, 1, 2], [0, 2, 3]])
    path = str(tmp_path / "colmap_points.obj")
    save_obj(path, v, f)

    q = colmap_guided_queries(path, vsize=0.005)
    assert q.dtype == np.float32 and q.shape[1] == 3
    # all queries stay within the mesh bbox (+ one fine-voxel jitter margin)
    lo, hi = q.min(0), q.max(0)
    assert (hi - lo).max() < 2 * s + 0.01
    # fine grid step is vsize/4 in the leading block
    xs = np.unique(q[:len(q) // 2, 0])
    if len(xs) > 1:
        assert abs(np.diff(xs).min() - 0.005 / 4) < 1e-6
    # denser than the coarse full-bbox grid restricted to the same bbox would be
    assert len(q) > ((2 * s) / (0.005 / 4)) ** 2


def test_occ_margin_monotone(rng):
    """The deployed decision threshold (occ_margin) moves predictions
    monotonically: a +inf margin predicts nothing, -inf everything, and the
    tuned-margin path never flips a point in the wrong direction."""
    from monohair_tpu.mvs.eval import eval_points

    inputs, occ, occ_vars, ori, ori_vars = tiny_setup(rng)
    pts = jnp.asarray((rng.random((40, 3)).astype(np.float32) - 0.5) * 0.2
                      + np.array([0, 0, -1.0], np.float32))
    occ_feats = occ.apply(occ_vars, inputs.imgs, method=occ.get_feat)
    ori_feats = ori.apply(ori_vars, inputs.imgs, method=ori.get_feat)

    def run(margin):
        pos, _, _ = eval_points(occ, occ_vars, ori, ori_vars, occ_feats,
                                ori_feats, inputs.w2c, inputs.ndc, pts,
                                occ_margin=margin)
        return np.asarray(pos)

    base = run(0.0)
    assert not run(1e9).any()
    assert run(-1e9).all()
    tighter = run(0.5)
    looser = run(-0.5)
    assert (tighter <= base).all() and (base <= looser).all()
