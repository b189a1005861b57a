"""Model tests: torch-golden converter blocks, shapes, tiny overfit training."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from monohair_tpu.models.convert import convert_pifu_checkpoint
from monohair_tpu.models.pifu import (OccAttn, OriAttn, check_pts_in_views,
                                      mvs_projection, positional_encoding,
                                      pt_embed_dim)
from monohair_tpu.models.unet import ConvTranspose2dTorch, DoubleConv, UNetSimple
from monohair_tpu.mvs.sampling import sample_occ_training_points, sample_ori_training_points
from monohair_tpu.mvs.train import create_state, make_train_step, occ_metrics


def test_positional_encoding_matches_reference():
    """Embedder (pifu_attn.py:10-58): [x] + per-freq (sin, cos), freqs 2^0..2^4."""
    x = np.array([[0.3, -0.2, 0.7]], np.float32)
    out = np.asarray(positional_encoding(jnp.asarray(x), 5))
    assert out.shape == (1, pt_embed_dim(3, 5)) == (1, 33)
    ref = [x]
    for k in range(5):
        f = 2.0 ** k
        ref.append(np.sin(x * f))
        ref.append(np.cos(x * f))
    np.testing.assert_allclose(out, np.concatenate(ref, -1), rtol=1e-6)


def _golden(name):
    import os
    return np.load(os.path.join(os.path.dirname(__file__), "golden", name))


def test_double_conv_matches_torch():
    """Golden torch Conv+BN(eval)+ReLU x2 (tests/golden/generate_golden.py)."""
    d = _golden("double_conv.npz")
    sd = {k[3:]: d[k] for k in d.files if k.startswith("sd.")}
    from monohair_tpu.models.convert import _double_conv
    params, stats = {}, {}
    _double_conv(sd, "p.double_conv", params, stats, "blk")
    model = DoubleConv(8, 5)
    out = model.apply({"params": params["blk"], "batch_stats": stats["blk"]},
                      jnp.asarray(d["x"]), train=False)
    # XLA's default conv precision is reduced (bf16-class accumulate) — the
    # intended TPU inference mode; tolerance sized accordingly (~0.3%)
    np.testing.assert_allclose(np.asarray(out), d["ref"], rtol=2e-2, atol=1e-2)


def test_convtranspose_matches_torch():
    d = _golden("convtranspose.npz")
    from monohair_tpu.models.convert import _convT
    params = {"kernel": jnp.asarray(_convT(d["weight"])),
              "bias": jnp.asarray(d["bias"])}
    out = ConvTranspose2dTorch(3).apply({"params": params}, jnp.asarray(d["x"]))
    assert out.shape == d["ref"].shape
    # default (reduced) conv precision — see test_double_conv_matches_torch
    np.testing.assert_allclose(np.asarray(out), d["ref"], rtol=2e-2, atol=1e-2)


def test_unet_output_shapes(rng):
    model = UNetSimple()
    x = jnp.asarray(rng.normal(size=(2, 32, 24, 4)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    d3, u1, u2, u3 = model.apply(variables, x)
    assert d3.shape == (2, 4, 3, 128)
    assert u1.shape == (2, 8, 6, 64)
    assert u2.shape == (2, 16, 12, 32)
    assert u3.shape == (2, 32, 24, 16)
    assert model.output_feat == 240


def test_occ_attn_forward_and_convert_shapes(rng):
    V, H, W, N = 4, 16, 16, 6
    model = OccAttn(num_views=V, vit_depth=2, vit_dim=32, vit_heads=2)
    imgs = jnp.asarray(rng.normal(size=(V, H, W, 4)).astype(np.float32))
    pts = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32) * 0.1)
    pts_view = jnp.asarray(rng.normal(size=(V, N, 3)).astype(np.float32))
    coord = jnp.asarray(rng.random((V, N, 2)).astype(np.float32) - 0.5)
    variables = model.init(jax.random.PRNGKey(0), imgs, pts, pts_view, coord)
    out = model.apply(variables, imgs, pts, pts_view, coord)
    assert out.shape == (N, 2)
    # split API agrees with the fused call
    feats = model.apply(variables, imgs, method=model.get_feat)
    out2 = model.apply(variables, feats, pts, pts_view, coord,
                       method=model.forward_with_feat)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("which,vit_prefix,out_dim", [
    ("pifu_occ.npz", "occ_vit", 2), ("pifu_ori.npz", "vit", 3)])
def test_whole_net_conversion_matches_torch(which, vit_prefix, out_dim):
    """VERDICT item 6: the ENTIRE checkpoint path — a random-init torch
    Occ_attn/Ori_attn in the reference's state_dict naming, converted via
    convert_pifu_checkpoint, must reproduce the torch outputs end-to-end
    (reference checkpoints load identically at mvs_eval.py:68,86)."""
    d = _golden(which)
    sd = {k[3:]: d[k] for k in d.files if k.startswith("sd.")}
    params, stats = convert_pifu_checkpoint(sd, vit_prefix)
    cls = OccAttn if out_dim == 2 else OriAttn
    model = cls(num_views=4, vit_depth=2, vit_dim=32, vit_heads=4)
    imgs = jnp.asarray(d["in.imgs"].transpose(0, 2, 3, 1))     # NCHW -> NHWC
    coord = jnp.asarray(d["in.coord"][:, :, 0, :])             # (V,N,1,2)->(V,N,2)
    out = model.apply({"params": params, "batch_stats": stats}, imgs,
                      jnp.asarray(d["in.pts_world"]), jnp.asarray(d["in.pts_view"]),
                      coord)
    assert out.shape == d["out.out"].shape
    # reduced (bf16-class) conv precision on this stack; logits are O(1)
    np.testing.assert_allclose(np.asarray(out), d["out.out"], rtol=3e-2, atol=2e-2)


def test_mvs_projection_conventions():
    """sample_coord must be (-u_pmvo, v_pmvo) (util.py getProjPoints semantics)."""
    w2c = jnp.asarray(np.eye(4, dtype=np.float32)[None])
    ndc = jnp.asarray(np.array([[1.0, 1.0, 0.0, 0.0]], np.float32))
    pts = jnp.asarray(np.array([[0.2, 0.3, -1.0]], np.float32))
    coord, cam = mvs_projection(w2c, ndc, pts)
    # u = -(fx*x/z + cx) = -(0.2/-1) = 0.2 ; v = fy*y/z = -0.3
    np.testing.assert_allclose(np.asarray(coord[0, 0]), [0.2, -0.3], atol=1e-6)
    np.testing.assert_allclose(np.asarray(cam[0, 0]), [0.2, 0.3, -1.0], atol=1e-6)
    assert bool(check_pts_in_views(coord)[0])


def test_occ_training_overfits(rng):
    """The missing trainer: a tiny occ net must fit a separable point set."""
    V, H, W = 2, 16, 16
    model = OccAttn(num_views=V, vit_depth=1, vit_dim=16, vit_heads=2)
    state, tx = create_state(model, jax.random.PRNGKey(0), V, (H, W), lr=3e-3)
    step = make_train_step(model, tx, is_occ=True)
    imgs = jnp.asarray(rng.normal(size=(V, H, W, 4)).astype(np.float32))
    w2c = jnp.asarray(np.stack([np.eye(4)] * V).astype(np.float32))
    ndc = jnp.asarray(np.tile([1.0, 1.0, 0.0, 0.0], (V, 1)).astype(np.float32))
    pts = jnp.asarray((rng.random((64, 3)) * 0.4 - 0.2).astype(np.float32))
    pts = pts.at[:, 2].add(-1.0)
    labels = jnp.asarray((np.asarray(pts[:, 0]) > -0.0).astype(np.int32))
    losses = []
    for _ in range(30):
        state, loss = step(state, imgs, w2c, ndc, pts, labels)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses[::10]


def test_sampling_labels():
    occ = np.zeros((12, 12, 12), np.float32)
    occ[4:8, 4:8, 4:8] = 1
    pts, labels = sample_occ_training_points(occ, kernel=3)
    assert (labels[:6 * 64] == 1).all()
    ins = np.floor(pts[labels == 1]).astype(int)
    assert occ[ins[:, 0], ins[:, 1], ins[:, 2]].all()
    outs = np.floor(pts[labels == 0]).astype(int)
    assert not occ[outs[:, 0], outs[:, 1], outs[:, 2]].any()

    ori = np.zeros((12, 12, 12, 3), np.float32)
    ori[..., 1] = -1.0
    opts, odirs = sample_ori_training_points(occ, ori)
    np.testing.assert_allclose(odirs[:, 1], -1.0)


def test_occ_metrics():
    logits = jnp.asarray(np.array([[0.0, 1.0], [1.0, 0.0], [0.0, 1.0]], np.float32))
    labels = jnp.asarray(np.array([1, 1, 0]))
    m = occ_metrics(logits, labels)
    assert abs(m["precision"] - 0.5) < 1e-6
    assert abs(m["recall"] - 0.5) < 1e-6
