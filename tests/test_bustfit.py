"""SMPL-X LBS, similarity-fit recovery, bust transform export."""

import numpy as np
import jax.numpy as jnp

from monohair_tpu.bustfit.optimize import (FitParams, apply_similarity, fit_bust,
                                           init_params, model_tsfm_matrix,
                                           soft_silhouette)
from monohair_tpu.bustfit.smplx import lbs_forward, random_test_model, rodrigues
from monohair_tpu.bustfit.transforms import (euler_yzx_style_matrix, load_model_tsfm,
                                             save_model_tsfm, semantic_to_matrix)


def test_rodrigues_basics():
    R = np.asarray(rodrigues(jnp.asarray(np.array([[0.0, 0.0, np.pi / 2]]))))[0]
    np.testing.assert_allclose(R @ [1, 0, 0], [0, 1, 0], atol=1e-6)
    R0 = np.asarray(rodrigues(jnp.zeros((1, 3))))[0]
    np.testing.assert_allclose(R0, np.eye(3), atol=1e-6)


def test_lbs_rest_pose_is_template(rng):
    model = random_test_model(rng)
    verts, joints = lbs_forward(model, jnp.zeros(model.num_betas),
                                jnp.zeros((model.num_joints, 3)))
    np.testing.assert_allclose(np.asarray(verts), np.asarray(model.v_template),
                               atol=1e-5)


def test_lbs_root_rotation_rotates_everything(rng):
    model = random_test_model(rng)
    pose = np.zeros((model.num_joints, 3), np.float32)
    pose[0, 1] = np.pi / 2  # root rotation about y
    verts, joints = lbs_forward(model, jnp.zeros(model.num_betas), jnp.asarray(pose))
    # rigid: pairwise distances preserved
    v0 = np.asarray(model.v_template)
    v1 = np.asarray(verts)
    d0 = np.linalg.norm(v0[:10, None] - v0[None, :10], axis=-1)
    d1 = np.linalg.norm(v1[:10, None] - v1[None, :10], axis=-1)
    np.testing.assert_allclose(d1, d0, rtol=1e-4, atol=1e-5)
    assert np.abs(v1 - v0).max() > 0.01  # actually moved


def test_similarity_fit_recovers_transform(rng):
    """Optimize only the global similarity against projected landmarks of a
    known transform — must recover it (the core of SMPLX_optimizer.run)."""
    from tests.test_camera import make_cameras
    model = random_test_model(rng, num_verts=48)
    cams = make_cameras(rng, num_views=4)
    true = FitParams(jnp.zeros(model.num_betas), jnp.zeros((model.num_joints, 3)),
                     jnp.asarray(np.array([0.05, -0.1, 0.08], np.float32)),
                     jnp.asarray(np.array([0.02, -0.03, 0.01], np.float32)),
                     jnp.asarray(np.float32(0.1)))
    verts, _ = lbs_forward(model, true.betas, true.pose)
    verts = apply_similarity(true, verts)
    lmk_ids = np.arange(0, 48, 3)
    from monohair_tpu.camera import ndc_to_pixel, project
    uv, _ = project(cams, verts[lmk_ids])
    target = np.asarray(ndc_to_pixel(uv, (128, 128)))

    params, losses = fit_bust(model, cams, (128, 128), lmk_ids, target,
                              iters=400, lr=2e-2,
                              weights={"lmk": 1.0, "mask": 0.0, "reg": 1e-5})
    fit_verts, _ = lbs_forward(model, params.betas, params.pose)
    fit_verts = apply_similarity(params, fit_verts)
    err = np.abs(np.asarray(fit_verts[lmk_ids]) - np.asarray(verts[lmk_ids])).max()
    assert err < 0.01, f"landmark vertex error {err}, losses {losses}"


def test_soft_silhouette_coverage(rng):
    from tests.test_camera import make_cameras
    cams = make_cameras(rng, num_views=2)
    pts = jnp.asarray((rng.random((200, 3)).astype(np.float32) - 0.5) * 0.1)
    sil = soft_silhouette(cams, (128, 128), pts, res_divisor=8)
    s = np.asarray(sil)
    assert s.shape == (2, 16, 16)
    assert s.max() > 0.5 and s.min() >= 0.0 and s.max() <= 1.0


def test_model_tsfm_roundtrip(tmp_path, rng):
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = [0.1, 0.2, 0.3]
    p = str(tmp_path / "model_tsfm.dat")
    save_model_tsfm(p, m)
    back = load_model_tsfm(p)
    np.testing.assert_allclose(back, m, atol=1e-7)
    # column-major on disk, like the reference readMatrixFromFile expects
    raw = np.fromfile(p, dtype=np.float32).reshape(4, 4)
    np.testing.assert_allclose(raw.T, m)


def test_euler_matrix_is_rotation():
    R = euler_yzx_style_matrix(np.array([0.1, -0.2, 0.15]))
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-9)
    m = semantic_to_matrix(np.array([0.1, 0.2, 0.3, 10.0, -5.0, 3.0, 1.5]))
    assert m.shape == (4, 4)
    np.testing.assert_allclose(np.linalg.det(m[:3, :3]), 1.5 ** 3, rtol=1e-6)


def test_params_export_matrix():
    p = init_params(random_test_model(np.random.default_rng(0)))
    m = np.asarray(model_tsfm_matrix(p))
    np.testing.assert_allclose(m, np.eye(4), atol=1e-6)
