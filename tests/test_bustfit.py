"""SMPL-X LBS, similarity-fit recovery, bust transform export."""

import numpy as np
import jax
import jax.numpy as jnp

from monohair_tpu.bustfit.optimize import (FitParams, FitTargets, apply_similarity,
                                           eyed_loss, fit_bust, fit_bust_full,
                                           huber, init_params, model_tsfm_matrix,
                                           soft_silhouette, weighted_lmk_l1)
from monohair_tpu.bustfit.smplx import (lbs_forward, random_test_model, rodrigues,
                                        sphere_head_model)
from monohair_tpu.bustfit.soft_raster import (soft_render_colors,
                                              soft_silhouette_mesh, vertex_normals)
from monohair_tpu.bustfit.texture import (FlameTex, albedo_from_tex, sh_shading,
                                          shaded_vertex_colors)
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
    true = init_params(model)._replace(
        global_rot=jnp.asarray(np.array([0.05, -0.1, 0.08], np.float32)),
        global_transl=jnp.asarray(np.array([0.02, -0.03, 0.01], np.float32)),
        log_scale=jnp.asarray(np.float32(0.1)))
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


def test_matrix_to_semantic_roundtrip():
    from monohair_tpu.bustfit.transforms import matrix_to_semantic
    sem = np.array([0.05, -0.1, 0.2, 12.0, -7.0, 4.0, 1.3], np.float32)
    m = semantic_to_matrix(sem)
    back = matrix_to_semantic(m)
    np.testing.assert_allclose(back, sem, rtol=1e-4, atol=1e-4)


def test_run_bust_fit_from_annotations(tmp_path, rng):
    """run_bust_fit goes from annotation files + SMPL-X asset to
    model_tsfm.dat with no hand-placed arrays (VERDICT item 2/3 'done')."""
    import cv2
    import json
    from tests.test_camera import make_cameras
    from monohair_tpu.bustfit.pipeline import run_bust_fit, gather_targets
    from monohair_tpu.bustfit.transforms import load_model_tsfm
    from monohair_tpu.config import Config

    root = tmp_path / "case"
    (root / "capture_images").mkdir(parents=True)
    (root / "optimize" / "landmark2d").mkdir(parents=True)
    (root / "optimize" / "iris").mkdir()
    (root / "optimize" / "matting").mkdir()
    (root / "optimize" / "face_parsing").mkdir()

    H = W = 64
    cams = make_cameras(rng, num_views=2)
    model = sphere_head_model(subdiv=6)
    V = model.v_template.shape[0]
    # write a tiny SMPL-X npz in the official key layout
    smplx_path = tmp_path / "SMPLX_TEST.npz"
    np.savez(smplx_path,
             v_template=np.asarray(model.v_template),
             shapedirs=np.zeros((V, 3, 400), np.float32),
             posedirs=np.zeros((V, 3, 0), np.float32),
             J_regressor=np.asarray(model.J_regressor),
             kintree_table=np.array([[-1], [0]]),
             weights=np.asarray(model.lbs_weights),
             f=model.faces)
    lmk_ids = np.linspace(0, V - 1, 68).astype(np.int64)
    lmk_ids_path = tmp_path / "lmk_ids.npy"
    np.save(lmk_ids_path, lmk_ids)

    from monohair_tpu.bustfit.optimize import project_to_pixels
    gt_lmk = np.asarray(project_to_pixels(cams, (H, W), model.v_template[lmk_ids]))
    sil = np.asarray(soft_silhouette_mesh(cams, model.v_template, model.faces,
                                          (H, W), scale=1, window=24))
    cam_list = []
    for v in range(2):
        name = f"{v:03d}"
        img = np.zeros((H, W, 3), np.uint8) + 40
        cv2.imwrite(str(root / "capture_images" / f"{name}.png"), img)
        np.savetxt(str(root / "optimize" / "landmark2d" / f"{name}.txt"),
                   gt_lmk[v][:, [1, 0]])            # (row,col) -> txt (x,y)
        np.savetxt(str(root / "optimize" / "iris" / f"{name}.txt"),
                   np.concatenate([gt_lmk[v][:2][:, [1, 0]],
                                   np.ones((2, 1))], -1))
        matte = (sil[v] > 0.5).astype(np.uint8) * 255
        rgba = np.dstack([img, matte])
        cv2.imwrite(str(root / "optimize" / "matting" / f"{name}.png"), rgba)
        cv2.imwrite(str(root / "optimize" / "face_parsing" / f"{name}.png"),
                    (matte > 0).astype(np.uint8))   # class 1 = skin
        cam_list.append({"file": name,
                         "ndc_prj": np.asarray(cams.ndc[v]).tolist(),
                         "pose": np.linalg.inv(np.asarray(cams.w2c[v],
                                                          np.float64)).tolist()})
    with open(root / "cam_params.json", "w") as f:
        json.dump({"cam_list": cam_list}, f)

    args = Config({"data": {"root": str(root), "image_size": [H, W]},
                   "image_camera_path": "cam_params.json",
                   "bustfit": {"smplx_model": str(smplx_path),
                               "landmark_vertex_ids": str(lmk_ids_path),
                               "n_shape": 2, "n_exp": 2, "sil_scale": 4},
                   "optimize": {"iter": 30}})
    run_bust_fit(args)
    tsfm = load_model_tsfm(str(root / "optimize" / "model_tsfm.dat"))
    assert np.isfinite(tsfm).all()
    # identity ground truth: 30 iters should stay in the neighbourhood
    assert np.abs(tsfm - np.eye(4)).max() < 0.5
    sem = np.fromfile(root / "optimize" / "model_tsfm_semantic.dat",
                      dtype=np.float32)
    assert sem.shape == (7,) and abs(sem[6] - 1.0) < 0.3
    assert (root / "optimize" / "final_template.obj").exists()

    tgt, keep = gather_targets(str(root), ["000", "001"], (H, W), 4)
    assert len(keep) == 2 and tgt.mask is not None and tgt.iris_px is not None


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


def test_expression_dirs_deform(rng):
    model = random_test_model(rng, num_expr=6)
    base, _ = lbs_forward(model, jnp.zeros(model.num_betas),
                          jnp.zeros((model.num_joints, 3)))
    expr = jnp.asarray(np.array([1.0, -2.0, 0.5, 0, 0, 0], np.float32))
    moved, _ = lbs_forward(model, jnp.zeros(model.num_betas),
                           jnp.zeros((model.num_joints, 3)), expression=expr)
    delta = np.asarray(moved - base)
    expect = np.einsum("vce,e->vc", np.asarray(model.expr_dirs), np.asarray(expr))
    np.testing.assert_allclose(delta, expect, atol=1e-5)
    assert np.abs(delta).max() > 1e-3


def test_sh_shading_ambient_and_directional():
    n = jnp.asarray(np.array([[0, 0, 1.0], [0, 0, -1.0]], np.float32))
    sh = jnp.zeros((9, 3)).at[0].set(1.0)            # ambient only
    s = np.asarray(sh_shading(n, sh))
    np.testing.assert_allclose(s[0], s[1], atol=1e-6)  # ambient is isotropic
    sh_dir = jnp.zeros((9, 3)).at[3].set(1.0)          # z-linear band
    s = np.asarray(sh_shading(n, sh_dir))
    assert s[0, 0] > 0 and s[1, 0] < 0                 # flips with the normal


def test_flame_tex_pca(rng):
    basis = rng.normal(size=(20, 3, 4)).astype(np.float32) * 0.1
    tex_model = FlameTex(jnp.full((20, 3), 0.5), jnp.asarray(basis))
    a0 = np.asarray(albedo_from_tex(tex_model, jnp.zeros(4)))
    np.testing.assert_allclose(a0, 0.5, atol=1e-6)
    a1 = np.asarray(albedo_from_tex(tex_model, jnp.asarray(np.ones(4, np.float32))))
    assert np.abs(a1 - a0).max() > 0.01
    assert a1.min() >= 0.0 and a1.max() <= 1.0


def test_vertex_normals_sphere_point_outward():
    model = sphere_head_model(subdiv=8)
    n = np.asarray(vertex_normals(model.v_template, model.faces))
    v = np.asarray(model.v_template)
    v = v / np.linalg.norm(v, axis=-1, keepdims=True)
    cos = (n * v).sum(-1)
    assert cos.min() > 0.9, f"normals not outward: min cos {cos.min()}"


def test_soft_silhouette_mesh_coverage_and_grad(rng):
    """The soft mesh raster covers the projected sphere and is differentiable
    in the vertices (replaces the PyTorch3D silhouette of the reference)."""
    from tests.test_camera import make_cameras
    model = sphere_head_model(subdiv=8)
    cams = make_cameras(rng, num_views=2)
    sil = soft_silhouette_mesh(cams, model.v_template, model.faces, (96, 96),
                               scale=4, window=8)
    s = np.asarray(sil)
    assert s.shape == (2, 24, 24)
    assert s.max() > 0.9 and s.min() < 0.1       # covered and empty regions
    # interior of the projection must be solidly covered (no window holes)
    assert s[:, 11:13, 11:13].min() > 0.8

    def cov(v):
        return jnp.mean(soft_silhouette_mesh(cams, v, model.faces, (96, 96),
                                             scale=4, window=8))
    g = np.asarray(jax.grad(cov)(model.v_template))
    assert np.isfinite(g).all() and np.abs(g).max() > 1e-6


def test_soft_render_colors_blends(rng):
    from tests.test_camera import make_cameras
    model = sphere_head_model(subdiv=8)
    cams = make_cameras(rng, num_views=1)
    colors = jnp.asarray(np.tile([[1.0, 0.2, 0.1]],
                                 (model.v_template.shape[0], 1)).astype(np.float32))
    img = np.asarray(soft_render_colors(cams, model.v_template, model.faces,
                                        colors, (96, 96), scale=4, window=8))
    assert img.shape == (1, 24, 24, 3)
    center = img[0, 10:14, 10:14]
    assert np.abs(center[..., 0] - 1.0).max() < 0.05   # face color dominates
    assert img[0, 0, 0].max() < 0.05                   # background stays dark


def test_loss_primitives():
    pred = jnp.asarray(np.zeros((1, 70, 2), np.float32))
    gt = jnp.asarray(np.ones((1, 70, 2), np.float32))
    w = jnp.ones(70)
    assert np.isclose(float(weighted_lmk_l1(pred, gt, w)), 1.0)
    assert float(eyed_loss(pred[:, :68], gt[:, :68])) == 0.0  # equal closures
    assert np.isclose(float(huber(jnp.zeros(4), jnp.full(4, 0.5))), 0.125)
    assert np.isclose(float(huber(jnp.zeros(4), jnp.full(4, 3.0))), 2.5)


def test_full_loss_fit_recovers_similarity(rng):
    """VERDICT item 3 'done' criterion: a synthetic-head fit with the complete
    loss suite (weighted lmk + iris + eyed + inside/huber masks + image/albedo
    + all regs) recovers a known similarity within 1% scale / 1 deg rotation."""
    from tests.test_camera import make_cameras
    model = sphere_head_model(subdiv=8)
    cams = make_cameras(rng, num_views=4)
    V = model.v_template.shape[0]
    image_size = (96, 96)

    true_rot = np.array([0.04, -0.06, 0.05], np.float32)       # ~5 deg total
    true_transl = np.array([0.03, -0.02, 0.015], np.float32)
    true_log_scale = np.float32(np.log(1.08))
    tex_model = FlameTex(jnp.full((V, 3), 0.5),
                         jnp.asarray(rng.normal(size=(V, 3, 6))
                                     .astype(np.float32) * 0.05))
    true = init_params(model, cams.num_views, 6)._replace(
        global_rot=jnp.asarray(true_rot),
        global_transl=jnp.asarray(true_transl),
        log_scale=jnp.asarray(true_log_scale),
        tex=jnp.asarray(np.array([0.5, -0.3, 0.2, 0, 0.1, -0.1], np.float32)),
        sh_light=jnp.zeros((4, 9, 3)).at[:, 0].set(1.5).at[:, 3].set(0.3))

    gt_verts = apply_similarity(true, model.v_template)
    lmk_ids = np.linspace(0, V - 1, 68).astype(np.int64)
    iris_ids = np.array([3, V - 4], np.int64)
    from monohair_tpu.bustfit.optimize import project_to_pixels
    gt_lmk = project_to_pixels(cams, image_size, gt_verts[lmk_ids])
    gt_iris = project_to_pixels(cams, image_size, gt_verts[iris_ids])
    gt_mask = (np.asarray(soft_silhouette_mesh(
        cams, gt_verts, model.faces, image_size, scale=4, window=8)) > 0.5
    ).astype(np.float32)
    albedo = albedo_from_tex(tex_model, true.tex)
    normals = vertex_normals(gt_verts, model.faces)
    gt_imgs = []
    for v in range(4):
        shaded = shaded_vertex_colors(albedo, normals, true.sh_light[v])
        gt_imgs.append(np.asarray(soft_render_colors(
            cams[v], gt_verts, model.faces, shaded, image_size,
            scale=4, window=8))[0])
    targets = FitTargets(lmk_px=gt_lmk, iris_px=gt_iris,
                         mask=jnp.asarray(gt_mask),
                         hair_mask=jnp.zeros_like(jnp.asarray(gt_mask)),
                         face_mask=jnp.asarray(gt_mask),
                         image=jnp.asarray(np.stack(gt_imgs)))

    params, losses = fit_bust_full(model, cams, image_size, targets, lmk_ids,
                                   iris_vertex_ids=iris_ids, tex_model=tex_model,
                                   iters=800, lr=1e-2, sil_scale=4, sil_window=8)
    assert losses[-1] < losses[0], f"no improvement: {losses}"

    # recovered total rotation/scale: the 1-joint sphere leaves a gauge freedom
    # between root pose and the global rot, so compare the composition
    from monohair_tpu.bustfit.optimize import (default_init_pose, effective_pose,
                                               free_joint_mask)
    init_pose = jnp.asarray(default_init_pose(model.num_joints))
    jm = jnp.asarray(free_joint_mask(model.num_joints, fix_shoulder=True))
    pose_eff = effective_pose(params, init_pose, jm)
    R_fit = (np.asarray(rodrigues(params.global_rot[None]))[0]
             @ np.asarray(rodrigues(pose_eff[0:1]))[0])
    R_true = np.asarray(rodrigues(jnp.asarray(true_rot)[None]))[0]
    cos_angle = (np.trace(R_fit @ R_true.T) - 1) / 2
    angle_deg = np.degrees(np.arccos(np.clip(cos_angle, -1, 1)))
    scale_err = abs(float(np.exp(params.log_scale)) / float(np.exp(true_log_scale)) - 1)
    assert angle_deg < 1.0, f"rotation error {angle_deg:.3f} deg, losses {losses}"
    assert scale_err < 0.01, f"scale error {scale_err * 100:.2f}%, losses {losses}"
    transl_err = np.abs(np.asarray(params.global_transl) - true_transl).max()
    assert transl_err < 0.005, f"translation error {transl_err}"


def test_fit_bust_full_survives_hostile_targets(rng):
    """Garbage landmark targets (failed detectors) must not NaN the fit —
    zero_nans + clipping keep params finite and the export usable."""
    import jax.numpy as jnp
    from monohair_tpu.bustfit.optimize import (FitTargets, fit_bust_full)
    from monohair_tpu.bustfit.smplx import random_test_model
    from tests.test_camera import make_cameras

    model = random_test_model(rng, num_verts=48, num_joints=3)
    cams = make_cameras(rng, num_views=2)
    lmk_ids = np.linspace(0, 47, 68).astype(np.int64)
    targets = FitTargets(lmk_px=jnp.asarray(
        rng.normal(size=(2, 68, 2)).astype(np.float32) * 1e5))  # absurd
    params, losses = fit_bust_full(model, cams, (64, 64), targets, lmk_ids,
                                   iters=8)
    import jax
    for leaf in jax.tree_util.tree_leaves(params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_soft_render_colors_grad_finite_with_degenerate_faces(rng):
    """NaN-gradient regression (r5 e2e: the bust fit sat bit-identical for
    500 iters because optax.zero_nans silently ate NaN grads every step).
    Two jnp.where backward traps in the color raster: barycentrics divided
    by a raw (possibly zero) triangle area, and the softmax-depth exp
    overflowing to inf for invalid fragments. Both must stay fixed: grads
    through a mesh WITH a degenerate face must be finite and nonzero."""
    from tests.test_camera import make_cameras
    model = sphere_head_model(subdiv=8)
    # append a zero-area face (three identical vertex ids)
    faces = np.concatenate([model.faces, [[0, 0, 0]]], 0)
    cams = make_cameras(rng, num_views=2)
    colors = jnp.asarray(
        np.tile([[0.8, 0.4, 0.2]], (model.v_template.shape[0], 1))
        .astype(np.float32))

    def render_mean(v):
        return jnp.mean(soft_render_colors(cams, v, faces, colors, (96, 96),
                                           scale=4, window=8))

    g = np.asarray(jax.grad(render_mean)(model.v_template))
    assert np.isfinite(g).all(), "NaN/inf gradient through the color raster"
    assert np.abs(g).max() > 1e-8
