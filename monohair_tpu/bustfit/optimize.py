"""Bust-fit optimization: global similarity transform + SMPL-X parameters
against multi-view landmarks, iris, silhouettes, and shaded-image losses.

Equivalent of SMPLX_optimizer.run (multiview_optimization.py:343-790): the
reference runs Adam over shape/expression/texture/pose/lights with the loss
suite at :659-712. All losses are reproduced here as one jitted objective:

- weighted 2D landmark L1, jaw contour (0:16) and brow points (31:35) x5,
  iris landmarks appended when available (:662-676)
- DECA eye-distance loss over eyelid pairs (:678-679)
- mesh-inside-mask hinge + hair-augmented huber mask loss against a soft mesh
  silhouette (:681-690) — rendered by soft_raster (SoftRas-style scatter-add)
  instead of PyTorch3D's CUDA rasterizer
- masked image + albedo losses under FLAMETex-PCA albedo and 9-coeff SH
  shading (:691-694, texture.py)
- parameter regularizers incl. the x1000 shoulder-pose anchor (:696-708)

Joint freezing follows PoseModel.forward (:292-320): only global/neck/head/
arms/jaw/eyes optimize; the 'fix_shoulder' stage also pins arms+head+jaw+eyes.
The global similarity (rot/trans/scale) is a separate parameter block exported
as model_tsfm.dat, like combine_tsfm (:478-486).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..camera import Cameras, ndc_to_pixel, project
from .smplx import SMPLXModel, lbs_forward, rodrigues
from .soft_raster import soft_silhouette_mesh, soft_render_colors, vertex_normals
from .texture import FlameTex, albedo_from_tex, shaded_vertex_colors

# SMPL-X joint ids (multiview_optimization.py:633 comment):
# global 0, neck 12, head 15, leftarm 16, rightarm 17, jaw 22, eyes 23/24
FREE_JOINTS_DEFAULT = (0, 12, 15, 16, 17, 22, 23, 24)
FIX_SHOULDER_EXTRA = (15, 16, 17, 22, 23, 24)
SHOULDER_JOINTS = (16, 17)

# DECA eyelid pairs for the eye-distance loss (lossfunc.eyed_loss)
_EYE_UP = np.array([37, 38, 43, 44])
_EYE_LOW = np.array([41, 40, 47, 46])


class FitParams(NamedTuple):
    """Optimizable parameters (PoseModel + configure_optimizers,
    multiview_optimization.py:241-320, 448-476)."""
    betas: jnp.ndarray          # (S,)
    expression: jnp.ndarray     # (E,)
    tex: jnp.ndarray            # (T,)
    sh_light: jnp.ndarray       # (V_views, 9, 3) per-view SH (per-frame lights)
    pose: jnp.ndarray           # (J, 3) axis-angle deltas on free joints
    global_rot: jnp.ndarray     # (3,) axis-angle
    global_transl: jnp.ndarray  # (3,)
    log_scale: jnp.ndarray      # ()


def init_params(model: SMPLXModel, num_views: int = 1, n_tex: int = 0
                ) -> FitParams:
    return FitParams(jnp.zeros(model.num_betas), jnp.zeros(max(model.num_expr, 1)),
                     jnp.zeros(n_tex), jnp.zeros((num_views, 9, 3)),
                     jnp.zeros((model.num_joints, 3)),
                     jnp.zeros(3), jnp.zeros(3), jnp.zeros(()))


def free_joint_mask(num_joints: int, fix_shoulder: bool = False) -> np.ndarray:
    """(J, 1) float mask of optimizable joints (PoseModel.forward fix_idx)."""
    mask = np.zeros((num_joints, 1), np.float32)
    for j in FREE_JOINTS_DEFAULT:
        if j < num_joints:
            mask[j] = 1.0
    if fix_shoulder:
        for j in FIX_SHOULDER_EXTRA:
            if j < num_joints:
                mask[j] = 0.0
    return mask


def effective_pose(params: FitParams, init_pose: jnp.ndarray,
                   joint_mask: jnp.ndarray) -> jnp.ndarray:
    """init pose + deltas restricted to free joints (fixed joints stay at the
    init, reproducing the reference's index overwrite, :308-314)."""
    return init_pose + joint_mask * params.pose


def default_init_pose(num_joints: int) -> np.ndarray:
    """The reference's init_full_pose (:265-271): near-zero axis-angle with a
    +/-60deg z shoulder preset; the pi x-flip of the root is absorbed by our
    similarity transform instead."""
    pose = np.full((num_joints, 3), 1e-5, np.float32)
    if num_joints > 17:
        pose[16, 2] = -np.pi * 60 / 180
        pose[17, 2] = np.pi * 60 / 180
    return pose


def apply_similarity(params: FitParams, verts: jnp.ndarray) -> jnp.ndarray:
    Rg = rodrigues(params.global_rot[None])[0]
    return (jnp.exp(params.log_scale) * (verts @ Rg.T)) + params.global_transl


def model_tsfm_matrix(params: FitParams) -> jnp.ndarray:
    """The exported 4x4 similarity (model_tsfm.dat content,
    multiview_optimization.py:780-790)."""
    Rg = rodrigues(params.global_rot[None])[0] * jnp.exp(params.log_scale)
    return jnp.eye(4).at[:3, :3].set(Rg).at[:3, 3].set(params.global_transl)


def posed_vertices(model: SMPLXModel, params: FitParams,
                   init_pose: jnp.ndarray, joint_mask: jnp.ndarray
                   ) -> jnp.ndarray:
    verts, _ = lbs_forward(model, params.betas,
                           effective_pose(params, init_pose, joint_mask),
                           expression=params.expression)
    return apply_similarity(params, verts)


# ---------------------------------------------------------------------------
# Loss terms (multiview_optimization.py:659-712)
# ---------------------------------------------------------------------------


def landmark_point_weights(n_lmk: int) -> np.ndarray:
    """Per-point weights: jaw contour 0:16 and 31:35 x5 (:672-675); appended
    iris points keep weight 1."""
    w = np.ones(n_lmk, np.float32)
    w[0:16] *= 5.0
    w[31:35] *= 5.0
    return w


def weighted_lmk_l1(pred_px: jnp.ndarray, gt_px: jnp.ndarray,
                    weights: jnp.ndarray) -> jnp.ndarray:
    """lossfunc.batch_kp_2d_l1_loss: weighted mean L1 over (V, L, 2)."""
    return jnp.mean(weights[None, :, None] * jnp.abs(pred_px - gt_px))


def eyed_loss(pred_px: jnp.ndarray, gt_px: jnp.ndarray) -> jnp.ndarray:
    """DECA eye-closure distance loss on the 68-lmk layout (:678-679)."""
    pd = jnp.linalg.norm(pred_px[:, _EYE_UP] - pred_px[:, _EYE_LOW], axis=-1)
    gd = jnp.linalg.norm(gt_px[:, _EYE_UP] - gt_px[:, _EYE_LOW], axis=-1)
    return jnp.mean(jnp.abs(pd - gd))


def huber(pred: jnp.ndarray, gt: jnp.ndarray, delta: float = 1.0) -> jnp.ndarray:
    """lossfunc.huber == smooth-L1 mean."""
    err = jnp.abs(pred - gt)
    quad = 0.5 * err ** 2 / delta
    return jnp.mean(jnp.where(err < delta, quad, err - 0.5 * delta))


def project_to_pixels(cameras: Cameras, image_size, pts: jnp.ndarray
                      ) -> jnp.ndarray:
    uv, _ = project(cameras, pts)
    return ndc_to_pixel(uv, image_size)


class FitTargets(NamedTuple):
    """Per-view ground truth (NerfDataset fields, multiview_optimization.py:80-238).
    Pixel coords are (row, col); mask/image tensors are at silhouette scale."""
    lmk_px: jnp.ndarray                      # (V, 68, 2)
    iris_px: Optional[jnp.ndarray] = None    # (V, 2, 2)
    mask: Optional[jnp.ndarray] = None       # (V, h, w) body matte in [0,1]
    hair_mask: Optional[jnp.ndarray] = None  # (V, h, w)
    face_mask: Optional[jnp.ndarray] = None  # (V, h, w)
    image: Optional[jnp.ndarray] = None      # (V, h, w, 3) linear RGB


DEFAULT_WEIGHTS: Dict[str, float] = {
    # _setup_loss_weight (:612-618) + configs/Bust_fit/base.yaml:56-61
    "lmk": 0.3, "eyed": 2.0, "inside_mask": 1.0, "mesh_mask": 1.0,
    "image": 2.0, "albedo": 2.0, "reg_shape": 1e-5, "reg_exp": 1e-5,
    "reg_tex": 5e-5, "reg_scale": 1.0, "reg_shoulder": 1000.0,
}


def fit_losses(model: SMPLXModel, params: FitParams, cameras: Cameras,
               image_size, targets: FitTargets,
               lmk_vertex_ids: np.ndarray,
               iris_vertex_ids: Optional[np.ndarray],
               init_pose: jnp.ndarray, joint_mask: jnp.ndarray,
               tex_model: Optional[FlameTex],
               weights: Dict[str, float],
               sil_scale: int = 8, sil_window: int = 8,
               sigma_px: float = 2.0) -> Dict[str, jnp.ndarray]:
    """All loss terms (:659-712). Returns a dict of already-weighted scalars."""
    verts = posed_vertices(model, params, init_pose, joint_mask)
    losses: Dict[str, jnp.ndarray] = {}

    pred_lmk = project_to_pixels(cameras, image_size, verts[lmk_vertex_ids])
    gt_lmk = targets.lmk_px
    if targets.iris_px is not None and iris_vertex_ids is not None:
        pred_iris = project_to_pixels(cameras, image_size, verts[iris_vertex_ids])
        pred_all = jnp.concatenate([pred_lmk, pred_iris], 1)
        gt_all = jnp.concatenate([gt_lmk, targets.iris_px], 1)
    else:
        pred_all, gt_all = pred_lmk, gt_lmk
    w_pts = jnp.asarray(landmark_point_weights(pred_all.shape[1]))
    losses["lmk"] = weights["lmk"] * weighted_lmk_l1(pred_all, gt_all, w_pts)
    if weights.get("eyed", 0.0) > 0 and pred_lmk.shape[1] >= 68:
        losses["eyed"] = weights["eyed"] * eyed_loss(pred_lmk[:, :68],
                                                     gt_lmk[:, :68])

    use_mask = targets.mask is not None and len(model.faces) > 0
    if use_mask:
        mesh_mask = soft_silhouette_mesh(cameras, verts, model.faces, image_size,
                                         scale=sil_scale, window=sil_window,
                                         sigma_px=sigma_px)
        # hinge: mesh must stay inside the body matte (:681-683)
        losses["inside_mask"] = weights["inside_mask"] * jnp.mean(
            jax.nn.relu(mesh_mask - targets.mask))
        # hair-augmented coverage: hair pixels count as covered (:684-689)
        aug = mesh_mask
        if targets.hair_mask is not None:
            hair_only = (1.0 - jax.lax.stop_gradient(mesh_mask)) * targets.hair_mask
            aug = mesh_mask + hair_only
        losses["mesh_mask"] = weights["mesh_mask"] * huber(aug, targets.mask)

    if targets.image is not None and tex_model is not None and len(model.faces):
        albedo = albedo_from_tex(tex_model, params.tex)
        normals = vertex_normals(verts, model.faces)
        imgs, albs = [], []
        for v in range(cameras.num_views):  # per-frame lights (:292-320)
            shaded = shaded_vertex_colors(albedo, normals, params.sh_light[v])
            both = jnp.concatenate([shaded, albedo], -1)
            out = soft_render_colors(cameras[v], verts, model.faces, both,
                                     image_size, scale=sil_scale,
                                     window=sil_window)
            imgs.append(out[0, ..., :3])
            albs.append(out[0, ..., 3:])
        image = jnp.stack(imgs)
        albedo_img = jnp.stack(albs)
        fm = (targets.face_mask if targets.face_mask is not None
              else jnp.ones_like(image[..., 0]))[..., None]
        losses["image"] = weights["image"] * jnp.mean(
            jnp.abs(fm * (targets.image - image)))
        losses["albedo"] = weights["albedo"] * jnp.mean(
            jnp.abs(fm * (targets.image - albedo_img)))

    losses["reg_shape"] = weights["reg_shape"] * 0.5 * jnp.sum(params.betas ** 2)
    losses["reg_exp"] = weights["reg_exp"] * 0.5 * jnp.sum(params.expression ** 2)
    if params.tex.size:
        losses["reg_tex"] = weights["reg_tex"] * 0.5 * jnp.sum(params.tex ** 2)
    losses["reg_scale"] = weights["reg_scale"] * jnp.exp(params.log_scale)
    sj = [j for j in SHOULDER_JOINTS if j < model.num_joints]
    if sj and weights.get("reg_shoulder", 0.0) > 0:
        pose_eff = effective_pose(params, init_pose, joint_mask)
        # mean-of-abs so opposite-sign axis deltas cannot cancel before the
        # x1000 weight lands (each shoulder axis is anchored independently)
        losses["reg_shoulder"] = weights["reg_shoulder"] * jnp.mean(
            jnp.abs(pose_eff[np.array(sj)] - init_pose[np.array(sj)]))
    return losses


def fit_bust_full(model: SMPLXModel, cameras: Cameras, image_size,
                  targets: FitTargets, lmk_vertex_ids: np.ndarray,
                  iris_vertex_ids: Optional[np.ndarray] = None,
                  tex_model: Optional[FlameTex] = None,
                  iters: int = 1000, fix_shoulder: bool = True,
                  weights: Optional[Dict[str, float]] = None,
                  lr: float = 5e-3, sil_scale: int = 8, sil_window: int = 8,
                  log_every: int = 0) -> Tuple[FitParams, list]:
    """Full-objective fit (SMPLX_optimizer.optimize, :626-778). Single jitted
    Adam step over the whole multi-view batch — the reference iterates frames
    with batch_size 1; on TPU all views evaluate in one fused step."""
    weights = {**DEFAULT_WEIGHTS, **(weights or {})}
    n_tex = tex_model.n_tex if tex_model is not None else 0
    params = init_params(model, cameras.num_views, n_tex)
    init_pose = jnp.asarray(default_init_pose(model.num_joints))
    joint_mask = jnp.asarray(free_joint_mask(model.num_joints, fix_shoulder))
    # decay to 3% of lr so the L1-vs-reg equilibrium oscillation shrinks with
    # the step size (the reference runs constant-lr Adam 10k iters and accepts
    # the residual jitter; decaying is strictly tighter)
    sched = optax.exponential_decay(lr, max(iters, 1), 0.03)
    # zero_nans + clipping keep the fit alive under hostile targets (failed
    # detectors can place landmark targets anywhere — one exploding iteration
    # must not poison the whole fit; the reference's batch-1 Adam tolerates
    # this implicitly through its tiny per-frame steps)
    tx = optax.chain(optax.zero_nans(), optax.clip_by_global_norm(1.0),
                     optax.adam(sched))
    opt_state = tx.init(params)

    # Big model arrays enter the jitted step as *arguments*, never as closure
    # constants (closure constants bake into the HLO and blow the remote
    # compile payload on the real chip; faces/parents stay static).
    _ARRAY_FIELDS = ("v_template", "shapedirs", "posedirs", "J_regressor",
                     "lbs_weights", "expr_dirs")
    model_arrays = {k: getattr(model, k) for k in _ARRAY_FIELDS}

    def loss_fn(p: FitParams, arrays, tgt, tex_m):
        m = model._replace(**arrays)
        terms = fit_losses(m, p, cameras, image_size, tgt,
                           lmk_vertex_ids, iris_vertex_ids, init_pose,
                           joint_mask, tex_m, weights,
                           sil_scale=sil_scale, sil_window=sil_window)
        return sum(terms.values(), jnp.float32(0.0))

    @jax.jit
    def step(params, opt_state, arrays, tgt, tex_m):
        loss, grads = jax.value_and_grad(loss_fn)(params, arrays, tgt, tex_m)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(iters):
        params, opt_state, loss = step(params, opt_state, model_arrays,
                                       targets, tex_model)
        if i % max(iters // 10, 1) == 0:
            losses.append(float(loss))
            if log_every and i % log_every == 0:
                print(f"[bust_fit] iter {i}/{iters} loss {float(loss):.5f}")
    return params, losses


# ---------------------------------------------------------------------------
# Back-compat simple fit (landmarks + point-splat silhouette), kept for the
# asset-free wig path and as a cheap first stage.
# ---------------------------------------------------------------------------


def landmark_loss(cameras: Cameras, image_size, verts: jnp.ndarray,
                  lmk_vertex_ids: np.ndarray, target_lmk_px: jnp.ndarray,
                  conf: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """L1 between projected landmark vertices and 2D targets per view
    (multiview_optimization.py:659-676). target_lmk_px: (V, L, 2) (row, col)."""
    pts = verts[lmk_vertex_ids]
    rc = project_to_pixels(cameras, image_size, pts)
    err = jnp.abs(rc - target_lmk_px)
    if conf is not None:
        err = err * conf[..., None]
    return jnp.mean(err)


def soft_silhouette(cameras: Cameras, image_size, surface_pts: jnp.ndarray,
                    res_divisor: int = 8, sigma_px: float = 2.0) -> jnp.ndarray:
    """Differentiable low-res silhouette: gaussian splat of surface samples.
    (Point-based alternative to soft_silhouette_mesh for meshes without faces.)
    Returns (V, H/d, W/d) soft coverage."""
    H, W = image_size
    h, w = H // res_divisor, W // res_divisor
    uv, z = project(cameras, surface_pts)
    rc = ndc_to_pixel(uv, (H, W)) / res_divisor             # (V, N, 2)
    rows = jnp.arange(h, dtype=jnp.float32)[None, None, :]
    cols = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    s2 = (sigma_px / res_divisor) ** 2
    # separable gaussian weights -> (V, N, h) x (V, N, w)
    wr = jnp.exp(-0.5 * (rc[..., 0:1] - rows) ** 2 / s2)
    wc = jnp.exp(-0.5 * (rc[..., 1:2] - cols) ** 2 / s2)
    cover = jnp.einsum("vnh,vnw->vhw", wr, wc)
    return 1.0 - jnp.exp(-cover)


def fit_bust(model: SMPLXModel, cameras: Cameras, image_size,
             lmk_vertex_ids: np.ndarray, target_lmk_px: np.ndarray,
             target_masks: Optional[np.ndarray] = None,
             surface_sample_ids: Optional[np.ndarray] = None,
             iters: int = 500, lr: float = 1e-2,
             weights: Optional[Dict[str, float]] = None
             ) -> Tuple[FitParams, list]:
    """Landmark(+splat silhouette) fit. target_masks: (V, H/8, W/8) in [0,1]."""
    weights = weights or {"lmk": 1.0, "mask": 0.5, "reg": 1e-3}
    params = init_params(model)
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    target_lmk = jnp.asarray(target_lmk_px)
    masks = jnp.asarray(target_masks) if target_masks is not None else None

    _ARRAY_FIELDS = ("v_template", "shapedirs", "posedirs", "J_regressor",
                     "lbs_weights", "expr_dirs")
    model_arrays = {k: getattr(model, k) for k in _ARRAY_FIELDS}

    def loss_fn(p: FitParams, arrays, target_lmk, masks):
        m = model._replace(**arrays)
        verts, _ = lbs_forward(m, p.betas, p.pose, expression=p.expression)
        verts = apply_similarity(p, verts)
        loss = weights["lmk"] * landmark_loss(cameras, image_size, verts,
                                              lmk_vertex_ids, target_lmk)
        if masks is not None and surface_sample_ids is not None:
            sil = soft_silhouette(cameras, image_size, verts[surface_sample_ids])
            loss = loss + weights["mask"] * jnp.mean(jnp.abs(sil - masks))
        reg = jnp.sum(p.betas ** 2) + jnp.sum(p.pose ** 2)
        return loss + weights["reg"] * reg

    @jax.jit
    def step(params, opt_state, arrays, target_lmk, masks):
        loss, grads = jax.value_and_grad(loss_fn)(params, arrays, target_lmk, masks)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(iters):
        params, opt_state, loss = step(params, opt_state, model_arrays,
                                       target_lmk, masks)
        if i % max(iters // 10, 1) == 0:
            losses.append(float(loss))
    return params, losses
