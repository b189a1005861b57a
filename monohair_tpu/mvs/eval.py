"""Dense occupancy/orientation field inference.

Mirror of deep_mvs_eval (submodules/DeepMVSHair/mvs_eval.py:13-254): per-view
feature pyramids are computed once, then query points stream through both heads
in fixed-size batches. On TPU the batch axis shards over the device mesh; the
feature pyramids are replicated.

Input channel stack per view (BaseDataset.py:293-374 real mode +
mvs_eval.py:103-107): [cos2t, sin2t (undirectional map * 2 - 1),
hair_depth * 2, bust_depth * 2]; NHWC.
"""

from __future__ import annotations

import os
import time
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import VOXEL_MAX, VOXEL_MIN, VSIZE_COARSE
from ..io.mat_io import save_ori_mat_from_points
from ..io.voxels_io import save_voxels_dat
from ..models.pifu import OccAttn, OriAttn, check_pts_in_views, mvs_projection
from ..parallel.sharding import shard_batch


class MVSInputs(NamedTuple):
    imgs: jnp.ndarray        # (V, H, W, 4)
    masks: jnp.ndarray       # (V, H, W, 1)
    w2c: jnp.ndarray         # (V, 4, 4)
    ndc: jnp.ndarray         # (V, 4)
    model_tsfm: np.ndarray   # (4, 4)


def sample_grid_corners(vsize: float, bbox_min, bbox_max) -> np.ndarray:
    """Dense corner grid over the bbox (EvalDataset sampleGridCorner usage at
    EvalDataset.py:20): points at every voxel corner of resolution vsize."""
    axes = [np.arange(bbox_min[d], bbox_max[d] + vsize / 2, vsize) for d in range(3)]
    g = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 3)
    return g.astype(np.float32)


def colmap_guided_queries(colmap_mesh_path: str, vsize: float = VSIZE_COARSE,
                          seed: int = 0) -> np.ndarray:
    """Colmap-guided fine query set (EvalDataset.py:39-52): one jittered sample
    per vsize/8 voxel around the coarse mesh ([1024,1024,768] binning grid),
    plus a vsize/4 corner grid restricted to the mesh's bbox. Replaces the
    full-bbox vsize/2 grid when the mesh is available — interior detail at 2-4x
    the coarse resolution for fewer total queries."""
    from ..pmvo.points import load_colmap_points
    pts = load_colmap_points(colmap_mesh_path, vsize=vsize / 8,
                             grid_resolution=(1024, 1024, 768), num_per_grid=1,
                             seed=seed)
    fine_grid = sample_grid_corners(vsize / 4, pts.min(0), pts.max(0))
    return np.concatenate([fine_grid, pts], 0).astype(np.float32)


def eval_points(occ_model_def: OccAttn, occ_vars, ori_model_def: OriAttn, ori_vars,
                occ_feats, ori_feats, w2c, ndc, pts, occ_margin: float = 0.0):
    """One batch: project, sample features, run both heads.

    `occ_margin` is the decision threshold on the logit difference (0.0 =
    argmax). A checkpoint trained on balanced pos/neg batches over-predicts
    positive on the natural query distribution; tools/tune_occ_threshold.py
    picks the F1-optimal margin on the training cases and stores it next to
    the checkpoint (occ_margin.json), which the stage deploys here.

    Returns (occ_positive (N,) bool, ori (N, 3) unit)."""
    coord, cam = mvs_projection(w2c, ndc, pts)
    pts_view = cam
    occ_logits = occ_model_def.apply(occ_vars, occ_feats, pts, pts_view, coord,
                                     method=occ_model_def.forward_with_feat)
    ori = ori_model_def.apply(ori_vars, ori_feats, pts, pts_view, coord,
                              method=ori_model_def.forward_with_feat)
    positive = (occ_logits[:, 1] - occ_logits[:, 0]) > occ_margin
    return positive, ori, check_pts_in_views(coord, "any")


def deep_mvs_eval(inputs: MVSInputs, occ_model: OccAttn, occ_vars,
                  ori_model: OriAttn, ori_vars, save_folder: Optional[str] = None,
                  query_points: Optional[np.ndarray] = None,
                  batch: int = 8192, mesh=None,
                  vsize: float = VSIZE_COARSE,
                  bbox_min=VOXEL_MIN, bbox_max=VOXEL_MAX,
                  occ_margin: float = 0.0
                  ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Stream the dense query grid through both nets; write voxels.dat,
    Voxel_hair/{Occ3D,Ori3D}.mat and raw.npy like the reference
    (mvs_eval.py:198-251). Returns (raw_pts, orients, occ) arrays."""
    if query_points is None:
        query_points = sample_grid_corners(vsize / 2, bbox_min, bbox_max)
    n = query_points.shape[0]

    feat_fn = jax.jit(lambda m, v, x: m.apply(v, x, method=m.get_feat),
                      static_argnums=0)
    occ_feats = feat_fn(occ_model, occ_vars, inputs.imgs)
    ori_feats = feat_fn(ori_model, ori_vars, inputs.imgs)

    # Feats/params/cameras are jit *arguments*, never closure captures: captured
    # device arrays bake into the HLO as constants (GBs at capture scale, blows
    # the axon remote-compile payload limit).
    step = jax.jit(lambda ov, orv, of, orf, w, nd, pts: eval_points(
        occ_model, ov, ori_model, orv, of, orf, w, nd, pts,
        occ_margin=occ_margin))
    # Double-buffered stream: dispatch batch k+1 BEFORE reading batch k back.
    # JAX dispatch is async, but a bare np.asarray(p) right after the step
    # call blocks the host on that batch's result — over the axon tunnel that
    # serializes dispatch/readback round-trips. Keeping one batch in flight
    # overlaps device compute + transfer with host-side readback
    # (tools/tune_mvs_batch.py measures the delta).
    pos_list, ori_list = [], []
    pending = None                       # (positive, ori) still in flight

    def drain(p, o, valid):
        pos_list.append(np.asarray(p)[:valid])
        ori_list.append(np.asarray(o)[:valid])

    n_batches = (n + batch - 1) // batch
    t_loop = time.monotonic()
    for k, beg in enumerate(range(0, n, batch)):
        sub = query_points[beg:beg + batch]
        valid = sub.shape[0]
        if valid < batch:
            sub = np.concatenate([sub, np.repeat(sub[-1:], batch - valid, 0)], 0)
        p, o, _ = step(occ_vars, ori_vars, occ_feats, ori_feats, inputs.w2c,
                       inputs.ndc, shard_batch(jnp.asarray(sub), mesh))
        if pending is not None:
            drain(*pending)
        pending = (p, o, valid)
        if k % 64 == 0:
            # progress at log points: device-bound loops look like hangs from
            # the host otherwise (CLAUDE.md)
            print(f"[mvs_eval] batch {k + 1}/{n_batches} "
                  f"({time.monotonic() - t_loop:.0f}s)", flush=True)
    if pending is not None:
        drain(*pending)
    occ = np.concatenate(pos_list)
    orients = np.concatenate(ori_list)
    orients /= np.maximum(np.linalg.norm(orients, axis=-1, keepdims=True), 1e-12)

    if save_folder:
        os.makedirs(save_folder, exist_ok=True)
        tsfm_inv = np.linalg.inv(inputs.model_tsfm)
        pos_pts = query_points[occ]
        save_points = (tsfm_inv[:3, :3] @ pos_pts.T + tsfm_inv[:3, 3:4]).T
        save_oris = (tsfm_inv[:3, :3] @ orients[occ].T).T
        save_oris /= np.maximum(np.linalg.norm(save_oris, axis=-1, keepdims=True), 1e-12)

        grid_resolution = np.array([(bbox_max[0] - bbox_min[0]) / vsize,
                                    (bbox_max[1] - bbox_min[1]) / vsize,
                                    (bbox_max[2] - bbox_min[2]) / vsize], np.float32)
        save_voxels_dat(os.path.join(save_folder, "voxels.dat"),
                        save_points, save_oris, grid_resolution,
                        bbox_min, vsize)

        mat_root = os.path.join(save_folder, "Voxel_hair")
        save_ori_mat_from_points(save_points, save_oris.copy(),
                                 np.asarray(bbox_min, np.float32), vsize / 2,
                                 grid_resolution * 2, mat_root, inputs.model_tsfm)

        raw = np.concatenate([query_points, orients,
                              occ[:, None].astype(np.float32)], 1)
        np.save(os.path.join(save_folder, "raw.npy"), raw)
    return query_points, orients, occ


def load_mvs_inputs(case_dir: str, calib_path: str, views_subdir: str = "imgs"
                    ) -> Tuple[MVSInputs, list]:
    """Read the per-view render maps + cameras + model_tsfm for one case
    (BaseDataset.read_real_data, BaseDataset.py:293-374)."""
    import cv2
    from ..io.cameras_io import load_cam_params
    names, cams = load_cam_params(calib_path)
    img_dir = os.path.join(case_dir, views_subdir)
    views = sorted(os.listdir(img_dir))
    imgs, masks = [], []
    for view in views:
        vd = os.path.join(img_dir, view)
        und = cv2.imread(os.path.join(vd, "undirectional_map.png"))[..., ::-1] / 255.0
        orient = und[..., :2] * 2.0 - 1.0
        hair_d = cv2.imread(os.path.join(vd, "hair_depth.png"),
                            cv2.IMREAD_GRAYSCALE)[..., None] / 255.0 * 2.0
        bust_d = cv2.imread(os.path.join(vd, "bust_depth.png"),
                            cv2.IMREAD_GRAYSCALE)[..., None] / 255.0 * 2.0
        m = cv2.imread(os.path.join(vd, "mask.png"), cv2.IMREAD_GRAYSCALE)[..., None] / 255.0
        m = (m >= 0.5).astype(np.float32)
        imgs.append(np.concatenate([orient, hair_d, bust_d], -1).astype(np.float32))
        masks.append(m)
    tsfm_path = os.path.join(case_dir, "model_tsfm.dat")
    if os.path.exists(tsfm_path):
        tsfm = np.fromfile(tsfm_path, dtype=np.float32).reshape(4, 4).T
    else:
        # wig captures skip bust fitting (prepare_data.py:127-128); identity
        tsfm = np.eye(4, dtype=np.float32)
    return MVSInputs(jnp.asarray(np.stack(imgs)), jnp.asarray(np.stack(masks)),
                     cams.w2c, cams.ndc, tsfm), views
