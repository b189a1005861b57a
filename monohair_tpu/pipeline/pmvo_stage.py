"""Stage 2 — PMVO exterior optimization (reference PMVO.py main :805-880)."""

from __future__ import annotations

import os
import time
from typing import List, Optional

import numpy as np

from ..config import Config
from ..io.mat_io import save_occ_ori_mat
from ..pmvo.driver import filter_raw_points, optimize_points, refine_and_voxelize
from ..pmvo.points import load_colmap_points
from .common import load_bust_and_scalp, load_pmvo_maps


def run_pmvo(args: Config, mesh=None) -> None:
    """optimize=True: full line search + refine -> refine/{Occ3D,Ori3D}.mat;
    optimize=False & infer_inner=True: fuse coarse interior -> full/*.mat."""
    t0 = time.monotonic()
    maps, _ = load_pmvo_maps(args)
    if args.PMVO.get("bf16_maps"):
        import jax.numpy as jnp
        maps = maps.astype(jnp.bfloat16)
    _, scalp_v, _ = load_bust_and_scalp(args)
    root = args.data.root
    out = args.output_path
    save_root = os.path.join(out, "optimize")
    patch = args.PMVO.patch_size
    conf_thr = args.PMVO.conf_threshold
    vis_thr = args.PMVO.visible_threshold

    if args.PMVO.optimize:
        points = load_colmap_points(os.path.join(root, args.data.raw_points_path),
                                    num_per_grid=args.PMVO.num_sample_per_grid)
        print(f"total points: {points.shape[0]}")
        if args.PMVO.filter_point:
            surface, filt = filter_raw_points(maps, points, patch, conf_thr, vis_thr)
            os.makedirs(save_root, exist_ok=True)
            np.save(os.path.join(save_root, "surface.npy"), points[surface])
            np.save(os.path.join(save_root, "filter_unvisible.npy"), points[filt])
            points = points[surface]
        print(f"process points: {points.shape[0]}")
        if points.shape[0] == 0:
            raise RuntimeError(
                "PMVO selected 0 visible points — every candidate failed the "
                "mask/confidence visibility test. Almost always this means "
                f"the hair masks ({args.data.mask_path}/) are empty or wrong "
                "(check the segmentation checkpoints against these capture "
                "images) or conf/ is all below "
                f"conf_threshold={conf_thr}.")
        pts, ori, loss, _ = optimize_points(maps, points, patch, conf_thr,
                                            mesh=mesh, save_root=save_root)
        filter_unvisible = np.load(os.path.join(save_root, "filter_unvisible.npy"))
        occ, ori_grid = refine_and_voxelize(
            maps, pts, ori, loss, filter_unvisible, patch, conf_thr, vis_thr,
            args.PMVO.threshold, scalp_points=scalp_v,
            save_root=os.path.join(out, "refine"))
        save_occ_ori_mat(os.path.join(out, "refine"), occ, ori_grid)
    else:
        pts = np.load(os.path.join(save_root, "select_p.npy"))
        ori = np.load(os.path.join(save_root, "select_o.npy"))
        loss = np.load(os.path.join(save_root, "min_loss.npy"))
        filter_unvisible = np.load(os.path.join(save_root, "filter_unvisible.npy"))
        coarse = None
        if args.PMVO.infer_inner:
            # raw.npy = [pts, ori, occ_flag] for EVERY query (mvs_eval.py:250
            # format). The reference fuse (PMVO.py:733-751) ingests all rows,
            # but its unvisible test (PMVO.py:461-480: <3 views see the point
            # in front of render_depth) marks every occluded query — including
            # non-hair bust-interior ones — so at our colmap-guided query
            # scale (61M queries, 5% positive) that is 30x wasted fuse work
            # AND would stamp MVS-negative voxels into the occ grid.
            # Deviation: fuse only the MVS-positive queries — the interior
            # points the net actually predicts as hair.
            coarse = np.load(os.path.join(root, "ours/raw.npy"))
            coarse = coarse[coarse[:, 6] > 0.5]
            print(f"[pmvo] fusing {len(coarse)} MVS-positive interior points")
        occ, ori_grid = refine_and_voxelize(
            maps, pts, ori, loss, filter_unvisible, patch, conf_thr, vis_thr,
            args.PMVO.threshold, scalp_points=scalp_v, coarse_raw=coarse,
            save_root=os.path.join(out, "full" if args.PMVO.infer_inner else "refine"))
        save_occ_ori_mat(os.path.join(out, "full" if args.PMVO.infer_inner else "refine"),
                         occ, ori_grid)
    print(f"[pmvo] done in {time.monotonic() - t0:.1f}s")
