#!/usr/bin/env python
"""Train the DeepMVSHair-equivalent occupancy/orientation nets.

The reference ships eval + checkpoints but no trainer (SURVEY.md §2.4 #27).
Usage:
    python train_mvs.py --data_root=<cases> --kind=occ --steps=20000
Each case directory must hold imgs/<view>/{undirectional_map,hair_depth,
bust_depth,mask}.png, cam_params.json, and GT Occ3D/Ori3D mats.
"""

import argparse
import os
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--calib", required=True, help="cam_params.json path")
    ap.add_argument("--kind", choices=["occ", "ori"], default="occ")
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--out", default="checkpoints/mvs")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from monohair_tpu.checkpoint import save_pytree
    from monohair_tpu.coords import voxel_to_world
    from monohair_tpu.io.mat_io import load_occ_mat, load_ori_mat
    from monohair_tpu.models.pifu import OccAttn, OriAttn
    from monohair_tpu.mvs.eval import load_mvs_inputs
    from monohair_tpu.mvs.sampling import (sample_occ_training_points,
                                           sample_ori_training_points)
    from monohair_tpu.mvs.train import create_state, make_train_step, occ_metrics

    cases = sorted(d for d in os.listdir(args.data_root)
                   if os.path.isdir(os.path.join(args.data_root, d)))
    data = []
    for case in cases:
        cd = os.path.join(args.data_root, case)
        inputs, _ = load_mvs_inputs(cd, args.calib)
        occ = load_occ_mat(os.path.join(cd, "ours/Occ3D.mat"))
        if args.kind == "occ":
            pts_v, targets = sample_occ_training_points(occ)
        else:
            ori = load_ori_mat(os.path.join(cd, "ours/Ori3D.mat"))
            pts_v, targets = sample_ori_training_points(occ, ori)
        pts_w = np.asarray(voxel_to_world(jnp.asarray(pts_v)))
        data.append((inputs, pts_w.astype(np.float32), targets))
    print(f"{len(data)} training cases")

    V = data[0][0].imgs.shape[0]
    H, W = data[0][0].imgs.shape[1:3]
    is_occ = args.kind == "occ"
    model = (OccAttn if is_occ else OriAttn)(num_views=V)
    state, tx = create_state(model, jax.random.PRNGKey(0), V, (H, W), lr=args.lr)
    step = make_train_step(model, tx, is_occ=is_occ)

    rng = np.random.default_rng(0)
    for i in range(args.steps):
        inputs, pts, targets = data[i % len(data)]
        sel = rng.integers(0, len(pts), args.batch)
        state, loss = step(state, inputs.imgs, inputs.w2c, inputs.ndc,
                           jnp.asarray(pts[sel]), jnp.asarray(targets[sel]))
        if i % 500 == 0:
            print(f"step {i}: loss {float(loss):.4f}")
    os.makedirs(args.out, exist_ok=True)
    save_pytree(os.path.join(args.out, args.kind),
                {"params": state.params, "batch_stats": state.batch_stats})
    print("saved", os.path.join(args.out, args.kind))


if __name__ == "__main__":
    main()
