#!/usr/bin/env python
"""Evaluate trained MVS occ/ori checkpoints on a case root (VERDICT r4
item 6: distribution-shifted holdout).

Reports, over ALL sampled points of every case under --data_root:
  occ: precision/recall/F1 at the deployed tuned margin (occ_margin.json)
       and at the argmax baseline (margin 0)
  ori: sign-agnostic L1 (the net's own loss, pifu_attn.py:327-331 semantics)

and appends one commented summary line to <out>/stats_occ_<tag>.txt /
stats_ori_<tag>.txt so generalization numbers live next to the in-family
holdout curves (trained/mvs/stats_{occ,ori}.txt).

Usage (on the chip, after tools/make_mvs_cases.py <root> N V S 1):
    python tools/eval_mvs.py --data_root /tmp/mvs_shifted \
        --calib /tmp/mvs_shifted/cam_params.json --tag shifted
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def case_points(case_dir: str, calib: str, kind: str):
    """Load a case's per-view inputs + sampled (world pts, targets)."""
    import jax.numpy as jnp
    from monohair_tpu.coords import voxel_to_world
    from monohair_tpu.io.mat_io import load_occ_mat, load_ori_mat
    from monohair_tpu.mvs.eval import load_mvs_inputs
    from monohair_tpu.mvs.sampling import (sample_occ_training_points,
                                           sample_ori_training_points)

    inputs, _ = load_mvs_inputs(case_dir, calib)
    occ = load_occ_mat(os.path.join(case_dir, "ours/Occ3D.mat"))
    if kind == "occ":
        pts_v, targets = sample_occ_training_points(occ)
    else:
        ori = load_ori_mat(os.path.join(case_dir, "ours/Ori3D.mat"))
        pts_v, targets = sample_ori_training_points(occ, ori)
    pts_w = np.asarray(voxel_to_world(jnp.asarray(pts_v))).astype(np.float32)
    return inputs, pts_w, np.asarray(targets)


def forward_all(model, variables, inputs, pts_w, batch: int):
    """Model outputs over all points, batched at a static shape."""
    import jax
    import jax.numpy as jnp
    from monohair_tpu.models.pifu import mvs_projection

    @jax.jit
    def fwd(variables, imgs, w2c, ndc, pts):
        coord, cam = mvs_projection(w2c, ndc, pts)
        return model.apply(variables, imgs, pts, cam, coord, train=False)

    outs = []
    for beg in range(0, len(pts_w), batch):
        sub = pts_w[beg:beg + batch]
        valid = len(sub)
        if valid < batch:
            sub = np.concatenate([sub, np.repeat(sub[-1:], batch - valid, 0)])
        out = fwd(variables, inputs.imgs, inputs.w2c, inputs.ndc,
                  jnp.asarray(sub))
        outs.append(np.asarray(out)[:valid])
    return np.concatenate(outs)


def pr_at(diffs, labels, margin):
    pred = diffs > margin
    gt = labels > 0
    tp = float((pred & gt).sum())
    p = tp / max(float(pred.sum()), 1e-6)
    r = tp / max(float(gt.sum()), 1e-6)
    return p, r, 2 * p * r / max(p + r, 1e-6)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--calib", required=True)
    ap.add_argument("--occ_ckpt", default="trained/mvs/occ")
    ap.add_argument("--ori_ckpt", default="trained/mvs/ori")
    ap.add_argument("--margin_json", default="trained/mvs/occ_margin.json")
    ap.add_argument("--tag", default="shifted")
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    from monohair_tpu.checkpoint import load_pytree
    from monohair_tpu.models.pifu import OccAttn, OriAttn
    from monohair_tpu.mvs.eval import load_mvs_inputs

    cases = sorted(d for d in os.listdir(args.data_root)
                   if os.path.isdir(os.path.join(args.data_root, d)))
    first, _ = load_mvs_inputs(os.path.join(args.data_root, cases[0]),
                               args.calib)
    V = first.imgs.shape[0]
    with open(args.margin_json) as f:
        margin = float(json.load(f)["margin"])

    summaries = {}
    for kind, ckpt, cls in (("occ", args.occ_ckpt, OccAttn),
                            ("ori", args.ori_ckpt, OriAttn)):
        model = cls(num_views=V)
        tree = load_pytree(ckpt)
        variables = {"params": tree["params"],
                     "batch_stats": tree["batch_stats"]}
        outs, targs = [], []
        for c in cases:
            inputs, pts_w, t = case_points(
                os.path.join(args.data_root, c), args.calib, kind)
            outs.append(forward_all(model, variables, inputs, pts_w,
                                    args.batch))
            targs.append(t)
            print(f"[{kind}] {c}: {len(t)} pts", flush=True)
        out = np.concatenate(outs)
        t = np.concatenate(targs)
        if kind == "occ":
            d = out[:, 1] - out[:, 0]
            p, r, f1 = pr_at(d, t, margin)
            p0, r0, f0 = pr_at(d, t, 0.0)
            line = (f"{args.tag}_P {p:.4f} {args.tag}_R {r:.4f} "
                    f"{args.tag}_F1 {f1:.4f} argmax_{args.tag}_P {p0:.4f} "
                    f"argmax_{args.tag}_R {r0:.4f} (margin {margin:.4f}, "
                    f"{len(cases)} cases, {len(t)} pts)")
        else:
            o = out / np.maximum(
                np.linalg.norm(out, axis=-1, keepdims=True), 1e-12)
            l1 = np.minimum(np.abs(o - t).sum(-1),
                            np.abs(o + t).sum(-1)).mean()
            line = (f"{args.tag}_L1 {l1:.4f} ({len(cases)} cases, "
                    f"{len(t)} pts)")
        summaries[kind] = line
        out_dir = os.path.dirname(ckpt.rstrip("/"))
        path = os.path.join(out_dir, f"stats_{kind}_{args.tag}.txt")
        with open(path, "a") as f:
            f.write("# " + line + "\n")
        print(f"[{kind}] {line}\nwrote {path}", flush=True)


if __name__ == "__main__":
    main()
