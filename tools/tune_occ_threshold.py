#!/usr/bin/env python
"""Pick the deployed occ decision threshold for a trained checkpoint.

The occ head trains on balanced pos/neg batches (train_mvs.py) — good
gradients, but argmax then over-predicts positive on the natural query
distribution. This tool sweeps the logit-difference margin on the TRAINING
cases' validation split, picks the F1-optimal value, reports precision/recall
at that margin on the HELD-OUT cases (the honest number), and writes
<out>/occ_margin.json which mvs/eval.py deploys via infer_inner_stage.

Usage (on the chip, after train_mvs.py --kind occ):
    python tools/tune_occ_threshold.py --data_root /tmp/mvs_cases \
        --calib /tmp/mvs_cases/cam_params.json --ckpt trained/mvs/occ \
        --holdout_cases 2
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def case_logits(model, variables, case_dir, calib, batch=4096):
    """(logit_diff (N,), labels (N,)) over the case's sampled occ points."""
    import jax
    import jax.numpy as jnp
    from monohair_tpu.coords import voxel_to_world
    from monohair_tpu.io.mat_io import load_occ_mat
    from monohair_tpu.models.pifu import mvs_projection
    from monohair_tpu.mvs.eval import load_mvs_inputs
    from monohair_tpu.mvs.sampling import sample_occ_training_points

    inputs, _ = load_mvs_inputs(case_dir, calib)
    occ = load_occ_mat(os.path.join(case_dir, "ours/Occ3D.mat"))
    pts_v, labels = sample_occ_training_points(occ)
    pts_w = np.asarray(voxel_to_world(jnp.asarray(pts_v))).astype(np.float32)

    @jax.jit
    def fwd(variables, imgs, w2c, ndc, pts):
        coord, cam = mvs_projection(w2c, ndc, pts)
        out = model.apply(variables, imgs, pts, cam, coord, train=False)
        return out[:, 1] - out[:, 0]

    diffs = np.empty(len(pts_w), np.float32)
    for beg in range(0, len(pts_w), batch):
        sub = pts_w[beg:beg + batch]
        valid = len(sub)
        if valid < batch:
            sub = np.concatenate([sub, np.repeat(sub[-1:], batch - valid, 0)])
        d = fwd(variables, inputs.imgs, inputs.w2c, inputs.ndc,
                jnp.asarray(sub))
        diffs[beg:beg + valid] = np.asarray(d)[:valid]
    return diffs, labels


def pr_at(diffs, labels, margin):
    pred = diffs > margin
    gt = labels > 0
    tp = float((pred & gt).sum())
    p = tp / max(float(pred.sum()), 1e-6)
    r = tp / max(float(gt.sum()), 1e-6)
    f1 = 2 * p * r / max(p + r, 1e-6)
    return p, r, f1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--calib", required=True)
    ap.add_argument("--ckpt", default="trained/mvs/occ")
    ap.add_argument("--holdout_cases", type=int, default=2)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    from monohair_tpu.checkpoint import load_pytree
    from monohair_tpu.models.pifu import OccAttn
    from monohair_tpu.mvs.eval import load_mvs_inputs

    cases = sorted(d for d in os.listdir(args.data_root)
                   if os.path.isdir(os.path.join(args.data_root, d)))
    train_cases = cases[:-args.holdout_cases] if args.holdout_cases else cases
    held = cases[-args.holdout_cases:] if args.holdout_cases else []

    first, _ = load_mvs_inputs(os.path.join(args.data_root, cases[0]),
                               args.calib)
    V = first.imgs.shape[0]
    model = OccAttn(num_views=V)
    # template-free restore: only params/batch_stats are needed, and the
    # opt_state layout depends on the trainer's optimizer (cosine-decay adam)
    tree = load_pytree(args.ckpt)
    variables = {"params": tree["params"], "batch_stats": tree["batch_stats"]}

    def collect(case_list, tag):
        ds, ls = [], []
        for c in case_list:
            d, l = case_logits(model, variables,
                               os.path.join(args.data_root, c), args.calib)
            ds.append(d)
            ls.append(l)
            print(f"[{tag}] {c}: {len(d)} pts", flush=True)
        return np.concatenate(ds), np.concatenate(ls)

    tr_d, tr_l = collect(train_cases, "train")
    margins = np.quantile(tr_d, np.linspace(0.05, 0.995, 120))
    scored = [(m,) + pr_at(tr_d, tr_l, m) for m in margins]
    best = max(scored, key=lambda s: s[3])
    print(f"best train margin {best[0]:.4f}: P {best[1]:.4f} R {best[2]:.4f} "
          f"F1 {best[3]:.4f}")

    line = (f"tuned_margin {best[0]:.6f} train_P {best[1]:.4f} "
            f"train_R {best[2]:.4f} train_F1 {best[3]:.4f}")
    if held:
        hd, hl = collect(held, "holdout")
        p, r, f1 = pr_at(hd, hl, best[0])
        p0, r0, f0 = pr_at(hd, hl, 0.0)
        print(f"held-out at tuned margin: P {p:.4f} R {r:.4f} F1 {f1:.4f} "
              f"(argmax baseline: P {p0:.4f} R {r0:.4f} F1 {f0:.4f})")
        line += (f" holdout_P {p:.4f} holdout_R {r:.4f} holdout_F1 {f1:.4f}"
                 f" argmax_holdout_P {p0:.4f} argmax_holdout_R {r0:.4f}")

    out_dir = os.path.dirname(args.ckpt.rstrip("/"))
    with open(os.path.join(out_dir, "occ_margin.json"), "w") as f:
        json.dump({"margin": float(best[0]),
                   "train_f1": float(best[3])}, f)
    with open(os.path.join(out_dir, "stats_occ.txt"), "a") as f:
        f.write("# " + line + "\n")
    print("wrote", os.path.join(out_dir, "occ_margin.json"))


if __name__ == "__main__":
    main()
