#!/usr/bin/env python
"""Train the DeepMVSHair-equivalent occupancy/orientation nets.

The reference ships eval + checkpoints but no trainer (SURVEY.md §2.4 #27).
This driver fills the gap with the hygiene the shipped training curves imply
(trained/*/stats_{occ,ori}.txt): a held-out val split evaluated periodically,
stats files in the reference's column layout (occ: train loss/prec/recall +
val loss/prec/recall; ori: train L1 + val L1), orbax checkpointing with
--resume, and a streaming LRU case store so the dataset never has to fit in
host memory.

Usage:
    python train_mvs.py --data_root=<cases> --calib=<cam_params.json> \
        --kind=occ --steps=20000 [--resume]
Each case directory must hold imgs/<view>/{undirectional_map,hair_depth,
bust_depth,mask}.png, cam_params.json, and GT Occ3D/Ori3D mats.
"""

import argparse
import os
from collections import OrderedDict

import numpy as np


class CaseStore:
    """Lazy per-case loader with an LRU cache of at most `max_cached` cases
    (images + sampled points), so multi-case training streams from disk."""

    def __init__(self, data_root: str, calib: str, kind: str,
                 val_frac: float, max_cached: int = 4, seed: int = 0):
        self.root = data_root
        self.calib = calib
        self.kind = kind
        self.val_frac = val_frac
        self.max_cached = max_cached
        self.seed = seed
        self.cases = sorted(d for d in os.listdir(data_root)
                            if os.path.isdir(os.path.join(data_root, d)))
        if not self.cases:
            raise SystemExit(f"no case directories under {data_root}")
        self._cache = OrderedDict()

    def get(self, case: str):
        if case in self._cache:
            self._cache.move_to_end(case)
            return self._cache[case]
        from monohair_tpu.coords import voxel_to_world
        from monohair_tpu.io.mat_io import load_occ_mat, load_ori_mat
        from monohair_tpu.mvs.eval import load_mvs_inputs
        from monohair_tpu.mvs.sampling import (sample_occ_training_points,
                                               sample_ori_training_points)
        import jax.numpy as jnp

        cd = os.path.join(self.root, case)
        inputs, _ = load_mvs_inputs(cd, self.calib)
        occ = load_occ_mat(os.path.join(cd, "ours/Occ3D.mat"))
        if self.kind == "occ":
            pts_v, targets = sample_occ_training_points(occ)
        else:
            ori = load_ori_mat(os.path.join(cd, "ours/Ori3D.mat"))
            pts_v, targets = sample_ori_training_points(occ, ori)
        pts_w = np.asarray(voxel_to_world(jnp.asarray(pts_v))).astype(np.float32)
        # deterministic per-case val split (stable across resumes)
        rng = np.random.default_rng(self.seed + hash(case) % (2 ** 31))
        perm = rng.permutation(len(pts_w))
        n_val = int(len(perm) * self.val_frac)
        entry = {"inputs": inputs,
                 "train": (pts_w[perm[n_val:]], targets[perm[n_val:]]),
                 "val": (pts_w[perm[:n_val]], targets[perm[:n_val]])}
        self._cache[case] = entry
        while len(self._cache) > self.max_cached:
            self._cache.popitem(last=False)
        return entry


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--calib", required=True, help="cam_params.json path")
    ap.add_argument("--kind", choices=["occ", "ori"], default="occ")
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--out", default="checkpoints/mvs")
    ap.add_argument("--val_frac", type=float, default=0.1)
    ap.add_argument("--eval_every", type=int, default=500)
    ap.add_argument("--save_every", type=int, default=5000)
    ap.add_argument("--max_cached_cases", type=int, default=16,
                    help="LRU case-cache size. Keep >= the training-case "
                         "count whenever RAM allows: with random per-step "
                         "case choice, a smaller cache thrashes — every miss "
                         "re-reads 4 maps x views from disk, resamples "
                         "points, and re-ships ~17 MB of images over the "
                         "device link (measured r4: cache 4 over 12 cases "
                         "= >3 s/step of pure reload; cache-all = none)")
    ap.add_argument("--resume", action="store_true",
                    help="restore params/opt state/step from --out and continue")
    ap.add_argument("--holdout_cases", type=int, default=0,
                    help="hold the LAST N cases out of training entirely; "
                         "val metrics then measure case-level generalization "
                         "(the reference curves' posture, stats_occ.txt)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from monohair_tpu.checkpoint import load_pytree, save_pytree
    from monohair_tpu.models.pifu import OccAttn, OriAttn
    from monohair_tpu.mvs.train import (TrainState, create_state, make_eval_step,
                                        make_train_step, occ_metrics)

    store = CaseStore(args.data_root, args.calib, args.kind, args.val_frac,
                      args.max_cached_cases)
    if args.holdout_cases:
        train_cases = store.cases[:-args.holdout_cases]
        val_cases = store.cases[-args.holdout_cases:]
    else:
        train_cases = val_cases = store.cases
    print(f"{len(train_cases)} training / "
          f"{len(val_cases) if args.holdout_cases else 0} held-out cases "
          f"(streaming, cache {args.max_cached_cases})")
    first = store.get(store.cases[0])
    V, H, W = first["inputs"].imgs.shape[:3]
    is_occ = args.kind == "occ"
    model = (OccAttn if is_occ else OriAttn)(num_views=V)
    import optax
    state, tx = create_state(
        model, jax.random.PRNGKey(0), V, (H, W),
        optimizer=optax.adam(optax.cosine_decay_schedule(args.lr, args.steps)))
    step = make_train_step(model, tx, is_occ=is_occ)
    eval_step = make_eval_step(model, is_occ)

    os.makedirs(args.out, exist_ok=True)
    ckpt_path = os.path.join(args.out, args.kind)
    stats_path = os.path.join(args.out, f"stats_{args.kind}.txt")
    start = 0
    if args.resume and os.path.exists(ckpt_path):
        restored = load_pytree(ckpt_path, like=state._asdict())
        state = TrainState(**restored)
        start = int(state.step)
        print(f"resumed from {ckpt_path} at step {start}")

    def batch_metrics(out, targets, loss):
        if is_occ:
            m = occ_metrics(out, targets)
            return [float(loss), m["precision"], m["recall"]]
        return [float(loss)]

    def evaluate(split):
        """Aggregate the split over its cases (batched, eval-mode). With
        --holdout_cases, 'val' runs on cases never trained on."""
        rows = []
        for case in (train_cases if split == "train" else val_cases):
            entry = store.get(case)
            pts, targets = entry[split]
            if not len(pts):
                continue
            sel = np.arange(min(len(pts), 4 * args.batch))
            for beg in range(0, len(sel), args.batch):
                sub = sel[beg:beg + args.batch]
                if len(sub) < args.batch:  # static shapes: pad + trim
                    sub = np.concatenate([sub, np.repeat(sub[-1:],
                                                         args.batch - len(sub))])
                loss, out = eval_step(state, entry["inputs"].imgs,
                                      entry["inputs"].w2c, entry["inputs"].ndc,
                                      jnp.asarray(pts[sub]),
                                      jnp.asarray(targets[sub]))
                rows.append(batch_metrics(out, targets[sub], loss))
        return np.mean(rows, 0) if rows else np.zeros(3 if is_occ else 1)

    rng = np.random.default_rng(start)
    for i in range(start, args.steps):
        entry = store.get(train_cases[int(rng.integers(0, len(train_cases)))])
        pts, targets = entry["train"]
        if is_occ:
            # Balanced batches: the sampler's near+far negatives outnumber
            # positives ~5:1 (mvs/sampling.py), and unweighted CE on that mix
            # plateaued at val recall ~0.28 (r4, stats_occ run 1). Half-pos /
            # half-neg batches shift the learned prior to 0.5; val metrics
            # stay on the natural distribution.
            if "pos_neg" not in entry:
                entry["pos_neg"] = (np.flatnonzero(targets > 0),
                                    np.flatnonzero(targets == 0))
            pos_i, neg_i = entry["pos_neg"]
            if len(pos_i) == 0 or len(neg_i) == 0:
                # degenerate case (all-positive or all-negative samples):
                # fall back to unbalanced sampling instead of crashing on
                # rng.integers(0, 0) (ADVICE r4)
                sel = rng.integers(0, len(pts), args.batch)
            else:
                sel = np.concatenate([
                    pos_i[rng.integers(0, len(pos_i), args.batch // 2)],
                    neg_i[rng.integers(0, len(neg_i),
                                       args.batch - args.batch // 2)]])
        else:
            sel = rng.integers(0, len(pts), args.batch)
        state, loss = step(state, entry["inputs"].imgs, entry["inputs"].w2c,
                           entry["inputs"].ndc, jnp.asarray(pts[sel]),
                           jnp.asarray(targets[sel]))
        if i % args.eval_every == 0:
            tr = evaluate("train")
            va = evaluate("val")
            line = "\t".join(f"{x:.6f}" for x in np.concatenate([tr, va]))
            with open(stats_path, "a") as f:
                f.write(line + "\n")
            print(f"step {i}: {line}")
        if (i + 1) % args.save_every == 0 or i + 1 == args.steps:
            save_pytree(ckpt_path, state._asdict())
    print("saved", ckpt_path)


if __name__ == "__main__":
    main()
