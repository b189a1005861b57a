#!/usr/bin/env python
"""ONE measured end-to-end reconstruction on real hardware (VERDICT r3
item 2): drive all four stages over the capture-scale synthetic case
(tools/make_capture_case.py) and record a single wall-clock that includes
every stage of BASELINE.md's "full reconstruction" — NGP training, the 16
fixed-view renders + mesh export, segmentation + annotations, the bust fit at
its stated iteration budget, depth renders, Gabor maps, PMVO, MVS inference,
and strand growth.

Writes E2E_FULL.json {total_seconds, stages{...}, budgets{...}} at the repo
root. Run on the chip:
    python tools/run_e2e_full.py [--case bigsynth] [--ngp-steps 1500]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Analytic GT of the bigsynth case (tools/make_capture_case.py): head sphere
# centered at the MVS origin, radius HEAD_R_NERF * 0.33/2; the hair cap spans
# polar < HAIR_POLAR_DEG around NeRF +y == MVS +x (nerf_to_ngp permutes world
# axes [1,2,0]); the painted stripes run along meridians ("combed down"), so
# the GT strand direction at surface normal n is the meridian tangent.
GT_HEAD_R = 0.72 * 0.33 / 2.0
GT_CAP_AXIS = np.array([1.0, 0.0, 0.0])
GT_CAP_POLAR_DEG = 70.0


def quality_gates(args) -> dict:
    """Occ precision/recall + direction |cos| error of the fused field vs the
    analytic hair cap, and strand stats of the final .hair (VERDICT r3
    item 3). All in MVS world / PMVO voxel frames."""
    import jax.numpy as jnp

    from monohair_tpu.coords import voxel_to_world, world_to_voxel
    from monohair_tpu.io.hair_io import load_hair
    from monohair_tpu.io.mat_io import load_occ_mat, load_ori_mat
    from monohair_tpu.ops.pool3d import max_pool3d

    out_dir = os.path.join(args.output_path, "full")
    occ = load_occ_mat(os.path.join(out_dir, "Occ3D.mat"))
    ori = load_ori_mat(os.path.join(out_dir, "Ori3D.mat"))
    vsize = float(args.vsize)
    vmin = np.asarray(args.bbox_min, np.float64)

    # GT shell voxels: within 1.5 voxels of the sphere surface, inside the cap
    shape = occ.shape
    idx = np.stack(np.meshgrid(*[np.arange(s) for s in shape],
                               indexing="ij"), -1).reshape(-1, 3)
    world = np.asarray(voxel_to_world(jnp.asarray(idx, jnp.float32),
                                      voxel_min=jnp.asarray(vmin, jnp.float32),
                                      voxel_size=vsize))
    r = np.linalg.norm(world, axis=-1)
    n = world / np.maximum(r[:, None], 1e-9)
    polar = np.degrees(np.arccos(np.clip(n @ GT_CAP_AXIS, -1, 1)))
    on_shell = np.abs(r - GT_HEAD_R) < 1.5 * vsize
    gt_mask = (on_shell & (polar < GT_CAP_POLAR_DEG)).reshape(shape)

    gt_occ = gt_mask.astype(np.float32)
    gt_dilated = np.asarray(max_pool3d(jnp.asarray(gt_occ), 3)) > 0
    pred = occ > 0.5
    pred_dilated = np.asarray(
        max_pool3d(jnp.asarray(pred.astype(np.float32)), 3)) > 0
    recall = float((pred_dilated & (gt_occ > 0)).sum()) / max(gt_occ.sum(), 1)
    precision = float((pred & gt_dilated).sum()) / max(pred.sum(), 1)

    # direction error where prediction and (dilated) GT agree: GT dir is the
    # meridian tangent t = normalize(n (a.n) - a); ori mats are world-frame
    # (CLAUDE.md), sign-agnostic |cos|
    both = (pred & gt_dilated).reshape(-1)
    cos_mean = float("nan")
    if both.sum() > 0:
        a = GT_CAP_AXIS
        an = n[both] @ a
        t = n[both] * an[:, None] - a[None]
        t /= np.maximum(np.linalg.norm(t, axis=-1, keepdims=True), 1e-9)
        pd = ori.reshape(-1, 3)[both]
        pd_n = np.linalg.norm(pd, axis=-1)
        ok = pd_n > 1e-6
        if ok.sum() > 0:
            cosv = np.abs(np.sum(t[ok] * (pd[ok] / pd_n[ok, None]), -1))
            cos_mean = float(cosv.mean())

    hair_path = os.path.join(out_dir, "connected_strands.hair")
    strand_count, mean_len = 0, 0.0
    if os.path.exists(hair_path):
        segs, pts = load_hair(hair_path)
        strand_count = int(len(segs))
        mean_len = float(np.mean(segs)) if len(segs) else 0.0
    return {"occ_precision": round(precision, 4),
            "occ_recall": round(recall, 4),
            "dir_abs_cos_mean": (round(cos_mean, 4)
                                 if np.isfinite(cos_mean) else None),
            "gt_shell_voxels": int(gt_occ.sum()),
            "pred_voxels": int(pred.sum()),
            "strand_count": strand_count,
            "strand_mean_points": round(mean_len, 1)}


def _default_train_steps():
    from monohair_tpu.nerf.pipeline import DEFAULT_TRAIN_STEPS
    return DEFAULT_TRAIN_STEPS


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default="bigsynth")
    ap.add_argument("--ngp-steps", type=int, default=None,
                    help="override ngp.train_steps; default = the canonical "
                         "budget (nerf/pipeline.py DEFAULT_TRAIN_STEPS)")
    ap.add_argument("--fit-iters", type=int, default=None,
                    help="override optimize.iter; default = the case config")
    ap.add_argument("--out", default="E2E_FULL.json")
    args_cli = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from monohair_tpu.pipeline.common import resolve_config
    overrides = [f"--yaml=configs/reconstruct/{args_cli.case}"]
    if args_cli.ngp_steps is not None:
        overrides.append(f"--ngp.train_steps={args_cli.ngp_steps}")
    if args_cli.fit_iters is not None:
        overrides.append(f"--optimize.iter={args_cli.fit_iters}")
    args = resolve_config(overrides)

    from monohair_tpu.pipeline.hair_grow_stage import run_hair_grow
    from monohair_tpu.pipeline.infer_inner_stage import run_infer_inner
    from monohair_tpu.pipeline.pmvo_stage import run_pmvo
    from monohair_tpu.pipeline.prepare_data_stage import run_prepare_data

    stages = {}
    t_all = time.time()

    # Stages run in dependency order; an axon worker fault in one stage must
    # still leave a JSON record of everything measured before it (the r3
    # bench lost its whole round to exactly this — CLAUDE.md tunnel notes).
    # Later stages are skipped because they consume the crashed stage's
    # outputs.
    for name, fn in (("prepare_data", run_prepare_data),
                     ("pmvo", run_pmvo),
                     ("infer_inner", run_infer_inner),
                     ("hair_grow", run_hair_grow)):
        t0 = time.time()
        try:
            fn(args)
        except Exception as e:
            stages[name] = {"error": repr(e),
                            "seconds_until_fault": round(time.time() - t0, 1)}
            print(f"== {name} FAILED after {time.time() - t0:.1f}s: {e!r}",
                  flush=True)
            break
        stages[name] = round(time.time() - t0, 1)
        print(f"== {name} {stages[name]}s", flush=True)

    total = round(time.time() - t_all, 1)
    out_hair = os.path.join(args.output_path, "full/connected_strands.hair")
    try:
        quality = quality_gates(args)
    except Exception as e:  # quality must never hide the timing record
        quality = {"error": repr(e)}
    result = {
        "metric": "e2e_full_seconds",
        "total_seconds": total,
        "completed": all(not isinstance(v, dict) for v in stages.values())
                     and len(stages) == 4,
        "stages": stages,
        "budgets": {"ngp_steps": int(args.get("ngp", {}).get(
                        "train_steps", _default_train_steps())),
                    "fit_iters": int(args.get("optimize", {}).get("iter", 0)),
                    "views": 16, "image_size": list(args.data.image_size)},
        "quality": quality,
        "output": out_hair,
        "output_exists": os.path.exists(out_hair),
    }
    with open(args_cli.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
