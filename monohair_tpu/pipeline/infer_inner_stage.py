"""Stage 3 — interior inference (reference infer_inner.py :30-90).

render_data: trace temporary render segments from the refined field and
rasterize the 4 per-view maps; run_mvs: stream the dense grid through the
occ/ori nets; then fuse interior+exterior by re-running the PMVO refine branch
as a *function call* (the reference shells out to PMVO.py, infer_inner.py:89-90,
to dodge GPU OOM — unnecessary here)."""

from __future__ import annotations

import os
import time

import numpy as np

from ..config import Config
from ..constants import BUST_TO_ORIGIN
from ..coords import voxel_to_world
from ..io.cameras_io import load_cam_params, subsample_views
from ..io.mat_io import load_occ_mat, load_ori_mat
from ..io.mesh_io import load_obj
from ..models.convert import convert_pifu_checkpoint, load_torch_checkpoint
from ..models.pifu import OccAttn, OriAttn
from ..mvs.eval import deep_mvs_eval, load_mvs_inputs
from ..render import render_data
from ..strands.trace import generate_segments, strands_to_list
from .pmvo_stage import run_pmvo


def run_infer_inner(args: Config, mesh=None) -> None:
    t0 = time.monotonic()
    root = args.data.root
    out = args.output_path
    refine_path = os.path.join(out, "refine")

    if args.infer_inner.render_data:
        occ = load_occ_mat(os.path.join(refine_path, "Occ3D.mat"))
        ori_world = load_ori_mat(os.path.join(refine_path, "Ori3D.mat"))
        ori_voxel = ori_world * np.array([1, -1, -1], np.float32)
        segs = generate_segments(occ, ori_voxel, thr_dot=0.8, sweeps=3)
        strands = [np.asarray(voxel_to_world(s)) for s in segs]  # no bust shift
        from ..io.hair_io import save_hair
        save_hair(os.path.join(refine_path, "render_segments.hair"), strands)

        bust_v, bust_f = load_obj(os.path.join(root, args.data.bust_path))
        bust_v = bust_v + BUST_TO_ORIGIN
        names, cams = load_cam_params(args.camera_path)
        names, cams = subsample_views(names, cams)
        rsize = tuple(args.infer_inner.get("render_size", [1280, 720]))
        render_data(cams, names, strands, bust_v, bust_f, rsize,
                    os.path.join(root, "imgs"))

    if args.infer_inner.run_mvs:
        inputs, _ = load_mvs_inputs(root, args.camera_path)
        V = inputs.imgs.shape[0]
        occ_model = OccAttn(num_views=V)
        ori_model = OriAttn(num_views=V)
        occ_vars = _load_variables(args, "occ", occ_model, inputs)
        ori_vars = _load_variables(args, "ori", ori_model, inputs)
        vsize = float(args.get("mvs", {}).get("eval_vsize", 0.005))
        # colmap-guided fine sampling (EvalDataset.py:39-52): on by default
        # whenever the coarse mesh exists, like the reference real-data config
        queries = None
        colmap_path = os.path.join(root, "ours", "colmap_points.obj")
        if (args.get("mvs", {}).get("use_colmap_points", True)
                and os.path.exists(colmap_path)):
            from ..mvs.eval import colmap_guided_queries
            queries = colmap_guided_queries(colmap_path, vsize=vsize)
            print(f"[infer_inner] colmap-guided queries: {len(queries)}")
        # 32768 measures ~24% higher TPU throughput than the reference's 8192
        # (tools/tune_mvs_batch.py); CPU glue drives should override smaller
        batch = int(args.get("mvs", {}).get("eval_batch", 32768))
        # occ decision threshold: explicit config wins; else the margin tuned
        # by tools/tune_occ_threshold.py shipped next to the occ checkpoint
        margin = args.get("mvs", {}).get("occ_logit_margin")
        if margin is None or margin == "":
            margin = 0.0
            occ_dir = args.get("mvs", {}).get("occ_model_path") or ""
            sidecar = os.path.join(os.path.dirname(occ_dir.rstrip("/")),
                                   "occ_margin.json") if occ_dir else ""
            if sidecar and os.path.exists(sidecar):
                import json
                with open(sidecar) as f:
                    margin = float(json.load(f)["margin"])
                print(f"[infer_inner] occ logit margin {margin:.3f} ({sidecar})")
        deep_mvs_eval(inputs, occ_model, occ_vars, ori_model, ori_vars,
                      save_folder=os.path.join(root, "ours"), mesh=mesh,
                      vsize=vsize, query_points=queries, batch=batch,
                      occ_margin=float(margin))

        fuse_args = Config(args.to_dict())
        fuse_args.PMVO["infer_inner"] = True
        fuse_args.PMVO["optimize"] = False
        run_pmvo(fuse_args, mesh=mesh)
    print(f"[infer_inner] done in {time.monotonic() - t0:.1f}s")


def _load_variables(args: Config, kind: str, model, inputs):
    """Load a checkpoint if configured — a torch .pth (converted on the fly) or
    an orbax tree written by train_mvs.py — else init fresh."""
    import jax
    ckpt = args.get("mvs", {}).get(f"{kind}_model_path")
    if ckpt and os.path.isdir(ckpt):
        from ..checkpoint import load_pytree
        tree = load_pytree(ckpt)
        return {"params": tree["params"], "batch_stats": tree["batch_stats"]}
    if ckpt and os.path.exists(ckpt):
        sd = load_torch_checkpoint(ckpt)
        params, stats = convert_pifu_checkpoint(
            sd, "occ_vit" if kind == "occ" else "vit")
        return {"params": params, "batch_stats": stats}
    if ckpt:
        print(f"[infer_inner] WARNING: {kind}_model_path={ckpt} does not "
              "exist — falling back to RANDOM-INIT weights", flush=True)
    import jax.numpy as jnp
    V, H, W, C = inputs.imgs.shape
    # jitted init: eager flax init dispatches thousands of tiny ops
    return jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((V, H, W, C)),
                               jnp.zeros((8, 3)), jnp.zeros((V, 8, 3)),
                               jnp.zeros((V, 8, 2)))
