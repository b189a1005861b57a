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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default="bigsynth")
    ap.add_argument("--ngp-steps", type=int, default=1500)
    ap.add_argument("--fit-iters", type=int, default=500)
    ap.add_argument("--out", default="E2E_FULL.json")
    args_cli = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from monohair_tpu.pipeline.common import resolve_config
    args = resolve_config([
        f"--yaml=configs/reconstruct/{args_cli.case}",
        f"--ngp.train_steps={args_cli.ngp_steps}",
        f"--optimize.iter={args_cli.fit_iters}",
    ])

    stages = {}
    t_all = time.time()

    from monohair_tpu.pipeline.prepare_data_stage import run_prepare_data
    t0 = time.time()
    run_prepare_data(args)
    stages["prepare_data"] = round(time.time() - t0, 1)
    print(f"== prepare_data {stages['prepare_data']}s", flush=True)

    from monohair_tpu.pipeline.pmvo_stage import run_pmvo
    t0 = time.time()
    run_pmvo(args)
    stages["pmvo"] = round(time.time() - t0, 1)
    print(f"== pmvo {stages['pmvo']}s", flush=True)

    from monohair_tpu.pipeline.infer_inner_stage import run_infer_inner
    t0 = time.time()
    run_infer_inner(args)
    stages["infer_inner"] = round(time.time() - t0, 1)
    print(f"== infer_inner {stages['infer_inner']}s", flush=True)

    from monohair_tpu.pipeline.hair_grow_stage import run_hair_grow
    t0 = time.time()
    run_hair_grow(args)
    stages["hair_grow"] = round(time.time() - t0, 1)
    print(f"== hair_grow {stages['hair_grow']}s", flush=True)

    total = round(time.time() - t_all, 1)
    out_hair = os.path.join(args.output_path, "full/connected_strands.hair")
    result = {
        "metric": "e2e_full_seconds",
        "total_seconds": total,
        "stages": stages,
        "budgets": {"ngp_steps": args_cli.ngp_steps,
                    "fit_iters": args_cli.fit_iters,
                    "views": 16, "image_size": list(args.data.image_size)},
        "output": out_hair,
        "output_exists": os.path.exists(out_hair),
    }
    with open(args_cli.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
