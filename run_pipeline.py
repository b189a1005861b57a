#!/usr/bin/env python
"""One-command full reconstruction: all four stages in a single process
(the reference requires four manual python invocations + interactive NGP steps,
readme.md:68-80).

    python run_pipeline.py --yaml=configs/reconstruct/big_wavy1
"""

import sys
import time

from monohair_tpu.log import log
from monohair_tpu.pipeline.common import resolve_config
from monohair_tpu.pipeline.hair_grow_stage import run_hair_grow
from monohair_tpu.pipeline.infer_inner_stage import run_infer_inner
from monohair_tpu.pipeline.pmvo_stage import run_pmvo
from monohair_tpu.pipeline.prepare_data_stage import run_prepare_data

if __name__ == "__main__":
    args = resolve_config(sys.argv[1:])
    t0 = time.monotonic()
    with log.stage("prepare_data"):
        run_prepare_data(args)
    with log.stage("pmvo"):
        run_pmvo(args)
    with log.stage("infer_inner"):
        run_infer_inner(args)
    with log.stage("hair_grow"):
        run_hair_grow(args)
    log.ok(f"full pipeline in {time.monotonic() - t0:.1f}s -> "
           f"{args.output_path}/full/connected_strands.hair")
