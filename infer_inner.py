#!/usr/bin/env python
"""Stage 3 entry point: python infer_inner.py --yaml=configs/reconstruct/<case>."""
import sys

from monohair_tpu.pipeline.common import resolve_config
from monohair_tpu.pipeline.infer_inner_stage import run_infer_inner

if __name__ == "__main__":
    run_infer_inner(resolve_config(sys.argv[1:]))
