#!/usr/bin/env python
"""Stage 1 entry point: python prepare_data.py --yaml=configs/reconstruct/<case>."""
import sys

from monohair_tpu.pipeline.common import resolve_config
from monohair_tpu.pipeline.prepare_data_stage import run_prepare_data

if __name__ == "__main__":
    run_prepare_data(resolve_config(sys.argv[1:]))
