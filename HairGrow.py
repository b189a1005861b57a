#!/usr/bin/env python
"""Stage 4 entry point: python HairGrow.py --yaml=configs/reconstruct/<case>."""
import sys

from monohair_tpu.pipeline.common import resolve_config
from monohair_tpu.pipeline.hair_grow_stage import run_hair_grow

if __name__ == "__main__":
    run_hair_grow(resolve_config(sys.argv[1:]))
