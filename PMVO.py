#!/usr/bin/env python
"""Stage 2 entry point: python PMVO.py --yaml=configs/reconstruct/<case>
(same CLI contract as the reference's PMVO.py)."""
import sys

from monohair_tpu.pipeline.common import resolve_config
from monohair_tpu.pipeline.pmvo_stage import run_pmvo

if __name__ == "__main__":
    run_pmvo(resolve_config(sys.argv[1:]))
