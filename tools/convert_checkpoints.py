#!/usr/bin/env python
"""Convert torch checkpoints -> flattened-npz Flax trees (torch-only process;
never import this from the JAX pipeline — torch/XLA threadpools deadlock on
single-core hosts, CLAUDE.md).

  python tools/convert_checkpoints.py --net modnet --ckpt modnet.ckpt --out modnet_flax.npz
  python tools/convert_checkpoints.py --net occ --ckpt occ.pth --out occ_flax.npz

nets: modnet / bisenet / fan (segmentation+annotation, public-key rename
hooks applied), occ / ori (DeepMVSHair pifu nets, models/convert.py mapping).
The outputs load via segment.runners.load_flax_tree.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--net", required=True,
                    choices=["modnet", "bisenet", "fan", "occ", "ori"])
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--mirror-keys", action="store_true",
                    help="checkpoint already uses this package's module names "
                         "(e.g. re-exported mirrors); skip public-key renames")
    args = ap.parse_args()

    from monohair_tpu.segment.convert import (
        convert_state_dict, load_torch_checkpoint, rename_public_bisenet,
        rename_public_fan, rename_public_modnet)
    from monohair_tpu.segment.runners import save_flax_tree

    sd = load_torch_checkpoint(args.ckpt)
    if args.net in ("occ", "ori"):
        from monohair_tpu.models.convert import convert_pifu_checkpoint
        params, stats = convert_pifu_checkpoint(
            sd, vit_prefix="occ_vit" if args.net == "occ" else "vit")
    else:
        rename = None if args.mirror_keys else {
            "modnet": rename_public_modnet,
            "bisenet": rename_public_bisenet,
            "fan": rename_public_fan,
        }[args.net]
        params, stats = convert_state_dict(sd, rename=rename)

    save_flax_tree(args.out, {"params": params, "batch_stats": stats})
    n = sum(v.size for v in np.load(args.out).values())
    print(f"wrote {args.out}: {n:,} parameters")


if __name__ == "__main__":
    main()
