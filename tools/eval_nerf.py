#!/usr/bin/env python
"""Evaluate a trained NeRF snapshot: PSNR/SSIM over held-out transforms
(the reference NGP driver's eval path, run.py:212-270).

Usage:
  python tools/eval_nerf.py --snapshot case/colmap/base_snapshot.npz \\
      --transforms case/colmap/transforms.json --images case/colmap/images
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--snapshot", required=True)
    ap.add_argument("--transforms", required=True)
    ap.add_argument("--images", required=True)
    ap.add_argument("--max_frames", type=int, default=8)
    ap.add_argument("--out", default=None, help="optional json report path")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    from monohair_tpu.checkpoint import load_nerf_snapshot
    from monohair_tpu.nerf.ngp import NGPField
    from monohair_tpu.nerf.train import load_nerf_dataset, render_image
    from monohair_tpu.utils.metrics import psnr, ssim

    ds = load_nerf_dataset(args.transforms, args.images, max_images=args.max_frames)
    field = NGPField()
    variables = field.init(jax.random.PRNGKey(0), np.zeros((4, 3)), np.zeros((4, 3)))
    variables = load_nerf_snapshot(args.snapshot, variables)

    H, W = ds.images.shape[1:3]
    rows = []
    for i in range(len(ds.images)):
        rgb, _ = render_image(field, variables, ds.c2w[i], H, W,
                              ds.fx, ds.fy, ds.cx, ds.cy)
        rows.append({"frame": i, "psnr": psnr(rgb, ds.images[i]),
                     "ssim": ssim(rgb, ds.images[i])})
        print(f"frame {i}: PSNR {rows[-1]['psnr']:.2f}  SSIM {rows[-1]['ssim']:.4f}")
    report = {"mean_psnr": float(np.mean([r["psnr"] for r in rows])),
              "mean_ssim": float(np.mean([r["ssim"] for r in rows])),
              "frames": rows}
    print(f"mean PSNR {report['mean_psnr']:.2f}  mean SSIM {report['mean_ssim']:.4f}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
