#!/usr/bin/env python
"""Bisect the stage0a worker crash (r4): run train_nerf variants in fresh
subprocesses, probing/waiting out the tunnel-recovery window between
experiments. Appends one line per experiment to /tmp/bisect_stage0a.log.

    python tools/bisect_stage0a.py            # run the experiment matrix
    python tools/bisect_stage0a.py --one KEY  # child mode: one experiment
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXPERIMENTS = {
    # key: kwargs for the child. "base" (the bench config: dense 4096x64
    # uniform, scan_block=4, tv=1e-4) CRASHED reproducibly at 8 steps
    # (r4, twice) — these bisect the cause, most informative first.
    "fourier": {"field": "fourier", "steps": 64},  # no gathers/scatters
    "no_tv": {"tv_weight": 0.0},
    "block1": {"scan_block": 1},
    "rays2048": {"rays_per_batch": 2048},
    "levels2": {"levels": (64, 160)},
    "hash": {"field": "hash"},
    "base": {},
}


def child(key: str) -> None:
    import numpy as np
    cfg = dict(steps=8, rays_per_batch=4096, scan_block=4, tv_weight=1e-4,
               field="dense", levels=(64, 160, 256), no_donate=False)
    cfg.update(EXPERIMENTS[key])

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from monohair_tpu.nerf.train import NerfDataset, train_nerf

    F, H, W = 16, 720, 1280
    rng = np.random.default_rng(0)
    imgs = rng.random((F, H, W, 3)).astype(np.float32)
    poses = np.stack([np.eye(4, dtype=np.float32)] * F)
    import math
    for i in range(F):
        a = 2 * math.pi * i / F
        poses[i, :3, 3] = [1.6 * math.cos(a), 0.2, 1.6 * math.sin(a)]
    ds = NerfDataset(imgs, poses, 640.0, 640.0, W / 2, H / 2)

    if cfg["field"] == "dense":
        from monohair_tpu.nerf.dense_grid import (DenseGridConfig,
                                                  DenseGridField)
        field = DenseGridField(cfg=DenseGridConfig(
            resolutions=tuple(cfg["levels"])))
    elif cfg["field"] == "fourier":
        from monohair_tpu.nerf.fourier import FourierField
        field = FourierField()
    else:
        field = None  # NGPField default

    t0 = time.time()
    train_nerf(ds, steps=cfg["steps"], rays_per_batch=cfg["rays_per_batch"],
               field=field, tv_weight=cfg["tv_weight"], use_occupancy=False,
               scan_block=cfg["scan_block"], log_every=1, verbose=True)
    print(f"CHILD_OK {key} {time.time() - t0:.1f}s", flush=True)


def main() -> None:
    from monohair_tpu.platform_limits import wait_for_device
    log_path = "/tmp/bisect_stage0a.log"

    def log(line):
        print(line, flush=True)
        with open(log_path, "a") as f:
            f.write(line + "\n")

    for key in EXPERIMENTS:
        if not wait_for_device(max_wait=1200.0, poll=60.0, log=print):
            log(f"{key}: SKIP (tunnel never recovered)")
            continue
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, __file__, "--one", key],
                capture_output=True, text=True, timeout=1500)
            ok = any(line.startswith("CHILD_OK")
                     for line in r.stdout.splitlines())
            tail = (r.stderr or "").strip().splitlines()[-2:]
            log(f"{key}: {'OK' if ok else 'CRASH'} rc={r.returncode} "
                f"{time.time() - t0:.0f}s {' | '.join(tail)[-300:] if not ok else ''}")
        except subprocess.TimeoutExpired:
            log(f"{key}: TIMEOUT {time.time() - t0:.0f}s")
    log("bisect done")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--one")
    a = ap.parse_args()
    if a.one:
        child(a.one)
    else:
        main()
