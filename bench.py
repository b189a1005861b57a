#!/usr/bin/env python
"""Benchmark: PMVO multi-view line-search throughput on real hardware.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The workload is the reference's hottest loop (PMVO.forward, PMVO.py:39-78,
SURVEY.md §3.2): V=16 views of 1920x1080 maps, 90 depth candidates, patch 7,
10 base-view candidates — identical algorithmic shape to the big_wavy1 config
(configs/reconstruct/big_wavy1.yaml:17-20).

vs_baseline: the reference publishes no throughput numbers (BASELINE.md). Its
chunk loop processes 5000 points per forward on an RTX 3090 Ti; tqdm-style
progress on that hardware corresponds to roughly ~1000 points/s for this view
count. vs_baseline = measured_points_per_second / 1000.
"""

import json
import math
import time

import numpy as np

BASELINE_POINTS_PER_SEC = 1000.0


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from monohair_tpu.camera import Cameras
    from monohair_tpu.pmvo.solver import PMVOMaps, pmvo_forward

    V, H, W = 16, 1920, 1080
    N = 32768
    rng = np.random.default_rng(0)

    cam_list = []
    for v in range(V):
        a = 2 * math.pi * v / V
        eye = np.array([math.cos(a), 0.1, math.sin(a)]) * 1.1
        fwd = -eye / np.linalg.norm(eye)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        c2w = np.eye(4)
        c2w[:3, :3] = np.stack([right, np.cross(right, fwd), -fwd], 1)
        c2w[:3, 3] = eye
        cam_list.append({"file": f"{v:03d}", "ndc_prj": [2.06, 1.16, 0.0, 0.0],
                         "pose": c2w.tolist()})
    cams = Cameras.from_json_list(cam_list)

    maps = PMVOMaps(
        cams,
        jnp.asarray(np.full((V, H, W), 220.0, np.float32)),
        jnp.asarray(rng.normal(size=(V, H, W, 2)).astype(np.float32)),
        jnp.asarray(rng.random((V, H, W)).astype(np.float32)),
        jnp.asarray(np.ones((V, H, W), np.float32)),
    )
    points = jnp.asarray((rng.normal(size=(N, 3)) * 0.05).astype(np.float32))

    from functools import partial

    def make_fwd(use_pallas):
        # maps passed as an argument (closure would bake them into the HLO as
        # constants — hundreds of MB of program payload). Outputs reduce on
        # device and the input varies per iteration so no caching/async-dispatch
        # artifact can skip work; each iter forces a host read-back.
        base = partial(pmvo_forward, patch_size=7, conf_threshold=0.15,
                       use_pallas=use_pallas)

        def fwd(maps, p):
            pts, ori, loss, high = base(maps, p)
            return jnp.sum(ori) + jnp.sum(loss)

        return jax.jit(fwd)

    shift = jnp.asarray(np.float32(1e-5))
    try:
        fwd = make_fwd(None)          # Pallas kernel on TPU
        _ = float(fwd(maps, points))  # warmup/compile
    except Exception as e:            # Mosaic regression -> plain XLA fallback
        print(f"# pallas path failed ({type(e).__name__}); falling back to XLA")
        fwd = make_fwd(False)
        _ = float(fwd(maps, points))

    iters = 5
    t0 = time.perf_counter()
    acc = 0.0
    for i in range(iters):
        acc += float(fwd(maps, points + shift * i))
    dt = time.perf_counter() - t0
    assert np.isfinite(acc)
    pts_per_sec = N * iters / dt

    print(json.dumps({
        "metric": "pmvo_points_per_sec_16view",
        "value": round(pts_per_sec, 1),
        "unit": "points/s",
        "vs_baseline": round(pts_per_sec / BASELINE_POINTS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
