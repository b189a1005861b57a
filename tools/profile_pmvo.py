#!/usr/bin/env python
"""Break down PMVO forward time on the real chip: observation gathers vs
candidate loop vs patch loss (Pallas vs XLA). Guides kernel work."""

import math
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, iters=5):
    """block_until_ready does not synchronize on the axon tunnel; force a host
    read of a device-side reduction instead."""
    import jax
    import jax.numpy as jnp

    def reduced(*a):
        out = fn(*a)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)

    red = jax.jit(reduced)
    float(red(*args))  # warmup
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(iters):
        acc += float(red(*args))
    assert np.isfinite(acc)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp
    from monohair_tpu.camera import Cameras
    from monohair_tpu.ops.pallas_kernels import (patch_min_loss_fused,
                                                 patch_min_loss_reference)
    from monohair_tpu.pmvo.solver import (PMVOMaps, observe_points, pmvo_forward,
                                          reproject_directions)

    V, H, W, N, S, P = 16, 1920, 1080, 32768, 90, 49
    rng = np.random.default_rng(0)
    cam_list = []
    for v in range(V):
        a = 2 * math.pi * v / V
        eye = np.array([math.cos(a), 0.1, math.sin(a)]) * 1.1
        fwd = -eye / np.linalg.norm(eye)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(fwd, up) / np.linalg.norm(np.cross(fwd, up))
        c2w = np.eye(4)
        c2w[:3, :3] = np.stack([right, np.cross(right, fwd), -fwd], 1)
        c2w[:3, 3] = eye
        cam_list.append({"file": f"{v:03d}", "ndc_prj": [2.06, 1.16, 0, 0],
                         "pose": c2w.tolist()})
    cams = Cameras.from_json_list(cam_list)
    maps = PMVOMaps(cams,
                    jnp.asarray(np.full((V, H, W), 220.0, np.float32)),
                    jnp.asarray(rng.normal(size=(V, H, W, 2)).astype(np.float32)),
                    jnp.asarray(rng.random((V, H, W)).astype(np.float32)),
                    jnp.asarray(np.ones((V, H, W), np.float32)))
    points = jnp.asarray((rng.normal(size=(N, 3)) * 0.05).astype(np.float32))

    for up, tag in ((None, "dma"), (False, "xla")):
        obs_t = jax.jit(lambda m, p, _up=up: observe_points(m, p, 7, _up))
        t_obs = timed(obs_t, maps, points)
        print(f"observe_points [{tag}]:   {t_obs*1e3:.1f} ms", flush=True)
    obs_fn = jax.jit(lambda m, p: observe_points(m, p, 7))

    obs = obs_fn(maps, points)
    samples = jnp.asarray(rng.normal(size=(N, S, 3)).astype(np.float32) * 0.05)
    rp = jax.jit(lambda m, p, s: reproject_directions(m, p, s))
    t_rp = timed(rp, maps, points, samples)
    print(f"reproject_directions:      {t_rp*1e3:.1f} ms (x10 candidates)", flush=True)

    prj = rp(maps, points, samples)
    for name, fn in (("pallas", patch_min_loss_fused),
                     ("xla", patch_min_loss_reference)):
        f = jax.jit(lambda pr, op, cp, vis: fn(pr, op, cp, vis, 0.15))
        t = timed(f, prj, obs["ori_patch"], obs["conf_patch"], obs["visible"])
        print(f"patch loss [{name}]:        {t*1e3:.1f} ms (x10 candidates)",
              flush=True)

    for up in (None, False):
        fw = jax.jit(partial(pmvo_forward, patch_size=7, conf_threshold=0.15,
                             use_pallas=up))
        t = timed(fw, maps, points, iters=3)
        print(f"full forward [pallas={up}]: {t*1e3:.1f} ms "
              f"({N/t:,.0f} pts/s)")


if __name__ == "__main__":
    main()
