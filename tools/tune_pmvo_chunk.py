#!/usr/bin/env python
"""PMVO forward: throughput vs chunk size + per-phase breakdown on the chip.

The bench runs 32k-point chunks (bench.py stage2); this prints pts/s for a
chunk sweep and times the pieces of one `evaluate` (sample candidates /
reproject / patch loss) so the next optimization targets the measured hog.
"""

import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, iters=3):
    import jax
    import jax.numpy as jnp

    def reduced(*a):
        leaves = jax.tree_util.tree_leaves(fn(*a))
        return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)

    red = jax.jit(reduced)
    acc = float(red(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        acc += float(red(*args))
    assert np.isfinite(acc)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from monohair_tpu.pmvo.solver import (PMVOMaps, depth_sample_offsets,
                                          find_base_views, observe_points,
                                          pmvo_forward, reproject_directions,
                                          sample_candidate_positions)
    sys.path.pop(0)
    from bench import ring_cameras

    rng = np.random.default_rng(0)
    V, H, W = 16, 1920, 1080
    cams = ring_cameras(V, H, W)
    maps = PMVOMaps(cams,
                    jnp.asarray(np.full((V, H, W), 220.0, np.float32)),
                    jnp.asarray(rng.normal(size=(V, H, W, 2)).astype(np.float32)),
                    jnp.asarray(rng.random((V, H, W)).astype(np.float32)),
                    jnp.asarray(np.ones((V, H, W), np.float32)))

    for chunk in (16384, 32768, 65536):
        pts = jnp.asarray((rng.normal(size=(chunk, 3)) * 0.05).astype(np.float32))
        try:
            t = timed(lambda m, p: pmvo_forward(m, p, patch_size=7,
                                                conf_threshold=0.15), maps, pts)
            print(f"chunk {chunk:>6}: {t * 1e3:7.1f} ms  {chunk / t:>10,.0f} pts/s",
                  flush=True)
        except Exception as e:
            print(f"chunk {chunk:>6}: failed ({type(e).__name__})", flush=True)

    # phase breakdown at the bench chunk
    chunk = 32768
    pts = jnp.asarray((rng.normal(size=(chunk, 3)) * 0.05).astype(np.float32))
    obs = jax.jit(lambda m, p: observe_points(m, p, 7))(maps, pts)
    t = timed(lambda m, p: observe_points(m, p, 7), maps, pts)
    print(f"observe_points:        {t * 1e3:7.1f} ms", flush=True)
    t = timed(lambda v, c: find_base_views(v, c), obs["visible"], obs["conf"])
    print(f"find_base_views:       {t * 1e3:7.1f} ms", flush=True)
    offsets = jnp.asarray(depth_sample_offsets(90))
    base = jnp.zeros((chunk,), jnp.int32)
    t = timed(lambda m, p, b, o: sample_candidate_positions(m, p, b, offsets, o),
              maps, pts, base, obs["ori"])
    print(f"sample_candidates x1:  {t * 1e3:7.1f} ms (x10 in forward)", flush=True)
    samples, _ = jax.jit(lambda m, p, b, o: sample_candidate_positions(
        m, p, b, offsets, o))(maps, pts, base, obs["ori"])
    t = timed(lambda m, p, s: reproject_directions(m, p, s), maps, pts, samples)
    print(f"reproject x1:          {t * 1e3:7.1f} ms (x10 in forward)", flush=True)


if __name__ == "__main__":
    main()
