#!/usr/bin/env python
"""Break down the Gabor stage's on-chip time (ops/gabor.py).

Times, per 1920x1080 frame: the full orientation_maps path, the DoG
preprocess, the banded gabor_orientation, and isolated pieces of one band
(patch extraction / matmul / per-pixel stats) — so optimization goes after
the measured hog rather than the assumed one.
"""

import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, iters=5):
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
    from monohair_tpu.ops.gabor import (difference_of_gaussians, gabor_bank,
                                        gabor_orientation, orientation_maps)

    rng = np.random.default_rng(0)
    H, W = 1920, 1080
    img = jnp.asarray(rng.random((H, W)).astype(np.float32))

    t = timed(orientation_maps, img, iters=3)
    print(f"orientation_maps (full):      {t * 1e3:8.1f} ms/frame", flush=True)
    t = timed(difference_of_gaussians, img, iters=3)
    print(f"difference_of_gaussians:      {t * 1e3:8.1f} ms/frame", flush=True)
    t = timed(lambda x: gabor_orientation(x), img, iters=3)
    print(f"gabor_orientation (banded):   {t * 1e3:8.1f} ms/frame", flush=True)

    # one band in isolation
    k, O, band = 17, 180, 128
    bank = jnp.asarray(gabor_bank(k, O))
    mat = bank[:, 0].reshape(O, -1).T  # (289, O)
    sl = jnp.asarray(rng.random((band + 16, W + 16)).astype(np.float32))

    def patches_of(sl):
        return jax.lax.conv_general_dilated_patches(sl[None, None], (k, k),
                                                    (1, 1), "VALID")[0]

    t = timed(patches_of, sl)
    print(f"  patch extraction (1 band):  {t * 1e3:8.1f} ms  (x15 bands)", flush=True)
    p = patches_of(sl)  # (289, band, W)

    def mm_T(p, mat):
        q = p.reshape(k * k, band * W).T
        return jnp.abs(jnp.dot(q, mat, precision="high",
                               preferred_element_type=jnp.float32))

    def mm_dg(p, mat):
        q = p.reshape(k * k, band * W)
        return jnp.abs(jax.lax.dot_general(
            q, mat, (((0,), (0,)), ((), ())), precision="high",
            preferred_element_type=jnp.float32))

    t = timed(mm_T, p, mat)
    print(f"  transpose+matmul (1 band):  {t * 1e3:8.1f} ms", flush=True)
    t = timed(mm_dg, p, mat)
    print(f"  dot_general     (1 band):   {t * 1e3:8.1f} ms", flush=True)
    for prec in ("default", "high", "highest"):
        def mm_p(p, mat, prec=prec):
            q = p.reshape(k * k, band * W)
            return jnp.abs(jax.lax.dot_general(
                q, mat, (((0,), (0,)), ((), ())),
                precision=None if prec == "default" else prec,
                preferred_element_type=jnp.float32))
        t = timed(mm_p, p, mat)
        print(f"  dot_general {prec:>8}:      {t * 1e3:8.1f} ms", flush=True)

    r = mm_dg(p, mat)  # (band*W, O)
    orients = jnp.arange(O, dtype=jnp.float32) * (np.pi / O)

    def stats(r):
        max_resp = jnp.max(r, -1)
        best = jnp.argmax(r, -1).astype(jnp.float32) * (np.pi / O)
        diff = jnp.abs(best[:, None] - orients[None, :])
        diff = jnp.minimum(diff, np.pi - diff)
        rd = r - max_resp[:, None]
        return best, jnp.sum(diff * rd * rd, -1)

    t = timed(stats, r)
    print(f"  per-pixel stats (1 band):   {t * 1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
