#!/usr/bin/env python
"""A/B the NeRF field encodes on the chip: hash (ngp.hash_encode, 112 gather
rows/point) vs dense z-packed grid (dense_grid.grid_encode, 3 offsets/point).

Measures fwd and fwd+bwd (value_and_grad through a scalar loss) at the
capture-scale point count (8192 rays x 64 samples = 524 288 points), plus the
full train-step cost of each field. Run: python tools/tune_grid_encode.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, reps=5):
    """Device timing over the axon tunnel: reduce outputs on device and read
    one scalar back every rep (block_until_ready does NOT synchronize the
    tunnel — bench.py:52-68 pattern)."""
    import jax
    import jax.numpy as jnp

    def reduced(*a):
        leaves = jax.tree_util.tree_leaves(fn(*a))
        return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)

    red = jax.jit(reduced)
    acc = float(red(*args))  # warmup/compile
    t0 = time.time()
    for _ in range(reps):
        acc += float(red(*args))
    assert np.isfinite(acc) or True
    return (time.time() - t0) / reps


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp
    from monohair_tpu.nerf.dense_grid import (DenseGridConfig, DenseGridField,
                                              grid_encode)
    from monohair_tpu.nerf.ngp import HashGridConfig, NGPField, hash_encode

    N = 8192 * 64
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.random((N, 3)).astype(np.float32))
    dirs_np = rng.normal(size=(N, 3)).astype(np.float32)
    dirs = jnp.asarray(dirs_np / np.linalg.norm(dirs_np, axis=-1, keepdims=True))

    hcfg = HashGridConfig(num_levels=12, log2_table_size=18,
                          finest_resolution=512)
    table = jnp.asarray(rng.normal(size=(
        hcfg.num_levels, hcfg.features_per_level,
        2 ** hcfg.log2_table_size)).astype(np.float32) * 1e-2)

    dcfg = DenseGridConfig()
    grids = [jnp.asarray(rng.normal(size=(r, r, r * dcfg.features_per_level))
                         .astype(np.float32) * 1e-2) for r in dcfg.resolutions]

    h_fwd = jax.jit(lambda t, p: hash_encode(t, p, hcfg))
    d_fwd = jax.jit(lambda g, p: grid_encode(g, p, dcfg))
    h_bwd = jax.jit(jax.grad(lambda t, p: jnp.sum(hash_encode(t, p, hcfg) ** 2)))
    d_bwd = jax.jit(jax.grad(lambda g, p: jnp.sum(grid_encode(g, p, dcfg) ** 2)))

    print(f"points: {N}", flush=True)
    print(f"hash  fwd     : {timeit(h_fwd, table, pts)*1e3:8.1f} ms", flush=True)
    print(f"dense fwd     : {timeit(d_fwd, grids, pts)*1e3:8.1f} ms", flush=True)
    print(f"hash  fwd+bwd : {timeit(h_bwd, table, pts)*1e3:8.1f} ms", flush=True)
    print(f"dense fwd+bwd : {timeit(d_bwd, grids, pts)*1e3:8.1f} ms", flush=True)

    # full field train-step cost (encode + MLPs + adam), 8192x64 points
    import optax
    for name, field in (("hash", NGPField(cfg=hcfg)),
                        ("dense", DenseGridField(cfg=dcfg))):
        variables = field.init(jax.random.PRNGKey(0), jnp.zeros((8, 3)),
                               jnp.zeros((8, 3)))
        tx = optax.adam(1e-2)
        opt_state = tx.init(variables)

        def loss_fn(v, p, d):
            sigma, rgb = field.apply(v, p, d)
            return jnp.mean(sigma) + jnp.mean(rgb)

        @jax.jit
        def step(v, s, p, d):
            g = jax.grad(loss_fn)(v, p, d)
            up, s = tx.update(g, s, v)
            return optax.apply_updates(v, up), s

        t = timeit(lambda v, s: step(v, s, pts, dirs), variables, opt_state)
        print(f"{name:5s} field step (524k pts): {t*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
