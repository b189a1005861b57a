#!/usr/bin/env python
"""Finer bisect: stages in increasing risk order, one process — the last OK
print before the crash identifies the faulting op.

  1. encode fwd        1.05M pts
  2. encode fwd+bwd    524k pts   (known-good reference)
  3. encode fwd+bwd    1.05M pts  <- scatter-add size suspect
  4. density fwd+bwd   1.05M pts  (adds sigma MLP)
  5. render fwd        8192x128
  6. render fwd+bwd    8192x64    (0.5M render points)
  7. render fwd+bwd    8192x128   (the known crasher)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp
    from monohair_tpu.nerf.dense_grid import (DenseGridConfig, DenseGridField,
                                              grid_encode)
    from monohair_tpu.nerf.ngp import render_rays

    rng = np.random.default_rng(0)
    dcfg = DenseGridConfig()
    grids = [jnp.asarray(rng.normal(size=(r, r, r * dcfg.features_per_level))
                         .astype(np.float32) * 1e-2) for r in dcfg.resolutions]
    field = DenseGridField()
    variables = field.init(jax.random.PRNGKey(0), jnp.zeros((8, 3)),
                           jnp.zeros((8, 3)))

    def pts(n):
        return jnp.asarray(rng.random((n, 3)).astype(np.float32))

    def ok(name, fn, *args):
        t0 = time.time()
        out = fn(*args)
        s = float(sum(jnp.sum(x.astype(jnp.float32))
                      for x in jax.tree_util.tree_leaves(out)))
        print(f"OK {name}: sum={s:.4g} in {time.time() - t0:.1f}s", flush=True)

    enc_f = jax.jit(lambda g, p: grid_encode(g, p, dcfg))
    enc_b = jax.jit(jax.grad(lambda g, p: jnp.sum(grid_encode(g, p, dcfg) ** 2)))
    ok("encode fwd 1.05M", enc_f, grids, pts(8192 * 128))
    ok("encode bwd 524k", enc_b, grids, pts(8192 * 64))
    ok("encode bwd 1.05M", enc_b, grids, pts(8192 * 128))

    dens_b = jax.jit(jax.grad(
        lambda v, p: jnp.sum(field.apply(v, p, method=field.density)[0])))
    ok("density bwd 1.05M", dens_b, variables, pts(8192 * 128))

    B = 8192
    o = np.tile([0.0, 0.2, 1.6], (B, 1)).astype(np.float32)
    d = rng.normal(size=(B, 3)).astype(np.float32)
    d[:, 2] -= 2.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o_j, d_j = jnp.asarray(o), jnp.asarray(d)
    key = jax.random.PRNGKey(1)

    rend_f = jax.jit(lambda v, o, d, k: render_rays(field, v, o, d, 128, k)[0])
    ok("render fwd 8192x128", rend_f, variables, o_j, d_j, key)
    g64 = jax.jit(jax.grad(
        lambda v, o, d, k: jnp.sum(render_rays(field, v, o, d, 64, k)[0])))
    ok("render bwd 8192x64", g64, variables, o_j, d_j, key)
    g128 = jax.jit(jax.grad(
        lambda v, o, d, k: jnp.sum(render_rays(field, v, o, d, 128, k)[0])))
    ok("render bwd 8192x128", g128, variables, o_j, d_j, key)


if __name__ == "__main__":
    main()
