#!/usr/bin/env python
"""Bisect round 2 (encode now chunked at 262k pts): climb the train-block
ladder until the worker faults; the last OK print names the safe boundary."""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp
    import optax
    from monohair_tpu.nerf.dense_grid import DenseGridField
    from monohair_tpu.nerf.ngp import render_rays

    rng = np.random.default_rng(0)
    field = DenseGridField()
    variables = field.init(jax.random.PRNGKey(0), jnp.zeros((8, 3)),
                           jnp.zeros((8, 3)))
    B = 8192
    o = np.tile([0.0, 0.2, 1.6], (B, 1)).astype(np.float32)
    d = rng.normal(size=(B, 3)).astype(np.float32)
    d[:, 2] -= 2.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o_j, d_j = jnp.asarray(o), jnp.asarray(d)
    target = jnp.asarray(rng.random((B, 3)).astype(np.float32))
    key = jax.random.PRNGKey(1)

    def ok(name, fn, *args):
        t0 = time.time()
        out = fn(*args)
        s = float(sum(jnp.sum(x.astype(jnp.float32))
                      for x in jax.tree_util.tree_leaves(out)))
        print(f"OK {name}: sum={s:.4g} in {time.time() - t0:.1f}s", flush=True)

    def loss(v, o, d, t, k, ns, use_remat=False, use_tv=False):
        def render(v, o, d, k):
            return render_rays(field, v, o, d, ns, k)[0]
        if use_remat:
            render = jax.checkpoint(render)
        rgb = render(v, o, d, k)
        l = jnp.mean(optax.huber_loss(rgb, t, delta=0.1))
        if use_tv:
            l = l + 1e-4 * field.apply(v, method=field.tv)
        return l

    g64 = jax.jit(jax.grad(lambda v: loss(v, o_j, d_j, target, key, 64)))
    ok("grad 8192x64", g64, variables)
    gt_ = jax.jit(jax.grad(lambda v: loss(v, o_j, d_j, target, key, 64, False,
                                          True)))
    ok("tv 8192x64 (no remat)", gt_, variables)

    tx = optax.chain(optax.clip_by_global_norm(10.0), optax.adam(1e-2))
    opt_state = tx.init(variables)

    @jax.jit
    def astep(v, s):
        l, g = jax.value_and_grad(lambda v: loss(v, o_j, d_j, target, key, 64,
                                                 False, True))(v)
        up, s = tx.update(g, s, v)
        return optax.apply_updates(v, up), s, l
    ok("adam step", astep, variables, opt_state)

    F, H, W = 16, 720, 1280
    imgs = jnp.asarray(rng.integers(0, 255, (3, F, H * W)).astype(np.uint8))

    @partial(jax.jit, donate_argnums=(0, 1))
    def block(v, s, imgs, key):
        k_f, k_p, k_r = jax.random.split(key, 3)
        fi = jax.random.randint(k_f, (1, B), 0, F)
        pi = jax.random.randint(k_p, (1, B), 0, H * W)
        tgt = jnp.moveaxis(imgs[:, fi, pi], 0, -1).astype(jnp.float32) / 255.0

        def body(carry, xs):
            v, s = carry
            ox, dx, t, k = xs
            l, g = jax.value_and_grad(lambda v: loss(v, ox, dx, t, k, 64,
                                                     False, True))(v)
            up, s = tx.update(g, s, v)
            return (optax.apply_updates(v, up), s), l
        (v, s), ls = jax.lax.scan(body, (v, s),
                                  (o_j[None], d_j[None], tgt,
                                   jax.random.split(k_r, 1)))
        return v, s, ls
    ok("scan+donate+gather", block, variables, opt_state, imgs, key)


if __name__ == "__main__":
    main()
