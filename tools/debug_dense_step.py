#!/usr/bin/env python
"""Bisect the axon-worker fault in the dense-grid NeRF train step.

The bare field step (encode+MLP+adam at 524k pts, tune_grid_encode.py) runs;
train_nerf's first block faults the worker. Deltas: full render path (1.05M
warmup points), remat, TV loss, lax.scan+donation, capture-image gather.
Run stages one at a time: python tools/debug_dense_step.py <stage>
  render      render_rays fwd only, 8192x128
  grad        render_rays fwd+bwd
  remat       + jax.checkpoint
  tv          + grid TV loss
  adam        + optimizer update (full step, no scan)
  scan        the adam step inside lax.scan length 1 with donation
  gather      + the (3,F,HW) u8 target gather at top level
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main(stage: str):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp
    import optax
    from monohair_tpu.nerf.dense_grid import DenseGridField, grid_tv_loss
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

    def render(v, o, d, k, use_remat):
        def r(v, o, d, k):
            return render_rays(field, v, o, d, 128, k)[0]
        if use_remat:
            r = jax.checkpoint(r)
        return r(v, o, d, k)

    def loss(v, o, d, t, k, use_remat=False, use_tv=False):
        rgb = render(v, o, d, k, use_remat)
        l = jnp.mean(optax.huber_loss(rgb, t, delta=0.1))
        if use_tv:
            l = l + 1e-4 * field.apply(v, method=field.tv)
        return l

    t0 = time.time()
    if stage == "render":
        f = jax.jit(lambda v, o, d, k: render(v, o, d, k, False))
        out = f(variables, o_j, d_j, key)
        print("sum:", float(jnp.sum(out)))
    elif stage in ("grad", "remat", "tv"):
        f = jax.jit(jax.grad(lambda v, o, d, t, k: loss(
            v, o, d, t, k, use_remat=stage in ("remat", "tv"),
            use_tv=stage == "tv")))
        g = f(variables, o_j, d_j, target, key)
        print("gradnorm:", float(optax.global_norm(g)))
    elif stage in ("adam", "scan", "gather"):
        tx = optax.chain(optax.clip_by_global_norm(10.0), optax.adam(1e-2))
        opt_state = tx.init(variables)
        if stage == "adam":
            @jax.jit
            def step(v, s, o, d, t, k):
                l, g = jax.value_and_grad(lambda v: loss(
                    v, o, d, t, k, use_remat=True, use_tv=True))(v)
                up, s = tx.update(g, s, v)
                return optax.apply_updates(v, up), s, l
            v, s, l = step(variables, opt_state, o_j, d_j, target, key)
            print("loss:", float(l))
        else:
            F, H, W = 16, 720, 1280
            imgs = jnp.asarray(rng.integers(0, 255, (3, F, H * W))
                               .astype(np.uint8))

            @__import__("functools").partial(jax.jit, donate_argnums=(0, 1))
            def block(v, s, imgs, key):
                k_f, k_p, k_r = jax.random.split(key, 3)
                if stage == "gather":
                    fi = jax.random.randint(k_f, (1, B), 0, F)
                    pi = jax.random.randint(k_p, (1, B), 0, H * W)
                    tgt = jnp.moveaxis(imgs[:, fi, pi], 0, -1
                                       ).astype(jnp.float32) / 255.0
                else:
                    tgt = jnp.broadcast_to(target, (1, B, 3))

                def body(carry, xs):
                    v, s = carry
                    o, d, t, k = xs
                    l, g = jax.value_and_grad(lambda v: loss(
                        v, o, d, t, k, use_remat=True, use_tv=True))(v)
                    up, s = tx.update(g, s, v)
                    return (optax.apply_updates(v, up), s), l

                (v, s), ls = jax.lax.scan(
                    body, (v, s),
                    (o_j[None], d_j[None], tgt, jax.random.split(k_r, 1)))
                return v, s, ls
            v, s, ls = block(variables, opt_state, imgs, key)
            print("loss:", float(ls[-1]))
    else:
        raise SystemExit(f"unknown stage {stage}")
    print(f"stage {stage}: OK in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main(sys.argv[1])
