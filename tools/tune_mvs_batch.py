#!/usr/bin/env python
"""Measure stage-3 MVS eval throughput vs query batch size on the chip.

The reference evaluates 8192 queries per batch (vit_standard.txt:40) — a
2080-class VRAM choice. On TPU the per-batch host round trip and kernel
launch overheads amortize with batch, so larger batches can win; this prints
queries/s for a sweep so `infer_inner`'s default can be pinned to data.
"""

import math
import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from monohair_tpu.models.pifu import OccAttn, OriAttn
    from monohair_tpu.mvs.eval import eval_points

    rng = np.random.default_rng(0)
    V, H, W = 16, 720, 1280
    imgs = jnp.asarray(rng.normal(size=(V, H, W, 4)).astype(np.float32))
    w2c = jnp.asarray(np.stack([np.eye(4)] * V).astype(np.float32))
    ndc = jnp.asarray(np.tile([2.06, 1.16, 0.0, 0.0], (V, 1)).astype(np.float32))
    occ_model = OccAttn(num_views=V)
    ori_model = OriAttn(num_views=V)
    dummy = (jnp.zeros((V, 8, 8, 4)), jnp.zeros((8, 3)), jnp.zeros((V, 8, 3)),
             jnp.zeros((V, 8, 2)))
    occ_vars = jax.jit(occ_model.init)(jax.random.PRNGKey(0), *dummy)
    ori_vars = jax.jit(ori_model.init)(jax.random.PRNGKey(1), *dummy)

    feat_fn = jax.jit(lambda m, v, x: m.apply(v, x, method=m.get_feat),
                      static_argnums=0)
    occ_feats = feat_fn(occ_model, occ_vars, imgs)
    ori_feats = feat_fn(ori_model, ori_vars, imgs)

    step = jax.jit(lambda ov, orv, of, orf, w, nd, pts: eval_points(
        occ_model, ov, ori_model, orv, of, orf, w, nd, pts))

    def run(pts):
        p, o, m = step(occ_vars, ori_vars, occ_feats, ori_feats, w2c, ndc, pts)
        return float(jnp.sum(o)) + float(jnp.sum(p)) + float(jnp.sum(m))

    for batch in (8192, 16384, 32768, 65536, 131072):
        pts = jnp.asarray((rng.random((batch, 3)).astype(np.float32) - 0.5) * 0.4)
        run(pts)  # compile
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            run(pts)
        dt = (time.perf_counter() - t0) / iters
        print(f"batch {batch:>7}: {dt * 1e3:8.1f} ms  "
              f"{batch / dt:>12,.0f} queries/s", flush=True)


if __name__ == "__main__":
    main()
