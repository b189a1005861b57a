"""Pallas fused patch-loss kernel vs the plain-XLA reference (interpret mode on
CPU; the compiled path runs on TPU via bench.py)."""

import jax.numpy as jnp
import numpy as np

from monohair_tpu.ops.pallas_kernels import (patch_min_loss_fused,
                                             patch_min_loss_reference)


def test_fused_matches_reference(rng):
    V, N, S, P = 4, 10, 24, 9
    prj = jnp.asarray(rng.normal(size=(V, N, S, 2)).astype(np.float32))
    ori = jnp.asarray(rng.normal(size=(V, N, P, 2)).astype(np.float32))
    conf = jnp.asarray(rng.random((V, N, P)).astype(np.float32))
    vis = jnp.asarray(np.where(rng.random((V, N)) > 0.3, 1.0, -1.0).astype(np.float32))
    thr = 0.4
    num_r, den_r, cnt_r = patch_min_loss_reference(prj, ori, conf, vis, thr)
    num_f, den_f, cnt_f = patch_min_loss_fused(prj, ori, conf, vis, thr,
                                               interpret=True)
    np.testing.assert_allclose(np.asarray(num_f), np.asarray(num_r),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(den_f), np.asarray(den_r),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(cnt_f), np.asarray(cnt_r))
