"""Batched strand tracing + smoothing tests on synthetic fields."""

import jax.numpy as jnp
import numpy as np
from scipy.sparse import coo_matrix
from scipy.sparse.linalg import spsolve

from monohair_tpu.strands.smooth import smooth_strand_list, smooth_strands_padded
from monohair_tpu.strands.trace import (generate_guide_and_segments, generate_segments,
                                        strands_to_list, trace_bidirectional,
                                        trace_from_scalp, update_flag)


def reference_smooth(strand, lap_constraint=2.0, pos_constraint=1.0):
    """Numpy/scipy transcription of smnooth_strand (Utils/Utils.py:1148-1188)."""
    n = strand.shape[0]
    num_value = n * 3 - 2 + n
    i = np.zeros(num_value, np.int32)
    j = np.zeros(num_value, np.int32)
    v = np.zeros(num_value)
    i[0], i[1], i[2 + (n - 2) * 3], i[2 + (n - 2) * 3 + 1] = 0, 0, n - 1, n - 1
    i[2:n * 3 - 4] = np.repeat(np.arange(1, n - 1), 3)
    i[n * 3 - 2:] = np.arange(n) + n
    j[0], j[1], j[2 + (n - 2) * 3], j[2 + (n - 2) * 3 + 1] = 0, 1, n - 2, n - 1
    j[2:n * 3 - 4] = (np.repeat(np.arange(1, n - 1), 3)
                      + np.repeat(np.array([-1, 0, 1], np.int32), n - 2)
                      .reshape(n - 2, 3, order="F").ravel())
    j[n * 3 - 2:] = np.arange(n)
    v[0], v[1], v[2 + (n - 2) * 3], v[2 + (n - 2) * 3 + 1] = 1, -1, -1, 1
    v[2:n * 3 - 4] = np.repeat(np.array([-1, 2, -1]), n - 2).reshape(n - 2, 3, order="F").ravel()
    v = v * lap_constraint
    v[n * 3 - 2:] = pos_constraint
    A = coo_matrix((v, (i, j)), shape=(n * 2, n))
    AtA = (A.T @ A).tocsc()
    out = strand.copy()
    for ax in range(3):
        b = np.zeros(n * 2)
        b[n:] = strand[:, ax] * pos_constraint
        out[:, ax] = spsolve(AtA, A.T @ b)[:n]
    return out


def test_smooth_matches_reference(rng):
    strands = [rng.normal(size=(n, 3)).astype(np.float64).cumsum(0)
               for n in (5, 12, 31)]
    ours = smooth_strand_list([s.astype(np.float32) for s in strands],
                              4.0, 2.0, bucket=32)
    for s, o in zip(strands, ours):
        ref = reference_smooth(s, 4.0, 2.0)
        np.testing.assert_allclose(o, ref, rtol=2e-3, atol=2e-4)


def test_smooth_padded_mask():
    """Padding must not leak into the valid region."""
    s = np.zeros((1, 16, 3), np.float32)
    s[0, :8, 0] = np.arange(8)
    s[0, 8:] = 777.0  # garbage padding
    out = np.asarray(smooth_strands_padded(jnp.asarray(s), jnp.asarray([8])))
    assert np.all(np.isfinite(out))
    # result must equal smoothing the strand without any padding present
    alone = np.asarray(smooth_strands_padded(jnp.asarray(s[:, :8]), jnp.asarray([8])))
    np.testing.assert_allclose(out[0, :8], alone[0], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out[0, 8:], 777.0)


def straight_field(extent=(32, 8, 8), occ_range=(4, 28)):
    """Occ slab with the field pointing along +x."""
    occ = np.zeros(extent, np.float32)
    occ[occ_range[0]:occ_range[1], 2:6, 2:6] = 1
    ori = np.zeros((*extent, 3), np.float32)
    ori[..., 0] = 1.0
    ori *= occ[..., None]  # the field is zero outside occupied voxels
    return occ, ori


def test_trace_straight_line():
    occ, ori = straight_field()
    seeds = np.array([[16, 3, 3], [5, 4, 4]])
    noise = np.zeros((2, 3), np.float32)
    res = trace_bidirectional(jnp.asarray(occ), jnp.asarray(ori),
                              jnp.asarray(seeds), jnp.asarray(noise), 0.8)
    strands = strands_to_list(res)
    assert len(strands) == 2
    for s, seed in zip(strands, seeds):
        # strand should span the occupied x range, stepping 1 voxel at a time
        assert s.shape[0] >= 20
        np.testing.assert_allclose(np.diff(s[:, 0]), 1.0, atol=1e-5)
        np.testing.assert_allclose(s[:, 1], s[0, 1], atol=1e-5)
        # covers from the occupancy lower bound to the upper bound
        assert s[0, 0] <= 5.6 and s[-1, 0] >= 26.4


def test_trace_stops_at_sharp_turn():
    occ, ori = straight_field()
    ori[20:, ..., 0] = 0.0
    ori[20:, ..., 1] = 1.0  # 90 degree turn at x=20
    seeds = np.array([[10, 3, 3]])
    res = trace_bidirectional(jnp.asarray(occ), jnp.asarray(ori), jnp.asarray(seeds),
                              jnp.zeros((1, 3), jnp.float32), 0.8)
    s = strands_to_list(res)[0]
    assert s[:, 0].max() <= 21.0  # cannot continue past the turn


def test_trace_respects_flag_and_sweeps():
    occ, ori = straight_field()
    strands = generate_segments(occ, ori, thr_dot=0.8, sweeps=3, chunk=64, seed=0)
    assert len(strands) > 0
    # flag suppression between chunks: later chunks/sweeps are mostly skipped,
    # so the count stays far below 3 sweeps * num occupied voxels
    assert len(strands) < occ.sum()
    flag = update_flag(jnp.zeros_like(jnp.asarray(occ)),
                       trace_bidirectional(jnp.asarray(occ), jnp.asarray(ori),
                                           jnp.asarray(np.array([[16, 3, 3]])),
                                           jnp.zeros((1, 3), jnp.float32), 0.8))
    assert float(jnp.max(flag)) >= 1


def test_trace_from_scalp_reaches_field():
    occ, ori = straight_field(occ_range=(10, 28))
    # scalp sits below the slab in y; normals point toward +y (voxel down = +y)
    seeds = np.array([[16.0, 1.0, 3.0], [20.0, 1.0, 4.0]], np.float32)
    normals = np.array([[0.0, 1.0, 0.0], [0.0, 1.0, 0.0]], np.float32)
    res = trace_from_scalp(jnp.asarray(occ), jnp.asarray(ori), jnp.asarray(seeds),
                           jnp.asarray(normals), 0.8)
    strands = strands_to_list(res)
    assert len(strands) == 2
    for s in strands:
        assert s.shape[0] > 5
        # first steps move along +y through the empty shell, then follow +x
        assert s[-1, 0] > s[0, 0] + 3

    # seeds far from any field never escape the inner phase -> invalid
    far = np.array([[2.0, 7.0, 7.0]], np.float32)
    res2 = trace_from_scalp(jnp.asarray(occ), jnp.asarray(ori), jnp.asarray(far),
                            jnp.asarray(normals[:1]), 0.8)
    assert not bool(np.asarray(res2.valid)[0])


def test_generate_guide_and_segments():
    occ, ori = straight_field(occ_range=(10, 28))
    scalp_pts = np.stack([np.linspace(12, 26, 8),
                          np.full(8, 1.0), np.full(8, 3.0)], -1).astype(np.float32)
    scalp_n = np.tile([0.0, 1.0, 0.0], (8, 1)).astype(np.float32)
    strands, num_root = generate_guide_and_segments(occ, ori, scalp_pts, scalp_n, 0.8,
                                                    chunk=4096)
    assert num_root == 8
    assert len(strands) >= num_root
