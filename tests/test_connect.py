"""Segment connection, scalp attachment, occupancy validation."""

import numpy as np
import pytest

from monohair_tpu.strands.connect import (SegmentConnector, attach_roots_to_scalp,
                                          connect_all_segments, connect_to_scalp,
                                          cubic_interp, strand_occupancy_stats)


def line_strand(y0, y1, n, x=5.0, z=5.0):
    return np.stack([np.full(n, x), np.linspace(y0, y1, n), np.full(n, z)], -1)


def test_connector_links_collinear_segments():
    """Two collinear segments whose tip/root nearly touch must connect
    (find_connect_info tip2root path, HairGrow.py:493-511)."""
    s1 = line_strand(0.00, 0.02, 10)    # root at y=0, tip at y=0.02
    s2 = line_strand(0.021, 0.04, 10)   # root just above s1's tip
    conn = SegmentConnector([s1, s2], connect_threshold=0.005,
                            connect_dot_threshold=0.7)
    infos = conn.find_connect_info()
    assert infos[0]["tip"] is not None and infos[0]["tip"][0] == 1
    joined = conn.chain(infos, 0)
    assert joined.shape[0] == 19  # 10 + (10-1) translated points
    # monotone y and continuous steps
    dy = np.diff(joined[:, 1])
    assert (dy > 0).all()
    assert dy.max() < 0.004


def test_connector_rejects_misaligned():
    s1 = line_strand(0.00, 0.02, 10)
    s2 = np.stack([np.linspace(5.0, 5.02, 10), np.full(10, 0.021),
                   np.full(10, 5.0)], -1)  # perpendicular
    conn = SegmentConnector([s1, s2], 0.005, 0.9)
    infos = conn.find_connect_info()
    assert infos[0]["tip"] is None


def test_occupancy_stats():
    occ = np.zeros((16, 16, 16), np.float32)
    occ[8, 4:12, 8] = 1
    ori = np.zeros((16, 16, 16, 3), np.float32)
    ori[..., 1] = 1.0
    inside = np.stack([np.full(8, 8.0), np.arange(4, 12, 1.0), np.full(8, 8.0)], -1)
    in_ratio, sim, ok = strand_occupancy_stats(inside, occ, ori)
    assert ok and in_ratio == 1.0 and sim > 0.9
    outside = inside + np.array([30.0, 0, 0])
    _, _, ok2 = strand_occupancy_stats(outside, occ, ori)
    assert not ok2


def test_connect_all_segments_runs():
    occ = np.ones((64, 64, 64), np.float32)
    ori = np.zeros((64, 64, 64, 3), np.float32)
    ori[..., 1] = -1.0
    # world coords that land inside the voxel grid (vmin -0.32, vsize 0.0025
    # would need huge grids; use matching custom bounds instead)
    vmin = np.array([-0.08, -0.08, -0.08])
    vsize = 0.0025
    s1 = line_strand(0.00, 0.02, 10, x=0.0, z=0.0)
    s2 = line_strand(0.021, 0.04, 10, x=0.0, z=0.0)
    out = connect_all_segments([s1, s2], occ, ori, 0.005, 0.7, vmin, vsize,
                               in_ratio_threshold=0.5)
    assert len(out) == 2
    assert max(len(s) for s in out) >= 19


def _scalp_case():
    occ = np.ones((40, 40, 40), np.float32)
    ori = np.zeros((40, 40, 40, 3), np.float32)
    ori[..., 1] = 1.0
    # good strand (rooted): long vertical; rootless strand starts 1-2 voxels
    # off (strands that already hug a good strand are skipped as duplicates,
    # HairGrow.py:703-705, so it must be near but not on it)
    good = np.stack([np.full(30, 20.0), np.arange(5.0, 35.0), np.full(30, 20.0)], -1)
    loose = np.stack([np.full(10, 21.2), np.arange(21.0, 31.0), np.full(10, 21.0)], -1)
    return occ, ori, good, loose


@pytest.mark.parametrize("use_native", [False, True])
def test_connect_to_scalp_attaches(use_native):
    occ, ori, good, loose = _scalp_case()
    out = connect_to_scalp([good, loose], num_root=1, occ=occ, ori_voxel=ori,
                           out_ratio_threshold=0.5, use_native=use_native)
    assert len(out) == 2
    # the loose strand gained a prefix reaching down toward the good strand root
    attached = out[1]
    assert attached.shape[0] > 10
    assert attached[0, 1] < 21.0


def test_connect_to_scalp_native_matches_python():
    """The C++ kernel (native/connect.cpp) is deterministic-path bit-exact
    against the Python reference implementation (jitter only fires on failed
    occupancy validation, which this case never hits)."""
    occ, ori, good, loose = _scalp_case()
    out_n = connect_to_scalp([good, loose], 1, occ, ori, use_native=True)
    out_p = connect_to_scalp([good, loose], 1, occ, ori, use_native=False)
    assert len(out_n) == len(out_p)
    for a, b in zip(out_n, out_p):
        np.testing.assert_allclose(a, b, atol=1e-12)


def test_attach_roots_to_scalp():
    scalp_pts = np.array([[0.0, 0.0, 0.0], [10.0, 0.0, 0.0]])
    scalp_n = np.array([[0.0, 1.0, 0.0], [0.0, 1.0, 0.0]])
    strand = np.stack([np.zeros(5), np.arange(3.0, 8.0), np.zeros(5)], -1)
    out = attach_roots_to_scalp([strand], scalp_pts, scalp_n)[0]
    assert out.shape[0] > 5
    np.testing.assert_allclose(out[0], [0, 0, 0], atol=1e-9)


def test_cubic_interp_endpoints():
    s = cubic_interp(np.zeros(3), np.array([0, 4.0, 0]), np.array([0, 1.0, 0]),
                     np.array([0, 1.0, 0]), 4)
    np.testing.assert_allclose(s[0], [0, 0, 0], atol=1e-12)
    np.testing.assert_allclose(s[-1], [0, 4, 0], atol=1e-12)
    assert len(s) == 5


def test_connect_to_scalp_scale_and_time():
    """VERDICT item 9: stage 4's host phase must stay bounded at production
    strand counts (~50k strands attach in well under 2 minutes; the reference's
    per-strand python loop is the same complexity class, HairGrow.py:606-784)."""
    import time
    from monohair_tpu.strands.connect import connect_to_scalp

    rng = np.random.default_rng(0)
    occ = np.zeros((256, 256, 192), np.float32)
    ori = np.zeros((256, 256, 192, 3), np.float32)

    def make_strand(x, z, y0, length):
        ys = np.arange(y0, y0 + length)
        return np.stack([np.full_like(ys, x), ys, np.full_like(ys, z)],
                        -1).astype(np.float64)

    n_root, n_free = 5000, 45000
    strands = []
    for _ in range(n_root):
        x, z = rng.integers(40, 200), rng.integers(40, 150)
        strands.append(make_strand(x, z, 30, 40))
    for _ in range(n_free):
        x, z = rng.integers(40, 200), rng.integers(40, 150)
        strands.append(make_strand(x, z, 30 + rng.integers(20, 50), 30))
    for s in strands:
        idx = np.round(s).astype(int)
        occ[idx[:, 0], idx[:, 1], idx[:, 2]] = 1
        ori[idx[:, 0], idx[:, 1], idx[:, 2]] = [0, 1, 0]

    t0 = time.time()
    out = connect_to_scalp(strands, n_root, occ, ori)
    dt = time.time() - t0
    # native kernel: ~17 s on this host; python fallback stays under 120 s
    assert dt < 120, f"connect_to_scalp took {dt:.1f}s at 50k strands"
    assert len(out) > 0.5 * len(strands), f"only {len(out)} attached"
    # attached strands must start at/near a good strand and keep finite coords
    assert all(np.isfinite(s).all() for s in out)


def test_connect_to_scalp_thread_count_invariant(tmp_path):
    """The OpenMP round loop (connect.cpp) must produce identical output under
    any thread count: jitter RNG is per-(strand, round), every intra-round
    read is from the round-start snapshot. Runs the kernel in subprocesses
    with OMP_NUM_THREADS=1 and =4 and compares bit-exactly."""
    import os
    import subprocess
    import sys

    occ, ori, good, loose = _scalp_case()
    # widen the case so the parallel loop actually has work
    rng = np.random.default_rng(3)
    strands = [good, loose]
    for _ in range(60):
        x, z = rng.uniform(4, 20), rng.uniform(4, 20)
        y0 = rng.uniform(22, 30)
        ys = np.linspace(y0, y0 + 8, 9)
        strands.append(np.stack([np.full_like(ys, x), ys,
                                 np.full_like(ys, z)], -1))
    case = tmp_path / "case.npz"
    np.savez(case, occ=occ, ori=ori,
             **{f"s{i}": s for i, s in enumerate(strands)})
    script = tmp_path / "run.py"
    script.write_text(
        "import sys, numpy as np\n"
        f"sys.path.insert(0, {repr(os.getcwd())})\n"
        "from monohair_tpu.strands.connect import connect_to_scalp\n"
        "d = np.load(sys.argv[1])\n"
        "ss = [d[f's{i}'] for i in range(len(d.files) - 2)]\n"
        "out = connect_to_scalp(ss, 1, d['occ'], d['ori'], use_native=True)\n"
        "np.savez(sys.argv[2], **{f'o{i}': s for i, s in enumerate(out)})\n")
    outs = []
    for nt in ("1", "4"):
        out_path = tmp_path / f"out{nt}.npz"
        env = dict(os.environ, OMP_NUM_THREADS=nt)
        subprocess.run([sys.executable, str(script), str(case),
                        str(out_path)], check=True, env=env, timeout=300)
        outs.append(np.load(out_path))
    assert outs[0].files == outs[1].files
    for k in outs[0].files:
        np.testing.assert_array_equal(outs[0][k], outs[1][k])
