"""Reference-format parity (VERDICT r2 item 3): artifacts written by this
framework must load correctly through readers that follow the *reference's*
decode conventions, re-implemented here independently from the format specs:

  .hair        — Utils/Utils.py:25-66 load_strand (struct-based header walk)
  Occ3D.mat    — Utils/PMVO_utils.py:86-95 get_ground_truth_3D_occ transposes
  Ori3D.mat    — Utils/PMVO_utils.py:99-113 get_ground_truth_3D_ori reshape/
                 transpose gymnastics (disk (Y,X,3Z) channel-major)
  voxels.dat   — DeepMVSHair/mvs_eval.py:38,222-226 flat float32 stream

Each test writes with the repo's savers, decodes with the reference-convention
reader, and checks numeric round-trip (bit-exact for float32 payloads).
"""

import os
import struct

import numpy as np
import scipy.io

from monohair_tpu.io.hair_io import load_hair, save_hair
from monohair_tpu.io.mat_io import load_occ_mat, load_ori_mat, save_occ_ori_mat
from monohair_tpu.io.voxels_io import load_voxels_dat, save_voxels_dat


# --- reference-convention readers (from the format specs cited above) -------

def ref_load_strand(path):
    """Struct-walk decode as Utils/Utils.py:25-66 does it."""
    with open(path, "rb") as f:
        (num_strand,) = struct.unpack("I", f.read(4))
        (point_count,) = struct.unpack("I", f.read(4))
        segments = list(struct.unpack("H" * num_strand, f.read(2 * num_strand)))
        points = struct.unpack("f" * point_count * 3, f.read(4 * point_count * 3))
        trailing = f.read()
    assert trailing == b"", "file has trailing bytes the reference would ignore"
    return segments, np.array(points, np.float32).reshape(-1, 3)


def ref_load_occ(path):
    """PMVO_utils.py:86-95: disk 'Occ' (Y,X,Z) -> (D=Z, H=Y, W=X, 1)."""
    occ = scipy.io.loadmat(path)["Occ"].astype(np.float32)
    occ = np.transpose(occ, [2, 0, 1])
    return np.ascontiguousarray(occ[..., None])


def ref_load_ori(path):
    """PMVO_utils.py:99-113: disk 'Ori' (Y,X,3Z) -> (Z,Y,X,3)."""
    ori = scipy.io.loadmat(path)["Ori"].astype(np.float32)
    ori = np.reshape(ori, [ori.shape[0], ori.shape[1], 3, -1])
    ori = ori.transpose([0, 1, 3, 2]).transpose(2, 0, 1, 3)
    return np.ascontiguousarray(ori)


def ref_load_voxels(path):
    """mvs_eval.py layout: res(3) min(3) vsize count then count x 6 floats."""
    raw = np.fromfile(path, dtype="float32")
    res, vmin, vsize, cnt = raw[0:3], raw[3:6], raw[6], int(raw[7])
    data = raw[8:].reshape(-1, 6)
    assert len(data) == cnt
    return data[:, :3], data[:, 3:], res, vmin, vsize


# --- tests -------------------------------------------------------------------

def test_hair_reference_reader_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    strands = [rng.normal(size=(n, 3)).astype(np.float32)
               for n in (2, 7, 25, 100)]
    path = os.path.join(tmp_path, "out.hair")
    save_hair(path, strands)

    segments, points = ref_load_strand(path)
    assert segments == [2, 7, 25, 100]
    np.testing.assert_array_equal(points, np.concatenate(strands, 0))

    # and the repo reader agrees with the reference reader bit-for-bit
    seg2, pts2 = load_hair(path)
    assert list(seg2) == segments
    np.testing.assert_array_equal(pts2, points)


def test_hair_header_bytes_exact(tmp_path):
    """The first bytes must be exactly uint32 counts + uint16 segments —
    the layout struct.pack('I')/('H') produces (Utils.py:70-77 writer)."""
    strands = [np.zeros((3, 3), np.float32), np.ones((5, 3), np.float32)]
    path = os.path.join(tmp_path, "h.hair")
    save_hair(path, strands)
    raw = open(path, "rb").read()
    expect = struct.pack("I", 2) + struct.pack("I", 8) + struct.pack("HH", 3, 5)
    assert raw[:12] == expect
    assert len(raw) == 12 + 4 * 8 * 3


def test_occ_ori_mat_reference_reader_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    X, Y, Z = 6, 5, 4
    occ = (rng.random((X, Y, Z)) > 0.5).astype(np.float32)
    ori = rng.normal(size=(X, Y, Z, 3)).astype(np.float32)
    save_occ_ori_mat(str(tmp_path), occ, ori)

    ref_occ = ref_load_occ(os.path.join(tmp_path, "Occ3D.mat"))
    assert ref_occ.shape == (Z, Y, X, 1)
    for x, y, z in [(0, 0, 0), (2, 3, 1), (X - 1, Y - 1, Z - 1)]:
        assert ref_occ[z, y, x, 0] == occ[x, y, z]
    np.testing.assert_array_equal(ref_occ[..., 0], occ.transpose(2, 1, 0))

    ref_ori = ref_load_ori(os.path.join(tmp_path, "Ori3D.mat"))
    assert ref_ori.shape == (Z, Y, X, 3)
    np.testing.assert_array_equal(ref_ori, ori.transpose(2, 1, 0, 3))

    # repo readers invert the repo writers exactly
    np.testing.assert_array_equal(
        load_occ_mat(os.path.join(tmp_path, "Occ3D.mat")), occ)
    np.testing.assert_array_equal(
        load_ori_mat(os.path.join(tmp_path, "Ori3D.mat")), ori)


def test_voxels_dat_reference_reader_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    n = 1000
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    oris = rng.normal(size=(n, 3)).astype(np.float32)
    res = np.array([128, 128, 96], np.float32)
    vmin = np.array([-0.32, -0.32, -0.24], np.float32)
    path = os.path.join(tmp_path, "voxels.dat")
    save_voxels_dat(path, pts, oris, res, vmin, 0.005)

    r_pts, r_oris, r_res, r_min, r_vsize = ref_load_voxels(path)
    np.testing.assert_array_equal(r_pts, pts)
    np.testing.assert_array_equal(r_oris, oris)
    np.testing.assert_array_equal(r_res, res)
    np.testing.assert_array_equal(r_min, vmin)
    assert r_vsize == np.float32(0.005)

    l_pts, l_oris, l_res, l_min, l_vsize = load_voxels_dat(path)
    np.testing.assert_array_equal(l_pts, pts)
    np.testing.assert_array_equal(l_oris, oris)
    np.testing.assert_array_equal(l_res, res)
    np.testing.assert_array_equal(l_min, vmin)
    assert l_vsize == np.float32(0.005)
