"""Round-trip tests for .hair, .mat, camera JSON, and OBJ I/O, including
byte-compatibility of the .hair writer with a struct-based reference reader."""

import struct

import numpy as np

from monohair_tpu.io import (flat_from_strands, load_cam_params, load_hair,
                             load_obj, load_occ_mat, load_ori_mat, sample_mesh_surface,
                             save_cam_params, save_hair, save_obj, save_occ_ori_mat,
                             strands_from_flat)


def reference_load_strand(path):
    """Struct-based transcription of the reference reader (Utils/Utils.py:25-66)."""
    with open(path, "rb") as f:
        (num_strand,) = struct.unpack("I", f.read(4))
        (point_count,) = struct.unpack("I", f.read(4))
        segments = list(struct.unpack("H" * num_strand, f.read(2 * num_strand)))
        pts = struct.unpack("f" * point_count * 3, f.read(4 * point_count * 3))
    return segments, np.array(pts).reshape(-1, 3)


def test_hair_roundtrip(tmp_path, rng):
    strands = [rng.normal(size=(n, 3)).astype(np.float32) for n in (5, 17, 2, 99)]
    path = str(tmp_path / "test.hair")
    save_hair(path, strands)
    segments, points = load_hair(path)
    assert list(segments) == [5, 17, 2, 99]
    np.testing.assert_allclose(points, np.concatenate(strands, 0))
    # byte-compatibility with the reference's struct-based reader
    ref_segments, ref_points = reference_load_strand(path)
    assert ref_segments == [5, 17, 2, 99]
    np.testing.assert_allclose(ref_points, points)
    # strand splitting
    back = strands_from_flat(segments, points)
    for a, b in zip(back, strands):
        np.testing.assert_allclose(a, b)
    segs2, pts2 = flat_from_strands(back)
    np.testing.assert_array_equal(segs2, segments)


def test_mat_roundtrip(tmp_path, rng):
    X, Y, Z = 16, 12, 8
    occ = (rng.random((X, Y, Z)) > 0.7).astype(np.float32)
    ori = rng.normal(size=(X, Y, Z, 3)).astype(np.float32) * occ[..., None]
    save_occ_ori_mat(str(tmp_path), occ, ori)
    occ2 = load_occ_mat(str(tmp_path / "Occ3D.mat"))
    ori2 = load_ori_mat(str(tmp_path / "Ori3D.mat"))
    np.testing.assert_allclose(occ2, occ)
    np.testing.assert_allclose(ori2, ori)


def test_mat_disk_layout_matches_reference(tmp_path, rng):
    """The on-disk 'Ori' must be (Y, X, 3*Z) channel-major over Z, exactly as the
    reference writes (PMVO.py:753-756) and reads (PMVO_utils.py:98-104)."""
    import scipy.io
    X, Y, Z = 6, 5, 4
    ori = rng.normal(size=(X, Y, Z, 3)).astype(np.float32)
    occ = np.ones((X, Y, Z), np.float32)
    save_occ_ori_mat(str(tmp_path), occ, ori)
    raw = scipy.io.loadmat(str(tmp_path / "Ori3D.mat"))["Ori"]
    assert raw.shape == (Y, X, 3 * Z)
    # reference reader: reshape (Y,X,3,Z) -> transpose -> (Z,Y,X,3)
    ref = raw.reshape(Y, X, 3, Z).transpose(0, 1, 3, 2).transpose(2, 0, 1, 3)
    np.testing.assert_allclose(ref[2, 3, 1], ori[1, 3, 2])


def test_cam_params_roundtrip(tmp_path, rng):
    names = ["000", "001", "002"]
    ndc = rng.normal(size=(3, 4))
    c2w = np.stack([np.eye(4)] * 3)
    c2w[:, :3, 3] = rng.normal(size=(3, 3))
    path = str(tmp_path / "cam_params.json")
    save_cam_params(path, names, ndc, c2w)
    names2, cams = load_cam_params(path)
    assert names2 == names
    np.testing.assert_allclose(np.asarray(cams.ndc), ndc, rtol=1e-6)
    # stored pose is c2w; loader inverts to w2c
    np.testing.assert_allclose(np.asarray(cams.w2c), np.linalg.inv(c2w),
                               rtol=1e-5, atol=1e-6)


def test_obj_roundtrip_and_sampling(tmp_path, rng):
    verts = rng.normal(size=(8, 3))
    faces = np.array([[0, 1, 2], [2, 3, 4], [4, 5, 6]])
    path = str(tmp_path / "mesh.obj")
    save_obj(path, verts, faces)
    v2, f2 = load_obj(path)
    np.testing.assert_allclose(v2, verts, atol=1e-6)
    np.testing.assert_array_equal(f2, faces)
    pts, normals = sample_mesh_surface(v2, f2, 500, rng)
    assert pts.shape == (500, 3) and normals.shape == (500, 3)
    np.testing.assert_allclose(np.linalg.norm(normals, axis=-1), 1.0, rtol=1e-6)


def test_sample_mesh_points_on_surface(rng):
    # unit right triangle in z=0 plane: all samples must have z==0 and u+v<=1
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], dtype=np.float64)
    faces = np.array([[0, 1, 2]])
    pts, normals = sample_mesh_surface(verts, faces, 200, rng)
    assert np.allclose(pts[:, 2], 0)
    assert (pts[:, 0] >= 0).all() and (pts[:, 1] >= 0).all()
    assert (pts[:, 0] + pts[:, 1] <= 1.0 + 1e-9).all()
    np.testing.assert_allclose(np.abs(normals[:, 2]), 1.0)
