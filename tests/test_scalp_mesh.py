"""UV-based scalp extraction and bust cutting."""

import numpy as np

from monohair_tpu.bustfit.scalp import cut_bust_long, extract_scalp
from monohair_tpu.io.mesh_io import load_obj, load_obj_with_uv


def write_quad_obj(path):
    """Two triangles: left one maps to the red half of the texture."""
    with open(path, "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n")
        f.write("vt 0.1 0.5\nvt 0.4 0.5\nvt 0.1 0.9\n")   # left (red) region
        f.write("vt 0.9 0.5\nvt 0.9 0.9\nvt 0.6 0.5\n")   # right (black)
        f.write("f 1/1 2/2 3/3\n")
        f.write("f 2/4 4/5 3/6\n")


def test_load_obj_with_uv(tmp_path):
    p = str(tmp_path / "m.obj")
    write_quad_obj(p)
    v, f, uv, fuv = load_obj_with_uv(p)
    assert v.shape == (4, 3) and f.shape == (2, 3)
    assert uv.shape == (6, 2) and fuv.shape == (2, 3)
    np.testing.assert_array_equal(fuv[0], [0, 1, 2])


def test_extract_scalp_by_texture(tmp_path):
    import cv2
    p = str(tmp_path / "m.obj")
    write_quad_obj(p)
    tex = np.zeros((64, 64, 3), np.uint8)
    tex[:, :32, 2] = 255  # left half red (BGR)
    cv2.imwrite(str(tmp_path / "mask.png"), tex)
    verts, faces = extract_scalp(p, str(tmp_path / "mask.png"),
                                 str(tmp_path / "scalp.obj"))
    assert len(faces) == 1             # only the left triangle qualifies
    assert len(verts) == 3
    v2, f2 = load_obj(str(tmp_path / "scalp.obj"))
    assert len(f2) == 1


def test_cut_bust_long(tmp_path):
    verts = np.array([[0, 1, 0], [1, 1, 0], [0, 1, 1],   # above
                      [0, -1, 0], [1, -1, 0], [0, -1, 1]])  # below
    faces = np.array([[0, 1, 2], [3, 4, 5]])
    out = str(tmp_path / "bust.obj")
    cut_bust_long(verts, faces, out, y_cut=0.0)
    v, f = load_obj(out)
    assert len(v) == 3 and len(f) == 1
    assert (v[:, 1] > 0).all()
