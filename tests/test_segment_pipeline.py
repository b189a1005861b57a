"""Segmentation stage + annotation pipeline smoke tests.

Runs the full neural mask path (calculate_masks) and the four annotation
backends (AnnotationProcessor + default_backends) with tiny randomly-
initialized checkpoints on synthetic frames — validating the file contracts,
batching, idempotency, and the ensemble protocol end-to-end (weights are
random; quality is covered by the conversion goldens in test_segment_nets.py).
Also pins the classical fallback's behavior on a synthetic render
(dark textured wig on light background).
"""

import os

import cv2
import numpy as np
import pytest

from monohair_tpu.config import Config


def _synthetic_frames(img_dir, n=2, size=64):
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    files = []
    for i in range(n):
        img = np.full((size, size, 3), 230, np.uint8)
        # face: mid-gray ellipse center
        cv2.ellipse(img, (size // 2, size // 2 + 6), (14, 18), 0, 0, 360,
                    (180, 150, 140), -1)
        # hair: dark textured cap on top
        hair = (rng.random((size, size)) * 60).astype(np.uint8)
        mask = np.zeros((size, size), np.uint8)
        cv2.ellipse(mask, (size // 2, size // 2 - 6), (18, 16), 0, 180, 360,
                    255, -1)
        cv2.ellipse(mask, (size // 2, size // 2 - 10), (18, 10), 0, 0, 360,
                    255, -1)
        for c in range(3):
            img[..., c] = np.where(mask > 0, hair, img[..., c])
        f = f"{i:04d}.png"
        cv2.imwrite(os.path.join(img_dir, f), img)
        files.append(f)
    return files


@pytest.fixture(scope="module")
def tiny_ckpts(tmp_path_factory):
    """Random-init flax checkpoints for all three nets."""
    import jax
    from monohair_tpu.segment.bisenet import BiSeNet
    from monohair_tpu.segment.fan import FAN
    from monohair_tpu.segment.modnet import MODNet
    from monohair_tpu.segment.runners import save_flax_tree

    d = tmp_path_factory.mktemp("ckpts")
    rng = jax.random.PRNGKey(0)
    x = np.zeros((1, 64, 64, 3), np.float32)
    paths = {}
    for name, net, inp in (
            ("modnet", MODNet(width=0.25), x),
            ("bisenet", BiSeNet(n_classes=19, width=0.125), x),
            ("fan", FAN(num_modules=2, depth=2, width=0.125),
             np.zeros((1, 256, 256, 3), np.float32))):
        variables = net.init(rng, inp)
        p = str(d / f"{name}.npz")
        save_flax_tree(p, {"params": variables["params"],
                           "batch_stats": variables.get("batch_stats", {})})
        paths[name] = p
    return paths


def _seg_cfg(root, ckpts):
    return Config({
        "data": {"root": str(root)},
        "segment": {
            "modnet_flax": ckpts["modnet"], "modnet_width": 0.25,
            "parser_flax": ckpts["bisenet"], "parser_width": 0.125,
            "fan_flax": ckpts["fan"], "fan_width": 0.125,
            "fan_modules": 2, "fan_depth": 2,
            "matte_size": 64, "parse_size": 64,
        }})


def test_calculate_masks_neural(tmp_path, tiny_ckpts):
    from monohair_tpu.segment.pipeline import calculate_masks
    files = _synthetic_frames(tmp_path / "capture_images")
    cfg = _seg_cfg(tmp_path, tiny_ckpts)
    out = calculate_masks(cfg)
    assert out == files
    for sub in ("mask", "hair_mask", "mask_hair"):
        for f in files:
            p = tmp_path / sub / f
            assert p.exists()
            im = cv2.imread(str(p), cv2.IMREAD_UNCHANGED)
            assert im.shape[:2] == (64, 64)
    # hair_mask values are 0/255 (class mask x matte)
    hm = cv2.imread(str(tmp_path / "hair_mask" / files[0]),
                    cv2.IMREAD_GRAYSCALE)
    assert hm.dtype == np.uint8
    # idempotent: second call no-ops (mtimes unchanged)
    t0 = os.path.getmtime(tmp_path / "hair_mask" / files[0])
    calculate_masks(cfg)
    assert os.path.getmtime(tmp_path / "hair_mask" / files[0]) == t0


def test_annotation_backends(tmp_path, tiny_ckpts):
    from monohair_tpu.segment.annotations import (AnnotationProcessor,
                                                  default_backends)
    files = _synthetic_frames(tmp_path / "capture_images")
    cfg = _seg_cfg(tmp_path, tiny_ckpts)
    proc = AnnotationProcessor(str(tmp_path),
                               backends=default_backends(cfg))
    status = proc.run()
    assert all(v == "computed" for v in status.values()), status

    for f in files:
        stem = os.path.splitext(f)[0]
        rgba = cv2.imread(str(tmp_path / "optimize" / "matting" / f"{stem}.png"),
                          cv2.IMREAD_UNCHANGED)
        assert rgba.shape == (64, 64, 4)
        lmk = np.loadtxt(tmp_path / "optimize" / "landmark2d" / f"{stem}.txt")
        assert lmk.shape == (68, 2)
        iris = np.loadtxt(tmp_path / "optimize" / "iris" / f"{stem}.txt")
        assert iris.shape == (2, 3) and np.all(iris[:, 2] == 1.0)
        parsing = cv2.imread(
            str(tmp_path / "optimize" / "face_parsing" / f"{stem}.png"),
            cv2.IMREAD_GRAYSCALE)
        assert parsing.shape == (64, 64) and parsing.max() < 19

    # second run hits the idempotent cache
    assert all(v == "cached" for v in proc.run().values())


def test_fallback_mask_covers_wig(tmp_path):
    from monohair_tpu.segment.pipeline import calculate_masks
    files = _synthetic_frames(tmp_path / "capture_images", n=1, size=96)
    cfg = Config({"data": {"root": str(tmp_path)}, "segment": {}})
    calculate_masks(cfg)
    m = cv2.imread(str(tmp_path / "hair_mask" / files[0]),
                   cv2.IMREAD_GRAYSCALE)
    # the dark textured cap sits in the upper half; fallback must catch most
    upper = m[:56] > 0
    assert upper.sum() > 150, f"fallback found only {upper.sum()} hair px"


def test_refine_pupil_recovers_offset_pupil():
    """VERDICT r2 item 9: pupil offset from the eyelid-ring centroid must be
    recovered within 1 px (the reference runs fdlite pupil detection,
    dataprocess.py:376-450; the ring centroid alone misses off-center gaze)."""
    from monohair_tpu.segment.annotations import refine_pupil

    H, W = 96, 128
    img = np.full((H, W), 0.85, np.float32)          # skin-bright background
    # eyelid ring: ellipse of 6 landmarks around (64, 48), rx=22, ry=10
    angles = np.linspace(0, 2 * np.pi, 6, endpoint=False)
    ring = np.stack([64 + 22 * np.cos(angles), 48 + 10 * np.sin(angles)], -1)
    # white sclera inside the ring, dark pupil 6 px RIGHT of the centroid
    ys, xs = np.mgrid[:H, :W]
    inside = ((xs - 64) / 22.0) ** 2 + ((ys - 48) / 10.0) ** 2 <= 1.0
    img[inside] = 0.95
    pupil_true = np.array([70.0, 48.0])
    pup = (xs - pupil_true[0]) ** 2 + (ys - pupil_true[1]) ** 2 <= 4.0 ** 2
    img[pup & inside] = 0.05

    got = refine_pupil(img, ring.astype(np.float32))
    err = np.linalg.norm(got - pupil_true)
    assert err < 1.0, (got, pupil_true, err)
    # and it must NOT collapse to the ring centroid (6 px away)
    assert np.linalg.norm(got - ring.mean(0)) > 4.0


def test_refine_pupil_degenerate_falls_back_to_centroid():
    from monohair_tpu.segment.annotations import refine_pupil
    img = np.ones((32, 32), np.float32)              # uniformly bright
    ring = np.array([[10, 10], [12, 10], [14, 10],
                     [14, 12], [12, 12], [10, 12]], np.float32)
    got = refine_pupil(img, ring)
    np.testing.assert_allclose(got, ring.mean(0), atol=1e-4)
