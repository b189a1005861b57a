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
