"""Metrics, logging, checkpointing, visualization exports, video, colmap."""

import json
import os

import numpy as np

from monohair_tpu.utils.metrics import OccMetric, direction_cosine_error, psnr, ssim


def test_occ_metric_accumulates():
    m = OccMetric()
    m.update(np.array([1, 1, 0, 0]), np.array([1, 0, 1, 0]))
    m.update(np.array([1, 0]), np.array([1, 0]))
    assert abs(m.precision() - 2 / 3) < 1e-9
    assert abs(m.recall() - 2 / 3) < 1e-9


def test_direction_cosine_error_sign_agnostic():
    a = np.array([[0, 1.0, 0], [1.0, 0, 0]])
    assert direction_cosine_error(a, -a) < 1e-9
    b = np.array([[1.0, 0, 0], [0, 1.0, 0]])
    assert abs(direction_cosine_error(a, b) - 1.0) < 1e-9


def test_psnr_ssim(rng):
    img = rng.random((32, 32)).astype(np.float32)
    assert psnr(img, img) > 100
    assert abs(ssim(img, img) - 1.0) < 1e-6
    noisy = img + rng.normal(size=img.shape).astype(np.float32) * 0.1
    assert psnr(noisy, img) < 30
    assert ssim(noisy, img) < 0.99


def test_log_metrics_file(tmp_path):
    from monohair_tpu.log import Log
    log = Log(metrics_path=str(tmp_path / "m" / "metrics.jsonl"))
    log.metric("stage/test/seconds", 1.5)
    with log.stage("demo"):
        pass
    lines = [json.loads(l) for l in open(tmp_path / "m" / "metrics.jsonl")]
    assert lines[0]["name"] == "stage/test/seconds"
    assert any(l["name"] == "stage/demo/seconds" for l in lines)


def test_nerf_snapshot_roundtrip(tmp_path, rng):
    import jax
    from monohair_tpu.checkpoint import load_nerf_snapshot, save_nerf_snapshot
    tree = {"a": rng.normal(size=(4, 5)).astype(np.float32),
            "b": {"c": rng.normal(size=(3,)).astype(np.float32)}}
    p = str(tmp_path / "snap.npz")
    save_nerf_snapshot(p, tree, {"steps": 100})
    like = jax.tree_util.tree_map(np.zeros_like, tree)
    back = load_nerf_snapshot(p, like)
    np.testing.assert_allclose(back["a"], tree["a"])
    np.testing.assert_allclose(back["b"]["c"], tree["b"]["c"])


def test_ply_exports(tmp_path, rng):
    from monohair_tpu.visualization import (save_oriented_points, save_ply_points,
                                            save_strands_ply)
    pts = rng.random((10, 3))
    save_ply_points(str(tmp_path / "p.ply"), pts)
    save_oriented_points(str(tmp_path / "o.ply"), pts, rng.random((10, 3)) * 2 - 1)
    save_strands_ply(str(tmp_path / "s.ply"), [rng.random((5, 3)), rng.random((3, 3))])
    txt = open(tmp_path / "s.ply").read()
    assert "element vertex 8" in txt and "element edge 6" in txt


def test_colmap_converter(tmp_path):
    from monohair_tpu.nerf.colmap import colmap_to_transforms
    (tmp_path / "cameras.txt").write_text(
        "# cams\n1 PINHOLE 640 480 500 500 320 240\n")
    # two images, identity-ish poses
    (tmp_path / "images.txt").write_text(
        "1 1 0 0 0 0 0 2 1 a.png\n\n"
        "2 1 0 0 0 0.5 0 2 1 b.png\n\n")
    data = colmap_to_transforms(str(tmp_path), str(tmp_path / "transforms.json"))
    assert len(data["frames"]) == 2
    assert abs(data["camera_angle_y"] - 2 * np.arctan(480 / 1000)) < 1e-9
    m = np.array(data["frames"][0]["transform_matrix"])
    assert m.shape == (4, 4)
    # scene normalized: camera distances average ~4
    c = np.stack([np.array(f["transform_matrix"])[:3, 3] for f in data["frames"]])
    assert abs(np.linalg.norm(c - c.mean(0), axis=-1).mean() - 4.0) < 1e-6


def test_annotation_processor_idempotent(tmp_path):
    from monohair_tpu.segment.annotations import AnnotationProcessor
    img_dir = tmp_path / "capture_images"
    img_dir.mkdir()
    (img_dir / "000.png").write_bytes(b"x")
    calls = []

    def backend(img, out_dir):
        calls.append(img)
        open(os.path.join(out_dir, "000.npy"), "w").write("d")

    p = AnnotationProcessor(str(tmp_path), backends={"matting": backend})
    s1 = p.run(["matting", "iris"])
    assert s1["matting"] == "computed" and "skipped" in s1["iris"]
    s2 = p.run(["matting"])
    assert s2["matting"] == "cached"
    assert len(calls) == 1
