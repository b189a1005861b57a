"""Conversion equivalence for the segmentation/annotation nets.

Each golden fixture (tests/golden/{modnet,bisenet,fan}.npz, written by
generate_golden.py in a torch-only process) holds a randomly-initialized torch
mirror's full state_dict plus its eval outputs on a fixture input. The test
converts the checkpoint with segment.convert.convert_state_dict and asserts
the Flax net reproduces the torch outputs — validating the entire torch->flax
path (naming, layout transposes, BN running stats, IBNorm split) at full-net
granularity, the same proof the reference relies on when loading MODNet /
BiSeNet checkpoints (calc_masks.py:146, dataprocess.py:460).
"""

import os

import numpy as np
import pytest

from monohair_tpu.segment.convert import convert_state_dict

HERE = os.path.dirname(os.path.abspath(__file__))


def _load(name):
    d = np.load(os.path.join(HERE, "golden", name + ".npz"))
    sd = {k[len("sd."):]: d[k] for k in d.files if k.startswith("sd.")}
    ins = {k[len("in."):]: d[k] for k in d.files if k.startswith("in.")}
    outs = {k[len("out."):]: d[k] for k in d.files if k.startswith("out.")}
    return sd, ins, outs


def _nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def test_modnet_conversion_matches_torch():
    sd, ins, outs = _load("modnet")
    params, stats = convert_state_dict(sd)
    from monohair_tpu.segment.modnet import MODNet
    net = MODNet(width=0.25)
    semantic, detail, matte = net.apply(
        {"params": params, "batch_stats": stats}, _nhwc(ins["img"]))
    np.testing.assert_allclose(np.asarray(matte), _nhwc(outs["matte"]),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(semantic), _nhwc(outs["semantic"]),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(detail), _nhwc(outs["detail"]),
                               atol=2e-4)


def test_bisenet_conversion_matches_torch():
    sd, ins, outs = _load("bisenet")
    params, stats = convert_state_dict(sd)
    from monohair_tpu.segment.bisenet import BiSeNet
    net = BiSeNet(n_classes=19, width=0.125)
    out, out16, out32 = net.apply(
        {"params": params, "batch_stats": stats}, _nhwc(ins["img"]))
    np.testing.assert_allclose(np.asarray(out), _nhwc(outs["out"]),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(out16), _nhwc(outs["out16"]),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(out32), _nhwc(outs["out32"]),
                               atol=2e-3)


def test_fan_conversion_matches_torch():
    sd, ins, outs = _load("fan")
    params, stats = convert_state_dict(sd)
    from monohair_tpu.segment.fan import FAN
    net = FAN(num_modules=2, depth=2, width=0.125)
    heats = net.apply({"params": params, "batch_stats": stats},
                      _nhwc(ins["img"]))
    np.testing.assert_allclose(np.asarray(heats[0]), _nhwc(outs["heat0"]),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(heats[1]), _nhwc(outs["heat1"]),
                               atol=2e-3)


def test_decode_heatmaps_subpixel():
    from monohair_tpu.segment.fan import decode_heatmaps
    heat = np.zeros((1, 16, 16, 2), np.float32)
    heat[0, 5, 7, 0] = 1.0
    heat[0, 5, 8, 0] = 0.5    # gradient pulls +x
    heat[0, 10, 3, 1] = 1.0
    heat[0, 9, 3, 1] = 0.5    # gradient pulls -y
    pts = decode_heatmaps(heat)
    np.testing.assert_allclose(pts[0, 0], [7.25, 5.0 - 0.25 * 0 + 0.0], atol=0.26)
    assert pts[0, 0][0] == pytest.approx(7.25)
    assert pts[0, 1][1] == pytest.approx(9.75)
