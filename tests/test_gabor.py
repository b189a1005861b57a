"""Gabor bank validation on synthetic stripe patterns."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from monohair_tpu.io.image_io import decode_orientation_image, encode_orientation_image
from monohair_tpu.ops.gabor import (difference_of_gaussians, gabor_bank,
                                    gabor_orientation, orientation_maps)


def stripes(theta_deg, H=96, W=96, lam=4.0):
    """Intensity varies along gradient direction (cos t, sin t) in (row, col)."""
    t = math.radians(theta_deg)
    r, c = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    phase = (r * math.cos(t) + c * math.sin(t)) * 2 * math.pi / lam
    return (0.5 + 0.5 * np.cos(phase)).astype(np.float32)


@pytest.mark.parametrize("theta_deg", [0, 30, 75, 120, 179])
def test_stripe_orientation_recovered(theta_deg):
    img = stripes(theta_deg)
    two, angle, conf = orientation_maps(jnp.asarray(img))
    inner = np.asarray(angle)[30:-30, 30:-30]
    est = np.median(inner) * 180 / math.pi
    err = min(abs(est - theta_deg), 180 - abs(est - theta_deg))
    assert err < 2.5, f"theta={theta_deg}, est={est}"


def test_confidence_higher_on_stripes_than_noise(rng):
    img = stripes(45)
    flat = np.full_like(img, 0.5)
    _, _, conf_s = orientation_maps(jnp.asarray(img))
    _, _, conf_f = orientation_maps(jnp.asarray(flat))
    assert float(np.median(np.asarray(conf_s)[20:-20, 20:-20])) > 0.5
    # a constant image has no oriented structure anywhere
    assert float(np.mean(np.asarray(conf_f))) < float(np.mean(np.asarray(conf_s)))


def test_bank_matches_reference_formula():
    """Transcribe the torch gabor_fn math (GaborFilter.py:115-145) in numpy."""
    k = 9
    bank = gabor_bank(kernel_size=k, num_orientations=8)
    theta = math.pi * 3 / 8
    coords = np.arange(-(k // 2), k // 2 + 1, dtype=np.float64) - 0.5
    y = np.broadcast_to(coords[None, :], (k, k))
    x = np.broadcast_to(coords[:, None], (k, k))
    x_t = x * math.cos(theta) + y * math.sin(theta)
    y_t = -x * math.sin(theta) + y * math.cos(theta)
    ref = (np.exp(-0.5 * (x_t ** 2 / 1.8 ** 2 + y_t ** 2 / 2.4 ** 2))
           * np.cos(2 * math.pi * x_t / 4.0))
    np.testing.assert_allclose(bank[3, 0], ref, rtol=1e-5, atol=1e-6)


def test_decode_aligns_with_stripe_direction():
    """End-to-end convention check: encode the gabor angle as the reference's
    degree image, decode with image_io, and verify the decoded 2D vector is
    parallel to the stripe (hair) direction in (row, col) pixel coords."""
    theta_deg = 30
    img = stripes(theta_deg)
    _, angle, _ = orientation_maps(jnp.asarray(img))
    deg_img = encode_orientation_image(np.asarray(angle))
    vec = decode_orientation_image(deg_img)  # (H, W, 2) = (sin, cos) of pi - angle
    t = math.radians(theta_deg)
    stripe_dir = np.array([-math.sin(t), math.cos(t)])  # along constant intensity
    inner = vec[30:-30, 30:-30].reshape(-1, 2)
    cosine = np.abs(inner @ stripe_dir)
    assert np.median(cosine) > 0.99


def test_dog_removes_dc():
    img = jnp.full((64, 64), 0.7, jnp.float32)
    out = difference_of_gaussians(img)
    assert float(jnp.max(jnp.abs(out))) < 1e-4


def test_banded_matmul_matches_naive_conv():
    """The im2col/matmul formulation (gabor.py) is numerically identical to a
    direct zero-padded cross-correlation with the bank — exactness guard for
    the banded restructure (patch ordering, band halos, edge bands)."""
    rng = np.random.default_rng(3)
    img = rng.random((37, 29)).astype(np.float32)
    O, k = 12, 9
    bank = gabor_bank(k, O)[:, 0]
    H, W = img.shape
    pad = np.pad(img, k // 2)
    resp = np.zeros((O, H, W))
    for o in range(O):
        for i in range(H):
            for j in range(W):
                resp[o, i, j] = np.sum(pad[i:i + k, j:j + k] * bank[o])
    resp = np.abs(resp)
    best = resp.argmax(0) * math.pi / O
    ors = np.arange(O) * math.pi / O
    diff = np.abs(best[None] - ors[:, None, None])
    diff = np.minimum(diff, math.pi - diff)
    rd = resp - resp.max(0)[None]
    var = np.sqrt((diff * rd * rd).sum(0))
    var = var / var.max()
    conf = np.clip(var / 0.2, 0, 1)

    # band=16 forces multiple bands including a ragged final band
    ang_j, conf_j = gabor_orientation(jnp.asarray(img), num_orientations=O,
                                      kernel_size=k, band=16)
    np.testing.assert_allclose(np.asarray(ang_j), best, atol=1e-5)
    np.testing.assert_allclose(np.asarray(conf_j), conf, atol=1e-4)
