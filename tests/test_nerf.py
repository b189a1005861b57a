"""Hash-grid NeRF: encoding, SH, rendering, marching tetrahedra, pose algebra."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from monohair_tpu.nerf.marching import marching_tetrahedra
from monohair_tpu.nerf.ngp import (HashGridConfig, NGPField, camera_rays,
                                   hash_encode, level_resolutions, ray_aabb,
                                   render_rays, sh_encoding_deg4)

TINY = HashGridConfig(num_levels=4, features_per_level=2, log2_table_size=12,
                      base_resolution=4, finest_resolution=32)


def test_hash_encode_shapes_and_continuity(rng):
    table = jnp.asarray(rng.normal(size=(4, 2, 2 ** 12)).astype(np.float32) * 0.1)
    p = jnp.asarray(rng.random((16, 3)).astype(np.float32))
    f = hash_encode(table, p, TINY)
    assert f.shape == (16, 8)
    # trilinear interpolation: feature change is bounded for a tiny move
    f2 = hash_encode(table, p + 1e-4, TINY)
    assert float(jnp.max(jnp.abs(f2 - f))) < 0.05
    # deterministic
    f3 = hash_encode(table, p, TINY)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f3))


def test_level_resolutions_geometric():
    res = level_resolutions(TINY)
    assert res[0] == 4 and res[-1] == 32
    assert (np.diff(res) > 0).all()


def test_sh_encoding_basics(rng):
    d = rng.normal(size=(32, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    sh = np.asarray(sh_encoding_deg4(jnp.asarray(d.astype(np.float32))))
    assert sh.shape == (32, 16)
    np.testing.assert_allclose(sh[:, 0], 0.282095, rtol=1e-4)
    # l=1 terms are linear in the direction
    np.testing.assert_allclose(sh[:, 2], 0.488603 * d[:, 2], rtol=1e-4)


def test_ray_aabb():
    o = jnp.asarray(np.array([[0.0, 0.0, 3.0]], np.float32))
    d = jnp.asarray(np.array([[0.0, 0.0, -1.0]], np.float32))
    tmin, tmax = ray_aabb(o, d, -1.5, 1.5)
    np.testing.assert_allclose(float(tmin[0]), 1.5, atol=1e-5)
    np.testing.assert_allclose(float(tmax[0]), 4.5, atol=1e-5)


def test_render_rays_runs_and_composites(rng):
    field = NGPField(cfg=TINY, hidden=16, geo_feat=7)
    variables = field.init(jax.random.PRNGKey(0), jnp.zeros((4, 3)), jnp.zeros((4, 3)))
    o = jnp.asarray(np.tile([0, 0, 3.0], (8, 1)).astype(np.float32))
    d = jnp.asarray(np.tile([0, 0, -1.0], (8, 1)).astype(np.float32))
    rgb, depth, opacity = render_rays(field, variables, o, d, num_samples=32)
    assert rgb.shape == (8, 3) and depth.shape == (8,)
    assert np.isfinite(np.asarray(rgb)).all()
    assert (np.asarray(opacity) >= 0).all() and (np.asarray(opacity) <= 1 + 1e-5).all()


def test_camera_rays_directions():
    c2w = jnp.asarray(np.eye(4, dtype=np.float32))
    pix = jnp.asarray(np.array([[32.0 - 0.5, 32.0 - 0.5]], np.float32))  # center
    o, d = camera_rays(c2w, 50.0, 50.0, 32.0, 32.0, pix)
    np.testing.assert_allclose(np.asarray(d[0]), [0, 0, -1], atol=1e-6)


def test_marching_tetrahedra_sphere():
    n = 24
    ax = np.arange(n)
    g = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), -1)
    center = (n - 1) / 2.0
    r = np.linalg.norm(g - center, axis=-1)
    field = 10.0 - r  # inside = field > iso at radius 10-iso
    verts, faces = marching_tetrahedra(field, iso=2.0)
    assert len(verts) > 100
    rad = np.linalg.norm(verts - center, axis=-1)
    np.testing.assert_allclose(rad.mean(), 8.0, atol=0.3)
    assert rad.std() < 0.4
    assert faces.max() == len(verts) - 1


def test_pose_anchor_identity(tmp_path, rng):
    """If the key frame equals rig view 0's scaled pose, base_cam == rig poses."""
    import json
    from monohair_tpu.nerf.poses import (_rig_pose, generate_base_cam_from_key_frame,
                                         load_base_cam, save_base_cam)
    # synthetic rig of 3 cameras
    poses = []
    for k in range(3):
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        m = np.eye(4)
        m[:3, :3] = q
        m[:3, 3] = rng.normal(size=3) * 0.2
        poses.append(m)
    cam_json = {"cam_list": [{"pose": p.tolist(), "intrin_op": [1114, 1114, 0, 0],
                              "ndc_prj": [2, 1, 0, 0], "file": f"{k:03d}"}
                             for k, p in enumerate(poses)]}
    cam_path = str(tmp_path / "cam_params.json")
    with open(cam_path, "w") as f:
        json.dump(cam_json, f)
    A = [_rig_pose(p[:3, :3], p[:3, 3]) for p in poses]
    save_base_cam(str(tmp_path / "key_frame.json"), [A[0]], [40.0])
    generate_base_cam_from_key_frame(str(tmp_path), cam_path,
                                     str(tmp_path / "base_cam.json"))
    quats, trans, fovs = load_base_cam(str(tmp_path / "base_cam.json"))
    from scipy.spatial.transform import Rotation as R
    for k in range(3):
        np.testing.assert_allclose(R.from_quat(quats[k]).as_matrix(),
                                   A[k][:3, :3], atol=1e-6)
        np.testing.assert_allclose(trans[k], A[k][:3, 3], atol=1e-6)


def test_fourier_field_trains_and_renders():
    """FourierField (nerf/fourier.py): gather-free MXU field shares the
    train/render/export API; a few steps reduce the loss and renders stay
    finite."""
    import jax
    import jax.numpy as jnp

    from monohair_tpu.nerf.fourier import FourierField
    from monohair_tpu.nerf.train import NerfDataset, render_image, train_nerf

    f = FourierField(num_features=32, hidden=32, depth=3)
    v = f.init(jax.random.PRNGKey(0), jnp.zeros((8, 3)), jnp.zeros((8, 3)))
    sigma, rgb = f.apply(v, jnp.asarray(np.random.rand(16, 3).astype(np.float32)),
                         jnp.asarray(np.tile([0.0, 0.0, 1.0], (16, 1))
                                     .astype(np.float32)))
    assert sigma.shape == (16,) and rgb.shape == (16, 3)
    assert bool(jnp.isfinite(sigma).all()) and bool((rgb >= 0).all())

    rng = np.random.default_rng(0)
    imgs = rng.random((2, 12, 16, 3)).astype(np.float32)
    poses = np.stack([np.eye(4, dtype=np.float32)] * 2)
    poses[:, 2, 3] = 1.4
    ds = NerfDataset(imgs, poses, 16.0, 16.0, 8.0, 6.0)
    fld, vv, losses, _ = train_nerf(ds, steps=8, rays_per_batch=64, field=f,
                                    use_occupancy=False, num_samples=8,
                                    scan_block=2, log_every=2)
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0] * 1.5  # moving, not diverging
    r, _ = render_image(fld, vv, poses[0], 12, 16, 16.0, 16.0, 8.0, 6.0,
                        chunk=64)
    assert r.shape == (12, 16, 3) and np.isfinite(r).all()
