"""Batched pinhole/NDC camera math as pure, jittable JAX functions.

The reference implements this as a per-view ``Camera`` class with in-place torch
ops (Utils/Camera_utils.py:10-135) and loops over views everywhere. Here a camera
*set* is two stacked arrays — NDC intrinsics ``(V, 4)`` and world-to-camera poses
``(V, 4, 4)`` — and every operation is vectorized over both the view axis and the
point axis, so the whole multi-view projection of N points is one fused XLA op.

Conventions (identical to the reference, verified by golden tests):
- ``ndc`` intrinsics are (fx, fy, cx, cy) in NDC units; the full OpenGL projection
  matrix (Camera_utils.py:19-36) has rows [fx,0,cx,0],[0,fy,cy,0],[0,0,m,n],[0,0,-1,0].
- Projection divides by the *camera z* (not -z): ``u = fx*x/z + cx`` etc.
  (Camera_utils.py:52-53). z is negative in front of the camera.
- Pixel mapping (Camera_utils.py:60-71 / PMVO.py:378-397):
      col = (-u + 1)/2 * W,   row = (v + 1)/2 * H
- Normalized depth = (-z)/DEPTH_RANGE, stored on disk scaled by 255.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .constants import DEPTH_RANGE, Z_FAR, Z_NEAR


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Cameras:
    """A batch of V cameras. ``ndc``: (V, 4) = (fx, fy, cx, cy); ``w2c``: (V, 4, 4)."""

    ndc: jnp.ndarray
    w2c: jnp.ndarray

    @property
    def num_views(self) -> int:
        return self.ndc.shape[0]

    def tree_flatten(self):
        return (self.ndc, self.w2c), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def from_json_list(cls, cam_list, dtype=jnp.float32) -> "Cameras":
        """Build from the `cam_list` entries of cam_params.json.

        The JSON stores camera-to-world poses; we invert to world-to-camera,
        matching ``parsing_camera`` (Camera_utils.py:148-163).
        """
        ndc = np.array([c["ndc_prj"] for c in cam_list], dtype=np.float64)
        c2w = np.array([c["pose"] for c in cam_list], dtype=np.float64)
        w2c = np.linalg.inv(c2w)
        return cls(jnp.asarray(ndc, dtype), jnp.asarray(w2c, dtype))

    def __getitem__(self, idx) -> "Cameras":
        ndc = self.ndc[idx]
        w2c = self.w2c[idx]
        if ndc.ndim == 1:  # single camera: keep a view axis
            ndc, w2c = ndc[None], w2c[None]
        return Cameras(ndc, w2c)


def projection_matrix(ndc: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) NDC intrinsics -> (..., 4, 4) OpenGL projection (Camera_utils.py:19-36)."""
    fx, fy, cx, cy = jnp.moveaxis(ndc, -1, 0)
    zero = jnp.zeros_like(fx)
    one = jnp.ones_like(fx)
    m = (-Z_FAR - Z_NEAR) / (Z_FAR - Z_NEAR) * one
    n = -2.0 * Z_FAR * Z_NEAR / (Z_FAR - Z_NEAR) * one
    rows = jnp.stack([
        jnp.stack([fx, zero, cx, zero], -1),
        jnp.stack([zero, fy, cy, zero], -1),
        jnp.stack([zero, zero, m, n], -1),
        jnp.stack([zero, zero, -one, zero], -1),
    ], -2)
    return rows


def world_to_cam(w2c: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply (V, 4, 4) w2c to (N, 3) points -> (V, N, 3) camera-space points.

    Camera transforms are tiny matmuls feeding pixel-index computations, so they
    run at full fp32 precision (TPU matmuls default to bf16 otherwise).
    """
    return (jnp.einsum("vij,nj->vni", w2c[:, :3, :3], pts, precision="highest")
            + w2c[:, None, :3, 3])


def cam_to_world(w2c: jnp.ndarray, pts_cam: jnp.ndarray) -> jnp.ndarray:
    """Inverse of world_to_cam for (V, N, 3) camera points (Camera_utils.py:100-106)."""
    return jnp.einsum("vji,vnj->vni", w2c[:, :3, :3],
                      pts_cam - w2c[:, None, :3, 3], precision="highest")


def project(cameras: Cameras, pts: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Project (N, 3) world points into all views.

    Returns ``uv``: (V, N, 2) NDC coords and ``z``: (V, N) camera z
    (negative in front). Mirror of Camera.projection (Camera_utils.py:38-58).
    """
    cam = world_to_cam(cameras.w2c, pts)           # (V, N, 3)
    z = cam[..., 2]
    fx, fy, cx, cy = jnp.moveaxis(cameras.ndc, -1, 0)  # each (V,)
    u = fx[:, None] * cam[..., 0] / z + cx[:, None]
    v = fy[:, None] * cam[..., 1] / z + cy[:, None]
    return jnp.stack([u, v], -1), z


def ndc_to_pixel(uv: jnp.ndarray, image_size: Tuple[int, int]) -> jnp.ndarray:
    """NDC (..., 2) -> continuous pixel (row, col). image_size = (H, W).

    Matches PMVO.project_points (PMVO.py:378-397): col = (-u+1)/2*W, row = (v+1)/2*H.
    """
    H, W = image_size
    col = (-uv[..., 0] + 1.0) * 0.5 * W
    row = (uv[..., 1] + 1.0) * 0.5 * H
    return jnp.stack([row, col], -1)


def pixel_to_ndc(rc: jnp.ndarray, image_size: Tuple[int, int]) -> jnp.ndarray:
    """Continuous pixel (row, col) -> NDC (u, v). Inverse of ndc_to_pixel
    (reference: Camera_utils.pixel2uv :73-78)."""
    H, W = image_size
    u = -(rc[..., 1] / W * 2.0 - 1.0)
    v = rc[..., 0] / H * 2.0 - 1.0
    return jnp.stack([u, v], -1)


def pixel_index_and_validity(uv: jnp.ndarray, image_size: Tuple[int, int]
                             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Round NDC projections to integer (row, col) indices, clamped; plus an
    out-of-bounds mask (True = outside). Mirror of PMVO.project_points, which
    rounds *then* bounds-checks the unclamped values (PMVO.py:383-397)."""
    H, W = image_size
    rc = jnp.round(ndc_to_pixel(uv, image_size)).astype(jnp.int32)
    row, col = rc[..., 0], rc[..., 1]
    invalid = (col > W - 1) | (col < 0) | (row > H - 1) | (row < 0)
    rc = jnp.stack([jnp.clip(row, 0, H - 1), jnp.clip(col, 0, W - 1)], -1)
    return rc, invalid


def unproject(cameras: Cameras, uv: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Lift NDC coords (V, N, 2) at camera depth z (V, N) back to world (V, N, 3).

    Mirror of Camera.reprojection(..., to_world=True) (Camera_utils.py:81-106).
    """
    fx, fy, cx, cy = jnp.moveaxis(cameras.ndc, -1, 0)
    x = (uv[..., 0] - cx[:, None]) / fx[:, None] * z
    y = (uv[..., 1] - cy[:, None]) / fy[:, None] * z
    cam = jnp.stack([x, y, z], -1)
    return cam_to_world(cameras.w2c, cam)


def normalized_depth(z: jnp.ndarray) -> jnp.ndarray:
    """Camera z -> normalized depth in [0, ~1]: (-z)/DEPTH_RANGE (PMVO.py:392)."""
    return -z / DEPTH_RANGE


def depth_to_z(depth255: jnp.ndarray) -> jnp.ndarray:
    """Disk depth (0..255 scale) -> camera z (negative): z = -d/255*2 (PMVO.py:313)."""
    return -(depth255 / 255.0) * DEPTH_RANGE
