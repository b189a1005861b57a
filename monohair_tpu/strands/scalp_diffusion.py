"""Scalp diffusion: extend the orientation field from the scalp into empty
voxels along blended normals so roots can grow through sparse regions.

Batched re-design of diffusion_scalp (PMVO_utils.py:467-593): the reference
walks each of 60k scalp points with a Python while-loop, retrying with a bias
toward the first hit direction, then splats Hermite-spline bridges. Here every
scalp point marches simultaneously under one lax.scan (like strands.trace); the
bridge between the scalp and the first field hit uses the same cubic Hermite
shape, evaluated in closed form for all seeds at once.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _lookup(grid, pos):
    res = jnp.asarray(grid.shape[:3])
    idx = jnp.clip(pos.astype(jnp.int32), 0, res - 1)
    return grid[idx[:, 0], idx[:, 1], idx[:, 2]]


@partial(jax.jit, static_argnames=("trace_steps",))
def diffuse_scalp(occ: jnp.ndarray, ori_voxel: jnp.ndarray,
                  scalp_points: jnp.ndarray, scalp_normals: jnp.ndarray,
                  trace_steps: int = 10, threshold: float = 0.5
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns the diffused (ori, occ) voxel grids.

    scalp_points/normals in voxel space. Seeds march along their normal (with
    the reference's 0.8/0.2 bias blending left identity, since the batched
    version takes the first-hit direction directly) for at most `trace_steps`
    voxels; when the field is reached with |cos| > threshold, the bridge
    between scalp and hit point is filled with Hermite-interpolated
    directions. Finally ori/occ gain the diffusion only where empty
    (PMVO_utils.py:590-592).
    """
    K = scalp_points.shape[0]

    def step(carry, _):
        pos, active, hit, hit_pos, hit_dir, steps = carry
        occ_here = _lookup(occ, pos)
        fdir = _lookup(ori_voxel, pos)
        in_field = occ_here > 0
        agree = jnp.abs(jnp.sum(fdir * scalp_normals, -1)) > threshold
        newly_hit = active & in_field & agree & (steps > 0)
        hit = hit | newly_hit
        hit_pos = jnp.where(newly_hit[:, None], pos, hit_pos)
        sgn = jnp.sign(jnp.sum(fdir * scalp_normals, -1, keepdims=True))
        sgn = jnp.where(sgn == 0, 1.0, sgn)
        hit_dir = jnp.where(newly_hit[:, None], fdir * sgn, hit_dir)
        active = active & ~in_field
        pos = jnp.where(active[:, None], pos + scalp_normals, pos)
        return (pos, active, hit, hit_pos, hit_dir, steps + 1), None

    init = (scalp_points, jnp.ones(K, bool), jnp.zeros(K, bool),
            scalp_points, scalp_normals, jnp.zeros(K, jnp.int32))
    (pos, active, hit, hit_pos, hit_dir, _), _ = jax.lax.scan(
        step, init, None, length=trace_steps)

    # Hermite bridge samples between scalp point and hit point
    S = trace_steps + 1
    t = jnp.linspace(0.0, 1.0, S)[None, :, None]              # (1, S, 1)
    p0 = scalp_points[:, None, :]
    p1 = hit_pos[:, None, :]
    dist = jnp.linalg.norm(hit_pos - scalp_points, axis=-1, keepdims=True)[:, None, :]
    m0 = scalp_normals[:, None, :] * dist
    m1 = hit_dir[:, None, :] * dist
    h00 = 2 * t ** 3 - 3 * t ** 2 + 1
    h10 = t ** 3 - 2 * t ** 2 + t
    h01 = -2 * t ** 3 + 3 * t ** 2
    h11 = t ** 3 - t ** 2
    samples = h00 * p0 + h10 * m0 + h01 * p1 + h11 * m1       # (K, S, 3)
    tangents = jnp.diff(samples, axis=1)
    tangents = jnp.concatenate([tangents, tangents[:, -1:]], 1)
    tnorm = jnp.linalg.norm(tangents, axis=-1, keepdims=True)
    tangents = tangents / jnp.maximum(tnorm, 1e-8)

    valid = (hit & (dist[:, 0, 0] > 0.5))[:, None]            # real bridges only
    flat = samples.reshape(-1, 3)
    tflat = tangents.reshape(-1, 3)
    w = jnp.broadcast_to(valid, (K, S)).reshape(-1).astype(occ.dtype)
    res = jnp.asarray(occ.shape)
    idx = jnp.clip(flat.astype(jnp.int32), 0, res - 1)

    d_occ = jnp.zeros_like(occ).at[idx[:, 0], idx[:, 1], idx[:, 2]].add(w)
    d_ori = jnp.zeros_like(ori_voxel).at[idx[:, 0], idx[:, 1], idx[:, 2]].add(
        tflat * w[:, None])
    d_ori = d_ori / jnp.maximum(d_occ[..., None], 1e-6)
    d_occ = jnp.minimum(d_occ, 1.0)

    new_ori = ori_voxel + (1.0 - occ[..., None]) * d_ori
    new_occ = occ + (1.0 - occ) * d_occ
    return new_ori, new_occ
