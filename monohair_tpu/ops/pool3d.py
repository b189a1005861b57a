"""3D max/avg pooling (stride 1, 'same') via lax.reduce_window — the torch
F.max_pool3d/avg_pool3d shell-sampling primitives of the reference
(PMVO_utils.py:217-252 `SamplePointsAroundVolume`, sampleOcc.py:141-146)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def max_pool3d(vol: jnp.ndarray, kernel: int) -> jnp.ndarray:
    """(X, Y, Z) max pool, stride 1, same padding."""
    pad = kernel // 2
    return jax.lax.reduce_window(vol, -jnp.inf, jax.lax.max,
                                 (kernel,) * 3, (1,) * 3,
                                 [(pad, pad)] * 3)


def avg_pool3d(vol: jnp.ndarray, kernel: int) -> jnp.ndarray:
    """(X, Y, Z) average pool, stride 1, same padding (torch counts padded zeros
    in the denominator by default: count_include_pad=True)."""
    pad = kernel // 2
    s = jax.lax.reduce_window(vol, 0.0, jax.lax.add, (kernel,) * 3, (1,) * 3,
                              [(pad, pad)] * 3)
    return s / float(kernel ** 3)


def close_volume(occ: jnp.ndarray, kernel: int = 3) -> jnp.ndarray:
    """Morphological closing: dilate (max) then keep only fully-covered (avg==1)
    voxels (PMVO_utils.py:220-223)."""
    enlarged = max_pool3d(occ, kernel)
    closed = avg_pool3d(enlarged, kernel)
    return jnp.where(closed < 1.0, 0.0, closed)


def shell_voxels(occ: jnp.ndarray, kernel: int = 3, close: bool = True,
                 erosion: bool = False) -> jnp.ndarray:
    """The one-ring shell around the occupied volume (PMVO_utils.py:217-238):
    dilate(occ) - occ, optionally on the closed volume, optionally adding the
    eroded boundary."""
    if close:
        occ = close_volume(occ, kernel)
    shell = max_pool3d(occ, kernel) - occ
    if erosion:
        er = avg_pool3d(occ, 3)
        er = jnp.where(er < 1.0, 0.0, er)
        shell = shell + (occ - er)
    return shell
