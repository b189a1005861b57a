"""Sharding helpers.

The reference is single-GPU by assertion (options.py:112) and fits memory by
chunking (SURVEY.md §2.6). Here the parallel axis is the *data* axis — query
points, pixels, rays, strand seeds — sharded over a 1-D `jax.sharding.Mesh`;
the per-view maps and voxel grids (<~400 MB) are replicated. XLA inserts the
collectives; nothing else is needed at this scale.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(num_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """A 1-D mesh over (up to) all available devices."""
    import numpy as np
    devs = jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), axis_names=(axis,))


def shard_batch(x: jnp.ndarray, mesh: Optional[Mesh], axis: str = "data") -> jnp.ndarray:
    """Place `x` sharded along its leading axis (replicated trailing dims)."""
    if mesh is None:
        return x
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(x, mesh: Optional[Mesh]):
    """Fully replicate a pytree over the mesh."""
    if mesh is None:
        return x
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), x)
