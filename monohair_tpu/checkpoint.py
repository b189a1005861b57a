"""Checkpoint / resume.

The reference persists everything as loose files (.ingp snapshots, .pth nets,
stage .npy intermediates — SURVEY.md §5). Here neural state uses orbax
(atomic, versioned); stage intermediates keep the reference's file contract
(handled by the stage drivers); NeRF snapshots round-trip as a single file
(the .ingp equivalent)."""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def save_pytree(path: str, tree: Any) -> None:
    """Atomic orbax save of any pytree (params, optimizer state, ...)."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, tree, force=True)


def load_pytree(path: str, like: Optional[Any] = None) -> Any:
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    if like is not None:
        return ckptr.restore(os.path.abspath(path), item=like)
    return ckptr.restore(os.path.abspath(path))


def save_nerf_snapshot(path: str, variables: Any, config: dict) -> None:
    """Single-file NeRF snapshot (the .ingp equivalent, run.py:121-127):
    flattened params + config in one npz."""
    flat, treedef = jax.tree_util.tree_flatten(variables)
    arrays = {f"param_{i}": np.asarray(x) for i, x in enumerate(flat)}
    np.savez_compressed(path, __treedef__=str(treedef),
                        __config__=np.asarray(list(config.items()), dtype=object),
                        **arrays)


def load_nerf_snapshot(path: str, like_variables: Any) -> Any:
    data = np.load(path, allow_pickle=True)
    flat, treedef = jax.tree_util.tree_flatten(like_variables)
    restored = [data[f"param_{i}"] for i in range(len(flat))]
    return jax.tree_util.tree_unflatten(treedef, restored)
