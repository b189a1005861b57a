"""Generic torch state_dict -> Flax (params, batch_stats) conversion.

Used for the segmentation/annotation nets (MODNet, BiSeNet, FAN — the
checkpoints the reference loads at calc_masks.py:146,169 and
dataprocess.py:264,460). The Flax modules in this package name their children
so that a torch module tree with the same attribute names produces state_dict
keys mapping 1:1 onto flax param paths; conversion is then mechanical:

    X.weight (4D conv)        -> params[X]['kernel']  OIHW -> HWIO
    X.weight (2D linear)      -> params[X]['kernel']  (out,in) -> (in,out)
    X.weight + X.running_mean -> params[X]['scale'] (+ batch_stats mean/var)
    X.weight (1D, no stats)   -> params[X]['scale']  (instance/group norm)
    X.bias                    -> params[X]['bias']
    num_batches_tracked       -> dropped

Checkpoints trained under nn.DataParallel carry a 'module.' prefix
(calc_masks.py:145,171-176 strips it the same way); public checkpoints whose
module names differ from ours pass a `rename` hook mapping their keys onto
this package's naming before the mechanical walk.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import numpy as np


def _set(tree: dict, path: str, value: np.ndarray):
    keys = path.split(".")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = np.asarray(value)


def convert_state_dict(sd: Dict[str, np.ndarray],
                       rename: Optional[Callable[[str], Optional[str]]] = None
                       ) -> Tuple[dict, dict]:
    """torch state_dict (numpy values) -> (params, batch_stats) pytrees."""
    clean = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if rename is not None:
            k = rename(k)
            if k is None:
                continue
        clean[k] = np.asarray(v)

    params: dict = {}
    stats: dict = {}
    for k, v in clean.items():
        if k.endswith("num_batches_tracked"):
            continue
        base, leaf = k.rsplit(".", 1)
        if leaf == "weight":
            if v.ndim == 4:
                _set(params, base + ".kernel", np.transpose(v, (2, 3, 1, 0)))
            elif v.ndim == 2:
                _set(params, base + ".kernel", np.transpose(v))
            else:
                _set(params, base + ".scale", v)
        elif leaf == "bias":
            _set(params, base + ".bias", v)
        elif leaf == "running_mean":
            _set(stats, base + ".mean", v)
        elif leaf == "running_var":
            _set(stats, base + ".var", v)
        else:
            raise KeyError(f"unhandled torch key: {k}")
    return params, stats


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a .pth/.ckpt as a numpy state_dict (torch-only caller process)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("model_state_dict", "state_dict", "model"):
        if isinstance(ckpt, dict) and key in ckpt:
            ckpt = ckpt[key]
            break
    return {k: v.detach().cpu().numpy() for k, v in ckpt.items()}
