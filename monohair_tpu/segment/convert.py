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


def rename_public_modnet(key: str) -> Optional[str]:
    """Best-effort mapping of the public MODNet checkpoint's key scheme
    (modnet_photographic_portrait_matting.ckpt: backbone.model.features.N,
    Conv2dIBNormRelu 'layers' Sequentials, Sequential decoder stacks) onto
    this package's module names. Verified structurally against the MODNet
    paper's architecture; spot-check converted mattes before production use."""
    k = key
    if ".layers.0." in k:
        k = k.replace(".layers.0.", ".conv.")
    if ".layers.1." in k:
        k = k.replace(".layers.1.", ".ibn.")
    # sequential decoder stacks -> flattened names
    for seq in ("conv_hr4x", "conv_hr2x", "conv_hr", "conv_f"):
        for i in range(4):
            k = k.replace(f".{seq}.{i}.", f".{seq}_{i}.")
    k = k.replace("se_block.fc.0.", "se_block.fc1.")
    k = k.replace("se_block.fc.2.", "se_block.fc2.")
    if k.startswith("backbone.model.features."):
        rest = k[len("backbone.model.features."):]
        idx_s, sub = rest.split(".", 1)
        idx = int(idx_s)
        if idx == 0:
            sub = sub.replace("0.", "conv.", 1).replace("1.", "bn.", 1)
            return f"backbone.stem.{sub}"
        if idx == 18:
            sub = sub.replace("0.", "conv.", 1).replace("1.", "bn.", 1)
            return f"backbone.head.{sub}"
        block = idx - 1
        # InvertedResidual.conv Sequential indices -> named children
        if block == 0:  # expand==1: dw(0,1), pwl(3), pwl_bn(4)
            table = {"conv.0": "dw.conv", "conv.1": "dw.bn",
                     "conv.3": "pwl", "conv.4": "pwl_bn"}
        else:
            table = {"conv.0": "pw.conv", "conv.1": "pw.bn",
                     "conv.3": "dw.conv", "conv.4": "dw.bn",
                     "conv.6": "pwl", "conv.7": "pwl_bn"}
        for old, new in table.items():
            if sub.startswith(old + "."):
                return f"backbone.block{block}.{new}.{sub[len(old) + 1:]}"
        return f"backbone.block{block}.{sub}"
    return k


def rename_public_bisenet(key: str) -> Optional[str]:
    """face-parsing.PyTorch BiSeNet keys -> this package's names (only the
    resnet stem/layer naming differs; heads/ARM/FFM names already match)."""
    k = key
    k = k.replace("cp.resnet.conv1.", "cp.resnet.stem.conv.")
    k = k.replace("cp.resnet.bn1.", "cp.resnet.stem.bn.")
    for li in range(1, 5):
        for bi in range(2):
            p = f"cp.resnet.layer{li}.{bi}."
            if k.startswith(p):
                rest = k[len(p):]
                rest = rest.replace("conv1.", "conv1.conv.", 1) \
                    if rest.startswith("conv1.") else rest
                rest = rest.replace("bn1.", "conv1.bn.", 1) \
                    if rest.startswith("bn1.") else rest
                rest = rest.replace("conv2.", "conv2.conv.", 1) \
                    if rest.startswith("conv2.") else rest
                rest = rest.replace("bn2.", "conv2.bn.", 1) \
                    if rest.startswith("bn2.") else rest
                rest = rest.replace("downsample.0.", "down.conv.", 1)
                rest = rest.replace("downsample.1.", "down.bn.", 1)
                return f"cp.resnet.layer{li}_{bi}.{rest}"
    return k


def rename_public_fan(key: str) -> Optional[str]:
    """face_alignment FAN keys -> this package's names (ConvBlock downsample
    Sequential is the only difference)."""
    return key.replace("downsample.0.", "down_bn.").replace(
        "downsample.2.", "down_conv.")


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a .pth/.ckpt as a numpy state_dict (torch-only caller process)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("model_state_dict", "state_dict", "model"):
        if isinstance(ckpt, dict) and key in ckpt:
            ckpt = ckpt[key]
            break
    return {k: v.detach().cpu().numpy() for k, v in ckpt.items()}
