"""Torch checkpoint -> Flax parameter conversion for the DeepMVSHair nets.

The reference ships trained torch checkpoints (occ.pth / ori.pth, loaded at
mvs_eval.py:68,86). This module maps their state_dict naming (pifu_attn.py /
UnetSimple.py / ViT.py module paths) onto our Flax trees:

    backbone.inc.double_conv.{0,1,3,4}        -> backbone/inc/{conv0,bn0,conv1,bn1}
    backbone.downK.maxpool_conv.1.double_conv -> backbone/downK/...
    backbone.upK.up / .conv.double_conv       -> backbone/upK_up, upK_conv/...
    {occ_vit|vit}.view_fuse_pt, cls_fuse_pt, cls_token, pos_embedding
    .transformer.layers.D.0.fn.{norm,fn.to_qkv,fn.reattn_weights,
        fn.reattn_norm.1,fn.to_out.0}         -> vit/blockD/{norm1,attn/...}
    .transformer.layers.D.1.fn.{norm,fn.net.0,fn.net.3} -> vit/blockD/{norm2,ff1,ff2}
    .mlp_head.{0,1,3,5}                       -> vit/{head_norm,head1,head2,head_out}

Weight layout changes: Conv OIHW->HWIO; Linear (out,in)->(in,out); torch
ConvTranspose (in,out,kh,kw) -> spatially flipped HWIO (matching our
ConvTranspose2dTorch, models/unet.py).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _conv(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _convT(w):
    return np.ascontiguousarray(np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1)))


def _lin(w):
    return np.ascontiguousarray(np.transpose(w))


def _set(tree: dict, path: str, value):
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = np.asarray(value)


def _double_conv(sd, prefix: str, params: dict, stats: dict, out_prefix: str):
    for i, torch_i in (("0", "0"), ("1", "3")):
        conv_w = sd[f"{prefix}.{torch_i}.weight"]
        _set(params, f"{out_prefix}/conv{i}/kernel", _conv(conv_w))
        _set(params, f"{out_prefix}/conv{i}/bias", sd[f"{prefix}.{torch_i}.bias"])
        bn_i = str(int(torch_i) + 1)
        _set(params, f"{out_prefix}/bn{i}/scale", sd[f"{prefix}.{bn_i}.weight"])
        _set(params, f"{out_prefix}/bn{i}/bias", sd[f"{prefix}.{bn_i}.bias"])
        _set(stats, f"{out_prefix}/bn{i}/mean", sd[f"{prefix}.{bn_i}.running_mean"])
        _set(stats, f"{out_prefix}/bn{i}/var", sd[f"{prefix}.{bn_i}.running_var"])


def convert_pifu_checkpoint(state_dict: Dict[str, np.ndarray], vit_prefix: str
                            ) -> Tuple[dict, dict]:
    """Convert a torch Occ_attn/Ori_attn state_dict -> (params, batch_stats).

    vit_prefix: 'occ_vit' for the occupancy net, 'vit' for the orientation net
    (the only naming difference between the two, pifu_attn.py:176,288).
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: dict = {}
    stats: dict = {}

    _double_conv(sd, "backbone.inc.double_conv", params, stats, "backbone/inc")
    for k in (1, 2, 3):
        _double_conv(sd, f"backbone.down{k}.maxpool_conv.1.double_conv",
                     params, stats, f"backbone/down{k}")
    for k in (1, 2, 3):
        _set(params, f"backbone/up{k}_up/kernel", _convT(sd[f"backbone.up{k}.up.weight"]))
        _set(params, f"backbone/up{k}_up/bias", sd[f"backbone.up{k}.up.bias"])
        _double_conv(sd, f"backbone.up{k}.conv.double_conv", params, stats,
                     f"backbone/up{k}_conv")

    p = vit_prefix
    _set(params, "vit/view_fuse_pt/kernel", _lin(sd[f"{p}.view_fuse_pt.weight"]))
    _set(params, "vit/view_fuse_pt/bias", sd[f"{p}.view_fuse_pt.bias"])
    _set(params, "vit/cls_token", sd[f"{p}.cls_token"])
    _set(params, "vit/cls_fuse_pt/kernel", _lin(sd[f"{p}.cls_fuse_pt.weight"]))
    _set(params, "vit/cls_fuse_pt/bias", sd[f"{p}.cls_fuse_pt.bias"])
    if f"{p}.pos_embedding" in sd:
        _set(params, "vit/pos_embedding", sd[f"{p}.pos_embedding"])

    d = 0
    while f"{p}.transformer.layers.{d}.0.fn.norm.weight" in sd:
        base = f"{p}.transformer.layers.{d}"
        blk = f"vit/block{d}"
        _set(params, f"{blk}/norm1/scale", sd[f"{base}.0.fn.norm.weight"])
        _set(params, f"{blk}/norm1/bias", sd[f"{base}.0.fn.norm.bias"])
        _set(params, f"{blk}/attn/to_qkv/kernel", _lin(sd[f"{base}.0.fn.fn.to_qkv.weight"]))
        _set(params, f"{blk}/attn/reattn_weights", sd[f"{base}.0.fn.fn.reattn_weights"])
        _set(params, f"{blk}/attn/reattn_norm/scale", sd[f"{base}.0.fn.fn.reattn_norm.1.weight"])
        _set(params, f"{blk}/attn/reattn_norm/bias", sd[f"{base}.0.fn.fn.reattn_norm.1.bias"])
        _set(params, f"{blk}/attn/to_out/kernel", _lin(sd[f"{base}.0.fn.fn.to_out.0.weight"]))
        _set(params, f"{blk}/attn/to_out/bias", sd[f"{base}.0.fn.fn.to_out.0.bias"])
        _set(params, f"{blk}/norm2/scale", sd[f"{base}.1.fn.norm.weight"])
        _set(params, f"{blk}/norm2/bias", sd[f"{base}.1.fn.norm.bias"])
        _set(params, f"{blk}/ff1/kernel", _lin(sd[f"{base}.1.fn.fn.net.0.weight"]))
        _set(params, f"{blk}/ff1/bias", sd[f"{base}.1.fn.fn.net.0.bias"])
        _set(params, f"{blk}/ff2/kernel", _lin(sd[f"{base}.1.fn.fn.net.3.weight"]))
        _set(params, f"{blk}/ff2/bias", sd[f"{base}.1.fn.fn.net.3.bias"])
        d += 1

    _set(params, "vit/head_norm/scale", sd[f"{p}.mlp_head.0.weight"])
    _set(params, "vit/head_norm/bias", sd[f"{p}.mlp_head.0.bias"])
    for name, idx in (("head1", 1), ("head2", 3), ("head_out", 5)):
        _set(params, f"vit/{name}/kernel", _lin(sd[f"{p}.mlp_head.{idx}.weight"]))
        _set(params, f"vit/{name}/bias", sd[f"{p}.mlp_head.{idx}.bias"])
    return params, stats


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a torch .pth (with 'model_state_dict', mvs_eval.py:68) as numpy."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt)
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}
