#!/usr/bin/env python
"""Generate torch golden fixtures (torch-only process — torch and XLA thread
pools deadlock flakily when mixed on single-core hosts, so tests compare
against these stored arrays instead of calling torch at test time).

Run: python tests/golden/generate_golden.py   (rewrites tests/golden/*.npz)
"""

import os

import numpy as np
import torch
import torch.nn.functional as F

torch.set_num_threads(1)
torch.manual_seed(0)
HERE = os.path.dirname(os.path.abspath(__file__))
rng = np.random.default_rng(0)


def grid_sample_case():
    feat = rng.normal(size=(1, 7, 12, 9)).astype(np.float32)
    coords = (rng.random((1, 40, 1, 2)).astype(np.float32) * 2.4 - 1.2)
    ref = F.grid_sample(torch.from_numpy(feat), torch.from_numpy(coords),
                        align_corners=False, padding_mode="zeros")
    return {"feat": feat, "coords": coords,
            "ref": ref[0, :, :, 0].T.numpy()}


def pool3d_case():
    vol = rng.random((9, 8, 7)).astype(np.float32)
    t = torch.from_numpy(vol)[None, None]
    out = {"vol": vol}
    for k in (3, 5):
        out[f"max{k}"] = F.max_pool3d(t, k, 1, k // 2)[0, 0].numpy()
        out[f"avg{k}"] = F.avg_pool3d(t, k, 1, k // 2)[0, 0].numpy()
    return out


def double_conv_case():
    tmod = torch.nn.Sequential(
        torch.nn.Conv2d(3, 8, 5, padding=2), torch.nn.BatchNorm2d(8), torch.nn.ReLU(),
        torch.nn.Conv2d(8, 8, 5, padding=2), torch.nn.BatchNorm2d(8), torch.nn.ReLU())
    with torch.no_grad():
        tmod[1].running_mean.normal_()
        tmod[1].running_var.uniform_(0.5, 2.0)
        tmod[4].running_mean.normal_()
        tmod[4].running_var.uniform_(0.5, 2.0)
    tmod.eval()
    x = rng.normal(size=(2, 10, 12, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tmod(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    out = {"x": x, "ref": ref}
    for k, m in enumerate(tmod):
        if hasattr(m, "weight"):
            for n, v in list(m.named_parameters()) + list(m.named_buffers()):
                out[f"sd.p.double_conv.{k}.{n}"] = v.detach().numpy()
    return out


def convtranspose_case():
    t = torch.nn.ConvTranspose2d(6, 3, 3, stride=2, padding=1, output_padding=1)
    x = rng.normal(size=(1, 7, 9, 6)).astype(np.float32)
    with torch.no_grad():
        ref = t(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    return {"x": x, "ref": ref, "weight": t.weight.detach().numpy(),
            "bias": t.bias.detach().numpy()}


def _randomize_running_stats(module):
    """Give BatchNorms non-trivial running stats so eval-mode equivalence is a
    real test (fresh stats are 0/1 and would hide scale/mean mix-ups)."""
    with torch.no_grad():
        for m in module.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)


def _net_case(net, inputs, outputs):
    """Flatten state_dict + io arrays into one npz dict."""
    out = {}
    for k, v in net.state_dict().items():
        out["sd." + k] = v.detach().numpy()
    for k, v in inputs.items():
        out["in." + k] = v
    for k, v in outputs.items():
        out["out." + k] = v.detach().numpy()
    return out


def modnet_case():
    from torch_nets import MODNetTorch
    net = MODNetTorch(width=0.25)
    _randomize_running_stats(net)
    net.eval()
    img = (rng.random((1, 3, 64, 64)).astype(np.float32) * 2 - 1)
    with torch.no_grad():
        semantic, detail, matte = net(torch.from_numpy(img))
    return _net_case(net, {"img": img},
                     {"semantic": semantic, "detail": detail, "matte": matte})


def bisenet_case():
    from torch_nets import BiSeNetTorch
    net = BiSeNetTorch(n_classes=19, width=0.125)
    _randomize_running_stats(net)
    net.eval()
    img = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        out, out16, out32 = net(torch.from_numpy(img))
    return _net_case(net, {"img": img},
                     {"out": out, "out16": out16, "out32": out32})


def fan_case():
    from torch_nets import FANTorch
    net = FANTorch(num_modules=2, depth=2, width=0.125)
    _randomize_running_stats(net)
    net.eval()
    img = rng.random((1, 3, 128, 128)).astype(np.float32)
    with torch.no_grad():
        heats = net(torch.from_numpy(img))
    return _net_case(net, {"img": img},
                     {"heat0": heats[0], "heat1": heats[1]})


def pifu_case(vit_attr):
    """Whole-net Occ_attn/Ori_attn conversion fixture (VERDICT item 6): a
    random-init torch net in the reference's exact state_dict naming, plus its
    outputs on fixed inputs. vit_attr: 'occ_vit' (occ) or 'vit' (ori)."""
    from torch_nets import PifuAttnTorch
    out_dim = 2 if vit_attr == "occ_vit" else 3
    net = PifuAttnTorch(vit_attr, out_dim, in_feat=4, vit_dim=32, vit_depth=2,
                        vit_heads=4, num_views=4)
    _randomize_running_stats(net)
    net.eval()
    imgs = rng.normal(size=(4, 4, 32, 32)).astype(np.float32)
    pts_world = (rng.random((6, 3)).astype(np.float32) - 0.5) * 0.4
    pts_view = rng.normal(size=(4, 6, 3)).astype(np.float32) * 0.3
    coord = (rng.random((4, 6, 1, 2)).astype(np.float32) * 1.6 - 0.8)
    with torch.no_grad():
        out = net(torch.from_numpy(imgs), torch.from_numpy(pts_world),
                  torch.from_numpy(pts_view), torch.from_numpy(coord))
    return _net_case(net, {"imgs": imgs, "pts_world": pts_world,
                           "pts_view": pts_view, "coord": coord},
                     {"out": out})


if __name__ == "__main__":
    import sys
    sys.path.insert(0, HERE)
    np.savez(os.path.join(HERE, "grid_sample.npz"), **grid_sample_case())
    np.savez(os.path.join(HERE, "pool3d.npz"), **pool3d_case())
    np.savez(os.path.join(HERE, "double_conv.npz"), **double_conv_case())
    np.savez(os.path.join(HERE, "convtranspose.npz"), **convtranspose_case())
    np.savez(os.path.join(HERE, "modnet.npz"), **modnet_case())
    np.savez(os.path.join(HERE, "bisenet.npz"), **bisenet_case())
    np.savez(os.path.join(HERE, "fan.npz"), **fan_case())
    np.savez(os.path.join(HERE, "pifu_occ.npz"), **pifu_case("occ_vit"))
    np.savez(os.path.join(HERE, "pifu_ori.npz"), **pifu_case("vit"))
    print("golden fixtures written to", HERE)
