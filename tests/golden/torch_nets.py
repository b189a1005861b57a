"""Torch mirrors of monohair_tpu.segment's nets (MODNet / BiSeNet / FAN).

Used ONLY by generate_golden.py (torch-only process) to produce conversion-
equivalence fixtures: each mirror names its submodules identically to the Flax
modules so its state_dict converts via segment.convert.convert_state_dict with
no rename hook. Architectures are re-derived from the papers the reference's
external checkpoints implement (calc_masks.py:21-28, dataprocess.py:327-537);
nothing here is imported at test or pipeline runtime.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


def _up2(x):
    return F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=False)


def _resize(x, size):
    return F.interpolate(x, size=size, mode="bilinear", align_corners=False)


def make_divisible(v, divisor=8):
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class IBNormT(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.bnorm = nn.BatchNorm2d(c // 2, eps=1e-5)
        self.inorm = nn.InstanceNorm2d(c - c // 2, eps=1e-5, affine=True)

    def forward(self, x):
        bc = self.bnorm.num_features
        return torch.cat([self.bnorm(x[:, :bc]), self.inorm(x[:, bc:])], 1)


class ConvIBNormReluT(nn.Module):
    def __init__(self, in_ch, out_ch, k, stride=1, with_ibn=True, with_relu=True):
        super().__init__()
        self.conv = nn.Conv2d(in_ch, out_ch, k, stride, k // 2, bias=not with_ibn)
        self.with_ibn, self.with_relu = with_ibn, with_relu
        if with_ibn:
            self.ibn = IBNormT(out_ch)

    def forward(self, x):
        x = self.conv(x)
        if self.with_ibn:
            x = self.ibn(x)
        return F.relu(x) if self.with_relu else x


class SEBlockT(nn.Module):
    def __init__(self, c, reduction=4):
        super().__init__()
        self.fc1 = nn.Linear(c, max(c // reduction, 1))
        self.fc2 = nn.Linear(max(c // reduction, 1), c)

    def forward(self, x):
        w = x.mean((2, 3))
        w = torch.sigmoid(self.fc2(F.relu(self.fc1(w))))
        return x * w[:, :, None, None]


class _ConvBNReLU6T(nn.Module):
    def __init__(self, in_ch, out_ch, k=3, stride=1, groups=1):
        super().__init__()
        self.conv = nn.Conv2d(in_ch, out_ch, k, stride, k // 2, groups=groups,
                              bias=False)
        self.bn = nn.BatchNorm2d(out_ch, eps=1e-5)

    def forward(self, x):
        return F.relu6(self.bn(self.conv(x)))


class InvertedResidualT(nn.Module):
    def __init__(self, in_ch, out_ch, stride, expand):
        super().__init__()
        hidden = int(round(in_ch * expand))
        self.use_res = stride == 1 and in_ch == out_ch
        if expand != 1:
            self.pw = _ConvBNReLU6T(in_ch, hidden, 1)
        self.dw = _ConvBNReLU6T(hidden, hidden, 3, stride, groups=hidden)
        self.pwl = nn.Conv2d(hidden, out_ch, 1, bias=False)
        self.pwl_bn = nn.BatchNorm2d(out_ch, eps=1e-5)
        self.expand = expand

    def forward(self, x):
        y = self.pw(x) if self.expand != 1 else x
        y = self.pwl_bn(self.pwl(self.dw(y)))
        return x + y if self.use_res else y


MBV2_CFG = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
            (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1))


class MobileNetV2T(nn.Module):
    def __init__(self, width=1.0):
        super().__init__()
        ch = make_divisible(32 * width)
        self.stem = _ConvBNReLU6T(3, ch, 3, 2)
        idx = 0
        self.tap_idx = {}
        for t, c, n, s in MBV2_CFG:
            out_ch = make_divisible(c * width)
            for i in range(n):
                setattr(self, f"block{idx}",
                        InvertedResidualT(ch, out_ch, s if i == 0 else 1, t))
                ch = out_ch
                idx += 1
            if c == 16:
                self.tap_idx["enc2x"] = idx - 1
            elif c == 24:
                self.tap_idx["enc4x"] = idx - 1
        self.n_blocks = idx
        head = max(make_divisible(1280 * width), 32)
        self.head = _ConvBNReLU6T(ch, head, 1)

    def forward(self, x):
        x = self.stem(x)
        taps = {}
        for i in range(self.n_blocks):
            x = getattr(self, f"block{i}")(x)
            for k, v in self.tap_idx.items():
                if v == i:
                    taps[k] = x
        return taps["enc2x"], taps["enc4x"], self.head(x)


class LRBranchT(nn.Module):
    def __init__(self, enc32_ch, width):
        super().__init__()
        c16, c8 = max(int(96 * width), 8), max(int(32 * width), 4)
        self.se_block = SEBlockT(enc32_ch)
        self.conv_lr16x = ConvIBNormReluT(enc32_ch, c16, 5)
        self.conv_lr8x = ConvIBNormReluT(c16, c8, 5)
        self.conv_lr = ConvIBNormReluT(c8, 1, 3, with_ibn=False, with_relu=False)

    def forward(self, enc32x):
        x = _up2(self.se_block(enc32x))
        x = self.conv_lr16x(x)
        lr8x = self.conv_lr8x(_up2(x))
        return torch.sigmoid(self.conv_lr(lr8x)), lr8x


class HRBranchT(nn.Module):
    def __init__(self, enc2_ch, enc4_ch, lr8_ch, width):
        super().__init__()
        hr = max(int(32 * width), 4)
        self.tohr_enc2x = ConvIBNormReluT(enc2_ch, hr, 1)
        self.conv_enc2x = ConvIBNormReluT(hr + 3, hr, 3, 2)
        self.tohr_enc4x = ConvIBNormReluT(enc4_ch, hr, 1)
        self.conv_enc4x = ConvIBNormReluT(2 * hr, 2 * hr, 3)
        chans4 = (2 * hr, 2 * hr, hr)
        inc = 2 * hr + lr8_ch + 3
        for i, c in enumerate(chans4):
            setattr(self, f"conv_hr4x_{i}", ConvIBNormReluT(inc, c, 3))
            inc = c
        chans2 = (2 * hr, hr, hr, hr)
        inc = hr + hr
        for i, c in enumerate(chans2):
            setattr(self, f"conv_hr2x_{i}", ConvIBNormReluT(inc, c, 3))
            inc = c
        self.conv_hr_0 = ConvIBNormReluT(hr + 3, hr, 3)
        self.conv_hr_1 = ConvIBNormReluT(hr, 1, 1, with_ibn=False, with_relu=False)

    def forward(self, img, enc2x, enc4x, lr8x):
        img2x = _resize(img, (img.shape[2] // 2, img.shape[3] // 2))
        img4x = _resize(img, (img.shape[2] // 4, img.shape[3] // 4))
        enc2x = self.tohr_enc2x(enc2x)
        hr4x = self.conv_enc2x(torch.cat([img2x, enc2x], 1))
        enc4x = self.tohr_enc4x(enc4x)
        hr4x = self.conv_enc4x(torch.cat([hr4x, enc4x], 1))
        x = torch.cat([hr4x, _up2(lr8x), img4x], 1)
        for i in range(3):
            x = getattr(self, f"conv_hr4x_{i}")(x)
        x = torch.cat([_up2(x), enc2x], 1)
        for i in range(4):
            x = getattr(self, f"conv_hr2x_{i}")(x)
        hr2x = x
        d = self.conv_hr_0(torch.cat([_up2(hr2x), img], 1))
        return torch.sigmoid(self.conv_hr_1(d)), hr2x


class FusionBranchT(nn.Module):
    def __init__(self, lr8_ch, width):
        super().__init__()
        hr = max(int(32 * width), 4)
        self.conv_lr4x = ConvIBNormReluT(lr8_ch, hr, 5)
        self.conv_f2x = ConvIBNormReluT(2 * hr, hr, 3)
        self.conv_f_0 = ConvIBNormReluT(hr + 3, max(hr // 2, 2), 3)
        self.conv_f_1 = ConvIBNormReluT(max(hr // 2, 2), 1, 1,
                                        with_ibn=False, with_relu=False)

    def forward(self, img, lr8x, hr2x):
        lr2x = _up2(self.conv_lr4x(_up2(lr8x)))
        f2x = self.conv_f2x(torch.cat([lr2x, hr2x], 1))
        f = self.conv_f_0(torch.cat([_up2(f2x), img], 1))
        return torch.sigmoid(self.conv_f_1(f))


class MODNetTorch(nn.Module):
    def __init__(self, width=1.0):
        super().__init__()
        self.backbone = MobileNetV2T(width)
        c2 = make_divisible(16 * width)
        c4 = make_divisible(24 * width)
        c32 = max(make_divisible(1280 * width), 32)
        lr8 = max(int(32 * width), 4)
        self.lr_branch = LRBranchT(c32, width)
        self.hr_branch = HRBranchT(c2, c4, lr8, width)
        self.f_branch = FusionBranchT(lr8, width)

    def forward(self, img):
        enc2x, enc4x, enc32x = self.backbone(img)
        semantic, lr8x = self.lr_branch(enc32x)
        detail, hr2x = self.hr_branch(img, enc2x, enc4x, lr8x)
        matte = self.f_branch(img, lr8x, hr2x)
        return semantic, detail, matte


# ---------------------------------------------------------------- BiSeNet


class ConvBNReLUT(nn.Module):
    def __init__(self, in_ch, out_ch, k=3, stride=1, with_relu=True):
        super().__init__()
        self.conv = nn.Conv2d(in_ch, out_ch, k, stride, k // 2, bias=False)
        self.bn = nn.BatchNorm2d(out_ch, eps=1e-5)
        self.with_relu = with_relu

    def forward(self, x):
        x = self.bn(self.conv(x))
        return F.relu(x) if self.with_relu else x


class BasicBlockT(nn.Module):
    def __init__(self, in_ch, out_ch, stride=1):
        super().__init__()
        self.conv1 = ConvBNReLUT(in_ch, out_ch, 3, stride)
        self.conv2 = ConvBNReLUT(out_ch, out_ch, 3, 1, with_relu=False)
        self.has_down = stride != 1 or in_ch != out_ch
        if self.has_down:
            self.down = ConvBNReLUT(in_ch, out_ch, 1, stride, with_relu=False)

    def forward(self, x):
        y = self.conv2(self.conv1(x))
        if self.has_down:
            x = self.down(x)
        return F.relu(x + y)


class ResNet18T(nn.Module):
    def __init__(self, width=1.0):
        super().__init__()
        self.stem = ConvBNReLUT(3, int(64 * width), 7, 2)
        ch = int(64 * width)
        for li, (c, s) in enumerate(((64, 1), (128, 2), (256, 2), (512, 2))):
            for bi in range(2):
                setattr(self, f"layer{li + 1}_{bi}",
                        BasicBlockT(ch, int(c * width), s if bi == 0 else 1))
                ch = int(c * width)

    def forward(self, x):
        x = F.max_pool2d(self.stem(x), 3, 2, 1)
        feats = []
        for li in range(4):
            for bi in range(2):
                x = getattr(self, f"layer{li + 1}_{bi}")(x)
            feats.append(x)
        return feats[1], feats[2], feats[3]


class AttentionRefinementT(nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.conv = ConvBNReLUT(in_ch, out_ch, 3)
        self.conv_atten = nn.Conv2d(out_ch, out_ch, 1, bias=False)
        self.bn_atten = nn.BatchNorm2d(out_ch, eps=1e-5)

    def forward(self, x):
        feat = self.conv(x)
        att = feat.mean((2, 3), keepdim=True)
        att = torch.sigmoid(self.bn_atten(self.conv_atten(att)))
        return feat * att


class ContextPathT(nn.Module):
    def __init__(self, width=1.0):
        super().__init__()
        mid = max(int(128 * width), 8)
        self.resnet = ResNet18T(width)
        c8, c16, c32 = int(128 * width), int(256 * width), int(512 * width)
        self.conv_avg = ConvBNReLUT(c32, mid, 1)
        self.arm32 = AttentionRefinementT(c32, mid)
        self.conv_head32 = ConvBNReLUT(mid, mid, 3)
        self.arm16 = AttentionRefinementT(c16, mid)
        self.conv_head16 = ConvBNReLUT(mid, mid, 3)

    def forward(self, x):
        feat8, feat16, feat32 = self.resnet(x)
        avg = self.conv_avg(feat32.mean((2, 3), keepdim=True))
        avg_up = avg.expand(-1, -1, feat32.shape[2], feat32.shape[3])
        f32 = self.arm32(feat32) + avg_up
        f32_up = self.conv_head32(_resize(f32, feat16.shape[2:]))
        f16 = self.arm16(feat16) + f32_up
        f16_up = self.conv_head16(_resize(f16, feat8.shape[2:]))
        return feat8, f16_up, f32_up


class FeatureFusionT(nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.convblk = ConvBNReLUT(in_ch, out_ch, 1)
        self.conv1 = nn.Conv2d(out_ch, out_ch // 4, 1, bias=False)
        self.conv2 = nn.Conv2d(out_ch // 4, out_ch, 1, bias=False)

    def forward(self, fsp, fcp):
        feat = self.convblk(torch.cat([fsp, fcp], 1))
        att = feat.mean((2, 3), keepdim=True)
        att = torch.sigmoid(self.conv2(F.relu(self.conv1(att))))
        return feat + feat * att


class SegHeadT(nn.Module):
    def __init__(self, in_ch, mid_ch, n_classes):
        super().__init__()
        self.conv = ConvBNReLUT(in_ch, mid_ch, 3)
        self.conv_out = nn.Conv2d(mid_ch, n_classes, 1, bias=False)

    def forward(self, x):
        return self.conv_out(self.conv(x))


class BiSeNetTorch(nn.Module):
    def __init__(self, n_classes=19, width=1.0):
        super().__init__()
        mid = max(int(128 * width), 8)
        fuse = max(int(256 * width), 16)
        self.cp = ContextPathT(width)
        self.ffm = FeatureFusionT(int(128 * width) + mid, fuse)
        self.conv_out = SegHeadT(fuse, fuse, n_classes)
        self.conv_out16 = SegHeadT(mid, max(int(64 * width), 8), n_classes)
        self.conv_out32 = SegHeadT(mid, max(int(64 * width), 8), n_classes)

    def forward(self, img):
        size = img.shape[2:]
        feat_sp, feat_cp8, feat_cp16 = self.cp(img)
        feat_fuse = self.ffm(feat_sp, feat_cp8)
        out = _resize(self.conv_out(feat_fuse), size)
        out16 = _resize(self.conv_out16(feat_cp8), size)
        out32 = _resize(self.conv_out32(feat_cp16), size)
        return out, out16, out32


# -------------------------------------------------------------------- FAN


class FANConvBlockT(nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.bn1 = nn.BatchNorm2d(in_ch, eps=1e-5)
        self.conv1 = nn.Conv2d(in_ch, out_ch // 2, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(out_ch // 2, eps=1e-5)
        self.conv2 = nn.Conv2d(out_ch // 2, out_ch // 4, 3, 1, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(out_ch // 4, eps=1e-5)
        self.conv3 = nn.Conv2d(out_ch // 4, out_ch // 4, 3, 1, 1, bias=False)
        self.has_down = in_ch != out_ch
        if self.has_down:
            self.down_bn = nn.BatchNorm2d(in_ch, eps=1e-5)
            self.down_conv = nn.Conv2d(in_ch, out_ch, 1, bias=False)

    def forward(self, x):
        y1 = self.conv1(F.relu(self.bn1(x)))
        y2 = self.conv2(F.relu(self.bn2(y1)))
        y3 = self.conv3(F.relu(self.bn3(y2)))
        out = torch.cat([y1, y2, y3], 1)
        if self.has_down:
            x = self.down_conv(F.relu(self.down_bn(x)))
        return out + x


class HourGlassT(nn.Module):
    def __init__(self, depth, features):
        super().__init__()
        self.depth = depth
        for level in range(1, depth + 1):
            setattr(self, f"b1_{level}", FANConvBlockT(features, features))
            setattr(self, f"b2_{level}", FANConvBlockT(features, features))
            if level == 1:
                setattr(self, f"b2_plus_{level}", FANConvBlockT(features, features))
            setattr(self, f"b3_{level}", FANConvBlockT(features, features))

    def _fwd(self, level, inp):
        up1 = getattr(self, f"b1_{level}")(inp)
        low = F.avg_pool2d(inp, 2, 2)
        low = getattr(self, f"b2_{level}")(low)
        if level > 1:
            low = self._fwd(level - 1, low)
        else:
            low = getattr(self, f"b2_plus_{level}")(low)
        low = getattr(self, f"b3_{level}")(low)
        up2 = F.interpolate(low, scale_factor=2, mode="nearest")
        return up1 + up2

    def forward(self, x):
        return self._fwd(self.depth, x)


class FANTorch(nn.Module):
    def __init__(self, num_modules=4, depth=4, width=1.0, num_landmarks=68):
        super().__init__()
        f = max(int(256 * width), 16)
        c64 = max(int(64 * width), 8)
        c128 = max(int(128 * width), 8)
        self.num_modules = num_modules
        self.conv1 = nn.Conv2d(3, c64, 7, 2, 3)
        self.bn1 = nn.BatchNorm2d(c64, eps=1e-5)
        self.conv2 = FANConvBlockT(c64, c128)
        self.conv3 = FANConvBlockT(c128, c128)
        self.conv4 = FANConvBlockT(c128, f)
        for m in range(num_modules):
            setattr(self, f"m{m}", HourGlassT(depth, f))
            setattr(self, f"top_m_{m}", FANConvBlockT(f, f))
            setattr(self, f"conv_last{m}", nn.Conv2d(f, f, 1))
            setattr(self, f"bn_end{m}", nn.BatchNorm2d(f, eps=1e-5))
            setattr(self, f"l{m}", nn.Conv2d(f, num_landmarks, 1))
            if m < num_modules - 1:
                setattr(self, f"bl{m}", nn.Conv2d(f, f, 1))
                setattr(self, f"al{m}", nn.Conv2d(num_landmarks, f, 1))

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.avg_pool2d(self.conv2(x), 2, 2)
        x = self.conv3(x)
        x = self.conv4(x)
        outputs = []
        for m in range(self.num_modules):
            hg = getattr(self, f"m{m}")(x)
            ll = getattr(self, f"top_m_{m}")(hg)
            ll = F.relu(getattr(self, f"bn_end{m}")(getattr(self, f"conv_last{m}")(ll)))
            heat = getattr(self, f"l{m}")(ll)
            outputs.append(heat)
            if m < self.num_modules - 1:
                x = x + getattr(self, f"bl{m}")(ll) + getattr(self, f"al{m}")(heat)
        return outputs


# -----------------------------------------------------------------------------
# DeepMVSHair Occ_attn / Ori_attn mirror (whole-net conversion equivalence).
# State-dict key paths reproduce the reference checkpoints' module naming
# (pifu_attn.py / UnetSimple.py / ViT.py) so models.convert.convert_pifu_checkpoint
# maps them with zero rename hooks — exactly like the real occ.pth / ori.pth.
# -----------------------------------------------------------------------------


class _MVSDoubleConv(nn.Module):
    def __init__(self, cin, cout, ksize=3):
        super().__init__()
        self.double_conv = nn.Sequential(
            nn.Conv2d(cin, cout, ksize, padding=ksize // 2),
            nn.BatchNorm2d(cout), nn.ReLU(inplace=True),
            nn.Conv2d(cout, cout, ksize, padding=ksize // 2),
            nn.BatchNorm2d(cout), nn.ReLU(inplace=True))

    def forward(self, x):
        return self.double_conv(x)


class _MVSDown(nn.Module):
    def __init__(self, cin, cout, ksize=3):
        super().__init__()
        self.maxpool_conv = nn.Sequential(nn.MaxPool2d(2),
                                          _MVSDoubleConv(cin, cout, ksize))

    def forward(self, x):
        return self.maxpool_conv(x)


class _MVSUp(nn.Module):
    def __init__(self, cin, cout, ksize=3):
        super().__init__()
        self.up = nn.ConvTranspose2d(cin, cin // 2, ksize, stride=2,
                                     padding=ksize // 2, output_padding=ksize // 2)
        self.conv = _MVSDoubleConv(cin, cout)

    def forward(self, x1, x2):
        return self.conv(torch.cat([x2, self.up(x1)], 1))


class UNetSimpleTorch(nn.Module):
    def __init__(self, in_feat=4, ksize=5, num_chan=(16, 32, 64, 128)):
        super().__init__()
        self.inc = _MVSDoubleConv(in_feat, num_chan[0], ksize)
        self.down1 = _MVSDown(num_chan[0], num_chan[1], ksize)
        self.down2 = _MVSDown(num_chan[1], num_chan[2], ksize)
        self.down3 = _MVSDown(num_chan[2], num_chan[3], ksize)
        self.up1 = _MVSUp(num_chan[3], num_chan[2], 3)
        self.up2 = _MVSUp(num_chan[2], num_chan[1], 3)
        self.up3 = _MVSUp(num_chan[1], num_chan[0], 3)
        self.output_feat = sum(num_chan)

    def get_feat(self, x):
        fi = self.inc(x)
        d1 = self.down1(fi)
        d2 = self.down2(d1)
        d3 = self.down3(d2)
        u1 = self.up1(d3, d2)
        u2 = self.up2(u1, d1)
        u3 = self.up3(u2, fi)
        return [d3, u1, u2, u3]


class _Permute(nn.Module):
    def __init__(self, dims):
        super().__init__()
        self.dims = dims

    def forward(self, x):
        return x.permute(*self.dims)


class _MVSAttention(nn.Module):
    def __init__(self, dim, heads, dim_head):
        super().__init__()
        inner = heads * dim_head
        self.heads = heads
        self.scale = dim_head ** -0.5
        self.to_qkv = nn.Linear(dim, inner * 3, bias=False)
        self.reattn_weights = nn.Parameter(torch.randn(heads, heads))
        self.reattn_norm = nn.Sequential(_Permute((0, 2, 3, 1)),
                                         nn.LayerNorm(heads),
                                         _Permute((0, 3, 1, 2)))
        self.to_out = nn.Sequential(nn.Linear(inner, dim), nn.Dropout(0.0))

    def forward(self, x):
        b, n, _ = x.shape
        h = self.heads
        q, k, v = self.to_qkv(x).chunk(3, dim=-1)
        q, k, v = (t.reshape(b, n, h, -1).permute(0, 2, 1, 3) for t in (q, k, v))
        attn = (q @ k.transpose(-1, -2) * self.scale).softmax(-1)
        attn = torch.einsum("bhij,hg->bgij", attn, self.reattn_weights)
        attn = self.reattn_norm(attn)
        out = (attn @ v).permute(0, 2, 1, 3).reshape(b, n, -1)
        return self.to_out(out)


class _PreNormResidual(nn.Module):
    def __init__(self, dim, fn):
        super().__init__()
        self.fn = _WrapNorm(dim, fn)

    def forward(self, x):
        return self.fn(x) + x


class _WrapNorm(nn.Module):
    def __init__(self, dim, fn):
        super().__init__()
        self.norm = nn.LayerNorm(dim)
        self.fn = fn

    def forward(self, x):
        return self.fn(self.norm(x))


class _MVSFeedForward(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.net = nn.Sequential(nn.Linear(dim, hidden), nn.GELU(),
                                 nn.Dropout(0.0), nn.Linear(hidden, dim))

    def forward(self, x):
        return self.net(x)


class _MVSTransformer(nn.Module):
    def __init__(self, dim, depth, heads, dim_head, mlp_dim):
        super().__init__()
        self.layers = nn.ModuleList(
            [nn.ModuleList([_PreNormResidual(dim, _MVSAttention(dim, heads, dim_head)),
                            _PreNormResidual(dim, _MVSFeedForward(dim, mlp_dim))])
             for _ in range(depth)])

    def forward(self, x):
        for attn, ff in self.layers:
            x = ff(attn(x))
        return x


class OccViTTorch(nn.Module):
    def __init__(self, output_dim, token_dim, feat_dim, pt_dim, depth, heads,
                 dim_head, mlp_dim, num_views):
        super().__init__()
        self.view_fuse_pt = nn.Linear(feat_dim + pt_dim, token_dim)
        self.cls_token = nn.Parameter(torch.randn(1, 1, token_dim))
        self.cls_fuse_pt = nn.Linear(token_dim + pt_dim, token_dim)
        self.pos_embedding = nn.Parameter(torch.randn(1, num_views + 1, token_dim))
        self.transformer = _MVSTransformer(token_dim, depth, heads, dim_head, mlp_dim)
        self.mlp_head = nn.Sequential(
            nn.LayerNorm(token_dim), nn.Linear(token_dim, token_dim), nn.ReLU(),
            nn.Linear(token_dim, token_dim), nn.ReLU(),
            nn.Linear(token_dim, output_dim))

    def forward(self, img_feat, pts_world_feat, pts_view_feat):
        n = img_feat.shape[0]
        view_tokens = self.view_fuse_pt(torch.cat([img_feat, pts_view_feat], -1))
        cls = self.cls_token.expand(n, -1, -1)
        cls = self.cls_fuse_pt(torch.cat([cls, pts_world_feat], -1))
        y = torch.cat([cls, view_tokens], 1) + self.pos_embedding
        y = self.transformer(y)
        return self.mlp_head(y[:, 0])


def _nerf_embed(x, num_freqs=5):
    out = [x]
    for k in range(num_freqs):
        out += [torch.sin(x * 2.0 ** k), torch.cos(x * 2.0 ** k)]
    return torch.cat(out, -1)


class PifuAttnTorch(nn.Module):
    """Occ_attn (vit_attr='occ_vit') / Ori_attn (vit_attr='vit', normalized)."""

    def __init__(self, vit_attr, output_dim, in_feat=4, vit_dim=32, vit_depth=2,
                 vit_heads=4, num_views=4, pt_res=5):
        super().__init__()
        self.backbone = UNetSimpleTorch(in_feat=in_feat, ksize=5)
        pt_dim = 3 * (1 + 2 * pt_res)
        self.vit_attr = vit_attr
        self.pt_res = pt_res
        setattr(self, vit_attr,
                OccViTTorch(output_dim, vit_dim, self.backbone.output_feat,
                            pt_dim, vit_depth, vit_heads, vit_dim, vit_dim,
                            num_views))

    def forward(self, imgs, pts_world, pts_view, sample_coord):
        feats = self.backbone.get_feat(imgs)
        sample_feats = torch.cat(
            [F.grid_sample(f, sample_coord, align_corners=False).squeeze(3)
             for f in feats], 1)
        img_feat = sample_feats.permute(2, 0, 1)
        out = getattr(self, self.vit_attr)(
            img_feat, _nerf_embed(pts_world, self.pt_res)[:, None],
            _nerf_embed(pts_view, self.pt_res).permute(1, 0, 2))
        if self.vit_attr == "vit":                   # Ori_attn normalizes
            out = F.normalize(out, dim=1)
        return out
