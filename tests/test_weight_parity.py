"""Weight-conversion parity against INDEPENDENT torch models.

The self-round-trip test (test_models.py) cannot catch a systematic
layout misunderstanding shared by both conversion directions. These
tests initialize a genuinely independent torch implementation —
preferably the reference's own vendored source — randomize its
parameters AND BatchNorm running statistics, convert the torch state
dict into Flax variables, and compare activations on fixed inputs.
"""
import numpy as np
import pytest
import torch

import refbridge


def _randomize_module(m, seed):
    """Randomize parameters and BN buffers so layout mistakes can't hide
    behind zeros/ones defaults."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        for name, buf in m.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(torch.randn(buf.shape, generator=g) * 0.1)
            elif name.endswith("running_var"):
                buf.copy_(torch.rand(buf.shape, generator=g) * 0.5 + 0.75)


def _state_dict_np(m):
    return {k: v.detach().numpy().copy() for k, v in m.state_dict().items()}


# ---------------------------------------------------------------------------
# OSNet vs the reference's vendored torchreid source
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("ibn", [False, True])
def test_osnet_activation_parity(ibn):
    import jax.numpy as jnp
    from tracklab_tpu.models.osnet import OSNet
    from tracklab_tpu.models.convert import convert_osnet_torch

    refbridge.install_stubs()
    from strong_sort.deep.models import osnet as tosnet

    tm = tosnet.OSNet(num_classes=7, blocks=[tosnet.OSBlock] * 3,
                      layers=[2, 2, 2], channels=[16, 64, 96, 128],
                      IN=ibn)
    tm.eval()
    _randomize_module(tm, seed=3 + ibn)

    H, W = 256, 128
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, H, W, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    fm = OSNet(variant="x0_25", ibn=ibn)
    variables = convert_osnet_torch(_state_dict_np(tm), fm, (1, H, W, 3))
    out = fm.apply(variables, jnp.asarray(x), train=False)
    got = np.asarray(out["embeddings"])
    assert want.shape == got.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# YOLOX vs an independent torch implementation with the official Megvii
# module structure and state-dict naming (the reference consumes these
# weights via ONNX/rtmlib; no torch source is vendored, so the oracle is
# written here from the published architecture)
# ---------------------------------------------------------------------------

def _build_torch_yolox(num_classes, depth_mult, width_mult, depthwise):
    import torch.nn as nn

    def w(c):
        return max(int(round(c * width_mult / 8)) * 8, 8)

    def d(n):
        return max(int(round(n * depth_mult)), 1)

    class BaseConv(nn.Module):
        def __init__(self, cin, cout, k, s, groups=1):
            super().__init__()
            self.conv = nn.Conv2d(cin, cout, k, s, (k - 1) // 2,
                                  groups=groups, bias=False)
            self.bn = nn.BatchNorm2d(cout, eps=1e-3, momentum=0.03)
            self.act = nn.SiLU()

        def forward(self, x):
            return self.act(self.bn(self.conv(x)))

    class DWConv(nn.Module):
        def __init__(self, cin, cout, k, s):
            super().__init__()
            self.dconv = BaseConv(cin, cin, k, s, groups=cin)
            self.pconv = BaseConv(cin, cout, 1, 1)

        def forward(self, x):
            return self.pconv(self.dconv(x))

    Conv = DWConv if depthwise else (
        lambda cin, cout, k, s: BaseConv(cin, cout, k, s))

    class Bottleneck(nn.Module):
        def __init__(self, cin, cout, shortcut):
            super().__init__()
            self.conv1 = BaseConv(cin, cout, 1, 1)
            self.conv2 = Conv(cout, cout, 3, 1)
            self.add = shortcut and cin == cout

        def forward(self, x):
            y = self.conv2(self.conv1(x))
            return x + y if self.add else y

    class CSPLayer(nn.Module):
        def __init__(self, cin, cout, n, shortcut=True):
            super().__init__()
            hidden = cout // 2
            self.conv1 = BaseConv(cin, hidden, 1, 1)
            self.conv2 = BaseConv(cin, hidden, 1, 1)
            self.conv3 = BaseConv(2 * hidden, cout, 1, 1)
            self.m = nn.Sequential(*[Bottleneck(hidden, hidden, shortcut)
                                     for _ in range(n)])

        def forward(self, x):
            a = self.m(self.conv1(x))
            b = self.conv2(x)
            return self.conv3(torch.cat([a, b], dim=1))

    class SPPBottleneck(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            hidden = cin // 2
            self.conv1 = BaseConv(cin, hidden, 1, 1)
            self.m = nn.ModuleList([
                nn.MaxPool2d(k, 1, k // 2) for k in (5, 9, 13)])
            self.conv2 = BaseConv(hidden * 4, cout, 1, 1)

        def forward(self, x):
            x = self.conv1(x)
            return self.conv2(torch.cat(
                [x] + [m(x) for m in self.m], dim=1))

    class Focus(nn.Module):
        def __init__(self, cin, cout, k):
            super().__init__()
            self.conv = BaseConv(cin * 4, cout, k, 1)

        def forward(self, x):
            tl = x[..., ::2, ::2]
            bl = x[..., 1::2, ::2]
            tr = x[..., ::2, 1::2]
            br = x[..., 1::2, 1::2]
            return self.conv(torch.cat([tl, bl, tr, br], dim=1))

    class CSPDarknet(nn.Module):
        def __init__(self):
            super().__init__()
            self.stem = Focus(3, w(64), 3)
            self.dark2 = nn.Sequential(Conv(w(64), w(128), 3, 2),
                                       CSPLayer(w(128), w(128), d(3)))
            self.dark3 = nn.Sequential(Conv(w(128), w(256), 3, 2),
                                       CSPLayer(w(256), w(256), d(9)))
            self.dark4 = nn.Sequential(Conv(w(256), w(512), 3, 2),
                                       CSPLayer(w(512), w(512), d(9)))
            self.dark5 = nn.Sequential(
                Conv(w(512), w(1024), 3, 2),
                SPPBottleneck(w(1024), w(1024)),
                CSPLayer(w(1024), w(1024), d(3), shortcut=False))

        def forward(self, x):
            x = self.stem(x)
            x = self.dark2(x)
            c3 = self.dark3(x)
            c4 = self.dark4(c3)
            c5 = self.dark5(c4)
            return c3, c4, c5

    class YOLOPAFPN(nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = CSPDarknet()
            self.upsample = nn.Upsample(scale_factor=2, mode="nearest")
            self.lateral_conv0 = BaseConv(w(1024), w(512), 1, 1)
            self.C3_p4 = CSPLayer(2 * w(512), w(512), d(3), False)
            self.reduce_conv1 = BaseConv(w(512), w(256), 1, 1)
            self.C3_p3 = CSPLayer(2 * w(256), w(256), d(3), False)
            self.bu_conv2 = Conv(w(256), w(256), 3, 2)
            self.C3_n3 = CSPLayer(2 * w(256), w(512), d(3), False)
            self.bu_conv1 = Conv(w(512), w(512), 3, 2)
            self.C3_n4 = CSPLayer(2 * w(512), w(1024), d(3), False)

        def forward(self, x):
            c3, c4, c5 = self.backbone(x)
            p5 = self.lateral_conv0(c5)
            m4 = self.C3_p4(torch.cat([self.upsample(p5), c4], 1))
            p4 = self.reduce_conv1(m4)
            out3 = self.C3_p3(torch.cat([self.upsample(p4), c3], 1))
            out4 = self.C3_n3(torch.cat([self.bu_conv2(out3), p4], 1))
            out5 = self.C3_n4(torch.cat([self.bu_conv1(out4), p5], 1))
            return out3, out4, out5

    class YOLOXHead(nn.Module):
        def __init__(self):
            super().__init__()
            hidden = w(256)
            self.cls_convs = nn.ModuleList()
            self.reg_convs = nn.ModuleList()
            self.cls_preds = nn.ModuleList()
            self.reg_preds = nn.ModuleList()
            self.obj_preds = nn.ModuleList()
            self.stems = nn.ModuleList()
            for _ in range(3):
                self.stems.append(BaseConv(hidden, hidden, 1, 1))
                self.cls_convs.append(nn.Sequential(
                    Conv(hidden, hidden, 3, 1), Conv(hidden, hidden, 3, 1)))
                self.reg_convs.append(nn.Sequential(
                    Conv(hidden, hidden, 3, 1), Conv(hidden, hidden, 3, 1)))
                self.cls_preds.append(nn.Conv2d(hidden, num_classes, 1))
                self.reg_preds.append(nn.Conv2d(hidden, 4, 1))
                self.obj_preds.append(nn.Conv2d(hidden, 1, 1))

        def forward(self, feats):
            outs = []
            for i, x in enumerate(feats):
                s = self.stems[i](x)
                c = self.cls_convs[i](s)
                r = self.reg_convs[i](s)
                outs.append(torch.cat([self.reg_preds[i](r),
                                       self.obj_preds[i](r),
                                       self.cls_preds[i](c)], dim=1))
            return outs

    class TorchYOLOX(nn.Module):
        def __init__(self):
            super().__init__()
            # stem output width == head stem input only when the PAFPN
            # level widths match the head hidden — true for all variants
            self.backbone = YOLOPAFPN()
            self.head = YOLOXHead()

        def forward(self, x):
            return self.head(self.backbone(x))

    # fix head stem in-channels per level (w256, w512, w1024)
    m = TorchYOLOX()
    hidden = w(256)
    for i, cin in enumerate((w(256), w(512), w(1024))):
        m.head.stems[i] = BaseConv(cin, hidden, 1, 1)
    return m


@pytest.mark.parametrize("variant", ["nano", "tiny"])
def test_yolox_activation_parity(variant):
    import jax.numpy as jnp
    from tracklab_tpu.models.yolox import YOLOX, YOLOX_VARIANTS
    from tracklab_tpu.models.convert import convert_yolox_torch

    v = YOLOX_VARIANTS[variant]
    tm = _build_torch_yolox(3, v["depth_mult"], v["width_mult"],
                            v["depthwise"])
    tm.eval()
    _randomize_module(tm, seed=11)

    H = W = 64
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, H, W, 3)).astype(np.float32)
    with torch.no_grad():
        want = [o.numpy() for o in
                tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))]

    fm = YOLOX(num_classes=3, variant=variant)
    variables = convert_yolox_torch(_state_dict_np(tm), fm, (1, H, W, 3))
    got = fm.apply(variables, jnp.asarray(x), train=False)
    assert len(got) == len(want)
    for g, t in zip(got, want):
        np.testing.assert_allclose(np.asarray(g),
                                   t.transpose(0, 2, 3, 1),
                                   rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# YOLOv8 vs an independent torch implementation with the official
# ultralytics module structure and state-dict naming (model.0..model.22)
# ---------------------------------------------------------------------------

def _build_torch_yolov8(num_classes, d_mult, w_mult, mc, reg_max=16):
    import math

    import torch.nn as nn

    def ch(c):
        return max(math.ceil(min(c, mc) * w_mult / 8) * 8, 8)

    def nd(n):
        return max(int(round(n * d_mult)), 1)

    class TConv(nn.Module):
        def __init__(self, cin, cout, k=3, s=1):
            super().__init__()
            self.conv = nn.Conv2d(cin, cout, k, s, k // 2, bias=False)
            self.bn = nn.BatchNorm2d(cout, eps=1e-3, momentum=0.03)
            self.act = nn.SiLU()

        def forward(self, x):
            return self.act(self.bn(self.conv(x)))

    class TBottleneck(nn.Module):
        def __init__(self, c, shortcut):
            super().__init__()
            self.cv1 = TConv(c, c, 3)
            self.cv2 = TConv(c, c, 3)
            self.add = shortcut

        def forward(self, x):
            y = self.cv2(self.cv1(x))
            return x + y if self.add else y

    class TC2f(nn.Module):
        def __init__(self, cin, cout, n, shortcut=True):
            super().__init__()
            self.c = cout // 2
            self.cv1 = TConv(cin, 2 * self.c, 1)
            self.cv2 = TConv((2 + n) * self.c, cout, 1)
            self.m = nn.ModuleList(
                TBottleneck(self.c, shortcut) for _ in range(n))

        def forward(self, x):
            y = list(self.cv1(x).chunk(2, 1))
            y.extend(m(y[-1]) for m in self.m)
            return self.cv2(torch.cat(y, 1))

    class TSPPF(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            c = cin // 2
            self.cv1 = TConv(cin, c, 1)
            self.cv2 = TConv(c * 4, cout, 1)
            self.mp = nn.MaxPool2d(5, 1, 2)

        def forward(self, x):
            x = self.cv1(x)
            y1 = self.mp(x)
            y2 = self.mp(y1)
            return self.cv2(torch.cat([x, y1, y2, self.mp(y2)], 1))

    class TDetect(nn.Module):
        def __init__(self, chs):
            super().__init__()
            c2 = max(16, chs[0] // 4, reg_max * 4)
            c3 = max(chs[0], min(num_classes, 100))
            self.cv2 = nn.ModuleList(nn.Sequential(
                TConv(c, c2, 3), TConv(c2, c2, 3),
                nn.Conv2d(c2, 4 * reg_max, 1)) for c in chs)
            self.cv3 = nn.ModuleList(nn.Sequential(
                TConv(c, c3, 3), TConv(c3, c3, 3),
                nn.Conv2d(c3, num_classes, 1)) for c in chs)

        def forward(self, feats):
            return [torch.cat([self.cv2[i](f), self.cv3[i](f)], 1)
                    for i, f in enumerate(feats)]

    class TYOLOv8(nn.Module):
        def __init__(self):
            super().__init__()
            up = nn.Upsample(scale_factor=2, mode="nearest")
            self.model = nn.ModuleList([
                TConv(3, ch(64), 3, 2),                       # 0
                TConv(ch(64), ch(128), 3, 2),                 # 1
                TC2f(ch(128), ch(128), nd(3)),                # 2
                TConv(ch(128), ch(256), 3, 2),                # 3
                TC2f(ch(256), ch(256), nd(6)),                # 4
                TConv(ch(256), ch(512), 3, 2),                # 5
                TC2f(ch(512), ch(512), nd(6)),                # 6
                TConv(ch(512), ch(1024), 3, 2),               # 7
                TC2f(ch(1024), ch(1024), nd(3)),              # 8
                TSPPF(ch(1024), ch(1024)),                    # 9
                up,                                           # 10
                nn.Identity(),                                # 11 concat
                TC2f(ch(1024) + ch(512), ch(512), nd(3), False),   # 12
                up,                                           # 13
                nn.Identity(),                                # 14 concat
                TC2f(ch(512) + ch(256), ch(256), nd(3), False),    # 15
                TConv(ch(256), ch(256), 3, 2),                # 16
                nn.Identity(),                                # 17 concat
                TC2f(ch(256) + ch(512), ch(512), nd(3), False),    # 18
                TConv(ch(512), ch(512), 3, 2),                # 19
                nn.Identity(),                                # 20 concat
                TC2f(ch(512) + ch(1024), ch(1024), nd(3), False),  # 21
                TDetect((ch(256), ch(512), ch(1024))),        # 22
            ])

        def forward(self, x):
            m = self.model
            x = m[1](m[0](x))
            x = m[2](x)
            p3 = m[4](m[3](x))
            p4 = m[6](m[5](p3))
            x = m[8](m[7](p4))
            p5 = m[9](x)
            u4 = m[12](torch.cat([m[10](p5), p4], 1))
            u3 = m[15](torch.cat([m[13](u4), p3], 1))
            d4 = m[18](torch.cat([m[16](u3), u4], 1))
            d5 = m[21](torch.cat([m[19](d4), p5], 1))
            return m[22]((u3, d4, d5))

    return TYOLOv8()


@pytest.mark.parametrize("variant", ["n", "m"])
def test_yolov8_activation_parity(variant):
    import jax.numpy as jnp
    from tracklab_tpu.models.yolov8 import YOLOv8, YOLOV8_VARIANTS
    from tracklab_tpu.models.convert import convert_yolov8_torch

    v = YOLOV8_VARIANTS[variant]
    tm = _build_torch_yolov8(5, v["d"], v["w"], v["mc"])
    tm.eval()
    _randomize_module(tm, seed=17)

    H = W = 64
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, H, W, 3)).astype(np.float32)
    with torch.no_grad():
        want = [o.numpy() for o in
                tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))]

    fm = YOLOv8(num_classes=5, variant=variant)
    variables = convert_yolov8_torch(
        {k: t.numpy().copy() for k, t in tm.state_dict().items()},
        fm, (1, H, W, 3))
    got = fm.apply(variables, jnp.asarray(x), train=False)
    assert len(got) == len(want)
    for g, t in zip(got, want):
        np.testing.assert_allclose(np.asarray(g),
                                   t.transpose(0, 2, 3, 1),
                                   rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# ViTPose vs the actual HF transformers implementation (the library the
# reference's wrapper calls, tracklab/wrappers/pose_estimator/
# transformers_api.py)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("simple_decoder", [False, True])
def test_vitpose_activation_parity(simple_decoder):
    import jax.numpy as jnp
    from transformers import (
        VitPoseBackboneConfig, VitPoseConfig, VitPoseForPoseEstimation,
    )
    from tracklab_tpu.models.vitpose import ViTPose, VITPOSE_VARIANTS
    from tracklab_tpu.models.convert import convert_vitpose_torch

    H, W = 64, 48
    v = VITPOSE_VARIANTS["tiny"]
    bcfg = VitPoseBackboneConfig(
        image_size=(H, W), patch_size=(16, 16), hidden_size=v["dim"],
        num_hidden_layers=v["depth"], num_attention_heads=v["heads"],
        intermediate_size=v["dim"] * 4)
    cfg = VitPoseConfig(backbone_config=bcfg, num_labels=17,
                        use_simple_decoder=simple_decoder)
    tm = VitPoseForPoseEstimation(cfg)
    tm.eval()
    _randomize_module(tm, seed=5)

    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, H, W, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).heatmaps
        want = want.numpy().transpose(0, 2, 3, 1)

    fm = ViTPose(num_keypoints=17, variant="tiny",
                 simple_decoder=simple_decoder)
    variables = convert_vitpose_torch(
        {k: t.numpy().copy() for k, t in tm.state_dict().items()},
        fm, (1, H, W, 3))
    got = np.asarray(fm.apply(variables, jnp.asarray(x), train=False))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_osnet_convert_rejects_wrong_variant():
    from tracklab_tpu.models.osnet import OSNet
    from tracklab_tpu.models.convert import convert_osnet_torch

    refbridge.install_stubs()
    from strong_sort.deep.models import osnet as tosnet

    tm = tosnet.OSNet(num_classes=7, blocks=[tosnet.OSBlock] * 3,
                      layers=[2, 2, 2], channels=[16, 64, 96, 128])
    with pytest.raises(ValueError):
        convert_osnet_torch(_state_dict_np(tm), OSNet(variant="x0_5"),
                            (1, 256, 128, 3))


# ---------------------------------------------------------------------------
# RTMDet vs an independent torch implementation with mmdetection's module
# structure and state-dict naming (backbone.stem.0 / stage{i}.{j} /
# neck.* / bbox_head.* with share_conv tied kernels)
# ---------------------------------------------------------------------------

def _build_torch_rtmdet(num_classes, deepen, widen):
    import torch.nn as tnn

    def widen_c(c):
        return max(int(c * widen), 8)

    def deepen_n(n):
        return max(int(round(n * deepen)), 1)

    class ConvModule(tnn.Module):
        def __init__(self, ci, co, k, s=1, g=1):
            super().__init__()
            self.conv = tnn.Conv2d(ci, co, k, s, k // 2, groups=g,
                                   bias=False)
            self.bn = tnn.BatchNorm2d(co)
            self.act = tnn.SiLU()

        def forward(self, x):
            return self.act(self.bn(self.conv(x)))

    class DWSep(tnn.Module):
        def __init__(self, ci, co, k):
            super().__init__()
            self.depthwise_conv = ConvModule(ci, ci, k, g=ci)
            self.pointwise_conv = ConvModule(ci, co, 1)

        def forward(self, x):
            return self.pointwise_conv(self.depthwise_conv(x))

    class CSPNeXtBlock(tnn.Module):
        def __init__(self, ci, co, add_identity):
            super().__init__()
            self.conv1 = ConvModule(ci, co, 3)
            self.conv2 = DWSep(co, co, 5)
            self.add = add_identity and ci == co

        def forward(self, x):
            y = self.conv2(self.conv1(x))
            return x + y if self.add else y

    class ChannelAttention(tnn.Module):
        def __init__(self, c):
            super().__init__()
            self.fc = tnn.Conv2d(c, c, 1, bias=True)
            self.act = tnn.Hardsigmoid()

        def forward(self, x):
            w = x.mean((2, 3), keepdim=True)
            return x * self.act(self.fc(w))

    class CSPLayer(tnn.Module):
        def __init__(self, ci, co, n, add_identity, attention=True):
            super().__init__()
            mid = int(co * 0.5)
            self.main_conv = ConvModule(ci, mid, 1)
            self.short_conv = ConvModule(ci, mid, 1)
            self.final_conv = ConvModule(2 * mid, co, 1)
            self.blocks = tnn.Sequential(
                *[CSPNeXtBlock(mid, mid, add_identity)
                  for _ in range(n)])
            self.attention = ChannelAttention(2 * mid) if attention \
                else None

        def forward(self, x):
            s = self.short_conv(x)
            m = self.blocks(self.main_conv(x))
            y = torch.cat([m, s], dim=1)
            if self.attention is not None:
                y = self.attention(y)
            return self.final_conv(y)

    class SPP(tnn.Module):
        def __init__(self, ci, co, ks=(5, 9, 13)):
            super().__init__()
            mid = ci // 2
            self.conv1 = ConvModule(ci, mid, 1)
            self.poolings = tnn.ModuleList(
                [tnn.MaxPool2d(k, 1, k // 2) for k in ks])
            self.conv2 = ConvModule(mid * (len(ks) + 1), co, 1)

        def forward(self, x):
            x = self.conv1(x)
            return self.conv2(torch.cat(
                [x] + [p(x) for p in self.poolings], dim=1))

    class Backbone(tnn.Module):
        def __init__(self):
            super().__init__()
            c0 = widen_c(64)
            self.stem = tnn.Sequential(
                ConvModule(3, c0 // 2, 3, 2),
                ConvModule(c0 // 2, c0 // 2, 3, 1),
                ConvModule(c0 // 2, c0, 3, 1))
            arch = [(128, 3, True, False), (256, 6, True, False),
                    (512, 6, True, False), (1024, 3, False, True)]
            ci = c0
            for i, (c, n, add_id, spp) in enumerate(arch):
                co = widen_c(c)
                layers = [ConvModule(ci, co, 3, 2)]
                if spp:
                    layers.append(SPP(co, co))
                layers.append(CSPLayer(co, co, deepen_n(n), add_id))
                self.add_module(f"stage{i + 1}", tnn.Sequential(*layers))
                ci = co

        def forward(self, x):
            x = self.stem(x)
            outs = []
            for i in range(4):
                x = getattr(self, f"stage{i + 1}")(x)
                if i >= 1:
                    outs.append(x)
            return outs

    class Neck(tnn.Module):
        def __init__(self):
            super().__init__()
            in_ch = [widen_c(256), widen_c(512), widen_c(1024)]
            n = deepen_n(3)
            self.reduce_layers = tnn.ModuleList([
                ConvModule(in_ch[2], in_ch[1], 1),
                ConvModule(in_ch[1], in_ch[0], 1)])
            self.top_down_blocks = tnn.ModuleList([
                CSPLayer(2 * in_ch[1], in_ch[1], n, False),
                CSPLayer(2 * in_ch[0], in_ch[0], n, False)])
            self.downsamples = tnn.ModuleList([
                ConvModule(in_ch[0], in_ch[0], 3, 2),
                ConvModule(in_ch[1], in_ch[1], 3, 2)])
            self.bottom_up_blocks = tnn.ModuleList([
                CSPLayer(2 * in_ch[0], in_ch[1], n, False),
                CSPLayer(2 * in_ch[1], in_ch[2], n, False)])
            oc = widen_c(256)
            self.out_convs = tnn.ModuleList(
                [ConvModule(c, oc, 3) for c in in_ch])
            self.up = tnn.Upsample(scale_factor=2, mode="nearest")

        def forward(self, feats):
            c3, c4, c5 = feats
            r1 = self.reduce_layers[0](c5)
            td1 = self.top_down_blocks[0](
                torch.cat([self.up(r1), c4], dim=1))
            r2 = self.reduce_layers[1](td1)
            td2 = self.top_down_blocks[1](
                torch.cat([self.up(r2), c3], dim=1))
            d1 = self.downsamples[0](td2)
            bu1 = self.bottom_up_blocks[0](torch.cat([d1, r2], dim=1))
            d2 = self.downsamples[1](bu1)
            bu2 = self.bottom_up_blocks[1](torch.cat([d2, r1], dim=1))
            return [conv(f) for conv, f in
                    zip(self.out_convs, [td2, bu1, bu2])]

    class ConvBN(tnn.Module):
        """Head ConvModule whose conv may be a TIED (shared) module."""
        def __init__(self, conv, c):
            super().__init__()
            self.conv = conv
            self.bn = tnn.BatchNorm2d(c)
            self.act = tnn.SiLU()

        def forward(self, x):
            return self.act(self.bn(self.conv(x)))

    class Head(tnn.Module):
        def __init__(self):
            super().__init__()
            fc = widen_c(256)
            # level-0 convs own the kernels; levels 1-2 alias them
            # (mmdet rtmdet_head.py RTMDetSepBNHead share_conv)
            shared_cls = [tnn.Conv2d(fc, fc, 3, 1, 1, bias=False)
                          for _ in range(2)]
            shared_reg = [tnn.Conv2d(fc, fc, 3, 1, 1, bias=False)
                          for _ in range(2)]
            self.cls_convs = tnn.ModuleList(
                [tnn.Sequential(*[ConvBN(shared_cls[j], fc)
                                  for j in range(2)])
                 for _ in range(3)])
            self.reg_convs = tnn.ModuleList(
                [tnn.Sequential(*[ConvBN(shared_reg[j], fc)
                                  for j in range(2)])
                 for _ in range(3)])
            self.rtm_cls = tnn.ModuleList(
                [tnn.Conv2d(fc, num_classes, 1) for _ in range(3)])
            self.rtm_reg = tnn.ModuleList(
                [tnn.Conv2d(fc, 4, 1) for _ in range(3)])

        def forward(self, feats):
            outs = []
            for lvl, x in enumerate(feats):
                c = self.cls_convs[lvl](x)
                r = self.reg_convs[lvl](x)
                outs.append((self.rtm_cls[lvl](c),
                             self.rtm_reg[lvl](r)))
            return outs

    class Model(tnn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = Backbone()
            self.neck = Neck()
            self.bbox_head = Head()

        def forward(self, x):
            return self.bbox_head(self.neck(self.backbone(x)))

    return Model()


@pytest.mark.parametrize("variant", ["nano", "s"])
def test_rtmdet_activation_parity(variant):
    import jax.numpy as jnp
    from tracklab_tpu.models.rtmdet import RTMDet, RTMDET_VARIANTS
    from tracklab_tpu.models.convert import convert_rtmdet_torch

    v = RTMDET_VARIANTS[variant]
    tm = _build_torch_rtmdet(2, v["deepen"], v["widen"])
    tm.eval()
    _randomize_module(tm, seed=17)

    H = W = 64
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, H, W, 3)).astype(np.float32)
    with torch.no_grad():
        want = [(c.numpy(), r.numpy()) for c, r in
                tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))]

    fm = RTMDet(num_classes=2, variant=variant)
    variables = convert_rtmdet_torch(_state_dict_np(tm), fm,
                                     (1, H, W, 3))
    got = fm.apply(variables, jnp.asarray(x), train=False)
    assert len(got) == 3
    for (gc, gr), (tc, tr) in zip(got, want):
        np.testing.assert_allclose(np.asarray(gc),
                                   tc.transpose(0, 2, 3, 1),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gr),
                                   tr.transpose(0, 2, 3, 1),
                                   rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# ReID backbone zoo vs the reference's vendored torchreid sources
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("variant", ["resnet18", "resnet50",
                                     "resnet50_fc512"])
def test_reid_resnet_activation_parity(variant):
    import jax.numpy as jnp
    from tracklab_tpu.models.reid_backbones import (
        ReidResNet, RESNET_VARIANTS,
    )
    from tracklab_tpu.models.convert import convert_reid_backbone_torch

    refbridge.install_stubs()
    from strong_sort.deep.models import resnet as tresnet

    kind, layers, last_stride, fc_dims = RESNET_VARIANTS[variant]
    block = tresnet.BasicBlock if kind == "basic" else tresnet.Bottleneck
    tm = tresnet.ResNet(num_classes=5, loss="softmax", block=block,
                        layers=list(layers), last_stride=last_stride,
                        fc_dims=list(fc_dims) if fc_dims else None)
    tm.eval()
    _randomize_module(tm, seed=23)

    H, W = 128, 64
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, H, W, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    fm = ReidResNet(variant=variant)
    variables = convert_reid_backbone_torch(_state_dict_np(tm), fm,
                                            (1, H, W, 3))
    got = np.asarray(fm.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_reid_mobilenetv2_activation_parity():
    import jax.numpy as jnp
    from tracklab_tpu.models.reid_backbones import ReidMobileNetV2
    from tracklab_tpu.models.convert import convert_reid_backbone_torch

    refbridge.install_stubs()
    from strong_sort.deep.models import mobilenetv2 as tmb

    tm = tmb.MobileNetV2(num_classes=5, width_mult=1, loss="softmax")
    tm.eval()
    _randomize_module(tm, seed=29)

    H, W = 128, 64
    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, H, W, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    fm = ReidMobileNetV2()
    variables = convert_reid_backbone_torch(_state_dict_np(tm), fm,
                                            (1, H, W, 3))
    got = np.asarray(fm.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# HF-exact RT-DETR vs the installed transformers implementation
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("layer_type", ["basic", "bottleneck"])
def test_rtdetr_hf_activation_parity(layer_type):
    import jax.numpy as jnp
    from transformers import RTDetrConfig, RTDetrForObjectDetection
    from transformers.models.rt_detr.configuration_rt_detr_resnet import (
        RTDetrResNetConfig,
    )

    from tracklab_tpu.models.rtdetr_hf import RTDetrHF, RTDetrHFConfig
    from tracklab_tpu.models.convert import convert_rtdetr_hf_torch

    hidden = [16, 32, 64, 128] if layer_type == "basic" \
        else [64, 128, 256, 512]
    backbone_config = RTDetrResNetConfig(
        embedding_size=16, hidden_sizes=hidden, depths=[1, 1, 2, 1],
        layer_type=layer_type, out_features=["stage2", "stage3",
                                             "stage4"])
    # num_queries == total anchors (12^2+6^2+3^2 at 96x96): the top-k
    # selects EVERY anchor on both sides, so random-weight score ties at
    # the selection boundary cannot change the query set — outputs then
    # differ only by the selection permutation, which we align through
    # the anchor ids
    H = W = 96
    S = (H // 8) ** 2 + (H // 16) ** 2 + (H // 32) ** 2
    config = RTDetrConfig(
        backbone_config=backbone_config,
        d_model=64, num_queries=S, encoder_hidden_dim=64,
        encoder_in_channels=hidden[1:], encoder_layers=1,
        encoder_ffn_dim=128, num_attention_heads=4,
        decoder_layers=2, decoder_ffn_dim=128,
        decoder_attention_heads=4, decoder_n_points=2,
        decoder_in_channels=[64, 64, 64],
        num_labels=3, num_denoising=10, anchor_image_size=None,
    )
    tm = RTDetrForObjectDetection(config)
    tm.eval()
    _randomize_module(tm, seed=31)

    rng = np.random.default_rng(6)
    x = rng.normal(size=(2, H, W, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        out = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                 return_dict=True)
    want_logits = out.logits.numpy()
    want_boxes = out.pred_boxes.numpy()
    tt = torch.topk(out.enc_outputs_class.max(-1).values, S,
                    dim=1)[1].numpy()

    fcfg = RTDetrHFConfig(
        num_labels=3, d_model=64, num_queries=S,
        embedding_size=16, hidden_sizes=tuple(hidden),
        depths=(1, 1, 2, 1), layer_type=layer_type,
        encoder_hidden_dim=64, encoder_in_channels=tuple(hidden[1:]),
        encoder_layers=1, encoder_ffn_dim=128, num_attention_heads=4,
        decoder_layers=2, decoder_ffn_dim=128,
        decoder_attention_heads=4, decoder_n_points=2,
    )
    fm = RTDetrHF(config=fcfg)
    variables = convert_rtdetr_hf_torch(_state_dict_np(tm), fm,
                                        (1, H, W, 3))
    logits, boxes, topk_f = fm.apply(variables, jnp.asarray(x),
                                     train=False, return_topk=True)
    logits, boxes, topk_f = (np.asarray(logits), np.asarray(boxes),
                             np.asarray(topk_f))
    B = x.shape[0]
    for b in range(B):
        # align flax query j (anchor topk_f[b, j]) with the torch query
        # holding the same anchor
        pos_t = np.empty(S, int)
        pos_t[tt[b]] = np.arange(S)
        perm = pos_t[topk_f[b]]
        np.testing.assert_allclose(boxes[b], want_boxes[b][perm],
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(logits[b], want_logits[b][perm],
                                   rtol=1e-3, atol=2e-3)


def test_rtdetr_v2_checkpoint_parity():
    """RT-DETRv2 checkpoints (rtdetr_v2_r18vd etc. in the reference's
    model list) load into the SAME flax model: with the released
    defaults the v2 deformable sampling reduces exactly to v1
    (offsets * (1/P) * wh * 0.5)."""
    import jax.numpy as jnp
    from transformers import RTDetrV2Config, RTDetrV2ForObjectDetection
    from transformers.models.rt_detr.configuration_rt_detr_resnet import (
        RTDetrResNetConfig,
    )

    from tracklab_tpu.models.rtdetr_hf import RTDetrHF, RTDetrHFConfig
    from tracklab_tpu.models.convert import convert_rtdetr_hf_torch

    hidden = [16, 32, 64, 128]
    backbone_config = RTDetrResNetConfig(
        embedding_size=16, hidden_sizes=hidden, depths=[1, 1, 2, 1],
        layer_type="basic", out_features=["stage2", "stage3", "stage4"])
    H = W = 96
    S = (H // 8) ** 2 + (H // 16) ** 2 + (H // 32) ** 2
    config = RTDetrV2Config(
        backbone_config=backbone_config,
        d_model=64, num_queries=S, encoder_hidden_dim=64,
        encoder_in_channels=hidden[1:], encoder_layers=1,
        encoder_ffn_dim=128, num_attention_heads=4,
        decoder_layers=2, decoder_ffn_dim=128,
        decoder_attention_heads=4, decoder_n_points=2,
        decoder_in_channels=[64, 64, 64],
        num_labels=3, num_denoising=10, anchor_image_size=None,
    )
    tm = RTDetrV2ForObjectDetection(config)
    tm.eval()
    _randomize_module(tm, seed=37)

    rng = np.random.default_rng(8)
    x = rng.normal(size=(1, H, W, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        out = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                 return_dict=True)
    tt = torch.topk(out.enc_outputs_class.max(-1).values, S,
                    dim=1)[1].numpy()

    fcfg = RTDetrHFConfig(
        num_labels=3, d_model=64, num_queries=S,
        embedding_size=16, hidden_sizes=tuple(hidden),
        depths=(1, 1, 2, 1), layer_type="basic",
        encoder_hidden_dim=64, encoder_in_channels=tuple(hidden[1:]),
        encoder_layers=1, encoder_ffn_dim=128, num_attention_heads=4,
        decoder_layers=2, decoder_ffn_dim=128,
        decoder_attention_heads=4, decoder_n_points=2,
    )
    fm = RTDetrHF(config=fcfg)
    variables = convert_rtdetr_hf_torch(_state_dict_np(tm), fm,
                                        (1, H, W, 3))
    logits, boxes, topk_f = fm.apply(variables, jnp.asarray(x),
                                     train=False, return_topk=True)
    logits, boxes, topk_f = (np.asarray(logits), np.asarray(boxes),
                             np.asarray(topk_f))
    pos_t = np.empty(S, int)
    pos_t[tt[0]] = np.arange(S)
    perm = pos_t[topk_f[0]]
    np.testing.assert_allclose(boxes[0], out.pred_boxes.numpy()[0][perm],
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(logits[0], out.logits.numpy()[0][perm],
                               rtol=1e-3, atol=2e-3)


def test_osnet_ain_activation_parity():
    import jax.numpy as jnp
    from tracklab_tpu.models.osnet import OSNetAIN
    from tracklab_tpu.models.convert import convert_reid_backbone_torch

    refbridge.install_stubs()
    from strong_sort.deep.models import osnet_ain as tain

    tm = tain.OSNet(
        num_classes=5,
        blocks=[[tain.OSBlockINin, tain.OSBlockINin],
                [tain.OSBlock, tain.OSBlockINin],
                [tain.OSBlockINin, tain.OSBlock]],
        layers=[2, 2, 2], channels=[16, 64, 96, 128],
        conv1_IN=True)
    tm.eval()
    _randomize_module(tm, seed=41)

    H, W = 128, 64
    rng = np.random.default_rng(9)
    x = rng.normal(size=(2, H, W, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    fm = OSNetAIN(variant="ain_x0_25")
    variables = convert_reid_backbone_torch(_state_dict_np(tm), fm,
                                            (1, H, W, 3))
    got = np.asarray(fm.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_shufflenetv2_activation_parity():
    import jax.numpy as jnp
    from tracklab_tpu.models.reid_backbones import ReidShuffleNetV2
    from tracklab_tpu.models.convert import convert_reid_backbone_torch

    refbridge.install_stubs()
    from strong_sort.deep.models import shufflenetv2 as tsh

    tm = tsh.ShuffleNetV2(num_classes=5, loss="softmax",
                          stages_repeats=[4, 8, 4],
                          stages_out_channels=[24, 48, 96, 192, 1024])
    tm.eval()
    _randomize_module(tm, seed=43)

    H, W = 128, 64
    rng = np.random.default_rng(10)
    x = rng.normal(size=(2, H, W, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    fm = ReidShuffleNetV2(variant="shufflenet_v2_x0_5")
    variables = convert_reid_backbone_torch(_state_dict_np(tm), fm,
                                            (1, H, W, 3))
    got = np.asarray(fm.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_resnet50_ibn_a_activation_parity():
    import jax.numpy as jnp
    from tracklab_tpu.models.reid_backbones import ReidResNetIBN
    from tracklab_tpu.models.convert import convert_reid_backbone_torch

    refbridge.install_stubs()
    from strong_sort.deep.models import resnet_ibn_a as tibn

    tm = tibn.ResNet(block=tibn.Bottleneck, layers=[1, 1, 1, 1],
                     num_classes=5, loss="softmax")
    tm.eval()
    _randomize_module(tm, seed=47)

    H, W = 128, 64
    rng = np.random.default_rng(11)
    x = rng.normal(size=(2, H, W, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    fm = ReidResNetIBN(layers=(1, 1, 1, 1))
    variables = convert_reid_backbone_torch(_state_dict_np(tm), fm,
                                            (1, H, W, 3))
    got = np.asarray(fm.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# YOLO11 vs an independent torch implementation with ultralytics module
# structure and state-dict naming (model.0..model.23) — the reference's
# DEFAULT detector family (yolo_ultralytics.yaml -> yolo11m.pt)
# ---------------------------------------------------------------------------

def _build_torch_yolo11(num_classes, d, w, mc, force_c3k, reg_max=16):
    import torch.nn as tnn

    def ch(c):
        import math
        return max(math.ceil(min(c, mc) * w / 8) * 8, 8)

    def rep(n):
        return max(int(round(n * d)), 1)

    class TConv(tnn.Module):
        def __init__(self, ci, co, k=3, s=1, g=1, act=True):
            super().__init__()
            self.conv = tnn.Conv2d(ci, co, k, s, k // 2, groups=g,
                                   bias=False)
            self.bn = tnn.BatchNorm2d(co, eps=1e-3, momentum=0.03)
            self.act = tnn.SiLU() if act else tnn.Identity()

        def forward(self, x):
            return self.act(self.bn(self.conv(x)))

    class TBottleneck(tnn.Module):
        def __init__(self, ci, co, shortcut=True, e=0.5):
            super().__init__()
            c_ = int(co * e)
            self.cv1 = TConv(ci, c_, 3)
            self.cv2 = TConv(c_, co, 3)
            self.add = shortcut and ci == co

        def forward(self, x):
            y = self.cv2(self.cv1(x))
            return x + y if self.add else y

    class TC3k(tnn.Module):
        def __init__(self, ci, co, n=2, shortcut=True):
            super().__init__()
            c_ = co // 2
            self.cv1 = TConv(ci, c_, 1)
            self.cv2 = TConv(ci, c_, 1)
            self.cv3 = TConv(2 * c_, co, 1)
            self.m = tnn.Sequential(
                *[TBottleneck(c_, c_, shortcut, e=1.0)
                  for _ in range(n)])

        def forward(self, x):
            return self.cv3(torch.cat([self.m(self.cv1(x)),
                                       self.cv2(x)], 1))

    class TC3k2(tnn.Module):
        def __init__(self, ci, co, n=1, c3k=False, e=0.5,
                     shortcut=True):
            super().__init__()
            self.c = int(co * e)
            self.cv1 = TConv(ci, 2 * self.c, 1)
            self.cv2 = TConv((2 + n) * self.c, co, 1)
            self.m = tnn.ModuleList(
                TC3k(self.c, self.c, 2, shortcut) if c3k
                else TBottleneck(self.c, self.c, shortcut, e=0.5)
                for _ in range(n))

        def forward(self, x):
            y = list(self.cv1(x).chunk(2, 1))
            y.extend(m(y[-1]) for m in self.m)
            return self.cv2(torch.cat(y, 1))

    class TSPPF(tnn.Module):
        def __init__(self, ci, co, k=5):
            super().__init__()
            c_ = ci // 2
            self.cv1 = TConv(ci, c_, 1)
            self.cv2 = TConv(c_ * 4, co, 1)
            self.m = tnn.MaxPool2d(k, 1, k // 2)

        def forward(self, x):
            x = self.cv1(x)
            y1 = self.m(x)
            y2 = self.m(y1)
            return self.cv2(torch.cat([x, y1, y2, self.m(y2)], 1))

    class TAttention(tnn.Module):
        def __init__(self, dim, num_heads, attn_ratio=0.5):
            super().__init__()
            self.num_heads = num_heads
            self.head_dim = dim // num_heads
            self.key_dim = int(self.head_dim * attn_ratio)
            self.scale = self.key_dim ** -0.5
            nh_kd = self.key_dim * num_heads
            h = dim + nh_kd * 2
            self.qkv = TConv(dim, h, 1, act=False)
            self.proj = TConv(dim, dim, 1, act=False)
            self.pe = TConv(dim, dim, 3, 1, g=dim, act=False)

        def forward(self, x):
            B, C, H, W = x.shape
            N = H * W
            qkv = self.qkv(x)
            q, k, v = qkv.view(
                B, self.num_heads, self.key_dim * 2 + self.head_dim,
                N).split([self.key_dim, self.key_dim, self.head_dim],
                         dim=2)
            attn = (q.transpose(-2, -1) @ k) * self.scale
            attn = attn.softmax(dim=-1)
            x2 = (v @ attn.transpose(-2, -1)).view(B, C, H, W) \
                + self.pe(v.reshape(B, C, H, W))
            return self.proj(x2)

    class TPSABlock(tnn.Module):
        def __init__(self, c, num_heads):
            super().__init__()
            self.attn = TAttention(c, num_heads)
            self.ffn = tnn.Sequential(TConv(c, c * 2, 1),
                                      TConv(c * 2, c, 1, act=False))

        def forward(self, x):
            x = x + self.attn(x)
            return x + self.ffn(x)

    class TC2PSA(tnn.Module):
        def __init__(self, c, n=1):
            super().__init__()
            self.c = c // 2
            self.cv1 = TConv(c, 2 * self.c, 1)
            self.cv2 = TConv(2 * self.c, c, 1)
            self.m = tnn.Sequential(
                *[TPSABlock(self.c, max(self.c // 64, 1))
                  for _ in range(n)])

        def forward(self, x):
            a, b = self.cv1(x).split((self.c, self.c), dim=1)
            b = self.m(b)
            return self.cv2(torch.cat([a, b], 1))

    class TDetect11(tnn.Module):
        def __init__(self, nc, chs):
            super().__init__()
            c2 = max(16, chs[0] // 4, reg_max * 4)
            c3 = max(chs[0], min(nc, 100))
            self.cv2 = tnn.ModuleList(
                tnn.Sequential(TConv(x, c2, 3), TConv(c2, c2, 3),
                               tnn.Conv2d(c2, 4 * reg_max, 1))
                for x in chs)
            self.cv3 = tnn.ModuleList(
                tnn.Sequential(
                    tnn.Sequential(TConv(x, x, 3, g=x),
                                   TConv(x, c3, 1)),
                    tnn.Sequential(TConv(c3, c3, 3, g=c3),
                                   TConv(c3, c3, 1)),
                    tnn.Conv2d(c3, nc, 1)) for x in chs)

        def forward(self, feats):
            return [torch.cat([self.cv2[i](f), self.cv3[i](f)], 1)
                    for i, f in enumerate(feats)]

    class Model(tnn.Module):
        def __init__(self):
            super().__init__()
            fc = force_c3k
            self.model = tnn.ModuleList([
                TConv(3, ch(64), 3, 2),                       # 0
                TConv(ch(64), ch(128), 3, 2),                 # 1
                TC3k2(ch(128), ch(256), rep(2), fc, 0.25),    # 2
                TConv(ch(256), ch(256), 3, 2),                # 3
                TC3k2(ch(256), ch(512), rep(2), fc, 0.25),    # 4
                TConv(ch(512), ch(512), 3, 2),                # 5
                TC3k2(ch(512), ch(512), rep(2), True),        # 6
                TConv(ch(512), ch(1024), 3, 2),               # 7
                TC3k2(ch(1024), ch(1024), rep(2), True),      # 8
                TSPPF(ch(1024), ch(1024)),                    # 9
                TC2PSA(ch(1024), rep(2)),                     # 10
                tnn.Upsample(scale_factor=2, mode="nearest"),  # 11
                tnn.Identity(),                               # 12 concat
                TC3k2(ch(1024) + ch(512), ch(512), rep(2), fc),  # 13
                tnn.Upsample(scale_factor=2, mode="nearest"),  # 14
                tnn.Identity(),                               # 15 concat
                TC3k2(ch(512) + ch(512), ch(256), rep(2), fc),  # 16
                TConv(ch(256), ch(256), 3, 2),                # 17
                tnn.Identity(),                               # 18 concat
                TC3k2(ch(256) + ch(512), ch(512), rep(2), fc),  # 19
                TConv(ch(512), ch(512), 3, 2),                # 20
                tnn.Identity(),                               # 21 concat
                TC3k2(ch(512) + ch(1024), ch(1024), rep(2),
                      True),                                  # 22
                TDetect11(num_classes,
                          (ch(256), ch(512), ch(1024))),      # 23
            ])

        def forward(self, x):
            m = self.model
            x = m[1](m[0](x))
            x = m[2](x)
            x = m[3](x)
            p3 = m[4](x)
            x = m[5](p3)
            p4 = m[6](x)
            x = m[7](p4)
            x = m[8](x)
            x = m[9](x)
            p5 = m[10](x)
            u4 = m[13](torch.cat([m[11](p5), p4], 1))
            u3 = m[16](torch.cat([m[14](u4), p3], 1))
            d4 = m[19](torch.cat([m[17](u3), u4], 1))
            d5 = m[22](torch.cat([m[20](d4), p5], 1))
            return m[23]([u3, d4, d5])

    return Model()


@pytest.mark.parametrize("variant", ["n", "m"])
def test_yolo11_activation_parity(variant):
    import jax.numpy as jnp
    from tracklab_tpu.models.yolo11 import YOLO11, YOLO11_VARIANTS
    from tracklab_tpu.models.convert import convert_yolov8_torch

    v = YOLO11_VARIANTS[variant]
    tm = _build_torch_yolo11(3, v["d"], v["w"], v["mc"],
                             v["force_c3k"])
    tm.eval()
    _randomize_module(tm, seed=53)

    H = W = 64
    rng = np.random.default_rng(12)
    x = rng.normal(size=(2, H, W, 3)).astype(np.float32)
    with torch.no_grad():
        want = [o.numpy() for o in
                tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))]

    fm = YOLO11(num_classes=3, variant=variant)
    variables = convert_yolov8_torch(_state_dict_np(tm), fm,
                                     (1, H, W, 3))
    got = fm.apply(variables, jnp.asarray(x), train=False)
    assert len(got) == len(want)
    for g, t in zip(got, want):
        np.testing.assert_allclose(np.asarray(g),
                                   t.transpose(0, 2, 3, 1),
                                   rtol=1e-4, atol=1e-4)


def test_yolo11_pose_activation_parity():
    import jax.numpy as jnp
    from tracklab_tpu.models.yolo11 import YOLO11Pose, YOLO11_VARIANTS
    from tracklab_tpu.models.convert import convert_yolov8_torch
    import torch.nn as tnn

    v = YOLO11_VARIANTS["n"]
    tm = _build_torch_yolo11(1, v["d"], v["w"], v["mc"],
                             v["force_c3k"])
    # attach the ultralytics Pose branch (cv4) to the torch model
    K = 5
    nk = K * 3
    det = tm.model[23]
    ch0 = det.cv2[0][0].conv.in_channels
    chs = [seq[0].conv.in_channels for seq in det.cv2]
    c4 = max(ch0 // 4, nk)

    class TConv(tnn.Module):
        def __init__(self, ci, co, k=3):
            super().__init__()
            self.conv = tnn.Conv2d(ci, co, k, 1, k // 2, bias=False)
            self.bn = tnn.BatchNorm2d(co, eps=1e-3, momentum=0.03)
            self.act = tnn.SiLU()

        def forward(self, x):
            return self.act(self.bn(self.conv(x)))

    det.cv4 = tnn.ModuleList(
        tnn.Sequential(TConv(x, c4, 3), TConv(c4, c4, 3),
                       tnn.Conv2d(c4, nk, 1)) for x in chs)
    tm.eval()
    _randomize_module(tm, seed=59)

    H = W = 64
    rng = np.random.default_rng(13)
    x = rng.normal(size=(2, H, W, 3)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        # torch side: run the trunk manually to the neck feats, then
        # both branches
        m = tm.model
        h1 = m[1](m[0](xt))
        h2 = m[3](m[2](h1))
        p3 = m[4](h2)
        p4 = m[6](m[5](p3))
        h8 = m[8](m[7](p4))
        p5 = m[10](m[9](h8))
        u4 = m[13](torch.cat([m[11](p5), p4], 1))
        u3 = m[16](torch.cat([m[14](u4), p3], 1))
        d4 = m[19](torch.cat([m[17](u3), u4], 1))
        d5 = m[22](torch.cat([m[20](d4), p5], 1))
        feats = [u3, d4, d5]
        want_det = [torch.cat([det.cv2[i](f), det.cv3[i](f)], 1).numpy()
                    for i, f in enumerate(feats)]
        want_kpt = [det.cv4[i](f).numpy()
                    for i, f in enumerate(feats)]

    fm = YOLO11Pose(num_classes=1, num_keypoints=K, variant="n")
    variables = convert_yolov8_torch(_state_dict_np(tm), fm,
                                     (1, H, W, 3))
    got_det, got_kpt = fm.apply(variables, jnp.asarray(x), train=False)
    for g, t in zip(got_det, want_det):
        np.testing.assert_allclose(np.asarray(g),
                                   t.transpose(0, 2, 3, 1),
                                   rtol=1e-4, atol=1e-4)
    for g, t in zip(got_kpt, want_kpt):
        np.testing.assert_allclose(np.asarray(g),
                                   t.transpose(0, 2, 3, 1),
                                   rtol=1e-4, atol=1e-4)


def test_densenet_activation_parity():
    import jax.numpy as jnp
    from tracklab_tpu.models.reid_backbones import ReidDenseNet
    from tracklab_tpu.models.convert import convert_reid_backbone_torch

    refbridge.install_stubs()
    from strong_sort.deep.models import densenet as tdn

    tm = tdn.DenseNet(num_classes=5, loss="softmax", growth_rate=8,
                      block_config=(2, 2, 2, 2), num_init_features=16,
                      bn_size=4)
    tm.eval()
    _randomize_module(tm, seed=61)

    H, W = 128, 64
    rng = np.random.default_rng(14)
    x = rng.normal(size=(2, H, W, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    fm = ReidDenseNet(growth_rate=8, block_config=(2, 2, 2, 2),
                      num_init_features=16)
    variables = convert_reid_backbone_torch(_state_dict_np(tm), fm,
                                            (1, H, W, 3))
    got = np.asarray(fm.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_squeezenet_activation_parity():
    import jax.numpy as jnp
    from tracklab_tpu.models.reid_backbones import ReidSqueezeNet
    from tracklab_tpu.models.convert import convert_reid_backbone_torch

    refbridge.install_stubs()
    from strong_sort.deep.models import squeezenet as tsq

    tm = tsq.SqueezeNet(num_classes=5, loss="softmax", version=1.0)
    tm.eval()
    _randomize_module(tm, seed=67)

    H, W = 129, 65   # odd sizes exercise the ceil-mode pooling
    rng = np.random.default_rng(15)
    x = rng.normal(size=(2, H, W, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    fm = ReidSqueezeNet()
    variables = convert_reid_backbone_torch(_state_dict_np(tm), fm,
                                            (1, H, W, 3))
    got = np.asarray(fm.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_mlfn_activation_parity():
    import jax.numpy as jnp
    from tracklab_tpu.models.reid_backbones import ReidMLFN
    from tracklab_tpu.models.convert import convert_reid_backbone_torch

    refbridge.install_stubs()
    import importlib
    tml = importlib.import_module("strong_sort.deep.models.mlfn")

    tm = tml.MLFN(num_classes=5, groups=8,
                  channels=[16, 32, 64, 128, 256], embed_dim=64)
    tm.eval()
    _randomize_module(tm, seed=71)

    H, W = 128, 64
    rng = np.random.default_rng(16)
    x = rng.normal(size=(2, H, W, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    fm = ReidMLFN(groups=8, channels=(16, 32, 64, 128, 256),
                  embed_dim=64)
    variables = convert_reid_backbone_torch(_state_dict_np(tm), fm,
                                            (1, H, W, 3))
    got = np.asarray(fm.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_se_resnet_activation_parity():
    import importlib

    import jax.numpy as jnp
    from tracklab_tpu.models.reid_backbones import ReidSEResNet
    from tracklab_tpu.models.convert import convert_reid_backbone_torch

    refbridge.install_stubs()
    tsn = importlib.import_module("strong_sort.deep.models.senet")

    tm = tsn.SENet(num_classes=5, loss="softmax",
                   block=tsn.SEResNetBottleneck, layers=[1, 1, 1, 1],
                   groups=1, reduction=16, dropout_p=None, inplanes=64,
                   input_3x3=False, downsample_kernel_size=1,
                   downsample_padding=0, last_stride=2, fc_dims=None)
    tm.eval()
    _randomize_module(tm, seed=73)

    H, W = 129, 65   # odd sizes exercise the ceil-mode stem pool
    rng = np.random.default_rng(17)
    x = rng.normal(size=(2, H, W, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    fm = ReidSEResNet(layers=(1, 1, 1, 1))
    variables = convert_reid_backbone_torch(_state_dict_np(tm), fm,
                                            (1, H, W, 3))
    got = np.asarray(fm.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_resnetmid_activation_parity():
    import importlib

    import jax.numpy as jnp
    from tracklab_tpu.models.reid_backbones import ReidResNetMid
    from tracklab_tpu.models.convert import convert_reid_backbone_torch

    refbridge.install_stubs()
    trm = importlib.import_module("strong_sort.deep.models.resnetmid")

    tm = trm.ResNetMid(num_classes=5, loss="softmax",
                       block=trm.Bottleneck, layers=[1, 1, 1, 3],
                       last_stride=2, fc_dims=[64])
    tm.eval()
    _randomize_module(tm, seed=79)

    H, W = 128, 64
    rng = np.random.default_rng(18)
    x = rng.normal(size=(2, H, W, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    fm = ReidResNetMid(layers=(1, 1, 1, 3), fc_dim=64)
    variables = convert_reid_backbone_torch(_state_dict_np(tm), fm,
                                            (1, H, W, 3))
    got = np.asarray(fm.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_xception_activation_parity():
    import importlib

    import jax.numpy as jnp
    from tracklab_tpu.models.reid_backbones import ReidXception
    from tracklab_tpu.models.convert import convert_reid_backbone_torch

    refbridge.install_stubs()
    txc = importlib.import_module("strong_sort.deep.models.xception")

    tm = txc.Xception(num_classes=5, loss="softmax", fc_dims=None)
    tm.eval()
    _randomize_module(tm, seed=83)

    H, W = 128, 64
    rng = np.random.default_rng(19)
    x = rng.normal(size=(1, H, W, 3)).astype(np.float32) * 0.2
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    fm = ReidXception()
    variables = convert_reid_backbone_torch(_state_dict_np(tm), fm,
                                            (1, H, W, 3))
    got = np.asarray(fm.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_hacnn_activation_parity():
    import importlib

    import jax.numpy as jnp
    from tracklab_tpu.models.reid_backbones import ReidHACNN
    from tracklab_tpu.models.convert import convert_reid_backbone_torch

    refbridge.install_stubs()
    thc = importlib.import_module("strong_sort.deep.models.hacnn")

    tm = thc.HACNN(num_classes=5, loss="softmax", use_gpu=False)
    tm.eval()
    _randomize_module(tm, seed=89)
    # keep the STN translations in a sane range after randomization:
    # re-zero the hard-attn fc weights like the reference init
    with torch.no_grad():
        for ha in (tm.ha1, tm.ha2, tm.ha3):
            ha.hard_attn.fc.weight.normal_(0, 0.001)
            ha.hard_attn.fc.bias.copy_(torch.tensor(
                [0, -0.75, 0, -0.25, 0, 0.25, 0, 0.75]))

    H, W = 160, 64
    rng = np.random.default_rng(20)
    x = rng.normal(size=(2, H, W, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    fm = ReidHACNN()
    variables = convert_reid_backbone_torch(_state_dict_np(tm), fm,
                                            (1, H, W, 3))
    got = np.asarray(fm.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_pcb_activation_parity():
    import importlib

    import jax.numpy as jnp
    from tracklab_tpu.models.reid_backbones import ReidPCB
    from tracklab_tpu.models.convert import convert_reid_backbone_torch

    refbridge.install_stubs()
    tpc = importlib.import_module("strong_sort.deep.models.pcb")

    tm = tpc.PCB(num_classes=5, loss="softmax", block=tpc.Bottleneck,
                 layers=[1, 1, 1, 1], parts=6, reduced_dim=32)
    tm.eval()
    _randomize_module(tm, seed=97)

    H, W = 140, 64   # H/16 = 8.75 bins: exercises adaptive pooling
    rng = np.random.default_rng(21)
    x = rng.normal(size=(2, H, W, 3)).astype(np.float32)
    with torch.no_grad():
        # the vendored eval forward crashes on .view of the normalized
        # non-contiguous tensor (pcb.py:246) — drive its own sub-calls
        f = tm.featuremaps(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        v = tm.parts_avgpool(f)
        v = torch.nn.functional.normalize(v, p=2, dim=1)
        want = v.reshape(v.size(0), -1).numpy()

    fm = ReidPCB(layers=(1, 1, 1, 1), parts=6)
    variables = convert_reid_backbone_torch(_state_dict_np(tm), fm,
                                            (1, H, W, 3))
    got = np.asarray(fm.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_mudeep_activation_parity():
    import importlib

    import jax.numpy as jnp
    from tracklab_tpu.models.reid_backbones import ReidMuDeep
    from tracklab_tpu.models.convert import convert_reid_backbone_torch

    refbridge.install_stubs()
    tmd = importlib.import_module("strong_sort.deep.models.mudeep")

    tm = tmd.MuDeep(num_classes=5, loss="softmax")
    tm.eval()
    _randomize_module(tm, seed=101)

    H, W = 256, 128
    rng = np.random.default_rng(22)
    x = rng.normal(size=(2, H, W, 3)).astype(np.float32) * 0.2
    with torch.no_grad():
        # the vendored forward crashes on .view of the (non-contiguous)
        # expand_as product (mudeep.py:194) — drive its sub-calls
        f = tm.featuremaps(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        want = tm.fc(f.reshape(f.size(0), -1)).numpy()

    fm = ReidMuDeep()
    variables = convert_reid_backbone_torch(_state_dict_np(tm), fm,
                                            (1, H, W, 3))
    got = np.asarray(fm.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_resnet_ibn_b_activation_parity():
    import importlib

    import jax.numpy as jnp
    from tracklab_tpu.models.reid_backbones import ReidResNetIBNb
    from tracklab_tpu.models.convert import convert_reid_backbone_torch

    refbridge.install_stubs()
    tib = importlib.import_module(
        "strong_sort.deep.models.resnet_ibn_b")

    tm = tib.ResNet(block=tib.Bottleneck, layers=[2, 2, 2, 2],
                    num_classes=5, loss="softmax")
    tm.eval()
    _randomize_module(tm, seed=103)

    H, W = 128, 64
    rng = np.random.default_rng(23)
    x = rng.normal(size=(2, H, W, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    fm = ReidResNetIBNb(layers=(2, 2, 2, 2))
    variables = convert_reid_backbone_torch(_state_dict_np(tm), fm,
                                            (1, H, W, 3))
    got = np.asarray(fm.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_inceptionv4_activation_parity():
    import importlib

    import jax.numpy as jnp
    from tracklab_tpu.models.reid_backbones import ReidInceptionV4
    from tracklab_tpu.models.convert import convert_reid_backbone_torch

    refbridge.install_stubs()
    tiv = importlib.import_module(
        "strong_sort.deep.models.inceptionv4")

    tm = tiv.InceptionV4(num_classes=5, loss="softmax")
    tm.eval()
    _randomize_module(tm, seed=107)

    H, W = 160, 96   # big enough for the VALID reductions
    rng = np.random.default_rng(24)
    x = rng.normal(size=(1, H, W, 3)).astype(np.float32) * 0.2
    with torch.no_grad():
        f = tm.features(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        want = f.mean(dim=(2, 3)).numpy()

    fm = ReidInceptionV4()
    variables = convert_reid_backbone_torch(_state_dict_np(tm), fm,
                                            (1, H, W, 3))
    got = np.asarray(fm.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_inceptionresnetv2_activation_parity():
    import importlib

    import jax.numpy as jnp
    from tracklab_tpu.models.reid_backbones import ReidInceptionResNetV2
    from tracklab_tpu.models.convert import convert_reid_backbone_torch

    refbridge.install_stubs()
    tir = importlib.import_module(
        "strong_sort.deep.models.inceptionresnetv2")

    tm = tir.InceptionResNetV2(num_classes=5, loss="softmax")
    tm.eval()
    _randomize_module(tm, seed=109)

    H, W = 160, 96
    rng = np.random.default_rng(25)
    x = rng.normal(size=(1, H, W, 3)).astype(np.float32) * 0.2
    with torch.no_grad():
        f = tm.featuremaps(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        want = f.mean(dim=(2, 3)).numpy()

    fm = ReidInceptionResNetV2()
    variables = convert_reid_backbone_torch(_state_dict_np(tm), fm,
                                            (1, H, W, 3))
    got = np.asarray(fm.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_resnext_activation_parity():
    import jax.numpy as jnp
    from tracklab_tpu.models.reid_backbones import ReidResNet
    from tracklab_tpu.models.convert import convert_reid_backbone_torch

    refbridge.install_stubs()
    from strong_sort.deep.models import resnet as tresnet

    tm = tresnet.ResNet(num_classes=5, loss="softmax",
                        block=tresnet.Bottleneck, layers=[1, 1, 1, 1],
                        groups=32, width_per_group=4, last_stride=2,
                        fc_dims=None)
    tm.eval()
    _randomize_module(tm, seed=113)

    H, W = 128, 64
    rng = np.random.default_rng(26)
    x = rng.normal(size=(2, H, W, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    from tracklab_tpu.models import reid_backbones as rb
    rb.RESNET_VARIANTS["_test_next"] = ("bottleneck", (1, 1, 1, 1), 2,
                                        None, 32, 4)
    try:
        fm = ReidResNet(variant="_test_next")
        variables = convert_reid_backbone_torch(_state_dict_np(tm), fm,
                                                (1, H, W, 3))
        got = np.asarray(fm.apply(variables, jnp.asarray(x),
                                  train=False))
    finally:
        del rb.RESNET_VARIANTS["_test_next"]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_nasnet_activation_parity():
    import importlib

    import jax.numpy as jnp
    from tracklab_tpu.models.nasnet_reid import ReidNASNetAMobile
    from tracklab_tpu.models.convert import convert_reid_backbone_torch

    refbridge.install_stubs()
    tnn_ = importlib.import_module("strong_sort.deep.models.nasnet")

    tm = tnn_.NASNetAMobile(num_classes=5, loss="softmax",
                            penultimate_filters=192)
    tm.eval()
    _randomize_module(tm, seed=127)

    H, W = 128, 64
    rng = np.random.default_rng(27)
    x = rng.normal(size=(1, H, W, 3)).astype(np.float32) * 0.2
    with torch.no_grad():
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        want = tm.features(xt).numpy()

    fm = ReidNASNetAMobile(penultimate_filters=192)
    variables = convert_reid_backbone_torch(_state_dict_np(tm), fm,
                                            (1, H, W, 3))
    got = np.asarray(fm.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# TorchScript checkpoints (the reference's 'jit' multibackend format,
# strong_sort/reid_multibackend.py:39): torch.jit archives keep the source
# module's state-dict keys, so load_checkpoint routes them through the same
# name-mapped converters as .pt files
# ---------------------------------------------------------------------------

def test_torchscript_checkpoint_parity(tmp_path):
    import jax.numpy as jnp
    from tracklab_tpu.models.osnet import OSNet
    from tracklab_tpu.models.convert import checkpoint_kind, load_checkpoint

    refbridge.install_stubs()
    from strong_sort.deep.models import osnet as tosnet

    tm = tosnet.OSNet(num_classes=7, blocks=[tosnet.OSBlock] * 3,
                      layers=[2, 2, 2], channels=[16, 64, 96, 128])
    tm.eval()
    _randomize_module(tm, seed=41)

    H, W = 256, 128
    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, H, W, 3)).astype(np.float32)
    with torch.no_grad():
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        want = tm(xt).numpy()
        traced = torch.jit.trace(tm, xt)
    path = tmp_path / "osnet_x0_25.torchscript"
    traced.save(str(path))

    assert checkpoint_kind(path) == "torchscript"
    fm = OSNet(variant="x0_25")
    variables = load_checkpoint(path, fm, (1, H, W, 3))
    got = np.asarray(fm.apply(variables, jnp.asarray(x),
                              train=False)["embeddings"])
    assert want.shape == got.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
