"""RTMDet detector in Flax (NHWC, bf16-friendly).

TPU-native re-implementation of the architecture behind the reference's
rtmlib/ONNX RTMDet wrapper (tracklab/wrappers/bbox_detector/rtmlib_api.py
with configs/modules/bbox_detector/rtmdet_rtmlib.yaml) following the
mmdetection semantics: CSPNeXt backbone (5x5 depthwise-separable second
conv per block, per-stage channel attention), CSPNeXtPAFPN neck, and the
shared-conv/separate-BN anchor-free head with ReLU distance regression
decoded from offset-0 grid points.

Module names mirror the mmdet state-dict segments (``backbone.stem.0``
-> ``stem_0`` etc.) so torch checkpoints convert by pure name mapping
(models/convert.py:convert_by_name) with full shape verification.

Variants via (deepen_factor, widen_factor), the mmdet config family.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["RTMDet", "RTMDET_VARIANTS", "decode_rtmdet"]

RTMDET_VARIANTS = {
    "nano": dict(deepen=0.33, widen=0.25),
    "tiny": dict(deepen=0.167, widen=0.375),
    "s": dict(deepen=0.33, widen=0.5),
    "m": dict(deepen=0.67, widen=0.75),
    "l": dict(deepen=1.0, widen=1.0),
    "x": dict(deepen=1.33, widen=1.25),
}

# (out_channels, num_blocks, add_identity, use_spp) at base scale;
# mmdet cspnext.py arch_settings['P5'] rows 1-4
_ARCH = [(128, 3, True, False), (256, 6, True, False),
         (512, 6, True, False), (1024, 3, False, True)]


def _widen(c, widen):
    return max(int(c * widen), 8)


def _deepen(n, deepen):
    return max(int(round(n * deepen)), 1)


class ConvModule(nn.Module):
    """mmcv ConvModule conv+BN+SiLU (names: conv, bn)."""
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=self.stride,
                    padding=[(self.kernel // 2, self.kernel // 2)] * 2,
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn")(x)
        # bf16 inter-layer activations: BN+silu in f32, output cast back
        # (the detector is HBM-bandwidth bound; see models/yolox.py)
        return nn.silu(x).astype(self.dtype)


class DWSepConvModule(nn.Module):
    """mmcv DepthwiseSeparableConvModule (names: depthwise_conv,
    pointwise_conv)."""
    features: int
    kernel: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvModule(x.shape[-1], self.kernel, 1, groups=x.shape[-1],
                       dtype=self.dtype, name="depthwise_conv")(x, train)
        return ConvModule(self.features, 1, 1, dtype=self.dtype,
                          name="pointwise_conv")(x, train)


class CSPNeXtBlock(nn.Module):
    """3x3 conv + 5x5 depthwise-separable conv, residual add
    (mmdet csp_layer.py CSPNeXtBlock, expansion 1.0 inside CSPLayer)."""
    features: int
    add_identity: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvModule(self.features, 3, dtype=self.dtype,
                       name="conv1")(x, train)
        y = DWSepConvModule(self.features, 5, dtype=self.dtype,
                            name="conv2")(y, train)
        if self.add_identity and x.shape[-1] == self.features:
            return x + y
        return y


class ChannelAttention(nn.Module):
    """Global-avg-pool -> 1x1 conv (bias) -> hardsigmoid scale
    (mmdet csp_layer.py ChannelAttention; name: fc)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = jnp.mean(x, axis=(1, 2), keepdims=True)
        w = nn.Conv(x.shape[-1], (1, 1), use_bias=True,
                    dtype=self.dtype, name="fc")(w)
        # torch hardsigmoid: relu6(x + 3) / 6
        w = jnp.clip(w + 3.0, 0.0, 6.0) / 6.0
        return x * w


class CSPLayer(nn.Module):
    """CSP stage with CSPNeXt blocks + optional channel attention
    (names: main_conv, short_conv, final_conv, blocks_{j}, attention)."""
    features: int
    num_blocks: int
    add_identity: bool = True
    channel_attention: bool = True
    expand_ratio: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = int(self.features * self.expand_ratio)
        x_short = ConvModule(mid, 1, dtype=self.dtype,
                             name="short_conv")(x, train)
        y = ConvModule(mid, 1, dtype=self.dtype, name="main_conv")(x, train)
        for j in range(self.num_blocks):
            y = CSPNeXtBlock(mid, self.add_identity, dtype=self.dtype,
                             name=f"blocks_{j}")(y, train)
        y = jnp.concatenate([y, x_short], axis=-1)
        if self.channel_attention:
            y = ChannelAttention(dtype=self.dtype, name="attention")(y)
        return ConvModule(self.features, 1, dtype=self.dtype,
                          name="final_conv")(y, train)


class SPPBottleneck(nn.Module):
    """Parallel max-pools k=5,9,13 (names: conv1, conv2)."""
    features: int
    kernels: Sequence[int] = (5, 9, 13)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = x.shape[-1] // 2
        x = ConvModule(mid, 1, dtype=self.dtype, name="conv1")(x, train)
        pools = [x] + [
            nn.max_pool(x, (k, k), strides=(1, 1),
                        padding=[(k // 2, k // 2)] * 2)
            for k in self.kernels
        ]
        x = jnp.concatenate(pools, axis=-1)
        return ConvModule(self.features, 1, dtype=self.dtype,
                          name="conv2")(x, train)


class CSPNeXt(nn.Module):
    """Backbone (mmdet cspnext.py): 3-conv stem + 4 stages, returning
    strides 8/16/32 (out_indices 2,3,4)."""
    deepen: float
    widen: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c0 = _widen(64, self.widen)
        x = ConvModule(c0 // 2, 3, 2, dtype=self.dtype,
                       name="stem_0")(x, train)
        x = ConvModule(c0 // 2, 3, 1, dtype=self.dtype,
                       name="stem_1")(x, train)
        x = ConvModule(c0, 3, 1, dtype=self.dtype, name="stem_2")(x, train)
        outs = []
        for i, (c, n, add_id, use_spp) in enumerate(_ARCH):
            cw = _widen(c, self.widen)
            nd = _deepen(n, self.deepen)
            # stage{i+1}.0 downsample conv, [.1 spp], .last csp layer
            x = ConvModule(cw, 3, 2, dtype=self.dtype,
                           name=f"stage{i + 1}_0")(x, train)
            j = 1
            if use_spp:
                x = SPPBottleneck(cw, dtype=self.dtype,
                                  name=f"stage{i + 1}_1")(x, train)
                j = 2
            x = CSPLayer(cw, nd, add_identity=add_id,
                         channel_attention=True, dtype=self.dtype,
                         name=f"stage{i + 1}_{j}")(x, train)
            if i >= 1:
                outs.append(x)
        return outs  # strides 8, 16, 32


def _upsample2(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")


class CSPNeXtPAFPN(nn.Module):
    """Neck (mmdet cspnext_pafpn.py): top-down + bottom-up CSP paths and
    per-level 3x3 out convs to a common width."""
    deepen: float
    widen: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        c3, c4, c5 = feats  # strides 8, 16, 32
        in_ch = [_widen(256, self.widen), _widen(512, self.widen),
                 _widen(1024, self.widen)]
        n = _deepen(3, self.deepen)
        # top-down
        r1 = ConvModule(in_ch[1], 1, dtype=self.dtype,
                        name="reduce_layers_0")(c5, train)
        td1 = CSPLayer(in_ch[1], n, add_identity=False,
                       channel_attention=True, dtype=self.dtype,
                       name="top_down_blocks_0")(
            jnp.concatenate([_upsample2(r1), c4], axis=-1), train)
        r2 = ConvModule(in_ch[0], 1, dtype=self.dtype,
                        name="reduce_layers_1")(td1, train)
        td2 = CSPLayer(in_ch[0], n, add_identity=False,
                       channel_attention=True, dtype=self.dtype,
                       name="top_down_blocks_1")(
            jnp.concatenate([_upsample2(r2), c3], axis=-1), train)
        # bottom-up
        d1 = ConvModule(in_ch[0], 3, 2, dtype=self.dtype,
                        name="downsamples_0")(td2, train)
        bu1 = CSPLayer(in_ch[1], n, add_identity=False,
                       channel_attention=True, dtype=self.dtype,
                       name="bottom_up_blocks_0")(
            jnp.concatenate([d1, r2], axis=-1), train)
        d2 = ConvModule(in_ch[1], 3, 2, dtype=self.dtype,
                        name="downsamples_1")(bu1, train)
        bu2 = CSPLayer(in_ch[2], n, add_identity=False,
                       channel_attention=True, dtype=self.dtype,
                       name="bottom_up_blocks_1")(
            jnp.concatenate([d2, r1], axis=-1), train)
        out_c = _widen(256, self.widen)
        return [
            ConvModule(out_c, 3, dtype=self.dtype,
                       name=f"out_convs_{i}")(f, train)
            for i, f in enumerate([td2, bu1, bu2])
        ]


class RTMDetSepBNHead(nn.Module):
    """Anchor-free head (mmdet rtmdet_head.py RTMDetSepBNHead,
    share_conv=True): conv KERNELS shared across levels, BatchNorm
    separate per level; 1x1 rtm_cls / rtm_reg per level. Returns
    per-level (cls_logits, reg_raw) maps."""
    num_classes: int
    widen: float
    stacked_convs: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        feat_c = _widen(256, self.widen)
        # shared conv kernels: instantiate once, call per level; the BN
        # inside ConvModule must differ per level, so convs and norms are
        # split here (unlike the fused ConvModule elsewhere)
        cls_convs = [nn.Conv(feat_c, (3, 3), padding=1, use_bias=False,
                             dtype=self.dtype, name=f"cls_convs_share_{j}")
                     for j in range(self.stacked_convs)]
        reg_convs = [nn.Conv(feat_c, (3, 3), padding=1, use_bias=False,
                             dtype=self.dtype, name=f"reg_convs_share_{j}")
                     for j in range(self.stacked_convs)]
        outputs = []
        for lvl, x in enumerate(feats):
            c = x
            for j in range(self.stacked_convs):
                c = cls_convs[j](c)
                c = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5,
                                 dtype=jnp.float32,
                                 name=f"cls_bn_{lvl}_{j}")(c)
                c = nn.silu(c)
            cls_out = nn.Conv(self.num_classes, (1, 1), use_bias=True,
                              dtype=self.dtype,
                              name=f"rtm_cls_{lvl}")(c)
            r = x
            for j in range(self.stacked_convs):
                r = reg_convs[j](r)
                r = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5,
                                 dtype=jnp.float32,
                                 name=f"reg_bn_{lvl}_{j}")(r)
                r = nn.silu(r)
            reg_out = nn.Conv(4, (1, 1), use_bias=True, dtype=self.dtype,
                              name=f"rtm_reg_{lvl}")(r)
            outputs.append((cls_out, reg_out))
        return outputs


def decode_rtmdet(outputs, strides=(8, 16, 32)):
    """Per-level (cls_logits, reg_raw) -> (B, A, 5+C) in the shared
    [xywh, obj=1, cls_probs] layout consumed by
    ops.nms.postprocess_detections. RTMDet decode (mmdet
    rtmdet_head.py, exp_on_reg=False): distances = reg * stride from
    offset-0 grid points (MlvlPointGenerator offset=0);
    scores = sigmoid(cls)."""
    decoded = []
    for (cls_out, reg_out), stride in zip(outputs, strides):
        b, h, w, C = cls_out.shape
        gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) * stride
        gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) * stride
        dist = reg_out.astype(jnp.float32) * stride
        l, t, r_, btm = (dist[..., 0], dist[..., 1], dist[..., 2],
                         dist[..., 3])
        x1, y1 = gx - l, gy - t
        x2, y2 = gx + r_, gy + btm
        xywh = jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2,
                          x2 - x1, y2 - y1], axis=-1)
        obj = jnp.ones((b, h, w, 1), jnp.float32)
        cls = jax.nn.sigmoid(cls_out.astype(jnp.float32))
        dec = jnp.concatenate([xywh, obj, cls], axis=-1)
        decoded.append(dec.reshape(b, h * w, 5 + C))
    return jnp.concatenate(decoded, axis=1)


class RTMDet(nn.Module):
    """Full detector. ``__call__`` returns per-level (cls, reg) maps;
    ``predict`` returns decoded (B, A, 5+C)."""
    num_classes: int = 1
    variant: str = "nano"
    dtype: Any = jnp.float32

    def setup(self):
        v = RTMDET_VARIANTS[self.variant]
        self.backbone = CSPNeXt(v["deepen"], v["widen"], dtype=self.dtype)
        self.neck = CSPNeXtPAFPN(v["deepen"], v["widen"],
                                 dtype=self.dtype)
        self.bbox_head = RTMDetSepBNHead(self.num_classes, v["widen"],
                                         dtype=self.dtype)

    def __call__(self, images, train: bool = False):
        feats = self.backbone(images, train)
        feats = self.neck(feats, train)
        return self.bbox_head(feats, train)

    def predict(self, images):
        return decode_rtmdet(self(images, train=False))
