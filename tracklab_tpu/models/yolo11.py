"""YOLO11 detector in Flax (NHWC, anchor-free DFL head).

The reference's DEFAULT detector: the ultralytics wrapper loads
yolo11n..x checkpoints (tracklab/wrappers/bbox_detector/
yolo_ultralytics_api.py + configs/modules/bbox_detector/
yolo_ultralytics.yaml -> yolo11m.pt). Exact ultralytics YOLO11
semantics: C3k2 stages (C2f whose inner blocks are either e=0.5
bottlenecks or C3k sub-CSPs), SPPF, a C2PSA attention stage after the
backbone, the v8 PAN head with C3k2 fusion blocks, and the v11 Detect
head whose class branch uses depthwise-separable pairs. Decode shares
models/yolov8.decode_v8 (DFL + sigmoid classes).

Flax module names mirror the ultralytics state-dict keys
(model.0 .. model.23, '.' spelled '__'), so official yolo11*.pt
checkpoints convert by the same name-mapped pass as YOLOv8
(models/convert.py:convert_yolov8_torch routes by key names);
activation parity vs an independent torch YOLO11 in
tests/test_weight_parity.py.
"""
from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from tracklab_tpu.models.yolov8 import (
    Conv, SPPF, _up2, decode_v8,
)

__all__ = ["YOLO11", "YOLO11Pose", "YOLO11_VARIANTS",
           "decode_v11_kpts"]

# depth, width, max_channels (ultralytics yolo11.yaml scales); for the
# m/l/x scales ultralytics forces c3k=True in EVERY C3k2
# (nn/tasks.py parse_model)
YOLO11_VARIANTS = {
    "n": dict(d=0.50, w=0.25, mc=1024, force_c3k=False),
    "s": dict(d=0.50, w=0.50, mc=1024, force_c3k=False),
    "m": dict(d=0.50, w=1.00, mc=512, force_c3k=True),
    "l": dict(d=1.00, w=1.00, mc=512, force_c3k=True),
    "x": dict(d=1.00, w=1.50, mc=512, force_c3k=True),
}


def _ch(c, w, mc):
    return max(math.ceil(min(c, mc) * w / 8) * 8, 8)


def _n(n, d):
    return max(int(round(n * d)), 1)


class BottleneckE(nn.Module):
    """ultralytics Bottleneck with expansion (k=(3,3), e=0.5 — the
    C3k2 direct-bottleneck configuration; C2f's own uses e=1.0)."""
    features: int
    shortcut: bool = True
    e: float = 0.5
    dtype: Any = jnp.float32
    quant: str | None = None

    @nn.compact
    def __call__(self, x, train=False):
        hidden = int(self.features * self.e)
        y = Conv(hidden, 3, dtype=self.dtype, quant=self.quant,
                 name="cv1")(x, train)
        y = Conv(self.features, 3, dtype=self.dtype, quant=self.quant,
                 name="cv2")(y, train)
        return x + y if self.shortcut and x.shape[-1] == self.features \
            else y


class C3k(nn.Module):
    """C3 with kernel-3 bottlenecks (n=2 inner, e=0.5)."""
    features: int
    n: int = 2
    shortcut: bool = True
    dtype: Any = jnp.float32
    quant: str | None = None

    @nn.compact
    def __call__(self, x, train=False):
        c = self.features // 2
        a = Conv(c, 1, dtype=self.dtype, quant=self.quant,
                 name="cv1")(x, train)
        for j in range(self.n):
            a = BottleneckE(c, self.shortcut, e=1.0, dtype=self.dtype,
                            quant=self.quant, name=f"m__{j}")(a, train)
        b = Conv(c, 1, dtype=self.dtype, quant=self.quant,
                 name="cv2")(x, train)
        return Conv(self.features, 1, dtype=self.dtype, quant=self.quant,
                    name="cv3")(jnp.concatenate([a, b], -1), train)


class C3k2(nn.Module):
    """C2f whose inner blocks are C3k (c3k=True) or e=0.5 bottlenecks."""
    features: int
    n: int = 1
    c3k: bool = False
    e: float = 0.5
    shortcut: bool = True
    dtype: Any = jnp.float32
    quant: str | None = None

    @nn.compact
    def __call__(self, x, train=False):
        c = int(self.features * self.e)
        y = Conv(2 * c, 1, dtype=self.dtype, quant=self.quant,
                 name="cv1")(x, train)
        parts = [y[..., :c], y[..., c:]]
        for k in range(self.n):
            if self.c3k:
                parts.append(C3k(c, 2, self.shortcut, dtype=self.dtype,
                                 quant=self.quant,
                                 name=f"m__{k}")(parts[-1], train))
            else:
                parts.append(BottleneckE(
                    c, self.shortcut, e=0.5, dtype=self.dtype,
                    quant=self.quant, name=f"m__{k}")(parts[-1], train))
        return Conv(self.features, 1, dtype=self.dtype, quant=self.quant,
                    name="cv2")(jnp.concatenate(parts, -1), train)


class ConvNoAct(nn.Module):
    """ultralytics Conv(act=False): conv + bn, identity activation."""
    features: int
    kernel: int = 1
    groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    padding=[(self.kernel // 2,) * 2] * 2,
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=jnp.float32, name="bn")(x)
        return x.astype(self.dtype)


class Attention(nn.Module):
    """ultralytics nn.modules.block.Attention: qkv 1x1 conv, spatial
    softmax attention per head, depthwise 3x3 positional term on v."""
    dim: int
    num_heads: int
    attn_ratio: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        B, H, W, C = x.shape
        N = H * W
        head_dim = self.dim // self.num_heads
        key_dim = int(head_dim * self.attn_ratio)
        nh_kd = key_dim * self.num_heads
        h = self.dim + nh_kd * 2
        qkv = ConvNoAct(h, 1, dtype=self.dtype, name="qkv")(x, train)
        # torch: view(B, nh, kd*2+hd, N) over the CHANNEL axis then
        # split -> per-head [q(kd), k(kd), v(hd)] blocks
        qkv = qkv.reshape(B, N, self.num_heads, key_dim * 2 + head_dim)
        q = qkv[..., :key_dim]                       # (B, N, nh, kd)
        k = qkv[..., key_dim:2 * key_dim]
        v = qkv[..., 2 * key_dim:]                   # (B, N, nh, hd)
        attn = jnp.einsum("bnhk,bmhk->bhnm", q.astype(jnp.float32),
                          k.astype(jnp.float32)) * (key_dim ** -0.5)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn,
                         v.astype(jnp.float32))
        out = out.reshape(B, H, W, self.dim).astype(self.dtype)
        pe = ConvNoAct(self.dim, 3, groups=self.dim, dtype=self.dtype,
                       name="pe")(v.reshape(B, H, W, self.dim), train)
        return ConvNoAct(self.dim, 1, dtype=self.dtype,
                         name="proj")(out + pe, train)


class PSABlock(nn.Module):
    """attention + conv FFN, both residual."""
    dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = x + Attention(self.dim, self.num_heads, dtype=self.dtype,
                          name="attn")(x, train)
        y = Conv(self.dim * 2, 1, dtype=self.dtype,
                 name="ffn__0")(x, train)
        y = ConvNoAct(self.dim, 1, dtype=self.dtype,
                      name="ffn__1")(y, train)
        return x + y


class C2PSA(nn.Module):
    """CSP wrapper around n PSABlocks (c1 == c2, e=0.5)."""
    features: int
    n: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        c = self.features // 2
        y = Conv(2 * c, 1, dtype=self.dtype, name="cv1")(x, train)
        a, b = y[..., :c], y[..., c:]
        for j in range(self.n):
            b = PSABlock(c, max(c // 64, 1), dtype=self.dtype,
                         name=f"m__{j}")(b, train)
        return Conv(self.features, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate([a, b], -1), train)


class YOLO11(nn.Module):
    num_classes: int = 80
    variant: str = "n"
    reg_max: int = 16
    dtype: Any = jnp.float32
    quant: str | None = None

    @nn.compact
    def __call__(self, x, train=False):
        outs, _ = self._forward(x, train)
        return outs

    def _forward(self, x, train=False):
        """Shared trunk+detect graph; returns (per-level det maps,
        the three neck features) so the Pose subclass can attach its
        keypoint branch to the SAME features within one module scope
        (keeping the model.23.* key namespace flat, as in ultralytics
        pose checkpoints)."""
        v = YOLO11_VARIANTS[self.variant]
        dt = self.dtype

        def ch(c):
            return _ch(c, v["w"], v["mc"])

        def rep(n):
            return _n(n, v["d"])

        fc = v["force_c3k"]
        x = Conv(ch(64), 3, 2, dtype=dt, quant=self.quant, name="model__0")(x, train)
        x = Conv(ch(128), 3, 2, dtype=dt, quant=self.quant, name="model__1")(x, train)
        x = C3k2(ch(256), rep(2), c3k=fc, e=0.25, dtype=dt, quant=self.quant,
                 name="model__2")(x, train)
        x = Conv(ch(256), 3, 2, dtype=dt, quant=self.quant, name="model__3")(x, train)
        p3 = C3k2(ch(512), rep(2), c3k=fc, e=0.25, dtype=dt, quant=self.quant,
                  name="model__4")(x, train)
        x = Conv(ch(512), 3, 2, dtype=dt, quant=self.quant, name="model__5")(p3, train)
        p4 = C3k2(ch(512), rep(2), c3k=True, dtype=dt, quant=self.quant,
                  name="model__6")(x, train)
        x = Conv(ch(1024), 3, 2, dtype=dt, quant=self.quant, name="model__7")(p4, train)
        x = C3k2(ch(1024), rep(2), c3k=True, dtype=dt, quant=self.quant,
                 name="model__8")(x, train)
        x = SPPF(ch(1024), dtype=dt, quant=self.quant, name="model__9")(x, train)
        p5 = C2PSA(ch(1024), rep(2), dtype=dt, name="model__10")(x, train)

        # head (nodes 11-22)
        u4 = C3k2(ch(512), rep(2), c3k=fc, dtype=dt, quant=self.quant, name="model__13")(
            jnp.concatenate([_up2(p5), p4], -1), train)
        u3 = C3k2(ch(256), rep(2), c3k=fc, dtype=dt, quant=self.quant, name="model__16")(
            jnp.concatenate([_up2(u4), p3], -1), train)
        d4 = C3k2(ch(512), rep(2), c3k=fc, dtype=dt, quant=self.quant, name="model__19")(
            jnp.concatenate([
                Conv(ch(256), 3, 2, dtype=dt, quant=self.quant,
                     name="model__17")(u3, train), u4], -1), train)
        d5 = C3k2(ch(1024), rep(2), c3k=True, dtype=dt, quant=self.quant,
                  name="model__22")(
            jnp.concatenate([
                Conv(ch(512), 3, 2, dtype=dt, quant=self.quant,
                     name="model__20")(d4, train), p5], -1), train)

        # Detect (node 23, legacy=False): reg branch as v8, class
        # branch = two DW+PW pairs then 1x1 (nn/modules/head.py)
        feats = [u3, d4, d5]  # also returned for the Pose subclass
        c2 = max(16, feats[0].shape[-1] // 4, self.reg_max * 4)
        c3 = max(feats[0].shape[-1], min(self.num_classes, 100))
        outs = []
        for i, f in enumerate(feats):
            fc_in = f.shape[-1]
            r = Conv(c2, 3, dtype=dt, quant=self.quant,
                     name=f"model__23__cv2__{i}__0")(f, train)
            r = Conv(c2, 3, dtype=dt, quant=self.quant,
                     name=f"model__23__cv2__{i}__1")(r, train)
            r = nn.Conv(4 * self.reg_max, (1, 1), dtype=dt,
                        name=f"model__23__cv2__{i}__2")(r)
            c = Conv(fc_in, 3, dtype=dt, quant=self.quant, groups=fc_in,
                     name=f"model__23__cv3__{i}__0__0")(f, train)
            c = Conv(c3, 1, dtype=dt, quant=self.quant,
                     name=f"model__23__cv3__{i}__0__1")(c, train)
            c = Conv(c3, 3, dtype=dt, quant=self.quant, groups=c3,
                     name=f"model__23__cv3__{i}__1__0")(c, train)
            c = Conv(c3, 1, dtype=dt, quant=self.quant,
                     name=f"model__23__cv3__{i}__1__1")(c, train)
            c = nn.Conv(self.num_classes, (1, 1), dtype=dt,
                        name=f"model__23__cv3__{i}__2")(c)
            outs.append(jnp.concatenate([r, c], -1))
        return outs, feats

    def predict(self, images, train=False):
        return decode_v8(self(images, train=train), self.num_classes,
                         self.reg_max)


def decode_v11_kpts(kpt_outs, num_keypoints, strides=(8, 16, 32)):
    """ultralytics Pose.kpts_decode: per-anchor (K, 3) raw maps ->
    pixel keypoints: xy = (raw*2 + anchor - 0.5) * stride with anchor
    points at cell centers (x+0.5, y+0.5); conf = sigmoid."""
    import jax

    out = []
    for kmap, stride in zip(kpt_outs, strides):
        b, h, w, _ = kmap.shape
        k = kmap.astype(jnp.float32).reshape(b, h * w, num_keypoints, 3)
        gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5
        gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5
        anchor = jnp.stack([gx, gy], -1).reshape(1, h * w, 1, 2)
        xy = (k[..., :2] * 2.0 + anchor - 0.5) * stride
        conf = jax.nn.sigmoid(k[..., 2:3])
        out.append(jnp.concatenate([xy, conf], -1))
    return jnp.concatenate(out, axis=1)


class YOLO11Pose(YOLO11):
    """YOLO11 pose model (ultralytics Pose head on the v11 trunk):
    the reference's bottom-up pose default
    (yolo_ultralytics-pose.yaml -> yolo11m-pose.pt). The keypoint
    branch (model.23.cv4) regresses per-anchor (K, 3) offsets.

    ``__call__`` returns (det_outs, kpt_outs); ``predict`` returns
    (decoded boxes (B, A, 5+C), keypoints (B, A, K, 3) in pixels)."""
    num_keypoints: int = 17

    @nn.compact
    def __call__(self, x, train=False):
        det_outs, feats = self._forward(x, train)
        nk = self.num_keypoints * 3
        c4 = max(feats[0].shape[-1] // 4, nk)
        kpt_outs = []
        for i, f in enumerate(feats):
            k = Conv(c4, 3, dtype=self.dtype,
                     name=f"model__23__cv4__{i}__0")(f, train)
            k = Conv(c4, 3, dtype=self.dtype,
                     name=f"model__23__cv4__{i}__1")(k, train)
            k = nn.Conv(nk, (1, 1), dtype=self.dtype,
                        name=f"model__23__cv4__{i}__2")(k)
            kpt_outs.append(k)
        return det_outs, kpt_outs

    def predict(self, images, train=False):
        det_outs, kpt_outs = self(images, train=train)
        decoded = decode_v8(det_outs, self.num_classes, self.reg_max)
        kps = decode_v11_kpts(kpt_outs, self.num_keypoints)
        return decoded, kps
