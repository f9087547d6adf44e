"""YOLOv8 detector in Flax (NHWC, anchor-free DFL head).

JAX port of the architecture behind the reference's ultralytics wrapper
(tracklab/wrappers/bbox_detector/yolo_ultralytics_api.py:22-72 — the
BASELINE config-1 detector, YOLOv8n): C2f backbone + SPPF, PAN neck, and
the decoupled head regressing per-side distance distributions (DFL over
``reg_max`` bins) plus class logits. Decode runs fully vectorized on
device; boxes come out in input pixels ready for ops/nms.

Flax module names mirror the ultralytics state-dict keys
(model.0 .. model.22, '.' spelled '__') so
:func:`tracklab_tpu.models.convert.convert_yolov8_torch` is a pure
name-mapped relayout — activation parity vs an independent torch YOLOv8
in tests/test_weight_parity.py.
"""
from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["YOLOv8", "YOLOV8_VARIANTS", "decode_v8"]

# depth_mult, width_mult, max_channels
YOLOV8_VARIANTS = {
    "n": dict(d=0.33, w=0.25, mc=1024),
    "s": dict(d=0.33, w=0.50, mc=1024),
    "m": dict(d=0.67, w=0.75, mc=768),
    "l": dict(d=1.00, w=1.00, mc=512),
    "x": dict(d=1.00, w=1.25, mc=512),
}


def _ch(c, w, mc):
    # ultralytics make_divisible(min(c, max_channels) * width, 8)
    return max(math.ceil(min(c, mc) * w / 8) * 8, 8)


def _n(n, d):
    return max(int(round(n * d)), 1)


class Conv(nn.Module):
    """conv+bn+silu. ``quant`` as in models/yolox.py ConvBnAct: None /
    "calib" / "int8" (models/quantize.py); grouped convs stay float."""
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    dtype: Any = jnp.float32
    quant: str | None = None

    @nn.compact
    def __call__(self, x, train=False):
        pad = [(self.kernel // 2,) * 2] * 2
        if self.quant == "int8" and self.groups == 1 and not train:
            from tracklab_tpu.models.quantize import (
                ascale_variable, quant_conv_int8,
            )
            from tracklab_tpu.models.yolox import _FocusKernel
            k = _FocusKernel(
                (self.kernel, self.kernel, x.shape[-1], self.features),
                name="conv")()
            x = quant_conv_int8(x, k, ascale_variable(self),
                                (self.stride, self.stride), pad)
        else:
            if self.quant == "calib" and self.groups == 1:
                from tracklab_tpu.models.quantize import sow_absmax
                sow_absmax(self, x)
            x = nn.Conv(self.features, (self.kernel, self.kernel),
                        strides=self.stride, padding=pad,
                        feature_group_count=self.groups,
                        use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=jnp.float32, name="bn")(x)
        # bf16 inter-layer activations: BN+silu in f32, output cast back
        # (the detector is HBM-bandwidth bound; see models/yolox.py)
        return nn.silu(x).astype(self.dtype)


class Bottleneck(nn.Module):
    features: int
    shortcut: bool = True
    dtype: Any = jnp.float32
    quant: str | None = None

    @nn.compact
    def __call__(self, x, train=False):
        y = Conv(self.features, 3, dtype=self.dtype, quant=self.quant,
                 name="cv1")(x, train)
        y = Conv(self.features, 3, dtype=self.dtype, quant=self.quant,
                 name="cv2")(y, train)
        return x + y if self.shortcut and x.shape[-1] == self.features \
            else y


class C2f(nn.Module):
    features: int
    n: int = 1
    shortcut: bool = True
    dtype: Any = jnp.float32
    quant: str | None = None

    @nn.compact
    def __call__(self, x, train=False):
        c = self.features // 2
        y = Conv(2 * c, 1, dtype=self.dtype, quant=self.quant,
                 name="cv1")(x, train)
        parts = [y[..., :c], y[..., c:]]
        for k in range(self.n):
            parts.append(Bottleneck(c, self.shortcut, dtype=self.dtype,
                                    quant=self.quant,
                                    name=f"m__{k}")(parts[-1], train))
        return Conv(self.features, 1, dtype=self.dtype, quant=self.quant,
                    name="cv2")(jnp.concatenate(parts, -1), train)


class SPPF(nn.Module):
    features: int
    dtype: Any = jnp.float32
    quant: str | None = None

    @nn.compact
    def __call__(self, x, train=False):
        c = x.shape[-1] // 2
        x = Conv(c, 1, dtype=self.dtype, quant=self.quant,
                 name="cv1")(x, train)
        pools = [x]
        for _ in range(3):
            pools.append(nn.max_pool(pools[-1], (5, 5), strides=(1, 1),
                                     padding=[(2, 2)] * 2))
        return Conv(self.features, 1, dtype=self.dtype, quant=self.quant,
                    name="cv2")(jnp.concatenate(pools, -1), train)


def _up2(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), "nearest")


class YOLOv8(nn.Module):
    num_classes: int = 80
    variant: str = "n"
    reg_max: int = 16
    dtype: Any = jnp.float32
    quant: str | None = None

    @nn.compact
    def __call__(self, x, train=False):
        v = YOLOV8_VARIANTS[self.variant]
        d, w, mc = v["d"], v["w"], v["mc"]
        ch = lambda c: _ch(c, w, mc)
        nn_ = lambda k: _n(k, d)
        dt = self.dtype

        # backbone (module indices mirror the ultralytics yolov8 yaml)
        x = Conv(ch(64), 3, 2, dtype=dt, quant=self.quant, name="model__0")(x, train)   # /2
        x = Conv(ch(128), 3, 2, dtype=dt, quant=self.quant, name="model__1")(x, train)  # /4
        x = C2f(ch(128), nn_(3), dtype=dt, quant=self.quant, name="model__2")(x, train)
        x = Conv(ch(256), 3, 2, dtype=dt, quant=self.quant, name="model__3")(x, train)  # /8
        p3 = C2f(ch(256), nn_(6), dtype=dt, quant=self.quant, name="model__4")(x, train)
        x = Conv(ch(512), 3, 2, dtype=dt, quant=self.quant, name="model__5")(p3, train)  # /16
        p4 = C2f(ch(512), nn_(6), dtype=dt, quant=self.quant, name="model__6")(x, train)
        x = Conv(ch(1024), 3, 2, dtype=dt, quant=self.quant, name="model__7")(p4, train)  # /32
        x = C2f(ch(1024), nn_(3), dtype=dt, quant=self.quant, name="model__8")(x, train)
        p5 = SPPF(ch(1024), dtype=dt, quant=self.quant, name="model__9")(x, train)

        # PAN neck
        u4 = C2f(ch(512), nn_(3), shortcut=False, dtype=dt, quant=self.quant,
                 name="model__12")(
            jnp.concatenate([_up2(p5), p4], -1), train)
        u3 = C2f(ch(256), nn_(3), shortcut=False, dtype=dt, quant=self.quant,
                 name="model__15")(
            jnp.concatenate([_up2(u4), p3], -1), train)
        d4 = C2f(ch(512), nn_(3), shortcut=False, dtype=dt, quant=self.quant,
                 name="model__18")(
            jnp.concatenate(
                [Conv(ch(256), 3, 2, dtype=dt, quant=self.quant,
                      name="model__16")(u3, train), u4], -1), train)
        d5 = C2f(ch(1024), nn_(3), shortcut=False, dtype=dt, quant=self.quant,
                 name="model__21")(
            jnp.concatenate(
                [Conv(ch(512), 3, 2, dtype=dt, quant=self.quant,
                      name="model__19")(d4, train), p5], -1), train)

        # decoupled DFL head: branch widths come from the FIRST level's
        # channels for ALL levels (ultralytics Detect.__init__)
        feats = (u3, d4, d5)
        c_reg = max(16, feats[0].shape[-1] // 4, self.reg_max * 4)
        c_cls = max(feats[0].shape[-1], min(self.num_classes, 100))
        outs = []
        for i, f in enumerate(feats):
            r = Conv(c_reg, 3, dtype=dt, quant=self.quant,
                     name=f"model__22__cv2__{i}__0")(f, train)
            r = Conv(c_reg, 3, dtype=dt, quant=self.quant,
                     name=f"model__22__cv2__{i}__1")(r, train)
            reg = nn.Conv(4 * self.reg_max, (1, 1), dtype=dt,
                          name=f"model__22__cv2__{i}__2")(r)
            c = Conv(c_cls, 3, dtype=dt, quant=self.quant,
                     name=f"model__22__cv3__{i}__0")(f, train)
            c = Conv(c_cls, 3, dtype=dt, quant=self.quant,
                     name=f"model__22__cv3__{i}__1")(c, train)
            cls = nn.Conv(self.num_classes, (1, 1), dtype=dt,
                          name=f"model__22__cv3__{i}__2")(c)
            outs.append(jnp.concatenate([reg, cls], -1))
        return outs

    def predict(self, images, train=False):
        outs = self(images, train=train)
        return decode_v8(outs, self.num_classes, self.reg_max)


def decode_v8(outputs, num_classes, reg_max=16, strides=(8, 16, 32)):
    """Per-level (B, H, W, 4*reg_max + C) -> (B, A, 5 + C) decoded
    [xywh, obj=1 placeholder, cls scores] in input pixels, matching the
    (xywh, obj, cls) layout consumed by ops/nms.postprocess_detections
    (YOLOv8 has no objectness branch; obj is fixed to 1)."""
    decoded = []
    for out, stride in zip(outputs, strides):
        b, h, w, _ = out.shape
        out = out.astype(jnp.float32)
        reg = out[..., : 4 * reg_max].reshape(b, h, w, 4, reg_max)
        dist = jnp.sum(jax.nn.softmax(reg, axis=-1)
                       * jnp.arange(reg_max, dtype=jnp.float32), axis=-1)
        gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5
        gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5
        x1 = (gx - dist[..., 0]) * stride
        y1 = (gy - dist[..., 1]) * stride
        x2 = (gx + dist[..., 2]) * stride
        y2 = (gy + dist[..., 3]) * stride
        cx = (x1 + x2) / 2
        cy = (y1 + y2) / 2
        bw = x2 - x1
        bh = y2 - y1
        cls = jax.nn.sigmoid(out[..., 4 * reg_max:])
        obj = jnp.ones((b, h, w, 1), jnp.float32)
        dec = jnp.concatenate(
            [jnp.stack([cx, cy, bw, bh], -1), obj, cls], -1)
        decoded.append(dec.reshape(b, h * w, 5 + num_classes))
    return jnp.concatenate(decoded, axis=1)
