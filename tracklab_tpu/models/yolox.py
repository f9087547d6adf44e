"""YOLOX detector in Flax (NHWC, bf16-friendly, MXU-aligned widths).

TPU-native re-implementation of the architecture behind the reference's
rtmlib/ONNX YOLOX wrapper (tracklab/wrappers/bbox_detector/rtmlib_api.py)
and the DanceTrack baseline config (BASELINE config 2). Design notes:

  * NHWC layout + channel widths that are multiples of 8/16 keep convs on
    the MXU without relayouts.
  * The Focus stem's space-to-depth is a reshape/transpose (free for XLA)
    followed by a conv.
  * Decode is fully vectorized over all anchors; NMS runs on device
    (tracklab_tpu.ops.nms) so detection never round-trips to host.

Variants: nano/tiny/s/m/l/x via (depth_mult, width_mult).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["YOLOX", "YOLOX_VARIANTS", "decode_outputs"]

YOLOX_VARIANTS = {
    "nano": dict(depth_mult=0.33, width_mult=0.25, depthwise=True),
    "tiny": dict(depth_mult=0.33, width_mult=0.375, depthwise=False),
    "s": dict(depth_mult=0.33, width_mult=0.5, depthwise=False),
    "m": dict(depth_mult=0.67, width_mult=0.75, depthwise=False),
    "l": dict(depth_mult=1.0, width_mult=1.0, depthwise=False),
    "x": dict(depth_mult=1.33, width_mult=1.25, depthwise=False),
}


def _round_width(c, mult, divisor=8):
    return max(int(round(c * mult / divisor)) * divisor, divisor)


def _round_depth(d, mult):
    return max(int(round(d * mult)), 1)


class ConvBnAct(nn.Module):
    """BaseConv (Megvii yolox/models/network_blocks.py): conv+bn+silu.
    Submodule names mirror the torch attributes for name-mapped weight
    conversion (convert.py:_yolox_torch_key).

    ``quant``: None (bf16/f32 conv), "calib" (record input absmax into
    the qstats collection), or "int8" (s8xs8->s32 MXU conv with the
    calibrated input scale — models/quantize.py). Grouped/depthwise
    convs always take the float path (little FLOP, poor int8 lowering);
    the params tree is identical in every mode."""
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    dtype: Any = jnp.float32
    quant: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = [(self.kernel // 2, self.kernel // 2)] * 2
        if self.quant == "int8" and self.groups == 1 and not train:
            from tracklab_tpu.models.quantize import (
                ascale_variable, quant_conv_int8,
            )
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
                        feature_group_count=self.groups, use_bias=False,
                        dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=jnp.float32, name="bn")(x)
        # cast the block output back to the model dtype: BN+silu run in
        # f32 for accuracy, but materializing f32 activations between
        # layers doubles HBM traffic — the detector is bandwidth-bound
        # (94.8 GB/batch vs 6.7 TFLOP at bs=256: 73% of batch time is
        # HBM at 819 GB/s, 22% MXU). bf16 inter-layer activations halve
        # the dominant term.
        return nn.silu(x).astype(self.dtype)


class DWConv(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Any = jnp.float32
    quant: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBnAct(x.shape[-1], self.kernel, self.stride,
                      groups=x.shape[-1], dtype=self.dtype,
                      quant=self.quant, name="dconv")(x, train)
        return ConvBnAct(self.features, 1, 1, dtype=self.dtype,
                         quant=self.quant, name="pconv")(x, train)


class Bottleneck(nn.Module):
    features: int
    shortcut: bool = True
    depthwise: bool = False
    dtype: Any = jnp.float32
    quant: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv2 = DWConv if self.depthwise else ConvBnAct
        y = ConvBnAct(self.features, 1, dtype=self.dtype,
                      quant=self.quant, name="conv1")(x, train)
        y = conv2(self.features, 3, 1, dtype=self.dtype,
                  quant=self.quant, name="conv2")(y, train)
        if self.shortcut and x.shape[-1] == self.features:
            y = y + x
        return y


class CSPLayer(nn.Module):
    features: int
    n: int = 1
    shortcut: bool = True
    depthwise: bool = False
    dtype: Any = jnp.float32
    quant: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if not self.is_initializing():
            from tracklab_tpu.ops.csp_pallas import (
                csp_pallas_supported, fused_csplayer,
            )
            if csp_pallas_supported(x.shape, self.depthwise, self.quant,
                                    train):
                # the whole layer as ONE Pallas kernel — every
                # intermediate stays in VMEM, BN folded into the conv
                # weights (ops/csp_pallas.py; opt-in via
                # TRACKLAB_TPU_CSP_BACKEND=pallas)
                return fused_csplayer(self.variables, x, n=self.n,
                                      shortcut=self.shortcut,
                                      out_features=self.features,
                                      dtype=self.dtype)
        hidden = self.features // 2
        a = ConvBnAct(hidden, 1, dtype=self.dtype, quant=self.quant,
                      name="conv1")(x, train)
        b = ConvBnAct(hidden, 1, dtype=self.dtype, quant=self.quant,
                      name="conv2")(x, train)
        for k in range(self.n):
            a = Bottleneck(hidden, self.shortcut, self.depthwise,
                           dtype=self.dtype, quant=self.quant,
                           name=f"m__{k}")(a, train)
        y = jnp.concatenate([a, b], axis=-1)
        return ConvBnAct(self.features, 1, dtype=self.dtype,
                         quant=self.quant, name="conv3")(y, train)


class SPPBottleneck(nn.Module):
    """SPP block. ``cascade=True`` computes the 9x9 and 13x13 max pools
    as compositions of 5x5 pools (max_5(max_5) == max_9,
    max_5(max_9) == max_13 — EXACT for max with -inf padding, the SPPF
    identity): 3 small windows instead of 5/9/13 slashes the pad-copy
    HBM traffic the r2 HLO analysis flagged (~30 GB/batch of pad
    copies, BASELINE.md)."""
    features: int
    dtype: Any = jnp.float32
    cascade: bool = True
    quant: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = x.shape[-1] // 2
        x = ConvBnAct(hidden, 1, dtype=self.dtype, quant=self.quant,
                      name="conv1")(x, train)
        if self.cascade:
            p5 = nn.max_pool(x, (5, 5), strides=(1, 1),
                             padding=[(2, 2)] * 2)
            p9 = nn.max_pool(p5, (5, 5), strides=(1, 1),
                             padding=[(2, 2)] * 2)
            p13 = nn.max_pool(p9, (5, 5), strides=(1, 1),
                              padding=[(2, 2)] * 2)
            pools = [x, p5, p9, p13]
        else:
            pools = [x]
            for k in (5, 9, 13):
                pools.append(nn.max_pool(x, (k, k), strides=(1, 1),
                                         padding=[(k // 2, k // 2)] * 2))
        x = jnp.concatenate(pools, axis=-1)
        return ConvBnAct(self.features, 1, dtype=self.dtype,
                         quant=self.quant, name="conv2")(x, train)


class _FocusKernel(nn.Module):
    """Param holder matching nn.Conv's subtree (<name>/kernel) so the
    fused stem keeps the exact ConvBnAct parameter layout."""
    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape)


class Focus(nn.Module):
    """Space-to-depth stem: (B, H, W, C) -> (B, H/2, W/2, 4C) -> conv.

    ``fused=True`` (default) skips materializing the space-to-depth
    image: a 3x3 conv over the s2d image is EXACTLY a 6x6/stride-2 conv
    over the raw image with the kernel entries relaid as
    k6[2a+di, 2b+dj, c, o] = k3[a, b, (di + 2 dj) C + c, o]
    (channel groups follow the concat([TL, BL, TR, BR]) order, so
    di + 2 dj indexes the group) and padding (2, 2) (= the s2d SAME pad
    of 1 mapped back to raw pixels). The parameter stays the checkpoint
    layout (3, 3, 4C, F) under conv/conv/kernel; the relayout is a
    per-forward gather on a tiny tensor. This removes the stem's
    biggest pad-copy (the 4-slice + concat of the full-res input, r2
    HLO analysis, BASELINE.md)."""
    features: int
    dtype: Any = jnp.float32
    fused: bool = True
    quant: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if not self.fused:
            tl = x[:, ::2, ::2]
            bl = x[:, 1::2, ::2]
            tr = x[:, ::2, 1::2]
            br = x[:, 1::2, 1::2]
            x = jnp.concatenate([tl, bl, tr, br], axis=-1)
            return ConvBnAct(self.features, 3, 1, dtype=self.dtype,
                             quant=self.quant, name="conv")(x, train)
        C = x.shape[-1]
        scope = self
        # param tree identical to ConvBnAct(name="conv"):
        # conv/conv/kernel + conv/bn/*
        class _Stem(nn.Module):
            features: int
            dtype: Any

            @nn.compact
            def __call__(self, x, train):
                k3 = _FocusKernel((3, 3, 4 * C, self.features),
                                  name="conv")()
                # (a, b, g, c, F) with g = di + 2*dj -> (a, di, b, dj)
                k6 = k3.reshape(3, 3, 2, 2, C, self.features) \
                    .transpose(0, 3, 1, 2, 4, 5) \
                    .reshape(6, 6, C, self.features)
                if scope.quant == "int8" and not train:
                    from tracklab_tpu.models.quantize import (
                        ascale_variable, quant_conv_int8,
                    )
                    y = quant_conv_int8(x, k6, ascale_variable(self),
                                        (2, 2), [(2, 2), (2, 2)])
                else:
                    if scope.quant == "calib":
                        from tracklab_tpu.models.quantize import (
                            sow_absmax,
                        )
                        sow_absmax(self, x)
                    y = jax.lax.conv_general_dilated(
                        x.astype(scope.dtype), k6.astype(scope.dtype),
                        window_strides=(2, 2), padding=[(2, 2), (2, 2)],
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                y = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.97, epsilon=1e-3,
                                 dtype=jnp.float32, name="bn")(y)
                return nn.silu(y).astype(scope.dtype)

        return _Stem(self.features, self.dtype, name="conv")(x, train)


class CSPDarknet(nn.Module):
    depth_mult: float
    width_mult: float
    depthwise: bool = False
    dtype: Any = jnp.float32
    quant: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = lambda c: _round_width(c, self.width_mult)
        d = lambda n: _round_depth(n, self.depth_mult)
        conv = DWConv if self.depthwise else ConvBnAct

        x = Focus(w(64), dtype=self.dtype, quant=self.quant, name="stem")(x, train)  # /2
        x = conv(w(128), 3, 2, dtype=self.dtype, quant=self.quant,
                 name="dark2__0")(x, train)                       # /4
        x = CSPLayer(w(128), d(3), depthwise=self.depthwise,
                     dtype=self.dtype, quant=self.quant,
                     name="dark2__1")(x, train)
        x = conv(w(256), 3, 2, dtype=self.dtype, quant=self.quant,
                 name="dark3__0")(x, train)                       # /8
        c3 = CSPLayer(w(256), d(9), depthwise=self.depthwise,
                      dtype=self.dtype, quant=self.quant,
                      name="dark3__1")(x, train)
        x = conv(w(512), 3, 2, dtype=self.dtype, quant=self.quant,
                 name="dark4__0")(c3, train)                      # /16
        c4 = CSPLayer(w(512), d(9), depthwise=self.depthwise,
                      dtype=self.dtype, quant=self.quant,
                      name="dark4__1")(x, train)
        x = conv(w(1024), 3, 2, dtype=self.dtype, quant=self.quant,
                 name="dark5__0")(c4, train)                      # /32
        x = SPPBottleneck(w(1024), dtype=self.dtype, quant=self.quant,
                          name="dark5__1")(x, train)
        c5 = CSPLayer(w(1024), d(3), shortcut=False,
                      depthwise=self.depthwise, dtype=self.dtype,
                      quant=self.quant, name="dark5__2")(x, train)
        return c3, c4, c5


def _upsample2(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")


class YOLOPAFPN(nn.Module):
    depth_mult: float
    width_mult: float
    depthwise: bool = False
    dtype: Any = jnp.float32
    quant: str | None = None

    @nn.compact
    def __call__(self, feats, train: bool = False):
        c3, c4, c5 = feats
        w = lambda c: _round_width(c, self.width_mult)
        d = lambda n: _round_depth(n, self.depth_mult)
        conv = DWConv if self.depthwise else ConvBnAct

        # top-down (names mirror Megvii YOLOPAFPN attributes)
        p5 = ConvBnAct(w(512), 1, dtype=self.dtype, quant=self.quant,
                       name="lateral_conv0")(c5, train)
        m4 = jnp.concatenate([_upsample2(p5), c4], axis=-1)
        m4 = CSPLayer(w(512), d(3), shortcut=False,
                      depthwise=self.depthwise, dtype=self.dtype,
                      quant=self.quant, name="C3_p4")(m4, train)
        p4 = ConvBnAct(w(256), 1, dtype=self.dtype, quant=self.quant,
                       name="reduce_conv1")(m4, train)
        m3 = jnp.concatenate([_upsample2(p4), c3], axis=-1)
        out3 = CSPLayer(w(256), d(3), shortcut=False,
                        depthwise=self.depthwise, dtype=self.dtype,
                        quant=self.quant, name="C3_p3")(m3, train)
        # bottom-up
        n3 = conv(w(256), 3, 2, dtype=self.dtype, quant=self.quant,
                  name="bu_conv2")(out3, train)
        m4b = jnp.concatenate([n3, p4], axis=-1)
        out4 = CSPLayer(w(512), d(3), shortcut=False,
                        depthwise=self.depthwise, dtype=self.dtype,
                        quant=self.quant, name="C3_n3")(m4b, train)
        n4 = conv(w(512), 3, 2, dtype=self.dtype, quant=self.quant,
                  name="bu_conv1")(out4, train)
        m5 = jnp.concatenate([n4, p5], axis=-1)
        out5 = CSPLayer(w(1024), d(3), shortcut=False,
                        depthwise=self.depthwise, dtype=self.dtype,
                        quant=self.quant, name="C3_n4")(m5, train)
        return out3, out4, out5


class YOLOXHead(nn.Module):
    num_classes: int
    width_mult: float
    depthwise: bool = False
    dtype: Any = jnp.float32
    quant: str | None = None

    @nn.compact
    def __call__(self, feats, train: bool = False):
        hidden = _round_width(256, self.width_mult)
        conv = DWConv if self.depthwise else ConvBnAct
        outputs = []
        for i, x in enumerate(feats):
            s = ConvBnAct(hidden, 1, dtype=self.dtype,
                          quant=self.quant,
                          name=f"stems__{i}")(x, train)
            c = conv(hidden, 3, 1, dtype=self.dtype,
                     quant=self.quant, name=f"cls_convs__{i}__0")(s, train)
            c = conv(hidden, 3, 1, dtype=self.dtype,
                     quant=self.quant, name=f"cls_convs__{i}__1")(c, train)
            cls_out = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                              name=f"cls_preds__{i}")(c)
            r = conv(hidden, 3, 1, dtype=self.dtype,
                     quant=self.quant, name=f"reg_convs__{i}__0")(s, train)
            r = conv(hidden, 3, 1, dtype=self.dtype,
                     quant=self.quant, name=f"reg_convs__{i}__1")(r, train)
            reg_out = nn.Conv(4, (1, 1), dtype=self.dtype,
                              name=f"reg_preds__{i}")(r)
            obj_out = nn.Conv(1, (1, 1), dtype=self.dtype,
                              name=f"obj_preds__{i}")(r)
            outputs.append(jnp.concatenate(
                [reg_out, obj_out, cls_out], axis=-1))
        return outputs


def decode_outputs(outputs: Sequence[jnp.ndarray],
                   strides=(8, 16, 32), apply_sigmoid: bool = True):
    """Per-level (B, H, W, 5+C) maps -> (B, A, 5+C) decoded predictions:
    xywh in input-image pixels, obj/cls scores (sigmoided)."""
    decoded = []
    for out, stride in zip(outputs, strides):
        b, h, w, ch = out.shape
        gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        out = out.astype(jnp.float32)
        xy = (out[..., 0:2] + jnp.stack([gx, gy], axis=-1)) * stride
        wh = jnp.exp(jnp.clip(out[..., 2:4], -10.0, 8.0)) * stride
        rest = (jax.nn.sigmoid(out[..., 4:]) if apply_sigmoid
                else out[..., 4:])
        dec = jnp.concatenate([xy, wh, rest], axis=-1)
        decoded.append(dec.reshape(b, h * w, ch))
    return jnp.concatenate(decoded, axis=1)


class YOLOX(nn.Module):
    """Full detector. __call__ returns raw per-level maps; ``predict``
    returns decoded (B, A, 5+C)."""
    num_classes: int = 80
    variant: str = "s"
    dtype: Any = jnp.float32
    quant: str | None = None

    def setup(self):
        v = YOLOX_VARIANTS[self.variant]
        self.backbone = CSPDarknet(v["depth_mult"], v["width_mult"],
                                   v["depthwise"], dtype=self.dtype,
                                   quant=self.quant)
        self.neck = YOLOPAFPN(v["depth_mult"], v["width_mult"],
                              v["depthwise"], dtype=self.dtype,
                              quant=self.quant)
        self.head = YOLOXHead(self.num_classes, v["width_mult"],
                              v["depthwise"], dtype=self.dtype,
                              quant=self.quant)

    def __call__(self, images, train: bool = False):
        feats = self.backbone(images, train)
        feats = self.neck(feats, train)
        return self.head(feats, train)

    def predict(self, images):
        return decode_outputs(self(images, train=False))
