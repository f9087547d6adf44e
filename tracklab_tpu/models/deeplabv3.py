"""DeepLabV3-ResNet101 — the reference's pitch-line segmentation net.

The reference's TVCalib front-end is torchvision's
``deeplabv3_resnet101(num_classes=len(SoccerPitch.lines_classes)+1)``
loaded from the SoccerNet-trained checkpoint
(reference plugins/calibration/tvcalib/inference.py:83-94). This module
is a checkpoint-exact Flax/NHWC reimplementation of that architecture so
the real pitch-segmentation weights convert by name mapping like every
other family (models/manifest.py family "deeplabv3_pitch"):

* ResNet-101 backbone with output stride 8
  (``replace_stride_with_dilation=[False, True, True]``): layer3 keeps
  stride 1 with dilation 2, layer4 stride 1 with dilation 4; the first
  block of a dilated layer uses the PREVIOUS dilation for its 3x3 conv
  (torchvision resnet._make_layer semantics).
* DeepLabHead = ASPP(rates 12/24/36 + image pooling) -> 3x3 conv 256 ->
  1x1 conv num_classes, bilinearly upsampled to the input size
  (align_corners=False == jax.image.resize "bilinear").
* FCNHead aux classifier on layer3 (the checkpoint is saved with
  ``aux_loss=True``); inference uses only the main head.

Flax module names mirror the torch state-dict keys ('__' spells '.',
trailing '_<i>' spells '.<i>'), so ``convert._generic_torch_key``
applies unchanged. Explicit torch-style symmetric padding everywhere —
XLA's "SAME" pads asymmetrically under stride 2 and would shift taps.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["DeepLabV3", "PITCH_NUM_CLASSES", "PITCH_LINES_CLASSES",
           "segment_class_lut"]

# the checkpoint's class order: SoccerPitch.lines_classes (reference
# sn_calibration_baseline/soccerpitch.py:15-44); class 0 = background
PITCH_LINES_CLASSES = [
    "Big rect. left bottom", "Big rect. left main", "Big rect. left top",
    "Big rect. right bottom", "Big rect. right main",
    "Big rect. right top", "Circle central", "Circle left",
    "Circle right", "Goal left crossbar", "Goal left post left",
    "Goal left post right", "Goal right crossbar",
    "Goal right post left", "Goal right post right", "Goal unknown",
    "Line unknown", "Middle line", "Side line bottom", "Side line left",
    "Side line right", "Side line top", "Small rect. left bottom",
    "Small rect. left main", "Small rect. left top",
    "Small rect. right bottom", "Small rect. right main",
    "Small rect. right top",
]
PITCH_NUM_CLASSES = len(PITCH_LINES_CLASSES) + 1  # 29

# checkpoint line name -> calibration/pitch.py segment name (goal-frame
# and unknown classes have no 2-D pitch-template segment -> dropped)
_LINE_TO_SEGMENT = {
    "Big rect. left bottom": "big_rect_left_bottom",
    "Big rect. left main": "big_rect_left_main",
    "Big rect. left top": "big_rect_left_top",
    "Big rect. right bottom": "big_rect_right_bottom",
    "Big rect. right main": "big_rect_right_main",
    "Big rect. right top": "big_rect_right_top",
    "Circle central": "center_circle",
    "Circle left": "circle_left",
    "Circle right": "circle_right",
    "Middle line": "middle_line",
    "Side line bottom": "side_line_bottom",
    "Side line left": "goal_line_left",
    "Side line right": "goal_line_right",
    "Side line top": "side_line_top",
    "Small rect. left bottom": "small_rect_left_bottom",
    "Small rect. left main": "small_rect_left_main",
    "Small rect. left top": "small_rect_left_top",
    "Small rect. right bottom": "small_rect_right_bottom",
    "Small rect. right main": "small_rect_right_main",
    "Small rect. right top": "small_rect_right_top",
}


def segment_class_lut(segment_names) -> jnp.ndarray:
    """(29,) int32 LUT mapping the checkpoint's class indices onto
    ``1 + segment_names.index(segment)`` (0 = background/dropped), so a
    DeepLabV3 argmax map re-indexes onto the calibration pipeline's
    segment classes with one device gather: ``lut[cmap]``."""
    lut = [0] * PITCH_NUM_CLASSES
    for c, line in enumerate(PITCH_LINES_CLASSES, start=1):
        seg = _LINE_TO_SEGMENT.get(line)
        if seg is not None and seg in segment_names:
            lut[c] = 1 + list(segment_names).index(seg)
    return jnp.asarray(lut, jnp.int32)


def _conv_bn(x, features, kernel, stride, dilation, conv_name, bn_name,
             train, dtype):
    p = dilation * (kernel // 2)
    x = nn.Conv(features, (kernel, kernel), strides=stride,
                padding=[(p, p)] * 2, kernel_dilation=dilation,
                use_bias=False, dtype=dtype, name=conv_name)(x)
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=jnp.float32,
                        name=bn_name)(x)


class _Bottleneck(nn.Module):
    """torchvision resnet.Bottleneck with dilation on conv2."""
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        idt = x
        y = nn.relu(_conv_bn(x, self.planes, 1, 1, 1, "conv1", "bn1",
                             train, self.dtype))
        y = nn.relu(_conv_bn(y, self.planes, 3, self.stride,
                             self.dilation, "conv2", "bn2", train,
                             self.dtype))
        y = _conv_bn(y, 4 * self.planes, 1, 1, 1, "conv3", "bn3",
                     train, self.dtype)
        if self.downsample:
            idt = _conv_bn(x, 4 * self.planes, 1, self.stride, 1,
                           "downsample_0", "downsample_1", train,
                           self.dtype)
        return nn.relu(y + idt)


class _ResNetDilated(nn.Module):
    """ResNet-101, output stride 8; returns (layer3, layer4) features."""
    layers: Sequence[int] = (3, 4, 23, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=2, padding=[(3, 3)] * 2,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        # (planes, stride, dilate) per layer; torchvision
        # replace_stride_with_dilation=[False, True, True]
        in_ch, dilation = 64, 1
        feats = {}
        for li, (planes, n, stride, dilate) in enumerate(zip(
                (64, 128, 256, 512), self.layers, (1, 2, 2, 2),
                (False, False, True, True))):
            prev_dilation = dilation
            if dilate:
                dilation *= stride
                stride = 1
            for b in range(n):
                s = stride if b == 0 else 1
                d = prev_dilation if b == 0 else dilation
                down = b == 0 and (s != 1 or in_ch != planes * 4)
                x = _Bottleneck(planes, s, d, down, dtype=self.dtype,
                                name=f"layer{li + 1}_{b}")(x, train)
                in_ch = planes * 4
            if li == 2:
                feats["aux"] = x
        feats["out"] = x
        return feats


class _DeepLabHead(nn.Module):
    """torchvision DeepLabHead: ASPP + 3x3 conv + classifier conv."""
    num_classes: int
    rates: Sequence[int] = (12, 24, 36)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # ASPP (torch keys classifier.0.*)
        branches = [nn.relu(_conv_bn(
            x, 256, 1, 1, 1, "0__convs_0_0", "0__convs_0_1", train,
            self.dtype))]
        for i, r in enumerate(self.rates):
            branches.append(nn.relu(_conv_bn(
                x, 256, 3, 1, r, f"0__convs_{i + 1}_0",
                f"0__convs_{i + 1}_1", train, self.dtype)))
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = nn.relu(_conv_bn(g, 256, 1, 1, 1, "0__convs_4_1",
                             "0__convs_4_2", train, self.dtype))
        branches.append(jnp.broadcast_to(g, x.shape[:3] + (256,)))
        y = jnp.concatenate(branches, axis=-1)
        y = nn.relu(_conv_bn(y, 256, 1, 1, 1, "0__project_0",
                             "0__project_1", train, self.dtype))
        # head convs (torch keys classifier.1/2/4)
        y = nn.relu(_conv_bn(y, 256, 3, 1, 1, "1", "2", train,
                             self.dtype))
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       name="4")(y)


class _FCNHead(nn.Module):
    """torchvision FCNHead (the aux classifier on layer3)."""
    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.relu(_conv_bn(x, 256, 3, 1, 1, "0", "1", train,
                             self.dtype))
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       name="4")(y)


class DeepLabV3(nn.Module):
    """images (B,H,W,3), ImageNet-normalized -> {"out", "aux"} logits
    (B,H,W,C), bilinearly upsampled to the input size (torchvision
    DeepLabV3.forward)."""
    num_classes: int = PITCH_NUM_CLASSES
    layers: Sequence[int] = (3, 4, 23, 3)   # resnet101
    aux: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, _ = x.shape
        feats = _ResNetDilated(self.layers, dtype=self.dtype,
                               name="backbone")(x.astype(self.dtype),
                                                train)

        def up(y):
            return jax.image.resize(
                y.astype(jnp.float32), (B, H, W, y.shape[-1]),
                "bilinear")

        out = {"out": up(_DeepLabHead(
            self.num_classes, dtype=self.dtype,
            name="classifier")(feats["out"], train))}
        if self.aux:
            out["aux"] = up(_FCNHead(
                self.num_classes, dtype=self.dtype,
                name="aux_classifier")(feats["aux"], train))
        return out

    def predict(self, variables, images):
        """Per-pixel argmax class map (B,H,W) int32 — the reference's
        ``self.model(img_batch)["out"].argmax(1)`` (inference.py:93-94)."""
        return jnp.argmax(self.apply(variables, images, train=False)
                          ["out"], axis=-1).astype(jnp.int32)
