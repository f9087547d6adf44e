"""ReID backbone zoo: ResNet + MobileNetV2 in Flax (NHWC).

Extends the OSNet-only round-1 coverage toward the reference's
StrongSORT backbone zoo (plugins/track/strong_sort/deep/models/:
resnet.py, mobilenetv2.py — 21 files, of which these are the
checkpoint-zoo workhorses). Semantics follow torchreid exactly:
torchvision-v1.5 ResNet (stride on conv2) with torchreid's
``last_stride`` and optional fc head (Linear+BN1d+ReLU), and the
torchreid MobileNetV2 (relu6 conv blocks, inverted residuals, conv9 to
the 1280-wide feature). Eval-mode forward returns the post-pool
(+fc) feature vector — the tensor StrongSORT consumes as the
appearance embedding.

Module names mirror the torch state-dict keys (``layer1_0`` ->
``layer1.0``), so official torchreid checkpoints convert by pure name
mapping (models/convert.py:convert_reid_backbone_torch); activation
parity vs the reference's vendored sources is tested in
tests/test_weight_parity.py.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["ReidResNet", "ReidMobileNetV2", "ReidShuffleNetV2",
           "RESNET_VARIANTS", "MOBILENETV2_VARIANTS",
           "SHUFFLENETV2_VARIANTS"]

RESNET_VARIANTS = {
    # (block, layers, last_stride, fc_dims[, groups, width]) —
    # resnet.py:398-520 (resnext: grouped conv2 with scaled width)
    "resnet18": ("basic", (2, 2, 2, 2), 2, None),
    "resnet34": ("basic", (3, 4, 6, 3), 2, None),
    "resnet50": ("bottleneck", (3, 4, 6, 3), 2, None),
    "resnet101": ("bottleneck", (3, 4, 23, 3), 2, None),
    "resnet152": ("bottleneck", (3, 8, 36, 3), 2, None),
    "resnet50_fc512": ("bottleneck", (3, 4, 6, 3), 1, (512,)),
    "resnext50_32x4d": ("bottleneck", (3, 4, 6, 3), 2, None, 32, 4),
    "resnext101_32x8d": ("bottleneck", (3, 4, 23, 3), 2, None, 32, 8),
}

MOBILENETV2_VARIANTS = {
    "mobilenetv2_x1_0": 1.0,
    "mobilenetv2_x1_4": 1.4,
}


def _conv_bn(x, features, kernel, stride, conv_name, bn_name, train,
             dtype, groups=1):
    """Conv (no bias) + BN registered DIRECTLY on the calling module
    (plain helper, not a submodule, so the flax path mirrors the torch
    key: layer1_0/conv1 -> layer1.0.conv1)."""
    p = kernel // 2
    x = nn.Conv(features, (kernel, kernel), strides=stride,
                padding=[(p, p)] * 2, feature_group_count=groups,
                use_bias=False, dtype=dtype, name=conv_name)(x)
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=jnp.float32,
                        name=bn_name)(x)


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        idt = x
        y = nn.relu(_conv_bn(x, self.features, 3, self.stride,
                             "conv1", "bn1", train, self.dtype))
        y = _conv_bn(y, self.features, 3, 1, "conv2", "bn2", train,
                     self.dtype)
        if self.downsample:
            idt = _conv_bn(x, self.features, 1, self.stride,
                           "downsample_0", "downsample_1", train,
                           self.dtype)
        return nn.relu(y + idt)


class Bottleneck(nn.Module):
    features: int  # bottleneck planes; block output is 4x
    stride: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        idt = x
        width = int(self.features * self.base_width / 64.0) * self.groups
        y = nn.relu(_conv_bn(x, width, 1, 1, "conv1", "bn1",
                             train, self.dtype))
        y = nn.relu(_conv_bn(y, width, 3, self.stride,
                             "conv2", "bn2", train, self.dtype,
                             groups=self.groups))
        y = _conv_bn(y, 4 * self.features, 1, 1, "conv3", "bn3", train,
                     self.dtype)
        if self.downsample:
            idt = _conv_bn(x, 4 * self.features, 1, self.stride,
                           "downsample_0", "downsample_1", train,
                           self.dtype)
        return nn.relu(y + idt)


class ReidResNet(nn.Module):
    """torchreid ResNet (resnet.py:157-392). Returns the eval-mode
    feature vector (post-avgpool, post-fc when fc_dims is set)."""
    variant: str = "resnet50"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        spec = RESNET_VARIANTS[self.variant]
        kind, layers, last_stride, fc_dims = spec[:4]
        groups, base_width = (spec[4], spec[5]) if len(spec) > 4 \
            else (1, 64)
        block = BasicBlock if kind == "basic" else Bottleneck
        exp = 1 if kind == "basic" else 4
        x = nn.Conv(64, (7, 7), strides=2, padding=[(3, 3)] * 2,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        widths = (64, 128, 256, 512)
        strides = (1, 2, 2, last_stride)
        in_ch = 64
        for li, (w, n, s) in enumerate(zip(widths, layers, strides)):
            for b in range(n):
                stride = s if b == 0 else 1
                down = b == 0 and (stride != 1 or in_ch != w * exp)
                if kind == "basic":
                    x = block(w, stride, down, dtype=self.dtype,
                              name=f"layer{li + 1}_{b}")(x, train)
                else:
                    x = block(w, stride, down, groups, base_width,
                              dtype=self.dtype,
                              name=f"layer{li + 1}_{b}")(x, train)
                in_ch = w * exp
        v = jnp.mean(x, axis=(1, 2))
        if fc_dims:
            for i, dim in enumerate(fc_dims):
                v = nn.Dense(dim, dtype=self.dtype,
                             name=f"fc_{3 * i}")(v)
                v = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5,
                                 dtype=jnp.float32,
                                 name=f"fc_{3 * i + 1}")(v)
                v = nn.relu(v)
        return v


class _MBConvBlock(nn.Module):
    """torchreid mobilenetv2.py ConvBlock: conv+bn+relu6."""
    features: int
    kernel: int
    stride: int = 1
    pad: int = 0
    groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=self.stride,
                    padding=[(self.pad, self.pad)] * 2,
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn")(x)
        return jnp.clip(x, 0.0, 6.0)  # relu6 (pre-activation is x >= ?)


class _MBBottleneck(nn.Module):
    """Inverted residual (mobilenetv2.py:44-66)."""
    features: int
    expansion: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        mid = in_ch * self.expansion
        m = _MBConvBlock(mid, 1, dtype=self.dtype,
                         name="conv1")(x, train)
        m = _MBConvBlock(mid, 3, self.stride, 1, groups=mid,
                         dtype=self.dtype, name="dwconv2")(m, train)
        m = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3_0")(m)
        m = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         name="conv3_1")(m)
        if self.stride == 1 and in_ch == self.features:
            return x + m
        return m


class ReidMobileNetV2(nn.Module):
    """torchreid MobileNetV2 (mobilenetv2.py:69-238). Returns the
    eval-mode feature vector."""
    variant: str = "mobilenetv2_x1_0"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        wm = MOBILENETV2_VARIANTS[self.variant]
        feat_dim = int(1280 * wm) if wm > 1 else 1280
        x = _MBConvBlock(int(32 * wm), 3, 2, 1, dtype=self.dtype,
                         name="conv1")(x, train)
        # (expansion t, channels c, blocks n, first stride s) per stage
        stages = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2),
                  (6, 64, 4, 2), (6, 96, 3, 1), (6, 160, 3, 2),
                  (6, 320, 1, 1)]
        for si, (t, c, n, s) in enumerate(stages):
            c = int(c * wm)
            for b in range(n):
                x = _MBBottleneck(c, t, s if b == 0 else 1,
                                  dtype=self.dtype,
                                  name=f"conv{si + 2}_{b}")(x, train)
        x = _MBConvBlock(feat_dim, 1, dtype=self.dtype,
                         name="conv9")(x, train)
        return jnp.mean(x, axis=(1, 2))


# ---------------------------------------------------------------------------
# ShuffleNetV2 (torchreid shufflenetv2.py, torchvision layout)
# ---------------------------------------------------------------------------

SHUFFLENETV2_VARIANTS = {
    "shufflenet_v2_x0_5": ((4, 8, 4), (24, 48, 96, 192, 1024)),
    "shufflenet_v2_x1_0": ((4, 8, 4), (24, 116, 232, 464, 1024)),
    "shufflenet_v2_x1_5": ((4, 8, 4), (24, 176, 352, 704, 1024)),
    "shufflenet_v2_x2_0": ((4, 8, 4), (24, 244, 488, 976, 2048)),
}


def _channel_shuffle(x, groups=2):
    """NHWC channel shuffle (shufflenetv2.py:24-36)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(b, h, w, c)


class _ShuffleUnit(nn.Module):
    """InvertedResidual (shufflenetv2.py:39-113); Sequential-index
    names so torch keys map directly (branch2_0 -> branch2.0)."""
    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        half = self.features // 2

        def bn(y, name):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5,
                                dtype=jnp.float32, name=name)(y)

        def conv(y, feats, k, stride, groups, name):
            return nn.Conv(feats, (k, k), strides=stride,
                           padding=[(k // 2, k // 2)] * 2,
                           feature_group_count=groups, use_bias=False,
                           dtype=self.dtype, name=name)(y)

        if self.stride > 1:
            in_ch = x.shape[-1]
            b1 = conv(x, in_ch, 3, self.stride, in_ch, "branch1_0")
            b1 = bn(b1, "branch1_1")
            b1 = conv(b1, half, 1, 1, 1, "branch1_2")
            b1 = nn.relu(bn(b1, "branch1_3"))
            b2_in = x
        else:
            b1, b2_in = x[..., :half], x[..., half:]
        y = conv(b2_in, half, 1, 1, 1, "branch2_0")
        y = nn.relu(bn(y, "branch2_1"))
        y = conv(y, half, 3, self.stride, half, "branch2_3")
        y = bn(y, "branch2_4")
        y = conv(y, half, 1, 1, 1, "branch2_5")
        y = nn.relu(bn(y, "branch2_6"))
        out = jnp.concatenate([b1, y], axis=-1)
        return _channel_shuffle(out, 2)


class ReidShuffleNetV2(nn.Module):
    """torchreid ShuffleNetV2 (shufflenetv2.py:118-205); eval-mode
    forward returns the post-pool feature vector."""
    variant: str = "shufflenet_v2_x1_0"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        repeats, chans = SHUFFLENETV2_VARIANTS[self.variant]
        x = nn.Conv(chans[0], (3, 3), strides=2, padding=[(1, 1)] * 2,
                    use_bias=False, dtype=self.dtype, name="conv1_0")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         name="conv1_1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        for si, (n, c) in enumerate(zip(repeats, chans[1:4])):
            for j in range(n):
                x = _ShuffleUnit(c, 2 if j == 0 else 1,
                                 dtype=self.dtype,
                                 name=f"stage{si + 2}_{j}")(x, train)
        x = nn.Conv(chans[4], (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv5_0")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         name="conv5_1")(x)
        x = nn.relu(x)
        return jnp.mean(x, axis=(1, 2))


# ---------------------------------------------------------------------------
# ResNet50-IBN-a (torchreid resnet_ibn_a.py): half-instance/half-batch
# norm after conv1 in layers 1-3
# ---------------------------------------------------------------------------

class _IBN(nn.Module):
    """IBN layer (resnet_ibn_a.py:63-78): channel split, first half
    InstanceNorm (affine), second half BatchNorm (names: IN, BN)."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        half = self.features // 2
        a = nn.GroupNorm(num_groups=half, epsilon=1e-5,
                         dtype=jnp.float32, name="IN")(x[..., :half])
        b = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         name="BN")(x[..., half:])
        return jnp.concatenate([a, b], axis=-1)


class BottleneckIBN(nn.Module):
    """resnet_ibn_a.py Bottleneck: bn1 is IBN when enabled; stride on
    conv2 (v1 layout here matches the vendored source)."""
    features: int
    ibn: bool = True
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        idt = x
        y = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        if self.ibn:
            y = _IBN(self.features, dtype=self.dtype,
                     name="bn1")(y, train)
        else:
            y = nn.BatchNorm(use_running_average=not train,
                             momentum=0.9, epsilon=1e-5,
                             dtype=jnp.float32, name="bn1")(y)
        y = nn.relu(y)
        y = nn.relu(_conv_bn(y, self.features, 3, self.stride,
                             "conv2", "bn2", train, self.dtype))
        y = _conv_bn(y, 4 * self.features, 1, 1, "conv3", "bn3", train,
                     self.dtype)
        if self.downsample:
            idt = _conv_bn(x, 4 * self.features, 1, self.stride,
                           "downsample_0", "downsample_1", train,
                           self.dtype)
        return nn.relu(y + idt)


class ReidResNetIBN(nn.Module):
    """resnet50_ibn_a (resnet_ibn_a.py:131-260): IBN in layers 1-3,
    plain layer4; eval-mode forward returns the pooled feature."""
    layers: tuple = (3, 4, 6, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=2, padding=[(3, 3)] * 2,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        in_ch = 64
        for li, (w, n) in enumerate(zip((64, 128, 256, 512),
                                        self.layers)):
            ibn = w != 512
            stride = 1 if li == 0 else 2
            for b in range(n):
                s = stride if b == 0 else 1
                down = b == 0 and (s != 1 or in_ch != 4 * w)
                x = BottleneckIBN(w, ibn, s, down, dtype=self.dtype,
                                  name=f"layer{li + 1}_{b}")(x, train)
                in_ch = 4 * w
        return jnp.mean(x, axis=(1, 2))


# ---------------------------------------------------------------------------
# DenseNet121 (torchreid densenet.py, torchvision layout)
# ---------------------------------------------------------------------------

class _DenseLayer(nn.Module):
    """norm1-relu-conv1(1x1)-norm2-relu-conv2(3x3); output concatenates
    onto the input (densenet.py:29-66)."""
    growth_rate: int
    bn_size: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         name="norm1")(x)
        y = nn.relu(y)
        y = nn.Conv(self.bn_size * self.growth_rate, (1, 1),
                    use_bias=False, dtype=self.dtype, name="conv1")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         name="norm2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.growth_rate, (3, 3), padding=[(1, 1)] * 2,
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        return jnp.concatenate([x, y], axis=-1)


class _DenseBlock(nn.Module):
    num_layers: int
    growth_rate: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_layers):
            x = _DenseLayer(self.growth_rate, dtype=self.dtype,
                            name=f"denselayer{i + 1}")(x, train)
        return x


class _DenseTransition(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         name="norm")(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class _DenseFeatures(nn.Module):
    growth_rate: int
    block_config: tuple
    num_init_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.num_init_features, (7, 7), strides=2,
                    padding=[(3, 3)] * 2, use_bias=False,
                    dtype=self.dtype, name="conv0")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         name="norm0")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        n = self.num_init_features
        for i, layers in enumerate(self.block_config):
            x = _DenseBlock(layers, self.growth_rate, dtype=self.dtype,
                            name=f"denseblock{i + 1}")(x, train)
            n += layers * self.growth_rate
            if i != len(self.block_config) - 1:
                n //= 2
                x = _DenseTransition(n, dtype=self.dtype,
                                     name=f"transition{i + 1}")(x, train)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=jnp.float32,
                            name="norm5")(x)


class ReidDenseNet(nn.Module):
    """torchreid DenseNet (densenet.py:102-262); densenet121 by
    default. Eval-mode forward returns the pooled feature."""
    growth_rate: int = 32
    block_config: tuple = (6, 12, 24, 16)
    num_init_features: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = _DenseFeatures(self.growth_rate, self.block_config,
                           self.num_init_features, dtype=self.dtype,
                           name="features")(x, train)
        return jnp.mean(nn.relu(f), axis=(1, 2))


# ---------------------------------------------------------------------------
# SqueezeNet (torchreid squeezenet.py; torchvision layout with biased
# convs, VALID first conv and ceil-mode max pools)
# ---------------------------------------------------------------------------

def _max_pool_ceil3(x):
    """MaxPool2d(3, 2, ceil_mode=True): pad right/bottom with -inf so
    partial windows count (window start must lie within the input)."""
    b, h, w, c = x.shape
    oh = -(-(h - 3) // 2) + 1
    ow = -(-(w - 3) // 2) + 1
    ph = max((oh - 1) * 2 + 3 - h, 0)
    pw = max((ow - 1) * 2 + 3 - w, 0)
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                    constant_values=-jnp.inf)
    return nn.max_pool(x, (3, 3), strides=(2, 2))


class _Fire(nn.Module):
    """squeeze 1x1 -> relu -> [expand1x1 | expand3x3] concat
    (squeezenet.py:19-45; biased convs)."""
    s: int
    e1: int
    e3: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(self.s, (1, 1), use_bias=True,
                            dtype=self.dtype, name="squeeze")(x))
        a = nn.relu(nn.Conv(self.e1, (1, 1), use_bias=True,
                            dtype=self.dtype, name="expand1x1")(x))
        b = nn.relu(nn.Conv(self.e3, (3, 3), padding=[(1, 1)] * 2,
                            use_bias=True, dtype=self.dtype,
                            name="expand3x3")(x))
        return jnp.concatenate([a, b], axis=-1)


class ReidSqueezeNet(nn.Module):
    """torchreid SqueezeNet 1.0 (squeezenet.py:47-185); eval-mode
    forward returns the pooled 512-dim feature."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # features.0: 7x7/2 conv, NO padding (torch default)
        x = nn.Conv(96, (7, 7), strides=2, padding="VALID",
                    use_bias=True, dtype=self.dtype,
                    name="features_0")(x)
        x = _max_pool_ceil3(nn.relu(x))
        x = _Fire(16, 64, 64, dtype=self.dtype, name="features_3")(x)
        x = _Fire(16, 64, 64, dtype=self.dtype, name="features_4")(x)
        x = _Fire(32, 128, 128, dtype=self.dtype, name="features_5")(x)
        x = _max_pool_ceil3(x)
        x = _Fire(32, 128, 128, dtype=self.dtype, name="features_7")(x)
        x = _Fire(48, 192, 192, dtype=self.dtype, name="features_8")(x)
        x = _Fire(48, 192, 192, dtype=self.dtype, name="features_9")(x)
        x = _Fire(64, 256, 256, dtype=self.dtype,
                  name="features_10")(x)
        x = _max_pool_ceil3(x)
        x = _Fire(64, 256, 256, dtype=self.dtype,
                  name="features_12")(x)
        return jnp.mean(x, axis=(1, 2))


# ---------------------------------------------------------------------------
# MLFN (torchreid mlfn.py: multi-level factorisation net)
# ---------------------------------------------------------------------------

class _MLFNBlock(nn.Module):
    """Factor modules + factor-selection gate (mlfn.py:16-95): the
    (g,)-dim sigmoid selector scales the grouped conv's channels
    (channel c takes gate c // (mid/groups)); returns (features,
    selector) — selectors concatenate into the network's s_hat path."""
    features: int
    stride: int = 1
    fsm: tuple = (128, 64)
    groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.features // 2

        def bn(y, name):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5,
                                dtype=jnp.float32, name=name)(y)

        # factor selection: gap -> conv+bn+relu x2 -> conv+bn -> sigmoid
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.relu(bn(nn.Conv(self.fsm[0], (1, 1), use_bias=True,
                               dtype=self.dtype, name="fsm_1")(s),
                       "fsm_2"))
        s = nn.relu(bn(nn.Conv(self.fsm[1], (1, 1), use_bias=True,
                               dtype=self.dtype, name="fsm_4")(s),
                       "fsm_5"))
        s = jax.nn.sigmoid(bn(nn.Conv(self.groups, (1, 1),
                                      use_bias=True, dtype=self.dtype,
                                      name="fsm_7")(s), "fsm_8"))

        y = nn.relu(bn(nn.Conv(mid, (1, 1), use_bias=False,
                               dtype=self.dtype, name="fm_conv1")(x),
                       "fm_bn1"))
        y = nn.relu(bn(nn.Conv(mid, (3, 3), strides=self.stride,
                               padding=[(1, 1)] * 2,
                               feature_group_count=self.groups,
                               use_bias=False, dtype=self.dtype,
                               name="fm_conv2")(y), "fm_bn2"))
        n = mid // self.groups
        y = y * jnp.repeat(s, n, axis=-1)
        y = nn.relu(bn(nn.Conv(self.features, (1, 1), use_bias=False,
                               dtype=self.dtype, name="fm_conv3")(y),
                       "fm_bn3"))
        res = x
        if x.shape[-1] != self.features or self.stride > 1:
            res = bn(nn.Conv(self.features, (1, 1),
                             strides=self.stride, use_bias=False,
                             dtype=self.dtype, name="downsample_0")(x),
                     "downsample_1")
        return nn.relu(res + y), s


class ReidMLFN(nn.Module):
    """torchreid MLFN (mlfn.py:98-241): 16 factorisation blocks; the
    eval feature is the mean of the projected conv feature and the
    projected concatenated selectors."""
    groups: int = 32
    channels: tuple = (64, 256, 512, 1024, 2048)
    embed_dim: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch = self.channels
        x = nn.Conv(ch[0], (7, 7), strides=2, padding=[(3, 3)] * 2,
                    use_bias=True, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        spec = ([(ch[1], 1, (128, 64))] * 3
                + [(ch[2], 2, (256, 128))]
                + [(ch[2], 1, (256, 128))] * 3
                + [(ch[3], 2, (512, 128))]
                + [(ch[3], 1, (512, 128))] * 5
                + [(ch[4], 2, (512, 128))]
                + [(ch[4], 1, (512, 128))] * 2)
        sels = []
        for i, (c, stride, fsm) in enumerate(spec):
            x, s = _MLFNBlock(c, stride, fsm, self.groups,
                              dtype=self.dtype,
                              name=f"feature_{i}")(x, train)
            sels.append(s)
        s_hat = jnp.concatenate(sels, axis=-1)      # (B, 1, 1, 16g)
        gap = jnp.mean(x, axis=(1, 2), keepdims=True)

        def proj(v, pfx, feats):
            v = nn.Conv(feats, (1, 1), use_bias=False,
                        dtype=self.dtype, name=f"{pfx}_0")(v)
            v = nn.BatchNorm(use_running_average=not train,
                             momentum=0.9, epsilon=1e-5,
                             dtype=jnp.float32, name=f"{pfx}_1")(v)
            return nn.relu(v)

        vx = proj(gap, "fc_x", self.embed_dim)
        vs = proj(s_hat, "fc_s", self.embed_dim)
        return ((vx + vs) * 0.5).reshape(x.shape[0], -1)


# ---------------------------------------------------------------------------
# SE-ResNet50 (torchreid senet.py; Caffe-style stride-on-conv1
# bottlenecks, ceil-mode stem pool)
# ---------------------------------------------------------------------------

class _SEModule(nn.Module):
    """gap -> fc1 -> relu -> fc2 -> sigmoid scale (senet.py:91-112;
    biased 1x1 convs)."""
    channels: int
    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.relu(nn.Conv(self.channels // self.reduction, (1, 1),
                            use_bias=True, dtype=self.dtype,
                            name="fc1")(s))
        s = jax.nn.sigmoid(nn.Conv(self.channels, (1, 1), use_bias=True,
                                   dtype=self.dtype, name="fc2")(s))
        return x * s


class _SEResNetBottleneck(nn.Module):
    """senet.py:175-205: stride on conv1 (Caffe layout), SE module on
    the 4x output, residual add then relu."""
    planes: int
    stride: int = 1
    reduction: int = 16
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = nn.relu(_conv_bn(x, self.planes, 1, self.stride,
                               "conv1", "bn1", train, self.dtype))
        out = nn.relu(_conv_bn(out, self.planes, 3, 1, "conv2", "bn2",
                               train, self.dtype))
        out = _conv_bn(out, 4 * self.planes, 1, 1, "conv3", "bn3",
                       train, self.dtype)
        res = x
        if self.downsample:
            res = _conv_bn(x, 4 * self.planes, 1, self.stride,
                           "downsample_0", "downsample_1", train,
                           self.dtype)
        out = _SEModule(4 * self.planes, self.reduction,
                        dtype=self.dtype, name="se_module")(out)
        return nn.relu(out + res)


class ReidSEResNet(nn.Module):
    """torchreid se_resnet50 (senet.py:246-575, input_3x3=False,
    last_stride=2); eval-mode forward returns the pooled feature."""
    layers: tuple = (3, 4, 6, 3)
    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _conv_bn(x, 64, 7, 2, "layer0__conv1", "layer0__bn1",
                     train, self.dtype)
        x = _max_pool_ceil3(nn.relu(x))
        in_ch = 64
        for li, (w, n) in enumerate(zip((64, 128, 256, 512),
                                        self.layers)):
            stride = 1 if li == 0 else 2
            for b in range(n):
                s = stride if b == 0 else 1
                down = b == 0 and (s != 1 or in_ch != 4 * w)
                x = _SEResNetBottleneck(
                    w, s, self.reduction, down, dtype=self.dtype,
                    name=f"layer{li + 1}_{b}")(x, train)
                in_ch = 4 * w
        return jnp.mean(x, axis=(1, 2))


# ---------------------------------------------------------------------------
# ResNet50-mid (torchreid resnetmid.py: mid-level feature fusion over
# the three layer4 blocks)
# ---------------------------------------------------------------------------

class ReidResNetMid(nn.Module):
    """resnet50mid (resnetmid.py:108-292): standard ResNet50 trunk;
    the eval feature concatenates fc_fusion(gap(layer4[0]) ++
    gap(layer4[1])) with gap(layer4[2]) -> 1024 + 2048 dims."""
    layers: tuple = (3, 4, 6, 3)
    fc_dim: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=2, padding=[(3, 3)] * 2,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        in_ch = 64
        mids = []
        for li, (w, n) in enumerate(zip((64, 128, 256, 512),
                                        self.layers)):
            stride = 1 if li == 0 else 2
            for b in range(n):
                s = stride if b == 0 else 1
                down = b == 0 and (s != 1 or in_ch != 4 * w)
                x = Bottleneck(w, s, down, dtype=self.dtype,
                               name=f"layer{li + 1}_{b}")(x, train)
                in_ch = 4 * w
                if li == 3:
                    mids.append(x)
        v4a, v4b, v4c = [jnp.mean(m, axis=(1, 2)) for m in mids]
        v = jnp.concatenate([v4a, v4b], axis=-1)
        v = nn.Dense(self.fc_dim, dtype=self.dtype,
                     name="fc_fusion_0")(v)
        v = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         name="fc_fusion_1")(v)
        v = nn.relu(v)
        return jnp.concatenate([v, v4c], axis=-1)


# ---------------------------------------------------------------------------
# Xception (torchreid xception.py; separable-conv blocks with the
# torch Sequential indices — interleaved parameterless relus included)
# ---------------------------------------------------------------------------

class _XSepConv(nn.Module):
    """SeparableConv2d (xception.py:26-58): depthwise 'conv1' +
    'pointwise', both unbiased."""
    features: int
    kernel: int = 3
    stride: int = 1
    pad: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = nn.Conv(c, (self.kernel, self.kernel), strides=self.stride,
                    padding=[(self.pad, self.pad)] * 2,
                    feature_group_count=c, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        return nn.Conv(self.features, (1, 1), use_bias=False,
                       dtype=self.dtype, name="pointwise")(x)


class _XBlock(nn.Module):
    """xception.py Block: relu/sepconv/bn chain + optional strided
    maxpool, with a 1x1-projected skip when shape changes. ``plan``
    lists (sequential_index_of_sepconv, out_features) pairs so the
    flax names match the torch Sequential indices exactly."""
    out: int
    plan: tuple              # ((idx, feats), ...) sepconv positions
    first_relu: bool = True
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x
        first = True
        for idx, feats in self.plan:
            if not (first and not self.first_relu):
                x = nn.relu(x)
            first = False
            x = _XSepConv(feats, dtype=self.dtype,
                          name=f"rep_{idx}")(x)
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=0.9, epsilon=1e-5,
                             dtype=jnp.float32,
                             name=f"rep_{idx + 1}")(x)
        if self.stride != 1:
            x = nn.max_pool(x, (3, 3), strides=(self.stride,) * 2,
                            padding=[(1, 1)] * 2)
        if inp.shape[-1] != self.out or self.stride != 1:
            skip = nn.Conv(self.out, (1, 1), strides=self.stride,
                           use_bias=False, dtype=self.dtype,
                           name="skip")(inp)
            skip = nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5,
                                dtype=jnp.float32, name="skipbn")(skip)
        else:
            skip = inp
        return x + skip


class ReidXception(nn.Module):
    """torchreid Xception (xception.py:145-330); eval-mode forward
    returns the pooled 2048-dim feature. Stem convs are unpadded
    (torch padding=0)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(y, name):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5,
                                dtype=jnp.float32, name=name)(y)

        x = nn.relu(bn(nn.Conv(32, (3, 3), strides=2, padding="VALID",
                               use_bias=False, dtype=self.dtype,
                               name="conv1")(x), "bn1"))
        x = nn.relu(bn(nn.Conv(64, (3, 3), padding="VALID",
                               use_bias=False, dtype=self.dtype,
                               name="conv2")(x), "bn2"))
        # entry flow
        x = _XBlock(128, ((0, 128), (3, 128)), first_relu=False,
                    stride=2, dtype=self.dtype, name="block1")(x, train)
        x = _XBlock(256, ((1, 256), (4, 256)), stride=2,
                    dtype=self.dtype, name="block2")(x, train)
        x = _XBlock(728, ((1, 728), (4, 728)), stride=2,
                    dtype=self.dtype, name="block3")(x, train)
        # middle flow
        for i in range(4, 12):
            x = _XBlock(728, ((1, 728), (4, 728), (7, 728)),
                        dtype=self.dtype, name=f"block{i}")(x, train)
        # exit flow
        x = _XBlock(1024, ((1, 728), (4, 1024)), stride=2,
                    dtype=self.dtype, name="block12")(x, train)
        x = nn.relu(bn(_XSepConv(1536, dtype=self.dtype,
                                 name="conv3")(x), "bn3"))
        x = nn.relu(bn(_XSepConv(2048, dtype=self.dtype,
                                 name="conv4")(x), "bn4"))
        return jnp.mean(x, axis=(1, 2))


# ---------------------------------------------------------------------------
# HACNN (torchreid hacnn.py: harmonious attention — soft spatial x
# channel attention on the global branch, hard-attention STN crops on
# the local branch). Input is fixed at 160x64 as upstream.
# ---------------------------------------------------------------------------

class _HConv(nn.Module):
    """ConvBlock (hacnn.py:9-29): biased conv + bn + relu."""
    features: int
    kernel: int = 1
    stride: int = 1
    pad: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=self.stride,
                    padding=[(self.pad, self.pad)] * 2, use_bias=True,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn")(x)
        return nn.relu(x)


class _HInceptionA(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        m = self.features // 4
        outs = []
        for s in (1, 2, 3):
            y = _HConv(m, 1, dtype=self.dtype,
                       name=f"stream{s}_0")(x, train)
            y = _HConv(m, 3, pad=1, dtype=self.dtype,
                       name=f"stream{s}_1")(y, train)
            outs.append(y)
        y = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=[(1, 1)] * 2)
        outs.append(_HConv(m, 1, dtype=self.dtype,
                           name="stream4_1")(y, train))
        return jnp.concatenate(outs, axis=-1)


class _HInceptionB(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        m = self.features // 4
        y1 = _HConv(m, 1, dtype=self.dtype, name="stream1_0")(x, train)
        y1 = _HConv(m, 3, 2, 1, dtype=self.dtype,
                    name="stream1_1")(y1, train)
        y2 = _HConv(m, 1, dtype=self.dtype, name="stream2_0")(x, train)
        y2 = _HConv(m, 3, 1, 1, dtype=self.dtype,
                    name="stream2_1")(y2, train)
        y2 = _HConv(m, 3, 2, 1, dtype=self.dtype,
                    name="stream2_2")(y2, train)
        y3 = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        y3 = _HConv(2 * m, 1, dtype=self.dtype,
                    name="stream3_1")(y3, train)
        return jnp.concatenate([y1, y2, y3], axis=-1)


def _resize_bilinear_ac(x, oh, ow):
    """F.upsample(mode='bilinear', align_corners=True)."""
    b, h, w, c = x.shape
    ys = jnp.linspace(0.0, h - 1.0, oh)
    xs = jnp.linspace(0.0, w - 1.0, ow)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]

    def g(yi, xi):
        return x[:, yi][:, :, xi]

    return (g(y0, x0) * (1 - wy) * (1 - wx) + g(y0, x1) * (1 - wy) * wx
            + g(y1, x0) * wy * (1 - wx) + g(y1, x1) * wy * wx)


def _stn_scale_y(x, theta):
    """HACNN's STN (hacnn.py:289-306): theta rows [[1,0,tx],[0,.25,ty]]
    applied through affine_grid + grid_sample with the torch DEFAULT
    align_corners=False; samples the same-size output."""
    from tracklab_tpu.models.rtdetr_hf import _grid_sample_bilinear

    b, h, w, c = x.shape
    xn = (2.0 * jnp.arange(w) + 1.0) / w - 1.0
    yn = (2.0 * jnp.arange(h) + 1.0) / h - 1.0
    gx = jnp.broadcast_to(xn[None, :], (h, w))
    gy = jnp.broadcast_to(yn[:, None], (h, w))
    tx = theta[:, 0][:, None, None]
    ty = theta[:, 1][:, None, None]
    grid = jnp.stack([gx[None] * 1.0 + tx, gy[None] * 0.25 + ty],
                     axis=-1)                       # (B, H, W, 2)
    return jax.vmap(_grid_sample_bilinear)(x.astype(jnp.float32), grid)


class _HSoftAttn(nn.Module):
    """spatial x channel attention -> sigmoid(conv) (hacnn.py:91-153)."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = jnp.mean(x, axis=-1, keepdims=True)
        s = _HConv(1, 3, 2, 1, dtype=self.dtype,
                   name="spatial_attn__conv1")(s, train)
        s = _resize_bilinear_ac(s, s.shape[1] * 2, s.shape[2] * 2)
        s = _HConv(1, 1, dtype=self.dtype,
                   name="spatial_attn__conv2")(s, train)
        ch = jnp.mean(x, axis=(1, 2), keepdims=True)
        ch = _HConv(self.features // 16, 1, dtype=self.dtype,
                    name="channel_attn__conv1")(ch, train)
        ch = _HConv(self.features, 1, dtype=self.dtype,
                    name="channel_attn__conv2")(ch, train)
        y = s * ch
        y = _HConv(self.features, 1, dtype=self.dtype,
                   name="conv")(y, train)
        # _HConv applies relu; the reference sigmoids the conv+bn+relu
        return jax.nn.sigmoid(y)


class ReidHACNN(nn.Module):
    """torchreid HACNN (hacnn.py:193-414); eval-mode forward returns
    the concatenated l2-normalized global + local features (2 *
    feat_dim). Input must be (B, 160, 64, 3)."""
    nchannels: tuple = (128, 256, 384)
    feat_dim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        nc = self.nchannels

        def harm(xg, idx, feats):
            attn = _HSoftAttn(feats, dtype=self.dtype,
                              name=f"ha{idx}__soft_attn")(xg, train)
            pooled = jnp.mean(xg, axis=(1, 2))
            theta = jnp.tanh(nn.Dense(8, dtype=self.dtype,
                                      name=f"ha{idx}__hard_attn__fc")(
                pooled)).reshape(-1, 4, 2)
            return attn, theta

        def fc_head(v, name):
            v = nn.Dense(self.feat_dim, dtype=self.dtype,
                         name=f"{name}_0")(v)
            v = nn.BatchNorm(use_running_average=not train,
                             momentum=0.9, epsilon=1e-5,
                             dtype=jnp.float32, name=f"{name}_1")(v)
            return nn.relu(v)

        x = _HConv(32, 3, 2, 1, dtype=self.dtype, name="conv")(x, train)

        x1 = _HInceptionA(nc[0], dtype=self.dtype,
                          name="inception1_0")(x, train)
        x1 = _HInceptionB(nc[0], dtype=self.dtype,
                          name="inception1_1")(x1, train)
        a1, t1 = harm(x1, 1, nc[0])
        x1_out = x1 * a1
        lc1 = _HInceptionB(nc[0], dtype=self.dtype, name="local_conv1")
        locals1 = []
        for r in range(4):
            xt = _stn_scale_y(x, t1[:, r])
            xt = _resize_bilinear_ac(xt, 24, 28)
            locals1.append(lc1(xt, train))

        x2 = _HInceptionA(nc[1], dtype=self.dtype,
                          name="inception2_0")(x1_out, train)
        x2 = _HInceptionB(nc[1], dtype=self.dtype,
                          name="inception2_1")(x2, train)
        a2, t2 = harm(x2, 2, nc[1])
        x2_out = x2 * a2
        lc2 = _HInceptionB(nc[1], dtype=self.dtype, name="local_conv2")
        locals2 = []
        for r in range(4):
            xt = _stn_scale_y(x1_out, t2[:, r])
            xt = _resize_bilinear_ac(xt, 12, 14)
            locals2.append(lc2(xt + locals1[r], train))

        x3 = _HInceptionA(nc[2], dtype=self.dtype,
                          name="inception3_0")(x2_out, train)
        x3 = _HInceptionB(nc[2], dtype=self.dtype,
                          name="inception3_1")(x3, train)
        a3, t3 = harm(x3, 3, nc[2])
        x3_out = x3 * a3
        lc3 = _HInceptionB(nc[2], dtype=self.dtype, name="local_conv3")
        locals3 = []
        for r in range(4):
            xt = _stn_scale_y(x2_out, t3[:, r])
            xt = _resize_bilinear_ac(xt, 6, 7)
            locals3.append(lc3(xt + locals2[r], train))

        vg = fc_head(jnp.mean(x3_out, axis=(1, 2)), "fc_global")
        vl = fc_head(jnp.concatenate(
            [jnp.mean(l, axis=(1, 2)) for l in locals3], axis=-1),
            "fc_local")
        vg = vg / jnp.linalg.norm(vg, axis=1, keepdims=True)
        vl = vl / jnp.linalg.norm(vl, axis=1, keepdims=True)
        return jnp.concatenate([vg, vl], axis=-1)


# ---------------------------------------------------------------------------
# PCB (torchreid pcb.py: part-based convolutional baseline — ResNet50
# trunk at last_stride=1, horizontal part pooling)
# ---------------------------------------------------------------------------

def _adaptive_avg_pool_rows(x, parts):
    """AdaptiveAvgPool2d((parts, 1)) over NHWC: torch bins row i over
    [floor(i*H/p), ceil((i+1)*H/p)); width pools fully."""
    b, h, w, c = x.shape
    cols = jnp.mean(x, axis=2)          # (B, H, C)
    outs = []
    for i in range(parts):
        lo = (i * h) // parts
        hi = -(-((i + 1) * h) // parts)
        outs.append(jnp.mean(cols[:, lo:hi], axis=1))
    return jnp.stack(outs, axis=1)      # (B, parts, C)


class ReidPCB(nn.Module):
    """torchreid pcb_p6/pcb_p4 (pcb.py:131-282). Eval-mode forward:
    per-part l2-normalized 2048-dim features flattened channel-major
    (torch (B, C, parts) order) -> (B, 2048 * parts)."""
    layers: tuple = (3, 4, 6, 3)
    parts: int = 6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=2, padding=[(3, 3)] * 2,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        in_ch = 64
        strides = (1, 2, 2, 1)          # last_stride=1 (pcb.py:166)
        for li, (w, n) in enumerate(zip((64, 128, 256, 512),
                                        self.layers)):
            for b in range(n):
                s = strides[li] if b == 0 else 1
                down = b == 0 and (s != 1 or in_ch != 4 * w)
                x = Bottleneck(w, s, down, dtype=self.dtype,
                               name=f"layer{li + 1}_{b}")(x, train)
                in_ch = 4 * w
        v = _adaptive_avg_pool_rows(x, self.parts)   # (B, parts, C)
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        # torch flattens (B, C, parts, 1) channel-major
        return jnp.swapaxes(v, 1, 2).reshape(x.shape[0], -1)


# ---------------------------------------------------------------------------
# MuDeep (torchreid mudeep.py: multi-scale streams + saliency fusion;
# fixed 256x128 input)
# ---------------------------------------------------------------------------

class ReidMuDeep(nn.Module):
    """torchreid MuDeep (mudeep.py): conv stem, multi-scale block A,
    reduction, multi-scale block B, saliency-weighted fusion, 4096-dim
    fc feature. Input must be (B, 256, 128, 3)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype

        def cb(y, feats, k, s, p, name):
            kh, kw = (k, k) if isinstance(k, int) else k
            ph, pw = (p, p) if isinstance(p, int) else p
            y = nn.Conv(feats, (kh, kw), strides=s,
                        padding=[(ph, ph), (pw, pw)], use_bias=True,
                        dtype=dt, name=f"{name}__conv")(y)
            y = nn.BatchNorm(use_running_average=not train,
                             momentum=0.9, epsilon=1e-5,
                             dtype=jnp.float32, name=f"{name}__bn")(y)
            return nn.relu(y)

        # block1: stem
        x = cb(x, 48, 3, 1, 1, "block1__conv1")
        x = cb(x, 96, 3, 1, 1, "block1__conv2")
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        # block2: MultiScaleA
        s1 = cb(cb(x, 96, 1, 1, 0, "block2__stream1_0"), 24, 3, 1, 1,
                "block2__stream1_1")
        s2 = cb(nn.avg_pool(x, (3, 3), strides=(1, 1),
                            padding=[(1, 1)] * 2),
                24, 1, 1, 0, "block2__stream2_1")
        s3 = cb(x, 24, 1, 1, 0, "block2__stream3")
        s4 = cb(cb(cb(x, 16, 1, 1, 0, "block2__stream4_0"),
                   24, 3, 1, 1, "block2__stream4_1"),
                24, 3, 1, 1, "block2__stream4_2")
        x = jnp.concatenate([s1, s2, s3, s4], axis=-1)
        # block3: Reduction
        r1 = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        r2 = cb(x, 96, 3, 2, 1, "block3__stream2")
        r3 = cb(cb(cb(x, 48, 1, 1, 0, "block3__stream3_0"),
                   56, 3, 1, 1, "block3__stream3_1"),
                64, 3, 2, 1, "block3__stream3_2")
        x = jnp.concatenate([r1, r2, r3], axis=-1)
        # block4: MultiScaleB
        b1 = cb(nn.avg_pool(x, (3, 3), strides=(1, 1),
                            padding=[(1, 1)] * 2),
                256, 1, 1, 0, "block4__stream1_1")
        b2 = cb(cb(cb(x, 64, 1, 1, 0, "block4__stream2_0"),
                   128, (1, 3), 1, (0, 1), "block4__stream2_1"),
                256, (3, 1), 1, (1, 0), "block4__stream2_2")
        b3 = cb(x, 256, 1, 1, 0, "block4__stream3")
        b4 = cb(cb(cb(cb(cb(x, 64, 1, 1, 0, "block4__stream4_0"),
                         64, (1, 3), 1, (0, 1), "block4__stream4_1"),
                      128, (3, 1), 1, (1, 0), "block4__stream4_2"),
                   128, (1, 3), 1, (0, 1), "block4__stream4_3"),
                256, (3, 1), 1, (1, 0), "block4__stream4_4")
        # block5: saliency fusion (raw (1,C,1,1) torch params -> 1-D)
        a = [self.param(f"block5__a{i}", nn.initializers.uniform(1.0),
                        (256,)) for i in (1, 2, 3, 4)]
        y = (a[0][None, None, None, :] * b1
             + a[1][None, None, None, :] * b2
             + a[2][None, None, None, :] * b3
             + a[3][None, None, None, :] * b4)
        y = nn.avg_pool(y, (4, 4), strides=(4, 4))
        # torch flattens NCHW channel-major
        B = y.shape[0]
        v = y.transpose(0, 3, 1, 2).reshape(B, -1)
        v = nn.Dense(4096, dtype=dt, name="fc_0")(v)
        v = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         name="fc_1")(v)
        return nn.relu(v)


# ---------------------------------------------------------------------------
# ResNet50-IBN-b (torchreid resnet_ibn_b.py: InstanceNorm stem norm,
# post-residual IN in the LAST block of layers 1 and 2)
# ---------------------------------------------------------------------------

class _BottleneckIBNb(nn.Module):
    features: int
    stride: int = 1
    downsample: bool = False
    post_in: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        idt = x
        y = nn.relu(_conv_bn(x, self.features, 1, 1, "conv1", "bn1",
                             train, self.dtype))
        y = nn.relu(_conv_bn(y, self.features, 3, self.stride,
                             "conv2", "bn2", train, self.dtype))
        y = _conv_bn(y, 4 * self.features, 1, 1, "conv3", "bn3", train,
                     self.dtype)
        if self.downsample:
            idt = _conv_bn(x, 4 * self.features, 1, self.stride,
                           "downsample_0", "downsample_1", train,
                           self.dtype)
        y = y + idt
        if self.post_in:
            y = nn.GroupNorm(num_groups=4 * self.features,
                             epsilon=1e-5, dtype=jnp.float32,
                             name="IN")(y)
        return nn.relu(y)


class ReidResNetIBNb(nn.Module):
    """resnet50_ibn_b (resnet_ibn_b.py:114-290); eval-mode forward
    returns the pooled feature."""
    layers: tuple = (3, 4, 6, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=2, padding=[(3, 3)] * 2,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        # the stem norm is INSTANCE norm (resnet_ibn_b.py:143)
        x = nn.GroupNorm(num_groups=64, epsilon=1e-5,
                         dtype=jnp.float32, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        in_ch = 64
        for li, (w, n) in enumerate(zip((64, 128, 256, 512),
                                        self.layers)):
            stride = 1 if li == 0 else 2
            layer_in = li < 2
            for b in range(n):
                s = stride if b == 0 else 1
                down = b == 0 and (s != 1 or in_ch != 4 * w)
                x = _BottleneckIBNb(
                    w, s, down, post_in=layer_in and b == n - 1,
                    dtype=self.dtype,
                    name=f"layer{li + 1}_{b}")(x, train)
                in_ch = 4 * w
        return jnp.mean(x, axis=(1, 2))


# ---------------------------------------------------------------------------
# Inception-v4 (torchreid inceptionv4.py; VALID stem/reduction convs,
# count_include_pad=False avg pools, asymmetric 1x7/7x1 factorizations)
# ---------------------------------------------------------------------------

class _IConv(nn.Module):
    """BasicConv2d: conv(no bias) + bn(eps 1e-3) + relu."""
    features: int
    kernel: tuple = (3, 3)
    stride: int = 1
    pad: tuple = (0, 0)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kh, kw = self.kernel
        ph, pw = self.pad
        x = nn.Conv(self.features, (kh, kw), strides=self.stride,
                    padding=[(ph, ph), (pw, pw)], use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, dtype=jnp.float32, name="bn")(x)
        return nn.relu(x)


def _avgp3(x):
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=[(1, 1)] * 2,
                       count_include_pad=False)


def _maxp3v(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2))   # VALID


class ReidInceptionV4(nn.Module):
    """torchreid InceptionV4 (inceptionv4.py:37-360); eval-mode forward
    returns the pooled 1536-dim feature. Flax names mirror the torch
    keys; Inception_C's literal-underscore attributes (branch1_0 etc.)
    are spelled with 'q' and restored by the dedicated key fn
    (models/convert.py:_inception_torch_key)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype

        def C(feats, k=(3, 3), s=1, p=(0, 0), name=""):
            return _IConv(feats, k, s, p, dtype=dt, name=name)

        f = "features"
        x = C(32, s=2, name=f + "_0")(x, train)
        x = C(32, name=f + "_1")(x, train)
        x = C(64, p=(1, 1), name=f + "_2")(x, train)
        # Mixed_3a
        x = jnp.concatenate(
            [_maxp3v(x), C(96, s=2, name=f + "_3__conv")(x, train)], -1)
        # Mixed_4a
        b0 = C(96, name=f + "_4__branch0_1")(
            C(64, (1, 1), name=f + "_4__branch0_0")(x, train), train)
        b1 = C(64, (1, 1), name=f + "_4__branch1_0")(x, train)
        b1 = C(64, (1, 7), p=(0, 3), name=f + "_4__branch1_1")(b1, train)
        b1 = C(64, (7, 1), p=(3, 0), name=f + "_4__branch1_2")(b1, train)
        b1 = C(96, name=f + "_4__branch1_3")(b1, train)
        x = jnp.concatenate([b0, b1], -1)
        # Mixed_5a
        x = jnp.concatenate(
            [C(192, s=2, name=f + "_5__conv")(x, train), _maxp3v(x)], -1)

        # 4x Inception_A (features 6-9)
        for i in range(6, 10):
            b0 = C(96, (1, 1), name=f + f"_{i}__branch0")(x, train)
            b1 = C(96, p=(1, 1), name=f + f"_{i}__branch1_1")(
                C(64, (1, 1), name=f + f"_{i}__branch1_0")(x, train),
                train)
            b2 = C(96, p=(1, 1), name=f + f"_{i}__branch2_1")(
                C(64, (1, 1), name=f + f"_{i}__branch2_0")(x, train),
                train)
            b2 = C(96, p=(1, 1), name=f + f"_{i}__branch2_2")(b2, train)
            b3 = C(96, (1, 1), name=f + f"_{i}__branch3_1")(_avgp3(x),
                                                            train)
            x = jnp.concatenate([b0, b1, b2, b3], -1)
        # Reduction_A (10)
        b0 = C(384, s=2, name=f + "_10__branch0")(x, train)
        b1 = C(192, (1, 1), name=f + "_10__branch1_0")(x, train)
        b1 = C(224, p=(1, 1), name=f + "_10__branch1_1")(b1, train)
        b1 = C(256, s=2, name=f + "_10__branch1_2")(b1, train)
        x = jnp.concatenate([b0, b1, _maxp3v(x)], -1)
        # 7x Inception_B (11-17)
        for i in range(11, 18):
            b0 = C(384, (1, 1), name=f + f"_{i}__branch0")(x, train)
            b1 = C(192, (1, 1), name=f + f"_{i}__branch1_0")(x, train)
            b1 = C(224, (1, 7), p=(0, 3),
                   name=f + f"_{i}__branch1_1")(b1, train)
            b1 = C(256, (7, 1), p=(3, 0),
                   name=f + f"_{i}__branch1_2")(b1, train)
            b2 = C(192, (1, 1), name=f + f"_{i}__branch2_0")(x, train)
            b2 = C(192, (7, 1), p=(3, 0),
                   name=f + f"_{i}__branch2_1")(b2, train)
            b2 = C(224, (1, 7), p=(0, 3),
                   name=f + f"_{i}__branch2_2")(b2, train)
            b2 = C(224, (7, 1), p=(3, 0),
                   name=f + f"_{i}__branch2_3")(b2, train)
            b2 = C(256, (1, 7), p=(0, 3),
                   name=f + f"_{i}__branch2_4")(b2, train)
            b3 = C(128, (1, 1), name=f + f"_{i}__branch3_1")(_avgp3(x),
                                                             train)
            x = jnp.concatenate([b0, b1, b2, b3], -1)
        # Reduction_B (18)
        b0 = C(192, (1, 1), name=f + "_18__branch0_0")(x, train)
        b0 = C(192, s=2, name=f + "_18__branch0_1")(b0, train)
        b1 = C(256, (1, 1), name=f + "_18__branch1_0")(x, train)
        b1 = C(256, (1, 7), p=(0, 3),
               name=f + "_18__branch1_1")(b1, train)
        b1 = C(320, (7, 1), p=(3, 0),
               name=f + "_18__branch1_2")(b1, train)
        b1 = C(320, s=2, name=f + "_18__branch1_3")(b1, train)
        x = jnp.concatenate([b0, b1, _maxp3v(x)], -1)
        # 3x Inception_C (19-21; literal-underscore attrs via 'q')
        for i in range(19, 22):
            b0 = C(256, (1, 1), name=f + f"_{i}__branch0")(x, train)
            h = C(384, (1, 1), name=f + f"_{i}__branch1q0")(x, train)
            b1 = jnp.concatenate([
                C(256, (1, 3), p=(0, 1),
                  name=f + f"_{i}__branch1q1a")(h, train),
                C(256, (3, 1), p=(1, 0),
                  name=f + f"_{i}__branch1q1b")(h, train)], -1)
            h = C(384, (1, 1), name=f + f"_{i}__branch2q0")(x, train)
            h = C(448, (3, 1), p=(1, 0),
                  name=f + f"_{i}__branch2q1")(h, train)
            h = C(512, (1, 3), p=(0, 1),
                  name=f + f"_{i}__branch2q2")(h, train)
            b2 = jnp.concatenate([
                C(256, (1, 3), p=(0, 1),
                  name=f + f"_{i}__branch2q3a")(h, train),
                C(256, (3, 1), p=(1, 0),
                  name=f + f"_{i}__branch2q3b")(h, train)], -1)
            b3 = C(256, (1, 1), name=f + f"_{i}__branch3_1")(_avgp3(x),
                                                             train)
            x = jnp.concatenate([b0, b1, b2, b3], -1)
        return jnp.mean(x, axis=(1, 2))


# ---------------------------------------------------------------------------
# Inception-ResNet-v2 (torchreid inceptionresnetv2.py)
# ---------------------------------------------------------------------------

class ReidInceptionResNetV2(nn.Module):
    """torchreid InceptionResNetV2 (inceptionresnetv2.py:255-360);
    eval-mode forward returns the pooled 1536-dim feature. Flax names
    mirror torch keys; the literal-underscore attributes repeat_1 /
    repeat_2 are spelled with 'q' (restored by _inception_torch_key)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype

        def C(feats, k=(3, 3), s=1, p=(0, 0), name=""):
            return _IConv(feats, k, s, p, dtype=dt, name=name)

        def block35(x, name):
            b0 = C(32, (1, 1), name=f"{name}__branch0")(x, train)
            b1 = C(32, p=(1, 1), name=f"{name}__branch1_1")(
                C(32, (1, 1), name=f"{name}__branch1_0")(x, train),
                train)
            b2 = C(48, p=(1, 1), name=f"{name}__branch2_1")(
                C(32, (1, 1), name=f"{name}__branch2_0")(x, train),
                train)
            b2 = C(64, p=(1, 1), name=f"{name}__branch2_2")(b2, train)
            y = nn.Conv(320, (1, 1), use_bias=True, dtype=dt,
                        name=f"{name}__conv2d")(
                jnp.concatenate([b0, b1, b2], -1))
            return nn.relu(y * 0.17 + x)

        def block17(x, name):
            b0 = C(192, (1, 1), name=f"{name}__branch0")(x, train)
            b1 = C(128, (1, 1), name=f"{name}__branch1_0")(x, train)
            b1 = C(160, (1, 7), p=(0, 3),
                   name=f"{name}__branch1_1")(b1, train)
            b1 = C(192, (7, 1), p=(3, 0),
                   name=f"{name}__branch1_2")(b1, train)
            y = nn.Conv(1088, (1, 1), use_bias=True, dtype=dt,
                        name=f"{name}__conv2d")(
                jnp.concatenate([b0, b1], -1))
            return nn.relu(y * 0.10 + x)

        def block8(x, name, scale=0.20, final_relu=True):
            b0 = C(192, (1, 1), name=f"{name}__branch0")(x, train)
            b1 = C(192, (1, 1), name=f"{name}__branch1_0")(x, train)
            b1 = C(224, (1, 3), p=(0, 1),
                   name=f"{name}__branch1_1")(b1, train)
            b1 = C(256, (3, 1), p=(1, 0),
                   name=f"{name}__branch1_2")(b1, train)
            y = nn.Conv(2080, (1, 1), use_bias=True, dtype=dt,
                        name=f"{name}__conv2d")(
                jnp.concatenate([b0, b1], -1))
            y = y * scale + x
            return nn.relu(y) if final_relu else y

        x = C(32, s=2, name="conv2d_1a")(x, train)
        x = C(32, name="conv2d_2a")(x, train)
        x = C(64, p=(1, 1), name="conv2d_2b")(x, train)
        x = _maxp3v(x)
        x = C(80, (1, 1), name="conv2d_3b")(x, train)
        x = C(192, name="conv2d_4a")(x, train)
        x = _maxp3v(x)
        # Mixed_5b
        b0 = C(96, (1, 1), name="mixed_5b__branch0")(x, train)
        b1 = C(64, (5, 5), p=(2, 2), name="mixed_5b__branch1_1")(
            C(48, (1, 1), name="mixed_5b__branch1_0")(x, train), train)
        b2 = C(96, p=(1, 1), name="mixed_5b__branch2_1")(
            C(64, (1, 1), name="mixed_5b__branch2_0")(x, train), train)
        b2 = C(96, p=(1, 1), name="mixed_5b__branch2_2")(b2, train)
        b3 = C(64, (1, 1), name="mixed_5b__branch3_1")(_avgp3(x), train)
        x = jnp.concatenate([b0, b1, b2, b3], -1)
        for i in range(10):
            x = block35(x, f"repeat_{i}")
        # Mixed_6a
        b0 = C(384, s=2, name="mixed_6a__branch0")(x, train)
        b1 = C(256, (1, 1), name="mixed_6a__branch1_0")(x, train)
        b1 = C(256, p=(1, 1), name="mixed_6a__branch1_1")(b1, train)
        b1 = C(384, s=2, name="mixed_6a__branch1_2")(b1, train)
        x = jnp.concatenate([b0, b1, _maxp3v(x)], -1)
        for i in range(20):
            x = block17(x, f"repeatq1_{i}")
        # Mixed_7a
        b0 = C(384, s=2, name="mixed_7a__branch0_1")(
            C(256, (1, 1), name="mixed_7a__branch0_0")(x, train), train)
        b1 = C(288, s=2, name="mixed_7a__branch1_1")(
            C(256, (1, 1), name="mixed_7a__branch1_0")(x, train), train)
        b2 = C(288, p=(1, 1), name="mixed_7a__branch2_1")(
            C(256, (1, 1), name="mixed_7a__branch2_0")(x, train), train)
        b2 = C(320, s=2, name="mixed_7a__branch2_2")(b2, train)
        x = jnp.concatenate([b0, b1, b2, _maxp3v(x)], -1)
        for i in range(9):
            x = block8(x, f"repeatq2_{i}")
        x = block8(x, "block8", scale=1.0, final_relu=False)
        x = C(1536, (1, 1), name="conv2d_7b")(x, train)
        return jnp.mean(x, axis=(1, 2))
