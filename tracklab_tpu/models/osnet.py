"""OSNet person re-identification backbone in Flax (NHWC).

Exact port of the architecture behind the reference's ReID model zoo
(vendored source: plugins/track/strong_sort/deep/models/osnet.py —
osnet_x1_0 / osnet_ibn_x1_0 are the shipped defaults per
strong_sort.yaml / bot_sort.yaml): omni-scale residual blocks with four
INDEPENDENT lite (1x1 + depthwise 3x3) streams of depth 1..4 from the
bottleneck, fused by a shared channel-attention unified aggregation gate
(osnet.py:223-276), stage transitions of Conv1x1+avgpool
(osnet.py:345-368), and a Linear+BN+ReLU feature head (osnet.py:370-390).

Module names mirror the torch state-dict keys one-for-one (dots become
double underscores) so :func:`tracklab_tpu.models.convert.
convert_osnet_torch` is a pure name-mapped tensor relayout — validated by
activation parity against the vendored torch model itself in
tests/test_weight_parity.py.

Also provides the part-based head used by the KPReID module: PCB-style
horizontal-stripe pooling producing (P, E) part features + a global part,
with visibility scores from the stripe activation mass (first-party; no
official weights exist for it).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["OSNet", "OSNET_VARIANTS"]

OSNET_VARIANTS = {
    # channels per stage, blocks per stage (osnet.py:445-520 factories)
    "x1_0": dict(channels=(64, 256, 384, 512), blocks=(2, 2, 2)),
    "x0_75": dict(channels=(48, 192, 288, 384), blocks=(2, 2, 2)),
    "x0_5": dict(channels=(32, 128, 192, 256), blocks=(2, 2, 2)),
    "x0_25": dict(channels=(16, 64, 96, 128), blocks=(2, 2, 2)),
}


class ConvLayer(nn.Module):
    """conv + bn(+IN) + relu (osnet.py:28-61)."""
    features: int
    kernel: int = 3
    stride: int = 1
    instance_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=self.stride,
                    padding=[(self.kernel // 2, self.kernel // 2)] * 2,
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        if self.instance_norm:
            # nn.InstanceNorm2d(affine=True) == GroupNorm(groups=C);
            # the torch attribute is still called 'bn' (osnet.py:51-54)
            x = nn.GroupNorm(num_groups=self.features, epsilon=1e-5,
                             dtype=jnp.float32, name="bn")(x)
        else:
            x = nn.BatchNorm(use_running_average=not train,
                             dtype=jnp.float32, name="bn")(x)
        return nn.relu(x)


class Conv1x1(nn.Module):
    """1x1 conv + bn + relu (osnet.py:64-85)."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train,
                         dtype=jnp.float32, name="bn")(x)
        return nn.relu(x)


class Conv1x1Linear(nn.Module):
    """1x1 conv + bn, no relu (osnet.py:88-101)."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        return nn.BatchNorm(use_running_average=not train,
                            dtype=jnp.float32, name="bn")(x)


class LightConv3x3(nn.Module):
    """1x1 (linear) + depthwise 3x3 + bn + relu (osnet.py:128-156)."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.Conv(self.features, (3, 3), padding=1,
                    feature_group_count=self.features, use_bias=False,
                    dtype=self.dtype, name="conv2")(x)
        x = nn.BatchNorm(use_running_average=not train,
                         dtype=jnp.float32, name="bn")(x)
        return nn.relu(x)


class ChannelGate(nn.Module):
    """Unified aggregation gate (osnet.py:162-220): gap -> fc1 (1x1 conv
    with bias, reduction 16) -> relu -> fc2 -> sigmoid; returns
    input * gate."""
    features: int
    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.features // self.reduction, (1, 1),
                    use_bias=True, dtype=self.dtype, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(self.features, (1, 1), use_bias=True,
                    dtype=self.dtype, name="fc2")(s)
        return x * jax.nn.sigmoid(s)


class OSBlock(nn.Module):
    """Omni-scale block (osnet.py:223-276): four independent lite-conv
    streams of depth 1..4 from the bottleneck, one shared gate."""
    features: int
    instance_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.features // 4
        identity = x
        x1 = Conv1x1(mid, dtype=self.dtype, name="conv1")(x, train)
        gate = ChannelGate(mid, dtype=self.dtype, name="gate")
        x2a = LightConv3x3(mid, dtype=self.dtype, name="conv2a")(x1, train)
        x2b = x1
        for i in range(2):
            x2b = LightConv3x3(mid, dtype=self.dtype,
                               name=f"conv2b__{i}")(x2b, train)
        x2c = x1
        for i in range(3):
            x2c = LightConv3x3(mid, dtype=self.dtype,
                               name=f"conv2c__{i}")(x2c, train)
        x2d = x1
        for i in range(4):
            x2d = LightConv3x3(mid, dtype=self.dtype,
                               name=f"conv2d__{i}")(x2d, train)
        x2 = gate(x2a) + gate(x2b) + gate(x2c) + gate(x2d)
        x3 = Conv1x1Linear(self.features, dtype=self.dtype,
                           name="conv3")(x2, train)
        if identity.shape[-1] != self.features:
            identity = Conv1x1Linear(self.features, dtype=self.dtype,
                                     name="downsample")(identity, train)
        out = x3 + identity
        if self.instance_norm:
            out = nn.GroupNorm(num_groups=self.features, epsilon=1e-5,
                               dtype=jnp.float32, name="IN")(out)
        return nn.relu(out)


class OSNet(nn.Module):
    """Backbone + global/part feature heads.

    __call__(images (B, H, W, 3)) -> dict with:
      embeddings: (B, feat_dim) global features (= the torch model's
        eval-mode forward output v, osnet.py:422-436)
      part_features: (B, n_parts + 1, feat_dim) stripe + global parts
      visibility: (B, n_parts + 1) stripe activation-mass scores

    ``ibn=True`` reproduces osnet_ibn_x1_0: InstanceNorm in the stem and
    after the residual add of every conv2-stage block (osnet.py:310-320:
    IN is passed only to conv1 and the conv2 stage).
    """
    variant: str = "x1_0"
    feat_dim: int = 512
    n_parts: int = 6
    ibn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        v = OSNET_VARIANTS[self.variant]
        chans = v["channels"]
        x = ConvLayer(chans[0], 7, 2, instance_norm=self.ibn,
                      dtype=self.dtype, name="conv1")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        for stage, (c, n) in enumerate(zip(chans[1:], v["blocks"])):
            sname = f"conv{stage + 2}"
            for b in range(n):
                x = OSBlock(c, instance_norm=self.ibn and stage == 0,
                            dtype=self.dtype,
                            name=f"{sname}__{b}")(x, train)
            if stage < len(v["blocks"]) - 1:
                # transition: Sequential(Conv1x1, AvgPool2d(2))
                # torch keys: convN.<n>.0.{conv,bn}.*
                x = Conv1x1(c, dtype=self.dtype,
                            name=f"{sname}__{n}__0")(x, train)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = Conv1x1(chans[-1], dtype=self.dtype, name="conv5")(x, train)

        # global head: Linear + BN1d + ReLU (osnet.py:370-390)
        g = jnp.mean(x, axis=(1, 2))
        g = nn.Dense(self.feat_dim, dtype=self.dtype, name="fc__0")(g)
        g = nn.BatchNorm(use_running_average=not train,
                         dtype=jnp.float32, name="fc__1")(g)
        g = nn.relu(g)

        # part head (first-party, see module docstring)
        B, H, W, C = x.shape
        P = self.n_parts
        usable = (H // P) * P
        stripes = x[:, :usable].reshape(B, P, usable // P, W, C)
        part_feat = jnp.mean(stripes, axis=(2, 3))          # (B, P, C)
        part_feat = nn.Dense(self.feat_dim, dtype=self.dtype,
                             name="part_fc")(part_feat)
        # visibility: normalized stripe activation mass
        mass = jnp.mean(jnp.abs(stripes), axis=(2, 3, 4))   # (B, P)
        vis = mass / jnp.maximum(
            jnp.max(mass, axis=1, keepdims=True), 1e-6)
        parts = jnp.concatenate([g[:, None, :], part_feat], axis=1)
        vis_full = jnp.concatenate(
            [jnp.ones((B, 1), vis.dtype), vis], axis=1)
        return {"embeddings": g, "part_features": parts,
                "visibility": vis_full}


# ---------------------------------------------------------------------------
# OSNet-AIN (osnet_ain.py in the reference's vendored torchreid):
# per-stream LightConv stacks, a SHARED aggregation gate, and instance
# normalization inside selected residuals
# ---------------------------------------------------------------------------

class Conv1x1LinearNoBN(nn.Module):
    """Conv1x1Linear(bn=False) (osnet_ain.py:55-71)."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.Conv(self.features, (1, 1), use_bias=False,
                       dtype=self.dtype, name="conv")(x)


class LightConvStream(nn.Module):
    """depth x LightConv3x3 (osnet_ain.py:127-142; names layers_{d})."""
    features: int
    depth: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for d in range(self.depth):
            x = LightConv3x3(self.features, dtype=self.dtype,
                             name=f"layers_{d}")(x, train)
        return x


class OSBlockAIN(nn.Module):
    """osnet_ain.py OSBlock / OSBlockINin: T parallel LightConv streams
    of increasing depth, ONE shared ChannelGate, linear 1x1 out
    (bn dropped + InstanceNorm inside the residual for the INin
    variant)."""
    features: int
    instance_norm: bool = False     # True -> OSBlockINin
    T: int = 4
    reduction: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.features // self.reduction
        identity = x
        x1 = Conv1x1(mid, dtype=self.dtype, name="conv1")(x, train)
        gate = ChannelGate(mid, dtype=self.dtype, name="gate")
        x2 = None
        for t in range(self.T):
            s = LightConvStream(mid, t + 1, dtype=self.dtype,
                                name=f"conv2_{t}")(x1, train)
            s = gate(s)
            x2 = s if x2 is None else x2 + s
        if self.instance_norm:
            x3 = Conv1x1LinearNoBN(self.features, dtype=self.dtype,
                                   name="conv3")(x2, train)
            x3 = nn.GroupNorm(num_groups=self.features, epsilon=1e-5,
                              dtype=jnp.float32, name="IN")(x3)
        else:
            x3 = Conv1x1Linear(self.features, dtype=self.dtype,
                               name="conv3")(x2, train)
        if x.shape[-1] != self.features:
            identity = Conv1x1Linear(self.features, dtype=self.dtype,
                                     name="downsample")(x, train)
        return nn.relu(x3 + identity)


OSNET_AIN_VARIANTS = {
    # channels + per-stage block kinds (osnet_ain.py:531-596);
    # True = OSBlockINin
    "ain_x1_0": dict(channels=(64, 256, 384, 512),
                     blocks=((True, True), (False, True),
                             (True, False))),
    "ain_x0_75": dict(channels=(48, 192, 288, 384),
                      blocks=((True, True), (False, True),
                              (True, False))),
    "ain_x0_5": dict(channels=(32, 128, 192, 256),
                     blocks=((True, True), (False, True),
                             (True, False))),
    "ain_x0_25": dict(channels=(16, 64, 96, 128),
                      blocks=((True, True), (False, True),
                              (True, False))),
}


class OSNetAIN(nn.Module):
    """osnet_ain_x* topology; eval-mode forward returns the post-fc
    feature vector (the StrongSORT appearance embedding)."""
    variant: str = "ain_x1_0"
    feat_dim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        v = OSNET_AIN_VARIANTS[self.variant]
        chans = v["channels"]
        x = ConvLayer(chans[0], 7, 2, instance_norm=True,
                      dtype=self.dtype, name="conv1")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        for stage, kinds in enumerate(v["blocks"]):
            sname = f"conv{stage + 2}"
            for b, inin in enumerate(kinds):
                x = OSBlockAIN(chans[stage + 1], instance_norm=inin,
                               dtype=self.dtype,
                               name=f"{sname}_{b}")(x, train)
            if stage < len(v["blocks"]) - 1:
                x = Conv1x1(chans[stage + 1], dtype=self.dtype,
                            name=f"pool{stage + 2}_0")(x, train)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = Conv1x1(chans[-1], dtype=self.dtype, name="conv5")(x, train)
        g = jnp.mean(x, axis=(1, 2))
        g = nn.Dense(self.feat_dim, dtype=self.dtype, name="fc_0")(g)
        g = nn.BatchNorm(use_running_average=not train,
                         dtype=jnp.float32, name="fc_1")(g)
        return nn.relu(g)
