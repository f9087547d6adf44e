"""OSNet person re-identification backbone in Flax (NHWC).

JAX port of the architecture behind the reference's ReID model zoo
(plugins/track/strong_sort/deep/models — osnet_x1_0 / osnet_ibn_x1_0 are
the shipped defaults, strong_sort.yaml / bot_sort.yaml): omni-scale
residual blocks with lite (depthwise-separable) 3x3 streams of depth 1..4
fused by a channel-attention unified aggregation gate.

Also provides the part-based head used by the KPReID module: PCB-style
horizontal-stripe pooling producing (P, E) part features + a global part,
with visibility scores from the stripe activation mass — a functional
stand-in for KPR's learned part-attention maps (reference
tracklab/wrappers/reid/kpreid_api.py), upgradeable to full KPR without
changing the module interface.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["OSNet", "OSNET_VARIANTS"]

OSNET_VARIANTS = {
    # channels per stage, blocks per stage
    "x1_0": dict(channels=(64, 256, 384, 512), blocks=(2, 2, 2)),
    "x0_75": dict(channels=(48, 192, 288, 384), blocks=(2, 2, 2)),
    "x0_5": dict(channels=(32, 128, 192, 256), blocks=(2, 2, 2)),
    "x0_25": dict(channels=(16, 64, 96, 128), blocks=(2, 2, 2)),
}


class ConvBn(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: bool = True
    ibn: bool = False   # instance-batch norm (osnet_ibn_* variants)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=self.stride,
                    padding=[(self.kernel // 2, self.kernel // 2)] * 2,
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype)(x)
        if self.ibn:
            # IBN: instance norm on the first half channels, batch norm
            # on the rest (the osnet_ibn_x1_0 default of the reference's
            # StrongSORT/BoT-SORT configs)
            half = self.features // 2
            a = nn.GroupNorm(num_groups=half, epsilon=1e-5,
                             dtype=jnp.float32)(x[..., :half])
            b = nn.BatchNorm(use_running_average=not train,
                             dtype=jnp.float32)(x[..., half:])
            x = jnp.concatenate([a, b], axis=-1)
        else:
            x = nn.BatchNorm(use_running_average=not train,
                             dtype=jnp.float32)(x)
        return nn.relu(x) if self.act else x


class LiteConv(nn.Module):
    """1x1 conv + depthwise 3x3 (the 'lite' OSNet stream unit)."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.Conv(self.features, (3, 3), padding=1,
                    feature_group_count=self.features, use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train,
                         dtype=jnp.float32)(x)
        return nn.relu(x)


class ChannelGate(nn.Module):
    """Unified aggregation gate: per-channel sigmoid attention."""
    features: int
    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Dense(max(self.features // self.reduction, 8),
                     dtype=self.dtype)(s)
        s = nn.relu(s)
        s = nn.Dense(self.features, dtype=self.dtype)(s)
        return jax.nn.sigmoid(s)


class OSBlock(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.features // 4
        identity = x
        y = ConvBn(mid, 1, dtype=self.dtype)(x, train)
        # multi-scale streams: depth 1..4 of lite convs
        gate = ChannelGate(mid, dtype=self.dtype)
        agg = None
        stream = y
        for depth in range(4):
            stream = LiteConv(mid, dtype=self.dtype)(stream, train)
            gated = stream * gate(stream)
            agg = gated if agg is None else agg + gated
        z = ConvBn(self.features, 1, act=False, dtype=self.dtype)(agg,
                                                                  train)
        if identity.shape[-1] != self.features:
            identity = ConvBn(self.features, 1, act=False,
                              dtype=self.dtype)(identity, train)
        return nn.relu(z + identity)


class OSNet(nn.Module):
    """Backbone + global/part feature heads.

    __call__(images (B, H, W, 3)) -> dict with:
      embeddings: (B, feat_dim) global features
      part_features: (B, n_parts + 1, feat_dim) stripe + global parts
      visibility: (B, n_parts + 1) stripe activation-mass scores
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
        x = ConvBn(chans[0], 7, 2, ibn=self.ibn, dtype=self.dtype)(x,
                                                                   train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        for stage, (c, n) in enumerate(zip(chans[1:], v["blocks"])):
            for _ in range(n):
                x = OSBlock(c, dtype=self.dtype)(x, train)
            if stage < len(v["blocks"]) - 1:
                x = ConvBn(c, 1, dtype=self.dtype)(x, train)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = ConvBn(chans[-1], 1, dtype=self.dtype)(x, train)  # conv5

        # global head
        g = jnp.mean(x, axis=(1, 2))
        g = nn.Dense(self.feat_dim, dtype=self.dtype)(g)
        g = nn.BatchNorm(use_running_average=not train,
                         dtype=jnp.float32)(g)

        # part head: horizontal stripes (PCB-style)
        B, H, W, C = x.shape
        P = self.n_parts
        usable = (H // P) * P
        stripes = x[:, :usable].reshape(B, P, usable // P, W, C)
        part_feat = jnp.mean(stripes, axis=(2, 3))          # (B, P, C)
        part_feat = nn.Dense(self.feat_dim, dtype=self.dtype)(part_feat)
        # visibility: normalized stripe activation mass
        mass = jnp.mean(jnp.abs(stripes), axis=(2, 3, 4))   # (B, P)
        vis = mass / jnp.maximum(
            jnp.max(mass, axis=1, keepdims=True), 1e-6)
        parts = jnp.concatenate([g[:, None, :], part_feat], axis=1)
        vis_full = jnp.concatenate(
            [jnp.ones((B, 1), vis.dtype), vis], axis=1)
        return {"embeddings": g, "part_features": parts,
                "visibility": vis_full}
