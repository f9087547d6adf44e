"""ViTPose-style top-down pose estimator in Flax.

Covers the reference's VitPose wrapper role
(tracklab/wrappers/pose_estimator/transformers_api.py:11-35, HF VitPose):
a plain ViT encoder over crop patches + the classic deconv heatmap head.
Attention is ``nn.MultiHeadDotProductAttention`` (MXU matmuls at
bf16-friendly widths); decode shares models/pose.decode_heatmaps.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from tracklab_tpu.models.pose import decode_heatmaps

__all__ = ["ViTPose", "VITPOSE_VARIANTS"]

VITPOSE_VARIANTS = {
    "tiny": dict(depth=4, dim=192, heads=3),
    "small": dict(depth=8, dim=384, heads=6),
    "base": dict(depth=12, dim=768, heads=12),
}


class Block(nn.Module):
    dim: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        y = nn.LayerNorm(dtype=jnp.float32)(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype)(y, y)
        x = x + y
        y = nn.LayerNorm(dtype=jnp.float32)(x)
        y = nn.Dense(self.dim * 4, dtype=self.dtype)(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, dtype=self.dtype)(y)
        return x + y


class ViTPose(nn.Module):
    num_keypoints: int = 17
    variant: str = "small"
    patch: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        v = VITPOSE_VARIANTS[self.variant]
        B, H, W, _ = x.shape
        gh, gw = H // self.patch, W // self.patch
        x = nn.Conv(v["dim"], (self.patch, self.patch),
                    strides=self.patch, dtype=self.dtype)(x)
        x = x.reshape(B, gh * gw, v["dim"])
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, gh * gw, v["dim"]))
        x = x + pos
        for _ in range(v["depth"]):
            x = Block(v["dim"], v["heads"], dtype=self.dtype)(x, train)
        x = nn.LayerNorm(dtype=jnp.float32)(x)
        y = x.reshape(B, gh, gw, v["dim"])
        # /16 -> /4 deconv head
        for _ in range(2):
            y = nn.ConvTranspose(256, (4, 4), strides=(2, 2),
                                 padding="SAME", use_bias=False,
                                 dtype=self.dtype)(y)
            y = nn.BatchNorm(use_running_average=not train,
                             dtype=jnp.float32)(y)
            y = nn.relu(y)
        return nn.Conv(self.num_keypoints, (1, 1), dtype=self.dtype)(y)

    def predict_keypoints(self, variables, crops):
        hm = self.apply(variables, crops, train=False)
        kp = decode_heatmaps(jax.nn.sigmoid(hm))
        stride = crops.shape[1] / hm.shape[1]
        return kp.at[..., :2].multiply(stride)
