"""ViTPose top-down pose estimator in Flax (NHWC).

Exact port of the HF ``VitPoseForPoseEstimation`` architecture behind the
reference's VitPose wrapper (tracklab/wrappers/pose_estimator/
transformers_api.py:11-35): plain ViT encoder (pre-LN blocks, eager
attention, exact-erf GELU, LN eps 1e-12) with the MAE-style position
embedding quirk (``x + pos[:, 1:] + pos[:, :1]`` — the CLS slot is added
to every token, modeling_vitpose_backbone.py:91), plus either the simple
decoder (relu -> 4x bilinear -> 3x3 conv) or the classic decoder
(2 deconv+BN+relu blocks -> 1x1 conv, modeling_vitpose.py:123-180).

Module names mirror the HF state-dict keys ('.' spelled '__') so
:func:`tracklab_tpu.models.convert.convert_vitpose_torch` is a pure
name-mapped relayout — activation parity vs the actual installed
``transformers`` model in tests/test_weight_parity.py.

The deconvs are expressed as input-dilated convolutions (``nn.Conv`` with
``input_dilation=2``) — identical math to torch's ConvTranspose2d(k=4,
s=2, p=1) once the converter flips the kernel spatially — because XLA
maps dilated convs straight onto the MXU.
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
    "large": dict(depth=24, dim=1024, heads=16),
}

LN_EPS = 1e-12


class SelfAttention(nn.Module):
    dim: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        hd = self.dim // self.heads
        B, N, _ = x.shape

        def split(y):
            return y.reshape(B, N, self.heads, hd).transpose(0, 2, 1, 3)

        q = split(nn.Dense(self.dim, dtype=self.dtype, name="query")(x))
        k = split(nn.Dense(self.dim, dtype=self.dtype, name="key")(x))
        v = split(nn.Dense(self.dim, dtype=self.dtype, name="value")(x))
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (hd ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        return out.transpose(0, 2, 1, 3).reshape(B, N, self.dim)


class Attention(nn.Module):
    dim: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = SelfAttention(self.dim, self.heads, dtype=self.dtype,
                          name="attention")(x)
        return AttnOutput(self.dim, dtype=self.dtype, name="output")(y)


class AttnOutput(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.dim, dtype=self.dtype, name="dense")(x)


class MLP(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim * 4, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)


class Block(nn.Module):
    dim: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=LN_EPS, dtype=jnp.float32,
                         name="layernorm_before")(x)
        x = x + Attention(self.dim, self.heads, dtype=self.dtype,
                          name="attention")(y)
        y = nn.LayerNorm(epsilon=LN_EPS, dtype=jnp.float32,
                         name="layernorm_after")(x)
        return x + MLP(self.dim, dtype=self.dtype, name="mlp")(y)


class PatchEmbeddings(nn.Module):
    dim: int
    patch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # the HF patch conv uses padding=2 on the 16x16/s16 projection
        # (modeling_vitpose_backbone.py:58) — grid size is unchanged but
        # the window alignment shifts
        return nn.Conv(self.dim, (self.patch, self.patch),
                       strides=self.patch, padding=[(2, 2), (2, 2)],
                       dtype=self.dtype, name="projection")(x)


class Embeddings(nn.Module):
    dim: int
    patch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, _ = x.shape
        gh, gw = H // self.patch, W // self.patch
        x = PatchEmbeddings(self.dim, self.patch, dtype=self.dtype,
                            name="patch_embeddings")(x)
        x = x.reshape(B, gh * gw, self.dim)
        pos = self.param("position_embeddings",
                         nn.initializers.normal(0.02),
                         (1, gh * gw + 1, self.dim))
        # MAE-compat quirk: the CLS position slot is added to every token
        return x + pos[:, 1:] + pos[:, :1]


class Encoder(nn.Module):
    depth: int
    dim: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.depth):
            x = Block(self.dim, self.heads, dtype=self.dtype,
                      name=f"layer__{i}")(x)
        return x


class Backbone(nn.Module):
    depth: int
    dim: int
    heads: int
    patch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, _ = x.shape
        gh, gw = H // self.patch, W // self.patch
        x = Embeddings(self.dim, self.patch, dtype=self.dtype,
                       name="embeddings")(x)
        x = Encoder(self.depth, self.dim, self.heads, dtype=self.dtype,
                    name="encoder")(x)
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=jnp.float32,
                         name="layernorm")(x)
        return x.reshape(B, gh, gw, self.dim)


class ClassicDecoder(nn.Module):
    """2x (deconv k4 s2 p1 + BN + relu) then 1x1 conv
    (modeling_vitpose.py:150-180). Deconvs are input-dilated convs; the
    converter supplies spatially-flipped kernels."""
    num_keypoints: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in (1, 2):
            x = nn.Conv(256, (4, 4), strides=1, input_dilation=2,
                        padding=[(2, 2), (2, 2)], use_bias=False,
                        dtype=self.dtype, name=f"deconv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train,
                             dtype=jnp.float32, name=f"batchnorm{i}")(x)
            x = nn.relu(x)
        return nn.Conv(self.num_keypoints, (1, 1), dtype=self.dtype,
                       name="conv")(x)


class SimpleDecoder(nn.Module):
    """relu -> 4x bilinear (half-pixel, = torch align_corners=False) ->
    3x3 conv (modeling_vitpose.py:123-147)."""
    num_keypoints: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        x = nn.relu(x)
        x = jax.image.resize(x, (B, H * 4, W * 4, C), "bilinear")
        return nn.Conv(self.num_keypoints, (3, 3), padding=1,
                       dtype=self.dtype, name="conv")(x)


class ViTPose(nn.Module):
    num_keypoints: int = 17
    variant: str = "small"
    patch: int = 16
    simple_decoder: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        v = VITPOSE_VARIANTS[self.variant]
        x = Backbone(v["depth"], v["dim"], v["heads"], self.patch,
                     dtype=self.dtype, name="backbone")(x)
        head = SimpleDecoder if self.simple_decoder else ClassicDecoder
        return head(self.num_keypoints, dtype=self.dtype,
                    name="head")(x, train)

    def predict_keypoints(self, variables, crops):
        hm = self.apply(variables, crops, train=False)
        kp = decode_heatmaps(jax.nn.sigmoid(hm))
        stride = crops.shape[1] / hm.shape[1]
        return kp.at[..., :2].multiply(stride)
