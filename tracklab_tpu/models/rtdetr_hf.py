"""HF-exact RT-DETR in Flax (NHWC): checkpoint-compatible with the
PekingU/rtdetr_* zoo the reference uses.

The reference's RTDetr wrapper instantiates HuggingFace
``RTDetrForObjectDetection``
(tracklab/wrappers/bbox_detector/transformers_api.py with
configs/modules/bbox_detector/rtdetr_transformers*.yaml). This module
rebuilds that exact architecture — ResNet-D backbone (deep 3-conv stem,
avg-pool downsample shortcuts), hybrid encoder (AIFI transformer on the
stride-32 level with 2D sincos positions + CSP-RepVGG FPN/PAN), and the
deformable-attention decoder with anchor-based two-stage query
selection and iterative box refinement — with module names mirroring
the HF state-dict keys, so official checkpoints convert by pure name
mapping (models/convert.py:convert_rtdetr_hf_torch). Activation parity
vs the installed ``transformers`` implementation is tested in
tests/test_weight_parity.py.

Inference-only: the contrastive-denoising branch is training-only
machinery and is skipped (its class-embedding table is
expected-unused during conversion).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Sequence, Tuple  # noqa: F401

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["RTDetrHF", "RTDetrHFConfig", "RTDETR_HF_VARIANTS",
           "postprocess_rtdetr"]


@dataclasses.dataclass(frozen=True)
class RTDetrHFConfig:
    """The RTDetrConfig fields the forward pass depends on (HF
    transformers/models/rt_detr/configuration_rt_detr.py defaults)."""
    num_labels: int = 80
    d_model: int = 256
    num_queries: int = 300
    # backbone (ResNet-D)
    embedding_size: int = 64
    hidden_sizes: Tuple[int, ...] = (256, 512, 1024, 2048)
    depths: Tuple[int, ...] = (3, 4, 6, 3)
    layer_type: str = "bottleneck"          # or "basic"
    downsample_in_bottleneck: bool = False
    # encoder
    encoder_hidden_dim: int = 256
    encoder_in_channels: Tuple[int, ...] = (512, 1024, 2048)
    feat_strides: Tuple[int, ...] = (8, 16, 32)
    encoder_layers: int = 1
    encoder_ffn_dim: int = 1024
    num_attention_heads: int = 8
    encode_proj_layers: Tuple[int, ...] = (2,)
    positional_encoding_temperature: float = 10000.0
    hidden_expansion: float = 1.0
    # decoder
    decoder_layers: int = 6
    decoder_ffn_dim: int = 1024
    decoder_attention_heads: int = 8
    decoder_n_points: int = 4
    num_feature_levels: int = 3
    learn_initial_query: bool = False
    layer_norm_eps: float = 1e-5
    batch_norm_eps: float = 1e-5
    anchor_grid_size: float = 0.05


RTDETR_HF_VARIANTS = {
    # PekingU configs (decoder depth / backbone per released variant)
    "r18vd": dict(embedding_size=64, hidden_sizes=(64, 128, 256, 512),
                  depths=(2, 2, 2, 2), layer_type="basic",
                  encoder_in_channels=(128, 256, 512),
                  decoder_layers=3),
    "r34vd": dict(embedding_size=64, hidden_sizes=(64, 128, 256, 512),
                  depths=(3, 4, 6, 3), layer_type="basic",
                  encoder_in_channels=(128, 256, 512),
                  decoder_layers=4),
    "r50vd": dict(),
    "r101vd": dict(depths=(3, 4, 23, 3), encoder_ffn_dim=2048,
                   encoder_hidden_dim=384),
}


# ---------------------------------------------------------------------------
# shared layers
# ---------------------------------------------------------------------------

def _conv_bn(x, features, kernel, stride, conv_name, bn_name, dtype,
             eps=1e-5, pad=None):
    p = (kernel - 1) // 2 if pad is None else pad
    x = nn.Conv(features, (kernel, kernel), strides=stride,
                padding=[(p, p)] * 2, use_bias=False, dtype=dtype,
                name=conv_name)(x)
    # inference path: running statistics (HF freezes backbone BNs and
    # everything runs in eval for parity). BN math stays f32; the
    # result is cast back so inter-layer buffers materialize in the
    # compute dtype (bf16 halves the HBM traffic that dominates the
    # backbone/CCFF — same treatment as yolox.py's ConvBnAct).
    x = nn.BatchNorm(use_running_average=True, epsilon=eps,
                     dtype=jnp.float32, name=bn_name)(x)
    return x.astype(dtype)


class ResNetConvLayer(nn.Module):
    """RTDetrResNetConvLayer: conv(no bias)+bn+relu|identity
    (names: convolution, normalization)."""
    features: int
    kernel: int = 3
    stride: int = 1
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _conv_bn(x, self.features, self.kernel, self.stride,
                     "convolution", "normalization", self.dtype)
        return nn.relu(x) if self.act else x


class ResNetShortCut(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return _conv_bn(x, self.features, 1, self.stride,
                        "convolution", "normalization", self.dtype)


def _avg_pool_ceil2(x):
    """AvgPool2d(2, 2, ceil_mode=True): pad to even H/W counting only
    in-bounds pixels (count_include_pad=True in torch averages the ZERO
    padding — torch default count_include_pad=True, and HF uses the
    default, so zero-padded cells enter the mean)."""
    b, h, w, c = x.shape
    ph, pw = h % 2, w % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


class ResNetBasicLayer(nn.Module):
    """RTDetrResNetBasicLayer (modeling_rt_detr_resnet.py:119-160)."""
    features: int
    stride: int = 1
    shortcut: str = "none"      # none | proj | pool_proj
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        res = x
        y = ResNetConvLayer(self.features, 3, self.stride,
                            dtype=self.dtype, name="layer_0")(x)
        y = ResNetConvLayer(self.features, 3, 1, act=False,
                            dtype=self.dtype, name="layer_1")(y)
        if self.shortcut == "proj":
            res = ResNetShortCut(self.features, self.stride,
                                 dtype=self.dtype, name="shortcut")(x)
        elif self.shortcut == "pool_proj":
            res = ResNetShortCut(self.features, 1, dtype=self.dtype,
                                 name="shortcut_1")(_avg_pool_ceil2(x))
        return nn.relu(y + res)


class ResNetBottleNeckLayer(nn.Module):
    """RTDetrResNetBottleNeckLayer (modeling_rt_detr_resnet.py:163-215).
    stride==2 puts an avgpool before the (optional) projection shortcut;
    the 3x3 conv carries the stride (downsample_in_bottleneck=False)."""
    features: int
    stride: int = 1
    downsample_in_bottleneck: bool = False
    shortcut_proj: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        red = self.features // 4
        res = x
        s1 = self.stride if self.downsample_in_bottleneck else 1
        s2 = self.stride if not self.downsample_in_bottleneck else 1
        y = ResNetConvLayer(red, 1, s1, dtype=self.dtype,
                            name="layer_0")(x)
        y = ResNetConvLayer(red, 3, s2, dtype=self.dtype,
                            name="layer_1")(y)
        y = ResNetConvLayer(self.features, 1, 1, act=False,
                            dtype=self.dtype, name="layer_2")(y)
        if self.stride == 2:
            res = _avg_pool_ceil2(x)
            if self.shortcut_proj:
                res = ResNetShortCut(self.features, 1, dtype=self.dtype,
                                     name="shortcut_1")(res)
        elif self.shortcut_proj:
            res = ResNetShortCut(self.features, self.stride,
                                 dtype=self.dtype, name="shortcut")(x)
        return nn.relu(y + res)


class ResNetDBackbone(nn.Module):
    """RTDetrResNetBackbone: deep stem + 4 stages, returning the last
    three stages (strides 8/16/32)."""
    cfg: RTDetrHFConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        e = c.embedding_size
        x = ResNetConvLayer(e // 2, 3, 2, dtype=self.dtype,
                            name="embedder__embedder_0")(x)
        x = ResNetConvLayer(e // 2, 3, 1, dtype=self.dtype,
                            name="embedder__embedder_1")(x)
        x = ResNetConvLayer(e, 3, 1, dtype=self.dtype,
                            name="embedder__embedder_2")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=[(1, 1)] * 2)
        outs = []
        in_ch = e
        bottleneck = c.layer_type == "bottleneck"
        for i, (width, depth) in enumerate(zip(c.hidden_sizes,
                                               c.depths)):
            stride = 1 if i == 0 else 2
            for j in range(depth):
                s = stride if j == 0 else 1
                need_proj = in_ch != width or s != 1
                name = f"encoder__stages_{i}__layers_{j}"
                if bottleneck:
                    x = ResNetBottleNeckLayer(
                        width, s, c.downsample_in_bottleneck,
                        shortcut_proj=need_proj, dtype=self.dtype,
                        name=name)(x)
                else:
                    # basic layer (modeling_rt_detr_resnet.py:119-152):
                    # the FIRST layer of every stage projects
                    # (should_apply_shortcut=True); channels changing
                    # routes through avgpool+proj(stride 1), otherwise
                    # a strided 1x1 proj; later layers are identity
                    if j != 0:
                        sc = "none"
                    elif in_ch != width:
                        sc = "pool_proj"
                    else:
                        sc = "proj"
                    x = ResNetBasicLayer(width, s, sc,
                                         dtype=self.dtype,
                                         name=name)(x)
                in_ch = width
            if i >= 1:
                outs.append(x)
        return outs


class MultiheadAttention(nn.Module):
    """RTDetrMultiheadAttention: pos embeds added to q and k only."""
    embed_dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden, pos=None):
        B, L, _ = hidden.shape
        H = self.num_heads
        D = self.embed_dim // H
        qk_in = hidden if pos is None else hidden + pos
        q = nn.Dense(self.embed_dim, dtype=self.dtype,
                     name="q_proj")(qk_in) * (D ** -0.5)
        k = nn.Dense(self.embed_dim, dtype=self.dtype,
                     name="k_proj")(qk_in)
        v = nn.Dense(self.embed_dim, dtype=self.dtype,
                     name="v_proj")(hidden)
        q = q.reshape(B, L, H, D).transpose(0, 2, 1, 3)
        k = k.reshape(B, L, H, D).transpose(0, 2, 1, 3)
        v = v.reshape(B, L, H, D).transpose(0, 2, 1, 3)
        attn = jax.nn.softmax(q.astype(jnp.float32)
                              @ k.transpose(0, 1, 3, 2)
                              .astype(jnp.float32), axis=-1)
        out = (attn.astype(v.dtype) @ v).transpose(0, 2, 1, 3)
        out = out.reshape(B, L, self.embed_dim)
        return nn.Dense(self.embed_dim, dtype=self.dtype,
                        name="out_proj")(out)


class EncoderLayer(nn.Module):
    """RTDetrEncoderLayer (post-norm, gelu FFN)."""
    cfg: RTDetrHFConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pos):
        c = self.cfg
        y = MultiheadAttention(c.encoder_hidden_dim,
                               c.num_attention_heads, dtype=self.dtype,
                               name="self_attn")(x, pos)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps,
                         name="self_attn_layer_norm")(x + y)
        y = nn.Dense(c.encoder_ffn_dim, dtype=self.dtype,
                     name="fc1")(x)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(c.encoder_hidden_dim, dtype=self.dtype,
                     name="fc2")(y)
        return nn.LayerNorm(epsilon=c.layer_norm_eps,
                            name="final_layer_norm")(x + y)


class ConvNormLayer(nn.Module):
    """RTDetrConvNormLayer (names: conv, norm; silu or identity)."""
    features: int
    kernel: int
    stride: int = 1
    act: bool = True
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _conv_bn(x, self.features, self.kernel, self.stride,
                     "conv", "norm", self.dtype, eps=self.eps)
        return nn.silu(x) if self.act else x


class RepVggBlock(nn.Module):
    cfg: RTDetrHFConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        hidden = int(c.encoder_hidden_dim * c.hidden_expansion)
        y = ConvNormLayer(hidden, 3, 1, act=False, eps=c.batch_norm_eps,
                          dtype=self.dtype, name="conv1")(x) \
            + ConvNormLayer(hidden, 1, 1, act=False,
                            eps=c.batch_norm_eps, dtype=self.dtype,
                            name="conv2")(x)
        return nn.silu(y)


class CSPRepLayer(nn.Module):
    cfg: RTDetrHFConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        hidden = int(c.encoder_hidden_dim * c.hidden_expansion)
        y1 = ConvNormLayer(hidden, 1, 1, eps=c.batch_norm_eps,
                           dtype=self.dtype, name="conv1")(x)
        for j in range(3):
            y1 = RepVggBlock(c, dtype=self.dtype,
                             name=f"bottlenecks_{j}")(y1)
        y2 = ConvNormLayer(hidden, 1, 1, eps=c.batch_norm_eps,
                           dtype=self.dtype, name="conv2")(x)
        y = y1 + y2
        if hidden != c.encoder_hidden_dim:
            y = ConvNormLayer(c.encoder_hidden_dim, 1, 1,
                              eps=c.batch_norm_eps, dtype=self.dtype,
                              name="conv3")(y)
        return y


def _sincos_pos_embed(width, height, embed_dim, temperature):
    """build_2d_sincos_position_embedding (modeling_rt_detr.py:
    1149-1164): ij-indexed meshgrid, [sin w, cos w, sin h, cos h]."""
    grid_w = jnp.arange(width, dtype=jnp.float32)
    grid_h = jnp.arange(height, dtype=jnp.float32)
    gw, gh = jnp.meshgrid(grid_w, grid_h, indexing="ij")
    pos_dim = embed_dim // 4
    omega = jnp.arange(pos_dim, dtype=jnp.float32) / pos_dim
    omega = 1.0 / (temperature ** omega)
    out_w = gw.reshape(-1)[:, None] * omega[None]
    out_h = gh.reshape(-1)[:, None] * omega[None]
    return jnp.concatenate([jnp.sin(out_w), jnp.cos(out_w),
                            jnp.sin(out_h), jnp.cos(out_h)],
                           axis=1)[None]


class HybridEncoder(nn.Module):
    """RTDetrHybridEncoder: AIFI on the chosen level(s) + FPN/PAN."""
    cfg: RTDetrHFConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        c = self.cfg
        feats = list(feats)
        # AIFI: transformer on the flattened level(s)
        for i, lvl in enumerate(c.encode_proj_layers):
            b, h, w, d = feats[lvl].shape
            # NOTE the HF flatten runs over NCHW: (B, C, H*W) -> tokens
            # ordered row-major over (h, w) — NHWC reshape matches
            src = feats[lvl].reshape(b, h * w, d)
            # NOTE: the ij-indexed meshgrid flattens the embedding
            # row-major over (w, h) while tokens are row-major over
            # (h, w) — the HF/original implementations add it UNALIGNED
            # (modeling_rt_detr.py:1152-1164 + 1236); trained weights
            # absorbed this, so exact parity requires keeping it
            pos = _sincos_pos_embed(w, h, c.encoder_hidden_dim,
                                    c.positional_encoding_temperature)
            for j in range(c.encoder_layers):
                src = EncoderLayer(c, dtype=self.dtype,
                                   name=f"encoder_{i}__layers_{j}")(
                    src, pos)
            feats[lvl] = src.reshape(b, h, w, d)
        # top-down FPN
        fpn = [feats[-1]]
        n = len(feats) - 1
        for idx in range(n):
            backbone_fm = feats[n - idx - 1]
            top = ConvNormLayer(c.encoder_hidden_dim, 1, 1,
                                eps=c.batch_norm_eps, dtype=self.dtype,
                                name=f"lateral_convs_{idx}")(fpn[-1])
            fpn[-1] = top
            b, h, w, d = top.shape
            up = jax.image.resize(top, (b, 2 * h, 2 * w, d),
                                  method="nearest")
            fused = jnp.concatenate([up, backbone_fm], axis=-1)
            fpn.append(CSPRepLayer(c, dtype=self.dtype,
                                   name=f"fpn_blocks_{idx}")(fused))
        fpn = fpn[::-1]
        # bottom-up PAN
        pan = [fpn[0]]
        for idx in range(n):
            down = ConvNormLayer(c.encoder_hidden_dim, 3, 2,
                                 eps=c.batch_norm_eps, dtype=self.dtype,
                                 name=f"downsample_convs_{idx}")(
                pan[-1])
            fused = jnp.concatenate([down, fpn[idx + 1]], axis=-1)
            pan.append(CSPRepLayer(c, dtype=self.dtype,
                                   name=f"pan_blocks_{idx}")(fused))
        return pan


def _grid_sample_bilinear(img, grid):
    """torch.nn.functional.grid_sample(mode=bilinear,
    padding_mode=zeros, align_corners=False) for img (H, W, C) and
    grid (..., 2) in [-1, 1] xy order."""
    H, W, C = img.shape
    x = (grid[..., 0] + 1.0) * (W / 2.0) - 0.5
    y = (grid[..., 1] + 1.0) * (H / 2.0) - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def tap(xi, yi):
        inb = ((xi >= 0) & (xi < W) & (yi >= 0) & (yi < H))
        xi_ = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi_ = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        v = img[yi_, xi_]                       # (..., C)
        return jnp.where(inb[..., None], v, 0.0)

    v00 = tap(x0, y0)
    v01 = tap(x0 + 1, y0)
    v10 = tap(x0, y0 + 1)
    v11 = tap(x0 + 1, y0 + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    return (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
            + v10 * (1 - wx) * wy + v11 * wx * wy)


def _deform_backend() -> str:
    """Sampling strategy for MSDeformableAttention.

    ``gather``: per-level vmapped bilinear gather — exact torch
    ``grid_sample`` semantics, fast on CPU, pathological on TPU (XLA
    lowers the batched 2-D gather to ~60 ms/level at B=64; measured
    188.9 ms per attention call, 94% of RT-DETR runtime).
    ``onehot``: separable hat-function one-hot matmuls — bilinear
    sampling as two MXU contractions (sample = OHy @ V weighted by
    OHx), mathematically identical to bilinear with zero padding
    because the hat ``max(0, 1-|p-i|)`` IS the bilinear corner weight
    incl. the out-of-bounds zero rows. Measured 45.6 ms (4.1x).
    ``wgrid``: the same math reassociated — taps folded into one dense
    per-query sampling matrix first, then ONE (Q, h*w) @ (h*w, D) MXU
    matmul per head. On CPU this fuses to ~36% fewer deformable-path
    bytes; the TPU lowering MATERIALIZES the folded (B, Q, H, h*w)
    matrix — TPU-compiled cost analysis 1668.6 vs onehot's 697.8
    MB/img at bs=128, measured +150-225 ms/batch in interleaved
    same-regime pairs (BASELINE.md r5) — so it stays opt-in.
    ``auto`` picks onehot on TPU, gather elsewhere."""
    mode = os.environ.get("TRACKLAB_TPU_DEFORM_BACKEND", "auto")
    if mode == "auto":
        return ("onehot" if jax.default_backend() == "tpu"
                else "gather")
    return mode


class MSDeformableAttention(nn.Module):
    """RTDetrMultiscaleDeformableAttention (modeling_rt_detr.py:51-110,
    664-772): per-head, per-level, per-point bilinear sampling."""
    cfg: RTDetrHFConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden, value_tokens, reference_points,
                 spatial_shapes, pos):
        c = self.cfg
        B, Q, _ = hidden.shape
        H = c.decoder_attention_heads
        L = len(spatial_shapes)
        P = c.decoder_n_points
        D = c.d_model // H
        qin = hidden + pos
        value = nn.Dense(c.d_model, dtype=self.dtype,
                         name="value_proj")(value_tokens)
        S = value.shape[1]
        value = value.reshape(B, S, H, D)
        offsets = nn.Dense(H * L * P * 2, dtype=self.dtype,
                           name="sampling_offsets")(qin)
        offsets = offsets.reshape(B, Q, H, L, P, 2)
        weights = nn.Dense(H * L * P, dtype=self.dtype,
                           name="attention_weights")(qin)
        weights = jax.nn.softmax(
            weights.reshape(B, Q, H, L * P).astype(jnp.float32),
            axis=-1).reshape(B, Q, H, L, P)
        # reference_points: (B, Q, 4) normalized cxcywh
        loc = (reference_points[:, :, None, None, None, :2]
               + offsets.astype(jnp.float32) / P
               * reference_points[:, :, None, None, None, 2:] * 0.5)
        backend = _deform_backend()
        if backend == "onehot":
            out = self._sample_onehot(value, loc, weights,
                                      spatial_shapes)
        elif backend == "wgrid":
            out = self._sample_wgrid(value, loc, weights,
                                     spatial_shapes)
        else:
            out = self._sample_gather(value, loc, weights,
                                      spatial_shapes)
        out = out.reshape(B, Q, H * D).astype(self.dtype)
        return nn.Dense(c.d_model, dtype=self.dtype,
                        name="output_proj")(out)

    def _sample_gather(self, value, loc, weights, spatial_shapes):
        """torch.grid_sample-style vmapped bilinear taps (CPU path)."""
        B, S, H, D = value.shape
        _, Q = loc.shape[:2]
        P = loc.shape[4]
        grids = 2.0 * loc - 1.0               # (B, Q, H, L, P, 2)
        out = jnp.zeros((B, Q, H, D), jnp.float32)
        start = 0
        for lvl, (h, w) in enumerate(spatial_shapes):
            v_l = value[:, start:start + h * w]   # (B, hw, H, D)
            v_maps = v_l.transpose(0, 2, 1, 3).reshape(B * H, h, w, D)
            g = grids[:, :, :, lvl]               # (B, Q, H, P, 2)
            g = g.transpose(0, 2, 1, 3, 4).reshape(B * H, Q, P, 2)
            sampled = jax.vmap(_grid_sample_bilinear)(
                v_maps.astype(jnp.float32), g)    # (B*H, Q, P, D)
            sampled = sampled.reshape(B, H, Q, P, D)
            # weights (B, Q, H, P) -> (B, H, Q, P)
            w_l = weights[:, :, :, lvl].transpose(0, 2, 1, 3)
            out = out + jnp.einsum("bhqpd,bhqp->bqhd", sampled, w_l)
            start += h * w
        return out

    def _sample_onehot(self, value, loc, weights, spatial_shapes):
        """Bilinear sampling as separable one-hot MXU contractions.

        For each tap at continuous (y, x), the bilinear weight of
        integer cell (i, j) with zero padding is
        ``max(0, 1-|y-i|) * max(0, 1-|x-j|)`` — build the two hat
        vectors densely over the level's axes and contract:
        ``t1 = OHy @ V`` (MXU), ``out = sum_x OHx * t1`` (VPU).
        Keeps everything in the compute dtype; the final reduction
        accumulates in f32."""
        B, S, H, D = value.shape
        _, Q = loc.shape[:2]
        P = loc.shape[4]
        cdt = value.dtype
        out = jnp.zeros((B, Q, H, D), jnp.float32)
        start = 0
        for lvl, (h, w) in enumerate(spatial_shapes):
            v_l = value[:, start:start + h * w].reshape(B, h, w, H, D)
            x = loc[:, :, :, lvl, :, 0] * w - 0.5     # (B, Q, H, P)
            y = loc[:, :, :, lvl, :, 1] * h - 0.5
            ys = jnp.arange(h, dtype=jnp.float32)
            xs = jnp.arange(w, dtype=jnp.float32)
            ohy = jnp.maximum(
                0.0, 1.0 - jnp.abs(y[..., None] - ys))    # (B,Q,H,P,h)
            ohx = (jnp.maximum(0.0, 1.0 - jnp.abs(x[..., None] - xs))
                   * weights[:, :, :, lvl][..., None])    # (B,Q,H,P,w)
            t1 = jnp.einsum("bqhpy,byxhd->bqhpxd",
                            ohy.astype(cdt), v_l)
            out = out + jnp.einsum(
                "bqhpxd,bqhpx->bqhd", t1, ohx.astype(cdt),
                preferred_element_type=jnp.float32)
            start += h * w
        return out

    def _sample_wgrid(self, value, loc, weights, spatial_shapes):
        """One-hot sampling with the contraction REASSOCIATED to cut
        HBM traffic: fold the P taps (and attention weights) into one
        dense per-query sampling matrix ``W[q,h,y,x] = sum_p
        hat_y[p,y] * hat_x[p,x] * w[p]`` (tiny P=4 contraction), then
        sample with ONE MXU matmul ``(Q, h*w) @ (h*w, D)`` per
        (batch, head). Same bilinear math as ``onehot`` — the sum over
        taps commutes with the sum over cells — but the materialized
        intermediate shrinks from (Q, H, P, w, D) to (Q, H, h*w)
        (~2.2x fewer bytes at the 80x80 level) and the big einsum's
        FLOPs drop P-fold (no per-tap D-wide products). XLA cost
        analysis + roofline in BASELINE.md."""
        B, S, H, D = value.shape
        _, Q = loc.shape[:2]
        cdt = value.dtype
        out = jnp.zeros((B, Q, H, D), jnp.float32)
        start = 0
        for lvl, (h, w) in enumerate(spatial_shapes):
            v_l = value[:, start:start + h * w]       # (B, hw, H, D)
            x = loc[:, :, :, lvl, :, 0] * w - 0.5     # (B, Q, H, P)
            y = loc[:, :, :, lvl, :, 1] * h - 0.5
            ys = jnp.arange(h, dtype=jnp.float32)
            xs = jnp.arange(w, dtype=jnp.float32)
            ohy = jnp.maximum(
                0.0, 1.0 - jnp.abs(y[..., None] - ys))    # (B,Q,H,P,h)
            ohx = (jnp.maximum(0.0, 1.0 - jnp.abs(x[..., None] - xs))
                   * weights[:, :, :, lvl][..., None])    # (B,Q,H,P,w)
            wgrid = jnp.einsum("bqhpy,bqhpx->bqhyx",
                               ohy.astype(cdt), ohx.astype(cdt))
            out = out + jnp.einsum(
                "bqhs,bshd->bqhd", wgrid.reshape(B, Q, H, h * w), v_l,
                preferred_element_type=jnp.float32)
            start += h * w
        return out


class DecoderLayer(nn.Module):
    cfg: RTDetrHFConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden, pos, memory, reference_points,
                 spatial_shapes):
        c = self.cfg
        y = MultiheadAttention(c.d_model, c.decoder_attention_heads,
                               dtype=self.dtype,
                               name="self_attn")(hidden, pos)
        hidden = nn.LayerNorm(epsilon=c.layer_norm_eps,
                              name="self_attn_layer_norm")(hidden + y)
        y = MSDeformableAttention(c, dtype=self.dtype,
                                  name="encoder_attn")(
            hidden, memory, reference_points, spatial_shapes, pos)
        hidden = nn.LayerNorm(epsilon=c.layer_norm_eps,
                              name="encoder_attn_layer_norm")(
            hidden + y)
        y = nn.relu(nn.Dense(c.decoder_ffn_dim, dtype=self.dtype,
                             name="fc1")(hidden))
        y = nn.Dense(c.d_model, dtype=self.dtype, name="fc2")(y)
        return nn.LayerNorm(epsilon=c.layer_norm_eps,
                            name="final_layer_norm")(hidden + y)


class MLPHead(nn.Module):
    """RTDetrMLPPredictionHead (names: layers_{i})."""
    dims: Sequence[int]     # hidden..., out
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        n = len(self.dims)
        for i, d in enumerate(self.dims):
            x = nn.Dense(d, dtype=self.dtype, name=f"layers_{i}")(x)
            if i < n - 1:
                x = nn.relu(x)
        return x


def _inverse_sigmoid(x, eps=1e-5):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


def _generate_anchors(spatial_shapes, grid_size=0.05):
    """RTDetrModel.generate_anchors (modeling_rt_detr.py:1556-1583)."""
    anchors = []
    for level, (h, w) in enumerate(spatial_shapes):
        gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                              jnp.arange(w, dtype=jnp.float32),
                              indexing="ij")
        grid_xy = jnp.stack([gx, gy], -1) + 0.5
        grid_xy = grid_xy / jnp.asarray([w, h], jnp.float32)
        wh = jnp.ones_like(grid_xy) * grid_size * (2.0 ** level)
        anchors.append(jnp.concatenate([grid_xy, wh],
                                       -1).reshape(h * w, 4))
    anchors = jnp.concatenate(anchors, 0)
    eps = 1e-2
    valid = jnp.all((anchors > eps) & (anchors < 1 - eps), -1,
                    keepdims=True)
    anchors = jnp.log(anchors / (1 - anchors))
    big = jnp.finfo(jnp.float32).max
    return jnp.where(valid, anchors, big), valid


class RTDetrCore(nn.Module):
    """RTDetrModel: backbone + projections + hybrid encoder + two-stage
    query selection + decoder. Heads are applied by the outer module
    (the HF 'hack': decoder.bbox_embed/class_embed point at the outer
    head lists)."""
    cfg: RTDetrHFConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, bbox_heads, class_heads,
                 return_topk: bool = False):
        c = self.cfg
        feats = ResNetDBackbone(c, dtype=self.dtype,
                                name="backbone__model")(images)
        proj = []
        for i, f in enumerate(feats):
            p = nn.Conv(c.encoder_hidden_dim, (1, 1), use_bias=False,
                        dtype=self.dtype,
                        name=f"encoder_input_proj_{i}_0")(f)
            p = nn.BatchNorm(use_running_average=True,
                             epsilon=c.batch_norm_eps,
                             dtype=jnp.float32,
                             name=f"encoder_input_proj_{i}_1")(p)
            proj.append(p.astype(self.dtype))
        pan = HybridEncoder(c, dtype=self.dtype, name="encoder")(proj)
        sources = []
        for i, f in enumerate(pan):
            s = nn.Conv(c.d_model, (1, 1), use_bias=False,
                        dtype=self.dtype,
                        name=f"decoder_input_proj_{i}_0")(f)
            s = nn.BatchNorm(use_running_average=True,
                             epsilon=c.batch_norm_eps,
                             dtype=jnp.float32,
                             name=f"decoder_input_proj_{i}_1")(s)
            sources.append(s.astype(self.dtype))
        spatial_shapes = [(s.shape[1], s.shape[2]) for s in sources]
        B = images.shape[0]
        flat = jnp.concatenate(
            [s.reshape(B, -1, c.d_model) for s in sources], axis=1)

        anchors, valid = _generate_anchors(spatial_shapes,
                                           c.anchor_grid_size)
        memory = flat.astype(jnp.float32) * valid[None].astype(
            jnp.float32)
        out_mem = nn.Dense(c.d_model, dtype=self.dtype,
                           name="enc_output_0")(memory)
        out_mem = nn.LayerNorm(epsilon=c.layer_norm_eps,
                               name="enc_output_1")(out_mem)
        enc_class = nn.Dense(c.num_labels, dtype=self.dtype,
                             name="enc_score_head")(out_mem)
        enc_coord = MLPHead((c.d_model, c.d_model, 4),
                            dtype=self.dtype,
                            name="enc_bbox_head")(out_mem) \
            + anchors[None]
        topk = jax.lax.top_k(jnp.max(enc_class, -1), c.num_queries)[1]
        ref_unact = jnp.take_along_axis(enc_coord, topk[..., None],
                                        axis=1)
        target = jnp.take_along_axis(out_mem, topk[..., None], axis=1)
        if c.learn_initial_query:
            target = jnp.broadcast_to(
                self.param("weight_embedding",
                           nn.initializers.normal(),
                           (c.num_queries, c.d_model))[None],
                (B, c.num_queries, c.d_model))

        # decoder with iterative refinement (query_pos_head is ONE
        # module applied at every layer, modeling_rt_detr.py:1289)
        query_pos_head = MLPHead((2 * c.d_model, c.d_model),
                                 dtype=self.dtype,
                                 name="decoder__query_pos_head")
        reference_points = jax.nn.sigmoid(ref_unact)
        hidden = target
        logits = boxes = None
        for i in range(c.decoder_layers):
            pos = query_pos_head(reference_points)
            hidden = DecoderLayer(c, dtype=self.dtype,
                                  name=f"decoder__layers_{i}")(
                hidden, pos, flat, reference_points, spatial_shapes)
            corners = bbox_heads[i](hidden)
            reference_points = jax.nn.sigmoid(
                corners + _inverse_sigmoid(reference_points))
            logits = class_heads[i](hidden)
            boxes = reference_points
        if return_topk:
            return logits, boxes, topk
        return logits, boxes


class RTDetrHF(nn.Module):
    """RTDetrForObjectDetection, inference path. ``__call__`` returns
    (logits (B, Q, num_labels), boxes (B, Q, 4) normalized cxcywh) from
    the LAST decoder layer (modeling_rt_detr.py:1952-1953)."""
    variant: str = "r50vd"
    num_labels: int = 80
    config: RTDetrHFConfig | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False,
                 return_topk: bool = False):
        cfg = self.config or RTDetrHFConfig(
            num_labels=self.num_labels,
            **RTDETR_HF_VARIANTS[self.variant])
        bbox_heads = [
            MLPHead((cfg.d_model, cfg.d_model, 4), dtype=self.dtype,
                    name=f"bbox_embed_{i}")
            for i in range(cfg.decoder_layers)]
        class_heads = [
            nn.Dense(cfg.num_labels, dtype=self.dtype,
                     name=f"class_embed_{i}")
            for i in range(cfg.decoder_layers)]
        return RTDetrCore(cfg, dtype=self.dtype, name="model")(
            images, bbox_heads, class_heads, return_topk=return_topk)


def postprocess_rtdetr(logits, boxes, img_w, img_h,
                       conf_threshold=0.3, max_out=64):
    """RTDetrImageProcessor.post_process_object_detection semantics:
    sigmoid scores, top-k over the flattened (Q * num_labels) scores,
    cxcywh -> ltrb in pixels. Returns dict of (B, max_out) arrays
    (ltrb, score, cls, valid) matching ops.nms.postprocess_detections'
    contract (RT-DETR is NMS-free)."""
    B, Q, C = logits.shape
    scores = jax.nn.sigmoid(logits.astype(jnp.float32))
    flat = scores.reshape(B, Q * C)
    top_scores, top_idx = jax.lax.top_k(flat, max_out)
    q_idx = top_idx // C
    cls = (top_idx % C).astype(jnp.int32)
    b = jnp.take_along_axis(boxes, q_idx[..., None], axis=1)
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    scale = jnp.asarray([img_w, img_h, img_w, img_h], jnp.float32)
    ltrb = jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                     axis=-1) * scale
    return {"ltrb": ltrb, "score": top_scores, "cls": cls,
            "valid": top_scores >= conf_threshold}
