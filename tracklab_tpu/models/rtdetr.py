"""RT-DETR-style query-based detector in Flax.

Covers the reference's RTDetr wrapper role
(tracklab/wrappers/bbox_detector/transformers_api.py:11-54, HF RT-DETR):
CSP backbone, single-scale transformer encoder over /32 features (AIFI),
multi-scale memory, and a query decoder emitting NMS-free box/class
predictions. Training uses a Hungarian-matched set loss solved ON DEVICE
by the same JV kernel as the trackers (ops/assignment.matching_forced) —
a set-prediction loss with zero host round-trips.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from tracklab_tpu.models.yolox import CSPDarknet, YOLOX_VARIANTS

__all__ = ["RTDETR", "rtdetr_loss"]


class EncoderLayer(nn.Module):
    dim: int
    heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype)(x, x)
        x = nn.LayerNorm(dtype=jnp.float32)(x + y)
        y = nn.Dense(self.dim * 4, dtype=self.dtype)(x)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, dtype=self.dtype)(y)
        return nn.LayerNorm(dtype=jnp.float32)(x + y)


class DecoderLayer(nn.Module):
    dim: int
    heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, memory):
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype)(q, q)
        q = nn.LayerNorm(dtype=jnp.float32)(q + y)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype)(q, memory)
        q = nn.LayerNorm(dtype=jnp.float32)(q + y)
        y = nn.Dense(self.dim * 4, dtype=self.dtype)(q)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, dtype=self.dtype)(y)
        return nn.LayerNorm(dtype=jnp.float32)(q + y)


class RTDETR(nn.Module):
    num_classes: int = 80
    num_queries: int = 100
    dim: int = 256
    dec_layers: int = 3
    variant: str = "s"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False):
        v = YOLOX_VARIANTS[self.variant]
        c3, c4, c5 = CSPDarknet(v["depth_mult"], v["width_mult"],
                                v["depthwise"],
                                dtype=self.dtype)(images, train)
        B = images.shape[0]

        # AIFI: encoder over the /32 level
        def tokens(f):
            b, h, w, c = f.shape
            t = nn.Dense(self.dim, dtype=self.dtype)(f)
            return t.reshape(b, h * w, self.dim)

        t5 = tokens(c5)
        pos = self.param("pos5", nn.initializers.normal(0.02),
                         (1, t5.shape[1], self.dim))
        t5 = EncoderLayer(self.dim, dtype=self.dtype)(t5 + pos)
        memory = jnp.concatenate([tokens(c3), tokens(c4), t5], axis=1)

        queries = self.param("queries", nn.initializers.normal(0.02),
                             (1, self.num_queries, self.dim))
        q = jnp.broadcast_to(queries, (B,) + queries.shape[1:])
        for _ in range(self.dec_layers):
            q = DecoderLayer(self.dim, dtype=self.dtype)(q, memory)

        cls_logits = nn.Dense(self.num_classes, dtype=self.dtype)(q)
        box = nn.Dense(4, dtype=self.dtype)(q)
        boxes = jax.nn.sigmoid(box.astype(jnp.float32))  # cxcywh in [0,1]
        return cls_logits.astype(jnp.float32), boxes

    def predict(self, images, train: bool = False):
        """-> (B, Q, 4) xywh in pixels, (B, Q) scores, (B, Q) classes —
        NMS-free."""
        cls_logits, boxes = self(images, train=train)
        H, W = images.shape[1], images.shape[2]
        scale = jnp.array([W, H, W, H], jnp.float32)
        xywh = boxes * scale
        probs = jax.nn.sigmoid(cls_logits)
        scores = jnp.max(probs, axis=-1)
        classes = jnp.argmax(probs, axis=-1)
        return xywh, scores, classes


def rtdetr_loss(cls_logits, boxes, gt_boxes_norm, gt_cls, gt_valid,
                num_classes, cls_weight=1.0, l1_weight=5.0):
    """Hungarian-matched set loss, solved on device.

    cls_logits (B, Q, C); boxes (B, Q, 4) normalized cxcywh;
    gt_boxes_norm (B, G, 4); gt_cls (B, G) int; gt_valid (B, G)."""
    from tracklab_tpu.ops.assignment import (
        matching_forced, _solve_square_lax,
    )

    def per_image(logits, pb, gb, gc, gv):
        Q = pb.shape[0]
        probs = jax.nn.sigmoid(logits)
        p_cls = probs[:, gc].T                      # (G, Q) target-class p
        l1 = jnp.sum(jnp.abs(gb[:, None, :] - pb[None, :, :]), axis=-1)
        cost = l1_weight * l1 - cls_weight * p_cls  # (G, Q)
        # matcher is not differentiated (integer output) and runs under
        # vmap+grad: use the pure-lax solver to stay transform-friendly
        g2q = matching_forced(
            jax.lax.stop_gradient(cost), gv, jnp.ones(Q, bool),
            solver=_solve_square_lax)               # (G,) -> query
        matched = g2q >= 0
        safe = jnp.where(matched, g2q, 0)
        # box L1 on matched pairs
        box_loss = jnp.sum(jnp.where(
            matched,
            jnp.sum(jnp.abs(gb - pb[safe]), axis=-1), 0.0)) \
            / jnp.maximum(matched.sum(), 1)
        # classification: matched queries get their GT class, the rest
        # background (all-zero targets under sigmoid BCE)
        target = jnp.zeros((Q, num_classes))
        target = target.at[safe].set(
            jnp.where(matched[:, None],
                      jax.nn.one_hot(gc, num_classes), 0.0))
        import optax
        cls_loss = optax.sigmoid_binary_cross_entropy(
            logits, target).mean()
        return cls_weight * cls_loss + l1_weight * box_loss

    return jnp.mean(jax.vmap(per_image)(
        cls_logits, boxes, gt_boxes_norm, gt_cls, gt_valid))
