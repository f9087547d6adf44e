"""Non-maximum suppression on device (pure JAX, static shapes).

Replaces the host-side torchvision/ONNX NMS in the reference's detector
wrappers (SURVEY §2.6): score-sorted greedy suppression over a fixed
top-K candidate set, fully vectorized except the K-step greedy loop
(K<=256, cheap VPU work), so detection output never leaves the device
before the tracker consumes it.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from tracklab_tpu.ops.boxes import pairwise_iou, xywh_to_ltrb

__all__ = ["nms", "batched_nms", "postprocess_detections"]


def nms(ltrb, scores, iou_threshold: float = 0.65, max_out: int = 128):
    """Greedy NMS. Inputs (N, 4), (N,); returns keep mask (N,) bool.

    Invalid candidates should carry score <= 0.
    """
    n = scores.shape[0]
    order = jnp.argsort(-scores)
    boxes_sorted = ltrb[order]
    scores_sorted = scores[order]
    iou = pairwise_iou(boxes_sorted, boxes_sorted)

    def body(i, keep):
        # suppress i if a kept higher-scoring (earlier) box overlaps it
        earlier_kept = jnp.where(jnp.arange(n) < i, keep, False)
        sup = jnp.any(earlier_kept & (iou[i] > iou_threshold))
        ok = (scores_sorted[i] > 0) & (~sup)
        return keep.at[i].set(ok)

    keep_sorted = lax.fori_loop(0, n, body, jnp.zeros(n, bool))
    # cap to max_out highest-scoring kept boxes
    kept_rank = jnp.cumsum(keep_sorted.astype(jnp.int32)) - 1
    keep_sorted = keep_sorted & (kept_rank < max_out)
    keep = jnp.zeros(n, bool).at[order].set(keep_sorted)
    return keep


def batched_nms(ltrb, scores, class_ids, iou_threshold: float = 0.65,
                max_out: int = 128, class_agnostic: bool = False):
    """Per-class NMS via the coordinate-offset trick."""
    if class_agnostic:
        return nms(ltrb, scores, iou_threshold, max_out)
    span = jnp.max(ltrb) - jnp.min(ltrb) + 1.0
    offset = class_ids.astype(ltrb.dtype)[:, None] * span
    return nms(ltrb + offset, scores, iou_threshold, max_out)


@partial(jax.jit, static_argnames=("conf_threshold", "iou_threshold",
                                   "max_out", "class_agnostic"))
def postprocess_detections(decoded, conf_threshold: float = 0.01,
                           iou_threshold: float = 0.65, max_out: int = 128,
                           class_agnostic: bool = True):
    """YOLOX-style decode -> detections, batched over images.

    decoded: (B, A, 5+C) [xywh, obj, cls...] from models.yolox.decode_outputs.
    Returns dict with (B, max_out) arrays: ltrb, score, cls, valid —
    fixed-shape output ready for the tracker's Detections pytree.
    """
    def one(img):
        xywh = img[:, :4]
        obj = img[:, 4]
        cls_scores = img[:, 5:]
        cls_id = jnp.argmax(cls_scores, axis=-1)
        score = obj * jnp.max(cls_scores, axis=-1)
        ltrb = xywh_to_ltrb(xywh)
        # pre-select top candidates to bound NMS cost
        k = min(4 * max_out, score.shape[0])
        top_score, top_idx = lax.top_k(
            jnp.where(score >= conf_threshold, score, 0.0), k)
        top_ltrb = ltrb[top_idx]
        top_cls = cls_id[top_idx]
        keep = batched_nms(top_ltrb, top_score, top_cls, iou_threshold,
                           max_out, class_agnostic)
        # compact kept rows to the front, fixed size max_out
        rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
        tgt = jnp.where(keep, rank, max_out)
        out_ltrb = jnp.zeros((max_out + 1, 4), ltrb.dtype)
        out_score = jnp.zeros(max_out + 1, score.dtype)
        out_cls = jnp.zeros(max_out + 1, jnp.int32)
        out_valid = jnp.zeros(max_out + 1, bool)
        out_ltrb = out_ltrb.at[tgt].set(top_ltrb)[:max_out]
        out_score = out_score.at[tgt].set(top_score)[:max_out]
        out_cls = out_cls.at[tgt].set(top_cls.astype(jnp.int32))[:max_out]
        out_valid = out_valid.at[tgt].set(keep)[:max_out]
        return dict(ltrb=out_ltrb, score=out_score, cls=out_cls,
                    valid=out_valid)

    return jax.vmap(one)(decoded)
