"""Detector training step (Flax/optax).

A supervised detection objective over the YOLOX head outputs with a
center-prior assigner: anchors whose cell center falls inside a GT box
(and within a center radius) are positives; losses are IoU (box), BCE
(objectness, class). This is the training path the reference delegates to
external libraries (ultralytics/torchreid — SURVEY §3.5); SimOTA dynamic-k
refinement can be layered on later without changing the step signature.

The step is pjit-ready: pure function of (params, opt_state, batch),
batch["images"] sharded over 'dp', params optionally channel-sharded over
'tp' (parallel/mesh.py).
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax import lax

from tracklab_tpu.models.yolox import YOLOX, decode_outputs

__all__ = ["TrainState", "create_train_state", "detection_loss",
           "make_train_step"]


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(model: YOLOX, rng, input_shape,
                       tx: optax.GradientTransformation):
    variables = model.init(rng, jnp.zeros(input_shape, jnp.float32),
                           train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(params, batch_stats, tx.init(params),
                      jnp.zeros((), jnp.int32))


def _pairwise_iou_xywh(a, b):
    """(N,4) xywh x (M,4) xywh -> (N,M) IoU."""
    ax1, ay1 = a[:, 0] - a[:, 2] / 2, a[:, 1] - a[:, 3] / 2
    ax2, ay2 = a[:, 0] + a[:, 2] / 2, a[:, 1] + a[:, 3] / 2
    bx1, by1 = b[:, 0] - b[:, 2] / 2, b[:, 1] - b[:, 3] / 2
    bx2, by2 = b[:, 0] + b[:, 2] / 2, b[:, 1] + b[:, 3] / 2
    xx1 = jnp.maximum(ax1[:, None], bx1[None, :])
    yy1 = jnp.maximum(ay1[:, None], by1[None, :])
    xx2 = jnp.minimum(ax2[:, None], bx2[None, :])
    yy2 = jnp.minimum(ay2[:, None], by2[None, :])
    inter = jnp.maximum(xx2 - xx1, 0) * jnp.maximum(yy2 - yy1, 0)
    ua = (a[:, 2] * a[:, 3])[:, None] + (b[:, 2] * b[:, 3])[None, :] - inter
    return inter / jnp.maximum(ua, 1e-9)


def _anchor_centers(input_hw, strides=(8, 16, 32)):
    centers, stride_arr = [], []
    H, W = input_hw
    for s in strides:
        h, w = H // s, W // s
        gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        c = jnp.stack([(gx + 0.5) * s, (gy + 0.5) * s], -1).reshape(-1, 2)
        centers.append(c)
        stride_arr.append(jnp.full(h * w, s, jnp.float32))
    return jnp.concatenate(centers), jnp.concatenate(stride_arr)


def _simota_assign(pos_mat, iou, cls_logit, obj_logit, tgt_cls_ids,
                   valid, num_classes, topk_ious: int = 10):
    """SimOTA dynamic-k assignment (the YOLOX assigner, vectorized).

    pos_mat: (A, G) center-prior candidates; iou: (A, G) pred-GT IoU.
    Returns refined (A, G) positive matrix: per GT, the dynamic-k
    lowest-cost candidate anchors; anchor conflicts resolve to min cost.
    """
    A, G = pos_mat.shape
    # per-pair cost: cls BCE (one-hot target) + 3 * (-log iou) + prior
    probs = jax.nn.sigmoid(cls_logit) * jax.nn.sigmoid(
        obj_logit)[:, None]                                 # (A, C)
    onehot = jax.nn.one_hot(tgt_cls_ids, num_classes)        # (G, C)
    p = jnp.clip(probs[:, None, :], 1e-6, 1 - 1e-6)          # (A, 1, C)
    cls_cost = -jnp.sum(
        onehot[None] * jnp.log(p) + (1 - onehot[None]) * jnp.log(1 - p),
        axis=-1)                                             # (A, G)
    iou_cost = -jnp.log(jnp.clip(iou, 1e-8, 1.0))
    cost = cls_cost + 3.0 * iou_cost + 1e5 * (~pos_mat)
    # dynamic k per GT: sum of top-10 candidate IoUs, >= 1
    iou_cand = jnp.where(pos_mat, iou, 0.0)
    topv = lax.top_k(iou_cand.T, min(topk_ious, A))[0]        # (G, k)
    dyn_k = jnp.clip(jnp.sum(topv, axis=1).astype(jnp.int32), 1,
                     min(topk_ious, A))
    # per GT take the dyn_k lowest-cost anchors: rank anchors per column
    order = jnp.argsort(cost, axis=0)                         # (A, G)
    rank = jnp.argsort(order, axis=0)                         # rank of a
    chosen = (rank < dyn_k[None, :]) & pos_mat & valid[None, :]
    # conflicts: anchor claimed by several GTs -> keep min-cost GT
    multi = jnp.sum(chosen, axis=1) > 1
    best_g = jnp.argmin(jnp.where(chosen, cost, jnp.inf), axis=1)
    keep = jax.nn.one_hot(best_g, G, dtype=bool) & chosen
    return jnp.where(multi[:, None], keep, chosen)


def detection_loss(outputs, gt_boxes, gt_valid, input_hw,
                   num_classes: int, center_radius: float = 2.5,
                   simota: bool = True):
    """outputs: per-level raw maps; gt_boxes: (B, G, 5) [xywh, cls];
    gt_valid: (B, G) bool. With ``simota`` the center-prior candidates
    are refined by the dynamic-k SimOTA assigner (the YOLOX strategy);
    otherwise the plain center prior assigns directly."""
    decoded = decode_outputs(outputs, apply_sigmoid=False)  # (B, A, 5+C)
    centers, strides = _anchor_centers(input_hw)            # (A, 2), (A,)

    def per_image(dec, boxes, valid):
        pred_xywh = dec[:, :4]
        obj_logit = dec[:, 4]
        cls_logit = dec[:, 5:]
        # center-prior positive assignment
        gx, gy = boxes[:, 0], boxes[:, 1]
        gw, gh = boxes[:, 2], boxes[:, 3]
        in_box = ((centers[:, 0][:, None] > (gx - gw / 2)[None])
                  & (centers[:, 0][:, None] < (gx + gw / 2)[None])
                  & (centers[:, 1][:, None] > (gy - gh / 2)[None])
                  & (centers[:, 1][:, None] < (gy + gh / 2)[None]))
        r = center_radius * strides[:, None]
        in_center = ((jnp.abs(centers[:, 0][:, None] - gx[None]) < r)
                     & (jnp.abs(centers[:, 1][:, None] - gy[None]) < r))
        pos_mat = in_box & in_center & valid[None, :]        # (A, G)
        iou = _pairwise_iou_xywh(pred_xywh, boxes[:, :4])
        if simota:
            pos_mat = _simota_assign(
                pos_mat, iou, cls_logit, obj_logit,
                boxes[:, 4].astype(jnp.int32), valid, num_classes)
        # each anchor -> best-IoU GT among its candidates
        iou_masked = jnp.where(pos_mat, iou, -1.0)
        best_gt = jnp.argmax(iou_masked, axis=1)
        is_pos = jnp.any(pos_mat, axis=1)
        tgt_box = boxes[best_gt, :4]
        tgt_cls = boxes[best_gt, 4].astype(jnp.int32)

        obj_tgt = is_pos.astype(jnp.float32)
        obj_loss = optax.sigmoid_binary_cross_entropy(
            obj_logit, obj_tgt).mean()
        # IoU loss on positives
        iou_pos = jax.vmap(
            lambda p, t: _pairwise_iou_xywh(p[None], t[None])[0, 0]
        )(pred_xywh, tgt_box)
        box_loss = jnp.sum(jnp.where(is_pos, 1.0 - iou_pos, 0.0)) \
            / jnp.maximum(jnp.sum(obj_tgt), 1.0)
        cls_tgt = jax.nn.one_hot(tgt_cls, num_classes)
        cls_bce = optax.sigmoid_binary_cross_entropy(
            cls_logit, cls_tgt).sum(-1)
        cls_loss = jnp.sum(jnp.where(is_pos, cls_bce, 0.0)) \
            / jnp.maximum(jnp.sum(obj_tgt), 1.0)
        return obj_loss + 5.0 * box_loss + cls_loss

    return jnp.mean(jax.vmap(per_image)(
        decoded, gt_boxes, gt_valid))


def make_train_step(model: YOLOX, tx: optax.GradientTransformation,
                    input_hw):
    """Returns a pure (state, batch) -> (state, loss) step, jit/pjit-able."""

    def loss_fn(params, batch_stats, batch):
        outputs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["images"], train=True, mutable=["batch_stats"])
        loss = detection_loss(outputs, batch["gt_boxes"],
                              batch["gt_valid"], input_hw,
                              model.num_classes)
        return loss, mutated["batch_stats"]

    def train_step(state: TrainState, batch):
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_stats, new_opt,
                          state.step + 1), loss

    return train_step
