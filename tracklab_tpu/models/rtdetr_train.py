"""RT-DETR fine-tuning loss: Hungarian set matching + VFL/L1/GIoU.

The reference trains RT-DETR through HF transformers' ``RTDetrLoss``
(the wrapper only runs inference, transformers_api.py:11-54; the loss
semantics live in transformers.models.rt_detr.modeling_rt_detr). This
module implements the core criterion for the framework's generic
detector fine-tune engine (models/detector_train_engine.py):

* Hungarian matcher on cost = 2*class(focal) + 5*L1 + 2*GIoU — the HF
  default weights — solved IN-JIT per image with the repo's lax JV
  (ops/assignment.matching_forced, batched/vmap-safe mode).
* Varifocal class loss (IoU-scaled soft targets), L1 and GIoU box
  losses with the HF weight_dict {vfl: 1, bbox: 5, giou: 2}.
* Final decoder layer only: the auxiliary per-layer and denoising
  losses are training accelerators, not semantics; documented deviation.

Signature matches the engine's ``detection_loss_fn`` contract:
``(outs, gt_boxes (B,G,5 cxcywh_px+cls), gt_valid (B,G), input_hw,
num_classes) -> scalar``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tracklab_tpu.ops.assignment import matching_forced

__all__ = ["rtdetr_detection_loss"]

ALPHA, GAMMA = 0.75, 2.0  # HF RTDetrLoss vfl defaults


def _cxcywh_to_ltrb(b):
    c, s = b[..., :2], b[..., 2:4]
    return jnp.concatenate([c - s / 2, c + s / 2], -1)


def _giou_pairs(a, b):
    """Elementwise GIoU of (…, 4) ltrb box pairs, in [-1, 1]."""
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    inter = jnp.clip(rb - lt, 0).prod(-1)
    area_a = jnp.clip(a[..., 2:] - a[..., :2], 0).prod(-1)
    area_b = jnp.clip(b[..., 2:] - b[..., :2], 0).prod(-1)
    union = area_a + area_b - inter
    iou = inter / jnp.maximum(union, 1e-9)
    clt = jnp.minimum(a[..., :2], b[..., :2])
    crb = jnp.maximum(a[..., 2:], b[..., 2:])
    hull = jnp.clip(crb - clt, 0).prod(-1)
    return iou - (hull - union) / jnp.maximum(hull, 1e-9), iou


def rtdetr_detection_loss(outs, gt_boxes, gt_valid, input_hw,
                          num_classes: int):
    logits, boxes = outs            # (B, Q, C) raw, (B, Q, 4) cxcywh 0-1
    h, w = input_hw
    scale = jnp.asarray([w, h, w, h], jnp.float32)
    gt_cxcywh = gt_boxes[..., :4] / scale          # normalized like preds
    gt_cls = gt_boxes[..., 4].astype(jnp.int32)
    Q = logits.shape[1]

    def per_image(lg, bx, g_box, g_cls, g_val):
        prob = jax.nn.sigmoid(lg)                          # (Q, C)
        p = jnp.clip(prob[:, g_cls], 1e-6, 1 - 1e-6)       # (Q, G)
        # HF RTDetrHungarianMatcher focal class cost
        neg = (1 - 0.25) * p ** 2.0 * (-jnp.log1p(-p))
        pos = 0.25 * (1 - p) ** 2.0 * (-jnp.log(p))
        cost_class = pos - neg
        cost_bbox = jnp.abs(bx[:, None, :] - g_box[None, :, :]).sum(-1)
        giou, _ = _giou_pairs(_cxcywh_to_ltrb(bx)[:, None, :],
                              _cxcywh_to_ltrb(g_box)[None, :, :])
        cost = 2.0 * cost_class + 5.0 * cost_bbox + 2.0 * (-giou)
        q2g = matching_forced(cost, jnp.ones(Q, bool), g_val,
                              batched=True)                # (Q,) or -1
        matched = q2g >= 0
        gi = jnp.clip(q2g, 0)
        m_gbox = g_box[gi]
        m_gcls = g_cls[gi]
        _, iou_m = _giou_pairs(_cxcywh_to_ltrb(bx),
                               _cxcywh_to_ltrb(m_gbox))
        n_boxes = jnp.maximum(g_val.sum(), 1).astype(jnp.float32)

        # varifocal class loss (HF loss_labels_vfl): target = onehot *
        # detached IoU on matched queries, 0 elsewhere
        onehot = jax.nn.one_hot(m_gcls, num_classes) * matched[:, None]
        target = onehot * jax.lax.stop_gradient(iou_m)[:, None]
        weight = ALPHA * prob ** GAMMA * (1 - onehot) + target
        bce = jnp.maximum(lg, 0) - lg * target + jnp.log1p(
            jnp.exp(-jnp.abs(lg)))
        loss_vfl = (bce * weight).mean(1).sum() * Q / n_boxes

        # box losses on matched queries only
        l1 = jnp.abs(bx - m_gbox).sum(-1) * matched
        giou_m, _ = _giou_pairs(_cxcywh_to_ltrb(bx),
                                _cxcywh_to_ltrb(m_gbox))
        loss_bbox = l1.sum() / n_boxes
        loss_giou = ((1 - giou_m) * matched).sum() / n_boxes
        return 1.0 * loss_vfl + 5.0 * loss_bbox + 2.0 * loss_giou

    losses = jax.vmap(per_image)(logits.astype(jnp.float32),
                                 boxes.astype(jnp.float32),
                                 gt_cxcywh.astype(jnp.float32),
                                 gt_cls, gt_valid)
    return losses.mean()
