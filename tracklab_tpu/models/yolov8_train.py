"""YOLOv8/YOLO11 fine-tuning loss: TAL assignment + CIoU + DFL.

The reference trains this family through the external ultralytics
engine (tracklab/wrappers/bbox_detector/yolo_ultralytics_api.py has no
train() — training happens out-of-band); this makes ``module.train()``
real for the DEFAULT detector family the reference ships
(yolo_ultralytics.yaml -> yolo11m.pt). Faithful to ultralytics
v8DetectionLoss (ultralytics/utils/loss.py): task-aligned assignment
(topk=10, alpha=0.5, beta=6.0, conflict -> highest overlap),
CIoU box loss + distribution-focal loss on the reg_max bins, BCE class
loss with soft normalized-alignment targets, gains box 7.5 / cls 0.5 /
dfl 1.5. Everything is fixed-shape (A anchors x G gt slots) and jits.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

__all__ = ["v8_detection_loss", "tal_assign"]


def _anchor_points(input_hw, strides=(8, 16, 32)):
    """Cell centers in pixels + per-anchor stride, flattened in the same
    level order as the head outputs."""
    pts, st = [], []
    H, W = input_hw
    for s in strides:
        h, w = H // s, W // s
        gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        pts.append(jnp.stack([(gx + 0.5) * s, (gy + 0.5) * s],
                             -1).reshape(-1, 2))
        st.append(jnp.full(h * w, s, jnp.float32))
    return jnp.concatenate(pts), jnp.concatenate(st)


def _ciou_xyxy(a, b, eps=1e-7):
    """(..., 4) xyxy pairwise-aligned CIoU (ultralytics bbox_iou
    CIoU=True)."""
    ax1, ay1, ax2, ay2 = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx1, by1, bx2, by2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    inter = (jnp.clip(jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1),
                      0, None)
             * jnp.clip(jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1),
                        0, None))
    aw, ah = ax2 - ax1, ay2 - ay1
    bw, bh = bx2 - bx1, by2 - by1
    union = aw * ah + bw * bh - inter + eps
    iou = inter / union
    cw = jnp.maximum(ax2, bx2) - jnp.minimum(ax1, bx1)
    chh = jnp.maximum(ay2, by2) - jnp.minimum(ay1, by1)
    c2 = cw ** 2 + chh ** 2 + eps
    rho2 = (((bx1 + bx2) - (ax1 + ax2)) ** 2
            + ((by1 + by2) - (ay1 + ay2)) ** 2) / 4.0
    v = (4 / jnp.pi ** 2) * (jnp.arctan(bw / jnp.maximum(bh, eps))
                             - jnp.arctan(aw / jnp.maximum(ah, eps))) ** 2
    alpha = v / jnp.maximum(v - iou + (1 + eps), eps)
    alpha = jax.lax.stop_gradient(alpha)
    return iou - (rho2 / c2 + v * alpha)


def tal_assign(pred_scores, pred_xyxy, anchors, gt_xyxy, gt_cls,
               gt_valid, topk: int = 10, alpha: float = 0.5,
               beta: float = 6.0, eps: float = 1e-9):
    """Task-aligned assignment (ultralytics TaskAlignedAssigner).

    pred_scores (A, C) sigmoid probs, pred_xyxy (A, 4), anchors (A, 2),
    gt_xyxy (G, 4), gt_cls (G,) int, gt_valid (G,) bool.
    Returns (assigned_gt (A,), fg_mask (A,), norm_align (A,)) where
    norm_align is the soft class-target weight of each positive.
    """
    A, G = pred_scores.shape[0], gt_xyxy.shape[0]
    # candidates: anchor center strictly inside the gt box
    d_l = anchors[:, 0][:, None] - gt_xyxy[None, :, 0]
    d_t = anchors[:, 1][:, None] - gt_xyxy[None, :, 1]
    d_r = gt_xyxy[None, :, 2] - anchors[:, 0][:, None]
    d_b = gt_xyxy[None, :, 3] - anchors[:, 1][:, None]
    in_gts = (jnp.minimum(jnp.minimum(d_l, d_t),
                          jnp.minimum(d_r, d_b)) > eps)      # (A, G)
    overlaps = jnp.clip(
        _ciou_xyxy(pred_xyxy[:, None, :], gt_xyxy[None, :, :]),
        0.0, None)                                           # (A, G)
    cls_score = jnp.take_along_axis(
        pred_scores, jnp.broadcast_to(
            jnp.clip(gt_cls, 0, pred_scores.shape[1] - 1)[None, :],
            (A, G)), axis=1)                                 # (A, G)
    align = (cls_score ** alpha) * (overlaps ** beta)
    cand = in_gts & gt_valid[None, :]
    align_c = jnp.where(cand, align, 0.0)
    # top-k per gt among candidates
    k = min(topk, A)
    topv, _ = jax.lax.top_k(align_c.T, k)                    # (G, k)
    kth = topv[:, k - 1]                                     # (G,)
    mask_topk = align_c >= jnp.maximum(kth, eps)[None, :]
    mask_pos = mask_topk & cand
    # conflicts: anchor in several gts -> the highest-overlap gt
    n_match = jnp.sum(mask_pos, axis=1)
    best_g_overlap = jnp.argmax(jnp.where(mask_pos, overlaps, -1.0),
                                axis=1)
    keep = jax.nn.one_hot(best_g_overlap, G, dtype=bool) & mask_pos
    mask_pos = jnp.where((n_match > 1)[:, None], keep, mask_pos)
    fg = jnp.any(mask_pos, axis=1)
    assigned = jnp.argmax(mask_pos, axis=1)                  # (A,)
    # normalized alignment: per gt, align * max_overlap / max_align
    pos_align = jnp.where(mask_pos, align, 0.0)
    pos_overlap = jnp.where(mask_pos, overlaps, 0.0)
    g_max_align = jnp.max(pos_align, axis=0)                 # (G,)
    g_max_ov = jnp.max(pos_overlap, axis=0)
    norm = pos_align * (g_max_ov / jnp.maximum(g_max_align,
                                               eps))[None, :]
    norm_align = jnp.max(norm, axis=1)                       # (A,)
    return assigned, fg, norm_align


def v8_detection_loss(outputs, gt_boxes, gt_valid, input_hw,
                      num_classes: int, reg_max: int = 16,
                      strides=(8, 16, 32), w_box: float = 7.5,
                      w_cls: float = 0.5, w_dfl: float = 1.5):
    """outputs: per-level raw (B, H, W, 4*reg_max + C) maps (the
    module __call__); gt_boxes (B, G, 5) [cx, cy, w, h, cls] in input
    pixels; gt_valid (B, G) bool. Same call surface as
    models/train.py:detection_loss so detector_train_engine drives both
    families."""
    anchors, stride_arr = _anchor_points(input_hw, strides)
    flat = []
    for out in outputs:
        b, h, w, ch = out.shape
        flat.append(out.astype(jnp.float32).reshape(b, h * w, ch))
    raw = jnp.concatenate(flat, axis=1)                      # (B, A, ·)
    proj = jnp.arange(reg_max, dtype=jnp.float32)

    def per_image(o, boxes, valid):
        A = o.shape[0]
        reg = o[:, : 4 * reg_max].reshape(A, 4, reg_max)
        dist = jnp.sum(jax.nn.softmax(reg, -1) * proj, -1)   # (A, 4)
        px1 = anchors[:, 0] - dist[:, 0] * stride_arr
        py1 = anchors[:, 1] - dist[:, 1] * stride_arr
        px2 = anchors[:, 0] + dist[:, 2] * stride_arr
        py2 = anchors[:, 1] + dist[:, 3] * stride_arr
        pred_xyxy = jnp.stack([px1, py1, px2, py2], -1)
        cls_logit = o[:, 4 * reg_max:]
        pred_scores = jax.nn.sigmoid(cls_logit)

        gt_xyxy = jnp.stack([boxes[:, 0] - boxes[:, 2] / 2,
                             boxes[:, 1] - boxes[:, 3] / 2,
                             boxes[:, 0] + boxes[:, 2] / 2,
                             boxes[:, 1] + boxes[:, 3] / 2], -1)
        gt_cls = boxes[:, 4].astype(jnp.int32)
        assigned, fg, norm_align = tal_assign(
            jax.lax.stop_gradient(pred_scores),
            jax.lax.stop_gradient(pred_xyxy),
            anchors, gt_xyxy, gt_cls, valid)

        t_xyxy = gt_xyxy[assigned]                           # (A, 4)
        t_cls = gt_cls[assigned]
        weight = jnp.where(fg, norm_align, 0.0)
        tsum = jnp.maximum(jnp.sum(weight), 1.0)

        # cls: BCE with the soft aligned targets over all anchors
        cls_tgt = jax.nn.one_hot(t_cls, num_classes) \
            * weight[:, None]
        cls_loss = jnp.sum(optax.sigmoid_binary_cross_entropy(
            cls_logit, cls_tgt)) / tsum

        # box: weighted (1 - CIoU) on positives
        ciou = _ciou_xyxy(pred_xyxy, t_xyxy)
        box_loss = jnp.sum(weight * (1.0 - ciou)) / tsum

        # dfl: adjacent-bin cross entropy on the stride-unit distances
        td = jnp.stack([(anchors[:, 0] - t_xyxy[:, 0]),
                        (anchors[:, 1] - t_xyxy[:, 1]),
                        (t_xyxy[:, 2] - anchors[:, 0]),
                        (t_xyxy[:, 3] - anchors[:, 1])], -1) \
            / stride_arr[:, None]
        td = jnp.clip(td, 0.0, reg_max - 1 - 0.01)           # (A, 4)
        tl = jnp.floor(td)
        wr = td - tl
        wl = 1.0 - wr
        logp = jax.nn.log_softmax(reg, -1)                   # (A, 4, R)
        tl_i = tl.astype(jnp.int32)
        lp_l = jnp.take_along_axis(logp, tl_i[..., None],
                                   -1)[..., 0]
        lp_r = jnp.take_along_axis(logp, (tl_i + 1)[..., None],
                                   -1)[..., 0]
        dfl = -(wl * lp_l + wr * lp_r)                       # (A, 4)
        dfl_loss = jnp.sum(weight[:, None] * dfl) / (4.0 * tsum)

        return w_box * box_loss + w_cls * cls_loss + w_dfl * dfl_loss

    return jnp.mean(jax.vmap(per_image)(raw, gt_boxes, gt_valid))
