"""Pairwise box-geometry kernels (JAX, TPU-native).

Device-side counterparts of the reference association cost zoo
(reference: plugins/track/oc_sort/association.py:5-171 — iou_batch,
giou_batch, diou_batch, ciou_batch, ct_dist) and of the box format
conversions scattered through the reference trackers
(plugins/track/oc_sort/ocsort.py:21-46 convert_bbox_to_z/convert_x_to_bbox,
plugins/track/byte_track/byte_tracker.py:96-145 tlwh/tlbr/xyah).

All functions are shape-polymorphic pure JAX: they jit, vmap over a video
batch axis, and run inside ``lax.scan`` bodies. Ragged detection/track sets
are handled with *fixed-capacity padded arrays plus boolean masks* — never
dynamic shapes — so XLA compiles one program per capacity.

Conventions:
  - ``ltrb``: [x1, y1, x2, y2]  (a.k.a. xyxy / tlbr)
  - ``ltwh``: [left, top, w, h] (a.k.a. tlwh)
  - ``xywh``: [center-x, center-y, w, h]
  - ``xyah``: [center-x, center-y, aspect=w/h, h]  (DeepSORT KF measurement)
  - ``xysr``: [center-x, center-y, scale=area, ratio=w/h] (OC-SORT KF measurement)

Pairwise functions return an (N, M) matrix for boxes1 (N,4) x boxes2 (M,4).
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "ltwh_to_ltrb", "ltrb_to_ltwh", "ltrb_to_xywh", "xywh_to_ltrb",
    "ltwh_to_xyah", "xyah_to_ltwh", "ltrb_to_xysr", "xysr_to_ltrb",
    "iou_matrix", "giou_matrix", "diou_matrix", "ciou_matrix",
    "ct_dist_matrix", "pairwise_iou",
]


# ---------------------------------------------------------------------------
# Format conversions (operate on [..., 4] arrays)
# ---------------------------------------------------------------------------

def ltwh_to_ltrb(b):
    l, t, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([l, t, l + w, t + h], axis=-1)


def ltrb_to_ltwh(b):
    x1, y1, x2, y2 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([x1, y1, x2 - x1, y2 - y1], axis=-1)


def ltrb_to_xywh(b):
    x1, y1, x2, y2 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [(x1 + x2) * 0.5, (y1 + y2) * 0.5, x2 - x1, y2 - y1], axis=-1
    )


def xywh_to_ltrb(b):
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    hw, hh = w * 0.5, h * 0.5
    return jnp.concatenate([cx - hw, cy - hh, cx + hw, cy + hh], axis=-1)


def ltwh_to_xyah(b):
    """DeepSORT measurement space: center-x, center-y, w/h, h.

    Mirrors byte_tracker.py:119-128 (tlwh_to_xyah).
    """
    l, t, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([l + w * 0.5, t + h * 0.5, w / h, h], axis=-1)


def xyah_to_ltwh(b):
    cx, cy, a, h = jnp.split(b, 4, axis=-1)
    w = a * h
    return jnp.concatenate([cx - w * 0.5, cy - h * 0.5, w, h], axis=-1)


def ltrb_to_xysr(b, eps: float = 1e-6):
    """OC-SORT measurement space: center-x, center-y, area, w/h.

    Mirrors ocsort.py:21-33 (convert_bbox_to_z), including the h+eps guard.
    """
    x1, y1, x2, y2 = jnp.split(b, 4, axis=-1)
    w = x2 - x1
    h = y2 - y1
    return jnp.concatenate(
        [x1 + w * 0.5, y1 + h * 0.5, w * h, w / (h + eps)], axis=-1
    )


def xysr_to_ltrb(z):
    """Inverse of :func:`ltrb_to_xysr`; mirrors ocsort.py:36-46.

    Negative areas produce NaN (sqrt of negative), matching the reference,
    where NaN predictions mark a track for deletion (ocsort.py:240-244).
    """
    x, y, s, r = jnp.split(z, 4, axis=-1)
    w = jnp.sqrt(s * r)
    h = s / w
    hw, hh = w * 0.5, h * 0.5
    return jnp.concatenate([x - hw, y - hh, x + hw, y + hh], axis=-1)


# ---------------------------------------------------------------------------
# Pairwise similarity / cost matrices over ltrb boxes
# ---------------------------------------------------------------------------

def _pairwise_parts(b1, b2):
    """Common intersection/union pieces for (N,4) x (M,4) -> (N,M) terms."""
    b1 = b1[:, None, :]   # (N,1,4)
    b2 = b2[None, :, :]   # (1,M,4)
    xx1 = jnp.maximum(b1[..., 0], b2[..., 0])
    yy1 = jnp.maximum(b1[..., 1], b2[..., 1])
    xx2 = jnp.minimum(b1[..., 2], b2[..., 2])
    yy2 = jnp.minimum(b1[..., 3], b2[..., 3])
    inter = jnp.maximum(0.0, xx2 - xx1) * jnp.maximum(0.0, yy2 - yy1)
    area1 = (b1[..., 2] - b1[..., 0]) * (b1[..., 3] - b1[..., 1])
    area2 = (b2[..., 2] - b2[..., 0]) * (b2[..., 3] - b2[..., 1])
    union = area1 + area2 - inter
    return b1, b2, inter, union


def iou_matrix(b1, b2):
    """Pairwise IoU, (N,4)x(M,4) ltrb -> (N,M). Mirrors association.py:5-21.

    Like the reference, union==0 (two degenerate boxes) yields inf/NaN rather
    than being special-cased; callers mask invalid slots.
    """
    _, _, inter, union = _pairwise_parts(b1, b2)
    return inter / union


def pairwise_iou(b1, b2):
    """IoU with a zero-union guard — the safe variant for eval/NMS use."""
    _, _, inter, union = _pairwise_parts(b1, b2)
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def _enclosing(b1, b2):
    xxc1 = jnp.minimum(b1[..., 0], b2[..., 0])
    yyc1 = jnp.minimum(b1[..., 1], b2[..., 1])
    xxc2 = jnp.maximum(b1[..., 2], b2[..., 2])
    yyc2 = jnp.maximum(b1[..., 3], b2[..., 3])
    return xxc1, yyc1, xxc2, yyc2


def _center_dists(b1, b2):
    cx1 = (b1[..., 0] + b1[..., 2]) * 0.5
    cy1 = (b1[..., 1] + b1[..., 3]) * 0.5
    cx2 = (b2[..., 0] + b2[..., 2]) * 0.5
    cy2 = (b2[..., 1] + b2[..., 3]) * 0.5
    return (cx1 - cx2) ** 2 + (cy1 - cy2) ** 2


def giou_matrix(b1, b2):
    """Pairwise GIoU rescaled to (0,1); mirrors association.py:24-55."""
    e1, e2, inter, union = _pairwise_parts(b1, b2)
    iou = inter / union
    xxc1, yyc1, xxc2, yyc2 = _enclosing(e1, e2)
    area_c = (xxc2 - xxc1) * (yyc2 - yyc1)
    giou = iou - (area_c - inter) / area_c
    return (giou + 1.0) * 0.5


def diou_matrix(b1, b2):
    """Pairwise DIoU rescaled to (0,1); mirrors association.py:58-95."""
    e1, e2, inter, union = _pairwise_parts(b1, b2)
    iou = inter / union
    inner = _center_dists(e1, e2)
    xxc1, yyc1, xxc2, yyc2 = _enclosing(e1, e2)
    outer = (xxc2 - xxc1) ** 2 + (yyc2 - yyc1) ** 2
    return (iou - inner / outer + 1.0) * 0.5


def ciou_matrix(b1, b2):
    """Pairwise CIoU rescaled to (0,1); mirrors association.py:97-147
    including the reference's +1px h shift before the arctan term."""
    e1, e2, inter, union = _pairwise_parts(b1, b2)
    iou = inter / union
    inner = _center_dists(e1, e2)
    xxc1, yyc1, xxc2, yyc2 = _enclosing(e1, e2)
    outer = (xxc2 - xxc1) ** 2 + (yyc2 - yyc1) ** 2
    w1 = e1[..., 2] - e1[..., 0]
    h1 = e1[..., 3] - e1[..., 1] + 1.0
    w2 = e2[..., 2] - e2[..., 0]
    h2 = e2[..., 3] - e2[..., 1] + 1.0
    arctan = jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)
    v = (4.0 / (jnp.pi ** 2)) * arctan ** 2
    alpha = v / ((1.0 - iou) + v)
    return (iou - inner / outer - alpha * v + 1.0) * 0.5


def ct_dist_matrix(b1, b2, mask=None):
    """Normalized center-distance similarity; mirrors association.py:150-171.

    The reference normalizes by the matrix max; under padding the max must be
    taken over *valid* entries only, so an optional (N,M) mask is accepted.
    """
    e1 = b1[:, None, :]
    e2 = b2[None, :, :]
    d = jnp.sqrt(_center_dists(e1, e2))
    if mask is not None:
        d_valid = jnp.where(mask, d, -jnp.inf)
        dmax = jnp.maximum(jnp.max(d_valid), 1e-12)
    else:
        dmax = jnp.maximum(jnp.max(d), 1e-12)
    # reference: d /= d.max(); return d.max() - d  (post-normalization max == 1)
    return 1.0 - d / dmax
