"""Object Keypoint Similarity (OKS) kernels.

Device-side rebuild of plugins/track/bpbreid_strong_sort/sort/
oks_matching.py:7-128: per-keypoint kappa falloff, scale from the visible-
keypoint box area with a 45-degree-rotated fallback (degenerate-alignment
guard), similarity normalized by the reference keypoints' visible count.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["COCO_KAPPA", "oks_similarity", "oks_matrix"]

# per-keypoint falloff constants (oks_matching.py:7-27)
COCO_KAPPA = jnp.array([
    0.026, 0.025, 0.025, 0.035, 0.035, 0.079, 0.079, 0.072, 0.072,
    0.062, 0.062, 0.107, 0.107, 0.087, 0.087, 0.089, 0.089,
])


def _area_scale(kp, visible):
    """Scale factor from the reference keypoints (oks_matching.py:45-83)."""
    big = 1e9
    vx = jnp.where(visible, kp[:, 0], big)
    vy = jnp.where(visible, kp[:, 1], big)
    vx2 = jnp.where(visible, kp[:, 0], -big)
    vy2 = jnp.where(visible, kp[:, 1], -big)
    area = (jnp.max(vx2) - jnp.min(vx)) * (jnp.max(vy2) - jnp.min(vy))
    total_area = ((jnp.max(kp[:, 0]) - jnp.min(kp[:, 0]))
                  * (jnp.max(kp[:, 1]) - jnp.min(kp[:, 1])))

    c = s = jnp.sqrt(0.5)  # cos/sin 45°
    rx = c * kp[:, 0] - s * kp[:, 1]
    ry = s * kp[:, 0] + c * kp[:, 1]
    rvx = jnp.where(visible, rx, big)
    rvy = jnp.where(visible, ry, big)
    rvx2 = jnp.where(visible, rx, -big)
    rvy2 = jnp.where(visible, ry, -big)
    area45 = (jnp.max(rvx2) - jnp.min(rvx)) * (jnp.max(rvy2) - jnp.min(rvy))
    total45 = ((jnp.max(rx) - jnp.min(rx)) * (jnp.max(ry) - jnp.min(ry)))

    r1 = jnp.where(area > 0.1, total_area / area, jnp.inf)
    r2 = jnp.where(area45 > 0.1, total45 / area45, jnp.inf)
    factor = jnp.sqrt(jnp.minimum(r1, r2))
    factor = jnp.minimum(5.0, factor)
    scale = jnp.sqrt(jnp.maximum(area, 0.0)) * factor
    return jnp.where(scale < 0.1, jnp.nan, scale)


def oks_similarity(kp, candidates, kappa=None):
    """OKS of reference keypoints (K, 3) vs candidates (M, K, 3) -> (M,).

    Mirrors oks() (oks_matching.py:30-94): visibility from the reference's
    confidence channel; NaN when the reference skeleton is degenerate.
    """
    K = kp.shape[0]
    if kappa is None:
        kappa = COCO_KAPPA[:K] if K <= COCO_KAPPA.shape[0] else \
            jnp.full(K, 0.08)
    visible = kp[:, 2] > 0.0
    scale = _area_scale(kp, visible)
    d2 = ((kp[None, :, 0] - candidates[:, :, 0]) ** 2
          + (kp[None, :, 1] - candidates[:, :, 1]) ** 2)
    per_kp = jnp.exp(-d2 / (2 * scale ** 2 * kappa[None, :] ** 2)) \
        * visible[None, :].astype(kp.dtype)
    n_vis = jnp.maximum(jnp.sum(visible), 1)
    return jnp.sum(per_kp, axis=1) / n_vis


def oks_matrix(track_kps, det_kps, kappa=None):
    """(T, K, 3) track keypoints x (D, K, 3) detections -> (T, D) OKS."""
    import jax
    return jax.vmap(lambda kp: oks_similarity(kp, det_kps, kappa))(
        track_kps)
