"""Appearance-embedding kernels: cosine distances, EMA feature banks,
per-track sample galleries (fixed-capacity ring buffers).

Device-side rebuild of the reference's NearestNeighborDistanceMetric
(plugins/track/strong_sort/sort/nn_matching.py:30-162): per-track galleries
become a (T, B, E) ring buffer; the min-over-gallery cosine distance is one
batched matmul on the MXU instead of a per-track python loop.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["normalize_rows", "cosine_distance_matrix",
           "nn_gallery_distance", "ema_update", "gallery_push"]


def normalize_rows(x, eps: float = 1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


def cosine_distance_matrix(a, b, normalized: bool = False):
    """(N, E) x (M, E) -> (N, M) cosine distance (1 - cos sim)."""
    if not normalized:
        a = normalize_rows(a)
        b = normalize_rows(b)
    return 1.0 - a @ b.T


def nn_gallery_distance(gallery, gallery_valid, feats,
                        normalized: bool = True):
    """Min cosine distance from each track's gallery to each query feature.

    gallery: (T, B, E); gallery_valid: (T, B) bool; feats: (D, E).
    Returns (T, D); rows with empty galleries give 1e5 (INFTY-like).
    Mirrors _nn_cosine_distance (nn_matching.py:73-91) which takes the min
    over all stored samples of 1 - cos.
    """
    if not normalized:
        gallery = normalize_rows(gallery)
        feats = normalize_rows(feats)
    sim = jnp.einsum("tbe,de->tbd", gallery, feats)
    dist = 1.0 - sim
    dist = jnp.where(gallery_valid[:, :, None], dist, jnp.inf)
    out = jnp.min(dist, axis=1)
    return jnp.where(jnp.isfinite(out), out, 1e5)


def ema_update(feat, new_feat, alpha, apply):
    """StrongSORT EMA smoothing (track.py:286-288): normalized input,
    blended, re-normalized. apply: (T,) bool selects tracks to update."""
    new_feat = normalize_rows(new_feat)
    smooth = alpha * feat + (1.0 - alpha) * new_feat
    smooth = normalize_rows(smooth)
    return jnp.where(apply[..., None], smooth, feat)


def gallery_push(gallery, gallery_valid, write_pos, feats, push):
    """Append features to per-track ring buffers.

    gallery: (T, B, E), gallery_valid: (T, B), write_pos: (T,) int32,
    feats: (T, E), push: (T,) bool.
    Returns updated (gallery, gallery_valid, write_pos).
    """
    T, B, _ = gallery.shape
    idx = jnp.arange(T)
    pos = jnp.mod(write_pos, B)
    new_gallery = gallery.at[idx, pos].set(feats)
    new_valid = gallery_valid.at[idx, pos].set(True)
    gallery = jnp.where(push[:, None, None], new_gallery, gallery)
    gallery_valid = jnp.where(push[:, None], new_valid, gallery_valid)
    write_pos = jnp.where(push, write_pos + 1, write_pos)
    return gallery, gallery_valid, write_pos
