"""StrongSORT as a jitted ``lax.scan`` step (TPU-native).

Re-design of the reference StrongSORT
(plugins/track/strong_sort/strong_sort.py:18-85, sort/tracker.py:151-187
matching, sort/track.py lifecycle/EMA, sort/nn_matching.py gallery,
sort/linear_assignment.py clamp-then-LSA semantics) over fixed-capacity
slot state:

  * appearance stage: confirmed tracks x detections — min-over-gallery
    cosine distance (one MXU matmul), Mahalanobis-gated (chi2 0.95, 4 dof)
    and motion-blended (mc_lambda), clamped at max_dist then solved as a
    forced LSA and post-filtered — exactly min_cost_matching's
    "cost[cost > max] = max + 1e-5" semantics
  * IoU stage: unconfirmed tracks + appearance-unmatched tracks with
    time_since_update == 1, vs remaining detections, threshold max_iou_dist
  * NSA Kalman (confidence-weighted measurement noise), EMA feature
    smoothing, per-track gallery ring buffer (nn_budget) re-fed every frame
    like metric.partial_fit, Tentative->Confirmed after n_init hits
  * optional per-frame 2x3 affine camera warps (ECC/GMC computed host-side
    or by the JAX registration kernel) applied to track means pre-predict,
    mirroring tracker.camera_update (track.py:229-244)

Emission matches strong_sort.py:70-85: confirmed tracks with
time_since_update <= 1 (coasting tracks emit their KF box against the last
matched detection row — the reference wrapper's documented override
behavior, wrappers/track/strong_sort_api.py:76-80).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from tracklab_tpu.ops import boxes as B
from tracklab_tpu.ops.embeddings import (
    ema_update, gallery_push, nn_gallery_distance, normalize_rows,
)
from tracklab_tpu.ops.kalman import XYAHNSAFilter as KF, CHI2INV95_4D
from tracklab_tpu.trackers.common import birth_scatter, Detections, claim_slots

__all__ = ["StrongSortConfig", "StrongSortState", "StrongSortOutput",
           "strongsort_init", "strongsort_step", "strongsort_scan"]

TENTATIVE = 1
CONFIRMED = 2
INFTY_COST = 1e5


@dataclass(frozen=True)
class StrongSortConfig:
    """Defaults mirror tracklab/configs/modules/track/strong_sort.yaml."""
    max_dist: float = 0.1594
    max_iou_dist: float = 0.5432
    max_age: int = 40
    n_init: int = 3
    nn_budget: int = 100
    mc_lambda: float = 0.995
    ema_alpha: float = 0.8962
    embed_dim: int = 512
    # vmap-safe mode for multi-video batching: replaces lax.cond
    # fast-path dispatch (which runs every branch for all lanes
    # under vmap) with cond-free rectangular JV solves. Identical
    # outputs; set True when vmapping the scan over a video axis.
    batched: bool = False
    max_tracks: int = 128
    max_dets: int = 64


class StrongSortState(NamedTuple):
    mean: jnp.ndarray          # (T, 8)
    cov: jnp.ndarray           # (T, 8, 8)
    feat: jnp.ndarray          # (T, E) EMA-smoothed, normalized
    gallery: jnp.ndarray       # (T, B, E)
    gallery_valid: jnp.ndarray  # (T, B) bool
    gallery_pos: jnp.ndarray   # (T,) int32 ring write position
    tstate: jnp.ndarray        # (T,) int32 TENTATIVE/CONFIRMED
    hits: jnp.ndarray          # (T,)
    age: jnp.ndarray           # (T,)
    time_since_update: jnp.ndarray  # (T,)
    conf: jnp.ndarray
    cls: jnp.ndarray
    ref: jnp.ndarray
    track_id: jnp.ndarray
    active: jnp.ndarray
    next_id: jnp.ndarray
    frame: jnp.ndarray


class StrongSortOutput(NamedTuple):
    ltrb: jnp.ndarray
    track_id: jnp.ndarray
    cls: jnp.ndarray
    conf: jnp.ndarray
    ref: jnp.ndarray
    valid: jnp.ndarray


def strongsort_init(cfg: StrongSortConfig,
                    dtype=jnp.float32) -> StrongSortState:
    T, Bq, E = cfg.max_tracks, cfg.nn_budget, cfg.embed_dim
    i32 = jnp.int32
    return StrongSortState(
        mean=jnp.zeros((T, 8), dtype),
        cov=jnp.zeros((T, 8, 8), dtype),
        feat=jnp.zeros((T, E), dtype),
        gallery=jnp.zeros((T, Bq, E), dtype),
        gallery_valid=jnp.zeros((T, Bq), bool),
        gallery_pos=jnp.zeros(T, i32),
        tstate=jnp.zeros(T, i32),
        hits=jnp.zeros(T, i32),
        age=jnp.zeros(T, i32),
        time_since_update=jnp.zeros(T, i32),
        conf=jnp.zeros(T, dtype),
        cls=jnp.zeros(T, dtype),
        ref=jnp.full(T, -1, i32),
        track_id=jnp.zeros(T, i32),
        active=jnp.zeros(T, bool),
        next_id=jnp.zeros((), i32),
        frame=jnp.zeros((), i32),
    )


def _mean_to_ltrb(mean):
    cx, cy, a, h = mean[:, 0], mean[:, 1], mean[:, 2], mean[:, 3]
    w = a * h
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                     axis=1)


def _clamped_matching(cost, row_mask, col_mask, max_distance,
                      batched=False):
    """min_cost_matching semantics (linear_assignment.py:55-73), with the
    exact unique-candidate fast path (ops/assignment.py); batched=True is
    the cond-free vmap-safe variant."""
    from tracklab_tpu.ops.assignment import min_cost_matching
    return min_cost_matching(cost, row_mask, col_mask, max_distance,
                             batched=batched)


def _invert(det2trk, T):
    # one-hot select instead of a scatter (TPU-friendly); matched
    # tracks are unique so at most one det maps to each track
    sel = det2trk[:, None] == jnp.arange(T, dtype=jnp.int32)[None, :]
    hit = jnp.any(sel, axis=0)
    return jnp.where(hit, jnp.argmax(sel, axis=0).astype(jnp.int32), -1)


def _apply_warp(mean, warp):
    """Apply a 2x3 affine camera warp to a track mean
    (track.py:221-244 get_matrix/camera_update): warp the box corners,
    refit xyah; velocities untouched."""
    ltrb = _mean_to_ltrb(mean)
    x1, y1, x2, y2 = ltrb[:, 0], ltrb[:, 1], ltrb[:, 2], ltrb[:, 3]
    p1 = jnp.stack([x1, y1, jnp.ones_like(x1)], axis=1) @ warp.T
    p2 = jnp.stack([x2, y2, jnp.ones_like(x2)], axis=1) @ warp.T
    w = p2[:, 0] - p1[:, 0]
    h = p2[:, 1] - p1[:, 1]
    cx = p1[:, 0] + w / 2
    cy = p1[:, 1] + h / 2
    a = w / jnp.maximum(h, 1e-6)
    new_pos = jnp.stack([cx, cy, a, h], axis=1)
    return jnp.concatenate([new_pos, mean[:, 4:]], axis=1)


def strongsort_step(cfg: StrongSortConfig, st: StrongSortState,
                    inputs):
    """One frame. inputs: (Detections, emb (D, E), warp (2, 3) or None
    packed as identity)."""
    det, emb, warp = inputs
    T = cfg.max_tracks
    st = st._replace(frame=st.frame + 1)

    # --- camera compensation + KF predict (tracker.predict) ---
    warped = _apply_warp(st.mean, warp)
    mean_in = jnp.where(st.active[:, None], warped, st.mean)
    pred_mean, pred_cov = KF.predict_batch(mean_in, st.cov)
    st = st._replace(
        mean=jnp.where(st.active[:, None], pred_mean, st.mean),
        cov=jnp.where(st.active[:, None, None], pred_cov, st.cov),
        age=st.age + st.active.astype(jnp.int32),
        time_since_update=(st.time_since_update
                           + st.active.astype(jnp.int32)),
    )

    det_xyah = B.ltwh_to_xyah(B.ltrb_to_ltwh(det.ltrb))   # (D, 4)
    emb_n = normalize_rows(emb)

    # --- stage A: appearance matching on confirmed tracks ---
    confirmed = st.active & (st.tstate == CONFIRMED)
    app_cost = nn_gallery_distance(st.gallery, st.gallery_valid, emb_n).T
    # ^ (D, T): gallery distance is (T, D); costs oriented dets x tracks
    gating = jax.vmap(
        lambda m, c: KF.gating_distance(m, c, det_xyah)
    )(st.mean, st.cov).T                                   # (D, T)
    app_cost = jnp.where(gating > CHI2INV95_4D, INFTY_COST, app_cost)
    app_cost = cfg.mc_lambda * app_cost + (1 - cfg.mc_lambda) * gating
    d2t_a = _clamped_matching(app_cost, det.valid, confirmed,
                              cfg.max_dist, batched=cfg.batched)
    t2d_a = _invert(d2t_a, T)

    # --- stage B: IoU matching (tracker.py:173-183) ---
    unconfirmed = st.active & (st.tstate == TENTATIVE)
    recent_unmatched = confirmed & (t2d_a < 0) & (st.time_since_update == 1)
    iou_cand = unconfirmed | recent_unmatched
    trk_ltrb = _mean_to_ltrb(st.mean)
    iou = B.iou_matrix(det.ltrb, trk_ltrb)                 # (D, T)
    pair_ok = det.valid[:, None] & iou_cand[None, :]
    iou_cost = jnp.where(pair_ok, 1.0 - iou, INFTY_COST)
    # iou_matching.iou_cost: tsu > 1 candidates cost INFTY (only affects
    # tentative tracks, which always have tsu <= 1 here)
    u_det = det.valid & (d2t_a < 0)
    d2t_b = _clamped_matching(iou_cost, u_det, iou_cand,
                              cfg.max_iou_dist, batched=cfg.batched)
    t2d_b = _invert(d2t_b, T)

    trk2det = jnp.where(t2d_a >= 0, t2d_a, t2d_b)
    matched = trk2det >= 0

    # --- matched updates: NSA KF + EMA features + lifecycle ---
    safe = jnp.where(matched, trk2det, 0)
    z = det_xyah[safe]
    z_conf = det.conf[safe]
    upd_mean, upd_cov = jax.vmap(KF.update)(st.mean, st.cov, z, z_conf)
    new_hits = st.hits + matched.astype(jnp.int32)
    promote = matched & (st.tstate == TENTATIVE) & (new_hits >= cfg.n_init)
    st = st._replace(
        mean=jnp.where(matched[:, None], upd_mean, st.mean),
        cov=jnp.where(matched[:, None, None], upd_cov, st.cov),
        feat=ema_update(st.feat, emb_n[safe], cfg.ema_alpha, matched),
        hits=new_hits,
        time_since_update=jnp.where(matched, 0, st.time_since_update),
        tstate=jnp.where(promote, CONFIRMED, st.tstate),
        conf=jnp.where(matched, z_conf, st.conf),
        cls=jnp.where(matched, det.cls[safe], st.cls),
        ref=jnp.where(matched, det.ref[safe], st.ref),
    )

    # --- mark_missed (track.py:303-308) ---
    unmatched_trk = st.active & (~matched)
    kill = unmatched_trk & ((st.tstate == TENTATIVE)
                            | (st.time_since_update > cfg.max_age))
    st = st._replace(active=st.active & ~kill)

    # --- births (tracker._initiate_track) ---
    still_unmatched = det.valid & (d2t_a < 0) & (d2t_b < 0)
    det2slot = claim_slots(~st.active, still_unmatched)
    D = det.ltrb.shape[0]
    birth = det2slot >= 0

    def scat(arr, val):
        # one-hot masked-sum write (TPU-friendly, trackers/common.py)
        return birth_scatter(det2slot, birth, arr, val)

    init_mean, init_cov = jax.vmap(KF.initiate)(det_xyah)
    birth_ids = (st.next_id
                 + jnp.cumsum(birth.astype(jnp.int32), dtype=jnp.int32) - 1)
    E, Bq = cfg.embed_dim, cfg.nn_budget
    st = st._replace(
        mean=scat(st.mean, init_mean),
        cov=scat(st.cov, init_cov),
        feat=scat(st.feat, emb_n),
        gallery=scat(st.gallery, jnp.zeros((D, Bq, E), st.gallery.dtype)),
        gallery_valid=scat(st.gallery_valid, jnp.zeros((D, Bq), bool)),
        gallery_pos=scat(st.gallery_pos, jnp.zeros(D, jnp.int32)),
        tstate=scat(st.tstate, jnp.full(D, TENTATIVE, jnp.int32)),
        hits=scat(st.hits, jnp.ones(D, jnp.int32)),
        age=scat(st.age, jnp.ones(D, jnp.int32)),
        time_since_update=scat(st.time_since_update,
                               jnp.zeros(D, jnp.int32)),
        conf=scat(st.conf, det.conf),
        cls=scat(st.cls, det.cls),
        ref=scat(st.ref, det.ref),
        track_id=scat(st.track_id, birth_ids),
        active=scat(st.active, birth),
        next_id=st.next_id + jnp.sum(birth, dtype=jnp.int32),
    )

    # --- gallery partial_fit (tracker.py:108-117): every confirmed track
    # pushes its current smoothed feature each frame ---
    push = st.active & (st.tstate == CONFIRMED)
    gallery, gallery_valid, gallery_pos = gallery_push(
        st.gallery, st.gallery_valid, st.gallery_pos, st.feat, push)
    st = st._replace(gallery=gallery, gallery_valid=gallery_valid,
                     gallery_pos=gallery_pos)

    # --- emit (strong_sort.py:70-85) ---
    emit = (st.active & (st.tstate == CONFIRMED)
            & (st.time_since_update <= 1))
    out = StrongSortOutput(
        ltrb=_mean_to_ltrb(st.mean),
        track_id=st.track_id + 1,
        cls=st.cls, conf=st.conf, ref=st.ref, valid=emit,
    )
    return st, out


def strongsort_scan(cfg: StrongSortConfig, dets: Detections,
                    emb: jnp.ndarray, warps: Optional[jnp.ndarray] = None,
                    init: StrongSortState | None = None,
                    resets: Optional[jnp.ndarray] = None):
    """Whole-video StrongSORT. dets: leading frame axis; emb: (F, D, E)
    detection embeddings; warps: optional (F, 2, 3) camera warps."""
    if init is None:
        init = strongsort_init(cfg, dets.ltrb.dtype)
    F = dets.ltrb.shape[0]
    if warps is None:
        eye = jnp.broadcast_to(jnp.eye(2, 3, dtype=dets.ltrb.dtype),
                               (F, 2, 3))
        warps = eye
    step = partial(strongsort_step, cfg)
    if resets is not None:
        from tracklab_tpu.trackers.common import reset_wrapped_step
        return lax.scan(reset_wrapped_step(step, init), init,
                        ((dets, emb, warps), resets))
    return lax.scan(step, init, (dets, emb, warps))
