"""BoT-SORT as a jitted ``lax.scan`` step (TPU-native).

Re-design of the reference BoT-SORT (plugins/track/bot_sort/bot_sort.py:
236-486 + matching.py): ByteTrack's two-stage lifecycle plus

  * an xywh 8-dim Kalman filter (kalman_filter.py:55-175)
  * global camera-motion compensation: per-frame 2x3 affine warps applied
    to pool + unconfirmed track means/covs before association
    (STrack.multi_gmc, bot_sort.py:94-108: mean' = kron(I4,R) mean + t,
    cov' = R8 cov R8^T)
  * stage-1 cost = fuse_motion (matching.py:159-171): cosine distance of
    EMA-smoothed track features vs detection features, Mahalanobis-gated
    (inf) and blended with the gating distance by lambda_
  * unconfirmed stage: min(score-fused IoU cost, halved embedding cost
    with appearance/proximity masking) (bot_sort.py:420-432)
  * births gated by new_track_thresh.

Tuned defaults mirror tracklab/configs/modules/track/bot_sort.yaml.
Class handling keeps the last matched class (the reference's per-track
class-frequency vote, bot_sort.py:52-70, is single-class on every shipped
dataset; a frequency vote is available offline via MajorityVoteTracklet).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from tracklab_tpu.ops import boxes as B
from tracklab_tpu.ops.assignment import matching_limit
from tracklab_tpu.ops.embeddings import normalize_rows
from tracklab_tpu.ops.kalman import XYWHFilter as KF, CHI2INV95_4D
from tracklab_tpu.trackers.common import birth_scatter, Detections, claim_slots

__all__ = ["BotSortConfig", "BotSortState", "BotSortOutput",
           "botsort_init", "botsort_step", "botsort_scan"]

TRACKED = 1
LOST = 2


@dataclass(frozen=True)
class BotSortConfig:
    track_high_thresh: float = 0.3382
    new_track_thresh: float = 0.2114
    track_buffer: int = 60
    match_thresh: float = 0.2273
    proximity_thresh: float = 0.5945
    appearance_thresh: float = 0.4818
    lambda_: float = 0.9896
    frame_rate: int = 30
    ema_alpha: float = 0.9
    embed_dim: int = 512
    # vmap-safe mode for multi-video batching: replaces lax.cond
    # fast-path dispatch (which runs every branch for all lanes
    # under vmap) with cond-free rectangular JV solves. Identical
    # outputs; set True when vmapping the scan over a video axis.
    batched: bool = False
    max_tracks: int = 128
    max_dets: int = 64

    @property
    def max_time_lost(self) -> int:
        return int(self.frame_rate / 30.0 * self.track_buffer)


class BotSortState(NamedTuple):
    mean: jnp.ndarray          # (T, 8) xywh + velocities
    cov: jnp.ndarray           # (T, 8, 8)
    feat: jnp.ndarray          # (T, E) smooth_feat (normalized)
    has_feat: jnp.ndarray      # (T,) bool
    tstate: jnp.ndarray
    is_activated: jnp.ndarray
    score: jnp.ndarray
    cls: jnp.ndarray
    ref: jnp.ndarray
    track_id: jnp.ndarray
    frame_id: jnp.ndarray
    start_frame: jnp.ndarray
    active: jnp.ndarray
    next_id: jnp.ndarray
    frame_count: jnp.ndarray


class BotSortOutput(NamedTuple):
    ltrb: jnp.ndarray
    track_id: jnp.ndarray
    cls: jnp.ndarray
    conf: jnp.ndarray
    ref: jnp.ndarray
    valid: jnp.ndarray


def botsort_init(cfg: BotSortConfig, dtype=jnp.float32) -> BotSortState:
    T, E = cfg.max_tracks, cfg.embed_dim
    i32 = jnp.int32
    return BotSortState(
        mean=jnp.zeros((T, 8), dtype),
        cov=jnp.zeros((T, 8, 8), dtype),
        feat=jnp.zeros((T, E), dtype),
        has_feat=jnp.zeros(T, bool),
        tstate=jnp.zeros(T, i32),
        is_activated=jnp.zeros(T, bool),
        score=jnp.zeros(T, dtype),
        cls=jnp.zeros(T, dtype),
        ref=jnp.full(T, -1, i32),
        track_id=jnp.zeros(T, i32),
        frame_id=jnp.zeros(T, i32),
        start_frame=jnp.zeros(T, i32),
        active=jnp.zeros(T, bool),
        next_id=jnp.zeros((), i32),
        frame_count=jnp.zeros((), i32),
    )


def _mean_to_ltrb(mean):
    cx, cy, w, h = mean[:, 0], mean[:, 1], mean[:, 2], mean[:, 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                     axis=1)


def _gmc_apply(mean, cov, warp, mask):
    """STrack.multi_gmc (bot_sort.py:94-108)."""
    R = warp[:2, :2]
    t = warp[:2, 2]
    R8 = jnp.kron(jnp.eye(4, dtype=mean.dtype), R)
    new_mean = mean @ R8.T
    new_mean = new_mean.at[:, 0:2].add(t)
    new_cov = jnp.einsum("ij,tjk,lk->til", R8, cov, R8)
    mean = jnp.where(mask[:, None], new_mean, mean)
    cov = jnp.where(mask[:, None, None], new_cov, cov)
    return mean, cov


def _kf_update_where(st, det, trk2det, emb_n, now, alpha):
    matched = trk2det >= 0
    safe = jnp.where(matched, trk2det, 0)
    z = B.ltrb_to_xywh(det.ltrb[safe])
    upd_mean, upd_cov = KF.update_batch(st.mean, st.cov, z)
    # feature EMA: only when the matched detection carries a feature
    # (stage-2 low-score detections don't — bot_sort.py:402)
    new_feat_raw = emb_n[safe]
    has_new = matched & (jnp.linalg.norm(new_feat_raw, axis=1) > 1e-6)
    blended = normalize_rows(
        alpha * st.feat + (1 - alpha) * new_feat_raw)
    feat = jnp.where((has_new & st.has_feat)[:, None], blended,
                     jnp.where(has_new[:, None], new_feat_raw, st.feat))
    return st._replace(
        mean=jnp.where(matched[:, None], upd_mean, st.mean),
        cov=jnp.where(matched[:, None, None], upd_cov, st.cov),
        feat=feat,
        has_feat=st.has_feat | has_new,
        tstate=jnp.where(matched, TRACKED, st.tstate),
        is_activated=st.is_activated | matched,
        score=jnp.where(matched, det.conf[safe], st.score),
        cls=jnp.where(matched, det.cls[safe], st.cls),
        ref=jnp.where(matched, det.ref[safe], st.ref),
        frame_id=jnp.where(matched, now, st.frame_id),
    )


def _invert(det2trk, T):
    # one-hot select instead of a scatter (TPU-friendly); matched
    # tracks are unique so at most one det maps to each track
    sel = det2trk[:, None] == jnp.arange(T, dtype=jnp.int32)[None, :]
    hit = jnp.any(sel, axis=0)
    return jnp.where(hit, jnp.argmax(sel, axis=0).astype(jnp.int32), -1)


def botsort_step(cfg: BotSortConfig, st: BotSortState, inputs):
    det, emb, warp = inputs
    T = cfg.max_tracks
    now = st.frame_count + 1
    st = st._replace(frame_count=now)
    emb_n = jnp.where(
        (jnp.linalg.norm(emb, axis=1, keepdims=True) > 1e-6),
        normalize_rows(emb), jnp.zeros_like(emb))

    first = det.valid & (det.conf > cfg.track_high_thresh)
    second = det.valid & (det.conf > 0.1) & (det.conf < cfg.track_high_thresh)

    unconfirmed = st.active & (st.tstate == TRACKED) & (~st.is_activated)
    tracked_act = st.active & (st.tstate == TRACKED) & st.is_activated
    pool = tracked_act | (st.active & (st.tstate == LOST))

    # predict pool (vh zeroed for lost), then GMC on pool + unconfirmed
    mean_in = jnp.where(
        (pool & (st.tstate != TRACKED))[:, None],
        st.mean.at[:, 7].set(0.0), st.mean)
    pred_mean, pred_cov = KF.predict_batch(mean_in, st.cov)
    mean = jnp.where(pool[:, None], pred_mean, st.mean)
    cov = jnp.where(pool[:, None, None], pred_cov, st.cov)
    mean, cov = _gmc_apply(mean, cov, warp, pool | unconfirmed)
    st = st._replace(mean=mean, cov=cov)

    # --- stage 1: fuse_motion cost on pool ---
    det_xywh = B.ltrb_to_xywh(det.ltrb)
    emb_cost = (1.0 - st.feat @ emb_n.T).T      # (D, T) cosine distance
    emb_cost = jnp.maximum(emb_cost, 0.0)
    gating = jax.vmap(
        lambda m, c: KF.gating_distance(m, c, det_xywh)
    )(st.mean, st.cov).T                         # (D, T)
    cost1 = jnp.where(gating > CHI2INV95_4D, jnp.inf, emb_cost)
    cost1 = cfg.lambda_ * cost1 + (1 - cfg.lambda_) * gating
    # tracks without a feature yet cannot produce a meaningful emb cost;
    # in the reference every pool track has one (stage-1 always attaches
    # features), so mask them out defensively
    cost1 = jnp.where(st.has_feat[None, :], cost1, jnp.inf)
    d2t_1 = matching_limit(cost1, first, pool, cfg.match_thresh,
                           batched=cfg.batched)
    t2d_1 = _invert(d2t_1, T)
    st = _kf_update_where(st, det, t2d_1, emb_n, now, cfg.ema_alpha)

    # --- stage 2: low-score dets vs remaining Tracked, plain IoU ---
    r_tracked = tracked_act & (t2d_1 < 0)
    trk_ltrb = _mean_to_ltrb(st.mean)
    iou2 = B.iou_matrix(det.ltrb, trk_ltrb)
    ok2 = second[:, None] & r_tracked[None, :]
    dist2 = jnp.where(ok2, 1.0 - iou2, 1.0)
    # stage-2 detections carry no features: zero their emb rows
    d2t_2 = matching_limit(dist2, second, r_tracked, 0.5,
                           batched=cfg.batched)
    t2d_2 = _invert(d2t_2, T)
    emb_zero = jnp.zeros_like(emb_n)
    st = _kf_update_where(st, det, t2d_2, emb_zero, now, cfg.ema_alpha)
    to_lost = r_tracked & (t2d_2 < 0)
    st = st._replace(tstate=jnp.where(to_lost, LOST, st.tstate))

    # --- stage 3: unconfirmed, min(iou-fused, emb) (bot_sort.py:420-432)
    u_det = first & (d2t_1 < 0)
    trk_ltrb3 = _mean_to_ltrb(st.mean)
    iou3 = B.iou_matrix(det.ltrb, trk_ltrb3)
    ok3 = u_det[:, None] & unconfirmed[None, :]
    ious_dists = jnp.where(ok3, 1.0 - iou3, 1.0)
    prox_mask = ious_dists > cfg.proximity_thresh
    fused = 1.0 - (1.0 - ious_dists) * det.conf[:, None]
    emb3 = jnp.maximum((1.0 - st.feat @ emb_n.T).T, 0.0) / 2.0
    emb3 = jnp.where(emb3 > cfg.appearance_thresh, 1.0, emb3)
    emb3 = jnp.where(prox_mask, 1.0, emb3)
    emb3 = jnp.where(st.has_feat[None, :], emb3, 1.0)
    dist3 = jnp.minimum(fused, emb3)
    d2t_3 = matching_limit(dist3, u_det, unconfirmed, 0.7,
                           batched=cfg.batched)
    t2d_3 = _invert(d2t_3, T)
    st = _kf_update_where(st, det, t2d_3, emb_n, now, cfg.ema_alpha)
    st = st._replace(active=st.active & ~(unconfirmed & (t2d_3 < 0)))

    # --- births (new_track_thresh) ---
    leftover = u_det & (d2t_3 < 0) & (det.conf >= cfg.new_track_thresh)
    det2slot = claim_slots(~st.active, leftover)
    D = det.ltrb.shape[0]
    birth = det2slot >= 0

    def scat(arr, val):
        # one-hot masked-sum write (TPU-friendly, trackers/common.py)
        return birth_scatter(det2slot, birth, arr, val)

    init_mean, init_cov = jax.vmap(KF.initiate)(det_xywh)
    birth_ids = (st.next_id
                 + jnp.cumsum(birth.astype(jnp.int32), dtype=jnp.int32) - 1)
    has_emb = jnp.linalg.norm(emb_n, axis=1) > 1e-6
    st = st._replace(
        mean=scat(st.mean, init_mean),
        cov=scat(st.cov, init_cov),
        feat=scat(st.feat, emb_n),
        has_feat=scat(st.has_feat, has_emb),
        tstate=scat(st.tstate, jnp.full(D, TRACKED, jnp.int32)),
        is_activated=scat(st.is_activated, jnp.full(D, now == 1)),
        score=scat(st.score, det.conf),
        cls=scat(st.cls, det.cls),
        ref=scat(st.ref, det.ref),
        track_id=scat(st.track_id, birth_ids),
        frame_id=scat(st.frame_id, jnp.full(D, now, jnp.int32)),
        start_frame=scat(st.start_frame, jnp.full(D, now, jnp.int32)),
        active=scat(st.active, birth),
        next_id=st.next_id + jnp.sum(birth, dtype=jnp.int32),
    )

    # --- stale lost eviction + duplicate suppression (as ByteTrack) ---
    stale = (st.active & (st.tstate == LOST)
             & (now - st.frame_id > cfg.max_time_lost))
    st = st._replace(active=st.active & ~stale)
    cur_ltrb = _mean_to_ltrb(st.mean)
    trk_mask = st.active & (st.tstate == TRACKED)
    lost_mask = st.active & (st.tstate == LOST)
    iou = B.iou_matrix(cur_ltrb, cur_ltrb)
    pair = trk_mask[:, None] & lost_mask[None, :]
    dup = pair & ((1.0 - iou) < 0.15)
    life = st.frame_id - st.start_frame
    drop_lost = jnp.any(dup & (life[:, None] > life[None, :]), axis=0)
    drop_trk = jnp.any(dup & (life[:, None] <= life[None, :]), axis=1)
    st = st._replace(active=st.active & ~(drop_lost | drop_trk))

    emit = st.active & (st.tstate == TRACKED) & st.is_activated
    out = BotSortOutput(
        ltrb=cur_ltrb, track_id=st.track_id + 1, cls=st.cls,
        conf=st.score, ref=st.ref, valid=emit,
    )
    return st, out


def botsort_scan(cfg: BotSortConfig, dets: Detections, emb: jnp.ndarray,
                 warps: Optional[jnp.ndarray] = None,
                 init: BotSortState | None = None,
                 resets: Optional[jnp.ndarray] = None):
    """Whole-video BoT-SORT; emb (F, D, E) detection features, warps
    optional (F, 2, 3) camera warps (identity when None)."""
    if init is None:
        init = botsort_init(cfg, dets.ltrb.dtype)
    F = dets.ltrb.shape[0]
    if warps is None:
        warps = jnp.broadcast_to(jnp.eye(2, 3, dtype=dets.ltrb.dtype),
                                 (F, 2, 3))
    step = partial(botsort_step, cfg)
    if resets is not None:
        from tracklab_tpu.trackers.common import reset_wrapped_step
        return lax.scan(reset_wrapped_step(step, init), init,
                        ((dets, emb, warps), resets))
    return lax.scan(step, init, (dets, emb, warps))
