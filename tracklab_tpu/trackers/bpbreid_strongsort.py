"""BPBReID-StrongSORT as a jitted ``lax.scan`` step (TPU-native).

Re-design of the reference's own tracker
(plugins/track/bpbreid_strong_sort/): StrongSORT driven by externally
computed *part-based* ReID embeddings (from the KPReID module) with:

  * part-based appearance distance (sort/nn_matching.py:99-136 via
    torchreid compute_distance_matrix_using_bp_features): per-part squared
    Euclidean distance of L2-normalized features, visibility-weighted mean
    over parts, halved — i.e. (1 - cos) per part (see
    part_based_distance)
  * visibility-aware part-feature EMA (sort/track.py:150-169): parts
    visible on both sides blend by ema_alpha; one-sided parts keep the
    visible side's features; never-seen parts are set to 1
  * selectable motion cost for the spatio-temporal stage: IoU of the KF
    prediction or OKS between the tracks' last detection keypoints and the
    new detections (sort/oks_matching.py)
  * the strong_sort_matching cascade (sort/tracker.py:242-334): gated ReID
    stage on confirmed tracks, then the motion stage over unconfirmed +
    just-missed tracks
  * NSA Kalman (same as StrongSORT) and Tentative/Confirmed lifecycle.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from tracklab_tpu.ops import boxes as B
from tracklab_tpu.ops.kalman import XYAHNSAHFilter as KF, CHI2INV95_4D, \
    CHI2INV95_2D
from tracklab_tpu.ops.oks import oks_matrix
from tracklab_tpu.trackers.common import birth_scatter, Detections, claim_slots
from tracklab_tpu.trackers.strongsort import (
    _clamped_matching, _invert, _mean_to_ltrb, _apply_warp,
)

__all__ = ["BPBReIDStrongSortConfig", "BPBReIDStrongSortState",
           "bpbreid_init", "bpbreid_step", "bpbreid_scan"]

TENTATIVE = 1
CONFIRMED = 2
INFTY_COST = 1e5


@dataclass(frozen=True)
class BPBReIDStrongSortConfig:
    """Defaults mirror tracklab/configs/modules/track/
    bpbreid_strong_sort.yaml."""
    max_dist: float = 0.5
    motion_criterium: str = "iou"     # or "oks"
    max_iou_distance: float = 0.8
    max_oks_distance: float = 0.7
    max_age: int = 300
    n_init: int = 0
    mc_lambda: float = 0.995
    ema_alpha: float = 0.9
    only_position: bool = False
    # stop KF prediction for tracks coasting at least this many frames
    # (sort/track.py:128-136); the track stays alive with frozen state
    max_kalman_prediction_without_update: int = 7
    # matching strategy (sort/tracker.py:242-364): "strong_sort" = gated
    # ReID cascade then motion stage; "bot_sort" = one LSA over the
    # weighted sum of KF-gating / ReID / spatio-temporal costs
    matching_strategy: str = "strong_sort"
    w_kfgd: float = 1.0
    w_reid: float = 1.0
    w_st: float = 1.0
    gating_thres_factor: float = 1.0
    n_parts: int = 6                  # KPR part count (+1 global)
    embed_dim: int = 512
    n_keypoints: int = 17
    # vmap-safe mode for multi-video batching: replaces lax.cond
    # fast-path dispatch (which runs every branch for all lanes
    # under vmap) with cond-free rectangular JV solves. Identical
    # outputs; set True when vmapping the scan over a video axis.
    batched: bool = False
    # debug-viz instrumentation (sort/tracker.py:365-408
    # compute_all_costs_matrix + add_matching_information): emit the
    # UN-GATED reid / spatio-temporal / KF-gating cost matrices and the
    # per-detection matched stage/cost every frame
    emit_costs: bool = False
    max_tracks: int = 128
    max_dets: int = 64


class BPBReIDStrongSortState(NamedTuple):
    mean: jnp.ndarray           # (T, 8)
    cov: jnp.ndarray            # (T, 8, 8)
    feat: jnp.ndarray           # (T, P, E) part features (unnormalized EMA)
    vis: jnp.ndarray            # (T, P) visibility scores
    kps: jnp.ndarray            # (T, K, 3) last detection keypoints
    # KF box snapshot at match time, post-predict pre-update (the
    # reference's track.last_kf_pred_ltwh, sort/track.py:148); NaN until
    # the track's first update
    last_pred_ltrb: jnp.ndarray  # (T, 4)
    tstate: jnp.ndarray
    hits: jnp.ndarray
    age: jnp.ndarray
    time_since_update: jnp.ndarray
    conf: jnp.ndarray
    cls: jnp.ndarray
    ref: jnp.ndarray
    track_id: jnp.ndarray
    active: jnp.ndarray
    next_id: jnp.ndarray
    frame: jnp.ndarray


class BPBReIDStrongSortOutput(NamedTuple):
    ltrb: jnp.ndarray
    track_id: jnp.ndarray
    cls: jnp.ndarray
    conf: jnp.ndarray
    ref: jnp.ndarray
    hits: jnp.ndarray
    age: jnp.ndarray
    time_since_update: jnp.ndarray
    # reference extras (bpbreid_strong_sort_api.py:20-30): the KF box
    # snapshot recorded at the last update and the lifecycle state int
    pred_ltrb: jnp.ndarray
    tstate: jnp.ndarray
    valid: jnp.ndarray
    # instrumentation (cfg.emit_costs; None otherwise): un-gated cost
    # matrices (D, T) vs the pre-birth track set, the matched
    # stage per detection (0 none, 1 reid/"R", 2 motion/"S") and its
    # cost, plus the pre-birth track validity/ids the matrices refer to
    costs_r: Optional[jnp.ndarray] = None
    costs_s: Optional[jnp.ndarray] = None
    costs_k: Optional[jnp.ndarray] = None
    matched_stage: Optional[jnp.ndarray] = None
    matched_cost: Optional[jnp.ndarray] = None
    cost_track_valid: Optional[jnp.ndarray] = None
    cost_track_id: Optional[jnp.ndarray] = None


def bpbreid_init(cfg: BPBReIDStrongSortConfig,
                 dtype=jnp.float32) -> BPBReIDStrongSortState:
    T, P, E, K = (cfg.max_tracks, cfg.n_parts, cfg.embed_dim,
                  cfg.n_keypoints)
    i32 = jnp.int32
    return BPBReIDStrongSortState(
        mean=jnp.zeros((T, 8), dtype),
        cov=jnp.zeros((T, 8, 8), dtype),
        feat=jnp.zeros((T, P, E), dtype),
        vis=jnp.zeros((T, P), dtype),
        kps=jnp.zeros((T, K, 3), dtype),
        last_pred_ltrb=jnp.full((T, 4), jnp.nan, dtype),
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


def part_based_distance(trk_feat, trk_vis, det_feat, det_vis):
    """Part-weighted appearance distance (T, D).

    Reference semantics (sort/nn_matching.py:99-136 calling torchreid's
    compute_distance_matrix_using_bp_features, then halving): per-part
    *squared Euclidean* distance of L2-normalized features — i.e.
    2*(1 - cos) per part — combined as the visibility-score-weighted mean
    over parts, then halved, giving exactly (1 - cos) per part averaged
    by visibility weight.  Empty weight mass -> max distance (1.0)."""
    eps = 1e-12
    tf = trk_feat / jnp.maximum(
        jnp.linalg.norm(trk_feat, axis=-1, keepdims=True), eps)
    df = det_feat / jnp.maximum(
        jnp.linalg.norm(det_feat, axis=-1, keepdims=True), eps)
    # (T, P, D): (1 - cos) per part == squared-euclid/2 of unit features
    d = 1.0 - jnp.einsum("tpe,dpe->tpd", tf, df)
    w = trk_vis[:, :, None] * det_vis.T[None, :, :]      # (T, P, D)
    wsum = jnp.sum(w, axis=1)
    out = jnp.sum(d * w, axis=1) / jnp.maximum(wsum, eps)
    return jnp.where(wsum > eps, out, 1.0)


def bpbreid_step(cfg: BPBReIDStrongSortConfig,
                 st: BPBReIDStrongSortState, inputs):
    det, feat, vis, kps, warp = inputs
    T = cfg.max_tracks
    st = st._replace(frame=st.frame + 1)

    warped = _apply_warp(st.mean, warp)
    mean_in = jnp.where(st.active[:, None], warped, st.mean)
    pred_mean, pred_cov = KF.predict_batch(mean_in, st.cov)
    # KF-prediction freeze for long-coasting tracks (sort/track.py:128-136):
    # the state stops being propagated once time_since_update reaches the
    # limit; the track stays alive (age/tsu keep counting).
    do_pred = st.active & (
        st.time_since_update < cfg.max_kalman_prediction_without_update)
    st = st._replace(
        mean=jnp.where(do_pred[:, None], pred_mean,
                       jnp.where(st.active[:, None], mean_in, st.mean)),
        cov=jnp.where(do_pred[:, None, None], pred_cov, st.cov),
        age=st.age + st.active.astype(jnp.int32),
        time_since_update=(st.time_since_update
                           + st.active.astype(jnp.int32)),
    )

    det_xyah = B.ltwh_to_xyah(B.ltrb_to_ltwh(det.ltrb))

    confirmed = st.active & (st.tstate == CONFIRMED)
    app = part_based_distance(st.feat, st.vis, feat, vis).T   # (D, T)
    gating = jax.vmap(
        lambda m, c: KF.gating_distance(m, c, det_xyah,
                                        cfg.only_position)
    )(st.mean, st.cov).T
    gthr = CHI2INV95_2D if cfg.only_position else CHI2INV95_4D

    def motion_cost_matrix():
        if cfg.motion_criterium == "oks":
            sim = oks_matrix(st.kps, kps).T                # (D, T)
            sim = jnp.where(jnp.isfinite(sim), sim, 0.0)
            return 1.0 - sim, cfg.max_oks_distance
        iou = B.iou_matrix(det.ltrb, _mean_to_ltrb(st.mean))
        return 1.0 - iou, cfg.max_iou_distance

    # pre-birth snapshot for the instrumentation matrices
    cost_active = st.active
    cost_tid = st.track_id + 1
    raw_motion, _ = motion_cost_matrix() if cfg.emit_costs \
        else (None, None)

    if cfg.matching_strategy == "bot_sort":
        # one LSA over all tracks: weighted sum of sqrt-Mahalanobis,
        # part-ReID and spatio-temporal costs, OR-gated
        # (sort/tracker.py:169-240,335-363)
        pos_cost = jnp.sqrt(jnp.maximum(gating, 0.0)) / (
            jnp.sqrt(gthr) * cfg.gating_thres_factor)
        st_cost, motion_max = motion_cost_matrix()
        wsum = cfg.w_kfgd + cfg.w_reid + cfg.w_st
        cost = (cfg.w_kfgd * pos_cost + cfg.w_reid * app
                + cfg.w_st * st_cost) / wsum
        gate = jnp.zeros_like(cost, bool)
        if cfg.w_kfgd > 0:
            gate |= pos_cost > 1.0
        if cfg.w_reid > 0:
            gate |= app > cfg.max_dist
        if cfg.w_st > 0:
            gate |= st_cost > motion_max
        cost = jnp.where(gate, INFTY_COST, cost)
        d2t_a = _clamped_matching(cost, det.valid, st.active,
                                  cfg.max_dist, batched=cfg.batched)
        t2d_a = _invert(d2t_a, T)
        d2t_b = jnp.full(det.ltrb.shape[0], -1, jnp.int32)
        t2d_b = _invert(d2t_b, T)
        stage_a_cost, stage_b_cost = cost, None
    else:
        # --- stage A: part-based ReID on confirmed tracks, KF-gated ---
        app_g = jnp.where(gating > gthr, INFTY_COST, app)
        app_g = cfg.mc_lambda * app_g + (1 - cfg.mc_lambda) * gating
        d2t_a = _clamped_matching(app_g, det.valid, confirmed,
                                  cfg.max_dist, batched=cfg.batched)
        t2d_a = _invert(d2t_a, T)

        # --- stage B: motion cost (iou on prediction / oks on last kps)
        unconfirmed = st.active & (st.tstate == TENTATIVE)
        recent = confirmed & (t2d_a < 0) & (st.time_since_update == 1)
        cand = unconfirmed | recent
        u_det = det.valid & (d2t_a < 0)
        motion_cost, motion_max = motion_cost_matrix()
        ok = u_det[:, None] & cand[None, :]
        motion_cost = jnp.where(ok, motion_cost, INFTY_COST)
        d2t_b = _clamped_matching(motion_cost, u_det, cand, motion_max,
                                  batched=cfg.batched)
        t2d_b = _invert(d2t_b, T)
        stage_a_cost, stage_b_cost = app_g, motion_cost

    trk2det = jnp.where(t2d_a >= 0, t2d_a, t2d_b)
    matched = trk2det >= 0

    # --- matched updates: NSA KF + part EMA + lifecycle ---
    # post-predict pre-update KF box, recorded at match time (the
    # reference sets last_kf_pred_ltwh inside update(), track.py:148)
    pred_snapshot = _mean_to_ltrb(st.mean)
    safe = jnp.where(matched, trk2det, 0)
    z = det_xyah[safe]
    z_conf = det.conf[safe]
    upd_mean, upd_cov = jax.vmap(KF.update)(st.mean, st.cov, z, z_conf)
    new_hits = st.hits + matched.astype(jnp.int32)
    promote = matched & (st.tstate == TENTATIVE) & (new_hits >= cfg.n_init)

    # visibility-aware EMA (track.py:150-169)
    dfeat = feat[safe]                       # (T, P, E)
    dvis = vis[safe]                         # (T, P)
    both = st.vis * dvis
    xor = jnp.logical_xor(st.vis > 0, dvis > 0).astype(st.vis.dtype)
    w_trk = both * cfg.ema_alpha + xor * st.vis
    w_det = both * (1 - cfg.ema_alpha) + xor * dvis
    smooth = w_trk[..., None] * st.feat + w_det[..., None] * dfeat
    never = (w_trk == 0) & (w_det == 0)
    smooth = jnp.where(never[..., None], 1.0, smooth)
    new_vis = jnp.maximum(st.vis, dvis)
    st = st._replace(
        mean=jnp.where(matched[:, None], upd_mean, st.mean),
        cov=jnp.where(matched[:, None, None], upd_cov, st.cov),
        feat=jnp.where(matched[:, None, None], smooth, st.feat),
        vis=jnp.where(matched[:, None], new_vis, st.vis),
        kps=jnp.where(matched[:, None, None], kps[safe], st.kps),
        last_pred_ltrb=jnp.where(matched[:, None], pred_snapshot,
                                 st.last_pred_ltrb),
        hits=new_hits,
        time_since_update=jnp.where(matched, 0, st.time_since_update),
        tstate=jnp.where(promote, CONFIRMED, st.tstate),
        conf=jnp.where(matched, z_conf, st.conf),
        cls=jnp.where(matched, det.cls[safe], st.cls),
        ref=jnp.where(matched, det.ref[safe], st.ref),
    )

    # --- mark_missed ---
    unmatched_trk = st.active & (~matched)
    kill = unmatched_trk & ((st.tstate == TENTATIVE)
                            | (st.time_since_update > cfg.max_age))
    st = st._replace(active=st.active & ~kill)

    # --- births ---
    still = det.valid & (d2t_a < 0) & (d2t_b < 0)
    det2slot = claim_slots(~st.active, still)
    D = det.ltrb.shape[0]
    birth = det2slot >= 0

    def scat(arr, val):
        # one-hot masked-sum write (TPU-friendly, trackers/common.py)
        return birth_scatter(det2slot, birth, arr, val)

    init_mean, init_cov = jax.vmap(KF.initiate)(det_xyah)
    birth_ids = (st.next_id
                 + jnp.cumsum(birth.astype(jnp.int32), dtype=jnp.int32) - 1)
    st = st._replace(
        mean=scat(st.mean, init_mean),
        cov=scat(st.cov, init_cov),
        feat=scat(st.feat, feat),
        vis=scat(st.vis, vis),
        kps=scat(st.kps, kps),
        last_pred_ltrb=scat(st.last_pred_ltrb,
                            jnp.full((D, 4), jnp.nan,
                                     st.last_pred_ltrb.dtype)),
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

    # reference emits only tracks updated at the current frame
    # (strong_sort.py:96 'time_since_update > 0 -> skip')
    emit = (st.active & (st.tstate == CONFIRMED)
            & (st.time_since_update == 0))
    extras = {}
    if cfg.emit_costs:
        d_idx = jnp.arange(det.ltrb.shape[0])
        in_a = d2t_a >= 0
        in_b = d2t_b >= 0
        stage = jnp.where(in_a, 1, jnp.where(in_b, 2, 0))
        ca = stage_a_cost[d_idx, jnp.where(in_a, d2t_a, 0)]
        cb = (stage_b_cost[d_idx, jnp.where(in_b, d2t_b, 0)]
              if stage_b_cost is not None else jnp.zeros_like(ca))
        extras = dict(
            costs_r=app, costs_s=raw_motion, costs_k=gating,
            matched_stage=stage,
            matched_cost=jnp.where(in_a, ca,
                                   jnp.where(in_b, cb, jnp.inf)),
            cost_track_valid=cost_active, cost_track_id=cost_tid,
        )
    out = BPBReIDStrongSortOutput(
        ltrb=_mean_to_ltrb(st.mean),
        track_id=st.track_id + 1,
        cls=st.cls, conf=st.conf, ref=st.ref,
        hits=st.hits, age=st.age,
        time_since_update=st.time_since_update,
        pred_ltrb=st.last_pred_ltrb, tstate=st.tstate,
        valid=emit, **extras,
    )
    return st, out


def bpbreid_scan(cfg: BPBReIDStrongSortConfig, dets: Detections,
                 feat: jnp.ndarray, vis: jnp.ndarray,
                 kps: Optional[jnp.ndarray] = None,
                 warps: Optional[jnp.ndarray] = None,
                 init: BPBReIDStrongSortState | None = None,
                 resets: Optional[jnp.ndarray] = None):
    """Whole-video tracking. feat (F, D, P, E) part features,
    vis (F, D, P) visibility, kps (F, D, K, 3) keypoints (zeros fine for
    iou motion), warps optional (F, 2, 3)."""
    if init is None:
        init = bpbreid_init(cfg, dets.ltrb.dtype)
    F = dets.ltrb.shape[0]
    if kps is None:
        kps = jnp.zeros((F, dets.ltrb.shape[1], cfg.n_keypoints, 3),
                        dets.ltrb.dtype)
    if warps is None:
        warps = jnp.broadcast_to(jnp.eye(2, 3, dtype=dets.ltrb.dtype),
                                 (F, 2, 3))
    step = partial(bpbreid_step, cfg)
    if resets is not None:
        from tracklab_tpu.trackers.common import reset_wrapped_step
        return lax.scan(reset_wrapped_step(step, init), init,
                        ((dets, feat, vis, kps, warps), resets))
    return lax.scan(step, init, (dets, feat, vis, kps, warps))
