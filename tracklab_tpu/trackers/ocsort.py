"""OC-SORT as a jitted ``lax.scan`` step (TPU-native).

Re-design of the reference OC-SORT (plugins/track/oc_sort/ocsort.py:185-334
``OCSort.update`` + association.py:242-298 ``associate``) as a pure function
over fixed-capacity padded state:

  * Python list of ``KalmanBoxTracker`` objects  ->  slot arrays + masks
  * per-object filterpy KF                       ->  vmapped XYSRFilter
  * lap/scipy assignment on host                 ->  on-device JV solver with
    the reference's greedy-unique fast path (lax.cond skips the O(K^3) solve
    on unambiguous frames)
  * freeze/unfreeze ORU (kalmanfilter.py:383-432) -> functional replay from a
    frozen (x, P) snapshot
  * per-frame host round-trip                    ->  whole-video lax.scan

Semantics match the reference step-for-step: velocity-direction-consistency
cost, optional BYTE second stage on low-score detections, OCR recovery stage
on last observations, min_hits gating, max_age eviction, and the
"emit the matched detection box, not the KF box" output rule
(ocsort.py:316-327).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from tracklab_tpu.ops import boxes as B
from tracklab_tpu.ops.assignment import (
    greedy_unique_match, matching_forced,
)
from tracklab_tpu.ops.kalman import XYSRFilter as KF
from tracklab_tpu.trackers.common import (
    Detections, birth_scatter, claim_slots,
)

__all__ = ["OCSortConfig", "OCSortState", "OCSortOutput", "ocsort_init",
           "ocsort_step", "ocsort_scan"]

ASSO_FUNCS = {
    "iou": B.iou_matrix,
    "giou": B.giou_matrix,
    "diou": B.diou_matrix,
    "ciou": B.ciou_matrix,
}


@dataclass(frozen=True)
class OCSortConfig:
    """Mirrors the reference constructor defaults (ocsort.py:186-201) and the
    tuned values in tracklab/configs/modules/track/oc_sort.yaml."""
    det_thresh: float = 0.4432
    max_age: int = 50
    min_hits: int = 1
    iou_threshold: float = 0.2214
    delta_t: int = 3
    asso_func: str = "iou"
    inertia: float = 0.3941
    use_byte: bool = False
    # The vendored reference scales the velocity-direction cost by the
    # CLASS column, not confidence (association.py:259 reads detections
    # [:, -1] of the 6-column [ltrb, conf, cls] slice — an off-by-one
    # inherited from extending the upstream 5-column layout). The tracklab
    # pipeline feeds category_id == 1, making it a no-op scale there.
    # "category" reproduces the reference; "confidence" restores the
    # original OC-SORT intent.
    angle_cost_scale: str = "category"
    # capacities (static shapes)
    # vmap-safe mode for multi-video batching: replaces lax.cond
    # fast-path dispatch (which runs every branch for all lanes
    # under vmap) with cond-free rectangular JV solves. Identical
    # outputs; set True when vmapping the scan over a video axis.
    batched: bool = False
    max_tracks: int = 128
    max_dets: int = 64


class OCSortState(NamedTuple):
    kf_x: jnp.ndarray          # (T, 7)
    kf_P: jnp.ndarray          # (T, 7, 7)
    frozen_x: jnp.ndarray      # (T, 7) ORU snapshot
    frozen_P: jnp.ndarray      # (T, 7, 7)
    observed: jnp.ndarray      # (T,) bool — last update was a real obs
    has_frozen: jnp.ndarray    # (T,) bool — a freeze snapshot exists
    last_obs: jnp.ndarray      # (T, 5) ltrb+conf of last real observation
    has_obs: jnp.ndarray       # (T,) bool — ever observed (post-birth)
    last_obs_age: jnp.ndarray  # (T,) int32 age at last real observation
    obs_ring: jnp.ndarray      # (T, delta_t+1, 5) observation ring buffer
    ring_age: jnp.ndarray      # (T, delta_t+1) int32 age stored per slot (-1)
    velocity: jnp.ndarray      # (T, 2) (dy, dx); zeros when None
    age: jnp.ndarray           # (T,) int32
    time_since_update: jnp.ndarray  # (T,) int32
    hits: jnp.ndarray          # (T,) int32
    hit_streak: jnp.ndarray    # (T,) int32
    track_id: jnp.ndarray      # (T,) int32 (0-based; emitted +1)
    cls: jnp.ndarray           # (T,) float
    conf: jnp.ndarray          # (T,) float
    ref: jnp.ndarray           # (T,) int32 caller row id of last matched det
    active: jnp.ndarray        # (T,) bool
    next_id: jnp.ndarray       # () int32
    frame_count: jnp.ndarray   # () int32


class OCSortOutput(NamedTuple):
    """Per-frame emission, slot-indexed with a validity mask."""
    ltrb: jnp.ndarray   # (T, 4)
    track_id: jnp.ndarray  # (T,) int32, 1-based like the reference
    cls: jnp.ndarray    # (T,)
    conf: jnp.ndarray   # (T,)
    ref: jnp.ndarray    # (T,) int32 detection row id matched this frame
    valid: jnp.ndarray  # (T,) bool


def ocsort_init(cfg: OCSortConfig, dtype=jnp.float32) -> OCSortState:
    T, K = cfg.max_tracks, cfg.delta_t + 1
    i32 = jnp.int32
    return OCSortState(
        kf_x=jnp.zeros((T, 7), dtype),
        kf_P=jnp.zeros((T, 7, 7), dtype),
        frozen_x=jnp.zeros((T, 7), dtype),
        frozen_P=jnp.zeros((T, 7, 7), dtype),
        observed=jnp.zeros(T, bool),
        has_frozen=jnp.zeros(T, bool),
        last_obs=jnp.full((T, 5), -1.0, dtype),
        has_obs=jnp.zeros(T, bool),
        last_obs_age=jnp.zeros(T, i32),
        obs_ring=jnp.full((T, K, 5), -1.0, dtype),
        ring_age=jnp.full((T, K), -1, i32),
        velocity=jnp.zeros((T, 2), dtype),
        age=jnp.zeros(T, i32),
        time_since_update=jnp.zeros(T, i32),
        hits=jnp.zeros(T, i32),
        hit_streak=jnp.zeros(T, i32),
        track_id=jnp.zeros(T, i32),
        cls=jnp.zeros(T, dtype),
        conf=jnp.zeros(T, dtype),
        ref=jnp.full(T, -1, i32),
        active=jnp.zeros(T, bool),
        next_id=jnp.zeros((), i32),
        frame_count=jnp.zeros((), i32),
    )


def _k_previous_obs(st: OCSortState, cfg: OCSortConfig):
    """Vectorized ``k_previous_obs`` (ocsort.py:10-18): per track, the
    observation from delta_t frames ago, else the nearest more recent one,
    else the latest observation ever; placeholder -1s when none exist."""
    # Wanted: the observation at age - delta_t, else the nearest more
    # recent one — i.e. the slot with the SMALLEST stored age inside
    # [age - delta_t, age). The ring is tiny (K = delta_t + 1), so an
    # unrolled select over slots beats gathers by ~20x on TPU
    # (take_along_axis lowers to per-element dynamic slices; this is
    # pure vectorized selects).
    K = cfg.delta_t + 1
    cur = st.age                                         # (T,)
    fallback = jnp.where(st.has_obs[:, None], st.last_obs,
                         jnp.full_like(st.last_obs, -1.0))
    big = jnp.int32(2 ** 30)
    best_age = jnp.full_like(cur, big)
    best_obs = fallback
    for k in range(K):
        a = st.ring_age[:, k]                            # (T,)
        valid = (a >= 0) & (a >= cur - cfg.delta_t) & (a < cur)
        better = valid & (a < best_age)
        best_age = jnp.where(better, a, best_age)
        best_obs = jnp.where(better[:, None], st.obs_ring[:, k],
                             best_obs)
    return best_obs


def _speed_direction_cost(det_ltrb, det_scale, det_valid, k_obs, velocity,
                          trk_valid, inertia):
    """angle_diff_cost of associate() (association.py:246-265), (D, T).
    ``det_scale`` is the per-detection multiplier — the class column in
    reference-faithful mode (see OCSortConfig.angle_cost_scale)."""
    dcx = (det_ltrb[:, 0] + det_ltrb[:, 2]) * 0.5
    dcy = (det_ltrb[:, 1] + det_ltrb[:, 3]) * 0.5
    tcx = (k_obs[:, 0] + k_obs[:, 2]) * 0.5
    tcy = (k_obs[:, 1] + k_obs[:, 3]) * 0.5
    dx = dcx[None, :] - tcx[:, None]            # (T, D)
    dy = dcy[None, :] - tcy[:, None]
    norm = jnp.sqrt(dx * dx + dy * dy) + 1e-6
    X, Y = dx / norm, dy / norm
    cos = velocity[:, 1:2] * X + velocity[:, 0:1] * Y
    cos = jnp.clip(cos, -1.0, 1.0)
    diff_angle = (jnp.pi / 2.0 - jnp.abs(jnp.arccos(cos))) / jnp.pi
    valid_mask = (k_obs[:, 4] >= 0).astype(det_ltrb.dtype)[:, None]
    cost = (valid_mask * diff_angle) * inertia   # (T, D)
    cost = cost.T * det_scale[:, None]           # (D, T)
    return jnp.where(det_valid[:, None] & trk_valid[None, :], cost, 0.0)


def _associate(cfg, det_ltrb, det_scale, det_valid, trk_ltrb, trk_valid,
               k_obs, velocity):
    """First-round association (association.py:242-298). Returns
    det2trk (D,) int32 (-1 unmatched). A pair is kept only if its IoU clears
    iou_threshold, matching the reference's post-filter. Note the reference's
    stage-1 always scores with plain IoU (association.py:258); asso_func only
    applies to the BYTE/OCR recovery stages (ocsort.py:266,287)."""
    iou = B.iou_matrix(det_ltrb, trk_ltrb)
    pair_ok = det_valid[:, None] & trk_valid[None, :]
    iou = jnp.where(pair_ok, iou, 0.0)
    angle = _speed_direction_cost(det_ltrb, det_scale, det_valid, k_obs,
                                  velocity, trk_valid, cfg.inertia)

    if cfg.batched:
        # vmap-safe: no cond fast path (cond runs every branch for all
        # lanes under vmap); one rectangular JV solve
        det2trk = matching_forced(-(iou + angle), det_valid, trk_valid,
                                  batched=True)
    else:
        is_unique, greedy = greedy_unique_match(
            iou, det_valid, trk_valid, cfg.iou_threshold)
        # exact skip: the post-filter below drops every match whose IoU
        # is under iou_threshold, so when NO pair clears it the solver's
        # output is irrelevant — return all-unmatched without solving
        # (the max-birth regime: frames full of never-seen detections)
        none_feasible = jnp.max(iou) < cfg.iou_threshold

        def solve(_):
            return matching_forced(-(iou + angle), det_valid, trk_valid)

        det2trk = lax.cond(
            none_feasible,
            lambda _: jnp.full(det_ltrb.shape[0], -1, jnp.int32),
            lambda o: lax.cond(is_unique, lambda _: greedy, solve, o),
            None)
    # post-filter: drop matches with IoU below threshold
    d_idx = jnp.arange(det_ltrb.shape[0])
    got = det2trk >= 0
    safe = jnp.where(got, det2trk, 0)
    keep = got & (iou[d_idx, safe] >= cfg.iou_threshold)
    # NOTE: reference filter is `iou < thr -> drop` i.e. keep iou >= thr
    return jnp.where(keep, det2trk, -1)


def _recovery_match(cfg, det_ltrb, det_valid, trk_ltrb, trk_valid):
    """Shared shape of the BYTE (ocsort.py:264-282) and OCR
    (ocsort.py:284-306) stages: gated on max similarity, LSA on -sim,
    post-filter by iou_threshold. Uses cfg.asso_func like the reference.
    Returns det2trk (D,) int32."""
    iou = ASSO_FUNCS[cfg.asso_func](det_ltrb, trk_ltrb)
    pair_ok = det_valid[:, None] & trk_valid[None, :]
    iou = jnp.where(pair_ok, iou, 0.0)
    gate = jnp.max(iou) > cfg.iou_threshold

    def solve(_):
        det2trk = matching_forced(-iou, det_valid, trk_valid,
                                  batched=cfg.batched)
        d_idx = jnp.arange(det_ltrb.shape[0])
        got = det2trk >= 0
        safe = jnp.where(got, det2trk, 0)
        keep = got & (iou[d_idx, safe] >= cfg.iou_threshold)
        return jnp.where(keep, det2trk, -1)

    if cfg.batched:
        return jnp.where(gate, solve(None), -1)
    return lax.cond(
        gate, solve,
        lambda _: jnp.full(det_ltrb.shape[0], -1, jnp.int32), None)


def _apply_updates(cfg, st: OCSortState, det: Detections, trk2det):
    """KF update (+ ORU replay) and bookkeeping for matched tracks.

    trk2det: (T,) int32 — detection index matched to each track, -1 if none.
    """
    T = cfg.max_tracks
    matched = trk2det >= 0
    safe_det = jnp.where(matched, trk2det, 0)
    z_ltrb = det.ltrb[safe_det]                       # (T, 4)
    z_conf = det.conf[safe_det]
    z_cls = det.cls[safe_det]
    z_ref = det.ref[safe_det]
    z = B.ltrb_to_xysr(z_ltrb)                        # (T, 4)

    # --- ORU: tracks re-observed after a gap rewind to the frozen state ---
    # batched replay runs only to the largest needed gap this frame
    # (typically 1-3 steps), with per-track masking; no replay work at all
    # on frames with no re-observation (max_steps == 0).
    need_oru = matched & st.active & (~st.observed) & st.has_frozen
    gap = jnp.maximum(st.age - st.last_obs_age, 1)
    z_prev = B.ltrb_to_xysr(st.last_obs[:, :4])
    replay_x, replay_P = KF.oru_replay_batch(
        st.frozen_x, st.frozen_P, z_prev, z, gap, need_oru)
    base_x = jnp.where(need_oru[:, None], replay_x, st.kf_x)
    base_P = jnp.where(need_oru[:, None, None], replay_P, st.kf_P)

    # --- regular KF update on top ---
    upd_x, upd_P = KF.update_batch(base_x, base_P, z)
    new_x = jnp.where(matched[:, None], upd_x, st.kf_x)
    new_P = jnp.where(matched[:, None, None], upd_P, st.kf_P)

    # --- velocity from the delta_t-past observation (ocsort.py:117-129) ---
    k_obs_upd = _k_previous_obs(st, cfg)              # (T, 5) at current age
    # reference uses observations at age-dt (dt<=delta_t) else last_obs;
    # velocity only set when a previous observation exists
    prev_box = jnp.where(
        (k_obs_upd[:, 4] >= 0)[:, None], k_obs_upd[:, :4],
        st.last_obs[:, :4])
    pcx = (prev_box[:, 0] + prev_box[:, 2]) * 0.5
    pcy = (prev_box[:, 1] + prev_box[:, 3]) * 0.5
    ncx = (z_ltrb[:, 0] + z_ltrb[:, 2]) * 0.5
    ncy = (z_ltrb[:, 1] + z_ltrb[:, 3]) * 0.5
    d = jnp.stack([ncy - pcy, ncx - pcx], axis=1)
    speed = d / (jnp.linalg.norm(d, axis=1, keepdims=True) + 1e-6)
    set_vel = matched & st.has_obs
    velocity = jnp.where(set_vel[:, None], speed, st.velocity)

    # --- observation bookkeeping ---
    obs5 = jnp.concatenate([z_ltrb, z_conf[:, None]], axis=1)
    last_obs = jnp.where(matched[:, None], obs5, st.last_obs)
    K = cfg.delta_t + 1
    slot = jnp.mod(st.age, K)
    # per-row scatter into the tiny ring via a broadcast one-hot select
    # (avoids TPU-hostile dynamic per-row scatters; K = delta_t + 1)
    write = (jnp.arange(K, dtype=jnp.int32)[None, :]
             == slot[:, None]) & matched[:, None]        # (T, K)
    ring_obs = jnp.where(write[:, :, None], obs5[:, None, :],
                         st.obs_ring)
    ring_age = jnp.where(write, st.age[:, None], st.ring_age)

    return st._replace(
        kf_x=new_x, kf_P=new_P,
        observed=jnp.where(matched, True, st.observed),
        last_obs=last_obs,
        has_obs=st.has_obs | matched,
        last_obs_age=jnp.where(matched, st.age, st.last_obs_age),
        obs_ring=ring_obs, ring_age=ring_age,
        velocity=velocity,
        time_since_update=jnp.where(matched, 0, st.time_since_update),
        hits=st.hits + matched.astype(jnp.int32),
        hit_streak=st.hit_streak + matched.astype(jnp.int32),
        cls=jnp.where(matched, z_cls, st.cls),
        conf=jnp.where(matched, z_conf, st.conf),
        ref=jnp.where(matched, z_ref, st.ref),
    )


def _invert_match(det2trk, n_tracks):
    """det->trk map (D,) to trk->det map (T,)."""
    # one-hot select instead of a scatter (TPU-friendly); matched
    # tracks are unique so at most one det maps to each track
    sel = det2trk[:, None] == jnp.arange(n_tracks, dtype=jnp.int32)[None, :]
    hit = jnp.any(sel, axis=0)
    return jnp.where(hit, jnp.argmax(sel, axis=0).astype(jnp.int32), -1)


def ocsort_step(cfg: OCSortConfig, st: OCSortState, det: Detections):
    """One frame of OC-SORT; mirrors OCSort.update (ocsort.py:203-334)."""
    T = cfg.max_tracks
    st = st._replace(frame_count=st.frame_count + 1)

    conf = det.conf
    first_valid = det.valid & (conf > cfg.det_thresh)
    second_valid = det.valid & (conf > 0.1) & (conf < cfg.det_thresh)

    # --- predict all active tracks (ocsort.py:234-244) ---
    pred_x, pred_P = KF.predict_batch(st.kf_x, st.kf_P)
    pred_x = jnp.where(st.active[:, None], pred_x, st.kf_x)
    pred_P = jnp.where(st.active[:, None, None], pred_P, st.kf_P)
    trk_ltrb = KF.to_ltrb_batch(pred_x)               # (T, 4)
    finite = jnp.all(jnp.isfinite(trk_ltrb), axis=1)
    active = st.active & finite                        # NaN tracks dropped
    st = st._replace(
        kf_x=pred_x, kf_P=pred_P, active=active,
        age=st.age + active.astype(jnp.int32),
        hit_streak=jnp.where(st.time_since_update > 0, 0, st.hit_streak),
        time_since_update=st.time_since_update + active.astype(jnp.int32),
    )

    # --- stage 1: OCM association on high-score dets ---
    k_obs = _k_previous_obs(st, cfg)
    angle_scale = (det.cls if cfg.angle_cost_scale == "category"
                   else det.conf)
    det2trk = _associate(cfg, det.ltrb, angle_scale, first_valid,
                         trk_ltrb, st.active, k_obs, st.velocity)
    trk_matched_1 = _invert_match(det2trk, T) >= 0

    # --- stage 2 (BYTE, optional): low-score dets vs unmatched tracks ---
    if cfg.use_byte:
        u_trk = st.active & (~trk_matched_1)
        byte_d2t = _recovery_match(cfg, det.ltrb, second_valid,
                                   trk_ltrb, u_trk)
    else:
        byte_d2t = jnp.full(det.ltrb.shape[0], -1, jnp.int32)

    # --- stage 3 (OCR): unmatched dets vs unmatched tracks' last obs ---
    trk_matched_2 = trk_matched_1 | (_invert_match(byte_d2t, T) >= 0)
    u_det = first_valid & (det2trk < 0)
    u_trk = st.active & (~trk_matched_2)
    ocr_d2t = _recovery_match(cfg, det.ltrb, u_det,
                              st.last_obs[:, :4], u_trk & st.has_obs)

    # Combine: each det matched in at most one stage; each trk too.
    combined_d2t = jnp.where(det2trk >= 0, det2trk,
                             jnp.where(byte_d2t >= 0, byte_d2t, ocr_d2t))
    trk2det = _invert_match(combined_d2t, T)
    trk2det = jnp.where(st.active, trk2det, -1)

    # --- freeze ORU snapshots for tracks going unobserved this frame ---
    unmatched_trk = st.active & (trk2det < 0)
    freeze_now = unmatched_trk & st.observed
    st = st._replace(
        frozen_x=jnp.where(freeze_now[:, None], st.kf_x, st.frozen_x),
        frozen_P=jnp.where(freeze_now[:, None, None], st.kf_P, st.frozen_P),
        has_frozen=st.has_frozen | freeze_now,
        observed=jnp.where(unmatched_trk, False, st.observed),
    )

    # --- matched-track updates (KF + ORU + bookkeeping) ---
    st = _apply_updates(cfg, st, det, trk2det)

    # --- births: unmatched high-score dets claim free slots ---
    still_unmatched = first_valid & (combined_d2t < 0)
    det2slot = claim_slots(~st.active, still_unmatched)
    D = det.ltrb.shape[0]
    birth = det2slot >= 0
    n_birth = jnp.sum(birth, dtype=jnp.int32)

    def scat(arr, val):
        # one-hot masked-sum write (TPU-friendly, trackers/common.py)
        return birth_scatter(det2slot, birth, arr, val)

    z0 = B.ltrb_to_xysr(det.ltrb)
    init_x = jax.vmap(lambda z: jnp.zeros(7, st.kf_x.dtype).at[:4].set(z))(z0)
    _, _, _, P0, _ = KF.constants(st.kf_x.dtype)
    birth_ids = (st.next_id
                 + jnp.cumsum(birth.astype(jnp.int32), dtype=jnp.int32)
                 - 1)  # det-order ids
    st = st._replace(
        kf_x=scat(st.kf_x, init_x),
        kf_P=scat(st.kf_P, jnp.broadcast_to(P0, (D, 7, 7))),
        frozen_x=scat(st.frozen_x, jnp.zeros((D, 7), st.kf_x.dtype)),
        frozen_P=scat(st.frozen_P, jnp.zeros((D, 7, 7), st.kf_x.dtype)),
        observed=scat(st.observed, jnp.zeros(D, bool)),
        has_frozen=scat(st.has_frozen, jnp.zeros(D, bool)),
        last_obs=scat(st.last_obs, jnp.full((D, 5), -1.0, st.kf_x.dtype)),
        has_obs=scat(st.has_obs, jnp.zeros(D, bool)),
        last_obs_age=scat(st.last_obs_age, jnp.zeros(D, jnp.int32)),
        obs_ring=scat(st.obs_ring,
                      jnp.full((D, cfg.delta_t + 1, 5), -1.0, st.kf_x.dtype)),
        ring_age=scat(st.ring_age,
                      jnp.full((D, cfg.delta_t + 1), -1, jnp.int32)),
        velocity=scat(st.velocity, jnp.zeros((D, 2), st.kf_x.dtype)),
        age=scat(st.age, jnp.zeros(D, jnp.int32)),
        time_since_update=scat(st.time_since_update,
                               jnp.zeros(D, jnp.int32)),
        hits=scat(st.hits, jnp.zeros(D, jnp.int32)),
        hit_streak=scat(st.hit_streak, jnp.zeros(D, jnp.int32)),
        track_id=scat(st.track_id, birth_ids),
        cls=scat(st.cls, det.cls),
        conf=scat(st.conf, det.conf),
        ref=scat(st.ref, det.ref),
        active=scat(st.active, birth),
        next_id=st.next_id + n_birth,
    )

    # --- emit (ocsort.py:315-331) ---
    emit = (st.active & (st.time_since_update < 1)
            & ((st.hit_streak >= cfg.min_hits)
               | (st.frame_count <= cfg.min_hits)))
    kf_box = KF.to_ltrb_batch(st.kf_x)
    out_box = jnp.where(st.has_obs[:, None], st.last_obs[:, :4], kf_box)
    out = OCSortOutput(
        ltrb=out_box,
        track_id=st.track_id + 1,
        cls=st.cls, conf=st.conf, ref=st.ref,
        valid=emit,
    )

    # --- evict dead tracks (ocsort.py:330-331) ---
    st = st._replace(
        active=st.active & (st.time_since_update <= cfg.max_age))
    return st, out


def ocsort_scan(cfg: OCSortConfig, dets: Detections,
                init: OCSortState | None = None,
                resets: jnp.ndarray | None = None):
    """Track a whole padded video: ``dets`` pytree with leading frame axis.

    Returns (final_state, OCSortOutput with leading frame axis). Jitted by
    the caller; this is the reference video_loop collapsed into one XLA
    program (engine/offline.py:10-35 -> lax.scan).
    """
    if init is None:
        init = ocsort_init(cfg, dets.ltrb.dtype)
    step = partial(ocsort_step, cfg)
    if resets is not None:
        from tracklab_tpu.trackers.common import reset_wrapped_step
        return lax.scan(reset_wrapped_step(step, init), init,
                        (dets, resets))
    return lax.scan(step, init, dets)
