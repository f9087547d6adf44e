"""Deep-OC-SORT as a jitted ``lax.scan`` step (TPU-native).

Re-design of the reference Deep-OC-SORT (plugins/track/deep_oc_sort/
ocsort.py:96-535 + association.py:263-364): OC-SORT's motion machinery
plus appearance:

  * "new KF": 8-dim [x, y, w, h, v*] filter with per-step process noise
    Q(w, h) and measurement noise R(w, h) (ocsort.py:82-93), P0 = Q with
    position x4 / velocity x100, Joseph-form updates, negative-size guards
    and frozen-velocity zeroing at predict (ocsort.py:274-295)
  * stage-1 cost = -(iou + velocity-direction + adaptively-weighted
    embedding similarity): emb zeroed where IoU <= 0, per-row/column
    top-2-ratio weighting (compute_aw_max_metric, association.py:263-289)
  * confidence-adaptive EMA on track embeddings:
    alpha = af + (1-af) * (1 - (conf - det_thresh)/(1 - det_thresh))
    (ocsort.py:414-419, update_emb :248-250)
  * CMC: per-frame affine warps applied to KF state (kron(I4, R)),
    frozen ORU snapshot, last observation and the observation ring
    (ocsort.py:255-272, kalmanfilter.py:387-405)
  * OCR second stage on last observations (IoU only — the reference
    computes emb_cost_left but never uses it, ocsort.py:480-484)

One documented deviation: the reference's ORU virtual-trajectory replay
under new_kf decodes its xywh measurement history through the legacy
(x, y, s, r) formulas (kalmanfilter.py:444-469), feeding mathematically
inconsistent virtual measurements. This implementation interpolates the
xywh measurements directly (the evident intent); the divergence only
affects the smoothing replay after an occlusion gap.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from tracklab_tpu.ops import boxes as B
from tracklab_tpu.ops.assignment import greedy_unique_match, matching_forced
from tracklab_tpu.ops.embeddings import normalize_rows
from tracklab_tpu.trackers.common import birth_scatter, Detections, claim_slots
from tracklab_tpu.trackers.ocsort import ASSO_FUNCS

__all__ = ["DeepOCSortConfig", "DeepOCSortState", "DeepOCSortOutput",
           "deepocsort_init", "deepocsort_step", "deepocsort_scan"]


# ---------------------------------------------------------------------------
# "new KF": xywh with dynamic noise (ocsort.py:82-93,116-145)
# ---------------------------------------------------------------------------

def _nkf_mats(dtype):
    F = jnp.eye(8, dtype=dtype) + jnp.eye(8, k=4, dtype=dtype)
    H = jnp.eye(4, 8, dtype=dtype)
    return F, H


def _nkf_Q(w, h, dtype):
    p, v = 1.0 / 20, 1.0 / 160
    return jnp.diag(jnp.stack([
        (p * w) ** 2, (p * h) ** 2, (p * w) ** 2, (p * h) ** 2,
        (v * w) ** 2, (v * h) ** 2, (v * w) ** 2, (v * h) ** 2,
    ]).astype(dtype))


def _nkf_R(w, h, dtype):
    m = 1.0 / 20
    wv = (m * w) ** 2
    hv = (m * h) ** 2
    return jnp.diag(jnp.stack([wv, hv, wv, hv]).astype(dtype))


def _nkf_initiate(z, dtype):
    x = jnp.zeros(8, dtype).at[:4].set(z)
    P = _nkf_Q(z[2], z[3], dtype)
    P = P.at[:4, :4].multiply(4.0)
    P = P.at[4:, 4:].multiply(100.0)
    return x, P


def _nkf_predict(x, P, frozen):
    """Negative-size guards + frozen velocity zeroing + dynamic Q.
    F = I + shift(4): slice-adds instead of 8x8 matmuls
    (ops/kalman._shift4_predict)."""
    from tracklab_tpu.ops.kalman import _shift4_predict
    dtype = x.dtype
    vw = jnp.where(x[2] + x[6] <= 0, 0.0, x[6])
    vh = jnp.where(x[3] + x[7] <= 0, 0.0, x[7])
    vw = jnp.where(frozen, 0.0, vw)
    vh = jnp.where(frozen, 0.0, vh)
    x = x.at[6].set(vw).at[7].set(vh)
    Q = _nkf_Q(x[2], x[3], dtype)
    return _shift4_predict(x, P, Q)


def _nkf_update(x, P, z):
    """Joseph-form update with R from the current (prior) state size.
    H = [I4 | 0] and R diagonal, so S inverts in closed form
    (ops/kalman._inv4) and the Joseph product reduces to three small
    matmuls — same algebra, no batched LU under vmap."""
    from tracklab_tpu.ops.kalman import _inv4
    dtype = x.dtype
    R = _nkf_R(x[2], x[3], dtype)
    r = jnp.diagonal(R)
    y = z - x[:4]
    PHT = P[:, :4]
    S = P[:4, :4] + R
    K = PHT @ _inv4(S)
    x_new = x + K @ y
    A = P - K @ P[:4, :]
    P_new = A - A[:, :4] @ K.T + (K * r[None, :]) @ K.T
    return x_new, P_new


def _nkf_oru_replay_batch(x_f, P_f, z_prev, z_new, gap, need):
    """Batched linear xywh replay, bounded by the largest needed gap this
    frame (clean-space variant — see module docstring). Shapes: (T, 8),
    (T, 8, 8), (T, 4), (T, 4), (T,), (T,)."""
    dtype = x_f.dtype
    tg = jnp.maximum(gap, 1).astype(dtype)[:, None]
    dz = (z_new - z_prev) / tg
    max_steps = jnp.max(jnp.where(need, gap, 0))
    upd = jax.vmap(_nkf_update)
    pred = jax.vmap(lambda x, P: _nkf_predict(x, P, jnp.asarray(False)))

    def cond(carry):
        i, _, _ = carry
        return i < max_steps

    def body(carry):
        i, x, P = carry
        active = need & (i < gap)
        t = (i + 1).astype(dtype)
        vz = z_prev + t * dz
        x_u, P_u = upd(x, P, vz)
        do_pred = active & (i < gap - 1)
        x_p, P_p = pred(x_u, P_u)
        x_next = jnp.where(do_pred[:, None], x_p, x_u)
        P_next = jnp.where(do_pred[:, None, None], P_p, P_u)
        x = jnp.where(active[:, None], x_next, x)
        P = jnp.where(active[:, None, None], P_next, P)
        return i + 1, x, P

    _, x, P = lax.while_loop(cond, body, (jnp.int32(0), x_f, P_f))
    return x, P


# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class DeepOCSortConfig:
    """Defaults mirror tracklab/configs/modules/track/deep_oc_sort.yaml."""
    det_thresh: float = 0.0
    max_age: int = 50
    min_hits: int = 1
    iou_threshold: float = 0.2214
    delta_t: int = 1
    asso_func: str = "giou"
    inertia: float = 0.3942
    w_association_emb: float = 0.75
    alpha_fixed_emb: float = 0.95
    aw_param: float = 0.5
    embedding_off: bool = False
    aw_off: bool = False
    # see OCSortConfig.angle_cost_scale — same vendored off-by-one here
    # (deep_oc_sort/association.py:314)
    angle_cost_scale: str = "category"
    embed_dim: int = 512
    # vmap-safe mode for multi-video batching: replaces lax.cond
    # fast-path dispatch (which runs every branch for all lanes
    # under vmap) with cond-free rectangular JV solves. Identical
    # outputs; set True when vmapping the scan over a video axis.
    batched: bool = False
    max_tracks: int = 128
    max_dets: int = 64


class DeepOCSortState(NamedTuple):
    kf_x: jnp.ndarray          # (T, 8)
    kf_P: jnp.ndarray          # (T, 8, 8)
    frozen_x: jnp.ndarray
    frozen_P: jnp.ndarray
    frozen_z: jnp.ndarray      # (T, 4) last real measurement (xywh)
    observed: jnp.ndarray
    has_frozen: jnp.ndarray
    emb: jnp.ndarray           # (T, E) normalized track embedding
    last_obs: jnp.ndarray      # (T, 5)
    has_obs: jnp.ndarray
    last_obs_age: jnp.ndarray
    obs_ring: jnp.ndarray      # (T, delta_t+1, 5)
    ring_age: jnp.ndarray
    velocity: jnp.ndarray
    age: jnp.ndarray
    time_since_update: jnp.ndarray
    hits: jnp.ndarray
    hit_streak: jnp.ndarray
    track_id: jnp.ndarray
    cls: jnp.ndarray
    conf: jnp.ndarray
    ref: jnp.ndarray
    active: jnp.ndarray
    next_id: jnp.ndarray
    frame_count: jnp.ndarray


class DeepOCSortOutput(NamedTuple):
    ltrb: jnp.ndarray
    track_id: jnp.ndarray
    cls: jnp.ndarray
    conf: jnp.ndarray
    ref: jnp.ndarray
    valid: jnp.ndarray


def deepocsort_init(cfg: DeepOCSortConfig,
                    dtype=jnp.float32) -> DeepOCSortState:
    T, K, E = cfg.max_tracks, cfg.delta_t + 1, cfg.embed_dim
    i32 = jnp.int32
    return DeepOCSortState(
        kf_x=jnp.zeros((T, 8), dtype),
        kf_P=jnp.zeros((T, 8, 8), dtype),
        frozen_x=jnp.zeros((T, 8), dtype),
        frozen_P=jnp.zeros((T, 8, 8), dtype),
        frozen_z=jnp.zeros((T, 4), dtype),
        observed=jnp.zeros(T, bool),
        has_frozen=jnp.zeros(T, bool),
        emb=jnp.zeros((T, E), dtype),
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


def _x_to_ltrb(x):
    return jnp.stack([x[:, 0] - x[:, 2] / 2, x[:, 1] - x[:, 3] / 2,
                      x[:, 0] + x[:, 2] / 2, x[:, 1] + x[:, 3] / 2],
                     axis=1)


def _aw_weight(emb_cost, valid, w_emb: float, bottom: float):
    """compute_aw_max_metric (association.py:263-289), vectorized with
    capacity masking: invalid entries excluded from top-2 selection; rows/
    cols with < 2 valid entries keep the base weight."""
    NEG = -1e9

    def axis_weight(mat, axis_valid_count, masked):
        top2 = lax.top_k(masked, 2)[0]          # sorted desc
        first, second = top2[..., 0], top2[..., 1]
        ratio = jnp.where(first != 0, second / first, 0.0)
        weight = 1.0 - jnp.clip(ratio - bottom, 0.0, None) / (1.0 - bottom)
        weight = jnp.where(first == 0, 0.0, weight)
        weight = jnp.where(axis_valid_count < 2, 1.0, weight)
        return weight

    masked = jnp.where(valid, emb_cost, NEG)
    n_col_valid = jnp.sum(valid, axis=1)        # valid cols per row
    row_w = axis_weight(emb_cost, n_col_valid, masked)          # (D,)
    n_row_valid = jnp.sum(valid, axis=0)
    col_w = axis_weight(emb_cost.T, n_row_valid, masked.T)      # (T,)
    w = w_emb * row_w[:, None] * col_w[None, :]
    return w * emb_cost


def _k_previous_obs(st, cfg):
    # smallest stored age inside [age - delta_t, age); unrolled selects
    # over the tiny ring instead of TPU-hostile gathers (see
    # trackers/ocsort.py:_k_previous_obs — ~20x per-step).
    K = cfg.delta_t + 1
    cur = st.age
    fallback = jnp.where(st.has_obs[:, None], st.last_obs,
                         jnp.full_like(st.last_obs, -1.0))
    big = jnp.int32(2 ** 30)
    best_age = jnp.full_like(cur, big)
    best_obs = fallback
    for k in range(K):
        a = st.ring_age[:, k]
        valid = (a >= 0) & (a >= cur - cfg.delta_t) & (a < cur)
        better = valid & (a < best_age)
        best_age = jnp.where(better, a, best_age)
        best_obs = jnp.where(better[:, None], st.obs_ring[:, k],
                             best_obs)
    return best_obs


def _speed_cost(det_ltrb, det_scale, det_valid, k_obs, velocity, trk_valid,
                inertia):
    dcx = (det_ltrb[:, 0] + det_ltrb[:, 2]) * 0.5
    dcy = (det_ltrb[:, 1] + det_ltrb[:, 3]) * 0.5
    tcx = (k_obs[:, 0] + k_obs[:, 2]) * 0.5
    tcy = (k_obs[:, 1] + k_obs[:, 3]) * 0.5
    dx = dcx[None, :] - tcx[:, None]
    dy = dcy[None, :] - tcy[:, None]
    norm = jnp.sqrt(dx * dx + dy * dy) + 1e-6
    cos = velocity[:, 1:2] * (dx / norm) + velocity[:, 0:1] * (dy / norm)
    diff = (jnp.pi / 2 - jnp.abs(jnp.arccos(jnp.clip(cos, -1, 1)))) / jnp.pi
    vmask = (k_obs[:, 4] >= 0).astype(det_ltrb.dtype)[:, None]
    cost = ((vmask * diff) * inertia).T * det_scale[:, None]
    return jnp.where(det_valid[:, None] & trk_valid[None, :], cost, 0.0)


def _warp_boxes5(boxes5, warp, mask):
    """Apply affine warp to ltrb+conf rows (ocsort.py:255-270)."""
    m = warp[:2, :2]
    t = warp[:2, 2]
    p1 = boxes5[..., 0:2] @ m.T + t
    p2 = boxes5[..., 2:4] @ m.T + t
    warped = jnp.concatenate([p1, p2, boxes5[..., 4:5]], axis=-1)
    return jnp.where(mask[..., None], warped, boxes5)


def deepocsort_step(cfg: DeepOCSortConfig, st: DeepOCSortState, inputs):
    det, emb, warp = inputs
    T = cfg.max_tracks
    st = st._replace(frame_count=st.frame_count + 1)
    dtype = st.kf_x.dtype

    keep = det.valid & (det.conf > cfg.det_thresh)
    emb_n = jnp.where(
        jnp.linalg.norm(emb, axis=1, keepdims=True) > 1e-6,
        normalize_rows(emb), jnp.zeros_like(emb))

    # detection EMA alphas (ocsort.py:414-419)
    trust = (det.conf - cfg.det_thresh) / (1.0 - cfg.det_thresh)
    af = cfg.alpha_fixed_emb
    det_alpha = af + (1 - af) * (1 - trust)

    # --- CMC on state, frozen snapshot, observations (ocsort.py:255-272)
    m2 = warp[:2, :2]
    tvec = warp[:2, 2]
    big_m = jnp.kron(jnp.eye(4, dtype=dtype), m2)
    new_x = st.kf_x @ big_m.T
    new_x = new_x.at[:, 0:2].add(tvec)
    new_P = jnp.einsum("ij,tjk,lk->til", big_m, st.kf_P, big_m)
    fro_x = st.frozen_x @ big_m.T
    fro_x = fro_x.at[:, 0:2].add(tvec)
    fro_P = jnp.einsum("ij,tjk,lk->til", big_m, st.frozen_P, big_m)
    fro_z = jnp.concatenate([
        st.frozen_z[:, 0:2] @ m2.T + tvec,
        st.frozen_z[:, 2:4] @ m2.T], axis=1)
    act = st.active
    st = st._replace(
        kf_x=jnp.where(act[:, None], new_x, st.kf_x),
        kf_P=jnp.where(act[:, None, None], new_P, st.kf_P),
        frozen_x=jnp.where((act & st.has_frozen)[:, None], fro_x,
                           st.frozen_x),
        frozen_P=jnp.where((act & st.has_frozen)[:, None, None], fro_P,
                           st.frozen_P),
        frozen_z=jnp.where((act & st.has_frozen)[:, None], fro_z,
                           st.frozen_z),
        last_obs=_warp_boxes5(st.last_obs, warp, act & st.has_obs),
        obs_ring=_warp_boxes5(
            st.obs_ring, warp,
            act[:, None] & (st.ring_age >= 0)),
    )

    # --- predict (frozen tracks get velocities zeroed) ---
    pred_x, pred_P = jax.vmap(_nkf_predict)(
        st.kf_x, st.kf_P, ~st.observed & st.has_obs)
    pred_x = jnp.where(st.active[:, None], pred_x, st.kf_x)
    pred_P = jnp.where(st.active[:, None, None], pred_P, st.kf_P)
    trk_ltrb = _x_to_ltrb(pred_x)
    finite = jnp.all(jnp.isfinite(trk_ltrb), axis=1)
    active = st.active & finite
    st = st._replace(
        kf_x=pred_x, kf_P=pred_P, active=active,
        age=st.age + active.astype(jnp.int32),
        hit_streak=jnp.where(st.time_since_update > 0, 0, st.hit_streak),
        time_since_update=(st.time_since_update
                           + active.astype(jnp.int32)),
    )

    # --- stage 1 ---
    k_obs = _k_previous_obs(st, cfg)
    iou = B.iou_matrix(det.ltrb, trk_ltrb)
    pair_ok = keep[:, None] & st.active[None, :]
    iou = jnp.where(pair_ok, iou, 0.0)
    angle_scale = (det.cls if cfg.angle_cost_scale == "category"
                   else det.conf)
    angle = _speed_cost(det.ltrb, angle_scale, keep, k_obs, st.velocity,
                        st.active, cfg.inertia)
    if cfg.embedding_off:
        emb_term = jnp.zeros_like(iou)
    else:
        emb_sim = emb_n @ st.emb.T                       # (D, T)
        emb_sim = jnp.where(iou <= 0, 0.0, emb_sim)
        emb_sim = jnp.where(pair_ok, emb_sim, 0.0)
        if cfg.aw_off:
            emb_term = emb_sim * cfg.w_association_emb
        else:
            emb_term = _aw_weight(emb_sim, pair_ok,
                                  cfg.w_association_emb, cfg.aw_param)

    if cfg.batched:
        det2trk = matching_forced(-(iou + angle + emb_term), keep,
                                  st.active, batched=True)
    else:
        is_unique, greedy = greedy_unique_match(iou, keep, st.active,
                                                cfg.iou_threshold)
        det2trk = lax.cond(
            is_unique, lambda _: greedy,
            lambda _: matching_forced(-(iou + angle + emb_term), keep,
                                      st.active), None)
    d_idx = jnp.arange(det.ltrb.shape[0])
    got = det2trk >= 0
    safe = jnp.where(got, det2trk, 0)
    det2trk = jnp.where(got & (iou[d_idx, safe] >= cfg.iou_threshold),
                        det2trk, -1)
    trk_matched_1 = _invert(det2trk, T) >= 0

    # --- OCR stage (iou/asso_func on last observations) ---
    u_det = keep & (det2trk < 0)
    u_trk = st.active & (~trk_matched_1)
    sim2 = ASSO_FUNCS[cfg.asso_func](det.ltrb, st.last_obs[:, :4])
    ok2 = u_det[:, None] & (u_trk & st.has_obs)[None, :]
    sim2 = jnp.where(ok2, sim2, 0.0)
    gate = jnp.max(sim2) > cfg.iou_threshold

    def solve_ocr(_):
        d2t = matching_forced(-sim2, u_det, u_trk & st.has_obs,
                              batched=cfg.batched)
        g = d2t >= 0
        s = jnp.where(g, d2t, 0)
        return jnp.where(g & (sim2[d_idx, s] >= cfg.iou_threshold),
                         d2t, -1)

    if cfg.batched:
        ocr_d2t = jnp.where(gate, solve_ocr(None), -1)
    else:
        ocr_d2t = lax.cond(gate, solve_ocr,
                           lambda _: jnp.full(det.ltrb.shape[0], -1,
                                              jnp.int32), None)

    combined = jnp.where(det2trk >= 0, det2trk, ocr_d2t)
    trk2det = _invert(combined, T)
    trk2det = jnp.where(st.active, trk2det, -1)
    matched = trk2det >= 0

    # --- freeze snapshots for tracks going unobserved ---
    unmatched_trk = st.active & (~matched)
    freeze_now = unmatched_trk & st.observed
    st = st._replace(
        frozen_x=jnp.where(freeze_now[:, None], st.kf_x, st.frozen_x),
        frozen_P=jnp.where(freeze_now[:, None, None], st.kf_P,
                           st.frozen_P),
        has_frozen=st.has_frozen | freeze_now,
        observed=jnp.where(unmatched_trk, False, st.observed),
    )

    # --- matched updates (ORU + KF + emb EMA + bookkeeping) ---
    safe_t = jnp.where(matched, trk2det, 0)
    z_ltrb = det.ltrb[safe_t]
    z = B.ltrb_to_xywh(z_ltrb)
    need_oru = matched & st.active & (~st.observed) & st.has_frozen
    gap = jnp.maximum(st.age - st.last_obs_age, 1)
    rep_x, rep_P = _nkf_oru_replay_batch(
        st.frozen_x, st.frozen_P, st.frozen_z, z, gap, need_oru)
    base_x = jnp.where(need_oru[:, None], rep_x, st.kf_x)
    base_P = jnp.where(need_oru[:, None, None], rep_P, st.kf_P)
    upd_x, upd_P = jax.vmap(_nkf_update)(base_x, base_P, z)

    # velocity from delta_t-past observation
    k_obs_u = _k_previous_obs(st, cfg)
    prev_box = jnp.where((k_obs_u[:, 4] >= 0)[:, None], k_obs_u[:, :4],
                         st.last_obs[:, :4])
    pcx = (prev_box[:, 0] + prev_box[:, 2]) * 0.5
    pcy = (prev_box[:, 1] + prev_box[:, 3]) * 0.5
    ncx = (z_ltrb[:, 0] + z_ltrb[:, 2]) * 0.5
    ncy = (z_ltrb[:, 1] + z_ltrb[:, 3]) * 0.5
    d = jnp.stack([ncy - pcy, ncx - pcx], axis=1)
    speed = d / (jnp.linalg.norm(d, axis=1, keepdims=True) + 1e-6)
    set_vel = matched & st.has_obs

    # embedding EMA with per-detection alpha (update_emb)
    alpha_t = det_alpha[safe_t][:, None]
    new_emb = normalize_rows(
        alpha_t * st.emb + (1 - alpha_t) * emb_n[safe_t])
    has_new_emb = matched & (jnp.linalg.norm(emb_n[safe_t], axis=1) > 1e-6)

    obs5 = jnp.concatenate([z_ltrb, det.conf[safe_t][:, None]], axis=1)
    K = cfg.delta_t + 1
    slot_r = jnp.mod(st.age, K)
    # one-hot broadcast write into the tiny ring (no per-row scatters)
    write_r = (jnp.arange(K, dtype=jnp.int32)[None, :]
               == slot_r[:, None])                       # (T, K)
    scattered = jnp.where(write_r[:, :, None], obs5[:, None, :],
                          st.obs_ring)
    scattered_age = jnp.where(write_r, st.age[:, None], st.ring_age)

    st = st._replace(
        kf_x=jnp.where(matched[:, None], upd_x, st.kf_x),
        kf_P=jnp.where(matched[:, None, None], upd_P, st.kf_P),
        frozen_z=jnp.where(matched[:, None], z, st.frozen_z),
        observed=st.observed | matched,
        emb=jnp.where(has_new_emb[:, None], new_emb, st.emb),
        last_obs=jnp.where(matched[:, None], obs5, st.last_obs),
        has_obs=st.has_obs | matched,
        last_obs_age=jnp.where(matched, st.age, st.last_obs_age),
        obs_ring=jnp.where(matched[:, None, None], scattered,
                           st.obs_ring),
        ring_age=jnp.where(matched[:, None], scattered_age, st.ring_age),
        velocity=jnp.where(set_vel[:, None], speed, st.velocity),
        time_since_update=jnp.where(matched, 0, st.time_since_update),
        hits=st.hits + matched.astype(jnp.int32),
        hit_streak=st.hit_streak + matched.astype(jnp.int32),
        cls=jnp.where(matched, det.cls[safe_t], st.cls),
        # the reference never refreshes conf after birth — KalmanBoxTracker
        # sets self.conf only in __init__ (deep_oc_sort/ocsort.py:114),
        # unlike oc_sort; verified by test_reference_parity.py
        ref=jnp.where(matched, det.ref[safe_t], st.ref),
    )

    # --- births ---
    still_unmatched = keep & (combined < 0)
    det2slot = claim_slots(~st.active, still_unmatched)
    D = det.ltrb.shape[0]
    birth = det2slot >= 0

    def scat(arr, val):
        # one-hot masked-sum write (TPU-friendly, trackers/common.py)
        return birth_scatter(det2slot, birth, arr, val)

    z_all = B.ltrb_to_xywh(det.ltrb)
    init_x, init_P = jax.vmap(partial(_nkf_initiate, dtype=dtype))(z_all)
    birth_ids = (st.next_id
                 + jnp.cumsum(birth.astype(jnp.int32), dtype=jnp.int32) - 1)
    E = cfg.embed_dim
    st = st._replace(
        kf_x=scat(st.kf_x, init_x),
        kf_P=scat(st.kf_P, init_P),
        frozen_x=scat(st.frozen_x, jnp.zeros((D, 8), dtype)),
        frozen_P=scat(st.frozen_P, jnp.zeros((D, 8, 8), dtype)),
        frozen_z=scat(st.frozen_z, z_all),
        observed=scat(st.observed, jnp.zeros(D, bool)),
        has_frozen=scat(st.has_frozen, jnp.zeros(D, bool)),
        emb=scat(st.emb, emb_n),
        last_obs=scat(st.last_obs, jnp.full((D, 5), -1.0, dtype)),
        has_obs=scat(st.has_obs, jnp.zeros(D, bool)),
        last_obs_age=scat(st.last_obs_age, jnp.zeros(D, jnp.int32)),
        obs_ring=scat(st.obs_ring,
                      jnp.full((D, cfg.delta_t + 1, 5), -1.0, dtype)),
        ring_age=scat(st.ring_age,
                      jnp.full((D, cfg.delta_t + 1), -1, jnp.int32)),
        velocity=scat(st.velocity, jnp.zeros((D, 2), dtype)),
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
        next_id=st.next_id + jnp.sum(birth, dtype=jnp.int32),
    )

    # --- emit + evict ---
    # Unlike oc_sort, the reference's main update() never increments
    # frame_count (only the unused update_public does, ocsort.py:559), so
    # 'frame_count <= min_hits' at ocsort.py:525 is always true and
    # min_hits is effectively DISABLED: every track updated this frame is
    # emitted from birth. Verified by test_reference_parity.py.
    emit = st.active & (st.time_since_update < 1)
    kf_box = _x_to_ltrb(st.kf_x)
    out_box = jnp.where(st.has_obs[:, None], st.last_obs[:, :4], kf_box)
    out = DeepOCSortOutput(
        ltrb=out_box, track_id=st.track_id + 1, cls=st.cls, conf=st.conf,
        ref=st.ref, valid=emit,
    )
    st = st._replace(
        active=st.active & (st.time_since_update <= cfg.max_age))
    return st, out


def _invert(det2trk, T):
    # one-hot select instead of a scatter (TPU-friendly); matched
    # tracks are unique so at most one det maps to each track
    sel = det2trk[:, None] == jnp.arange(T, dtype=jnp.int32)[None, :]
    hit = jnp.any(sel, axis=0)
    return jnp.where(hit, jnp.argmax(sel, axis=0).astype(jnp.int32), -1)


def deepocsort_scan(cfg: DeepOCSortConfig, dets: Detections,
                    emb: jnp.ndarray,
                    warps: Optional[jnp.ndarray] = None,
                    init: DeepOCSortState | None = None,
                    resets: Optional[jnp.ndarray] = None):
    if init is None:
        init = deepocsort_init(cfg, dets.ltrb.dtype)
    F = dets.ltrb.shape[0]
    if warps is None:
        warps = jnp.broadcast_to(jnp.eye(2, 3, dtype=dets.ltrb.dtype),
                                 (F, 2, 3))
    step = partial(deepocsort_step, cfg)
    if resets is not None:
        from tracklab_tpu.trackers.common import reset_wrapped_step
        return lax.scan(reset_wrapped_step(step, init), init,
                        ((dets, emb, warps), resets))
    return lax.scan(step, init, (dets, emb, warps))
