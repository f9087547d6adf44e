"""Batched Kalman filters for track motion models (pure JAX).

Three filters cover the whole reference tracker suite:

  * :class:`XYSRFilter` — 7-dim constant-velocity filter on
    [x, y, s=area, r=aspect, vx, vy, vs], the OC-SORT motion model
    (reference: plugins/track/oc_sort/ocsort.py:57-169 KalmanBoxTracker and
    the vendored filterpy-style KalmanFilterNew in
    plugins/track/oc_sort/kalmanfilter.py, incl. the freeze/unfreeze
    observation-centric re-update (ORU) at kalmanfilter.py:383-432).
  * :class:`XYAHFilter` — 8-dim DeepSORT filter on
    [x, y, a=w/h, h, v*] with h-scaled process/measurement noise
    (reference: plugins/track/byte_track/kalman_filter.py:23-150, shared by
    ByteTrack and BoT-SORT).
  * :class:`XYAHNSAFilter` — the StrongSORT variant: noise scales by the
    per-component state (x, y, a, h) and the measurement noise is weighted
    by detection confidence (NSA Kalman,
    reference: plugins/track/strong_sort/sort/kalman_filter.py:48-174), plus
    the squared-Mahalanobis gating distance used in the matching cascade
    (kalman_filter.py:176-213).

Everything is a pure function on (state, cov) arrays: single-track signatures
(vmapped by callers) plus explicitly batched helpers. No classes hold state —
"filters" are namespaces of functions with their constants.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["XYSRFilter", "XYAHFilter", "XYAHNSAFilter", "XYAHNSAHFilter",
           "XYWHFilter",
           "CHI2INV95_4D", "CHI2INV95_2D"]

# 0.95 chi-square quantiles, 4 and 2 dof (byte_track/kalman_filter.py:11-20)
CHI2INV95_4D = 9.4877
CHI2INV95_2D = 5.9915


def _inv4(m):
    """Closed-form 4x4 inverse (adjugate / det). Pure elementwise ops —
    fuses into the surrounding program instead of a batched LU."""
    a = m
    s0 = a[0, 0] * a[1, 1] - a[1, 0] * a[0, 1]
    s1 = a[0, 0] * a[1, 2] - a[1, 0] * a[0, 2]
    s2 = a[0, 0] * a[1, 3] - a[1, 0] * a[0, 3]
    s3 = a[0, 1] * a[1, 2] - a[1, 1] * a[0, 2]
    s4 = a[0, 1] * a[1, 3] - a[1, 1] * a[0, 3]
    s5 = a[0, 2] * a[1, 3] - a[1, 2] * a[0, 3]
    c5 = a[2, 2] * a[3, 3] - a[3, 2] * a[2, 3]
    c4 = a[2, 1] * a[3, 3] - a[3, 1] * a[2, 3]
    c3 = a[2, 1] * a[3, 2] - a[3, 1] * a[2, 2]
    c2 = a[2, 0] * a[3, 3] - a[3, 0] * a[2, 3]
    c1 = a[2, 0] * a[3, 2] - a[3, 0] * a[2, 2]
    c0 = a[2, 0] * a[3, 1] - a[3, 0] * a[2, 1]
    det = s0 * c5 - s1 * c4 + s2 * c3 + s3 * c2 - s4 * c1 + s5 * c0
    inv_det = 1.0 / det
    b = [
        [a[1, 1] * c5 - a[1, 2] * c4 + a[1, 3] * c3,
         -a[0, 1] * c5 + a[0, 2] * c4 - a[0, 3] * c3,
         a[3, 1] * s5 - a[3, 2] * s4 + a[3, 3] * s3,
         -a[2, 1] * s5 + a[2, 2] * s4 - a[2, 3] * s3],
        [-a[1, 0] * c5 + a[1, 2] * c2 - a[1, 3] * c1,
         a[0, 0] * c5 - a[0, 2] * c2 + a[0, 3] * c1,
         -a[3, 0] * s5 + a[3, 2] * s2 - a[3, 3] * s1,
         a[2, 0] * s5 - a[2, 2] * s2 + a[2, 3] * s1],
        [a[1, 0] * c4 - a[1, 1] * c2 + a[1, 3] * c0,
         -a[0, 0] * c4 + a[0, 1] * c2 - a[0, 3] * c0,
         a[3, 0] * s4 - a[3, 1] * s2 + a[3, 3] * s0,
         -a[2, 0] * s4 + a[2, 1] * s2 - a[2, 3] * s0],
        [-a[1, 0] * c3 + a[1, 1] * c1 - a[1, 2] * c0,
         a[0, 0] * c3 - a[0, 1] * c1 + a[0, 2] * c0,
         -a[3, 0] * s3 + a[3, 1] * s1 - a[3, 2] * s0,
         a[2, 0] * s3 - a[2, 1] * s1 + a[2, 2] * s0],
    ]
    rows = [jnp.stack(rw) for rw in b]
    return jnp.stack(rows) * inv_det


def _inv2(m):
    det = m[0, 0] * m[1, 1] - m[0, 1] * m[1, 0]
    return jnp.array([[m[1, 1], -m[0, 1]],
                      [-m[1, 0], m[0, 0]]]) / det


def _mahalanobis(pm, pc, zs):
    """Squared Mahalanobis distances of (N, k) measurements from a
    Gaussian (pm (k,), pc (k, k)) via closed-form 2x2/4x4 inverses —
    same value as the reference's cholesky + triangular solve, without
    the batched LAPACK lowering under vmap."""
    inv = _inv4(pc) if pc.shape[0] == 4 else _inv2(pc)
    d = zs - pm[None, :]
    return jnp.einsum("ni,ij,nj->n", d, inv, d)


def _shift4_predict(x, P, Q):
    """x' = F x, P' = F P F' + Q for the 8-dim constant-velocity F =
    I + E (E[i, i+4] = 1, i < 4) — slice-adds instead of 8x8 matmuls."""
    x = x.at[:4].add(x[4:])
    P = (P.at[:4, :].add(P[4:, :])
         .at[:, :4].add(P[:, 4:].at[:4, :].add(P[4:, 4:])))
    return x, P + Q


def _proj4_update(x, P, z, pc):
    """Kalman update specialized for H = [I4 | 0] given the projected
    innovation covariance pc = P[:4,:4] + R (4x4): closed-form inverse,
    K = P[:, :4] @ pc^-1, P' = P - K pc K'. Algebraically identical to
    solve()-based updates."""
    K = P[:, :4] @ _inv4(pc)
    x_new = x + K @ (z - x[:4])
    P_new = P - K @ pc @ K.T
    return x_new, P_new


def _joseph_update(x, P, z, R, H):
    """Joseph-form measurement update (filterpy-compatible;
    oc_sort/kalmanfilter.py:437-525)."""
    y = z - H @ x
    PHT = P @ H.T
    S = H @ PHT + R
    K = PHT @ jnp.linalg.inv(S)
    x_new = x + K @ y
    I_KH = jnp.eye(P.shape[0], dtype=P.dtype) - K @ H
    P_new = I_KH @ P @ I_KH.T + K @ R @ K.T
    return x_new, P_new


class XYSRFilter:
    """OC-SORT 7-dim filter. State: [x, y, s, r, vx, vy, vs]."""

    DIM_X = 7
    DIM_Z = 4

    @staticmethod
    def constants(dtype=jnp.float32):
        F = jnp.eye(7, dtype=dtype)
        F = F.at[0, 4].set(1.0).at[1, 5].set(1.0).at[2, 6].set(1.0)
        H = jnp.eye(4, 7, dtype=dtype)
        # ocsort.py:80-84: R[2:,2:]*=10; P[4:,4:]*=1000; P*=10;
        # Q[-1,-1]*=0.01; Q[4:,4:]*=0.01
        R = jnp.diag(jnp.array([1.0, 1.0, 10.0, 10.0], dtype=dtype))
        P0 = jnp.diag(jnp.array(
            [10.0, 10.0, 10.0, 10.0, 1e4, 1e4, 1e4], dtype=dtype))
        Q = jnp.diag(jnp.array(
            [1.0, 1.0, 1.0, 1.0, 0.01, 0.01, 1e-4], dtype=dtype))
        return F, H, R, P0, Q

    @staticmethod
    def initiate(z, dtype=jnp.float32):
        """New track from an xysr measurement. Returns (x (7,), P (7,7))."""
        _, _, _, P0, _ = XYSRFilter.constants(dtype)
        x = jnp.zeros(7, dtype=dtype).at[:4].set(z.astype(dtype))
        return x, P0

    @staticmethod
    def predict(x, P):
        """Predict step with the OC-SORT negative-area guard
        (ocsort.py:154-157: if x[6]+x[2] <= 0 then vs := 0).

        F = I + E with E one at (0,4), (1,5), (2,6), so F@x and
        F@P@F.T are slice-adds rather than 7x7 matmuls — the scan step
        is latency-bound on these tiny ops (see BASELINE.md), and XLA
        fuses slice-adds where batched small matmuls stay separate."""
        _, _, _, _, Q = XYSRFilter.constants(x.dtype)
        vs = jnp.where(x[6] + x[2] <= 0, 0.0, x[6])
        x = x.at[6].set(vs)
        x = x.at[:3].add(x[4:7])
        # F P F' = P + (E P) + (P E') + (E P E'): E P puts rows 4:7
        # into rows 0:3; P E' puts cols 4:7 into cols 0:3.
        P = (P.at[:3, :].add(P[4:7, :])
             .at[:, :3].add(P[:, 4:7].at[:3, :].add(P[4:7, 4:7])))
        return x, P + Q

    @staticmethod
    def update(x, P, z):
        """Joseph-form update specialized for H = [I4 | 0] and diagonal
        R: S = P[:4,:4] + R inverted in closed form (adjugate — S is SPD
        and well-conditioned, R >= 1), avoiding the batched LU that
        jnp.linalg.inv lowers to under vmap. Algebraically identical to
        the filterpy reference (oc_sort/kalmanfilter.py:437-525)."""
        _, _, R, _, _ = XYSRFilter.constants(x.dtype)
        r = jnp.diagonal(R)
        y = z - x[:4]
        PHT = P[:, :4]                          # (7, 4)
        S = P[:4, :4] + R
        K = PHT @ _inv4(S)                      # (7, 4)
        x_new = x + K @ y
        # (I - KH) P (I - KH)' + K R K', with KH = [K | 0]
        A = P - K @ P[:4, :]
        P_new = A - A[:, :4] @ K.T + (K * r[None, :]) @ K.T
        return x_new, P_new

    @staticmethod
    def oru_replay(x_frozen, P_frozen, z_prev, z_new, gap, max_gap: int):
        """Observation-centric re-update (kalmanfilter.py:390-432).

        When a track is re-observed after ``gap`` unobserved frames, rewind
        to the state frozen at the first missed frame (post-predict prior)
        and replay a linearly-interpolated virtual trajectory between the
        last real observation ``z_prev`` and the new one ``z_new`` (both
        xysr), with interpolation in (x, y, w, h) space. Returns the state
        just after the virtual update at the current frame; the caller then
        applies the real :func:`update` with ``z_new`` on top, mirroring the
        reference's double update at the re-observation frame.

        ``gap`` is dynamic; ``max_gap`` is the static loop bound (max_age+1).
        """
        x1, y1, s1, r1 = z_prev[0], z_prev[1], z_prev[2], z_prev[3]
        x2, y2, s2, r2 = z_new[0], z_new[1], z_new[2], z_new[3]
        w1 = jnp.sqrt(s1 * r1)
        h1 = jnp.sqrt(s1 / r1)
        w2 = jnp.sqrt(s2 * r2)
        h2 = jnp.sqrt(s2 / r2)
        tg = jnp.maximum(gap, 1).astype(x_frozen.dtype)
        dx, dy = (x2 - x1) / tg, (y2 - y1) / tg
        dw, dh = (w2 - w1) / tg, (h2 - h1) / tg

        def body(i, carry):
            x, P = carry
            active = i < gap
            t = (i + 1).astype(x.dtype)
            vx = x1 + t * dx
            vy = y1 + t * dy
            vw = w1 + t * dw
            vh = h1 + t * dh
            vz = jnp.stack([vx, vy, vw * vh, vw / vh]).astype(x.dtype)
            x_u, P_u = XYSRFilter.update(x, P, vz)
            # predict between virtual updates, but not after the last one
            do_predict = active & (i < gap - 1)
            x_p, P_p = XYSRFilter.predict(x_u, P_u)
            x_next = jnp.where(do_predict, x_p, x_u)
            P_next = jnp.where(do_predict, P_p, P_u)
            x = jnp.where(active, x_next, x)
            P = jnp.where(active, P_next, P)
            return x, P

        return lax.fori_loop(0, max_gap, body, (x_frozen, P_frozen))

    @staticmethod
    def oru_replay_batch(x_frozen, P_frozen, z_prev, z_new, gap, need):
        """Batched ORU replay over all track slots at once.

        Unlike vmapping :func:`oru_replay` (which always runs max_gap
        iterations), this runs a single while_loop to the LARGEST needed
        gap this frame — typically 1-3 steps instead of max_age — with
        per-track masking. Identical results for masked tracks.

        Shapes: x_frozen (T, 7), P_frozen (T, 7, 7), z_prev/z_new (T, 4),
        gap (T,) int, need (T,) bool.
        """
        dtype = x_frozen.dtype
        x1, y1, s1, r1 = (z_prev[:, 0], z_prev[:, 1], z_prev[:, 2],
                          z_prev[:, 3])
        x2, y2, s2, r2 = (z_new[:, 0], z_new[:, 1], z_new[:, 2],
                          z_new[:, 3])
        w1 = jnp.sqrt(jnp.maximum(s1 * r1, 1e-12))
        h1 = jnp.sqrt(jnp.maximum(s1 / jnp.maximum(r1, 1e-12), 1e-12))
        w2 = jnp.sqrt(jnp.maximum(s2 * r2, 1e-12))
        h2 = jnp.sqrt(jnp.maximum(s2 / jnp.maximum(r2, 1e-12), 1e-12))
        tg = jnp.maximum(gap, 1).astype(dtype)
        dx, dy = (x2 - x1) / tg, (y2 - y1) / tg
        dw, dh = (w2 - w1) / tg, (h2 - h1) / tg
        max_steps = jnp.max(jnp.where(need, gap, 0))

        def cond(carry):
            i, _, _ = carry
            return i < max_steps

        def body(carry):
            i, x, P = carry
            active = need & (i < gap)
            t = (i + 1).astype(dtype)
            vx = x1 + t * dx
            vy = y1 + t * dy
            vw = w1 + t * dw
            vh = h1 + t * dh
            vz = jnp.stack([vx, vy, vw * vh,
                            vw / jnp.maximum(vh, 1e-12)], axis=1)
            x_u, P_u = XYSRFilter.update_batch(x, P, vz)
            do_pred = active & (i < gap - 1)
            x_p, P_p = XYSRFilter.predict_batch(x_u, P_u)
            x_next = jnp.where(do_pred[:, None], x_p, x_u)
            P_next = jnp.where(do_pred[:, None, None], P_p, P_u)
            x = jnp.where(active[:, None], x_next, x)
            P = jnp.where(active[:, None, None], P_next, P)
            return i + 1, x, P

        _, x, P = lax.while_loop(
            cond, body, (jnp.int32(0), x_frozen, P_frozen))
        return x, P

    @staticmethod
    def to_ltrb(x):
        """State -> ltrb box (ocsort.py:36-46 convert_x_to_bbox)."""
        w = jnp.sqrt(x[2] * x[3])
        h = x[2] / w
        return jnp.stack([
            x[0] - w / 2.0, x[1] - h / 2.0, x[0] + w / 2.0, x[1] + h / 2.0,
        ])


def _xyah_mats(dtype):
    F = jnp.eye(8, dtype=dtype)
    F = F + jnp.eye(8, k=4, dtype=dtype)
    H = jnp.eye(4, 8, dtype=dtype)
    return F, H


class XYAHFilter:
    """DeepSORT/ByteTrack 8-dim filter. State: [x, y, a, h, vx, vy, va, vh].

    Noise stds scale with the box height h
    (byte_track/kalman_filter.py:54-150).
    """

    WP = 1.0 / 20
    WV = 1.0 / 160

    @staticmethod
    def initiate(z):
        h = z[3]
        x = jnp.concatenate([z, jnp.zeros_like(z)])
        std = jnp.stack([
            2 * XYAHFilter.WP * h, 2 * XYAHFilter.WP * h,
            jnp.asarray(1e-2, z.dtype), 2 * XYAHFilter.WP * h,
            10 * XYAHFilter.WV * h, 10 * XYAHFilter.WV * h,
            jnp.asarray(1e-5, z.dtype), 10 * XYAHFilter.WV * h,
        ])
        return x, jnp.diag(std * std)

    @staticmethod
    def _motion_cov(x):
        h = x[3]
        one = jnp.ones((), x.dtype)
        std = jnp.stack([
            XYAHFilter.WP * h, XYAHFilter.WP * h, 1e-2 * one,
            XYAHFilter.WP * h,
            XYAHFilter.WV * h, XYAHFilter.WV * h, 1e-5 * one,
            XYAHFilter.WV * h,
        ])
        return jnp.diag(std * std)

    @staticmethod
    def predict(x, P):
        Q = XYAHFilter._motion_cov(x)
        return _shift4_predict(x, P, Q)

    @staticmethod
    def _innovation_cov(x):
        h = x[3]
        std = jnp.stack([
            XYAHFilter.WP * h, XYAHFilter.WP * h,
            jnp.asarray(1e-1, x.dtype), XYAHFilter.WP * h,
        ])
        return jnp.diag(std * std)

    @staticmethod
    def project(x, P):
        _, H = _xyah_mats(x.dtype)
        return H @ x, H @ P @ H.T + XYAHFilter._innovation_cov(x)

    @staticmethod
    def update(x, P, z):
        pc = P[:4, :4] + XYAHFilter._innovation_cov(x)
        return _proj4_update(x, P, z, pc)

    @staticmethod
    def gating_distance(x, P, zs, only_position=False):
        """Squared Mahalanobis distance from a track to (N, 4) measurements."""
        pm, pc = XYAHFilter.project(x, P)
        if only_position:
            pm, pc, zs = pm[:2], pc[:2, :2], zs[:, :2]
        return _mahalanobis(pm, pc, zs)


class XYAHNSAFilter:
    """StrongSORT NSA-Kalman: per-component noise scaling + confidence-
    weighted measurement noise (strong_sort/sort/kalman_filter.py:48-174)."""

    WP = 1.0 / 20
    WV = 1.0 / 160

    @staticmethod
    def initiate(z):
        x = jnp.concatenate([z, jnp.zeros_like(z)])
        std = jnp.stack([
            2 * XYAHNSAFilter.WP * z[0], 2 * XYAHNSAFilter.WP * z[1],
            1.0 * z[2], 2 * XYAHNSAFilter.WP * z[3],
            10 * XYAHNSAFilter.WV * z[0], 10 * XYAHNSAFilter.WV * z[1],
            0.1 * z[2], 10 * XYAHNSAFilter.WV * z[3],
        ])
        return x, jnp.diag(std * std)

    @staticmethod
    def predict(x, P):
        std = jnp.stack([
            XYAHNSAFilter.WP * x[0], XYAHNSAFilter.WP * x[1],
            1.0 * x[2], XYAHNSAFilter.WP * x[3],
            XYAHNSAFilter.WV * x[0], XYAHNSAFilter.WV * x[1],
            0.1 * x[2], XYAHNSAFilter.WV * x[3],
        ])
        Q = jnp.diag(std * std)
        return _shift4_predict(x, P, Q)

    @staticmethod
    def project(x, P, confidence=0.0):
        _, H = _xyah_mats(x.dtype)
        std = jnp.stack([
            XYAHNSAFilter.WP * x[3], XYAHNSAFilter.WP * x[3],
            jnp.asarray(1e-1, x.dtype), XYAHNSAFilter.WP * x[3],
        ]) * (1.0 - confidence)
        return H @ x, H @ P @ H.T + jnp.diag(std * std)

    @staticmethod
    def update(x, P, z, confidence=0.0):
        _, pc = XYAHNSAFilter.project(x, P, confidence)
        return _proj4_update(x, P, z, pc)

    @staticmethod
    def gating_distance(x, P, zs, only_position=False):
        pm, pc = XYAHNSAFilter.project(x, P)
        if only_position:
            pm, pc, zs = pm[:2], pc[:2, :2], zs[:, :2]
        return _mahalanobis(pm, pc, zs)


class XYAHNSAHFilter:
    """BPBReID-StrongSORT NSA-Kalman variant: like :class:`XYAHNSAFilter`
    but ALL noise stds — including the aspect-ratio component — scale with
    the box height h (bpbreid_strong_sort/sort/kalman_filter.py:72-148,
    which deliberately deviates from StrongSORT's per-component scaling;
    see the inline 'StrongSORT : 1e-2' comments there)."""

    WP = 1.0 / 20
    WV = 1.0 / 160

    @staticmethod
    def initiate(z):
        h = z[3]
        x = jnp.concatenate([z, jnp.zeros_like(z)])
        p = 2 * XYAHNSAHFilter.WP * h
        v = 10 * XYAHNSAHFilter.WV * h
        std = jnp.stack([p, p, p, p, v, v, v, v])
        return x, jnp.diag(std * std)

    @staticmethod
    def predict(x, P):
        h = x[3]
        p = XYAHNSAHFilter.WP * h
        v = XYAHNSAHFilter.WV * h
        std = jnp.stack([p, p, p, p, v, v, v, v])
        Q = jnp.diag(std * std)
        return _shift4_predict(x, P, Q)

    @staticmethod
    def project(x, P, confidence=0.0):
        _, H = _xyah_mats(x.dtype)
        p = XYAHNSAHFilter.WP * x[3]
        std = jnp.stack([p, p, p, p]) * (1.0 - confidence)
        return H @ x, H @ P @ H.T + jnp.diag(std * std)

    @staticmethod
    def update(x, P, z, confidence=0.0):
        _, pc = XYAHNSAHFilter.project(x, P, confidence)
        return _proj4_update(x, P, z, pc)

    @staticmethod
    def gating_distance(x, P, zs, only_position=False):
        pm, pc = XYAHNSAHFilter.project(x, P)
        if only_position:
            pm, pc, zs = pm[:2], pc[:2, :2], zs[:, :2]
        return _mahalanobis(pm, pc, zs)


class XYWHFilter:
    """BoT-SORT 8-dim filter on [x, y, w, h, v*]: noise stds scale with
    (w, h) per component pair (plugins/track/bot_sort/kalman_filter.py:
    55-175). Gating distance uses the standard Mahalanobis form."""

    WP = 1.0 / 20
    WV = 1.0 / 160

    @staticmethod
    def initiate(z):
        w, h = z[2], z[3]
        x = jnp.concatenate([z, jnp.zeros_like(z)])
        std = jnp.stack([
            2 * XYWHFilter.WP * w, 2 * XYWHFilter.WP * h,
            2 * XYWHFilter.WP * w, 2 * XYWHFilter.WP * h,
            10 * XYWHFilter.WV * w, 10 * XYWHFilter.WV * h,
            10 * XYWHFilter.WV * w, 10 * XYWHFilter.WV * h,
        ])
        return x, jnp.diag(std * std)

    @staticmethod
    def predict(x, P):
        w, h = x[2], x[3]
        std = jnp.stack([
            XYWHFilter.WP * w, XYWHFilter.WP * h,
            XYWHFilter.WP * w, XYWHFilter.WP * h,
            XYWHFilter.WV * w, XYWHFilter.WV * h,
            XYWHFilter.WV * w, XYWHFilter.WV * h,
        ])
        Q = jnp.diag(std * std)
        return _shift4_predict(x, P, Q)

    @staticmethod
    def project(x, P):
        _, H = _xyah_mats(x.dtype)
        w, h = x[2], x[3]
        std = jnp.stack([XYWHFilter.WP * w, XYWHFilter.WP * h,
                         XYWHFilter.WP * w, XYWHFilter.WP * h])
        return H @ x, H @ P @ H.T + jnp.diag(std * std)

    @staticmethod
    def update(x, P, z):
        _, pc = XYWHFilter.project(x, P)
        return _proj4_update(x, P, z, pc)

    @staticmethod
    def gating_distance(x, P, zs, only_position=False):
        pm, pc = XYWHFilter.project(x, P)
        if only_position:
            pm, pc, zs = pm[:2], pc[:2, :2], zs[:, :2]
        return _mahalanobis(pm, pc, zs)


# Batched (vmapped) convenience wrappers — track axis first.
for _cls in (XYSRFilter, XYAHFilter, XYAHNSAFilter, XYAHNSAHFilter,
             XYWHFilter):
    _cls.predict_batch = staticmethod(jax.vmap(_cls.predict))
    _cls.update_batch = staticmethod(jax.vmap(_cls.update))
XYSRFilter.to_ltrb_batch = staticmethod(jax.vmap(XYSRFilter.to_ltrb))
