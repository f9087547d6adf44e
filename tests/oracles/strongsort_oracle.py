"""Independent numpy/scipy oracle of StrongSORT semantics (spec for the
JAX scan tracker): NSA Kalman, gallery-min cosine appearance stage with
Mahalanobis gating and mc_lambda blending, clamp-then-LSA matching,
IoU second stage, EMA features, tentative/confirmed lifecycle."""
from __future__ import annotations

import numpy as np
from scipy.optimize import linear_sum_assignment

WP, WV = 1.0 / 20, 1.0 / 160
F = np.eye(8) + np.eye(8, k=4)
H = np.eye(4, 8)
CHI2_4 = 9.4877
INFTY = 1e5

TENT, CONF, DEAD = 1, 2, 3


def initiate(z):
    mean = np.concatenate([z, np.zeros(4)])
    std = np.array([2 * WP * z[0], 2 * WP * z[1], 1.0 * z[2],
                    2 * WP * z[3], 10 * WV * z[0], 10 * WV * z[1],
                    0.1 * z[2], 10 * WV * z[3]])
    return mean, np.diag(std ** 2)


def predict(mean, cov):
    std = np.array([WP * mean[0], WP * mean[1], 1.0 * mean[2],
                    WP * mean[3], WV * mean[0], WV * mean[1],
                    0.1 * mean[2], WV * mean[3]])
    return F @ mean, F @ cov @ F.T + np.diag(std ** 2)


def project(mean, cov, confidence=0.0):
    std = (1 - confidence) * np.array(
        [WP * mean[3], WP * mean[3], 1e-1, WP * mean[3]])
    return H @ mean, H @ cov @ H.T + np.diag(std ** 2)


def kf_update(mean, cov, z, confidence):
    pm, pc = project(mean, cov, confidence)
    K = np.linalg.solve(pc, (cov @ H.T).T).T
    return mean + K @ (z - pm), cov - K @ pc @ K.T


def gating_distance(mean, cov, zs):
    pm, pc = project(mean, cov)
    L = np.linalg.cholesky(pc)
    d = (zs - pm).T
    sol = np.linalg.solve(L, d)
    return np.sum(sol * sol, axis=0)


def ltrb_to_xyah(b):
    w, h = b[2] - b[0], b[3] - b[1]
    return np.array([b[0] + w / 2, b[1] + h / 2, w / h, h])


def mean_to_ltrb(m):
    w = m[2] * m[3]
    return np.array([m[0] - w / 2, m[1] - m[3] / 2,
                     m[0] + w / 2, m[1] + m[3] / 2])


def iou_mat(b1, b2):
    b1 = np.asarray(b1).reshape(-1, 4)[:, None, :]
    b2 = np.asarray(b2).reshape(-1, 4)[None, :, :]
    xx1 = np.maximum(b1[..., 0], b2[..., 0])
    yy1 = np.maximum(b1[..., 1], b2[..., 1])
    xx2 = np.minimum(b1[..., 2], b2[..., 2])
    yy2 = np.minimum(b1[..., 3], b2[..., 3])
    inter = np.maximum(0, xx2 - xx1) * np.maximum(0, yy2 - yy1)
    a1 = (b1[..., 2] - b1[..., 0]) * (b1[..., 3] - b1[..., 1])
    a2 = (b2[..., 2] - b2[..., 0]) * (b2[..., 3] - b2[..., 1])
    return inter / (a1 + a2 - inter)


def clamped_match(cost, max_distance):
    """min_cost_matching: clamp above threshold, LSA, filter."""
    n, m = cost.shape
    if n == 0 or m == 0:
        return [], list(range(n)), list(range(m))
    c = np.minimum(cost, max_distance + 1e-5)
    rows, cols = linear_sum_assignment(c)
    matches, ur, uc = [], set(range(n)), set(range(m))
    for r, cc in zip(rows, cols):
        if cost[r, cc] <= max_distance:
            matches.append((r, cc))
            ur.discard(r)
            uc.discard(cc)
    return matches, sorted(ur), sorted(uc)


class OTrack:
    def __init__(self, xyah, tid, conf, cls, ref, feat, n_init, max_age,
                 ema_alpha):
        self.mean, self.cov = initiate(xyah)
        self.track_id = tid
        self.conf, self.cls, self.ref = conf, cls, ref
        self.feat = feat / np.linalg.norm(feat)
        self.gallery = []
        self.state = TENT
        self.hits = 1
        self.tsu = 0
        self.n_init = n_init
        self.max_age = max_age
        self.ema = ema_alpha


class StrongSortOracle:
    def __init__(self, max_dist=0.1594, max_iou_dist=0.5432, max_age=40,
                 n_init=3, nn_budget=100, mc_lambda=0.995,
                 ema_alpha=0.8962):
        self.p = dict(max_dist=max_dist, max_iou_dist=max_iou_dist,
                      max_age=max_age, n_init=n_init, nn_budget=nn_budget,
                      mc_lambda=mc_lambda, ema_alpha=ema_alpha)
        self.tracks: list[OTrack] = []
        self._next = 0

    def update(self, dets, feats):
        """dets: (N, 7) [ltrb, conf, cls, ref]; feats: (N, E)."""
        p = self.p
        dets = np.asarray(dets, np.float64).reshape(-1, 7)
        feats = np.asarray(feats, np.float64).reshape(len(dets), -1)
        feats = feats / np.maximum(
            np.linalg.norm(feats, axis=1, keepdims=True), 1e-12)

        for t in self.tracks:
            t.mean, t.cov = predict(t.mean, t.cov)
            t.tsu += 1

        det_xyah = np.array([ltrb_to_xyah(d[:4]) for d in dets]) \
            if len(dets) else np.zeros((0, 4))

        confirmed = [i for i, t in enumerate(self.tracks)
                     if t.state == CONF]
        unconfirmed = [i for i, t in enumerate(self.tracks)
                       if t.state == TENT]

        # stage A: appearance
        matches_a, u_trk_a, u_det = [], confirmed, list(range(len(dets)))
        if confirmed and len(dets):
            cost = np.zeros((len(confirmed), len(dets)))
            for r, ti in enumerate(confirmed):
                t = self.tracks[ti]
                g = np.array(t.gallery) if t.gallery else \
                    np.zeros((0, feats.shape[1]))
                if len(g):
                    cost[r] = np.min(1 - g @ feats.T, axis=0)
                else:
                    cost[r] = INFTY
                gd = gating_distance(t.mean, t.cov, det_xyah)
                cost[r, gd > CHI2_4] = INFTY
                cost[r] = p["mc_lambda"] * cost[r] \
                    + (1 - p["mc_lambda"]) * gd
            m, ut, ud = clamped_match(cost, p["max_dist"])
            matches_a = [(confirmed[r], c) for r, c in m]
            u_trk_a = [confirmed[r] for r in ut]
            u_det = ud

        # stage B: IoU on unconfirmed + recently-missed confirmed
        cand = unconfirmed + [k for k in u_trk_a
                              if self.tracks[k].tsu == 1]
        matches_b = []
        if cand and u_det:
            tboxes = [mean_to_ltrb(self.tracks[k].mean) for k in cand]
            dboxes = [dets[j, :4] for j in u_det]
            cost = 1 - iou_mat(tboxes, dboxes)
            for r, k in enumerate(cand):
                if self.tracks[k].tsu > 1:
                    cost[r] = INFTY
            m, ut, ud = clamped_match(cost, p["max_iou_dist"])
            matches_b = [(cand[r], u_det[c]) for r, c in m]
            u_det = [u_det[c] for c in ud]
        else:
            pass

        matched_tracks = set()
        for ti, dj in matches_a + matches_b:
            t = self.tracks[ti]
            z = det_xyah[dj]
            t.mean, t.cov = kf_update(t.mean, t.cov, z, dets[dj, 4])
            sm = t.ema * t.feat + (1 - t.ema) * feats[dj]
            t.feat = sm / np.linalg.norm(sm)
            t.hits += 1
            t.tsu = 0
            if t.state == TENT and t.hits >= p["n_init"]:
                t.state = CONF
            t.conf, t.cls, t.ref = dets[dj, 4], dets[dj, 5], dets[dj, 6]
            matched_tracks.add(ti)

        for i, t in enumerate(self.tracks):
            if i in matched_tracks:
                continue
            if t.state == TENT or t.tsu > p["max_age"]:
                t.state = DEAD

        for j in u_det:
            self._next += 1
            self.tracks.append(OTrack(
                det_xyah[j], self._next, dets[j, 4], dets[j, 5],
                dets[j, 6], feats[j], p["n_init"], p["max_age"],
                p["ema_alpha"]))

        self.tracks = [t for t in self.tracks if t.state != DEAD]

        # partial_fit: every confirmed track pushes its smoothed feature
        for t in self.tracks:
            if t.state == CONF:
                t.gallery.append(t.feat.copy())
                t.gallery = t.gallery[-p["nn_budget"]:]

        out = []
        for t in self.tracks:
            if t.state == CONF and t.tsu <= 1:
                out.append((mean_to_ltrb(t.mean), t.track_id,
                            float(t.cls), float(t.conf), int(t.ref)))
        return out
