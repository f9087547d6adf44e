"""Independent numpy/scipy oracle of Deep-OC-SORT semantics (spec for the
JAX scan tracker): new-KF (xywh, dynamic Q/R), AW-weighted embedding fusion
in stage 1, OCR stage, confidence-adaptive EMA, CMC affine correction,
clean-space ORU replay (see trackers/deepocsort.py docstring)."""
from __future__ import annotations

import numpy as np
from scipy.optimize import linear_sum_assignment

from oracles.ocsort_oracle import iou_mat

F8 = np.eye(8) + np.eye(8, k=4)
H8 = np.eye(4, 8)


def nkf_Q(w, h, p=1 / 20, v=1 / 160):
    return np.diag([(p * w) ** 2, (p * h) ** 2, (p * w) ** 2,
                    (p * h) ** 2, (v * w) ** 2, (v * h) ** 2,
                    (v * w) ** 2, (v * h) ** 2])


def nkf_R(w, h, m=1 / 20):
    wv, hv = (m * w) ** 2, (m * h) ** 2
    return np.diag([wv, hv, wv, hv])


def to_z(ltrb):
    w, h = ltrb[2] - ltrb[0], ltrb[3] - ltrb[1]
    return np.array([ltrb[0] + w / 2, ltrb[1] + h / 2, w, h])


def to_ltrb(x):
    return np.array([x[0] - x[2] / 2, x[1] - x[3] / 2,
                     x[0] + x[2] / 2, x[1] + x[3] / 2])


def lsa(cost):
    r, c = linear_sum_assignment(cost)
    return list(zip(r, c))


def aw_metric(emb_cost, w_assoc, bottom):
    w = np.full_like(emb_cost, w_assoc)
    for i in range(emb_cost.shape[0]):
        inds = np.argsort(-emb_cost[i])
        if len(inds) < 2:
            continue
        if emb_cost[i, inds[0]] == 0:
            rw = 0.0
        else:
            rw = 1 - max((emb_cost[i, inds[1]] / emb_cost[i, inds[0]])
                         - bottom, 0) / (1 - bottom)
        w[i] *= rw
    for j in range(emb_cost.shape[1]):
        inds = np.argsort(-emb_cost[:, j])
        if len(inds) < 2:
            continue
        if emb_cost[inds[0], j] == 0:
            cw = 0.0
        else:
            cw = 1 - max((emb_cost[inds[1], j] / emb_cost[inds[0], j])
                         - bottom, 0) / (1 - bottom)
        w[:, j] *= cw
    return w * emb_cost


class KTrack:
    _count = 0

    def __init__(self, ltrb, conf, cls, ref, emb, alpha, delta_t):
        z = to_z(ltrb)
        self.x = np.zeros(8)
        self.x[:4] = z
        self.P = nkf_Q(z[2], z[3])
        self.P[:4, :4] *= 4
        self.P[4:, 4:] *= 100
        self.id = KTrack._count
        KTrack._count += 1
        self.conf, self.cls, self.ref = conf, cls, ref
        self.emb = emb.copy()
        self.delta_t = delta_t
        self.age = 0
        self.hits = self.hit_streak = self.time_since_update = 0
        self.observations = {}
        self.last_obs = None
        self.last_z = z.copy()
        self.velocity = None
        self.observed = False
        self.frozen_state = None

    def kf_update(self, z):
        R = nkf_R(self.x[2], self.x[3])
        y = z - H8 @ self.x
        S = H8 @ self.P @ H8.T + R
        K = self.P @ H8.T @ np.linalg.inv(S)
        self.x = self.x + K @ y
        I_KH = np.eye(8) - K @ H8
        self.P = I_KH @ self.P @ I_KH.T + K @ R @ K.T

    def kf_predict(self, frozen):
        if self.x[2] + self.x[6] <= 0:
            self.x[6] = 0.0
        if self.x[3] + self.x[7] <= 0:
            self.x[7] = 0.0
        if frozen:
            self.x[6] = self.x[7] = 0.0
        Q = nkf_Q(self.x[2], self.x[3])
        self.x = F8 @ self.x
        self.P = F8 @ self.P @ F8.T + Q

    def predict(self):
        self.kf_predict(frozen=(not self.observed)
                        and self.last_obs is not None)
        self.age += 1
        if self.time_since_update > 0:
            self.hit_streak = 0
        self.time_since_update += 1
        return to_ltrb(self.x)

    def apply_affine(self, warp):
        m, t = warp[:2, :2], warp[:2, 2]
        if self.last_obs is not None and self.last_obs[:4].sum() > 0:
            self.last_obs[:2] = m @ self.last_obs[:2] + t
            self.last_obs[2:4] = m @ self.last_obs[2:4] + t
        for a, ob in self.observations.items():
            ob[:2] = m @ ob[:2] + t
            ob[2:4] = m @ ob[2:4] + t
        big = np.kron(np.eye(4), m)
        self.x = big @ self.x
        self.x[:2] += t
        self.P = big @ self.P @ big.T
        if (not self.observed) and self.frozen_state is not None:
            fx, fP, fz = self.frozen_state
            fx = big @ fx
            fx[:2] += t
            fP = big @ fP @ big.T
            fz = fz.copy()
            fz[:2] = m @ fz[:2] + t
            fz[2:4] = m @ fz[2:4]
            self.frozen_state = (fx, fP, fz)

    def miss(self):
        if self.observed:
            self.frozen_state = (self.x.copy(), self.P.copy(),
                                 self.last_z.copy())
        self.observed = False

    def update(self, ltrb, conf, cls, ref, emb, alpha):
        if self.last_obs is not None:
            prev = None
            for dt in range(self.delta_t, 0, -1):
                if self.age - dt in self.observations:
                    prev = self.observations[self.age - dt]
                    break
            if prev is None:
                prev = self.last_obs
            d = np.array([
                (ltrb[1] + ltrb[3]) / 2 - (prev[1] + prev[3]) / 2,
                (ltrb[0] + ltrb[2]) / 2 - (prev[0] + prev[2]) / 2])
            self.velocity = d / (np.linalg.norm(d) + 1e-6)
        z = to_z(ltrb)
        # ORU (clean xywh interpolation)
        if (not self.observed) and self.frozen_state is not None \
                and self.last_obs is not None:
            fx, fP, fz = self.frozen_state
            self.x, self.P = fx.copy(), fP.copy()
            gap = self.age - self.last_obs_age
            dz = (z - fz) / max(gap, 1)
            for i in range(gap):
                vz = fz + (i + 1) * dz
                self.kf_update(vz)
                if i != gap - 1:
                    self.kf_predict(frozen=False)
        self.observed = True
        obs5 = np.concatenate([ltrb, [conf]])
        self.last_obs = obs5
        self.observations[self.age] = obs5
        self.last_obs_age = self.age
        self.last_z = z.copy()
        self.time_since_update = 0
        self.hits += 1
        self.hit_streak += 1
        # ref never refreshes conf after birth (ocsort.py:114 only)
        self.cls, self.ref = cls, ref
        self.kf_update(z)
        # conf-adaptive EMA
        if np.linalg.norm(emb) > 1e-6:
            e = alpha * self.emb + (1 - alpha) * emb
            self.emb = e / np.linalg.norm(e)

    def k_previous_obs(self, k):
        if not self.observations:
            return np.full(5, -1.0)
        for i in range(k):
            dt = k - i
            if self.age - dt in self.observations:
                return self.observations[self.age - dt]
        return self.observations[max(self.observations)]


class DeepOCSortOracle:
    def __init__(self, det_thresh=0.0, max_age=50, min_hits=1,
                 iou_threshold=0.22, delta_t=1, inertia=0.39,
                 w_association_emb=0.75, alpha_fixed_emb=0.95,
                 aw_param=0.5):
        self.p = dict(locals())
        self.p.pop("self")
        self.tracks = []
        self.frame_count = 0
        KTrack._count = 0

    def update(self, dets, feats, warp=None):
        p = self.p
        self.frame_count += 1
        dets = np.asarray(dets, np.float64).reshape(-1, 7)
        feats = np.asarray(feats, np.float64).reshape(len(dets), -1)
        nrm = np.maximum(np.linalg.norm(feats, axis=1, keepdims=True),
                         1e-12)
        feats = feats / nrm
        keep = dets[:, 4] > p["det_thresh"]
        dets = dets[keep]
        feats = feats[keep]
        trust = (dets[:, 4] - p["det_thresh"]) / (1 - p["det_thresh"])
        af = p["alpha_fixed_emb"]
        det_alpha = af + (1 - af) * (1 - trust)

        if warp is not None:
            for t in self.tracks:
                t.apply_affine(warp)

        boxes, dead = [], []
        for i, t in enumerate(self.tracks):
            b = t.predict()
            if np.any(np.isnan(b)):
                dead.append(i)
            boxes.append(b)
        for i in reversed(dead):
            self.tracks.pop(i)
            boxes.pop(i)
        trks = np.array(boxes) if boxes else np.zeros((0, 4))

        matched_t, matched_d = set(), set()
        if len(self.tracks) and len(dets):
            iou = iou_mat(dets[:, :4], trks)
            velocities = np.array([
                t.velocity if t.velocity is not None else np.zeros(2)
                for t in self.tracks])
            k_obs = np.array([t.k_previous_obs(p["delta_t"])
                              for t in self.tracks])
            dcx = (dets[:, 0] + dets[:, 2]) / 2
            dcy = (dets[:, 1] + dets[:, 3]) / 2
            tcx = (k_obs[:, 0] + k_obs[:, 2]) / 2
            tcy = (k_obs[:, 1] + k_obs[:, 3]) / 2
            dx = dcx[None, :] - tcx[:, None]
            dy = dcy[None, :] - tcy[:, None]
            nrm2 = np.sqrt(dx ** 2 + dy ** 2) + 1e-6
            cos = (velocities[:, 1:2] * dx / nrm2
                   + velocities[:, 0:1] * dy / nrm2)
            ang = (np.pi / 2 - np.abs(np.arccos(
                np.clip(cos, -1, 1)))) / np.pi
            vmask = (k_obs[:, 4] >= 0).astype(float)[:, None]
            # class-scaled (reference quirk)
            angle_cost = ((vmask * ang) * p["inertia"]).T * dets[:, 5:6]

            a = (iou > p["iou_threshold"]).astype(int)
            if a.sum(1).max() == 1 and a.sum(0).max() == 1:
                pairs = list(zip(*np.where(a)))
            else:
                trk_embs = np.array([t.emb for t in self.tracks])
                emb_cost = feats @ trk_embs.T
                emb_cost[iou <= 0] = 0
                emb_cost = aw_metric(emb_cost, p["w_association_emb"],
                                     p["aw_param"])
                pairs = lsa(-(iou + angle_cost + emb_cost))
            for d, t in pairs:
                if iou[d, t] < p["iou_threshold"]:
                    continue
                self.tracks[t].update(dets[d, :4], dets[d, 4], dets[d, 5],
                                      dets[d, 6], feats[d], det_alpha[d])
                matched_t.add(t)
                matched_d.add(d)

        # OCR
        u_d = [i for i in range(len(dets)) if i not in matched_d]
        u_t = [i for i in range(len(self.tracks)) if i not in matched_t]
        if u_d and u_t:
            last = np.array([
                self.tracks[i].last_obs[:4]
                if self.tracks[i].last_obs is not None
                else np.full(4, -1.0) for i in u_t])
            # asso_func: giou per config default? oracle uses iou for
            # simplicity — tests configure asso_func="iou"
            iou3 = iou_mat(dets[np.array(u_d), :4], last)
            if iou3.max() > p["iou_threshold"]:
                for dd, jj in lsa(-iou3):
                    if iou3[dd, jj] < p["iou_threshold"]:
                        continue
                    d, t = u_d[dd], u_t[jj]
                    self.tracks[t].update(dets[d, :4], dets[d, 4],
                                          dets[d, 5], dets[d, 6],
                                          feats[d], det_alpha[d])
                    matched_t.add(t)
                    matched_d.add(d)

        for i, t in enumerate(self.tracks):
            if i not in matched_t:
                t.miss()
        for d in range(len(dets)):
            if d not in matched_d:
                self.tracks.append(KTrack(
                    dets[d, :4], dets[d, 4], dets[d, 5], dets[d, 6],
                    feats[d], det_alpha[d], p["delta_t"]))

        out = []
        for t in self.tracks:
            # ref's main update() never increments frame_count
            # (deep_oc_sort/ocsort.py:357,525,559) -> min_hits disabled
            if t.time_since_update < 1:
                box = t.last_obs[:4] if t.last_obs is not None \
                    else to_ltrb(t.x)
                out.append((box.copy(), t.id + 1, float(t.cls),
                            float(t.conf), int(t.ref)))
        self.tracks = [t for t in self.tracks
                       if t.time_since_update <= p["max_age"]]
        return out
