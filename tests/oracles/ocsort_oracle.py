"""Independent numpy/scipy oracle of OC-SORT semantics, used as the spec for
the JAX scan tracker. Written from the behavioral description of
plugins/track/oc_sort/ (SORT-style 7-dim KF, velocity-direction cost, BYTE
and OCR recovery stages, freeze/replay re-update), not copied from it."""
from __future__ import annotations

import numpy as np
from scipy.optimize import linear_sum_assignment


def to_z(ltrb):
    w = ltrb[2] - ltrb[0]
    h = ltrb[3] - ltrb[1]
    return np.array([ltrb[0] + w / 2, ltrb[1] + h / 2, w * h,
                     w / (h + 1e-6)])


def to_ltrb(x):
    w = np.sqrt(x[2] * x[3])
    h = x[2] / w
    return np.array([x[0] - w / 2, x[1] - h / 2, x[0] + w / 2, x[1] + h / 2])


def iou_mat(b1, b2):
    b1 = b1[:, None, :]
    b2 = b2[None, :, :]
    xx1 = np.maximum(b1[..., 0], b2[..., 0])
    yy1 = np.maximum(b1[..., 1], b2[..., 1])
    xx2 = np.minimum(b1[..., 2], b2[..., 2])
    yy2 = np.minimum(b1[..., 3], b2[..., 3])
    inter = np.maximum(0, xx2 - xx1) * np.maximum(0, yy2 - yy1)
    a1 = (b1[..., 2] - b1[..., 0]) * (b1[..., 3] - b1[..., 1])
    a2 = (b2[..., 2] - b2[..., 0]) * (b2[..., 3] - b2[..., 1])
    return inter / (a1 + a2 - inter)


F = np.eye(7)
F[0, 4] = F[1, 5] = F[2, 6] = 1.0
H = np.eye(4, 7)
R = np.diag([1.0, 1, 10, 10])
P0 = np.diag([10.0, 10, 10, 10, 1e4, 1e4, 1e4])
Q = np.diag([1.0, 1, 1, 1, 0.01, 0.01, 1e-4])


class KTrack:
    _count = 0

    def __init__(self, ltrb, conf, cls, ref, delta_t):
        self.x = np.zeros(7)
        self.x[:4] = to_z(ltrb)
        self.P = P0.copy()
        self.id = KTrack._count
        KTrack._count += 1
        self.conf, self.cls, self.ref = conf, cls, ref
        self.delta_t = delta_t
        self.age = 0
        self.hits = 0
        self.hit_streak = 0
        self.time_since_update = 0
        self.observations = {}
        self.last_obs = None           # (5,) ltrb+conf
        self.velocity = None
        self.observed = False
        self.frozen = None             # (x, P) snapshot
        self.last_obs_age = 0

    def kf_update(self, z):
        y = z - H @ self.x
        S = H @ self.P @ H.T + R
        K = self.P @ H.T @ np.linalg.inv(S)
        self.x = self.x + K @ y
        I_KH = np.eye(7) - K @ H
        self.P = I_KH @ self.P @ I_KH.T + K @ R @ K.T

    def predict(self):
        if self.x[6] + self.x[2] <= 0:
            self.x[6] = 0.0
        self.x = F @ self.x
        self.P = F @ self.P @ F.T + Q
        self.age += 1
        if self.time_since_update > 0:
            self.hit_streak = 0
        self.time_since_update += 1
        return to_ltrb(self.x)

    def miss(self):
        if self.observed:
            self.frozen = (self.x.copy(), self.P.copy())
        self.observed = False

    def update(self, ltrb, conf, cls, ref):
        # velocity from the delta_t-past observation
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
                (ltrb[0] + ltrb[2]) / 2 - (prev[0] + prev[2]) / 2,
            ])
            self.velocity = d / (np.linalg.norm(d) + 1e-6)
        # ORU replay
        if (not self.observed) and self.frozen is not None \
                and self.last_obs is not None:
            self.x, self.P = (self.frozen[0].copy(), self.frozen[1].copy())
            z1 = to_z(self.last_obs[:4])
            z2 = to_z(ltrb)
            w1, h1 = np.sqrt(z1[2] * z1[3]), np.sqrt(z1[2] / z1[3])
            w2, h2 = np.sqrt(z2[2] * z2[3]), np.sqrt(z2[2] / z2[3])
            gap = self.age - self.last_obs_age
            for i in range(gap):
                t = (i + 1) / gap
                vx = z1[0] + (z2[0] - z1[0]) * t
                vy = z1[1] + (z2[1] - z1[1]) * t
                vw = w1 + (w2 - w1) * t
                vh = h1 + (h2 - h1) * t
                self.kf_update(np.array([vx, vy, vw * vh, vw / vh]))
                if i != gap - 1:
                    if self.x[6] + self.x[2] <= 0:
                        self.x[6] = 0.0
                    self.x = F @ self.x
                    self.P = F @ self.P @ F.T + Q
        self.observed = True
        obs5 = np.concatenate([ltrb, [conf]])
        self.last_obs = obs5
        self.observations[self.age] = obs5
        self.last_obs_age = self.age
        self.time_since_update = 0
        self.hits += 1
        self.hit_streak += 1
        self.conf, self.cls, self.ref = conf, cls, ref
        self.kf_update(to_z(ltrb))

    def k_previous_obs(self, k):
        if not self.observations:
            return np.full(5, -1.0)
        for i in range(k):
            dt = k - i
            if self.age - dt in self.observations:
                return self.observations[self.age - dt]
        return self.observations[max(self.observations)]


class OCSortOracle:
    def __init__(self, det_thresh, max_age=50, min_hits=1,
                 iou_threshold=0.22, delta_t=3, inertia=0.39,
                 use_byte=False):
        self.det_thresh = det_thresh
        self.max_age = max_age
        self.min_hits = min_hits
        self.iou_threshold = iou_threshold
        self.delta_t = delta_t
        self.inertia = inertia
        self.use_byte = use_byte
        self.tracks: list[KTrack] = []
        self.frame_count = 0
        KTrack._count = 0

    def _assign(self, cost):
        r, c = linear_sum_assignment(cost)
        return list(zip(r, c))

    def update(self, dets):
        """dets: (N, 7) [x1,y1,x2,y2,conf,cls,ref]. Returns list of
        (ltrb, id+1, cls, conf, ref) for emitted tracks."""
        self.frame_count += 1
        dets = np.asarray(dets, dtype=np.float64).reshape(-1, 7)
        conf = dets[:, 4]
        first = dets[conf > self.det_thresh]
        second = dets[(conf > 0.1) & (conf < self.det_thresh)]

        # predict + NaN eviction
        boxes = []
        dead = []
        for i, t in enumerate(self.tracks):
            b = t.predict()
            if np.any(np.isnan(b)):
                dead.append(i)
            boxes.append(b)
        for i in reversed(dead):
            self.tracks.pop(i)
            boxes.pop(i)
        trks = np.array(boxes) if boxes else np.zeros((0, 4))

        velocities = np.array([
            t.velocity if t.velocity is not None else np.zeros(2)
            for t in self.tracks]).reshape(-1, 2)
        k_obs = np.array([
            t.k_previous_obs(self.delta_t) for t in self.tracks]
        ).reshape(-1, 5)

        matched_t = set()
        matched_d = set()
        if len(self.tracks) and len(first):
            iou = iou_mat(first[:, :4], trks)
            # velocity-direction cost
            dcx = (first[:, 0] + first[:, 2]) / 2
            dcy = (first[:, 1] + first[:, 3]) / 2
            tcx = (k_obs[:, 0] + k_obs[:, 2]) / 2
            tcy = (k_obs[:, 1] + k_obs[:, 3]) / 2
            dx = dcx[None, :] - tcx[:, None]
            dy = dcy[None, :] - tcy[:, None]
            nrm = np.sqrt(dx ** 2 + dy ** 2) + 1e-6
            cos = (velocities[:, 1:2] * dx / nrm
                   + velocities[:, 0:1] * dy / nrm)
            ang = (np.pi / 2 - np.abs(np.arccos(np.clip(cos, -1, 1)))) / np.pi
            vmask = (k_obs[:, 4] >= 0).astype(float)[:, None]
            # reference quirk: angle cost scaled by the CLASS column
            # (association.py:259 on the 6-col [ltrb,conf,cls] slice)
            angle_cost = ((vmask * ang) * self.inertia).T * first[:, 5:6]

            a = (iou > self.iou_threshold).astype(int)
            if a.sum(1).max() == 1 and a.sum(0).max() == 1:
                pairs = list(zip(*np.where(a)))
            else:
                pairs = self._assign(-(iou + angle_cost))
            for d, t in pairs:
                if iou[d, t] < self.iou_threshold:
                    continue
                self.tracks[t].update(first[d, :4], first[d, 4],
                                      first[d, 5], first[d, 6])
                matched_t.add(t)
                matched_d.add(d)

        # BYTE stage
        if self.use_byte and len(second):
            u_t = [i for i in range(len(self.tracks)) if i not in matched_t]
            if u_t:
                iou2 = iou_mat(second[:, :4], trks[u_t])
                if iou2.size and iou2.max() > self.iou_threshold:
                    for d, j in self._assign(-iou2):
                        if iou2[d, j] < self.iou_threshold:
                            continue
                        t = u_t[j]
                        self.tracks[t].update(second[d, :4], second[d, 4],
                                              second[d, 5], second[d, 6])
                        matched_t.add(t)

        # OCR stage on last observations
        u_d = [i for i in range(len(first)) if i not in matched_d]
        u_t = [i for i in range(len(self.tracks)) if i not in matched_t]
        if u_d and u_t:
            last = np.array([
                self.tracks[i].last_obs[:4]
                if self.tracks[i].last_obs is not None else np.full(4, -1.0)
                for i in u_t])
            iou3 = iou_mat(first[u_d, :4], last)
            if iou3.max() > self.iou_threshold:
                for dd, jj in self._assign(-iou3):
                    if iou3[dd, jj] < self.iou_threshold:
                        continue
                    d, t = u_d[dd], u_t[jj]
                    self.tracks[t].update(first[d, :4], first[d, 4],
                                          first[d, 5], first[d, 6])
                    matched_t.add(t)
                    matched_d.add(d)

        for i, t in enumerate(self.tracks):
            if i not in matched_t:
                t.miss()

        # births
        for d in range(len(first)):
            if d not in matched_d:
                self.tracks.append(KTrack(first[d, :4], first[d, 4],
                                          first[d, 5], first[d, 6],
                                          self.delta_t))

        out = []
        for t in self.tracks:
            if t.time_since_update < 1 and (
                    t.hit_streak >= self.min_hits
                    or self.frame_count <= self.min_hits):
                box = t.last_obs[:4] if t.last_obs is not None \
                    else to_ltrb(t.x)
                out.append((box.copy(), t.id + 1, t.cls, t.conf, int(t.ref)))
        self.tracks = [t for t in self.tracks
                       if t.time_since_update <= self.max_age]
        return out
