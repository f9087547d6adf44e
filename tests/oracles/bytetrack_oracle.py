"""Independent numpy/scipy oracle of ByteTrack semantics (spec for the JAX
scan tracker). Mirrors plugins/track/byte_track/byte_tracker.py behavior with
true-ltrb association geometry (see bytetrack.py docstring for the one
documented deviation from the vendored center-xywh quirk)."""
from __future__ import annotations

import numpy as np
from scipy.optimize import linear_sum_assignment

WP, WV = 1.0 / 20, 1.0 / 160
F = np.eye(8) + np.eye(8, k=4)
H = np.eye(4, 8)

TRACKED, LOST, REMOVED = 1, 2, 3


def initiate(z):
    h = z[3]
    mean = np.concatenate([z, np.zeros(4)])
    std = np.array([2 * WP * h, 2 * WP * h, 1e-2, 2 * WP * h,
                    10 * WV * h, 10 * WV * h, 1e-5, 10 * WV * h])
    return mean, np.diag(std ** 2)


def predict(mean, cov):
    h = mean[3]
    std = np.array([WP * h, WP * h, 1e-2, WP * h,
                    WV * h, WV * h, 1e-5, WV * h])
    return F @ mean, F @ cov @ F.T + np.diag(std ** 2)


def update(mean, cov, z):
    h = mean[3]
    std = np.array([WP * h, WP * h, 1e-1, WP * h])
    pm = H @ mean
    pc = H @ cov @ H.T + np.diag(std ** 2)
    K = np.linalg.solve(pc, (cov @ H.T).T).T
    return mean + K @ (z - pm), cov - K @ pc @ K.T


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


def assign_limit(cost, thresh):
    """lap.lapjv(extend_cost=True, cost_limit=thresh) emulation."""
    n, m = cost.shape
    if n == 0 or m == 0:
        return [], list(range(n)), list(range(m))
    ext = np.full((n + m, n + m), thresh / 2.0)
    ext[n:, m:] = 0.0
    ext[:n, :m] = cost
    rows, cols = linear_sum_assignment(ext)
    matches, ur, uc = [], set(range(n)), set(range(m))
    for r, c in zip(rows, cols):
        if r < n and c < m:
            matches.append((r, c))
            ur.discard(r)
            uc.discard(c)
    return matches, sorted(ur), sorted(uc)


class OTrack:
    def __init__(self, ltrb, score, cls, ref):
        self.ltrb_init = ltrb
        self.score, self.cls, self.ref = score, cls, ref
        self.mean = self.cov = None
        self.state = TRACKED
        self.is_activated = False
        self.tracklet_len = 0

    def tlbr(self):
        if self.mean is None:
            return self.ltrb_init
        return mean_to_ltrb(self.mean)


class ByteTrackOracle:
    def __init__(self, track_thresh=0.6, match_thresh=0.8, track_buffer=25,
                 frame_rate=30):
        self.track_thresh = track_thresh
        self.match_thresh = match_thresh
        self.det_thresh = track_thresh + 0.1
        self.max_time_lost = int(frame_rate / 30.0 * track_buffer)
        self.tracked, self.lost, self.removed = [], [], []
        self.frame_id = 0
        self._next = 0

    def next_id(self):
        self._next += 1
        return self._next

    def update(self, dets):
        """dets: (N, 7) [ltrb, conf, cls, ref]."""
        self.frame_id += 1
        dets = np.asarray(dets, np.float64).reshape(-1, 7)
        conf = dets[:, 4]
        first = dets[conf > self.track_thresh]
        second = dets[(conf > 0.1) & (conf < self.track_thresh)]

        unconfirmed = [t for t in self.tracked if not t.is_activated]
        tracked = [t for t in self.tracked if t.is_activated]
        pool = tracked + [t for t in self.lost
                          if t not in tracked]

        for t in pool:
            m = t.mean.copy()
            if t.state != TRACKED:
                m[7] = 0.0
            t.mean, t.cov = predict(m, t.cov)

        def do_update(t, row):
            t.mean, t.cov = update(t.mean, t.cov, ltrb_to_xyah(row[:4]))
            if t.state == TRACKED:
                t.tracklet_len += 1
            else:
                t.tracklet_len = 0
            t.state = TRACKED
            t.is_activated = True
            t.score, t.cls, t.ref = row[4], row[5], row[6]
            t.frame_end = self.frame_id

        # stage 1
        if len(pool) and len(first):
            iou = iou_mat([t.tlbr() for t in pool], first[:, :4])
            dist = 1 - iou
            dist = 1 - (1 - dist) * first[None, :, 4]
            matches, u_t, u_d = assign_limit(dist, self.match_thresh)
        else:
            matches, u_t, u_d = [], list(range(len(pool))), \
                list(range(len(first)))
        for it, idd in matches:
            do_update(pool[it], first[idd])

        # stage 2
        r_tracked = [pool[i] for i in u_t if pool[i].state == TRACKED]
        if len(r_tracked) and len(second):
            dist = 1 - iou_mat([t.tlbr() for t in r_tracked], second[:, :4])
            m2, u_t2, _ = assign_limit(dist, 0.5)
        else:
            m2, u_t2 = [], list(range(len(r_tracked)))
        for it, idd in m2:
            do_update(r_tracked[it], second[idd])
        new_lost = []
        for i in u_t2:
            t = r_tracked[i]
            if t.state != LOST:
                t.state = LOST
                new_lost.append(t)

        # stage 3: unconfirmed
        left = [first[i] for i in u_d]
        if len(unconfirmed) and len(left):
            dist = 1 - iou_mat([t.tlbr() for t in unconfirmed],
                               np.array([r[:4] for r in left]))
            dist = 1 - (1 - dist) * np.array([r[4] for r in left])[None, :]
            m3, u_unc, u_d3 = assign_limit(dist, 0.7)
        else:
            m3, u_unc, u_d3 = [], list(range(len(unconfirmed))), \
                list(range(len(left)))
        for it, idd in m3:
            do_update(unconfirmed[it], left[idd])
        for i in u_unc:
            unconfirmed[i].state = REMOVED

        # births
        births = []
        for i in u_d3:
            row = left[i]
            if row[4] < self.det_thresh:
                continue
            t = OTrack(row[:4].copy(), row[4], row[5], row[6])
            t.mean, t.cov = initiate(ltrb_to_xyah(row[:4]))
            t.track_id = self.next_id()
            t.is_activated = self.frame_id == 1
            t.frame_start = t.frame_end = self.frame_id
            births.append(t)

        # stale lost -> removed
        for t in self.lost:
            if self.frame_id - t.frame_end > self.max_time_lost:
                t.state = REMOVED

        # tracked = previously-tracked still TRACKED + refound lost + births
        seen = set()
        cur_tracked = [
            t for t in self.tracked + self.lost + births
            if t.state == TRACKED
            and id(t) not in seen and not seen.add(id(t))]
        seen = set()
        cur_lost = [t for t in self.lost + new_lost
                    if t.state == LOST
                    and id(t) not in seen and not seen.add(id(t))]

        # duplicate suppression
        if cur_tracked and cur_lost:
            pd = 1 - iou_mat([t.tlbr() for t in cur_tracked],
                             [t.tlbr() for t in cur_lost])
            drop_t, drop_l = set(), set()
            for p, q in zip(*np.where(pd < 0.15)):
                timep = cur_tracked[p].frame_end - cur_tracked[p].frame_start
                timeq = cur_lost[q].frame_end - cur_lost[q].frame_start
                if timep > timeq:
                    drop_l.add(q)
                else:
                    drop_t.add(p)
            cur_tracked = [t for i, t in enumerate(cur_tracked)
                           if i not in drop_t]
            cur_lost = [t for i, t in enumerate(cur_lost)
                        if i not in drop_l]

        self.tracked, self.lost = cur_tracked, cur_lost

        out = []
        for t in self.tracked:
            if t.is_activated:
                out.append((mean_to_ltrb(t.mean), t.track_id,
                            float(t.cls), float(t.score), int(t.ref)))
        return out
