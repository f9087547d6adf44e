"""Independent numpy/scipy oracle of BoT-SORT semantics (spec for the JAX
scan tracker): xywh KF, GMC warps, fuse_motion stage 1, IoU stage 2,
min(iou-fused, emb) unconfirmed stage, EMA features."""
from __future__ import annotations

import numpy as np

from oracles.bytetrack_oracle import assign_limit, iou_mat

WP, WV = 1.0 / 20, 1.0 / 160
F8 = np.eye(8) + np.eye(8, k=4)
H4 = np.eye(4, 8)
CHI2_4 = 9.4877

TRACKED, LOST, REMOVED = 1, 2, 3


def initiate(z):
    w, h = z[2], z[3]
    mean = np.concatenate([z, np.zeros(4)])
    std = np.array([2 * WP * w, 2 * WP * h, 2 * WP * w, 2 * WP * h,
                    10 * WV * w, 10 * WV * h, 10 * WV * w, 10 * WV * h])
    return mean, np.diag(std ** 2)


def predict(mean, cov):
    w, h = mean[2], mean[3]
    std = np.array([WP * w, WP * h, WP * w, WP * h,
                    WV * w, WV * h, WV * w, WV * h])
    return F8 @ mean, F8 @ cov @ F8.T + np.diag(std ** 2)


def project(mean, cov):
    w, h = mean[2], mean[3]
    std = np.array([WP * w, WP * h, WP * w, WP * h])
    return H4 @ mean, H4 @ cov @ H4.T + np.diag(std ** 2)


def kf_update(mean, cov, z):
    pm, pc = project(mean, cov)
    K = np.linalg.solve(pc, (cov @ H4.T).T).T
    return mean + K @ (z - pm), cov - K @ pc @ K.T


def gating_distance(mean, cov, zs):
    pm, pc = project(mean, cov)
    L = np.linalg.cholesky(pc)
    sol = np.linalg.solve(L, (zs - pm).T)
    return np.sum(sol * sol, axis=0)


def ltrb_to_xywh(b):
    w, h = b[2] - b[0], b[3] - b[1]
    return np.array([b[0] + w / 2, b[1] + h / 2, w, h])


def mean_to_ltrb(m):
    return np.array([m[0] - m[2] / 2, m[1] - m[3] / 2,
                     m[0] + m[2] / 2, m[1] + m[3] / 2])


def gmc_apply(mean, cov, warp):
    R = warp[:2, :2]
    t = warp[:2, 2]
    R8 = np.kron(np.eye(4), R)
    m = R8 @ mean
    m[:2] += t
    return m, R8 @ cov @ R8.T


class OTrack:
    def __init__(self, ltrb, score, cls, ref, feat, alpha):
        self.mean, self.cov = initiate(ltrb_to_xywh(ltrb))
        self.score, self.cls, self.ref = score, cls, ref
        self.state = TRACKED
        self.is_activated = False
        self.alpha = alpha
        self.feat = (feat / np.linalg.norm(feat)) \
            if feat is not None else None

    def tlbr(self):
        return mean_to_ltrb(self.mean)

    def upd_feature(self, feat):
        if feat is None:
            return
        feat = feat / np.linalg.norm(feat)
        if self.feat is None:
            self.feat = feat
        else:
            sm = self.alpha * self.feat + (1 - self.alpha) * feat
            self.feat = sm / np.linalg.norm(sm)


class BotSortOracle:
    def __init__(self, track_high_thresh=0.3382, new_track_thresh=0.2114,
                 track_buffer=60, match_thresh=0.2273,
                 proximity_thresh=0.5945, appearance_thresh=0.4818,
                 lambda_=0.9896, frame_rate=30, ema_alpha=0.9):
        self.p = dict(locals())
        self.p.pop("self")
        self.max_time_lost = int(frame_rate / 30 * track_buffer)
        self.tracked, self.lost, self.removed = [], [], []
        self.frame_id = 0
        self._next = 0

    def update(self, dets, feats, warp=None):
        p = self.p
        self.frame_id += 1
        dets = np.asarray(dets, np.float64).reshape(-1, 7)
        feats = np.asarray(feats, np.float64).reshape(len(dets), -1)
        if warp is None:
            warp = np.eye(2, 3)
        conf = dets[:, 4]
        hi = np.nonzero(conf > p["track_high_thresh"])[0]
        lo = np.nonzero((conf > 0.1)
                        & (conf < p["track_high_thresh"]))[0]

        unconfirmed = [t for t in self.tracked if not t.is_activated]
        tracked = [t for t in self.tracked if t.is_activated]
        pool = tracked + self.lost
        for t in pool:
            m = t.mean.copy()
            if t.state != TRACKED:
                m[7] = 0.0
            t.mean, t.cov = predict(m, t.cov)
        for t in pool + unconfirmed:
            t.mean, t.cov = gmc_apply(t.mean, t.cov, warp)

        def do_update(t, j, with_feat):
            t.mean, t.cov = kf_update(t.mean, t.cov,
                                      ltrb_to_xywh(dets[j, :4]))
            if with_feat:
                t.upd_feature(feats[j])
            t.state = TRACKED
            t.is_activated = True
            t.score, t.cls, t.ref = dets[j, 4], dets[j, 5], dets[j, 6]
            t.frame_end = self.frame_id

        # stage 1: fuse_motion
        m1, u_t1, u_d1 = [], list(range(len(pool))), list(hi)
        if pool and len(hi):
            det_xywh = np.array([ltrb_to_xywh(dets[j, :4]) for j in hi])
            fset = feats[hi] / np.maximum(np.linalg.norm(
                feats[hi], axis=1, keepdims=True), 1e-12)
            cost = np.zeros((len(pool), len(hi)))
            for r, t in enumerate(pool):
                emb = np.maximum(0.0, 1 - t.feat @ fset.T)
                gd = gating_distance(t.mean, t.cov, det_xywh)
                emb[gd > CHI2_4] = np.inf
                cost[r] = p["lambda_"] * emb + (1 - p["lambda_"]) * gd
            m, ut, ud = assign_limit(cost, p["match_thresh"])
            m1 = [(pool[r], hi[c]) for r, c in m]
            u_t1 = ut
            u_d1 = [hi[c] for c in ud]
        for t, j in m1:
            do_update(t, j, True)

        # stage 2
        r_tracked = [pool[i] for i in u_t1
                     if pool[i].state == TRACKED]
        new_lost = []
        if r_tracked and len(lo):
            cost = 1 - iou_mat([t.tlbr() for t in r_tracked],
                               dets[lo, :4])
            m, ut, _ = assign_limit(cost, 0.5)
            for r, c in m:
                do_update(r_tracked[r], lo[c], False)
            u_t2 = ut
        else:
            u_t2 = list(range(len(r_tracked)))
        for i in u_t2:
            t = r_tracked[i]
            if t.state != LOST:
                t.state = LOST
                new_lost.append(t)

        # stage 3: unconfirmed
        m3, u_unc, u_d3 = [], list(range(len(unconfirmed))), list(u_d1)
        if unconfirmed and u_d1:
            dboxes = dets[np.array(u_d1), :4]
            ious = 1 - iou_mat([t.tlbr() for t in unconfirmed], dboxes)
            prox = ious > p["proximity_thresh"]
            fused = 1 - (1 - ious) * conf[np.array(u_d1)][None, :]
            fset = feats[np.array(u_d1)]
            fset = fset / np.maximum(np.linalg.norm(
                fset, axis=1, keepdims=True), 1e-12)
            emb = np.zeros_like(ious)
            for r, t in enumerate(unconfirmed):
                if t.feat is None:
                    emb[r] = 1.0
                    continue
                emb[r] = np.maximum(0.0, 1 - t.feat @ fset.T) / 2.0
            emb[emb > p["appearance_thresh"]] = 1.0
            emb[prox] = 1.0
            dist = np.minimum(fused, emb)
            m, uu, ud = assign_limit(dist, 0.7)
            m3 = [(unconfirmed[r], u_d1[c]) for r, c in m]
            u_unc = uu
            u_d3 = [u_d1[c] for c in ud]
        for t, j in m3:
            do_update(t, j, True)
        for i in u_unc:
            unconfirmed[i].state = REMOVED

        # births
        births = []
        for j in u_d3:
            if conf[j] < p["new_track_thresh"]:
                continue
            self._next += 1
            t = OTrack(dets[j, :4], conf[j], dets[j, 5], dets[j, 6],
                       feats[j], p["ema_alpha"])
            t.track_id = self._next
            t.is_activated = self.frame_id == 1
            t.frame_start = t.frame_end = self.frame_id
            births.append(t)

        for t in self.lost:
            if self.frame_id - t.frame_end > self.max_time_lost:
                t.state = REMOVED

        seen = set()
        cur_tracked = [
            t for t in self.tracked + self.lost + births
            if t.state == TRACKED
            and id(t) not in seen and not seen.add(id(t))]
        seen = set()
        cur_lost = [t for t in self.lost + new_lost
                    if t.state == LOST
                    and id(t) not in seen and not seen.add(id(t))]

        if cur_tracked and cur_lost:
            pd_ = 1 - iou_mat([t.tlbr() for t in cur_tracked],
                              [t.tlbr() for t in cur_lost])
            drop_t, drop_l = set(), set()
            for q, r in zip(*np.where(pd_ < 0.15)):
                tp = cur_tracked[q].frame_end - cur_tracked[q].frame_start
                tq = cur_lost[r].frame_end - cur_lost[r].frame_start
                if tp > tq:
                    drop_l.add(r)
                else:
                    drop_t.add(q)
            cur_tracked = [t for i, t in enumerate(cur_tracked)
                           if i not in drop_t]
            cur_lost = [t for i, t in enumerate(cur_lost)
                        if i not in drop_l]
        self.tracked, self.lost = cur_tracked, cur_lost

        out = []
        for t in self.tracked:
            if t.is_activated:
                out.append((t.tlbr(), t.track_id, float(t.cls),
                            float(t.score), int(t.ref)))
        return out
