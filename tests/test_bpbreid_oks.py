"""OKS kernel vs a numpy oracle of the reference formula, plus functional
BPBReID-StrongSORT tests (identity maintenance with part features, OKS
motion mode for pose tracking)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tracklab_tpu.ops.oks import oks_similarity, COCO_KAPPA


def np_oks(kp, candidates):
    """Oracle re-derived from oks_matching.py:30-94."""
    kappa = np.asarray(COCO_KAPPA)[: kp.shape[0]]
    visible = kp[:, 2] > 0
    tl = kp[visible].min(0)
    br = kp[visible].max(0)
    area = (br[0] - tl[0]) * (br[1] - tl[1])
    ttl, tbr = kp.min(0), kp.max(0)
    total_area = (tbr[0] - ttl[0]) * (tbr[1] - ttl[1])
    c = s = np.sqrt(0.5)
    rot = np.array([[c, -s], [s, c]])
    kp45 = kp.copy()
    kp45[:, :2] = kp[:, :2] @ rot.T
    tl45 = kp45[visible].min(0)
    br45 = kp45[visible].max(0)
    area45 = (br45[0] - tl45[0]) * (br45[1] - tl45[1])
    ttl45, tbr45 = kp45.min(0), kp45.max(0)
    total45 = (tbr45[0] - ttl45[0]) * (tbr45[1] - ttl45[1])
    factor = np.sqrt(min(total_area / area if area > 0.1 else np.inf,
                         total45 / area45 if area45 > 0.1 else np.inf))
    factor = min(5.0, factor)
    scale = np.sqrt(area) * factor
    if scale < 0.1:
        scale = np.nan
    d = np.sqrt((kp[:, 0] - candidates[:, :, 0]) ** 2
                + (kp[:, 1] - candidates[:, :, 1]) ** 2)
    per = np.exp(-(d ** 2) / (2 * scale ** 2 * kappa ** 2)) \
        * visible.astype(float)
    return per.sum(1) / visible.sum()


def random_skeleton(rng, cx, cy, spread=60):
    kp = np.zeros((17, 3))
    kp[:, 0] = cx + rng.normal(0, spread, 17)
    kp[:, 1] = cy + rng.normal(0, spread, 17)
    kp[:, 2] = rng.uniform(0.3, 1.0, 17)
    return kp


class TestOKS:
    def test_matches_reference_formula(self):
        rng = np.random.default_rng(0)
        for trial in range(10):
            kp = random_skeleton(rng, 500, 400)
            if trial % 3 == 0:
                kp[rng.integers(0, 17, 5), 2] = 0.0  # invisible kps
            cands = np.stack([random_skeleton(rng, 500 + rng.normal(0, 40),
                                              400 + rng.normal(0, 40))
                              for _ in range(6)])
            want = np_oks(kp, cands)
            got = np.asarray(oks_similarity(jnp.asarray(kp),
                                            jnp.asarray(cands)))
            np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_identical_skeleton_is_one(self):
        rng = np.random.default_rng(1)
        kp = random_skeleton(rng, 300, 300)
        got = np.asarray(oks_similarity(jnp.asarray(kp),
                                        jnp.asarray(kp[None])))
        np.testing.assert_allclose(got, 1.0, atol=1e-6)


class TestBPBReIDStrongSort:
    def _run(self, motion, strategy="strong_sort"):
        from tracklab_tpu.trackers.bpbreid_strongsort import (
            BPBReIDStrongSortConfig, bpbreid_scan,
        )
        from tracklab_tpu.trackers.common import Detections
        rng = np.random.default_rng(0)
        F, D, P, E, K = 30, 8, 4, 16, 17
        cfg = BPBReIDStrongSortConfig(
            motion_criterium=motion, matching_strategy=strategy,
            n_parts=P, embed_dim=E,
            n_keypoints=K, max_tracks=16, max_dets=D, n_init=2,
            max_dist=0.3)
        n_obj = 4
        base_feat = rng.normal(size=(n_obj, P, E))
        pos = rng.uniform(200, 800, (n_obj, 2))
        vel = rng.uniform(-2, 2, (n_obj, 2))
        ltrb = np.zeros((F, D, 4), np.float32)
        conf = np.zeros((F, D), np.float32)
        valid = np.zeros((F, D), bool)
        feat = np.zeros((F, D, P, E), np.float32)
        vis = np.zeros((F, D, P), np.float32)
        kps = np.zeros((F, D, K, 3), np.float32)
        gt = np.full((F, D), -1)
        for f in range(F):
            pos = pos + vel
            for k in range(n_obj):
                if rng.uniform() < 0.15:
                    continue
                c = pos[k]
                ltrb[f, k] = [c[0], c[1], c[0] + 60, c[1] + 140]
                conf[f, k] = rng.uniform(0.7, 1.0)
                valid[f, k] = True
                feat[f, k] = base_feat[k] + rng.normal(0, 0.05, (P, E))
                vis[f, k] = rng.uniform(0.5, 1.0, P)
                kps[f, k, :, 0] = c[0] + np.linspace(5, 55, K) \
                    + rng.normal(0, 1, K)
                kps[f, k, :, 1] = c[1] + np.linspace(10, 130, K)
                kps[f, k, :, 2] = 1.0
                gt[f, k] = k
        dets = Detections(
            jnp.asarray(ltrb), jnp.asarray(conf),
            jnp.ones((F, D), jnp.float32),
            jnp.broadcast_to(jnp.arange(D, dtype=jnp.int32), (F, D)),
            jnp.asarray(valid))
        fn = jax.jit(lambda d, fe, vi, kp: bpbreid_scan(cfg, d, fe, vi, kp))
        _, out = fn(dets, jnp.asarray(feat), jnp.asarray(vis),
                    jnp.asarray(kps))
        # identity consistency: each gt object maps to one track id
        mapping = {}
        v = np.asarray(out.valid)
        tid = np.asarray(out.track_id)
        ref = np.asarray(out.ref)
        for f in range(2, F):
            for t in np.nonzero(v[f])[0]:
                r = ref[f, t]
                g = gt[f, r] if r >= 0 else -1
                if g < 0:
                    continue
                mapping.setdefault(g, set()).add(int(tid[f, t]))
        assert len(mapping) == n_obj
        for g, ids in mapping.items():
            assert len(ids) == 1, f"object {g} split into {ids}"

    def test_iou_motion(self):
        self._run("iou")

    def test_bot_sort_strategy(self):
        self._run("iou", strategy="bot_sort")

    def test_oks_motion(self):
        self._run("oks")

    def test_pred_kf_snapshot_and_state(self):
        """The reference extras (bpbreid_strong_sort_api.py:20-30):
        emitted rows carry the lifecycle state int (always CONFIRMED=2,
        since only confirmed tracks emit) and the KF box snapshot taken
        at match time — post-predict, PRE-update (track.py:148), so for
        a matched track it must differ from the post-update box but sit
        near the track's detection."""
        from tracklab_tpu.trackers.bpbreid_strongsort import (
            BPBReIDStrongSortConfig, bpbreid_init, bpbreid_scan,
        )
        from tracklab_tpu.trackers.common import Detections
        F, D, P, E, K = 8, 4, 3, 8, 17
        cfg = BPBReIDStrongSortConfig(
            n_parts=P, embed_dim=E, n_keypoints=K, max_tracks=8,
            max_dets=D, n_init=1, max_dist=0.6)
        # one static object, detected every frame
        ltrb = np.zeros((F, D, 4), np.float32)
        conf = np.zeros((F, D), np.float32)
        valid = np.zeros((F, D), bool)
        feat = np.zeros((F, D, P, E), np.float32)
        vis = np.zeros((F, D, P), np.float32)
        kps = np.zeros((F, D, K, 3), np.float32)
        ltrb[:, 0] = [100, 100, 160, 240]
        conf[:, 0] = 0.9
        valid[:, 0] = True
        feat[:, 0] = 1.0
        vis[:, 0] = 1.0
        dets = Detections(
            jnp.asarray(ltrb), jnp.asarray(conf),
            jnp.ones((F, D), jnp.float32),
            jnp.broadcast_to(jnp.arange(D, dtype=jnp.int32), (F, D)),
            jnp.asarray(valid))
        _, out = jax.jit(lambda d, fe, vi, kp: bpbreid_scan(
            cfg, d, fe, vi, kp))(dets, jnp.asarray(feat),
                                 jnp.asarray(vis), jnp.asarray(kps))
        v = np.asarray(out.valid)
        assert v[1:].any(), "static object should emit from frame 1"
        state = np.asarray(out.tstate)
        pred = np.asarray(out.pred_ltrb)
        post = np.asarray(out.ltrb)
        for f in range(F):
            for t in np.nonzero(v[f])[0]:
                assert state[f, t] == 2          # CONFIRMED
                assert np.isfinite(pred[f, t]).all()
                # snapshot ~ the (static) detection box, and recorded
                # BEFORE the measurement update that produced out.ltrb
                np.testing.assert_allclose(
                    pred[f, t], [100, 100, 160, 240], atol=20)
                np.testing.assert_allclose(
                    post[f, t], [100, 100, 160, 240], atol=5)
        # never-updated slots stay NaN in the state (birth fill)
        init = bpbreid_init(cfg)
        assert np.isnan(np.asarray(init.last_pred_ltrb)).all()
