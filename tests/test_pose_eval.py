"""Pose metrics tests: OKS-HOTA on perfect/perturbed predictions, keypoint
mAP golden behaviors, PoseTrack dataset loader round-trip."""
import json
import numpy as np
import pandas as pd
import pytest

from tracklab_tpu.eval.metrics import evaluate_sequence
from tracklab_tpu.eval.pose_metrics import (
    make_pose_sequence_data, keypoint_map, np_oks_matrix,
)


def synth_pose_video(seed=0, n_frames=20, n_obj=3):
    rng = np.random.default_rng(seed)
    base = {}
    for k in range(n_obj):
        c = rng.uniform(200, 800, 2)
        kp = np.zeros((17, 3))
        kp[:, 0] = c[0] + np.linspace(0, 60, 17)
        kp[:, 1] = c[1] + np.linspace(0, 150, 17)
        kp[:, 2] = 1.0
        base[k] = (kp, rng.uniform(-3, 3, 2))
    frames = {}
    for f in range(n_frames):
        ids, kps = [], []
        for k, (kp, vel) in base.items():
            kk = kp.copy()
            kk[:, :2] += vel * f
            ids.append(k + 1)
            kps.append(kk)
        frames[f + 1] = (np.array(ids), np.stack(kps))
    return frames


class TestPoseHOTA:
    def test_perfect_prediction_is_100(self):
        gt = synth_pose_video()
        data = make_pose_sequence_data(gt, gt)
        res = evaluate_sequence(data)
        assert res["HOTA"] > 99.9
        assert res["MOTA"] > 99.9
        assert res["IDF1"] > 99.9

    def test_id_switch_hurts_assa(self):
        gt = synth_pose_video()
        pred = {}
        for f, (ids, kps) in gt.items():
            new_ids = ids.copy()
            if f > 10:  # swap two identities mid-video
                new_ids = np.where(ids == 1, 99, new_ids)
            pred[f] = (new_ids, kps)
        full = evaluate_sequence(make_pose_sequence_data(gt, gt))
        broken = evaluate_sequence(make_pose_sequence_data(gt, pred))
        assert broken["AssA"] < full["AssA"] - 5
        assert broken["DetA"] == pytest.approx(full["DetA"], abs=1e-6)


class TestKeypointMAP:
    def test_perfect_is_100(self):
        gt = synth_pose_video()
        kp = {f: v[1] for f, v in gt.items()}
        scores = {f: np.ones(len(v[1])) for f, v in gt.items()}
        res = keypoint_map(kp, kp, scores)
        assert res["kp_mAP"] > 99.0

    def test_noise_degrades(self):
        rng = np.random.default_rng(0)
        gt = synth_pose_video()
        kp = {f: v[1] for f, v in gt.items()}
        noisy = {f: v + rng.normal(0, 10, v.shape) for f, v in kp.items()}
        scores = {f: np.ones(len(v)) for f, v in kp.items()}
        res_clean = keypoint_map(kp, kp, scores)
        res_noisy = keypoint_map(kp, noisy, scores)
        assert res_noisy["kp_mAP"] < res_clean["kp_mAP"]

    def test_oks_matrix_device_host_agree(self):
        import jax.numpy as jnp
        from tracklab_tpu.ops.oks import oks_matrix
        rng = np.random.default_rng(1)
        gt = synth_pose_video(1)[1][1]
        pred = gt + rng.normal(0, 5, gt.shape)
        host = np_oks_matrix(gt, pred)
        dev = np.asarray(oks_matrix(jnp.asarray(gt), jnp.asarray(pred)))
        np.testing.assert_allclose(host, dev, rtol=1e-4)


class TestPoseTrackDataset:
    def test_json_roundtrip(self, tmp_path):
        from tracklab_tpu.wrappers.dataset.posetrack import PoseTrack21
        ann_dir = tmp_path / "anns" / "val"
        ann_dir.mkdir(parents=True)
        kp = (np.tile([100.0, 200.0, 1.0], 17)
              + np.repeat(np.arange(17) * 3.0, 3)).tolist()
        data = {
            "images": [
                {"id": 101, "file_name": "v1/000001.jpg",
                 "is_labeled": True, "vid_id": "0001",
                 "ignore_regions_x": [[0, 10, 10, 0]],
                 "ignore_regions_y": [[0, 0, 10, 10]]},
                {"id": 102, "file_name": "v1/000002.jpg",
                 "is_labeled": True, "vid_id": "0001"},
            ],
            "annotations": [
                {"image_id": 101, "track_id": 0, "person_id": 7,
                 "bbox": [90, 190, 80, 160], "keypoints": kp,
                 "category_id": 1},
                {"image_id": 102, "track_id": 0, "person_id": 7,
                 "keypoints": kp, "category_id": 1},
            ],
            "categories": [{"id": 1, "name": "person"}],
        }
        with open(ann_dir / "v1.json", "w") as fp:
            json.dump(data, fp)
        ds = PoseTrack21(str(tmp_path), str(tmp_path / "anns"))
        ts = ds.sets["val"]
        assert len(ts.video_metadatas) == 1
        assert len(ts.image_metadatas) == 2
        assert len(ts.detections_gt) == 2
        det = ts.detections_gt.iloc[0]
        assert det["keypoints_xyc"].shape == (17, 3)
        np.testing.assert_allclose(det["bbox_ltwh"], [90, 190, 80, 160])
        # second annotation has no bbox -> derived from keypoints
        det2 = ts.detections_gt.iloc[1]
        assert det2["bbox_ltwh"][2] > 0


def test_fraga_penalizes_flip_flop():
    """FragA (PoseTrack21 HOTA extension): same match counts, but
    alternating between two pred ids every frame fragments the track and
    must score far below two clean 5-frame halves."""
    import numpy as np
    from tracklab_tpu.eval.metrics import (
        evaluate_sequence, make_sequence_data,
    )

    box = np.array([[10.0, 10.0, 20.0, 40.0]])

    def seq(pred_id_per_frame):
        gt = {f: (np.array([1]), box) for f in range(10)}
        pred = {f: (np.array([pid]), box)
                for f, pid in enumerate(pred_id_per_frame)}
        return evaluate_sequence(make_sequence_data(gt, pred))

    halves = seq([1] * 5 + [2] * 5)
    flip = seq([1, 2] * 5)
    perfect = seq([1] * 10)
    assert perfect["FragA"] == pytest.approx(perfect["AssA"])
    assert perfect["FragA"] == pytest.approx(100.0)
    # same association counts -> same AssA; FragA sees the difference
    assert halves["AssA"] == pytest.approx(flip["AssA"])
    assert halves["FragA"] == pytest.approx(50.0)
    assert flip["FragA"] == pytest.approx(10.0)


def test_clear_event_model_scenarios():
    """Mirrors the reference's motmetrics unit scenarios (the only unit
    tests the reference ships — posetrack21_mot/motmetrics/tests/
    test_metrics.py:252-284): FP-only frame, miss-only frame, match,
    forced switch, and the prefer-history rule (a strictly better new
    pairing must NOT displace an existing one)."""
    import numpy as np
    from tracklab_tpu.eval.metrics import SequenceData, clear_metrics

    e = np.zeros(0, int)
    gt_ids = [e, np.array([0, 1]), np.array([0, 1]), np.array([0, 1]),
              np.array([0, 1]), e]
    pred_ids = [np.array([0, 1]), e, np.array([0, 1]), np.array([0, 1]),
                np.array([0, 1]), e]
    sims = [
        np.zeros((0, 2)),                       # all FP
        np.zeros((2, 0)),                       # all miss
        np.array([[0.9, 0.0], [0.0, 0.9]]),     # straight match
        np.array([[0.0, 0.8], [0.8, 0.0]]),     # crossed -> 2 switches
        # better new pairing on the diagonal, history is the
        # anti-diagonal: history must win -> no further switches
        np.array([[0.9, 0.55], [0.55, 0.9]]),
    ]
    # frame 3 history: g0<->p1, g1<->p0 (anti-diagonal 0.55 at frame 4)
    sims.append(np.zeros((0, 0)))
    data = SequenceData(num_gt_ids=2, num_pred_ids=2, num_gt_dets=8,
                        num_pred_dets=8, gt_ids=gt_ids,
                        pred_ids=pred_ids, similarity=sims)
    r = clear_metrics(data)
    assert r["CLR_TP"] == 6
    assert r["CLR_FP"] == 2
    assert r["CLR_FN"] == 2
    assert r["IDSW"] == 2, "history must be preferred at frame 4"
    assert r["MOTA"] == pytest.approx((1 - 6 / 8) * 100)
    assert r["MOTP_sum"] == pytest.approx(0.9 * 2 + 0.8 * 2 + 0.55 * 2)


class TestReidPoseAndPerJointAP:
    """The evaluator's reid-pose HOTA + per-joint AP branches
    (reference: posetrack21_evaluator.py eval_reid_pose_tracking +
    poseval per-joint AP)."""

    def _state(self, seed=0, n_videos=2, degrade_joint=None):
        from types import SimpleNamespace
        rng = np.random.default_rng(seed)
        gt_rows, pred_rows, img_rows, vid_rows = [], [], [], []
        iid = 0
        for v in range(n_videos):
            vid_rows.append(dict(name=f"v{v}"))
            for f in range(8):
                img_rows.append(dict(video_id=v, frame=f, _id=iid))
                for person in range(2):
                    c = np.array([300 + 200 * person, 400]) + f * 3
                    kp = np.zeros((15, 3))
                    kp[:, 0] = c[0] + np.linspace(0, 40, 15)
                    kp[:, 1] = c[1] + np.linspace(0, 120, 15)
                    kp[:, 2] = 1.0
                    gt_rows.append(dict(
                        video_id=v, image_id=iid, track_id=person,
                        person_id=person, keypoints_xyc=kp,
                        bbox_ltwh=np.array([c[0], c[1], 40, 120])))
                    pk = kp.copy()
                    pk[:, :2] += rng.normal(0, 0.5, (15, 2))
                    if degrade_joint is not None:
                        pk[degrade_joint, :2] += 500.0
                    pred_rows.append(dict(
                        video_id=v, image_id=iid, track_id=person,
                        person_id=person, keypoints_xyc=pk,
                        bbox_conf=0.9,
                        bbox_ltwh=np.array([c[0], c[1], 40, 120])))
                iid += 1
        images = pd.DataFrame(img_rows).set_index("_id")
        videos = pd.DataFrame(vid_rows)
        return SimpleNamespace(
            image_metadatas=images, video_metadatas=videos,
            detections_gt=pd.DataFrame(gt_rows),
            detections_pred=pd.DataFrame(pred_rows))

    def test_perfect_reid_scores_high(self):
        from tracklab_tpu.eval.pose_evaluator import PoseTrackEvaluator
        res = PoseTrackEvaluator().run(self._state())
        assert "REID_POSE" in res and "kp_AP_per_joint" in res
        assert res["REID_POSE"]["HOTA"][0, -1] > 0.95
        assert res["kp_AP_per_joint"]["total_AP"] > 95.0

    def test_cross_video_id_split_hurts_reid_only(self):
        from tracklab_tpu.eval.pose_evaluator import PoseTrackEvaluator
        st = self._state()
        # split pred identities per video: person p in video v -> 10v+p
        pred = st.detections_pred
        pred["person_id"] = pred["video_id"] * 10 + pred["track_id"]
        good = PoseTrackEvaluator().run(self._state())
        split = PoseTrackEvaluator().run(st)
        assert split["REID_POSE"]["AssA"][0, -1] \
            < good["REID_POSE"]["AssA"][0, -1] - 0.2
        # per-video pose HOTA unaffected by cross-video ids
        np.testing.assert_allclose(split["POSE_COMBINED"]["HOTA"],
                                   good["POSE_COMBINED"]["HOTA"],
                                   atol=1e-9)

    def test_degraded_joint_shows_in_breakdown(self):
        from tracklab_tpu.eval.pose_evaluator import PoseTrackEvaluator
        res = PoseTrackEvaluator().run(self._state(degrade_joint=7))
        aps = res["kp_AP_per_joint"]["per_joint_AP"]
        assert aps[7] < 5.0
        others = np.delete(aps, 7)
        assert others.min() > 90.0


class TestBoxMAP:
    def test_perfect_is_100(self):
        from tracklab_tpu.eval.pose_metrics import box_map
        rng = np.random.default_rng(0)
        gt, pr, sc = {}, {}, {}
        for f in range(5):
            b = rng.uniform(0, 500, (4, 2))
            boxes = np.concatenate([b, rng.uniform(30, 80, (4, 2))], 1)
            gt[f] = boxes
            pr[f] = boxes.copy()
            sc[f] = rng.uniform(0.5, 1.0, 4)
        res = box_map(gt, pr, sc)
        assert res["bbox_mAP"] > 99.0
        assert res["bbox_AP50"] > 99.0

    def test_localization_noise_hurts_high_iou_only(self):
        from tracklab_tpu.eval.pose_metrics import box_map
        rng = np.random.default_rng(1)
        gt, pr, sc = {}, {}, {}
        for f in range(10):
            b = rng.uniform(100, 500, (3, 2))
            boxes = np.concatenate([b, np.full((3, 2), 100.0)], 1)
            gt[f] = boxes
            noisy = boxes.copy()
            noisy[:, :2] += rng.uniform(8, 12, (3, 2))  # ~10 px shift
            pr[f] = noisy
            sc[f] = np.full(3, 0.9)
        res = box_map(gt, pr, sc)
        # IoU of a 100x100 box shifted ~10px in x and y ~ 0.66:
        # AP50 perfect, AP75 zero, mAP between
        assert res["bbox_AP50"] > 99.0
        assert res["bbox_AP75"] < 1.0
        assert 20.0 < res["bbox_mAP"] < 60.0

    def test_false_positives_rank_below_tps(self):
        from tracklab_tpu.eval.pose_metrics import box_map
        gt = {0: np.array([[10.0, 10, 50, 50]])}
        # one TP at high score + one FP at low score: AP stays 1.0
        pr = {0: np.array([[10.0, 10, 50, 50], [300.0, 300, 50, 50]])}
        res = box_map(gt, pr, {0: np.array([0.9, 0.1])})
        assert res["bbox_AP50"] > 99.0
        # FP ABOVE the TP halves the interpolated precision tail
        res2 = box_map(gt, pr, {0: np.array([0.1, 0.9])})
        assert res2["bbox_AP50"] < 60.0

    def test_evaluator_reports_bbox_map(self):
        from tracklab_tpu.eval.pose_evaluator import PoseTrackEvaluator
        t = TestReidPoseAndPerJointAP()
        res = PoseTrackEvaluator().run(t._state())
        assert "bbox_mAP" in res and res["bbox_mAP"] > 99.0


class TestKeypointMOTAPerJoint:
    def _seqs(self, degrade_joint=None, switch_at=None):
        rng = np.random.default_rng(0)
        frames = []
        for t in range(12):
            kps = np.zeros((2, 15, 2))
            for p in range(2):
                c = np.array([200 + 300 * p + 3 * t, 300.0])
                kps[p] = c + rng.normal(0, 2, (15, 2))
            kps = np.abs(kps) + 1
            pk = kps + rng.normal(0, 0.5, kps.shape)
            if degrade_joint is not None:
                pk[:, degrade_joint] += 500.0
            pids = np.array([0, 1])
            if switch_at is not None and t >= switch_at:
                pids = np.array([1, 0])
            frames.append((np.array([0, 1]), kps, np.full(2, 30.0),
                           pids, np.abs(pk)))
        return {"s": frames}

    def test_perfect_is_100(self):
        from tracklab_tpu.eval.pose_reid_metrics import (
            keypoint_mota_per_joint,
        )
        res = keypoint_mota_per_joint(self._seqs())
        assert res["total_MOTA"] > 99.0
        assert (res["per_joint_MOTA"] > 99.0).all()

    def test_degraded_joint_isolated(self):
        from tracklab_tpu.eval.pose_reid_metrics import (
            keypoint_mota_per_joint,
        )
        res = keypoint_mota_per_joint(self._seqs(degrade_joint=4))
        assert res["per_joint_MOTA"][4] < 0.0   # FP + FN per frame
        others = np.delete(res["per_joint_MOTA"], 4)
        assert (others > 99.0).all()

    def test_id_switch_counts_per_joint(self):
        from tracklab_tpu.eval.pose_reid_metrics import (
            keypoint_mota_per_joint,
        )
        good = keypoint_mota_per_joint(self._seqs())
        sw = keypoint_mota_per_joint(self._seqs(switch_at=6))
        # one swap -> 2 IDSW per joint, MOTA drops equally everywhere
        assert (sw["per_joint_MOTA"] < good["per_joint_MOTA"] - 1).all()
        assert sw["per_joint"][0]["IDSW"] == 2


def test_evaluator_reports_per_joint_mota():
    from tracklab_tpu.eval.pose_evaluator import PoseTrackEvaluator
    t = TestReidPoseAndPerJointAP()
    res = PoseTrackEvaluator().run(t._state())
    assert "kp_MOTA_per_joint" in res
    assert res["kp_MOTA_per_joint"]["total_MOTA"] > 99.0
