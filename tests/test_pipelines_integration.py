"""Integration plumbing for the complex BASELINE pipelines: pose tracking
(config 3 shape) and game-state (config 4 shape) run end-to-end through
the engine with tiny random-weight models — asserting column flow and
artifact structure, not accuracy."""
import numpy as np
import pandas as pd
import pytest


def render_person_frames(tmp_path, n_frames=6, size=(160, 128)):
    import cv2
    from tracklab_tpu.datastruct.tracking_dataset import TrackingSet
    img_dir = tmp_path / "frames"
    img_dir.mkdir()
    image_rows, gt_rows = [], []
    det_id = 0
    for f in range(n_frames):
        img = np.full((size[1], size[0], 3), 40, np.uint8)
        for t, x in enumerate((15 + 4 * f, 90 - 3 * f)):
            img[30:110, x:x + 30] = 180 + 30 * t
            gt_rows.append(dict(
                id=det_id, image_id=f, video_id=0, frame=f + 1,
                track_id=t + 1,
                bbox_ltwh=np.array([x, 30, 30, 80], np.float32),
                bbox_conf=1.0, category_id=1))
            det_id += 1
        p = img_dir / f"{f:06d}.jpg"
        cv2.imwrite(str(p), img)
        image_rows.append(dict(id=f, video_id=0, frame=f + 1,
                               file_path=str(p), is_labeled=True))
    videos = pd.DataFrame([dict(id=0, name="clip", nframes=n_frames,
                                frame_rate=30)]).set_index("id")
    images = pd.DataFrame(image_rows).set_index("id")
    gt = pd.DataFrame(gt_rows).set_index("id")
    return TrackingSet(videos, images, gt)


def test_pose_tracking_pipeline_plumbing(tmp_path):
    """GT boxes -> top-down pose -> keypoint-prompt ReID -> OKS/part
    tracking: the sportsmot_pose preset shape on tiny models."""
    from tracklab_tpu.datastruct.tracker_state import TrackerState
    from tracklab_tpu.engine import OfflineTrackingEngine
    from tracklab_tpu.pipeline.module import Pipeline
    from tracklab_tpu.wrappers.pose_estimator import TopDownPoseEstimator
    from tracklab_tpu.wrappers.reid import OSNetReId
    from tracklab_tpu.wrappers.track import BPBReIDStrongSORT

    ts = render_person_frames(tmp_path)
    pose = TopDownPoseEstimator(variant="nano", num_keypoints=17,
                                crop_size=(64, 48), batch_size=4)
    reid = OSNetReId(variant="x0_25", feat_dim=16, n_parts=4,
                     crop_size=(64, 32), batch_size=4,
                     use_keypoints=True)
    tracker = BPBReIDStrongSORT(
        motion_criterium="iou", n_parts=5, embed_dim=16,
        n_keypoints=17, max_dets=8, max_tracks=8, n_init=1,
        max_dist=0.99, max_iou_distance=0.9)
    pipeline = Pipeline([pose, reid, tracker])
    state = TrackerState(ts, pipeline, load_from_groundtruth={
        "detection": ["bbox_ltwh", "bbox_conf", "category_id"]})
    engine = OfflineTrackingEngine(tracker_state=state,
                                   modules=[pose, reid, tracker],
                                   callbacks=[])
    engine.track_dataset()
    dets = state.detections_pred
    assert "keypoints_xyc" in dets.columns
    assert dets["keypoints_xyc"].iloc[0].shape == (17, 3)
    assert "embeddings" in dets.columns
    assert dets["embeddings"].iloc[0].shape == (5, 16)
    assert "visibility_scores" in dets.columns
    assert dets["track_id"].notna().any()


def test_gamestate_pipeline_plumbing(tmp_path):
    """GT boxes -> tracking -> pitch projection (camera params from the
    image metadata) -> majority-vote attrs -> GS-HOTA: the
    soccernet_gamestate preset shape without neural stages."""
    from tracklab_tpu.datastruct.tracker_state import TrackerState
    from tracklab_tpu.engine import OfflineTrackingEngine
    from tracklab_tpu.eval.gs_evaluator import GameStateEvaluator
    from tracklab_tpu.pipeline.module import Pipeline
    from tracklab_tpu.wrappers.calibration_api import PitchProjection
    from tracklab_tpu.wrappers.track import OCSORT

    ts = render_person_frames(tmp_path)
    cam = {"pan_degrees": 0.0, "tilt_degrees": 70.0,
           "roll_degrees": 0.0, "x_focal_length": 2800.0,
           "position_meters": [0.0, 48.0, 14.0],
           "principal_point": [80, 64]}
    ts.image_metadatas["parameters"] = [cam] * len(ts.image_metadatas)
    # GT also carries pitch positions + attrs for the evaluator
    tracker = OCSORT(min_hits=1, det_thresh=0.4, max_dets=8,
                     max_tracks=8, iou_threshold=0.1)
    pitch = PitchProjection(image_width=160, image_height=128)
    pipeline = Pipeline([tracker, pitch])
    state = TrackerState(ts, pipeline, load_from_groundtruth={
        "detection": ["bbox_ltwh", "bbox_conf", "category_id"]})
    engine = OfflineTrackingEngine(tracker_state=state,
                                   modules=[tracker, pitch],
                                   callbacks=[])
    engine.track_dataset()
    dets = state.detections_pred
    assert "bbox_pitch" in dets.columns
    bp = dets["bbox_pitch"].dropna().iloc[0]
    assert "x_bottom_middle" in bp

    # attach matching GT pitch positions from the same camera and eval
    gt = state.detections_gt.copy()
    proj = pitch.process(gt, ts.image_metadatas)
    gt["bbox_pitch"] = proj["bbox_pitch"]
    gt["role"] = "player"
    gt["team"] = "left"
    state.detections_gt = gt
    pred = state.detections_pred.copy()
    pred["role"] = "player"
    pred["team"] = "left"
    state.detections_pred = pred
    results = GameStateEvaluator(use_jerseys=False).run(state)
    assert results["COMBINED_SEQ"]["GS-HOTA"] > 95.0


def test_bpbreid_cost_instrumentation():
    """emit_costs reproduces the reference's debug-viz columns
    (sort/tracker.py:365-425): per-detection un-gated cost dicts to
    every live track (R/S/K + thresholds) and matched_with tuples."""
    from tracklab_tpu.wrappers.track import BPBReIDStrongSORT

    rng = np.random.default_rng(0)
    rows, metas = [], []
    rid = 0
    for f in range(12):
        metas.append(dict(frame=f, video_id=0, _id=f))
        for t in range(3):
            x = 30 + 60 * t + 2 * f
            rows.append(dict(
                image_id=f,
                bbox_ltwh=np.array([x, 30, 30, 80], np.float32),
                bbox_conf=0.9, category_id=1,
                embeddings=rng.normal(size=(5, 16)).astype(np.float32),
                visibility_scores=np.ones(5, np.float32),
                _id=rid))
            rid += 1
    dets = pd.DataFrame(rows).set_index("_id")
    metas = pd.DataFrame(metas).set_index("_id")
    tracker = BPBReIDStrongSORT(
        motion_criterium="iou", n_parts=5, embed_dim=16,
        max_dets=8, max_tracks=8, n_init=1, max_dist=0.99,
        max_iou_distance=0.9, emit_costs=True)
    out = tracker.process(dets, metas)
    assert "costs" in out.columns and "matched_with" in out.columns
    got_some = False
    for row, mw in out["matched_with"].items():
        c = out.loc[row, "costs"]
        if c is None or (isinstance(c, float) and np.isnan(c)):
            continue
        assert set(c) == {"R", "Rt", "S", "St", "K", "Kt"}
        assert c["Rt"] == 0.99 and c["St"] == 0.9
        if mw is not None:
            stage, cost = mw
            assert stage in ("R", "S")
            got_some = True
            # the matched cost is finite and plausible
            assert np.isfinite(cost)
        # cost dicts are keyed by live track ids
        for k in c["R"]:
            assert isinstance(k, int)
    assert got_some
    # default mode emits no instrumentation columns
    t2 = BPBReIDStrongSORT(
        motion_criterium="iou", n_parts=5, embed_dim=16,
        max_dets=8, max_tracks=8, n_init=1, max_dist=0.99,
        max_iou_distance=0.9)
    out2 = t2.process(dets, metas)
    assert "costs" not in out2.columns
