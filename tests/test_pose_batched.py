"""TopDownPoseBatched: device-side crop gather + pose over a frame's
detections; keypoints must land inside each detection's bbox."""
import numpy as np
import pandas as pd


def test_batched_pose_geometry(tmp_path):
    from tests.test_offline_detector import render_frames
    from tracklab_tpu.datastruct.tracker_state import TrackerState
    from tracklab_tpu.engine import OfflineTrackingEngine
    from tracklab_tpu.pipeline.module import Pipeline
    from tracklab_tpu.wrappers.pose_estimator import TopDownPoseBatched

    ts = render_frames(tmp_path, n_frames=4)
    pose = TopDownPoseBatched(variant="nano", crop_size=(64, 48),
                              work_size=(120, 160), max_dets=8,
                              batch_size=2)
    state = TrackerState(ts, Pipeline([pose]),
                         load_from_groundtruth=True)
    engine = OfflineTrackingEngine(tracker_state=state, modules=[pose],
                                   callbacks=[])
    engine.track_dataset()
    pred = state.detections_pred
    assert "keypoints_xyc" in pred.columns
    done = pred.dropna(subset=["keypoints_xyc"])
    assert len(done) == 8  # 2 boxes x 4 frames
    for _, det in done.iterrows():
        l, t, w, h = np.asarray(det["bbox_ltwh"], float)
        kp = np.asarray(det["keypoints_xyc"])
        assert kp.shape == (17, 3)
        assert np.isfinite(kp).all()
        # decoded from crop heatmaps -> mapped into the bbox; allow one
        # heatmap-stride of slack on each side
        slack_x, slack_y = w / 4, h / 4
        assert (kp[:, 0] >= l - slack_x).all() and \
            (kp[:, 0] <= l + w + slack_x).all()
        assert (kp[:, 1] >= t - slack_y).all() and \
            (kp[:, 1] <= t + h + slack_y).all()
        assert 0.0 <= det["keypoints_conf"] <= 1.0
