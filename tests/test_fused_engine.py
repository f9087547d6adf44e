"""Engine fused fast path == staged module-by-module engine run.

VERDICT r2 item 1 (engine wiring): with ``engine.fused=true`` the
offline engine collapses a fusable detector->tracker pipeline prefix
into ONE device program per video (engine/fused.py:run_fused_video) and
must reproduce the staged run's public DataFrames — same detection
rows/ids/boxes, same track ids.
"""
import numpy as np
import pytest

from tracklab_tpu.config import compose
from tracklab_tpu.main import CONFIG_DIR, run

ARGS = [
    "pipeline=[detect, track]",
    "+modules.detect._target_=tracklab_tpu.wrappers.bbox_detector."
    "YOLOXDetector",
    "+modules.detect.variant=nano",
    "+modules.detect.num_classes=1",
    "+modules.detect.input_size=[128,128]",
    "+modules.detect.min_confidence=0.25",
    "+modules.detect.nms_iou=0.65",
    "+modules.detect.max_dets=16",
    "+modules.detect.batch_size=4",
    "modules/track=oc_sort",
    "modules.track.det_thresh=0.3",
    "modules.track.max_dets=16", "modules.track.max_tracks=32",
    "dataset.n_videos=1", "dataset.n_frames=10",
    "dataset.n_objects=3", "dataset.img_w=160", "dataset.img_h=120",
    "use_rich=false",
]


def _run(fused: bool, tmp_path, tag):
    cfg = compose(CONFIG_DIR, "config", ARGS + [
        f"engine.fused={str(fused).lower()}",
        f"state.save_file={tmp_path}/state_{tag}.pklz",
    ])
    parts, _ = run(cfg)
    return parts["tracker_state"].detections_pred


@pytest.mark.filterwarnings("ignore")
def test_fused_engine_matches_staged(tmp_path):
    staged = _run(False, tmp_path, "staged")
    fused = _run(True, tmp_path, "fused")

    assert len(staged) > 0, "staged run produced no detections"
    assert len(fused) == len(staged), (len(fused), len(staged))
    # detector rows: identical ids, images, boxes, scores
    for col in ("image_id", "video_id", "category_id"):
        np.testing.assert_array_equal(fused[col].to_numpy(),
                                      staged[col].to_numpy(), err_msg=col)
    np.testing.assert_allclose(
        np.stack(fused["bbox_ltwh"].to_numpy()),
        np.stack(staged["bbox_ltwh"].to_numpy()), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(fused["bbox_conf"].to_numpy(float),
                               staged["bbox_conf"].to_numpy(float),
                               rtol=1e-4, atol=1e-4)
    # tracker columns: same emission pattern + ids
    sv = staged["track_id"].notna()
    fv = fused["track_id"].notna()
    assert sv.sum() > 0, "staged tracker emitted nothing"
    np.testing.assert_array_equal(fv.to_numpy(), sv.to_numpy())
    np.testing.assert_array_equal(
        fused.loc[fv, "track_id"].to_numpy(float),
        staged.loc[sv, "track_id"].to_numpy(float))
    np.testing.assert_allclose(
        np.stack(fused.loc[fv, "track_bbox_ltwh"].to_numpy()),
        np.stack(staged.loc[sv, "track_bbox_ltwh"].to_numpy()),
        rtol=1e-4, atol=1e-3)
