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
    # neutralize the yaml's reference-default wrapper pre-filter (0.4):
    # random-weight scores sit below it
    "modules.track.min_confidence=0",
    # random-weight scores on this dataset cluster ~0.284-0.297 (the r3
    # fused stem shifted the distribution below the old 0.3): 0.29
    # keeps ~60% of detections so the det_thresh gate is exercised on
    # both sides
    "modules.track.det_thresh=0.29",
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


REID_ARGS = [
    "pipeline=[detect, reid, track]",
    "+modules.detect._target_=tracklab_tpu.wrappers.bbox_detector."
    "YOLOXDetector",
    "+modules.detect.variant=nano",
    "+modules.detect.num_classes=1",
    "+modules.detect.input_size=[128,128]",
    "+modules.detect.min_confidence=0.25",
    "+modules.detect.nms_iou=0.65",
    "+modules.detect.max_dets=16",
    "+modules.detect.batch_size=4",
    # work_size == the detector input (and the dataset frame size), so
    # the staged module's work-image resize is the identity and the
    # fused path's crops-from-letterboxed-frames see the same pixels
    "+modules.reid._target_=tracklab_tpu.wrappers.reid.OSNetReIdBatched",
    "+modules.reid.variant=x0_25",
    "+modules.reid.feat_dim=64",
    "+modules.reid.n_parts=2",
    "+modules.reid.use_parts=false",
    "+modules.reid.crop_size=[64,32]",
    "+modules.reid.work_size=[128,128]",
    "+modules.reid.max_dets=16",
    "+modules.reid.batch_size=4",
    "modules/track=strong_sort",
    "modules.track.max_dets=16", "modules.track.max_tracks=32",
    "modules.track.embed_dim=64",
    # random-weight scores cluster ~0.25-0.32 on the synthetic video:
    # 0.28 keeps ~10/frame and drops ~6/frame, so the tracker
    # pre-filter is exercised on both sides
    "modules.track.min_confidence=0.28",
    "modules.track.n_init=1",
    # loose association gates: random-weight detections still link
    "modules.track.max_dist=0.6", "modules.track.max_iou_dist=0.9",
    "dataset.n_videos=1", "dataset.n_frames=10",
    "dataset.n_objects=3", "dataset.img_w=128", "dataset.img_h=128",
    "use_rich=false",
]


def _run_args(args, fused: bool, tmp_path, tag):
    cfg = compose(CONFIG_DIR, "config", args + [
        f"engine.fused={str(fused).lower()}",
        f"state.save_file={tmp_path}/state_{tag}.pklz",
    ])
    parts, _ = run(cfg)
    return parts["tracker_state"].detections_pred


@pytest.mark.filterwarnings("ignore")
def test_fused_reid_engine_matches_staged(tmp_path):
    """3-module fused prefix (detect -> ReID -> embedding tracker as ONE
    device program, engine/fused.py:run_fused_reid_video) reproduces the
    staged run's DataFrames: detector rows, ReID embeddings, track ids."""
    staged = _run_args(REID_ARGS, False, tmp_path, "staged_reid")
    fused = _run_args(REID_ARGS, True, tmp_path, "fused_reid")

    assert len(staged) > 0, "staged run produced no detections"
    assert len(fused) == len(staged), (len(fused), len(staged))
    for col in ("image_id", "video_id", "category_id"):
        np.testing.assert_array_equal(fused[col].to_numpy(),
                                      staged[col].to_numpy(), err_msg=col)
    np.testing.assert_allclose(
        np.stack(fused["bbox_ltwh"].to_numpy()),
        np.stack(staged["bbox_ltwh"].to_numpy()), rtol=1e-4, atol=1e-3)
    # ReID embeddings: same rows, same values
    np.testing.assert_allclose(
        np.stack(fused["embeddings"].to_numpy()),
        np.stack(staged["embeddings"].to_numpy()), rtol=1e-3, atol=1e-3)
    np.testing.assert_array_equal(
        np.stack(fused["visibility_scores"].to_numpy()),
        np.stack(staged["visibility_scores"].to_numpy()))
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


POSE_ARGS = [
    "pipeline=[detect, pose, track]",
    "+modules.detect._target_=tracklab_tpu.wrappers.bbox_detector."
    "YOLOXDetector",
    "+modules.detect.variant=nano",
    "+modules.detect.num_classes=1",
    "+modules.detect.input_size=[128,128]",
    "+modules.detect.min_confidence=0.25",
    "+modules.detect.nms_iou=0.65",
    "+modules.detect.max_dets=16",
    "+modules.detect.batch_size=4",
    "+modules.pose._target_=tracklab_tpu.wrappers.pose_estimator."
    "TopDownPoseBatched",
    "+modules.pose.variant=nano",
    "+modules.pose.num_keypoints=5",
    "+modules.pose.crop_size=[64,48]",
    "+modules.pose.work_size=[128,128]",
    "+modules.pose.max_dets=16",
    "+modules.pose.batch_size=4",
    "modules/track=oc_sort",
    # neutralize the yaml's reference-default wrapper pre-filter (0.4):
    # random-weight scores sit below it
    "modules.track.min_confidence=0",
    "modules.track.det_thresh=0.27",
    "modules.track.max_dets=16", "modules.track.max_tracks=32",
    "dataset.n_videos=1", "dataset.n_frames=10",
    "dataset.n_objects=3", "dataset.img_w=128", "dataset.img_h=128",
    "use_rich=false",
]


PARTS_ARGS = [
    "pipeline=[detect, reid, track]",
    "+modules.detect._target_=tracklab_tpu.wrappers.bbox_detector."
    "YOLOXDetector",
    "+modules.detect.variant=nano",
    "+modules.detect.num_classes=1",
    "+modules.detect.input_size=[128,128]",
    "+modules.detect.min_confidence=0.25",
    "+modules.detect.nms_iou=0.65",
    "+modules.detect.max_dets=16",
    "+modules.detect.batch_size=4",
    # tiny promptless KPR; work_size == detector input == frame size so
    # the staged work-image resize is the identity (same pixels as the
    # fused path's crops from the letterboxed frames)
    "+modules.reid._target_=tracklab_tpu.wrappers.reid.KPReIdBatched",
    "+modules.reid.crop_size=[32,16]",
    "+modules.reid.num_parts=3",
    "+modules.reid.dim_reduce_output=16",
    "+modules.reid.embed_dim=32",
    "+modules.reid.depth=2",
    "+modules.reid.num_heads=2",
    "+modules.reid.patch_size=8",
    "+modules.reid.stride=8",
    "+modules.reid.work_size=[128,128]",
    "+modules.reid.max_dets=16",
    "+modules.reid.batch_size=4",
    "modules/track=bpbreid_strong_sort",
    "modules.track.max_dets=16", "modules.track.max_tracks=32",
    # tracker parts = 1 foreground + 3 parts rows; embed = KPR
    # dim_reduce_output
    "modules.track.n_parts=4", "modules.track.embed_dim=16",
    "modules.track.n_init=1",
    "modules.track.max_dist=0.6", "modules.track.max_iou_distance=0.9",
    "dataset.n_videos=1", "dataset.n_frames=10",
    "dataset.n_objects=3", "dataset.img_w=128", "dataset.img_h=128",
    "use_rich=false",
]


@pytest.mark.filterwarnings("ignore")
def test_fused_parts_engine_matches_staged(tmp_path):
    """3-module fused prefix (detect -> promptless KPR part features ->
    BPBReID-StrongSORT as ONE device program, engine/fused.py:
    run_fused_parts_video) reproduces the staged run's DataFrames:
    detector rows, part embeddings + visibility, track ids + lifecycle
    counters."""
    staged = _run_args(PARTS_ARGS, False, tmp_path, "staged_parts")
    fused = _run_args(PARTS_ARGS, True, tmp_path, "fused_parts")

    assert len(staged) > 0, "staged run produced no detections"
    assert len(fused) == len(staged), (len(fused), len(staged))
    for col in ("image_id", "video_id", "category_id"):
        np.testing.assert_array_equal(fused[col].to_numpy(),
                                      staged[col].to_numpy(), err_msg=col)
    np.testing.assert_allclose(
        np.stack(fused["bbox_ltwh"].to_numpy()),
        np.stack(staged["bbox_ltwh"].to_numpy()), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(
        np.stack(fused["embeddings"].to_numpy()),
        np.stack(staged["embeddings"].to_numpy()), rtol=1e-3, atol=1e-3)
    np.testing.assert_array_equal(
        np.stack(fused["visibility_scores"].to_numpy()),
        np.stack(staged["visibility_scores"].to_numpy()))
    sv = staged["track_id"].notna()
    fv = fused["track_id"].notna()
    assert sv.sum() > 0, "staged tracker emitted nothing"
    np.testing.assert_array_equal(fv.to_numpy(), sv.to_numpy())
    np.testing.assert_array_equal(
        fused.loc[fv, "track_id"].to_numpy(float),
        staged.loc[sv, "track_id"].to_numpy(float))
    for col in ("hits", "age", "time_since_update"):
        np.testing.assert_array_equal(
            fused.loc[fv, col].to_numpy(float),
            staged.loc[sv, col].to_numpy(float), err_msg=col)


BOTTOMUP_ARGS = [
    "pipeline=[pose, track]",
    "+modules.pose._target_=tracklab_tpu.wrappers.pose_estimator."
    "BottomUpPoseEstimator",
    "+modules.pose.variant=nano",
    "+modules.pose.num_keypoints=5",
    "+modules.pose.input_size=[128,128]",
    "+modules.pose.min_confidence=0.25",
    "+modules.pose.max_dets=16",
    "+modules.pose.batch_size=4",
    "modules/track=oc_sort",
    # neutralize the yaml's reference-default wrapper pre-filter (0.4):
    # random-weight scores sit below it
    "modules.track.min_confidence=0",
    "modules.track.det_thresh=0.27",
    "modules.track.max_dets=16", "modules.track.max_tracks=32",
    "dataset.n_videos=1", "dataset.n_frames=10",
    "dataset.n_objects=3", "dataset.img_w=128", "dataset.img_h=128",
    "use_rich=false",
]


@pytest.mark.filterwarnings("ignore")
def test_fused_bottomup_engine_matches_staged(tmp_path):
    """Fused bottom-up prefix (pose head emitting boxes-from-keypoints
    -> tracker as ONE device program, engine/fused.py:
    run_fused_bottomup_video) reproduces the staged run's DataFrames:
    boxes, keypoints, track ids."""
    staged = _run_args(BOTTOMUP_ARGS, False, tmp_path, "staged_bu")
    fused = _run_args(BOTTOMUP_ARGS, True, tmp_path, "fused_bu")

    assert len(staged) > 0, "staged run produced no detections"
    assert len(fused) == len(staged), (len(fused), len(staged))
    for col in ("image_id", "video_id", "category_id"):
        np.testing.assert_array_equal(fused[col].to_numpy(),
                                      staged[col].to_numpy(), err_msg=col)
    np.testing.assert_allclose(
        np.stack(fused["bbox_ltwh"].to_numpy()),
        np.stack(staged["bbox_ltwh"].to_numpy()), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(
        np.stack(fused["keypoints_xyc"].to_numpy()),
        np.stack(staged["keypoints_xyc"].to_numpy()),
        rtol=1e-3, atol=1e-3)
    sv = staged["track_id"].notna()
    fv = fused["track_id"].notna()
    assert sv.sum() > 0, "staged tracker emitted nothing"
    np.testing.assert_array_equal(fv.to_numpy(), sv.to_numpy())
    np.testing.assert_array_equal(
        fused.loc[fv, "track_id"].to_numpy(float),
        staged.loc[sv, "track_id"].to_numpy(float))


GSR_ARGS = [
    "pipeline=[detect, pose, reid, track]",
    "+modules.detect._target_=tracklab_tpu.wrappers.bbox_detector."
    "YOLOXDetector",
    "+modules.detect.variant=nano",
    "+modules.detect.num_classes=1",
    "+modules.detect.input_size=[128,128]",
    "+modules.detect.min_confidence=0.25",
    "+modules.detect.nms_iou=0.65",
    "+modules.detect.max_dets=16",
    "+modules.detect.batch_size=4",
    "+modules.pose._target_=tracklab_tpu.wrappers.pose_estimator."
    "TopDownPoseBatched",
    "+modules.pose.variant=nano",
    "+modules.pose.num_keypoints=17",
    "+modules.pose.crop_size=[64,48]",
    "+modules.pose.work_size=[128,128]",
    "+modules.pose.max_dets=16",
    "+modules.pose.batch_size=4",
    # tiny PROMPTED KPR: the keypoint prompt maps are rasterized from
    # the pose output (host gaussians staged, device gaussians fused)
    "+modules.reid._target_=tracklab_tpu.wrappers.reid.KPReIdBatched",
    "+modules.reid.use_keypoints=true",
    "+modules.reid.crop_size=[32,16]",
    "+modules.reid.num_parts=3",
    "+modules.reid.dim_reduce_output=16",
    "+modules.reid.embed_dim=32",
    "+modules.reid.depth=2",
    "+modules.reid.num_heads=2",
    "+modules.reid.patch_size=8",
    "+modules.reid.stride=8",
    "+modules.reid.work_size=[128,128]",
    "+modules.reid.max_dets=16",
    "+modules.reid.batch_size=4",
    "modules/track=bpbreid_strong_sort",
    "modules.track.motion_criterium=oks",
    "modules.track.max_dets=16", "modules.track.max_tracks=32",
    "modules.track.n_parts=4", "modules.track.embed_dim=16",
    "modules.track.n_keypoints=17",
    "modules.track.n_init=1",
    "modules.track.max_dist=0.6", "modules.track.max_oks_distance=0.9",
    "dataset.n_videos=1", "dataset.n_frames=10",
    "dataset.n_objects=3", "dataset.img_w=128", "dataset.img_h=128",
    "use_rich=false",
]


@pytest.mark.filterwarnings("ignore")
def test_fused_gsr_engine_matches_staged(tmp_path):
    """4-module fused prefix — the FULL pose-tracking pipeline shape
    (detect -> top-down pose -> keypoint-PROMPTED KPR -> OKS-motion
    BPBReID-StrongSORT as ONE device program, engine/fused.py:
    run_fused_gsr_video) — reproduces the staged run's DataFrames:
    detector rows, keypoints, prompted part embeddings, track ids."""
    staged = _run_args(GSR_ARGS, False, tmp_path, "staged_gsr")
    fused = _run_args(GSR_ARGS, True, tmp_path, "fused_gsr")

    assert len(staged) > 0, "staged run produced no detections"
    assert len(fused) == len(staged), (len(fused), len(staged))
    for col in ("image_id", "video_id", "category_id"):
        np.testing.assert_array_equal(fused[col].to_numpy(),
                                      staged[col].to_numpy(), err_msg=col)
    np.testing.assert_allclose(
        np.stack(fused["bbox_ltwh"].to_numpy()),
        np.stack(staged["bbox_ltwh"].to_numpy()), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(
        np.stack(fused["keypoints_xyc"].to_numpy()),
        np.stack(staged["keypoints_xyc"].to_numpy()),
        rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.stack(fused["embeddings"].to_numpy()),
        np.stack(staged["embeddings"].to_numpy()), rtol=1e-3, atol=1e-3)
    np.testing.assert_array_equal(
        np.stack(fused["visibility_scores"].to_numpy()),
        np.stack(staged["visibility_scores"].to_numpy()))
    sv = staged["track_id"].notna()
    fv = fused["track_id"].notna()
    assert sv.sum() > 0, "staged tracker emitted nothing"
    np.testing.assert_array_equal(fv.to_numpy(), sv.to_numpy())
    np.testing.assert_array_equal(
        fused.loc[fv, "track_id"].to_numpy(float),
        staged.loc[sv, "track_id"].to_numpy(float))


@pytest.mark.filterwarnings("ignore")
def test_fused_pose_engine_matches_staged(tmp_path):
    """3-module fused prefix (detect -> top-down pose -> tracker as ONE
    device program, engine/fused.py:run_fused_pose_video) reproduces the
    staged run's DataFrames: detector rows, keypoints, track ids."""
    staged = _run_args(POSE_ARGS, False, tmp_path, "staged_pose")
    fused = _run_args(POSE_ARGS, True, tmp_path, "fused_pose")

    assert len(staged) > 0, "staged run produced no detections"
    assert len(fused) == len(staged), (len(fused), len(staged))
    for col in ("image_id", "video_id", "category_id"):
        np.testing.assert_array_equal(fused[col].to_numpy(),
                                      staged[col].to_numpy(), err_msg=col)
    np.testing.assert_allclose(
        np.stack(fused["bbox_ltwh"].to_numpy()),
        np.stack(staged["bbox_ltwh"].to_numpy()), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(
        np.stack(fused["keypoints_xyc"].to_numpy()),
        np.stack(staged["keypoints_xyc"].to_numpy()),
        rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        fused["keypoints_conf"].to_numpy(float),
        staged["keypoints_conf"].to_numpy(float), rtol=1e-3, atol=1e-4)
    sv = staged["track_id"].notna()
    fv = fused["track_id"].notna()
    assert sv.sum() > 0, "staged tracker emitted nothing"
    np.testing.assert_array_equal(fv.to_numpy(), sv.to_numpy())
    np.testing.assert_array_equal(
        fused.loc[fv, "track_id"].to_numpy(float),
        staged.loc[sv, "track_id"].to_numpy(float))


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
