"""End-to-end slice: config compose -> dataset -> engine -> scan tracker ->
evaluator. On the noise-free synthetic dataset with GT bootstrapping a
perfect tracker must reach HOTA = MOTA = IDF1 = 100 (SURVEY §4 test
strategy)."""
import numpy as np
import pytest

from tracklab_tpu.config import compose, instantiate
from tracklab_tpu.main import CONFIG_DIR, run


def test_config_compose_and_interpolation():
    cfg = compose(CONFIG_DIR, "config",
                  ["dataset=mot17", "data_dir=/tmp/data", "num_cores=2"])
    assert cfg.dataset._target_.endswith("MOT17")
    assert cfg.dataset.dataset_path == "/tmp/data/MOT17"
    assert cfg.engine.num_workers == 2
    assert cfg.eval.eval_set == "val"


def test_config_group_override():
    cfg = compose(CONFIG_DIR, "config", ["modules/track=bytetrack"])
    assert cfg.modules.track._target_.endswith("ByteTrack")


@pytest.mark.parametrize("tracker", ["oc_sort", "bytetrack"])
def test_e2e_synthetic_perfect_tracking(tracker, tmp_path):
    cfg = compose(CONFIG_DIR, "config", [
        f"modules/track={tracker}",
        "dataset.n_videos=2", "dataset.n_frames=40",
        "dataset.n_objects=5",
        "state.load_from_groundtruth={detection: [bbox_ltwh, bbox_conf, category_id]}",
        f"state.save_file={tmp_path}/state.pklz",
        "use_rich=false",
    ])
    # min_hits=1 still needs 2 hits before emission except on frame 1;
    # perfect data means every track is hit every frame.
    parts, results = run(cfg)
    combined = results["COMBINED_SEQ"]
    # perfect detections -> perfect tracking
    assert combined["MOTA"] > 99.0, combined
    assert combined["IDF1"] > 99.0, combined
    assert combined["HOTA"] > 99.0, combined
    assert combined["IDSW"] == 0

    # state file exists and can resume
    state = parts["tracker_state"]
    assert (tmp_path / "state.pklz").exists()

    # reload: detections for each video present in the saved state
    import zipfile
    with zipfile.ZipFile(tmp_path / "state.pklz") as zf:
        names = zf.namelist()
        assert "summary.json" in names
        vids = parts["dataset"].sets["val"].video_metadatas.index
        for vid in vids:
            assert f"{vid}.pkl" in names


def test_state_resume_skips_completed_videos(tmp_path):
    cfg_args = [
        "dataset.n_videos=1", "dataset.n_frames=20",
        "state.load_from_groundtruth={detection: [bbox_ltwh, bbox_conf, category_id]}",
        f"state.save_file={tmp_path}/state.pklz",
        "use_rich=false",
    ]
    cfg = compose(CONFIG_DIR, "config", cfg_args)
    run(cfg)
    # second run: load_file == save_file resumes without error and
    # keeps existing entries
    cfg2 = compose(CONFIG_DIR, "config", cfg_args + [
        f"state.load_file={tmp_path}/state.pklz"])
    parts2, results2 = run(cfg2)
    assert results2["COMBINED_SEQ"]["MOTA"] > 99.0


def test_e2e_noisy_synthetic_reasonable():
    cfg = compose(CONFIG_DIR, "config", [
        "dataset.n_videos=1", "dataset.n_frames=60",
        "dataset.det_noise=2.0", "dataset.det_dropout=0.1",
        "dataset.fp_rate=0.3",
        "state.load_from_groundtruth={detection: [bbox_ltwh, bbox_conf, category_id]}",
        "use_rich=false",
    ])
    parts, results = run(cfg)
    combined = results["COMBINED_SEQ"]
    assert combined["HOTA"] > 60.0, combined


def test_batched_engine_matches_sequential():
    """8 videos tracked as one stacked scan == sequential per-video runs."""
    args = [
        "engine=batched", "engine.video_batch_size=8",
        "dataset.n_videos=8", "dataset.n_frames=25",
        "dataset.n_objects=4",
        "state.load_from_groundtruth={detection: [bbox_ltwh, bbox_conf, category_id]}",
        "use_rich=false",
    ]
    cfg = compose(CONFIG_DIR, "config", args)
    parts, results = run(cfg)
    assert results["COMBINED_SEQ"]["HOTA"] > 99.0
    assert len(results["per_seq"]) == 8

    cfg_seq = compose(CONFIG_DIR, "config", args[2:])
    parts2, results2 = run(cfg_seq)
    # identical detections/tracks either way
    a = parts["tracker_state"].detections_pred.sort_index()
    b = parts2["tracker_state"].detections_pred.sort_index()
    assert (a["track_id"].fillna(-1) == b["track_id"].fillna(-1)).all()


@pytest.mark.parametrize("tracker", ["strong_sort", "bot_sort",
                                     "deep_oc_sort"])
def test_e2e_embedding_trackers_cli(tracker, tmp_path):
    """The four embedding trackers through the real CLI config path:
    rendered synthetic frames -> OSNet ReID (random weights) -> tracker
    -> eval. Random embeddings make appearance uninformative, so only
    plumbing + plausible motion-driven tracking is asserted."""
    cfg = compose(CONFIG_DIR, "config", [
        f"modules/track={tracker}",
        "modules/reid=osnet",
        "modules.reid.variant=x0_25",
        "modules.reid.crop_size=[64,32]",
        "modules.reid.feat_dim=128",
        "modules.track.embed_dim=128",
        "modules.track.max_tracks=16", "modules.track.max_dets=8",
        "pipeline=[reid,track]",
        "dataset.n_videos=1", "dataset.n_frames=10",
        "dataset.n_objects=3", "dataset.img_w=320", "dataset.img_h=240",
        "state.load_from_groundtruth={detection: [bbox_ltwh, bbox_conf,"
        " category_id]}",
        "use_rich=false",
    ])
    parts, results = run(cfg)
    pred = parts["tracker_state"].detections_pred
    assert "track_id" in pred.columns
    assert pred["track_id"].notna().sum() > 0
    combined = results["COMBINED_SEQ"]
    assert combined["CLR_TP"] > 0


def test_e2e_bpbreid_tracker_cli(tmp_path):
    """BPBReID-StrongSORT through the CLI: part embeddings + visibility
    from OSNet feed the part-based distance path."""
    cfg = compose(CONFIG_DIR, "config", [
        "modules/track=bpbreid_strong_sort",
        "modules/reid=osnet",
        "modules.reid.variant=x0_25",
        "modules.reid.crop_size=[64,32]",
        "modules.reid.feat_dim=64", "modules.reid.n_parts=4",
        "modules.track.embed_dim=64", "modules.track.n_parts=4",
        "modules.track.max_tracks=16", "modules.track.max_dets=8",
        "pipeline=[reid,track]",
        "dataset.n_videos=1", "dataset.n_frames=10",
        "dataset.n_objects=3", "dataset.img_w=320", "dataset.img_h=240",
        "state.load_from_groundtruth={detection: [bbox_ltwh, bbox_conf,"
        " category_id]}",
        "use_rich=false",
    ])
    parts, results = run(cfg)
    pred = parts["tracker_state"].detections_pred
    assert pred["track_id"].notna().sum() > 0
    assert "track_bbox_kf_ltwh" in pred.columns
    assert results["COMBINED_SEQ"]["CLR_TP"] > 0


def test_e2e_cmc_botsort_cli(tmp_path):
    """Camera-motion module feeding BoT-SORT's gmc_warp column."""
    cfg = compose(CONFIG_DIR, "config", [
        "modules/track=bot_sort",
        "modules/reid=osnet",
        "modules/cmc=sparse_opt_flow",
        "modules.reid.variant=x0_25",
        "modules.reid.crop_size=[64,32]", "modules.reid.feat_dim=64",
        "modules.track.embed_dim=64",
        "modules.track.max_tracks=16", "modules.track.max_dets=8",
        "pipeline=[cmc,reid,track]",
        "dataset.n_videos=1", "dataset.n_frames=8",
        "dataset.n_objects=3", "dataset.img_w=320", "dataset.img_h=240",
        "state.load_from_groundtruth={detection: [bbox_ltwh, bbox_conf,"
        " category_id]}",
        "use_rich=false",
    ])
    parts, results = run(cfg)
    state = parts["tracker_state"]
    assert "gmc_warp" in state.image_pred.columns
    assert state.detections_pred["track_id"].notna().sum() > 0


def test_e2e_pose_oks_tracking_cli(tmp_path):
    """OKS-motion BPBReID tracking via the CLI, keypoints from the
    synthetic GT (rigid per-object keypoints; a random-weight pose net
    on uniform rectangles gives temporally unstable keypoints, which
    OKS correctly rejects)."""
    cfg = compose(CONFIG_DIR, "config", [
        "modules/track=bpbreid_strong_sort",
        "modules/reid=osnet",
        "modules.reid.variant=x0_25", "modules.reid.crop_size=[64,32]",
        "modules.reid.feat_dim=64", "modules.reid.n_parts=4",
        "modules.track.embed_dim=64", "modules.track.n_parts=5",
        "modules.track.motion_criterium=oks",
        "modules.track.n_init=2",
        "modules.track.max_tracks=16", "modules.track.max_dets=8",
        "pipeline=[reid,track]",
        "dataset.n_videos=1", "dataset.n_frames=8",
        "dataset.n_objects=3", "dataset.img_w=640", "dataset.img_h=480",
        "dataset.with_keypoints=true",
        "state.load_from_groundtruth={detection: [bbox_ltwh, bbox_conf,"
        " category_id, keypoints_xyc]}",
        "use_rich=false",
    ])
    parts, results = run(cfg)
    pred = parts["tracker_state"].detections_pred
    assert pred["keypoints_xyc"].notna().sum() > 0
    assert pred["track_id"].notna().sum() > 0


def test_e2e_jersey_vote_graceful(tmp_path):
    """Jersey OCR (easyocr absent -> must degrade, not crash) + majority
    vote aggregation through the CLI."""
    cfg = compose(CONFIG_DIR, "config", [
        "pipeline=[track,jersey,vote]",
        "+modules.jersey._target_=tracklab_tpu.wrappers.jersey."
        "JerseyNumberOCR",
        "+modules.vote._target_=tracklab_tpu.wrappers.tracklet_agg."
        "MajorityVoteTracklet",
        "+modules.vote.attributes=[jersey_number]",
        "dataset.n_videos=1", "dataset.n_frames=6",
        "dataset.n_objects=2", "dataset.img_w=320", "dataset.img_h=240",
        "state.load_from_groundtruth={detection: [bbox_ltwh, bbox_conf,"
        " category_id]}",
        "use_rich=false",
    ])
    parts, results = run(cfg)
    pred = parts["tracker_state"].detections_pred
    assert pred["track_id"].notna().sum() > 0


@pytest.mark.parametrize("module,expect", [
    ("modules/bbox_detector=rtmdet", "RTMDetDetector"),
    ("modules/bbox_detector=rtdetr_hf", "RTDETRDetector"),
    ("modules/bbox_detector=yolo11", "YOLOv8Detector"),
    ("modules/reid=backbone_zoo", "OSNetReId"),
])
def test_new_module_configs_compose_and_instantiate(module, expect):
    """Every round-2 module YAML composes and its _target_ resolves to
    a constructible wrapper (catches config <-> constructor drift)."""
    group = module.split("=")[0].split("/")[-1]
    cfg = compose(CONFIG_DIR, "config", [module])
    node = getattr(cfg.modules, group)
    assert node._target_.endswith(expect)
    obj = instantiate(node)
    assert type(obj).__name__ == expect
    if group == "bbox_detector" and expect == "YOLOv8Detector":
        assert obj.variant == "11m"
    if group == "reid":
        assert obj.backbone == "resnet50_ibn_a"
