"""MOT-format dataset loader round-trip on a synthetic MOT17-style dir."""
import numpy as np
import pytest


def make_mot_dir(root, n_videos=2, n_frames=5):
    for v in range(n_videos):
        seq = root / "train" / f"MOT17-{v:02d}"
        (seq / "gt").mkdir(parents=True)
        (seq / "det").mkdir()
        (seq / "img1").mkdir()
        (seq / "seqinfo.ini").write_text(
            f"[Sequence]\nname=MOT17-{v:02d}\nimDir=img1\n"
            f"frameRate=30\nseqLength={n_frames}\nimWidth=1920\n"
            f"imHeight=1080\nimExt=.jpg\n")
        gt_rows, det_rows = [], []
        for f in range(1, n_frames + 1):
            for t in (1, 2):
                x = 100 * t + 5 * f
                gt_rows.append(f"{f},{t},{x},200,50,120,1,1,1.0")
                det_rows.append(f"{f},-1,{x + 1},201,50,120,0.9")
        (seq / "gt" / "gt.txt").write_text("\n".join(gt_rows))
        (seq / "det" / "det.txt").write_text("\n".join(det_rows))


def test_mot_loader_and_export(tmp_path):
    from tracklab_tpu.wrappers.dataset.mot_like import MOT17
    make_mot_dir(tmp_path)
    ds = MOT17(str(tmp_path), public_dets=True)
    ts = ds.sets["train"]
    assert len(ts.video_metadatas) == 2
    assert ts.video_metadatas.iloc[0]["nframes"] == 5
    assert len(ts.image_metadatas) == 10
    assert len(ts.detections_gt) == 20
    det = ts.detections_gt.iloc[0]
    np.testing.assert_allclose(det["bbox_ltwh"], [105, 200, 50, 120])
    assert det["track_id"] == 1
    # public detections loaded
    assert hasattr(ts, "detections_public")
    assert len(ts.detections_public) == 20

    # MOT export with zip + seqmaps
    out = tmp_path / "eval" / "pred"
    export = ts.detections_gt.copy()
    export["bbox_conf"] = 1.0
    MOT17.save_for_eval(export, ts.image_metadatas, ts.video_metadatas,
                        str(out), save_zip=True)
    txt = (out / "MOT17-00.txt").read_text().strip().splitlines()
    assert len(txt) == 10
    first = txt[0].split(",")
    assert first[0] == "1" and first[1] in ("1", "2")
    assert (tmp_path / "eval" / "pred.zip").exists()
    assert (tmp_path / "eval" / "seqmaps.txt").read_text().startswith(
        "name\n")


def test_nvid_nframes_subsampling(tmp_path):
    from tracklab_tpu.wrappers.dataset.mot_like import MOT17
    make_mot_dir(tmp_path, n_videos=3, n_frames=6)
    ds = MOT17(str(tmp_path), nvid=2, nframes=3)
    ts = ds.sets["train"]
    assert len(ts.video_metadatas) == 2
    assert len(ts.image_metadatas) == 6
    assert ts.detections_gt["image_id"].isin(
        ts.image_metadatas.index).all()


def test_public_dets_pipeline(tmp_path):
    """load_from_public_dets bootstraps OC-SORT without a detector
    (BASELINE milestone 4 shape)."""
    from tracklab_tpu.wrappers.dataset.mot_like import MOT17
    from tracklab_tpu.datastruct.tracker_state import TrackerState
    from tracklab_tpu.wrappers.track import OCSORT
    from tracklab_tpu.engine import OfflineTrackingEngine
    from tracklab_tpu.pipeline.module import Pipeline
    make_mot_dir(tmp_path, n_videos=1, n_frames=5)
    ds = MOT17(str(tmp_path), public_dets=True)
    ts = ds.sets["train"]
    tracker = OCSORT(min_hits=1, det_thresh=0.4, max_dets=8,
                     max_tracks=8)
    pipeline = Pipeline([tracker])
    state = TrackerState(ts, pipeline, load_from_public_dets=True)
    engine = OfflineTrackingEngine(tracker_state=state,
                                   modules=[tracker], callbacks=[])
    engine.track_dataset()
    dets = state.detections_pred
    assert dets["track_id"].notna().sum() >= 8
    assert dets["track_id"].dropna().nunique() == 2
