"""Aux subsystem tests: majority vote, online video engine, visualization,
external-video dataset."""
import numpy as np
import pandas as pd
import pytest


class TestMajorityVote:
    def test_weighted_vote(self):
        from tracklab_tpu.wrappers.tracklet_agg import MajorityVoteTracklet
        dets = pd.DataFrame({
            "track_id": [1, 1, 1, 2, 2],
            "team_detection": ["A", "B", "B", "A", "A"],
            "team_confidence": [0.9, 0.3, 0.3, 0.5, 0.5],
        })
        mod = MajorityVoteTracklet(attributes=["team"])
        out = mod.process(dets, None)
        assert list(out["team"]) == ["A", "A", "A", "A", "A"]
        # without the high-conf vote, B wins for track 1
        dets2 = dets.copy()
        dets2.loc[0, "team_confidence"] = 0.1
        out2 = mod.process(dets2, None)
        assert list(out2["team"])[:3] == ["B", "B", "B"]

    def test_handles_nan_and_missing_track(self):
        from tracklab_tpu.wrappers.tracklet_agg import MajorityVoteTracklet
        dets = pd.DataFrame({
            "track_id": [1, np.nan],
            "role_detection": ["gk", "df"],
            "role_confidence": [1.0, 1.0],
        })
        mod = MajorityVoteTracklet(attributes=["role"])
        out = mod.process(dets, None)
        assert out.loc[0, "role"] == "gk"


def make_test_video(path, n_frames=20, size=(320, 240)):
    """mp4 with a bright moving square on dark background."""
    import cv2
    writer = cv2.VideoWriter(str(path),
                             cv2.VideoWriter_fourcc(*"mp4v"), 30, size)
    for f in range(n_frames):
        img = np.full((size[1], size[0], 3), 20, np.uint8)
        x = 20 + 8 * f
        y = 60
        img[y:y + 60, x:x + 40] = 255
        writer.write(img)
    writer.release()


def _make_bright_detector():
    """Tiny test detector: finds the bright square by thresholding."""
    from tracklab_tpu.pipeline.levels import ImageLevelModule
    from tracklab_tpu.utils.collate import default_collate, Unbatchable

    class Bright(ImageLevelModule):
        input_columns = []
        output_columns = ["image_id", "video_id", "category_id",
                          "bbox_ltwh", "bbox_conf"]
        collate_fn = staticmethod(default_collate)

        def __init__(self):
            super().__init__(batch_size=1)
            self.id = 0

        def preprocess(self, image, detections, metadata):
            return {"image": Unbatchable(image)}

        def process(self, batch, detections, metadatas):
            rows = []
            for image, (image_id, md) in zip(batch["image"],
                                             metadatas.iterrows()):
                mask = image[..., 0] > 128
                ys, xs = np.nonzero(mask)
                if len(xs):
                    l, t = xs.min(), ys.min()
                    w, h = xs.max() - l + 1, ys.max() - t + 1
                    rows.append(pd.Series(dict(
                        image_id=image_id, video_id=md["video_id"],
                        category_id=1,
                        bbox_ltwh=np.array([l, t, w, h], np.float32),
                        bbox_conf=0.95), name=self.id))
                    self.id += 1
            return rows

    return Bright()


@pytest.mark.filterwarnings("ignore")
def test_online_video_engine(tmp_path):
    import cv2  # noqa: F401 — skip when OpenCV can't write mp4
    from tracklab_tpu.wrappers.dataset.external_video import ExternalVideo
    from tracklab_tpu.wrappers.track import OCSORT
    from tracklab_tpu.engine.video import VideoOnlineTrackingEngine
    from tracklab_tpu.datastruct.tracker_state import TrackerState
    from tracklab_tpu.pipeline.module import Pipeline

    vid = tmp_path / "clip.mp4"
    make_test_video(vid)
    ds = ExternalVideo(str(vid))
    ts = ds.sets["val"]
    assert len(ts.image_metadatas) == 20

    detector = _make_bright_detector()
    tracker = OCSORT(min_hits=1, det_thresh=0.4, max_dets=8,
                     max_tracks=8)
    pipeline = Pipeline([detector, tracker])
    state = TrackerState(ts, pipeline)
    engine = VideoOnlineTrackingEngine(
        tracker_state=state, modules=[detector, tracker], callbacks=[])
    engine.track_dataset()
    dets = state.detections_pred
    assert dets is not None and len(dets) >= 18
    tids = dets["track_id"].dropna().unique()
    # single moving object -> single identity throughout
    assert len(tids) == 1


def test_visualization_engine(tmp_path):
    import cv2
    from tracklab_tpu.visualization import (
        VisualizationEngine, DefaultDetectionVisualizer,
        TrackingLineVisualizer, FrameCounterVisualizer,
    )

    # synthetic frames on disk
    img_dir = tmp_path / "frames"
    img_dir.mkdir()
    image_rows, det_rows = [], []
    for f in range(6):
        img = np.full((120, 160, 3), 30, np.uint8)
        p = img_dir / f"{f:06d}.jpg"
        cv2.imwrite(str(p), img)
        image_rows.append(dict(id=f, video_id=0, frame=f + 1,
                               file_path=str(p)))
        det_rows.append(dict(id=f, image_id=f, video_id=0,
                             track_id=1.0,
                             bbox_ltwh=np.array([10 + 5 * f, 20, 30, 40],
                                                np.float32),
                             bbox_conf=0.9))
    image_pred = pd.DataFrame(image_rows).set_index("id")
    detections = pd.DataFrame(det_rows).set_index("id")

    class FakeState:
        detections_gt = pd.DataFrame()

    class FakeEngine:
        tracker_state = FakeState()

    viz = VisualizationEngine(
        visualizers=[DefaultDetectionVisualizer(),
                     TrackingLineVisualizer(),
                     FrameCounterVisualizer()],
        save_videos=True, save_images=True,
        save_folder=str(tmp_path / "out"), fps=10)
    viz.on_video_loop_end(FakeEngine(), pd.Series({"name": "demo"}), 0,
                          detections, image_pred)
    assert (tmp_path / "out" / "demo.mp4").exists()
    assert len(list((tmp_path / "out" / "demo").glob("*.jpg"))) == 6
    # drawn frame differs from blank
    drawn = cv2.imread(str(tmp_path / "out" / "demo" / "000000.jpg"))
    assert (drawn != 30).any()


def test_tracker_determinism():
    """SURVEY §5 race-detection note: functional purity means the same
    stream must produce bit-identical outputs run-to-run, including
    through the batched multi-video path."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tracklab_tpu.trackers.common import Detections
    from tracklab_tpu.trackers.ocsort import OCSortConfig, ocsort_scan

    cfg = OCSortConfig(max_tracks=32, max_dets=16, min_hits=1)
    rng = np.random.default_rng(3)
    F, D = 60, 16
    ltrb = rng.uniform(0, 500, (F, D, 4)).astype(np.float32)
    ltrb[..., 2:] = ltrb[..., :2] + 40
    dets = Detections(
        jnp.asarray(ltrb),
        jnp.asarray(rng.uniform(0.5, 1, (F, D)).astype(np.float32)),
        jnp.ones((F, D), jnp.float32),
        jnp.broadcast_to(jnp.arange(D, dtype=jnp.int32), (F, D)),
        jnp.asarray(rng.uniform(size=(F, D)) < 0.6),
    )
    scan = jax.jit(lambda d: ocsort_scan(cfg, d))
    _, a = scan(dets)
    _, b = scan(dets)
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_external_video_url_via_ytdlp_stub(tmp_path, monkeypatch):
    """URL inputs route through yt-dlp (reference
    external_video.py:56-60); a stub records the call and returns a
    local file the dataset then loads normally."""
    import sys
    import types
    import cv2  # noqa: F401
    from tracklab_tpu.wrappers.dataset import external_video as ev

    vid = tmp_path / "downloaded.mp4"
    make_test_video(vid)
    calls = {}

    class FakeYDL:
        def __init__(self, params):
            calls["params"] = params

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def extract_info(self, url):
            calls["url"] = url
            return {"id": "x"}

        def prepare_filename(self, info):
            return str(vid)

    stub = types.ModuleType("yt_dlp")
    stub.YoutubeDL = FakeYDL
    monkeypatch.setitem(sys.modules, "yt_dlp", stub)
    ds = ev.ExternalVideo("https://youtu.be/abc123",
                          download_dir=str(tmp_path))
    assert calls["url"] == "https://youtu.be/abc123"
    assert calls["params"]["noplaylist"] is True
    assert len(ds.sets["val"].image_metadatas) == 20


def test_external_video_url_without_ytdlp(monkeypatch):
    import sys
    monkeypatch.setitem(sys.modules, "yt_dlp", None)
    from tracklab_tpu.wrappers.dataset.external_video import ExternalVideo
    with pytest.raises(ImportError, match="yt-dlp"):
        ExternalVideo("https://youtu.be/abc123")
