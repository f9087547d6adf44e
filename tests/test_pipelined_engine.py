"""PipelinedTrackingEngine: chunked cross-module pipelining must produce
the same results as the offline engine, including with a mid-pipeline
video-level (tracker) barrier stage."""
import numpy as np
import pandas as pd
import pytest


def build(tmp_path, engine_cls, **engine_kwargs):
    from tests.test_offline_detector import (
        make_threshold_detector, render_frames,
    )
    from tracklab_tpu.datastruct.tracker_state import TrackerState
    from tracklab_tpu.pipeline.module import Pipeline
    from tracklab_tpu.wrappers.track import OCSORT

    ts = render_frames(tmp_path, n_frames=16)
    detector = make_threshold_detector()
    tracker = OCSORT(min_hits=1, det_thresh=0.4, max_dets=8,
                     max_tracks=8, iou_threshold=0.1)
    pipeline = Pipeline([detector, tracker])
    state = TrackerState(ts, pipeline)
    engine = engine_cls(tracker_state=state,
                        modules=[detector, tracker], callbacks=[],
                        **engine_kwargs)
    engine.track_dataset()
    return state.detections_pred


def test_pipelined_matches_offline(tmp_path):
    from tracklab_tpu.engine import (
        OfflineTrackingEngine, PipelinedTrackingEngine,
    )
    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    off = build(tmp_path / "a", OfflineTrackingEngine)
    pipe = build(tmp_path / "b", PipelinedTrackingEngine, chunk_size=5)
    assert len(off) == len(pipe)
    key = ["image_id", "track_id"]
    o = off.dropna(subset=["track_id"]).sort_values(key).reset_index()
    p = pipe.dropna(subset=["track_id"]).sort_values(key).reset_index()
    assert len(o) == len(p)
    assert (o["track_id"].to_numpy() == p["track_id"].to_numpy()).all()
    np.testing.assert_allclose(
        np.stack(o["bbox_ltwh"].to_numpy()),
        np.stack(p["bbox_ltwh"].to_numpy()))


def test_pipelined_eval(tmp_path):
    from tracklab_tpu.datastruct.tracker_state import TrackerState
    from tracklab_tpu.engine import PipelinedTrackingEngine
    from tracklab_tpu.eval import TrackEvalEvaluator
    from tests.test_offline_detector import (
        make_threshold_detector, render_frames,
    )
    from tracklab_tpu.pipeline.module import Pipeline
    from tracklab_tpu.wrappers.track import OCSORT

    ts = render_frames(tmp_path, n_frames=16)
    detector = make_threshold_detector()
    tracker = OCSORT(min_hits=1, det_thresh=0.4, max_dets=8,
                     max_tracks=8, iou_threshold=0.1)
    state = TrackerState(ts, Pipeline([detector, tracker]))
    engine = PipelinedTrackingEngine(
        tracker_state=state, modules=[detector, tracker], callbacks=[],
        chunk_size=4)
    engine.track_dataset()
    combined = TrackEvalEvaluator(eval_set="val").run(
        state)["COMBINED_SEQ"]
    assert combined["MOTA"] > 90
    assert combined["IDSW"] == 0


def test_pipelined_stage_error_propagates(tmp_path):
    from tracklab_tpu.engine import PipelinedTrackingEngine
    from tests.test_offline_detector import render_frames
    from tracklab_tpu.datastruct.tracker_state import TrackerState
    from tracklab_tpu.pipeline.levels import ImageLevelModule
    from tracklab_tpu.pipeline.module import Pipeline
    from tracklab_tpu.utils.collate import default_collate

    class Boom(ImageLevelModule):
        input_columns = []
        output_columns = []
        collate_fn = staticmethod(default_collate)

        def __init__(self):
            super().__init__(batch_size=4)

        def preprocess(self, image, detections, metadata):
            return {}

        def process(self, batch, detections, metadatas):
            raise RuntimeError("stage exploded")

    ts = render_frames(tmp_path, n_frames=6)
    boom = Boom()
    state = TrackerState(ts, Pipeline([boom]))
    engine = PipelinedTrackingEngine(tracker_state=state,
                                     modules=[boom], callbacks=[])
    with pytest.raises(RuntimeError, match="stage exploded"):
        engine.track_dataset()
