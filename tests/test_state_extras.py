"""TrackerState JSON bootstrap, determinism, jersey OCR mapping."""
import json
import numpy as np
import pandas as pd
import pytest


def test_json_detection_bootstrap(tmp_path):
    from tracklab_tpu.datastruct.tracker_state import TrackerState
    from tracklab_tpu.wrappers.dataset.synthetic import SyntheticDataset
    from tracklab_tpu.pipeline.module import Pipeline

    ds = SyntheticDataset(n_videos=1, n_frames=4, n_objects=2)
    ts = ds.sets["val"]
    image_ids = list(ts.image_metadatas.index)
    records = [
        {"image_id": int(image_ids[0]), "bbox": [10, 10, 40, 80],
         "score": 0.9},
        {"image_id": int(image_ids[1]), "bbox": [15, 12, 40, 80],
         "score": 0.8, "category_id": 1},
        {"image_id": 999999, "bbox": [0, 0, 1, 1], "score": 0.1},
    ]
    jf = tmp_path / "dets.json"
    jf.write_text(json.dumps(records))
    state = TrackerState(ts, Pipeline([]), json_file=str(jf))
    vid = ts.video_metadatas.index[0]
    with state(vid):
        dets, imgs = state.load()
    assert len(dets) == 2  # unknown image dropped
    np.testing.assert_allclose(dets.iloc[0]["bbox_ltwh"],
                               [10, 10, 40, 80])


def test_tracker_determinism():
    """Same inputs -> bit-identical outputs across runs (SURVEY §5: the
    functional-purity replacement for race detection)."""
    import jax
    import jax.numpy as jnp
    from tracklab_tpu.trackers.ocsort import OCSortConfig, ocsort_scan
    from tracklab_tpu.trackers.common import Detections, pad_detections
    from test_ocsort import synth_stream

    frames = synth_stream(3, n_frames=30)
    cfg = OCSortConfig(max_tracks=32, max_dets=16, min_hits=1)
    dets = [pad_detections(f[:, :4], f[:, 4], f[:, 5],
                           f[:, 6].astype(int), capacity=16)
            for f in frames]
    stacked = Detections(*[jnp.stack([getattr(d, n) for d in dets])
                           for n in Detections._fields])
    fn = jax.jit(lambda d: ocsort_scan(cfg, d))
    _, out1 = fn(stacked)
    _, out2 = fn(stacked)
    np.testing.assert_array_equal(np.asarray(out1.valid),
                                  np.asarray(out2.valid))
    np.testing.assert_array_equal(np.asarray(out1.ltrb),
                                  np.asarray(out2.ltrb))
    np.testing.assert_array_equal(np.asarray(out1.track_id),
                                  np.asarray(out2.track_id))


def test_jersey_ocr_mapping():
    from tracklab_tpu.wrappers.jersey.ocr_api import map_ocr_to_jersey
    crop = (100, 60, 3)
    results = [
        ([[20, 20], [40, 20], [40, 40], [20, 40]], "10", 0.9),
        ([[5, 90], [15, 90], [15, 99], [5, 99]], "7", 0.99),  # feet: out
        ([[25, 30], [45, 30], [45, 50], [25, 50]], "ab", 0.95),  # no digit
    ]
    num, conf = map_ocr_to_jersey(results, crop)
    assert num == "10" and conf == 0.9
    assert map_ocr_to_jersey([], crop) == (None, 0.0)


def test_jersey_module_without_easyocr():
    from tracklab_tpu.wrappers.jersey import JerseyNumberOCR
    mod = JerseyNumberOCR()
    dets = pd.DataFrame({
        "bbox_ltwh": [np.array([0, 0, 10, 10], np.float32)]}, index=[5])
    batch = {"crop": [np.zeros((10, 10, 3), np.uint8)]}
    out = mod.process(batch, dets, None)
    assert out.loc[5, "jersey_number_confidence"] == 0.0
