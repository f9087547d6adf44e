"""Direct unit tests for thin wrapper-layer code (VERDICT r3 item 8):
jersey OCR mapping edge cases, the OCR module's gated/degraded paths,
and dataset wrappers' failure modes — previously exercised only through
integration tests."""
import numpy as np
import pandas as pd
import pytest

from tracklab_tpu.wrappers.jersey.ocr_api import (JerseyNumberOCR,
                                                  map_ocr_to_jersey)


def _box(cx, cy, s=6):
    return [(cx - s, cy - s), (cx + s, cy - s), (cx + s, cy + s),
            (cx - s, cy + s)]


class TestMapOcrToJersey:
    SHAPE = (100, 50, 3)  # h, w

    def test_empty_and_none(self):
        assert map_ocr_to_jersey([], self.SHAPE) == (None, 0.0)
        assert map_ocr_to_jersey(None, self.SHAPE) == (None, 0.0)

    def test_digit_extraction_from_mixed_text(self):
        res = [(_box(25, 30), "G7", 0.9)]
        assert map_ocr_to_jersey(res, self.SHAPE) == ("7", 0.9)

    def test_three_digits_rejected(self):
        res = [(_box(25, 30), "123", 0.99)]
        assert map_ocr_to_jersey(res, self.SHAPE) == (None, 0.0)

    def test_non_digit_rejected(self):
        res = [(_box(25, 30), "AB", 0.99)]
        assert map_ocr_to_jersey(res, self.SHAPE) == (None, 0.0)

    def test_torso_band_filtering(self):
        # center x must be in (0.1w, 0.9w), y in (0.05h, 0.7h)
        outside = [(_box(25, 90), "9", 0.9),   # too low (socks)
                   (_box(2, 30), "8", 0.9),    # off the left edge
                   (_box(49, 30), "6", 0.9)]   # off the right edge
        assert map_ocr_to_jersey(outside, self.SHAPE) == (None, 0.0)
        inside = [(_box(25, 30), "10", 0.4)]
        assert map_ocr_to_jersey(outside + inside, self.SHAPE) \
            == ("10", 0.4)

    def test_highest_confidence_wins(self):
        res = [(_box(20, 30), "4", 0.5), (_box(30, 40), "23", 0.8),
               (_box(25, 20), "9", 0.6)]
        assert map_ocr_to_jersey(res, self.SHAPE) == ("23", 0.8)


class _FakeReader:
    def __init__(self, results):
        self.results = results

    def readtext(self, crop):
        return self.results


class TestJerseyNumberOCR:
    def _detections(self, n=2):
        return pd.DataFrame(
            {"bbox_ltwh": [np.array([5, 5, 20, 40], float)] * n},
            index=pd.RangeIndex(10, 10 + n))

    def test_without_easyocr_emits_empty(self):
        mod = JerseyNumberOCR()
        mod._checked, mod._reader = True, None  # easyocr absent
        dets = self._detections()
        crops = [np.zeros((40, 20, 3), np.uint8)] * 2
        out = mod.process({"crop": crops}, dets, None)
        assert list(out.index) == [10, 11]
        assert out["jersey_number_detection"].isna().all()
        assert (out["jersey_number_confidence"] == 0.0).all()

    def test_min_confidence_gates_number(self):
        mod = JerseyNumberOCR(min_confidence=0.5)
        mod._checked = True
        mod._reader = _FakeReader([(_box(10, 10), "7", 0.4)])
        dets = self._detections(1)
        out = mod.process({"crop": [np.zeros((40, 20, 3), np.uint8)]},
                          dets, None)
        assert out["jersey_number_detection"].iloc[0] is None
        assert out["jersey_number_confidence"].iloc[0] == \
            pytest.approx(0.4)
        mod._reader = _FakeReader([(_box(10, 10), "7", 0.9)])
        out = mod.process({"crop": [np.zeros((40, 20, 3), np.uint8)]},
                          dets, None)
        assert out["jersey_number_detection"].iloc[0] == "7"

    def test_empty_crop_skipped(self):
        mod = JerseyNumberOCR()
        mod._checked = True
        mod._reader = _FakeReader([(_box(10, 10), "7", 0.9)])
        empty = np.zeros((0, 0, 3), np.uint8)
        out = mod.process({"crop": [empty]}, self._detections(1), None)
        assert out["jersey_number_detection"].iloc[0] is None

    def test_preprocess_crops_bbox(self):
        mod = JerseyNumberOCR()
        img = np.arange(100 * 60 * 3, dtype=np.uint8).reshape(100, 60, 3)
        det = pd.Series({"bbox_ltwh": np.array([10, 20, 30, 40], float)})
        crop = mod.preprocess(img, det, None)["crop"].value
        assert crop.shape == (40, 30, 3)
        np.testing.assert_array_equal(crop, img[20:60, 10:40])


class TestMOTFailureModes:
    def _seq(self, root, name, nframes=3, gt=True, seqinfo=True):
        d = root / "train" / name
        (d / "gt").mkdir(parents=True)
        if seqinfo:
            (d / "seqinfo.ini").write_text(
                "[Sequence]\nname=%s\nseqLength=%d\nframeRate=25\n"
                "imWidth=64\nimHeight=48\n" % (name, nframes))
        if gt:
            rows = ["%d,1,1,2,10,20,1,1,1.0" % f
                    for f in range(1, nframes + 1)]
            (d / "gt" / "gt.txt").write_text("\n".join(rows))

    def test_missing_gt_file_loads_images_only(self, tmp_path):
        from tracklab_tpu.wrappers.dataset.mot_like import MOT
        self._seq(tmp_path, "SEQ-01", gt=False)
        ds = MOT(str(tmp_path))
        ts = ds.sets["train"]
        assert len(ts.image_metadatas) == 3
        assert len(ts.detections_gt) == 0

    def test_missing_seqinfo_defaults(self, tmp_path):
        from tracklab_tpu.wrappers.dataset.mot_like import MOT
        self._seq(tmp_path, "SEQ-01", seqinfo=False)
        ds = MOT(str(tmp_path))
        ts = ds.sets["train"]
        # no seqLength -> 0 frames -> gt rows have no image to attach to
        assert len(ts.image_metadatas) == 0
        assert len(ts.detections_gt) == 0
        assert ds.sets["train"].video_metadatas.iloc[0]["nframes"] == 0

    def test_gt_frames_beyond_seqlength_dropped(self, tmp_path):
        from tracklab_tpu.wrappers.dataset.mot_like import MOT
        self._seq(tmp_path, "SEQ-01", nframes=2)
        gt = tmp_path / "train" / "SEQ-01" / "gt" / "gt.txt"
        gt.write_text(gt.read_text() + "\n9,1,1,2,10,20,1,1,1.0")
        ds = MOT(str(tmp_path))
        assert len(ds.sets["train"].detections_gt) == 2

    def test_empty_dataset_warns_not_raises(self, tmp_path, caplog):
        from tracklab_tpu.wrappers.dataset.mot_like import MOT
        ds = MOT(str(tmp_path / "nothing"))
        assert ds.sets == {}


def test_external_video_missing_file_raises(tmp_path):
    from tracklab_tpu.wrappers.dataset.external_video import ExternalVideo
    with pytest.raises(FileNotFoundError, match="No video"):
        ExternalVideo(str(tmp_path / "nope.mp4"))
