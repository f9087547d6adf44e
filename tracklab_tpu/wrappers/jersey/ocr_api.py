"""Jersey-number recognition module.

Counterpart of the game-state pipeline's jersey OCR hook (reference ships
the EasyOCR bbox-mapping helper, tracklab/utils/easyocr.py, with the OCR
module living in sn-gamestate): a DetectionLevelModule emitting
``jersey_number_detection`` / ``jersey_number_confidence`` columns that
MajorityVoteTracklet aggregates per track. Uses EasyOCR when installed;
otherwise emits empty predictions (gated like the reference's optional
deps).
"""
from __future__ import annotations

import logging

import numpy as np
import pandas as pd

from tracklab_tpu.pipeline.levels import DetectionLevelModule
from tracklab_tpu.utils.collate import Unbatchable, default_collate

log = logging.getLogger(__name__)

__all__ = ["JerseyNumberOCR", "map_ocr_to_jersey"]


def map_ocr_to_jersey(ocr_results, crop_shape):
    """EasyOCR results -> (number, confidence) for the torso region
    (reference: tracklab/utils/easyocr.py bbox mapping): keep digit-only
    readings whose box center falls in the middle band of the crop;
    highest-confidence wins."""
    h, w = crop_shape[:2]
    best = (None, 0.0)
    for bbox, text, conf in ocr_results or []:
        text = "".join(ch for ch in str(text) if ch.isdigit())
        if not text or len(text) > 2:
            continue
        xs = [p[0] for p in bbox]
        ys = [p[1] for p in bbox]
        cx, cy = np.mean(xs), np.mean(ys)
        if not (0.1 * w < cx < 0.9 * w and 0.05 * h < cy < 0.7 * h):
            continue
        if conf > best[1]:
            best = (text, float(conf))
    return best


class JerseyNumberOCR(DetectionLevelModule):
    input_columns = ["bbox_ltwh"]
    output_columns = ["jersey_number_detection",
                      "jersey_number_confidence"]
    collate_fn = staticmethod(default_collate)

    def __init__(self, batch_size: int = 8, min_confidence: float = 0.3,
                 device=None, **kwargs):
        super().__init__(batch_size)
        self.min_confidence = min_confidence
        self._reader = None
        self._checked = False

    def _reader_or_none(self):
        if self._checked:
            return self._reader
        self._checked = True
        try:
            import easyocr
            self._reader = easyocr.Reader(["en"], gpu=False)
        except ImportError:
            log.warning("easyocr not installed — jersey OCR emits "
                        "empty predictions")
            self._reader = None
        return self._reader

    def preprocess(self, image, detection: pd.Series,
                   metadata: pd.Series):
        from tracklab_tpu.utils.cv2 import crop_bbox
        return {"crop": Unbatchable(crop_bbox(image,
                                              detection["bbox_ltwh"]))}

    def process(self, batch, detections: pd.DataFrame,
                metadatas: pd.DataFrame):
        reader = self._reader_or_none()
        numbers, confs = [], []
        for crop in batch["crop"]:
            if reader is None or crop.size == 0:
                numbers.append(None)
                confs.append(0.0)
                continue
            try:
                results = reader.readtext(crop)
            except Exception as e:
                log.debug("OCR failed: %s", e)
                results = []
            num, conf = map_ocr_to_jersey(results, crop.shape)
            numbers.append(num if conf >= self.min_confidence else None)
            confs.append(conf)
        out = pd.DataFrame(index=detections.index)
        out["jersey_number_detection"] = numbers
        out["jersey_number_confidence"] = confs
        return out
