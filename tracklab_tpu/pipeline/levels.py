"""Granularity-level module ABCs (image / detection / video) + Evaluator.

API-compatible with the reference level ABCs
(tracklab/pipeline/imagelevel_module.py:10-100,
detectionlevel_module.py:10-98, videolevel_module.py:11-61,
evaluator.py:7-26), with one TPU-native change: batching/prefetch is done by
our thread-pool loader (tracklab_tpu.datastruct.datapipe) feeding
``jax.device_put`` double-buffering instead of a torch DataLoader.
"""
from __future__ import annotations

from abc import abstractmethod
from typing import Any

import pandas as pd

from tracklab_tpu.pipeline.module import Module
from tracklab_tpu.utils.collate import default_collate

__all__ = ["ImageLevelModule", "DetectionLevelModule", "VideoLevelModule",
           "Evaluator"]


class ImageLevelModule(Module):
    """Modules that process full images (detectors, bottom-up pose, ...).

    Subclasses implement:
      preprocess(image, detections, metadata) -> sample dict
      process(batch, detections, metadatas) -> DataFrame (detection level)
    """

    collate_fn = staticmethod(default_collate)

    def __init__(self, batch_size: int):
        self.batch_size = batch_size

    @abstractmethod
    def preprocess(self, image, detections: pd.DataFrame,
                   metadata: pd.Series) -> Any:
        ...

    @abstractmethod
    def process(self, batch: Any, detections: pd.DataFrame,
                metadatas: pd.DataFrame):
        ...


class DetectionLevelModule(Module):
    """Modules that process per-detection crops (top-down pose, ReID...)."""

    collate_fn = staticmethod(default_collate)

    def __init__(self, batch_size: int):
        self.batch_size = batch_size

    @abstractmethod
    def preprocess(self, image, detection: pd.Series,
                   metadata: pd.Series) -> Any:
        ...

    @abstractmethod
    def process(self, batch: Any, detections: pd.DataFrame,
                metadatas: pd.DataFrame):
        ...


class VideoLevelModule(Module):
    """Modules that process a whole video at once (trackers as lax.scan,
    tracklet-level aggregation, offline smoothing)."""

    @abstractmethod
    def process(self, detections: pd.DataFrame,
                metadatas: pd.DataFrame) -> pd.DataFrame:
        ...


class Evaluator:
    """Evaluation wrapper contract (evaluator.py:7-26)."""

    def __init__(self, cfg):
        self.cfg = cfg

    @abstractmethod
    def run(self, tracker_state):
        ...
