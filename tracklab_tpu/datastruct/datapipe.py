"""Host-side input pipeline: per-module sample decode + batched prefetch.

Replaces the reference's torch ``EngineDatapipe`` + ``DataLoader`` workers
(tracklab/datastruct/datapipe.py:5-48,
tracklab/pipeline/imagelevel_module.py:92-100) with a thread-pool loader:
image decode and ``module.preprocess`` run on CPU threads while the device
consumes the previous batch — the double-buffered host->device pattern
(SURVEY §2.7).
"""
from __future__ import annotations

import logging
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

import numpy as np
import pandas as pd

from tracklab_tpu.utils.cv2 import cv2_load_image

log = logging.getLogger(__name__)

__all__ = ["EngineDatapipe", "PrefetchLoader"]


class EngineDatapipe:
    """Index-addressable view over image or detection rows; each item is
    decoded + module-preprocessed (datapipe.py:27-48)."""

    def __init__(self, model):
        self.model = model
        self.image_filepaths = None
        self.img_metadatas = None
        self.detections = None

    def update(self, image_filepaths: dict,
               metadatas: pd.DataFrame,
               detections: Optional[pd.DataFrame]):
        self.image_filepaths = image_filepaths
        self.img_metadatas = metadatas
        self.detections = detections

    def __len__(self):
        if self.model.level == "detection":
            return len(self.detections) if self.detections is not None \
                else 0
        return len(self.img_metadatas)

    def __getitem__(self, idx):
        if self.model.level == "detection":
            detection = self.detections.iloc[idx]
            metadata = self.img_metadatas.loc[detection["image_id"]]
            image = cv2_load_image(self.image_filepaths[metadata.name])
            sample = self.model.preprocess(
                image=image, detection=detection, metadata=metadata)
            return detection.name, sample
        metadata = self.img_metadatas.iloc[idx]
        if self.detections is not None and len(self.detections):
            dets = self.detections[
                self.detections["image_id"] == metadata.name]
        else:
            dets = pd.DataFrame()
        image = cv2_load_image(self.image_filepaths[metadata.name])
        sample = self.model.preprocess(
            image=image, detections=dets, metadata=metadata)
        return metadata.name, sample


class PrefetchLoader:
    """Batched iterator with thread-parallel item decode and one-batch
    lookahead."""

    def __init__(self, datapipe: EngineDatapipe, batch_size: int,
                 collate_fn, num_workers: int = 4):
        self.datapipe = datapipe
        self.batch_size = max(int(batch_size), 1)
        self.collate_fn = collate_fn
        self.num_workers = max(int(num_workers), 1)

    def __len__(self):
        n = len(self.datapipe)
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        n = len(self.datapipe)
        if n == 0:
            return
        batches = [range(i, min(i + self.batch_size, n))
                   for i in range(0, n, self.batch_size)]
        with ThreadPoolExecutor(self.num_workers) as pool:
            # one-batch lookahead: submit batch k+1 while yielding batch k
            pending = [pool.submit(self.datapipe.__getitem__, i)
                       for i in batches[0]]
            for b in range(len(batches)):
                items = [f.result() for f in pending]
                if b + 1 < len(batches):
                    pending = [pool.submit(self.datapipe.__getitem__, i)
                               for i in batches[b + 1]]
                ids = np.array([it[0] for it in items])
                samples = self.collate_fn([it[1] for it in items])
                yield ids, samples
