"""Pipelined engine: cross-module software pipelining within a video.

The reference ships only an empty stub here (tracklab/engine/
pipelined.py:6-15); this is the real thing. The video's frames are split
into chunks and every module becomes a pipeline stage running in its own
thread, connected by bounded queues: while the detector's device program
runs on chunk k, the ReID stage is cropping chunk k-1 on host threads and
the decode pool is reading chunk k+1 — so per-video wall clock approaches
max(stage time) instead of sum(stage time).

Semantics are identical to the offline engine because every image/
detection-level module is pure per-frame/per-detection: processing a
chunk-partition of the video commutes with processing it whole.
Video-level modules (the lax.scan trackers, tracklet aggregation) are
sequential over frames, so they act as barrier stages: they buffer all
chunks, run once on the full video, then re-emit chunks downstream —
cheap, since the scan trackers run at thousands of fps.

Chunks carry their own DataFrame slices through the queues (no shared
mutable state between stage threads); callback dispatch is serialized by
a lock.
"""
from __future__ import annotations

import logging
import queue
import threading
from typing import List

import pandas as pd

from tracklab_tpu.datastruct.datapipe import EngineDatapipe, PrefetchLoader
from tracklab_tpu.engine.engine import TrackingEngine, merge_dataframes

log = logging.getLogger(__name__)

__all__ = ["PipelinedTrackingEngine"]

_DONE = object()


class PipelinedTrackingEngine(TrackingEngine):
    """cfg: chunk_size (frames per pipeline chunk), queue_depth
    (per-stage backpressure), num_workers (decode threads per stage)."""

    def __init__(self, *args, chunk_size: int = 32, queue_depth: int = 2,
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.chunk_size = max(int(chunk_size), 1)
        self.queue_depth = max(int(queue_depth), 1)
        self._fire_lock = threading.Lock()

    def fire(self, hook: str, **kwargs):
        with self._fire_lock:
            super().fire(hook, **kwargs)

    # ------------------------------------------------------------------
    def _run_chunk(self, model_name: str, detections: pd.DataFrame,
                   image_pred: pd.DataFrame):
        """One image/detection-level module over one frame chunk —
        stage-local datapipe + loader so stages never share state."""
        model = self.models[model_name]
        filepaths = {idx: fp
                     for idx, fp in image_pred["file_path"].items()}
        datapipe = EngineDatapipe(model)
        datapipe.update(filepaths, image_pred, detections)
        loader = PrefetchLoader(
            datapipe, batch_size=getattr(model, "batch_size", 1),
            collate_fn=model.collate_fn, num_workers=self.num_workers)
        for batch in loader:
            detections, image_pred = self.default_step(
                batch, model_name, detections, image_pred)
        return detections, image_pred

    def _stage(self, stage_idx: int, model_name: str,
               queues: List[queue.Queue], n_chunks: int, errors: list):
        model = self.models[model_name]
        q_in, q_out = queues[stage_idx], queues[stage_idx + 1]
        self.fire("on_module_start", task=model_name, dataloader=[])
        done_seen = False
        try:
            if model.level == "video":
                buf = []
                while True:
                    item = q_in.get()
                    if item is _DONE:
                        done_seen = True
                        break
                    buf.append(item)
                buf.sort(key=lambda x: x[0])
                dets = pd.concat([b[1] for b in buf]) if buf else \
                    pd.DataFrame()
                imgs = pd.concat([b[2] for b in buf]) if buf else \
                    pd.DataFrame()
                if len(dets):
                    outputs = model.process(dets, imgs)
                    dets = merge_dataframes(dets, outputs)
                for ci, (_, _, imgs_c) in enumerate(buf):
                    dets_c = dets[dets["image_id"].isin(imgs_c.index)] \
                        if len(dets) else dets
                    q_out.put((ci, dets_c, imgs_c))
            else:
                while True:
                    item = q_in.get()
                    if item is _DONE:
                        done_seen = True
                        break
                    ci, dets_c, imgs_c = item
                    if len(dets_c) or model.level == "image":
                        dets_c, imgs_c = self._run_chunk(
                            model_name, dets_c, imgs_c)
                    q_out.put((ci, dets_c, imgs_c))
        except BaseException as e:  # surface in the main thread
            log.exception("Pipelined stage %s failed", model_name)
            errors.append(e)
        finally:
            q_out.put(_DONE)
            # On failure, drain q_in until the producer's _DONE actually
            # arrives: every producer (video_loop for stage 0, upstream
            # stages otherwise) terminates its output with _DONE in its
            # own finally, so the blocking get always returns and the
            # producer can never deadlock on a full bounded queue.
            while not done_seen:
                done_seen = q_in.get() is _DONE
            self.fire("on_module_end", task=model_name,
                      detections=pd.DataFrame())

    # ------------------------------------------------------------------
    def video_loop(self, video_metadata: pd.Series, video_id):
        for model in self.models.values():
            if hasattr(model, "reset"):
                model.reset()
        detections, image_pred = self.tracker_state.load()
        names = self.module_names
        if not names or len(image_pred) == 0:
            return detections, image_pred

        image_ids = list(image_pred.index)
        chunks = [image_ids[i:i + self.chunk_size]
                  for i in range(0, len(image_ids), self.chunk_size)]
        queues = [queue.Queue(maxsize=self.queue_depth)
                  for _ in range(len(names) + 1)]
        errors: list = []
        threads = [threading.Thread(
            target=self._stage, args=(i, name, queues, len(chunks),
                                      errors), daemon=True)
            for i, name in enumerate(names)]
        for t in threads:
            t.start()

        for ci, ids in enumerate(chunks):
            imgs_c = image_pred.loc[ids]
            dets_c = detections[detections["image_id"].isin(ids)] \
                if len(detections) else detections
            queues[0].put((ci, dets_c, imgs_c))
        queues[0].put(_DONE)

        results = []
        while True:
            item = queues[-1].get()
            if item is _DONE:
                break
            results.append(item)
        for t in threads:
            t.join()
        if errors:
            raise errors[0]
        results.sort(key=lambda x: x[0])
        if results:
            detections = pd.concat([r[1] for r in results])
            detections = detections[~detections.index.duplicated(
                keep="last")]
            image_pred = pd.concat([r[2] for r in results])
        return detections, image_pred
