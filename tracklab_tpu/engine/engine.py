"""Tracking engine base: video-loop orchestration + callback dispatch.

API-compatible rebuild of tracklab/engine/engine.py:18-185, minus the
lightning-Fabric indirection (the reference used Fabric purely as a callback
multiplexer, engine.py:92-93): callbacks are dispatched through a plain
ordered registry, with TrackerState inserted between "before" and "after"
callbacks (engine.py:88-90).
"""
from __future__ import annotations

import logging
from abc import abstractmethod
from typing import Dict, List

import numpy as np
import pandas as pd

from tracklab_tpu.callbacks.callback import Callback
from tracklab_tpu.datastruct.datapipe import EngineDatapipe, PrefetchLoader
from tracklab_tpu.datastruct.tracker_state import TrackerState

log = logging.getLogger(__name__)

__all__ = ["TrackingEngine", "merge_dataframes"]


def merge_dataframes(main_df: pd.DataFrame, appended_piece):
    """Merge module output rows/columns into the running frame
    (engine.py:18-41): new columns appended, new rows appended, existing
    cells overridden by the new values."""
    if isinstance(appended_piece, pd.Series):
        appended_piece = pd.DataFrame(appended_piece).T
    elif isinstance(appended_piece, list):
        if len(appended_piece) > 0:
            appended_piece = pd.concat(
                [s.to_frame().T if isinstance(s, pd.Series) else s
                 for s in appended_piece])
        else:
            appended_piece = pd.DataFrame()
    if main_df is None or len(main_df) == 0:
        return appended_piece
    if len(appended_piece) == 0:
        return main_df
    main_df = main_df.copy()
    new_columns = appended_piece.columns.difference(main_df.columns)
    new_index = appended_piece.index.difference(main_df.index)
    if len(new_index):
        filler = pd.DataFrame(index=new_index, columns=main_df.columns)
        main_df = pd.concat([main_df, filler])
    # new columns assigned whole (keeps object dtype for array cells);
    # overlapping columns cell-updated (appended overrides non-NaN)
    for col in new_columns:
        main_df[col] = appended_piece[col].reindex(main_df.index)
    overlap = [c for c in appended_piece.columns if c not in new_columns]
    if overlap:
        main_df.update(appended_piece[overlap])
    return main_df


class TrackingEngine:
    """Base engine (engine.py:44-185).

    Args:
      detections: modules dict name -> Module (pipeline order)
      tracker_state: TrackerState
      callbacks: dict name -> Callback
      num_workers: host decode threads
    """

    def __init__(self, tracker_state: TrackerState, modules,
                 callbacks: Dict[str, Callback] | List[Callback] | None =
                 None, num_workers: int = 4, fused: bool = False,
                 **kwargs):
        self.tracker_state = tracker_state
        # fused fast path: collapse a device detector + device tracker
        # pipeline prefix into ONE XLA program per video (engine/fused.py)
        self.fused = fused
        self.module_names = [m.name for m in modules]
        self.models = {m.name: m for m in modules}
        self.num_workers = num_workers
        self.img_metadatas = tracker_state.image_metadatas
        self.video_metadatas = tracker_state.video_metadatas

        if callbacks is None:
            callbacks = []
        if isinstance(callbacks, dict):
            callbacks = list(callbacks.values())
        before = [c for c in callbacks if not getattr(
            c, "after_saved_state", False)]
        after = [c for c in callbacks if getattr(
            c, "after_saved_state", False)]
        self.callbacks: List = before + [tracker_state] + after

        self.datapipes = {}
        self.dataloaders = {}
        for name, model in self.models.items():
            if model.level in ("image", "detection"):
                self.datapipes[name] = EngineDatapipe(model)
                self.dataloaders[name] = PrefetchLoader(
                    self.datapipes[name],
                    batch_size=getattr(model, "batch_size", 1),
                    collate_fn=model.collate_fn,
                    num_workers=num_workers)

    # ------------------------------------------------------------------
    def fire(self, hook: str, **kwargs):
        for cb in self.callbacks:
            fn = getattr(cb, hook, None)
            if fn is not None:
                fn(engine=self, **kwargs)

    # ------------------------------------------------------------------
    def track_dataset(self):
        """Per-video loop (engine.py:105-126)."""
        self.fire("on_dataset_track_start")
        for i, (video_id, video_metadata) in enumerate(
                self.video_metadatas.iterrows()):
            with self.tracker_state(video_id):
                self.fire("on_video_loop_start",
                          video_metadata=video_metadata,
                          video_idx=video_id, index=i)
                detections, image_pred = self.video_loop(
                    video_metadata, video_id)
                self.fire("on_video_loop_end",
                          video_metadata=video_metadata,
                          video_idx=video_id,
                          detections=detections, image_pred=image_pred)
        self.fire("on_dataset_track_end")

    @abstractmethod
    def video_loop(self, video_metadata: pd.Series, video_id):
        ...

    # ------------------------------------------------------------------
    def default_step(self, batch, task: str, detections: pd.DataFrame,
                     image_pred: pd.DataFrame, **kwargs):
        """One module batch: slice rows, run process(), merge the output
        back (engine.py:148-185)."""
        model = self.models[task]
        self.fire("on_module_step_start", task=task, batch=batch)
        ids, samples = batch
        if model.level == "image":
            batch_metadatas = image_pred.loc[np.asarray(ids)]
            if len(detections):
                batch_detections = detections[
                    detections["image_id"].isin(batch_metadatas.index)]
            else:
                batch_detections = detections
            outputs = model.process(samples, batch_detections,
                                    batch_metadatas)
        else:
            batch_detections = detections.loc[np.asarray(ids)]
            batch_metadatas = image_pred.loc[
                batch_detections["image_id"].unique()]
            outputs = model.process(samples, batch_detections,
                                    batch_metadatas)
        if isinstance(outputs, tuple):
            outputs, image_outputs = outputs
            image_pred = merge_dataframes(image_pred, image_outputs)
        detections = merge_dataframes(detections, outputs)
        self.fire("on_module_step_end", task=task, batch=batch,
                  detections=detections)
        return detections, image_pred
