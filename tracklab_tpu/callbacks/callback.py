"""Callback hook definitions.

Same 10-hook surface as the reference (tracklab/callbacks/callback.py:11-76)
minus the lightning-Fabric dependency — the engine dispatches through a
plain registry, with TrackerState inserted between "before" and "after"
callbacks so state saving happens at a deterministic point
(engine.py:88-90).
"""
from __future__ import annotations

__all__ = ["Callback"]


class Callback:
    after_saved_state = False

    def on_dataset_track_start(self, engine):
        pass

    def on_dataset_track_end(self, engine):
        pass

    def on_video_loop_start(self, engine, video_metadata, video_idx,
                            index):
        pass

    def on_video_loop_end(self, engine, video_metadata, video_idx,
                          detections, image_pred):
        pass

    def on_image_loop_start(self, engine, image_metadata, image_idx,
                            index):
        pass

    def on_image_loop_end(self, engine, image_metadata, image,
                          image_idx, detections):
        pass

    def on_module_start(self, engine, task, dataloader):
        pass

    def on_module_end(self, engine, task, detections):
        pass

    def on_module_step_start(self, engine, task, batch):
        pass

    def on_module_step_end(self, engine, task, batch, detections):
        pass
