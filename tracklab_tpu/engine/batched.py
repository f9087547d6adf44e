"""Batched offline engine: track many videos concurrently.

The TPU-native realization of BASELINE config 5 ("8 videos tracked
simultaneously on a v4-8"): videos are grouped into batches; image/
detection-level modules run per video (host IO bound), while video-level
scan trackers consume the WHOLE batch as one stacked device program —
vmapped on a single chip, or sharded one-video-per-device over a
``jax.sharding.Mesh`` (parallel/mesh.py) when ``use_mesh`` is set.
"""
from __future__ import annotations

import logging


from tracklab_tpu.engine.engine import merge_dataframes
from tracklab_tpu.engine.offline import OfflineTrackingEngine

log = logging.getLogger(__name__)

__all__ = ["BatchedOfflineTrackingEngine"]


class BatchedOfflineTrackingEngine(OfflineTrackingEngine):
    def __init__(self, *args, video_batch_size: int = 8,
                 use_mesh: bool = False, **kwargs):
        super().__init__(*args, **kwargs)
        self.video_batch_size = max(int(video_batch_size), 1)
        self.use_mesh = use_mesh
        self._mesh = None
        if use_mesh:
            import jax
            from tracklab_tpu.parallel.mesh import make_mesh
            n = len(jax.devices())
            self._mesh = make_mesh(n, axis_names=("video", "unused"),
                                   tp_size=1)
            log.info("Batched engine: %d-device video mesh", n)

    def track_dataset(self):
        self.fire("on_dataset_track_start")
        videos = list(self.video_metadatas.iterrows())
        bs = self.video_batch_size
        for start in range(0, len(videos), bs):
            chunk = videos[start:start + bs]
            self._track_batch(chunk, start)
        self.fire("on_dataset_track_end")

    def _track_batch(self, chunk, start_index):
        state = self.tracker_state
        per_video = []
        # phase 1: per-video host/module passes up to the tracker
        for i, (video_id, video_metadata) in enumerate(chunk):
            with state(video_id):
                self.fire("on_video_loop_start",
                          video_metadata=video_metadata,
                          video_idx=video_id, index=start_index + i)
                detections, image_pred = state.load()
                for model_name in self.module_names:
                    model = self.models[model_name]
                    if model.level == "video":
                        break
                    image_filepaths = {
                        idx: fp for idx, fp in
                        image_pred["file_path"].items()}
                    self.datapipes[model_name].update(
                        image_filepaths, image_pred, detections)
                    loader = self.dataloaders[model_name]
                    self.fire("on_module_start", task=model_name,
                              dataloader=loader)
                    for batch in loader:
                        detections, image_pred = self.default_step(
                            batch, model_name, detections, image_pred)
                    self.fire("on_module_end", task=model_name,
                              detections=detections)
            per_video.append([video_id, video_metadata, detections,
                              image_pred])

        # phase 2: video-level modules over the whole batch at once
        for model_name in self.module_names:
            model = self.models[model_name]
            if model.level != "video":
                continue
            if hasattr(model, "process_video_batch"):
                items = [(d, im) for _, _, d, im in per_video]
                outs = model.process_video_batch(items, mesh=self._mesh)
                for rec, out in zip(per_video, outs):
                    rec[2] = merge_dataframes(rec[2], out)
            else:
                for rec in per_video:
                    out = model.process(rec[2], rec[3])
                    rec[2] = merge_dataframes(rec[2], out)

        # phase 3: save + callbacks per video
        for video_id, video_metadata, detections, image_pred in per_video:
            with state(video_id):
                self.fire("on_video_loop_end",
                          video_metadata=video_metadata,
                          video_idx=video_id, detections=detections,
                          image_pred=image_pred)
