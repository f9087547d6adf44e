"""Visualization engine callback: after each video, render frames with the
configured visualizers and write .mp4 / .jpg artifacts.

Rebuild of tracklab/visualization/visualization_engine.py:17-138: drawing
is thread-parallel (CPU OpenCV — the reference used a multiprocessing
Pool), per-frame exceptions are swallowed with a warning
(visualization_engine.py:93-96), and video/image saving is toggled per
artifact kind.
"""
from __future__ import annotations

import logging
from pathlib import Path

import numpy as np
import pandas as pd

from tracklab_tpu.callbacks.callback import Callback
from tracklab_tpu.utils.cv2 import cv2_load_image
from tracklab_tpu.utils.parallel import parallel_map

log = logging.getLogger(__name__)

__all__ = ["VisualizationEngine"]


def _render_chunk(payload):
    """Module-level worker (process-pool picklable): render a chunk of
    frames with stateless visualizers — the reference's mp-Pool drawing
    (ref visualization_engine.py:121-129). Pickles the visualizer list +
    per-frame detection slices once per chunk, returns drawn frames."""
    visualizers, items = payload
    out = []
    for file_path, frame_pred, frame_gt, metadata in items:
        try:
            image = cv2_load_image(file_path)
        except Exception as e:  # missing frames shouldn't kill runs
            log.warning("visualization: cannot load %s (%s)",
                        file_path, e)
            out.append(None)
            continue
        image = np.ascontiguousarray(image)
        for v in visualizers:
            try:
                v.draw_frame(image, frame_pred, frame_gt, metadata)
            except Exception as e:
                log.warning("visualizer %s failed on frame %s: %s",
                            type(v).__name__, metadata.get("frame"), e)
        out.append(image)
    return out


class VisualizationEngine(Callback):
    after_saved_state = True

    def __init__(self, visualizers=None, save_videos: bool = True,
                 save_images: bool = False, save_folder: str = "visuals",
                 fps: int = 30, num_workers: int = 4,
                 parallel_backend: str = "thread",
                 process_n_videos: int = -1, video_fmt: str = "mp4v",
                 **kwargs):
        if visualizers is None:
            from tracklab_tpu.visualization.detection import (
                DefaultDetectionVisualizer,
            )
            visualizers = [DefaultDetectionVisualizer()]
        if isinstance(visualizers, dict):
            visualizers = list(visualizers.values())
        self.visualizers = visualizers
        self.save_videos = save_videos
        self.save_images = save_images
        self.save_folder = Path(save_folder)
        self.fps = fps
        self.num_workers = num_workers
        self.parallel_backend = parallel_backend
        self.process_n_videos = process_n_videos
        self.video_fmt = video_fmt
        self._videos_done = 0

    def on_video_loop_end(self, engine, video_metadata, video_idx,
                          detections, image_pred):
        if self.process_n_videos >= 0 and \
                self._videos_done >= self.process_n_videos:
            return
        self._videos_done += 1
        if image_pred is None or len(image_pred) == 0:
            return
        gt = getattr(engine.tracker_state, "detections_gt", None)
        video_gt = gt[gt.video_id == video_idx] \
            if gt is not None and len(gt) else None
        name = video_metadata.get("name", str(video_idx))
        self.save_folder.mkdir(parents=True, exist_ok=True)

        for v in self.visualizers:
            if hasattr(v, "reset"):
                v.reset()

        def render(args):
            image_id, metadata = args
            try:
                image = cv2_load_image(metadata["file_path"])
            except Exception as e:  # missing frames shouldn't kill runs
                log.warning("visualization: cannot load %s (%s)",
                            metadata.get("file_path"), e)
                return None
            frame_pred = (detections[detections["image_id"] == image_id]
                          if detections is not None and len(detections)
                          else pd.DataFrame())
            frame_gt = (video_gt[video_gt["image_id"] == image_id]
                        if video_gt is not None else None)
            image = np.ascontiguousarray(image)
            for v in self.visualizers:
                try:
                    v.draw_frame(image, frame_pred, frame_gt, metadata)
                except Exception as e:
                    log.warning("visualizer %s failed on frame %s: %s",
                                type(v).__name__, image_id, e)
            return image

        items = list(image_pred.iterrows())
        # trail visualizers are stateful across frames: render serially
        # when any stateful visualizer is configured
        stateful = any(hasattr(v, "reset") for v in self.visualizers)
        if stateful or self.num_workers <= 1:
            frames = [render(it) for it in items]
        elif self.parallel_backend == "process":
            # chunked module-level worker: detections pre-sliced so each
            # worker pickles only its own frames' rows
            def pack(args):
                image_id, metadata = args
                frame_pred = (
                    detections[detections["image_id"] == image_id]
                    if detections is not None and len(detections)
                    else pd.DataFrame())
                frame_gt = (video_gt[video_gt["image_id"] == image_id]
                            if video_gt is not None else None)
                return (metadata["file_path"], frame_pred, frame_gt,
                        dict(metadata))

            n = max(1, (len(items) + self.num_workers - 1)
                    // self.num_workers)
            chunks = [(self.visualizers,
                       [pack(it) for it in items[i:i + n]])
                      for i in range(0, len(items), n)]
            rendered = parallel_map(_render_chunk, chunks,
                                    self.num_workers, "process")
            frames = [f for chunk in rendered for f in chunk]
        else:
            frames = parallel_map(render, items, self.num_workers,
                                  "thread")

        frames = [f for f in frames if f is not None]
        if not frames:
            return
        import cv2
        if self.save_videos:
            h, w = frames[0].shape[:2]
            path = str(self.save_folder / f"{name}.mp4")
            writer = cv2.VideoWriter(
                path, cv2.VideoWriter_fourcc(*self.video_fmt),
                self.fps, (w, h))
            for f in frames:
                writer.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
            writer.release()
            log.info("Saved visualization video %s", path)
        if self.save_images:
            img_dir = self.save_folder / name
            img_dir.mkdir(parents=True, exist_ok=True)
            for i, f in enumerate(frames):
                cv2.imwrite(str(img_dir / f"{i:06d}.jpg"),
                            cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
