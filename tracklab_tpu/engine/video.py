"""Online engine: frame-by-frame tracking on raw videos / webcams.

Rebuild of tracklab/engine/video.py:20-151 VideoOnlineTrackingEngine:
cv2.VideoCapture source (file path or webcam index), fps subsampling via
``frame_modulo``, per-frame module execution. Image/detection-level modules
run per frame exactly like the reference (video.py:96-112); video-level
scan trackers run in streaming mode through their ``process_online``
step-with-carried-state interface (the reference raises on video-level
modules here, video.py:102-103 — streaming scan steps are the TPU-native
upgrade).
"""
from __future__ import annotations

import logging

import pandas as pd

from tracklab_tpu.engine.engine import TrackingEngine, merge_dataframes

log = logging.getLogger(__name__)

__all__ = ["VideoOnlineTrackingEngine"]


class VideoOnlineTrackingEngine(TrackingEngine):
    def __init__(self, *args, target_fps: int = -1, **kwargs):
        super().__init__(*args, **kwargs)
        self.target_fps = target_fps

    def video_loop(self, video_metadata: pd.Series, video_id):
        import cv2
        source = video_metadata.get("file_path",
                                    video_metadata.get("name"))
        try:
            source = int(source)  # webcam index
        except (TypeError, ValueError):
            source = str(source)
        cap = cv2.VideoCapture(source)
        if not cap.isOpened():
            raise FileNotFoundError(f"Cannot open video source {source}")
        fps = cap.get(cv2.CAP_PROP_FPS) or 30
        frame_modulo = 1
        if self.target_fps > 0 and fps > self.target_fps:
            frame_modulo = int(round(fps / self.target_fps))

        for model in self.models.values():
            if hasattr(model, "reset"):
                model.reset()

        detections = pd.DataFrame()
        image_rows = []
        det_id = 0
        frame_idx = -1
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            frame_idx += 1
            if frame_idx % frame_modulo != 0:
                continue
            image = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            image_id = f"{video_id}_{frame_idx}"
            metadata = pd.Series(dict(
                video_id=video_id, frame=frame_idx + 1,
                file_path=f"vid://{source}:{frame_idx}"
                if not isinstance(source, int) else f"cam://{source}",
            ), name=image_id)
            image_rows.append(metadata)
            self.fire("on_image_loop_start", image_metadata=metadata,
                      image_idx=image_id, index=frame_idx)

            frame_detections = pd.DataFrame()
            for name in self.module_names:
                model = self.models[name]
                if model.level == "image":
                    sample = model.preprocess(
                        image=image, detections=frame_detections,
                        metadata=metadata)
                    batch = model.collate_fn([sample])
                    outputs = model.process(
                        batch, frame_detections,
                        pd.DataFrame([metadata]))
                    frame_detections = merge_dataframes(
                        frame_detections, outputs)
                elif model.level == "detection":
                    rows = []
                    for det_idx, det in frame_detections.iterrows():
                        sample = model.preprocess(
                            image=image, detection=det,
                            metadata=metadata)
                        batch = model.collate_fn([sample])
                        out = model.process(batch,
                                            frame_detections.loc[[det_idx]],
                                            pd.DataFrame([metadata]))
                        if isinstance(out, pd.DataFrame) and len(out):
                            rows.append(out)
                        elif isinstance(out, list):
                            rows.extend(out)
                    for out in rows:
                        frame_detections = merge_dataframes(
                            frame_detections, out)
                elif hasattr(model, "process_online"):
                    outputs = model.process_online(frame_detections,
                                                   metadata)
                    frame_detections = merge_dataframes(
                        frame_detections, outputs)
                else:
                    raise ValueError(
                        f"Module {name} (level={model.level}) does not "
                        "support online tracking")
            self.fire("on_image_loop_end", image_metadata=metadata,
                      image=image, image_idx=image_id,
                      detections=frame_detections)
            if len(frame_detections):
                detections = pd.concat([detections, frame_detections])
        cap.release()
        image_pred = pd.DataFrame(image_rows)
        return detections, image_pred
