"""Mark detections falling inside dataset ignore regions
(reference: tracklab/callbacks/handle_regions.py:8-78 — rasterized
polygon-vs-bbox IoU via cv2.fillPoly).

Sets a boolean ``in_ignored_region`` column on this video's detections when
the rasterized intersection-over-detection-area exceeds ``max_intersection``.
"""
from __future__ import annotations

import logging

import numpy as np

from tracklab_tpu.callbacks.callback import Callback

log = logging.getLogger(__name__)

__all__ = ["IgnoredRegions"]


class IgnoredRegions(Callback):
    after_saved_state = False

    def __init__(self, max_intersection: float = 0.9, **kwargs):
        self.max_intersection = max_intersection

    def on_video_loop_end(self, engine, video_metadata, video_idx,
                          detections, image_pred):
        if detections is None or len(detections) == 0:
            return
        if "ignore_regions_x" not in video_metadata or \
                video_metadata.get("ignore_regions_x") is None:
            return
        import cv2
        xs = video_metadata["ignore_regions_x"]
        ys = video_metadata["ignore_regions_y"]
        w = int(video_metadata.get("im_width", 1920))
        h = int(video_metadata.get("im_height", 1080))
        mask = np.zeros((h, w), np.uint8)
        for rx, ry in zip(xs, ys):
            poly = np.stack([np.asarray(rx), np.asarray(ry)],
                            axis=1).astype(np.int32)
            cv2.fillPoly(mask, [poly], 1)
        vids = detections["video_id"] == video_metadata.name \
            if hasattr(video_metadata, "name") else slice(None)
        flags = []
        for _, det in detections.iterrows():
            l, t, bw, bh = np.asarray(det["bbox_ltwh"], float)
            x1, y1 = max(int(l), 0), max(int(t), 0)
            x2 = min(int(l + bw), w)
            y2 = min(int(t + bh), h)
            area = max(x2 - x1, 0) * max(y2 - y1, 0)
            if area == 0:
                flags.append(False)
                continue
            inter = mask[y1:y2, x1:x2].sum()
            flags.append(inter / area > self.max_intersection)
        detections["in_ignored_region"] = flags
