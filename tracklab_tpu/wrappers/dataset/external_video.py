"""Track any mp4 / image folder / webcam as a pseudo dataset.

Rebuild of tracklab/wrappers/dataset/external_video.py:43-128: builds a
TrackingSet whose image rows reference ``vid://file:frame`` virtual paths
(decoded on demand through utils.cv2.cv2_load_image's cached VideoReader)
so the offline engine can run on raw videos without extraction.
"""
from __future__ import annotations

import logging
from pathlib import Path

import pandas as pd

from tracklab_tpu.datastruct.tracking_dataset import (
    TrackingDataset, TrackingSet,
)

log = logging.getLogger(__name__)

__all__ = ["ExternalVideo"]

VIDEO_EXTS = {".mp4", ".avi", ".mov", ".mkv", ".webm"}
IMAGE_EXTS = {".jpg", ".jpeg", ".png", ".bmp"}


def _download_video(url: str, download_dir: str | None = None) -> str:
    """Fetch a video URL (YouTube etc.) via yt-dlp and return the local
    file path (reference external_video.py:56-60). yt-dlp is an optional
    dependency — a clear error names it when absent."""
    try:
        import yt_dlp
    except ImportError as e:
        raise ImportError(
            "ExternalVideo got a URL but yt-dlp is not installed; "
            "pip install yt-dlp or pass a local file path") from e
    yt_params = {"noplaylist": True, "restrictfilenames": True}
    if download_dir:
        yt_params["paths"] = {"home": str(download_dir)}
    with yt_dlp.YoutubeDL(yt_params) as ydl:
        info_dict = ydl.extract_info(url)
        return ydl.prepare_filename(info_dict)


class ExternalVideo(TrackingDataset):
    def __init__(self, video_path: str, nvid: int = -1, nframes: int = -1,
                 download_dir: str | None = None, **kwargs):
        import cv2
        if str(video_path).startswith(("http://", "https://")):
            video_path = _download_video(str(video_path), download_dir)
        path = Path(video_path)
        videos = []
        if path.is_dir():
            entries = sorted(path.iterdir())
            vids = [p for p in entries if p.suffix.lower() in VIDEO_EXTS]
            imgs = [p for p in entries if p.suffix.lower() in IMAGE_EXTS]
            if vids:
                videos = vids
            elif imgs:
                videos = [path]  # one pseudo-video of frames
        elif path.suffix.lower() in VIDEO_EXTS and path.exists():
            videos = [path]
        if not videos:
            raise FileNotFoundError(f"No video(s) at {video_path}")

        video_rows, image_rows = [], []
        image_id = 0
        for vid_id, vp in enumerate(videos):
            if vp.is_dir():
                frames = sorted(p for p in vp.iterdir()
                                if p.suffix.lower() in IMAGE_EXTS)
                n = len(frames)
                fps, w, h = 30.0, 0, 0
                paths = [str(p) for p in frames]
            else:
                cap = cv2.VideoCapture(str(vp))
                n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
                fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
                w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
                h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
                cap.release()
                paths = [f"vid://{vp}:{f}" for f in range(n)]
            video_rows.append(dict(
                id=vid_id, name=vp.stem, nframes=n, frame_rate=fps,
                seqlength=n, im_width=w, im_height=h,
                file_path=str(vp)))
            for f, fp in enumerate(paths):
                image_rows.append(dict(
                    id=image_id, video_id=vid_id, frame=f + 1,
                    file_path=fp, is_labeled=False))
                image_id += 1

        video_df = pd.DataFrame(video_rows).set_index("id")
        image_df = pd.DataFrame(image_rows).set_index("id")
        det_df = pd.DataFrame(
            columns=["image_id", "video_id", "frame", "track_id",
                     "bbox_ltwh", "bbox_conf",
                     "category_id"]).rename_axis("id")
        ts = TrackingSet(video_df, image_df, det_df)
        super().__init__(str(path), {"val": ts}, nvid=nvid,
                         nframes=nframes, **kwargs)
