"""MOTChallenge-family dataset loaders.

Rebuild of tracklab/wrappers/dataset/mot_like/common.py:20-258 and its
subclasses (mot17.py, mot20.py, dancetrack.py, sportsmot.py, bee24.py):
parse ``seqinfo.ini`` + ``gt/gt.txt`` (+ optional public ``det/det.txt``)
into TrackingSet DataFrames with globally-unique integer ids. Split loading
is parallelized with a thread pool (the reference used a 3-process Pool,
common.py:32-34 — IO-bound parsing, threads suffice and share the id
counters trivially).
"""
from __future__ import annotations

import configparser
import logging
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np
import pandas as pd

from tracklab_tpu.datastruct.tracking_dataset import (
    TrackingDataset, TrackingSet,
)

log = logging.getLogger(__name__)

__all__ = ["MOT", "MOT17", "MOT20", "DanceTrack", "SportsMOT", "Bee24"]


class MOT(TrackingDataset):
    """Generic MOT-format dataset. Subclasses set splits/categories."""

    name = "MOT"
    nickname = "mot"
    splits = ["train", "val", "test"]
    categories = [{"id": 1, "name": "pedestrian"}]
    distractor_classes: list = []

    def __init__(self, dataset_path: str, nvid: int = -1, nframes: int = -1,
                 vids_dict: dict | None = None,
                 public_dets: bool = False, **kwargs):
        self.public_dets = public_dets
        dataset_path = Path(dataset_path)
        sets = {}
        counters = {"video": 0, "image": 0, "detection": 0}
        with ThreadPoolExecutor(3) as pool:
            futures = {
                split: pool.submit(self._load_split, dataset_path, split,
                                   counters)
                for split in self.splits
                if (dataset_path / split).exists()}
            for split, fut in futures.items():
                sets[split] = fut.result()
        if not sets:
            log.warning("No splits found under %s", dataset_path)
        super().__init__(str(dataset_path), sets, nvid=nvid,
                         nframes=nframes, vids_dict=vids_dict, **kwargs)

    # ------------------------------------------------------------------
    def _load_split(self, root: Path, split: str, counters) -> TrackingSet:
        split_dir = root / split
        video_rows, image_rows, det_rows, pub_rows = [], [], [], []
        for seq_dir in sorted(p for p in split_dir.iterdir() if p.is_dir()):
            info = self._read_seqinfo(seq_dir)
            video_id = counters["video"]
            counters["video"] += 1
            nframes = int(info.get("seqlength", 0))
            img_dir = seq_dir / info.get("imdir", "img1")
            ext = info.get("imext", ".jpg")
            video_rows.append({
                "id": video_id, "name": seq_dir.name, "nframes": nframes,
                "frame_rate": float(info.get("framerate", 30)),
                "seqlength": nframes,
                "im_width": int(info.get("imwidth", 1920)),
                "im_height": int(info.get("imheight", 1080)),
            })
            frame_to_image = {}
            for frame in range(1, nframes + 1):
                image_id = counters["image"]
                counters["image"] += 1
                frame_to_image[frame] = image_id
                image_rows.append({
                    "id": image_id, "video_id": video_id, "frame": frame,
                    "file_path": str(img_dir / f"{frame:06d}{ext}"),
                    "is_labeled": True,
                })
            gt_path = seq_dir / "gt" / "gt.txt"
            if gt_path.exists():
                gt = np.loadtxt(gt_path, delimiter=",", ndmin=2)
                for row in gt:
                    frame = int(row[0])
                    if frame not in frame_to_image:
                        continue
                    det_id = counters["detection"]
                    counters["detection"] += 1
                    det_rows.append({
                        "id": det_id,
                        "image_id": frame_to_image[frame],
                        "video_id": video_id,
                        "frame": frame,
                        "track_id": int(row[1]),
                        "bbox_ltwh": np.array(row[2:6], np.float32),
                        "bbox_conf": float(row[6]) if len(row) > 6 else 1.0,
                        "category_id": int(row[7]) if len(row) > 7 else 1,
                        "visibility": float(row[8]) if len(row) > 8 else 1.0,
                    })
            if self.public_dets:
                det_path = seq_dir / "det" / "det.txt"
                if det_path.exists():
                    pub = np.loadtxt(det_path, delimiter=",", ndmin=2)
                    for row in pub:
                        frame = int(row[0])
                        if frame not in frame_to_image:
                            continue
                        det_id = counters["detection"]
                        counters["detection"] += 1
                        pub_rows.append({
                            "id": det_id,
                            "image_id": frame_to_image[frame],
                            "video_id": video_id,
                            "frame": frame,
                            "bbox_ltwh": np.array(row[2:6], np.float32),
                            "bbox_conf": float(row[6]) if len(row) > 6
                            else 1.0,
                            "category_id": 1,
                        })

        video_df = pd.DataFrame(video_rows).set_index("id") \
            if video_rows else pd.DataFrame(
                columns=["name", "nframes"]).rename_axis("id")
        image_df = pd.DataFrame(image_rows).set_index("id") \
            if image_rows else pd.DataFrame(
                columns=["video_id", "frame", "file_path"]).rename_axis("id")
        det_df = pd.DataFrame(det_rows).set_index("id") \
            if det_rows else pd.DataFrame(
                columns=["image_id", "video_id", "frame", "track_id",
                         "bbox_ltwh", "bbox_conf",
                         "category_id"]).rename_axis("id")
        ts = TrackingSet(video_df, image_df, det_df)
        if pub_rows:
            ts.detections_public = pd.DataFrame(pub_rows).set_index("id")
        return ts

    @staticmethod
    def _read_seqinfo(seq_dir: Path) -> dict:
        path = seq_dir / "seqinfo.ini"
        if not path.exists():
            return {}
        parser = configparser.ConfigParser()
        parser.read(path)
        if "Sequence" in parser:
            return {k.lower(): v for k, v in parser["Sequence"].items()}
        return {}


class MOT17(MOT):
    name = "MOT17"
    nickname = "mot17"


class MOT20(MOT):
    name = "MOT20"
    nickname = "mot20"


class DanceTrack(MOT):
    name = "DanceTrack"
    nickname = "dancetrack"
    splits = ["train", "val", "test"]
    categories = [{"id": 1, "name": "dancer"}]


class SportsMOT(MOT):
    name = "SportsMOT"
    nickname = "sportsmot"
    categories = [{"id": 1, "name": "player"}]


class Bee24(MOT):
    name = "BEE24"
    nickname = "bee24"
    categories = [{"id": 1, "name": "bee"}]
