"""Tracking dataset data model.

API-compatible rebuild of tracklab/datastruct/tracking_dataset.py:26-253:
a ``TrackingSet`` is four DataFrames (video_metadatas, image_metadatas,
detections_gt, image_gt); a ``TrackingDataset`` maps split name -> set, with
nvid/nframes/vids_dict subsampling and MOT-format export for evaluation.
"""
from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional

import numpy as np
import pandas as pd

log = logging.getLogger(__name__)

__all__ = ["TrackingSet", "TrackingDataset", "SetsDict"]


class TrackingSet:
    def __init__(self, video_metadatas: pd.DataFrame,
                 image_metadatas: pd.DataFrame,
                 detections_gt: pd.DataFrame,
                 image_gt: Optional[pd.DataFrame] = None):
        self.video_metadatas = video_metadatas
        self.image_metadatas = image_metadatas
        self.detections_gt = detections_gt
        self.image_gt = image_gt if image_gt is not None else \
            image_metadatas.copy()

    def filter_videos(self, video_ids) -> "TrackingSet":
        """Restrict the set (in place) to the given video ids
        (tracking_dataset.py:89-91 filter_videos used by set splitting)."""
        video_ids = list(video_ids)
        self.video_metadatas = self.video_metadatas[
            self.video_metadatas.index.isin(video_ids)]
        self.image_metadatas = self.image_metadatas[
            self.image_metadatas["video_id"].isin(video_ids)]
        if len(self.detections_gt):
            self.detections_gt = self.detections_gt[
                self.detections_gt["video_id"].isin(video_ids)]
        if self.image_gt is not None and len(self.image_gt):
            self.image_gt = self.image_gt[
                self.image_gt.index.isin(self.image_metadatas.index)]
        return self


class SetsDict(dict):
    def __getitem__(self, key):
        if key not in self:
            raise KeyError(
                f"Split '{key}' not found in dataset. "
                f"Available splits: {list(self.keys())}")
        return super().__getitem__(key)


class TrackingDataset:
    def __init__(self, dataset_path: str, sets: dict,
                 nvid: int = -1, nframes: int = -1,
                 vids_dict: Optional[dict] = None,
                 set_split_idxs: Optional[dict] = None, *args, **kwargs):
        self.dataset_path = Path(dataset_path)
        self.sets = SetsDict(sets)
        vids_dict = vids_dict or {}
        for split, s in self.sets.items():
            self.sets[split] = self._subsample(
                s, nvid, nframes, vids_dict.get(split))
        # person-disjoint split selection (tracking_dataset.py:64-91):
        # {"train": 0} replaces the train set by half 0 of its 2-way
        # person-disjoint split (e.g. ReID train vs. held-out identities)
        self.set_splits: dict = {}
        self.set_split_idxs = set_split_idxs or {}
        for set_name, split_idx in self.set_split_idxs.items():
            self.set_splits[set_name] = self.split_set(set_name)
            self.sets[set_name] = self.set_splits[set_name][split_idx]

    def split_set(self, set_name: str, num_splits: int = 2,
                  person_column: str = "person_id"):
        """Partition a split's videos into ``num_splits`` person-disjoint
        groups (tracking_dataset.py:71-91 _split_set): videos that share
        any identity land in the same group; otherwise videos go to the
        smallest group (greedy balance, largest-identity-count first).
        Falls back to ``track_id`` when no person_id column exists."""
        import copy as _copy
        src = self.sets[set_name]
        gt = src.detections_gt
        if person_column not in gt.columns:
            person_column = "track_id"
        order = (gt.groupby("video_id")[person_column].nunique()
                 .sort_values(ascending=False).index)
        groups = [[] for _ in range(num_splits)]
        people = [set() for _ in range(num_splits)]
        for video_id in order:
            vid_people = set(gt.loc[gt.video_id == video_id,
                                    person_column].dropna())
            for g in range(num_splits):
                if people[g] & vid_people:
                    target = g
                    break
            else:
                target = int(np.argmin([len(g) for g in groups]))
            groups[target].append(video_id)
            people[target].update(vid_people)
        return [_copy.deepcopy(src).filter_videos(vids)
                for vids in groups]

    def _subsample(self, tracking_set: Optional[TrackingSet], nvid, nframes,
                   vids_names):
        """nvid/nframes truncation + explicit video-name selection
        (tracking_dataset.py:93-158)."""
        if tracking_set is None:
            return None
        if nvid < 1 and nframes < 1 and (vids_names is None
                                         or len(vids_names) == 0):
            return tracking_set

        videos = tracking_set.video_metadatas
        if vids_names is not None and len(vids_names) > 0:
            assert set(vids_names).issubset(set(videos["name"])), \
                f"Unknown videos {set(vids_names) - set(videos['name'])}"
            videos = videos[videos["name"].isin(vids_names)]
        elif nvid >= 1:
            videos = videos.head(nvid)

        images = tracking_set.image_metadatas
        images = images[images["video_id"].isin(videos.index)]
        if nframes >= 1:
            images = images.groupby("video_id", group_keys=False).apply(
                lambda g: g.head(nframes))

        dets = tracking_set.detections_gt
        if len(dets):
            dets = dets[dets["image_id"].isin(images.index)]
        image_gt = tracking_set.image_gt
        if image_gt is not None and len(image_gt):
            image_gt = image_gt[image_gt.index.isin(images.index)]
        return TrackingSet(videos, images, dets, image_gt)

    # ------------------------------------------------------------------
    # MOT-format evaluation export (tracking_dataset.py:161-241)
    # ------------------------------------------------------------------
    @staticmethod
    def _mot_encoding(detections: pd.DataFrame,
                      image_metadatas: pd.DataFrame,
                      bbox_column: str) -> pd.DataFrame:
        detections = detections.copy()
        image_metadatas = image_metadatas.copy()
        image_metadatas["id"] = image_metadatas.index
        df = pd.merge(
            image_metadatas.reset_index(drop=True),
            detections.reset_index(drop=True),
            left_on="id", right_on="image_id",
            suffixes=("", "_det"),
        )
        len_before = len(df)
        df.dropna(subset=["frame", "track_id", bbox_column], how="any",
                  inplace=True)
        if len(df) != len_before:
            log.warning(
                "Dropped %d detections without frame/track_id/bbox "
                "during MOT encoding", len_before - len(df))
        df["bb_left"] = df[bbox_column].apply(lambda x: x[0])
        df["bb_top"] = df[bbox_column].apply(lambda x: x[1])
        df["bb_width"] = df[bbox_column].apply(lambda x: x[2])
        df["bb_height"] = df[bbox_column].apply(lambda x: x[3])
        if "bbox_conf" not in df:
            df["bbox_conf"] = 1.0
        df = df.assign(x=-1, y=-1, z=-1)
        return df

    @classmethod
    def save_for_eval(cls, detections: pd.DataFrame,
                      image_metadatas: pd.DataFrame,
                      video_metadatas: pd.DataFrame,
                      save_folder: str,
                      bbox_column_for_eval: str = "bbox_ltwh",
                      save_classes: bool = False,
                      is_ground_truth: bool = False,
                      save_zip: bool = False):
        """Write MOTChallenge-format txt per video (one row per detection:
        frame,id,bb_left,bb_top,bb_width,bb_height,conf,x,y,z)."""
        save_path = Path(save_folder)
        save_path.mkdir(parents=True, exist_ok=True)
        # seqmaps file for external TrackEval compatibility
        seqmap = ["name"] + [str(v["name"])
                             for _, v in video_metadatas.iterrows()]
        (save_path.parent / "seqmaps.txt").write_text(
            "\n".join(seqmap) + "\n")
        if detections.empty:
            for _, video in video_metadatas.iterrows():
                (save_path / f"{video['name']}.txt").write_text("")
            return
        mot_df = cls._mot_encoding(detections, image_metadatas,
                                   bbox_column_for_eval)
        for video_id, video in video_metadatas.iterrows():
            vdf = mot_df[mot_df["video_id"] == video_id]
            cols = ["frame", "track_id", "bb_left", "bb_top", "bb_width",
                    "bb_height", "bbox_conf", "x", "y", "z"]
            if save_classes:
                cols = ["frame", "track_id", "bb_left", "bb_top",
                        "bb_width", "bb_height", "bbox_conf",
                        "category_id", "x", "y"]
            out = vdf[cols].copy()
            out["frame"] = out["frame"].astype(int)
            out["track_id"] = out["track_id"].astype(int)
            out.to_csv(save_path / f"{video['name']}.txt",
                       header=False, index=False)
        if save_zip:
            import zipfile
            zf_path = save_path.parent / f"{save_path.name}.zip"
            with zipfile.ZipFile(zf_path, "w",
                                 zipfile.ZIP_DEFLATED) as zf:
                for txt in sorted(save_path.glob("*.txt")):
                    zf.write(txt, arcname=txt.name)

    def process_trackeval_results(self, results, dataset_config,
                                  eval_config):
        """Hook for dataset-specific result post-processing/logging."""
        return results
