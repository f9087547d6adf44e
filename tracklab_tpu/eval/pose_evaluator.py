"""PoseTrack-style evaluator: pose HOTA (OKS similarity), keypoint mAP,
and box MOT metrics in one pass.

Rebuild of the capability of tracklab/wrappers/eval/posetrack/
posetrack21_evaluator.py:37-691 (pose estimation mAP via poseval, pose
HOTA variants via the vendored posetrack21 eval, MOT via
posetrack21_mot) on the native metric stack.
"""
from __future__ import annotations

import logging
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pandas as pd

from tracklab_tpu.eval.evaluator import _frames_dict
from tracklab_tpu.eval.metrics import (
    combine_sequences, evaluate_sequence, make_sequence_data,
)
from tracklab_tpu.eval.pose_metrics import (
    keypoint_map, make_pose_sequence_data,
)
from tracklab_tpu.pipeline.levels import Evaluator

log = logging.getLogger(__name__)

__all__ = ["PoseTrackEvaluator"]


def _pose_frames(dets: pd.DataFrame, images: pd.DataFrame, id_col: str):
    out_kp, out_ids, out_scores = {}, {}, {}
    if len(dets) == 0 or "keypoints_xyc" not in dets.columns:
        return out_ids, out_kp, out_scores
    merged = dets.merge(images[["frame"]], left_on="image_id",
                        right_index=True, suffixes=("", "_img"))
    frame_col = "frame_img" if "frame_img" in merged else "frame"
    merged = merged.dropna(subset=["keypoints_xyc"])
    if id_col in merged.columns:
        merged = merged.dropna(subset=[id_col])
    for frame, g in merged.groupby(frame_col):
        kps = np.stack(g["keypoints_xyc"].to_numpy())
        out_kp[int(frame)] = kps
        out_scores[int(frame)] = (
            g["bbox_conf"].to_numpy(float)
            if "bbox_conf" in g else np.ones(len(g)))
        if id_col in g.columns:
            out_ids[int(frame)] = g[id_col].to_numpy(float).astype(int)
    return out_ids, out_kp, out_scores


class PoseTrackEvaluator(Evaluator):
    def __init__(self, cfg=None, eval_set: str = "val",
                 num_parallel: int = 4,
                 pred_track_column: str = "track_id", **kwargs):
        super().__init__(cfg)
        self.eval_set = eval_set
        self.num_parallel = num_parallel
        self.pred_track_column = pred_track_column

    def run(self, tracker_state):
        images = tracker_state.image_metadatas
        videos = tracker_state.video_metadatas
        gt = tracker_state.detections_gt
        pred = tracker_state.detections_pred
        if pred is None or len(pred) == 0:
            log.warning("No predictions to evaluate")
            return {}

        def eval_video(video_id):
            vimgs = images[images.video_id == video_id]
            vgt = gt[gt.video_id == video_id] if len(gt) else gt
            vpred = pred[pred.video_id == video_id]
            out = {}
            # box tracking metrics
            gtf = _frames_dict(vgt, vimgs, "bbox_ltwh", "track_id")
            prf = _frames_dict(vpred, vimgs,
                               "track_bbox_ltwh"
                               if "track_bbox_ltwh" in vpred.columns
                               else "bbox_ltwh", self.pred_track_column)
            out["box"] = evaluate_sequence(make_sequence_data(gtf, prf))
            # pose tracking (OKS HOTA) + keypoint mAP
            g_ids, g_kp, _ = _pose_frames(vgt, vimgs, "track_id")
            p_ids, p_kp, p_sc = _pose_frames(vpred, vimgs,
                                             self.pred_track_column)
            if g_kp and p_kp:
                pose_gt = {f: (g_ids[f], g_kp[f]) for f in g_ids}
                pose_pr = {f: (p_ids[f], p_kp[f]) for f in p_ids}
                out["pose"] = evaluate_sequence(
                    make_pose_sequence_data(pose_gt, pose_pr))
                out["map"] = keypoint_map(g_kp, p_kp, p_sc)
            return out

        per_seq = {}
        with ThreadPoolExecutor(max(self.num_parallel, 1)) as pool:
            futures = {vid: pool.submit(eval_video, vid)
                       for vid in videos.index}
            for vid, fut in futures.items():
                name = videos.loc[vid, "name"] if "name" in videos \
                    else vid
                per_seq[str(name)] = fut.result()

        results = {
            "COMBINED_SEQ": combine_sequences(
                {k: v["box"] for k, v in per_seq.items()}),
            "per_seq": per_seq,
        }
        pose_seqs = {k: v["pose"] for k, v in per_seq.items()
                     if "pose" in v}
        if pose_seqs:
            results["POSE_COMBINED"] = combine_sequences(pose_seqs)
            maps = [v["map"]["kp_mAP"] for v in per_seq.values()
                    if "map" in v]
            results["kp_mAP"] = float(np.mean(maps))
            log.info("Pose HOTA %.3f | kp mAP %.3f",
                     results["POSE_COMBINED"]["HOTA"],
                     results["kp_mAP"])
        for k in ("HOTA", "MOTA", "IDF1"):
            log.info("  box %-6s %10.3f", k, results["COMBINED_SEQ"][k])
        return results


class PoseTrack21Evaluator(PoseTrackEvaluator):
    """Name-compatible alias (reference:
    wrappers/eval/posetrack/posetrack21_evaluator.py)."""


class PoseTrack18Evaluator(PoseTrackEvaluator):
    """Name-compatible alias (reference: posetrack18_evaluator.py)."""
