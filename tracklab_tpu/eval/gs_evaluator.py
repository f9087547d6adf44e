"""Game-state evaluator: GS-HOTA over pitch positions + attributes.

Counterpart of the reference's TrackEvalEvaluator-with-SoccerNetGS
configuration (configs/eval/trackeval.yaml + sn-trackeval GS dataset;
results renamed per soccernet_game_state.py:42-51).
"""
from __future__ import annotations

import logging
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pandas as pd

from tracklab_tpu.eval.gs_metrics import make_gs_sequence_data
from tracklab_tpu.eval.metrics import combine_sequences, evaluate_sequence
from tracklab_tpu.pipeline.levels import Evaluator

log = logging.getLogger(__name__)

__all__ = ["GameStateEvaluator"]


def _gs_frames(dets: pd.DataFrame, images: pd.DataFrame, id_col: str):
    out = {}
    if len(dets) == 0 or "bbox_pitch" not in dets.columns:
        return out
    merged = dets.merge(images[["frame"]], left_on="image_id",
                        right_index=True, suffixes=("", "_img"))
    frame_col = "frame_img" if "frame_img" in merged else "frame"
    merged = merged.dropna(subset=[id_col, "bbox_pitch"])
    for frame, g in merged.groupby(frame_col):
        ids = g[id_col].to_numpy(float).astype(int)
        pos = np.array([
            [bp.get("x_bottom_middle", 0), bp.get("y_bottom_middle", 0)]
            for bp in g["bbox_pitch"]])
        attrs = [{
            "role": r.get("role"),
            "team": r.get("team"),
            "jersey": r.get("jersey_number", r.get("jersey")),
        } for _, r in g.iterrows()]
        out[int(frame)] = (ids, pos, attrs)
    return out


class GameStateEvaluator(Evaluator):
    def __init__(self, cfg=None, eval_set: str = "valid",
                 dist_tol: float = 5.0, use_roles: bool = True,
                 use_teams: bool = True, use_jerseys: bool = True,
                 num_parallel: int = 4,
                 pred_track_column: str = "track_id", **kwargs):
        super().__init__(cfg)
        self.eval_set = eval_set
        self.dist_tol = dist_tol
        self.use_roles = use_roles
        self.use_teams = use_teams
        self.use_jerseys = use_jerseys
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
            gtf = _gs_frames(gt[gt.video_id == video_id]
                             if len(gt) else gt, vimgs, "track_id")
            prf = _gs_frames(pred[pred.video_id == video_id], vimgs,
                             self.pred_track_column)
            data = make_gs_sequence_data(
                gtf, prf, self.dist_tol, self.use_roles,
                self.use_teams, self.use_jerseys)
            return evaluate_sequence(data)

        per_seq = {}
        with ThreadPoolExecutor(max(self.num_parallel, 1)) as pool:
            futures = {vid: pool.submit(eval_video, vid)
                       for vid in videos.index}
            for vid, fut in futures.items():
                name = videos.loc[vid, "name"] if "name" in videos \
                    else vid
                per_seq[str(name)] = fut.result()
        combined = combine_sequences(per_seq)
        combined["GS-HOTA"] = combined["HOTA"]
        combined["GS-DetA"] = combined["DetA"]
        combined["GS-AssA"] = combined["AssA"]
        log.info("GS-HOTA = %.3f%% (tol=%sm, roles=%s teams=%s "
                 "jerseys=%s)", combined["GS-HOTA"], self.dist_tol,
                 self.use_roles, self.use_teams, self.use_jerseys)
        return {"COMBINED_SEQ": combined, "per_seq": per_seq}
