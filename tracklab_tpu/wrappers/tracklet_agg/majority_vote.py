"""Tracklet-level attribute aggregation by confidence-weighted vote.

Rebuild of tracklab/wrappers/tracklet_agg/majority_vote_api.py:24-51 +
utils/attribute_voting.py:2-17: per track, each ``{attr}_detection``
column (with optional ``{attr}_confidence`` weights) collapses to the
highest-total-confidence value, broadcast back onto every detection of the
tracklet as ``{attr}`` (used for jersey numbers, team, role in the
game-state pipeline).
"""
from __future__ import annotations

import numpy as np
import pandas as pd

from tracklab_tpu.pipeline.levels import VideoLevelModule

__all__ = ["MajorityVoteTracklet", "select_highest_voted_att"]


def select_highest_voted_att(atts, atts_confidences=None):
    confidence_sum = {}
    if atts_confidences is None:
        atts_confidences = [1] * len(atts)
    for value, conf in zip(atts, atts_confidences):
        if value is None or (isinstance(value, float) and np.isnan(value)):
            continue
        confidence_sum[value] = confidence_sum.get(value, 0) + conf
    if not confidence_sum:
        return None
    return max(confidence_sum, key=confidence_sum.get)


class MajorityVoteTracklet(VideoLevelModule):
    input_columns: list = []
    output_columns: list = []

    def __init__(self, attributes, device=None, tracking_dataset=None,
                 **kwargs):
        self.attributes = list(attributes)
        self.input_columns = ["track_id"]
        self.output_columns = []
        for attribute in self.attributes:
            self.input_columns.append(f"{attribute}_detection")
            self.output_columns.append(attribute)

    def process(self, detections: pd.DataFrame,
                metadatas: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(index=detections.index)
        for attribute in self.attributes:
            out[attribute] = np.nan
            out[attribute] = out[attribute].astype(object)
        if "track_id" not in detections.columns:
            return out
        for track_id in detections.track_id.dropna().unique():
            tracklet = detections[detections.track_id == track_id]
            for attribute in self.attributes:
                values = tracklet[f"{attribute}_detection"]
                conf_col = f"{attribute}_confidence"
                confs = tracklet[conf_col] \
                    if conf_col in tracklet.columns else None
                winner = select_highest_voted_att(
                    list(values),
                    None if confs is None else list(confs))
                out.loc[tracklet.index, attribute] = winner
        return out
