"""Pandas extension accessors for detection DataFrames.

API-compatible with the reference (tracklab/utils/__init__.py:5-130):
``df.bbox.ltwh()/.ltrb()/.xywh()/.conf()`` and
``df.keypoints.xyc()/.xy()/.conf()`` on both DataFrames (column of
array-valued cells) and single Series rows.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

from tracklab_tpu.utils import coordinates as C


def _stack(series):
    return np.stack(series.to_numpy()) if len(series) else \
        np.zeros((0, 4))


@pd.api.extensions.register_dataframe_accessor("bbox")
class BBoxDataFrameAccessor:
    def __init__(self, df: pd.DataFrame):
        self._df = df

    def ltwh(self, image_shape=None, rounded=False):
        return self._df["bbox_ltwh"].apply(
            lambda x: C.sanitize_bbox_ltwh(x, image_shape, rounded))

    def ltrb(self, image_shape=None, rounded=False):
        return self._df["bbox_ltwh"].apply(
            lambda x: C.sanitize_bbox_ltrb(
                C.ltwh_to_ltrb(x), image_shape, rounded))

    def xywh(self, image_shape=None, rounded=False):
        return self._df["bbox_ltwh"].apply(
            lambda x: C.sanitize_bbox_ltwh(
                C.ltwh_to_xywh(x), image_shape, rounded))

    def conf(self):
        return self._df["bbox_conf"]


@pd.api.extensions.register_series_accessor("bbox")
class BBoxSeriesAccessor:
    def __init__(self, s: pd.Series):
        self._s = s

    def ltwh(self, image_shape=None, rounded=False):
        return C.sanitize_bbox_ltwh(self._s["bbox_ltwh"], image_shape,
                                    rounded)

    def ltrb(self, image_shape=None, rounded=False):
        return C.sanitize_bbox_ltrb(
            C.ltwh_to_ltrb(self._s["bbox_ltwh"]), image_shape, rounded)

    def xywh(self, image_shape=None, rounded=False):
        return C.sanitize_bbox_ltwh(
            C.ltwh_to_xywh(self._s["bbox_ltwh"]), image_shape, rounded)

    def conf(self):
        return self._s["bbox_conf"]


@pd.api.extensions.register_dataframe_accessor("keypoints")
class KeypointsDataFrameAccessor:
    def __init__(self, df: pd.DataFrame):
        self._df = df

    def xyc(self, image_shape=None, rounded=False):
        return self._df["keypoints_xyc"].apply(
            lambda x: C.sanitize_keypoints(x, image_shape, rounded))

    def xy(self, image_shape=None, rounded=False):
        return self._df["keypoints_xyc"].apply(
            lambda x: C.sanitize_keypoints(x, image_shape, rounded)[:, :2])

    def conf(self):
        return self._df["keypoints_xyc"].apply(lambda x: x[:, 2])

    def in_bbox_coord(self, bbox_ltwh):
        return self._df["keypoints_xyc"].apply(
            lambda x: C.kp_img_to_kp_bbox(x, bbox_ltwh))


@pd.api.extensions.register_series_accessor("keypoints")
class KeypointsSeriesAccessor:
    def __init__(self, s: pd.Series):
        self._s = s

    def xyc(self, image_shape=None, rounded=False):
        return C.sanitize_keypoints(self._s["keypoints_xyc"], image_shape,
                                    rounded)

    def xy(self, image_shape=None, rounded=False):
        return C.sanitize_keypoints(
            self._s["keypoints_xyc"], image_shape, rounded)[:, :2]

    def conf(self):
        return self._s["keypoints_xyc"][:, 2]

    def in_bbox_coord(self, bbox_ltwh):
        return C.kp_img_to_kp_bbox(self._s["keypoints_xyc"], bbox_ltwh)
