"""Host-side utilities: coordinates, pandas accessors, collate, logging.

Importing this module registers the ``df.bbox`` / ``df.keypoints`` pandas
extension accessors, mirroring the reference tracklab/utils/__init__.py:5-130.
"""
from tracklab_tpu.utils import coordinates  # noqa: F401
from tracklab_tpu.utils.accessors import (  # noqa: F401
    BBoxDataFrameAccessor, BBoxSeriesAccessor,
    KeypointsDataFrameAccessor, KeypointsSeriesAccessor,
)
