from tracklab_tpu.datastruct.tracking_dataset import (  # noqa
    TrackingDataset, TrackingSet, SetsDict,
)
from tracklab_tpu.datastruct.tracker_state import TrackerState  # noqa
from tracklab_tpu.datastruct.datapipe import (  # noqa
    EngineDatapipe, PrefetchLoader,
)
