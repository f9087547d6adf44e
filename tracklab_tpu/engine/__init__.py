from tracklab_tpu.engine.engine import TrackingEngine, merge_dataframes  # noqa
from tracklab_tpu.engine.offline import OfflineTrackingEngine  # noqa
