from tracklab_tpu.engine.engine import TrackingEngine, merge_dataframes  # noqa
from tracklab_tpu.engine.offline import OfflineTrackingEngine  # noqa
from tracklab_tpu.engine.video import VideoOnlineTrackingEngine  # noqa
from tracklab_tpu.engine.batched import BatchedOfflineTrackingEngine  # noqa
from tracklab_tpu.engine.pipelined import PipelinedTrackingEngine  # noqa
