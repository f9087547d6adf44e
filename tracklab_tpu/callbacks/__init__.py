from tracklab_tpu.callbacks.callback import Callback  # noqa
from tracklab_tpu.callbacks.progress import Progressbar  # noqa
from tracklab_tpu.callbacks.timer import Timer  # noqa
from tracklab_tpu.callbacks.profiler import JaxProfiler  # noqa
from tracklab_tpu.callbacks.handle_regions import IgnoredRegions  # noqa
