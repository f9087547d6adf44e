"""XLA trace capture behind one flag — the TPU-native upgrade of the
reference's wall-clock-only Timer (SURVEY §5-tracing): jax.profiler gives
per-op device traces for free."""
from __future__ import annotations

import logging

from tracklab_tpu.callbacks.callback import Callback

log = logging.getLogger(__name__)

__all__ = ["JaxProfiler"]


class JaxProfiler(Callback):
    def __init__(self, trace_dir: str = "jax_trace", enabled: bool = False,
                 **kwargs):
        self.trace_dir = trace_dir
        self.enabled = enabled

    def on_dataset_track_start(self, engine):
        if self.enabled:
            import jax
            jax.profiler.start_trace(self.trace_dir)
            log.info("JAX profiler trace -> %s", self.trace_dir)

    def on_dataset_track_end(self, engine):
        if self.enabled:
            import jax
            jax.profiler.stop_trace()
