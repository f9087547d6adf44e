"""Pipelined engine.

The reference ships only an empty stub here (tracklab/engine/
pipelined.py:6-15). In this framework the pipelining the stub was meant
to add already exists structurally:

  * host decode + module preprocessing overlap device compute through the
    one-batch-lookahead thread-pool loader (datastruct/datapipe.py), and
  * whole-video device stages are single XLA programs (no per-frame host
    round-trip left to overlap), and
  * the batched engine (engine/batched.py) overlaps videos across devices.

This class exists for config compatibility and currently behaves as the
offline engine; deeper cross-module software pipelining (module k+1's
host pass while module k's device pass runs) is a planned extension.
"""
from __future__ import annotations

from tracklab_tpu.engine.offline import OfflineTrackingEngine

__all__ = ["PipelinedTrackingEngine"]


class PipelinedTrackingEngine(OfflineTrackingEngine):
    pass
