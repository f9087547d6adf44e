"""Notebook/REPL entry mirroring the CLI
(reference: tracklab/utils/notebook.py:27-100 load_from_overrides)."""
from __future__ import annotations

from collections import namedtuple

__all__ = ["load_from_overrides"]

TrackEngine = namedtuple(
    "TrackEngine",
    ["engine", "tracker_state", "pipeline", "dataset", "evaluator",
     "cfg"])


def load_from_overrides(overrides=None) -> TrackEngine:
    """Compose the config and instantiate the full stack without running
    it — for interactive exploration.

    >>> te = load_from_overrides(["dataset=synthetic"])
    >>> te.engine.track_dataset()
    """
    from tracklab_tpu.config import compose
    from tracklab_tpu.main import CONFIG_DIR, build, init_environment
    cfg = compose(CONFIG_DIR, "config", list(overrides or []))
    init_environment(cfg)
    parts = build(cfg)
    return TrackEngine(parts["engine"], parts["tracker_state"],
                       parts["pipeline"], parts["dataset"],
                       parts["evaluator"], cfg)
