"""CLI entry point.

Rebuild of tracklab/main.py:24-125 without the hydra dependency: compose
the YAML config tree (tracklab_tpu/configs), instantiate dataset /
evaluator / modules / engine from ``_target_`` nodes, optionally train,
track, evaluate, and save the tracker state.

Usage:
  tracklab-tpu [group=option ...] [a.b.c=value ...]
  e.g. tracklab-tpu dataset=synthetic modules/track=bytetrack
"""
from __future__ import annotations

import logging
import sys
from pathlib import Path

log = logging.getLogger(__name__)

CONFIG_DIR = Path(__file__).parent / "configs"


def init_environment(cfg):
    import jax
    # hydra-style run dir: outputs/${experiment_name}/${date}/${time}
    # (reference: configs/config.yaml:52-59 run-dir policy with chdir)
    if cfg.get("use_run_dir", False):
        import datetime
        import os
        now = datetime.datetime.now()
        run_dir = (Path(cfg.get("output_dir", "outputs"))
                   / str(cfg.get("experiment_name", "run"))
                   / now.strftime("%Y-%m-%d") / now.strftime("%H-%M-%S"))
        run_dir.mkdir(parents=True, exist_ok=True)
        os.chdir(run_dir)
        log.info("Run dir: %s", run_dir)
    level = logging.DEBUG if cfg.get("verbose") else logging.INFO
    handlers = None
    if cfg.get("use_rich", True):
        try:
            from rich.logging import RichHandler
            handlers = [RichHandler(rich_tracebacks=True)]
        except ImportError:
            pass
    logging.basicConfig(level=level, handlers=handlers,
                        format="%(name)s: %(message)s")
    device = cfg.get("device", "auto")
    if device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    log.info("Devices: %s", jax.devices())
    return jax.devices()


def build(cfg):
    """Instantiate everything the run needs; returns a dict of parts."""
    from tracklab_tpu.config import instantiate
    from tracklab_tpu.datastruct.tracker_state import TrackerState
    from tracklab_tpu.pipeline.module import Pipeline

    dataset = instantiate(cfg["dataset"])
    evaluator = instantiate(cfg["eval"]) if cfg.get("eval") else None

    modules = []
    for name in cfg.get("pipeline", []):
        if name in (None, "none", "skip"):
            continue
        node = cfg["modules"][name]
        modules.append(instantiate(node))
    pipeline = Pipeline(modules)

    tracking_set = dataset.sets[cfg.get("eval_set", "val")]
    state_cfg = dict(cfg.get("state", {}))
    tracker_state = TrackerState(tracking_set, pipeline, **state_cfg)

    callbacks = []
    for name, node in (cfg.get("callbacks") or {}).items():
        if node is None:
            continue
        callbacks.append(instantiate(node))
    # visualization engine runs as an after-save callback
    # (reference: configs/visualization group + VisualizationEngine)
    if cfg.get("visualization"):
        callbacks.append(instantiate(cfg["visualization"]))

    engine = instantiate(cfg["engine"], tracker_state=tracker_state,
                         modules=modules, callbacks=callbacks)
    return dict(dataset=dataset, evaluator=evaluator, pipeline=pipeline,
                tracker_state=tracker_state, engine=engine,
                modules=modules)


def evaluate(cfg, evaluator, tracker_state):
    if cfg.get("test_tracking", True) and len(
            tracker_state.video_metadatas):
        if evaluator is not None:
            return evaluator.run(tracker_state)
    return None


def run(cfg):
    init_environment(cfg)
    parts = build(cfg)

    if cfg.get("train_tracking", False):
        for module in parts["modules"]:
            if getattr(module, "training_enabled", False):
                module.train(parts["dataset"], parts["pipeline"],
                             parts["evaluator"], cfg.get("dataset"))

    if cfg.get("test_tracking", True):
        parts["engine"].track_dataset()
        results = evaluate(cfg, parts["evaluator"],
                           parts["tracker_state"])
        return parts, results
    return parts, None


def main(argv=None):
    from tracklab_tpu.config import compose
    overrides = list(argv if argv is not None else sys.argv[1:])
    cfg = compose(CONFIG_DIR, "config", overrides)
    return run(cfg)


def cli(argv=None) -> int:
    """Console entry point: exit nonzero on failure (unlike ``main``,
    which returns the run parts for programmatic use)."""
    try:
        main(argv)
    except Exception:
        log.exception("Run failed")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(cli())
