"""Reference-parity config presets compose and instantiate.

The reference ships per-visualizer visualization configs
(configs/visualization/{bbox,ellipse,keypoints,tracking,debug,stats,
none}.yaml), dataset presets incl. bee24/soccernet_mot, the posetrack18
evaluator preset, and tracklet_agg/majority_vote; these pins keep the
same config surface working here (config/compose.py instantiates
``_target_`` nodes recursively through container kwargs, mirroring
hydra.utils.instantiate).
"""
from pathlib import Path

import pytest

import tracklab_tpu
from tracklab_tpu.config.compose import compose, instantiate

CONFIG_DIR = Path(tracklab_tpu.__file__).parent / "configs"

VIZ_PRESETS = {
    "bbox": "DefaultDetectionVisualizer",
    "ellipse": "EllipseDetectionVisualizer",
    "keypoints": "KeypointsVisualizer",
    "tracking": "TrackingLineVisualizer",
    "debug": "DebugDetectionVisualizer",
    "stats": "DetectionStatsVisualizer",
}


@pytest.mark.parametrize("preset", sorted(VIZ_PRESETS))
def test_visualization_preset(preset):
    cfg = compose(CONFIG_DIR, "config", [f"visualization={preset}"])
    viz = instantiate(cfg["visualization"])
    names = [type(v).__name__ for v in viz.visualizers]
    assert VIZ_PRESETS[preset] in names
    assert "FrameCounterVisualizer" in names


def test_visualization_none():
    cfg = compose(CONFIG_DIR, "config", ["visualization=none"])
    viz = instantiate(cfg["visualization"])
    assert viz.visualizers == [] and not viz.save_videos


@pytest.mark.parametrize("override,cls", [
    ("dataset=bee24", None),
    ("dataset=soccernet_mot", None),
    ("eval=posetrack18", None),
    ("modules/reid=bpbreid", "KPReId"),
])
def test_presets_compose(override, cls):
    cfg = compose(CONFIG_DIR, "config", [override])
    if cls:
        group, name = override.split("=")[0].split("/")
        obj = instantiate(cfg[group][name])
        assert type(obj).__name__ == cls


def test_majority_vote_preset():
    cfg = compose(CONFIG_DIR, "config",
                  ["+modules/tracklet_agg=majority_vote"])
    mod = instantiate(cfg["modules"]["tracklet_agg"])
    assert type(mod).__name__ == "MajorityVoteTracklet"
    assert "jersey_number" in mod.attributes
