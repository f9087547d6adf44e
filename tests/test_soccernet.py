"""SoccerNet GS dataset, pitch projection, GS-HOTA tests."""
import json
import numpy as np
import pandas as pd
import pytest

from tracklab_tpu.eval.gs_metrics import (
    gs_similarity, make_gs_sequence_data,
)
from tracklab_tpu.eval.metrics import evaluate_sequence


def make_gs_video(tmp_path, n_frames=4):
    vdir = tmp_path / "valid" / "SNGS-001"
    (vdir / "img1").mkdir(parents=True)
    images, anns = [], []
    for f in range(n_frames):
        images.append({"image_id": f"100{f}",
                       "file_name": f"{f + 1:06d}.jpg",
                       "width": 1920, "height": 1080,
                       "is_labeled": True})
        for k in range(2):
            anns.append({
                "id": f"a{f}{k}", "image_id": f"100{f}",
                "track_id": k + 1, "supercategory": "object",
                "category_id": 1,
                "bbox_image": {"x": 100 + 50 * k + 5 * f, "y": 300,
                               "w": 40, "h": 100},
                "bbox_pitch": {"x_bottom_middle": -20.0 + 10 * k + f,
                               "y_bottom_middle": 5.0},
                "attributes": {"role": "player",
                               "team": "left" if k == 0 else "right",
                               "jersey": str(10 + k)},
            })
    with open(vdir / "Labels-GameState.json", "w") as fp:
        json.dump({"images": images, "annotations": anns}, fp)
    return tmp_path


class TestGSDataset:
    def test_load_and_export(self, tmp_path):
        from tracklab_tpu.wrappers.dataset.soccernet import (
            SoccerNetGameState,
        )
        make_gs_video(tmp_path)
        ds = SoccerNetGameState(str(tmp_path))
        ts = ds.sets["valid"]
        assert len(ts.video_metadatas) == 1
        assert len(ts.image_metadatas) == 4
        assert len(ts.detections_gt) == 8
        det = ts.detections_gt.iloc[0]
        assert det["role"] == "player"
        assert det["team"] == "left"
        # GSR export round-trip
        out = tmp_path / "eval" / "pred"
        dets = ts.detections_gt.copy()
        SoccerNetGameState.save_for_eval(
            dets, ts.image_metadatas, ts.video_metadatas, str(out))
        with open(out / "SNGS-001.json") as fp:
            exported = json.load(fp)
        assert len(exported["predictions"]) == 8
        assert exported["predictions"][0]["attributes"]["team"] == "left"


class TestGSHota:
    def _frames(self, flip_team=False, shift=0.0):
        frames = {}
        for f in range(1, 11):
            ids = np.array([1, 2])
            pos = np.array([[0.0 + f * 0.5 + shift, 0.0],
                            [20.0 - f * 0.5, 5.0]])
            attrs = [{"role": "player", "team": "left", "jersey": "10"},
                     {"role": "player",
                      "team": "left" if flip_team else "right",
                      "jersey": "7"}]
            frames[f] = (ids, pos, attrs)
        return frames

    def test_perfect_is_100(self):
        gt = self._frames()
        res = evaluate_sequence(make_gs_sequence_data(gt, gt))
        assert res["HOTA"] > 99.9

    def test_wrong_team_kills_similarity(self):
        gt = self._frames()
        pred = self._frames(flip_team=True)
        res = evaluate_sequence(make_gs_sequence_data(gt, pred))
        # one of two objects has mismatched team attribute -> ~half DetA
        assert res["DetA"] < 60
        res2 = evaluate_sequence(make_gs_sequence_data(
            gt, pred, use_teams=False))
        assert res2["HOTA"] > 99.9

    def test_distance_tolerance(self):
        gt = self._frames()
        near = self._frames(shift=1.0)     # 1m error, tol 5m
        far = self._frames(shift=30.0)     # 30m error
        res_near = evaluate_sequence(make_gs_sequence_data(gt, near))
        res_far = evaluate_sequence(make_gs_sequence_data(gt, far))
        assert res_near["HOTA"] > 80
        # the 30m-displaced object never matches: HOTA = sqrt(1/3) ~ 57.7
        assert res_far["HOTA"] < res_near["HOTA"] - 20
        assert res_far["HOTA"] == pytest.approx(57.735, abs=0.1)


class TestPitchProjection:
    def test_projection_roundtrip(self):
        import jax.numpy as jnp
        from tracklab_tpu.calibration.camera import (
            CameraParams, project_points,
        )
        from tracklab_tpu.wrappers.calibration_api import PitchProjection

        cam_params = {
            "pan_degrees": 3.0, "tilt_degrees": 70.0,
            "roll_degrees": 0.0, "x_focal_length": 2800.0,
            "position_meters": [0.0, 48.0, 14.0],
            "principal_point": [960, 540],
        }
        module = PitchProjection()
        cam = module._camera_from_params(cam_params, 1920, 1080)
        # a player standing at pitch point (5, -3)
        world = jnp.asarray([[5.0, -3.0, 0.0]])
        px, front = project_points(cam, world)
        assert bool(front[0])
        x, y = float(px[0, 0]), float(px[0, 1])
        dets = pd.DataFrame({
            "image_id": [0],
            "bbox_ltwh": [np.array([x - 20, y - 100, 40, 100],
                                   np.float32)],
        }, index=[0])
        metas = pd.DataFrame({"parameters": [cam_params]}, index=[0])
        out = module.process(dets, metas)
        bp = out.loc[0, "bbox_pitch"]
        assert abs(bp["x_bottom_middle"] - 5.0) < 0.2
        assert abs(bp["y_bottom_middle"] - (-3.0)) < 0.2


def test_download_hook_gated_import(tmp_path):
    """The SDK download hook (reference soccernet_game_state.py:392-403)
    is present and import-gated: without the SoccerNet SDK it raises a
    clear dependency error, and the dataset ctor only invokes it when
    download=True finds no split directories."""
    import pytest as _pytest
    from tracklab_tpu.wrappers.dataset.soccernet import (
        SoccerNetGameState, download_dataset,
    )
    with _pytest.raises(ImportError, match="SoccerNet"):
        download_dataset(tmp_path)
    with _pytest.raises(ImportError, match="SoccerNet"):
        SoccerNetGameState(str(tmp_path / "nodata"), download=True)
    # with data present, download=True must NOT attempt the SDK
    make_gs_video(tmp_path)
    ds = SoccerNetGameState(str(tmp_path), download=True)
    assert "valid" in ds.sets
