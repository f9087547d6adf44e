"""Direct unit tests for the calibration wrapper layer
(wrappers/calibration_api.py) — the pipeline-module faces of the
calibration plugin, exercised without the full GSR pipeline.

Reference semantics: sn-gamestate's calibration + projection stages over
plugins/calibration/tvcalib (bbox bottom edge -> pitch plane;
camera "parameters" supercategory payload per image).
"""
import numpy as np
import pandas as pd
import pytest

from tracklab_tpu.utils.collate import Unbatchable
from tracklab_tpu.wrappers.calibration_api import (
    PitchLineDetector,
    PitchProjection,
    TVCalibration,
)

W, H = 1920, 1080


def _params(**kw):
    # the test_calibration.py main_center rig, in the wrapper's
    # degrees/meters payload convention
    p = {
        "pan_degrees": float(np.rad2deg(0.05)),
        "tilt_degrees": float(np.rad2deg(1.2)),
        "roll_degrees": float(np.rad2deg(0.01)),
        "x_focal_length": 2800.0,
        "position_meters": [2.0, 48.0, 14.0],
        "principal_point": [W / 2, H / 2],
    }
    p.update(kw)
    return p


class TestCameraFromParams:
    def test_reads_all_fields(self):
        cam = PitchProjection._camera_from_params(_params(), W, H)
        assert np.isclose(float(cam.pan), 0.05)
        assert np.isclose(float(cam.tilt), 1.2)
        assert float(cam.focal) == 2800.0
        assert np.allclose(np.asarray(cam.principal), [960.0, 540.0])
        assert np.allclose(np.asarray(cam.position), [2.0, 48.0, 14.0])

    def test_defaults_when_fields_absent(self):
        cam = PitchProjection._camera_from_params({}, 1280, 720)
        # principal point defaults to the image center
        assert np.allclose(np.asarray(cam.principal), [640.0, 360.0])
        assert float(cam.focal) == 2500.0
        assert np.isclose(float(cam.tilt), np.deg2rad(70.0))


class TestPitchProjection:
    def _detections(self, image_ids, boxes):
        return pd.DataFrame(
            {
                "image_id": image_ids,
                "bbox_ltwh": [np.asarray(b, np.float32) for b in boxes],
            },
            index=pd.RangeIndex(100, 100 + len(boxes)),
        )

    def test_bottom_edge_backprojection(self):
        """The emitted corners must be the plane backprojections of the
        bbox's bottom-left/right pixels, and bottom-middle the
        backprojection of their pixel midpoint — exactly the reference's
        bbox_pitch payload."""
        import jax.numpy as jnp

        from tracklab_tpu.calibration.camera import backproject_to_pitch

        mod = PitchProjection(image_width=W, image_height=H)
        cam = mod._camera_from_params(_params(), W, H)
        ltwh = [900.0, 700.0, 120.0, 260.0]
        bl = [900.0, 960.0]
        br = [1020.0, 960.0]
        bm = [960.0, 960.0]
        expect = np.asarray(backproject_to_pitch(
            cam, jnp.asarray([bl, br, bm], jnp.float32)))

        dets = self._detections(["f0"], [ltwh])
        metas = pd.DataFrame({"parameters": [_params()]}, index=["f0"])
        out = mod.process(dets, metas)
        bp = out.loc[100, "bbox_pitch"]
        np.testing.assert_allclose(
            [bp["x_bottom_left"], bp["y_bottom_left"]],
            expect[0], rtol=0, atol=1e-4)
        np.testing.assert_allclose(
            [bp["x_bottom_right"], bp["y_bottom_right"]],
            expect[1], rtol=0, atol=1e-4)
        np.testing.assert_allclose(
            [bp["x_bottom_middle"], bp["y_bottom_middle"]],
            expect[2], rtol=0, atol=1e-4)
        # sanity: lands on the pitch (|x|<=60 m, |y|<=40 m)
        assert abs(bp["x_bottom_left"]) < 60 and abs(
            bp["y_bottom_left"]) < 40

    def test_empty_detections(self):
        mod = PitchProjection()
        dets = self._detections([], [])
        metas = pd.DataFrame({"parameters": [_params()]}, index=["f0"])
        out = mod.process(dets, metas)
        assert list(out.columns) == ["bbox_pitch"]
        assert len(out) == 0

    def test_missing_parameters_column(self):
        mod = PitchProjection()
        dets = self._detections(["f0"], [[10, 10, 20, 40]])
        metas = pd.DataFrame(index=["f0"])
        out = mod.process(dets, metas)
        assert list(out.columns) == ["bbox_pitch"]

    def test_frames_without_camera_are_skipped(self):
        mod = PitchProjection(image_width=W, image_height=H)
        dets = self._detections(["f0", "f1"],
                                [[10, 10, 20, 40], [900, 700, 120, 260]])
        metas = pd.DataFrame({"parameters": [None, _params()]},
                             index=["f0", "f1"])
        out = mod.process(dets, metas)
        assert 101 in out.index and 100 not in out.index
        assert set(out.loc[101, "bbox_pitch"]) == {
            "x_bottom_left", "y_bottom_left", "x_bottom_right",
            "y_bottom_right", "x_bottom_middle", "y_bottom_middle",
        }


class TestTVCalibration:
    def test_preprocess_wraps_unbatchable(self):
        mod = TVCalibration(steps=2)
        md = pd.Series({"pitch_lines": {"side_line_top": np.zeros((2, 2))}})
        out = mod.preprocess(None, None, md)
        assert isinstance(out["pitch_lines"], Unbatchable)

    def test_passthrough_of_dataset_parameters(self):
        """Frames with no pitch-line observations must pass through the
        dataset-provided camera, not emit an optimizer prior-mean."""
        mod = TVCalibration(steps=2)
        given = _params(pan_degrees=33.0)
        metas = pd.DataFrame({"parameters": [given]}, index=["f0"])
        batch = {"pitch_lines": [{}]}
        _, rows = mod.process(batch, None, metas)
        assert len(rows) == 1
        assert rows[0].name == "f0"
        assert rows[0]["parameters"]["pan_degrees"] == 33.0

    def test_no_observations_no_parameters(self):
        mod = TVCalibration(steps=2)
        metas = pd.DataFrame({"other": [1]}, index=["f0"])
        _, rows = mod.process({"pitch_lines": [{}]}, None, metas)
        assert rows == []

    def test_optimized_camera_payload(self):
        """With observations present, the emitted payload carries the
        camera fields + the relative_mean_reproj diagnostic, and the raw
        optimizer latent is stripped."""
        import jax.numpy as jnp

        from tracklab_tpu.calibration.camera import project_points
        from tracklab_tpu.calibration.pitch import pitch_segments

        cam = PitchProjection._camera_from_params(_params(), W, H)
        obs = {}
        for name, pts3 in pitch_segments(8).items():
            px, front = project_points(cam, jnp.asarray(pts3))
            px, front = np.asarray(px), np.asarray(front)
            inside = (front & (px[:, 0] > 0) & (px[:, 0] < W)
                      & (px[:, 1] > 0) & (px[:, 1] < H))
            if inside.sum() >= 4:
                obs[name] = px[inside].astype(np.float32)
        assert obs, "synthetic rig projected no visible segments"
        mod = TVCalibration(steps=5, image_width=W, image_height=H)
        metas = pd.DataFrame({"x": [0]}, index=["f0"])
        _, rows = mod.process({"pitch_lines": [obs]}, None, metas)
        assert len(rows) == 1
        payload = rows[0]["parameters"]
        assert "latent" not in payload
        assert "relative_mean_reproj" in payload
        assert "pan_degrees" in payload and "x_focal_length" in payload

    def test_mixed_batch_observed_and_passthrough(self):
        """One frame with observations + one with only dataset params:
        both must emit, via their respective paths."""
        import jax.numpy as jnp

        from tracklab_tpu.calibration.camera import project_points
        from tracklab_tpu.calibration.pitch import pitch_segments

        cam = PitchProjection._camera_from_params(_params(), W, H)
        obs = {}
        for name, pts3 in pitch_segments(8).items():
            px, front = project_points(cam, jnp.asarray(pts3))
            px, front = np.asarray(px), np.asarray(front)
            inside = (front & (px[:, 0] > 0) & (px[:, 0] < W)
                      & (px[:, 1] > 0) & (px[:, 1] < H))
            if inside.sum() >= 4:
                obs[name] = px[inside].astype(np.float32)
        mod = TVCalibration(steps=3, image_width=W, image_height=H)
        metas = pd.DataFrame(
            {"parameters": [None, _params(pan_degrees=21.0)]},
            index=["f0", "f1"])
        _, rows = mod.process({"pitch_lines": [obs, {}]}, None, metas)
        assert [r.name for r in rows] == ["f0", "f1"]
        assert "relative_mean_reproj" in rows[0]["parameters"]
        assert rows[1]["parameters"]["pan_degrees"] == 21.0


class TestPitchLineDetector:
    def test_preprocess_resizes_and_scales(self):
        mod = PitchLineDetector(input_size=(72, 128))
        img = np.random.default_rng(0).integers(
            0, 255, (288, 512, 3), dtype=np.uint8)
        out = mod.preprocess(img, None, pd.Series({"id": 0}))
        assert out["image"].shape == (72, 128, 3)
        assert out["image"].dtype == np.float32
        assert np.allclose(out["scale"], [512 / 128, 288 / 72])

    def test_process_emits_pitch_lines_column(self):
        mod = PitchLineDetector(variant="nano", input_size=(64, 96),
                                points_per_line=8)
        batch = {
            "image": (np.random.default_rng(1).normal(
                size=(2, 64, 96, 3)) * 40 + 128).astype(np.float32),
            "scale": np.tile(np.array([[20.0, 16.875]], np.float32),
                             (2, 1)),
        }
        metas = pd.DataFrame({"x": [0, 1]}, index=["f0", "f1"])
        _, rows = mod.process(batch, None, metas)
        assert len(rows) == 2
        for r in rows:
            lines = r["pitch_lines"]
            assert isinstance(lines, dict)
            for pts in lines.values():
                assert pts.ndim == 2 and pts.shape[1] == 2
                # scaled back into original-image pixel space
                assert (pts[:, 0] <= 96 * 20.0 + 1e-3).all()
