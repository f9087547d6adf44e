"""Camera model + TVCalib-style optimization tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from tracklab_tpu.calibration.camera import (
    CameraParams, project_points, backproject_to_pitch,
)
from tracklab_tpu.calibration.pitch import pitch_segments
from tracklab_tpu.calibration.tvcalib import (
    TVCalibConfig, optimize_cameras, _unpack,
)


def main_camera(pan=0.05, tilt=1.2, roll=0.01, focal=2800.0,
                pos=(2.0, 48.0, 14.0)):
    return CameraParams(
        pan=jnp.asarray(pan), tilt=jnp.asarray(tilt),
        roll=jnp.asarray(roll), focal=jnp.asarray(focal),
        position=jnp.asarray(pos),
        principal=jnp.asarray([960.0, 540.0]))


class TestCamera:
    def test_project_backproject_roundtrip(self):
        cam = main_camera()
        pts = jnp.asarray([[0.0, 0.0, 0.0], [10.0, -5.0, 0.0],
                           [-30.0, 20.0, 0.0]])
        px, front = project_points(cam, pts)
        assert bool(front.all())
        back = backproject_to_pitch(cam, px)
        np.testing.assert_allclose(np.asarray(back),
                                   np.asarray(pts[:, :2]), atol=1e-3)

    def test_center_projects_near_image_center(self):
        cam = main_camera(pan=0.0, roll=0.0)
        px, _ = project_points(cam, jnp.zeros((1, 3)))
        # main camera looks at the pitch: center lands inside the frame
        assert 0 < float(px[0, 0]) < 1920
        assert 0 < float(px[0, 1]) < 1080


class TestTVCalib:
    def test_recovers_synthetic_camera(self):
        cfg = TVCalibConfig(steps=400, lr=0.08)
        true_cam = main_camera()
        segs = pitch_segments()
        obs = {}
        rng = np.random.default_rng(0)
        for name, pts in segs.items():
            px, front = project_points(true_cam, jnp.asarray(pts))
            px = np.asarray(px)
            front = np.asarray(front)
            inside = (front & (px[:, 0] > 0) & (px[:, 0] < 1920)
                      & (px[:, 1] > 0) & (px[:, 1] < 1080))
            if inside.sum() >= 4:
                obs[name] = px[inside] + rng.normal(0, 1.0,
                                                    (inside.sum(), 2))
        cams, err = optimize_cameras([obs, obs], cfg)
        assert err.shape == (2,)
        # mean NDC reprojection error under ~1% of the image
        assert err[0] < 0.01, err
        # recovered camera reprojects the pitch center close to truth
        rec = _unpack(jnp.asarray(cams[0]["latent"]), cfg)
        px_true, _ = project_points(true_cam, jnp.zeros((1, 3)))
        px_rec, _ = project_points(rec, jnp.zeros((1, 3)))
        assert np.linalg.norm(np.asarray(px_true - px_rec)) < 40.0
