"""Differentiable broadcast-camera model (JAX).

Counterpart of tvcalib's SNProjectiveCamera
(plugins/calibration/tvcalib/cam_modules.py:109-504) and the SoccerNet
baseline Camera: pan/tilt/roll + focal length + position, projecting
z=0-plane pitch points into the image. Pure JAX -> usable both for
gradient-descent calibration (tvcalib.py) and for fast batched
bbox -> pitch-coordinate back-projection on device.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

__all__ = ["CameraParams", "camera_matrix", "project_points",
           "backproject_to_pitch"]


class CameraParams(NamedTuple):
    """All angles in radians; position in pitch meters, z = height above
    the pitch (world z up). ``distortion`` carries radial (k1, k2)
    coefficients like the SoccerNet baseline Camera
    (plugins/calibration/sn_calibration_baseline/camera.py); zeros
    disable distortion."""
    pan: jnp.ndarray      # ()
    tilt: jnp.ndarray     # ()
    roll: jnp.ndarray     # ()
    focal: jnp.ndarray    # () pixels
    position: jnp.ndarray  # (3,) [x, y, z(height)]
    principal: jnp.ndarray  # (2,) [cx, cy] pixels
    distortion: jnp.ndarray = jnp.zeros(2)  # (k1, k2)


def _rotation(pan, tilt, roll):
    """World->camera rotation (rows = camera right / down / forward).

    Conventions: world z up, pitch plane z=0. The optical axis is
      f = [sin(pan) sin(tilt), -cos(pan) sin(tilt), -cos(tilt)]
    so tilt=0 looks straight down, tilt=pi/2 horizontal; pan=0 looks in
    world -y (the main broadcast camera sits at y>0 and looks across the
    pitch). roll spins the image about the optical axis.
    """
    st, ct = jnp.sin(tilt), jnp.cos(tilt)
    sp, cp = jnp.sin(pan), jnp.cos(pan)
    f = jnp.stack([sp * st, -cp * st, -ct])
    up = jnp.array([0.0, 0.0, 1.0])
    r0 = jnp.cross(f, up)
    r0 = r0 / jnp.maximum(jnp.linalg.norm(r0), 1e-8)
    d0 = jnp.cross(f, r0)
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    r = cr * r0 + sr * d0
    d = -sr * r0 + cr * d0
    return jnp.stack([r, d, f])


def camera_matrix(cam: CameraParams):
    """3x4 projection P = K [R | -R C]; position z is height above
    the pitch (world z up)."""
    K = jnp.array([
        [cam.focal, 0.0, cam.principal[0]],
        [0.0, cam.focal, cam.principal[1]],
        [0.0, 0.0, 1.0]])
    R = _rotation(cam.pan, cam.tilt, cam.roll)
    C = cam.position
    Rt = jnp.concatenate([R, (-R @ C)[:, None]], axis=1)
    return K @ Rt


def project_points(cam: CameraParams, points3d):
    """(N, 3) world points -> (N, 2) pixels + (N,) in-front mask.

    Radial distortion (k1, k2) is applied in normalized camera
    coordinates when cam.distortion is nonzero."""
    R = _rotation(cam.pan, cam.tilt, cam.roll)
    xc = (points3d - cam.position) @ R.T
    z = xc[:, 2]
    zsafe = jnp.where(jnp.abs(z) > 1e-8, z, 1e-8)
    xn = xc[:, 0] / zsafe
    yn = xc[:, 1] / zsafe
    r2 = xn * xn + yn * yn
    k1, k2 = cam.distortion[0], cam.distortion[1]
    radial = 1.0 + k1 * r2 + k2 * r2 * r2
    xn = xn * radial
    yn = yn * radial
    px = cam.focal * xn + cam.principal[0]
    py = cam.focal * yn + cam.principal[1]
    return jnp.stack([px, py], axis=1), z > 0


def backproject_to_pitch(cam: CameraParams, pixels):
    """(N, 2) pixels -> (N, 2) pitch (z=0 plane) coordinates.

    Inverts the homography restricted to the z=0 plane — the mapping used
    to produce bbox_pitch from the bbox bottom-center (reference GS
    pipeline's camera module)."""
    P = camera_matrix(cam)
    H = jnp.stack([P[:, 0], P[:, 1], P[:, 3]], axis=1)  # 3x3 plane homog
    Hinv = jnp.linalg.inv(H)
    ph = jnp.concatenate([pixels, jnp.ones((pixels.shape[0], 1))], axis=1)
    w = ph @ Hinv.T
    return w[:, :2] / jnp.where(jnp.abs(w[:, 2:]) > 1e-8, w[:, 2:], 1e-8)
