"""TVCalib-style camera calibration by batched gradient descent (JAX).

Rebuild of plugins/calibration/tvcalib (module.py:13-230, optimize.py):
per-frame camera parameters (pan/tilt/roll/focal/position) are optimized
with AdamW + cosine schedule against the reprojection distance between
observed pitch-line points (from a segmentation front-end) and the
projected pitch template segments. The reference runs this in torch on
GPU per batch; here the *whole batch of frames* optimizes as one jitted
XLA program (vmapped loss, single optimizer over a stacked parameter
pytree) — a natural MXU/VPU fit since everything is small dense algebra.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tracklab_tpu.calibration.camera import CameraParams, project_points
from tracklab_tpu.calibration.pitch import pitch_segments

__all__ = ["TVCalibConfig", "optimize_cameras"]


@dataclass(frozen=True)
class TVCalibConfig:
    steps: int = 300
    lr: float = 0.05
    image_width: int = 1920
    image_height: int = 1080
    max_points_per_segment: int = 32
    # z-scored parameter priors (mean, std) roughly matching tvcalib's
    # main-camera distribution (cam_distr/tv_main_*.py)
    pan_prior: tuple = (0.0, 0.6)
    tilt_prior: tuple = (1.25, 0.2)
    roll_prior: tuple = (0.0, 0.05)
    focal_prior: tuple = (2500.0, 1500.0)
    pos_x_prior: tuple = (0.0, 10.0)
    pos_y_prior: tuple = (45.0, 10.0)
    pos_z_prior: tuple = (15.0, 5.0)


def _build_template(cfg):
    segs = pitch_segments()
    names = sorted(segs)
    pts = np.stack([segs[n] for n in names])      # (S, P, 3)
    return names, jnp.asarray(pts)


def _unpack(z, cfg):
    """z-scored latent (7,) -> CameraParams."""
    def un(v, prior):
        return prior[0] + v * prior[1]

    return CameraParams(
        pan=un(z[0], cfg.pan_prior),
        tilt=un(z[1], cfg.tilt_prior),
        roll=un(z[2], cfg.roll_prior),
        focal=un(z[3], cfg.focal_prior),
        position=jnp.stack([
            un(z[4], cfg.pos_x_prior),
            un(z[5], cfg.pos_y_prior),
            un(z[6], cfg.pos_z_prior)]),
        principal=jnp.array([cfg.image_width / 2, cfg.image_height / 2]),
    )


def _frame_loss(z, obs_pts, obs_seg, obs_valid, template, cfg):
    """NDC reprojection distance of observed points to their segment's
    projected template points (tvcalib module.py loss)."""
    cam = _unpack(z, cfg)
    S, P, _ = template.shape
    proj, in_front = project_points(cam, template.reshape(S * P, 3))
    ndc = proj / jnp.array([cfg.image_width, cfg.image_height])
    ndc = ndc.reshape(S, P, 2)
    in_front = in_front.reshape(S, P)
    obs_ndc = obs_pts / jnp.array([cfg.image_width, cfg.image_height])
    # distance of each observed point to nearest template point of its seg
    seg_pts = ndc[obs_seg]                       # (N, P, 2)
    seg_front = in_front[obs_seg]                # (N, P)
    d = jnp.linalg.norm(seg_pts - obs_ndc[:, None, :], axis=-1)
    d = jnp.where(seg_front, d, 1e3)
    dmin = jnp.min(d, axis=1)
    dmin = jnp.minimum(dmin, 2.0)                # huberize blow-ups
    denom = jnp.maximum(jnp.sum(obs_valid), 1.0)
    loss = jnp.sum(jnp.where(obs_valid, dmin, 0.0)) / denom
    # weak prior pulling latents to 0 keeps degenerate frames stable
    return loss + 1e-4 * jnp.sum(z ** 2)


def optimize_cameras(observations, cfg: TVCalibConfig = TVCalibConfig()):
    """Calibrate a batch of frames.

    observations: list (len B) of dicts segment_name -> (N_i, 2) pixel
    points of detected pitch lines. Returns (list of CameraParams as
    numpy dicts, per-frame mean reprojection NDC error).
    """
    names, template = _build_template(cfg)
    name_to_idx = {n: i for i, n in enumerate(names)}
    B = len(observations)
    N = cfg.max_points_per_segment * len(names)
    pts = np.zeros((B, N, 2), np.float32)
    seg = np.zeros((B, N), np.int32)
    valid = np.zeros((B, N), bool)
    for b, obs in enumerate(observations):
        k = 0
        for nme, p in obs.items():
            if nme not in name_to_idx or len(p) == 0:
                continue
            p = np.asarray(p, np.float32)[: cfg.max_points_per_segment]
            m = len(p)
            if k + m > N:
                break
            pts[b, k:k + m] = p
            seg[b, k:k + m] = name_to_idx[nme]
            valid[b, k:k + m] = True
            k += m

    z0 = jnp.zeros((B, 7))
    tx = optax.adamw(optax.cosine_decay_schedule(cfg.lr, cfg.steps))
    opt_state = tx.init(z0)

    loss_fn = partial(_frame_loss, template=template, cfg=cfg)

    @jax.jit
    def run(z, opt_state, pts, seg, valid):
        def step(carry, _):
            z, opt_state = carry

            def total(z_):
                losses = jax.vmap(loss_fn)(z_, pts, seg, valid)
                return jnp.sum(losses)

            grads = jax.grad(total)(z)
            updates, opt_state = tx.update(grads, opt_state, z)
            z = optax.apply_updates(z, updates)
            return (z, opt_state), None

        (z, opt_state), _ = jax.lax.scan(step, (z, opt_state), None,
                                         length=cfg.steps)
        final = jax.vmap(loss_fn)(z, pts, seg, valid)
        return z, final

    z, err = run(z0, opt_state, jnp.asarray(pts), jnp.asarray(seg),
                 jnp.asarray(valid))
    cams = []
    for b in range(B):
        cam = _unpack(z[b], cfg)
        cams.append({
            "pan_degrees": float(jnp.rad2deg(cam.pan)),
            "tilt_degrees": float(jnp.rad2deg(cam.tilt)),
            "roll_degrees": float(jnp.rad2deg(cam.roll)),
            "x_focal_length": float(cam.focal),
            "y_focal_length": float(cam.focal),
            "principal_point": [cfg.image_width / 2,
                                cfg.image_height / 2],
            "position_meters": [float(v) for v in cam.position],
            "latent": np.asarray(z[b]),
        })
    return cams, np.asarray(err)
