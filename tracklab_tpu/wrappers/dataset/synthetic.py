"""Procedural synthetic tracking dataset.

The reference has no test fixtures (SURVEY §4); this generator fills that
gap: linear-motion objects with known ground-truth track ids, optional
detection noise/dropout, producing a full TrackingSet. A perfect tracker on
the noise-free configuration must reach HOTA = 100 — the core eval/tracker
integration test, and the bench workload when no real dataset is mounted.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

from tracklab_tpu.datastruct.tracking_dataset import (
    TrackingDataset, TrackingSet,
)

__all__ = ["SyntheticDataset", "make_synthetic_set"]

# ``synthetic://{video_id}/{frame}`` -> GT boxes for procedural rendering,
# so image-level modules (detectors, calibration, ReID crops) run on the
# synthetic dataset without files on disk.
_RENDER_BOXES: dict = {}


def _render_frame(rest: str) -> np.ndarray:
    boxes, img_w, img_h = _RENDER_BOXES[rest]
    img = np.full((img_h, img_w, 3), 15, np.uint8)
    for k, (x, y, w, h) in enumerate(boxes):
        color = np.array([60 + (k * 53) % 180, 60 + (k * 101) % 180,
                          220 - (k * 37) % 160], np.uint8)
        x1, y1 = int(max(x, 0)), int(max(y, 0))
        x2 = int(min(x + w, img_w))
        y2 = int(min(y + h, img_h))
        if x2 > x1 and y2 > y1:
            img[y1:y2, x1:x2] = color
    return img


def _ensure_renderer():
    from tracklab_tpu.utils.cv2 import register_virtual_renderer
    register_virtual_renderer("synthetic", _render_frame)


def _gs_camera(img_w, img_h, pan=0.0):
    """Per-video synthetic broadcast camera (wide main view) for the
    game-state mode."""
    import jax.numpy as jnp
    from tracklab_tpu.calibration.camera import CameraParams
    return CameraParams(
        pan=jnp.asarray(pan), tilt=jnp.asarray(1.25),
        roll=jnp.asarray(0.01),
        focal=jnp.asarray(1100.0 * img_w / 1920.0),
        position=jnp.asarray([0.0, 55.0, 18.0]),
        principal=jnp.asarray([img_w / 2.0, img_h / 2.0]))


def _gs_pitch_lines(cam, img_w, img_h, rng, noise=0.5):
    """Observed pitch-marking points for the calibration front-end."""
    import jax.numpy as jnp
    from tracklab_tpu.calibration.camera import project_points
    from tracklab_tpu.calibration.pitch import pitch_segments
    obs = {}
    for name, pts in pitch_segments().items():
        px, front = project_points(cam, jnp.asarray(pts))
        px = np.asarray(px)
        front = np.asarray(front)
        inside = (front & (px[:, 0] > 0) & (px[:, 0] < img_w)
                  & (px[:, 1] > 0) & (px[:, 1] < img_h))
        if inside.sum() >= 4:
            obs[name] = (px[inside]
                         + rng.normal(0, noise, (int(inside.sum()), 2))
                         ).astype(np.float32)
    return obs


def _gs_bbox_pitch(cam, boxes):
    """GT boxes -> bbox_pitch dicts via the TRUE camera (the GSR GT
    layout, soccernet.py bbox_pitch)."""
    import jax.numpy as jnp
    from tracklab_tpu.calibration.camera import backproject_to_pitch
    boxes = np.asarray(boxes, float)
    bl = np.stack([boxes[:, 0], boxes[:, 1] + boxes[:, 3]], 1)
    br = np.stack([boxes[:, 0] + boxes[:, 2],
                   boxes[:, 1] + boxes[:, 3]], 1)
    bm = (bl + br) / 2
    world = np.asarray(backproject_to_pitch(
        cam, jnp.asarray(np.concatenate([bl, br, bm], axis=0))))
    n = len(boxes)
    return [{
        "x_bottom_left": float(world[i, 0]),
        "y_bottom_left": float(world[i, 1]),
        "x_bottom_right": float(world[n + i, 0]),
        "y_bottom_right": float(world[n + i, 1]),
        "x_bottom_middle": float(world[2 * n + i, 0]),
        "y_bottom_middle": float(world[2 * n + i, 1]),
    } for i in range(n)]


def make_synthetic_set(n_videos=2, n_frames=100, n_objects=8, seed=0,
                       det_noise=0.0, det_dropout=0.0, fp_rate=0.0,
                       img_w=1920, img_h=1080, id_offset=0,
                       with_keypoints=False, n_keypoints=17,
                       game_state=False):
    rng = np.random.default_rng(seed)
    _ensure_renderer()
    video_rows, image_rows, det_rows = [], [], []
    vid0, img0, det0 = id_offset, id_offset * 100000, id_offset * 1000000
    image_counter, det_counter = img0, det0
    for v in range(n_videos):
        video_id = vid0 + v
        video_rows.append({
            "id": video_id, "name": f"synth-{video_id:03d}",
            "nframes": n_frames, "frame_rate": 30,
            "seqlength": n_frames, "im_width": img_w, "im_height": img_h,
        })
        # margins scale with the frame so small debug resolutions work
        max_size = min(150.0, img_w / 6.0, img_h / 6.0)
        min_size = max_size / 3.0
        lo = [min(100.0, img_w / 10.0), min(100.0, img_h / 10.0)]
        hi = [img_w - 2 * max_size, img_h - 2 * max_size]
        cam = _gs_camera(img_w, img_h, pan=0.05 * v) if game_state \
            else None
        pos = rng.uniform(lo, hi, (n_objects, 2))
        vel = rng.uniform(-6, 6, (n_objects, 2))
        size = rng.uniform(min_size, max_size, (n_objects, 2))
        # rigid per-object keypoint offsets (fractions of the box) so
        # GT keypoints move with the object — OKS-trackable
        kp_frac = rng.uniform(0.05, 0.95, (n_objects, n_keypoints, 2))
        for f in range(1, n_frames + 1):
            image_id = image_counter
            image_counter += 1
            image_row = {
                "id": image_id, "video_id": video_id, "frame": f,
                "file_path": f"synthetic://{video_id}/{f}",
                "is_labeled": True,
            }
            if game_state:
                image_row["pitch_lines"] = _gs_pitch_lines(
                    cam, img_w, img_h, rng)
            image_rows.append(image_row)
            pos = pos + vel
            # bounce off borders
            lims = (img_w - 1.2 * max_size, img_h - 1.2 * max_size)
            for d, lim in enumerate(lims):
                hit = (pos[:, d] < 0) | (pos[:, d] > lim)
                vel[hit, d] *= -1
            pos = np.clip(pos, 0, list(lims))
            _RENDER_BOXES[f"{video_id}/{f}"] = (
                np.concatenate([pos, size], axis=1).astype(np.float32),
                img_w, img_h)
            for k in range(n_objects):
                if det_dropout and rng.uniform() < det_dropout:
                    continue
                c = pos[k] + rng.normal(0, det_noise, 2) \
                    if det_noise else pos[k]
                s = size[k]
                row = {
                    "id": det_counter,
                    "image_id": image_id, "video_id": video_id,
                    "frame": f, "track_id": k + 1,
                    "bbox_ltwh": np.array([c[0], c[1], s[0], s[1]],
                                          np.float32),
                    "bbox_conf": float(rng.uniform(0.75, 1.0)),
                    "category_id": 1, "visibility": 1.0,
                }
                if with_keypoints:
                    kp = np.ones((n_keypoints, 3), np.float32)
                    kp[:, :2] = c[None, :] + kp_frac[k] * s[None, :]
                    row["keypoints_xyc"] = kp
                    row["keypoints_conf"] = 1.0
                if game_state:
                    # GSR attributes: GT labels + the per-detection
                    # prediction columns the attribute heads would emit
                    # (sn-gamestate scope; tracklab ships the voting
                    # hooks — majority_vote_api.py:24-51)
                    team = "left" if k % 2 == 0 else "right"
                    role = "goalkeeper" if k == 0 else "player"
                    row["team"] = team
                    row["role"] = role
                    row["jersey_number"] = k + 1
                    row["team_detection"] = team
                    row["team_confidence"] = 1.0
                    row["role_detection"] = role
                    row["role_confidence"] = 1.0
                    row["jersey_number_detection"] = k + 1
                    row["jersey_number_confidence"] = 1.0
                    row["bbox_pitch"] = _gs_bbox_pitch(
                        cam, row["bbox_ltwh"][None])[0]
                det_rows.append(row)
                det_counter += 1
            if fp_rate:
                for _ in range(rng.poisson(fp_rate)):
                    c = rng.uniform([0, 0], [img_w - 150, img_h - 150])
                    s = rng.uniform(30, 100, 2)
                    det_rows.append({
                        "id": det_counter,
                        "image_id": image_id, "video_id": video_id,
                        "frame": f, "track_id": -1,
                        "bbox_ltwh": np.array([c[0], c[1], s[0], s[1]],
                                              np.float32),
                        "bbox_conf": float(rng.uniform(0.3, 0.7)),
                        "category_id": 1, "visibility": 1.0,
                    })
                    det_counter += 1
    video_df = pd.DataFrame(video_rows).set_index("id")
    image_df = pd.DataFrame(image_rows).set_index("id")
    det_df = pd.DataFrame(det_rows).set_index("id")
    return TrackingSet(video_df, image_df, det_df)


class SyntheticDataset(TrackingDataset):
    def __init__(self, dataset_path: str = "/tmp/synthetic",
                 n_videos: int = 2, n_frames: int = 100,
                 n_objects: int = 8, seed: int = 0,
                 det_noise: float = 0.0, det_dropout: float = 0.0,
                 fp_rate: float = 0.0, nvid: int = -1, nframes: int = -1,
                 img_w: int = 1920, img_h: int = 1080,
                 with_keypoints: bool = False,
                 game_state: bool = False, **kwargs):
        sets = {
            "train": make_synthetic_set(
                n_videos, n_frames, n_objects, seed, det_noise,
                det_dropout, fp_rate, img_w=img_w, img_h=img_h,
                with_keypoints=with_keypoints, game_state=game_state),
            "val": make_synthetic_set(
                n_videos, n_frames, n_objects, seed + 1, det_noise,
                det_dropout, fp_rate, img_w=img_w, img_h=img_h,
                id_offset=n_videos, with_keypoints=with_keypoints,
                game_state=game_state),
        }
        super().__init__(dataset_path, sets, nvid=nvid, nframes=nframes,
                         **kwargs)
