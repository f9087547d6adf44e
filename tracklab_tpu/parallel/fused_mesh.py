"""Multi-chip scale-out of the FUSED e2e pipeline.

`engine/fused.py` collapses detector -> NMS -> tracker into one XLA
program per video (the bench.py headline). This module is the multi-chip
production shape for it: V videos sharded one-per-device over a mesh
axis, every chip running the complete fused program on its own video —
frames in, tracks out, zero collectives on the hot path (videos are
independent; SURVEY §2.7 / BASELINE config 5's 8-videos-on-a-v4-8
workload, which the reference covers with one python process per GPU).

Within a shard the videos are iterated with ``lax.map`` (sequential),
NOT ``vmap``: vmap-of-scan serializes the trackers' ``lax.cond``
branches (the measured 3x cliff, BASELINE.md "multi-video modes"), and
the production operating point is one video per chip anyway, where the
map is a single iteration. For V > n_devices, prefer more shards over
vmap; the single-chip many-video alternative is the time-concat scan
(`wrappers/track/scan_tracker.process_video_batch`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tracklab_tpu.engine.fused import (fused_bottomup_track,
                                       fused_detect_parts_track,
                                       fused_detect_pose_track,
                                       fused_detect_reid_track,
                                       fused_detect_track)

__all__ = ["fused_videos_sharded", "fused_reid_videos_sharded",
           "fused_pose_videos_sharded", "fused_parts_videos_sharded",
           "fused_bottomup_videos_sharded"]


def _shard_map(fn, mesh, in_specs, out_specs):
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    try:  # jax >= 0.8 varying-manual-axes check: carries start
        # replicated (same init state on every chip) and become
        # shard-varying, which is intended
        return shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
    except TypeError:
        return shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=False)


def _sharded_runner(one_video, mesh: Mesh, axis: str):
    """Common scaffolding for every fused-shape sharded builder: shard
    the (V, ...) video axis over ``axis``, ``lax.map`` sequentially
    within a shard (module docstring), jit, and validate/shard inputs."""
    n_shards = mesh.shape[axis]
    spec = P(axis)

    def per_shard(frames, frame_valid):
        return lax.map(lambda a: one_video(*a), (frames, frame_valid))

    sharded = _shard_map(per_shard, mesh, in_specs=(spec, spec),
                         out_specs=spec)
    jitted = jax.jit(sharded)

    def run(frames, frame_valid=None):
        V = frames.shape[0]
        if V % n_shards:
            raise ValueError(
                f"V ({V}) must be a multiple of mesh.shape[{axis!r}] "
                f"({n_shards}); pad with all-False frame_valid videos")
        if frame_valid is None:
            frame_valid = jnp.ones(frames.shape[:2], bool)
        sharding = NamedSharding(mesh, spec)
        frames = jax.device_put(frames, sharding)
        frame_valid = jax.device_put(frame_valid, sharding)
        return jitted(frames, frame_valid)

    return run


def fused_videos_sharded(detect_fn, step_fn, init_state, mesh: Mesh,
                         chunk: int, axis: str = "dp",
                         return_detections: bool = False):
    """Build a jitted multi-chip runner for the fused e2e program.

    Args:
      detect_fn / step_fn / init_state / chunk: exactly as
        :func:`tracklab_tpu.engine.fused.fused_detect_track` (detector
        params close over ``detect_fn`` and are replicated to every
        device by GSPMD).
      mesh: device mesh; ``axis`` is the video-parallel axis (videos
        per shard = V / mesh.shape[axis], usually 1).
      return_detections: also return the per-frame Detections each
        tracker consumed (leading axes (V, F)).

    Returns ``run(frames, frame_valid=None)`` taking ``frames``
    (V, F, H, W, 3) with ``V % mesh.shape[axis] == 0`` and
    ``F % chunk == 0``, and optional ``frame_valid`` (V, F) bool for
    ragged tails. Output leaves have leading (V, ...) axes sharded over
    ``axis``: ``(final_states, dets|None, outs)``.
    """
    def one_video(frames, frame_valid):
        # sequential over this shard's videos (see module docstring)
        return fused_detect_track(
            detect_fn, step_fn, init_state, frames, chunk,
            frame_valid=frame_valid,
            return_detections=return_detections)

    return _sharded_runner(one_video, mesh, axis)


def fused_reid_videos_sharded(detect_fn, embed_fn, step_fn, init_state,
                              mesh: Mesh, chunk: int, axis: str = "dp",
                              min_confidence: float = 0.0,
                              embed_dim: int | None = None,
                              return_detections: bool = False,
                              return_embeddings: bool = False):
    """Multi-chip runner for the fused detect -> ReID -> embedding-tracker
    program (:func:`tracklab_tpu.engine.fused.fused_detect_reid_track` —
    BASELINE config 2's DanceTrack YOLOX + OSNet + StrongSORT shape), one
    video per device exactly like :func:`fused_videos_sharded`: detector
    AND ReID params replicate via GSPMD, videos shard over ``axis``, zero
    collectives on the hot path.

    Returns ``run(frames, frame_valid=None)`` over (V, F, H, W, 3);
    output leaves carry leading (V, ...) axes sharded over ``axis``:
    ``(final_states, dets|None, emb|None, outs)``.
    """
    def one_video(frames, frame_valid):
        return fused_detect_reid_track(
            detect_fn, embed_fn, step_fn, init_state, frames, chunk,
            frame_valid=frame_valid, min_confidence=min_confidence,
            embed_dim=embed_dim, return_detections=return_detections,
            return_embeddings=return_embeddings)

    return _sharded_runner(one_video, mesh, axis)


def fused_pose_videos_sharded(detect_fn, pose_fn, step_fn, init_state,
                              mesh: Mesh, chunk: int, axis: str = "dp",
                              min_confidence: float = 0.0,
                              pose_buckets=None,
                              return_detections: bool = False):
    """Multi-chip runner for the fused detect -> top-down pose -> tracker
    program (:func:`tracklab_tpu.engine.fused.fused_detect_pose_track` —
    BASELINE config 3's pose-tracking shape), one video per device.

    Returns ``run(frames, frame_valid=None)`` over (V, F, H, W, 3);
    output leaves carry leading (V, ...) axes sharded over ``axis``:
    ``(final_states, dets|None, keypoints (V, F, D, K, 3), outs)``.
    """
    def one_video(frames, frame_valid):
        return fused_detect_pose_track(
            detect_fn, pose_fn, step_fn, init_state, frames, chunk,
            frame_valid=frame_valid, min_confidence=min_confidence,
            pose_buckets=pose_buckets,
            return_detections=return_detections)

    return _sharded_runner(one_video, mesh, axis)


def fused_parts_videos_sharded(detect_fn, embed_fn, step_fn, init_state,
                               mesh: Mesh, chunk: int, axis: str = "dp",
                               min_confidence: float = 0.0,
                               n_parts: int = 5, embed_dim: int = 512,
                               n_keypoints: int = 17, pose_fn=None,
                               embed_buckets=None,
                               return_detections: bool = False,
                               return_embeddings: bool = False):
    """Multi-chip runner for the fused KPR part-based programs
    (:func:`tracklab_tpu.engine.fused.fused_detect_parts_track`): the
    promptless detect -> KPR parts -> BPBReID shape, and — with
    ``pose_fn`` — the FULL game-state prefix detect -> pose ->
    keypoint-PROMPTED KPR -> OKS-BPBReID. One video per device; the
    ViT-B KPR params replicate via GSPMD like every other closure (for
    real checkpoints prefer threading params as jit arguments at the
    call site — BASELINE.md r4 note on closure-captured ViT-B weights).

    Returns ``run(frames, frame_valid=None)`` over (V, F, H, W, 3);
    output leaves carry leading (V, ...) axes sharded over ``axis``:
    ``(final_states, dets|None, reid|None, kp|None, outs)``.
    """
    def one_video(frames, frame_valid):
        return fused_detect_parts_track(
            detect_fn, embed_fn, step_fn, init_state, frames, chunk,
            frame_valid=frame_valid, min_confidence=min_confidence,
            n_parts=n_parts, embed_dim=embed_dim,
            n_keypoints=n_keypoints, pose_fn=pose_fn,
            embed_buckets=embed_buckets,
            return_detections=return_detections,
            return_embeddings=return_embeddings)

    return _sharded_runner(one_video, mesh, axis)


def fused_bottomup_videos_sharded(detect_fn, step_fn, init_state,
                                  mesh: Mesh, chunk: int,
                                  axis: str = "dp",
                                  min_confidence: float = 0.0,
                                  return_detections: bool = False):
    """Multi-chip runner for the fused bottom-up pose program
    (:func:`tracklab_tpu.engine.fused.fused_bottomup_track`: pose model
    emitting boxes-from-keypoints -> tracker), one video per device.

    Returns ``run(frames, frame_valid=None)`` over (V, F, H, W, 3);
    output leaves carry leading (V, ...) axes sharded over ``axis``:
    ``(final_states, dets|None, keypoints, outs)``.
    """
    def one_video(frames, frame_valid):
        return fused_bottomup_track(
            detect_fn, step_fn, init_state, frames, chunk,
            frame_valid=frame_valid, min_confidence=min_confidence,
            return_detections=return_detections)

    return _sharded_runner(one_video, mesh, axis)
