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

from tracklab_tpu.engine.fused import (fused_detect_reid_track,
                                       fused_detect_track)

__all__ = ["fused_videos_sharded", "fused_reid_videos_sharded"]


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
    n_shards = mesh.shape[axis]

    def one_video(frames, frame_valid):
        final, dets, outs = fused_detect_track(
            detect_fn, step_fn, init_state, frames, chunk,
            frame_valid=frame_valid,
            return_detections=return_detections)
        return final, dets, outs

    def per_shard(frames, frame_valid):
        # sequential over this shard's videos (see module docstring)
        return lax.map(lambda a: one_video(*a), (frames, frame_valid))

    spec = P(axis)
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
    n_shards = mesh.shape[axis]

    def one_video(frames, frame_valid):
        return fused_detect_reid_track(
            detect_fn, embed_fn, step_fn, init_state, frames, chunk,
            frame_valid=frame_valid, min_confidence=min_confidence,
            embed_dim=embed_dim, return_detections=return_detections,
            return_embeddings=return_embeddings)

    def per_shard(frames, frame_valid):
        return lax.map(lambda a: one_video(*a), (frames, frame_valid))

    spec = P(axis)
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
