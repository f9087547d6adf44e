"""Fused detect -> NMS -> track: ONE jitted device program per video.

The reference's engine hands each module's output to the next through
pandas DataFrames on the host (tracklab/engine/engine.py:148-185 slices a
batch, calls ``model.process``, then ``merge_dataframes`` row-merges the
result — once per batch per module).  The TPU-native fast path collapses
the detector, NMS decode, and the tracker into a single XLA program: a
``lax.scan`` over frame *chunks* whose body runs the batched detector on
one chunk and then the tracker's per-frame scan over that chunk's
detections, carrying tracker state across chunk boundaries.  Detection
tensors never leave the device between stages, and a whole video is one
dispatch.

Shapes are static: the caller pads the video to a multiple of ``chunk``
frames (padded frames flagged invalid so the detector's output there is
masked before the tracker sees it).

Box coordinates: the detector sees letterboxed frames; when per-frame
letterbox metadata is provided the boxes are rescaled to original-image
coordinates *on device* with exactly the clip-and-drop semantics of the
host wrapper (wrappers/bbox_detector/yolox_api.py:121-130), so the fused
program is output-equivalent to the module-by-module path
(tests/test_fused_pipeline.py asserts this).
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import lax

from tracklab_tpu.trackers.common import Detections

__all__ = ["fused_detect_track", "make_yolox_detect_fn"]


def make_yolox_detect_fn(model, variables, conf_threshold: float = 0.4,
                         iou_threshold: float = 0.65, max_dets: int = 32,
                         compute_dtype: Any = jnp.float32) -> Callable:
    """Build a ``detect_fn(frames, meta) -> Detections`` for YOLOX-family
    models exposing ``predict`` (decoded (B, A, 5+C) maps).

    ``frames``: (B, H, W, 3) uint8 (camera-native; cast to the compute
    dtype on device — the detector is HBM-bound, so reading uint8 instead
    of f32 trims the dominant bandwidth term, BASELINE.md).
    ``meta``: optional per-frame letterbox dict with ``scale`` (B,),
    ``pad`` (B, 2) [left, top], ``shape`` (B, 2) [w0, h0]; when given the
    output boxes are in original-image coordinates.
    """
    from tracklab_tpu.ops.nms import postprocess_detections

    def detect(frames, meta=None) -> Detections:
        imgs = frames.astype(compute_dtype)
        decoded = model.apply(variables, imgs, method=type(model).predict)
        d = postprocess_detections(
            decoded, conf_threshold=conf_threshold,
            iou_threshold=iou_threshold, max_out=max_dets)
        ltrb = d["ltrb"].astype(jnp.float32)
        valid = d["valid"]
        if meta is not None:
            # same order of ops as the host wrapper
            # (yolox_api.py:121-130): unletterbox, clip each coordinate
            # to the original image, drop boxes that collapse.
            scale = meta["scale"][:, None, None].astype(jnp.float32)
            pad = meta["pad"][:, None, :].astype(jnp.float32)
            wh0 = meta["shape"][:, None, :].astype(jnp.float32)
            lo = jnp.clip((ltrb[..., 0:2] - pad) / scale, 0.0, wh0)
            hi = jnp.clip((ltrb[..., 2:4] - pad) / scale, 0.0, wh0)
            ltrb = jnp.concatenate([lo, hi], axis=-1)
            side = hi - lo
            valid = valid & (side[..., 0] > 0) & (side[..., 1] > 0)
        B = ltrb.shape[0]
        ref = jnp.broadcast_to(
            jnp.arange(max_dets, dtype=jnp.int32), (B, max_dets))
        return Detections(ltrb, d["score"].astype(jnp.float32),
                          d["cls"].astype(jnp.float32), ref, valid)

    return detect


def fused_detect_track(detect_fn, step_fn, init_state, frames: jnp.ndarray,
                       chunk: int, meta=None, frame_valid=None,
                       return_detections: bool = True):
    """Run detector + tracker over a whole video as one traced program.

    Args:
      detect_fn: ``(frames_chunk, meta_chunk|None) -> Detections`` with
        leading chunk axis (e.g. from :func:`make_yolox_detect_fn`).
      step_fn: tracker scan step ``(state, Detections) -> (state, out)``
        (e.g. ``partial(ocsort_step, cfg)``).
      init_state: tracker carry for frame 0.
      frames: (F, H, W, 3) with ``F % chunk == 0``.
      chunk: detector batch size (the throughput knob; r2 sweep: 384 is
        the best measured point for YOLOX-s 640^2 bf16 on v5e).
      meta: optional per-frame letterbox metadata pytree, leaves (F, ...).
      frame_valid: optional (F,) bool — False for padded tail frames;
        their detections are masked out (the tracker still steps, exactly
        like the staged path's bucketed padding, scan_tracker._pad_video).
      return_detections: also return the per-frame Detections the tracker
        consumed (the engine fast path exports them as the detector
        module's DataFrame rows).

    Returns ``(final_state, dets|None, outs)`` where ``dets``/``outs``
    leaves have leading axis F.
    """
    F = frames.shape[0]
    if F % chunk:
        raise ValueError(f"frames ({F}) must be a multiple of chunk "
                         f"({chunk}); pad with frame_valid=False")
    n_chunks = F // chunk

    def to_chunks(x):
        return x.reshape((n_chunks, chunk) + x.shape[1:])

    xs = {"frames": to_chunks(frames)}
    if meta is not None:
        xs["meta"] = jax.tree_util.tree_map(to_chunks, meta)
    if frame_valid is not None:
        xs["frame_valid"] = to_chunks(frame_valid)

    def body(state, x):
        dets = detect_fn(x["frames"], x.get("meta"))
        if "frame_valid" in x:
            dets = dets._replace(
                valid=dets.valid & x["frame_valid"][:, None])
        state, out = lax.scan(step_fn, state, dets)
        ys = (dets, out) if return_detections else (None, out)
        return state, ys

    final, (dets, outs) = lax.scan(body, init_state, xs)

    def flat(x):
        return x.reshape((F,) + x.shape[2:])

    outs = jax.tree_util.tree_map(flat, outs)
    if return_detections:
        dets = jax.tree_util.tree_map(flat, dets)
        return final, dets, outs
    return final, None, outs
