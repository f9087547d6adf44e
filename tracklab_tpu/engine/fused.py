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

__all__ = ["fused_detect_track", "fused_detect_track_concat",
           "fused_detect_reid_track",
           "fused_detect_pose_track",
           "make_yolox_detect_fn", "make_rtdetr_detect_fn",
           "make_osnet_embed_fn", "make_topdown_pose_fn",
           "fused_detect_parts_track", "make_kpr_embed_fn",
           "make_bottomup_detect_fn", "fused_bottomup_track",
           "run_fused_video", "run_fused_reid_video",
           "run_fused_bottomup_video",
           "run_fused_pose_video", "run_fused_parts_video",
           "run_fused_gsr_video"]


def make_yolox_detect_fn(model, variables, conf_threshold: float = 0.4,
                         iou_threshold: float = 0.65, max_dets: int = 32,
                         compute_dtype: Any = jnp.float32,
                         preproc: Callable | None = None) -> Callable:
    """Build a ``detect_fn(frames, meta) -> Detections`` for YOLO-family
    models exposing ``predict`` (decoded (B, A, 5+C) maps): YOLOX (raw
    0-255 input), YOLOv8/YOLO11 (``preproc=lambda x: x / 255.0``), and
    RTMDet (mean/std normalize) — each wrapper's ``device_detect_fn``
    passes its own staged-path normalization so fused == staged.

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
        if preproc is not None:
            imgs = preproc(imgs)
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


def make_rtdetr_detect_fn(model, variables, input_size,
                          conf_threshold: float = 0.4,
                          max_dets: int = 32,
                          compute_dtype: Any = jnp.float32) -> Callable:
    """Build a ``detect_fn(frames, meta) -> Detections`` for the HF-exact
    RT-DETR (NMS-free top-k decode, models/rtdetr_hf.py).

    ``frames``: (B, H, W, 3) uint8 stretch-resized to ``input_size``
    (RTDetrImageProcessor semantics: rescale 1/255, no normalization).
    ``meta``: optional dict with ``scale`` (B, 2) per-axis [sx, sy] and
    ``shape`` (B, 2) [w0, h0]; boxes are mapped back to original-image
    coordinates with the same clip/collapse-drop order as the host
    wrapper (wrappers/bbox_detector/rtdetr_api.py:process).
    """
    from tracklab_tpu.models.rtdetr_hf import postprocess_rtdetr

    th, tw = input_size

    def detect(frames, meta=None) -> Detections:
        imgs = frames.astype(compute_dtype) / 255.0
        logits, boxes = model.apply(variables, imgs, train=False)
        d = postprocess_rtdetr(logits, boxes, img_w=tw, img_h=th,
                               conf_threshold=conf_threshold,
                               max_out=max_dets)
        ltrb = d["ltrb"].astype(jnp.float32)
        valid = d["valid"]
        if meta is not None:
            sxy = meta["scale"][:, None, :].astype(jnp.float32)
            wh0 = meta["shape"][:, None, :].astype(jnp.float32)
            lo = jnp.clip(ltrb[..., 0:2] * sxy, 0.0, wh0)
            hi = jnp.clip(ltrb[..., 2:4] * sxy, 0.0, wh0)
            ltrb = jnp.concatenate([lo, hi], axis=-1)
            side = hi - lo
            valid = valid & (side[..., 0] > 0) & (side[..., 1] > 0)
        B = ltrb.shape[0]
        ref = jnp.broadcast_to(
            jnp.arange(max_dets, dtype=jnp.int32), (B, max_dets))
        return Detections(ltrb, d["score"].astype(jnp.float32),
                          d["cls"].astype(jnp.float32), ref, valid)

    return detect


def make_osnet_embed_fn(model, variables, crop_size=(256, 128),
                        compute_dtype: Any = jnp.float32) -> Callable:
    """Build an ``embed_fn(frames, boxes) -> dict`` for OSNet-family ReID
    models: device crop-and-resize of every detection slot from the
    detector's input frames, ImageNet-normalize, one batched forward.

    Same math as the staged batched ReID module
    (wrappers/reid/batched_api.py:74-88) with the detector's letterboxed
    frames as the work image — the detection crops never leave the
    device between the detector and the tracker.

    ``frames``: (B, H, W, 3) uint8; ``boxes``: (B, D, 4) ltrb in frame
    coordinates. Returns ``embeddings`` (B, D, E), ``part_features``
    (B, D, P+1, E'), ``visibility`` (B, D, P+1).
    """
    from tracklab_tpu.models.preprocess import crop_resize_auto
    from tracklab_tpu.wrappers.reid.osnet_api import (
        IMAGENET_MEAN, IMAGENET_STD,
    )

    ch, cw = crop_size
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)

    def embed(frames, boxes):
        crops = jax.vmap(
            lambda img, b: crop_resize_auto(img, b, ch, cw))(frames, boxes)
        B, D = crops.shape[0], crops.shape[1]
        x = ((crops.reshape(B * D, ch, cw, 3) - mean) / std).astype(
            compute_dtype)
        out = model.apply(variables, x, train=False)
        emb = out["embeddings"].astype(jnp.float32)
        res = {"embeddings": emb.reshape(B, D, -1)}
        if "part_features" in out:
            pf = out["part_features"].astype(jnp.float32)
            vis = out["visibility"].astype(jnp.float32)
            res["part_features"] = pf.reshape(B, D, pf.shape[1], -1)
            res["visibility"] = vis.reshape(B, D, -1)
        return res

    return embed


def make_kpr_embed_fn(model, variables, crop_size=(384, 128),
                      n_prompt_ch: int = 6,
                      test_embeddings=("bn_foreg", "parts"),
                      binary_visibility: bool = True,
                      vis_thresh: float = 0.3,
                      compute_dtype: Any = jnp.float32) -> Callable:
    """Build an ``embed_fn(frames, boxes, keypoints=None) -> dict`` for
    the KPR part-based ReID model (models/kpr.py): device
    crop-and-resize of every detection slot, ImageNet-normalize, one
    batched forward. With ``keypoints`` (B, D, K, 3) in the same
    coordinate frame as ``boxes``, the cck6 gaussian prompt maps are
    rasterized ON DEVICE (models/kpr.py:gaussian_prompt_maps — the maps
    are crop-relative, so any common frame gives identical prompts);
    without them the prompts are zero (the wrapper's
    ``use_keypoints=False`` mode, wrappers/reid/kpr_api.py:preprocess).

    Returns ``embeddings`` (B, D, P', E) and ``visibility`` (B, D, P')
    in the configured test-embeddings part layout
    (models/kpr.py:extract_test_embeddings).
    """
    from tracklab_tpu.models.kpr import (extract_test_embeddings,
                                         gaussian_prompt_maps)
    from tracklab_tpu.models.preprocess import crop_resize_auto
    from tracklab_tpu.wrappers.reid.osnet_api import (
        IMAGENET_MEAN, IMAGENET_STD,
    )

    ch, cw = crop_size
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)

    def embed(frames, boxes, keypoints=None):
        crops = jax.vmap(
            lambda img, b: crop_resize_auto(img, b, ch, cw))(frames, boxes)
        B, D = crops.shape[0], crops.shape[1]
        x = ((crops.reshape(B * D, ch, cw, 3) - mean) / std).astype(
            compute_dtype)
        if keypoints is None:
            prompts = jnp.zeros((B * D, ch, cw, n_prompt_ch),
                                compute_dtype)
        else:
            prompts = gaussian_prompt_maps(
                keypoints, boxes, (ch, cw), vis_thresh=vis_thresh)
            prompts = prompts.reshape(B * D, ch, cw, -1).astype(
                compute_dtype)
        out = model.apply(variables, x, prompts, train=False)
        emb, vis = extract_test_embeddings(out, test_embeddings,
                                           binary_visibility)
        emb = emb.astype(jnp.float32)
        vis = vis.astype(jnp.float32)
        return {"embeddings": emb.reshape(B, D, emb.shape[1], -1),
                "visibility": vis.reshape(B, D, -1)}

    return embed


def make_topdown_pose_fn(model, variables, crop_size=(256, 192),
                         num_keypoints: int = 17,
                         compute_dtype: Any = jnp.float32) -> Callable:
    """Build a ``pose_fn(frames, boxes) -> keypoints (B, D, K, 3)`` for
    top-down pose models exposing ``predict_keypoints`` (CSP or ViT
    backbones): device crop-and-resize of every detection slot, /255
    rescale, one batched forward, keypoints mapped back from crop to
    FRAME coordinates (same math as the staged batched pose module,
    wrappers/pose_estimator/batched_api.py:75-91; the fused body then
    maps frame -> original coordinates via the crop_meta inverse)."""
    from tracklab_tpu.models.preprocess import crop_resize_auto

    ch, cw = crop_size

    def pose(frames, boxes):
        crops = jax.vmap(
            lambda img, b: crop_resize_auto(img, b, ch, cw))(frames, boxes)
        B, D = crops.shape[0], crops.shape[1]
        x = (crops.reshape(B * D, ch, cw, 3) / 255.0).astype(
            compute_dtype)
        kp = model.predict_keypoints(variables, x)    # (B*D, K, 3)
        kp = kp.astype(jnp.float32).reshape(B, D, num_keypoints, 3)
        w = boxes[..., 2] - boxes[..., 0]
        h = boxes[..., 3] - boxes[..., 1]
        kx = kp[..., 0] * (w / cw)[..., None] + boxes[..., 0:1]
        ky = kp[..., 1] * (h / ch)[..., None] + boxes[..., 1:2]
        return jnp.stack([kx, ky, kp[..., 2]], axis=-1)

    return pose


def _kp_bbox_ltrb(kp, extension_factor, wh0=None):
    """Device replica of utils/coordinates.generate_bbox_from_keypoints
    (ltrb form): box around visible (conf > 0) keypoints — all keypoints
    when none visible — extended by (top, bottom, sides) fractions of
    the raw height, clipped to the original image when ``wh0`` given."""
    big = 1e9
    x, y = kp[..., 0], kp[..., 1]
    vis = kp[..., 2] > 0
    any_vis = jnp.any(vis, axis=-1)

    def pick(v, reduce_vis, reduce_all):
        return jnp.where(any_vis, reduce_vis(v), reduce_all(v))

    l = pick(x, lambda v: jnp.min(jnp.where(vis, v, big), -1),
             lambda v: jnp.min(v, -1))
    r = pick(x, lambda v: jnp.max(jnp.where(vis, v, -big), -1),
             lambda v: jnp.max(v, -1))
    t = pick(y, lambda v: jnp.min(jnp.where(vis, v, big), -1),
             lambda v: jnp.min(v, -1))
    b = pick(y, lambda v: jnp.max(jnp.where(vis, v, -big), -1),
             lambda v: jnp.max(v, -1))
    h = b - t
    top, bottom, sides = extension_factor
    ltrb = jnp.stack([l - sides * h, t - top * h,
                      r + sides * h, b + bottom * h], axis=-1)
    if wh0 is not None:
        w0 = wh0[..., 0:1]
        h0 = wh0[..., 1:2]
        ltrb = jnp.concatenate([
            jnp.clip(ltrb[..., 0:1], 0.0, w0),
            jnp.clip(ltrb[..., 1:2], 0.0, h0),
            jnp.clip(ltrb[..., 2:3], 0.0, w0),
            jnp.clip(ltrb[..., 3:4], 0.0, h0)], axis=-1)
    return ltrb


def make_bottomup_detect_fn(predict_fn, conf_threshold: float = 0.4,
                            iou_threshold: float = 0.65,
                            max_dets: int = 32,
                            bbox_extension_factor=(0.05, 0.05, 0.05),
                            compute_dtype: Any = jnp.float32) -> Callable:
    """Build ``detect_fn(frames, meta) -> (Detections, keypoints)`` for
    bottom-up pose models (YOLOX-Pose / YOLO11-Pose): one full-image
    forward emits boxes AND keypoints; boxes are regenerated from the
    keypoints exactly like the staged wrapper
    (wrappers/pose_estimator/bottomup_api.py:process — the RTMO
    generate_bbox_from_keypoints path), and keypoints are matched to the
    NMS-compacted detections by nearest decoded-box center, the same
    host heuristic run on device.

    ``predict_fn(images) -> (decoded (B, A, 5+C), kps (B, A, K, 3))``
    in letterbox coordinates (the wrapper's family closure).
    """
    from tracklab_tpu.ops.nms import postprocess_detections

    def detect(frames, meta=None):
        imgs = frames.astype(compute_dtype)
        decoded, kps_all = predict_fn(imgs)
        d = postprocess_detections(
            decoded, conf_threshold=conf_threshold,
            iou_threshold=iou_threshold, max_out=max_dets)
        ltrb = d["ltrb"].astype(jnp.float32)
        valid = d["valid"]
        # nearest-center anchor match (bottomup_api.py:process)
        kp_centers = kps_all[..., :2].mean(axis=2)        # (B, A, 2)
        box_c = (ltrb[..., 0:2] + ltrb[..., 2:4]) / 2.0   # (B, D, 2)
        d2 = jnp.sum(
            (box_c[:, :, None, :] - kp_centers[:, None, :, :]) ** 2,
            axis=-1)                                      # (B, D, A)
        anchor = jnp.argmin(d2, axis=-1)                  # (B, D)
        kp = jnp.take_along_axis(
            kps_all.astype(jnp.float32),
            anchor[:, :, None, None], axis=1)             # (B, D, K, 3)
        wh0 = None
        if meta is not None:
            scale = meta["scale"][:, None, None, None].astype(
                jnp.float32)
            pad = meta["pad"][:, None, None, :].astype(jnp.float32)
            kp = jnp.concatenate(
                [(kp[..., 0:2] - pad) / scale, kp[..., 2:3]], axis=-1)
            wh0 = meta["shape"][:, None, :].astype(jnp.float32)
        box = _kp_bbox_ltrb(kp, bbox_extension_factor, wh0)
        B, D = box.shape[0], box.shape[1]
        ref = jnp.broadcast_to(
            jnp.arange(D, dtype=jnp.int32), (B, D))
        dets = Detections(box, d["score"].astype(jnp.float32),
                          jnp.ones((B, D), jnp.float32), ref, valid)
        return dets, kp

    return detect


def fused_bottomup_track(detect_fn, step_fn, init_state,
                         frames: jnp.ndarray, chunk: int, meta=None,
                         frame_valid=None, min_confidence: float = 0.0,
                         return_detections: bool = True):
    """Bottom-up pose-detector -> tracker, ONE traced program per video
    (the reference's RTMO / YOLO-pose pipeline head,
    rtmlib_api.py:47-74, feeding a tracker). Like
    :func:`fused_detect_track` but the detector also emits per-detection
    keypoints which ride along to the output.

    Returns ``(final_state, dets|None, keypoints (F, D, K, 3), outs)``.
    """
    F = frames.shape[0]
    if F % chunk:
        raise ValueError(f"frames ({F}) must be a multiple of chunk "
                         f"({chunk}); pad with frame_valid=False")
    n_chunks = F // chunk

    def to_chunks(x):
        return x.reshape((n_chunks, chunk) + x.shape[1:])

    xs = {"frames": to_chunks(frames),
          "frame_base": jnp.arange(n_chunks, dtype=jnp.int32) * chunk}
    if meta is not None:
        xs["meta"] = jax.tree_util.tree_map(to_chunks, meta)
    if frame_valid is not None:
        xs["frame_valid"] = to_chunks(frame_valid)

    def body(state, x):
        dets, kp = detect_fn(x["frames"], x.get("meta"))
        D = dets.ref.shape[1]
        frame_idx = x["frame_base"] + jnp.arange(chunk, dtype=jnp.int32)
        dets = dets._replace(
            ref=frame_idx[:, None] * D
            + jnp.arange(D, dtype=jnp.int32)[None, :])
        if "frame_valid" in x:
            dets = dets._replace(
                valid=dets.valid & x["frame_valid"][:, None])
        kp = kp * dets.valid[..., None, None]
        trk_dets = dets._replace(
            valid=dets.valid & (dets.conf > min_confidence))
        state, out = lax.scan(step_fn, state, trk_dets)
        return state, (dets if return_detections else None, kp, out)

    final, (dets, kp, outs) = lax.scan(body, init_state, xs)

    def flat(x):
        return x.reshape((F,) + x.shape[2:])

    outs = jax.tree_util.tree_map(flat, outs)
    kp = flat(kp)
    if return_detections:
        dets = jax.tree_util.tree_map(flat, dets)
    return final, dets, kp, outs


def fused_detect_track(detect_fn, step_fn, init_state, frames: jnp.ndarray,
                       chunk: int, meta=None, frame_valid=None,
                       reset=None,
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
      reset: optional (F,) bool — True at frames where the tracker carry
        must re-initialize (each video's first frame in a TIME-CONCAT
        multi-video stream, trackers/common.reset_wrapped_step). Each
        segment's tracker outputs are then bit-identical to its own
        single-video run (refs stay stream-global: frame * D + slot).
      return_detections: also return the per-frame Detections the tracker
        consumed (the engine fast path exports them as the detector
        module's DataFrame rows).

    Returns ``(final_state, dets|None, outs)`` where ``dets``/``outs``
    leaves have leading axis F.
    """
    from tracklab_tpu.trackers.common import reset_wrapped_step

    F = frames.shape[0]
    if F % chunk:
        raise ValueError(f"frames ({F}) must be a multiple of chunk "
                         f"({chunk}); pad with frame_valid=False")
    n_chunks = F // chunk

    def to_chunks(x):
        return x.reshape((n_chunks, chunk) + x.shape[1:])

    xs = {"frames": to_chunks(frames),
          # per-chunk first-frame index -> video-global detection refs
          # (frame * D + slot), so a coasting track's stale ref resolves
          # unambiguously across the whole video (the engine join
          # semantics, scan_tracker._pad_video)
          "frame_base": jnp.arange(n_chunks, dtype=jnp.int32) * chunk}
    if meta is not None:
        xs["meta"] = jax.tree_util.tree_map(to_chunks, meta)
    if frame_valid is not None:
        xs["frame_valid"] = to_chunks(frame_valid)
    if reset is not None:
        xs["reset"] = to_chunks(reset)

    def body(state, x):
        dets = detect_fn(x["frames"], x.get("meta"))
        D = dets.ref.shape[1]
        frame_idx = x["frame_base"] + jnp.arange(chunk, dtype=jnp.int32)
        dets = dets._replace(
            ref=frame_idx[:, None] * D
            + jnp.arange(D, dtype=jnp.int32)[None, :])
        if "frame_valid" in x:
            dets = dets._replace(
                valid=dets.valid & x["frame_valid"][:, None])
        if "reset" in x:
            state, out = lax.scan(
                reset_wrapped_step(step_fn, init_state), state,
                (dets, x["reset"]))
        else:
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


def fused_detect_track_concat(detect_fn, step_fn, init_state,
                              videos: jnp.ndarray, chunk: int, meta=None,
                              frame_valid=None,
                              return_detections: bool = True):
    """Run V videos through the fused detect->track program as ONE
    dispatch: the videos time-concatenate into a single (V*F) stream
    with the tracker carry reset at each video's first frame
    (trackers/common.reset_wrapped_step — the same single-chip
    multi-video mode the tracker-only path measured at 2x aggregate
    fps vs sequential per-video dispatches, BASELINE.md). Per-video
    outputs are bit-identical to V separate :func:`fused_detect_track`
    runs (tests/test_fused_engine.py), except detection refs which are
    stream-global (video v's frame f ref base is ``(v*F + f) * D``).

    Args:
      videos: (V, F, H, W, 3) with ``(V*F) % chunk == 0``.
      meta / frame_valid: optional pytrees with leading (V, F) axes.

    Returns ``(final_state, dets|None, outs)`` with leading (V, F) axes
    on dets/outs leaves; ``final_state`` is the LAST video's final carry.
    """
    from tracklab_tpu.trackers.common import concat_resets

    V, F = videos.shape[0], videos.shape[1]

    def cat(x):
        return x.reshape((V * F,) + x.shape[2:])

    final, dets, outs = fused_detect_track(
        detect_fn, step_fn, init_state, cat(videos), chunk,
        meta=None if meta is None
        else jax.tree_util.tree_map(cat, meta),
        frame_valid=None if frame_valid is None else cat(frame_valid),
        reset=concat_resets(V, F),
        return_detections=return_detections)

    def split(x):
        return x.reshape((V, F) + x.shape[1:])

    outs = jax.tree_util.tree_map(split, outs)
    if return_detections:
        dets = jax.tree_util.tree_map(split, dets)
    return final, dets, outs


def _bucketed_embed(embed_fn, frames, boxes, valid, buckets):
    """Run ``embed_fn`` on only the live slot PREFIX, bucketed.

    NMS/top-k detections are score-descending, so ``valid`` is a slot
    prefix per frame (tested: test_fused_engine's min_confidence mask
    proof). Embedding slots that are invalid in EVERY frame of the chunk
    is pure waste — the results are zeroed right after. ``buckets``
    (ascending, last == D) picks the smallest static width covering the
    chunk's max live count and lax.switches between per-width programs;
    outputs are zero-padded back to D, which equals what the full-width
    program computes after its own ``* valid`` masking (exactness test:
    test_fused_engine.py). The same column-compaction idea as the JV
    solver's (BASELINE.md: 1104 -> 5917 fps)."""
    D = boxes.shape[1]
    if not buckets or buckets[-1] != D or list(buckets) != sorted(buckets):
        raise ValueError(
            f"embed_buckets must be ascending and end at max_dets "
            f"({D}); got {buckets}")
    d_live = jnp.max(jnp.sum(valid, axis=1))

    def branch(d_eff):
        def run(fb):
            frames, boxes = fb
            out = embed_fn(frames, boxes[:, :d_eff])
            return jax.tree_util.tree_map(
                lambda v: jnp.pad(
                    v, ((0, 0), (0, D - d_eff)) + ((0, 0),) * (v.ndim - 2)),
                out)
        return run

    idx = jnp.searchsorted(jnp.asarray(buckets), d_live)
    return lax.switch(idx, [branch(d) for d in buckets],
                      (frames, boxes))


def fused_detect_reid_track(detect_fn, embed_fn, step_fn, init_state,
                            frames: jnp.ndarray, chunk: int, meta=None,
                            crop_meta=None, warps=None, frame_valid=None,
                            min_confidence: float = 0.0,
                            embed_dim: int | None = None,
                            embed_buckets=None,
                            return_detections: bool = True,
                            return_embeddings: bool = False):
    """Detector -> NMS -> device crops -> ReID embed -> embedding tracker,
    ONE traced program per video (the reference's BASELINE config-2
    pipeline, e.g. YOLOX + OSNet + StrongSORT, run module-by-module
    through pandas in tracklab/engine/engine.py:148-185).

    Args:
      detect_fn: ``(frames_chunk, meta_chunk|None) -> Detections``.
      embed_fn: ``(frames_chunk, boxes (B, D, 4)) -> dict`` with
        ``embeddings`` (B, D, E) (:func:`make_osnet_embed_fn`); crops are
        taken from the detector's own input frames.
      step_fn: 3-input tracker step ``(state, (Detections, emb, warp)) ->
        (state, out)`` (strongsort/botsort/deepocsort_step).
      crop_meta: optional per-frame affine mapping detector-output box
        coordinates back into frame pixel coordinates for cropping:
        ``{"scale": (F, 2), "pad": (F, 2)}`` with
        ``frame_xy = out_xy * scale + pad`` (the exact inverse of the
        detect_fn's unletterbox). Identity when None.
      warps: optional (F, 2, 3) per-frame camera-compensation warps
        (the gmc_warp column); identity when None.
      min_confidence: the tracker wrapper's pre-filter
        (scan_tracker.py: ``bbox_conf > min_confidence`` drops rows
        before padding). NMS/top-k output is score-descending per frame,
        so masking is slot-for-slot equivalent to the staged row drop.
      embed_dim: tracker's embedding width; the ReID output is
        sliced/zero-padded to it (scan_tracker._collect_embeddings).
      embed_buckets: optional ascending static widths (last must equal
        max_dets) for live-prefix compaction of the ReID stage — embed
        only the smallest bucket covering the chunk's max live count
        (:func:`_bucketed_embed`; output-identical, compiles one embed
        program per bucket).

    Returns ``(final_state, dets|None, emb|None, outs)``; ``emb`` is the
    full (F, D, E) ReID output dict when ``return_embeddings``.
    """
    F = frames.shape[0]
    if F % chunk:
        raise ValueError(f"frames ({F}) must be a multiple of chunk "
                         f"({chunk}); pad with frame_valid=False")
    n_chunks = F // chunk

    def to_chunks(x):
        return x.reshape((n_chunks, chunk) + x.shape[1:])

    xs = {"frames": to_chunks(frames),
          "frame_base": jnp.arange(n_chunks, dtype=jnp.int32) * chunk}
    if meta is not None:
        xs["meta"] = jax.tree_util.tree_map(to_chunks, meta)
    if crop_meta is not None:
        xs["crop_meta"] = jax.tree_util.tree_map(to_chunks, crop_meta)
    if warps is not None:
        xs["warps"] = to_chunks(warps)
    if frame_valid is not None:
        xs["frame_valid"] = to_chunks(frame_valid)

    def body(state, x):
        dets = detect_fn(x["frames"], x.get("meta"))
        D = dets.ref.shape[1]
        frame_idx = x["frame_base"] + jnp.arange(chunk, dtype=jnp.int32)
        dets = dets._replace(
            ref=frame_idx[:, None] * D
            + jnp.arange(D, dtype=jnp.int32)[None, :])
        if "frame_valid" in x:
            dets = dets._replace(
                valid=dets.valid & x["frame_valid"][:, None])

        # ---- ReID crops in frame coordinates ----
        boxes = dets.ltrb
        if "crop_meta" in x:
            s = x["crop_meta"]["scale"][:, None, :]
            p = x["crop_meta"]["pad"][:, None, :]
            lo = boxes[..., 0:2] * s + p
            hi = boxes[..., 2:4] * s + p
            boxes = jnp.concatenate([lo, hi], axis=-1)
        if embed_buckets is not None:
            reid = _bucketed_embed(embed_fn, x["frames"], boxes,
                                   dets.valid, tuple(embed_buckets))
        else:
            reid = embed_fn(x["frames"], boxes)
        emb = reid["embeddings"]
        # the staged ReID module only emits rows for valid detections;
        # downstream consumers see zeros elsewhere
        reid = jax.tree_util.tree_map(
            lambda v: v * dets.valid.reshape(
                dets.valid.shape + (1,) * (v.ndim - 2)), reid)
        emb = emb * dets.valid[..., None]
        E = emb.shape[-1]
        if embed_dim is not None and E != embed_dim:
            if E > embed_dim:
                emb = emb[..., :embed_dim]
            else:
                emb = jnp.pad(emb, ((0, 0), (0, 0), (0, embed_dim - E)))

        # ---- tracker: wrapper min_confidence pre-filter as a mask ----
        trk_dets = dets._replace(
            valid=dets.valid & (dets.conf > min_confidence))
        emb = emb * trk_dets.valid[..., None]
        warp = x.get("warps")
        if warp is None:
            warp = jnp.broadcast_to(jnp.eye(2, 3, dtype=jnp.float32),
                                    (chunk, 2, 3))
        state, out = lax.scan(step_fn, state, (trk_dets, emb, warp))
        ys = (dets if return_detections else None,
              reid if return_embeddings else None, out)
        return state, ys

    final, (dets, reid, outs) = lax.scan(body, init_state, xs)

    def flat(x):
        return x.reshape((F,) + x.shape[2:])

    outs = jax.tree_util.tree_map(flat, outs)
    if return_detections:
        dets = jax.tree_util.tree_map(flat, dets)
    if return_embeddings:
        reid = jax.tree_util.tree_map(flat, reid)
    return final, dets, reid, outs


def fused_detect_pose_track(detect_fn, pose_fn, step_fn, init_state,
                            frames: jnp.ndarray, chunk: int, meta=None,
                            crop_meta=None, frame_valid=None,
                            min_confidence: float = 0.0,
                            pose_buckets=None,
                            return_detections: bool = True):
    """Detector -> NMS -> device crops -> top-down pose -> tracker, ONE
    traced program per video (the reference's PoseTrack pipeline shape:
    detect, pose per detection, track — run module-by-module through
    pandas, tracklab/engine/engine.py:148-185).

    The pose output rides alongside: the tracker consumes the boxes
    (2-input step like :func:`fused_detect_track`); keypoints are
    computed per detection slot from the detector's own frames and
    returned mapped to ORIGINAL image coordinates (the crop_meta
    inverse), matching the staged batched pose module's output
    (wrappers/pose_estimator/batched_api.py:process).

    ``pose_buckets``: optional live-prefix compaction widths for the
    pose stage, exactly like ``fused_detect_reid_track``'s
    ``embed_buckets`` (ascending, last == max_dets; output-identical).

    Returns ``(final_state, dets|None, keypoints (F, D, K, 3), outs)``.
    """
    F = frames.shape[0]
    if F % chunk:
        raise ValueError(f"frames ({F}) must be a multiple of chunk "
                         f"({chunk}); pad with frame_valid=False")
    n_chunks = F // chunk

    def to_chunks(x):
        return x.reshape((n_chunks, chunk) + x.shape[1:])

    xs = {"frames": to_chunks(frames),
          "frame_base": jnp.arange(n_chunks, dtype=jnp.int32) * chunk}
    if meta is not None:
        xs["meta"] = jax.tree_util.tree_map(to_chunks, meta)
    if crop_meta is not None:
        xs["crop_meta"] = jax.tree_util.tree_map(to_chunks, crop_meta)
    if frame_valid is not None:
        xs["frame_valid"] = to_chunks(frame_valid)

    def body(state, x):
        dets = detect_fn(x["frames"], x.get("meta"))
        D = dets.ref.shape[1]
        frame_idx = x["frame_base"] + jnp.arange(chunk, dtype=jnp.int32)
        dets = dets._replace(
            ref=frame_idx[:, None] * D
            + jnp.arange(D, dtype=jnp.int32)[None, :])
        if "frame_valid" in x:
            dets = dets._replace(
                valid=dets.valid & x["frame_valid"][:, None])

        boxes = dets.ltrb
        if "crop_meta" in x:
            s = x["crop_meta"]["scale"][:, None, :]
            p = x["crop_meta"]["pad"][:, None, :]
            boxes = jnp.concatenate([boxes[..., 0:2] * s + p,
                                     boxes[..., 2:4] * s + p], axis=-1)
        if pose_buckets is not None:
            # live-prefix compaction, same as the ReID stage
            # (_bucketed_embed): pose only the slots that can be live
            kp = _bucketed_embed(pose_fn, x["frames"], boxes,
                                 dets.valid, tuple(pose_buckets))
        else:
            kp = pose_fn(x["frames"], boxes)         # frame coords
        if "crop_meta" in x:
            s = x["crop_meta"]["scale"][:, None, None, :]
            p = x["crop_meta"]["pad"][:, None, None, :]
            kp = jnp.concatenate([(kp[..., 0:2] - p) / s, kp[..., 2:3]],
                                 axis=-1)
        kp = kp * dets.valid[..., None, None]

        trk_dets = dets._replace(
            valid=dets.valid & (dets.conf > min_confidence))
        state, out = lax.scan(step_fn, state, trk_dets)
        return state, (dets if return_detections else None, kp, out)

    final, (dets, kp, outs) = lax.scan(body, init_state, xs)

    def flat(x):
        return x.reshape((F,) + x.shape[2:])

    outs = jax.tree_util.tree_map(flat, outs)
    kp = flat(kp)
    if return_detections:
        dets = jax.tree_util.tree_map(flat, dets)
    return final, dets, kp, outs


def fused_detect_parts_track(detect_fn, embed_fn, step_fn, init_state,
                             frames: jnp.ndarray, chunk: int, meta=None,
                             crop_meta=None, warps=None, frame_valid=None,
                             min_confidence: float = 0.0,
                             n_parts: int = 5, embed_dim: int = 512,
                             n_keypoints: int = 17, pose_fn=None,
                             embed_buckets=None,
                             return_detections: bool = True,
                             return_embeddings: bool = False):
    """Detector -> NMS -> device crops [-> top-down pose] -> KPR part
    features -> BPBReID-StrongSORT, ONE traced program per video (the
    reference's game-state/BPBReID pipeline prefix run module-by-module
    through pandas, tracklab/engine/engine.py:148-185).

    Like :func:`fused_detect_reid_track` but for the 5-input part-based
    tracker step ``(state, (Detections, feat (D, P, E), vis (D, P),
    kps (D, K, 3), warp)) -> (state, out)`` (bpbreid_step). The ReID
    output's part layout (P', E') is sliced/zero-padded to the tracker's
    (P, E) exactly like the staged collection
    (scan_tracker.BPBReIDStrongSORT.process: r=min(P', P), c=min(E', E),
    visibility 0 masks padded parts).

    With ``pose_fn`` (the FULL pose-tracking prefix): keypoints are
    estimated per detection from the same frames, rasterized into the
    KPR keypoint prompts on device (embed_fn's ``keypoints`` argument),
    fed to the tracker's OKS-motion input in original-image
    coordinates, and returned for the pose module's DataFrame. Without
    it the prompts and tracker keypoints are zero — matching the staged
    3-module pipeline where the keypoints_xyc column is absent.

    ``min_confidence`` follows the BPBReID wrapper semantics: applied
    only when > 0 (scan_tracker.py: ``if self.min_confidence > 0``).

    ``embed_buckets``: optional live-prefix compaction widths (ascending,
    last == max_dets), exactly like ``fused_detect_reid_track``'s — the
    KPR forward (by far the most expensive stage: a ViT-B crop batch)
    AND, when present, the pose stage run only on the smallest static
    slot-prefix covering the chunk's max live count, inside ONE
    ``lax.switch`` (:func:`_bucketed_embed` over the combined stage);
    outputs are zero-padded back to max_dets, identical to what the
    full-width program computes after its own validity masking.

    Returns ``(final_state, dets|None, reid|None, kp|None, outs)``.
    """
    F = frames.shape[0]
    if F % chunk:
        raise ValueError(f"frames ({F}) must be a multiple of chunk "
                         f"({chunk}); pad with frame_valid=False")
    n_chunks = F // chunk

    def to_chunks(x):
        return x.reshape((n_chunks, chunk) + x.shape[1:])

    xs = {"frames": to_chunks(frames),
          "frame_base": jnp.arange(n_chunks, dtype=jnp.int32) * chunk}
    if meta is not None:
        xs["meta"] = jax.tree_util.tree_map(to_chunks, meta)
    if crop_meta is not None:
        xs["crop_meta"] = jax.tree_util.tree_map(to_chunks, crop_meta)
    if warps is not None:
        xs["warps"] = to_chunks(warps)
    if frame_valid is not None:
        xs["frame_valid"] = to_chunks(frame_valid)

    def body(state, x):
        dets = detect_fn(x["frames"], x.get("meta"))
        D = dets.ref.shape[1]
        frame_idx = x["frame_base"] + jnp.arange(chunk, dtype=jnp.int32)
        dets = dets._replace(
            ref=frame_idx[:, None] * D
            + jnp.arange(D, dtype=jnp.int32)[None, :])
        if "frame_valid" in x:
            dets = dets._replace(
                valid=dets.valid & x["frame_valid"][:, None])

        boxes = dets.ltrb
        if "crop_meta" in x:
            s = x["crop_meta"]["scale"][:, None, :]
            p = x["crop_meta"]["pad"][:, None, :]
            boxes = jnp.concatenate([boxes[..., 0:2] * s + p,
                                     boxes[..., 2:4] * s + p], axis=-1)

        # prompts are crop-relative: frame-coord keypoints + frame-coord
        # boxes give the same maps as the staged original-coord pair
        def stage(fr, bx):
            if pose_fn is None:
                return {"reid": embed_fn(fr, bx)}
            kpf = pose_fn(fr, bx)                      # frame coords
            return {"reid": embed_fn(fr, bx, kpf), "kp": kpf}

        if embed_buckets is not None:
            # live-prefix compaction of the WHOLE pose+KPR stage: one
            # switch, slots beyond the bucket zero-padded back (equal to
            # the full-width program after its validity masking below)
            st = _bucketed_embed(stage, x["frames"], boxes,
                                 dets.valid, tuple(embed_buckets))
        else:
            st = stage(x["frames"], boxes)
        reid = st["reid"]
        kp_frame = st.get("kp")

        kp_orig = None
        if kp_frame is not None:
            kp_orig = kp_frame
            if "crop_meta" in x:
                s = x["crop_meta"]["scale"][:, None, None, :]
                p = x["crop_meta"]["pad"][:, None, None, :]
                kp_orig = jnp.concatenate(
                    [(kp_frame[..., 0:2] - p) / s, kp_frame[..., 2:3]],
                    axis=-1)
            kp_orig = kp_orig * dets.valid[..., None, None]
        reid = jax.tree_util.tree_map(
            lambda v: v * dets.valid.reshape(
                dets.valid.shape + (1,) * (v.ndim - 2)), reid)
        emb, vis = reid["embeddings"], reid["visibility"]

        # part-layout fit (staged collection: r=min, zero-pad the rest)
        P, E = n_parts, embed_dim
        feat = emb[:, :, :P, :E]
        feat = jnp.pad(feat, ((0, 0), (0, 0),
                              (0, P - feat.shape[2]),
                              (0, E - feat.shape[3])))
        visf = vis[:, :, :P]
        visf = jnp.pad(visf, ((0, 0), (0, 0), (0, P - visf.shape[2])))

        trk_dets = dets
        if min_confidence > 0:
            trk_dets = dets._replace(
                valid=dets.valid & (dets.conf > min_confidence))
        feat = feat * trk_dets.valid[..., None, None]
        visf = visf * trk_dets.valid[..., None]
        if kp_orig is None:
            kps = jnp.zeros((chunk, D, n_keypoints, 3), jnp.float32)
        else:
            # staged collection slices/zero-pads rows to the tracker's K
            kps = kp_orig[:, :, :n_keypoints]
            kps = jnp.pad(kps, ((0, 0), (0, 0),
                                (0, n_keypoints - kps.shape[2]),
                                (0, 0)))
            kps = kps * trk_dets.valid[..., None, None]
        warp = x.get("warps")
        if warp is None:
            warp = jnp.broadcast_to(jnp.eye(2, 3, dtype=jnp.float32),
                                    (chunk, 2, 3))
        state, out = lax.scan(step_fn, state,
                              (trk_dets, feat, visf, kps, warp))
        ys = (dets if return_detections else None,
              reid if return_embeddings else None, kp_orig, out)
        return state, ys

    final, (dets, reid, kp, outs) = lax.scan(body, init_state, xs)

    def flat(x):
        return x.reshape((F,) + x.shape[2:])

    outs = jax.tree_util.tree_map(flat, outs)
    if return_detections:
        dets = jax.tree_util.tree_map(flat, dets)
    if return_embeddings:
        reid = jax.tree_util.tree_map(flat, reid)
    if kp is not None:
        kp = flat(kp)
    return final, dets, reid, kp, outs


def _collect_frames(detector, loader):
    """Drain the detector's loader: (frame_ids, images (F, H, W, 3),
    letterbox meta dict), frames padded to a multiple of the detector's
    batch size with a frame_valid mask."""
    import numpy as np

    frame_ids, imgs, scales, pads, shapes = [], [], [], [], []
    for ids, samples in loader:
        frame_ids.extend(np.asarray(ids).tolist())
        imgs.append(np.asarray(samples["image"]))
        scales.append(np.asarray(samples["scale"], np.float32))
        pads.append(np.asarray(samples["pad"], np.float32))
        shapes.append(np.asarray(samples["shape"], np.float32))
    if not frame_ids:
        return [], None, None, 0, 0, None
    images = np.concatenate(imgs)
    meta = {"scale": np.concatenate(scales),
            "pad": np.concatenate(pads),
            "shape": np.concatenate(shapes)}
    F0 = len(frame_ids)
    chunk = min(max(int(getattr(detector, "batch_size", 8)), 1), F0)
    F_pad = ((F0 + chunk - 1) // chunk) * chunk
    if F_pad > F0:
        pad_n = F_pad - F0
        images = np.concatenate(
            [images, np.zeros((pad_n,) + images.shape[1:],
                              images.dtype)])
        meta = {k: np.concatenate(
            [v, np.ones((pad_n,) + v.shape[1:], v.dtype)])
            for k, v in meta.items()}
    frame_valid = np.arange(F_pad) < F0
    return frame_ids, images, meta, F0, chunk, frame_valid


def _detector_df(detector, dets, frame_ids, metadatas, F0, F_pad):
    """Fused Detections -> the detector module's output DataFrame with
    exactly the staged path's row semantics and global row-id assignment
    (yolox_api.process), plus the ref->row-id lut for the tracker join."""
    import numpy as np
    import pandas as pd

    D = dets.valid.shape[1]
    valid = np.asarray(dets.valid[:F0])
    ltrb = np.asarray(dets.ltrb[:F0])
    score = np.asarray(dets.conf[:F0])
    cls = np.asarray(dets.cls[:F0])
    lut = np.full(F_pad * D, -1, np.int64)
    rows = []
    for f in range(F0):
        image_id = frame_ids[f]
        md = metadatas.loc[image_id]
        for d in np.nonzero(valid[f])[0]:
            box = ltrb[f, d]
            lt = box[:2]
            wh = box[2:] - box[:2]
            rows.append(pd.Series(dict(
                image_id=image_id,
                video_id=md.video_id,
                category_id=int(cls[f, d]) + detector.class_offset,
                bbox_ltwh=np.concatenate([lt, wh]).astype(np.float32),
                bbox_conf=float(score[f, d]),
            ), name=detector.id))
            lut[f * D + d] = detector.id
            detector.id += 1
    det_df = pd.DataFrame(rows) if rows else pd.DataFrame()
    return det_df, lut


def run_fused_video(detector, tracker, loader, metadatas):
    """Host orchestration of the fused fast path for one video.

    Collects the detector's host-preprocessed letterboxed frames (decode
    stays on the loader's threads), runs ONE fused device program
    (detector -> NMS -> device unletterbox -> tracker scan), and emits
    both modules' output DataFrames with exactly the staged path's
    public columns and row-id assignment (yolox_api.process /
    scan_tracker._emissions_to_df). Used by OfflineTrackingEngine when
    ``fused=true`` and the first two pipeline modules support it.
    """
    import numpy as np
    import pandas as pd

    frame_ids, images, meta, F0, chunk, frame_valid = _collect_frames(
        detector, loader)
    if not frame_ids:
        return pd.DataFrame(), pd.DataFrame()

    detect_fn = detector.device_detect_fn()
    D = detector.max_dets
    cfg = tracker._make_config()
    trk_D = cfg.max_dets
    base_step = tracker._step_fn()
    init_state = tracker._init_state(cfg)
    min_conf = float(getattr(tracker, "min_confidence", 0.0))

    def step(state, det):
        if trk_D < D:
            det = Detections(*[x[:trk_D] for x in det])
        # the wrapper's pre-filter (bbox_conf > min_confidence) as a
        # mask: NMS output is score-descending, so slots align
        det = det._replace(valid=det.valid & (det.conf > min_conf))
        return base_step(cfg, state, det)

    runner = jax.jit(lambda f, m, v: fused_detect_track(
        detect_fn, step, init_state, f, chunk, meta=m, frame_valid=v))
    _, dets, outs = runner(
        jnp.asarray(images),
        {k: jnp.asarray(v) for k, v in meta.items()},
        jnp.asarray(frame_valid))

    det_df, lut = _detector_df(detector, dets, frame_ids, metadatas,
                               F0, len(frame_valid))

    # ---- tracker DataFrame (same join as the staged whole-video scan)
    trk_df = tracker._emissions_to_df(outs, F0, lut)
    if len(trk_df):
        trk_df = trk_df[trk_df.index >= 0]
    return det_df, trk_df


def run_fused_pose_video(detector, pose, tracker, loader, metadatas):
    """Host orchestration of the 3-module fused fast path for one video:
    detector -> NMS -> device crops -> top-down pose -> tracker as ONE
    device program (:func:`fused_detect_pose_track`). The tracker
    consumes boxes (2-input step); keypoints ride alongside and are
    emitted as the pose module's DataFrame (keypoints_xyc /
    keypoints_conf, batched_api.process row semantics) in original
    image coordinates."""
    import numpy as np
    import pandas as pd

    frame_ids, images, meta, F0, chunk, frame_valid = _collect_frames(
        detector, loader)
    if not frame_ids:
        return pd.DataFrame(), pd.DataFrame(), pd.DataFrame()
    F_pad = len(frame_valid)

    detect_fn = detector.device_detect_fn()
    crop_meta = detector.crop_meta(meta)
    pose_fn = pose.device_pose_fn()
    D = detector.max_dets
    cfg = tracker._make_config()
    trk_D = cfg.max_dets
    base_step = tracker._step_fn()
    init_state = tracker._init_state(cfg)
    min_conf = float(getattr(tracker, "min_confidence", 0.0))

    def step(state, det):
        if trk_D < D:
            det = Detections(*[x[:trk_D] for x in det])
        return base_step(cfg, state, det)

    runner = jax.jit(lambda f, m, cm, v: fused_detect_pose_track(
        detect_fn, pose_fn, step, init_state, f, chunk, meta=m,
        crop_meta=cm, frame_valid=v, min_confidence=min_conf))
    _, dets, kp, outs = runner(
        jnp.asarray(images),
        {k: jnp.asarray(v) for k, v in meta.items()},
        {k: jnp.asarray(v) for k, v in crop_meta.items()},
        jnp.asarray(frame_valid))

    det_df, lut = _detector_df(detector, dets, frame_ids, metadatas,
                               F0, F_pad)

    # ---- pose DataFrame (batched_api.process row semantics) ----
    valid = np.asarray(dets.valid[:F0])
    kp = np.asarray(kp[:F0], np.float32)
    idx, kps, confs = [], [], []
    for f in range(F0):
        for d in np.nonzero(valid[f])[0]:
            idx.append(lut[f * D + d])
            kps.append(kp[f, d])
            confs.append(float(kp[f, d, :, 2].mean()))
    pose_df = pd.DataFrame(index=idx)
    pose_df["keypoints_xyc"] = kps
    pose_df["keypoints_conf"] = confs

    trk_df = tracker._emissions_to_df(outs, F0, lut)
    if len(trk_df):
        trk_df = trk_df[trk_df.index >= 0]
    return det_df, pose_df, trk_df


def run_fused_parts_video(detector, reid, tracker, loader, metadatas):
    """Host orchestration of the 3-module fused fast path for one video:
    detector -> NMS -> device crops -> KPR part features ->
    BPBReID-StrongSORT as ONE device program
    (:func:`fused_detect_parts_track`). Emits all three modules'
    DataFrames with the staged path's columns and row ids (the ReID df
    carries the full part-layout embeddings + visibility_scores,
    kpr_api.process; the tracker df carries the KF boxes + lifecycle
    counters, scan_tracker.BPBReIDStrongSORT._bpb_emissions_to_df)."""
    import numpy as np
    import pandas as pd

    frame_ids, images, meta, F0, chunk, frame_valid = _collect_frames(
        detector, loader)
    if not frame_ids:
        return pd.DataFrame(), pd.DataFrame(), pd.DataFrame()
    F_pad = len(frame_valid)

    detect_fn = detector.device_detect_fn()
    crop_meta = detector.crop_meta(meta)
    embed_fn = reid.device_embed_fn()
    D = detector.max_dets
    cfg = tracker._make_config()
    trk_D = cfg.max_dets
    init_state = tracker._init_state(cfg)
    min_conf = float(getattr(tracker, "min_confidence", 0.0))

    warps = np.broadcast_to(np.eye(2, 3, dtype=np.float32),
                            (F_pad, 2, 3)).copy()
    if "gmc_warp" in metadatas.columns \
            and not getattr(tracker, "cmc_off", False):
        for f, fid in enumerate(frame_ids):
            w = metadatas.loc[fid, "gmc_warp"]
            if isinstance(w, np.ndarray) and w.shape == (2, 3):
                warps[f] = w

    from tracklab_tpu.trackers.bpbreid_strongsort import bpbreid_step

    def step(state, inputs):
        det, feat, vis, kps, warp = inputs
        if trk_D < D:
            det = Detections(*[x[:trk_D] for x in det])
            feat, vis, kps = feat[:trk_D], vis[:trk_D], kps[:trk_D]
        return bpbreid_step(cfg, state, (det, feat, vis, kps, warp))

    buckets = getattr(reid, "embed_buckets", None)
    runner = jax.jit(lambda f, m, cm, w, v: fused_detect_parts_track(
        detect_fn, embed_fn, step, init_state, f, chunk, meta=m,
        crop_meta=cm, warps=w, frame_valid=v,
        min_confidence=min_conf, n_parts=tracker.n_parts,
        embed_dim=tracker.embed_dim, n_keypoints=tracker.n_keypoints,
        embed_buckets=buckets, return_embeddings=True))
    _, dets, reid_out, _, outs = runner(
        jnp.asarray(images),
        {k: jnp.asarray(v) for k, v in meta.items()},
        {k: jnp.asarray(v) for k, v in crop_meta.items()},
        jnp.asarray(warps), jnp.asarray(frame_valid))

    det_df, lut = _detector_df(detector, dets, frame_ids, metadatas,
                               F0, F_pad)

    # ---- ReID DataFrame (kpr_api.process row semantics) ----
    valid = np.asarray(dets.valid[:F0])
    emb = np.asarray(reid_out["embeddings"][:F0], np.float32)
    vis = np.asarray(reid_out["visibility"][:F0], np.float32)
    idx, embs, viss = [], [], []
    for f in range(F0):
        for d in np.nonzero(valid[f])[0]:
            idx.append(lut[f * D + d])
            embs.append(emb[f, d])
            viss.append(vis[f, d])
    reid_df = pd.DataFrame(index=idx)
    reid_df["embeddings"] = embs
    reid_df["visibility_scores"] = viss

    # reconstruct the tracker's consumed detections (truncation +
    # conditional pre-filter) so the emit_costs instrumentation can
    # attribute per-detection cost rows exactly like the staged path
    trk_dets = dets
    if trk_D < D:
        trk_dets = Detections(*[x[:, :trk_D] for x in dets])
    if min_conf > 0:
        trk_dets = trk_dets._replace(
            valid=trk_dets.valid & (trk_dets.conf > min_conf))
    trk_df = tracker._bpb_emissions_to_df(outs, F0, lut, dets=trk_dets)
    if len(trk_df):
        trk_df = trk_df[trk_df.index >= 0]
    return det_df, reid_df, trk_df


def run_fused_bottomup_video(detector, tracker, loader, metadatas):
    """Host orchestration of the fused bottom-up fast path for one
    video: bottom-up pose model -> boxes-from-keypoints -> tracker as
    ONE device program (:func:`fused_bottomup_track`). Emits the pose
    module's DataFrame with the staged path's columns (bbox + keypoints,
    bottomup_api.py:process row semantics) and the tracker DataFrame."""
    import numpy as np
    import pandas as pd

    frame_ids, images, meta, F0, chunk, frame_valid = _collect_frames(
        detector, loader)
    if not frame_ids:
        return pd.DataFrame(), pd.DataFrame()
    F_pad = len(frame_valid)

    detect_fn = detector.device_detect_fn()
    D = detector.max_dets
    cfg = tracker._make_config()
    trk_D = cfg.max_dets
    base_step = tracker._step_fn()
    init_state = tracker._init_state(cfg)
    min_conf = float(getattr(tracker, "min_confidence", 0.0))

    def step(state, det):
        if trk_D < D:
            det = Detections(*[x[:trk_D] for x in det])
        det = det._replace(valid=det.valid & (det.conf > min_conf))
        return base_step(cfg, state, det)

    runner = jax.jit(lambda f, m, v: fused_bottomup_track(
        detect_fn, step, init_state, f, chunk, meta=m, frame_valid=v))
    _, dets, kp, outs = runner(
        jnp.asarray(images),
        {k: jnp.asarray(v) for k, v in meta.items()},
        jnp.asarray(frame_valid))

    # ---- pose-detector DataFrame (bottomup_api.process semantics) ----
    valid = np.asarray(dets.valid[:F0])
    ltrb = np.asarray(dets.ltrb[:F0])
    score = np.asarray(dets.conf[:F0])
    kp = np.asarray(kp[:F0], np.float32)
    lut = np.full(F_pad * D, -1, np.int64)
    rows = []
    for f in range(F0):
        image_id = frame_ids[f]
        md = metadatas.loc[image_id]
        for d in np.nonzero(valid[f])[0]:
            box = ltrb[f, d]
            lt = box[:2]
            wh = box[2:] - box[:2]
            rows.append(pd.Series(dict(
                image_id=image_id,
                video_id=md.video_id,
                category_id=1,
                bbox_ltwh=np.concatenate([lt, wh]).astype(np.float32),
                bbox_conf=float(score[f, d]),
                keypoints_xyc=kp[f, d],
                keypoints_conf=float(kp[f, d, :, 2].mean()),
            ), name=detector.id))
            lut[f * D + d] = detector.id
            detector.id += 1
    det_df = pd.DataFrame(rows) if rows else pd.DataFrame()

    trk_df = tracker._emissions_to_df(outs, F0, lut)
    if len(trk_df):
        trk_df = trk_df[trk_df.index >= 0]
    return det_df, trk_df


def run_fused_gsr_video(detector, pose, reid, tracker, loader,
                        metadatas):
    """Host orchestration of the FULL 4-module fused prefix for one
    video: detector -> NMS -> device crops -> top-down pose -> KPR part
    features (keypoint prompts rasterized on device) ->
    BPBReID-StrongSORT, ONE device program
    (:func:`fused_detect_parts_track` with ``pose_fn``) — the
    reference's pose-tracking / game-state pipeline shape. Emits all
    four modules' DataFrames with the staged path's columns and row
    ids."""
    import numpy as np
    import pandas as pd

    frame_ids, images, meta, F0, chunk, frame_valid = _collect_frames(
        detector, loader)
    if not frame_ids:
        return (pd.DataFrame(),) * 4
    F_pad = len(frame_valid)

    detect_fn = detector.device_detect_fn()
    crop_meta = detector.crop_meta(meta)
    pose_fn = pose.device_pose_fn()
    embed_fn = reid.device_embed_fn()
    D = detector.max_dets
    cfg = tracker._make_config()
    trk_D = cfg.max_dets
    init_state = tracker._init_state(cfg)
    min_conf = float(getattr(tracker, "min_confidence", 0.0))

    warps = np.broadcast_to(np.eye(2, 3, dtype=np.float32),
                            (F_pad, 2, 3)).copy()
    if "gmc_warp" in metadatas.columns \
            and not getattr(tracker, "cmc_off", False):
        for f, fid in enumerate(frame_ids):
            w = metadatas.loc[fid, "gmc_warp"]
            if isinstance(w, np.ndarray) and w.shape == (2, 3):
                warps[f] = w

    from tracklab_tpu.trackers.bpbreid_strongsort import bpbreid_step

    def step(state, inputs):
        det, feat, vis, kps, warp = inputs
        if trk_D < D:
            det = Detections(*[x[:trk_D] for x in det])
            feat, vis, kps = feat[:trk_D], vis[:trk_D], kps[:trk_D]
        return bpbreid_step(cfg, state, (det, feat, vis, kps, warp))

    buckets = getattr(reid, "embed_buckets", None)
    runner = jax.jit(lambda f, m, cm, w, v: fused_detect_parts_track(
        detect_fn, embed_fn, step, init_state, f, chunk, meta=m,
        crop_meta=cm, warps=w, frame_valid=v,
        min_confidence=min_conf, n_parts=tracker.n_parts,
        embed_dim=tracker.embed_dim, n_keypoints=tracker.n_keypoints,
        pose_fn=pose_fn, embed_buckets=buckets, return_embeddings=True))
    _, dets, reid_out, kp, outs = runner(
        jnp.asarray(images),
        {k: jnp.asarray(v) for k, v in meta.items()},
        {k: jnp.asarray(v) for k, v in crop_meta.items()},
        jnp.asarray(warps), jnp.asarray(frame_valid))

    det_df, lut = _detector_df(detector, dets, frame_ids, metadatas,
                               F0, F_pad)

    valid = np.asarray(dets.valid[:F0])

    # ---- pose DataFrame (batched_api.process row semantics) ----
    kp = np.asarray(kp[:F0], np.float32)
    idx, kps_l, confs = [], [], []
    for f in range(F0):
        for d in np.nonzero(valid[f])[0]:
            idx.append(lut[f * D + d])
            kps_l.append(kp[f, d])
            confs.append(float(kp[f, d, :, 2].mean()))
    pose_df = pd.DataFrame(index=idx)
    pose_df["keypoints_xyc"] = kps_l
    pose_df["keypoints_conf"] = confs

    # ---- ReID DataFrame (kpr_api.process row semantics) ----
    emb = np.asarray(reid_out["embeddings"][:F0], np.float32)
    vis = np.asarray(reid_out["visibility"][:F0], np.float32)
    idx, embs, viss = [], [], []
    for f in range(F0):
        for d in np.nonzero(valid[f])[0]:
            idx.append(lut[f * D + d])
            embs.append(emb[f, d])
            viss.append(vis[f, d])
    reid_df = pd.DataFrame(index=idx)
    reid_df["embeddings"] = embs
    reid_df["visibility_scores"] = viss

    trk_dets = dets
    if trk_D < D:
        trk_dets = Detections(*[x[:, :trk_D] for x in dets])
    if min_conf > 0:
        trk_dets = trk_dets._replace(
            valid=trk_dets.valid & (trk_dets.conf > min_conf))
    trk_df = tracker._bpb_emissions_to_df(outs, F0, lut, dets=trk_dets)
    if len(trk_df):
        trk_df = trk_df[trk_df.index >= 0]
    return det_df, pose_df, reid_df, trk_df


def run_fused_reid_video(detector, reid, tracker, loader, metadatas):
    """Host orchestration of the 3-module fused fast path for one video:
    detector -> NMS -> device crops -> ReID -> embedding tracker as ONE
    device program (:func:`fused_detect_reid_track`).

    The ReID crops are taken from the detector's letterboxed input
    frames (the boxes re-letterboxed on device via the detector's
    ``crop_meta``), so detection pixels never revisit the host between
    modules — the staged batched ReID module's work-image resize
    (wrappers/reid/batched_api.py:92-109) is output-equivalent when its
    work size matches the detector input. Emits all three modules'
    DataFrames with the staged path's columns and row ids. Camera warps
    (gmc_warp) are read from ``metadatas`` when a CMC module already
    populated them; identity otherwise (scan_tracker._collect_warps).
    """
    import numpy as np
    import pandas as pd

    frame_ids, images, meta, F0, chunk, frame_valid = _collect_frames(
        detector, loader)
    if not frame_ids:
        return pd.DataFrame(), pd.DataFrame(), pd.DataFrame()
    F_pad = len(frame_valid)

    detect_fn = detector.device_detect_fn()
    crop_meta = detector.crop_meta(meta)
    embed_fn = reid.device_embed_fn()
    D = detector.max_dets
    cfg = tracker._make_config()
    trk_D = cfg.max_dets
    base_step = tracker._step3()
    init_state = tracker._init_state(cfg)
    min_conf = float(getattr(tracker, "min_confidence", 0.0))
    embed_dim = int(getattr(tracker, "embed_dim", 512))

    # per-frame camera warps from an upstream CMC module, if present
    warps = np.broadcast_to(np.eye(2, 3, dtype=np.float32),
                            (F_pad, 2, 3)).copy()
    if "gmc_warp" in metadatas.columns \
            and not getattr(tracker, "cmc_off", False):
        for f, fid in enumerate(frame_ids):
            w = metadatas.loc[fid, "gmc_warp"]
            if isinstance(w, np.ndarray) and w.shape == (2, 3):
                warps[f] = w

    def step(state, inputs):
        det, emb, warp = inputs
        if trk_D < D:
            det = Detections(*[x[:trk_D] for x in det])
            emb = emb[:trk_D]
        return base_step(cfg, state, (det, emb, warp))

    buckets = getattr(reid, "embed_buckets", None)
    runner = jax.jit(lambda f, m, cm, w, v: fused_detect_reid_track(
        detect_fn, embed_fn, step, init_state, f, chunk, meta=m,
        crop_meta=cm, warps=w, frame_valid=v,
        min_confidence=min_conf, embed_dim=embed_dim,
        embed_buckets=buckets, return_embeddings=True))
    _, dets, reid_out, outs = runner(
        jnp.asarray(images),
        {k: jnp.asarray(v) for k, v in meta.items()},
        {k: jnp.asarray(v) for k, v in crop_meta.items()},
        jnp.asarray(warps), jnp.asarray(frame_valid))

    det_df, lut = _detector_df(detector, dets, frame_ids, metadatas,
                               F0, F_pad)

    # ---- ReID DataFrame (batched_api.process row semantics) ----
    valid = np.asarray(dets.valid[:F0])
    use_parts = bool(getattr(reid, "use_parts", False)) \
        and "part_features" in reid_out
    emb = np.asarray(reid_out["embeddings"][:F0], np.float32)
    if use_parts:
        parts = np.asarray(reid_out["part_features"][:F0], np.float32)
        vis = np.asarray(reid_out["visibility"][:F0], np.float32)
    idx, embs, viss = [], [], []
    for f in range(F0):
        for d in np.nonzero(valid[f])[0]:
            idx.append(lut[f * D + d])
            if use_parts:
                embs.append(parts[f, d])
                viss.append(vis[f, d])
            else:
                embs.append(emb[f, d])
                viss.append(np.ones(1, np.float32))
    reid_df = pd.DataFrame(index=idx)
    reid_df["embeddings"] = embs
    reid_df["visibility_scores"] = viss

    trk_df = tracker._emissions_to_df(outs, F0, lut)
    if len(trk_df):
        trk_df = trk_df[trk_df.index >= 0]
    return det_df, reid_df, trk_df
