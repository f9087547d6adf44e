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

__all__ = ["fused_detect_track", "make_yolox_detect_fn",
           "make_rtdetr_detect_fn"]


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

    from tracklab_tpu.utils import coordinates as C

    frame_ids, imgs, scales, pads, shapes = [], [], [], [], []
    for ids, samples in loader:
        frame_ids.extend(np.asarray(ids).tolist())
        imgs.append(np.asarray(samples["image"]))
        scales.append(np.asarray(samples["scale"], np.float32))
        pads.append(np.asarray(samples["pad"], np.float32))
        shapes.append(np.asarray(samples["shape"], np.float32))
    if not frame_ids:
        return pd.DataFrame(), pd.DataFrame()
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

    detect_fn = detector.device_detect_fn()
    D = detector.max_dets
    cfg = tracker._make_config()
    trk_D = cfg.max_dets
    base_step = tracker._step_fn()
    init_state = tracker._init_state(cfg)

    def step(state, det):
        if trk_D < D:
            det = Detections(*[x[:trk_D] for x in det])
        return base_step(cfg, state, det)

    runner = jax.jit(lambda f, m, v: fused_detect_track(
        detect_fn, step, init_state, f, chunk, meta=m, frame_valid=v))
    _, dets, outs = runner(
        jnp.asarray(images),
        {k: jnp.asarray(v) for k, v in meta.items()},
        jnp.asarray(frame_valid))

    # ---- detector DataFrame (yolox_api.process row semantics) ----
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

    # ---- tracker DataFrame (same join as the staged whole-video scan)
    trk_df = tracker._emissions_to_df(outs, F0, lut)
    if len(trk_df):
        trk_df = trk_df[trk_df.index >= 0]
    return det_df, trk_df
