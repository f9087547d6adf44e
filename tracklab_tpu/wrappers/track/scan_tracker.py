"""Tracker wrappers: DataFrame boundary around the lax.scan trackers.

The reference wraps each tracker as an ImageLevelModule with batch_size=1
and a per-frame host round-trip (tracklab/wrappers/track/oc_sort_api.py:14-76,
byte_track_api.py:14-76). TPU-native design runs the tracker as a
*VideoLevelModule*: the whole video's detections are padded into fixed-
capacity arrays once, a single jitted lax.scan consumes them on device, and
the emitted (track_id, box, ref) tuples are joined back onto the detection
DataFrame by row id — the same public columns as the reference
(track_id, track_bbox_ltwh, track_bbox_conf).
"""
from __future__ import annotations

import logging

import numpy as np
import pandas as pd

from tracklab_tpu.pipeline.levels import VideoLevelModule
from tracklab_tpu.utils import coordinates as C

log = logging.getLogger(__name__)

__all__ = ["OCSORT", "ByteTrack", "StrongSORT", "BotSORT", "DeepOCSORT",
           "BPBReIDStrongSORT"]


def _collect_embeddings(dets_in, dets, lut, n_frames, embed_dim):
    """(F, D, E) embedding tensor aligned with the padded detections."""
    F, D = dets.valid.shape
    emb = np.zeros((F, D, embed_dim), np.float32)
    if len(dets_in) and "embeddings" in dets_in.columns:
        ref_np = np.asarray(dets.ref)
        valid_np = np.asarray(dets.valid)
        emb_by_row = {idx: np.asarray(e, np.float32)
                      for idx, e in dets_in["embeddings"].items()
                      if e is not None}    # None rows -> zero embedding
        for f in range(n_frames):
            for d in np.nonzero(valid_np[f])[0]:
                e = emb_by_row.get(lut[ref_np[f, d]])
                if e is not None:
                    if e.ndim == 2:
                        # part-based layout (n_parts+1, E): row 0 is the
                        # global feature (models/osnet.py:171) — the
                        # flat-embedding trackers consume that; the
                        # part-aware tracker (BPBReIDStrongSORT) has its
                        # own collection path.
                        e = e[0]
                    emb[f, d, :min(len(e), embed_dim)] = e[:embed_dim]
    return emb


def _collect_warps(metadatas, n_frames, bucketed_frames):
    """(F, 2, 3) per-frame camera warps from the image-level gmc_warp
    column (produced by tracklab_tpu.motion.CameraMotion); identity when
    absent."""
    warps = np.broadcast_to(np.eye(2, 3, dtype=np.float32),
                            (bucketed_frames, 2, 3)).copy()
    if "gmc_warp" in metadatas.columns:
        for f, (_, row) in enumerate(metadatas.iterrows()):
            w = row["gmc_warp"]
            if isinstance(w, np.ndarray) and w.shape == (2, 3):
                warps[f] = w
    return warps


def _pad_video(detections: pd.DataFrame, image_pred: pd.DataFrame,
               max_dets: int, n_frame_bucket: int = 64):
    """Detections DataFrame -> fixed-capacity (F, D, ...) arrays.

    Frames are bucketed to multiples of ``n_frame_bucket`` (trailing frames
    carry no valid detections) so XLA compiles one program per bucket, not
    per video length.
    """
    import jax.numpy as jnp
    from tracklab_tpu.trackers.common import Detections

    frame_ids = list(image_pred.index)
    n_frames = len(frame_ids)
    F = max(((n_frames + n_frame_bucket - 1) // n_frame_bucket)
            * n_frame_bucket, n_frame_bucket)
    ltrb = np.zeros((F, max_dets, 4), np.float32)
    conf = np.zeros((F, max_dets), np.float32)
    cls = np.zeros((F, max_dets), np.float32)
    ref = np.full((F, max_dets), -1, np.int64)
    valid = np.zeros((F, max_dets), bool)

    if len(detections):
        by_image = detections.groupby("image_id")
        for f, image_id in enumerate(frame_ids):
            if image_id not in by_image.groups:
                continue
            rows = by_image.get_group(image_id)
            n = len(rows)
            if n > max_dets:
                log.warning("frame %s has %d detections > capacity %d; "
                            "keeping the %d most confident", image_id, n,
                            max_dets, max_dets)
                rows = rows.sort_values(
                    "bbox_conf", ascending=False).head(max_dets)
                n = max_dets
            boxes = np.stack(rows["bbox_ltwh"].to_numpy())
            ltrb[f, :n] = C.ltwh_to_ltrb(boxes)
            conf[f, :n] = rows["bbox_conf"].to_numpy(np.float32)
            if "category_id" in rows:
                cls[f, :n] = pd.to_numeric(
                    rows["category_id"], errors="coerce").fillna(0.0)
            ref[f, :n] = rows.index.to_numpy()
            valid[f, :n] = True

    # row ids can exceed int32; remap through a lookup table
    uniq = ref[ref >= 0]
    lut = np.unique(uniq)
    remap = {v: i for i, v in enumerate(lut)}
    ref32 = np.full((F, max_dets), -1, np.int32)
    for (f, d) in zip(*np.nonzero(ref >= 0)):
        ref32[f, d] = remap[ref[f, d]]

    dets = Detections(jnp.asarray(ltrb), jnp.asarray(conf),
                      jnp.asarray(cls), jnp.asarray(ref32),
                      jnp.asarray(valid))
    return dets, n_frames, lut


class _ScanTrackerBase(VideoLevelModule):
    input_columns = ["bbox_ltwh", "bbox_conf", "category_id"]
    output_columns = ["track_id", "track_bbox_ltwh", "track_bbox_conf"]

    # the reference's wrapper-level pre-filter, applied by EVERY tracker
    # wrapper before the tracker sees the detections
    # (oc_sort_api.py:54 inputs[inputs[:, 4] > min_confidence], same in
    # byte_track/bot_sort/deep_oc_sort/strong_sort_api; configs default
    # 0.4). 0.0 here; per-wrapper __init__/yaml override.
    min_confidence = 0.0

    def _prefilter(self, detections: pd.DataFrame) -> pd.DataFrame:
        if len(detections):
            return detections[
                detections["bbox_conf"] > self.min_confidence]
        return detections

    def __init__(self, max_dets: int = 64, n_frame_bucket: int = 64,
                 **kwargs):
        self.max_dets = max_dets
        self.n_frame_bucket = n_frame_bucket

    def reset(self):
        # online state (streaming mode via process_online)
        self._online_state = None
        # in-module ECC streaming state (emb trackers with cfg.ecc)
        self._ecc_gmc = None
        self._ecc_prev = None
        # streaming refs must be unique across the WHOLE stream (a
        # coasting track re-emits the ref of its last matched
        # detection, possibly frames later), mirroring the offline
        # path's global row lut (_pad_video)
        self._online_lut = {}
        self._online_next_ref = 0

    def _make_config(self):
        raise NotImplementedError

    # ------------------------------------------------------------------
    # Streaming mode: one jitted step per frame with persistent device
    # state — used by VideoOnlineTrackingEngine for webcams/raw videos
    # where the whole video isn't available up front.
    # ------------------------------------------------------------------
    def _init_state(self, cfg):
        raise NotImplementedError

    def _step_fn(self):
        raise NotImplementedError

    @property
    def _jitted_step(self):
        import jax
        if not hasattr(self, "_jit_step_cache"):
            cfg = self._make_config()
            step = self._step_fn()
            self._jit_step_cache = jax.jit(
                lambda s, d: step(cfg, s, d))
        return self._jit_step_cache

    def _truncate_frame(self, detections: pd.DataFrame) -> pd.DataFrame:
        """Overflow frames keep the max_dets MOST CONFIDENT rows, in
        confidence order — the same selection _pad_video makes offline,
        so streaming==offline holds across capacity overflow."""
        if len(detections) > self.max_dets:
            log.warning("frame has %d detections > capacity %d; keeping "
                        "the %d most confident", len(detections),
                        self.max_dets, self.max_dets)
            detections = detections.sort_values(
                "bbox_conf", ascending=False).head(self.max_dets)
        return detections

    def _pad_frame(self, detections: pd.DataFrame):
        """One frame's rows -> (Detections, stream-wide lut).

        Refs are globally unique across the stream (persistent counter)
        so a coasting track's stale ref still resolves to the original
        detection row — the offline path's lut semantics."""
        from tracklab_tpu.trackers.common import pad_detections
        if not hasattr(self, "_online_lut"):
            self._online_lut = {}
            self._online_next_ref = 0
        if not hasattr(self, "_online_ref_window"):
            # lut pruning window: a valid emission's ref is at most
            # max_age frames (x max_dets rows) old; anything older can
            # never be looked up again and is dropped to bound memory
            # on indefinite streams.
            cfg = self._make_config()
            self._online_ref_window = (
                int(getattr(cfg, "max_age", 100)) + 2) * self.max_dets
        detections = self._truncate_frame(detections)
        lut = self._online_lut
        base = self._online_next_ref
        if len(detections):
            boxes = np.stack(detections["bbox_ltwh"].to_numpy())
            n = len(detections)
            refs = base + np.arange(n)
            for i, idx in enumerate(detections.index):
                lut[base + i] = idx
            self._online_next_ref = base + n
            if len(lut) > 2 * self._online_ref_window:
                cutoff = self._online_next_ref - self._online_ref_window
                for k in [k for k in lut if k < cutoff]:
                    del lut[k]
            det = pad_detections(
                C.ltwh_to_ltrb(boxes),
                detections["bbox_conf"].to_numpy(np.float32),
                pd.to_numeric(detections.get("category_id", 1),
                              errors="coerce").fillna(1.0).to_numpy()
                if "category_id" in detections else None,
                refs, capacity=self.max_dets)
        else:
            det = pad_detections(np.zeros((0, 4)), np.zeros(0),
                                 capacity=self.max_dets)
        return det, lut

    @staticmethod
    def _emit_online(out, lut) -> pd.DataFrame:
        """One frame's scan emissions -> output DataFrame rows."""
        valid = np.asarray(out.valid)
        rows, data = [], []
        ltrb = np.asarray(out.ltrb)
        for t in np.nonzero(valid)[0]:
            r = int(out.ref[t])
            if r < 0 or r not in lut:
                continue
            rows.append(lut[r])
            data.append((float(out.track_id[t]),
                         C.ltrb_to_ltwh(ltrb[t]).astype(np.float32),
                         float(out.conf[t])))
        result = pd.DataFrame(index=rows)
        result["track_id"] = [d[0] for d in data]
        result["track_bbox_ltwh"] = [d[1] for d in data]
        result["track_bbox_conf"] = [d[2] for d in data]
        return result[~result.index.duplicated(keep="last")]

    def process_online(self, detections: pd.DataFrame,
                       metadata: pd.Series) -> pd.DataFrame:
        """Track one frame; carries tracker state across calls until
        reset()."""
        cfg = self._make_config()
        if getattr(self, "_online_state", None) is None:
            self._online_state = self._init_state(cfg)
        det, lut = self._pad_frame(self._prefilter(detections))
        self._online_state, out = self._jitted_step(
            self._online_state, det)
        return self._emit_online(out, lut)

    def _scan_fn(self):
        raise NotImplementedError

    @property
    def _jitted(self):
        import jax
        if not hasattr(self, "_jit_cache"):
            cfg = self._make_config()
            scan = self._scan_fn()
            self._jit_cache = jax.jit(lambda d: scan(cfg, d))
        return self._jit_cache

    # ------------------------------------------------------------------
    # Batched multi-video mode (BASELINE config 5): pad every video to a
    # common frame bucket, stack on a leading video axis, and run ONE
    # vmapped (single chip) or shard_mapped (mesh) scan for the whole
    # batch.
    # ------------------------------------------------------------------
    def process_video_batch(self, items, mesh=None):
        """items: list of (detections_df, metadatas_df). Returns a list of
        per-video output DataFrames (same semantics as process())."""
        import jax
        import jax.numpy as jnp
        from tracklab_tpu.trackers.common import Detections

        padded, luts, lens = [], [], []
        max_frames = max((len(m) for _, m in items), default=0)
        bucket = max(((max_frames + self.n_frame_bucket - 1)
                      // self.n_frame_bucket) * self.n_frame_bucket,
                     self.n_frame_bucket)
        for dets_df, metas in items:
            d, n, lut = _pad_video(self._prefilter(dets_df), metas,
                                   self.max_dets, bucket)
            # _pad_video buckets independently; re-bucket to the common F
            padded.append(d)
            luts.append(lut)
            lens.append(n)
        stacked = Detections(*[
            jnp.stack([getattr(d, f) for d in padded])
            for f in Detections._fields])
        cfg = self._make_config()
        scan = self._scan_fn()
        if mesh is not None:
            # one video per device: each runs its own sequential scan, so
            # the cond fast paths stay beneficial
            from tracklab_tpu.parallel.mesh import tracker_videos_sharded
            run = tracker_videos_sharded(
                lambda c, d: scan(c, d), cfg, mesh, axis="video")
            _, out = run(stacked)
        else:
            # TPU-native single-chip path: time-concatenate the videos
            # into ONE sequential scan with a state reset at each
            # video's first frame. Bit-identical to per-video scans and
            # keeps the data-dependent lax.cond fast paths — vmap's
            # cond-free alternatives measured 12x (cond cliff) to 40x
            # (per-frame JV in batched mode) slower on real TPU
            # (BASELINE.md).
            from tracklab_tpu.trackers.common import concat_resets
            V = stacked.ltrb.shape[0]
            flat = jax.tree_util.tree_map(
                lambda x: x.reshape((-1,) + x.shape[2:]), stacked)
            resets = concat_resets(V, bucket)
            _, out_flat = jax.jit(
                lambda d, r: scan(cfg, d, resets=r))(flat, resets)
            out = jax.tree_util.tree_map(
                lambda x: x.reshape((V, bucket) + x.shape[1:]),
                out_flat)
        results = []
        for v, (lut, n) in enumerate(zip(luts, lens)):
            results.append(self._emissions_to_df(
                jax.tree_util.tree_map(lambda x: x[v], out), n, lut))
        return results

    def _emissions_to_df(self, out, n_frames, lut):
        valid = np.asarray(out.valid[:n_frames])
        track_id = np.asarray(out.track_id[:n_frames])
        ltrb = np.asarray(out.ltrb[:n_frames])
        conf = np.asarray(out.conf[:n_frames])
        ref = np.asarray(out.ref[:n_frames])
        fs, ts = np.nonzero(valid)
        ok = ref[fs, ts] >= 0
        fs, ts = fs[ok], ts[ok]
        rows = lut[ref[fs, ts]] if len(fs) else np.zeros(0, int)
        result = pd.DataFrame(index=rows)
        result["track_id"] = track_id[fs, ts].astype(float)
        result["track_bbox_ltwh"] = list(
            C.ltrb_to_ltwh(ltrb[fs, ts]).astype(np.float32)) \
            if len(fs) else []
        result["track_bbox_conf"] = conf[fs, ts].astype(float)
        return result[~result.index.duplicated(keep="last")]

    def process(self, detections: pd.DataFrame,
                metadatas: pd.DataFrame) -> pd.DataFrame:
        if len(detections) == 0:
            return detections
        dets, n_frames, lut = _pad_video(
            self._prefilter(detections), metadatas, self.max_dets,
            self.n_frame_bucket)
        _, out = self._jitted(dets)

        valid = np.asarray(out.valid[:n_frames])
        track_id = np.asarray(out.track_id[:n_frames])
        ltrb = np.asarray(out.ltrb[:n_frames])
        conf = np.asarray(out.conf[:n_frames])
        ref = np.asarray(out.ref[:n_frames])

        fs, ts = np.nonzero(valid)
        rows = lut[ref[fs, ts]]
        result = pd.DataFrame(index=rows)
        result["track_id"] = track_id[fs, ts].astype(float)
        result["track_bbox_ltwh"] = list(
            C.ltrb_to_ltwh(ltrb[fs, ts]).astype(np.float32))
        result["track_bbox_conf"] = conf[fs, ts].astype(float)
        # drop duplicate refs (a det emitted once per frame at most, but a
        # stale ref can repeat if a track coasts). keep='last' — the
        # coasting re-emission overrides, matching the reference wrappers
        # and the batched path (_emissions_to_df) so offline and batched
        # engines agree
        result = result[~result.index.duplicated(keep="last")]
        return result


class OCSORT(_ScanTrackerBase):
    """OC-SORT wrapper; hyperparameter names/defaults mirror
    tracklab/configs/modules/track/oc_sort.yaml."""

    # Detections-only scan step: fusable with a device detector into
    # one program (engine/fused.py)
    supports_fused_track = True

    def __init__(self, det_thresh: float = 0.4432, max_age: int = 50,
                 min_hits: int = 1, iou_threshold: float = 0.2214,
                 delta_t: int = 3, asso_func: str = "iou",
                 inertia: float = 0.3941, use_byte: bool = False,
                 max_tracks: int = 128, max_dets: int = 64,
                 min_confidence: float = 0.0, device=None, **kwargs):
        super().__init__(max_dets=max_dets, **kwargs)
        self.params = dict(
            det_thresh=det_thresh, max_age=max_age, min_hits=min_hits,
            iou_threshold=iou_threshold, delta_t=delta_t,
            asso_func=asso_func, inertia=inertia, use_byte=use_byte,
            max_tracks=max_tracks, max_dets=max_dets)
        self.min_confidence = min_confidence

    def _make_config(self):
        from tracklab_tpu.trackers.ocsort import OCSortConfig
        return OCSortConfig(**self.params)

    def _scan_fn(self):
        from tracklab_tpu.trackers.ocsort import ocsort_scan
        return ocsort_scan

    def _init_state(self, cfg):
        from tracklab_tpu.trackers.ocsort import ocsort_init
        return ocsort_init(cfg)

    def _step_fn(self):
        from tracklab_tpu.trackers.ocsort import ocsort_step
        return ocsort_step


class _EmbScanTrackerBase(_ScanTrackerBase):
    """Shared wrapper for embedding-consuming trackers (StrongSORT,
    BoT-SORT, Deep-OC-SORT): collects per-detection `embeddings` and
    optional per-frame `gmc_warp` camera warps, runs the 3-input scan, and
    joins emissions back by detection row (last emission wins — matching
    the reference wrappers' coasting-override behavior,
    strong_sort_api.py:76-80)."""

    input_columns = ["bbox_ltwh", "bbox_conf", "category_id", "embeddings"]
    output_columns = ["track_id", "track_bbox_ltwh", "track_bbox_conf"]

    # 3-input (Detections, emb, warp) scan step: fusable with a device
    # detector + device-crop ReID into one program
    # (engine/fused.py:run_fused_reid_video)
    supports_fused_emb_track = True

    min_confidence = 0.0
    embed_dim = 512

    def _scan3(self):
        raise NotImplementedError

    def _step3(self):
        raise NotImplementedError

    # ------------------------------------------------------------------
    # Streaming mode (VideoOnlineTrackingEngine): same scan step as the
    # offline whole-video path, fed one frame at a time with the
    # detection embeddings and the frame's gmc_warp, so streaming ==
    # offline frame for frame (tests/test_streaming_equivalence.py).
    # ------------------------------------------------------------------
    @property
    def _jitted_step(self):
        import jax
        if not hasattr(self, "_jit_step_cache"):
            cfg = self._make_config()
            step = self._step3()
            self._jit_step_cache = jax.jit(
                lambda s, d, e, w: step(cfg, s, (d, e, w)))
        return self._jit_step_cache

    def _online_emb(self, detections: pd.DataFrame, det):
        """(D, E) embedding matrix aligned with the padded frame."""
        emb = np.zeros((self.max_dets, self.embed_dim), np.float32)
        if len(detections) and "embeddings" in detections.columns:
            for i, (_, e) in enumerate(
                    detections["embeddings"].items()):
                if i >= self.max_dets:
                    break
                if e is None:
                    continue    # this row has no embedding; later rows do
                e = np.asarray(e, np.float32)
                if e.ndim == 2:
                    e = e[0]    # part layout: row 0 = global feature
                emb[i, :min(len(e), self.embed_dim)] = \
                    e[:self.embed_dim]
        return emb

    @staticmethod
    def _online_warp(metadata):
        w = metadata.get("gmc_warp") if metadata is not None else None
        if isinstance(w, np.ndarray) and w.shape == (2, 3):
            return w.astype(np.float32)
        return np.eye(2, 3, dtype=np.float32)

    def _online_ecc_warp(self, metadata):
        """Streaming counterpart of _maybe_ecc_warps: in-module ECC vs
        the previous streamed frame (strong_sort_api.py:62-65)."""
        if not getattr(self, "ecc", False) or metadata is None or \
                isinstance(metadata.get("gmc_warp"), np.ndarray):
            return None
        from tracklab_tpu.motion.gmc import GMC
        from tracklab_tpu.utils.cv2 import cv2_load_image
        if getattr(self, "_ecc_gmc", None) is None:
            self._ecc_gmc = GMC(method="ecc")
            self._ecc_prev = None
        img = cv2_load_image(metadata["file_path"])
        w = self._ecc_gmc.apply(self._ecc_prev, img)
        self._ecc_prev = img
        return np.asarray(w, np.float32)

    def process_online(self, detections: pd.DataFrame,
                       metadata: pd.Series) -> pd.DataFrame:
        import jax.numpy as jnp
        cfg = self._make_config()
        if getattr(self, "_online_state", None) is None:
            self._online_state = self._init_state(cfg)
        dets_in = detections[
            detections["bbox_conf"] > self.min_confidence] \
            if len(detections) else detections
        dets_in = self._truncate_frame(dets_in)  # before emb: rows align
        det, lut = self._pad_frame(dets_in)
        emb = self._online_emb(dets_in, det)
        if getattr(self, "cmc_off", False):
            warp = np.eye(2, 3, dtype=np.float32)
        else:
            warp = self._online_ecc_warp(metadata)
            if warp is None:
                warp = self._online_warp(metadata)
        self._online_state, out = self._jitted_step(
            self._online_state, det, jnp.asarray(emb),
            jnp.asarray(warp))
        return self._emit_online(out, lut)

    def _video_warps(self, metadatas, n_frames, bucketed_frames):
        """Per-frame camera warps with the wrapper's policy: identity
        when cmc_off (deep_oc_sort ocsort.py:410 skips CMC entirely),
        else in-module ECC when cfg.ecc and no CMC column, else the
        gmc_warp column / identity."""
        if getattr(self, "cmc_off", False):
            return np.broadcast_to(
                np.eye(2, 3, dtype=np.float32),
                (bucketed_frames, 2, 3)).copy()
        w = self._maybe_ecc_warps(metadatas, n_frames, bucketed_frames)
        return w if w is not None else _collect_warps(
            metadatas, n_frames, bucketed_frames)

    def _maybe_ecc_warps(self, metadatas, n_frames, bucketed_frames):
        """In-module ECC camera compensation (the reference StrongSORT
        wrapper's cfg.ecc path, strong_sort_api.py:62-65 camera_update
        on consecutive frames) — only when enabled AND no upstream CMC
        module already provided the gmc_warp column. Frames are loaded
        from file_path like the engine's datapipe."""
        if not getattr(self, "ecc", False) \
                or "gmc_warp" in metadatas.columns:
            return None
        from tracklab_tpu.motion.gmc import GMC
        from tracklab_tpu.utils.cv2 import cv2_load_image
        g = GMC(method="ecc")
        warps = np.broadcast_to(np.eye(2, 3, dtype=np.float32),
                                (bucketed_frames, 2, 3)).copy()
        prev = None
        for f, (_, row) in enumerate(metadatas.iterrows()):
            if f >= n_frames:
                break
            img = cv2_load_image(row["file_path"])
            warps[f] = g.apply(prev, img)
            prev = img
        return warps

    def process_video_batch(self, items, mesh=None):
        """Single-chip multi-video batching for embedding trackers:
        time-concatenated scan with per-video state resets (same
        mechanics as the base class, with the embedding/warp inputs
        concatenated alongside). Mesh mode falls back to per-video
        processing (the shard_map helper carries detections only)."""
        import jax
        import jax.numpy as jnp
        from tracklab_tpu.trackers.common import (
            Detections, concat_resets,
        )

        if mesh is not None:
            return [self.process(d, m) for d, m in items]
        padded, luts, lens, embs, warps_l = [], [], [], [], []
        max_frames = max((len(m) for _, m in items), default=0)
        bucket = max(((max_frames + self.n_frame_bucket - 1)
                      // self.n_frame_bucket) * self.n_frame_bucket,
                     self.n_frame_bucket)
        for dets_df, metas in items:
            dets_in = dets_df[dets_df["bbox_conf"]
                              > self.min_confidence]
            d, n, lut = _pad_video(dets_in, metas, self.max_dets,
                                   bucket)
            padded.append(d)
            luts.append(lut)
            lens.append(n)
            embs.append(_collect_embeddings(dets_in, d, lut, n,
                                            self.embed_dim))
            warps_l.append(self._video_warps(metas, n, bucket))
        flat = Detections(*[
            jnp.concatenate([getattr(d, f) for d in padded])
            for f in Detections._fields])
        emb = jnp.asarray(np.concatenate(embs, axis=0))
        warps = jnp.asarray(np.concatenate(warps_l, axis=0))
        resets = concat_resets(len(items), bucket)
        cfg = self._make_config()
        scan = self._scan3()
        _, out_flat = jax.jit(
            lambda d, e, w, r: scan(cfg, d, e, w, resets=r))(
            flat, emb, warps, resets)
        out = jax.tree_util.tree_map(
            lambda x: x.reshape((len(items), bucket) + x.shape[1:]),
            out_flat)
        results = []
        for v, (lut, n) in enumerate(zip(luts, lens)):
            results.append(self._emissions_to_df(
                jax.tree_util.tree_map(lambda x: x[v], out), n, lut))
        return results

    @property
    def _jitted(self):
        import jax
        if not hasattr(self, "_jit_cache"):
            cfg = self._make_config()
            scan = self._scan3()
            self._jit_cache = jax.jit(
                lambda d, e, w: scan(cfg, d, e, w))
        return self._jit_cache

    def process(self, detections: pd.DataFrame,
                metadatas: pd.DataFrame) -> pd.DataFrame:
        if len(detections) == 0:
            return detections
        import jax.numpy as jnp
        dets_in = detections[
            detections["bbox_conf"] > self.min_confidence]
        dets, n_frames, lut = _pad_video(
            dets_in, metadatas, self.max_dets, self.n_frame_bucket)
        F = dets.valid.shape[0]
        emb = _collect_embeddings(dets_in, dets, lut, n_frames,
                                  self.embed_dim)
        warps = self._video_warps(metadatas, n_frames, F)
        _, out = self._jitted(dets, jnp.asarray(emb), jnp.asarray(warps))

        valid = np.asarray(out.valid[:n_frames])
        track_id = np.asarray(out.track_id[:n_frames])
        ltrb = np.asarray(out.ltrb[:n_frames])
        conf = np.asarray(out.conf[:n_frames])
        ref = np.asarray(out.ref[:n_frames])
        fs, ts = np.nonzero(valid)
        rows = lut[ref[fs, ts]]
        result = pd.DataFrame(index=rows)
        result["track_id"] = track_id[fs, ts].astype(float)
        result["track_bbox_ltwh"] = list(
            C.ltrb_to_ltwh(ltrb[fs, ts]).astype(np.float32))
        result["track_bbox_conf"] = conf[fs, ts].astype(float)
        result = result[~result.index.duplicated(keep="last")]
        return result


class StrongSORT(_EmbScanTrackerBase):
    """StrongSORT wrapper; defaults mirror
    tracklab/configs/modules/track/strong_sort.yaml."""

    def __init__(self, max_dist: float = 0.1594,
                 max_iou_dist: float = 0.5432, max_age: int = 40,
                 n_init: int = 3, nn_budget: int = 100,
                 mc_lambda: float = 0.995, ema_alpha: float = 0.8962,
                 embed_dim: int = 512, min_confidence: float = 0.4,
                 max_tracks: int = 128, max_dets: int = 64,
                 ecc: bool = False, device=None, **kwargs):
        super().__init__(max_dets=max_dets, **kwargs)
        self.params = dict(
            max_dist=max_dist, max_iou_dist=max_iou_dist, max_age=max_age,
            n_init=n_init, nn_budget=nn_budget, mc_lambda=mc_lambda,
            ema_alpha=ema_alpha, embed_dim=embed_dim,
            max_tracks=max_tracks, max_dets=max_dets)
        self.min_confidence = min_confidence
        self.ecc = ecc
        self.embed_dim = embed_dim

    def _make_config(self):
        from tracklab_tpu.trackers.strongsort import StrongSortConfig
        return StrongSortConfig(**self.params)

    def _scan3(self):
        from tracklab_tpu.trackers.strongsort import strongsort_scan
        return strongsort_scan

    def _step3(self):
        from tracklab_tpu.trackers.strongsort import strongsort_step
        return strongsort_step

    def _init_state(self, cfg):
        from tracklab_tpu.trackers.strongsort import strongsort_init
        return strongsort_init(cfg)


class BotSORT(_EmbScanTrackerBase):
    """BoT-SORT wrapper; defaults mirror
    tracklab/configs/modules/track/bot_sort.yaml. Camera compensation
    comes from the CameraMotion module's gmc_warp column."""

    def __init__(self, track_high_thresh: float = 0.3382,
                 new_track_thresh: float = 0.2114, track_buffer: int = 60,
                 match_thresh: float = 0.2273,
                 proximity_thresh: float = 0.5945,
                 appearance_thresh: float = 0.4818,
                 lambda_: float = 0.9896, frame_rate: int = 30,
                 ema_alpha: float = 0.9, embed_dim: int = 512,
                 min_confidence: float = 0.4, max_tracks: int = 128,
                 max_dets: int = 64, device=None, **kwargs):
        super().__init__(max_dets=max_dets, **kwargs)
        self.params = dict(
            track_high_thresh=track_high_thresh,
            new_track_thresh=new_track_thresh, track_buffer=track_buffer,
            match_thresh=match_thresh, proximity_thresh=proximity_thresh,
            appearance_thresh=appearance_thresh, lambda_=lambda_,
            frame_rate=frame_rate, ema_alpha=ema_alpha,
            embed_dim=embed_dim, max_tracks=max_tracks, max_dets=max_dets)
        self.min_confidence = min_confidence
        self.embed_dim = embed_dim

    def _make_config(self):
        from tracklab_tpu.trackers.botsort import BotSortConfig
        return BotSortConfig(**self.params)

    def _scan3(self):
        from tracklab_tpu.trackers.botsort import botsort_scan
        return botsort_scan

    def _step3(self):
        from tracklab_tpu.trackers.botsort import botsort_step
        return botsort_step

    def _init_state(self, cfg):
        from tracklab_tpu.trackers.botsort import botsort_init
        return botsort_init(cfg)


class DeepOCSORT(_EmbScanTrackerBase):
    """Deep-OC-SORT wrapper; defaults mirror
    tracklab/configs/modules/track/deep_oc_sort.yaml."""

    def __init__(self, det_thresh: float = 0.0, max_age: int = 50,
                 min_hits: int = 1, iou_threshold: float = 0.2214,
                 delta_t: int = 1, asso_func: str = "giou",
                 inertia: float = 0.3942,
                 w_association_emb: float = 0.75,
                 alpha_fixed_emb: float = 0.95, aw_param: float = 0.5,
                 embedding_off: bool = False, aw_off: bool = False,
                 cmc_off: bool = False, new_kf_off: bool = False,
                 embed_dim: int = 512, min_confidence: float = 0.4,
                 max_tracks: int = 128, max_dets: int = 64, device=None,
                 **kwargs):
        super().__init__(max_dets=max_dets, **kwargs)
        if new_kf_off:
            log.warning("DeepOCSORT: new_kf_off is not supported — the "
                        "TPU build always uses the xywh dynamic-noise KF")
        self.params = dict(
            det_thresh=det_thresh, max_age=max_age, min_hits=min_hits,
            iou_threshold=iou_threshold, delta_t=delta_t,
            asso_func=asso_func, inertia=inertia,
            w_association_emb=w_association_emb,
            alpha_fixed_emb=alpha_fixed_emb, aw_param=aw_param,
            embedding_off=embedding_off, aw_off=aw_off,
            embed_dim=embed_dim, max_tracks=max_tracks,
            max_dets=max_dets)
        self.min_confidence = min_confidence
        self.embed_dim = embed_dim
        self.cmc_off = cmc_off

    def _make_config(self):
        from tracklab_tpu.trackers.deepocsort import DeepOCSortConfig
        return DeepOCSortConfig(**self.params)

    def _scan3(self):
        from tracklab_tpu.trackers.deepocsort import deepocsort_scan
        return deepocsort_scan

    def _step3(self):
        from tracklab_tpu.trackers.deepocsort import deepocsort_step
        return deepocsort_step

    def _init_state(self, cfg):
        from tracklab_tpu.trackers.deepocsort import deepocsort_init
        return deepocsort_init(cfg)


class BPBReIDStrongSORT(_EmbScanTrackerBase):
    """BPBReID-StrongSORT wrapper: part-based ReID embeddings +
    visibility scores (from KPReID) and optional keypoints for OKS
    motion. Output columns match the reference wrapper
    (track/bpbreid_strong_sort_api.py:14-118): KF boxes plus track
    lifecycle counters."""

    input_columns = ["bbox_ltwh", "bbox_conf", "category_id",
                     "embeddings", "visibility_scores"]
    output_columns = ["track_id", "track_bbox_ltwh", "track_bbox_conf",
                      "track_bbox_kf_ltwh", "track_bbox_pred_kf_ltwh",
                      "hits", "age", "time_since_update", "state"]

    # 5-input step (det, part feats, visibility, keypoints, warp) — not
    # the 3-input shape the flat-embedding fused path drives; the
    # part-based fused path (engine/fused.py:run_fused_parts_video)
    # drives it instead
    supports_fused_emb_track = False
    supports_fused_parts_track = True

    # defaults mirror the reference's bpbreid_strong_sort.yaml (and
    # the BPBReIDStrongSortConfig dataclass)
    def __init__(self, max_dist: float = 0.5,
                 motion_criterium: str = "iou",
                 max_iou_distance: float = 0.8,
                 max_oks_distance: float = 0.7, max_age: int = 300,
                 n_init: int = 0, mc_lambda: float = 0.995,
                 ema_alpha: float = 0.9, only_position: bool = False,
                 n_parts: int = 6, embed_dim: int = 512,
                 n_keypoints: int = 17, min_confidence: float = 0.0,
                 emit_costs: bool = False, ecc: bool = False,
                 max_tracks: int = 128, max_dets: int = 64, device=None,
                 **kwargs):
        super().__init__(max_dets=max_dets, **kwargs)
        self.ecc = ecc
        self.params = dict(
            max_dist=max_dist, motion_criterium=motion_criterium,
            max_iou_distance=max_iou_distance,
            max_oks_distance=max_oks_distance, max_age=max_age,
            n_init=n_init, mc_lambda=mc_lambda, ema_alpha=ema_alpha,
            only_position=only_position, n_parts=n_parts,
            embed_dim=embed_dim, n_keypoints=n_keypoints,
            emit_costs=emit_costs,
            max_tracks=max_tracks, max_dets=max_dets)
        self.min_confidence = min_confidence
        self.emit_costs = emit_costs
        if emit_costs:
            # instance-level: the instrumentation columns exist only
            # when requested, so Pipeline.validate stays truthful
            self.output_columns = self.output_columns + [
                "matched_with", "costs"]
        self.n_parts = n_parts
        self.embed_dim = embed_dim
        self.n_keypoints = n_keypoints

    def process_video_batch(self, items, mesh=None):
        """Part-feature inputs don't fit the flat-embedding concat
        path; process per video (each video is still one whole-video
        scan on device)."""
        return [self.process(d, m) for d, m in items]

    def _make_config(self):
        from tracklab_tpu.trackers.bpbreid_strongsort import (
            BPBReIDStrongSortConfig,
        )
        return BPBReIDStrongSortConfig(**self.params)

    def _init_state(self, cfg):
        from tracklab_tpu.trackers.bpbreid_strongsort import bpbreid_init
        return bpbreid_init(cfg)

    @property
    def _jitted_step(self):
        import jax
        if not hasattr(self, "_jit_step_cache"):
            from tracklab_tpu.trackers.bpbreid_strongsort import (
                bpbreid_step,
            )
            cfg = self._make_config()
            self._jit_step_cache = jax.jit(
                lambda s, d, fe, vi, kp, w: bpbreid_step(
                    cfg, s, (d, fe, vi, kp, w)))
        return self._jit_step_cache

    def process_online(self, detections: pd.DataFrame,
                       metadata: pd.Series) -> pd.DataFrame:
        """Streaming step with part features — same scan step as the
        offline path, one frame at a time."""
        import jax.numpy as jnp
        cfg = self._make_config()
        if getattr(self, "_online_state", None) is None:
            self._online_state = self._init_state(cfg)
        dets_in = detections[
            detections["bbox_conf"] > self.min_confidence] \
            if len(detections) and self.min_confidence > 0 else detections
        dets_in = self._truncate_frame(dets_in)  # before parts: rows align
        det, lut = self._pad_frame(dets_in)
        D, P, E, K = self.max_dets, self.n_parts, self.embed_dim, \
            self.n_keypoints
        feat = np.zeros((D, P, E), np.float32)
        vis = np.zeros((D, P), np.float32)
        kps = np.zeros((D, K, 3), np.float32)
        for i, (row, s) in enumerate(dets_in.iterrows()):
            if i >= D:
                break
            e = s.get("embeddings")
            if e is not None:
                e2 = np.asarray(e, np.float32)
                e2 = e2.reshape(-1, e2.shape[-1]) if e2.ndim > 1 \
                    else e2.reshape(-1, E)
                r, c = min(e2.shape[0], P), min(e2.shape[1], E)
                feat[i, :r, :c] = e2[:r, :c]
            v = s.get("visibility_scores")
            if v is not None:
                v = np.asarray(v, np.float32)
                vis[i, :min(len(v), P)] = v[:P]
            kk = s.get("keypoints_xyc")
            if isinstance(kk, np.ndarray):
                kps[i, :min(len(kk), K)] = kk[:K]
        if getattr(self, "cmc_off", False):
            warp = np.eye(2, 3, dtype=np.float32)
        else:
            warp = self._online_ecc_warp(metadata)
            if warp is None:
                warp = self._online_warp(metadata)
        self._online_state, out = self._jitted_step(
            self._online_state, det, jnp.asarray(feat),
            jnp.asarray(vis), jnp.asarray(kps), jnp.asarray(warp))
        result = self._emit_online(out, lut)
        # lifecycle columns (reference bpbreid_strong_sort_api.py:14-118)
        valid = np.asarray(out.valid)
        keep = [t for t in np.nonzero(valid)[0]
                if int(out.ref[t]) >= 0 and int(out.ref[t]) in lut]
        order = {lut[int(out.ref[t])]: t for t in keep}
        ts = [order[i] for i in result.index]
        kf_ltwh = result["track_bbox_ltwh"].tolist()
        result["track_bbox_kf_ltwh"] = kf_ltwh
        result["track_bbox_pred_kf_ltwh"] = [
            C.ltrb_to_ltwh(np.asarray(out.pred_ltrb[t])).astype(
                np.float32) for t in ts]
        result["state"] = [int(out.tstate[t]) for t in ts]
        result["hits"] = [int(out.hits[t]) for t in ts]
        result["age"] = [int(out.age[t]) for t in ts]
        result["time_since_update"] = [
            int(out.time_since_update[t]) for t in ts]
        return result

    @property
    def _jitted(self):
        import jax
        if not hasattr(self, "_jit_cache"):
            from tracklab_tpu.trackers.bpbreid_strongsort import (
                bpbreid_scan,
            )
            cfg = self._make_config()
            self._jit_cache = jax.jit(
                lambda d, fe, vi, kp, w: bpbreid_scan(cfg, d, fe, vi, kp,
                                                      w))
        return self._jit_cache

    def process(self, detections: pd.DataFrame,
                metadatas: pd.DataFrame) -> pd.DataFrame:
        if len(detections) == 0:
            return detections
        import jax.numpy as jnp
        dets_in = detections[
            detections["bbox_conf"] > self.min_confidence] \
            if self.min_confidence > 0 else detections
        dets, n_frames, lut = _pad_video(
            dets_in, metadatas, self.max_dets, self.n_frame_bucket)
        F, D = dets.valid.shape
        P, E, K = self.n_parts, self.embed_dim, self.n_keypoints
        feat = np.zeros((F, D, P, E), np.float32)
        vis = np.zeros((F, D, P), np.float32)
        kps = np.zeros((F, D, K, 3), np.float32)
        ref_np = np.asarray(dets.ref)
        valid_np = np.asarray(dets.valid)
        emb_by_row = {i: np.asarray(e, np.float32)
                      for i, e in dets_in["embeddings"].items()}
        vis_by_row = {i: np.asarray(v, np.float32)
                      for i, v in dets_in["visibility_scores"].items()}
        kp_by_row = ({i: np.asarray(k, np.float32)
                      for i, k in dets_in["keypoints_xyc"].items()}
                     if "keypoints_xyc" in dets_in.columns else {})
        for f in range(n_frames):
            for d in np.nonzero(valid_np[f])[0]:
                row = lut[ref_np[f, d]]
                e = emb_by_row.get(row)
                if e is not None:
                    # accept any (rows, E) part layout: OSNet emits
                    # global + n_parts stripes (n_parts + 1 rows); rows
                    # beyond the tracker's P are ignored, fewer are
                    # zero-padded (visibility 0 masks them out)
                    e2 = e.reshape(-1, e.shape[-1]) if e.ndim > 1 \
                        else e.reshape(-1, E)
                    r = min(e2.shape[0], P)
                    c = min(e2.shape[1], E)
                    feat[f, d, :r, :c] = e2[:r, :c]
                v = vis_by_row.get(row)
                if v is not None:
                    vis[f, d, :min(len(v), P)] = v[:P]
                kk = kp_by_row.get(row)
                if kk is not None:
                    kps[f, d, :min(len(kk), K)] = kk[:K]
        warps = self._video_warps(metadatas, n_frames, F)
        _, out = self._jitted(dets, jnp.asarray(feat), jnp.asarray(vis),
                              jnp.asarray(kps), jnp.asarray(warps))
        return self._bpb_emissions_to_df(out, n_frames, lut, dets=dets)

    def _bpb_emissions_to_df(self, out, n_frames, lut, dets=None):
        """Stacked per-frame BPBReID outputs -> the wrapper's public
        DataFrame (KF boxes + lifecycle counters, plus the emit_costs
        instrumentation when enabled and the consumed detections are
        provided). Shared by ``process`` and the fused engine path
        (engine/fused.py:run_fused_parts_video)."""
        valid = np.asarray(out.valid[:n_frames])
        fs, ts = np.nonzero(valid)
        rows = lut[np.asarray(out.ref[:n_frames])[fs, ts]]
        ltrb = np.asarray(out.ltrb[:n_frames])[fs, ts]
        result = pd.DataFrame(index=rows)
        result["track_id"] = np.asarray(
            out.track_id[:n_frames])[fs, ts].astype(float)
        kf_ltwh = C.ltrb_to_ltwh(ltrb).astype(np.float32)
        result["track_bbox_ltwh"] = list(kf_ltwh)
        result["track_bbox_kf_ltwh"] = list(kf_ltwh)
        # the reference's pre-update KF snapshot + lifecycle state int
        # (bpbreid_strong_sort_api.py:20-30; NaN until first update)
        result["track_bbox_pred_kf_ltwh"] = list(C.ltrb_to_ltwh(
            np.asarray(out.pred_ltrb[:n_frames])[fs, ts]).astype(
            np.float32))
        result["track_bbox_conf"] = np.asarray(
            out.conf[:n_frames])[fs, ts].astype(float)
        result["state"] = np.asarray(out.tstate[:n_frames])[fs, ts]
        result["hits"] = np.asarray(out.hits[:n_frames])[fs, ts]
        result["age"] = np.asarray(out.age[:n_frames])[fs, ts]
        result["time_since_update"] = np.asarray(
            out.time_since_update[:n_frames])[fs, ts]
        if self.emit_costs and out.costs_r is not None \
                and dets is not None:
            # debug-viz instrumentation (reference
            # sort/tracker.py:365-425): per-detection cost dicts to
            # every pre-birth track + the matched stage/cost
            thr = dict(Rt=self.params["max_dist"],
                       St=(self.params["max_oks_distance"]
                           if self.params["motion_criterium"] == "oks"
                           else self.params["max_iou_distance"]),
                       Kt=(5.9915 if self.params["only_position"]
                           else 9.4877))
            cr = np.asarray(out.costs_r[:n_frames])
            cs = np.asarray(out.costs_s[:n_frames])
            ck = np.asarray(out.costs_k[:n_frames])
            stage = np.asarray(out.matched_stage[:n_frames])
            mcost = np.asarray(out.matched_cost[:n_frames])
            tvalid = np.asarray(out.cost_track_valid[:n_frames])
            tids = np.asarray(out.cost_track_id[:n_frames])
            ref_np2 = np.asarray(dets.ref)
            costs_by_row, matched_by_row = {}, {}
            for f in range(n_frames):
                live = np.nonzero(tvalid[f])[0]
                ids = tids[f, live]
                for d in np.nonzero(np.asarray(dets.valid)[f])[0]:
                    row = lut[ref_np2[f, d]]
                    costs_by_row[row] = {
                        "R": dict(zip(ids.tolist(),
                                      cr[f, d, live].tolist())),
                        "Rt": thr["Rt"],
                        "S": dict(zip(ids.tolist(),
                                      cs[f, d, live].tolist())),
                        "St": thr["St"],
                        "K": dict(zip(ids.tolist(),
                                      ck[f, d, live].tolist())),
                        "Kt": thr["Kt"],
                    }
                    st_ = int(stage[f, d])
                    matched_by_row[row] = (
                        ("R" if st_ == 1 else "S", float(mcost[f, d]))
                        if st_ else None)
            result["costs"] = pd.Series(costs_by_row).reindex(
                result.index).to_numpy()
            result["matched_with"] = pd.Series(matched_by_row).reindex(
                result.index).to_numpy()
        return result[~result.index.duplicated(keep="last")]


class ByteTrack(_ScanTrackerBase):
    """ByteTrack wrapper; defaults mirror
    plugins/track/byte_track/configs/bytetrack.yaml."""

    supports_fused_track = True

    def __init__(self, track_thresh: float = 0.6,
                 match_thresh: float = 0.8, track_buffer: int = 25,
                 frame_rate: int = 30, min_confidence: float = 0.0,
                 max_tracks: int = 128,
                 max_dets: int = 64, device=None, **kwargs):
        super().__init__(max_dets=max_dets, **kwargs)
        self.min_confidence = min_confidence
        self.params = dict(
            track_thresh=track_thresh, match_thresh=match_thresh,
            track_buffer=track_buffer, frame_rate=frame_rate,
            max_tracks=max_tracks, max_dets=max_dets)

    def _make_config(self):
        from tracklab_tpu.trackers.bytetrack import ByteTrackConfig
        return ByteTrackConfig(**self.params)

    def _scan_fn(self):
        from tracklab_tpu.trackers.bytetrack import bytetrack_scan
        return bytetrack_scan

    def _init_state(self, cfg):
        from tracklab_tpu.trackers.bytetrack import bytetrack_init
        return bytetrack_init(cfg)

    def _step_fn(self):
        from tracklab_tpu.trackers.bytetrack import bytetrack_step
        return bytetrack_step
