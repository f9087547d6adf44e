"""Batched device-side ReID: all of a frame's crops in one XLA program.

The detection-level OSNetReId crops per detection on host threads; this
image-level variant implements BASELINE's fused crop path: each frame is
staged once, ``models/preprocess.crop_resize`` gathers every detection's
crop on device, and OSNet runs over the whole (frames x detections)
batch — no per-detection host work at all.
"""
from __future__ import annotations

import logging

import numpy as np
import pandas as pd

from tracklab_tpu.pipeline.levels import ImageLevelModule
from tracklab_tpu.utils.collate import default_collate
from tracklab_tpu.wrappers.reid.osnet_api import (
    IMAGENET_MEAN, IMAGENET_STD,
)

log = logging.getLogger(__name__)

__all__ = ["OSNetReIdBatched"]


class OSNetReIdBatched(ImageLevelModule):
    input_columns = ["bbox_ltwh"]
    output_columns = ["embeddings", "visibility_scores"]
    collate_fn = staticmethod(default_collate)
    # the engine's fused fast path can inline this module between a
    # fused detector and an embedding tracker (engine/fused.py:
    # run_fused_reid_video) — crops then come from the detector's
    # letterboxed frames instead of this module's work-image resize
    supports_fused_embed = True

    def __init__(self, variant: str = "x1_0", feat_dim: int = 512,
                 n_parts: int = 6, crop_size=(256, 128),
                 work_size=(736, 1280), max_dets: int = 32,
                 batch_size: int = 4, use_parts: bool = True,
                 ibn: bool = False, checkpoint_path: str | None = None,
                 device=None, embed_buckets=None, **kwargs):
        super().__init__(batch_size)
        self.variant = variant
        self.feat_dim = feat_dim
        self.n_parts = n_parts
        self.crop_h, self.crop_w = crop_size
        self.work_h, self.work_w = work_size
        self.max_dets = max_dets
        self.use_parts = use_parts
        self.ibn = ibn
        self.checkpoint_path = checkpoint_path
        # live-prefix compaction widths for the fused engine path
        # (engine/fused.py:fused_detect_reid_track embed_buckets —
        # output-identical; None = embed every slot)
        self.embed_buckets = (tuple(embed_buckets)
                              if embed_buckets else None)
        self._infer = None
        self.variables = None

    def _build(self):
        import jax
        import jax.numpy as jnp
        from tracklab_tpu.models.osnet import OSNet
        from tracklab_tpu.models.preprocess import crop_resize_auto

        model = OSNet(variant=self.variant, feat_dim=self.feat_dim,
                      n_parts=self.n_parts, ibn=self.ibn)
        shape = (1, self.crop_h, self.crop_w, 3)
        if self.checkpoint_path:
            from tracklab_tpu.models.convert import load_checkpoint
            self.variables = load_checkpoint(self.checkpoint_path,
                                             model, shape)
        elif self.variables is None:
            log.warning("OSNetReIdBatched: no checkpoint — random "
                        "weights")
            self.variables = model.init(jax.random.PRNGKey(0),
                                        jnp.zeros(shape), train=False)
        variables = self.variables
        mean = jnp.asarray(IMAGENET_MEAN)
        std = jnp.asarray(IMAGENET_STD)
        ch, cw = self.crop_h, self.crop_w

        def infer(images, boxes):
            # images (B, H, W, 3) uint8; boxes (B, D, 4) ltrb work-coords
            crops = jax.vmap(
                lambda img, b: crop_resize_auto(img, b, ch, cw))(images,
                                                            boxes)
            B, D = crops.shape[0], crops.shape[1]
            x = (crops.reshape(B * D, ch, cw, 3) - mean) / std
            out = model.apply(variables, x, train=False)
            return {
                "embeddings": out["embeddings"].reshape(B, D, -1),
                "part_features": out["part_features"].reshape(
                    B, D, self.n_parts + 1, -1),
                "visibility": out["visibility"].reshape(
                    B, D, self.n_parts + 1),
            }

        self._infer = jax.jit(infer)

    def device_embed_fn(self):
        """Jit-ready ``(frames, boxes) -> dict`` closure for the fused
        engine path: device crop-and-resize + OSNet forward, identical
        math to ``_infer`` (the crops just come from the caller's frames
        instead of this module's work image)."""
        if self._infer is None:
            self._build()
        from tracklab_tpu.engine.fused import make_osnet_embed_fn
        from tracklab_tpu.models.osnet import OSNet
        model = OSNet(variant=self.variant, feat_dim=self.feat_dim,
                      n_parts=self.n_parts, ibn=self.ibn)
        return make_osnet_embed_fn(
            model, self.variables, crop_size=(self.crop_h, self.crop_w))

    def preprocess(self, image, detections: pd.DataFrame,
                   metadata: pd.Series):
        import cv2
        h0, w0 = image.shape[:2]
        work = cv2.resize(image, (self.work_w, self.work_h))
        sx = self.work_w / w0
        sy = self.work_h / h0
        boxes = np.zeros((self.max_dets, 4), np.float32)
        rows = np.full(self.max_dets, -1, np.int64)
        n = min(len(detections), self.max_dets)
        if n:
            ltwh = np.stack(detections["bbox_ltwh"].to_numpy()[:n])
            boxes[:n, 0] = ltwh[:, 0] * sx
            boxes[:n, 1] = ltwh[:, 1] * sy
            boxes[:n, 2] = (ltwh[:, 0] + ltwh[:, 2]) * sx
            boxes[:n, 3] = (ltwh[:, 1] + ltwh[:, 3]) * sy
            rows[:n] = detections.index.to_numpy()[:n]
        return {"image": work, "boxes": boxes, "rows": rows}

    def process(self, batch, detections: pd.DataFrame,
                metadatas: pd.DataFrame):
        if self._infer is None:
            self._build()
        out = self._infer(batch["image"], batch["boxes"])
        emb = np.asarray(out["embeddings"], np.float32)
        parts = np.asarray(out["part_features"], np.float32)
        vis = np.asarray(out["visibility"], np.float32)
        rows_mat = np.asarray(batch["rows"])
        idx, embs, viss = [], [], []
        for b in range(rows_mat.shape[0]):
            for d in range(rows_mat.shape[1]):
                r = rows_mat[b, d]
                if r < 0:
                    continue
                idx.append(r)
                if self.use_parts:
                    embs.append(parts[b, d])
                    viss.append(vis[b, d])
                else:
                    embs.append(emb[b, d])
                    viss.append(np.ones(1, np.float32))
        result = pd.DataFrame(index=idx)
        result["embeddings"] = embs
        result["visibility_scores"] = viss
        return result
