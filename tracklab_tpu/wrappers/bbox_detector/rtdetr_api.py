"""RT-DETR detector module (the reference's RTDetr wrapper role):
NMS-free query-based detection -> bbox columns."""
from __future__ import annotations

import logging

import numpy as np
import pandas as pd

from tracklab_tpu.wrappers.bbox_detector.yolox_api import YOLOXDetector

log = logging.getLogger(__name__)

__all__ = ["RTDETRDetector"]


class RTDETRDetector(YOLOXDetector):
    """Two model families behind one wrapper:

    * ``variant`` in {r18vd, r34vd, r50vd, r101vd}: the HF-exact
      RT-DETR (models/rtdetr_hf.py) — checkpoint-compatible with the
      PekingU zoo the reference's RTDetr wrapper loads
      (transformers_api.py + rtdetr_transformers*.yaml); preprocessing
      follows RTDetrImageProcessor (stretch-resize, 1/255, no
      normalization, no letterbox).
    * other variants: the lightweight first-party query detector
      (models/rtdetr.py) with the shared letterbox pipeline.
    """

    HF_VARIANTS = ("r18vd", "r34vd", "r50vd", "r101vd")

    def __init__(self, *args, num_queries: int = 100, **kwargs):
        self.num_queries = num_queries
        super().__init__(*args, **kwargs)

    @property
    def _hf_mode(self):
        return self.variant in self.HF_VARIANTS

    @property
    def supports_fused_detect(self):
        # Only the HF variants have a fused device_detect_fn; the
        # lightweight variant must fall back to the staged engine
        # (engine/offline.py gates on this attribute).
        return self._hf_mode

    @staticmethod
    def crop_meta(meta):
        """Output-box -> stretch-resized-frame coords for device ReID
        crops (engine/fused.py): frame_xy = out_xy / scale, no padding —
        the inverse of the per-axis stretch unscale in ``process``."""
        import numpy as np
        s = np.asarray(meta["scale"], np.float32)
        return {"scale": 1.0 / s,
                "pad": np.zeros_like(s)}

    def preprocess(self, image, detections, metadata):
        if not self._hf_mode:
            return super().preprocess(image, detections, metadata)
        import cv2
        h0, w0 = image.shape[:2]
        th, tw = self.input_size
        resized = cv2.resize(image, (tw, th),
                             interpolation=cv2.INTER_LINEAR)
        return {
            "image": resized,
            # stretch-resize: per-axis scale, no padding
            "scale": np.array([w0 / tw, h0 / th], np.float32),
            "pad": np.zeros(2, np.float32),
            "shape": np.array([w0, h0], np.float32),
        }

    def process(self, batch, detections, metadatas):
        if not self._hf_mode:
            return super().process(batch, detections, metadatas)
        if self._infer is None:
            self._build()
        out = self._infer(batch["image"])
        ltrb = np.asarray(out["ltrb"])
        score = np.asarray(out["score"])
        cls = np.asarray(out["cls"])
        valid = np.asarray(out["valid"])
        rows = []
        for i, (image_id, metadata) in enumerate(metadatas.iterrows()):
            sx, sy = np.asarray(batch["scale"][i])
            w0, h0 = np.asarray(batch["shape"][i])
            for d in np.nonzero(valid[i])[0]:
                box = ltrb[i, d].copy()
                box[0::2] = np.clip(box[0::2] * sx, 0, w0)
                box[1::2] = np.clip(box[1::2] * sy, 0, h0)
                lt = box[:2]
                wh = box[2:] - box[:2]
                if wh[0] <= 0 or wh[1] <= 0:
                    continue
                rows.append(pd.Series(dict(
                    image_id=image_id,
                    video_id=metadata.video_id,
                    category_id=int(cls[i, d]) + self.class_offset,
                    bbox_ltwh=np.concatenate([lt, wh]).astype(
                        np.float32),
                    bbox_conf=float(score[i, d]),
                ), name=self.id))
                self.id += 1
        return rows

    def device_detect_fn(self):
        """Jit-ready ``(frames, meta) -> Detections`` for the fused
        engine path. HF mode decodes NMS-free top-k queries and maps
        boxes back through the per-axis stretch scale — identical math
        to ``process`` above. (The inherited YOLOX closure would apply
        YOLOX decode+NMS semantics to a query model, so it must not be
        used here.)"""
        if not self._hf_mode:
            raise NotImplementedError(
                "fused engine path supports the HF RT-DETR variants "
                f"{self.HF_VARIANTS}; variant={self.variant!r} uses "
                "the staged engine")
        if self._infer is None:
            self._build()
        import jax.numpy as jnp

        from tracklab_tpu.engine.fused import make_rtdetr_detect_fn
        return make_rtdetr_detect_fn(
            self._model, self._variables, self.input_size,
            conf_threshold=self.min_confidence, max_dets=self.max_dets,
            compute_dtype=jnp.float32)

    def _build(self):
        if self._hf_mode:
            return self._build_hf()
        import jax
        import jax.numpy as jnp
        from tracklab_tpu.models.rtdetr import RTDETR

        model = RTDETR(num_classes=self.num_classes,
                       num_queries=self.num_queries,
                       variant=self.variant)
        h, w = self.input_size
        if self._variables is not None:
            variables = self._variables
        elif self.checkpoint_path:
            from tracklab_tpu.models.convert import load_checkpoint
            variables = load_checkpoint(self.checkpoint_path, model,
                                        (1, h, w, 3))
        else:
            log.warning("RTDETRDetector: random weights")
            variables = model.init(jax.random.PRNGKey(0),
                                   jnp.zeros((1, h, w, 3)), train=False)

        def infer(images):
            x = images.astype(jnp.float32) / 255.0
            xywh, scores, classes = model.apply(
                variables, x, method=RTDETR.predict)
            # top max_dets queries by score (NMS-free), fixed shapes
            k = min(self.max_dets, scores.shape[1])
            top_s, top_i = jax.lax.top_k(scores, k)
            take = jax.vmap(lambda a, i: a[i])
            ltrb = jnp.concatenate([
                take(xywh, top_i)[..., :2]
                - take(xywh, top_i)[..., 2:] / 2,
                take(xywh, top_i)[..., :2]
                + take(xywh, top_i)[..., 2:] / 2], axis=-1)
            return {
                "ltrb": ltrb,
                "score": top_s,
                "cls": take(classes, top_i),
                "valid": top_s >= self.min_confidence,
            }

        self._model = model
        self._variables = variables
        self._infer = jax.jit(infer)

    def _build_hf(self):
        import jax
        import jax.numpy as jnp
        from tracklab_tpu.models.rtdetr_hf import (
            RTDetrHF, postprocess_rtdetr,
        )

        model = RTDetrHF(variant=self.variant,
                         num_labels=max(self.num_classes, 1))
        h, w = self.input_size
        if self._variables is not None:
            variables = self._variables
        elif self.checkpoint_path:
            from pathlib import Path

            from tracklab_tpu.models.convert import (
                convert_rtdetr_hf_torch, load_checkpoint,
            )
            if Path(self.checkpoint_path).suffix in (".pth", ".pt",
                                                     ".bin"):
                variables = convert_rtdetr_hf_torch(
                    self.checkpoint_path, model, (1, h, w, 3))
            else:
                variables = load_checkpoint(self.checkpoint_path,
                                            model, (1, h, w, 3))
        else:
            log.warning("RTDETRDetector(%s): random weights",
                        self.variant)
            variables = model.init(jax.random.PRNGKey(0),
                                   jnp.zeros((1, h, w, 3)),
                                   train=False)

        def infer(images):
            # RTDetrImageProcessor: rescale 1/255, NO normalization
            x = images.astype(jnp.float32) / 255.0
            logits, boxes = model.apply(variables, x, train=False)
            return postprocess_rtdetr(
                logits, boxes, img_w=w, img_h=h,
                conf_threshold=self.min_confidence,
                max_out=self.max_dets)

        self._model = model
        self._variables = variables
        self._infer = jax.jit(infer)

    @staticmethod
    def _preproc(imgs):
        import jax.numpy as jnp
        # RTDetrImageProcessor: rescale 1/255, NO normalization
        return imgs.astype(jnp.float32) / 255.0

    def detection_loss_fn(self, outputs, gt_boxes, gt_valid, input_hw,
                          num_classes):
        """Hungarian set matching + VFL/L1/GIoU
        (models/rtdetr_train.py) — the HF RTDetrLoss criterion on the
        same engine signature as the YOLO-family losses."""
        from tracklab_tpu.models.rtdetr_train import rtdetr_detection_loss
        return rtdetr_detection_loss(outputs, gt_boxes, gt_valid,
                                     input_hw, num_classes)

    def train(self, tracking_dataset, pipeline=None, evaluator=None,
              dataset_cfg=None, **kwargs):
        """Fine-tune on the dataset's GT boxes (module.train() hook).
        The reference trains RT-DETR out-of-band through HF's Trainer;
        here it's the shared Flax loop (detector_train_engine.py) with
        the DETR set-matching criterion."""
        from tracklab_tpu.models.detector_train_engine import (
            train_detector,
        )
        return train_detector(self, tracking_dataset, **kwargs)
