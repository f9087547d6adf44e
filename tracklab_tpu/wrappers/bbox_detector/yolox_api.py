"""YOLOX detector module: images -> bbox columns.

The JAX/Flax replacement for the reference's detector wrappers
(tracklab/wrappers/bbox_detector/yolo_ultralytics_api.py:22-72,
rtmlib_api.py:14-46): host threads decode + letterbox (C++ OpenCV), the
device runs normalize -> backbone -> decode -> NMS as one jitted program,
and fixed-shape outputs come back as detection-level DataFrame rows
(image_id, video_id, category_id, bbox_ltwh, bbox_conf).

Weights: Flax checkpoints via orbax, or converted from torch YOLOX
checkpoints (models/convert.py) when the user supplies the reference's
.pth files.
"""
from __future__ import annotations

import logging
from typing import Any

import numpy as np
import pandas as pd

from tracklab_tpu.pipeline.levels import ImageLevelModule
from tracklab_tpu.utils.collate import default_collate

log = logging.getLogger(__name__)

__all__ = ["YOLOXDetector"]


class YOLOXDetector(ImageLevelModule):
    input_columns = []
    output_columns = ["image_id", "video_id", "category_id", "bbox_ltwh",
                      "bbox_conf"]
    collate_fn = staticmethod(default_collate)
    # the engine's fused fast path can inline this detector into one
    # detector->NMS->tracker device program (engine/fused.py)
    supports_fused_detect = True

    def __init__(self, variant: str = "s", num_classes: int = 1,
                 input_size=(640, 640), min_confidence: float = 0.4,
                 nms_iou: float = 0.65, max_dets: int = 64,
                 batch_size: int = 8, checkpoint_path: str | None = None,
                 class_offset: int = 1, quant: str | None = None,
                 device=None, **kwargs):
        super().__init__(batch_size)
        self.variant = variant
        self.num_classes = num_classes
        self.input_size = tuple(input_size)
        self.min_confidence = min_confidence
        self.nms_iou = nms_iou
        self.max_dets = max_dets
        self.class_offset = class_offset
        self.checkpoint_path = checkpoint_path
        # quant="int8": s8xs8->s32 MXU convs with activation scales
        # calibrated on the FIRST processed batch (models/quantize.py);
        # call calibrate(images) up front to pin scales explicitly
        self.quant = quant
        self._qvars = None
        self._model = None
        self._variables = None
        self._infer = None
        self.id = 0  # global detection row id (yolo_ultralytics_api.py:62)

    # ------------------------------------------------------------------
    def _make_model(self, quant=None):
        """The family's Flax model (subclasses override — the quant
        modes must construct the same architecture)."""
        from tracklab_tpu.models.yolox import YOLOX
        return YOLOX(num_classes=self.num_classes, variant=self.variant,
                     quant=quant)

    @staticmethod
    def _preproc(images):
        """uint8 images -> the family's model input domain."""
        import jax.numpy as jnp
        return images.astype(jnp.float32)

    def _build(self):
        import jax
        import jax.numpy as jnp

        model = self._make_model()
        h, w = self.input_size
        if self._variables is not None:
            variables = self._variables
        elif self.checkpoint_path:
            from tracklab_tpu.models.convert import load_checkpoint
            variables = load_checkpoint(self.checkpoint_path, model,
                                        (1, h, w, 3))
        else:
            log.warning("%s: no checkpoint_path given — running with "
                        "random weights", type(self).__name__)
            variables = model.init(jax.random.PRNGKey(0),
                                   jnp.zeros((1, h, w, 3)), train=False)

        self._model = model
        self._variables = variables
        self._infer = self._make_infer(model, variables)

    def _make_infer(self, model, variables):
        import jax
        from tracklab_tpu.ops.nms import postprocess_detections

        def infer(images):
            decoded = model.apply(variables, self._preproc(images),
                                  method=type(model).predict)
            return postprocess_detections(
                decoded, conf_threshold=self.min_confidence,
                iou_threshold=self.nms_iou, max_out=self.max_dets)

        return jax.jit(infer)

    def calibrate(self, images):
        """Pin the int8 activation scales from sample images (any
        uint8/float (B, H, W, 3) batch at the model input size) and
        switch inference to the quantized model. Called automatically on
        the first processed batch when ``quant='int8'``."""
        import jax.numpy as jnp
        from tracklab_tpu.models.quantize import calibrate_int8
        if self._infer is None:
            self._build()
        self._qvars = calibrate_int8(
            self._make_model("calib"), self._variables,
            [self._preproc(jnp.asarray(images))])
        self._int8_model = self._make_model("int8")
        self._infer = self._make_infer(self._int8_model, self._qvars)

    def device_detect_fn(self):
        """Jit-ready ``(frames, meta) -> Detections`` closure for the
        fused engine path — identical math to ``process`` (the device
        unletterbox reproduces the host rescale/clip/drop exactly,
        tests/test_fused_pipeline.py)."""
        if self._infer is None:
            self._build()
        import jax.numpy as jnp
        from tracklab_tpu.engine.fused import make_yolox_detect_fn
        model, variables = self._model, self._variables
        if self.quant == "int8":
            if self._qvars is None:
                log.warning(
                    "quant='int8' but no calibration has run — the "
                    "fused program uses the float model; call "
                    "calibrate(images) before building the fused "
                    "pipeline to quantize it")
            else:
                model, variables = self._int8_model, self._qvars
        return make_yolox_detect_fn(
            model, variables,
            conf_threshold=self.min_confidence,
            iou_threshold=self.nms_iou, max_dets=self.max_dets,
            compute_dtype=jnp.float32)

    @staticmethod
    def crop_meta(meta):
        """Per-frame affine mapping output-box coords back into the
        letterboxed frame for device ReID crops (engine/fused.py:
        fused_detect_reid_track): frame_xy = out_xy * scale + pad — the
        exact inverse of the unletterbox in ``process``."""
        import numpy as np
        s = np.asarray(meta["scale"], np.float32)
        return {"scale": np.stack([s, s], axis=1),
                "pad": np.asarray(meta["pad"], np.float32)}

    # ------------------------------------------------------------------
    def preprocess(self, image, detections, metadata) -> Any:
        """Host-side: BGR decode already done; letterbox with cv2."""
        import cv2
        h0, w0 = image.shape[:2]
        th, tw = self.input_size
        scale = min(th / h0, tw / w0)
        nh, nw = int(round(h0 * scale)), int(round(w0 * scale))
        resized = cv2.resize(image, (nw, nh),
                             interpolation=cv2.INTER_LINEAR)
        canvas = np.full((th, tw, 3), 114, np.uint8)
        top = (th - nh) // 2
        left = (tw - nw) // 2
        canvas[top:top + nh, left:left + nw] = resized
        return {
            "image": canvas,
            "scale": np.float32(scale),
            "pad": np.array([left, top], np.float32),
            "shape": np.array([w0, h0], np.float32),
        }

    def process(self, batch, detections, metadatas: pd.DataFrame):
        if self._infer is None:
            self._build()
        if self.quant == "int8" and self._qvars is None:
            self.calibrate(batch["image"])
        out = self._infer(batch["image"])
        ltrb = np.asarray(out["ltrb"])
        score = np.asarray(out["score"])
        cls = np.asarray(out["cls"])
        valid = np.asarray(out["valid"])
        rows = []
        for i, (image_id, metadata) in enumerate(metadatas.iterrows()):
            scale = float(batch["scale"][i])
            pad = np.asarray(batch["pad"][i])
            w0, h0 = np.asarray(batch["shape"][i])
            for d in np.nonzero(valid[i])[0]:
                box = ltrb[i, d].copy()
                box[0::2] = (box[0::2] - pad[0]) / scale
                box[1::2] = (box[1::2] - pad[1]) / scale
                box[0::2] = np.clip(box[0::2], 0, w0)
                box[1::2] = np.clip(box[1::2], 0, h0)
                lt = box[:2]
                wh = box[2:] - box[:2]
                if wh[0] <= 0 or wh[1] <= 0:
                    continue
                rows.append(pd.Series(dict(
                    image_id=image_id,
                    video_id=metadata.video_id,
                    category_id=int(cls[i, d]) + self.class_offset,
                    bbox_ltwh=np.concatenate([lt, wh]).astype(np.float32),
                    bbox_conf=float(score[i, d]),
                ), name=self.id))
                self.id += 1
        return rows

    # ------------------------------------------------------------------
    def train(self, tracking_dataset, pipeline=None, evaluator=None,
              dataset_cfg=None, **kwargs):
        """Fine-tune on the dataset's GT boxes (the reference's
        module.train() hook, main.py:44-46) via the Flax detection
        engine."""
        from tracklab_tpu.models.detector_train_engine import (
            train_detector,
        )
        return train_detector(self, tracking_dataset, **kwargs)
