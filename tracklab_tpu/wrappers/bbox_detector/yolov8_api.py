"""YOLOv8 detector module (the reference's YOLOUltralytics role,
tracklab/wrappers/bbox_detector/yolo_ultralytics_api.py:22-72): images ->
bbox columns through the Flax YOLOv8 + device NMS."""
from __future__ import annotations

import logging

from tracklab_tpu.wrappers.bbox_detector.yolox_api import YOLOXDetector

log = logging.getLogger(__name__)

__all__ = ["YOLOv8Detector"]


class YOLOv8Detector(YOLOXDetector):
    """Same pipeline surface as YOLOXDetector with the YOLOv8 / YOLO11
    backbones and DFL decode. variant "n".."x" selects YOLOv8;
    "11n".."11x" selects YOLO11 (the family the reference's default
    config loads — yolo_ultralytics.yaml -> yolo11m.pt)."""

    def _make_model(self, quant=None):
        if self.variant.startswith("11"):
            from tracklab_tpu.models.yolo11 import YOLO11

            return YOLO11(num_classes=self.num_classes,
                          variant=self.variant[2:], quant=quant)
        from tracklab_tpu.models.yolov8 import YOLOv8

        return YOLOv8(num_classes=self.num_classes,
                      variant=self.variant, quant=quant)

    @staticmethod
    def _preproc(images):
        import jax.numpy as jnp
        return images.astype(jnp.float32) / 255.0

    def device_detect_fn(self):
        """Fused-engine closure with THIS family's preprocessing (the
        inherited YOLOX closure feeds raw 0-255 pixels; YOLOv8/YOLO11
        expect /255 like the staged ``infer``)."""
        if self._infer is None:
            self._build()
        import jax.numpy as jnp
        from tracklab_tpu.engine.fused import make_yolox_detect_fn
        model, variables = self._model, self._variables
        if self.quant == "int8" and self._qvars is not None:
            model, variables = self._int8_model, self._qvars
        return make_yolox_detect_fn(
            model, variables,
            conf_threshold=self.min_confidence,
            iou_threshold=self.nms_iou, max_dets=self.max_dets,
            compute_dtype=jnp.float32, preproc=lambda x: x / 255.0)

    def detection_loss_fn(self, outputs, gt_boxes, gt_valid, input_hw,
                          num_classes):
        """TAL + CIoU + DFL loss (models/yolov8_train.py) — the DFL-head
        counterpart of the YOLOX SimOTA loss, same engine signature."""
        from tracklab_tpu.models.yolov8_train import v8_detection_loss
        return v8_detection_loss(outputs, gt_boxes, gt_valid, input_hw,
                                 num_classes,
                                 reg_max=self._model.reg_max)

    def train(self, tracking_dataset, pipeline=None, evaluator=None,
              dataset_cfg=None, **kwargs):
        """Fine-tune on the dataset's GT boxes (module.train() hook).
        The reference trains this family out-of-band via the external
        ultralytics engine; here it's the same Flax loop as YOLOX with
        the v8 loss."""
        from tracklab_tpu.models.detector_train_engine import (
            train_detector,
        )
        return train_detector(self, tracking_dataset, **kwargs)
