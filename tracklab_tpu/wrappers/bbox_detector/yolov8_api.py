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

    def _build(self):
        import jax
        import jax.numpy as jnp
        from tracklab_tpu.ops.nms import postprocess_detections

        if self.variant.startswith("11"):
            from tracklab_tpu.models.yolo11 import YOLO11

            model = YOLO11(num_classes=self.num_classes,
                           variant=self.variant[2:])
        else:
            from tracklab_tpu.models.yolov8 import YOLOv8

            model = YOLOv8(num_classes=self.num_classes,
                           variant=self.variant)
        h, w = self.input_size
        if self._variables is not None:
            variables = self._variables
        elif self.checkpoint_path:
            from tracklab_tpu.models.convert import load_checkpoint
            variables = load_checkpoint(self.checkpoint_path, model,
                                        (1, h, w, 3))
        else:
            log.warning("YOLOv8Detector: no checkpoint_path given — "
                        "running with random weights")
            variables = model.init(jax.random.PRNGKey(0),
                                   jnp.zeros((1, h, w, 3)), train=False)

        def infer(images):
            images = images.astype(jnp.float32) / 255.0
            decoded = model.apply(variables, images,
                                  method=type(model).predict)
            return postprocess_detections(
                decoded, conf_threshold=self.min_confidence,
                iou_threshold=self.nms_iou, max_out=self.max_dets)

        self._model = model
        self._variables = variables
        self._infer = jax.jit(infer)

    def device_detect_fn(self):
        """Fused-engine closure with THIS family's preprocessing (the
        inherited YOLOX closure feeds raw 0-255 pixels; YOLOv8/YOLO11
        expect /255 like the staged ``infer`` above)."""
        if self._infer is None:
            self._build()
        import jax.numpy as jnp
        from tracklab_tpu.engine.fused import make_yolox_detect_fn
        return make_yolox_detect_fn(
            self._model, self._variables,
            conf_threshold=self.min_confidence,
            iou_threshold=self.nms_iou, max_dets=self.max_dets,
            compute_dtype=jnp.float32, preproc=lambda x: x / 255.0)

    def train(self, *args, **kwargs):
        raise NotImplementedError(
            "YOLOv8 fine-tuning needs a DFL-aware loss (planned); "
            "train the YOLOX detector or convert YOLOv8 weights")
