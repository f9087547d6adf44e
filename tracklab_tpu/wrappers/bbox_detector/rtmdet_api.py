"""RTMDet detector module: images -> bbox columns.

The JAX/Flax replacement for the reference's rtmlib/ONNX RTMDet path
(tracklab/wrappers/bbox_detector/rtmlib_api.py:14-46 with
configs/modules/bbox_detector/rtmdet_rtmlib.yaml). Same pipeline shape
as YOLOXDetector — host letterbox, one jitted normalize -> backbone ->
decode -> NMS program — with the CSPNeXt/RTMDet architecture
(models/rtmdet.py) and mmdet checkpoint conversion
(models/convert.py:convert_rtmdet_torch).
"""
from __future__ import annotations

import logging

from tracklab_tpu.wrappers.bbox_detector.yolox_api import YOLOXDetector

log = logging.getLogger(__name__)

__all__ = ["RTMDetDetector"]


class RTMDetDetector(YOLOXDetector):
    """Drop-in RTMDet variant of the detector module (rtmlib default:
    nano at 320x320, person class)."""

    def __init__(self, variant: str = "nano", input_size=(320, 320),
                 **kwargs):
        kwargs.setdefault("min_confidence", 0.45)
        super().__init__(variant=variant, input_size=input_size, **kwargs)

    def _build(self):
        import jax
        import jax.numpy as jnp
        from tracklab_tpu.models.rtmdet import RTMDet
        from tracklab_tpu.ops.nms import postprocess_detections

        model = RTMDet(num_classes=self.num_classes,
                       variant=self.variant)
        h, w = self.input_size
        if self._variables is not None:
            variables = self._variables
        elif self.checkpoint_path:
            from pathlib import Path

            from tracklab_tpu.models.convert import (
                convert_rtmdet_torch, load_checkpoint,
            )
            if Path(self.checkpoint_path).suffix in (".pth", ".pt"):
                variables = convert_rtmdet_torch(
                    self.checkpoint_path, model, (1, h, w, 3))
            else:
                variables = load_checkpoint(self.checkpoint_path, model,
                                            (1, h, w, 3))
        else:
            log.warning("RTMDetDetector: no checkpoint_path given — "
                        "running with random weights")
            variables = model.init(jax.random.PRNGKey(0),
                                   jnp.zeros((1, h, w, 3)), train=False)

        # mmdet's normalization lives in its data_preprocessor (not the
        # state dict): BGR mean/std [103.53,116.28,123.675] /
        # [57.375,57.12,58.395] — RGB order here since the pipeline
        # decodes to RGB. Converted checkpoints expect it.
        mean = jnp.asarray([123.675, 116.28, 103.53])
        std = jnp.asarray([58.395, 57.12, 57.375])

        def infer(images):
            images = (images.astype(jnp.float32) - mean) / std
            decoded = model.apply(variables, images,
                                  method=RTMDet.predict)
            return postprocess_detections(
                decoded, conf_threshold=self.min_confidence,
                iou_threshold=self.nms_iou, max_out=self.max_dets)

        self._model = model
        self._variables = variables
        self._infer = jax.jit(infer)

    def device_detect_fn(self):
        """Fused-engine closure with THIS family's preprocessing (the
        inherited YOLOX closure feeds raw 0-255 pixels; RTMDet expects
        the mmdet data_preprocessor mean/std normalize like the staged
        ``infer`` above)."""
        if self._infer is None:
            self._build()
        import jax.numpy as jnp
        from tracklab_tpu.engine.fused import make_yolox_detect_fn
        mean = jnp.asarray([123.675, 116.28, 103.53])
        std = jnp.asarray([58.395, 57.12, 57.375])
        return make_yolox_detect_fn(
            self._model, self._variables,
            conf_threshold=self.min_confidence,
            iou_threshold=self.nms_iou, max_dets=self.max_dets,
            compute_dtype=jnp.float32,
            preproc=lambda x: (x - mean) / std)
