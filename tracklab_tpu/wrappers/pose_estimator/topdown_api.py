"""Top-down pose module: per-detection crop -> keypoints.

Plays the RTMPose/VitPose role (reference:
tracklab/wrappers/pose_estimator/rtmlib_api.py:15-46 top-down path,
transformers_api.py:11-35): consumes bbox_ltwh, emits keypoints_xyc (in
image coordinates) and keypoints_conf.
"""
from __future__ import annotations

import logging

import numpy as np
import pandas as pd

from tracklab_tpu.pipeline.levels import DetectionLevelModule
from tracklab_tpu.utils.collate import default_collate

log = logging.getLogger(__name__)

__all__ = ["TopDownPoseEstimator"]


class TopDownPoseEstimator(DetectionLevelModule):
    input_columns = ["bbox_ltwh"]
    output_columns = ["keypoints_xyc", "keypoints_conf"]
    collate_fn = staticmethod(default_collate)

    def __init__(self, variant: str = "s", num_keypoints: int = 17,
                 crop_size=(256, 192), batch_size: int = 32,
                 backbone: str = "csp",
                 checkpoint_path: str | None = None, device=None,
                 **kwargs):
        super().__init__(batch_size)
        self.variant = variant
        self.num_keypoints = num_keypoints
        self.crop_h, self.crop_w = crop_size
        self.backbone = backbone
        self.checkpoint_path = checkpoint_path
        self._infer = None

    def _build(self):
        import jax
        import jax.numpy as jnp

        if self.backbone == "vit":
            from tracklab_tpu.models.vitpose import ViTPose
            model = ViTPose(num_keypoints=self.num_keypoints,
                            variant=self.variant)
        elif self.backbone == "simcc":
            # RTMPose-style SimCC codec (models/pose.py:SimCCPose)
            from tracklab_tpu.models.pose import SimCCPose
            model = SimCCPose(num_keypoints=self.num_keypoints,
                              variant=self.variant,
                              input_size=(self.crop_h, self.crop_w))
        else:
            from tracklab_tpu.models.pose import TopDownPose
            model = TopDownPose(num_keypoints=self.num_keypoints,
                                variant=self.variant)
        shape = (1, self.crop_h, self.crop_w, 3)
        if self.checkpoint_path:
            from tracklab_tpu.models.convert import load_checkpoint
            variables = load_checkpoint(self.checkpoint_path, model,
                                        shape)
        else:
            log.warning("TopDownPoseEstimator: random weights")
            variables = model.init(jax.random.PRNGKey(0),
                                   jnp.zeros(shape), train=False)

        def infer(crops):
            return model.predict_keypoints(
                variables, crops.astype(jnp.float32) / 255.0)

        self._infer = jax.jit(infer)

    def preprocess(self, image, detection: pd.Series,
                   metadata: pd.Series):
        import cv2
        from tracklab_tpu.utils.cv2 import crop_bbox
        l, t, w, h = np.asarray(detection["bbox_ltwh"], float)
        crop = crop_bbox(image, detection["bbox_ltwh"])
        ch, cw = crop.shape[:2]
        crop = cv2.resize(crop, (self.crop_w, self.crop_h))
        return {"crop": crop,
                "origin": np.array([l, t], np.float32),
                "scale": np.array([cw / self.crop_w, ch / self.crop_h],
                                  np.float32)}

    def process(self, batch, detections: pd.DataFrame,
                metadatas: pd.DataFrame):
        if self._infer is None:
            self._build()
        kp = np.array(self._infer(batch["crop"]), np.float32,
                      copy=True)
        kp[..., 0] = kp[..., 0] * batch["scale"][:, 0:1] \
            + batch["origin"][:, 0:1]
        kp[..., 1] = kp[..., 1] * batch["scale"][:, 1:2] \
            + batch["origin"][:, 1:2]
        result = pd.DataFrame(index=detections.index)
        result["keypoints_xyc"] = list(kp)
        result["keypoints_conf"] = kp[..., 2].mean(axis=1).astype(float)
        return result
