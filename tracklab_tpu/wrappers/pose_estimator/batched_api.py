"""Batched device-side top-down pose: all of a frame's crops in one XLA
program.

Counterpart of reid/batched_api.py for pose — the detection-level
TopDownPoseEstimator crops + resizes per detection on host threads
(reference shape: rtmlib/VitPose wrappers run per-bbox host preprocessing,
tracklab/wrappers/pose_estimator/rtmlib_api.py:15-46); here each frame is
staged once, ``models/preprocess.crop_resize`` gathers every detection's
crop on device, and the pose net runs over the whole (frames x
detections) batch. Keypoints come back already mapped to original image
coordinates.
"""
from __future__ import annotations

import logging

import numpy as np
import pandas as pd

from tracklab_tpu.pipeline.levels import ImageLevelModule
from tracklab_tpu.utils.collate import default_collate

log = logging.getLogger(__name__)

__all__ = ["TopDownPoseBatched"]


class TopDownPoseBatched(ImageLevelModule):
    input_columns = ["bbox_ltwh"]
    output_columns = ["keypoints_xyc", "keypoints_conf"]
    collate_fn = staticmethod(default_collate)
    # the engine's fused fast path can inline this module between a
    # fused detector and a tracker (engine/fused.py:
    # run_fused_pose_video) — crops then come from the detector's
    # letterboxed frames instead of this module's work-image resize
    supports_fused_pose = True

    def __init__(self, variant: str = "s", num_keypoints: int = 17,
                 crop_size=(256, 192), work_size=(736, 1280),
                 max_dets: int = 32, batch_size: int = 4,
                 backbone: str = "csp",
                 checkpoint_path: str | None = None, device=None,
                 **kwargs):
        super().__init__(batch_size)
        self.variant = variant
        self.num_keypoints = num_keypoints
        self.crop_h, self.crop_w = crop_size
        self.work_h, self.work_w = work_size
        self.max_dets = max_dets
        self.backbone = backbone
        self.checkpoint_path = checkpoint_path
        self._infer = None
        self.variables = None

    def _build(self):
        import jax
        import jax.numpy as jnp
        from tracklab_tpu.models.preprocess import crop_resize_auto

        if self.backbone == "vit":
            from tracklab_tpu.models.vitpose import ViTPose
            model = ViTPose(num_keypoints=self.num_keypoints,
                            variant=self.variant)
        else:
            from tracklab_tpu.models.pose import TopDownPose
            model = TopDownPose(num_keypoints=self.num_keypoints,
                                variant=self.variant)
        shape = (1, self.crop_h, self.crop_w, 3)
        if self.checkpoint_path:
            from tracklab_tpu.models.convert import load_checkpoint
            self.variables = load_checkpoint(self.checkpoint_path,
                                             model, shape)
        elif self.variables is None:
            log.warning("TopDownPoseBatched: random weights")
            self.variables = model.init(jax.random.PRNGKey(0),
                                        jnp.zeros(shape), train=False)
        variables = self.variables
        ch, cw = self.crop_h, self.crop_w

        def infer(images, boxes):
            # images (B, H, W, 3) uint8 work-size; boxes (B, D, 4) ltrb
            # in work coordinates
            crops = jax.vmap(
                lambda img, b: crop_resize_auto(img, b, ch, cw))(images, boxes)
            B, D = crops.shape[0], crops.shape[1]
            x = crops.reshape(B * D, ch, cw, 3).astype(jnp.float32) / 255.0
            kp = model.predict_keypoints(variables, x)   # (B*D, K, 3)
            kp = kp.reshape(B, D, self.num_keypoints, 3)
            # crop coords -> work coords -> caller rescales to original
            w = boxes[..., 2] - boxes[..., 0]
            h = boxes[..., 3] - boxes[..., 1]
            x0 = boxes[..., 0]
            y0 = boxes[..., 1]
            kx = kp[..., 0] * (w / cw)[..., None] + x0[..., None]
            ky = kp[..., 1] * (h / ch)[..., None] + y0[..., None]
            return jnp.stack([kx, ky, kp[..., 2]], axis=-1)

        self._infer = jax.jit(infer)

    def device_pose_fn(self):
        """Jit-ready ``(frames, boxes) -> keypoints (B, D, K, 3)``
        closure for the fused engine path: device crop-and-resize + pose
        forward, identical math to ``_infer`` (crops from the caller's
        frames; keypoints in the caller's frame coordinates)."""
        if self._infer is None:
            self._build()
        from tracklab_tpu.engine.fused import make_topdown_pose_fn
        if self.backbone == "vit":
            from tracklab_tpu.models.vitpose import ViTPose
            model = ViTPose(num_keypoints=self.num_keypoints,
                            variant=self.variant)
        else:
            from tracklab_tpu.models.pose import TopDownPose
            model = TopDownPose(num_keypoints=self.num_keypoints,
                                variant=self.variant)
        return make_topdown_pose_fn(
            model, self.variables, crop_size=(self.crop_h, self.crop_w),
            num_keypoints=self.num_keypoints)

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
        return {"image": work, "boxes": boxes, "rows": rows,
                "scale": np.array([1.0 / sx, 1.0 / sy], np.float32)}

    def process(self, batch, detections: pd.DataFrame,
                metadatas: pd.DataFrame):
        if self._infer is None:
            self._build()
        kp = np.array(self._infer(batch["image"], batch["boxes"]),
                      np.float32, copy=True)
        rows_mat = np.asarray(batch["rows"])
        scales = np.asarray(batch["scale"])
        idx, kps, confs = [], [], []
        for b in range(rows_mat.shape[0]):
            for d in range(rows_mat.shape[1]):
                r = rows_mat[b, d]
                if r < 0:
                    continue
                k = kp[b, d].copy()
                k[:, 0] *= scales[b, 0]   # work -> original coords
                k[:, 1] *= scales[b, 1]
                idx.append(r)
                kps.append(k)
                confs.append(float(k[:, 2].mean()))
        result = pd.DataFrame(index=idx)
        result["keypoints_xyc"] = kps
        result["keypoints_conf"] = confs
        return result
