"""Bottom-up pose module: full image -> boxes + keypoints in one pass.

Plays the RTMO role (reference: rtmlib_api.py:47-74): emits detections
with bbox generated from the keypoints (generate_bbox_from_keypoints) so
it can head a pipeline without a separate detector.
"""
from __future__ import annotations

import logging

import numpy as np
import pandas as pd

from tracklab_tpu.pipeline.levels import ImageLevelModule
from tracklab_tpu.utils import coordinates as C
from tracklab_tpu.utils.collate import default_collate

log = logging.getLogger(__name__)

__all__ = ["BottomUpPoseEstimator"]


class BottomUpPoseEstimator(ImageLevelModule):
    input_columns = []
    output_columns = ["image_id", "video_id", "category_id", "bbox_ltwh",
                      "bbox_conf", "keypoints_xyc", "keypoints_conf"]
    collate_fn = staticmethod(default_collate)
    # the engine's fused fast path can inline this pose-detector head
    # with a tracker into one device program (engine/fused.py:
    # run_fused_bottomup_video)
    supports_fused_bottomup = True

    def __init__(self, variant: str = "s", num_keypoints: int = 17,
                 input_size=(640, 640), min_confidence: float = 0.4,
                 nms_iou: float = 0.65, max_dets: int = 64,
                 batch_size: int = 8,
                 bbox_extension_factor=(0.05, 0.05, 0.05),
                 checkpoint_path: str | None = None, device=None,
                 **kwargs):
        super().__init__(batch_size)
        self.variant = variant
        self.num_keypoints = num_keypoints
        self.input_size = tuple(input_size)
        self.min_confidence = min_confidence
        self.nms_iou = nms_iou
        self.max_dets = max_dets
        self.bbox_ext = tuple(bbox_extension_factor)
        self.checkpoint_path = checkpoint_path
        self._infer = None
        self.id = 0

    def _build(self):
        import jax
        import jax.numpy as jnp
        from tracklab_tpu.ops.nms import postprocess_detections

        if self.variant.startswith("11"):
            # ultralytics YOLO11-pose (the reference's bottom-up pose
            # default: yolo_ultralytics-pose.yaml -> yolo11m-pose.pt)
            from tracklab_tpu.models.yolo11 import YOLO11Pose

            model = YOLO11Pose(num_classes=1,
                               num_keypoints=self.num_keypoints,
                               variant=self.variant[2:])

            def predict_fn(variables, images):
                return model.apply(variables, images / 255.0,
                                   method=YOLO11Pose.predict)
        else:
            from tracklab_tpu.models.pose import YOLOXPose

            model = YOLOXPose(num_classes=1,
                              num_keypoints=self.num_keypoints,
                              variant=self.variant)

            def predict_fn(variables, images):
                return model.predict(variables, images)
        h, w = self.input_size
        if self.checkpoint_path:
            from tracklab_tpu.models.convert import load_checkpoint
            variables = load_checkpoint(self.checkpoint_path, model,
                                        (1, h, w, 3))
        else:
            log.warning("BottomUpPoseEstimator: random weights")
            variables = model.init(jax.random.PRNGKey(0),
                                   jnp.zeros((1, h, w, 3)), train=False)

        def infer(images):
            decoded, kps = predict_fn(variables,
                                      images.astype(jnp.float32))
            out = postprocess_detections(
                decoded, conf_threshold=self.min_confidence,
                iou_threshold=self.nms_iou, max_out=self.max_dets)
            # gather keypoints for kept anchors: postprocess compacts by
            # score order; redo the top-k gather here to stay aligned
            return out, kps

        self._infer = jax.jit(infer)
        self._predict_fn = predict_fn
        self._variables = variables

    def device_detect_fn(self):
        """Jit-ready ``(frames, meta) -> (Detections, keypoints)``
        closure for the fused engine path — identical math to
        ``process`` (boxes regenerated from keypoints in original
        coordinates, nearest-center anchor match on device)."""
        if self._infer is None:
            self._build()
        from tracklab_tpu.engine.fused import make_bottomup_detect_fn
        variables = self._variables
        pf = self._predict_fn
        return make_bottomup_detect_fn(
            lambda imgs: pf(variables, imgs),
            conf_threshold=self.min_confidence,
            iou_threshold=self.nms_iou, max_dets=self.max_dets,
            bbox_extension_factor=self.bbox_ext)

    def preprocess(self, image, detections, metadata):
        import cv2
        h0, w0 = image.shape[:2]
        th, tw = self.input_size
        scale = min(th / h0, tw / w0)
        nh, nw = int(round(h0 * scale)), int(round(w0 * scale))
        resized = cv2.resize(image, (nw, nh))
        canvas = np.full((th, tw, 3), 114, np.uint8)
        top, left = (th - nh) // 2, (tw - nw) // 2
        canvas[top:top + nh, left:left + nw] = resized
        return {"image": canvas, "scale": np.float32(scale),
                "pad": np.array([left, top], np.float32),
                "shape": np.array([w0, h0], np.float32)}

    def process(self, batch, detections, metadatas: pd.DataFrame):
        if self._infer is None:
            self._build()
        out, kps_all = self._infer(batch["image"])
        # match keypoints to kept boxes by the anchor whose decoded box
        # center is nearest (the compaction loses anchor ids; centers are
        # unique in practice)
        ltrb = np.asarray(out["ltrb"])
        score = np.asarray(out["score"])
        valid = np.asarray(out["valid"])
        kps_all = np.asarray(kps_all)
        rows = []
        for i, (image_id, metadata) in enumerate(metadatas.iterrows()):
            scale = float(batch["scale"][i])
            pad = np.asarray(batch["pad"][i])
            w0, h0 = np.asarray(batch["shape"][i])
            if not valid[i].any():
                continue
            kp_centers = kps_all[i, :, :, :2].mean(axis=1)  # (A, 2)
            for d in np.nonzero(valid[i])[0]:
                box = ltrb[i, d]
                c = np.array([(box[0] + box[2]) / 2,
                              (box[1] + box[3]) / 2])
                a = int(np.argmin(
                    ((kp_centers - c) ** 2).sum(axis=1)))
                kp = kps_all[i, a].copy()
                kp[:, 0] = (kp[:, 0] - pad[0]) / scale
                kp[:, 1] = (kp[:, 1] - pad[1]) / scale
                ltwh = C.generate_bbox_from_keypoints(
                    kp, self.bbox_ext, (w0, h0))
                rows.append(pd.Series(dict(
                    image_id=image_id, video_id=metadata.video_id,
                    category_id=1,
                    bbox_ltwh=np.asarray(ltwh, np.float32),
                    bbox_conf=float(score[i, d]),
                    keypoints_xyc=kp.astype(np.float32),
                    keypoints_conf=float(kp[:, 2].mean()),
                ), name=self.id))
                self.id += 1
        return rows
