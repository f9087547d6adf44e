"""Calibration pipeline modules.

- :class:`TVCalibration` — image-level: per-frame camera parameters, by
  batched JAX gradient descent (calibration/tvcalib.py) over pitch-line
  observations from the ``pitch_lines`` image column, or passed through
  from dataset-provided parameters. Emits the ``parameters`` image column
  (the reference's camera supercategory payload).
- :class:`PitchProjection` — video-level: back-projects each detection's
  bbox bottom edge onto the pitch plane with its frame's camera, emitting
  the GSR ``bbox_pitch`` detection column
  (reference pipeline: sn-gamestate's calibration + projection stages over
  plugins/calibration/tvcalib).
"""
from __future__ import annotations

import logging

import numpy as np
import pandas as pd

from tracklab_tpu.pipeline.levels import ImageLevelModule, VideoLevelModule
from tracklab_tpu.utils.collate import Unbatchable, default_collate

log = logging.getLogger(__name__)

__all__ = ["PitchLineDetector", "TVCalibration", "PitchProjection"]


class PitchLineDetector(ImageLevelModule):
    """Image-level pitch-line segmentation front-end: emits the
    ``pitch_lines`` image column (segment name -> (N,2) pixel points)
    that :class:`TVCalibration` optimizes against.

    The reference's equivalent is InferenceSegmentationModel
    (plugins/calibration/tvcalib/inference.py:83-161): DeepLabV3 argmax
    class map -> per-line point picking on the host. Here the whole
    image -> fixed-shape per-class points contract is one jitted device
    program (models/segmentation.py)."""

    input_columns = {"image": [], "detection": []}
    output_columns = {"image": ["pitch_lines"], "detection": []}
    collate_fn = staticmethod(default_collate)

    def __init__(self, variant: str = "s", input_size=(288, 512),
                 points_per_line: int = 32,
                 checkpoint_path: str | None = None,
                 batch_size: int = 8, device=None, **kwargs):
        super().__init__(batch_size)
        from tracklab_tpu.calibration.pitch import pitch_segments
        self.segment_names = list(pitch_segments())
        self.num_classes = len(self.segment_names) + 1
        self.variant = variant
        self.input_size = tuple(input_size)
        self.points_per_line = points_per_line
        self.checkpoint_path = checkpoint_path
        self._infer = None
        self._variables = None

    def _build(self):
        import jax
        import jax.numpy as jnp
        from tracklab_tpu.models.segmentation import (
            PitchSegNet, extract_segment_points,
        )
        h, w = self.input_size
        if self.variant == "deeplabv3":
            # the reference's exact architecture (torchvision
            # deeplabv3_resnet101, inference.py:83-94) — use with the
            # converted SoccerNet pitch-seg checkpoint; its 29-class
            # argmax map re-indexes onto our segments via a LUT gather
            from tracklab_tpu.models.deeplabv3 import (
                DeepLabV3, segment_class_lut,
            )
            model = DeepLabV3()
            lut = segment_class_lut(self.segment_names)
            mean = jnp.asarray([0.485, 0.456, 0.406]) * 255.0
            std = jnp.asarray([0.229, 0.224, 0.225]) * 255.0

            def class_map(variables, images):
                x = (images - mean) / std
                return lut[model.predict(variables, x)]
        else:
            model = PitchSegNet(num_classes=self.num_classes,
                                variant=self.variant)

            def class_map(variables, images):
                return model.apply(variables, images,
                                   method=PitchSegNet.predict)
        if self._variables is not None:
            variables = self._variables
        elif self.checkpoint_path:
            from tracklab_tpu.models.convert import load_checkpoint
            variables = load_checkpoint(self.checkpoint_path, model,
                                        (1, h, w, 3))
        else:
            log.warning("PitchLineDetector: random weights")
            variables = model.init(jax.random.PRNGKey(0),
                                   jnp.zeros((1, h, w, 3)), train=False)

        def infer(images):
            cmap = class_map(variables, images)
            return jax.vmap(lambda m: extract_segment_points(
                m, self.num_classes, self.points_per_line))(cmap)

        self._variables = variables
        import jax as _jax
        self._infer = _jax.jit(infer)

    def preprocess(self, image, detections, metadata):
        import cv2
        h, w = self.input_size
        resized = cv2.resize(image, (w, h),
                             interpolation=cv2.INTER_LINEAR)
        h0, w0 = image.shape[:2]
        return {"image": resized.astype(np.float32),
                "scale": np.array([w0 / w, h0 / h], np.float32)}

    def process(self, batch, detections, metadatas: pd.DataFrame):
        if self._infer is None:
            self._build()
        xy, valid = self._infer(batch["image"])
        xy = np.asarray(xy)
        valid = np.asarray(valid)
        rows = []
        for i, (image_id, _) in enumerate(metadatas.iterrows()):
            scale = np.asarray(batch["scale"][i])
            lines = {}
            for c, name in enumerate(self.segment_names):
                pts = xy[i, c][valid[i, c]] * scale
                if len(pts):
                    lines[name] = pts.astype(np.float32)
            rows.append(pd.Series({"pitch_lines": lines}, name=image_id))
        return [], rows


class TVCalibration(ImageLevelModule):
    input_columns = {"image": [], "detection": []}
    output_columns = {"image": ["parameters"], "detection": []}
    collate_fn = staticmethod(default_collate)

    def __init__(self, steps: int = 300, lr: float = 0.05,
                 image_width: int = 1920, image_height: int = 1080,
                 batch_size: int = 16, device=None, **kwargs):
        super().__init__(batch_size)
        from tracklab_tpu.calibration.tvcalib import TVCalibConfig
        self.cfg = TVCalibConfig(steps=steps, lr=lr,
                                 image_width=image_width,
                                 image_height=image_height)

    def preprocess(self, image, detections, metadata):
        return {"pitch_lines": Unbatchable(
            metadata.get("pitch_lines", {}))}

    def process(self, batch, detections, metadatas: pd.DataFrame):
        from tracklab_tpu.calibration.tvcalib import optimize_cameras
        observations = batch["pitch_lines"]
        rows = []
        have_obs = [bool(o) for o in observations]
        cams = err = None
        if any(have_obs):
            cams, err = optimize_cameras(
                [o if o else {} for o in observations], self.cfg)
        for i, (image_id, md) in enumerate(metadatas.iterrows()):
            if have_obs[i]:
                cam = dict(cams[i])
                cam.pop("latent", None)
                cam["relative_mean_reproj"] = float(err[i])
                rows.append(pd.Series({"parameters": cam},
                                      name=image_id))
            elif md.get("parameters") is not None:
                # no pitch lines for this frame: pass through the
                # dataset-provided camera instead of the optimizer's
                # prior-mean output on an empty observation set
                rows.append(pd.Series(
                    {"parameters": md["parameters"]}, name=image_id))
        return [], rows


class PitchProjection(VideoLevelModule):
    input_columns = {"detection": ["bbox_ltwh"], "image": ["parameters"]}
    output_columns = {"detection": ["bbox_pitch"], "image": []}

    def __init__(self, image_width: int = 1920, image_height: int = 1080,
                 device=None, **kwargs):
        self.image_width = image_width
        self.image_height = image_height

    @staticmethod
    def _camera_from_params(p, width, height):
        import jax.numpy as jnp
        from tracklab_tpu.calibration.camera import CameraParams
        pp = p.get("principal_point", [width / 2, height / 2])
        pos = p.get("position_meters", [0.0, 45.0, 15.0])
        return CameraParams(
            pan=jnp.deg2rad(jnp.asarray(p.get("pan_degrees", 0.0))),
            tilt=jnp.deg2rad(jnp.asarray(p.get("tilt_degrees", 70.0))),
            roll=jnp.deg2rad(jnp.asarray(p.get("roll_degrees", 0.0))),
            focal=jnp.asarray(p.get("x_focal_length", 2500.0)),
            position=jnp.asarray([float(v) for v in pos]),
            principal=jnp.asarray([float(v) for v in pp]))

    def process(self, detections: pd.DataFrame,
                metadatas: pd.DataFrame) -> pd.DataFrame:
        from tracklab_tpu.calibration.camera import backproject_to_pitch
        import jax.numpy as jnp
        if len(detections) == 0 or "parameters" not in metadatas.columns:
            return pd.DataFrame(index=detections.index,
                                columns=["bbox_pitch"])
        out = {}
        for image_id, md in metadatas.iterrows():
            params = md.get("parameters")
            dets = detections[detections["image_id"] == image_id]
            if params is None or len(dets) == 0:
                continue
            cam = self._camera_from_params(params, self.image_width,
                                           self.image_height)
            boxes = np.stack(dets["bbox_ltwh"].to_numpy()).astype(float)
            bl = np.stack([boxes[:, 0], boxes[:, 1] + boxes[:, 3]], 1)
            br = np.stack([boxes[:, 0] + boxes[:, 2],
                           boxes[:, 1] + boxes[:, 3]], 1)
            bm = (bl + br) / 2
            pix = np.concatenate([bl, br, bm], axis=0)
            world = np.asarray(backproject_to_pitch(
                cam, jnp.asarray(pix)))
            n = len(boxes)
            for i, idx in enumerate(dets.index):
                out[idx] = {
                    "x_bottom_left": float(world[i, 0]),
                    "y_bottom_left": float(world[i, 1]),
                    "x_bottom_right": float(world[n + i, 0]),
                    "y_bottom_right": float(world[n + i, 1]),
                    "x_bottom_middle": float(world[2 * n + i, 0]),
                    "y_bottom_middle": float(world[2 * n + i, 1]),
                }
        result = pd.DataFrame(index=list(out.keys()))
        result["bbox_pitch"] = list(out.values())
        return result
