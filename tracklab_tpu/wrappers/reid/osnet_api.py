"""ReID module: detection crops -> appearance embeddings.

Rebuild of the reference KPReId wrapper (tracklab/wrappers/reid/
kpreid_api.py:21-186): a DetectionLevelModule that crops each detection,
runs the OSNet backbone and emits ``embeddings`` (global), plus
``visibility_scores`` when part features are enabled (KPR interface).
Crops are cut host-side to a fixed (256, 128) and batched; normalize +
backbone run as one jitted device program. Training (module.train())
runs the Flax ReID engine (models/reid_train.py) instead of delegating
to torchreid.
"""
from __future__ import annotations

import logging

import numpy as np
import pandas as pd

from tracklab_tpu.pipeline.levels import DetectionLevelModule
from tracklab_tpu.utils.collate import default_collate

log = logging.getLogger(__name__)

__all__ = ["OSNetReId", "select_backbone_model"]

IMAGENET_MEAN = (0.485 * 255, 0.456 * 255, 0.406 * 255)
IMAGENET_STD = (0.229 * 255, 0.224 * 255, 0.225 * 255)


def select_backbone_model(backbone, variant="x1_0", feat_dim=512,
                          n_parts=6, ibn=False, crop_size=(256, 128)):
    """Resolve a ``backbone=`` string to its Flax model (the reference
    zoo's public keys). Raises ValueError for unknown names and for the
    fixed-input models given a mismatched crop."""
    crop_h, crop_w = crop_size
    if backbone == "osnet":
        from tracklab_tpu.models.osnet import OSNet

        return OSNet(variant=variant, feat_dim=feat_dim,
                     n_parts=n_parts, ibn=ibn)
    from tracklab_tpu.models.osnet import OSNET_AIN_VARIANTS, OSNetAIN
    from tracklab_tpu.models.reid_backbones import (
        MOBILENETV2_VARIANTS, RESNET_VARIANTS, SHUFFLENETV2_VARIANTS,
        ReidDenseNet, ReidHACNN, ReidInceptionResNetV2,
        ReidInceptionV4, ReidMLFN, ReidMobileNetV2, ReidMuDeep,
        ReidPCB, ReidResNet, ReidResNetIBN, ReidResNetIBNb,
        ReidResNetMid, ReidSEResNet, ReidShuffleNetV2, ReidSqueezeNet,
        ReidXception,
    )
    from tracklab_tpu.models.nasnet_reid import ReidNASNetAMobile

    ain = backbone.replace("osnet_", "")
    if backbone in RESNET_VARIANTS:
        return ReidResNet(variant=backbone)
    if backbone in MOBILENETV2_VARIANTS:
        return ReidMobileNetV2(variant=backbone)
    if ain in OSNET_AIN_VARIANTS:
        return OSNetAIN(variant=ain, feat_dim=feat_dim)
    if backbone in SHUFFLENETV2_VARIANTS:
        return ReidShuffleNetV2(variant=backbone)
    simple = {
        "resnet50_ibn_a": ReidResNetIBN,
        "resnet50_ibn_b": ReidResNetIBNb,
        "resnet50mid": ReidResNetMid,
        "se_resnet50": ReidSEResNet,
        "densenet121": ReidDenseNet,
        "squeezenet1_0": ReidSqueezeNet,
        "mlfn": ReidMLFN,
        "xception": ReidXception,
        "inceptionv4": ReidInceptionV4,
        "inceptionresnetv2": ReidInceptionResNetV2,
        "nasnetamobile": ReidNASNetAMobile,
    }
    if backbone in simple:
        return simple[backbone]()
    if backbone in ("pcb_p6", "pcb_p4"):
        return ReidPCB(parts=6 if backbone == "pcb_p6" else 4)
    if backbone == "hacnn":
        if (crop_h, crop_w) != (160, 64):
            raise ValueError("HACNN requires crop_size=(160, 64) "
                             "(fixed upstream input)")
        return ReidHACNN()
    if backbone == "mudeep":
        if (crop_h, crop_w) != (256, 128):
            raise ValueError("MuDeep requires crop_size=(256, 128)")
        return ReidMuDeep()
    raise ValueError(f"Unknown reid backbone {backbone!r}")


class OSNetReId(DetectionLevelModule):
    input_columns = ["bbox_ltwh"]
    output_columns = ["embeddings", "visibility_scores"]
    training_enabled = True
    collate_fn = staticmethod(default_collate)

    # COCO-17 keypoint groups -> body parts (KPR's part structure):
    # head, torso, arms, legs, feet
    KP_GROUPS = [
        [0, 1, 2, 3, 4],
        [5, 6, 11, 12],
        [7, 8, 9, 10],
        [13, 14],
        [15, 16],
    ]

    def __init__(self, variant: str = "x1_0", feat_dim: int = 512,
                 n_parts: int = 6, crop_size=(256, 128),
                 batch_size: int = 32, use_parts: bool = True,
                 use_keypoints: bool = False, ibn: bool = False,
                 checkpoint_path: str | None = None, device=None,
                 backbone: str = "osnet", **kwargs):
        super().__init__(batch_size)
        # backbone zoo (reference strong_sort/deep/models): "osnet"
        # (part-capable) or a torchreid global-feature backbone:
        # resnet18/34/50/101, resnet50_fc512, mobilenetv2_x1_0/x1_4,
        # osnet_ain_x1_0/x0_75/x0_5/x0_25, shufflenet_v2_x0_5..x2_0,
        # resnet50_ibn_a, densenet121, squeezenet1_0, mlfn,
        # se_resnet50, resnet50mid, xception, hacnn (crop 160x64),
        # pcb_p6/pcb_p4, mudeep (crop 256x128), inceptionv4,
        # inceptionresnetv2, nasnetamobile
        self.backbone = backbone
        if backbone != "osnet":
            use_parts = False
            use_keypoints = False
        self.variant = variant
        self.feat_dim = feat_dim
        self.n_parts = n_parts
        self.crop_h, self.crop_w = crop_size
        self.use_parts = use_parts
        self.use_keypoints = use_keypoints
        self.ibn = ibn
        self.checkpoint_path = checkpoint_path
        self._infer = None
        self.variables = None
        if use_keypoints:
            # keypoint prompt masks ride as extra input channels and
            # part visibility comes from keypoint confidence per group
            # (the KPR prompt mechanism, reference kpreid_api.py)
            self.input_columns = ["bbox_ltwh", "keypoints_xyc"]

    @property
    def _in_channels(self):
        return 3 + (len(self.KP_GROUPS) if self.use_keypoints else 0)

    def _build(self):
        import jax
        import jax.numpy as jnp

        model = select_backbone_model(
            self.backbone, variant=self.variant,
            feat_dim=self.feat_dim, n_parts=self.n_parts, ibn=self.ibn,
            crop_size=(self.crop_h, self.crop_w))
        shape = (1, self.crop_h, self.crop_w, self._in_channels)
        if self.checkpoint_path:
            from pathlib import Path

            from tracklab_tpu.models.convert import (
                convert_reid_backbone_torch, load_checkpoint,
            )
            if (self.backbone != "osnet"
                    and Path(self.checkpoint_path).suffix
                    in (".pth", ".pt")):
                self.variables = convert_reid_backbone_torch(
                    self.checkpoint_path, model, shape)
            else:
                self.variables = load_checkpoint(
                    self.checkpoint_path, model, shape)
        elif self.variables is None:
            log.warning("OSNetReId: no checkpoint — random weights")
            self.variables = model.init(
                jax.random.PRNGKey(0), jnp.zeros(shape), train=False)
        self.model = model
        mean = jnp.asarray(IMAGENET_MEAN)
        std = jnp.asarray(IMAGENET_STD)
        variables = self.variables

        def infer(crops):
            rgb = (crops[..., :3].astype(jnp.float32) - mean) / std
            x = jnp.concatenate(
                [rgb, crops[..., 3:].astype(jnp.float32)], axis=-1) \
                if crops.shape[-1] > 3 else rgb
            out = self.model.apply(variables, x, train=False)
            if isinstance(out, dict):
                return out
            # global-feature zoo backbones: one "part" = the global
            # feature, visibility 1 (the reference StrongSORT consumes
            # these as flat embeddings)
            return {"embeddings": out,
                    "part_features": out[:, None, :],
                    "visibility": jnp.ones((out.shape[0], 1),
                                           out.dtype)}

        self._infer = jax.jit(infer)

    def preprocess(self, image, detection: pd.Series, metadata: pd.Series):
        import cv2
        from tracklab_tpu.utils.cv2 import crop_bbox
        crop = crop_bbox(image, detection["bbox_ltwh"])
        crop = cv2.resize(crop, (self.crop_w, self.crop_h),
                          interpolation=cv2.INTER_LINEAR).astype(
                              np.float32)
        sample = {"crop": crop}
        if self.use_keypoints:
            from tracklab_tpu.wrappers.reid.reid_dataset import (
                gaussian_keypoint_masks,
            )
            kp = detection.get("keypoints_xyc")
            G = len(self.KP_GROUPS)
            prompts = np.zeros((self.crop_h, self.crop_w, G), np.float32)
            kp_vis = np.zeros(G, np.float32)
            if kp is not None and isinstance(kp, np.ndarray):
                masks = gaussian_keypoint_masks(
                    kp, (self.crop_h, self.crop_w),
                    detection["bbox_ltwh"])
                for g, idxs in enumerate(self.KP_GROUPS):
                    idxs = [i for i in idxs if i < len(kp)]
                    if idxs:
                        prompts[..., g] = masks[idxs].max(axis=0)
                        kp_vis[g] = float(np.max(kp[idxs, 2]))
            sample["crop"] = np.concatenate([crop, prompts], axis=-1)
            sample["kp_vis"] = kp_vis
        return sample

    def process(self, batch, detections: pd.DataFrame,
                metadatas: pd.DataFrame):
        if self._infer is None:
            self._build()
        out = self._infer(batch["crop"])
        emb = np.asarray(out["embeddings"], np.float32)
        parts = np.asarray(out["part_features"], np.float32)
        vis = np.asarray(out["visibility"], np.float32)
        if self.use_keypoints and "kp_vis" in batch:
            # keypoint-derived part visibility (global part stays 1);
            # stripe parts beyond the keypoint groups keep activation mass
            kv = np.asarray(batch["kp_vis"], np.float32)
            vis = vis.copy()
            g = min(kv.shape[1], vis.shape[1] - 1)
            vis[:, 1:1 + g] = kv[:, :g]
        result = pd.DataFrame(index=detections.index)
        if self.use_parts:
            result["embeddings"] = list(parts)
            result["visibility_scores"] = list(vis)
        else:
            result["embeddings"] = list(emb)
            result["visibility_scores"] = [
                np.ones(1, np.float32)] * len(detections)
        return result

    # ------------------------------------------------------------------
    def train(self, tracking_dataset, pipeline, evaluator, dataset_cfg,
              epochs: int = 5, **kwargs):
        """Train on GT crops of the dataset's train split
        (reference: kpreid_api.py:184-186 -> torchreid engine; here the
        Flax engine in models/reid_train.py)."""
        from tracklab_tpu.models.reid_train import train_reid
        self.variables, metrics = train_reid(
            self, tracking_dataset, epochs=epochs, **kwargs)
        self._infer = None  # rebuild with the trained weights
        return metrics
