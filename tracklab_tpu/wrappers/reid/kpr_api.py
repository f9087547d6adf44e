"""KPReId wrapper: the reference's flagship part-based ReID module.

Rebuild of tracklab/wrappers/reid/kpreid_api.py:21-186 on the Flax KPR
model (models/kpr.py — promptable ViT + BPBReID part head) instead of
the torchreid-fork ``build_model``:

* preprocess (ref :114-144): crop the detection box, resize to the model
  input, and rasterize keypoint prompts — positive keypoints grouped by
  the cck6 scheme into 6 gaussian-heatmap channels plus one channel of
  negative (other-person) keypoints (ref ``KeypointsToMasks`` at
  :76-80; the ``negative_kps`` sample key at :131).
* process (ref :146-183): one jitted normalize->KPR forward;
  ``extract_test_embeddings`` stacks the configured branches
  (default ['bn_foreg','parts']) into ``embeddings`` (1+K, D) and
  ``visibility_scores`` (1+K) per detection — the exact columns the
  BPBReID-StrongSORT tracker consumes.
* train (ref :185-186): Flax fine-tune on GT crops (id cross-entropy on
  the foreground branch + parts, the part_based loss family of
  bpbreid.yaml) instead of the torchreid engine.

The lightweight OSNet+PCB alternative stays in osnet_api.OSNetReId.
"""
from __future__ import annotations

import logging

import numpy as np
import pandas as pd

from tracklab_tpu.pipeline.levels import DetectionLevelModule
from tracklab_tpu.utils.collate import default_collate

log = logging.getLogger(__name__)

__all__ = ["KPReId"]

IMAGENET_MEAN = (0.485 * 255, 0.456 * 255, 0.406 * 255)
IMAGENET_STD = (0.229 * 255, 0.224 * 255, 0.225 * 255)


class KPReId(DetectionLevelModule):
    input_columns = ["bbox_ltwh"]
    output_columns = ["embeddings", "visibility_scores"]
    training_enabled = True
    collate_fn = staticmethod(default_collate)

    def __init__(self, crop_size=(384, 128), batch_size: int = 32,
                 num_parts: int = 5, dim_reduce_output: int = 512,
                 embed_dim: int = 768, depth: int = 12,
                 num_heads: int = 12, patch_size: int = 16,
                 stride: int = 16,
                 test_embeddings=("bn_foreg", "parts"),
                 binary_visibility: bool = True,
                 use_keypoints: bool = True,
                 vis_thresh: float = 0.3,
                 checkpoint_path: str | None = None, device=None,
                 **kwargs):
        super().__init__(batch_size)
        self.crop_h, self.crop_w = crop_size
        self.num_parts = num_parts
        self.arch = dict(
            num_parts=num_parts, dim_reduce_output=dim_reduce_output,
            img_size=tuple(crop_size), patch_size=patch_size,
            stride=stride, embed_dim=embed_dim, depth=depth,
            num_heads=num_heads)
        self.test_embeddings = tuple(test_embeddings)
        self.binary_visibility = binary_visibility
        self.use_keypoints = use_keypoints
        self.vis_thresh = vis_thresh
        self.checkpoint_path = checkpoint_path
        self.variables = None
        self._infer = None
        if use_keypoints:
            self.input_columns = ["bbox_ltwh", "keypoints_xyc"]

    # ------------------------------------------------------------------
    @property
    def n_prompt_ch(self):
        from tracklab_tpu.models.kpr import PROMPT_GROUPS_CCK6
        return len(PROMPT_GROUPS_CCK6) + 1  # + negative-keypoint channel

    def _build(self):
        import jax
        import jax.numpy as jnp
        from tracklab_tpu.models.kpr import KPR, extract_test_embeddings

        model = KPR(n_prompt_ch=self.n_prompt_ch, **self.arch)
        shape = (1, self.crop_h, self.crop_w, 3)
        if self.checkpoint_path:
            from tracklab_tpu.models.convert import load_checkpoint
            self.variables = load_checkpoint(self.checkpoint_path, model,
                                             shape)
        elif self.variables is None:
            log.warning("KPReId: no checkpoint_path — random weights")
            self.variables = model.init(
                jax.random.PRNGKey(0), jnp.zeros(shape),
                jnp.zeros(shape[:3] + (self.n_prompt_ch,)), train=False)
        self.model = model
        mean = jnp.asarray(IMAGENET_MEAN)
        std = jnp.asarray(IMAGENET_STD)
        variables = self.variables
        names = self.test_embeddings
        binary = self.binary_visibility

        def infer(crops, prompts):
            x = (crops.astype(jnp.float32) - mean) / std
            out = model.apply(variables, x, prompts.astype(jnp.float32),
                              train=False)
            emb, vis = extract_test_embeddings(out, names, binary)
            return {"embeddings": emb, "visibility": vis}

        self._infer = jax.jit(infer)

    # ------------------------------------------------------------------
    def preprocess(self, image, detection: pd.Series, metadata: pd.Series):
        import cv2
        from tracklab_tpu.utils.cv2 import crop_bbox
        crop = crop_bbox(image, detection["bbox_ltwh"])
        crop = cv2.resize(crop, (self.crop_w, self.crop_h),
                          interpolation=cv2.INTER_LINEAR).astype(
                              np.float32)
        prompts = np.zeros((self.crop_h, self.crop_w, self.n_prompt_ch),
                           np.float32)
        if self.use_keypoints:
            prompts = self._prompt_masks(detection)
        return {"crop": crop, "prompts": prompts}

    def _prompt_masks(self, detection):
        """Positive keypoints -> cck6 gaussian channels; negative_kps ->
        the trailing channel (ref kpreid_api.py:127-131)."""
        from tracklab_tpu.models.kpr import PROMPT_GROUPS_CCK6
        from tracklab_tpu.wrappers.reid.reid_dataset import (
            gaussian_keypoint_masks,
        )
        G = len(PROMPT_GROUPS_CCK6)
        prompts = np.zeros((self.crop_h, self.crop_w, G + 1), np.float32)
        kp = detection.get("keypoints_xyc")
        if isinstance(kp, np.ndarray) and len(kp):
            masks = gaussian_keypoint_masks(
                kp, (self.crop_h, self.crop_w), detection["bbox_ltwh"])
            conf_ok = kp[:, 2] >= self.vis_thresh
            for g, idxs in enumerate(PROMPT_GROUPS_CCK6):
                idxs = [i for i in idxs if i < len(kp) and conf_ok[i]]
                if idxs:
                    prompts[..., g] = masks[idxs].max(axis=0)
        neg = detection.get("negative_kps")
        if isinstance(neg, np.ndarray) and len(neg):
            neg_masks = gaussian_keypoint_masks(
                neg, (self.crop_h, self.crop_w), detection["bbox_ltwh"])
            prompts[..., G] = neg_masks.max(axis=0)
        return prompts

    # ------------------------------------------------------------------
    def process(self, batch, detections: pd.DataFrame,
                metadatas: pd.DataFrame):
        if self._infer is None:
            self._build()
        out = self._infer(batch["crop"], batch["prompts"])
        emb = np.asarray(out["embeddings"], np.float32)
        vis = np.asarray(out["visibility"], np.float32)
        result = pd.DataFrame(index=detections.index)
        result["embeddings"] = list(emb)
        result["visibility_scores"] = list(vis)
        return result

    # ------------------------------------------------------------------
    def train(self, tracking_dataset, pipeline=None, evaluator=None,
              dataset_cfg=None, epochs: int = 3, **kwargs):
        """Fine-tune on GT crops (reference kpreid_api.py:185-186 runs
        the torchreid engine; here a Flax id-classification loop over
        the foreground branch)."""
        from tracklab_tpu.models.kpr_train import train_kpr
        self.variables, metrics = train_kpr(
            self, tracking_dataset, epochs=epochs, **kwargs)
        self._infer = None
        return metrics
