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

__all__ = ["KPReId", "KPReIdBatched"]

IMAGENET_MEAN = (0.485 * 255, 0.456 * 255, 0.406 * 255)
IMAGENET_STD = (0.229 * 255, 0.224 * 255, 0.225 * 255)


class KPReId(DetectionLevelModule):
    input_columns = ["bbox_ltwh"]
    output_columns = ["embeddings", "visibility_scores"]
    training_enabled = True
    collate_fn = staticmethod(default_collate)

    @property
    def supports_fused_parts(self):
        # the engine's fused fast path can inline KPR between a fused
        # detector and the part-based tracker (engine/fused.py:
        # run_fused_parts_video) — but only in the promptless mode: with
        # no pose module inside the fused prefix there are no keypoint
        # prompts to rasterize (preprocess builds zero maps in exactly
        # that case)
        return not self.use_keypoints

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
                 embed_buckets=None,
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
        # live-prefix compaction widths for the fused engine path
        # (engine/fused.py:fused_detect_parts_track embed_buckets —
        # output-identical; None = embed every slot)
        self.embed_buckets = (tuple(embed_buckets)
                              if embed_buckets else None)
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

    def device_embed_fn(self):
        """Jit-ready ``(frames, boxes) -> dict`` closure for the fused
        engine path: device crop-and-resize + KPR forward with zero
        prompts, identical math to ``_infer`` over host crops in the
        ``use_keypoints=False`` mode (the crops just come from the
        caller's frames via models/preprocess.crop_resize instead of the
        host crop_bbox+cv2.resize — same bilinear convention, border
        handling documented in tests/test_fused_pipeline.py)."""
        if self._infer is None:
            self._build()
        from tracklab_tpu.engine.fused import make_kpr_embed_fn
        return make_kpr_embed_fn(
            self.model, self.variables,
            crop_size=(self.crop_h, self.crop_w),
            n_prompt_ch=self.n_prompt_ch,
            test_embeddings=self.test_embeddings,
            binary_visibility=self.binary_visibility,
            vis_thresh=self.vis_thresh)

    @property
    def supports_fused_prompted_parts(self):
        # the 4-module fused prefix (detect -> pose -> KPR -> BPBReID,
        # engine/fused.py:run_fused_gsr_video) rasterizes the keypoint
        # prompts on device from the in-program pose output
        return self.use_keypoints

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


class KPReIdBatched(KPReId):
    """Image-level batched KPR: all of a frame's crops in one XLA
    program (counterpart of OSNetReIdBatched for the part-based model —
    the detection-level KPReId crops per detection on host threads).
    Each frame is staged once, ``models/preprocess.crop_resize`` gathers
    every detection's crop on device, and KPR runs over the whole
    (frames x detections) batch. With ``use_keypoints=True`` the cck6
    gaussian prompt maps are rasterized ON DEVICE from the
    keypoints_xyc column (models/kpr.py:gaussian_prompt_maps — the maps
    are crop-relative, so scaling keypoints and boxes into work
    coordinates together leaves them identical to the host rasterizer's
    original-coordinate maps); otherwise the prompts are zero. Fusable
    with a device detector and the part-based tracker into one program
    (engine/fused.py: run_fused_parts_video / run_fused_gsr_video)."""

    level = "image"

    def __init__(self, *args, work_size=(736, 1280), max_dets: int = 32,
                 n_keypoints: int = 17, **kwargs):
        super().__init__(*args, **kwargs)
        self.work_h, self.work_w = work_size
        self.max_dets = max_dets
        self.n_keypoints = n_keypoints
        self.input_columns = ["bbox_ltwh"] + (
            ["keypoints_xyc"] if self.use_keypoints else [])

    def _build(self):
        super()._build()
        import jax
        embed = self.device_embed_fn()
        self._infer_batched = jax.jit(embed)

    def preprocess(self, image, detections: pd.DataFrame,
                   metadata: pd.Series):
        import cv2
        h0, w0 = image.shape[:2]
        work = cv2.resize(image, (self.work_w, self.work_h))
        sx = self.work_w / w0
        sy = self.work_h / h0
        boxes = np.zeros((self.max_dets, 4), np.float32)
        rows = np.full(self.max_dets, -1, np.int64)
        kps = np.zeros((self.max_dets, self.n_keypoints, 3), np.float32)
        n = min(len(detections), self.max_dets)
        if n:
            ltwh = np.stack(detections["bbox_ltwh"].to_numpy()[:n])
            boxes[:n, 0] = ltwh[:, 0] * sx
            boxes[:n, 1] = ltwh[:, 1] * sy
            boxes[:n, 2] = (ltwh[:, 0] + ltwh[:, 2]) * sx
            boxes[:n, 3] = (ltwh[:, 1] + ltwh[:, 3]) * sy
            rows[:n] = detections.index.to_numpy()[:n]
            if self.use_keypoints and "keypoints_xyc" in detections:
                for i, (_, k) in enumerate(
                        detections["keypoints_xyc"].items()):
                    if i >= self.max_dets or not isinstance(
                            k, np.ndarray):
                        continue
                    r = min(len(k), self.n_keypoints)
                    kps[i, :r] = k[:r]
                # into work coordinates alongside the boxes (the prompt
                # maps are crop-relative, so the pair stays equivalent)
                kps[:, :, 0] *= sx
                kps[:, :, 1] *= sy
        out = {"image": work, "boxes": boxes, "rows": rows}
        if self.use_keypoints:
            out["keypoints"] = kps
        return out

    def process(self, batch, detections: pd.DataFrame,
                metadatas: pd.DataFrame):
        if self._infer is None or not hasattr(self, "_infer_batched"):
            self._build()
        if self.use_keypoints:
            out = self._infer_batched(batch["image"], batch["boxes"],
                                      batch["keypoints"])
        else:
            out = self._infer_batched(batch["image"], batch["boxes"])
        emb = np.asarray(out["embeddings"], np.float32)
        vis = np.asarray(out["visibility"], np.float32)
        rows_mat = np.asarray(batch["rows"])
        idx, embs, viss = [], [], []
        for b in range(rows_mat.shape[0]):
            for d in range(rows_mat.shape[1]):
                r = rows_mat[b, d]
                if r < 0:
                    continue
                idx.append(r)
                embs.append(emb[b, d])
                viss.append(vis[b, d])
        result = pd.DataFrame(index=idx)
        result["embeddings"] = embs
        result["visibility_scores"] = viss
        return result
