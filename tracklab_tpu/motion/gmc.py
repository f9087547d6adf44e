"""Global (camera) motion compensation.

Rebuild of the reference's GMC/ECC machinery
(plugins/track/bot_sort/gmc.py:80-303 — ECC, ORB/SIFT+RANSAC, sparse
optical flow; plugins/track/strong_sort/sort/track.py:129-236 per-track
ECC) as a pipeline module: frame-pair registration runs host-side (C++
OpenCV — iterative image registration is a poor fit for XLA's static
control flow), and the resulting per-frame 2x3 affine warps flow to the
device trackers as an image-level column, where applying them to track
means is a batched matmul (trackers/strongsort.py:_apply_warp,
trackers/botsort.py).
"""
from __future__ import annotations

import logging

import numpy as np
import pandas as pd

from tracklab_tpu.pipeline.levels import ImageLevelModule
from tracklab_tpu.utils.collate import Unbatchable, default_collate

log = logging.getLogger(__name__)

__all__ = ["GMC", "CameraMotion"]

IDENTITY = np.eye(2, 3, dtype=np.float32)


class GMC:
    """Frame-pair global motion estimator.

    methods: "sparseOptFlow" (goodFeaturesToTrack + pyramidal LK +
    estimateAffinePartial2D/RANSAC — gmc.py:239-303), "ecc"
    (findTransformECC euclidean — gmc.py:80-111), "lk_jax" (the
    device-side dense pyramidal LK, motion/lk_jax.py), "none".
    """

    def __init__(self, method: str = "sparseOptFlow", downscale: int = 2):
        self.method = method
        self.downscale = max(int(downscale), 1)

    def _prep(self, frame):
        import cv2
        if frame.ndim == 3:
            frame = cv2.cvtColor(frame, cv2.COLOR_RGB2GRAY)
        if self.downscale > 1:
            frame = cv2.resize(frame, (frame.shape[1] // self.downscale,
                                       frame.shape[0] // self.downscale))
        return frame

    def apply(self, prev, cur) -> np.ndarray:
        """Returns a 2x3 affine warp mapping prev-frame coords to
        cur-frame coords (full resolution)."""
        if self.method == "none" or prev is None:
            return IDENTITY.copy()
        if self.method == "lk_jax":
            import jax.numpy as jnp
            from tracklab_tpu.motion.lk_jax import estimate_affine_lk
            prev_g = self._prep(prev)
            cur_g = self._prep(cur)
            H = np.asarray(estimate_affine_lk(
                jnp.asarray(prev_g), jnp.asarray(cur_g)),
                dtype=np.float32)
            if self.downscale > 1:
                H = H.copy()
                H[0, 2] *= self.downscale
                H[1, 2] *= self.downscale
            return H
        import cv2
        prev_g = self._prep(prev)
        cur_g = self._prep(cur)
        H = IDENTITY.copy()
        try:
            if self.method == "ecc":
                criteria = (cv2.TERM_CRITERIA_EPS
                            | cv2.TERM_CRITERIA_COUNT, 100, 1e-5)
                _, H = cv2.findTransformECC(prev_g, cur_g, H.copy(),
                                            cv2.MOTION_EUCLIDEAN,
                                            criteria, None, 1)
            elif self.method == "sparseOptFlow":
                pts = cv2.goodFeaturesToTrack(
                    prev_g, maxCorners=1000, qualityLevel=0.01,
                    minDistance=1, blockSize=3, useHarrisDetector=False,
                    k=0.04)
                if pts is None or len(pts) < 8:
                    return IDENTITY.copy()
                nxt, status, _ = cv2.calcOpticalFlowPyrLK(
                    prev_g, cur_g, pts, None)
                good = status.reshape(-1).astype(bool)
                if good.sum() < 8:
                    return IDENTITY.copy()
                M, _ = cv2.estimateAffinePartial2D(
                    pts[good], nxt[good], method=cv2.RANSAC)
                if M is not None:
                    H = M.astype(np.float32)
            else:
                raise ValueError(f"Unknown GMC method {self.method}")
        except cv2.error as e:  # registration failures degrade gracefully
            log.debug("GMC failed (%s); identity warp", e)
            return IDENTITY.copy()
        # rescale translation back to full resolution
        if self.downscale > 1:
            H = H.copy()
            H[0, 2] *= self.downscale
            H[1, 2] *= self.downscale
        return H.astype(np.float32)


class CameraMotion(ImageLevelModule):
    """Pipeline module: per-frame GMC warp vs the previous frame, stored
    as the image-level column ``gmc_warp`` consumed by warp-aware trackers
    (StrongSORT/BoT-SORT/Deep-OC-SORT wrappers)."""

    input_columns = []
    output_columns = {"image": ["gmc_warp"], "detection": []}
    collate_fn = staticmethod(default_collate)

    def __init__(self, method: str = "sparseOptFlow", downscale: int = 2,
                 batch_size: int = 4, device=None, **kwargs):
        super().__init__(batch_size)
        self.gmc = GMC(method, downscale)
        self.reset()

    def reset(self):
        self._prev = None

    def preprocess(self, image, detections, metadata):
        return {"image": Unbatchable(image)}

    def process(self, batch, detections, metadatas: pd.DataFrame):
        warps = []
        for image, (image_id, metadata) in zip(batch["image"],
                                               metadatas.iterrows()):
            w = self.gmc.apply(self._prev, image)
            self._prev = image
            warps.append(pd.Series(dict(gmc_warp=w), name=image_id))
        return [], warps
