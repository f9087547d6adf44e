"""RT-DETR detector module (the reference's RTDetr wrapper role):
NMS-free query-based detection -> bbox columns."""
from __future__ import annotations

import logging

import numpy as np
import pandas as pd

from tracklab_tpu.wrappers.bbox_detector.yolox_api import YOLOXDetector

log = logging.getLogger(__name__)

__all__ = ["RTDETRDetector"]


class RTDETRDetector(YOLOXDetector):
    def __init__(self, *args, num_queries: int = 100, **kwargs):
        self.num_queries = num_queries
        super().__init__(*args, **kwargs)

    def _build(self):
        import jax
        import jax.numpy as jnp
        from tracklab_tpu.models.rtdetr import RTDETR

        model = RTDETR(num_classes=self.num_classes,
                       num_queries=self.num_queries,
                       variant=self.variant)
        h, w = self.input_size
        if self._variables is not None:
            variables = self._variables
        elif self.checkpoint_path:
            from tracklab_tpu.models.convert import load_checkpoint
            variables = load_checkpoint(self.checkpoint_path, model,
                                        (1, h, w, 3))
        else:
            log.warning("RTDETRDetector: random weights")
            variables = model.init(jax.random.PRNGKey(0),
                                   jnp.zeros((1, h, w, 3)), train=False)

        def infer(images):
            x = images.astype(jnp.float32) / 255.0
            xywh, scores, classes = model.apply(
                variables, x, method=RTDETR.predict)
            # top max_dets queries by score (NMS-free), fixed shapes
            k = min(self.max_dets, scores.shape[1])
            top_s, top_i = jax.lax.top_k(scores, k)
            take = jax.vmap(lambda a, i: a[i])
            ltrb = jnp.concatenate([
                take(xywh, top_i)[..., :2]
                - take(xywh, top_i)[..., 2:] / 2,
                take(xywh, top_i)[..., :2]
                + take(xywh, top_i)[..., 2:] / 2], axis=-1)
            return {
                "ltrb": ltrb,
                "score": top_s,
                "cls": take(classes, top_i),
                "valid": top_s >= self.min_confidence,
            }

        self._model = model
        self._variables = variables
        self._infer = jax.jit(infer)

    def train(self, *args, **kwargs):
        raise NotImplementedError(
            "Use models.rtdetr.rtdetr_loss with a custom loop; the "
            "wrapper-level engine currently targets the YOLOX head")
