"""Detector fine-tuning engine: train a Flax detector on tracking GT.

The reference delegates detector training to external engines
(ultralytics / mmdet); here ``DetectorModule.train()`` runs this Flax
loop: GT boxes from the tracking train split, host letterbox, SimOTA
detection loss (models/train.py), dp-shardable jitted steps.
"""
from __future__ import annotations

import logging

import numpy as np

log = logging.getLogger(__name__)

__all__ = ["train_detector"]


def _gather_batches(tracking_dataset, input_hw, max_images, split):
    import cv2
    from tracklab_tpu.utils.cv2 import cv2_load_image
    ts = tracking_dataset.sets.get(split) or next(
        iter(tracking_dataset.sets.values()))
    dets = ts.detections_gt
    images, boxes_all = [], []
    th, tw = input_hw
    by_image = dets.groupby("image_id") if len(dets) else None
    count = 0
    for image_id, meta in ts.image_metadatas.iterrows():
        if count >= max_images:
            break
        try:
            img = cv2_load_image(meta["file_path"])
        except Exception:
            continue
        h0, w0 = img.shape[:2]
        scale = min(th / h0, tw / w0)
        nh, nw = int(round(h0 * scale)), int(round(w0 * scale))
        canvas = np.full((th, tw, 3), 114, np.uint8)
        top, left = (th - nh) // 2, (tw - nw) // 2
        canvas[top:top + nh, left:left + nw] = cv2.resize(img, (nw, nh))
        rows = (by_image.get_group(image_id)
                if by_image is not None
                and image_id in by_image.groups else None)
        gt = []
        if rows is not None:
            for _, det in rows.iterrows():
                l, t, w, h = np.asarray(det["bbox_ltwh"], float)
                gt.append([(l + w / 2) * scale + left,
                           (t + h / 2) * scale + top,
                           w * scale, h * scale,
                           float(det.get("category_id", 1)) - 1])
        images.append(canvas)
        boxes_all.append(np.asarray(gt, np.float32).reshape(-1, 5))
        count += 1
    return images, boxes_all


def train_detector(module, tracking_dataset, epochs: int = 3,
                   batch_size: int = 4, lr: float = 1e-4,
                   max_images: int = 256, max_gt: int = 64,
                   split: str = "train", seed: int = 0):
    """Fine-tune the wrapper's model in place; returns metrics dict."""
    import jax
    import jax.numpy as jnp
    import optax

    if module._infer is None:
        module._build()
    # family-specific loss: YOLOX SimOTA by default; a module exposing
    # detection_loss_fn (same signature) overrides — YOLOv8/YOLO11 use
    # the TAL + CIoU + DFL loss (models/yolov8_train.py)
    detection_loss = getattr(module, "detection_loss_fn", None)
    if detection_loss is None:
        from tracklab_tpu.models.train import detection_loss
    preproc = getattr(module, "_preproc",
                      lambda imgs: imgs.astype(jnp.float32))
    model = module._model
    variables = module._variables
    h, w = module.input_size
    images, boxes_all = _gather_batches(tracking_dataset, (h, w),
                                        max_images, split)
    if not images:
        log.warning("train_detector: no training images found")
        return {}
    n = len(images)
    log.info("train_detector: %d images", n)
    G = max_gt
    gt_boxes = np.zeros((n, G, 5), np.float32)
    gt_valid = np.zeros((n, G), bool)
    for i, gt in enumerate(boxes_all):
        k = min(len(gt), G)
        gt_boxes[i, :k] = gt[:k]
        gt_valid[i, :k] = True
    images = np.stack(images)

    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = optax.adamw(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, imgs, gb, gv):
        def loss_fn(p, bs):
            outs, mut = model.apply(
                {"params": p, "batch_stats": bs},
                preproc(imgs), train=True,
                mutable=["batch_stats"])
            n_cls = getattr(model, "num_classes",
                            getattr(model, "num_labels", None))
            return detection_loss(outs, gb, gv, (h, w),
                                  n_cls), mut["batch_stats"]

        (loss, bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats)
        updates, opt2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), bs, opt2, loss

    rng = np.random.default_rng(seed)
    bsz = min(batch_size, n)
    losses = []
    for epoch in range(epochs):
        order = rng.permutation(n)
        for i in range(0, n - bsz + 1, bsz):
            idx = order[i:i + bsz]
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state,
                jnp.asarray(images[idx]), jnp.asarray(gt_boxes[idx]),
                jnp.asarray(gt_valid[idx]))
        losses.append(float(loss))
        log.info("train_detector epoch %d: loss %.4f", epoch,
                 float(loss))
    module._variables = {"params": params, "batch_stats": batch_stats}
    module._infer = None  # rebuild with trained weights
    module.variables = module._variables
    return {"loss": losses}
