"""ReID training engine (Flax/optax): softmax-CE + batch-hard triplet.

Replaces the reference's delegation to the torchreid engine
(tracklab/wrappers/reid/kpreid_api.py:184-186, SURVEY §3.5): training data
comes from GT crops of the tracking train split (the ReidDataset builder's
crop/tracklet sampling, reid/kpreid_dataset.py:158-627, reduced to its
essential identity-sampled crop batches), the loss is the standard
CE + batch-hard-triplet combination, and the step is a pure jitted
function (dp-shardable over the batch like any train step here).
"""
from __future__ import annotations

import logging

import numpy as np

log = logging.getLogger(__name__)

__all__ = ["train_reid", "batch_hard_triplet_loss"]


def batch_hard_triplet_loss(emb, labels, margin: float = 0.3):
    import jax.numpy as jnp
    emb = emb / jnp.maximum(
        jnp.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
    dist = 1.0 - emb @ emb.T
    same = labels[:, None] == labels[None, :]
    eye = jnp.eye(len(labels), dtype=bool)
    pos = jnp.where(same & ~eye, dist, -jnp.inf).max(axis=1)
    neg = jnp.where(~same, dist, jnp.inf).min(axis=1)
    valid = jnp.isfinite(pos) & jnp.isfinite(neg)
    loss = jnp.maximum(pos - neg + margin, 0.0)
    return jnp.where(valid, loss, 0.0).sum() / jnp.maximum(
        valid.sum(), 1)


def _gather_crops(tracking_dataset, crop_hw, max_ids=64,
                  max_per_id=8, split="train"):
    """GT crops grouped by (video, track) identity."""
    import cv2
    from tracklab_tpu.utils.cv2 import cv2_load_image, crop_bbox
    ts = tracking_dataset.sets.get(split) or next(
        iter(tracking_dataset.sets.values()))
    dets = ts.detections_gt
    if dets is None or len(dets) == 0:
        return np.zeros((0,) + crop_hw + (3,), np.uint8), np.zeros(0, int)
    crops, labels = [], []
    label_map = {}
    for (vid, tid), group in dets.groupby(["video_id", "track_id"]):
        if len(label_map) >= max_ids:
            break
        key = (vid, tid)
        label_map[key] = len(label_map)
        rows = group.head(max_per_id)
        for _, det in rows.iterrows():
            meta = ts.image_metadatas.loc[det["image_id"]]
            try:
                img = cv2_load_image(meta["file_path"])
            except Exception:
                continue
            crop = crop_bbox(img, det["bbox_ltwh"])
            crop = cv2.resize(crop, (crop_hw[1], crop_hw[0]))
            crops.append(crop)
            labels.append(label_map[key])
    if not crops:
        return np.zeros((0,) + crop_hw + (3,), np.uint8), np.zeros(0, int)
    return np.stack(crops), np.asarray(labels)


def train_reid(module, tracking_dataset, epochs: int = 5,
               batch_size: int = 32, lr: float = 3e-4,
               triplet_weight: float = 1.0, seed: int = 0,
               split: str = "train"):
    """Train the module's OSNet; returns (trained variables, metrics)."""
    import jax
    import jax.numpy as jnp
    import optax
    from tracklab_tpu.models.osnet import OSNet
    from tracklab_tpu.wrappers.reid.osnet_api import (
        IMAGENET_MEAN, IMAGENET_STD,
    )

    crop_hw = (module.crop_h, module.crop_w)
    crops, labels = _gather_crops(tracking_dataset, crop_hw, split=split)
    if len(crops) == 0:
        log.warning("train_reid: no GT crops available — skipping")
        return module.variables, {}
    n_ids = int(labels.max()) + 1
    log.info("train_reid: %d crops / %d identities", len(crops), n_ids)

    import flax.linen as nn

    class WithHead(nn.Module):
        backbone: OSNet
        n_classes: int

        @nn.compact
        def __call__(self, x, train=False):
            out = self.backbone(x, train=train)
            logits = nn.Dense(self.n_classes)(out["embeddings"])
            return out["embeddings"], logits

    backbone = OSNet(variant=module.variant, feat_dim=module.feat_dim,
                     n_parts=module.n_parts)
    model = WithHead(backbone, n_ids)
    rng = jax.random.PRNGKey(seed)
    variables = model.init(rng, jnp.zeros((1,) + crop_hw + (3,)),
                           train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)

    @jax.jit
    def step(params, batch_stats, opt_state, images, y):
        def loss_fn(p, bs):
            x = (images.astype(jnp.float32) - mean) / std
            (emb, logits), mut = model.apply(
                {"params": p, "batch_stats": bs}, x, train=True,
                mutable=["batch_stats"])
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
            tri = batch_hard_triplet_loss(emb, y)
            return ce + triplet_weight * tri, (mut["batch_stats"], ce, tri)

        (loss, (bs, ce, tri)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        params2 = optax.apply_updates(params, updates)
        return params2, bs, opt_state2, loss

    rng_np = np.random.default_rng(seed)
    n = len(crops)
    bsz = min(batch_size, n)
    losses = []
    for epoch in range(epochs):
        order = rng_np.permutation(n)
        for i in range(0, n - bsz + 1, bsz):
            idx = order[i:i + bsz]
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state,
                jnp.asarray(crops[idx]), jnp.asarray(labels[idx]))
        losses.append(float(loss))
        log.info("train_reid epoch %d: loss %.4f", epoch, float(loss))

    # strip the classifier head; keep backbone params for inference
    bb_params = params["backbone"]
    bb_stats = batch_stats.get("backbone", {})
    trained = {"params": bb_params, "batch_stats": bb_stats}
    return trained, {"loss": losses}
