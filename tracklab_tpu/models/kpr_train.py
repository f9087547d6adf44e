"""KPR training engine: identity CE + part-averaged triplet (Flax).

Replaces the reference's torchreid-engine delegation for KPReId
(tracklab/wrappers/reid/kpreid_api.py:185-186). Loss follows the
part_based family of the reference config (bpbreid.yaml loss section):
softmax-CE on the foreground branch's id logits plus the part-averaged
batch-hard triplet over per-part embeddings, parts weighted by their
visibility scores (GiLt-style: invisible parts contribute nothing).
GT crops come from the tracking train split (reid_train._gather_crops),
with keypoint prompts disabled during this lightweight fine-tune (the
prompt conv stays at its pretrained/zero value).
"""
from __future__ import annotations

import logging

import numpy as np

from tracklab_tpu.models.reid_train import (_gather_crops,
                                            batch_hard_triplet_loss)

log = logging.getLogger(__name__)

__all__ = ["train_kpr", "part_averaged_triplet_loss"]


def part_averaged_triplet_loss(parts, vis, labels, margin: float = 0.3):
    """Mean over parts of batch-hard triplet, visibility-masked.

    parts (B, K, D), vis (B, K) in [0,1], labels (B,). A part pair only
    contributes where both sides are visible (the part-averaged distance
    of the reference's part_averaged_triplet_loss).
    """
    import jax
    import jax.numpy as jnp

    def one(part_emb, part_vis):
        loss = batch_hard_triplet_loss(part_emb, labels, margin)
        # down-weight the whole part by its mean visibility
        return loss * part_vis.mean()

    losses = jax.vmap(one, in_axes=(1, 1))(parts, vis)
    return losses.mean()


def train_kpr(module, tracking_dataset, epochs: int = 3,
              batch_size: int = 16, lr: float = 1e-4, seed: int = 0,
              split: str = "train", ce_weight: float = 1.0,
              triplet_weight: float = 1.0):
    """Fine-tune the wrapper's KPR; returns (variables, metrics)."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import optax

    from tracklab_tpu.models.kpr import KPR
    from tracklab_tpu.wrappers.reid.kpr_api import (IMAGENET_MEAN,
                                                    IMAGENET_STD)

    crop_hw = (module.crop_h, module.crop_w)
    crops, labels = _gather_crops(tracking_dataset, crop_hw, split=split)
    if len(crops) == 0:
        log.warning("train_kpr: no GT crops available — skipping")
        return module.variables, {}
    n_ids = int(labels.max()) + 1
    log.info("train_kpr: %d crops / %d identities", len(crops), n_ids)

    P = module.n_prompt_ch

    class WithHead(nn.Module):
        kpr: KPR
        n_classes: int

        @nn.compact
        def __call__(self, x, prompts, train=False):
            out = self.kpr(x, prompts, train=train)
            logits = nn.Dense(self.n_classes, name="id_head")(
                out["bn_foreg"])
            return out, logits

    kpr = KPR(n_prompt_ch=P, **module.arch)
    model = WithHead(kpr, n_ids)
    zeros_p = jnp.zeros((1,) + crop_hw + (P,))
    if module.variables is not None:
        # continue from the wrapper's weights; init only the head
        head_vars = model.init(jax.random.PRNGKey(seed),
                               jnp.zeros((1,) + crop_hw + (3,)), zeros_p,
                               train=True)
        params = dict(head_vars["params"])
        params["kpr"] = module.variables["params"]
        batch_stats = dict(head_vars.get("batch_stats", {}))
        if "batch_stats" in module.variables:
            batch_stats["kpr"] = module.variables["batch_stats"]
    else:
        variables = model.init(jax.random.PRNGKey(seed),
                               jnp.zeros((1,) + crop_hw + (3,)), zeros_p,
                               train=True)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)

    @jax.jit
    def step(params, batch_stats, opt_state, images, y):
        prompts = jnp.zeros(images.shape[:3] + (P,))

        def loss_fn(p, bs):
            x = (images.astype(jnp.float32) - mean) / std
            (out, logits), mut = model.apply(
                {"params": p, "batch_stats": bs}, x, prompts,
                train=True, mutable=["batch_stats"])
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
            tri = part_averaged_triplet_loss(
                out["parts"], out["visibility"]["parts"], y)
            return ce_weight * ce + triplet_weight * tri, \
                (mut["batch_stats"], ce, tri)

        (loss, (bs, _, _)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), bs, opt_state2, loss

    rng_np = np.random.default_rng(seed)
    n = len(crops)
    bsz = min(batch_size, n)
    losses = []
    for epoch in range(epochs):
        order = rng_np.permutation(n)
        loss = jnp.zeros(())
        for i in range(0, n - bsz + 1, bsz):
            idx = order[i:i + bsz]
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state,
                jnp.asarray(crops[idx]), jnp.asarray(labels[idx]))
        losses.append(float(loss))
        log.info("train_kpr epoch %d: loss %.4f", epoch, float(loss))

    trained = {"params": params["kpr"]}
    if "kpr" in batch_stats:
        trained["batch_stats"] = batch_stats["kpr"]
    return trained, {"loss": losses}
