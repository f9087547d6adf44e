"""Pose training: heatmap regression for the top-down model.

The reference relies on externally-trained pose models (rtmlib ONNX);
this Flax engine trains :class:`models.pose.TopDownPose` from keypoint
annotations: gaussian target heatmaps + masked MSE (SimpleBaseline
objective), pure jitted step, dp-shardable."""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from tracklab_tpu.models.pose import TopDownPose

__all__ = ["gaussian_heatmaps", "pose_loss", "make_pose_train_step",
           "PoseTrainState"]


class PoseTrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def gaussian_heatmaps(kp_xyc, hm_hw, crop_hw, sigma: float = 2.0):
    """(K, 3) crop-frame keypoints -> (H, W, K) gaussian targets in
    heatmap resolution; invisible keypoints give all-zero maps."""
    H, W = hm_hw
    sy = H / crop_hw[0]
    sx = W / crop_hw[1]
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    kx = kp_xyc[:, 0] * sx
    ky = kp_xyc[:, 1] * sy
    vis = (kp_xyc[:, 2] > 0).astype(jnp.float32)
    d2 = ((xs[None] - kx[:, None, None]) ** 2
          + (ys[None] - ky[:, None, None]) ** 2)
    hm = jnp.exp(-d2 / (2 * sigma ** 2)) * vis[:, None, None]
    return jnp.transpose(hm, (1, 2, 0))


def pose_loss(pred_logits, kp_xyc, crop_hw, sigma: float = 2.0):
    """Masked MSE over sigmoided heatmaps; (B, H, W, K) vs (B, K, 3)."""
    B, H, W, K = pred_logits.shape
    targets = jax.vmap(
        lambda kp: gaussian_heatmaps(kp, (H, W), crop_hw, sigma))(kp_xyc)
    pred = jax.nn.sigmoid(pred_logits)
    vis = (kp_xyc[:, :, 2] > 0).astype(jnp.float32)  # (B, K)
    per_kp = jnp.mean((pred - targets) ** 2, axis=(1, 2))  # (B, K)
    denom = jnp.maximum(jnp.sum(vis), 1.0)
    return jnp.sum(per_kp * vis) / denom


def make_pose_train_step(model: TopDownPose,
                         tx: optax.GradientTransformation, crop_hw):
    def train_step(state: PoseTrainState, batch):
        def loss_fn(params, stats):
            logits, mut = model.apply(
                {"params": params, "batch_stats": stats},
                batch["crops"], train=True, mutable=["batch_stats"])
            return pose_loss(logits, batch["keypoints"],
                             crop_hw), mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return PoseTrainState(params, new_stats, new_opt,
                              state.step + 1), loss

    return train_step
