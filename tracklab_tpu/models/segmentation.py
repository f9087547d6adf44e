"""Pitch-line semantic segmentation in Flax (the calibration front-end).

The reference runs a DeepLabV3-ResNet101 over ``len(SoccerPitch.
lines_classes)+1`` classes and keeps the per-pixel argmax
(plugins/calibration/tvcalib/inference.py:83-94); the class map is then
reduced to per-line pixel points that drive camera optimization.

TPU-native rebuild:
  * CSPDarknet backbone (shared with YOLOX — NHWC, bf16, MXU-aligned
    widths) instead of ResNet101: same stride-8/16/32 pyramid at a
    fraction of the FLOPs.
  * DeepLabV3+-style head: ASPP over the stride-16 feature + low-level
    stride-8 skip, bilinear resize everywhere (jax.image.resize — XLA
    fuses it), static shapes throughout.
  * :func:`extract_segment_points` replaces the host-side nonzero/loop
    point picking with a fixed-shape top_k per class so the whole
    image -> per-line points contract runs jitted on device.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from tracklab_tpu.models.yolox import CSPDarknet, ConvBnAct, YOLOX_VARIANTS

__all__ = ["PitchSegNet", "seg_loss", "extract_segment_points"]


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling over an NHWC feature map."""
    features: int
    rates: Sequence[int] = (3, 6, 9)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        branches = [ConvBnAct(self.features, 1, dtype=self.dtype)(x, train)]
        for r in self.rates:
            y = nn.Conv(self.features, (3, 3), kernel_dilation=(r, r),
                        padding="SAME", use_bias=False,
                        dtype=self.dtype)(x)
            y = nn.BatchNorm(use_running_average=not train,
                             dtype=self.dtype)(y)
            branches.append(nn.silu(y))
        # image-level context branch
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = ConvBnAct(self.features, 1, dtype=self.dtype)(g, train)
        g = jnp.broadcast_to(g, x.shape[:3] + (self.features,))
        y = jnp.concatenate(branches + [g], axis=-1)
        return ConvBnAct(self.features, 1, dtype=self.dtype)(y, train)


class PitchSegNet(nn.Module):
    """images (B,H,W,3) in [0,255] -> per-pixel class logits (B,H,W,C).

    Class 0 is background; classes 1..C-1 are the pitch segment names in
    :func:`tracklab_tpu.calibration.pitch.pitch_segments` order.
    """
    num_classes: int
    variant: str = "s"
    head_features: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False):
        v = YOLOX_VARIANTS[self.variant]
        x = images.astype(self.dtype) / 255.0
        c3, c4, _ = CSPDarknet(v["depth_mult"], v["width_mult"],
                               depthwise=v["depthwise"],
                               dtype=self.dtype)(x, train)
        y = ASPP(self.head_features, dtype=self.dtype)(c4, train)
        # stride-16 -> stride-8, fuse the low-level skip
        b, h8, w8, _ = c3.shape
        y = jax.image.resize(y, (b, h8, w8, y.shape[-1]), "bilinear")
        low = ConvBnAct(self.head_features // 2,
                        1, dtype=self.dtype)(c3, train)
        y = jnp.concatenate([y, low], axis=-1)
        y = ConvBnAct(self.head_features, 3, dtype=self.dtype)(y, train)
        logits = nn.Conv(self.num_classes, (1, 1),
                         dtype=self.dtype)(y)
        bh, ih, iw = images.shape[0], images.shape[1], images.shape[2]
        logits = jax.image.resize(
            logits.astype(jnp.float32),
            (bh, ih, iw, self.num_classes), "bilinear")
        return logits

    def predict(self, images):
        """Per-pixel argmax class map (B,H,W) int32 — the reference's
        ``model(img)["out"].argmax(1)`` (inference.py:93-94)."""
        return jnp.argmax(self(images, train=False), axis=-1) \
            .astype(jnp.int32)


def seg_loss(logits, labels, background_weight: float = 0.05):
    """Class-weighted softmax cross-entropy. Pitch lines are ~1% of
    pixels, so background is down-weighted instead of the reference's
    (implicit) plain CE."""
    num_classes = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    w = jnp.where(labels == 0, background_weight, 1.0)
    ce = -(onehot * logp).sum(-1) * w
    return ce.sum() / jnp.maximum(w.sum(), 1.0)


def extract_segment_points(class_map, num_classes: int,
                           n_points: int = 32):
    """class map (H,W) int32 -> per-class pixel samples, fixed shapes.

    Returns (xy, valid): xy (num_classes-1, n_points, 2) float32 pixel
    coordinates for classes 1..num_classes-1, valid (num_classes-1,
    n_points) bool. Points are spread over each line via a deterministic
    per-pixel hash tiebreak (no RNG — jit/scan safe), replacing the
    reference's host-side mask -> nonzero -> subsample loop.
    """
    h, w = class_map.shape
    flat = class_map.reshape(-1)
    idx = jnp.arange(h * w, dtype=jnp.uint32)
    # Knuth multiplicative hash -> [0, 1) pseudo-random spread
    tie = ((idx * jnp.uint32(2654435761)) >> jnp.uint32(12)).astype(
        jnp.float32) / jnp.float32(1 << 20)

    def per_class(c):
        hit = (flat == c)
        score = jnp.where(hit, 1.0 + tie, tie - 1.0)
        top, where = jax.lax.top_k(score, n_points)
        xy = jnp.stack([(where % w).astype(jnp.float32),
                        (where // w).astype(jnp.float32)], axis=-1)
        return xy, top > 1.0

    xy, valid = jax.vmap(per_class)(
        jnp.arange(1, num_classes, dtype=jnp.int32))
    return xy, valid
