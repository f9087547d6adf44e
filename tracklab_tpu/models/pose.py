"""Pose estimation models in Flax.

Covers the reference's pose wrappers' capability surface
(tracklab/wrappers/pose_estimator/rtmlib_api.py — RTMPose top-down, RTMO
bottom-up; yolo_ultralytics_pose_api.py):

  * :class:`TopDownPose` — crop -> heatmaps -> sub-pixel argmax decode
    (SimpleBaseline-style deconv head over a CSP backbone). Plays the
    RTMPose role: per-detection crops in, (K, 3) keypoints out.
  * :class:`YOLOXPose` — YOLOX with an extra per-anchor keypoint branch
    (RTMO role): one pass over the full image yields boxes + keypoints.

Both decode on device with static shapes; the sub-pixel refinement is the
standard quarter-offset-toward-second-max.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from tracklab_tpu.models.yolox import (
    ConvBnAct, CSPDarknet, YOLOPAFPN, YOLOX_VARIANTS, decode_outputs,
)

__all__ = ["TopDownPose", "YOLOXPose", "decode_heatmaps"]


def decode_heatmaps(heatmaps):
    """(B, H, W, K) heatmaps -> (B, K, 3) [x, y, conf] in heatmap coords
    with quarter-pixel refinement toward the neighboring gradient."""
    B, H, W, K = heatmaps.shape
    hm = jnp.transpose(heatmaps, (0, 3, 1, 2)).reshape(B, K, H * W)
    idx = jnp.argmax(hm, axis=-1)
    conf = jnp.take_along_axis(hm, idx[..., None], axis=-1)[..., 0]
    y = (idx // W).astype(jnp.float32)
    x = (idx % W).astype(jnp.float32)

    # quarter-offset refinement using horizontal/vertical neighbors
    def grad_at(hm2d, xi, yi, dx, dy):
        xn = jnp.clip(xi + dx, 0, W - 1).astype(jnp.int32)
        yn = jnp.clip(yi + dy, 0, H - 1).astype(jnp.int32)
        flat = yn * W + xn
        return jnp.take_along_axis(hm2d, flat[..., None], axis=-1)[..., 0]

    xi = x.astype(jnp.int32)
    yi = y.astype(jnp.int32)
    right = grad_at(hm, xi, yi, 1, 0)
    left = grad_at(hm, xi, yi, -1, 0)
    down = grad_at(hm, xi, yi, 0, 1)
    up = grad_at(hm, xi, yi, 0, -1)
    x = x + 0.25 * jnp.sign(right - left)
    y = y + 0.25 * jnp.sign(down - up)
    return jnp.stack([x, y, conf], axis=-1)


class TopDownPose(nn.Module):
    """Crop (B, H, W, 3) -> heatmaps at H/4: backbone /32 + 3 deconvs."""
    num_keypoints: int = 17
    variant: str = "s"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        v = YOLOX_VARIANTS[self.variant]
        _, _, c5 = CSPDarknet(v["depth_mult"], v["width_mult"],
                              v["depthwise"], dtype=self.dtype)(x, train)
        y = c5
        for _ in range(3):  # /32 -> /4
            y = nn.ConvTranspose(256, (4, 4), strides=(2, 2),
                                 padding="SAME",
                                 use_bias=False, dtype=self.dtype)(y)
            y = nn.BatchNorm(use_running_average=not train,
                             dtype=jnp.float32)(y)
            y = nn.relu(y)
        return nn.Conv(self.num_keypoints, (1, 1), dtype=self.dtype)(y)

    def predict_keypoints(self, variables, crops):
        """(B, H, W, 3) crops -> (B, K, 3) keypoints in crop pixels."""
        hm = self.apply(variables, crops, train=False)
        kp = decode_heatmaps(jax.nn.sigmoid(hm))
        stride = crops.shape[1] / hm.shape[1]
        return kp.at[..., :2].multiply(stride)


class YOLOXPose(nn.Module):
    """Bottom-up: YOLOX maps + per-anchor keypoint offsets.

    Per level, the head emits [reg(4), obj(1), cls(C), kp(K*3)]; keypoint
    xy are offsets from the anchor cell in stride units, conf sigmoided.
    """
    num_classes: int = 1
    num_keypoints: int = 17
    variant: str = "s"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        v = YOLOX_VARIANTS[self.variant]
        feats = CSPDarknet(v["depth_mult"], v["width_mult"],
                           v["depthwise"], dtype=self.dtype)(x, train)
        feats = YOLOPAFPN(v["depth_mult"], v["width_mult"],
                          v["depthwise"], dtype=self.dtype)(feats, train)
        hidden = max(int(256 * v["width_mult"]), 64)
        outs = []
        for f in feats:
            s = ConvBnAct(hidden, 1, dtype=self.dtype)(f, train)
            c = ConvBnAct(hidden, 3, dtype=self.dtype)(s, train)
            cls_out = nn.Conv(self.num_classes, (1, 1),
                              dtype=self.dtype)(c)
            r = ConvBnAct(hidden, 3, dtype=self.dtype)(s, train)
            reg_out = nn.Conv(4, (1, 1), dtype=self.dtype)(r)
            obj_out = nn.Conv(1, (1, 1), dtype=self.dtype)(r)
            k = ConvBnAct(hidden, 3, dtype=self.dtype)(s, train)
            kp_out = nn.Conv(self.num_keypoints * 3, (1, 1),
                             dtype=self.dtype)(k)
            outs.append(jnp.concatenate(
                [reg_out, obj_out, cls_out, kp_out], axis=-1))
        return outs

    def predict(self, variables, images, strides=(8, 16, 32)):
        """-> (boxes (B, A, 5+C) decoded, keypoints (B, A, K, 3))."""
        outs = self.apply(variables, images, train=False)
        C = self.num_classes
        box_outs = [o[..., :5 + C] for o in outs]
        decoded = decode_outputs(box_outs, strides)
        kps = []
        for o, stride in zip(outs, strides):
            b, h, w, _ = o.shape
            kp = o[..., 5 + C:].reshape(b, h, w, self.num_keypoints, 3)
            gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
            gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
            x = (kp[..., 0] + gx[None, :, :, None]) * stride
            y = (kp[..., 1] + gy[None, :, :, None]) * stride
            c = jax.nn.sigmoid(kp[..., 2])
            kps.append(jnp.stack([x, y, c], axis=-1).reshape(
                b, h * w, self.num_keypoints, 3))
        return decoded, jnp.concatenate(kps, axis=1)


# ---------------------------------------------------------------------------
# SimCC codec (RTMPose): x/y 1D classification at sub-pixel bin width
# ---------------------------------------------------------------------------

def decode_simcc(simcc_x, simcc_y, split_ratio: float = 2.0):
    """mmpose ``get_simcc_maximum`` semantics (the decode behind the
    reference's RTMPose rtmlib path): per-keypoint argmax over the x
    and y bin vectors, location = argmax / split_ratio, score = the
    MINIMUM of the two axis maxima, and locations are invalidated (-1)
    where the score is <= 0.

    simcc_x: (B, K, W*ratio), simcc_y: (B, K, H*ratio) ->
    (B, K, 3) [x, y, score] in crop pixels.
    """
    x_locs = jnp.argmax(simcc_x, axis=-1).astype(jnp.float32)
    y_locs = jnp.argmax(simcc_y, axis=-1).astype(jnp.float32)
    max_x = jnp.max(simcc_x, axis=-1)
    max_y = jnp.max(simcc_y, axis=-1)
    vals = jnp.minimum(max_x, max_y)
    locs = jnp.stack([x_locs, y_locs], axis=-1) / split_ratio
    locs = jnp.where(vals[..., None] > 0, locs, -1.0)
    return jnp.concatenate([locs, vals[..., None]], axis=-1)


class SimCCPose(nn.Module):
    """Top-down pose with a SimCC head (the RTMPose codec): backbone
    /32 feature -> 1x1 conv to K channels -> flatten -> two linear
    projections to the x / y bin vectors. The full RTMPose head also
    interposes a gated attention unit; this is the SimCC formulation on
    the shared CSP backbone (the codec — argmax/split_ratio decode with
    min-axis scores — matches mmpose exactly, decode_simcc)."""
    num_keypoints: int = 17
    variant: str = "s"
    input_size: tuple = (256, 192)      # (H, W)
    split_ratio: float = 2.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        v = YOLOX_VARIANTS[self.variant]
        _, _, c5 = CSPDarknet(v["depth_mult"], v["width_mult"],
                              v["depthwise"], dtype=self.dtype)(x, train)
        y = nn.Conv(self.num_keypoints, (1, 1), dtype=self.dtype,
                    name="final_layer")(c5)
        B = y.shape[0]
        # (B, h, w, K) -> (B, K, h*w)
        y = y.transpose(0, 3, 1, 2).reshape(B, self.num_keypoints, -1)
        H, W = self.input_size
        wx = int(W * self.split_ratio)
        wy = int(H * self.split_ratio)
        simcc_x = nn.Dense(wx, dtype=self.dtype, name="mlp_x")(y)
        simcc_y = nn.Dense(wy, dtype=self.dtype, name="mlp_y")(y)
        return simcc_x, simcc_y

    def predict_keypoints(self, variables, crops):
        simcc_x, simcc_y = self.apply(variables, crops, train=False)
        return decode_simcc(simcc_x, simcc_y, self.split_ratio)
