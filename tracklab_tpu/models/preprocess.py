"""Fused device-side image preprocessing.

The reference decodes + letterboxes + normalizes per image on CPU
DataLoader workers (SURVEY §3.2 hot loop). Here decode stays on host (C++
libjpeg via cv2) but letterbox/normalize/crop-resize run as one jitted XLA
program on device, fused into the detector's first conv by XLA — the
decode->letterbox->normalize->crop-resize kernel of BASELINE's north star.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["letterbox", "normalize", "crop_resize", "letterbox_params"]


def letterbox_params(src_hw, dst_hw):
    """Host-side: scale + pad offsets for an aspect-preserving resize."""
    sh, sw = src_hw
    dh, dw = dst_hw
    scale = min(dh / sh, dw / sw)
    new_h, new_w = int(round(sh * scale)), int(round(sw * scale))
    pad_top = (dh - new_h) // 2
    pad_left = (dw - new_w) // 2
    return scale, pad_top, pad_left, new_h, new_w


@partial(jax.jit, static_argnames=("dst_h", "dst_w", "pad_value"))
def letterbox(image, dst_h: int, dst_w: int, pad_value: float = 114.0):
    """Aspect-preserving resize + pad to (dst_h, dst_w). image: (H, W, 3)
    uint8/float. Returns (dst_h, dst_w, 3) float32 plus (scale, pad_top,
    pad_left) for mapping boxes back."""
    h, w = image.shape[0], image.shape[1]
    scale = jnp.minimum(dst_h / h, dst_w / w)
    new_h = int(round(h * min(dst_h / h, dst_w / w)))
    new_w = int(round(w * min(dst_h / h, dst_w / w)))
    resized = jax.image.resize(image.astype(jnp.float32),
                               (new_h, new_w, 3), "linear")
    pad_top = (dst_h - new_h) // 2
    pad_left = (dst_w - new_w) // 2
    out = jnp.full((dst_h, dst_w, 3), pad_value, jnp.float32)
    out = jax.lax.dynamic_update_slice(out, resized, (pad_top, pad_left, 0))
    return out, (scale, pad_top, pad_left)


@jax.jit
def normalize(image, mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0),
              scale: float = 1.0):
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (image.astype(jnp.float32) * scale - mean) / std


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def crop_resize(image, boxes_ltrb, out_h: int, out_w: int):
    """Batched crop-and-resize for ReID/pose crops: (H, W, 3) image +
    (N, 4) ltrb -> (N, out_h, out_w, 3). Bilinear via gather — stays on
    device so per-detection modules feed straight from detector output."""
    H, W = image.shape[0], image.shape[1]
    img = image.astype(jnp.float32)

    def one(box):
        x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
        ys = y1 + (y2 - y1) * (jnp.arange(out_h) + 0.5) / out_h - 0.5
        xs = x1 + (x2 - x1) * (jnp.arange(out_w) + 0.5) / out_w - 0.5
        y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, H - 1)
        x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, W - 1)
        y1i = jnp.clip(y0 + 1, 0, H - 1)
        x1i = jnp.clip(x0 + 1, 0, W - 1)
        wy = jnp.clip(ys - y0, 0.0, 1.0)[:, None, None]
        wx = jnp.clip(xs - x0, 0.0, 1.0)[None, :, None]
        a = img[y0][:, x0]
        b = img[y0][:, x1i]
        c = img[y1i][:, x0]
        d = img[y1i][:, x1i]
        top = a * (1 - wx) + b * wx
        bot = c * (1 - wx) + d * wx
        return top * (1 - wy) + bot * wy

    return jax.vmap(one)(boxes_ltrb)
