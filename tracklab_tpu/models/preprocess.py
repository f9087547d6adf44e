"""Fused device-side image preprocessing.

The reference decodes + letterboxes + normalizes per image on CPU
DataLoader workers (SURVEY §3.2 hot loop). Here decode stays on host (C++
libjpeg via cv2) but letterbox/normalize/crop-resize run as one jitted XLA
program on device, fused into the detector's first conv by XLA — the
decode->letterbox->normalize->crop-resize kernel of BASELINE's north star.
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["letterbox", "normalize", "crop_resize", "letterbox_params",
           "crop_resize_onehot", "crop_resize_auto"]


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


def _hat_weights(lo, hi, n_out: int, n_src: int, dtype):
    """(N, n_out, n_src) one-hot bilinear sampling rows with the exact
    border-clamp semantics of :func:`crop_resize` (two taps
    s0=clip(floor(s)), s1=clip(s0+1), w=clip(s-s0, 0, 1)); each row sums
    to 1 exactly, so sampling commutes with any affine pixel transform."""
    ss = lo[:, None] + (hi - lo)[:, None] * (
        (jnp.arange(n_out) + 0.5) / n_out) - 0.5          # (N, n_out)
    s0 = jnp.clip(jnp.floor(ss).astype(jnp.int32), 0, n_src - 1)
    s1 = jnp.clip(s0 + 1, 0, n_src - 1)
    w = jnp.clip(ss - s0, 0.0, 1.0).astype(dtype)
    grid = jnp.arange(n_src, dtype=jnp.int32)
    m0 = (grid == s0[..., None]).astype(dtype)
    m1 = (grid == s1[..., None]).astype(dtype)
    return m0 * (1 - w)[..., None] + m1 * w[..., None]


@partial(jax.jit, static_argnames=("out_h", "out_w", "dtype"))
def crop_resize_onehot(image, boxes_ltrb, out_h: int, out_w: int,
                       dtype=jnp.bfloat16):
    """:func:`crop_resize` as two one-hot MXU contractions per crop
    (separable bilinear: rows (N, out_h, H) @ image @ cols (N, out_w, W)
    transposed). On TPU the vmapped 4-tap gather lowers catastrophically
    (measured 137 ms vs 39 ms for a 64x32-crop chunk, the same lesson as
    the RT-DETR deformable attention, BASELINE.md); the matmul form
    rides the MXU and scales with FLOPs. ``dtype`` is the contraction
    operand type — bf16 keeps MXU rate and adds only input-quantization
    noise (~bf16 eps of the pixel range; the downstream models run bf16
    anyway); accumulation is always f32. Returns float32."""
    Hs, Ws = image.shape[0], image.shape[1]
    R = _hat_weights(boxes_ltrb[:, 1], boxes_ltrb[:, 3], out_h, Hs,
                     dtype)                               # (N, out_h, H)
    C = _hat_weights(boxes_ltrb[:, 0], boxes_ltrb[:, 2], out_w, Ws,
                     dtype)                               # (N, out_w, W)
    img = image.astype(dtype)
    tmp = jnp.einsum("noh,hwc->nowc", R, img,
                     preferred_element_type=jnp.float32)
    out = jnp.einsum("nowc,npw->nopc", tmp.astype(dtype), C,
                     preferred_element_type=jnp.float32)
    return out


def crop_resize_auto(image, boxes_ltrb, out_h: int, out_w: int):
    """Backend-dispatching crop: the one-hot MXU form on TPU, the exact
    4-tap gather elsewhere (on CPU the matmuls would be 24 GFLOP/frame
    of wasted work). Override with TRACKLAB_TPU_CROP_BACKEND=
    gather|onehot."""
    backend = os.environ.get("TRACKLAB_TPU_CROP_BACKEND", "auto")
    if backend == "auto":
        backend = ("onehot" if jax.default_backend() == "tpu"
                   else "gather")
    if backend == "onehot":
        return crop_resize_onehot(image, boxes_ltrb, out_h, out_w)
    return crop_resize(image, boxes_ltrb, out_h, out_w)
