"""Device-side global motion estimation: pyramidal inverse-compositional
Lucas-Kanade in JAX.

The OpenCV ECC / sparse-flow GMC (motion/gmc.py) runs on host; this is
the TPU-native option flagged in SURVEY hard-part #4: estimate a global
affine warp between consecutive grayscale frames by Gauss-Newton over
dense image gradients — every step is dense VPU math (gradients, warps,
6x6 solves), fully jittable, so camera compensation can stay on device
next to the tracker.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["estimate_affine_lk", "warp_affine"]


def _grayscale(img):
    if img.ndim == 3:
        return (0.299 * img[..., 0] + 0.587 * img[..., 1]
                + 0.114 * img[..., 2])
    return img


def warp_affine(img, warp):
    """Sample img at affine-warped coordinates (bilinear, zero pad).
    warp: 2x3 mapping output coords -> input coords."""
    H, W = img.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    sx = warp[0, 0] * xs + warp[0, 1] * ys + warp[0, 2]
    sy = warp[1, 0] * xs + warp[1, 1] * ys + warp[1, 2]
    x0 = jnp.clip(jnp.floor(sx), 0, W - 2)
    y0 = jnp.clip(jnp.floor(sy), 0, H - 2)
    wx = jnp.clip(sx - x0, 0.0, 1.0)
    wy = jnp.clip(sy - y0, 0.0, 1.0)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    a = img[y0i, x0i]
    b = img[y0i, x0i + 1]
    c = img[y0i + 1, x0i]
    d = img[y0i + 1, x0i + 1]
    out = (a * (1 - wx) * (1 - wy) + b * wx * (1 - wy)
           + c * (1 - wx) * wy + d * wx * wy)
    inside = ((sx >= 0) & (sx <= W - 1) & (sy >= 0) & (sy <= H - 1))
    return out, inside.astype(jnp.float32)


def _lk_level(prev, cur, p, iters):
    """Gauss-Newton refinement of affine params p (6,) at one pyramid
    level: warp(prev, p) ~= cur. Parameterization:
    [a11-1, a12, tx, a21, a22-1, ty]."""
    H, W = prev.shape
    gy, gx = jnp.gradient(cur)
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)

    def body(_, p):
        warp = jnp.array([[1 + p[0], p[1], p[2]],
                          [p[3], 1 + p[4], p[5]]])
        # inverse mapping: sample PREV at cur coords warped backwards
        # (we estimate the forward warp prev->cur; sampling prev at
        # inv(warp) equals comparing warp(prev) to cur; for small motion
        # use the forward-additive approximation)
        sampled, mask = warp_affine(prev, warp)
        err = (cur - sampled) * mask
        # Jacobian rows: d(sampled)/dp ~ -grad(cur) * d(coords)/dp
        jac = jnp.stack([
            gx * xs, gx * ys, gx,
            gy * xs, gy * ys, gy,
        ])                                              # (6, H, W)
        jac = jac * mask[None]
        A = jnp.einsum("ihw,jhw->ij", jac, jac)
        b = jnp.einsum("ihw,hw->i", jac, err)
        delta = jnp.linalg.solve(A + 1e-3 * jnp.eye(6), b)
        return p + delta

    return jax.lax.fori_loop(0, iters, body, p)


def _downscale2(img):
    H, W = img.shape
    H2, W2 = (H // 2) * 2, (W // 2) * 2
    x = img[:H2, :W2].reshape(H2 // 2, 2, W2 // 2, 2)
    return x.mean(axis=(1, 3))


@partial(jax.jit, static_argnames=("levels", "iters"))
def estimate_affine_lk(prev_img, cur_img, levels: int = 3,
                       iters: int = 10):
    """Estimate the 2x3 affine warp mapping prev-frame coords to
    cur-frame coords. Inputs (H, W[, 3]) float/uint8."""
    prev = _grayscale(prev_img.astype(jnp.float32))
    cur = _grayscale(cur_img.astype(jnp.float32))
    pyr = [(prev, cur)]
    for _ in range(levels - 1):
        prev = _downscale2(prev)
        cur = _downscale2(cur)
        pyr.append((prev, cur))

    p = jnp.zeros(6)
    for i, (lp, lc) in enumerate(reversed(pyr)):
        p = _lk_level(lp, lc, p, iters)
        if i < levels - 1:
            # translations double moving to the next finer level
            p = p.at[2].multiply(2.0).at[5].multiply(2.0)
    # note: the warp estimated here maps cur coords -> prev sample
    # locations; invert to get prev -> cur (the GMC convention)
    fwd = jnp.array([[1 + p[0], p[1], p[2]],
                     [p[3], 1 + p[4], p[5]],
                     [0.0, 0.0, 1.0]])
    inv = jnp.linalg.inv(fwd)
    return inv[:2, :]
