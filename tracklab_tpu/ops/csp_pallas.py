"""Fused CSPLayer as one Pallas TPU kernel (the detector's stated next
lever: compute/bandwidth overlap — BASELINE.md r3).

The YOLOX detector is HBM-bandwidth bound: after the r3 layout work the
remaining traffic IS the per-conv layer I/O, and a CSPLayer
(models/yolox.py:127-148) runs 2n+3 separate conv kernels whose
intermediates round-trip through HBM — ~16 MB/frame at the dark3 shape
vs the 3.3 MB of its input+output. This kernel computes the ENTIRE
layer (main/short 1x1 projections, n bottlenecks with the 3x3 expressed
as 9 shifted MXU matmuls, concat, final 1x1) per frame with every
intermediate held in VMEM, reading x once and writing y once. BN is
folded into conv weights at call time (inference only); the pallas grid
pipelines the next frame's DMA against the current frame's MXU work.

Restrictions: inference only, no depthwise, no quant, frame <= ~80x80
(whole-frame VMEM working set; the 160x160 dark2 layer stays on XLA).
Enable with TRACKLAB_TPU_CSP_BACKEND=pallas (models/yolox.py CSPLayer).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fold_convbn", "fused_csplayer", "csp_pallas_supported"]

BN_EPS = 1e-3  # models/yolox.py ConvBnAct


def fold_convbn(p, s):
    """ConvBnAct params/batch_stats subtrees -> (W, b) with BN folded:
    silu(bn(conv(x))) == silu(conv(x; W) + b) in exact arithmetic."""
    k = p["conv"]["kernel"]
    scale = p["bn"]["scale"] / jnp.sqrt(s["bn"]["var"] + BN_EPS)
    return (k * scale).astype(k.dtype), \
        (p["bn"]["bias"] - s["bn"]["mean"] * scale).astype(jnp.float32)


def csp_pallas_supported(x_shape, depthwise, quant, train) -> bool:
    """True when the fused kernel applies: opt-in via
    TRACKLAB_TPU_CSP_BACKEND=pallas, inference, dense convs, and a
    whole-frame VMEM working set (<= 80x80; dark2's 160x160 stays on
    XLA). Off-TPU the kernel runs in interpret mode (tests)."""
    import os
    if os.environ.get("TRACKLAB_TPU_CSP_BACKEND") != "pallas":
        return False
    _, H, W, _ = x_shape
    return (not train and not depthwise and quant is None
            and H * W <= 80 * 80)


def _make_kernel(n, shortcut, H, W, ch, cdtype, out_dtype):
    HW = H * W

    def mm(a, w):
        return jnp.dot(a, w, preferred_element_type=jnp.float32)

    def kernel(x_ref, wm_ref, bm_ref, ws_ref, bs_ref, w1_ref, b1_ref,
               w3_ref, b3_ref, wf_ref, bf_ref, out_ref):
        cin = x_ref.shape[-1]
        xm = x_ref[0].reshape(HW, cin)
        a = jax.nn.silu(mm(xm, wm_ref[...]) + bm_ref[...]).astype(cdtype)
        s = jax.nn.silu(mm(xm, ws_ref[...]) + bs_ref[...]).astype(cdtype)
        for i in range(n):
            t = jax.nn.silu(mm(a, w1_ref[i]) + b1_ref[i, :]
                            ).astype(cdtype)
            tp = jnp.pad(t.reshape(H, W, ch),
                         ((1, 1), (1, 1), (0, 0)))
            acc = jnp.broadcast_to(b3_ref[i, :], (HW, ch))
            for dy in range(3):
                for dx in range(3):
                    sh = tp[dy:dy + H, dx:dx + W].reshape(HW, ch)
                    acc = acc + mm(sh, w3_ref[i, dy * 3 + dx])
            y = jax.nn.silu(acc)
            if shortcut:
                a = (y + a.astype(jnp.float32)).astype(cdtype)
            else:
                a = y.astype(cdtype)
        cat = jnp.concatenate([a, s], axis=-1)
        out = jax.nn.silu(mm(cat, wf_ref[...]) + bf_ref[...])
        out_ref[0] = out.reshape(H, W, -1).astype(out_dtype)

    return kernel


def fused_csplayer(variables, x, n: int, shortcut: bool,
                   out_features: int, dtype=jnp.bfloat16,
                   interpret: bool | None = None):
    """Run one CSPLayer (models/yolox.py param tree: conv1/conv2/m__k/
    conv3) as a single fused kernel. ``variables`` is the layer-scoped
    {"params", "batch_stats"} dict; x is (B, H, W, Cin)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    p, st = variables["params"], variables["batch_stats"]
    B, H, W, cin = x.shape
    ch = out_features // 2
    cdtype = dtype

    wm, bm = fold_convbn(p["conv1"], st["conv1"])
    ws, bs = fold_convbn(p["conv2"], st["conv2"])
    w1l, b1l, w3l, b3l = [], [], [], []
    for k in range(n):
        w1, b1 = fold_convbn(p[f"m__{k}"]["conv1"], st[f"m__{k}"]["conv1"])
        w3, b3 = fold_convbn(p[f"m__{k}"]["conv2"], st[f"m__{k}"]["conv2"])
        w1l.append(w1.reshape(ch, ch))
        b1l.append(b1)
        w3l.append(w3.reshape(9, ch, ch))
        b3l.append(b3)
    wf, bf = fold_convbn(p["conv3"], st["conv3"])

    args = (
        x,
        wm.reshape(cin, ch).astype(cdtype), bm.reshape(1, ch),
        ws.reshape(cin, ch).astype(cdtype), bs.reshape(1, ch),
        jnp.stack(w1l).astype(cdtype), jnp.stack(b1l),
        jnp.stack(w3l).astype(cdtype), jnp.stack(b3l),
        wf.reshape(2 * ch, out_features).astype(cdtype),
        bf.reshape(1, out_features),
    )
    kernel = _make_kernel(n, shortcut, H, W, ch, cdtype, dtype)
    # weights live whole in VMEM; constant index maps fetch them once
    w_spec = [pl.BlockSpec(a.shape,
                           partial(lambda nd, b: (0,) * nd, a.ndim),
                           memory_space=pltpu.VMEM)
              for a in args[1:]]
    flops = 2 * H * W * ch * (cin * 2 + n * 10 * ch + 2 * out_features)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H, W, cin), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)] + w_spec,
        out_specs=pl.BlockSpec((1, H, W, out_features),
                               lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, out_features), dtype),
        cost_estimate=pl.CostEstimate(
            flops=B * flops, transcendentals=B * H * W * ch * (n + 3),
            bytes_accessed=(x.size + B * H * W * out_features) * 2),
        interpret=interpret,
    )(*args)
