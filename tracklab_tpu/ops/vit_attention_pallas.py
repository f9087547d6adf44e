"""Fused ViT self-attention as a single Pallas TPU kernel (opt-in;
measured NOT a win vs XLA's lowering — see below).

Motivation: the KPR ViT-B stack (models/kpr.py, B=384 crops x N=193
tokens x 12 heads x 64 head-dim per fused-GSR chunk) spends ~35% of
its device time in the attention core under plain XLA lowering
(BASELINE.md r5 isolation matrix), far above its ~2% FLOP share. This
kernel keeps a head's scores entirely in VMEM per grid step — qk^T,
masked softmax, and a@v fuse into one program.

Round-5 chip verdict (BASELINE.md "Pallas ViT attention"): three
layout variants measured at B=384 against the naive XLA path (187-191
ms full KPR): per-(b,h) grid 231.2 ms, per-b grid with unrolled heads
207.1 ms (this file's form), zero-copy-input middle-dim loads 238.5
ms. XLA's fusion of the head transposes into the dots plus its
softmax pipelining already beat every variant — attention here is
latency/VPU-bound at tiny per-head matmul sizes, not HBM-bound, so
there is no traffic for a kernel to save. Kept as the documented
floor probe and for the Mosaic layout lessons; opt-in via
``KPR(attn_impl="pallas")`` / ``TRACKLAB_TPU_KPR_ATTN=pallas``.

Reference counterpart: the torch fork's standard ``Attention.forward``
(kpr/models/promptable_transformer_backbone.py) — torch runs it as
cuBLAS batched matmuls; this was the TPU-native fused-kernel attempt.

Mosaic notes (CLAUDE.md): scores stay 2D (N, N) f32; masking uses
``broadcasted_iota`` (no 1D iota on TPU); no scalar stores; head axis
ahead of the (token, head_dim) trailing pair in every block.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(n_heads, n_valid, scale, q_ref, k_ref, v_ref, o_ref):
    # One batch element per grid step, all heads unrolled in-kernel:
    # a (b, h) grid is 12x more steps whose ~100 KB DMAs and us-scale
    # matmuls leave the core idle on per-step overhead (measured 231 ms
    # vs 189 ms naive at B=384); per-batch steps amortize it.
    for h in range(n_heads):
        q = q_ref[0, h, :, :]                   # (N, Dh) model dtype
        k = k_ref[0, h, :, :]
        v = v_ref[0, h, :, :]
        n = q.shape[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (N, N) f32
        if n_valid is not None and n_valid < n:
            col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
            s = jnp.where(col < n_valid, s, jnp.finfo(jnp.float32).min)
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=1, keepdims=True)
        y = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (N, Dh) f32
        o_ref[0, h, :, :] = y.astype(o_ref.dtype)


def vit_attention(q, k, v, n_valid: int | None = None,
                  interpret: bool | None = None):
    """Multi-head attention ``softmax(q k^T / sqrt(Dh)) v`` fused as
    one Pallas program per batch element (heads unrolled in-kernel).

    Args:
      q, k, v: ``(B, N, H, Dh)`` arrays (any float dtype; matmuls
        accumulate f32, softmax runs in f32).
      n_valid: optional STATIC count of real tokens — keys/values at
        positions >= n_valid get ``finfo.min`` logits (the token_pad
        masking of models/kpr.py, resolved at trace time).
      interpret: force Pallas interpret mode; defaults to True off-TPU.

    Returns ``(B, N, H, Dh)`` in the input dtype.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, N, H, Dh = q.shape
    scale = Dh ** -0.5
    # Layout notes from the round-5 chip A/Bs (BASELINE.md): Mosaic
    # requires the head axis ahead of the (token, head_dim) pair for
    # both blocks and stores — middle-dim refs either fail to lower
    # (stores: "unsupported shape cast") or pay in-kernel relayouts
    # (loads: measured 238.5 ms vs this form's 207.1 at B=384) — so
    # q/k/v are transposed to (B, H, N, Dh) outside the kernel.
    q, k, v = (a.transpose(0, 2, 1, 3) for a in (q, k, v))
    spec = pl.BlockSpec((1, H, N, Dh), lambda b: (b, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        lambda qr, kr, vr, orf: _kernel(H, n_valid, scale,
                                        qr, kr, vr, orf),
        grid=(B,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, H, N, Dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * N * N * Dh,
            transcendentals=B * H * N * N,
            bytes_accessed=4 * B * N * H * Dh * q.dtype.itemsize),
        interpret=interpret,
    )(q, k, v)
    return out.transpose(0, 2, 1, 3)
