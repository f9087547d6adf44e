"""Fused ViT self-attention as a single Pallas TPU kernel.

Why: the KPR ViT-B stack (models/kpr.py, B=384 crops x N=193 tokens x
12 heads x 64 head-dim per fused-GSR chunk) spends ~35% of its device
time in the attention core under plain XLA lowering (BASELINE.md r5
isolation matrix), far above its ~2% FLOP share: the (B, H, N, N)
score tensor makes two HBM round-trips (softmax write + a@v read) and
the q/k/v head transposes materialize.  This kernel keeps one head's
scores entirely in VMEM per grid step — qk^T, masked softmax, and a@v
fuse into one program; HBM traffic drops to the q/k/v/y tensors
themselves.

Reference counterpart: the torch fork's standard ``Attention.forward``
(kpr/models/promptable_transformer_backbone.py) — torch runs it as
cuBLAS batched matmuls; the TPU-native answer is a VMEM-resident fused
kernel, not a batched-GEMM translation.

Mosaic notes (CLAUDE.md): scores stay 2D (N, N) f32; masking uses
``broadcasted_iota`` (no 1D iota on TPU); no scalar stores; the
singleton block dims are collapsed by integer indexing.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(n_valid, scale, q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0, :, 0, :]                       # (N, Dh) model dtype
    k = k_ref[0, :, 0, :]
    v = v_ref[0, :, 0, :]
    n = q.shape[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale    # (N, N) f32
    if n_valid is not None and n_valid < n:
        col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        s = jnp.where(col < n_valid, s, jnp.finfo(jnp.float32).min)
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=1, keepdims=True)
    y = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (N, Dh) f32
    o_ref[0, :, 0, :] = y.astype(o_ref.dtype)


def vit_attention(q, k, v, n_valid: int | None = None,
                  interpret: bool | None = None):
    """Multi-head attention ``softmax(q k^T / sqrt(Dh)) v`` fused per
    (batch, head) grid step.

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
    spec = pl.BlockSpec((1, N, 1, Dh), lambda b, h: (b, 0, h, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        lambda qr, kr, vr, orf: _kernel(n_valid, scale, qr, kr, vr, orf),
        grid=(B, H),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, N, H, Dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * N * N * Dh,
            transcendentals=B * H * N * N,
            bytes_accessed=4 * B * N * H * Dh * q.dtype.itemsize),
        interpret=interpret,
    )(q, k, v)
