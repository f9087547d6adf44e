"""Jonker-Volgenant assignment as a single Pallas TPU kernel.

The pure-lax solver (ops/assignment.py:solve_square) is exact but each
augmenting-path iteration is a separate XLA op sequence — ~19 ms per
64x64 solve on a v5e, dominated by per-op dispatch. This kernel runs the
whole O(K^3) algorithm inside ONE Pallas program: cost matrix, potentials
and path state live in VMEM and every per-step update is a full-width
VPU vector op (Mosaic forbids scalar VMEM stores, so single-element
updates become masked writes, scalar reads become masked reductions, and
the u[p[j]] += delta scatter becomes a one-hot contraction). Exactness
matches solve_square / scipy.

Used automatically by ops/assignment.py when lowering for TPU; CPU tests
exercise it in interpreter mode.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["solve_square_pallas"]

_INF = 1e30  # python float: jnp scalars would become captured constants


def _jv_kernel(cost_ref, out_ref, u_ref, v_ref, p_ref, minv_ref, way_ref,
               used_ref, *, K: int, P: int):
    FREE = K
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    real = col_iota < K                     # real columns
    virt_or_real = col_iota <= K            # incl. the virtual column K

    def sel_i(vec, j):
        """vec (1, P) int32, scalar j -> vec[0, j] via masked reduction."""
        return jnp.max(jnp.where(col_iota == j, vec, -2147483647))

    def sel_f(vec, j):
        return jnp.max(jnp.where(col_iota == j, vec,
                                 jnp.float32(-_INF)))

    u_ref[...] = jnp.zeros((1, P), jnp.float32)
    v_ref[...] = jnp.zeros((1, P), jnp.float32)
    p_ref[...] = jnp.full((1, P), FREE, jnp.int32)

    def assign_row(i, _):
        i = jnp.int32(i)
        # p[K] = i (virtual column holds the new row)
        p_ref[...] = jnp.where(col_iota == K, i, p_ref[...])
        minv_ref[...] = jnp.full((1, P), _INF, jnp.float32)
        way_ref[...] = jnp.full((1, P), FREE, jnp.int32)
        used_ref[...] = jnp.where(virt_or_real, 0, 1).astype(jnp.int32)

        def path_cond(carry):
            _, p_j0 = carry
            return p_j0 != FREE

        def path_body(carry):
            j0, _ = carry
            used_ref[...] = jnp.where(col_iota == j0, 1, used_ref[...])
            i0 = sel_i(p_ref[...], j0)
            cost_row = jnp.concatenate(
                [cost_ref[pl.ds(i0, 1), :],
                 jnp.full((1, P - K), _INF, jnp.float32)], axis=1)
            u_row = u_ref[...]
            u_i0 = sel_f(u_row, i0)  # rows indexed on the same lane grid
            used_row = used_ref[...]
            unused_real = (used_row == 0) & real
            cur_p = cost_row - u_i0 - v_ref[...]
            minv = minv_ref[...]
            better = (cur_p < minv) & unused_real
            minv = jnp.where(better, cur_p, minv)
            minv_ref[...] = minv
            way_ref[...] = jnp.where(better, j0, way_ref[...])
            reach = jnp.where(unused_real, minv, _INF)
            delta = jnp.min(reach)
            j1 = jnp.argmin(reach).astype(jnp.int32)
            # dual updates: the u scatter (u[p[j]] += delta over used j)
            # becomes a one-hot contraction over the column axis
            used_mask = (used_row == 1) & virt_or_real
            p_vals = p_ref[...]
            # i1 reshapes are unsupported by Mosaic: cast masks to f32
            used_col = used_mask.astype(jnp.float32).reshape(P, 1)
            eq = (p_vals.reshape(P, 1) == col_iota.reshape(1, P))
            bump = jnp.sum(eq.astype(jnp.float32) * used_col, axis=0)
            u_ref[...] = u_row + delta * bump.reshape(1, P)
            v_ref[...] = jnp.where(used_mask, v_ref[...] - delta,
                                   v_ref[...])
            minv_ref[...] = jnp.where(unused_real, minv - delta, minv)
            return j1, sel_i(p_vals, j1)

        j0, _ = lax.while_loop(path_cond, path_body,
                               (jnp.int32(K), i))

        # augment along the recorded predecessor path
        def aug_cond(j):
            return j != FREE

        def aug_body(j):
            j1 = way_sel = sel_i(way_ref[...], j)
            p_j1 = sel_i(p_ref[...], j1)
            p_ref[...] = jnp.where(col_iota == j, p_j1, p_ref[...])
            return j1

        lax.while_loop(aug_cond, aug_body, j0)
        return 0

    lax.fori_loop(0, K, assign_row, 0)
    out_ref[...] = p_ref[0, :K].reshape(1, K)


@functools.partial(jax.jit, static_argnames=("interpret",))
def solve_square_pallas(cost, interpret: bool = False):
    """Exact min-cost perfect matching; returns col2row (K,) int32."""
    K = cost.shape[0]
    P = max(128, ((K + 1 + 127) // 128) * 128)
    kernel = functools.partial(_jv_kernel, K=K, P=P)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, K), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1, P), jnp.float32),   # u
            pltpu.VMEM((1, P), jnp.float32),   # v
            pltpu.VMEM((1, P), jnp.int32),     # p
            pltpu.VMEM((1, P), jnp.float32),   # minv
            pltpu.VMEM((1, P), jnp.int32),     # way
            pltpu.VMEM((1, P), jnp.int32),     # used
        ],
        interpret=interpret,
    )(cost.astype(jnp.float32))
    return out[0]
