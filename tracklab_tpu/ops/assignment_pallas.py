"""Jonker-Volgenant assignment as a single Pallas TPU kernel.

The pure-lax solver (ops/assignment.py:solve_square) is exact but each
augmenting-path iteration is a separate XLA op sequence — ~19 ms per
64x64 solve on a v5e, dominated by per-op dispatch. This kernel runs the
whole O(K^3) algorithm inside ONE Pallas program: cost matrix, duals and
path state live in VMEM and every per-step update is a full-width VPU
vector op (Mosaic forbids scalar VMEM stores, so single-element updates
become masked writes, scalar reads become masked reductions).

Algorithm: LAPJV / scipy-rectangular_lsap shortest augmenting path with
DEFERRED dual updates — the Dijkstra inner loop touches only (1, P)
vectors (argmin + one relaxation); the u/v dual adjustments and the
single (P, P) one-hot contraction for the u[p[j]] scatter happen once
per assigned row, not once per inner step (the earlier e-maxx-style
incremental-dual kernel paid that contraction every step — ~10x more
vector work on hard matrices). Exactness matches solve_square / scipy.

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
_NONE = -1   # "no predecessor column" sentinel


def _jv_kernel(cost_ref, out_ref, u_ref, v_ref, p_ref, d_ref, pred_ref,
               vis_ref, *, K: int, P: int):
    FREE = K
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    real = col_iota < K                     # real columns

    def sel_i(vec, j):
        """vec (1, P) int32, scalar j -> vec[0, j] via masked reduction."""
        return jnp.max(jnp.where(col_iota == j, vec, -2147483647))

    def sel_f(vec, j):
        return jnp.max(jnp.where(col_iota == j, vec,
                                 jnp.float32(-_INF)))

    # (A LAPJV column-reduction + greedy pre-assignment preamble was
    # measured SLOWER here: the forced-matching construction makes many
    # rows share argmin columns, so the preamble's fixed per-solve cost
    # outweighs the saved augments. Plain u = v = 0 start wins.)
    u_ref[...] = jnp.zeros((1, P), jnp.float32)
    v_ref[...] = jnp.zeros((1, P), jnp.float32)
    p_ref[...] = jnp.full((1, P), FREE, jnp.int32)

    def assign_row(cur, _):
        cur = jnp.int32(cur)
        u_cur = sel_f(u_ref[...], cur)
        cost_cur = jnp.concatenate(
            [cost_ref[pl.ds(cur, 1), :],
             jnp.full((1, P - K), _INF, jnp.float32)], axis=1)
        d_ref[...] = jnp.where(real, cost_cur - u_cur - v_ref[...],
                               _INF)
        pred_ref[...] = jnp.full((1, P), _NONE, jnp.int32)
        vis_ref[...] = jnp.zeros((1, P), jnp.int32)

        # --- Dijkstra over columns; duals untouched until the sink ---
        def sp_cond(carry):
            sink, _ = carry
            return sink == _NONE

        def sp_body(carry):
            _, _ = carry
            reach = jnp.where((vis_ref[...] == 0) & real, d_ref[...],
                              _INF)
            min_val = jnp.min(reach)
            j_star = jnp.argmin(reach).astype(jnp.int32)
            vis_ref[...] = jnp.where(col_iota == j_star, 1, vis_ref[...])
            i_star = sel_i(p_ref[...], j_star)

            def relax(_):
                u_i = sel_f(u_ref[...], i_star)
                cost_i = jnp.concatenate(
                    [cost_ref[pl.ds(i_star, 1), :],
                     jnp.full((1, P - K), _INF, jnp.float32)], axis=1)
                alt = min_val + cost_i - u_i - v_ref[...]
                better = (alt < d_ref[...]) & (vis_ref[...] == 0) & real
                d_ref[...] = jnp.where(better, alt, d_ref[...])
                pred_ref[...] = jnp.where(better, j_star, pred_ref[...])
                return jnp.int32(_NONE)

            sink = lax.cond(i_star == FREE, lambda _: j_star, relax,
                            0)
            return sink, min_val

        sink, min_val = lax.while_loop(sp_cond, sp_body,
                                       (jnp.int32(_NONE),
                                        jnp.float32(0.0)))

        # --- deferred dual updates (once per row) ---
        # scanned columns (visited, excluding the sink): v[j] += d[j] -
        # min_val; their assigned rows: u[p[j]] += min_val - d[j].
        scanned = (vis_ref[...] == 1) & (col_iota != sink) & real
        dgap = jnp.where(scanned, min_val - d_ref[...], 0.0)
        v_ref[...] = jnp.where(scanned, v_ref[...] - dgap, v_ref[...])
        # u scatter via one-hot contraction (i1 reshape unsupported by
        # Mosaic: cast masks through f32)
        p_vals = p_ref[...]
        eq = (p_vals.reshape(P, 1) == col_iota.reshape(1, P))
        bump = jnp.sum(eq.astype(jnp.float32) * dgap.reshape(P, 1),
                       axis=0)
        u_ref[...] = u_ref[...] + bump.reshape(1, P)
        u_ref[...] = jnp.where(col_iota == cur, u_ref[...] + min_val,
                               u_ref[...])

        # --- augment along the predecessor-column chain from the sink ---
        def aug_cond(carry):
            j, _ = carry
            return j != _NONE

        def aug_body(carry):
            j, _ = carry
            jp = sel_i(pred_ref[...], j)
            new_row = lax.cond(jp == _NONE, lambda _: cur,
                               lambda _: sel_i(p_ref[...], jp), 0)
            p_ref[...] = jnp.where(col_iota == j, new_row, p_ref[...])
            return jp, 0

        lax.while_loop(aug_cond, aug_body, (sink, 0))
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
            pltpu.VMEM((1, P), jnp.float32),   # u (row duals, on lanes)
            pltpu.VMEM((1, P), jnp.float32),   # v (col duals)
            pltpu.VMEM((1, P), jnp.int32),     # p (col -> row)
            pltpu.VMEM((1, P), jnp.float32),   # d (shortest path costs)
            pltpu.VMEM((1, P), jnp.int32),     # pred (col -> prev col)
            pltpu.VMEM((1, P), jnp.int32),     # visited
        ],
        interpret=interpret,
    )(cost.astype(jnp.float32))
    return out[0]


# ---------------------------------------------------------------------------
# Lane-batched RECTANGULAR JV kernel: V independent (R, C) problems solved
# simultaneously in ONE Mosaic program. All per-problem state lives on the
# sublane axis of (V, P) VMEM tiles, so each Dijkstra step is one
# full-tile VPU op for ALL problems at once, and the while-loop trip count
# is the max over problems instead of their sum (what a vmapped/grid
# launch of the single-problem kernel would pay). This is the solver
# behind the single-chip multi-video tracker batching (cfg.batched).
# ---------------------------------------------------------------------------

def _jv_rect_batched_kernel(cost_ref, out_ref, u_ref, v_ref, p_ref, d_ref,
                            pred_ref, vis_ref, *, V: int, R: int, C: int,
                            P: int):
    FREE = R
    col = jax.lax.broadcasted_iota(jnp.int32, (V, P), 1)
    real = col < C
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)  # for u slots

    def sel_f(mat, idx):
        """mat (V, P), idx (V, 1) -> (V, 1) masked row-wise select."""
        return jnp.max(jnp.where(col == idx, mat, jnp.float32(-_INF)),
                       axis=1, keepdims=True)

    def sel_i(mat, idx):
        return jnp.max(jnp.where(col == idx, mat, jnp.int32(-2147483647)),
                       axis=1, keepdims=True)

    def cost_row_dyn(i_star):
        """Per-problem row gather via one-hot contraction over R
        (Mosaic has no fancy gather): (V, 1) row ids -> (V, P) rows."""
        acc = jnp.zeros((V, P), jnp.float32)
        for r in range(R):  # static unroll; R is small (max_dets)
            m = (i_star == r).astype(jnp.float32)          # (V, 1)
            acc = acc + m * cost_ref[:, r, :]
        return acc

    u_ref[...] = jnp.zeros((V, P), jnp.float32)
    v_ref[...] = jnp.zeros((V, P), jnp.float32)
    p_ref[...] = jnp.full((V, P), FREE, jnp.int32)

    def assign_row(cur, _):
        cur = jnp.int32(cur)
        u_cur = sel_f(u_ref[...], jnp.full((V, 1), cur))
        cost_cur = cost_ref[:, cur, :]                      # (V, P)
        d_ref[...] = jnp.where(real, cost_cur - u_cur - v_ref[...],
                               _INF)
        pred_ref[...] = jnp.full((V, P), _NONE, jnp.int32)
        vis_ref[...] = jnp.zeros((V, P), jnp.int32)

        def sp_cond(carry):
            sink, _ = carry
            return jnp.any(sink == _NONE)

        def sp_body(carry):
            sink, minv = carry
            live = sink == _NONE                            # (V, 1)
            reach = jnp.where((vis_ref[...] == 0) & real, d_ref[...],
                              _INF)
            min_val = jnp.min(reach, axis=1, keepdims=True)  # (V, 1)
            j_star = jnp.argmin(reach, axis=1).astype(jnp.int32)
            j_star = j_star.reshape(V, 1)
            hit = (col == j_star) & live
            vis_ref[...] = jnp.where(hit, 1, vis_ref[...])
            i_star = sel_i(p_ref[...], j_star)              # (V, 1)
            found = live & (i_star == FREE)
            sink = jnp.where(found, j_star, sink)
            minv = jnp.where(found | (live & (i_star != FREE)),
                             jnp.where(live, min_val, minv), minv)
            # relax for problems still searching
            relaxing = live & (i_star != FREE)
            safe_i = jnp.where(relaxing, i_star, 0)
            u_i = sel_f(u_ref[...], safe_i)
            cost_i = cost_row_dyn(safe_i)
            alt = min_val + cost_i - u_i - v_ref[...]
            better = (alt < d_ref[...]) & (vis_ref[...] == 0) & real \
                & relaxing
            d_ref[...] = jnp.where(better, alt, d_ref[...])
            pred_ref[...] = jnp.where(better, j_star, pred_ref[...])
            return sink, minv

        sink, min_val = lax.while_loop(
            sp_cond, sp_body,
            (jnp.full((V, 1), _NONE, jnp.int32),
             jnp.zeros((V, 1), jnp.float32)))

        # deferred dual updates (per problem)
        scanned = (vis_ref[...] == 1) & (col != sink) & real
        dgap = jnp.where(scanned, min_val - d_ref[...], 0.0)
        v_ref[...] = jnp.where(scanned, v_ref[...] - dgap, v_ref[...])
        # u[p[j]] += dgap[j] via one-hot contraction per problem:
        # eq[v, r, j] = (p[v, j] == r)
        p_vals = p_ref[...]
        bump = jnp.zeros((V, P), jnp.float32)
        for r in range(R):
            m = jnp.sum(jnp.where(p_vals == r, dgap, 0.0), axis=1,
                        keepdims=True)                      # (V, 1)
            bump = bump + m * (row_ids == r).astype(jnp.float32)
        u_ref[...] = u_ref[...] + bump
        u_ref[...] = jnp.where(col == cur, u_ref[...] + min_val,
                               u_ref[...])

        # augment per problem
        def aug_cond(carry):
            j = carry
            return jnp.any(j != _NONE)

        def aug_body(carry):
            j = carry
            live = j != _NONE
            safe_j = jnp.where(live, j, 0)
            jp = sel_i(pred_ref[...], safe_j)
            at_chain_start = jp == _NONE
            prev_row = sel_i(p_ref[...], jnp.where(at_chain_start, 0,
                                                   jp))
            new_row = jnp.where(at_chain_start, cur, prev_row)
            p_ref[...] = jnp.where((col == safe_j) & live, new_row,
                                   p_ref[...])
            return jnp.where(live, jp, _NONE)

        lax.while_loop(aug_cond, aug_body, sink)
        return 0

    lax.fori_loop(0, R, assign_row, 0)
    out_ref[...] = p_ref[:, :C]


@functools.partial(jax.jit, static_argnames=("interpret",))
def solve_rect_batched_pallas(cost, interpret: bool = False):
    """V independent exact rectangular assignments in one kernel.

    cost: (V, R, C) with R <= C, finite. Returns col2row (V, C) int32
    (value == R means the column is unassigned)."""
    V, R, C = cost.shape
    P = max(128, ((C + 1 + 127) // 128) * 128)
    pad = jnp.full((V, R, P - C), _INF, jnp.float32)
    cost_p = jnp.concatenate([cost.astype(jnp.float32), pad], axis=2)
    kernel = functools.partial(_jv_rect_batched_kernel, V=V, R=R, C=C,
                               P=P)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((V, C), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((V, P), jnp.float32),   # u (row duals on lanes)
            pltpu.VMEM((V, P), jnp.float32),   # v
            pltpu.VMEM((V, P), jnp.int32),     # p
            pltpu.VMEM((V, P), jnp.float32),   # d
            pltpu.VMEM((V, P), jnp.int32),     # pred
            pltpu.VMEM((V, P), jnp.int32),     # vis
        ],
        interpret=interpret,
    )(cost_p)
    return out
