"""Linear assignment on TPU (pure JAX, jit/vmap/scan-compatible).

The reference trackers all solve per-frame detection<->track assignment with
one of two native solvers:

  * ``scipy.optimize.linear_sum_assignment`` / ``lap.lapjv(extend_cost=True)``
    — forced rectangular matching of min(n, m) pairs
    (reference: plugins/track/oc_sort/association.py:186-194,
     plugins/track/strong_sort/sort/linear_assignment.py).
  * ``lap.lapjv(extend_cost=True, cost_limit=thresh)`` — matching where a
    pair is only formed if its cost beats the limit
    (reference: plugins/track/byte_track/matching.py:37-49,
     plugins/track/bot_sort/matching.py:37-49).

Both are replaced here by a single exact Jonker-Volgenant
shortest-augmenting-path core (:func:`solve_square`) over fixed-capacity
padded square matrices, written with ``lax`` loops so it compiles into a
``lax.scan`` tracker step and vmaps over a video batch axis. Costs are
normalized to O(1) magnitudes before solving so float32 potentials keep
~1e-7 relative precision (no 1e9-style BIG constants contaminating the
arithmetic).

Capacity padding: callers pass full (Rcap, Ccap) cost matrices plus boolean
row/col validity masks; invalid slots are routed to absorbing edges that
provably never perturb the valid-block optimum (see wrapper docstrings).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["solve_square", "solve_rect", "matching_forced", "matching_limit",
           "min_cost_matching", "greedy_unique_match"]

_INF = jnp.inf


def solve_square(cost: jnp.ndarray) -> jnp.ndarray:
    """Exact min-cost perfect matching on a square (K, K) float matrix.

    Returns ``col2row``: for each column j, the row assigned to it, shape
    (K,) int32. All costs must be finite. O(K^3) worst case.

    On TPU this dispatches to the single-kernel Pallas implementation
    (ops/assignment_pallas.py) — the whole algorithm runs inside one
    Mosaic program instead of one XLA op-sequence per augmenting step.
    Elsewhere (CPU tests, interpreters) the pure-lax path below runs:
    column scans vectorized, rows sequential.
    """
    from tracklab_tpu.ops.assignment_pallas import solve_square_pallas

    return lax.platform_dependent(
        cost,
        tpu=lambda c: solve_square_pallas(c),
        default=_solve_square_lax,
    )


def _solve_square_lax(cost: jnp.ndarray) -> jnp.ndarray:
    K = cost.shape[0]
    assert cost.shape == (K, K)
    dt = cost.dtype
    FREE = jnp.int32(K)  # sentinel row index meaning "column unassigned"

    # u: row potentials (size K+1, slot K is scratch for the virtual column)
    # v: column potentials (size K+1, slot K is the virtual column)
    # p: col -> row assignment (size K+1, slot K is the virtual column)
    u0 = jnp.zeros(K + 1, dt)
    v0 = jnp.zeros(K + 1, dt)
    p0 = jnp.full(K + 1, FREE, jnp.int32)

    def assign_row(i, carry):
        u, v, p = carry
        p = p.at[K].set(i)                      # virtual column holds row i
        minv = jnp.full(K, _INF, dt)
        way = jnp.full(K, K, jnp.int32)         # predecessor column in path
        used = jnp.zeros(K + 1, dtype=bool)

        def path_cond(st):
            _, _, p_, _, _, _, j0 = st
            return p_[j0] != FREE

        def path_body(st):
            u_, v_, p_, minv_, way_, used_, j0 = st
            used_ = used_.at[j0].set(True)
            i0 = p_[j0]
            cur = cost[i0, :] - u_[i0] - v_[:K]
            better = (cur < minv_) & (~used_[:K])
            minv_ = jnp.where(better, cur, minv_)
            way_ = jnp.where(better, j0, way_)
            reach = jnp.where(used_[:K], _INF, minv_)
            j1 = jnp.argmin(reach).astype(jnp.int32)
            delta = reach[j1]
            # u[p[j]] += delta for used columns (rows are distinct; the
            # virtual column's row lives in u's scratch slot when j == K).
            bump_rows = jnp.where(used_, p_, FREE)
            u_ = u_.at[bump_rows].add(jnp.where(used_, delta, 0.0))
            v_ = jnp.where(used_, v_ - delta, v_)
            minv_ = jnp.where(used_[:K], minv_, minv_ - delta)
            return u_, v_, p_, minv_, way_, used_, j1

        u, v, p, minv, way, used, j0 = lax.while_loop(
            path_cond, path_body,
            (u, v, p, minv, way, used, jnp.int32(K)),
        )

        # Augment: walk predecessor columns back to the virtual column.
        def aug_cond(st):
            _, j0_ = st
            return j0_ != K

        def aug_body(st):
            p_, j0_ = st
            j1 = way[j0_]
            p_ = p_.at[j0_].set(p_[j1])
            return p_, j1

        p, _ = lax.while_loop(aug_cond, aug_body, (p, j0))
        return u, v, p

    _, _, p = lax.fori_loop(0, K, assign_row, (u0, v0, p0))
    return p[:K]


from jax import custom_batching

# Rectangular-solver backend under vmap on TPU: "pallas" routes all
# lanes into one lane-batched Mosaic program; "lax" runs the pure-lax
# rectangular JV per lane (vmap of while_loops). The lax path compiles
# fast; the Pallas kernel is faster at large V but its compile inside
# vmap(scan) is expensive through remote-compile setups — switch with
# set_rect_backend() / TRACKLAB_TPU_RECT_BACKEND.
import os as _os

_RECT_BACKEND = _os.environ.get("TRACKLAB_TPU_RECT_BACKEND", "lax")


def set_rect_backend(name: str):
    """'pallas' or 'lax' (affects traced-after-this-call programs)."""
    global _RECT_BACKEND
    assert name in ("pallas", "lax"), name
    _RECT_BACKEND = name


@custom_batching.custom_vmap
def solve_rect(cost: jnp.ndarray) -> jnp.ndarray:
    """Exact min-cost assignment of ALL R rows of an (R, C) matrix,
    R <= C, to distinct columns. Returns col2row (C,) int32 (value >= R
    means unassigned; callers use :func:`_col2row_to_row2col`).

    Rectangular Jonker-Volgenant: R augmentations over C columns —
    O(R^2 C) instead of O(C^3) after square padding — and NO
    data-dependent ``lax.cond`` dispatch, so it composes with ``vmap``.
    Under ``vmap`` the custom batching rule routes ALL lanes into ONE
    lane-batched Pallas program on TPU
    (assignment_pallas.solve_rect_batched_pallas): per-problem state
    lives on the sublane axis, every Dijkstra step is a full-tile VPU op
    for all problems, and the loop trip count is the max over problems
    instead of their sum. This is the solver behind single-chip
    multi-video tracking (cfg.batched)."""
    from tracklab_tpu.ops.assignment_pallas import (
        solve_rect_batched_pallas,
    )

    R, C = cost.shape
    if R == C:
        return solve_square(cost)
    if _RECT_BACKEND != "pallas":
        return _solve_rect_lax(cost)
    return lax.platform_dependent(
        cost,
        tpu=lambda c: solve_rect_batched_pallas(c[None])[0],
        default=_solve_rect_lax,
    )


@solve_rect.def_vmap
def _solve_rect_vmap_rule(axis_size, in_batched, cost):
    from tracklab_tpu.ops.assignment_pallas import (
        solve_rect_batched_pallas,
    )

    (cost_batched,) = in_batched
    if not cost_batched:
        return solve_rect(cost), False
    lead = cost.shape[:-2]
    R, C = cost.shape[-2:]
    flat = cost.reshape((-1, R, C))
    if _RECT_BACKEND != "pallas":
        out = jax.vmap(_solve_rect_lax)(flat)
    else:
        out = lax.platform_dependent(
            flat,
            tpu=lambda c: solve_rect_batched_pallas(c),
            default=lambda c: lax.map(_solve_rect_lax, c),
        )
    return out.reshape(lead + (C,)), True


def _solve_rect_lax(cost: jnp.ndarray) -> jnp.ndarray:
    R, C = cost.shape
    assert R <= C, "solve_rect requires R <= C; transpose the problem"
    if R == C:
        return _solve_square_lax(cost)
    dt = cost.dtype
    FREE = jnp.int32(R)  # sentinel row id meaning "column unassigned"

    u0 = jnp.zeros(R + 1, dt)
    v0 = jnp.zeros(C + 1, dt)
    p0 = jnp.full(C + 1, FREE, jnp.int32)

    def assign_row(i, carry):
        u, v, p = carry
        p = p.at[C].set(i)
        minv = jnp.full(C, _INF, dt)
        way = jnp.full(C, C, jnp.int32)
        used = jnp.zeros(C + 1, dtype=bool)

        def path_cond(st):
            _, _, p_, _, _, _, j0 = st
            return p_[j0] != FREE

        def path_body(st):
            u_, v_, p_, minv_, way_, used_, j0 = st
            used_ = used_.at[j0].set(True)
            i0 = p_[j0]
            cur = cost[i0, :] - u_[i0] - v_[:C]
            better = (cur < minv_) & (~used_[:C])
            minv_ = jnp.where(better, cur, minv_)
            way_ = jnp.where(better, j0, way_)
            reach = jnp.where(used_[:C], _INF, minv_)
            j1 = jnp.argmin(reach).astype(jnp.int32)
            delta = reach[j1]
            bump_rows = jnp.where(used_, p_, FREE)
            u_ = u_.at[bump_rows].add(jnp.where(used_, delta, 0.0))
            v_ = jnp.where(used_, v_ - delta, v_)
            minv_ = jnp.where(used_[:C], minv_, minv_ - delta)
            return u_, v_, p_, minv_, way_, used_, j1

        u, v, p, minv, way, used, j0 = lax.while_loop(
            path_cond, path_body,
            (u, v, p, minv, way, used, jnp.int32(C)),
        )

        def aug_cond(st):
            _, j0_ = st
            return j0_ != C

        def aug_body(st):
            p_, j0_ = st
            j1 = way[j0_]
            p_ = p_.at[j0_].set(p_[j1])
            return p_, j1

        p, _ = lax.while_loop(aug_cond, aug_body, (p, j0))
        return u, v, p

    _, _, p = lax.fori_loop(0, R, assign_row, (u0, v0, p0))
    # map the FREE sentinel (R) to "no row" the same way the square core
    # reports it (value == #rows is treated as unassigned by the caller)
    return p[:C]


def _col2row_to_row2col(col2row: jnp.ndarray, n_rows_total: int) -> jnp.ndarray:
    """Invert a col->row map into row->col (rows outside get -1)."""
    K = col2row.shape[0]
    row2col = jnp.full(n_rows_total + 1, -1, jnp.int32)
    cols = jnp.arange(K, dtype=jnp.int32)
    safe_rows = jnp.where(
        (col2row >= 0) & (col2row < n_rows_total), col2row, n_rows_total
    )
    row2col = row2col.at[safe_rows].set(cols)
    return row2col[:n_rows_total]


def matching_forced(cost, row_mask, col_mask, solver=None,
                    batched=False):
    """scipy-style forced rectangular matching on a padded matrix.

    Matches every valid row/col up to min(#valid rows, #valid cols),
    minimizing total cost — identical semantics to
    ``scipy.optimize.linear_sum_assignment`` restricted to the valid block
    (reference call sites: oc_sort/association.py:186-194).

    Construction: costs are normalized to [-1, 1] and shifted by -2 on the
    valid-valid block; every edge touching an invalid slot costs 0. Since
    each valid-valid edge is then strictly negative and swapping a
    valid-valid pair out for two absorbing edges changes the total by
    -c >= 1 > 0, every optimum has maximum valid-valid cardinality and is
    optimal on the valid block (affine cost transforms preserve argmin).

    Args:
      cost: (R, C) float costs (finite on valid entries; others ignored).
      row_mask: (R,) bool validity. col_mask: (C,) bool validity.
      batched: vmap-safe mode — no data-dependent lax.cond dispatch;
        the rectangular JV core solves (R, C) directly (O(R^2 C), still
        cheaper than the square-padded O(C^3) the cond branches avoid).
        Identical results; use under vmap where cond runs every branch
        for all lanes.
    Returns:
      row2col: (R,) int32 — assigned valid column per valid row, else -1.
    """
    R, C = cost.shape
    if batched:
        return _forced_rect(cost, row_mask, col_mask)

    # ---- strict-argmin fast path (exactness-preserving) ----
    # Any forced matching satisfies sum_i c(i, s(i)) >= sum_i rowmin_i,
    # since every row's entry is >= that row's minimum. So when every
    # valid row's masked argmin is STRICT (unique minimum) and the
    # argmin columns are DISTINCT, assigning each row its argmin meets
    # the bound and any other matching is strictly worse: the optimum is
    # UNIQUE, hence identical to lap/scipy under ANY tie-breaking.
    # Symmetrically on columns when #cols < #rows. This fires on the
    # common well-separated frames (each detection clearly nearest one
    # track) and skips the sequential JV while_loop entirely — the
    # dominant per-frame cost at matched load (fused e2e diagnosis).
    valid = row_mask[:, None] & col_mask[None, :]
    feas = jnp.where(valid & jnp.isfinite(cost), cost, jnp.inf)
    nR = jnp.sum(row_mask, dtype=jnp.int32)
    nC = jnp.sum(col_mask, dtype=jnp.int32)

    rmin = jnp.min(feas, axis=1)
    ramin = jnp.argmin(feas, axis=1).astype(jnp.int32)
    r_strict = (jnp.sum(feas == rmin[:, None], axis=1) == 1) \
        & jnp.isfinite(rmin)
    r_hot = (ramin[:, None] == jnp.arange(C, dtype=jnp.int32)[None, :]) \
        & (row_mask & r_strict)[:, None]
    row_fast_ok = ((nR <= nC)
                   & jnp.all(r_strict | ~row_mask)
                   & jnp.all(jnp.sum(r_hot, axis=0) <= 1))

    cmin = jnp.min(feas, axis=0)
    camin = jnp.argmin(feas, axis=0).astype(jnp.int32)
    c_strict = (jnp.sum(feas == cmin[None, :], axis=0) == 1) \
        & jnp.isfinite(cmin)
    c_hot = (camin[None, :]
             == jnp.arange(R, dtype=jnp.int32)[:, None]) \
        & (col_mask & c_strict)[None, :]
    col_fast_ok = ((nC < nR)
                   & jnp.all(c_strict | ~col_mask)
                   & jnp.all(jnp.sum(c_hot, axis=1) <= 1))

    def row_fast(_):
        return jnp.where(row_mask & r_strict, ramin, -1)

    def col_fast(_):
        sel = c_hot
        hit = jnp.any(sel, axis=1)
        return jnp.where(hit,
                         jnp.argmax(sel, axis=1).astype(jnp.int32), -1)

    def slow(_):
        return _matching_forced_jv(cost, row_mask, col_mask, solver)

    return lax.cond(
        row_fast_ok, row_fast,
        lambda o: lax.cond(col_fast_ok, col_fast, slow, o), None)


def _matching_forced_jv(cost, row_mask, col_mask, solver=None):
    """The JV solve path of matching_forced (see its docstring)."""
    R, C = cost.shape
    if C > R:
        # Column compaction: trackers pad the track axis far beyond the
        # live count (C = max_tracks), but the JV solve is O(S^3) in the
        # square size. When <= R columns are valid, permute them to the
        # front (one-hot matmul — no gathers) and solve an (R, R)
        # problem instead of (C, C): exact, since invalid columns can
        # never match anyway.
        n_act = jnp.sum(col_mask.astype(jnp.int32))
        rank_a = jnp.cumsum(col_mask.astype(jnp.int32),
                            dtype=jnp.int32) - 1
        rank_i = jnp.cumsum((~col_mask).astype(jnp.int32),
                            dtype=jnp.int32) - 1
        pos = jnp.where(col_mask, rank_a, n_act + rank_i)   # (C,)
        onehot = (pos[:, None]
                  == jnp.arange(C, dtype=jnp.int32)[None, :])  # (C, C)
        perm_cost = cost @ onehot.astype(cost.dtype)           # (R, C)
        perm_mask = (col_mask.astype(jnp.int32)
                     @ onehot.astype(jnp.int32)) > 0
        # original column index per compacted slot
        colmap = jnp.argmax(onehot, axis=0).astype(jnp.int32)  # (C,)

        def small(_):
            r2c = _forced_core(perm_cost[:, :R], row_mask,
                               perm_mask[:R], solver)
            ok = r2c >= 0
            return jnp.where(ok, colmap[jnp.where(ok, r2c, 0)], -1)

        def full(_):
            return _forced_core(cost, row_mask, col_mask, solver)

        return lax.cond(n_act <= R, small, full, None)
    return _forced_core(cost, row_mask, col_mask, solver)


def _forced_rect(cost, row_mask, col_mask):
    """matching_forced semantics via the rectangular JV core, with no
    lax.cond dispatch (vmap-safe). Same absorbing-edge construction as
    _forced_core on an (R, C) rectangle; when R > C the problem is
    transposed."""
    R, C = cost.shape
    if R > C:
        # solve the transposed problem (C rows over R columns), then
        # invert the col->row map back to row2col
        c2r = _forced_rect(cost.T, col_mask, row_mask)   # (C,) col -> row
        sel = (c2r[None, :] == jnp.arange(R, dtype=jnp.int32)[:, None]) \
            & (c2r >= 0)[None, :]                         # (R, C)
        hit = jnp.any(sel, axis=1)
        return jnp.where(hit, jnp.argmax(sel, axis=1).astype(jnp.int32),
                         -1)
    valid = row_mask[:, None] & col_mask[None, :]
    finite = jnp.isfinite(cost) & valid
    scale = jnp.maximum(jnp.max(jnp.where(finite, jnp.abs(cost), 0.0)),
                        1e-9)
    c_hat = jnp.clip(jnp.where(finite, cost, 0.0) / scale, -1.0, 1.0) - 2.0
    rect = jnp.where(finite, c_hat, 0.0)
    col2row = solve_rect(rect)
    row2col = _col2row_to_row2col(col2row, R)
    cols_ok = (row2col >= 0) & (row2col < C)
    safe_col = jnp.where(cols_ok, row2col, 0)
    pair_valid = cols_ok & row_mask & col_mask[safe_col] & finite[
        jnp.arange(R), safe_col
    ]
    return jnp.where(pair_valid, row2col, -1)


def _forced_core(cost, row_mask, col_mask, solver=None):
    R, C = cost.shape
    S = max(R, C)
    valid = row_mask[:, None] & col_mask[None, :]
    finite = jnp.isfinite(cost) & valid
    scale = jnp.maximum(jnp.max(jnp.where(finite, jnp.abs(cost), 0.0)), 1e-9)
    c_hat = jnp.clip(jnp.where(finite, cost, 0.0) / scale, -1.0, 1.0) - 2.0
    sq = jnp.zeros((S, S), cost.dtype)
    sq = sq.at[:R, :C].set(jnp.where(valid, c_hat, 0.0))
    col2row = (solver or solve_square)(sq)
    row2col = _col2row_to_row2col(col2row, R)
    # Strip pairs that used absorbing edges or invalid slots.
    cols_ok = (row2col >= 0) & (row2col < C)
    safe_col = jnp.where(cols_ok, row2col, 0)
    pair_valid = cols_ok & row_mask & col_mask[safe_col] & finite[
        jnp.arange(R), safe_col
    ]
    return jnp.where(pair_valid, row2col, -1)


def matching_limit(cost, row_mask, col_mask, limit, batched=False):
    """``lap.lapjv(extend_cost=True, cost_limit=limit)`` semantics.

    A valid pair (i, j) is matched only when beneficial versus routing both
    endpoints to dummies at limit/2 each — i.e. pairs costing more than
    ``limit`` stay unmatched (reference: byte_track/matching.py:37-49; lap
    builds the [[C, L/2], [L/2, 0]] square extension, reproduced here with
    capacity-invalid slots priced out of the valid block).

    Returns row2col: (R,) int32, -1 where unmatched.
    ``batched=True`` is the vmap-safe variant: no lax.cond dispatch, one
    rectangular max-weight JV solve (identical results).
    """
    R, C = cost.shape
    valid = row_mask[:, None] & col_mask[None, :]
    finite = jnp.isfinite(cost) & valid

    if batched:
        w = jnp.where(finite, jnp.maximum(limit - cost, 0.0), 0.0)
        scale = jnp.maximum(jnp.max(w), 1e-9)
        wn = w / scale
        if C >= R:
            col2row = solve_rect(-wn)
            r2c = _col2row_to_row2col(col2row, R)
        else:
            col2row = solve_rect(-wn.T)          # (R,) orig-row -> col?
            # transposed: col2row maps each orig ROW (transposed col) to
            # the orig COL (transposed row) assigned to it
            r2c = jnp.where(col2row < C, col2row.astype(jnp.int32), -1)
        cols_ok = (r2c >= 0) & (r2c < C)
        safe_col = jnp.where(cols_ok, r2c, 0)
        ok = cols_ok & (wn[jnp.arange(R), safe_col] > 0.0)
        return jnp.where(ok, r2c, -1)

    # Exact fast path: edges costing more than ``limit`` never match (the
    # dummy route is cheaper), and when the strictly-sub-limit candidate
    # graph is a unique partial matching M, every optimum contains all of
    # M (for (r, c) in M: r and c each route through dummies or edges
    # > limit otherwise, totalling >= limit > cost(r, c)). Edges exactly
    # at the limit tie with their dummy route, so their presence forces
    # the slow path to keep solver-tie behavior identical.
    sub = finite & (cost < limit)
    at_limit = jnp.any(finite & (cost == limit))
    is_unique, fast_r2c = _unique_partial_matching(sub)
    is_unique = is_unique & ~at_limit

    def fast(_):
        return fast_r2c

    def slow(_):
        # cost_limit semantics == MAX-WEIGHT matching with weights
        # w = (limit - cost)+ : in lap's [[C, L/2], [L/2, 0]] square, any
        # assignment's total is const - sum(w over matched real pairs),
        # so the optimum maximizes total w; pairs with w = 0 (cost >=
        # limit) are never strictly beneficial. Max-weight matching on
        # non-negative w pads to a square of size max(R, C) with neutral
        # zero edges — (R+C)^2 -> max(R,C)^2, a ~3x smaller JV solve.
        w = jnp.where(finite, jnp.maximum(limit - cost, 0.0), 0.0)
        scale = jnp.maximum(jnp.max(w), 1e-9)
        wn = w / scale

        def solve_block(wb):
            Sq = max(wb.shape)
            sq = jnp.zeros((Sq, Sq), cost.dtype)
            sq = sq.at[: wb.shape[0], : wb.shape[1]].set(-wb)
            col2row = solve_square(sq)
            r2c = _col2row_to_row2col(col2row, wb.shape[0])
            cols_ok = (r2c >= 0) & (r2c < wb.shape[1])
            safe_col = jnp.where(cols_ok, r2c, 0)
            ok = cols_ok & (wb[jnp.arange(wb.shape[0]), safe_col] > 0.0)
            return jnp.where(ok, r2c, -1)

        if C <= R:
            return solve_block(wn)
        # column compaction (see matching_forced): when <= R columns are
        # valid, solve (R, R) instead of (C, C)
        n_act = jnp.sum(col_mask.astype(jnp.int32))
        rank_a = jnp.cumsum(col_mask.astype(jnp.int32),
                            dtype=jnp.int32) - 1
        rank_i = jnp.cumsum((~col_mask).astype(jnp.int32),
                            dtype=jnp.int32) - 1
        pos = jnp.where(col_mask, rank_a, n_act + rank_i)
        onehot = (pos[:, None]
                  == jnp.arange(C, dtype=jnp.int32)[None, :])
        colmap = jnp.argmax(onehot, axis=0).astype(jnp.int32)

        def small(_):
            r2c = solve_block((wn @ onehot.astype(wn.dtype))[:, :R])
            ok = r2c >= 0
            return jnp.where(ok, colmap[jnp.where(ok, r2c, 0)], -1)

        return lax.cond(n_act <= R, small,
                        lambda _: solve_block(wn), None)

    return lax.cond(is_unique, fast, slow, None)


def _unique_partial_matching(sub):
    """(is_unique, row2col) for a boolean candidate matrix with at most
    one candidate per row and per column. row2col only meaningful when
    is_unique."""
    counts_r = jnp.sum(sub.astype(jnp.int32), axis=1)
    counts_c = jnp.sum(sub.astype(jnp.int32), axis=0)
    is_unique = (jnp.max(counts_r, initial=0) <= 1) \
        & (jnp.max(counts_c, initial=0) <= 1)
    any_row = jnp.any(sub, axis=1)
    row2col = jnp.where(any_row, jnp.argmax(sub, axis=1).astype(jnp.int32),
                        jnp.int32(-1))
    return is_unique, row2col


def min_cost_matching(cost, row_mask, col_mask, max_distance, solver=None,
                      batched=False):
    """DeepSORT-family ``min_cost_matching`` semantics
    (strong_sort/sort/linear_assignment.py:55-73): clamp costs above
    ``max_distance`` to max+1e-5, run forced LSA, drop matched pairs whose
    true cost exceeds the threshold.

    Fast path (exact): when the sub-threshold candidate graph has at most
    one candidate per row and per column, that partial matching M *is* the
    answer — for any edge (r, c) in M, rerouting r and c through clamped
    or absorbing edges costs >= max_distance + 1e-5 each while cost(r, c)
    <= max_distance, so every optimum contains all of M; any extra pairs
    the forced LSA matches are clamped edges the post-filter drops. In
    tracking, assignments are unambiguous on most frames, so this skips
    the O(K^3) sequential JV solve almost always (the same shape of
    shortcut the reference applies to IoU matrices in
    oc_sort/association.py:267-271 — here it is exactness-preserving
    rather than a semantic variant).
    """
    valid = row_mask[:, None] & col_mask[None, :] & jnp.isfinite(cost)
    sub = valid & (cost <= max_distance)

    def slow(_):
        clamped = jnp.minimum(cost, max_distance + 1e-5)
        d2t = matching_forced(clamped, row_mask, col_mask, solver,
                              batched=batched)
        got = d2t >= 0
        safe = jnp.where(got, d2t, 0)
        keep = got & (cost[jnp.arange(cost.shape[0]), safe]
                      <= max_distance)
        return jnp.where(keep, d2t, -1)

    if batched:
        # vmap-safe: no cond fast path
        return slow(None)

    is_unique, fast_r2c = _unique_partial_matching(sub)

    def fast(_):
        return fast_r2c

    return lax.cond(is_unique, fast, slow, None)


def greedy_unique_match(score, row_mask, col_mask, threshold):
    """The reference fast path: threshold the similarity matrix and accept
    it directly when it forms a (partial) unique matching.

    Mirrors oc_sort/association.py:267-271: ``a = (iou > thr); if
    a.sum(1).max() == 1 and a.sum(0).max() == 1: use where(a)``.

    Returns (is_unique: bool scalar, row2col: (R,) int32 with -1 unmatched).
    ``row2col`` is only meaningful when ``is_unique`` is True.
    """
    valid = row_mask[:, None] & col_mask[None, :]
    a = (score > threshold) & valid
    rows_ok = jnp.max(jnp.sum(a, axis=1)) == 1
    cols_ok = jnp.max(jnp.sum(a, axis=0)) == 1
    is_unique = rows_ok & cols_ok
    any_row = jnp.any(a, axis=1)
    row2col = jnp.where(any_row, jnp.argmax(a, axis=1).astype(jnp.int32), -1)
    return is_unique, row2col
