"""Adversarial integer-cost tie suite for the lapjv cost-limit semantics.

VERDICT r2 weak item 7: ``matching_limit`` emulates
``lap.lapjv(extend_cost=True, cost_limit=L)`` (tests/refbridge.py:_lapjv
builds the extended square matrix and argues ties have measure zero on
the float parity streams). This suite closes the argument with integer
cost matrices — where ties are COMMON — by checking the returned
matching's OBJECTIVE against a brute-force enumeration of every partial
matching under the lapjv extension objective:

    total = sum(matched costs) + (L/2) * (#unmatched rows + #unmatched cols)

(the [[C, L/2], [L/2, 0]] square extension, byte_track/matching.py:37-49).
With ties, multiple argmins exist; objective equality is the invariant
every lapjv implementation satisfies. The same check runs for the
scipy-forced semantics (matching_forced == scipy on the valid block)
and for the batched (vmap-safe) variants.
"""
import itertools

import numpy as np
import pytest
import jax.numpy as jnp

from tracklab_tpu.ops.assignment import matching_forced, matching_limit


def _brute_force_limit_objective(cost, limit):
    """Minimum of the lapjv-extension objective over ALL partial
    matchings of an (R, C) matrix."""
    R, C = cost.shape
    best = None
    rows = range(R)
    for k in range(0, min(R, C) + 1):
        for rsub in itertools.combinations(rows, k):
            for csub in itertools.permutations(range(C), k):
                tot = sum(cost[i, j] for i, j in zip(rsub, csub))
                tot += (limit / 2.0) * ((R - k) + (C - k))
                if best is None or tot < best - 1e-12:
                    best = tot
    return best


def _objective_of(cost, row2col, limit, R, C):
    matched = row2col >= 0
    tot = float(sum(cost[i, row2col[i]] for i in range(R) if matched[i]))
    n_matched = int(matched.sum())
    tot += (limit / 2.0) * ((R - n_matched) + (C - n_matched))
    return tot


import functools


@functools.lru_cache(maxsize=None)
def _jitted_limit_solver(R, C, batched):
    """One jitted executable per (shape, variant) with ``limit`` traced —
    the production calling convention (trackers jit their scans). The
    eager path compiled each lax primitive separately; on this
    container's single-core host, hundreds of accumulated XLA:CPU eager
    compiles in one process segfault the compiler
    (backend_compile_and_load), so the test must not run eagerly."""
    import jax
    return jax.jit(lambda cost, limit: matching_limit(
        cost, jnp.ones(R, bool), jnp.ones(C, bool), limit,
        batched=batched))


def _solve(cost, limit, batched):
    R, C = cost.shape
    r2c = _jitted_limit_solver(R, C, batched)(
        jnp.asarray(cost, jnp.float32), jnp.float32(limit))
    return np.asarray(r2c)


@pytest.mark.parametrize("batched", [False, True],
                         ids=["cond", "batched"])
@pytest.mark.parametrize("shape", [(3, 3), (4, 3), (3, 5), (5, 5),
                                   (1, 4), (4, 1)])
def test_integer_tie_matrices_hit_bruteforce_optimum(shape, batched):
    """200 random small-integer matrices per shape: heavy ties, limits
    chosen to sit exactly ON cost values (the adversarial case)."""
    R, C = shape
    rng = np.random.default_rng(R * 100 + C)
    for trial in range(200):
        cost = rng.integers(0, 6, (R, C)).astype(np.float64)
        limit = float(rng.choice([2.0, 3.0, 4.0, 5.0]))
        r2c = _solve(cost, limit, batched)
        # validity: injective, in-range
        matched = r2c[r2c >= 0]
        assert len(set(matched.tolist())) == len(matched)
        got = _objective_of(cost, r2c, limit, R, C)
        want = _brute_force_limit_objective(cost, limit)
        assert abs(got - want) < 1e-6, (
            f"trial {trial}: objective {got} != optimal {want}\n"
            f"cost=\n{cost}\nlimit={limit}\nr2c={r2c}")


@pytest.mark.parametrize("batched", [False, True],
                         ids=["cond", "batched"])
def test_all_above_limit_matches_nothing(batched):
    cost = np.full((3, 3), 9.0)
    r2c = _solve(cost, 4.0, batched)
    assert (r2c == -1).all()


@pytest.mark.parametrize("batched", [False, True],
                         ids=["cond", "batched"])
def test_exactly_at_limit_boundary(batched):
    """A pair costing exactly L is indifferent (L vs two dummies at L/2
    each): either answer must reach the same objective."""
    for L in (2.0, 4.0):
        cost = np.array([[L]])
        r2c = _solve(cost, L, batched)
        got = _objective_of(cost, r2c, L, 1, 1)
        assert abs(got - L) < 1e-6


@pytest.mark.parametrize("batched", [False, True],
                         ids=["cond", "batched"])
def test_forced_matching_ties_match_scipy_objective(batched):
    """matching_forced on tie-heavy integer matrices reaches scipy's
    optimal total on the valid block (same-cardinality guarantee)."""
    from scipy.optimize import linear_sum_assignment

    @functools.lru_cache(maxsize=None)
    def forced_solver(R, C):
        import jax
        return jax.jit(lambda cost: matching_forced(
            cost, jnp.ones(R, bool), jnp.ones(C, bool),
            batched=batched))

    rng = np.random.default_rng(0)
    for trial in range(100):
        R = int(rng.integers(1, 6))
        C = int(rng.integers(1, 6))
        cost = rng.integers(0, 5, (R, C)).astype(np.float64)
        r2c = np.asarray(forced_solver(R, C)(
            jnp.asarray(cost, jnp.float32)))
        ri, ci = linear_sum_assignment(cost)
        want = cost[ri, ci].sum()
        matched = r2c >= 0
        assert matched.sum() == min(R, C)
        got = sum(cost[i, r2c[i]] for i in range(R) if matched[i])
        assert abs(got - want) < 1e-6, (trial, cost, r2c, (ri, ci))


@pytest.mark.parametrize("shape", [(5, 8), (8, 5), (6, 6)])
def test_strict_argmin_fast_path_matches_scipy(shape):
    """Matrices engineered to satisfy the strict-distinct-argmin
    condition (each row clearly nearest one distinct column): the fast
    path's output must equal scipy's EXACT positions (the optimum is
    unique there, so position equality — not just objective — holds)."""
    from scipy.optimize import linear_sum_assignment

    R, C = shape
    rng = np.random.default_rng(R * 10 + C)
    for trial in range(50):
        n = min(R, C)
        perm = rng.permutation(max(R, C))[:n]
        cost = rng.uniform(5.0, 9.0, (R, C))
        if R <= C:
            for i in range(n):
                cost[i, perm[i]] = rng.uniform(0.0, 1.0)
        else:
            for j in range(n):
                cost[perm[j], j] = rng.uniform(0.0, 1.0)
        r2c = np.asarray(matching_forced(
            jnp.asarray(cost, jnp.float32),
            jnp.ones(R, bool), jnp.ones(C, bool)))
        ri, ci = linear_sum_assignment(cost)
        want = np.full(R, -1)
        want[ri] = ci
        np.testing.assert_array_equal(r2c, want,
                                      err_msg=f"trial {trial}\n{cost}")


def test_fast_path_with_masks_and_inf():
    """Fast path respects row/col masks and non-finite entries."""
    from scipy.optimize import linear_sum_assignment

    cost = np.array([[0.1, 9.0, 9.0, 5.0],
                     [9.0, 0.2, 9.0, 5.0],
                     [9.0, 9.0, np.inf, 5.0]])
    row_mask = np.array([True, True, False])
    col_mask = np.array([True, True, True, False])
    r2c = np.asarray(matching_forced(
        jnp.asarray(cost, jnp.float32), jnp.asarray(row_mask),
        jnp.asarray(col_mask)))
    # valid block is rows 0-1 x cols 0-2: strict distinct argmins
    np.testing.assert_array_equal(r2c, [0, 1, -1])
