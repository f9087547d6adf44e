"""Assignment-kernel tests: cross-checked against scipy, the same oracle the
reference falls back to (plugins/track/oc_sort/association.py:186-194), plus
an emulation of lap.lapjv's cost_limit square extension for the ByteTrack
semantics (plugins/track/byte_track/matching.py:37-49)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.optimize import linear_sum_assignment

from tracklab_tpu.ops.assignment import (
    solve_square, matching_forced, matching_limit, greedy_unique_match,
)


def scipy_limit_oracle(cost, limit):
    """Reproduce lap.lapjv(extend_cost=True, cost_limit=limit) with scipy."""
    n, m = cost.shape
    ext = np.full((n + m, n + m), limit / 2.0)
    ext[n:, m:] = 0.0
    ext[:n, :m] = cost
    rows, cols = linear_sum_assignment(ext)
    r2c = np.full(n, -1, np.int64)
    for r, c in zip(rows, cols):
        if r < n and c < m:
            r2c[r] = c
    return r2c


class TestSolveSquare:
    @pytest.mark.parametrize("k", [1, 2, 16])
    def test_optimal_cost_matches_scipy(self, k):
        rng = np.random.default_rng(k)
        for trial in range(20):
            c = rng.normal(size=(k, k))
            col2row = np.asarray(solve_square(jnp.asarray(c)))
            # perfect matching
            assert sorted(col2row) == list(range(k))
            got = c[col2row, np.arange(k)].sum()
            r, ccols = linear_sum_assignment(c)
            want = c[r, ccols].sum()
            np.testing.assert_allclose(got, want, rtol=1e-9)

    def test_float32_precision(self):
        rng = np.random.default_rng(7)
        c = rng.normal(size=(32, 32)).astype(np.float32)
        col2row = np.asarray(solve_square(jnp.asarray(c)))
        got = c[col2row, np.arange(32)].astype(np.float64).sum()
        r, ccols = linear_sum_assignment(c.astype(np.float64))
        np.testing.assert_allclose(got, c[r, ccols].sum(), rtol=1e-5)


class TestMatchingForced:
    @pytest.mark.parametrize("nr,nc,rcap,ccap", [
        (5, 5, 8, 8), (3, 7, 8, 8), (7, 3, 8, 8), (0, 5, 8, 8),
        (5, 0, 8, 8), (1, 1, 8, 8), (8, 8, 8, 8),
    ])
    def test_vs_scipy(self, nr, nc, rcap, ccap):
        rng = np.random.default_rng(nr * 100 + nc)
        for trial in range(10):
            c = rng.normal(size=(rcap, ccap)) * 10
            row_mask = np.arange(rcap) < nr
            col_mask = np.arange(ccap) < nc
            r2c = np.asarray(matching_forced(
                jnp.asarray(c), jnp.asarray(row_mask), jnp.asarray(col_mask)))
            # all matches valid, cardinality = min(nr, nc)
            matched = r2c >= 0
            assert matched.sum() == min(nr, nc)
            assert not matched[nr:].any()
            assert (r2c[matched] < nc).all()
            if min(nr, nc):
                got = c[:nr][matched[:nr], r2c[:nr][matched[:nr]]].sum()
                rr, cc = linear_sum_assignment(c[:nr, :nc])
                np.testing.assert_allclose(got, c[:nr, :nc][rr, cc].sum(),
                                           rtol=1e-6)

    def test_jit_and_vmap(self):
        rng = np.random.default_rng(0)
        c = rng.normal(size=(4, 8, 8))
        masks = jnp.ones((4, 8), bool)
        fn = jax.jit(jax.vmap(matching_forced))
        out = np.asarray(fn(jnp.asarray(c), masks, masks))
        for b in range(4):
            rr, cc = linear_sum_assignment(c[b])
            got = c[b][np.arange(8), out[b]].sum()
            np.testing.assert_allclose(got, c[b][rr, cc].sum(), rtol=1e-6)


class TestMatchingLimit:
    @pytest.mark.parametrize("nr,nc", [(6, 6), (3, 8), (8, 3), (0, 4), (4, 0)])
    def test_vs_lapjv_extension_oracle(self, nr, nc):
        rng = np.random.default_rng(nr * 10 + nc)
        rcap, ccap = 8, 8
        for trial in range(10):
            # ByteTrack-style costs in [0, 1], limit in (0, 1)
            c = rng.uniform(0, 1, size=(rcap, ccap))
            limit = float(rng.uniform(0.3, 0.9))
            row_mask = np.arange(rcap) < nr
            col_mask = np.arange(ccap) < nc
            r2c = np.asarray(matching_limit(
                jnp.asarray(c), jnp.asarray(row_mask), jnp.asarray(col_mask),
                limit))
            want = (scipy_limit_oracle(c[:nr, :nc], limit)
                    if nr and nc else np.full(nr, -1))
            # matched pairs must be identical in *total cost* and count;
            # individual pairings can differ on ties only (continuous rng).
            got_pairs = {(i, j) for i, j in enumerate(r2c[:nr]) if j >= 0}
            want_pairs = {(i, j) for i, j in enumerate(want) if j >= 0}
            assert len(got_pairs) == len(want_pairs)
            got_cost = sum(c[i, j] for i, j in got_pairs)
            want_cost = sum(c[i, j] for i, j in want_pairs)
            np.testing.assert_allclose(got_cost, want_cost, rtol=1e-6)
            assert not (r2c[nr:] >= 0).any()

    def test_all_above_limit_matches_nothing(self):
        c = jnp.full((4, 4), 5.0)
        m = jnp.ones(4, bool)
        r2c = np.asarray(matching_limit(c, m, m, 1.0))
        assert (r2c == -1).all()

    def test_all_below_limit_matches_everything(self):
        rng = np.random.default_rng(3)
        c = jnp.asarray(rng.uniform(0, 0.1, (4, 4)))
        m = jnp.ones(4, bool)
        r2c = np.asarray(matching_limit(c, m, m, 1.0))
        assert (r2c >= 0).all()


class TestGreedyUnique:
    def test_unique_case(self):
        score = jnp.asarray(np.array([
            [0.9, 0.0, 0.0],
            [0.0, 0.0, 0.8],
            [0.1, 0.1, 0.1],
        ]))
        m3 = jnp.ones(3, bool)
        uniq, r2c = greedy_unique_match(score, m3, m3, 0.3)
        assert bool(uniq)
        assert list(np.asarray(r2c)) == [0, 2, -1]

    def test_ambiguous_case(self):
        score = jnp.asarray(np.array([[0.9, 0.8], [0.1, 0.2]]))
        m2 = jnp.ones(2, bool)
        uniq, _ = greedy_unique_match(score, m2, m2, 0.3)
        assert not bool(uniq)

    def test_empty_is_not_unique(self):
        score = jnp.zeros((3, 3))
        m3 = jnp.ones(3, bool)
        uniq, _ = greedy_unique_match(score, m3, m3, 0.3)
        assert not bool(uniq)


class TestColumnCompaction:
    """Exercise both compaction branches of the C > R matchers
    explicitly (the square-cap tests never hit them)."""

    @pytest.mark.parametrize("n_valid_cols", [2, 4, 9, 12])
    def test_forced_rect_vs_scipy(self, n_valid_cols):
        from scipy.optimize import linear_sum_assignment
        rng = np.random.default_rng(n_valid_cols)
        R, C = 4, 12
        for trial in range(10):
            c = rng.normal(size=(R, C))
            row_mask = np.ones(R, bool)
            col_mask = np.zeros(C, bool)
            cols = rng.choice(C, n_valid_cols, replace=False)
            col_mask[cols] = True
            r2c = np.asarray(matching_forced(
                jnp.asarray(c), jnp.asarray(row_mask),
                jnp.asarray(col_mask)))
            sub = c[:, cols]
            rr, cc = linear_sum_assignment(sub)
            want_cost = sub[rr, cc].sum()
            got = [(i, j) for i, j in enumerate(r2c) if j >= 0]
            assert len(got) == min(R, n_valid_cols)
            assert all(col_mask[j] for _, j in got)
            got_cost = sum(c[i, j] for i, j in got)
            np.testing.assert_allclose(got_cost, want_cost, rtol=1e-6)

    @pytest.mark.parametrize("n_valid_cols", [2, 4, 9])
    def test_limit_rect_vs_oracle(self, n_valid_cols):
        rng = np.random.default_rng(100 + n_valid_cols)
        R, C = 4, 12
        for trial in range(10):
            c = rng.uniform(0, 1, size=(R, C))
            limit = float(rng.uniform(0.3, 0.9))
            row_mask = np.ones(R, bool)
            col_mask = np.zeros(C, bool)
            cols = rng.choice(C, n_valid_cols, replace=False)
            col_mask[cols] = True
            r2c = np.asarray(matching_limit(
                jnp.asarray(c), jnp.asarray(row_mask),
                jnp.asarray(col_mask), limit))
            want = scipy_limit_oracle(c[:, cols], limit)
            got_pairs = {(i, j) for i, j in enumerate(r2c) if j >= 0}
            want_pairs = {(i, cols[j]) for i, j in enumerate(want)
                          if j >= 0}
            assert len(got_pairs) == len(want_pairs)
            got_cost = sum(c[i, j] for i, j in got_pairs)
            want_cost = sum(c[i, j] for i, j in want_pairs)
            np.testing.assert_allclose(got_cost, want_cost, rtol=1e-6)


class TestMatchingLimitTieCases:
    """Adversarial tie suites for the cost-limit lap semantics
    (VERDICT weak #6): matching_limit must agree with the reference's
    lap.lapjv call path (byte_track/matching.py:37-49, emulated by
    refbridge._lapjv on the same extended square construction) on the
    OBJECTIVE of the cost-limit program — #matches and matched-cost sum
    trade off as limit*n_matches - sum (ties may permute pairs)."""

    def _objective(self, cost, r2c, limit):
        m = r2c >= 0
        rows = np.nonzero(m)[0]
        return (int(m.sum()),
                float(limit * m.sum() - cost[rows, r2c[m]].sum()))

    def _check(self, cost, limit, batched=False):
        import sys
        sys.path.insert(0, "tests")
        import refbridge
        import jax

        cost = np.asarray(cost, float)
        R, C = cost.shape
        _, x, _ = refbridge._lapjv(cost.copy(), extend_cost=True,
                                   cost_limit=limit)
        got = np.asarray(jax.jit(
            lambda c: matching_limit(
                c, jnp.ones(R, bool), jnp.ones(C, bool), limit,
                batched=batched))(jnp.asarray(cost)))
        n_ref, obj_ref = self._objective(cost, x, limit)
        n_got, obj_got = self._objective(cost, got, limit)
        assert n_ref == n_got, (cost, x, got)
        assert abs(obj_ref - obj_got) < 1e-9, (cost, x, got)

    @pytest.mark.parametrize("batched", [False, True])
    def test_uniform_block_ties(self, batched):
        # every valid edge identical and below the limit
        self._check(np.full((3, 5), 0.4), 0.8, batched)
        self._check(np.full((4, 4), 0.79999), 0.8, batched)

    @pytest.mark.parametrize("batched", [False, True])
    def test_edges_exactly_at_limit(self, batched):
        # lap's construction: an edge == limit ties exactly with the
        # two-dummy route (limit/2 + limit/2); either resolution has
        # equal objective
        cost = np.array([[0.8, 0.3], [0.5, 0.8]])
        self._check(cost, 0.8, batched)
        self._check(np.full((2, 2), 0.8), 0.8, batched)

    @pytest.mark.parametrize("batched", [False, True])
    def test_duplicate_rows_and_columns(self, batched):
        cost = np.array([[0.1, 0.1, 0.6],
                         [0.1, 0.1, 0.6],
                         [0.6, 0.6, 0.2]])
        self._check(cost, 0.5, batched)

    @pytest.mark.parametrize("batched", [False, True])
    def test_swap_chains(self, batched):
        # a + d == b + c: optimal matching not unique, objective is
        self._check(np.array([[0.1, 0.3], [0.3, 0.5]]), 0.6, batched)
        self._check(np.array([[0.2, 0.4, 0.6],
                              [0.4, 0.6, 0.2],
                              [0.6, 0.2, 0.4]]), 0.65, batched)

    @pytest.mark.parametrize("batched", [False, True])
    def test_randomized_discrete_costs(self, batched):
        # costs drawn from a tiny discrete set -> dense ties
        rng = np.random.default_rng(0)
        for _ in range(25):
            R = rng.integers(1, 6)
            C = rng.integers(1, 6)
            cost = rng.choice([0.1, 0.25, 0.4, 0.55, 0.7],
                              size=(R, C))
            self._check(cost, float(rng.choice([0.3, 0.5, 0.7])),
                        batched)
