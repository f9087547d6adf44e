"""Pallas JV kernel (interpreter mode) vs the lax solver and scipy."""
import numpy as np
import jax.numpy as jnp
import pytest
from scipy.optimize import linear_sum_assignment

from tracklab_tpu.ops.assignment_pallas import solve_square_pallas


@pytest.mark.parametrize("k", [4, 16, 33])
def test_matches_scipy(k):
    rng = np.random.default_rng(k)
    for _ in range(3):
        c = rng.normal(size=(k, k)).astype(np.float32)
        col2row = np.asarray(solve_square_pallas(jnp.asarray(c),
                                                 interpret=True))
        assert sorted(col2row) == list(range(k))
        got = c[col2row, np.arange(k)].sum()
        r, cc = linear_sum_assignment(c)
        np.testing.assert_allclose(got, c[r, cc].sum(), rtol=1e-5)


def test_tie_heavy_structure():
    # the matching_forced absorbing structure: uniform blocks
    k = 16
    c = np.zeros((k, k), np.float32)
    c[:5, :4] = -2.0
    col2row = np.asarray(solve_square_pallas(jnp.asarray(c),
                                             interpret=True))
    got = c[col2row, np.arange(k)].sum()
    r, cc = linear_sum_assignment(c)
    np.testing.assert_allclose(got, c[r, cc].sum(), atol=1e-6)


def _rect_objective(c, col2row):
    R = c.shape[0]
    rows = col2row[col2row < R]
    assert len(set(rows.tolist())) == len(rows)  # distinct columns
    cols = np.nonzero(col2row < R)[0]
    return len(rows), c[rows, cols].sum()


@pytest.mark.parametrize("shape", [(4, 9), (8, 16), (16, 16), (13, 40)])
def test_rect_batched_matches_scipy(shape):
    from tracklab_tpu.ops.assignment_pallas import solve_rect_batched_pallas

    R, C = shape
    rng = np.random.default_rng(R * 100 + C)
    V = 5
    c = rng.normal(size=(V, R, C)).astype(np.float32)
    out = np.asarray(solve_rect_batched_pallas(jnp.asarray(c),
                                               interpret=True))
    assert out.shape == (V, C)
    for v in range(V):
        n, got = _rect_objective(c[v], out[v])
        assert n == R  # all rows assigned (R <= C)
        rr, cc = linear_sum_assignment(c[v])
        np.testing.assert_allclose(got, c[v][rr, cc].sum(), rtol=1e-5,
                                   atol=1e-5)


def test_rect_batched_tie_heavy():
    from tracklab_tpu.ops.assignment_pallas import solve_rect_batched_pallas

    R, C = 6, 20
    c = np.zeros((2, R, C), np.float32)
    c[0, :4, :3] = -2.0       # absorbing block with ties
    c[1, :, :] = 1.0          # fully degenerate
    out = np.asarray(solve_rect_batched_pallas(jnp.asarray(c),
                                               interpret=True))
    for v in range(2):
        n, got = _rect_objective(c[v], out[v])
        assert n == R
        rr, cc = linear_sum_assignment(c[v])
        np.testing.assert_allclose(got, c[v][rr, cc].sum(), atol=1e-6)


@pytest.mark.parametrize("shape", [(3, 7), (8, 8), (12, 30)])
def test_rect_lax_matches_scipy(shape):
    from tracklab_tpu.ops.assignment import _solve_rect_lax

    R, C = shape
    rng = np.random.default_rng(R + C)
    for _ in range(5):
        c = rng.normal(size=(R, C))
        out = np.asarray(_solve_rect_lax(jnp.asarray(c)))
        n, got = _rect_objective(c, out)
        assert n == R
        rr, cc = linear_sum_assignment(c)
        np.testing.assert_allclose(got, c[rr, cc].sum(), rtol=1e-9)
