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
