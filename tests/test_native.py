"""Native C++ LAPJV vs scipy on random matrices (the reference's own
assignment-backend equivalence test pattern,
plugins/eval/.../motmetrics/tests/test_lap.py)."""
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment as scipy_lsa

from tracklab_tpu.native import linear_sum_assignment, lapjv_available


@pytest.mark.skipif(not lapjv_available(),
                    reason="no C++ toolchain in this environment")
@pytest.mark.parametrize("shape", [(1, 1), (5, 5), (8, 13), (13, 8),
                                   (64, 64), (50, 128)])
def test_matches_scipy_optimal_cost(shape):
    rng = np.random.default_rng(shape[0] * 100 + shape[1])
    for _ in range(10):
        c = rng.normal(size=shape) * 10
        r1, c1 = linear_sum_assignment(c)
        r2, c2 = scipy_lsa(c)
        assert len(r1) == len(r2) == min(shape)
        np.testing.assert_allclose(c[r1, c1].sum(), c[r2, c2].sum(),
                                   rtol=1e-10)


def test_fallback_on_nonfinite():
    c = np.array([[1.0, np.inf], [np.inf, 1.0]])
    r, cc = linear_sum_assignment(c)
    assert c[r, cc].sum() == 2.0


@pytest.mark.skipif(not lapjv_available(),
                    reason="no C++ toolchain in this environment")
def test_native_is_fast():
    import time
    rng = np.random.default_rng(0)
    mats = [rng.normal(size=(128, 128)) for _ in range(50)]
    t0 = time.perf_counter()
    for m in mats:
        linear_sum_assignment(m)
    native_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    for m in mats:
        scipy_lsa(m)
    scipy_t = time.perf_counter() - t0
    # informational bound: native within 5x of scipy (usually faster)
    assert native_t < scipy_t * 5
