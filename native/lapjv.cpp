// Jonker-Volgenant linear assignment (shortest augmenting path), C++.
//
// Native replacement for the reference's `lap` C++ dependency
// (SURVEY §2.6): the evaluation stack solves one LSA per frame per
// sequence (HOTA matching, CLEAR carry-over matching, IDF1 global
// mapping), which dominates host-side eval time on long videos. The
// device-side trackers use the JAX solver (tracklab_tpu/ops/assignment.py);
// this one serves host numpy callers through ctypes
// (tracklab_tpu/native/__init__.py) with a scipy fallback.
//
// solve(): square-matrix exact min-cost perfect matching, O(n^3) worst
// case. Rectangular problems are padded by the Python wrapper.

#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

extern "C" {

// cost: n*n row-major float64; row2col out: n int32
// returns 0 on success
int lapjv_square(const double* cost, int32_t n, int32_t* row2col) {
    const double INF = std::numeric_limits<double>::infinity();
    // potentials and assignment, 1-based virtual column at index n
    std::vector<double> u(n + 1, 0.0), v(n + 1, 0.0);
    std::vector<int32_t> p(n + 1, -1);  // col -> row
    std::vector<double> minv(n + 1);
    std::vector<int32_t> way(n + 1);
    std::vector<char> used(n + 1);

    for (int32_t i = 0; i < n; ++i) {
        p[n] = i;
        int32_t j0 = n;
        std::fill(minv.begin(), minv.end(), INF);
        std::fill(used.begin(), used.end(), 0);
        do {
            used[j0] = 1;
            int32_t i0 = p[j0], j1 = -1;
            double delta = INF;
            const double* row = cost + static_cast<int64_t>(i0) * n;
            double ui = u[i0];
            for (int32_t j = 0; j < n; ++j) {
                if (used[j]) continue;
                double cur = row[j] - ui - v[j];
                if (cur < minv[j]) { minv[j] = cur; way[j] = j0; }
                if (minv[j] < delta) { delta = minv[j]; j1 = j; }
            }
            if (j1 < 0) return 1;  // infeasible (shouldn't happen, finite)
            for (int32_t j = 0; j <= n; ++j) {
                if (used[j]) { u[p[j]] += delta; v[j] -= delta; }
                else { minv[j] -= delta; }
            }
            j0 = j1;
        } while (p[j0] != -1);
        // augment along the alternating path
        do {
            int32_t j1 = way[j0];
            p[j0] = p[j1];
            j0 = j1;
        } while (j0 != n);
    }
    for (int32_t j = 0; j < n; ++j)
        if (p[j] >= 0) row2col[p[j]] = j;
    return 0;
}

// batched variant: B problems of identical size n
int lapjv_batch(const double* cost, int32_t b, int32_t n,
                int32_t* row2col) {
    for (int32_t k = 0; k < b; ++k) {
        int rc = lapjv_square(cost + static_cast<int64_t>(k) * n * n, n,
                              row2col + static_cast<int64_t>(k) * n);
        if (rc != 0) return rc;
    }
    return 0;
}

}  // extern "C"
