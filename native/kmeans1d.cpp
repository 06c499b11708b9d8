// Exact (globally optimal) 1-D k-means clustering.
//
// Dynamic program over sorted values with divide-and-conquer
// optimization: D[m][i] = min_j D[m-1][j-1] + SSE(j..i). The optimal
// split j*(i) is nondecreasing in i (the cost matrix is totally
// monotone), so each layer solves in O(n log n). This is the algorithm
// behind the `kmeans1d` package the reference depends on
// (models/ISW/cov_settings.py:4,58) — clusters come out ordered by
// ascending centroid, so label 0 is the lowest-value cluster.
//
// Built as a shared library; see dgvcc_tpu/utils/kmeans1d.py.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

struct Prefix {
    std::vector<double> s, s2;  // s[i] = sum of first i values
    explicit Prefix(const double* v, int64_t n) : s(n + 1, 0.0), s2(n + 1, 0.0) {
        for (int64_t i = 0; i < n; ++i) {
            s[i + 1] = s[i] + v[i];
            s2[i + 1] = s2[i] + v[i] * v[i];
        }
    }
    // SSE of sorted values j..i inclusive around their mean
    double sse(int64_t j, int64_t i) const {
        double su = s[i + 1] - s[j];
        double sq = s2[i + 1] - s2[j];
        double cnt = double(i - j + 1);
        double c = sq - su * su / cnt;
        return c > 0.0 ? c : 0.0;  // clamp fp negatives
    }
};

struct Layer {
    const Prefix* pre;
    const std::vector<double>* prev;  // D[m-1][·], prev[j] = cost of first j points
    std::vector<double>* cur;
    std::vector<int32_t>* arg;
};

// fill cur[mid]/arg[mid] for mid in [lo, hi], optimal split in [optlo, opthi]
void solve(const Layer& L, int64_t lo, int64_t hi, int64_t optlo, int64_t opthi) {
    if (lo > hi) return;
    int64_t mid = lo + (hi - lo) / 2;
    double best = HUGE_VAL;
    int64_t bestj = optlo;
    int64_t jhi = std::min(mid, opthi);
    for (int64_t j = optlo; j <= jhi; ++j) {
        double v = (*L.prev)[j] + L.pre->sse(j, mid);
        if (v < best) {
            best = v;
            bestj = j;
        }
    }
    (*L.cur)[mid] = best;
    (*L.arg)[mid] = int32_t(bestj);
    solve(L, lo, mid - 1, optlo, bestj);
    solve(L, mid + 1, hi, bestj, opthi);
}

}  // namespace

extern "C" {

// v_sorted: n ascending values. Writes labels (n int32, by ascending
// centroid) and centroids (k doubles, ascending). Requires 1 <= k <= n.
void kmeans1d_cluster(const double* v_sorted, int64_t n, int64_t k,
                      int32_t* labels, double* centroids) {
    Prefix pre(v_sorted, n);
    std::vector<double> prev(n), cur(n);
    // arg[m][i]: first index of the cluster ending at i in the (m+1)-cluster solution
    std::vector<std::vector<int32_t>> args(k, std::vector<int32_t>(n, 0));

    for (int64_t i = 0; i < n; ++i) prev[i] = pre.sse(0, i);
    for (int64_t m = 1; m < k; ++m) {
        // shifted view: cost of first j points with m clusters is prev[j-1]
        std::vector<double> head(n + 1, HUGE_VAL);
        for (int64_t j = 1; j <= n; ++j) head[j] = prev[j - 1];
        Layer L{&pre, &head, &cur, &args[m]};
        // i ranges over [m, n-1]; splits j in [m, i]
        solve(L, m, n - 1, m, n - 1);
        for (int64_t i = 0; i < m; ++i) cur[i] = pre.sse(0, i);  // unused
        std::swap(prev, cur);
    }

    // backtrack cluster boundaries
    int64_t i = n - 1;
    for (int64_t m = k - 1; m >= 0; --m) {
        int64_t j = (m == 0) ? 0 : args[m][i];
        double su = pre.s[i + 1] - pre.s[j];
        centroids[m] = su / double(i - j + 1);
        for (int64_t t = j; t <= i; ++t) labels[t] = int32_t(m);
        i = j - 1;
    }
}

}  // extern "C"
