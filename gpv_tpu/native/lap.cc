// Jonker-Volgonant style shortest-augmenting-path LSAP solver (C++).
//
// Role in the framework: the Hungarian matcher runs ON DEVICE inside the
// jitted train step (gpv_tpu/ops/matcher.py). This native solver is the
// host-side runtime counterpart: (a) a fast fallback for host-driven
// matching via jax.pure_callback when a model needs dynamic target counts,
// and (b) an independent oracle the JAX solver is tested against
// (replacing the reference's scipy.optimize.linear_sum_assignment,
// utils/matcher.py:76).
//
// Build: see gpv_tpu/native/build.py (g++ -O3 -shared -fPIC).
//
// Exposed C ABI:
//   solve_lsap(cost, n_rows, n_cols, col4row)   // one matrix, row-major
//   solve_lsap_batch(cost, batch, n_rows, n_cols, col4row)

#include <cmath>
#include <cstdint>
#include <limits>
#include <vector>

namespace {

constexpr double kInf = std::numeric_limits<double>::infinity();

// Solve min-cost assignment for an n_rows x n_cols matrix, n_rows <= n_cols.
// Writes the assigned column of each row into col4row.
int solve_one(const float* cost, int n_rows, int n_cols, int32_t* col4row) {
  if (n_rows > n_cols) return -1;
  std::vector<double> u(n_rows, 0.0), v(n_cols, 0.0);
  std::vector<double> shortest(n_cols);
  std::vector<int32_t> path(n_cols), row4col(n_cols, -1);
  std::vector<int32_t> c4r(n_rows, -1);
  std::vector<bool> sr(n_rows), sc(n_cols);

  for (int cur_row = 0; cur_row < n_rows; ++cur_row) {
    std::fill(shortest.begin(), shortest.end(), kInf);
    std::fill(path.begin(), path.end(), -1);
    std::fill(sr.begin(), sr.end(), false);
    std::fill(sc.begin(), sc.end(), false);

    double min_val = 0.0;
    int i = cur_row;
    int sink = -1;
    while (sink == -1) {
      sr[i] = true;
      int best_j = -1;
      double best = kInf;
      const float* row = cost + static_cast<size_t>(i) * n_cols;
      for (int j = 0; j < n_cols; ++j) {
        if (sc[j]) continue;
        double r = min_val + row[j] - u[i] - v[j];
        if (r < shortest[j]) {
          shortest[j] = r;
          path[j] = i;
        }
        if (shortest[j] < best ||
            (shortest[j] == best && row4col[j] == -1)) {
          best = shortest[j];
          best_j = j;
        }
      }
      if (best_j < 0 || best == kInf) return -2;  // infeasible
      min_val = best;
      sc[best_j] = true;
      if (row4col[best_j] == -1) {
        sink = best_j;
      } else {
        i = row4col[best_j];
      }
    }

    u[cur_row] += min_val;
    for (int r = 0; r < n_rows; ++r) {
      if (sr[r] && r != cur_row) u[r] += min_val - shortest[c4r[r]];
    }
    for (int j = 0; j < n_cols; ++j) {
      if (sc[j]) v[j] -= min_val - shortest[j];
    }

    int j = sink;
    while (true) {
      int pi = path[j];
      row4col[j] = pi;
      int next_j = c4r[pi];
      c4r[pi] = j;
      if (pi == cur_row) break;
      j = next_j;
    }
  }
  for (int r = 0; r < n_rows; ++r) col4row[r] = c4r[r];
  return 0;
}

}  // namespace

extern "C" {

int solve_lsap(const float* cost, int n_rows, int n_cols, int32_t* col4row) {
  return solve_one(cost, n_rows, n_cols, col4row);
}

int solve_lsap_batch(const float* cost, int batch, int n_rows, int n_cols,
                     int32_t* col4row) {
  for (int b = 0; b < batch; ++b) {
    int rc = solve_one(cost + static_cast<size_t>(b) * n_rows * n_cols,
                       n_rows, n_cols,
                       col4row + static_cast<size_t>(b) * n_rows);
    if (rc != 0) return rc;
  }
  return 0;
}

}  // extern "C"
