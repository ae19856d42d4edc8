/* Sequential convergent ELO sweep — native kernel.
 *
 * Implements the rating-sweep contract of the reference tracker
 * (/root/reference/src/model_comparison/elo_tracker.py:26-44): walk the
 * match list in order, Gauss-Seidel style, for at most `max_passes` passes,
 * stopping when the mean absolute per-update change drops below `tol`.
 * Pure double math via libm pow — bit-identical to the Python/numpy paths.
 *
 * Compiled on demand by compare/elo.py via ctypes (no build step needed);
 * the vectorized numpy wavefront sweep is the fallback.
 */

#include <math.h>
#include <stdint.h>

int64_t elo_sweep(const int64_t *p1, const int64_t *p2, const double *s1,
                  const double *s2, int64_t n_matches, double *ratings,
                  int64_t max_passes, double k, double tol) {
  const double denom = 2.0 * (double)(n_matches > 0 ? n_matches : 1);
  int64_t pass = 0;
  for (; pass < max_passes; ++pass) {
    double total_change = 0.0;
    for (int64_t i = 0; i < n_matches; ++i) {
      const int64_t a = p1[i], b = p2[i];
      const double ra = ratings[a], rb = ratings[b];
      const double ea = 1.0 / (1.0 + pow(10.0, (rb - ra) / 400.0));
      const double da = k * (s1[i] - ea);
      const double db = k * (s2[i] - (1.0 - ea));
      /* Self-match rows (a == b): the reference applies BOTH updates
       * sequentially to the same entry ((r + da) + db); a plain
       * read-before-write pair would drop da. */
      ratings[a] = ra + da;
      ratings[b] = (a == b) ? (ra + da) + db : rb + db;
      total_change += fabs(da) + fabs(db);
    }
    if (total_change / denom < tol) {
      ++pass;
      break;
    }
  }
  return pass;
}
