// Minimal stand-in for boost::math::binomial_distribution + cdf, backed by
// a log-space direct sum (exact enough at the reference's n <= 10001 window
// spans: agrees with scipy.stats.binom.cdf to ~1e-14).  Differential-test
// scaffolding only — NOT part of the framework.
#pragma once

#include <algorithm>
#include <cmath>

namespace boost {
namespace math {

template <typename T = double>
class binomial_distribution {
 public:
  binomial_distribution(T n, T p) : n_(n), p_(p) {}
  T trials() const { return n_; }
  T success_fraction() const { return p_; }

 private:
  T n_, p_;
};

template <typename T, typename K>
inline T cdf(const binomial_distribution<T>& d, K k) {
  const double n = static_cast<double>(d.trials());
  const double p = static_cast<double>(d.success_fraction());
  const double kk = std::floor(static_cast<double>(k));
  if (kk < 0) return T(0);
  if (kk >= n) return T(1);
  if (p <= 0) return T(1);
  if (p >= 1) return T(kk >= n ? 1 : 0);
  const double lp = std::log(p), lq = std::log1p(-p);
  double acc = 0.0;
  for (long i = 0; i <= static_cast<long>(kk); ++i) {
    double lpmf = std::lgamma(n + 1) - std::lgamma(i + 1) -
                  std::lgamma(n - i + 1) + i * lp + (n - i) * lq;
    acc += std::exp(lpmf);
  }
  return T(std::min(acc, 1.0));
}

}  // namespace math
}  // namespace boost
