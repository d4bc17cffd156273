// Differential-test driver: compiles the REFERENCE transcluster kernel
// (read-only, included by absolute path — not vendored) and prints
// trans_dist results for stdin-supplied pairs, so the JAX engine can be
// bit-compared against the original C++ on arbitrary inputs.
//
// Input:  first line "lamb beta precision", then lines "N delta" until EOF.
// Output: per pair, "p0 eK" at %.17g.

#include <cstdio>
#include <map>
#include <string>
#include <tuple>
#include <unordered_map>
#include <vector>

#include REFERENCE_TRANSCLUSTER_HPP

int main() {
  double lamb, beta, precision;
  if (scanf("%lf %lf %lf", &lamb, &beta, &precision) != 3) return 1;
  std::vector<int> snp;
  std::vector<double> dates;
  int n;
  double d;
  while (scanf("%d %lf", &n, &d) == 2) {
    snp.push_back(n);
    dates.push_back(d);
  }
  auto result = trans_dist(snp, dates, lamb, beta, precision);
  const auto& p0 = std::get<0>(result);
  const auto& eK = std::get<1>(result);
  for (size_t i = 0; i < p0.size(); i++) {
    printf("%.17g %.17g\n", p0[i], eK[i]);
  }
  return 0;
}
