"""Quiet transcluster microbench (VERDICT r4 item 8): pin the E(K)/p0
engine's rate on the north-star (N, delta) mix with clean, repeated
timings, so in-run numbers (which ride on link weather and host load)
have a committed reference.

The workload is the EXACT north-star distance mix when
``_northstar/dists.csv`` exists (its SNP-distance and date-difference
columns), else a synthetic reconstruction of the same distribution
(N ~ cluster pair distances in [10, 160], delta uniform over 10 years —
scripts/northstar.py prep's date model).  Timed through
``TransClusterCache.lookup`` — the unique-(N, delta) tabulating engine the
distance stage runs (models/transcluster.py) — on the CPU x64 backend
where it executes in production.

Usage: python scripts/transcluster_bench.py [csv] [repeats]
Prints one JSON line; run on a quiet host.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_mix(csv_path):
    if csv_path and os.path.exists(csv_path):
        snp, dd = [], []
        with open(csv_path) as fh:
            next(fh)
            for line in fh:
                parts = line.split(",")
                dd.append(float(parts[2]))
                snp.append(int(parts[3]))
        return np.asarray(snp), np.asarray(dd), f"north-star csv ({csv_path})"
    rng = np.random.default_rng(11)
    n = 250_000
    snp = rng.integers(10, 161, size=n)
    dd = np.abs(
        rng.integers(0, 3650, size=n) - rng.integers(0, 3650, size=n)
    ) / 365.25
    return snp, dd, "synthetic reconstruction (n=250k, N~U[10,160], dates 10y)"


def main():
    csv = sys.argv[1] if len(sys.argv) > 1 else "_northstar/dists.csv"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from tracs_tpu.models.transcluster import TransClusterCache

    snp, dd, source = load_mix(csv)
    uniq = len({(int(a), round(float(b), 12)) for a, b in zip(snp, dd)})
    print(f"# mix: {len(snp)} rows, {uniq} unique (N, delta) — {source}",
          file=sys.stderr)

    times = []
    for r in range(repeats):
        cache = TransClusterCache(1e-3 * 29903, 73.0, 0.01)  # CLI defaults
        t0 = time.time()
        p0, eK = cache.lookup(snp, dd)
        np.asarray(p0).sum(), np.asarray(eK).sum()  # force materialisation
        times.append(time.time() - t0)
        print(f"# run {r} (cold cache): {times[-1]:.2f}s", file=sys.stderr)
    warm = None
    t0 = time.time()
    cache.lookup(snp, dd)  # all-memoised repeat
    warm = time.time() - t0
    med = float(np.median(times))
    print(json.dumps({
        "metric": "transcluster E(K)+p0 rate, north-star mix",
        "rows": len(snp), "unique": uniq,
        "cold_s": [round(t, 2) for t in times],
        "cold_s_median": round(med, 2),
        "unique_per_s": round(uniq / med, 0),
        "rows_per_s_warm_memo": round(len(snp) / warm, 0),
    }))


if __name__ == "__main__":
    main()
