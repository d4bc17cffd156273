"""Row-block schedule experiment on the real chip: one upload, then the
full streaming unit timed at several row_block choices (the prefix
schedule's rb trades triangle MACs against dot width — the envelope says
narrow late blocks run far below peak, so bigger rb may now win since the
r5 extraction got cheaper).

Usage: python scripts/rb_experiment.py [n] [L]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    from bench import make_clustered
    from tracs_tpu.ops.pairsnp import pairsnp_stream, schedule_mac_pairs

    packed = make_clustered(n, L, cluster_size=max(6, round(0.005 * n) + 1))

    def consume(rb):
        pairs = 0
        for _r0, _r1, _names, rows, _c, _d, _f, _nn in pairsnp_stream(
            [packed], dist=200, compact=False, row_block=rb
        ):
            pairs += len(rows)
        return pairs

    t0 = time.time()
    consume(1024)  # upload + compile (overlapped)
    print(f"# warm: {time.time() - t0:.1f}s", file=sys.stderr)
    for rb in (512, 1024, 2048, 4096, n):
        if rb > n:
            continue
        consume(rb)  # compile this rb's shapes outside the timing
        times = []
        for _ in range(3):
            t0 = time.time()
            s = consume(rb)
            times.append(time.time() - t0)
        med = float(np.median(times))
        macs = schedule_mac_pairs(n, rb)
        tops = 2.0 * 5 * macs * L / med / 1e12
        print(
            f"rb={rb:5d}: median {med:.3f}s  {n * n / med / 1e6:6.1f}M pairs/s  "
            f"{tops:5.1f} TOPS on executed MACs  (all {[round(t, 3) for t in times]})"
        )


if __name__ == "__main__":
    main()
