"""Per-sweep A/B probe for the BENCH_r04 collapse diagnosis.

Runs the EXACT bench workload (bench.make_clustered -> pairsnp_stream,
row_block=1024) in whatever source tree it is launched from, printing the
warmup and each sweep's wall time with absolute timestamps.  Launched
sequentially in one session against the round-3 / round-4 / round-5 trees
(git worktrees of 584f2cc / 65bc439 / HEAD) to separate code from link
weather: the same chip, the same hour, three code states.

Usage: python scripts/ab_probe.py [n] [sweeps]   (defaults 1024, 4)
"""

import os
import sys
import time

sys.path.insert(0, os.getcwd())  # the tree this is launched from


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    sweeps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    from bench import make_clustered

    packed = make_clustered(n, 1_000_000, cluster_size=max(6, round(0.005 * n) + 1))
    from tracs_tpu.ops.pairsnp import pairsnp_stream

    def consume():
        pairs = 0
        for _r0, _r1, _names, rows, _c, _d, _f, _nn in pairsnp_stream(
            [packed], dist=200, compact=False, row_block=1024
        ):
            pairs += len(rows)
        return pairs

    t0 = time.time()
    survivors = consume()
    print(
        f"warmup @{time.strftime('%H:%M:%S')}: {time.time() - t0:.1f}s "
        f"({survivors} survivors)",
        flush=True,
    )
    for k in range(sweeps):
        t0 = time.time()
        consume()
        print(
            f"sweep {k} @{time.strftime('%H:%M:%S')}: {time.time() - t0:.3f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
