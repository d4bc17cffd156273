"""North-star-scale streaming benchmark: all-pairs over 10k+ samples.

Runs the streaming all-pairs driver (ops/pairsnp.pairsnp_stream: row-blocked
split-decomposition sweeps, sparse COO emission under a distance threshold,
resumable by row cursor) at a sample count that exceeds what a dense one-shot
matrix run should hold, and reports sustained pairs/s plus per-phase timing.

  python scripts/stream_bench.py --n 10000 --L 100000 --dist 500

Also exercises the resume path: the run is stopped after the first half of
the row blocks and restarted from the cursor, and the two emission streams
must concatenate to exactly the one-shot stream.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from bench import make_clustered as _make_packed  # noqa: E402


def run_stream(packed, dist, row_block, start_row=0, stop_after=None):
    from tracs_tpu.ops.pairsnp import pairsnp_stream

    blocks = []
    t_first = None
    t0 = time.time()
    emitted = 0
    last_r1 = start_row
    for r0, r1, names, rows, cols, dvals, filt, nn in pairsnp_stream(
        [packed], dist=dist, row_block=row_block, start_row=start_row
    ):
        if t_first is None:
            t_first = time.time() - t0  # includes compile + upload
        emitted += len(rows)
        blocks.append((rows, cols, dvals, nn))
        last_r1 = r1
        if stop_after is not None and r1 >= stop_after:
            break
    return blocks, emitted, last_r1, t_first, time.time() - t0


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=10000)
    ap.add_argument("--L", type=int, default=100_000)
    ap.add_argument("--dist", type=int, default=500)
    ap.add_argument("--row-block", type=int, default=2048)
    ap.add_argument("--check-resume", action="store_true")
    args = ap.parse_args()

    t0 = time.time()
    packed = _make_packed(args.n, args.L)
    print(f"# generated {args.n} x {args.L/1e3:.0f}kb in {time.time()-t0:.1f}s",
          file=sys.stderr)

    blocks, emitted, _, t_first, t_total = run_stream(
        packed, args.dist, args.row_block
    )
    n_pairs = args.n * (args.n - 1) // 2
    steady = t_total - t_first  # first block carries compile + upload
    n_blocks = -(-args.n // args.row_block)
    steady_pairs = n_pairs * (1 - 1 / max(n_blocks, 1))
    print(
        f"# first block (incl. compile+upload): {t_first:.1f}s; "
        f"total {t_total:.1f}s; emitted {emitted} pairs <= d{args.dist}",
        file=sys.stderr,
    )
    rate = n_pairs / t_total
    steady_rate = steady_pairs / steady if steady > 0 else rate
    print(f"# sustained: {rate:,.0f} pairs/s (steady-state {steady_rate:,.0f})",
          file=sys.stderr)

    if args.check_resume:
        half = (args.n // (2 * args.row_block)) * args.row_block
        b1, e1, cursor, _, _ = run_stream(
            packed, args.dist, args.row_block, stop_after=half
        )
        b2, e2, _, _, _ = run_stream(
            packed, args.dist, args.row_block, start_row=cursor
        )
        got = [np.concatenate([b[i] for b in b1 + b2]) for i in range(3)]
        want = [np.concatenate([b[i] for b in blocks]) for i in range(3)]
        same = all(np.array_equal(g, w) for g, w in zip(got, want))
        print(f"# resume check (cursor={cursor}): {'OK' if same else 'MISMATCH'}",
              file=sys.stderr)
        if not same:
            sys.exit(1)

    print(
        json.dumps(
            {
                "n": args.n,
                "L": args.L,
                "dist": args.dist,
                "pairs_per_s": round(rate, 1),
                "steady_pairs_per_s": round(steady_rate, 1),
                "emitted": int(emitted),
            }
        )
    )


if __name__ == "__main__":
    main()
