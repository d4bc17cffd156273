"""Attribute the streaming-unit MFU gap (VERDICT r2 item 3).

Measures, at the bench workload (n x 1 Mb, rb row blocks, ~0.5% survivors):

  A. bare achievable dot rate at the sweep's ACTUAL block shapes
     (pre-unpacked int8 operands, chunked exactly like _dense_split) —
     the compiler/MXU envelope, no unpack, no assembly;
  B. sweep-only: snp_distance_split_prefix_device per block (unpack +
     grams + assembly), synced on an 8-byte device reduction;
  C. sweep + fused COO extraction, still device-side sync;
  D. the full streaming unit incl. the survivor download (bench.py's
     number).

Deltas B-A = unpack/assembly cost not hidden by XLA, C-B = extraction,
D-C = host transfer + python.  Run on the real chip:

    python scripts/mfu_breakdown.py [n] [L] [rb]
"""

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INT8_PEAK = 394e12


def sync8(x):
    """Force execution with an 8-byte download (block_until_ready does not
    actually block through the tunnel; see ARCHITECTURE.md)."""
    return float(jnp.sum(x.ravel()[:2].astype(jnp.int64)))


def timeit(fn, iters=3):
    fn()
    t0 = time.time()
    for _ in range(iters):
        fn()
    return (time.time() - t0) / iters


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    rb = int(sys.argv[3]) if len(sys.argv) > 3 else 1024

    from bench import make_clustered
    from tracs_tpu.ops.pairsnp import (
        _dense_split,
        _extract_coo_packed,
        _split_pair,
        pairsnp_stream,
        plan_chunks,
        prefix_col_start,
        schedule_mac_pairs,
        snp_distance_split_prefix_device,
        snp_distance_split_device,
        _slice_split_device,
        _split_device,
    )

    cluster_size = max(6, round(0.005 * n) + 1)
    packed = make_clustered(n, L, cluster_size=cluster_size)
    sa, _ = _split_pair(packed, None)
    Wpad, ea, nm, pt = _split_device(sa)
    out = {"n": n, "L": L, "rb": rb}

    blocks = []
    for r0 in range(0, n, rb):
        r1 = min(n, r0 + rb)
        c0 = prefix_col_start(n, r0) if r0 > 0 else 0
        blocks.append((r0, r1, c0))
    mac_pairs = schedule_mac_pairs(n, rb)
    total_ops = 2.0 * 5 * mac_pairs * L
    out["mac_pairs"] = mac_pairs

    # ---- A: bare dots at the sweep's shapes (no unpack: random int8) ----
    bare_total = 0.0
    for r0, r1, c0 in blocks:
        rows = (r1 - r0) + (n - c0)
        wc, n_chunks = plan_chunks(rows, 5, Wpad)
        k4 = wc * 32 * 4
        kn = wc * 32
        a4 = jnp.ones(((r1 - r0), k4), jnp.int8)
        b4 = jnp.ones((n - c0, k4), jnp.int8)
        an = jnp.ones(((r1 - r0), kn), jnp.int8)
        bn = jnp.ones((n - c0, kn), jnp.int8)

        @jax.jit
        def chain(a4, b4, an, bn, n_chunks=n_chunks):
            acc = jnp.zeros((a4.shape[0], b4.shape[0]), jnp.int32)
            accn = jnp.zeros_like(acc)
            for c in range(n_chunks):
                if c:
                    a4, b4, an, bn, acc, accn = jax.lax.optimization_barrier(
                        (a4, b4, an, bn, acc, accn))
                acc = acc + jax.lax.dot_general(
                    a4, b4, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                accn = accn + jax.lax.dot_general(
                    an, bn, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
            return acc, accn

        dt = timeit(lambda: sync8(chain(a4, b4, an, bn)[0]))
        ops = 2.0 * 5 * (r1 - r0) * (n - c0) * (wc * 32 * n_chunks)
        bare_total += dt
        print(f"# bare block [{r0},{r1})x[{c0},{n}): {dt*1e3:.1f} ms, "
              f"{ops/dt/1e12:.0f} TOPS", file=sys.stderr)
    out["bare_dots_s"] = round(bare_total, 4)
    out["bare_tops"] = round(total_ops / bare_total / 1e12, 1)

    # ---- B: real sweep (unpack + grams + assemble), device-synced ----
    def sweep_only():
        t = 0.0
        for r0, r1, c0 in blocks:
            if r0 == 0 and r1 == n:
                D, NN = snp_distance_split_device(sa, sa)
            elif r0 == 0:
                D, NN = snp_distance_split_device(
                    _slice_split_device(sa, 0, r1), sa)
            else:
                D, NN, _ = snp_distance_split_prefix_device(sa, r0, r1)
            t += sync8(D)
        return t

    dt_b = timeit(sweep_only)
    out["sweep_s"] = round(dt_b, 4)
    out["sweep_tops"] = round(total_ops / dt_b / 1e12, 1)

    # ---- C: sweep + fused extraction, device-synced ----
    def sweep_extract():
        t = 0.0
        for r0, r1, c0 in blocks:
            if r0 == 0:
                D, NN = snp_distance_split_device(
                    sa if r1 == n else _slice_split_device(sa, 0, r1), sa)
            else:
                D, NN, c0 = snp_distance_split_prefix_device(sa, r0, r1)
            pk = _extract_coo_packed(
                D, NN, jnp.int32(200), jnp.int32(r0), jnp.int32(n),
                jnp.int32(c0), capacity=1 << 14, triangle=True, with_nn=True)
            t += sync8(pk)
        return t

    dt_c = timeit(sweep_extract)
    out["sweep_extract_s"] = round(dt_c, 4)

    # ---- D: the full unit (bench flow incl. survivor download) ----
    def full():
        tot = 0
        for _r0, _r1, _nm, rows, *_ in pairsnp_stream(
                [packed], dist=200, compact=False, row_block=rb):
            tot += len(rows)
        return tot

    dt_d = timeit(full)
    out["full_unit_s"] = round(dt_d, 4)
    out["full_mfu"] = round(total_ops / dt_d / INT8_PEAK, 4)
    out["pairs_per_s"] = round(n * n / dt_d, 0)

    print(f"# A bare dots      {out['bare_dots_s']}s ({out['bare_tops']} TOPS envelope)",
          file=sys.stderr)
    print(f"# B sweep          {out['sweep_s']}s ({out['sweep_tops']} TOPS)",
          file=sys.stderr)
    print(f"# C sweep+extract  {out['sweep_extract_s']}s "
          f"(+{(dt_c-dt_b)*1e3:.0f} ms extraction)", file=sys.stderr)
    print(f"# D full unit      {out['full_unit_s']}s "
          f"(+{(dt_d-dt_c)*1e3:.0f} ms transfer+host)  "
          f"MFU {100*out['full_mfu']:.1f}%", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
