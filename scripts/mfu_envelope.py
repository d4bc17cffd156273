"""Achievable-dot envelope + MFU levers (VERDICT r3 item 2).

Three measurements at the production sweep's chunking, all on
pre-unpacked operands (no bit-unpack: this is the compiler/MXU envelope
the sweep is chasing):

  A. bare chunked int8 two-gram rate over an (M rows, N cols) grid —
     incl. 8192/10000-wide outputs, and tall-M variants that test whether
     fattening the row block rescues narrow-suffix dots;
  B. the same dot with int4 operands (halves operand bytes — the unpack
     residual — IF Mosaic keeps them packed);
  C. paired blocks: a wide block and a narrow block dispatched in ONE jit
     program, the narrow operand sliced from the wide unpack, vs the two
     separate dispatches.

Run on the real chip:  python scripts/mfu_envelope.py [L]
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

INT8_PEAK = 394e12


def sync8(x):
    return float(jnp.sum(x.ravel()[:2].astype(jnp.int64)))


def timeit(fn, iters=3):
    fn()
    t0 = time.time()
    for _ in range(iters):
        fn()
    return (time.time() - t0) / iters


def chunk_plan(rows, W):
    from tracs_tpu.ops.pairsnp import plan_chunks

    return plan_chunks(rows, 5, W)


def two_gram(a4, b4, an, bn, n_chunks, k4c, knc):
    """Production-shaped chunked two-gram: 4-channel dot + N-mask dot per
    chunk, optimization_barrier between chunks."""
    acc = jnp.zeros((a4.shape[0], b4.shape[0]), jnp.int32)
    accn = jnp.zeros_like(acc)
    for c in range(n_chunks):
        if c:
            a4, b4, an, bn, acc, accn = jax.lax.optimization_barrier(
                (a4, b4, an, bn, acc, accn))
        a4c = jax.lax.slice_in_dim(a4, c * k4c, min((c + 1) * k4c, a4.shape[1]), axis=1)
        b4c = jax.lax.slice_in_dim(b4, c * k4c, min((c + 1) * k4c, b4.shape[1]), axis=1)
        anc = jax.lax.slice_in_dim(an, c * knc, min((c + 1) * knc, an.shape[1]), axis=1)
        bnc = jax.lax.slice_in_dim(bn, c * knc, min((c + 1) * knc, bn.shape[1]), axis=1)
        gn = jax.lax.dot_general(anc, bnc, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        acc = acc + jax.lax.dot_general(a4c, b4c, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.int32) - gn
        accn = accn + gn
    return acc, accn


def bench_dot(M, N, W, dtype=jnp.int8):
    wc, n_chunks = chunk_plan(M + N, W)
    k4c, knc = wc * 32 * 4, wc * 32
    k4, kn = k4c * n_chunks, knc * n_chunks
    a4 = jnp.ones((M, k4), dtype)
    b4 = jnp.ones((N, k4), dtype)
    an = jnp.ones((M, kn), dtype)
    bn = jnp.ones((N, kn), dtype)
    fn = jax.jit(lambda a, b, c, d: two_gram(a, b, c, d, n_chunks, k4c, knc)[0])
    dt = timeit(lambda: sync8(fn(a4, b4, an, bn)))
    ops = 2.0 * 5 * M * N * (wc * 32 * n_chunks)
    return dt, ops / dt / 1e12


def bench_paired(M, N_wide, N_narrow, W):
    """One jit program computing [M, N_wide] and [M, N_narrow] grams, the
    narrow operands sliced from the wide ones (column prefix), vs two
    separate dispatches at the same shapes."""
    wc, n_chunks = chunk_plan(2 * M + N_wide, W)
    k4c, knc = wc * 32 * 4, wc * 32
    k4, kn = k4c * n_chunks, knc * n_chunks
    a4 = jnp.ones((M, k4), jnp.int8)
    b4 = jnp.ones((N_wide, k4), jnp.int8)
    a4b = jnp.ones((M, k4), jnp.int8)
    an = jnp.ones((M, kn), jnp.int8)
    bn = jnp.ones((N_wide, kn), jnp.int8)
    anb = jnp.ones((M, kn), jnp.int8)

    @jax.jit
    def paired(a4, an, a4b, anb, b4, bn):
        accA = jnp.zeros((M, N_wide), jnp.int32)
        accB = jnp.zeros((M, N_narrow), jnp.int32)
        xa4, xan, xb4, xbn = a4, an, b4, bn
        for c in range(n_chunks):
            if c:
                xa4, xan, xb4, xbn, a4b, anb, accA, accB = (
                    jax.lax.optimization_barrier(
                        (xa4, xan, xb4, xbn, a4b, anb, accA, accB)))
            sl = lambda x, kc: jax.lax.slice_in_dim(
                x, c * kc, min((c + 1) * kc, x.shape[1]), axis=1)
            b4c, bnc = sl(xb4, k4c), sl(xbn, knc)
            gnA = jax.lax.dot_general(sl(xan, knc), bnc, (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            accA = accA + jax.lax.dot_general(
                sl(xa4, k4c), b4c, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32) - gnA
            # narrow block reads the column prefix of the SAME operand
            gnB = jax.lax.dot_general(sl(anb, knc), bnc[:N_narrow],
                                      (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            accB = accB + jax.lax.dot_general(
                sl(a4b, k4c), b4c[:N_narrow], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32) - gnB
        return accA, accB

    dt_pair = timeit(lambda: sync8(paired(a4, an, a4b, anb, b4, bn)[0]))
    dt_sep = bench_dot(M, N_wide, W)[0] + bench_dot(M, N_narrow, W)[0]
    ops = 2.0 * 5 * M * (N_wide + N_narrow) * (wc * 32 * n_chunks)
    return dt_pair, dt_sep, ops / dt_pair / 1e12, ops / dt_sep / 1e12


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    W = ((L + 31) // 32 + 255) // 256 * 256
    out = {"L": L}

    print("# A: int8 envelope (M x N grid, production chunking)", file=sys.stderr)
    grid = {}
    for M in (1024, 2048, 4096):
        for N in (1024, 2048, 4096, 8192, 10240):
            # pre-unpacked operands are M*(4L) + N*(4L) int8 bytes; points
            # that cannot fit HBM are recorded as such, not crashed on
            try:
                dt, tops = bench_dot(M, N, W)
            except Exception as e:  # noqa: BLE001 — typically RESOURCE_EXHAUSTED
                grid[f"{M}x{N}"] = f"OOM ({type(e).__name__})"
                print(f"#   {M:5d} x {N:5d}: OOM", file=sys.stderr)
                continue
            grid[f"{M}x{N}"] = round(tops, 1)
            print(f"#   {M:5d} x {N:5d}: {dt*1e3:7.1f} ms  {tops:5.1f} TOPS",
                  file=sys.stderr)
    out["int8_tops"] = grid

    print("# B: int4 operands", file=sys.stderr)
    int4 = {}
    for M, N in ((1024, 4096), (2048, 8192)):
        try:
            dt, tops = bench_dot(M, N, W, dtype=jnp.int4)
            int4[f"{M}x{N}"] = round(tops, 1)
            print(f"#   {M} x {N}: {dt*1e3:.1f} ms  {tops:.1f} TOPS", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            int4[f"{M}x{N}"] = f"unsupported: {type(e).__name__}"
            print(f"#   {M} x {N}: int4 unsupported ({e})", file=sys.stderr)
    out["int4_tops"] = int4

    print("# C: paired wide+narrow blocks vs separate dispatches", file=sys.stderr)
    paired = {}
    for M, NW, NN_ in ((1024, 4096, 1024), (1024, 8192, 2048)):
        dt_p, dt_s, tops_p, tops_s = bench_paired(M, NW, NN_, W)
        paired[f"{M}:{NW}+{NN_}"] = {
            "paired_ms": round(dt_p * 1e3, 1), "separate_ms": round(dt_s * 1e3, 1),
            "paired_tops": round(tops_p, 1), "separate_tops": round(tops_s, 1),
        }
        print(f"#   M={M} {NW}+{NN_}: paired {dt_p*1e3:.1f} ms ({tops_p:.0f} TOPS) "
              f"vs separate {dt_s*1e3:.1f} ms ({tops_s:.0f} TOPS)", file=sys.stderr)
    out["paired"] = paired

    print(json.dumps(out))


if __name__ == "__main__":
    main()
