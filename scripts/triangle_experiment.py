"""Measure the prefix-triangle schedule of the self all-pairs sweep.

The streamed self-sweep used to compute every row block against ALL n
columns and discard the lower triangle at extraction — at row_block << n
half the MACs were wasted.  A triangle row block [r0, r1) only needs the
column suffix [r0, n); this script measures the schedules on the attached
chip:

  A. one-shot full-square ``same=True`` sweep (dot(x, x), one unpack);
  B. production prefix blocks (two-operand ``_dense_split`` on row-block x
     column-suffix device slices — ops/pairsnp.snp_distance_split_prefix_device).

Measured on TPU v5e, n=2048, L=1 Mb, grams only (scalar-sync):
  one-shot same=True            158.3 ms   (n^2 MACs, 67% int8 book peak)
  prefix rb=1024, two-operand   142.7 ms   (0.75 n^2 MACs)
  prefix rb=1024, dot(x[:rb],x) 147.6 ms   (slice-of-unpacked variant:
        the sliced operand defeats XLA's unpack CSE and rematerialises,
        so explicit two-operand unpack wins despite more unpack bytes)
A manually software-pipelined chunk loop (unpack c+1 scheduled with
dot(c) in one barrier region) measured 193-206 ms — XLA's own latency
hiding beats it; keep the serialised-chunk structure.

Run: python scripts/triangle_experiment.py [n] [L] [rb1,rb2,...]
"""

import sys
import time

import numpy as np
import jax.numpy as jnp


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    sys.path.insert(0, ".")
    import bench
    from tracs_tpu.ops.pairsnp import (
        _cached_split,
        _dense_split,
        _split_device,
        plan_chunks,
        snp_distance_split_prefix_device,
    )

    packed = bench.make_clustered(n, L)
    sa = _cached_split(packed)
    Wpad, ea, nm, _ = _split_device(sa)
    print(f"# n={n} L={L} Wpad={Wpad}", flush=True)

    def timeit(fn, iters=3):
        fn()  # compile
        times = []
        for _ in range(iters):
            t0 = time.time()
            out = np.asarray(fn())
            times.append(time.time() - t0)
        return min(times), out

    # -- baseline: current one-shot full-square same=True sweep
    wc, n_chunks = plan_chunks(n, 5, Wpad)

    def full_sweep():
        m, gn = _dense_split(ea, nm, ea, nm, wc=wc, n_chunks=n_chunks, same=True)
        return jnp.sum(m, dtype=jnp.int64) + jnp.sum(gn, dtype=jnp.int64)

    dt, _ = timeit(full_sweep)
    print(
        f"full-square one-shot: sweep {dt*1e3:.1f}ms, "
        f"{n*n/dt:,.0f} sq-pairs/s  useful {n*(n-1)/2/dt:,.0f} tri-pairs/s",
        flush=True,
    )

    # exact reference for correctness checks: the one-shot production D/NN
    from tracs_tpu.ops.pairsnp import snp_distance_split_device

    D_ref, NN_ref = (
        np.asarray(x) for x in snp_distance_split_device(sa, with_nn=True)
    )

    rbs = [int(x) for x in sys.argv[3].split(",")] if len(sys.argv) > 3 else [
        n // 2, n // 4]
    for rb in rbs:
        def tri_sweep():
            tot = jnp.zeros((), jnp.int64)
            for r0 in range(0, n, rb):
                D, NN, _c0 = snp_distance_split_prefix_device(
                    sa, r0, min(n, r0 + rb)
                )
                tot = tot + jnp.sum(D, dtype=jnp.int64) + jnp.sum(
                    NN, dtype=jnp.int64
                )
            return tot

        dt, _ = timeit(tri_sweep)
        ok = "OK"
        for r0 in range(0, n, rb):
            r1 = min(n, r0 + rb)
            D, NN, c0 = snp_distance_split_prefix_device(sa, r0, r1)
            if not (
                np.array_equal(np.asarray(D)[:, r0 - c0:], D_ref[r0:r1, r0:])
                and np.array_equal(np.asarray(NN)[:, r0 - c0:], NN_ref[r0:r1, r0:])
            ):
                ok = "MISMATCH"
        print(
            f"prefix-triangle rb={rb}: sweep {dt*1e3:.1f}ms, "
            f"useful {n*(n-1)/2/dt:,.0f} tri-pairs/s [{ok}]",
            flush=True,
        )


if __name__ == "__main__":
    main()
