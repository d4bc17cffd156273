"""Throwaway experiment harness for the fused split-gram Pallas kernel.

Measures compile + steady-state sweep time for kernel variants:
  layout: u32 (32-way lane concat) vs u8 byte view (8-way lane concat)
  dot dtype: int8 vs bfloat16 (f32 accumulation; exact for counts < 2^24)
  tiles: (TI, TJ, words-per-chunk)

Run: python scripts/kernel_experiments.py [n] [L]
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_kernel(ti, tj, wc, *, dtype, layout):
    """Returns (call_fn, prep_fn). prep_fn maps device u32 planes -> kernel
    operand layout; call_fn(ea, na, eb, nb) -> (g, gn)."""

    if layout == "u8":
        n_rep, elem_bits = 8, 8
        wcl = wc * 4  # lanes per chunk in bytes
    else:
        n_rep, elem_bits = 32, 32
        wcl = wc

    log2wcl = wcl.bit_length() - 1
    assert wcl & (wcl - 1) == 0

    def unpack(words):  # [R, wcl] -> [R, wcl*elem_bits] as dtype
        R = words.shape[0]
        tiled = jnp.concatenate([words] * n_rep, axis=1)
        s = jax.lax.broadcasted_iota(jnp.uint32, (R, n_rep * wcl), 1)
        shift = s >> log2wcl
        if layout == "u8":
            # u8 vector shifts/casts are restricted in Mosaic: widen to i32
            t32 = tiled.astype(jnp.int32)
            bits = (t32 >> shift.astype(jnp.int32)) & 1
        else:
            bits = ((tiled >> shift.astype(words.dtype)) & words.dtype.type(1)).astype(
                jnp.int32
            )
        if dtype == jnp.bfloat16:
            # i1-select relayout is broken in this Mosaic; cast arithmetically
            return bits.astype(jnp.float32).astype(jnp.bfloat16)
        return bits.astype(dtype)

    acc_t = jnp.int32 if dtype == jnp.int8 else jnp.float32

    def kern(ea_ref, na_ref, eb_ref, nb_ref, g_ref, gn_ref):
        c = pl.program_id(2)

        @pl.when(c == 0)
        def _():
            g_ref[:, :] = jnp.zeros_like(g_ref)
            gn_ref[:, :] = jnp.zeros_like(gn_ref)

        def dot(ya, yb):
            return jax.lax.dot_general(
                ya, yb, (((1,), (1,)), ((), ())), preferred_element_type=acc_t
            )

        acc = dot(unpack(ea_ref[:, 0, :]), unpack(eb_ref[:, 0, :]))
        acc += dot(unpack(ea_ref[:, 1, :]), unpack(eb_ref[:, 1, :]))
        acc += dot(unpack(ea_ref[:, 2, :]), unpack(eb_ref[:, 2, :]))
        acc += dot(unpack(ea_ref[:, 3, :]), unpack(eb_ref[:, 3, :]))
        gn = dot(unpack(na_ref[:, :]), unpack(nb_ref[:, :]))
        if acc_t == jnp.float32:
            g_ref[:, :] += (acc - gn).astype(jnp.int32)
            gn_ref[:, :] += gn.astype(jnp.int32)
        else:
            g_ref[:, :] += acc - gn
            gn_ref[:, :] += gn

    @functools.partial(jax.jit)
    def call(ea, na, eb, nb):
        ni, nj = ea.shape[0], eb.shape[0]
        W = ea.shape[2]
        grid = (ni // ti, nj // tj, W // wcl)
        return pl.pallas_call(
            kern,
            out_shape=(
                jax.ShapeDtypeStruct((ni, nj), jnp.int32),
                jax.ShapeDtypeStruct((ni, nj), jnp.int32),
            ),
            grid=grid,
            in_specs=[
                pl.BlockSpec((ti, 4, wcl), lambda i, j, c: (i, 0, c)),
                pl.BlockSpec((ti, wcl), lambda i, j, c: (i, c)),
                pl.BlockSpec((tj, 4, wcl), lambda i, j, c: (j, 0, c)),
                pl.BlockSpec((tj, wcl), lambda i, j, c: (j, c)),
            ],
            out_specs=(
                pl.BlockSpec((ti, tj), lambda i, j, c: (i, j)),
                pl.BlockSpec((ti, tj), lambda i, j, c: (i, j)),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")
            ),
        )(ea, na, eb, nb)

    @jax.jit
    def prep(excl, nmask):  # u32 [n,4,W], [n,W] -> kernel layout
        if layout == "u8":
            e = jax.lax.bitcast_convert_type(excl, jnp.uint8)
            e = e.reshape(excl.shape[0], 4, excl.shape[2] * 4)
            m = jax.lax.bitcast_convert_type(nmask, jnp.uint8)
            m = m.reshape(nmask.shape[0], nmask.shape[1] * 4)
            return e, m
        return excl, nmask

    return call, prep


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    sys.path.insert(0, ".")
    import bench

    packed = bench.make_clustered(n, L)
    from tracs_tpu.ops.pairsnp import _cached_split, _split_device

    sa = _cached_split(packed)
    Wpad, ea, nm, _ = _split_device(sa)
    print(f"# n={n} L={L} Wpad={Wpad}", flush=True)

    variants = [
        ("u32-i8-128", dict(ti=128, tj=128, wc=256), jnp.int8, "u32"),
        ("u32-bf16-128", dict(ti=128, tj=128, wc=256), jnp.bfloat16, "u32"),
        ("u8-i8-128", dict(ti=128, tj=128, wc=256), jnp.int8, "u8"),
        ("u32-i8-256", dict(ti=256, tj=256, wc=256), jnp.int8, "u32"),
        ("u32-bf16-256", dict(ti=256, tj=256, wc=256), jnp.bfloat16, "u32"),
    ]
    ref = None
    for name, tiles, dtype, layout in variants:
        try:
            call, prep = make_kernel(**tiles, dtype=dtype, layout=layout)
            with jax.enable_x64(False):
                ka, kn = prep(ea, nm)
                np.asarray(jnp.sum(ka))  # flush upload
                t0 = time.time()
                g, gn = call(ka, kn, ka, kn)
                # block_until_ready does NOT flush through the axon tunnel;
                # only a host transfer gives true wall clock
                np.asarray(g)
                compile_s = time.time() - t0
                times = []
                for _ in range(3):
                    t0 = time.time()
                    g, gn = call(ka, kn, ka, kn)
                    np.asarray(g), np.asarray(gn)
                    times.append(time.time() - t0)
            dt = min(times)
            rate = n * n / dt
            gh = np.asarray(g)
            if ref is None:
                ref = gh
                ok = "ref"
            else:
                ok = "OK" if np.array_equal(gh, ref) else "MISMATCH"
            print(
                f"{name}: compile {compile_s:.1f}s, sweep {dt*1e3:.1f}ms, "
                f"{rate:,.0f} pairs/s [{ok}]",
                flush=True,
            )
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:800]}", flush=True)


if __name__ == "__main__":
    main()
