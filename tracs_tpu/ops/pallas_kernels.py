"""Hand-written Pallas TPU kernels for the pairwise bit-plane reductions.

``pairs_shared_popcount`` — the direct VPU realisation of the reference inner
loop (src/pairsnp.hpp:398-403): for every sample pair, AND the four packed
allele planes, OR the results, popcount, and sum over the genome axis.  The
grid tiles (i-block, j-block, word-chunk) with the word-chunk axis innermost
so each output tile accumulates in place across chunks.

``pairs_union_popcount`` — same structure over a single plane with OR (the
comparable-sites N-mask union, pairsnp.hpp:417-419).

These are exact alternatives to the MXU channel-gram path (ops/pairsnp.py)
and are cross-checked against it in tests; the MXU path is faster at scale
(matmuls win over VPU popcounts per site-pair), so these kernels serve as
an independent implementation for verification, small-problem latency, and
as the template for future fused kernels.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from tracs_tpu.ops.packing import PackedAlignment

# TPU tiling: the output block's last two dims must divide (8, 128), and the
# [TI, TJ, WC] popcount intermediate must fit VMEM (~16MB)
_TI = 32   # i-block rows
_TJ = 128  # j-block rows (output lane dimension)
_WC = 256  # words per chunk (8192 sites): 32*128*256*4B = 4MB intermediate


def _shared_kernel(a_ref, b_ref, out_ref):
    """a_ref [TI, 4, WC], b_ref [TJ, 4, WC] uint32; out_ref [TI, TJ] int32."""
    c = pl.program_id(2)

    @pl.when(c == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    # slice planes from the refs (2D loads; 3D value-indexing lowers to an
    # unsupported gather on Mosaic)
    shared = a_ref[:, 0, :][:, None, :] & b_ref[:, 0, :][None, :, :]
    shared = shared | (a_ref[:, 1, :][:, None, :] & b_ref[:, 1, :][None, :, :])
    shared = shared | (a_ref[:, 2, :][:, None, :] & b_ref[:, 2, :][None, :, :])
    shared = shared | (a_ref[:, 3, :][:, None, :] & b_ref[:, 3, :][None, :, :])
    counts = jax.lax.population_count(shared).astype(jnp.int32)
    # dtype pinned: under jax_enable_x64 a bare sum promotes to int64, which
    # Mosaic does not support
    out_ref[:, :] += jnp.sum(counts, axis=-1, dtype=jnp.int32)


def _union_kernel(a_ref, b_ref, out_ref):
    """a_ref [TI, WC], b_ref [TJ, WC] uint32; out_ref [TI, TJ] int32."""
    c = pl.program_id(2)

    @pl.when(c == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    a = a_ref[:, :]
    b = b_ref[:, :]
    union = a[:, None, :] | b[None, :, :]
    counts = jax.lax.population_count(union).astype(jnp.int32)
    out_ref[:, :] += jnp.sum(counts, axis=-1, dtype=jnp.int32)


def _pad(x, axis, mult):
    size = x.shape[axis]
    target = -(-size // mult) * mult
    if target == size:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - size)
    return np.pad(x, pad)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _shared_call(pa, pb, *, interpret=False):
    na, _, W = pa.shape
    nb = pb.shape[0]
    grid = (na // _TI, nb // _TJ, W // _WC)
    return pl.pallas_call(
        _shared_kernel,
        out_shape=jax.ShapeDtypeStruct((na, nb), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TI, 4, _WC), lambda i, j, c: (i, 0, c)),
            pl.BlockSpec((_TJ, 4, _WC), lambda i, j, c: (j, 0, c)),
        ],
        out_specs=pl.BlockSpec((_TI, _TJ), lambda i, j, c: (i, j)),
        interpret=interpret,
    )(pa, pb)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _union_call(ma, mb, *, interpret=False):
    na, W = ma.shape
    nb = mb.shape[0]
    grid = (na // _TI, nb // _TJ, W // _WC)
    return pl.pallas_call(
        _union_kernel,
        out_shape=jax.ShapeDtypeStruct((na, nb), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TI, _WC), lambda i, j, c: (i, c)),
            pl.BlockSpec((_TJ, _WC), lambda i, j, c: (j, c)),
        ],
        out_specs=pl.BlockSpec((_TI, _TJ), lambda i, j, c: (i, j)),
        interpret=interpret,
    )(ma, mb)


def snp_distance_pallas(
    a: PackedAlignment, b: PackedAlignment | None = None, *, interpret: bool = False
) -> tuple[np.ndarray, np.ndarray]:
    """(D, NN) via the Pallas popcount kernels.  Exact; pads samples to the
    tile size and words to the chunk size (zero padding is neutral: pad
    words share no bits and contribute no N sites)."""
    if b is None:
        b = a
    if a.length != b.length:
        raise ValueError("alignments must share sequence length")
    L = a.length

    # a rows must tile by _TI, b rows by _TJ; when they are the same array,
    # pad to a common multiple
    row_mult = max(_TI, _TJ) if b is a else _TI
    pa = _pad(_pad(a.planes, 0, row_mult), 2, _WC)
    pb = _pad(_pad(b.planes, 0, _TJ), 2, _WC) if b is not a else pa

    # Mosaic rejects the i64 index-map constants produced under
    # jax_enable_x64; everything here is 32-bit anyway
    with jax.enable_x64(False):
        matches = np.asarray(
            _shared_call(jnp.asarray(pa), jnp.asarray(pb), interpret=interpret)
        )
        na, nb = a.n_seqs, b.n_seqs
        nm_a = pa[:, 0] & pa[:, 1] & pa[:, 2] & pa[:, 3]
        nm_b = nm_a if b is a else (pb[:, 0] & pb[:, 1] & pb[:, 2] & pb[:, 3])
        union = np.asarray(
            _union_call(jnp.asarray(nm_a), jnp.asarray(nm_b), interpret=interpret)
        )
    D = (L - matches[:na, :nb]).astype(np.int32)
    NN = (L - union[:na, :nb]).astype(np.int32)
    return D, NN
