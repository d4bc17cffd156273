"""Hand-written Pallas TPU kernels for the pairwise bit-plane reductions.

``split_gram_pallas`` — the production fused kernel for the split
decomposition (see ops/pairsnp.py): each grid step loads one (i-block,
j-block, word-chunk) of PACKED uint32 planes into VMEM, unpacks the bits
in-register, and feeds the MXU directly with int8 0/1 channels.  Fusing the
unpack removes the HBM materialisation of expanded channels that bounds the
XLA path (5 bytes/site/operand there vs 5/32 packed here), so the kernel is
MXU-bound instead of HBM-bound.  Outputs are the signed gram
``g = G4 - Gn`` (exactly `_gram_split_chunk`'s accumulated value) and the
N-mask gram ``gn``.

``pairs_shared_popcount`` — the direct VPU realisation of the reference inner
loop (src/pairsnp.hpp:398-403): for every sample pair, AND the four packed
allele planes, OR the results, popcount, and sum over the genome axis.  The
grid tiles (i-block, j-block, word-chunk) with the word-chunk axis innermost
so each output tile accumulates in place across chunks.

``pairs_union_popcount`` — same structure over a single plane with OR (the
comparable-sites N-mask union, pairsnp.hpp:417-419).

All are exact (integer) alternatives to the XLA channel-gram path
(ops/pairsnp.py) and are bit-compared against it in tests.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


# ---------------------------------------------------------------------------
# Fused split-decomposition gram (unpack-in-VMEM + MXU)
# ---------------------------------------------------------------------------

# 128x128 output tiles match the MXU; 256-word chunks (8192 sites) keep the
# unpacked int8 channels (~1MB/plane/operand) and the uint32 shift
# intermediate (~4MB) inside VMEM while amortising grid-step overheads
_STI = 128
_STJ = 128
_SWC = 256


def _unpack_tile(words: jnp.ndarray) -> jnp.ndarray:
    """[R, WC] uint32 -> [R, WC*32] int8 0/1 bits.

    Column s holds bit (s // WC) of word (s % WC) — a PERMUTED site order.
    That is sound because every consumer contracts the site axis with the
    same permutation on both operands (dot over sites is permutation-
    invariant).  The layout is chosen for Mosaic: a lane-axis concatenate of
    the word vector 32x plus a per-lane shift (s >> log2(WC)) avoids the
    3D->2D shape cast Mosaic cannot lower ([R, WC, 32] -> [R, WC*32]).
    """
    R, WC = words.shape
    assert WC & (WC - 1) == 0, "WC must be a power of two (shift = s >> log2WC)"
    log2wc = WC.bit_length() - 1
    tiled = jnp.concatenate([words] * 32, axis=1)  # [R, 32*WC]
    s = jax.lax.broadcasted_iota(jnp.uint32, (R, 32 * WC), 1)
    bits = (tiled >> (s >> log2wc)) & jnp.uint32(1)
    return bits.astype(jnp.int8)


def _split_gram_kernel(ea_ref, na_ref, eb_ref, nb_ref, g_ref, gn_ref):
    """ea/eb [T, 4, WC] uint32 exclusive planes, na/nb [T, WC] uint32 N masks;
    g_ref [TI, TJ] int32 accumulates G4 - Gn, gn_ref accumulates Gn."""
    c = pl.program_id(2)

    @pl.when(c == 0)
    def _():
        g_ref[:, :] = jnp.zeros_like(g_ref)
        gn_ref[:, :] = jnp.zeros_like(gn_ref)

    def dot(ya, yb):
        return jax.lax.dot_general(
            ya, yb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )

    acc = dot(_unpack_tile(ea_ref[:, 0, :]), _unpack_tile(eb_ref[:, 0, :]))
    acc += dot(_unpack_tile(ea_ref[:, 1, :]), _unpack_tile(eb_ref[:, 1, :]))
    acc += dot(_unpack_tile(ea_ref[:, 2, :]), _unpack_tile(eb_ref[:, 2, :]))
    acc += dot(_unpack_tile(ea_ref[:, 3, :]), _unpack_tile(eb_ref[:, 3, :]))
    gn = dot(_unpack_tile(na_ref[:, :]), _unpack_tile(nb_ref[:, :]))
    g_ref[:, :] += acc - gn
    gn_ref[:, :] += gn


@functools.partial(jax.jit, static_argnames=("interpret",))
def _split_gram_call(ea, na, eb, nb, *, interpret=False):
    ni, _, W = ea.shape
    nj = eb.shape[0]
    grid = (ni // _STI, nj // _STJ, W // _SWC)
    return pl.pallas_call(
        _split_gram_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((ni, nj), jnp.int32),
            jax.ShapeDtypeStruct((ni, nj), jnp.int32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_STI, 4, _SWC), lambda i, j, c: (i, 0, c)),
            pl.BlockSpec((_STI, _SWC), lambda i, j, c: (i, c)),
            pl.BlockSpec((_STJ, 4, _SWC), lambda i, j, c: (j, 0, c)),
            pl.BlockSpec((_STJ, _SWC), lambda i, j, c: (j, c)),
        ],
        out_specs=(
            pl.BlockSpec((_STI, _STJ), lambda i, j, c: (i, j)),
            pl.BlockSpec((_STI, _STJ), lambda i, j, c: (i, j)),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
        interpret=interpret,
    )(ea, na, eb, nb)


def split_gram_pallas(ea, na, eb, nb, *, interpret: bool = False, as_device: bool = False):
    """Fused split-decomposition grams from PACKED planes.

    ea, eb : [n, 4, W] uint32 N-exclusive singleton planes
    na, nb : [n, W] uint32 N masks
    returns (g, gn) int32 [n_a, n_b] (numpy, or device arrays when
    ``as_device``): g = G4 - Gn (the signed dense gram of
    ops/pairsnp._gram_split_chunk), gn = the N gram.

    Rows are padded to the output tile and words to the chunk size; zero
    padding is neutral (no bits -> zero contribution) and the pads are
    cropped from the result.
    """
    na_rows, nb_rows = ea.shape[0], eb.shape[0]
    same = eb is ea

    def pad_dev(x, axis, mult):
        # device-side pad (jnp): inputs are usually already device-resident
        # cached planes — a numpy pad would round-trip them through the host
        size = x.shape[axis]
        target = -(-size // mult) * mult
        if target == size:
            return jnp.asarray(x)
        pads = [(0, 0)] * x.ndim
        pads[axis] = (0, target - size)
        return jnp.pad(jnp.asarray(x), pads)

    row_mult = max(_STI, _STJ) if same else _STI
    ea_p = pad_dev(pad_dev(ea, 0, row_mult), 2, _SWC)
    na_p = pad_dev(pad_dev(na, 0, row_mult), 1, _SWC)
    if same:
        eb_p, nb_p = ea_p, na_p
    else:
        eb_p = pad_dev(pad_dev(eb, 0, _STJ), 2, _SWC)
        nb_p = pad_dev(pad_dev(nb, 0, _STJ), 1, _SWC)

    # Mosaic rejects i64 index-map constants under jax_enable_x64
    with jax.enable_x64(False):
        g, gn = _split_gram_call(ea_p, na_p, eb_p, nb_p, interpret=interpret)
        if as_device:
            return g[:na_rows, :nb_rows], gn[:na_rows, :nb_rows]
        g = np.asarray(g)
        gn = np.asarray(gn)
    return g[:na_rows, :nb_rows], gn[:na_rows, :nb_rows]


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
