"""All-pairs SNP distances over bit-packed IUPAC alignments — TPU kernels.

Semantics (reference src/pairsnp.hpp:395-421): for a pair (i, j) the number of
*matching* sites is ``popcount(OR_nt(plane_nt[i] & plane_nt[j]))`` — a site
matches when the two samples share at least one allele bit (IUPAC codes set
several bits, N sets all four) — and the SNP distance is ``d = L - matches``.
Comparable (non-N) sites: ``nn = L - popcount(N_i | N_j)`` where
``N_s = AND of all four planes`` (pairsnp.hpp:417-419).

Two exact device paths
----------------------
1. **MXU gram path** (default).  The match indicator has an exact
   inclusion-exclusion expansion over plane subsets S of {A,C,G,T}:

       [u ∩ v ≠ ∅] = 1 - Π_nt (1 - u_nt v_nt)
                   = - Σ_{S≠∅} (-1)^{|S|} χ_S(u) χ_S(v),
       χ_S(u) = Π_{nt∈S} u_nt  ∈ {0,1}

   so  d[i,j] = L + Σ_{S≠∅} (-1)^{|S|} ⟨χ_S(i), χ_S(j)⟩ : fifteen 0/1
   channel-grams, i.e. ONE int8 matmul on the MXU with the sign folded into
   the right operand.  The N-plane gram (S = {A,C,G,T}) also yields the
   comparable-sites count:  nn = L - cntN_i - cntN_j + ⟨N_i, N_j⟩.
   Channels are expanded on the fly from the packed words (15 word-ANDs +
   bit-unpack per chunk), so HBM holds only the 0.5 byte/site packed planes.

2. **VPU popcount path.**  Direct AND/OR + ``lax.population_count`` on uint32
   lanes, tiled over row blocks.  Used for cross-checking and for extracting
   per-pair mismatch bitsets for the recombination filter.

Both accumulate exactly in int32; results are bit-identical to the reference.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from tracs_tpu.ops.packing import PackedAlignment, pack_fasta, popcount_words

# channel subset masks in plane-bit order (bit0=A..bit3=T), |S| ascending
_SUBSETS = [s for s in range(1, 16)]
_SIGNS = np.array([(-1) ** bin(s).count("1") for s in _SUBSETS], dtype=np.int8)
_QUAD_IDX = _SUBSETS.index(15)

INT32_MAX = 2**31 - 1


def _expand_channels(words: jnp.ndarray) -> jnp.ndarray:
    """[n, 4, wc] uint32 packed planes -> [n, 15, wc*32] int8 0/1 channels."""
    a, c, g, t = words[:, 0], words[:, 1], words[:, 2], words[:, 3]
    prods = {1: a, 2: c, 4: g, 8: t}
    for s in _SUBSETS:
        if s not in prods:
            low = s & (-s)  # lowest set bit
            prods[s] = prods[low] & prods[s ^ low]
    cw = jnp.stack([prods[s] for s in _SUBSETS], axis=1)  # [n, 15, wc] uint32
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = ((cw[..., None] >> shifts) & jnp.uint32(1)).astype(jnp.int8)
    n, ch, wc, _ = bits.shape
    return bits.reshape(n, ch, wc * 32)


def _gram_chunk(wa: jnp.ndarray, wb: jnp.ndarray):
    """Single-chunk signed channel-gram + quad-gram.

    wa, wb : [na, 4, wc], [nb, 4, wc] uint32 packed planes
    returns: signed [na, nb] int32 (= sum_S (-1)^|S| G_S), quad [na, nb] int32
    """
    na, nb = wa.shape[0], wb.shape[0]
    signs = jnp.asarray(_SIGNS)
    ya = _expand_channels(wa)  # [na, 15, S]
    yb = _expand_channels(wb)  # [nb, 15, S]
    zb = yb * signs[None, :, None]
    s = ya.shape[-1]
    g = jax.lax.dot_general(
        ya.reshape(na, 15 * s),
        zb.reshape(nb, 15 * s),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    gq = jax.lax.dot_general(
        ya[:, _QUAD_IDX],
        yb[:, _QUAD_IDX],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return g, gq


@partial(jax.jit, static_argnames=("wc", "n_chunks"))
def _gram_mxu(planes_a: jnp.ndarray, planes_b: jnp.ndarray, *, wc: int, n_chunks: int):
    """Signed channel-gram and quad-gram, accumulated over word chunks.

    planes_* : [n, 4, n_chunks*wc] uint32
    returns  : signed_gram [na, nb] int32, quad_gram [na, nb] int32
    """
    na, nb = planes_a.shape[0], planes_b.shape[0]

    def body(carry, cidx):
        acc, accq = carry
        wa = jax.lax.dynamic_slice_in_dim(planes_a, cidx * wc, wc, axis=2)
        wb = jax.lax.dynamic_slice_in_dim(planes_b, cidx * wc, wc, axis=2)
        g, gq = _gram_chunk(wa, wb)
        return (acc + g, accq + gq), None

    init = (
        jnp.zeros((na, nb), jnp.int32),
        jnp.zeros((na, nb), jnp.int32),
    )
    (acc, accq), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    return acc, accq


@jax.jit
def _gram_popcount(planes_a: jnp.ndarray, planes_b: jnp.ndarray):
    """[na,4,W],[nb,4,W] -> (matches [na,nb] int32, nunion [na,nb] int32)
    via AND/OR + popcount on the VPU (row-at-a-time over a)."""

    nb = planes_b.shape[0]
    n_b = planes_b[:, 0] & planes_b[:, 1] & planes_b[:, 2] & planes_b[:, 3]

    def row(pa):  # pa [4, W]
        shared = pa[0][None, :] & planes_b[:, 0]
        shared = shared | (pa[1][None, :] & planes_b[:, 1])
        shared = shared | (pa[2][None, :] & planes_b[:, 2])
        shared = shared | (pa[3][None, :] & planes_b[:, 3])
        matches = jnp.sum(jax.lax.population_count(shared).astype(jnp.int32), axis=-1)
        n_a = pa[0] & pa[1] & pa[2] & pa[3]
        nunion = jnp.sum(
            jax.lax.population_count(n_a[None, :] | n_b).astype(jnp.int32), axis=-1
        )
        return matches, nunion

    return jax.lax.map(row, planes_a)


def _pad_words(planes: np.ndarray, w_target: int) -> np.ndarray:
    w = planes.shape[2]
    if w == w_target:
        return planes
    return np.pad(planes, ((0, 0), (0, 0), (0, w_target - w)))


def snp_distance_dense(
    a: PackedAlignment,
    b: PackedAlignment | None = None,
    *,
    method: str = "mxu",
    chunk_sites: int = 1 << 17,
    row_block: int = 2048,
) -> tuple[np.ndarray, np.ndarray]:
    """Dense all-pairs SNP distance + comparable-site matrices.

    Returns (D, NN) as int32 numpy arrays of shape [n_a, n_b] (b defaults
    to a).  Row-blocked so HBM never holds more than ~row_block^2 int32
    accumulators plus one chunk of expanded channels.
    """
    if b is None:
        b = a
    if a.length != b.length:
        raise ValueError("alignments must share sequence length")
    L = a.length
    na, nb = a.n_seqs, b.n_seqs

    cnt_a = np.asarray(a.counts_n())
    cnt_b = np.asarray(b.counts_n()) if b is not a else cnt_a

    if method == "mxu":
        # keep chunks lane-aligned (multiples of 256 words = 8192 sites);
        # odd chunk shapes trigger pathological XLA compiles on some backends
        wc = max(8, min(chunk_sites // 32, a.n_words))
        if wc > 256:
            wc = (wc // 256) * 256
        n_chunks = math.ceil(a.n_words / wc)
        pa = _pad_words(a.planes, wc * n_chunks)
        pb = _pad_words(b.planes, wc * n_chunks) if b is not a else pa
    elif method == "popcount":
        pa, pb = a.planes, (b.planes if b is not a else a.planes)
    else:
        raise ValueError(f"unknown method {method!r}")

    D = np.empty((na, nb), dtype=np.int32)
    NN = np.empty((na, nb), dtype=np.int32)
    dev_b = jax.device_put(pb)
    for r0 in range(0, na, row_block):
        r1 = min(na, r0 + row_block)
        dev_a = dev_b if (b is a and r0 == 0 and r1 == na) else jax.device_put(pa[r0:r1])
        if method == "mxu":
            g, gq = _gram_mxu(dev_a, dev_b, wc=wc, n_chunks=n_chunks)
            # d = L + sum_S (-1)^|S| G_S ; padded tail words contribute 0
            D[r0:r1] = np.asarray(g) + L
            NN[r0:r1] = L - cnt_a[r0:r1, None] - cnt_b[None, :] + np.asarray(gq)
        else:
            matches, nunion = _gram_popcount(dev_a, dev_b)
            D[r0:r1] = L - np.asarray(matches)
            NN[r0:r1] = L - np.asarray(nunion)
    return D, NN


def mismatch_words(a: PackedAlignment, b: PackedAlignment, pairs_i, pairs_j) -> np.ndarray:
    """Per-pair mismatch bitsets for the recombination filter.

    Returns uint32 [n_pairs, W]: bit set where the two samples share NO
    allele (the complement of the reference's ``res`` bitset,
    pairsnp.hpp:398-403, i.e. ``res.flip()`` in filter_recomb).  Bits beyond
    the true length L are cleared.
    """
    pa = a.planes[np.asarray(pairs_i, dtype=np.int64)]
    pb = b.planes[np.asarray(pairs_j, dtype=np.int64)]
    shared = (
        (pa[:, 0] & pb[:, 0])
        | (pa[:, 1] & pb[:, 1])
        | (pa[:, 2] & pb[:, 2])
        | (pa[:, 3] & pb[:, 3])
    )
    mism = ~shared
    # clear padding tail
    L, W = a.length, a.planes.shape[2]
    tail_bits = W * 32 - L
    if tail_bits:
        mism[:, -1] &= np.uint32(0xFFFFFFFF >> tail_bits)
    return mism


def pairsnp_stream(
    fasta: Sequence[str] | Sequence[PackedAlignment],
    dist: int = INT32_MAX,
    filter: bool = False,
    *,
    method: str = "mxu",
    row_block: int = 1024,
    start_row: int = 0,
):
    """Streaming COO emission for large all-pairs runs.

    Yields ``(r0, r1, names, rows, cols, dvals, filt, nn)`` per row block
    (numpy arrays, reference row-major order within and across blocks).
    Host memory stays O(row_block * n) regardless of sample count, and a
    caller persisting the last completed ``r1`` can resume an interrupted
    run from that row (the tile-cursor checkpoint story for week-long
    all-pairs sweeps).
    """
    from tracs_tpu.ops.recomb import filter_recomb_batch

    if len(fasta) < 1 or len(fasta) > 2:
        raise ValueError("Invalid number of fasta files!")
    packed = [p if isinstance(p, PackedAlignment) else pack_fasta(p) for p in fasta]
    a = packed[0]
    if len(packed) == 2:
        b = packed[1]
        if a.length != b.length:
            raise ValueError("Error reading FASTA, variable sequence lengths!")
        names = a.names + b.names
        col_offset = a.n_seqs
        triangle = False
    else:
        b = a
        names = a.names
        col_offset = 0
        triangle = True

    for r0 in range(start_row, a.n_seqs, row_block):
        r1 = min(a.n_seqs, r0 + row_block)
        block = PackedAlignment(a.planes[r0:r1], a.length, a.names[r0:r1])
        D, NN = snp_distance_dense(block, b, method=method)
        mask = D <= dist
        if triangle:
            cols_idx = np.arange(b.n_seqs)[None, :]
            rows_idx = np.arange(r0, r1)[:, None]
            mask &= cols_idx > rows_idx
        rows, cols = np.nonzero(mask)
        dvals = D[rows, cols].astype(np.int64)
        nvals = NN[rows, cols].astype(np.int64)
        rows = rows + r0
        if filter and len(rows):
            mism = mismatch_words(a, b, rows, cols)
            filt = filter_recomb_batch(mism, dvals, a.length)
        else:
            filt = np.zeros(len(rows), dtype=np.int64)
        yield r0, r1, names, rows, cols + col_offset, dvals, filt, nvals


def pairsnp(
    fasta: Sequence[str] | Sequence[PackedAlignment],
    n_threads: int = 1,
    dist: int = INT32_MAX,
    filter: bool = False,
    *,
    method: str = "mxu",
):
    """Reference-compatible driver (C++ ``pairsnp``, src/pairsnp.hpp:320-458).

    ``fasta`` is 1 or 2 aligned FASTA paths (or PackedAlignments): one file
    gives the all-pairs upper triangle (j > i), two give the query-vs-db
    rectangle.  Emits sparse COO of pairs with d <= dist, in the reference's
    row-major order.  ``n_threads`` is accepted for API parity; parallelism
    comes from the device mesh instead.

    Returns (rows, cols, distances, seq_names, filt_distances,
    n_compared_sites) as Python lists, exactly like the reference binding.
    """
    from tracs_tpu.ops.recomb import filter_recomb_batch

    if len(fasta) < 1 or len(fasta) > 2:
        raise ValueError("Invalid number of fasta files!")

    packed = [p if isinstance(p, PackedAlignment) else pack_fasta(p) for p in fasta]
    a = packed[0]
    if len(packed) == 2:
        b = packed[1]
        if a.length != b.length:
            raise ValueError("Error reading FASTA, variable sequence lengths!")
        names = a.names + b.names
        col_offset = a.n_seqs
        D, NN = snp_distance_dense(a, b, method=method)
        mask = D <= dist
    else:
        b = a
        names = a.names
        col_offset = 0
        D, NN = snp_distance_dense(a, method=method)
        mask = (D <= dist) & np.triu(np.ones_like(D, dtype=bool), k=1)

    rows, cols = np.nonzero(mask)  # row-major: i ascending then j — matches omp loop order
    dvals = D[rows, cols].astype(np.int64)
    nvals = NN[rows, cols].astype(np.int64)

    if filter and len(rows):
        mism = mismatch_words(a, b, rows, cols)
        filt = filter_recomb_batch(mism, dvals, a.length)
    else:
        # unfiltered: the reference's combine_vectors default-fills zeros
        # (pairsnp.hpp:451-452 with empty per-thread vectors)
        filt = np.zeros(len(rows), dtype=np.int64)

    return (
        list(rows),
        list(cols + col_offset),
        list(dvals),
        list(names),
        list(filt),
        list(nvals),
    )
