"""All-pairs SNP distances over bit-packed IUPAC alignments — TPU kernels.

Semantics (reference src/pairsnp.hpp:395-421): for a pair (i, j) the number of
*matching* sites is ``popcount(OR_nt(plane_nt[i] & plane_nt[j]))`` — a site
matches when the two samples share at least one allele bit (IUPAC codes set
several bits, N sets all four) — and the SNP distance is ``d = L - matches``.
Comparable (non-N) sites: ``nn = L - popcount(N_i | N_j)`` where
``N_s = AND of all four planes`` (pairsnp.hpp:417-419).

Exact device paths (all bit-identical to the reference; "auto" selects by
MAC cost)
--------------------------------------------------------------------------
1. **Split decomposition** (production default).  With û = N-exclusive
   singleton planes and n = the all-four N mask:

       match(u,v) = Σ_x û_x·v̂_x − n_u·n_v + n_u + n_v + partial-correction

   — two plain int8 grams per word chunk (G4 over the 4 exclusive channels
   and Gn over the N masks, each operand's channels unpacked ONCE; see
   ``_dense_split``), plus a 10-channel correction gram over sites gathered
   where any sample holds a 2-/3-bit IUPAC code (rare).  The comparable-
   sites matrix NN falls out of Gn for free.  ~5 MACs/site.  Self
   all-pairs row blocks use the prefix-triangle schedule (columns below
   the diagonal block are never computed; ``snp_distance_split_prefix_
   device``).  Measured on one TPU v5e chip at n=2048, L=1 Mb: grams at
   ~220 TOPS effective — above the bare ``lax.dot_general`` int8 rate at
   the same shape (202 TOPS), i.e. the unpack is fully hidden — and the
   full streaming unit (sweep + device COO + survivor download) at 33.3M
   pairs/s at n=4096, rb=1024, MFU 52.8% with every millisecond
   attributed (scripts/mfu_breakdown.py; see ARCHITECTURE.md).

2. **15-channel inclusion-exclusion gram** ("mxu").  The general expansion
   [u ∩ v ≠ ∅] = −Σ_{S≠∅} (−1)^{|S|} χ_S(u)χ_S(v) over plane subsets:
   one int8 matmul over 15 AND-product channels; the quad channel doubles
   as the N mask for comparable sites.

3. **VPU popcount path** ("popcount") and hand-written Pallas kernels
   (ops/pallas_kernels.py): direct AND/OR + ``lax.population_count`` on
   uint32 lanes — independent implementations for cross-checking, also used
   to extract per-pair mismatch bitsets for the recombination filter.

All accumulate exactly in int32.  Device-resident plane caches avoid
re-uploading inputs; chunk loops are unrolled with optimization_barrier
(see ARCHITECTURE.md for the measured reasons).
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from tracs_tpu.ops.packing import (
    PackedAlignment,
    compact_variant_columns,
    pack_fasta,
    popcount_words,
)
from tracs_tpu.parallel.mesh import to_host

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
    return _unpack_bits(cw)


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

    The chunk loop is unrolled (static trip count): a lax.scan here measured
    ~50-90x slower end-to-end on the TPU backend — the scan carry blocks the
    dot pipeline — while unrolled chunks let XLA overlap expansion and MXU.
    """
    na, nb = planes_a.shape[0], planes_b.shape[0]
    W = planes_a.shape[2]
    acc = jnp.zeros((na, nb), jnp.int32)
    accq = jnp.zeros((na, nb), jnp.int32)
    for c in range(n_chunks):
        if c:
            # serialise chunks: otherwise XLA schedules every chunk's channel
            # expansion concurrently and peak HBM = sum of all chunk temps
            planes_a, planes_b, acc, accq = jax.lax.optimization_barrier(
                (planes_a, planes_b, acc, accq)
            )
        end = min((c + 1) * wc, W)
        wa = jax.lax.slice_in_dim(planes_a, c * wc, end, axis=2)
        wb = jax.lax.slice_in_dim(planes_b, c * wc, end, axis=2)
        g, gq = _gram_chunk(wa, wb)
        acc = acc + g
        accq = accq + gq
    return acc, accq


def _unpack_bits(words: jnp.ndarray) -> jnp.ndarray:
    """[..., W] uint32 -> [..., W*32] int8 bits (little bit order).

    Shifts on a byte view, not the uint32 words: the shift intermediate is
    then 1 byte/bit instead of 4 (the 4-byte version OOMs HBM on large
    chunks via XLA temp copies)."""
    bytes_ = jax.lax.bitcast_convert_type(words, jnp.uint8)  # [..., W, 4]
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = ((bytes_[..., None] >> shifts) & jnp.uint8(1)).astype(jnp.int8)
    return bits.reshape(*words.shape[:-1], words.shape[-1] * 32)


def _gram_split_chunk(excl_a, n_a, excl_b, n_b):
    """Dense part of the split decomposition for one word chunk, as ONE
    signed 5-channel matmul: channels [ex_A..ex_T, N] on the left and
    [ex_A..ex_T, -N] on the right give G4 - Gn directly.

    excl_* : [n, 4, wc] uint32 N-exclusive singleton planes
    n_*    : [n, wc] uint32 N masks
    returns G4-Gn [na, nb] int32
    """
    na, nb = excl_a.shape[0], excl_b.shape[0]
    ya = jnp.concatenate([_unpack_bits(excl_a), _unpack_bits(n_a)[:, None, :]], axis=1)
    zb = jnp.concatenate(
        [_unpack_bits(excl_b), -_unpack_bits(n_b)[:, None, :]], axis=1
    )
    return jax.lax.dot_general(
        ya.reshape(na, -1), zb.reshape(nb, -1),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32,
    )


# partial-correction channels: AND-products over plane pairs (sign -1) and
# plane triples (sign +1); quad is structurally zero on exclusive planes
_PAIR_SUBSETS = [s for s in range(1, 16) if bin(s).count("1") == 2]
_TRIPLE_SUBSETS = [s for s in range(1, 16) if bin(s).count("1") == 3]
_PARTIAL_SIGNS = np.array([-1] * 6 + [1] * 4, dtype=np.int8)


@jax.jit
def _gram_partial(part_a: jnp.ndarray, part_b: jnp.ndarray):
    """Correction gram over gathered partial-ambiguity sites.

    part_* : [n, 4, Wp] uint32 exclusive planes at partial sites
    returns [na, nb] int32 = sum_{|S|=2} -G_S + sum_{|S|=3} +G_S (negated
    sign convention folded: result ADDs to the match count)
    """
    def chans(p):
        planes = {1: p[:, 0], 2: p[:, 1], 4: p[:, 2], 8: p[:, 3]}
        prods = {}
        for s in _PAIR_SUBSETS + _TRIPLE_SUBSETS:
            low = s & (-s)
            rest = s ^ low
            prods[s] = planes[low] & (prods[rest] if rest in prods else planes[rest])
        return jnp.stack([prods[s] for s in _PAIR_SUBSETS + _TRIPLE_SUBSETS], axis=1)

    na, nb = part_a.shape[0], part_b.shape[0]
    ya = _unpack_bits(chans(part_a)).reshape(na, -1)
    yb = _unpack_bits(chans(part_b))
    zb = (yb * jnp.asarray(_PARTIAL_SIGNS)[None, :, None]).reshape(nb, -1)
    return jax.lax.dot_general(
        ya, zb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )


@partial(jax.jit, static_argnames=("wc", "n_chunks", "with_nn", "same"))
def _dense_split(
    excl_a, n_a, excl_b, n_b, *, wc: int, n_chunks: int, with_nn: bool = True,
    same: bool = False,
):
    """Unrolled chunk loop — see _gram_mxu for why not lax.scan.

    Two plain grams per chunk instead of the signed 5-channel matmul:
    G4 = dot(ex_bits_a, ex_bits_b) (4 channels flattened into the K axis)
    and Gn = dot(n_bits_a, n_bits_b); m = G4 - Gn.  Same MAC count as the
    signed trick, but (a) each operand's channels are unpacked ONCE into a
    single int8 array instead of twice (the +N and -N concatenations defeat
    CSE), (b) ``same=True`` collapses the self-comparison to dot(x, x) so
    the symmetric sweep unpacks one operand total, and (c) Gn — and hence
    the comparable-sites matrix — falls out for free.  Measured on v5e at
    n=1024, L=1 Mb: 42 ms/sweep vs 240 ms for the signed-channel version
    (the unpack, not the MXU, was the bound).  ``with_nn`` is accepted for
    API compatibility; Gn is always computed (it costs nothing extra).
    """
    del with_nn
    na, nb = excl_a.shape[0], excl_b.shape[0]
    W = excl_a.shape[2]

    def dot(x, y):
        return jax.lax.dot_general(
            x, y, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )

    acc = jnp.zeros((na, nb), jnp.int32)
    accn = jnp.zeros((na, nb), jnp.int32)
    period = int(os.environ.get("TRACS_TPU_BARRIER_PERIOD", "1"))
    for c in range(n_chunks):
        if c and c % period == 0:
            # serialise chunk groups to bound peak HBM (see _gram_mxu);
            # within a group XLA may overlap one chunk's unpack with the
            # previous chunk's dot at `period` x the chunk temp budget
            excl_a, n_a, excl_b, n_b, acc, accn = jax.lax.optimization_barrier(
                (excl_a, n_a, excl_b, n_b, acc, accn)
            )
        end = min((c + 1) * wc, W)
        ea = jax.lax.slice_in_dim(excl_a, c * wc, end, axis=2)
        ma = jax.lax.slice_in_dim(n_a, c * wc, end, axis=1)
        ba = _unpack_bits(ea).reshape(na, -1)
        bna = _unpack_bits(ma)
        if same:
            bb, bnb = ba, bna
        else:
            eb = jax.lax.slice_in_dim(excl_b, c * wc, end, axis=2)
            mb = jax.lax.slice_in_dim(n_b, c * wc, end, axis=1)
            bb = _unpack_bits(eb).reshape(nb, -1)
            bnb = _unpack_bits(mb)
        gn = dot(bna, bnb)
        acc = acc + dot(ba, bb) - gn
        accn = accn + gn
    return acc, accn


# distinct column-suffix shapes per self all-pairs sweep: suffix widths are
# bucketed so jit programs repeat across blocks (each distinct shape costs a
# full XLA compile — at n=100k, rb=1024 exact suffixes would mean ~98
# compiles, which rivals sweep time; bucketing caps that at ~this many for
# ~2% extra masked MACs)
_PREFIX_SHAPE_BUDGET = int(os.environ.get("TRACS_TPU_PREFIX_SHAPES", "24"))


def prefix_col_start(n: int, r0: int) -> int:
    """Global first column of the prefix-triangle block starting at row r0.

    The ideal suffix is columns [r0, n); the returned start c0 <= r0 extends
    it down to a bucketed width (multiples of ~n/_PREFIX_SHAPE_BUDGET,
    lane-aligned) so block shapes — and hence jit programs — repeat across
    the sweep.  The extra columns [c0, r0) hold pairs with j < i that the
    COO extraction's triangle mask already discards."""
    q = 256 * max(1, -(-n // (256 * _PREFIX_SHAPE_BUDGET)))
    suffix = -(-(n - r0) // q) * q
    return max(0, n - suffix)


def schedule_mac_pairs(n: int, row_block: int, *, triangle: bool = True) -> int:
    """Pair-MACs actually executed by the streaming schedule — the honest
    MFU denominator (bench.py).  Prefix-triangle blocks sweep only their
    bucketed column suffix; with the triangle schedule off every block
    sweeps the full width."""
    total = 0
    for r0 in range(0, n, row_block):
        rb = min(n, r0 + row_block) - r0
        c0 = prefix_col_start(n, r0) if (triangle and r0 > 0) else 0
        total += rb * (n - c0)
    return total


@partial(jax.jit, static_argnames=("rb", "c0", "wc", "n_chunks"))
def _dense_split_ranged(ea, nm, r0, *, rb: int, c0: int, wc: int, n_chunks: int):
    """Prefix-block grams sliced INSIDE the chunk loop: the full
    device-resident split layout goes in; per chunk, the row block
    (``dynamic_slice`` at traced r0, static height rb) and the column
    suffix (static start c0) are cut from that chunk's words only.

    Slicing on the host side instead (a device ``ea[c0:]``) materialises a
    near-full second copy of the layout per block — for early blocks
    c0 ~ 0, so with one-deep pipelining two ~full copies live at once; at
    n=10k that alone OOMs a 16 GB chip (found by the north-star run).
    Here the only materialised temps are one chunk's words + int8
    channels, and r0 being traced keeps the jit program count at the
    (rb, c0-bucket) grid, exactly as before."""
    n, W = ea.shape[0], ea.shape[2]

    def dot(x, y):
        return jax.lax.dot_general(
            x, y, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )

    acc = jnp.zeros((rb, n - c0), jnp.int32)
    accn = jnp.zeros((rb, n - c0), jnp.int32)
    period = int(os.environ.get("TRACS_TPU_BARRIER_PERIOD", "1"))
    for c in range(n_chunks):
        if c and c % period == 0:
            ea, nm, acc, accn = jax.lax.optimization_barrier((ea, nm, acc, accn))
        end = min((c + 1) * wc, W)
        eac = jax.lax.slice_in_dim(ea, c * wc, end, axis=2)
        nmc = jax.lax.slice_in_dim(nm, c * wc, end, axis=1)
        ba = _unpack_bits(
            jax.lax.dynamic_slice_in_dim(eac, r0, rb, axis=0)
        ).reshape(rb, -1)
        bna = _unpack_bits(jax.lax.dynamic_slice_in_dim(nmc, r0, rb, axis=0))
        bb = _unpack_bits(jax.lax.slice_in_dim(eac, c0, n, axis=0)).reshape(
            n - c0, -1
        )
        bnb = _unpack_bits(jax.lax.slice_in_dim(nmc, c0, n, axis=0))
        gn = dot(bna, bnb)
        acc = acc + dot(ba, bb) - gn
        accn = accn + gn
    return acc, accn


@partial(
    jax.jit,
    static_argnames=("rb1", "c01", "rb2", "c02", "wc", "n_chunks"),
)
def _dense_split_ranged2(
    ea, nm, r01, r02, *, rb1: int, c01: int, rb2: int, c02: int, wc: int,
    n_chunks: int,
):
    """TWO prefix blocks' grams in ONE program, the narrower column
    suffix sliced from the wider one's unpack (requires c02 >= c01).

    The committed MFU envelope (ARCHITECTURE.md, round 5) measured paired
    wide+narrow dispatch at 1.6-1.8x the separate dispatches — narrow
    late-triangle blocks run far below peak on their own (42-77 TOPS at
    1024-wide outputs) because the MXU pipeline drains between small
    dots; fusing gives XLA a second block's work to overlap.  Used by the
    streaming sweep for the narrow tail of the prefix schedule."""
    n = ea.shape[0]
    W = ea.shape[2]

    def dot(x, y):
        return jax.lax.dot_general(
            x, y, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )

    acc1 = jnp.zeros((rb1, n - c01), jnp.int32)
    accn1 = jnp.zeros((rb1, n - c01), jnp.int32)
    acc2 = jnp.zeros((rb2, n - c02), jnp.int32)
    accn2 = jnp.zeros((rb2, n - c02), jnp.int32)
    period = int(os.environ.get("TRACS_TPU_BARRIER_PERIOD", "1"))
    for c in range(n_chunks):
        if c and c % period == 0:
            ea, nm, acc1, accn1, acc2, accn2 = jax.lax.optimization_barrier(
                (ea, nm, acc1, accn1, acc2, accn2)
            )
        end = min((c + 1) * wc, W)
        eac = jax.lax.slice_in_dim(ea, c * wc, end, axis=2)
        nmc = jax.lax.slice_in_dim(nm, c * wc, end, axis=1)
        bb1 = _unpack_bits(jax.lax.slice_in_dim(eac, c01, n, axis=0)).reshape(
            n - c01, -1
        )
        bnb1 = _unpack_bits(jax.lax.slice_in_dim(nmc, c01, n, axis=0))
        # the narrower suffix is a row-suffix of the wider unpack: share it
        bb2 = jax.lax.slice_in_dim(bb1, c02 - c01, n - c01, axis=0)
        bnb2 = jax.lax.slice_in_dim(bnb1, c02 - c01, n - c01, axis=0)
        ba1 = _unpack_bits(
            jax.lax.dynamic_slice_in_dim(eac, r01, rb1, axis=0)
        ).reshape(rb1, -1)
        bna1 = _unpack_bits(jax.lax.dynamic_slice_in_dim(nmc, r01, rb1, axis=0))
        ba2 = _unpack_bits(
            jax.lax.dynamic_slice_in_dim(eac, r02, rb2, axis=0)
        ).reshape(rb2, -1)
        bna2 = _unpack_bits(jax.lax.dynamic_slice_in_dim(nmc, r02, rb2, axis=0))
        gn1 = dot(bna1, bnb1)
        acc1 = acc1 + dot(ba1, bb1) - gn1
        accn1 = accn1 + gn1
        gn2 = dot(bna2, bnb2)
        acc2 = acc2 + dot(ba2, bb2) - gn2
        accn2 = accn2 + gn2
    return acc1, accn1, acc2, accn2


#: fuse tail prefix blocks whose column suffix is at most this many samples
_FUSE_MAX_SUFFIX = 3072


def _fused_tail_blocks(sa, spans, use_prefix: bool):
    """{(r0, r1): (D_dev, NN_dev, c0)} for the narrow TAIL spans of a
    self-triangle sweep, computed pairwise in single fused programs
    (``_dense_split_ranged2``).  Pairs are (widest-with-narrowest) within
    the tail, mirroring the envelope's paired-block measurement.  Returns
    {} when fewer than two spans qualify."""
    n = sa.n_seqs
    tail = []
    for r0, r1 in spans:
        if r0 == 0:
            continue
        c0 = prefix_col_start(n, r0) if use_prefix else 0
        if n - c0 <= _FUSE_MAX_SUFFIX:
            tail.append((r0, r1, c0))
    if len(tail) < 2:
        return {}
    Wpad, ea, nm, pt = _split_device(sa)
    cnt = _cnt_device(sa)
    L32 = jnp.int32(sa.length)
    out = {}
    # widest (lowest c0) pairs with narrowest (highest c0)
    tail.sort(key=lambda t: t[2])
    lo, hi = 0, len(tail) - 1
    while lo < hi:
        r01, r11, c01 = tail[lo]
        r02, r12, c02 = tail[hi]
        rb1, rb2 = r11 - r01, r12 - r02
        wc, nc = plan_chunks(rb1 + rb2 + (n - c01), 5, Wpad)
        m1, gn1, m2, gn2 = _dense_split_ranged2(
            ea, nm, jnp.int32(r01), jnp.int32(r02),
            rb1=rb1, c01=c01, rb2=rb2, c02=c02, wc=wc, n_chunks=nc,
        )
        for (r0, r1, c0), m, gn in (
            ((r01, r11, c01), m1, gn1), ((r02, r12, c02), m2, gn2),
        ):
            if sa.n_partial:
                gp = _gram_partial(pt[r0:r1], pt[c0:])
            else:
                gp = jnp.zeros((), jnp.int32)
            D = _assemble_d(m, gp, cnt[r0:r1], cnt[c0:], L32)
            NN = _assemble_nn(gn, cnt[r0:r1], cnt[c0:], L32)
            out[(r0, r1)] = (D, NN, c0)
        lo += 1
        hi -= 1
    return out


def snp_distance_split_prefix_device(sa, r0: int, r1: int):
    """(D, NN, c0) — device int32 blocks of the triangle rows [r0, r1)
    against the column suffix [c0, n), c0 = prefix_col_start(n, r0) <= r0 —
    the work-efficient schedule for the self all-pairs triangle.  A row
    block only ever emits pairs with j > i >= r0, so columns [0, c0) —
    roughly half the MAC budget of the full-width sweep, summed over
    blocks — are never computed at all, instead of being computed and
    masked away at extraction: MACs drop from n^2 to ~n(n+rb)/2 across the
    sweep.  Column j of the returned [rb, n-c0] blocks is global column
    j + c0; callers must mask j <= i (the extraction's triangle mask does).

    Both operands are cut from the full device-resident layout INSIDE the
    jitted chunk loop (``_dense_split_ranged``) — no per-block device
    copies of the layout (the former host-side suffix slice held two
    near-full copies concurrently and OOMed 16 GB HBM at n=10k) and no
    host re-upload.  Separate block/suffix unpacks measured faster on v5e
    than a dot(x[:rb], x) unpack-once kernel (the sliced operand defeats
    XLA's unpack CSE and rematerialises it anyway) and than the
    full-square one-shot (142.7 vs 147.6 vs 158.3 ms gram time;
    scripts/triangle_experiment.py).  Suffix widths are bucketed
    (prefix_col_start) and r0 is a traced scalar, so jit programs repeat
    across blocks: one compile per (rb, suffix-bucket)."""
    n = sa.n_seqs
    # fail fast: dynamic_slice at a traced r0 clamps out-of-range starts,
    # which would silently return shifted rows instead of erroring
    assert 0 <= r0 < r1 <= n, f"row range [{r0}, {r1}) outside [0, {n})"
    c0 = prefix_col_start(n, r0)
    rb = r1 - r0
    Wpad, ea, nm, pt = _split_device(sa)
    wc, n_chunks = plan_chunks(rb + (n - c0), 5, Wpad)
    m, gn = _dense_split_ranged(
        ea, nm, jnp.int32(r0), rb=rb, c0=c0, wc=wc, n_chunks=n_chunks
    )
    if sa.n_partial:
        gp = _gram_partial(pt[r0:r1], pt[c0:])
    else:
        gp = jnp.zeros((), jnp.int32)
    cnt = _cnt_device(sa)
    L32 = jnp.int32(sa.length)
    D = _assemble_d(m, gp, cnt[r0:r1], cnt[c0:], L32)
    NN = _assemble_nn(gn, cnt[r0:r1], cnt[c0:], L32)
    return D, NN, c0


@jax.jit
def _derive_split_planes(planes):
    """(excl, nmask) from raw packed planes, on device: all4 = A&C&G&T,
    excl = planes & ~all4.  Bitwise VPU work over [n, 4, W] words — far
    cheaper than transferring the derived tensors over the host link."""
    all4 = planes[:, 0] & planes[:, 1] & planes[:, 2] & planes[:, 3]
    return planes & ~all4[:, None, :], all4


# transient HBM allowance for deriving the split layout on device: raw
# planes (4 word-planes) + derived excl (4) + nmask (1) = 9 word-planes
# live at once.  Above this, fall back to uploading the host-built layout
# (5 word-planes peak).  ~12 GB default leaves room for gram chunk temps
# on a 16 GB v5e.
_DEVICE_SPLIT_BUDGET = int(os.environ.get("TRACS_TPU_DEVICE_SPLIT_BYTES", 12 << 30))


def _split_device(sa, wp_target: int | None = None):
    """Device-resident (and cached) padded copies of a SplitAlignment.
    Host->device transfer happens ONCE per alignment — on a tunneled TPU the
    re-upload otherwise dominates the sweep time.

    When the layout carries a ``src`` PackedAlignment backref, excl/nmask
    are DERIVED on device from the 4-plane packed tensor instead of being
    uploaded: 4 word-planes cross the link instead of 5 (and zero extra
    planes when ``--filter`` already uploads them for mismatch extraction).
    The 4-plane upload is freed right after deriving unless the caller
    marked it for reuse (``_keep_planes_device``, set by the filter path)."""
    Wpad = ((sa.excl.shape[2] + 255) // 256) * 256
    cache = getattr(sa, "_dev_cache", None)
    if cache is None or cache[0] != Wpad:
        src = getattr(sa, "src", None)
        n = sa.excl.shape[0]
        if (
            src is not None
            and src.planes.shape[0] == n  # a slice must not derive from full planes
            and os.environ.get("TRACS_TPU_DEVICE_SPLIT", "1") != "0"
            and 9 * n * Wpad * 4 <= _DEVICE_SPLIT_BUDGET
        ):
            planes = _planes_device(src)
            ea, nm = _derive_split_planes(planes)
            if not getattr(src, "_keep_planes_device", False):
                src._dev_planes = None  # free the raw upload once derived
        else:
            ea = jnp.asarray(_pad_words(sa.excl, Wpad))
            nm = jnp.asarray(np.pad(sa.nmask, ((0, 0), (0, Wpad - sa.nmask.shape[1]))))
        pt = jnp.asarray(sa.partial)
        cache = (Wpad, ea, nm, pt)
        sa._dev_cache = cache
    return cache


# ---------------------------------------------------------------------------
# upload/compute overlap: chunk-major first sweep
# ---------------------------------------------------------------------------

@partial(
    jax.jit,
    static_argnames=("rb", "c0", "chunk_w", "wc", "n_chunks"),
    donate_argnums=(2, 3),
)
def _accum_split_ranged(
    ea, nm, acc, accn, r0, w0, *, rb: int, c0: int, chunk_w: int, wc: int,
    n_chunks: int,
):
    """One word-chunk's gram contribution to one prefix block, ADDED into
    the block's running (acc, accn) — the chunk-major counterpart of
    ``_dense_split_ranged`` (same row/column slicing contract), used by the
    overlapped first sweep where genome chunks become compute-ready as
    their upload lands.  acc/accn are donated: the accumulators live once
    in HBM across the whole sweep."""
    n = ea.shape[0]

    def dot(x, y):
        return jax.lax.dot_general(
            x, y, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )

    eck = jax.lax.dynamic_slice_in_dim(ea, w0, chunk_w, axis=2)
    nck = jax.lax.dynamic_slice_in_dim(nm, w0, chunk_w, axis=1)
    period = int(os.environ.get("TRACS_TPU_BARRIER_PERIOD", "1"))
    for c in range(n_chunks):
        if c and c % period == 0:
            eck, nck, acc, accn = jax.lax.optimization_barrier(
                (eck, nck, acc, accn)
            )
        end = min((c + 1) * wc, chunk_w)
        eac = jax.lax.slice_in_dim(eck, c * wc, end, axis=2)
        nmc = jax.lax.slice_in_dim(nck, c * wc, end, axis=1)
        ba = _unpack_bits(
            jax.lax.dynamic_slice_in_dim(eac, r0, rb, axis=0)
        ).reshape(rb, -1)
        bna = _unpack_bits(jax.lax.dynamic_slice_in_dim(nmc, r0, rb, axis=0))
        bb = _unpack_bits(jax.lax.slice_in_dim(eac, c0, n, axis=0)).reshape(
            n - c0, -1
        )
        bnb = _unpack_bits(jax.lax.slice_in_dim(nmc, c0, n, axis=0))
        gn = dot(bna, bnb)
        acc = acc + dot(ba, bb) - gn
        accn = accn + gn
    return acc, accn


@partial(jax.jit, donate_argnums=(0, 1))
def _update_layout_chunk(full_ea, full_nm, ea_c, nm_c, w0):
    """Write a derived chunk into the full device-resident layout (donated:
    the full tensors are updated in place, no second copy)."""
    return (
        jax.lax.dynamic_update_slice_in_dim(full_ea, ea_c, w0, axis=2),
        jax.lax.dynamic_update_slice_in_dim(full_nm, nm_c, w0, axis=1),
    )


@jax.jit
def _touch_first(*xs):
    """Tiny fused readback: one element of each array, one host transfer —
    the sync point that proves a chunk's whole dependency chain executed
    (block_until_ready does not flush through tunneled backends)."""
    return jnp.stack([x.ravel()[0].astype(jnp.int32) for x in xs])


def _overlapped_split_sweep(sa, spans, *, use_prefix: bool):
    """First-sweep pipeline: upload the layout in genome chunks and run
    every row block's grams on chunk k while chunk k+1 crosses the host
    link — the one-time transfer (the dominant serial prefix of a large
    tunneled run: ~380 s at 10k x 1 Mb) overlaps the sweep's MXU work
    instead of preceding it.

    Chunk-major schedule: for each 256-aligned word chunk, (1) the b0/b1
    code planes (or raw planes when no code2 stash exists) arrive from a
    producer thread, (2) the chunk's excl/nmask are derived on device and
    written into the full resident layout (donated update — the layout is
    built in place and becomes ``sa._dev_cache``, so repeat sweeps skip
    the upload entirely), (3) each span's (acc, accn) accumulate the
    chunk's grams, (4) an 8-byte readback syncs the chain before the next
    chunk's update donates the layout.  Yields identical numbers to the
    one-shot path: the grams are the same dots over the same words, summed
    in a different (still deterministic) order of exact int32 adds.

    Returns {(r0, r1): (D_dev, NN_dev, c0)} with every result enqueued.
    """
    import queue as _queue
    import threading

    src = sa.src
    n = sa.n_seqs
    W = sa.excl.shape[2]
    Wpad = ((W + 255) // 256) * 256

    # the per-span int32 accumulators (and the assembled D/NN that replace
    # them) all live on device AT ONCE in this schedule — ~4 bytes x 2 x
    # the triangle's pair count.  The layout gate alone misses this: at
    # many-samples/short-genome shapes (n=65k, L=50kb) the accumulators
    # dwarf the layout.  Budget both, with 2x on the accs for the
    # assemble-time overlap of acc and D buffers.
    acc_bytes = sum(
        2 * (r1 - r0)
        * (n - (prefix_col_start(n, r0) if (use_prefix and r0 > 0) else 0))
        * 4
        for r0, r1 in spans
    )
    if 9 * n * Wpad * 4 + 2 * acc_bytes > _DEVICE_SPLIT_BUDGET:
        return None  # fall back to the block-streamed path

    # payload form: 2-bit code planes (half the bytes) when stashed + sparse
    c2 = None
    if os.environ.get("TRACS_TPU_CODE2_UPLOAD", "1") != "0" and src is not None:
        c2 = getattr(src, "_code2", None)
        if c2 is not None:
            b0, b1, ge2 = c2
            exc_flat = np.flatnonzero(ge2.reshape(-1))
            if 24 * exc_flat.size >= 8 * n * W:
                c2 = None
    if c2 is not None:
        exc_i, exc_w, exc_pw, exc_m = _code2_exception_arrays(
            src, ge2, exc_flat, W
        )
    elif src is None:
        return None  # hand-built layout: no planes to upload from

    n_chunks_env = int(os.environ.get("TRACS_TPU_OVERLAP_CHUNKS", "8"))
    chunk_w = 256 * max(1, -(-Wpad // (256 * max(1, n_chunks_env))))
    K = -(-Wpad // chunk_w)
    if K < 2:
        return None  # nothing to overlap

    # bit-level tail mask (code2 derive must not invent A beyond length)
    tail = _tail_bit_mask(sa.length, Wpad)

    def chunk_span(k):
        """Word range of chunk k, clipped to Wpad: the tail chunk is
        NARROWER when chunk_w does not divide Wpad.  Feeding a full-width
        tail into the dynamic slices instead would make XLA clamp the
        start index and silently read/write the wrong words — the 10k
        north-star run caught exactly that (93,850 rows instead of
        249,906)."""
        w0 = k * chunk_w
        return w0, min(w0 + chunk_w, Wpad)

    def host_chunk(k):
        w0, w1 = chunk_span(k)
        we = min(w1, W)  # data ends at W; [W, w1) is zero padding
        pad = ((0, 0), (0, w1 - we))
        if c2 is not None:
            return (
                np.pad(np.ascontiguousarray(b0[:, w0:we]), pad),
                np.pad(np.ascontiguousarray(b1[:, w0:we]), pad),
            )
        return (
            np.pad(
                np.ascontiguousarray(src.planes[:, :, w0:we]),
                ((0, 0), (0, 0), (0, w1 - we)),
            ),
        )

    q = _queue.Queue(maxsize=2)  # at most 2 chunks in flight ahead

    def producer():
        for k in range(K):
            try:
                q.put(tuple(_put_striped(x) for x in host_chunk(k)))
            except Exception as e:  # noqa: BLE001 — surface on the consumer
                q.put(e)
                return

    th = threading.Thread(target=producer, daemon=True)
    th.start()

    full_ea = jnp.zeros((n, 4, Wpad), jnp.uint32)
    full_nm = jnp.zeros((n, Wpad), jnp.uint32)
    accs = {}
    for r0, r1 in spans:
        c0 = prefix_col_start(n, r0) if (use_prefix and r0 > 0) else 0
        accs[(r0, r1)] = [
            jnp.zeros((r1 - r0, n - c0), jnp.int32),
            jnp.zeros((r1 - r0, n - c0), jnp.int32),
            c0,
        ]

    for k in range(K):
        got = q.get()
        if isinstance(got, Exception):
            raise got
        w0, w1 = chunk_span(k)
        cw = w1 - w0
        tail_c = jnp.asarray(tail[w0:w1])
        if c2 is not None:
            d0, d1 = got
            planes_c = _derive_planes_code2(d0, d1, tail_c, rows=n)
            # chunk-local exception patch (same OOB-pad/drop contract)
            in_chunk = (exc_w >= w0) & (exc_w < w1)
            if int(in_chunk.sum()):
                idx, pw, m, cap = _pad_exceptions(
                    exc_i[in_chunk] * (4 * cw) + (exc_w[in_chunk] - w0),
                    exc_pw[in_chunk], exc_m[in_chunk],
                    oob_index=n * 4 * cw,
                )
                planes_c = _apply_exceptions(
                    planes_c, jnp.asarray(idx), jnp.asarray(pw),
                    jnp.asarray(m), cap=cap,
                )
        else:
            (planes_c,) = got
        ea_c, nm_c = _derive_split_planes(planes_c)
        del planes_c
        full_ea, full_nm = _update_layout_chunk(
            full_ea, full_nm, ea_c, nm_c, jnp.int32(w0)
        )
        del ea_c, nm_c
        for (r0, r1), slot in accs.items():
            acc, accn, c0 = slot
            wc, nc = plan_chunks((r1 - r0) + (n - c0), 5, cw)
            slot[0], slot[1] = _accum_split_ranged(
                full_ea, full_nm, acc, accn, jnp.int32(r0), jnp.int32(w0),
                rb=r1 - r0, c0=c0, chunk_w=cw, wc=wc, n_chunks=nc,
            )
        # sync the whole chunk chain before the next update donates the
        # layout (a donation with these grams still in flight would force
        # the runtime to copy the multi-GB layout)
        np.asarray(_touch_first(*(s[0] for s in accs.values())))
    th.join()

    # the progressively-built layout IS the cache: repeat sweeps on this
    # alignment skip the upload (bench iterates; the CLI streams once)
    pt = jnp.asarray(sa.partial)
    sa._dev_cache = (Wpad, full_ea, full_nm, pt)
    if c2 is not None and getattr(src, "_code2", None) is not None:
        src._code2 = None  # consumed; free ~0.75x plane bytes of host RAM

    cnt = _cnt_device(sa)
    L32 = jnp.int32(sa.length)
    out = {}
    for (r0, r1), (acc, accn, c0) in accs.items():
        if sa.n_partial:
            gp = _gram_partial(pt[r0:r1], pt[c0:])
        else:
            gp = jnp.zeros((), jnp.int32)
        D = _assemble_d(acc, gp, cnt[r0:r1], cnt[c0:], L32)
        NN = _assemble_nn(accn, cnt[r0:r1], cnt[c0:], L32)
        out[(r0, r1)] = (D, NN, c0)
    return out


@jax.jit
def _assemble_d(m, gp, cnt_a, cnt_b, L):
    return (L - (m + gp + cnt_a[:, None] + cnt_b[None, :])).astype(jnp.int32)


@jax.jit
def _assemble_nn(gn, cnt_a, cnt_b, L):
    return (L - cnt_a[:, None] - cnt_b[None, :] + gn).astype(jnp.int32)


@jax.jit
def _assemble_mxu(g, gq, cnt_a, cnt_b, L):
    """(D, NN) device blocks from the 15-channel signed gram + quad gram."""
    D = (g + L).astype(jnp.int32)
    NN = (L - cnt_a[:, None] - cnt_b[None, :] + gq).astype(jnp.int32)
    return D, NN


@jax.jit
def _assemble_popcount(matches, nunion, L):
    return (L - matches).astype(jnp.int32), (L - nunion).astype(jnp.int32)


def _cnt_packed_device(p: PackedAlignment) -> jnp.ndarray:
    """Device-resident (cached) per-sequence N counts of a PackedAlignment."""
    dev = getattr(p, "_dev_cnt_packed", None)
    if dev is None:
        dev = jnp.asarray(np.asarray(p.counts_n()).astype(np.int32))
        p._dev_cnt_packed = dev
    return dev


def _cnt_device(sa) -> jnp.ndarray:
    dev = getattr(sa, "_dev_cnt", None)
    if dev is None:
        dev = jnp.asarray(sa.cnt_n.astype(np.int32))
        sa._dev_cnt = dev
    return dev


def snp_distance_split_device(sa, sb=None, *, chunk_sites: int | None = None, with_nn=True):
    """(D, NN) as DEVICE int32 arrays from SplitAlignment layouts — the fast
    path (~5 MACs/site for consensus-style data).

    matches = (G4 - Gn) + Gpartial + cntN_i + cntN_j ;  D = L - matches
    NN = L - cntN_i - cntN_j + Gn.  Gn is a free by-product of every path,
    but ``with_nn=False`` skips the NN *assembly* (returns None) so callers
    that never read it do not pay for its materialisation or download.

    Keeping the result on device lets callers threshold/compact there and
    download only surviving pairs — on tunneled TPUs the dense matrix
    download otherwise rivals the compute time.
    """
    if sb is None:
        sb = sa
    if sa.length != sb.length:
        raise ValueError("alignments must share sequence length")
    L = sa.length

    Wpad, ea, na_mask, pa = _split_device(sa)
    if sb is sa:
        eb, nb_mask, pb = ea, na_mask, pa
    else:
        Wpad_b, eb, nb_mask, pb = _split_device(sb)
        assert Wpad_b == Wpad

    # the XLA two-gram path is the only production kernel: the fused Pallas
    # split kernel measured slower at EVERY size (it re-unpacks operand
    # tiles per (i, j) grid step, so unpack cost scales with TI+TJ per
    # TI*TJ of MXU work, topping out below the XLA path, whose grams run
    # above the bare dot_general int8 rate — the unpack fully hidden; see
    # ARCHITECTURE.md).  split_gram_pallas survives as an independent
    # bit-equality cross-check in tests/test_pallas_kernels.py.
    same = sb is sa
    rows = sa.n_seqs if same else sa.n_seqs + sb.n_seqs
    if chunk_sites is None:
        wc, n_chunks = plan_chunks(rows, 5, Wpad)
    else:
        wc = max(8, min(chunk_sites // 32, Wpad))
        if wc > 256:
            wc = (wc // 256) * 256
        n_chunks = math.ceil(Wpad / wc)

    m, gn = _dense_split(
        ea, na_mask, eb, nb_mask, wc=wc, n_chunks=n_chunks, same=same,
    )

    if sa.n_partial or sb.n_partial:
        if sb is not sa and not (
            sa.partial_pos is None
            or sb.partial_pos is None
            or (sa.partial_pos is sb.partial_pos)
            or np.array_equal(sa.partial_pos, sb.partial_pos)
        ):
            raise ValueError(
                "SplitAlignments of a pair must share the partial-site "
                "gather axis — build them with _split_pair(a, b) (or pass "
                "the union positions to split_alignment)."
            )
        wp = max(pa.shape[2], pb.shape[2])
        gp = _gram_partial(
            jnp.asarray(_pad_words(np.asarray(pa), wp)) if pa.shape[2] != wp else pa,
            jnp.asarray(_pad_words(np.asarray(pb), wp)) if pb.shape[2] != wp else pb,
        )
    else:
        gp = jnp.zeros((), jnp.int32)

    cnt_a = _cnt_device(sa)
    cnt_b = _cnt_device(sb) if sb is not sa else cnt_a
    L32 = jnp.int32(L)  # a bare python int would trace as i64 under x64
    D = _assemble_d(m, gp, cnt_a, cnt_b, L32)
    NN = _assemble_nn(gn, cnt_a, cnt_b, L32) if with_nn else None
    return D, NN


def snp_distance_dense_split(sa, sb=None, *, chunk_sites: int | None = None, with_nn=True):
    """Host (numpy) wrapper of snp_distance_split_device."""
    D, NN = snp_distance_split_device(
        sa, sb, chunk_sites=chunk_sites, with_nn=with_nn
    )
    return np.asarray(D), (np.asarray(NN) if NN is not None else None)


@partial(jax.jit, static_argnames=("capacity", "triangle", "with_nn"))
def _extract_coo_packed(D, NN, dist, r0, n_valid, c0=0, *, capacity: int,
                        triangle: bool, with_nn: bool = True):
    """Fused survivor count + COO compaction into ONE flat device array
    ``[1 + 3*capacity]`` = [count, idx..., dvals..., nvals...].

    One array means one host transfer per row block; an unfused path
    (count download -> extraction -> three value downloads) costs 4 host
    round trips, which on a high-latency link (tunneled dev TPUs: tens of
    ms each) dominates the whole sweep.  The count rides along so the
    caller can detect capacity overflow (count > capacity: re-extract
    bigger) or a dense block (2*count > block: download D instead) from
    the same transfer.

    Compaction is a cumsum + vectorised binary search + gather, not
    ``jnp.nonzero`` and not a scatter: survivor s lives at the first flat
    position where the running survivor count reaches s+1
    (``searchsorted`` on the inclusive cumsum), and the three value
    gathers are capacity-sized.  The r2 scatter formulation ([n*m, 3]
    payload scattered by slot) measured 97 ms of the 595 ms n=4096 sweep
    — the 4M-update scatter dominated; the gather form touches O(n*m)
    only in the cumsum.  (Both beat the ``jnp.nonzero`` lowering by ~6x.)
    Slot order == flat row-major order == the reference's emission order
    within a row block.  Requires na*nb < 2^31 (row blocks bound na, so
    this holds for any DB that fits in HBM; asserted below)."""
    na, nb = D.shape
    assert na * nb < 2**31, "row block too large for int32 flat indexing"
    mask = D <= dist
    # local column j is global column j + c0 (c0 > 0 on prefix-triangle
    # blocks whose column space starts at the block's own first row)
    cols_idx = jax.lax.broadcasted_iota(jnp.int32, (na, nb), 1) + c0
    mask &= cols_idx < n_valid
    if triangle:
        rows_idx = jax.lax.broadcasted_iota(jnp.int32, (na, nb), 0) + r0
        mask &= cols_idx > rows_idx
    # Flat row-major inclusive cumsum, computed HIERARCHICALLY (per-row
    # scan + tiny exclusive row-offset scan).  Value-identical to
    # ``jnp.cumsum(mask.ravel())`` but XLA:TPU compiles a scan in time
    # that grows with the scanned-axis length — a flat 1M-element cumsum
    # measured 16-26 s to compile vs <1 s for the 2-D form — and a fresh
    # compile of this kernel (one exists per (shape, capacity)) would
    # otherwise land inside the production sweep.
    inner = jnp.cumsum(mask.astype(jnp.int32), axis=1)
    row_tot = inner[:, -1]
    row_off = jnp.cumsum(row_tot) - row_tot
    csum = (inner + row_off[:, None]).ravel()
    count = csum[-1]
    # flat index of survivor s = first position with csum == s+1; beyond
    # count the search returns n*m and the clipped gather reads garbage
    # that the caller never touches (entries past `count`)
    flatidx = jnp.searchsorted(
        csum, jnp.arange(1, capacity + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    safe = jnp.minimum(flatidx, na * nb - 1)
    nnflat = NN.ravel() if with_nn else D.ravel()
    return jnp.concatenate(
        [count[None], flatidx, D.ravel()[safe], nnflat[safe]]
    )


def _bucket_capacity(want: int, limit: int) -> int:
    """Power-of-two capacities (min 4096) bound jit recompiles."""
    cap = 1 << max(12, int(math.ceil(math.log2(max(1, want)))))
    return min(cap, limit)


_CAPACITY_MEMO: dict = {}  # (na, nb) D shape -> sticky extraction capacity


def _stable_capacity(shape, want: int, limit: int, *, grow: bool = True) -> int:
    """Per-block-shape STICKY extraction capacity.

    jit holds one compiled ``_extract_coo_packed`` per (D shape, capacity)
    pair, and a fresh capacity variant costs a fresh XLA compile — which on
    a TPU backend can take seconds and would land inside the production
    sweep.  Round 4's adaptive density hint picked a different capacity on
    the second stream of a process (cold hint -> 4096, seeded hint ->
    16384+), recompiling mid-benchmark (BENCH_r04's 72x "collapse").  The
    capacity for a given block shape is therefore chosen once per process
    and only ever grows (on overflow), so repeat streams reuse the exact
    compiled variants of the first.

    ``grow=False`` (speculative callers): an existing entry is reused even
    when the density hint asks for more — the hint only seeds capacities
    for never-seen shapes.  ``grow=True`` (the overflow re-extraction,
    where ``want`` is the MEASURED survivor count): the entry grows, so
    the shape stops overflowing from the next block on."""
    cap = _CAPACITY_MEMO.get(shape, 0)
    if cap == 0 or (grow and want > cap):
        cap = max(cap, _bucket_capacity(want, limit))
        _CAPACITY_MEMO[shape] = cap
    return min(cap, limit)


def _unpack_survivors(packed: np.ndarray, capacity: int, count: int, nb_pad: int,
                      c0: int = 0):
    idx = packed[1 : 1 + count].astype(np.int64)
    dvals = packed[1 + capacity : 1 + capacity + count].astype(np.int64)
    nvals = packed[1 + 2 * capacity : 1 + 2 * capacity + count].astype(np.int64)
    return idx // nb_pad, idx % nb_pad + c0, dvals, nvals


def _host_block_sparse(D, NN, dist, r0, n_valid, *, triangle, c0: int = 0):
    """Host-numpy analogue of _stream_block_sparse for dense blocks already
    gathered to the host (multi-process stripes, dense fallbacks).  Same
    row-major emission contract."""
    mask = D <= dist
    cols_idx = np.arange(D.shape[1], dtype=np.int64) + c0
    mask &= cols_idx[None, :] < n_valid
    if triangle:
        rows_idx = np.arange(D.shape[0], dtype=np.int64) + r0
        mask &= cols_idx[None, :] > rows_idx[:, None]
    rows_l, cols_l = np.nonzero(mask)
    return (
        rows_l.astype(np.int64),
        cols_l.astype(np.int64) + c0,
        D[rows_l, cols_l].astype(np.int64),
        NN[rows_l, cols_l].astype(np.int64),
    )


def _stream_block_sparse(D_dev, NN_dev, dist, r0, n_valid, count, *, triangle,
                         c0: int = 0):
    """Threshold + compact one row block on device; download survivors only
    (single fused transfer).  ``n_valid`` bounds the true GLOBAL column
    count (mesh-padded blocks carry dead pad columns beyond it); ``c0`` is
    the block's global column offset (prefix-triangle blocks).  Returns
    (rows_local, cols_global, dvals, nvals) numpy arrays in row-major order
    (``nvals`` is zero-filled when NN_dev is None)."""
    if count == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z.copy(), z.copy(), z.copy()
    nb_pad = int(D_dev.shape[1])
    capacity = _stable_capacity(
        tuple(D_dev.shape), count, int(D_dev.shape[0]) * nb_pad
    )
    with_nn = NN_dev is not None
    packed = to_host(_extract_coo_packed(
        D_dev, NN_dev if with_nn else D_dev, dist, jnp.int32(r0),
        jnp.int32(n_valid), jnp.int32(c0), capacity=capacity, triangle=triangle,
        with_nn=with_nn,
    ))
    return _unpack_survivors(packed, capacity, count, nb_pad, c0)


@partial(jax.jit, static_argnames=("wc", "n_chunks"))
def _gn_dense(n_a, n_b, *, wc: int, n_chunks: int):
    """Dense N-mask gram only (1 channel) — used when a block has too many
    threshold survivors for per-pair popcounts to be cheaper."""
    na, nb = n_a.shape[0], n_b.shape[0]
    W = n_a.shape[1]
    accn = jnp.zeros((na, nb), jnp.int32)
    for c in range(n_chunks):
        if c:
            n_a, n_b, accn = jax.lax.optimization_barrier((n_a, n_b, accn))
        end = min((c + 1) * wc, W)
        an = _unpack_bits(jax.lax.slice_in_dim(n_a, c * wc, end, axis=1))
        bn = _unpack_bits(jax.lax.slice_in_dim(n_b, c * wc, end, axis=1))
        accn = accn + jax.lax.dot_general(
            an, bn, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )
    return accn


def comparable_sites_dense(sa, sb) -> np.ndarray:
    """Dense NN matrix from SplitAlignments via the 1-channel N gram."""
    Wpad, _, na_mask, _ = _split_device(sa)
    if sb is sa:
        nb_mask = na_mask
    else:
        _, _, nb_mask, _ = _split_device(sb)
    # _gn_dense unpacks both operands (two distinct jit parameters, even for
    # a self-comparison — no CSE), so materialised rows = na + nb
    wc, n_chunks = plan_chunks(sa.n_seqs + sb.n_seqs, 1, Wpad)
    gn = np.asarray(_gn_dense(na_mask, nb_mask, wc=wc, n_chunks=n_chunks))
    cnt = sa.cnt_n[:, None] + sb.cnt_n[None, :]
    return (sa.length - cnt + gn).astype(np.int32)


def comparable_sites_pairs(sa, sb, pairs_i, pairs_j, *, batch: int = 65536) -> np.ndarray:
    """nn = L - popcount(N_i | N_j) for selected pairs only (host popcount
    over the packed N masks).  Batched: gathering full mask rows for
    millions of pairs at once would materialise pairs x W words."""
    pairs_i = np.asarray(pairs_i, dtype=np.int64)
    pairs_j = np.asarray(pairs_j, dtype=np.int64)
    out = np.empty(len(pairs_i), dtype=np.int64)
    for s in range(0, len(pairs_i), batch):
        e = min(len(pairs_i), s + batch)
        ni = sa.nmask[pairs_i[s:e]]
        nj = sb.nmask[pairs_j[s:e]]
        out[s:e] = sa.length - popcount_words(ni | nj).sum(axis=-1)
    return out


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


_CHUNK_BYTES_BUDGET = int(os.environ.get("TRACS_TPU_CHUNK_BYTES", 5 << 30))


def _auto_chunk_sites(n: int, channels: int) -> int:
    """Largest site chunk whose expanded int8 channels fit the HBM budget —
    fewer, larger chunks keep the MXU pipeline full (ideally ONE chunk:
    every chunk boundary is an optimization_barrier that stalls the MXU
    behind the next chunk's unpack).  ``n`` counts materialised operand
    rows: na for a self-comparison (dot(x, x) reads one operand), na+nb
    otherwise.  Accounting: ~2 bytes/site/channel/row — 1 for the final
    int8 channel array plus ~1 for the uint8 shift intermediate in
    ``_unpack_bits``, which XLA materialises rather than fusing into the
    dot operand (its own docstring; confirmed by HBM OOMs at the 1-byte
    accounting on 16 GB chips)."""
    sites = _CHUNK_BYTES_BUDGET // max(1, 2 * n * channels)
    return max(8 * 32, min(sites, 64 << 20))


def plan_chunks(rows: int, channels: int, W: int) -> tuple[int, int]:
    """(word-chunk size, chunk count) for a gram over W packed words whose
    expanded int8 channels must fit the HBM budget (see _auto_chunk_sites).
    Chunks stay lane-aligned: multiples of 256 words = 8192 sites (odd chunk
    shapes trigger pathological XLA compiles on some backends)."""
    chunk_sites = _auto_chunk_sites(rows, channels)
    wc = max(8, min(chunk_sites // 32, W))
    if wc > 256:
        wc = (wc // 256) * 256
    return wc, math.ceil(max(W, 1) / wc)


def _pad_words(planes: np.ndarray, w_target: int) -> np.ndarray:
    w = planes.shape[2]
    if w == w_target:
        return planes
    return np.pad(planes, ((0, 0), (0, 0), (0, w_target - w)))


@partial(jax.jit, static_argnames=("rows",), donate_argnums=(0, 1))
def _derive_planes_code2(b0, b1, tailmask, *, rows: int):
    """[rows, W] 2-bit code planes -> [rows, 4, W] packed planes.

    Code mapping (ops/packing.py tn_split_stats): bit0 = C|T, bit1 = G|T at
    singleton sites, both zero at exception (>=2-bit IUPAC) sites — so the
    derived A plane is wrong only at exception bits, which the caller
    patches with the sparse exception scatter.  ``tailmask`` clears the A
    plane's padded tail (padded bits must read "no allele")."""
    del rows
    A = (~b0 & ~b1) & tailmask[None, :]
    C = b0 & ~b1
    G = b1 & ~b0
    T = b0 & b1
    return jnp.stack([A, C, G, T], axis=1)


@partial(jax.jit, static_argnames=("cap",), donate_argnums=(0,))
def _apply_exceptions(planes, exc_idx, exc_pw, exc_m, *, cap: int):
    """Patch the derived planes at exception words: clear the (wrongly
    derived-as-A) exception bits and OR in the true plane words.  Padded
    slots carry an out-of-bounds index (n*4*W) and are DROPPED by the
    scatters — an in-bounds pad index would collide with a real exception
    at that slot (sample 0 / word 0), and ``.at[].set`` duplicate-index
    order is undefined, so the pad's no-op write could clobber the patch."""
    del cap
    n, _, W = planes.shape
    flat = planes.reshape(n, 4 * W)  # scatter in [n*4*W] flat space
    flat = flat.reshape(-1)
    # exc_idx is the A-plane flat offset i*4W + w; other planes sit at +W
    a_cur = flat.at[exc_idx].get(mode="fill", fill_value=0)
    flat = flat.at[exc_idx].set((a_cur & ~exc_m) | exc_pw[:, 0], mode="drop")
    for p in (1, 2, 3):
        off = exc_idx + p * W
        cur = flat.at[off].get(mode="fill", fill_value=0)
        flat = flat.at[off].set(cur | exc_pw[:, p], mode="drop")
    return flat.reshape(n, 4, W)


def _tail_bit_mask(length: int, Wpad: int) -> np.ndarray:
    """Bit-level valid-site mask over Wpad words: 1 for sites < length.
    The code2 derive maps code 0 to 'A', so bits beyond the true length
    must be cleared or padding would read as an A allele."""
    tail = np.zeros(Wpad, dtype=np.uint32)
    full_words, rem = divmod(length, 32)
    tail[:full_words] = 0xFFFFFFFF
    if rem:
        tail[full_words] = np.uint32((1 << rem) - 1)
    return tail


def _code2_exception_arrays(packed: PackedAlignment, ge2, exc_flat, W: int):
    """(exc_i, exc_w, exc_pw [E,4], exc_m [E]) for the >=2-bit IUPAC
    exception words — the shared extraction behind both the one-shot
    payload (_code2_payload) and the chunked overlap upload, so the
    pad-index/drop contract lives in one place."""
    exc_i = exc_flat // W
    exc_w = exc_flat - exc_i * W
    exc_pw = packed.planes[exc_i, :, exc_w].astype(np.uint32)
    exc_m = ge2.reshape(-1)[exc_flat]
    return exc_i, exc_w, exc_pw, exc_m


def _pad_exceptions(exc_idx, exc_pw, exc_m, oob_index: int):
    """Capacity-bucketed exception arrays with OUT-OF-BOUNDS pad indices:
    _apply_exceptions drops pad slots (an in-bounds pad index — 0, say —
    would alias a real exception at sample 0, word 0, and duplicate-index
    scatter order is undefined)."""
    E = int(exc_idx.size)
    cap = max(64, 1 << int(E - 1).bit_length()) if E else 64
    idx = np.full(cap, oob_index, dtype=np.int64)
    idx[:E] = exc_idx
    pw = np.zeros((cap, 4), dtype=np.uint32)
    pw[:E] = exc_pw
    m = np.zeros(cap, dtype=np.uint32)
    m[:E] = exc_m
    return idx, pw, m, cap


def _code2_payload(packed: PackedAlignment, Wpad: int):
    """Host-side compact-upload payload, or None when unavailable or not
    beneficial: (b0_pad, b1_pad, exc_idx[A-plane flat], exc_pw [E,4],
    exc_m [E], capacity).  Bytes on the wire: 8*n*W for the code planes +
    24 per exception word, vs 16*n*W for the raw 4-plane upload — used when
    that is at most half, i.e. E < n*W/3 exception words."""
    c2 = getattr(packed, "_code2", None)
    if c2 is None:
        return None
    b0, b1, ge2 = c2
    n, W = b0.shape
    flat = np.flatnonzero(ge2.reshape(-1))
    if 24 * flat.size >= 8 * n * W:
        return None
    i, w, exc_pw, exc_m = _code2_exception_arrays(packed, ge2, flat, W)
    idx, pw, m, cap = _pad_exceptions(
        i * (4 * Wpad) + w, exc_pw, exc_m, oob_index=n * 4 * Wpad
    )
    return b0, b1, idx, pw, m, cap


def _put_striped(arr: np.ndarray) -> jnp.ndarray:
    """device_put, optionally split into row stripes transferred on
    concurrent threads (TRACS_TPU_UPLOAD_STREAMS>1) — tunneled links can
    carry several streams at once — then concatenated on device.  The env
    var is read per call (like every other TRACS_TPU_* runtime toggle) so
    drivers can set it after import."""
    s = int(os.environ.get("TRACS_TPU_UPLOAD_STREAMS", "1"))
    n = arr.shape[0]
    if s <= 1 or n < 2 * s:
        return jnp.asarray(arr)
    import threading

    bounds = [n * k // s for k in range(s + 1)]
    out = [None] * s
    def put(k):
        out[k] = jnp.asarray(arr[bounds[k]:bounds[k + 1]])
    ths = [threading.Thread(target=put, args=(k,)) for k in range(s)]
    for t in ths:
        t.start()
    for t in ths:
        t.join()
    return jnp.concatenate(out, axis=0)


def _planes_device(packed: PackedAlignment) -> jnp.ndarray:
    """Device-resident (cached) packed planes, word-padded to a multiple of
    256 — uploaded once per alignment (re-upload through a tunneled TPU
    otherwise dominates sweep time).

    When split_alignment's native pass has stashed the 2-bit code planes
    (``_code2``) and exception words are sparse, the transfer sends b0/b1
    (+ the sparse exceptions) — HALF the bytes — and the 4 planes are
    derived on device (``_derive_planes_code2`` + ``_apply_exceptions``);
    bit-identical to the raw upload (tests/test_native.py)."""
    dev = getattr(packed, "_dev_planes", None)
    if dev is None:
        Wpad = ((packed.planes.shape[2] + 255) // 256) * 256
        payload = (
            _code2_payload(packed, Wpad)
            if os.environ.get("TRACS_TPU_CODE2_UPLOAD", "1") != "0"
            else None
        )
        if payload is not None:
            b0, b1, idx, pw, m, cap = payload
            W = b0.shape[1]
            pad = ((0, 0), (0, Wpad - W))
            tail = _tail_bit_mask(packed.length, Wpad)
            d0 = _put_striped(np.pad(b0, pad))
            d1 = _put_striped(np.pad(b1, pad))
            dev = _derive_planes_code2(d0, d1, jnp.asarray(tail),
                                       rows=b0.shape[0])
            dev = _apply_exceptions(
                dev, jnp.asarray(idx), jnp.asarray(pw), jnp.asarray(m),
                cap=cap,
            )
        else:
            dev = _put_striped(_pad_words(packed.planes, Wpad))
        packed._dev_planes = dev
        # the code planes are consumed by the upload; at 10k x 1Mb they
        # hold ~1.1 GB of host RAM if kept for the alignment's lifetime
        if getattr(packed, "_code2", None) is not None:
            packed._code2 = None
    return dev


def _cached_split(packed: PackedAlignment):
    """Build (and cache on the object) the SplitAlignment layout."""
    from tracs_tpu.ops.packing import split_alignment

    split = getattr(packed, "_split_cache", None)
    if split is None:
        split = split_alignment(packed)
        packed._split_cache = split
    return split


def _split_pair(a: PackedAlignment, b: PackedAlignment | None):
    """(sa, sb) SplitAlignments for a comparison pair.

    For a query-vs-db pair the partial-ambiguity tensors of BOTH sides are
    gathered at the union of their partial positions, so the correction
    gram's contraction axis lines up site-for-site (gathering each side at
    its own positions silently multiplies unrelated sites).  Cached on ``a``
    keyed by the partner's identity."""
    from tracs_tpu.ops.packing import partial_site_positions, split_alignment

    if b is None or b is a:
        sa = _cached_split(a)
        return sa, sa
    cache = getattr(a, "_split_pair_cache", None)
    if cache is not None and cache[0] == id(b):
        return cache[1]
    pos = np.union1d(partial_site_positions(a), partial_site_positions(b))
    pair = (split_alignment(a, pos), split_alignment(b, pos))
    a._split_pair_cache = (id(b), pair)
    return pair


def _select_method(a: PackedAlignment, b: PackedAlignment) -> str:
    """Pick the cheaper kernel by MAC count: the split decomposition costs
    ~5/site + 10/partial-site; the general inclusion-exclusion gram ~16/site.
    The split path wins unless partial-ambiguity codes cover >~90% of sites
    (the per-sample partial rate unions across samples)."""
    sa, sb = _split_pair(a, b)
    p = max(sa.n_partial, sb.n_partial)
    return "split" if (5 * a.length + 10 * p) < (16 * a.length) else "mxu"


def _slice_split(sa, r0: int, r1: int):
    import dataclasses as _dc

    return _dc.replace(
        sa,
        excl=sa.excl[r0:r1],
        nmask=sa.nmask[r0:r1],
        partial=sa.partial[r0:r1],
        cnt_n=sa.cnt_n[r0:r1],
        names=sa.names[r0:r1],
    )


def _slice_split_device(sa, r0: int, r1: int):
    """Row-block slice whose device cache is sliced FROM the parent's device
    cache: the block's planes never re-cross the host link (a host-side
    slice would re-upload row_block x 5 x W words per block through the
    tunnel)."""
    blk = _slice_split(sa, r0, r1)
    Wpad, ea, nm, pt = _split_device(sa)
    blk._dev_cache = (Wpad, ea[r0:r1], nm[r0:r1], pt[r0:r1])
    blk._dev_cnt = _cnt_device(sa)[r0:r1]
    return blk


def snp_distance_dense(
    a: PackedAlignment,
    b: PackedAlignment | None = None,
    *,
    method: str = "auto",
    chunk_sites: int | None = None,
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

    if method == "auto":
        method = _select_method(a, b)

    if method == "split":
        sa, sb = _split_pair(a, b)
        D = np.empty((na, nb), dtype=np.int32)
        NN = np.empty((na, nb), dtype=np.int32)
        if b is a and na > row_block and chunk_sites is None:
            # self-comparison: D and NN are symmetric, so compute only the
            # prefix-triangle blocks (cols >= the block's first row) and
            # mirror the transpose — half the device work
            for r0 in range(0, na, row_block):
                r1 = min(na, r0 + row_block)
                Dd, Nd, c0 = snp_distance_split_prefix_device(sa, r0, r1)
                Dh = np.asarray(Dd)[:, r0 - c0 :]
                Nh = np.asarray(Nd)[:, r0 - c0 :]
                D[r0:r1, r0:] = Dh
                D[r0:, r0:r1] = Dh.T
                NN[r0:r1, r0:] = Nh
                NN[r0:, r0:r1] = Nh.T
            return D, NN
        for r0 in range(0, na, row_block):
            r1 = min(na, r0 + row_block)
            sblk = sa if (r0 == 0 and r1 == na) else _slice_split(sa, r0, r1)
            D[r0:r1], NN[r0:r1] = snp_distance_dense_split(
                sblk, sb, chunk_sites=chunk_sites
            )
        return D, NN

    cnt_a = np.asarray(a.counts_n())
    cnt_b = np.asarray(b.counts_n()) if b is not a else cnt_a

    if method == "mxu":
        if chunk_sites is None:
            chunk_sites = _auto_chunk_sites(na + nb, 16)
        dev_b = _planes_device(b)
        dev_a_full = dev_b if b is a else _planes_device(a)
        Wpad = dev_b.shape[2]
        wc = max(8, min(chunk_sites // 32, Wpad))
        if wc > 256:
            wc = (wc // 256) * 256
        n_chunks = math.ceil(Wpad / wc)
    elif method == "popcount":
        dev_b = _planes_device(b) if b is not a else _planes_device(a)
        dev_a_full = dev_b if b is a else _planes_device(a)
    else:
        raise ValueError(f"unknown method {method!r}")

    D = np.empty((na, nb), dtype=np.int32)
    NN = np.empty((na, nb), dtype=np.int32)
    for r0 in range(0, na, row_block):
        r1 = min(na, r0 + row_block)
        dev_a = dev_a_full if (r0 == 0 and r1 == na) else dev_a_full[r0:r1]
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


@partial(jax.jit, static_argnames=("capacity",))
def _mism_positions_kernel(pa, pb, L, *, capacity: int):
    """Per-pair mismatch SNP positions, extracted ON DEVICE.

    pa, pb : [P, 4, W] uint32 gathered plane rows of a pair batch
    returns [P, 1 + capacity] int32 rows: [count, pos_0..pos_cap-1]
    (positions ascending; entries past count are garbage).

    The host filter otherwise downloads the full [P, W] mismatch bitsets —
    ~L/8 bytes per pair (125 KB at 1 Mb) across a ~20 MB/s tunnel — to find
    the ~d set bits; extracting the positions device-side downloads
    4*(capacity+1) bytes per pair instead (~1 KB at d<=200): ~100x less
    transfer and no host bit-unpack."""
    shared = (pa[:, 0] & pb[:, 0]) | (pa[:, 1] & pb[:, 1])
    shared = shared | (pa[:, 2] & pb[:, 2]) | (pa[:, 3] & pb[:, 3])
    bits = _unpack_bits(~shared).astype(jnp.int32)  # [P, W*32], position order
    S = bits.shape[1]
    site_ok = (jnp.arange(S, dtype=jnp.int32) < L)[None, :]
    bits = bits * site_ok
    # hierarchical cumsum along the (up to 1M-long) position axis: XLA:TPU
    # compile time grows with the scanned-axis length (16+ s flat at 1M),
    # so scan fixed 8192-wide chunks + a tiny chunk-offset scan instead —
    # value-identical to ``jnp.cumsum(bits, axis=1)``
    P = bits.shape[0]
    B = 8192
    K = -(-S // B)
    padded = jnp.pad(bits, ((0, 0), (0, K * B - S))).reshape(P, K, B)
    inner = jnp.cumsum(padded, axis=2)
    chunk_tot = inner[:, :, -1]
    chunk_off = jnp.cumsum(chunk_tot, axis=1) - chunk_tot
    csum = (inner + chunk_off[:, :, None]).reshape(P, K * B)[:, :S]
    count = csum[:, -1]
    q = jnp.arange(1, capacity + 1, dtype=jnp.int32)
    pos = jax.vmap(
        lambda c: jnp.searchsorted(c, q, side="left").astype(jnp.int32)
    )(csum)
    return jnp.concatenate([count[:, None], pos], axis=1)


def mismatch_positions_device(
    a: PackedAlignment, b: PackedAlignment, pairs_i, pairs_j, capacity: int,
    *, chunk: int = 256,
):
    """(counts [n_pairs] int64, positions [n_pairs, capacity] int64) from the
    device-resident planes — chunked so the [chunk, L] cumsum stays inside a
    bounded HBM slice next to the pipelined sweep buffers."""
    dev_a = _planes_device(a)
    dev_b = dev_a if b is a else _planes_device(b)
    L32 = jnp.int32(a.length)
    n = len(pairs_i)
    counts = np.empty(n, dtype=np.int64)
    positions = np.empty((n, capacity), dtype=np.int64)
    for s in range(0, n, chunk):
        e = min(n, s + chunk)
        ii = jnp.asarray(np.asarray(pairs_i[s:e], dtype=np.int32))
        jj = jnp.asarray(np.asarray(pairs_j[s:e], dtype=np.int32))
        pa = jnp.take(dev_a, ii, axis=0)
        pb = jnp.take(dev_b, jj, axis=0)
        packed = to_host(_mism_positions_kernel(pa, pb, L32, capacity=capacity))
        counts[s:e] = packed[:, 0]
        positions[s:e] = packed[:, 1:]
    return counts, positions


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


def _cached_compact(a: PackedAlignment, b: PackedAlignment):
    """compact_variant_columns, memoised on the first alignment (streaming
    resume re-enters with the same objects)."""
    key = id(b) if b is not a else None
    cache = getattr(a, "_compact_res", None)
    if cache is not None and cache[0] == key:
        return cache[1]
    res = compact_variant_columns(a, None if b is a else b)
    a._compact_res = (key, res)
    return res


# survivor density (emitted pairs / total pairs) of the last COMPLETED
# stream, feeding the next run's speculative extraction capacities: multi-
# MSA distance runs size the ring stripes / first block from the previous
# file's measured rate instead of the blind 1/64 default
_SURVIVOR_DENSITY_HINT = [None]


def pairsnp_stream(
    fasta: Sequence[str] | Sequence[PackedAlignment],
    dist: int = INT32_MAX,
    filter: bool = False,
    *,
    method: str = "auto",
    row_block: int = 1024,
    start_row: int = 0,
    compact: bool | None = None,
    mesh=None,
):
    """Streaming COO emission for large all-pairs runs.

    Yields ``(r0, r1, names, rows, cols, dvals, filt, nn)`` per row block
    (numpy arrays, reference row-major order within and across blocks).
    Host memory stays O(row_block * n) regardless of sample count, and a
    caller persisting the last completed ``r1`` can resume an interrupted
    run from that row (the tile-cursor checkpoint story for week-long
    all-pairs sweeps).

    Interruptibility: the reference checks ``PyErr_CheckSignals`` inside
    its O(n^2) loop (pairsnp.hpp:384-388); here, on the single-device and
    ShardedSweep paths, the dispatch quantum is one row block — Ctrl-C is
    honoured at every block boundary (the per-block ``np.asarray`` download
    is where Python regains control), so at most one block's device work is
    lost.  Shrink ``row_block`` for a finer quantum; ``tracs-tpu distance
    --resume`` persists the block cursor so an interrupted run restarts at
    the last completed block.  EXCEPTION: the mesh triangle-ring engine
    (RingCoo — self all-pairs from row 0 that fit its HBM budget) computes
    the whole matrix in one dispatch; an interrupt during that dispatch
    loses the sweep and resume restarts the MSA from row 0 (once stripes
    start yielding, the cursor advances per stripe and resume continues
    via ShardedSweep).  Set TRACS_TPU_MESH_RING=0 to trade the ring's
    speed for per-block interruptibility on a mesh.

    ``mesh`` (a jax.sharding dp x sp Mesh) runs every block sweep across
    the mesh: DB samples sharded over dp, packed words over sp, row blocks
    replicated (parallel/allpairs.py::ShardedSweep).  Thresholding and COO
    compaction still happen device-side; emission order and every value
    are identical to the single-device run.  Ignored (with a log note) for
    the non-split cross-check methods.

    ``compact`` (default on; ``TRACS_TPU_COMPACT=0`` disables) drops
    constant alignment columns before the O(n^2) kernels — bit-identical
    outputs (see ops/packing.py::compact_variant_columns), typically
    10-100x fewer sites on real (mostly conserved) alignments.
    """
    from tracs_tpu.ops.recomb import filter_pairs

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

    # variant-site compaction: kernels run on a_k/b_k; names, the filter's
    # genome length and its SNP coordinates stay in original space
    length = a.length
    pos_map = None
    nn_off = 0
    a_k, b_k = a, b
    if compact is None:
        compact = os.environ.get("TRACS_TPU_COMPACT", "1") != "0"
    if compact:
        comp = _cached_compact(a, b)
        if comp is not None:
            a_k, b_k, pos_map, nn_off = comp
            if b is a:
                b_k = a_k

    if method == "auto":
        method = _select_method(a_k, b_k)
    # the block schedule, built ONCE: the overlap engine, the fusion
    # precompute and the main loop must all see the same span list, or
    # precomputed blocks would silently never be popped
    spans = [
        (r0, min(a.n_seqs, r0 + row_block))
        for r0 in range(start_row, a.n_seqs, row_block)
    ]
    sweep = ring = precomputed = None
    if method == "split":
        if filter:
            # mismatch-position extraction reuses the raw 4-plane upload;
            # keep it so the device split derivation doesn't free it
            a_k._keep_planes_device = True
            b_k._keep_planes_device = True
        # the host split build runs FIRST (it is a fast native single pass
        # and stashes the 2-bit upload planes on the alignment), then the
        # one-time device upload — the dominant serial prefix of a large
        # tunneled run (north star: 364 s of raw 4-plane upload at
        # 10k x 1 Mb, halved by the code2 path) — starts on threads so a
        # query-vs-db pair's two transfers ride the link concurrently
        sa, sb = _split_pair(a_k, b_k)
        # overlapped first sweep: when the one-time layout upload is still
        # pending on a single-device self-triangle run, upload it in genome
        # chunks and run every row block's grams chunk-by-chunk as the
        # transfer lands (at 10k x 1 Mb the upload is ~380 s of otherwise
        # serial prefix).  The built layout becomes sa._dev_cache, so this
        # path runs at most once per alignment.
        if (
            mesh is None
            and b_k is a_k
            and not filter
            and os.environ.get("TRACS_TPU_OVERLAP_UPLOAD", "1") != "0"
            and os.environ.get("TRACS_TPU_DEVICE_SPLIT", "1") != "0"
            and getattr(sa, "_dev_cache", None) is None
            and sa.src is not None
            and a_k.planes.shape[0] == sa.n_seqs
            and 16 * a_k.n_seqs * a_k.n_words
            >= int(os.environ.get("TRACS_TPU_OVERLAP_MIN_BYTES", 64 << 20))
            and 9 * sa.n_seqs * (((sa.excl.shape[2] + 255) // 256) * 256) * 4
            <= _DEVICE_SPLIT_BUDGET
        ):
            use_prefix_pre = (
                triangle and os.environ.get("TRACS_TPU_TRIANGLE", "1") != "0"
            )
            if spans:
                precomputed = _overlapped_split_sweep(
                    sa, spans, use_prefix=use_prefix_pre
                )
        upload_threads = []
        if (
            mesh is None
            and precomputed is None
            and os.environ.get("TRACS_TPU_DEVICE_SPLIT", "1") != "0"
        ):
            import threading

            # upload ONLY the sides whose split-device tensors are not yet
            # cached: _split_device frees the raw upload after deriving, so
            # an unconditional upload here re-sent the full planes (hundreds
            # of MB over a tunneled link) on EVERY stream call after the
            # first — the dominant term of BENCH_r04's slow first sweep
            for p, s_layout in {
                id(a_k): (a_k, sa), id(b_k): (b_k, sb)
            }.values():
                Wpad = ((p.planes.shape[2] + 255) // 256) * 256
                cache = getattr(s_layout, "_dev_cache", None)
                if cache is not None and cache[0] == Wpad:
                    continue
                if 9 * p.planes.shape[0] * Wpad * 4 <= _DEVICE_SPLIT_BUDGET:
                    th = threading.Thread(
                        target=_planes_device, args=(p,), daemon=True
                    )
                    th.start()
                    upload_threads.append(th)
        for th in upload_threads:
            th.join()  # _split_device must not race the cached upload
        # narrow-tail block fusion (OFF by default — measured negative):
        # envelope Part C said paired wide+narrow dots run 1.6-1.8x the
        # separate dispatches, but IN the pipelined stream the fused
        # program measured 0.648 s vs 0.448 s per n=4096 sweep
        # (_fuse_experiment.log) — the per-block programs already overlap
        # with extraction/download, and the fused chunk plan shrinks wc
        # for everyone.  Kept behind the flag as a tested cross-check.
        if (
            precomputed is None
            and mesh is None
            and triangle
            and os.environ.get("TRACS_TPU_FUSE_NARROW", "0") == "1"
        ):
            fused = _fused_tail_blocks(
                sa, spans,
                os.environ.get("TRACS_TPU_TRIANGLE", "1") != "0",
            )
            if fused:
                precomputed = fused
        if mesh is not None and int(np.prod(list(mesh.shape.values()))) > 1:
            from tracs_tpu.parallel.allpairs import RingCoo, ShardedSweep

            if (
                triangle
                and start_row == 0
                and os.environ.get("TRACS_TPU_MESH_RING", "1") != "0"
                and RingCoo.fits(sa.n_seqs, mesh, n_words=sa.excl.shape[2])
            ):
                # work-efficient engine: triangle ring + per-stripe device
                # COO extraction (half the MACs of per-block full-width
                # sweeps; one host transfer for all survivors).  Over the
                # HBM stripe budget (RingCoo.fits) the block-streamed
                # ShardedSweep takes over — it holds only one row block of
                # output at a time and checkpoints per block.
                ring = RingCoo(
                    sa, mesh, dist, density_hint=_SURVIVOR_DENSITY_HINT[0]
                )
            else:
                sweep = ShardedSweep(sa, sb, mesh)
    else:
        if mesh is not None:
            import logging

            logging.info("mesh ignored for cross-check method %r", method)
        dev_b_pc = _planes_device(b_k)
        dev_a_pc = dev_b_pc if b_k is a_k else _planes_device(a_k)
        if method == "mxu":
            cnt_a_pc = _cnt_packed_device(a_k)
            cnt_b_pc = cnt_a_pc if b_k is a_k else _cnt_packed_device(b_k)

    total_pairs = (
        a.n_seqs * (a.n_seqs - 1) // 2 if triangle else a.n_seqs * b.n_seqs
    )
    emitted = 0

    if ring is not None:
        for r0, r1, rows_l, cols, dvals, nvals in ring.stripes():
            rows = rows_l + r0
            emitted += len(rows)
            if nn_off:
                nvals = nvals + nn_off
            if filter and len(rows):
                filt = filter_pairs(
                    a_k, b_k, rows, cols, dvals, length, position_map=pos_map
                )
            else:
                filt = np.zeros(len(rows), dtype=np.int64)
            yield r0, r1, names, rows, cols + col_offset, dvals, filt, nvals
        _SURVIVOR_DENSITY_HINT[0] = emitted / max(1, total_pairs)
        return

    # prefix-dot triangle schedule (single-device split path only; the
    # mesh sweep keeps its static full-width DB sharding)
    use_prefix = os.environ.get("TRACS_TPU_TRIANGLE", "1") != "0"

    # speculative extraction capacity: seeded from the last completed
    # stream's survivor density (2x margin), adapted per block within a run
    cap_hint = [1 << 12]
    if _SURVIVOR_DENSITY_HINT[0]:
        cap_hint[0] = max(
            1 << 12,
            int(2 * _SURVIVOR_DENSITY_HINT[0] * row_block * b.n_seqs) + 1,
        )

    def _launch(r0: int, r1: int):
        """Enqueue one block's device work — sweep + fused survivor
        count/COO extraction — without waiting on it.  Dispatch is async,
        so launching block k+1 before downloading block k's packed result
        keeps the chip busy through the host-link round-trip and the
        host-side post-processing (recomb filter) of block k — one-deep
        software pipelining.  NN comes free with the sweep (Gn by-product),
        stays on device, and survivor entries are gathered from it inside
        the same fused extraction, so the whole block costs ONE host
        transfer (count + idx + d + nn packed into one array) unless the
        speculative capacity overflows or the block is dense.  The
        cross-check methods ("mxu", "popcount") share this exact flow —
        only the device sweep that produces (D, NN) differs.

        Returns (D_dev, NN_dev, packed_dev, capacity, c0) where ``c0`` is
        the block's global column offset: triangle blocks on a single
        device run the work-efficient prefix-dot schedule
        (snp_distance_split_prefix_device) whose column space starts at
        the block's own first row instead of 0."""
        c0 = 0
        if precomputed is not None and (r0, r1) in precomputed:
            D_dev, NN_dev, c0 = precomputed.pop((r0, r1))
        elif sweep is not None:
            D_dev, NN_dev = sweep.launch(r0, r1)
        elif method == "split":
            if triangle and use_prefix and not (r0 == 0 and r1 == a.n_seqs):
                D_dev, NN_dev, c0 = snp_distance_split_prefix_device(sa, r0, r1)
            else:
                sblk = (
                    sa if (r0 == 0 and r1 == a.n_seqs)
                    else _slice_split_device(sa, r0, r1)
                )
                D_dev, NN_dev = snp_distance_split_device(sblk, sb, with_nn=True)
        else:
            da = (
                dev_a_pc if (r0 == 0 and r1 == a.n_seqs)
                else dev_a_pc[r0:r1]
            )
            L32 = jnp.int32(a_k.length)
            if method == "mxu":
                wc, n_chunks = plan_chunks(
                    (r1 - r0) + b.n_seqs, 16, dev_b_pc.shape[2]
                )
                g, gq = _gram_mxu(da, dev_b_pc, wc=wc, n_chunks=n_chunks)
                D_dev, NN_dev = _assemble_mxu(
                    g, gq, cnt_a_pc[r0:r1], cnt_b_pc, L32
                )
            elif method == "popcount":
                matches, nunion = _gram_popcount(da, dev_b_pc)
                D_dev, NN_dev = _assemble_popcount(matches, nunion, L32)
            else:
                raise ValueError(f"unknown method {method!r}")
        capacity = _stable_capacity(
            tuple(D_dev.shape), cap_hint[0], (r1 - r0) * int(D_dev.shape[1]),
            grow=False,
        )
        packed_dev = _extract_coo_packed(
            D_dev, NN_dev, dist, jnp.int32(r0), jnp.int32(b.n_seqs),
            jnp.int32(c0), capacity=capacity, triangle=triangle, with_nn=True,
        )
        return D_dev, NN_dev, packed_dev, capacity, c0

    pending = _launch(*spans[0]) if spans else None

    for k, (r0, r1) in enumerate(spans):
        nvals = None
        D_dev, NN_dev, packed_dev, capacity, c0 = pending
        if k + 1 < len(spans):
            pending = _launch(*spans[k + 1])
        block_elems = (r1 - r0) * (b.n_seqs - c0)
        D = NN = None
        packed = to_host(packed_dev)  # the block's ONE host transfer
        count = int(packed[0])
        cap_hint[0] = max(1 << 12, 2 * count)
        nb_pad = int(D_dev.shape[1])
        if 2 * count <= block_elems:
            if count <= capacity:
                rows_l, cols, dvals, nvals = _unpack_survivors(
                    packed, capacity, count, nb_pad, c0
                )
            else:
                # speculative capacity overflowed: re-extract at full size
                rows_l, cols, dvals, nvals = _stream_block_sparse(
                    D_dev, NN_dev, dist, r0, b.n_seqs, count,
                    triangle=triangle, c0=c0,
                )
            rows = rows_l + r0
        else:
            # mesh-padded blocks carry dead pad columns beyond b.n_seqs
            D = to_host(D_dev)[:, : b.n_seqs - c0]
            NN = to_host(NN_dev)[:, : b.n_seqs - c0]
        if D is not None:
            mask = D <= dist
            if triangle:
                cols_idx = np.arange(c0, b.n_seqs)[None, :]
                rows_idx = np.arange(r0, r1)[:, None]
                mask &= cols_idx > rows_idx
            rows, cols = np.nonzero(mask)
            dvals = D[rows, cols].astype(np.int64)
            rows = rows + r0
            cols = cols + c0
        if nvals is None:
            nvals = NN[rows - r0, cols - c0].astype(np.int64)
        if nn_off:
            nvals = nvals + nn_off
        if filter and len(rows):
            filt = filter_pairs(
                a_k, b_k, rows, cols, dvals, length, position_map=pos_map
            )
        else:
            filt = np.zeros(len(rows), dtype=np.int64)
        emitted += len(rows)
        yield r0, r1, names, rows, cols + col_offset, dvals, filt, nvals
    if start_row == 0:  # partial (resumed) runs would skew the density
        _SURVIVOR_DENSITY_HINT[0] = emitted / max(1, total_pairs)


def pairsnp(
    fasta: Sequence[str] | Sequence[PackedAlignment],
    n_threads: int = 1,
    dist: int = INT32_MAX,
    filter: bool = False,
    *,
    method: str = "auto",
    row_block: int = 4096,
    compact: bool | None = None,
    mesh=None,
):
    """Reference-compatible driver (C++ ``pairsnp``, src/pairsnp.hpp:320-458).

    ``fasta`` is 1 or 2 aligned FASTA paths (or PackedAlignments): one file
    gives the all-pairs upper triangle (j > i), two give the query-vs-db
    rectangle.  Emits sparse COO of pairs with d <= dist, in the reference's
    row-major order (i ascending then j — the omp loop order after the
    reference's per-thread merge).  ``n_threads`` is accepted for API
    parity; parallelism comes from the device mesh instead.

    Returns (rows, cols, distances, seq_names, filt_distances,
    n_compared_sites) — Python lists, exactly like the reference binding,
    up to 2^22 surviving pairs; above that the five numeric columns come
    back as int64 numpy arrays instead (len/iteration/indexing-compatible,
    but ~25x smaller than 50M-element PyObject lists — a 10k-sample
    default-threshold call would otherwise build ~5 GB of lists; stream
    with ``pairsnp_stream`` for runs that large).  The unfiltered filt
    column is zero-filled (the reference's combine_vectors default-fill,
    pairsnp.hpp:451-452).
    """
    chunks = []  # per-block (rows, cols, d, filt, nn) numpy tuples
    names = None
    for _r0, _r1, names, rows, cols, dvals, filt, nvals in pairsnp_stream(
        fasta, dist=dist, filter=filter, method=method, row_block=row_block,
        compact=compact, mesh=mesh,
    ):
        chunks.append((rows, cols, dvals, filt, nvals))
    cat = [
        np.concatenate([np.asarray(c[k], dtype=np.int64) for c in chunks])
        if chunks else np.zeros(0, dtype=np.int64)
        for k in range(5)
    ]
    if len(cat[0]) <= 1 << 22:
        cat = [list(col) for col in cat]
    return cat[0], cat[1], cat[2], list(names), cat[3], cat[4]
