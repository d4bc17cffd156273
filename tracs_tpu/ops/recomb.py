"""Recombination / HGT filter: per-pair windowed binomial clustering test.

Reference semantics (src/pairsnp.hpp:223-318, ``filter_recomb`` +
``range_count``): given a pair's mismatch positions,

  * d <= 1            -> filtered distance = d
  * p = d / L, window half-width w = clamp(int(1/p/2 + 1), 50, 5000),
    significance threshold = 0.05 / d
  * for each SNP at position x: count SNPs inside [x-w, x+w+1) and the span
    from the first to the last in-window SNP inclusive (``range_count``
    returns that span, not the window width — pairsnp.hpp:242).
    Keep the SNP when the window holds only itself, or when
    1 - BinomCDF(n=span, p, k=count) >= 0.05/d (not significantly clustered).

Redesign: the reference rescans the SNP bitset per window (O(d) per SNP).
Here mismatch bitsets are unpacked once to sorted position vectors and the
window counts/spans come from two vectorised ``searchsorted`` calls — O(d log d)
per pair — with the binomial survival function evaluated in one vectorised
scipy call over every SNP of every pair in the batch.
"""

from __future__ import annotations

import os

import numpy as np
from scipy.stats import binom

_WIN_MIN = 50
_WIN_MAX = 5000


def mismatch_positions(words_row: np.ndarray) -> np.ndarray:
    """uint32 word bitset -> sorted positions of set bits."""
    bytes_ = words_row.view(np.uint8) if words_row.dtype == np.uint32 else words_row
    bits = np.unpackbits(bytes_, bitorder="little")
    return np.nonzero(bits)[0]


def filter_recomb_single(positions: np.ndarray, length: int) -> int:
    """Filtered SNP count for one pair given sorted mismatch positions."""
    d = len(positions)
    if d <= 1:
        return d
    p = d / length
    w = int(1.0 / p / 2.0 + 1.0)
    w = min(max(w, _WIN_MIN), _WIN_MAX)
    thresh = 0.05 / d

    lo = np.searchsorted(positions, positions - w, side="left")
    hi = np.searchsorted(positions, positions + w + 1, side="left")
    count = hi - lo
    first = positions[lo]
    last = positions[hi - 1]
    span = last - first + 1

    multi = count > 1
    keep = ~multi
    if np.any(multi):
        pv = binom.sf(count[multi], span[multi], p)
        keep_multi = pv >= thresh
        keep = keep.astype(np.int64)
        keep[multi] = keep_multi
        return int(keep.sum())
    return int(keep.sum())


# device path capacity ceiling: pairs with more SNPs than this fall back to
# the host bitset path (the [P, cap] position download would stop paying)
_DEVICE_FILTER_CAP = int(os.environ.get("TRACS_TPU_FILTER_CAP", 8192))


def filter_pairs(
    a, b, rows, cols, dvals, length: int, *,
    position_map: np.ndarray | None = None, chunk: int = 2048,
) -> np.ndarray:
    """Filtered distances for survivor pairs (rows, cols) of packed
    alignments ``a`` x ``b`` — the streaming driver's filter entry point.

    Default route: mismatch SNP positions are extracted ON DEVICE from the
    resident planes (pairsnp.mismatch_positions_device) and only
    [n_pairs, cap] position tables cross the host link — ~100x less
    transfer and no host-side [n_pairs, L/8] bitset materialisation (a
    10k-sample block can emit 10^5 survivors: ~12 GB of bitsets).  Pairs
    whose d exceeds the capacity ceiling (unthresholded runs) stream
    through the host bitset path in fixed-size chunks instead.
    """
    from tracs_tpu.ops.pairsnp import mismatch_positions_device, mismatch_words

    out = np.asarray(dvals, dtype=np.int64).copy()
    todo = np.nonzero(out > 1)[0]
    if todo.size == 0:
        return out

    d_todo = out[todo]
    cap = 1 << max(7, int(np.ceil(np.log2(max(2, d_todo.max())))))
    if cap <= _DEVICE_FILTER_CAP:
        counts, positions = mismatch_positions_device(
            a, b, rows[todo], cols[todo], cap
        )
        # the device mismatch popcount must equal the sweep's distance for
        # every pair (same formula); treat any disagreement as a bug
        if not np.array_equal(counts, d_todo):
            raise AssertionError(
                "device mismatch-position counts disagree with SNP distances"
            )
        valid = np.arange(cap)[None, :] < counts[:, None]
        pos = positions[valid]  # row-major -> sorted within each pair
        if position_map is not None:
            pos = position_map[pos]
        pair_idx = np.repeat(np.arange(todo.size), counts)
        out[todo] = _filter_flat(pair_idx, pos, d_todo, todo.size, length)
        return out

    for s in range(0, len(out), chunk):
        e = min(len(out), s + chunk)
        mism = mismatch_words(a, b, rows[s:e], cols[s:e])
        out[s:e] = filter_recomb_batch(
            mism, out[s:e], length, position_map=position_map
        )
    return out


def filter_recomb_batch(
    mism_words: np.ndarray,
    dvals: np.ndarray,
    length: int,
    *,
    batch: int = 512,
    position_map: np.ndarray | None = None,
) -> np.ndarray:
    """Vectorised filter over a batch of pairs.

    mism_words   : uint32 [n_pairs, W] mismatch bitsets (padding bits cleared)
    dvals        : per-pair SNP distance (== popcount of each bitset)
    length       : alignment length L (ORIGINAL coordinates)
    position_map : optional int64 monotonic map from bitset coordinates to
                   original genome coordinates — used when the bitsets come
                   from a variant-compacted alignment (ops/packing.py::
                   compact_variant_columns); window widths and spans are
                   always evaluated in original coordinates

    Returns int64 [n_pairs] filtered distances.

    Pairs are processed in fixed-size batches (unpacking every bitset at
    once materialises n_pairs x L bytes); within a batch the windowed
    statistics flatten into single searchsorted + binom.sf calls with
    unique-(count, span, d) memoisation.
    """
    out = np.asarray(dvals, dtype=np.int64).copy()
    n = mism_words.shape[0]
    if n == 0:
        return out
    if n > batch:
        for s in range(0, n, batch):
            e = min(n, s + batch)
            out[s:e] = filter_recomb_batch(
                mism_words[s:e], out[s:e], length, batch=batch,
                position_map=position_map,
            )
        return out

    todo = np.nonzero(out > 1)[0]
    if todo.size == 0:
        return out

    # sparse bit extraction: mismatch bitsets have ~d set bits out of L, so
    # only the nonzero WORDS are expanded (vs unpacking n_pairs x L bits)
    sub = mism_words[todo]
    pi_w, wi = np.nonzero(sub)
    wvals = sub[pi_w, wi]
    wbits = (wvals[:, None] >> np.arange(32, dtype=np.uint32)[None, :]) & 1
    bit_row, bit_col = np.nonzero(wbits)
    pair_idx = pi_w[bit_row]
    pos = wi[bit_row] * 32 + bit_col  # sorted per pair (row-major nonzero)
    if position_map is not None:
        pos = position_map[pos]  # monotonic -> stays sorted per pair

    out[todo] = _filter_flat(pair_idx, pos, out[todo], todo.size, length)
    return out


def _filter_flat(pair_idx, pos, d_per_pair, n_todo, length):
    """Windowed-binomial filter core over flat (pair_idx, pos) vectors.

    pair_idx   : int [n_snps] pair segment of each SNP (nondecreasing)
    pos        : int [n_snps] SNP positions, sorted within each segment
                 (ORIGINAL genome coordinates)
    d_per_pair : int64 [n_todo] SNP distance per pair (all > 1)
    Returns int64 [n_todo] kept-SNP counts.  Shared by the host bitset
    path (filter_recomb_batch) and the device position-extraction path
    (filter_pairs)."""
    d_t = np.asarray(d_per_pair, dtype=np.float64)
    w_t = (1.0 / (d_t / length) / 2.0 + 1.0).astype(np.int64)
    w_t = np.clip(w_t, _WIN_MIN, _WIN_MAX)

    # segment boundaries of each pair's positions in the flat vector
    starts = np.searchsorted(pair_idx, np.arange(n_todo), side="left")
    ends = np.searchsorted(pair_idx, np.arange(n_todo), side="right")

    w_flat = w_t[pair_idx]
    # windowed counts via searchsorted restricted to each pair's segment:
    # offset positions by pair_idx * (length + 2*WIN_MAX + 2) so windows can
    # never cross segment boundaries, then one global searchsorted.
    stride = length + 2 * _WIN_MAX + 2
    gpos = pos + pair_idx * stride
    lo = np.searchsorted(gpos, pos - w_flat + pair_idx * stride, side="left")
    hi = np.searchsorted(gpos, pos + w_flat + 1 + pair_idx * stride, side="left")
    count = hi - lo
    first = pos[lo]
    last = pos[hi - 1]
    span = last - first + 1

    multi = count > 1
    keep = np.ones(len(pos), dtype=bool)
    if np.any(multi):
        # (count, span, d) triples repeat heavily across pairs (p and the
        # threshold are functions of d alone): evaluate the binomial survival
        # function once per unique triple — the reference memoises the same
        # way with a hash map (pairsnp.hpp:41-58)
        d_flat = np.asarray(d_per_pair, dtype=np.int64)[pair_idx[multi]]
        triples = np.stack([count[multi], span[multi], d_flat], axis=1)
        uniq, inv = np.unique(triples, axis=0, return_inverse=True)
        pv_u = binom.sf(uniq[:, 0], uniq[:, 1], uniq[:, 2].astype(np.float64) / length)
        keep_u = pv_u >= (0.05 / uniq[:, 2])
        keep[multi] = keep_u[inv]

    kept_per_pair = np.add.reduceat(keep.astype(np.int64), starts)
    # reduceat quirk: empty segments copy the next element; d > 1 segments are
    # never empty here, but guard anyway
    return np.where(ends > starts, kept_per_pair, 0)
