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


def _window_w(d, length):
    """Per-pair window half-width (reference pairsnp.hpp:266-271):
    clamp(1/(2p) + 1, WIN_MIN, WIN_MAX) with p = d/L, truncated to int."""
    d_t = np.asarray(d, dtype=np.float64)
    w = (1.0 / (d_t / length) / 2.0 + 1.0).astype(np.int64)
    return np.clip(w, _WIN_MIN, _WIN_MAX)


def _window_stats(pos, bounds, w_t, pair_idx, length):
    """Per-SNP (count, span) of in-window neighbours.  Native two-pointer
    sweep (O(n_snps)); numpy fallback runs two global searchsorted passes
    over positions offset by a per-pair stride."""
    from tracs_tpu.runtime.native import native_window_stats

    res = native_window_stats(pos, bounds, w_t)
    if res is not None:
        return res

    w_flat = w_t[pair_idx]
    # windows can never cross segment boundaries after a stride offset
    stride = length + 2 * _WIN_MAX + 2
    gpos = pos + pair_idx * stride
    lo = np.searchsorted(gpos, pos - w_flat + pair_idx * stride, side="left")
    hi = np.searchsorted(gpos, pos + w_flat + 1 + pair_idx * stride, side="left")
    span = pos[hi - 1] - pos[lo] + 1
    return (hi - lo).astype(np.int32), span


# keep-decision tables: for a given (d, length) the window width, the
# success probability p = d/L and the significance threshold 0.05/d are all
# fixed, so the keep decision is a pure function of (count, span) — a small
# bool table per d (count <= _SF_TABLE_CAP covers essentially every window;
# larger counts fall through to direct sf evaluation).  Replaces the
# reference's per-(count, span, p) hash-map memoisation (pairsnp.hpp:41-58)
# and the previous per-batch np.unique over triples, whose structured sort
# dominated the filter (measured 39s of a 47s batch at 200k pairs).
_SF_TABLE_CAP = 16
_keep_tables: dict = {}


def _keep_table(d, length):
    """bool [(_SF_TABLE_CAP - 1), 2w + 2] — keep[count - 2, span]."""
    key = (d, length)
    tab = _keep_tables.get(key)
    if tab is None:
        if len(_keep_tables) > 4096:  # bound process-level growth
            _keep_tables.clear()
        w = int(_window_w(d, length)[()])
        spans = np.arange(2 * w + 2, dtype=np.int64)
        cnts = np.arange(2, _SF_TABLE_CAP + 1, dtype=np.int64)
        pv = binom.sf(cnts[:, None], spans[None, :], d / length)
        tab = pv >= (0.05 / d)
        _keep_tables[key] = tab
    return tab


def _keep_lookup(count, span, d_u, d_inv_flat, length):
    """keep iff binom.sf(count, span, d/L) >= 0.05/d, for count > 1.
    ``d_u``/``d_inv_flat``: unique pair distances and each SNP's rank into
    them (ranking happens at the pair level — re-deriving it from the flat
    per-SNP d vector would sort 10^8 elements)."""
    keep = np.empty(len(count), dtype=bool)
    small = count <= _SF_TABLE_CAP
    if np.any(small):
        cs, ss = count[small], span[small]
        d_inv = d_inv_flat[small]
        tabs = [_keep_table(int(dv), length) for dv in d_u]
        widths = np.array([t.shape[1] for t in tabs], dtype=np.int64)
        offs = np.concatenate([[0], np.cumsum(widths * (_SF_TABLE_CAP - 1))])
        flat = np.concatenate([t.ravel() for t in tabs])
        idx = offs[d_inv] + (cs.astype(np.int64) - 2) * widths[d_inv] + ss
        keep[small] = flat[idx]
    big = ~small
    if np.any(big):
        # rare (heavily clustered windows): unique on a packed scalar key —
        # count and span are both <= 2*WIN_MAX + 1, d is ranked, so the key
        # stays far below 2^63
        sb = np.int64(2 * _WIN_MAX + 2)
        nd = np.int64(len(d_u))
        key = (count[big].astype(np.int64) * sb + span[big]) * nd + d_inv_flat[big]
        uniq, inv = np.unique(key, return_inverse=True)
        du = np.asarray(d_u)[uniq % nd]
        rem = uniq // nd
        pv = binom.sf(rem // sb, rem % sb, du.astype(np.float64) / length)
        keep[big] = (pv >= 0.05 / du)[inv]
    return keep


def _filter_flat_native(pos, bounds, w_t, d_per_pair, length):
    """One native pass: (count, span) two-pointer sweep with the keep
    decision resolved inline from per-pair tables — no flat [n_snps] numpy
    passes at all (those dominated the filter at 10^8 SNPs).  Returns
    int64 kept[n_pairs] or None when the native library is unavailable."""
    from tracs_tpu.runtime.native import native_filter_windows

    d_u, d_rank = np.unique(
        np.asarray(d_per_pair, dtype=np.int64), return_inverse=True
    )
    tabs = [_keep_table(int(dv), length) for dv in d_u]
    sizes = np.array([t.size for t in tabs], dtype=np.int64)
    offs_u = np.concatenate([[0], np.cumsum(sizes)])
    flat = np.concatenate(
        [np.ascontiguousarray(t, dtype=np.uint8).ravel() for t in tabs]
    )
    widths_u = np.array([t.shape[1] for t in tabs], dtype=np.int64)
    res = native_filter_windows(
        pos, bounds, w_t, flat, offs_u[:-1][d_rank], widths_u[d_rank],
        _SF_TABLE_CAP,
    )
    if res is None:
        return None
    kept, ovf = res
    if ovf.any():
        # rare: windows holding more than _SF_TABLE_CAP SNPs — recompute
        # (count, span) via the native stats pass and subtract the
        # rejected ones per pair (the keep pass counted them provisionally)
        from tracs_tpu.runtime.native import native_window_stats

        idx = np.nonzero(ovf)[0]
        snp_pair = np.searchsorted(bounds, idx, side="right") - 1
        count, span = native_window_stats(pos, bounds, w_t)
        ovf_keep = _keep_lookup(
            count[idx], span[idx], d_u, d_rank[snp_pair], length
        )
        rejects = np.bincount(
            snp_pair[~ovf_keep], minlength=len(kept)
        ).astype(np.int64)
        kept -= rejects
    return kept


def _filter_flat(pair_idx, pos, d_per_pair, n_todo, length):
    """Windowed-binomial filter core over flat (pair_idx, pos) vectors.

    pair_idx   : int [n_snps] pair segment of each SNP (nondecreasing)
    pos        : int [n_snps] SNP positions, sorted within each segment
                 (ORIGINAL genome coordinates)
    d_per_pair : int64 [n_todo] SNP distance per pair (all > 1)
    Returns int64 [n_todo] kept-SNP counts.  Shared by the host bitset
    path (filter_recomb_batch) and the device position-extraction path
    (filter_pairs)."""
    w_t = _window_w(d_per_pair, length)
    bounds = np.searchsorted(pair_idx, np.arange(n_todo + 1), side="left")
    kept = _filter_flat_native(pos, bounds, w_t, d_per_pair, length)
    if kept is not None:
        return np.where(bounds[1:] > bounds[:-1], kept, 0)
    count, span = _window_stats(pos, bounds, w_t, pair_idx, length)

    multi = count > 1
    keep = np.ones(len(pos), dtype=bool)
    if np.any(multi):
        d_u, d_rank = np.unique(
            np.asarray(d_per_pair, dtype=np.int64), return_inverse=True
        )
        d_inv_flat = d_rank[pair_idx[multi]]
        keep[multi] = _keep_lookup(
            count[multi], span[multi], d_u, d_inv_flat, length
        )

    kept_per_pair = np.add.reduceat(keep.astype(np.int64), bounds[:-1])
    # reduceat quirk: empty segments copy the next element; d > 1 segments are
    # never empty here, but guard anyway
    return np.where(bounds[1:] > bounds[:-1], kept_per_pair, 0)
