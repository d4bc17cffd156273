import numpy as np
from scipy.stats import binom

from tracs_tpu.ops.packing import pack_sequences
from tracs_tpu.ops.pairsnp import mismatch_words, pairsnp
from tracs_tpu.ops.recomb import filter_recomb_batch, filter_recomb_single


def oracle_filter(positions, length):
    """Independent per-window rescan port of the reference filter_recomb +
    range_count (src/pairsnp.hpp:223-318): span runs from the first to the
    last SNP inside the window, CDF is Binom(span, p) at count."""
    d = len(positions)
    if d <= 1:
        return d
    p = d / length
    w = int(1.0 / p / 2.0 + 1.0)
    w = min(max(w, 50), 5000)
    thr = 0.05 / d
    kept = 0
    pos = np.asarray(positions)
    for x in pos:
        left, right = max(0, x - w), min(length, x + w + 1)
        inwin = pos[(pos >= left) & (pos < right)]
        count = len(inwin)
        if count > 1:
            span = inwin[-1] - inwin[0] + 1
            pv = 1.0 - binom.cdf(count, span, p)
            if pv >= thr:
                kept += 1
        else:
            kept += 1
    return kept


def positions_to_words(positions, length):
    bits = np.zeros((((length + 31) // 32) * 32,), dtype=np.uint8)
    bits[np.asarray(positions, dtype=int)] = 1
    packed = np.packbits(bits, bitorder="little")
    return packed.view(np.uint32)[None, :]


def test_trivial_counts():
    assert filter_recomb_single(np.array([], dtype=int), 1000) == 0
    assert filter_recomb_single(np.array([7]), 1000) == 1


def test_clustered_snps_removed():
    # 5 SNPs tightly clustered in 2000 bp + 3 isolated: the cluster should be
    # flagged as significantly dense and dropped
    length = 200_000
    pos = np.array([100, 110, 120, 130, 140, 50_000, 120_000, 190_000])
    got = filter_recomb_single(pos, length)
    want = oracle_filter(pos, length)
    assert got == want
    assert got == 3  # only the isolated SNPs survive


def test_random_agreement_with_oracle(rng):
    for trial in range(20):
        length = int(rng.integers(500, 50_000))
        d = int(rng.integers(2, 60))
        pos = np.sort(rng.choice(length, size=d, replace=False))
        got = filter_recomb_single(pos, length)
        want = oracle_filter(pos, length)
        assert got == want, (trial, length, d)


def test_batch_matches_single(rng):
    length = 10_000
    words = []
    dvals = []
    expects = []
    for _ in range(15):
        d = int(rng.integers(0, 40))
        pos = np.sort(rng.choice(length, size=d, replace=False))
        words.append(positions_to_words(pos, length))
        dvals.append(d)
        expects.append(oracle_filter(pos, length))
    mism = np.concatenate(words, axis=0)
    got = filter_recomb_batch(mism, np.array(dvals), length)
    assert list(got) == expects


def test_end_to_end_filter_driver(rng):
    # full pairsnp with filter=True on sequences whose mismatches include a
    # dense recombination-like block
    L = 20_000
    base = rng.choice(list("ACGT"), size=L)
    s1 = base.copy()
    s2 = base.copy()
    # dense block of 30 SNPs within 300bp, plus 4 scattered SNPs
    block = np.arange(5_000, 5_300, 10)
    for x in block:
        s2[x] = {"A": "C", "C": "G", "G": "T", "T": "A"}[s2[x]]
    scattered = [1_000, 9_000, 14_000, 19_000]
    for x in scattered:
        s2[x] = {"A": "G", "C": "T", "G": "A", "T": "C"}[s2[x]]
    packed = pack_sequences(["".join(s1), "".join(s2)])
    r, c, d, names, f, nn = pairsnp([packed], dist=10**9, filter=True)
    assert d == [34]
    pos = np.sort(np.concatenate([block, scattered]))
    assert f == [oracle_filter(pos, L)]
    assert f[0] <= 4 + len(block)  # filtered never exceeds raw
    mism = mismatch_words(packed, packed, [0], [1])
    bits = np.unpackbits(mism.view(np.uint8), bitorder="little")
    assert list(np.nonzero(bits)[0]) == list(pos)


def test_filter_pairs_device_positions_match_host(rng):
    """The device position-extraction route of filter_pairs must agree with
    the host bitset route exactly, incl. under variant compaction."""
    import tracs_tpu.ops.recomb as rc
    from tracs_tpu.ops.packing import compact_variant_columns
    from tracs_tpu.ops.recomb import filter_pairs

    # clustered + scattered SNPs so the windowed test has work to do
    L = 4000
    base = rng.choice(list("ACGT"), size=L)
    seqs = []
    for k in range(10):
        s = base.copy()
        n_mut = int(rng.integers(2, 60))
        where = rng.choice(L, size=n_mut, replace=False)
        if k % 2:  # half the samples get a clustered patch too
            start = int(rng.integers(0, L - 60))
            where = np.concatenate([where, np.arange(start, start + 25)])
        for x in where:
            s[x] = {"A": "C", "C": "G", "G": "T", "T": "A"}[s[x]]
        seqs.append("".join(s))
    p = pack_sequences(seqs)
    ii, jj = np.triu_indices(10, k=1)
    from tracs_tpu.ops.pairsnp import snp_distance_dense

    D, _ = snp_distance_dense(p)
    dvals = D[ii, jj].astype(np.int64)

    dev = filter_pairs(p, p, ii, jj, dvals, L)
    try:
        cap_bak = rc._DEVICE_FILTER_CAP
        rc._DEVICE_FILTER_CAP = 0  # force the host bitset route
        host = filter_pairs(p, p, ii, jj, dvals, L)
    finally:
        rc._DEVICE_FILTER_CAP = cap_bak
    assert np.array_equal(dev, host)
    assert (dev <= dvals).all() and (dev[dvals > 20] < dvals[dvals > 20]).any()

    # compacted coordinates + position map: same answers as uncompacted
    comp = compact_variant_columns(p)
    assert comp is not None
    pk, _, pos_map, _ = comp
    dev_c = filter_pairs(pk, pk, ii, jj, dvals, L, position_map=pos_map)
    assert np.array_equal(dev_c, dev)


def test_native_keep_pass_matches_numpy_core(rng):
    """The single-pass native filter (tn_filter_windows: inline table
    lookups + per-pair accumulation, incl. the count > _SF_TABLE_CAP
    overflow resolution) must agree with the pure-numpy searchsorted core
    on data mixing sparse and heavily clustered windows."""
    from tracs_tpu.ops import recomb

    length = 200_000
    segs = []
    dvals = []
    for i in range(200):
        d = int(rng.integers(2, 120))
        pos = np.sort(rng.choice(length, size=d, replace=False))
        if i % 4 == 0 and d > 40:
            # dense cluster: >_SF_TABLE_CAP SNPs inside one window to force
            # the overflow branch
            base = int(rng.integers(0, length - 600))
            pos[: d // 2] = np.sort(
                rng.choice(500, size=d // 2, replace=False) + base
            )
            pos = np.sort(pos)
            d = len(np.unique(pos))
            pos = np.unique(pos)
        segs.append(pos.astype(np.int64))
        dvals.append(len(pos))
    pair_idx = np.repeat(np.arange(len(segs)), [len(s) for s in segs])
    pos_flat = np.concatenate(segs)
    d_arr = np.asarray(dvals, dtype=np.int64)

    native = recomb._filter_flat(pair_idx, pos_flat, d_arr, len(segs), length)

    # numpy core: the searchsorted formulation of _window_stats, inlined so
    # the native library cannot shortcut it
    w_t = recomb._window_w(d_arr, length)
    bounds = np.searchsorted(pair_idx, np.arange(len(segs) + 1), side="left")
    w_flat = w_t[pair_idx]
    stride = length + 2 * recomb._WIN_MAX + 2
    gpos = pos_flat + pair_idx * stride
    lo = np.searchsorted(gpos, pos_flat - w_flat + pair_idx * stride, "left")
    hi = np.searchsorted(gpos, pos_flat + w_flat + 1 + pair_idx * stride, "left")
    count = (hi - lo).astype(np.int32)
    span = pos_flat[hi - 1] - pos_flat[lo] + 1
    multi = count > 1
    keep = np.ones(len(pos_flat), dtype=bool)
    d_u, d_rank = np.unique(d_arr, return_inverse=True)
    keep[multi] = recomb._keep_lookup(
        count[multi], span[multi], d_u, d_rank[pair_idx[multi]], length
    )
    kept = np.add.reduceat(keep.astype(np.int64), bounds[:-1])
    expected = np.where(bounds[1:] > bounds[:-1], kept, 0)

    assert np.array_equal(native, expected)
    # and against the per-pair oracle
    for s, pos in enumerate(segs):
        assert native[s] == oracle_filter(pos, length), s
