"""Variant-site compaction (ops/packing.py::compact_variant_columns).

Bit-exactness contract: the compacted path must return EXACTLY the same
(rows, cols, d, filt, nn) as the uncompacted one — constant nonzero columns
contribute one match per pair (zero distance offset by construction), the
comparable-site offset is L - V - droppedN, and the recombination filter
sees original genome coordinates through the position map.
"""

import numpy as np
import pytest

from tracs_tpu.ops.packing import (
    compact_variant_columns,
    pack_sequences,
)
from tracs_tpu.ops.pairsnp import pairsnp, pairsnp_stream


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def _mostly_conserved(rng, n, L, n_var, alphabet="ACGTNRYX-"):
    """n sequences over a conserved base with n_var mutated columns."""
    base = rng.choice(np.array(list("ACGT")), size=L)
    var_cols = rng.choice(L, size=n_var, replace=False)
    seqs = []
    for _ in range(n):
        s = base.copy()
        hit = rng.random(n_var) < 0.5
        s[var_cols[hit]] = rng.choice(np.array(list(alphabet)), size=int(hit.sum()))
        seqs.append("".join(s))
    return seqs


def _run(packed, dist, filter, compact):
    return pairsnp(packed, dist=dist, filter=filter, compact=compact)


@pytest.mark.parametrize("dist", [0, 3, 10**9])
@pytest.mark.parametrize("filter", [False, True])
def test_compact_matches_full_single(rng, dist, filter):
    seqs = _mostly_conserved(rng, 9, 700, 60)
    a = pack_sequences(seqs)
    b = pack_sequences(seqs)  # separate object: independent caches
    got = _run([a], dist, filter, compact=True)
    want = _run([b], dist, filter, compact=False)
    for g, w in zip(got, want):
        assert list(g) == list(w)


def test_compact_matches_full_two_fasta(rng):
    qs = _mostly_conserved(rng, 6, 512, 40)
    # db shares the conserved backbone (same rng draw trick: mutate a copy)
    db = [q[::-1][::-1] for q in _mostly_conserved(rng, 5, 512, 40)]
    # force a shared backbone so compaction actually triggers
    base = qs[0]
    db = [base[:256] + d[256:] for d in db]
    a1, b1 = pack_sequences(qs), pack_sequences(db)
    a2, b2 = pack_sequences(qs), pack_sequences(db)
    got = pairsnp([a1, b1], dist=10**9, filter=True, compact=True)
    want = pairsnp([a2, b2], dist=10**9, filter=True, compact=False)
    for g, w in zip(got, want):
        assert list(g) == list(w)


def test_compact_all_constant(rng):
    seqs = ["ACGT" * 50] * 5
    got = pairsnp([pack_sequences(seqs)], dist=10**9, compact=True)
    want = pairsnp([pack_sequences(seqs)], dist=10**9, compact=False)
    for g, w in zip(got, want):
        assert list(g) == list(w)
    # every pair: d=0, nn=200
    assert all(d == 0 for d in got[2])
    assert all(nn == 200 for nn in got[5])


def test_compact_constant_N_columns(rng):
    # constant-N columns shift nn for every pair; d unaffected
    base = list("ACGT" * 40)
    for i in (3, 17, 90):
        base[i] = "N"
    seqs = []
    for k in range(6):
        s = base.copy()
        s[5] = "ACGT"[k % 4]  # one variant column
        seqs.append("".join(s))
    got = pairsnp([pack_sequences(seqs)], dist=10**9, compact=True)
    want = pairsnp([pack_sequences(seqs)], dist=10**9, compact=False)
    for g, w in zip(got, want):
        assert list(g) == list(w)
    assert all(nn == 157 for nn in got[5])  # 160 - 3 constant Ns


def test_compact_positions_oracle(rng):
    seqs = _mostly_conserved(rng, 8, 400, 30)
    p = pack_sequences(seqs)
    res = compact_variant_columns(p)
    assert res is not None
    a_c, b_c, pos, nn_off = res
    assert b_c is a_c
    nib = p.nibbles()
    want = np.nonzero((nib != nib[0]).any(axis=0))[0]
    assert list(pos) == list(want)
    assert (a_c.nibbles() == nib[:, pos]).all()
    # no constant-N columns here
    assert nn_off == p.length - len(pos)


def test_compact_declines_on_diverse_data(rng):
    chars = np.array(list("ACGT"))
    seqs = ["".join(rng.choice(chars, size=300)) for _ in range(6)]
    assert compact_variant_columns(pack_sequences(seqs)) is None


def test_compact_streaming_resume(rng):
    seqs = _mostly_conserved(rng, 10, 600, 50)
    p = pack_sequences(seqs)
    full = list(pairsnp_stream([p], dist=10**9, row_block=3, compact=True))
    resumed = list(
        pairsnp_stream([p], dist=10**9, row_block=3, start_row=6, compact=True)
    )
    assert [blk[0] for blk in resumed] == [blk[0] for blk in full if blk[0] >= 6]
    for got, want in zip(resumed, [blk for blk in full if blk[0] >= 6]):
        for g, w in zip(got[3:], want[3:]):
            assert list(g) == list(w)


def test_compact_filter_coordinates(rng):
    """The filter's windows depend on ORIGINAL coordinates: SNPs clustered
    tightly in original space must still be dropped after compaction."""
    L = 20000
    base = list("A" * L)
    s1 = base.copy()
    # 8 SNPs packed into 60 bp (clustered -> filtered out) + 4 spread SNPs
    for x in range(1000, 1060, 8):
        s1[x] = "C"
    for x in (5000, 9000, 13000, 17000):
        s1[x] = "G"
    seqs = ["".join(base), "".join(s1)]
    got = pairsnp([pack_sequences(seqs)], dist=10**9, filter=True, compact=True)
    want = pairsnp([pack_sequences(seqs)], dist=10**9, filter=True, compact=False)
    for g, w in zip(got, want):
        assert list(g) == list(w)
    assert got[2][0] == 12
    assert got[4][0] < 12  # the clustered run must be filtered
