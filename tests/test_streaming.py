"""Streaming row-block driver: identical output to the one-shot path, plus
cursor-based resume and the TRACS-compat API surface."""

import json
import os
import sys

import numpy as np
import pytest

from tracs_tpu.ops.packing import pack_sequences
from tracs_tpu.ops.pairsnp import pairsnp, pairsnp_stream

DATA = os.path.join(os.path.dirname(__file__), "data")


def _collect(stream):
    rows, cols, d, filt, nn = [], [], [], [], []
    names = None
    for r0, r1, nm, r, c, dv, f, n in stream:
        names = nm
        rows += list(r)
        cols += list(c)
        d += list(dv)
        filt += list(f)
        nn += list(n)
    return rows, cols, d, names, filt, nn


@pytest.mark.parametrize("row_block", [1, 3, 100])
def test_stream_matches_oneshot(rng, row_block):
    chars = np.array(list("ACGTN"))
    seqs = ["".join(rng.choice(chars, size=300)) for _ in range(9)]
    packed = pack_sequences(seqs)
    want = pairsnp([packed], dist=150, filter=True)
    got = _collect(pairsnp_stream([packed], dist=150, filter=True, row_block=row_block))
    for w, g in zip(want, got):
        assert list(w) == list(g)


def test_prefix_shape_bucketing(rng):
    """Column-suffix widths are bucketed to repeating jit shapes
    (TRACS_TPU_PREFIX_SHAPES): c0 stays <= r0, widths come from a bounded
    shape set, and a streamed run whose blocks hit c0 > 0 equals the
    one-shot emission exactly."""
    from tracs_tpu.ops.pairsnp import prefix_col_start, schedule_mac_pairs

    n = 600
    widths = set()
    for r0 in range(0, n, 64):
        c0 = prefix_col_start(n, r0)
        assert 0 <= c0 <= r0
        widths.add(n - c0)
    assert len(widths) <= 24
    # executed MACs: between the ideal triangle and the full square
    macs = schedule_mac_pairs(n, 64)
    ideal = sum((min(n, r0 + 64) - r0) * (n - r0) for r0 in range(0, n, 64))
    assert ideal <= macs <= n * n
    assert schedule_mac_pairs(n, 64, triangle=False) == n * n

    chars = np.array(list("ACGTN"))
    seqs = ["".join(rng.choice(chars, size=64)) for _ in range(n)]
    packed = pack_sequences(seqs)
    want = pairsnp([packed], dist=40)
    got = _collect(pairsnp_stream([packed], dist=40, row_block=64))
    for w, g in zip(want, got):
        assert list(w) == list(g)


def test_dense_symmetric_blocks_match_oneshot(rng):
    """Row-blocked self-comparison uses prefix-triangle blocks + transpose
    mirroring; the result must equal the one-shot full matrix exactly."""
    from tracs_tpu.ops.pairsnp import snp_distance_dense

    chars = np.array(list("ACGTNRY"))
    seqs = ["".join(rng.choice(chars, size=300)) for _ in range(37)]
    p = pack_sequences(seqs)
    D1, N1 = snp_distance_dense(p, row_block=8)
    D2, N2 = snp_distance_dense(p, row_block=4096)
    assert np.array_equal(D1, D2) and np.array_equal(N1, N2)


@pytest.mark.parametrize("method", ["mxu", "popcount"])
def test_stream_crosscheck_methods_match_split(rng, method):
    """The cross-check methods share the split path's device-side
    threshold/COO extraction and block pipelining; every emitted value and
    the emission order must match the production split path at streaming
    block sizes, under a selective threshold, and in 2-fasta mode."""
    chars = np.array(list("ACGTNRY"))
    seqs = ["".join(rng.choice(chars, size=257)) for _ in range(10)]
    packed = pack_sequences(seqs)
    want = pairsnp([packed], dist=120, filter=True, method="split")
    got = _collect(
        pairsnp_stream([packed], dist=120, filter=True, method=method, row_block=3)
    )
    for w, g in zip(want, got):
        assert list(w) == list(g)
    pa, pb = pack_sequences(seqs[:6]), pack_sequences(seqs[6:])
    want = pairsnp([pa, pb], dist=150, method="split")
    got = _collect(pairsnp_stream([pa, pb], dist=150, method=method, row_block=2))
    for w, g in zip(want, got):
        assert list(w) == list(g)


def test_stream_two_fasta(rng):
    chars = np.array(list("ACGTN"))
    seqs = ["".join(rng.choice(chars, size=128)) for _ in range(7)]
    pa = pack_sequences(seqs[:4])
    pb = pack_sequences(seqs[4:])
    want = pairsnp([pa, pb], dist=10**9)
    got = _collect(pairsnp_stream([pa, pb], dist=10**9, row_block=2))
    for w, g in zip(want, got):
        assert list(w) == list(g)


@pytest.mark.parametrize("dist", [0, 40, 120, 10**9])
def test_stream_sparse_extraction_vs_host_mask(rng, dist):
    """The device-side COO compaction (count + fixed-capacity nonzero) must
    equal an independent host mask of the dense matrix at every sparsity,
    including d=0 (count may be zero) and all-pairs (dense fallback)."""
    from tracs_tpu.ops.pairsnp import snp_distance_dense

    chars = np.array(list("ACGTN"))
    seqs = ["".join(rng.choice(chars, size=200)) for _ in range(11)]
    packed = pack_sequences(seqs)
    D, NN = snp_distance_dense(packed)
    iu = np.triu_indices(11, k=1)
    keep = D[iu] <= dist
    want_rows = iu[0][keep]
    want_cols = iu[1][keep]
    want_d = D[iu][keep]
    want_nn = NN[iu][keep]

    rows, cols, d, names, filt, nn = _collect(
        pairsnp_stream([packed], dist=dist, row_block=4)
    )
    assert rows == list(want_rows)
    assert cols == list(want_cols)
    assert d == list(want_d)
    assert nn == list(want_nn)


def test_stream_start_row(rng):
    chars = np.array(list("ACGT"))
    seqs = ["".join(rng.choice(chars, size=64)) for _ in range(6)]
    packed = pack_sequences(seqs)
    full = _collect(pairsnp_stream([packed], row_block=2))
    tail = _collect(pairsnp_stream([packed], row_block=2, start_row=4))
    # tail rows are exactly the full-run rows with index >= 4
    keep = [k for k, r in enumerate(full[0]) if r >= 4]
    assert tail[0] == [full[0][k] for k in keep]
    assert tail[2] == [full[2][k] for k in keep]


def test_distance_stage_streaming_matches(tmp_path, monkeypatch):
    from tracs_tpu.stages.distance import main as distance_main

    base = [
        "", "--msa", os.path.join(DATA, "ambig.aln"),
        "--meta", os.path.join(DATA, "dates_ambig.csv"),
    ]
    out1 = str(tmp_path / "oneshot.csv")
    monkeypatch.setattr(sys, "argv", base + ["-o", out1])
    distance_main()

    out2 = str(tmp_path / "stream.csv")
    monkeypatch.setattr(sys, "argv", base + ["-o", out2, "--row-block", "2"])
    distance_main()

    lines1 = open(out1).read().strip().split("\n")
    lines2 = open(out2).read().strip().split("\n")
    assert lines1[0] == lines2[0]
    # identical numeric content (float formatting identical too)
    assert lines1[1:] == lines2[1:]
    # cursor removed on success
    assert not os.path.exists(out2 + ".cursor")


def test_distance_stage_resume(tmp_path, monkeypatch):
    from tracs_tpu.stages.distance import main as distance_main

    out = str(tmp_path / "resume.csv")
    # simulate an interrupted run: cursor says block [0,2) done for msa 0
    full = str(tmp_path / "full.csv")
    monkeypatch.setattr(
        sys, "argv",
        ["", "--msa", os.path.join(DATA, "ambig.aln"), "-o", full,
         "--row-block", "2"],
    )
    distance_main()
    full_lines = open(full).read().strip().split("\n")

    # write partial output = header + rows with sampleA in first block
    first_block = [l for l in full_lines[1:] if l.split(",")[0] in ("seq1", "seq2")]
    with open(out, "w") as fh:
        fh.write(full_lines[0] + "\n")
        for l in first_block:
            fh.write(l + "\n")
    with open(out + ".cursor", "w") as fh:
        json.dump({"msa_index": 0, "next_row": 2}, fh)

    monkeypatch.setattr(
        sys, "argv",
        ["", "--msa", os.path.join(DATA, "ambig.aln"), "-o", out,
         "--row-block", "2", "--resume"],
    )
    distance_main()
    assert open(out).read().strip().split("\n") == full_lines


def test_compat_module():
    import tracs_tpu.compat as TRACS
    from scipy.special import gammaln

    d = TRACS.pairsnp(fasta=[os.path.join(DATA, "ambig.aln")], n_threads=1,
                      dist=10, filter=False)
    assert d[0] == [0, 0, 0, 0, 1, 1, 1, 2, 2, 3]
    lg = gammaln(range(20))
    lp = TRACS.lprob_k_given_N(7, 4, 0.16963, 3, 52, lg)
    assert abs(lp[0] + 17.9565184209608) < 1e-6
    p0, eK = TRACS.trans_dist([0], [0.002737907006988508], 29.903, 73.0, 0.01)
    assert abs(np.exp(p0[0]) - 0.23794988406662973) < 1e-6
    post = TRACS.calculate_posteriors(np.ones((2, 4)), [1.0, 0.5, 0.2, 0.1], False, 0.0)
    assert post.shape == (2, 4)


def test_expected_k_api():
    from tracs_tpu.models.transcluster import expected_k, upper_bound_E

    eK = expected_k(0, 0.002737907006988508, 29.903, 73.0, 0.01)
    assert abs(eK - 2.6335200453700187) < 1e-6
    ub = upper_bound_E(0.002737907006988508, 29.903, 73.0, 0)
    assert ub > eK  # it is an upper bound
