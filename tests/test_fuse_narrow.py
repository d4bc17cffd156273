"""Narrow-tail block fusion (_dense_split_ranged2): bit-identical to the
per-block path, across distinct column-suffix buckets."""

import numpy as np



def _stream_all(packed, **kw):
    from tracs_tpu.ops.pairsnp import pairsnp_stream

    outs = []
    for _r0, _r1, _names, rows, cols, dvals, _f, nn in pairsnp_stream(
        [packed], dist=10**6, compact=False, **kw
    ):
        outs.append((rows, cols, dvals, nn))
    return tuple(np.concatenate([o[i] for o in outs]) for i in range(4))


def test_fused_tail_bit_identical_tiny(rng, monkeypatch):
    """Tiny n: every non-first span qualifies as tail (c0=0 buckets)."""
    from tracs_tpu.ops import packing

    seqs = ["".join(rng.choice(list("ACGTN"), size=3000)) for _ in range(80)]
    packed = packing.pack_sequences(seqs)
    monkeypatch.setenv("TRACS_TPU_OVERLAP_UPLOAD", "0")
    monkeypatch.setenv("TRACS_TPU_FUSE_NARROW", "1")
    got = _stream_all(packed, row_block=16)

    packed2 = packing.pack_sequences(seqs)
    monkeypatch.setenv("TRACS_TPU_FUSE_NARROW", "0")
    want = _stream_all(packed2, row_block=16)
    for g, w in zip(got, want):
        assert np.array_equal(g, w)


def test_fused_tail_bit_identical_distinct_buckets(rng, monkeypatch):
    """n > 6144 so the tail spans carry DISTINCT c0 buckets and the fused
    kernel's shared-suffix slicing (bb2 = bb1[c02-c01:]) is exercised for
    c02 > c01."""
    from tracs_tpu.ops import packing
    from tracs_tpu.ops.pairsnp import _fused_tail_blocks, prefix_col_start

    n, L = 6200, 600
    seqs = ["".join(rng.choice(list("ACGT"), size=L)) for _ in range(n)]
    packed = packing.pack_sequences(seqs)
    # sanity: the tail really has two distinct suffix buckets at rb=1024
    c0s = {
        prefix_col_start(n, r0)
        for r0 in range(1024, n, 1024)
        if n - prefix_col_start(n, r0) <= 3072
    }
    assert len(c0s) >= 2

    monkeypatch.setenv("TRACS_TPU_OVERLAP_UPLOAD", "0")
    monkeypatch.setenv("TRACS_TPU_FUSE_NARROW", "1")
    got = _stream_all(packed, row_block=1024)

    packed2 = packing.pack_sequences(seqs)
    monkeypatch.setenv("TRACS_TPU_FUSE_NARROW", "0")
    want = _stream_all(packed2, row_block=1024)
    for g, w in zip(got, want):
        assert np.array_equal(g, w)
