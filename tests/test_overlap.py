"""Overlapped first sweep (chunked upload + chunk-major grams) is
bit-identical to the one-shot path, and leaves a usable device cache
(VERDICT r4 item 3b)."""

import os

import numpy as np
import pytest


def _toy_seqs(rng, n=37, L=9000, with_iupac=True):
    chars = list("ACGT") + (list("NRYMK") if with_iupac else [])
    seqs = ["".join(rng.choice(chars, size=L)) for _ in range(n)]
    # leading IUPAC in the first sequence: the chunk-local exception patch
    # must handle flat index 0
    if with_iupac:
        seqs[0] = "M" + seqs[0][1:]
    return seqs


def _toy(rng, n=37, L=9000, with_iupac=True):
    from tracs_tpu.ops import packing

    return packing.pack_sequences(_toy_seqs(rng, n, L, with_iupac))


def _stream_all(packed, **kw):
    from tracs_tpu.ops.pairsnp import pairsnp_stream

    out = []
    for r0, r1, _names, rows, cols, dvals, filt, nn in pairsnp_stream(
        [packed], dist=10**6, compact=False, **kw
    ):
        out.append((rows, cols, dvals, nn))
    rows = np.concatenate([o[0] for o in out])
    order = None
    return (
        rows,
        np.concatenate([o[1] for o in out]),
        np.concatenate([o[2] for o in out]),
        np.concatenate([o[3] for o in out]),
    )


@pytest.mark.parametrize("with_iupac", [True, False])
def test_overlap_bit_identical(rng, monkeypatch, with_iupac):
    from tracs_tpu.ops import packing

    seqs = _toy_seqs(rng, with_iupac=with_iupac)
    packed = packing.pack_sequences(seqs)
    monkeypatch.setenv("TRACS_TPU_OVERLAP_MIN_BYTES", "0")
    monkeypatch.setenv("TRACS_TPU_OVERLAP_CHUNKS", "4")
    got = _stream_all(packed, row_block=16)
    assert getattr(packed._split_cache, "_dev_cache", None) is not None

    packed2 = packing.pack_sequences(seqs)
    monkeypatch.setenv("TRACS_TPU_OVERLAP_UPLOAD", "0")
    want = _stream_all(packed2, row_block=16)
    for g, w in zip(got, want):
        assert np.array_equal(g, w)


def test_overlap_tail_chunk_narrower_than_chunk_w(rng, monkeypatch):
    """Wpad not divisible by the chunk width: the tail chunk must be cut
    to its true width.  A full-width tail makes XLA CLAMP the dynamic
    slice/update start and silently corrupt the layout — the 10k
    north-star run produced 93,850 rows instead of 249,906 from exactly
    this (L=1 Mb -> Wpad=31488, 8 chunks -> chunk_w=4096, 31488 % 4096
    != 0)."""
    from tracs_tpu.ops import packing

    # L=16500 -> W=516 -> Wpad=768; 2 chunks -> chunk_w=512, tail=256
    seqs = _toy_seqs(rng, n=19, L=16500)
    packed = packing.pack_sequences(seqs)
    monkeypatch.setenv("TRACS_TPU_OVERLAP_MIN_BYTES", "0")
    monkeypatch.setenv("TRACS_TPU_OVERLAP_CHUNKS", "2")
    got = _stream_all(packed, row_block=8)

    packed2 = packing.pack_sequences(seqs)
    monkeypatch.setenv("TRACS_TPU_OVERLAP_UPLOAD", "0")
    want = _stream_all(packed2, row_block=8)
    for g, w in zip(got, want):
        assert np.array_equal(g, w)


def test_overlap_repeat_sweep_uses_cache(rng, monkeypatch):
    """Second stream on the same alignment must reuse the progressively
    built layout (no second overlap pass / upload)."""
    from tracs_tpu.ops import pairsnp as ps

    packed = _toy(rng, n=21, L=5000)
    monkeypatch.setenv("TRACS_TPU_OVERLAP_MIN_BYTES", "0")
    monkeypatch.setenv("TRACS_TPU_OVERLAP_CHUNKS", "3")
    first = _stream_all(packed, row_block=8)
    calls = []
    orig = ps._overlapped_split_sweep
    monkeypatch.setattr(
        ps, "_overlapped_split_sweep",
        lambda *a, **k: calls.append(1) or orig(*a, **k),
    )
    second = _stream_all(packed, row_block=8)
    assert not calls  # cache hit: the overlap engine never re-ran
    for g, w in zip(first, second):
        assert np.array_equal(g, w)


def test_overlap_matches_reference_oracle(rng, monkeypatch):
    """Overlapped results against the O(n^2 L) nibble oracle."""
    from tracs_tpu.ops.packing import pack_sequences

    chars = list("ACGTN")
    seqs = ["".join(rng.choice(chars, size=3001)) for _ in range(17)]
    packed = pack_sequences(seqs)
    monkeypatch.setenv("TRACS_TPU_OVERLAP_MIN_BYTES", "0")
    monkeypatch.setenv("TRACS_TPU_OVERLAP_CHUNKS", "5")
    rows, cols, dvals, nn = _stream_all(packed, row_block=7)

    nib = packed.nibbles()
    D = {}
    for i in range(len(seqs)):
        for j in range(i + 1, len(seqs)):
            share = (nib[i] & nib[j]) > 0
            D[(i, j)] = len(seqs[0]) - int(share.sum())
    for r, c, d in zip(rows, cols, dvals):
        assert D[(int(r), int(c))] == int(d)
    assert len(rows) == len(D)
