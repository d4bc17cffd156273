"""Native C++ ingest library vs Python fallbacks: identical outputs."""

import gzip

import numpy as np
import pytest

from tracs_tpu.io import pileup as pileup_mod
from tracs_tpu.io.fasta import write_fasta
from tracs_tpu.ops import packing
from tracs_tpu.runtime.native import get_lib, native_pack_fasta

requires_native = pytest.mark.skipif(get_lib() is None, reason="native lib unavailable")


@requires_native
def test_native_fasta_pack_matches_numpy(tmp_path, rng):
    chars = np.array(list("ACGTMRWSYKVHDBNacgt-"))
    seqs = ["".join(rng.choice(chars, size=173)) for _ in range(7)]
    path = tmp_path / "x.fasta.gz"
    write_fasta(path, [(f"s{i} desc text", s) for i, s in enumerate(seqs)])

    native = native_pack_fasta(path)
    fallback = packing.pack_sequences(seqs, [f"s{i}" for i in range(7)])
    assert native.names == fallback.names
    assert native.length == fallback.length
    assert np.array_equal(native.planes, fallback.planes)


@requires_native
def test_native_fasta_pack_multiline(tmp_path):
    path = tmp_path / "m.fasta"
    path.write_text(">a\nACGT\nACGT\n>b\nNNNN\nNNNN\n")
    native = native_pack_fasta(path)
    assert native.length == 8
    assert native.names == ["a", "b"]
    assert np.array_equal(
        native.planes, packing.pack_sequences(["ACGTACGT", "NNNNNNNN"]).planes
    )


def _write_pileup(path, lines):
    with gzip.open(path, "wt") as fh:
        for l in lines:
            fh.write(l + "\n")


@pytest.mark.parametrize("both_strands", [True, False])
def test_pileup_native_vs_python(tmp_path, both_strands):
    path = str(tmp_path / "p.txt.gz")
    lines = [
        "chr1\t1\tA\t.\tA,C\t9:5,3:4,2",
        "chr1\t2\tC\t.\tC\t9:7:9",
        "chr1\t3\tG\t.\tG,T\t9:2,0:3,5",   # T fwd=0: zeroed when both_strands
        "chr1\t5\tT\t.\tT\t9:1:1",          # position 4 left uncovered
        "chr2\t1\tA\t.\tA\t9:6:6",
        "chr2\t2\tN\t.\tA\t9:6:6",          # non-ACGT ref: row stays zero
        "chr2\t3\tA\t.\tAC,G\t9:4,4:4,4",   # multi-char allele skipped
        "chr3\t1\tA\t.\tA\t9:9:9",          # contig not requested
    ]
    _write_pileup(path, lines)
    contigs = {"chr1": 6, "chr2": 4}

    got = pileup_mod.parse_pileup(path, contigs, require_both_strands=both_strands)

    # force the Python fallback for comparison
    import tracs_tpu.io.pileup as pm

    orig = pm._parse_native
    pm._parse_native = lambda *a, **k: None
    try:
        want = pileup_mod.parse_pileup(path, contigs, require_both_strands=both_strands)
    finally:
        pm._parse_native = orig

    assert np.array_equal(got, want)
    # spot checks
    assert got[0, 0] == 9 and got[0, 1] == 5      # chr1:1 A=5+4, C=3+2
    assert got.shape == (10, 4)


def test_pileup_semantics(tmp_path):
    path = str(tmp_path / "p.txt.gz")
    _write_pileup(path, [
        "chr1\t1\tA\t.\tA,C\t9:5,3:4,2",
        "chr1\t2\tG\t.\tG,T\t9:2,0:3,5",
        "chr1\t3\tN\t.\tA\t9:6:6",
        "chr1\t4\tA\t.\tAC\t9:4:4",
    ])
    counts = pileup_mod.parse_pileup(path, {"chr1": 4}, require_both_strands=True)
    assert counts[0, 0] == 9 and counts[0, 1] == 5          # 5+4, 3+2
    assert counts[1, 2] == 5 and counts[1, 3] == 0          # single-strand zeroed
    assert np.all(counts[2] == 0)                           # non-ACGT ref
    assert np.all(counts[3] == 0)                           # multi-char allele
    counts = pileup_mod.parse_pileup(path, {"chr1": 4}, require_both_strands=False)
    assert counts[1, 3] == 5                                # 0+5 kept


def test_native_split_stats_matches_numpy(rng):
    from tracs_tpu.ops import packing
    from tracs_tpu.runtime.native import native_split_stats

    chars = list("ACGTNRYSWKM-")  # singletons, partials, N, gap(->N)
    seqs = ["".join(rng.choice(chars, size=173)) for _ in range(23)]
    packed = packing.pack_sequences(seqs)
    stats = native_split_stats(packed.planes)
    assert stats is not None
    excl, nmask, cnt_n, ge2, b0, b1, partial_or = stats

    p = packed.planes
    a, c, g, t = p[:, 0], p[:, 1], p[:, 2], p[:, 3]
    all4 = a & c & g & t
    assert np.array_equal(nmask, all4)
    assert np.array_equal(excl, p & ~all4[:, None, :])
    assert np.array_equal(cnt_n, packing.popcount_words(all4).sum(axis=-1))
    ge2_want = (a & c) | (a & g) | (a & t) | (c & g) | (c & t) | (g & t)
    assert np.array_equal(ge2, ge2_want)
    assert np.array_equal(b0, (c | t) & ~ge2_want)
    assert np.array_equal(b1, (g | t) & ~ge2_want)
    assert np.array_equal(
        partial_or, np.bitwise_or.reduce((ge2_want & ~all4).astype(np.uint32), axis=0)
    )
    # split_alignment wires the native pass in and stashes the code2 planes
    sa = packing.split_alignment(packed)
    assert np.array_equal(sa.excl, excl)
    assert hasattr(packed, "_code2")


def test_code2_device_upload_bit_identical(rng):
    """Planes derived on device from the 2-bit code upload must equal the
    raw 4-plane upload, IUPAC exceptions included."""
    import tracs_tpu.ops.pairsnp as ps
    from tracs_tpu.ops import packing

    # singleton sites with a handful of hand-placed IUPAC/N exceptions:
    # the 24-byte-per-exception-word payload only wins when exception
    # words are sparse (<1/3 of words), as post-consensus data is
    seqs = ["".join(rng.choice(list("ACGT"), size=301)) for _ in range(17)]
    seqs[3] = seqs[3][:150] + "N" + seqs[3][151:]
    seqs[5] = "R" + seqs[5][1:]
    seqs[11] = seqs[11][:300] + "Y"
    packed = packing.pack_sequences(seqs)
    packing.split_alignment(packed)  # stashes _code2
    payload = ps._code2_payload(packed, ((packed.planes.shape[2] + 255) // 256) * 256)
    assert payload is not None  # exceptions sparse enough to take the path
    derived = np.asarray(ps._planes_device(packed))
    packed2 = packing.pack_sequences(seqs)
    raw = np.asarray(ps._planes_device(packed2))
    assert np.array_equal(derived, raw)


def test_code2_device_upload_sample0_word0_exception(rng):
    """A real exception at flat index 0 (leading N/IUPAC in the FIRST
    sequence) must survive the padded exception slots: pad entries used to
    carry flat index 0 too, and ``.at[].set`` duplicate-index order is
    undefined, so the pad's no-op write could clobber the patch (silently
    wrong distances on common real data)."""
    import tracs_tpu.ops.pairsnp as ps
    from tracs_tpu.ops import packing

    for lead in ("N", "M"):
        seqs = ["".join(rng.choice(list("ACGT"), size=301)) for _ in range(17)]
        seqs[0] = lead + seqs[0][1:]
        packed = packing.pack_sequences(seqs)
        packing.split_alignment(packed)  # stashes _code2
        Wpad = ((packed.planes.shape[2] + 255) // 256) * 256
        payload = ps._code2_payload(packed, Wpad)
        assert payload is not None
        assert payload[2][0] == 0  # the real exception IS flat index 0
        derived = np.asarray(ps._planes_device(packed))
        packed2 = packing.pack_sequences(seqs)
        raw = np.asarray(ps._planes_device(packed2))
        assert np.array_equal(derived, raw)


def test_code2_payload_declines_on_dense_exceptions(rng):
    import tracs_tpu.ops.pairsnp as ps
    from tracs_tpu.ops import packing

    seqs = ["".join(rng.choice(list("NRYSWKM"), size=200)) for _ in range(8)]
    packed = packing.pack_sequences(seqs)
    packing.split_alignment(packed)
    assert ps._code2_payload(packed, 256) is None
    # and the fallback upload still works
    raw = np.asarray(ps._planes_device(packed))
    assert raw.shape[1] == 4
