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
