import gzip

import numpy as np
import pytest

from tracs_tpu.io.fasta import read_fasta, write_fasta
from tracs_tpu.ops.packing import (
    NIBBLE_LUT,
    nibbles_to_planes,
    nibbles_to_string,
    pack_fasta,
    pack_sequences,
    popcount_words,
    seqs_to_nibbles,
    unpack_planes_to_nibbles,
)

IUPAC = {
    "A": 0b0001, "C": 0b0010, "G": 0b0100, "T": 0b1000,
    "M": 0b0011, "R": 0b0101, "W": 0b1001, "S": 0b0110, "Y": 0b1010,
    "K": 0b1100, "V": 0b0111, "H": 0b1011, "D": 0b1101, "B": 0b1110,
    "N": 0b1111,
}


def test_nibble_table_matches_reference_loader():
    # reference src/pairsnp.hpp:107-198: every IUPAC code sets its planes,
    # anything else (X, -, ?) sets all four
    for ch, nib in IUPAC.items():
        assert NIBBLE_LUT[ord(ch)] == nib
        assert NIBBLE_LUT[ord(ch.lower())] == nib
    for ch in "X-?.* ":
        assert NIBBLE_LUT[ord(ch)] == 0b1111


def test_pack_roundtrip(rng):
    chars = np.array(list("ACGTMRWSYKVHDBN"))
    for L in (1, 31, 32, 33, 64, 127, 1000):
        seqs = ["".join(rng.choice(chars, size=L)) for _ in range(5)]
        nib = seqs_to_nibbles(seqs)
        planes = nibbles_to_planes(nib)
        assert planes.shape == (5, 4, (L + 31) // 32)
        back = unpack_planes_to_nibbles(planes, L)
        assert np.array_equal(back, nib)


def test_variable_length_raises():
    with pytest.raises(ValueError):
        pack_sequences(["ACGT", "ACG"])


def test_popcount_words(rng):
    w = rng.integers(0, 2**32, size=(4, 7), dtype=np.uint32)
    expect = np.array([[bin(int(x)).count("1") for x in row] for row in w])
    assert np.array_equal(popcount_words(w), expect)


def test_fasta_io_gz(tmp_path):
    path = tmp_path / "x.fasta.gz"
    write_fasta(path, [("s1 extra tokens", "ACGT"), ("s2", "NNNN")])
    # name should be the first whitespace token (kseq semantics)
    recs = list(read_fasta(path))
    assert recs == [("s1", "ACGT"), ("s2", "NNNN")]
    packed = pack_fasta(path)
    assert packed.names == ["s1", "s2"]
    assert packed.length == 4
    assert nibbles_to_string(packed.nibbles()[0]) == "ACGT"


def test_multiline_fasta(tmp_path):
    path = tmp_path / "m.fasta"
    path.write_text(">a\nACGT\nACGT\n>b\nNNNNNNNN\n")
    packed = pack_fasta(path)
    assert packed.length == 8
    assert packed.counts_n()[1] == 8
    assert packed.counts_n()[0] == 0
