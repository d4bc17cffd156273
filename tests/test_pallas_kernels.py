"""Pallas popcount kernels vs the MXU channel-gram path (interpret mode on
the CPU test mesh; the same kernels compile natively on TPU)."""

import numpy as np
import pytest

from tracs_tpu.ops.packing import pack_sequences
from tracs_tpu.ops.pairsnp import snp_distance_dense
from tracs_tpu.ops.pallas_kernels import snp_distance_pallas


@pytest.mark.parametrize("n,L", [(5, 100), (33, 700), (64, 16384)])
def test_pallas_matches_mxu(rng, n, L):
    chars = np.array(list("ACGTMRWSYKVHDBN"))
    seqs = ["".join(rng.choice(chars, size=L)) for _ in range(n)]
    packed = pack_sequences(seqs)
    D0, NN0 = snp_distance_dense(packed, method="mxu")
    D1, NN1 = snp_distance_pallas(packed, interpret=True)
    assert np.array_equal(D0, D1)
    assert np.array_equal(NN0, NN1)


def test_pallas_two_alignments(rng):
    chars = np.array(list("ACGTN"))
    seqs = ["".join(rng.choice(chars, size=200)) for _ in range(9)]
    pa = pack_sequences(seqs[:5])
    pb = pack_sequences(seqs[5:])
    D0, NN0 = snp_distance_dense(pa, pb, method="mxu")
    D1, NN1 = snp_distance_pallas(pa, pb, interpret=True)
    assert np.array_equal(D0, D1)
    assert np.array_equal(NN0, NN1)
