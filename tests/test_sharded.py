"""Sharded vs single-device bit-equality on a forced 8-device CPU mesh —
the multi-chip test strategy SURVEY.md §4 calls for (the reference has no
distributed code to test)."""

import numpy as np
import pytest
import jax

from tracs_tpu.ops.packing import pack_sequences
from tracs_tpu.ops.pairsnp import snp_distance_dense
from tracs_tpu.parallel.allpairs import sharded_snp_distance
from tracs_tpu.parallel.mesh import best_mesh_shape, make_mesh


requires_8dev = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 forced CPU devices"
)


def _random_packed(rng, n, L):
    chars = np.array(list("ACGTMRWSYKVHDBN"))
    seqs = ["".join(rng.choice(chars, size=L)) for _ in range(n)]
    return pack_sequences(seqs)


@requires_8dev
@pytest.mark.parametrize("dp,sp", [(8, 1), (4, 2), (2, 4), (1, 8), (2, 2)])
def test_ring_matches_dense(rng, dp, sp):
    packed = _random_packed(rng, 13, 401)  # deliberately non-multiples
    D0, NN0 = snp_distance_dense(packed)
    mesh = make_mesh(dp, sp)
    D1, NN1 = sharded_snp_distance(packed, mesh)
    assert np.array_equal(D0, D1)
    assert np.array_equal(NN0, NN1)


@requires_8dev
def test_ring_single_sample_block(rng):
    # fewer samples than dp ranks: heavy padding path
    packed = _random_packed(rng, 3, 100)
    D0, _ = snp_distance_dense(packed)
    D1, _ = sharded_snp_distance(packed, make_mesh(8, 1))
    assert np.array_equal(D0, D1)


def test_best_mesh_shape():
    assert best_mesh_shape(1) == (1, 1)
    assert best_mesh_shape(8, n_samples=10000) == (8, 1)
    dp, sp = best_mesh_shape(8, n_samples=4)
    assert dp * sp == 8 and dp <= 2


@requires_8dev
def test_ring_with_compaction(rng):
    # conserved backbone -> compaction triggers; sharded compact == dense full
    base = rng.choice(np.array(list("ACGT")), size=500)
    seqs = []
    for _ in range(11):
        s = base.copy()
        idx = rng.choice(500, size=12, replace=False)
        s[idx] = rng.choice(np.array(list("ACGTN")), size=12)
        seqs.append("".join(s))
    packed = pack_sequences(seqs)
    from tracs_tpu.ops.packing import compact_variant_columns

    assert compact_variant_columns(packed) is not None  # it does trigger
    D0, NN0 = snp_distance_dense(pack_sequences(seqs))  # fresh: no cache
    D1, NN1 = sharded_snp_distance(packed, make_mesh(4, 2), compact=True)
    assert np.array_equal(D0, D1)
    assert np.array_equal(NN0, NN1)
