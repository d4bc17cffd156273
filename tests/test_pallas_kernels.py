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


@pytest.mark.parametrize("na,nb,L", [(37, 37, 533), (37, 11, 533), (130, 5, 9000)])
def test_fused_split_gram(rng, na, nb, L):
    """The fused split-gram kernel bit-matches the XLA _dense_split grams
    (both the square all-pairs case and the query-vs-db rectangle)."""
    import jax.numpy as jnp

    from tracs_tpu.ops.packing import split_alignment
    from tracs_tpu.ops.pairsnp import _dense_split
    from tracs_tpu.ops.pallas_kernels import split_gram_pallas

    chars = np.array(list("ACGTMRWSYKVHDBN-"))
    sa = split_alignment(pack_sequences(["".join(rng.choice(chars, size=L)) for _ in range(na)]))
    if na == nb:
        sb = sa
    else:
        sb = split_alignment(pack_sequences(["".join(rng.choice(chars, size=L)) for _ in range(nb)]))

    g, gn = split_gram_pallas(
        sa.excl, sa.nmask, sb.excl if sb is not sa else sa.excl,
        sb.nmask if sb is not sa else sa.nmask, interpret=True,
    )

    W = sa.excl.shape[2]
    Wpad = -(-W // 256) * 256
    pad3 = ((0, 0), (0, 0), (0, Wpad - W))
    pad2 = ((0, 0), (0, Wpad - W))
    ea = jnp.asarray(np.pad(sa.excl, pad3))
    na_m = jnp.asarray(np.pad(sa.nmask, pad2))
    eb = ea if sb is sa else jnp.asarray(np.pad(sb.excl, pad3))
    nb_m = na_m if sb is sa else jnp.asarray(np.pad(sb.nmask, pad2))
    g0, gn0 = _dense_split(ea, na_m, eb, nb_m, wc=Wpad, n_chunks=1, with_nn=True)
    assert np.array_equal(g, np.asarray(g0))
    assert np.array_equal(gn, np.asarray(gn0))
