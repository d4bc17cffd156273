"""Sharded all-pairs SNP distances: ring block-rotation over a device mesh.

Layout: samples padded to dp*B and packed words padded to sp*Ws; the split-
decomposition tensors (see ops/pairsnp.py: N-exclusive singleton planes,
N masks, gathered partial-ambiguity planes) are sharded P('dp', ..., 'sp')
so each device holds one sample block on one position shard.

Ring schedule (the TPU-native replacement for the reference's OpenMP row
loop, src/pairsnp.hpp:380-432): every step each dp-rank computes the
5-channel signed gram (+ partial correction + N gram) of its resident block
against a travelling block, then passes the travelling block to its ring
neighbour with ``ppermute``; after P steps every pair of blocks has met
exactly once on every position shard.  Per-pair grams are commutative sums
over positions, so the sp axis reduces with a single ``psum`` at the end;
the recombination filter's windowed statistics are the only non-commutative
part of the pipeline and run in the dedicated filter pass (ops/recomb.py),
not here.

Determinism: output is assembled by block origin index, so the result is
bit-identical to the single-device kernel regardless of mesh shape (verified
in tests/test_sharded.py on a forced 8-device CPU mesh).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import os

from tracs_tpu.ops.packing import PackedAlignment, compact_variant_columns
from tracs_tpu.ops.pairsnp import _cached_split, _gram_partial, _gram_split_chunk, _unpack_bits
from tracs_tpu.parallel.mesh import make_mesh, pad_to


def _ring_allpairs_local(excl, nmask, part, n_dp: int):
    """shard_map body: per-(dp, sp) shard tensors
    excl [B, 4, Ws], nmask [B, Ws], part [B, 4, Wp].
    Returns (match-gram rows [B, n_dp*B], N-gram rows), psum'd over sp.
    """
    B = excl.shape[0]
    my_dp = jax.lax.axis_index("dp")

    m_rows = jnp.zeros((B, n_dp * B), jnp.int32)
    n_rows = jnp.zeros((B, n_dp * B), jnp.int32)

    trav = (excl, nmask, part)
    for step in range(n_dp):
        t_excl, t_nmask, t_part = trav
        m = _gram_split_chunk(excl, nmask, t_excl, t_nmask)
        m = m + _gram_partial(part, t_part)
        an = _unpack_bits(nmask)
        bn = _unpack_bits(t_nmask)
        gn = jax.lax.dot_general(
            an, bn, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )
        origin = (my_dp - step) % n_dp
        col0 = (origin * B).astype(jnp.int32)
        zero = jnp.int32(0)
        m_rows = jax.lax.dynamic_update_slice(m_rows, m, (zero, col0))
        n_rows = jax.lax.dynamic_update_slice(n_rows, gn, (zero, col0))
        if step + 1 < n_dp:
            # rotate the travelling block one rank forward around the dp ring
            perm = [(r, (r + 1) % n_dp) for r in range(n_dp)]
            trav = tuple(jax.lax.ppermute(t, "dp", perm) for t in trav)

    # position shards hold partial grams: commutative sum -> one psum
    m_rows = jax.lax.psum(m_rows, "sp")
    n_rows = jax.lax.psum(n_rows, "sp")
    return m_rows, n_rows


@partial(jax.jit, static_argnames=("n_dp", "mesh"))
def _ring_allpairs(excl, nmask, part, *, n_dp: int, mesh: Mesh):
    fn = jax.shard_map(
        partial(_ring_allpairs_local, n_dp=n_dp),
        mesh=mesh,
        in_specs=(P("dp", None, "sp"), P("dp", "sp"), P("dp", None, "sp")),
        out_specs=(P("dp", None), P("dp", None)),
    )
    return fn(excl, nmask, part)


def sharded_snp_distance(
    packed: PackedAlignment,
    mesh: Mesh | None = None,
    *,
    compact: bool | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """All-pairs (D, NN) int32 matrices computed over a dp x sp device mesh
    with the split-decomposition kernel.  Matches ``snp_distance_dense``
    bit-for-bit; use for sample counts / genome lengths that exceed a
    single device.

    ``compact`` (default on; ``TRACS_TPU_COMPACT=0`` disables) applies
    variant-site compaction before sharding — the distance matrix is exactly
    unchanged and NN shifts by a scalar (ops/packing.py), while the sharded
    position axis and ring traffic shrink by the conserved fraction."""
    if mesh is None:
        mesh = make_mesh(len(jax.devices()), 1)
    n_dp = mesh.shape["dp"]
    n_sp = mesh.shape["sp"]

    if compact is None:
        compact = os.environ.get("TRACS_TPU_COMPACT", "1") != "0"
    nn_off = 0
    if compact:
        comp = compact_variant_columns(packed)
        if comp is not None:
            packed = comp[0]
            nn_off = comp[3]

    sa = _cached_split(packed)
    n = sa.n_seqs
    W = sa.excl.shape[2]
    Wp = sa.partial.shape[2]
    L = sa.length
    B = pad_to(max(n, 1), n_dp) // n_dp
    Ws = pad_to(max(W, 1), n_sp) // n_sp
    Wps = pad_to(max(Wp, 1), n_sp) // n_sp

    excl = np.zeros((n_dp * B, 4, n_sp * Ws), dtype=np.uint32)
    excl[:n, :, :W] = sa.excl
    nmask = np.zeros((n_dp * B, n_sp * Ws), dtype=np.uint32)
    nmask[:n, :W] = sa.nmask
    part = np.zeros((n_dp * B, 4, n_sp * Wps), dtype=np.uint32)
    part[:n, :, :Wp] = sa.partial

    ex_dev = jax.device_put(jnp.asarray(excl), NamedSharding(mesh, P("dp", None, "sp")))
    nm_dev = jax.device_put(jnp.asarray(nmask), NamedSharding(mesh, P("dp", "sp")))
    pt_dev = jax.device_put(jnp.asarray(part), NamedSharding(mesh, P("dp", None, "sp")))

    m, gn = _ring_allpairs(ex_dev, nm_dev, pt_dev, n_dp=n_dp, mesh=mesh)
    m = np.asarray(m)[:n, :n]
    gn = np.asarray(gn)[:n, :n]

    cnt = sa.cnt_n[:, None] + sa.cnt_n[None, :]
    D = (L - (m + cnt)).astype(np.int32)
    NN = (L - cnt + gn + nn_off).astype(np.int32)
    return D, NN
