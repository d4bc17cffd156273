"""Sharded all-pairs SNP distances: ring block-rotation over a device mesh.

Layout: samples padded to dp*B and packed words padded to sp*Ws; the planes
tensor [n, 4, W] is sharded P('dp', None, 'sp') so each device holds one
sample block on one position shard (HBM per device = n_block * L_shard / 2
bytes — 10k samples x 1 Mb genomes fit a v5e pod slice comfortably).

Ring schedule (the TPU-native replacement for the reference's OpenMP row
loop, src/pairsnp.hpp:380-432): every step each dp-rank computes the
channel-gram of its resident block against a travelling block, then passes
the travelling block to its ring neighbour with ``ppermute``; after P steps
every pair of blocks has met exactly once on every position shard.  Per-pair
grams are commutative sums over positions, so the sp axis reduces with a
single ``psum`` at the end; the recombination filter's windowed statistics
are the only non-commutative part of the pipeline and run in the dedicated
filter pass (ops/recomb.py), not here.

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

from tracs_tpu.ops.packing import PackedAlignment
from tracs_tpu.ops.pairsnp import _gram_chunk
from tracs_tpu.parallel.mesh import make_mesh, pad_to


def _ring_allpairs_local(planes_local: jnp.ndarray, n_dp: int):
    """shard_map body: planes_local [B, 4, Ws] on this (dp, sp) shard.
    Returns signed gram rows [B, n_dp*B] and quad gram rows, psum'd over sp.
    """
    B = planes_local.shape[0]
    my_dp = jax.lax.axis_index("dp")

    sig_rows = jnp.zeros((B, n_dp * B), jnp.int32)
    quad_rows = jnp.zeros((B, n_dp * B), jnp.int32)

    trav = planes_local
    for step in range(n_dp):
        g, gq = _gram_chunk(planes_local, trav)
        origin = (my_dp - step) % n_dp
        col0 = (origin * B).astype(jnp.int32)
        zero = jnp.int32(0)
        sig_rows = jax.lax.dynamic_update_slice(sig_rows, g, (zero, col0))
        quad_rows = jax.lax.dynamic_update_slice(quad_rows, gq, (zero, col0))
        if step + 1 < n_dp:
            # rotate the travelling block one rank forward around the dp ring
            perm = [(r, (r + 1) % n_dp) for r in range(n_dp)]
            trav = jax.lax.ppermute(trav, "dp", perm)

    # position shards hold partial grams: commutative sum -> one psum
    sig_rows = jax.lax.psum(sig_rows, "sp")
    quad_rows = jax.lax.psum(quad_rows, "sp")
    return sig_rows, quad_rows


@partial(jax.jit, static_argnames=("n_dp", "mesh"))
def _ring_allpairs(planes: jnp.ndarray, *, n_dp: int, mesh: Mesh):
    fn = jax.shard_map(
        partial(_ring_allpairs_local, n_dp=n_dp),
        mesh=mesh,
        in_specs=P("dp", None, "sp"),
        out_specs=(P("dp", None), P("dp", None)),
    )
    return fn(planes)


def sharded_snp_distance(
    packed: PackedAlignment,
    mesh: Mesh | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """All-pairs (D, NN) int32 matrices computed over a dp x sp device mesh.

    Matches ``snp_distance_dense`` bit-for-bit; use for sample counts /
    genome lengths that exceed a single device.
    """
    if mesh is None:
        mesh = make_mesh(len(jax.devices()), 1)
    n_dp = mesh.shape["dp"]
    n_sp = mesh.shape["sp"]

    n, _, W = packed.planes.shape
    L = packed.length
    B = pad_to(max(n, 1), n_dp) // n_dp
    Ws = pad_to(max(W, 1), n_sp) // n_sp

    planes = np.zeros((n_dp * B, 4, n_sp * Ws), dtype=np.uint32)
    planes[:n, :, :W] = packed.planes

    sharding = NamedSharding(mesh, P("dp", None, "sp"))
    planes_dev = jax.device_put(jnp.asarray(planes), sharding)

    sig, quad = _ring_allpairs(planes_dev, n_dp=n_dp, mesh=mesh)
    sig = np.asarray(sig)[:n, :n]
    quad = np.asarray(quad)[:n, :n]

    cnt = np.asarray(packed.counts_n())
    D = (L + sig).astype(np.int32)
    NN = (L - cnt[:, None] - cnt[None, :] + quad).astype(np.int32)
    return D, NN
