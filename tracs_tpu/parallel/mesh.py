"""Device-mesh helpers: sample-block (dp) x genome-position (sp) meshes.

The reference's parallelism is an OpenMP parallel-for over pair-matrix rows
on one CPU (reference src/pairsnp.hpp:380-432).  The TPU-native equivalents:

* ``dp`` — sample-block data parallelism: each device owns a block of
  samples; blocks rotate around a ring (``ppermute``) so every pair of
  blocks meets exactly once per sweep.  This replaces the OpenMP row loop
  and scales all-pairs workloads past one chip's HBM.
* ``sp`` — genome-position sharding: the packed position axis is split
  across devices; per-pair counts are commutative sums of per-shard
  popcounts/grams, reduced with ``psum``.  This is the sequence-parallel
  axis for very long or many-reference alignments.

Multi-host: ``jax.distributed.initialize()`` + the same mesh spanning all
processes; dp rides DCN across hosts, sp stays on ICI within a slice.
"""

from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh


def best_mesh_shape(n_devices: int, n_samples: int | None = None, n_words: int | None = None):
    """Pick (dp, sp) for n_devices.  Prefers dp (sample blocks) since the
    all-pairs workload is quadratic in samples and only linear in positions;
    sp>1 is chosen when sample blocks would be degenerate (few samples,
    long genomes)."""
    if n_devices <= 1:
        return 1, 1
    # prefer all-dp unless samples are scarce relative to devices
    if n_samples is not None and n_samples < 2 * n_devices:
        # give positions the surplus
        dp = max(1, n_samples // 2)
        while n_devices % dp:
            dp -= 1
        return dp, n_devices // dp
    return n_devices, 1


def make_mesh(dp: int, sp: int = 1, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if dp * sp > len(devices):
        raise ValueError(f"mesh {dp}x{sp} needs {dp*sp} devices, have {len(devices)}")
    dev = np.asarray(devices[: dp * sp]).reshape(dp, sp)
    return Mesh(dev, ("dp", "sp"))


def pad_to(x: int, mult: int) -> int:
    return int(math.ceil(x / mult) * mult)


def to_host(x) -> np.ndarray:
    """Device array -> host numpy, multi-process safe.

    A jax.Array whose shards live on other processes' devices is not fully
    addressable, so ``np.asarray`` raises; gather it to every host first
    (ICI/DCN allgather via multihost_utils).  Fully-addressable arrays —
    everything in a single-process run, and replicated arrays in any run —
    take the plain zero-copy download."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def resolve_mesh(spec: str | None = "auto") -> Mesh | None:
    """Resolve a ``--mesh`` CLI / TRACS_TPU_MESH spec to a device mesh.

    * ``"auto"`` (or None): all visible devices, dp-major
      (``best_mesh_shape``); returns None on a single device so callers
      keep the plain single-chip path.  Under multi-process it stays on
      this process's own chips (SPMD safety — see below).
    * ``"off"``: force single-device.
    * ``"DPxSP"`` (e.g. ``"4x2"``): explicit shape over the global device
      list (spans processes under jax.distributed).
    * ``"global"``: all GLOBAL devices, dp-major — the sanctioned
      cross-host spec for SPMD launches where every process runs the same
      program (tests/test_multihost.py runs it under real multi-process
      jax.distributed).
    """
    import os

    if spec is None:
        spec = os.environ.get("TRACS_TPU_MESH", "auto")
    spec = spec.strip().lower()
    if spec == "off":
        return None
    if spec == "global":
        n = len(jax.devices())
        if n <= 1:
            return None
        return make_mesh(*best_mesh_shape(n))
    if spec == "auto":
        if jax.process_count() > 1:
            # SPMD safety: a global mesh is only valid when EVERY process
            # executes the same program (a proper multi-host launcher).
            # 'auto' therefore stays on this process's own chips; ask for an
            # explicit 'DPxSP' to span hosts.
            devices = jax.local_devices()
            if len(devices) <= 1:
                return None
            return make_mesh(*best_mesh_shape(len(devices)), devices=devices)
        n = len(jax.devices())
        if n <= 1:
            return None
        return make_mesh(*best_mesh_shape(n))
    try:
        dp, sp = (int(t) for t in spec.split("x"))
    except ValueError:
        raise ValueError(
            f"invalid mesh spec {spec!r}: expected 'auto', 'off' or 'DPxSP'"
        ) from None
    if dp * sp <= 1:
        return None
    return make_mesh(dp, sp)
