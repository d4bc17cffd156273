"""On-disk packed-plane cache: reruns of pack_fasta on an unchanged input
load an mmap of the first run's planes instead of re-parsing the FASTA
(VERDICT r4 item 3a — at north-star scale the re-pack costs ~6 min/run)."""

import gzip
import os

import numpy as np
import pytest


@pytest.fixture
def fasta(tmp_path, rng):
    p = tmp_path / "aln.fasta.gz"
    seqs = ["".join(rng.choice(list("ACGTN"), size=211)) for _ in range(9)]
    with gzip.open(p, "wt") as fh:
        for i, s in enumerate(seqs):
            fh.write(f">s{i}\n{s}\n")
    return str(p)


def test_cache_roundtrip_and_hit(fasta, tmp_path, monkeypatch):
    from tracs_tpu.ops import packing

    cache = tmp_path / "cache"
    monkeypatch.setenv("TRACS_TPU_PACK_CACHE", str(cache))

    first = packing.pack_fasta(fasta, use_cache=True)
    key = packing._pack_cache_key(fasta)
    entry = cache / key
    assert (entry / "planes.npy").exists() and (entry / "meta.json").exists()

    again = packing.pack_fasta(fasta, use_cache=True)
    assert isinstance(again.planes, np.memmap)  # the mmap'd cache hit
    assert np.array_equal(np.asarray(again.planes), first.planes)
    assert again.names == first.names and again.length == first.length

    # the mmap'd alignment must drive the full split/kernel path unchanged
    from tracs_tpu.ops.pairsnp import snp_distance_dense

    D1, NN1 = snp_distance_dense(first)
    D2, NN2 = snp_distance_dense(again)
    assert np.array_equal(D1, D2) and np.array_equal(NN1, NN2)


def test_cache_invalidated_by_content_change(fasta, tmp_path, monkeypatch):
    from tracs_tpu.ops import packing

    monkeypatch.setenv("TRACS_TPU_PACK_CACHE", str(tmp_path / "cache"))
    packing.pack_fasta(fasta, use_cache=True)
    key1 = packing._pack_cache_key(fasta)

    # rewrite with one changed base (and necessarily a new mtime)
    raw = gzip.open(fasta, "rt").read().replace("A", "C", 1)
    with gzip.open(fasta, "wt") as fh:
        fh.write(raw)
    assert packing._pack_cache_key(fasta) != key1
    fresh = packing.pack_fasta(fasta, use_cache=True)
    assert fresh.n_seqs == 9  # packed from the new content, no stale hit


def test_small_files_skip_cache_by_default(fasta, tmp_path, monkeypatch):
    from tracs_tpu.ops import packing

    cache = tmp_path / "cache"
    monkeypatch.setenv("TRACS_TPU_PACK_CACHE", str(cache))
    packing.pack_fasta(fasta)  # tiny file, default policy: no cache entry
    assert not cache.exists()


def test_cache_disabled_by_env(fasta, tmp_path, monkeypatch):
    from tracs_tpu.ops import packing

    monkeypatch.setenv("TRACS_TPU_PACK_CACHE", "0")
    packed = packing.pack_fasta(fasta, use_cache=True)
    assert packed.n_seqs == 9
