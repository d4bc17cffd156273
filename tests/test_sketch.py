"""Native FracMinHash sketching + gather: hash correctness, canonicality,
reference selection, and the sourmash-free build-db -> align path."""

import gzip
import sys

import numpy as np
import pytest

from tracs_tpu import sketch as sk
from tracs_tpu.io.fasta import write_fasta
from tracs_tpu.runtime.native import get_lib

_RC = str.maketrans("ACGT", "TGCA")


def revcomp(s):
    return s.translate(_RC)[::-1]


def make_genome(rng, L):
    return "".join(rng.choice(list("ACGT"), size=L))


def py_sketch(seq, k, scaled):
    out = set()
    sk._sketch_seq_py(seq, k, sk._MASK64 // scaled, out)
    return np.array(sorted(out), dtype=np.uint64)


def test_canonical_hashing(rng):
    seq = make_genome(rng, 3000)
    a = py_sketch(seq, 21, 20)
    b = py_sketch(revcomp(seq), 21, 20)
    assert len(a) > 10
    assert np.array_equal(a, b)


def test_invalid_bases_reset_window(rng):
    seq = make_genome(rng, 500)
    broken = seq[:250] + "N" + seq[250:]
    a = py_sketch(seq, 21, 5)
    b = py_sketch(broken, 21, 5)
    # all kmers not spanning the N are shared
    assert len(np.intersect1d(a, b)) > 0.8 * len(a)


@pytest.mark.skipif(get_lib() is None, reason="native lib unavailable")
def test_native_matches_python(tmp_path, rng):
    seq = make_genome(rng, 5000)
    path = tmp_path / "g.fasta.gz"
    write_fasta(path, [("g", seq)])
    native = sk.sketch_file(path, ksize=31, scaled=10)
    want = py_sketch(seq, 31, 10)
    assert np.array_equal(native, want)


@pytest.mark.skipif(get_lib() is None, reason="native lib unavailable")
def test_native_fastq(tmp_path, rng):
    seq = make_genome(rng, 400)
    path = tmp_path / "r.fastq.gz"
    with gzip.open(path, "wt") as fh:
        fh.write(f"@r1\n{seq}\n+\n{'I'*len(seq)}\n")
        fh.write(f"@r2 desc\n{seq[:200]}\n+\n{'I'*200}\n")
    native = sk.sketch_file(path, ksize=21, scaled=5)
    want = py_sketch(seq, 21, 5)  # r2 is a subset of r1's kmers
    assert np.array_equal(native, want)


def test_gather_selects_constituents(rng):
    k, scaled = 21, 10
    genomes = {f"g{i}": make_genome(rng, 4000) for i in range(4)}
    refs = {n: py_sketch(s, k, scaled) for n, s in genomes.items()}
    query = py_sketch(genomes["g1"], k, scaled)
    query = np.union1d(query, py_sketch(genomes["g3"], k, scaled))
    hits = sk.gather(query, refs, scaled=scaled, threshold_bp=50 * scaled)
    names = {h.name for h in hits}
    assert names == {"g1", "g3"}
    for h in hits:
        assert h.f_match > 0.9  # near-complete containment


@pytest.mark.skipif(get_lib() is None, reason="native lib unavailable")
def test_build_db_and_align_native_gather(tmp_path, rng, monkeypatch):
    """sourmash-free path: build-db writes native sketches; align selects
    references with the native gather and runs the fake aligner on them."""
    from tracs_tpu.cli import main as cli_main
    from tracs_tpu.stages import align as align_mod

    # genomes sized so the (real-world) 50kb gather threshold is meaningful:
    # 100kb at scaled=50 -> ~2000 hashes vs the 1000-hash threshold
    genomes = {f"G{i}": make_genome(rng, 100_000) for i in range(3)}
    paths = []
    for name, seq in genomes.items():
        p = tmp_path / f"{name}.fasta"
        write_fasta(p, [("chr1", seq)])
        paths.append(str(p))

    # force the no-sourmash branch regardless of environment
    monkeypatch.setattr("shutil.which", lambda name: None)
    db = tmp_path / "db"
    cli_main(["build-db", "-i"] + paths + ["-o", str(db), "--scale", "50"])

    loaded = sk.load_db_sketches(str(db) + ".zip")
    assert loaded is not None and set(loaded[0]) == {"G0", "G1", "G2"}

    # query reads tiling (nearly) all of G1 only
    reads = tmp_path / "q.fastq.gz"
    with gzip.open(reads, "wt") as fh:
        g = genomes["G1"]
        for i in range(0, len(g) - 300, 150):
            r = g[i : i + 300]
            fh.write(f"@r{i}\n{r}\n+\n{'I'*len(r)}\n")

    def fake(reference, outdir, prefix, r1, r2=None, **kw):
        base = prefix.split("_ref_")[-1]
        seq = genomes[base]
        with gzip.open(prefix + "_pileup.txt.gz", "wt") as fh:
            for pos0, b in enumerate(seq):
                fh.write(f"chr1\t{pos0+1}\t{b}\t.\t{b}\t2:10:10\n")

    monkeypatch.setattr(align_mod, "align_and_pileup", fake)

    outdir = tmp_path / "out"
    cli_main([
        "align", "-i", str(reads), "--database", str(db) + ".zip",
        "-o", str(outdir), "-p", "q",
    ])
    # only G1 selected and called
    produced = sorted(p.name for p in outdir.glob("*posterior_counts*fasta"))
    assert produced == ["q_posterior_counts_ref_G1.fasta"]
    hits_csv = outdir / "q_sourmash_hits.csv"
    assert hits_csv.exists()
