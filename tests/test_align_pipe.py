"""End-to-end align + pipe tests with a fake aligner: synthetic htsbox-format
pileups are generated from known sample genomes, so the full align numerics
(pileup parse -> coverage filters -> DM fit -> posteriors -> IUPAC fasta)
and the pipe orchestration (align -> combine -> distance -> cluster) run for
real without external tools — the analogue of the reference's test_pipe
(which co-clusters two known-close samples)."""

import gzip
import os
import sys
import zipfile

import numpy as np
import pytest

from tracs_tpu.io.fasta import read_fasta, write_fasta

REF_LEN = 3000
MUT = {"A": "G", "C": "T", "G": "A", "T": "C"}


@pytest.fixture
def ref_genome(rng):
    return "".join(rng.choice(list("ACGT"), size=REF_LEN))


def write_fake_pileup(path, ref_seq, sample_seq, depth_fwd=10, depth_rev=10,
                      contig="chr1", dropout=()):
    """htsbox-like pileup: contig pos ref alt nucs x:fwd:rev."""
    with gzip.open(path, "wt") as fh:
        for pos0, (rb, sb) in enumerate(zip(ref_seq, sample_seq)):
            if pos0 in dropout:
                continue
            fh.write(
                f"{contig}\t{pos0+1}\t{rb}\t.\t{sb}\t"
                f"2:{depth_fwd}:{depth_rev}\n"
            )


def make_sample(ref, positions):
    s = list(ref)
    for p in positions:
        s[p] = MUT[s[p]]
    return "".join(s)


def fake_align_and_pileup_factory(ref_seq, sample_genomes):
    """Returns a stand-in for io.external.align_and_pileup that writes the
    sample's synthetic pileup instead of running minimap2."""

    def fake(reference, outdir, prefix, r1, r2=None, **kw):
        # prefix looks like <outdir>/<sample>_ref_<REF>; recover the sample
        base = os.path.basename(prefix)
        sample = base.split("_ref_")[0]
        write_fake_pileup(prefix + "_pileup.txt.gz", ref_seq, sample_genomes[sample])

    return fake


def make_db_zip(path, ref_fasta_path, ref_name):
    """Database zip layout (reference build_db.py:139-162) with a dummy SBT."""
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("sourmashDB.sbt.zip", b"dummy")
        with open(ref_fasta_path, "rb") as fh:
            data = fh.read()
        import io as _io

        buf = _io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb") as gz:
            gz.write(data)
        z.writestr(ref_name + ".fasta.gz", buf.getvalue())
        z.writestr("summary.tsv", f"{ref_name},{ref_name}.fasta.gz")


def test_align_single_ref(tmp_path, rng, ref_genome, monkeypatch):
    from tracs_tpu.stages import align as align_mod

    ref_path = tmp_path / "REF1.fasta"
    write_fasta(ref_path, [("chr1", ref_genome)])

    sample = make_sample(ref_genome, [100, 200, 300])
    monkeypatch.setattr(
        align_mod, "align_and_pileup",
        fake_align_and_pileup_factory(ref_genome, {"s1": sample}),
    )

    reads = tmp_path / "s1.fastq.gz"
    reads.write_bytes(gzip.compress(b"@r1\nACGT\n+\nFFFF\n"))

    from tracs_tpu.cli import main as cli_main

    outdir = tmp_path / "out"
    args = [
        "align", "-i", str(reads), "--refseqs", str(ref_path),
        "-o", str(outdir), "-p", "s1",
    ]
    monkeypatch.setattr(sys, "argv", ["tracs-tpu"] + args)
    cli_main(args)

    fasta_out = outdir / "s1_posterior_counts_ref_REF1.fasta"
    assert fasta_out.exists()
    recs = list(read_fasta(fasta_out))
    assert recs[0][0] == "s1_REF1"
    called = recs[0][1]
    assert len(called) == REF_LEN
    # every covered site called as the sample base; mutated sites differ
    assert called[100] == MUT[ref_genome[100]]
    assert called[200] == MUT[ref_genome[200]]
    assert called[50] == ref_genome[50]
    assert called.count("N") == 0
    # posterior counts csv written
    assert (outdir / "s1_posterior_counts_ref_REF1.csv.gz").exists()


def test_align_low_coverage_becomes_N(tmp_path, rng, ref_genome, monkeypatch):
    from tracs_tpu.stages import align as align_mod

    ref_path = tmp_path / "REF1.fasta"
    write_fasta(ref_path, [("chr1", ref_genome)])

    def fake(reference, outdir, prefix, r1, r2=None, **kw):
        write_fake_pileup(
            prefix + "_pileup.txt.gz", ref_genome, ref_genome,
            dropout=set(range(0, 40)),  # first 40 sites uncovered
        )

    monkeypatch.setattr(align_mod, "align_and_pileup", fake)
    reads = tmp_path / "s1.fastq.gz"
    reads.write_bytes(gzip.compress(b"@r\nA\n+\nF\n"))

    from tracs_tpu.cli import main as cli_main

    outdir = tmp_path / "out"
    cli_main(["align", "-i", str(reads), "--refseqs", str(ref_path),
              "-o", str(outdir), "-p", "s1"])

    called = list(read_fasta(outdir / "s1_posterior_counts_ref_REF1.fasta"))[0][1]
    assert set(called[:40]) == {"N"}
    assert called[41] == ref_genome[41]


def test_align_consensus_mode(tmp_path, rng, ref_genome, monkeypatch):
    from tracs_tpu.stages import align as align_mod

    ref_path = tmp_path / "REF1.fasta"
    write_fasta(ref_path, [("chr1", ref_genome)])
    sample = make_sample(ref_genome, [10])
    monkeypatch.setattr(
        align_mod, "align_and_pileup",
        fake_align_and_pileup_factory(ref_genome, {"s1": sample}),
    )
    reads = tmp_path / "s1.fastq.gz"
    reads.write_bytes(gzip.compress(b"@r\nA\n+\nF\n"))

    from tracs_tpu.cli import main as cli_main

    outdir = tmp_path / "out"
    cli_main(["align", "-i", str(reads), "--refseqs", str(ref_path),
              "-o", str(outdir), "-p", "s1", "--consensus"])
    called = list(read_fasta(outdir / "s1_posterior_counts_ref_REF1.fasta"))[0][1]
    assert called[10] == MUT[ref_genome[10]]
    assert called[11] == ref_genome[11]
    # consensus mode writes no posterior csv
    assert not (outdir / "s1_posterior_counts_ref_REF1.csv.gz").exists()


def test_pipe_end_to_end(tmp_path, rng, ref_genome, monkeypatch):
    """Full pipe: 3 samples -> align (fake pileups) -> combined MSA ->
    distance csv -> clusters; the two close samples must co-cluster."""
    from tracs_tpu.stages import align as align_mod

    ref_path = tmp_path / "REF1.fasta"
    write_fasta(ref_path, [("chr1", ref_genome)])
    db_path = tmp_path / "db.zip"
    make_db_zip(db_path, ref_path, "REF1")

    samples = {
        "close1": make_sample(ref_genome, [100, 200]),
        "close2": make_sample(ref_genome, [100, 250]),
        "far1": make_sample(ref_genome, list(range(500, 560))),
    }
    monkeypatch.setattr(
        align_mod, "align_and_pileup",
        fake_align_and_pileup_factory(ref_genome, samples),
    )
    monkeypatch.setattr(align_mod, "run_gather", lambda **kw: ["REF1"])

    input_tsv = tmp_path / "input.tsv"
    with open(input_tsv, "w") as fh:
        fh.write("prefix\tr1\n")
        for name in samples:
            reads = tmp_path / f"{name}.fastq.gz"
            reads.write_bytes(gzip.compress(b"@r\nA\n+\nF\n"))
            fh.write(f"{name}\t{reads}\n")

    # NOTE: no --meta: the pipe's inline combine keeps "<sample>_<REF>"
    # record names (reference pipe.py:328-341 + align.py:513), so date
    # metadata keyed by sample name cannot match — the reference test_pipe
    # runs without metadata too.
    outdir = tmp_path / "pipe_out"
    from tracs_tpu.cli import main as cli_main

    cli_main([
        "pipe", "-i", str(input_tsv), "--database", str(db_path),
        "-o", str(outdir), "--min-cov", "2",
    ])

    dist_csv = outdir / "transmission_distances.csv"
    clus_csv = outdir / "transmission_clusters.csv"
    assert dist_csv.exists() and clus_csv.exists()

    rows = [l.strip().split(",") for l in open(dist_csv).readlines()[1:]]
    # sample order in the combined MSA depends on set/glob iteration order;
    # key pairs order-insensitively
    by_pair = {
        frozenset((r[0].split("_")[0], r[1].split("_")[0])): r for r in rows
    }
    # sites 100 mutated identically in both -> match; 200 and 250 differ
    # from each other's base -> d = 2
    assert int(by_pair[frozenset(("close1", "close2"))][3]) == 2
    assert int(by_pair[frozenset(("close1", "far1"))][3]) == 62

    labels = {
        k.split("_")[0]: v
        for k, v in (l.strip().split(",") for l in open(clus_csv).readlines()[1:])
    }
    assert labels["close1"] == labels["close2"]
    assert labels["far1"] != labels["close1"]


def test_build_db_to_align_native_sketch_e2e(tmp_path, rng, monkeypatch):
    """build-db CLI -> real native FracMinHash gather -> align consumes the
    zip end-to-end with NO sourmash binary (VERDICT r1 item 7).  Only the
    aligner subprocess is faked; sketching, gather, hit-CSV writing, zip
    genome extraction and the posterior numerics all run for real."""
    import shutil as _sh

    assert _sh.which("sourmash") is None  # this image: native path is real

    # two distinguishable 60 kb genomes (gather needs >=50 kb unique overlap)
    L = 60_000
    g1 = "".join(rng.choice(list("ACGT"), size=L))
    g2 = "".join(rng.choice(list("ACGT"), size=L))
    for name, seq in [("GENOME1", g1), ("GENOME2", g2)]:
        write_fasta(tmp_path / f"{name}.fasta", [("chr1", seq)])

    from tracs_tpu.cli import main as cli_main

    db = tmp_path / "refdb"
    cli_main([
        "build-db", "-i", str(tmp_path / "GENOME1.fasta"),
        str(tmp_path / "GENOME2.fasta"), "-o", str(db), "--scale", "100",
    ])
    assert (tmp_path / "refdb.zip").exists()

    # the sample is a lightly mutated copy of GENOME2, provided as a fastq
    sample_seq = make_sample(g2, [77, 1234, 40_000])
    reads = tmp_path / "s1.fastq.gz"
    with gzip.open(reads, "wt") as fh:
        fh.write(f"@r1\n{sample_seq}\n+\n{'F' * len(sample_seq)}\n")

    from tracs_tpu.stages import align as align_mod

    monkeypatch.setattr(
        align_mod, "align_and_pileup",
        fake_align_and_pileup_factory(g2, {"s1": sample_seq}),
    )

    outdir = tmp_path / "out"
    cli_main([
        "align", "-i", str(reads), "--database", str(tmp_path / "refdb.zip"),
        "-o", str(outdir), "-p", "s1", "--min-cov", "2",
    ])

    # the native gather must have selected GENOME2 (and only GENOME2)
    hits = (outdir / "s1_sourmash_hits.csv").read_text().splitlines()
    assert any("GENOME2" in line for line in hits[1:])
    assert (outdir / "s1_posterior_counts_ref_GENOME2.fasta").exists()
    assert not (outdir / "s1_posterior_counts_ref_GENOME1.fasta").exists()

    called = list(read_fasta(outdir / "s1_posterior_counts_ref_GENOME2.fasta"))[0][1]
    assert called[77] == MUT[g2[77]]
    assert called[78] == g2[78]


def test_pipe_parallel_ingest_scales(tmp_path, rng, ref_genome, monkeypatch):
    """--align-workers runs per-sample align concurrently: with a fake
    aligner that sleeps, 4 workers over 4 samples must beat serial by >2x
    (VERDICT r1 item 5), with identical outputs."""
    import time

    from tracs_tpu.stages import align as align_mod

    ref_path = tmp_path / "REF1.fasta"
    write_fasta(ref_path, [("chr1", ref_genome)])
    db_path = tmp_path / "db.zip"
    make_db_zip(db_path, ref_path, "REF1")

    samples = {
        f"s{k}": make_sample(ref_genome, [100 + 10 * k]) for k in range(4)
    }
    inner = fake_align_and_pileup_factory(ref_genome, samples)

    def slow_fake(*a, **kw):
        time.sleep(0.5)  # stands in for the minimap2|samtools|htsbox wall
        inner(*a, **kw)

    monkeypatch.setattr(align_mod, "align_and_pileup", slow_fake)
    monkeypatch.setattr(align_mod, "run_gather", lambda **kw: ["REF1"])

    input_tsv = tmp_path / "input.tsv"
    with open(input_tsv, "w") as fh:
        fh.write("prefix\tr1\n")
        for name in samples:
            reads = tmp_path / f"{name}.fastq.gz"
            reads.write_bytes(gzip.compress(b"@r\nA\n+\nF\n"))
            fh.write(f"{name}\t{reads}\n")

    from tracs_tpu.cli import main as cli_main

    def run(outdir, workers):
        t0 = time.time()
        cli_main([
            "pipe", "-i", str(input_tsv), "--database", str(db_path),
            "-o", str(outdir), "--min-cov", "2",
            "--align-workers", str(workers),
        ])
        return time.time() - t0

    t_serial = run(tmp_path / "serial", 1)
    t_parallel = run(tmp_path / "parallel", 4)
    assert t_serial / t_parallel > 2.0, (t_serial, t_parallel)

    a = (tmp_path / "serial" / "transmission_distances.csv").read_text()
    b = (tmp_path / "parallel" / "transmission_distances.csv").read_text()
    assert sorted(a.splitlines()) == sorted(b.splitlines())
