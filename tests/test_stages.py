"""Stage-level integration tests mirroring the reference test suite
(tests/test_pairsnp.py, test_trans_distance.py) on vendored data that
reproduces the reference ambig.aln pairwise structure."""

import gzip
import os
import sys

import numpy as np
import pytest

from tracs_tpu.ops.pairsnp import pairsnp
from tracs_tpu.stages.cluster import main as cluster_main
from tracs_tpu.stages.distance import main as distance_main

DATA = os.path.join(os.path.dirname(__file__), "data")


def test_pairsnp_ambig_golden():
    # same expected sparse COO as the reference's ambig.aln test
    # (reference tests/test_pairsnp.py:5-10)
    distances = pairsnp(
        fasta=[os.path.join(DATA, "ambig.aln")], n_threads=1, dist=10, filter=False
    )
    assert list(distances[0]) == [0, 0, 0, 0, 1, 1, 1, 2, 2, 3]
    assert list(distances[1]) == [1, 2, 3, 4, 2, 3, 4, 3, 4, 4]
    assert list(distances[2]) == [0, 2, 1, 1, 2, 2, 2, 3, 3, 0]


def test_distance_stage_goldens(tmp_path, monkeypatch):
    # mirrors reference tests/test_trans_distance.py:7-43
    out = str(tmp_path / "distances.csv")
    monkeypatch.setattr(
        sys, "argv",
        ["", "--msa", os.path.join(DATA, "ambig.aln"),
         "--meta", os.path.join(DATA, "dates_ambig.csv"),
         "-o", out, "-K", "10", "--snp_threshold", "5"],
    )
    distance_main()

    with open(out) as infile:
        lines = infile.readlines()

    assert lines[0].strip() == (
        "sampleA,sampleB,date difference,SNP distance,transmission distance,"
        "expected K,filtered SNP distance,sites considered,MSA file"
    )
    line1 = lines[1].strip().split(",")
    line2 = lines[2].strip().split(",")

    assert (line1[0], line1[1]) == ("seq1", "seq2")
    assert (line2[0], line2[1]) == ("seq1", "seq3")
    assert abs(float(line1[2]) - 0.002737907006988508) < 1e-6
    assert abs(float(line2[2]) - 0.002737907006988508) < 1e-6
    assert int(line1[3]) == 0
    assert int(line2[3]) == 2
    assert abs(float(line1[4]) - 0.23794988406662973) < 1e-6
    assert abs(float(line2[4]) - 0.024467137572328577) < 1e-6
    assert abs(float(line1[5]) - 2.6335200453700187) < 1e-6
    assert abs(float(line2[5]) - 7.315670110063259) < 1e-6
    # unfiltered run with metadata: filtered column is NA
    assert line1[6] == "NA"


def test_distance_stage_no_metadata(tmp_path, monkeypatch):
    out = str(tmp_path / "distances.csv")
    monkeypatch.setattr(
        sys, "argv",
        ["", "--msa", os.path.join(DATA, "ambig.aln"), "-o", out],
    )
    distance_main()
    with open(out) as infile:
        lines = infile.readlines()
    assert len(lines) == 11  # header + 10 pairs
    row = lines[1].strip().split(",")
    assert row[2] == "NA" and row[4] == "NA" and row[5] == "NA"
    assert row[6] == "0"  # zero-filled filt column (combine_vectors default)


def test_distance_trans_threshold_gates_rows(tmp_path, monkeypatch):
    out = str(tmp_path / "distances.csv")
    monkeypatch.setattr(
        sys, "argv",
        ["", "--msa", os.path.join(DATA, "ambig.aln"),
         "--meta", os.path.join(DATA, "dates_ambig.csv"),
         "-o", out, "-K", "3"],
    )
    distance_main()
    with open(out) as infile:
        lines = infile.readlines()[1:]
    for line in lines:
        assert float(line.split(",")[5]) <= 3


def test_cluster_stage(tmp_path, monkeypatch):
    dist_file = str(tmp_path / "d.csv")
    with open(dist_file, "w") as fh:
        fh.write("sampleA,sampleB,date difference,SNP distance,transmission "
                 "distance,expected K,filtered SNP distance,sites considered,MSA file\n")
        fh.write("a,b,NA,1,NA,NA,0,8,ref\n")
        fh.write("b,c,NA,50,NA,NA,0,8,ref\n")
        fh.write("d,e,NA,2,NA,NA,0,8,ref\n")
    out = str(tmp_path / "c.csv")
    monkeypatch.setattr(
        sys, "argv", ["", "-d", dist_file, "-o", out, "-c", "10", "-D", "snp"]
    )
    cluster_main()
    with open(out) as fh:
        lines = [l.strip() for l in fh.readlines()]
    assert lines[0] == "sample,cluster"
    got = dict(l.split(",") for l in lines[1:])
    # a-b linked; c alone (50 > 10); d-e linked
    assert got["a"] == got["b"]
    assert got["c"] != got["a"]
    assert got["d"] == got["e"]
    assert got["d"] != got["a"]
    # first-appearance order preserved
    assert [l.split(",")[0] for l in lines[1:]] == ["a", "b", "c", "d", "e"]


def test_cluster_metric_columns(tmp_path, monkeypatch):
    dist_file = str(tmp_path / "d.csv")
    with open(dist_file, "w") as fh:
        fh.write("h\n")
        fh.write("a,b,0.1,99,0.9,0.5,1,8,ref\n")
    for metric, expect_linked in [
        ("snp", False), ("filter", True), ("direct", True), ("expectedK", True)
    ]:
        out = str(tmp_path / f"c_{metric}.csv")
        monkeypatch.setattr(
            sys, "argv", ["", "-d", dist_file, "-o", out, "-c", "2", "-D", metric]
        )
        cluster_main()
        with open(out) as fh:
            lines = [l.strip() for l in fh.readlines()[1:]]
        labels = dict(l.split(",") for l in lines)
        assert (labels["a"] == labels["b"]) == expect_linked, metric


def test_combine_stage(tmp_path, monkeypatch):
    from tracs_tpu.stages.combine import main as combine_main

    # two sample dirs with align outputs for the same ref
    for sample, seq in [("s1", "ACGT"), ("s2", "ACNN")]:
        d = tmp_path / sample
        d.mkdir()
        with open(d / f"{sample}_posterior_counts_ref_REFX.fasta", "w") as fh:
            fh.write(f">{sample}_REFX\n{seq}\n")
        with open(d / f"{sample}_sourmash_hits.csv", "w") as fh:
            fh.write(",".join(["h"] * 10) + "\n")
            fh.write("1000,0.5,0.4,0.3,x,y,z,w,sig,\"REFX some species\"\n")
    out = tmp_path / "combined"
    monkeypatch.setattr(
        sys, "argv",
        ["", "-i", str(tmp_path / "s1"), str(tmp_path / "s2"), "-o", str(out)],
    )
    combine_main()
    with gzip.open(out / "REFX_combined.fasta.gz", "rt") as fh:
        content = fh.read()
    assert content == ">s1\nACGT\n>s2\nACNN\n"
    meta = (out / "combined_metadata.csv").read_text().strip().split("\n")
    assert meta[0].startswith("sample,accession,")
    row_s2 = [r for r in meta[1:] if r.startswith("s2,")][0].split(",")
    assert row_s2[1] == "REFX"
    assert abs(float(row_s2[9]) - 0.5) < 1e-12  # frac_N of ACNN
    assert row_s2[10] == "some species"


def test_threshold_stage(tmp_path, monkeypatch):
    from tracs_tpu.stages.threshold import main as threshold_main

    rng = np.random.default_rng(5)
    close = rng.poisson(3, size=300)
    far = rng.negative_binomial(20, 0.3, size=300)
    close_f = tmp_path / "close.csv"
    far_f = tmp_path / "far.csv"
    for path, vals in [(close_f, close), (far_f, far)]:
        with open(path, "w") as fh:
            fh.write("pair,snp\n")
            for i, v in enumerate(vals):
                fh.write(f"p{i},{v}\n")
    out = tmp_path / "thresh.csv"
    monkeypatch.setattr(
        sys, "argv",
        ["", "--close", str(close_f), "--distant", str(far_f), "-o", str(out)],
    )
    threshold_main()
    txt = out.read_text()
    assert "snp_threshold" in txt
    thresh = float([l for l in txt.strip().split("\n") if l.startswith("snp_threshold")][0].split(",")[1])
    # poisson.ppf(0.95, ~3) * 3 should land near 18
    assert 9 <= thresh <= 30


def test_cli_dispatch(tmp_path):
    from tracs_tpu.cli import main as cli_main

    out = str(tmp_path / "d.csv")
    cli_main(["distance", "--msa", os.path.join(DATA, "ambig.aln"), "-o", out])
    assert os.path.exists(out)
    with pytest.raises(SystemExit):
        cli_main(["--version"])


def test_plot_heatmap(tmp_path):
    from tracs_tpu.stages.plots import plot_heatmap

    dist_file = tmp_path / "d.csv"
    with open(dist_file, "w") as fh:
        fh.write("sampleA,sampleB,date difference,SNP distance,transmission "
                 "distance,expected K,filtered SNP distance,sites considered,MSA file\n")
        fh.write("a,b,NA,1,NA,NA,0,8,ref\n")
        fh.write("a,c,NA,5,NA,NA,0,8,ref\n")
        fh.write("b,c,NA,4,NA,NA,0,8,ref\n")
    plot_heatmap(str(dist_file), str(tmp_path / "hm"))
    assert (tmp_path / "hm.png").stat().st_size > 0
