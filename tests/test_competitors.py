"""Competitor-driver summarisation stages (scripts/run_competitors.py),
tested on synthetic tool outputs — the external pipelines themselves are
tool-gated and can't run in this image (reference scripts/run-instrain.py,
run-midas.py, run-strainphlan.py)."""

import gzip
import importlib.util
import io
import os
import sys

import pytest

_spec = importlib.util.spec_from_file_location(
    "run_competitors",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "run_competitors.py"),
)
rc = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(rc)


def test_summarise_instrain_aggregates_by_genome(tmp_path):
    table = tmp_path / "comparisonsTable.tsv"
    table.write_text(
        "scaffold\tname1\tname2\tcoverage_overlap\tcompared_bases_count\t"
        "percent_genome_compared\tlength\tconsensus_SNPs\tpopulation_SNPs\t"
        "popANI\tconANI\n"
        "refX@c1\ta\tb\t0\t100\t0\t0\t3\t5\t90\t0\n"
        "refX@c2\ta\tb\t0\t50\t0\t0\t2\t1\t80\t0\n"
        "refY@c1\ta\tb\t0\t10\t0\t0\t0\t0\t99\t0\n"
    )
    out = tmp_path / "summary.tsv"
    rc.summarise_instrain(str(table), str(out))
    lines = out.read_text().splitlines()
    assert lines[0] == "scaffold\tcompared_bases_count\tlength\tconsensus_SNPs\tpopulation_SNPs"
    rows = {l.split("\t")[0]: l.split("\t")[1:] for l in lines[1:]}
    assert rows["refX"] == ["150", "0", "5", "6"]
    assert rows["refY"] == ["10", "0", "0", "0"]


def test_count_rare_snps():
    # cols 8-11 are A/C/G/T depths; a site is a rare SNV when total
    # depth > 1 and no allele reaches depth 2
    rows = [
        "\t".join(["x"] * 8 + ["1", "1", "0", "0"]),  # SNP: 1+1, max 1
        "\t".join(["x"] * 8 + ["2", "1", "0", "0"]),  # no: an allele has 2
        "\t".join(["x"] * 8 + ["1", "0", "0", "0"]),  # no: total 1
        "\t".join(["x"] * 8 + ["0", "1", "1", "1"]),  # SNP
    ]
    assert rc.count_rare_snps(rows) == 2


def test_summarise_midas_plain_tsv(tmp_path):
    db = tmp_path / "db"
    db.mkdir()
    (db / "metadata.tsv").write_text(
        "genome\t101345\tx\ty\tEscherichia coli\tz\n"
    )
    merge = tmp_path / "merge"
    (merge / "snps" / "101345").mkdir(parents=True)
    (merge / "snps" / "snps_summary.tsv").write_text(
        "sample_name\tspecies_id\tc\td\tfrac\tmean\n"
        "sampleA\t101345\t0\t0\t0.91\t12.5\n"
        "sampleB\t101345\t0\t0\t0.88\t10.0\n"
    )
    body = "\n".join(
        ["header"]
        + ["\t".join(["s"] * 8 + d) for d in (["1", "1", "0", "0"], ["3", "0", "0", "0"])]
    )
    (merge / "snps" / "101345" / "101345.snps_info.tsv").write_text(body + "\n")
    out = tmp_path / "summary_snp_dist.tsv"
    rc.summarise_midas(str(merge), str(db), str(out))
    lines = out.read_text().splitlines()
    assert lines[0].startswith("speciesID\tsnp_dist")
    assert lines[1] == "101345\t1\tEscherichia coli\t0.91\t12.5\t0.88\t10.0"


def test_species_of_clades_and_clade_filter(tmp_path):
    prof = tmp_path / "profiled_metagenome.txt"
    prof.write_text(
        "#mpa_v31\n"
        "k__Bacteria|s__Escherichia_coli|t__SGB10068 99.0\n"
        "k__Bacteria|s__Evil_sp 1.0\n"
    )
    names = rc.species_of_clades([str(prof)])
    assert names == {"t__SGB10068": "s__Escherichia_coli"}

    clades = tmp_path / "print_clades_only.tsv"
    clades.write_text(
        "clade\tn\n"
        "t__SGB10068\t4\n"
        "s__not_a_strain\t4\n"
    )
    assert rc.clades_with_msa(str(clades)) == ["t__SGB10068"]


def test_clade_snp_distances_drops_padding(tmp_path):
    aln = tmp_path / "clade.aln"
    recs = {
        "A_metagenome": "ACGTACGT",
        "B_metagenome": "ACGTACGA",
        "temp1_A_metagenome": "ACGTACGT",
        "temp2_A_metagenome": "ACGTACGT",
    }
    aln.write_text("".join(f">{n}\n{s}\n" for n, s in recs.items()))
    buf = io.StringIO()
    rc.clade_snp_distances(str(aln), "s__Escherichia_coli", "t__SGB10068", buf)
    lines = buf.getvalue().splitlines()
    assert lines == [
        "s__Escherichia_coli,A_t__SGB10068,B_t__SGB10068,1"
    ]
