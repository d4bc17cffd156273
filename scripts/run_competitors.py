"""Competitor-evaluation drivers: inStrain, MIDAS2, StrainPhlAn.

Functional parity with the reference's paper-evaluation wrappers
(reference scripts/run-instrain.py:119-266, run-midas.py:17-189,
run-strainphlan.py:14-221): given two samples' read sets (and, for
inStrain, reference genomes), run a competitor pipeline end-to-end and
summarise its pairwise comparison per reference genome / species, so
tracs-tpu's accuracy can be benchmarked against it on simulated truth
(scripts/tracs_sim.py).  Each driver is gated on its external tools; the
summarisation stages are pure functions (tested without the tools in
tests/test_competitors.py).

Differences from the reference, by design:
- StrainPhlAn's final per-clade SNP distances use tracs_tpu's own
  pairsnp kernel in-process instead of shelling out to the `pairsnp`
  binary (reference run-strainphlan.py:206-210).
- MIDAS2's snps_info files are read through lz4 when available, falling
  back to the uncompressed .tsv some MIDAS2 versions emit.

Usage:
  python scripts/run_competitors.py instrain \
      --inputA A_1.fq.gz A_2.fq.gz --inputB B_1.fq.gz B_2.fq.gz \
      --references ref1.fasta ref2.fasta -o out/
  python scripts/run_competitors.py midas \
      --inputA ... --inputB ... --midas-db my_midasdb_gtdb -o out/
  python scripts/run_competitors.py strainphlan \
      --inputA ... --inputB ... --metaphlan-db metaphlanDB -o out/
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil
import sys
import tempfile
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tracs_tpu.io.external import require_tool, run  # noqa: E402
from tracs_tpu.io.fasta import read_fasta  # noqa: E402

SAMPLES = ("sampleA", "sampleB")


def _sample_reads(args):
    return dict(zip(SAMPLES, (args.input_files_A, args.input_files_B)))


def _subdirs(outdir: str):
    dirs = {}
    for sample in SAMPLES:
        d = os.path.join(outdir, sample, "")
        os.makedirs(d, exist_ok=True)
        dirs[sample] = d
    return dirs


# ---------------------------------------------------------------------------
# inStrain (reference scripts/run-instrain.py)
# ---------------------------------------------------------------------------


def composite_alignment(references: dict, outdir: str, prefix: str, reads,
                        n_cpu: int) -> str:
    """Align reads once against a composite of all references (ref@contig
    renaming + an .stb scaffold-to-bin mapping), returning the sorted BAM.
    Same minimap2/samtools contract as the tracs align stage; an existing
    BAM short-circuits (resume, reference run-instrain.py:49-50)."""
    for tool in ("minimap2", "samtools"):
        require_tool(tool)
    composite = outdir + "composite_reference.fasta"
    with open(composite, "w") as outfile, \
            open(outdir + "composite_reference.txt", "w") as stb:
        for ref, path in references.items():
            for name, seq in read_fasta(path):
                outfile.write(f">{ref}@{name}\n{seq}\n")
                stb.write(f"{ref}@{name}\t{ref}\n")

    bam = outdir + prefix + "_composite_aln.bam"
    if os.path.exists(bam):
        return bam
    cmd = f"minimap2 -t {n_cpu} -p 1 -N 10 -ax sr {composite} {' '.join(reads)}"
    cmd += (
        f" | samtools view -S -b --threads {n_cpu} - | "
        f"samtools sort --threads {n_cpu} - > {bam}"
    )
    run(cmd)
    run(f"samtools index {bam}")
    return bam


def summarise_instrain(table_path: str, out_path: str) -> None:
    """Aggregate inStrain's per-scaffold comparisonsTable over reference
    genomes (the part before the '@' in the composite scaffold names),
    summing compared_bases_count, consensus_SNPs, population_SNPs and
    popANI columns (reference run-instrain.py:250-264)."""
    keep_cols = [4, 6, 7, 8]
    counts = defaultdict(lambda: [0, 0, 0, 0])
    with open(table_path) as infile:
        header = next(infile).strip().split()
        for line in infile:
            row = line.strip().split()
            ref = row[0].split("@")[0]
            for i, col in enumerate(keep_cols):
                counts[ref][i] += int(row[col])
    with open(out_path, "w") as outfile:
        outfile.write("\t".join(header[k] for k in [0, *keep_cols]) + "\n")
        for ref, vals in counts.items():
            outfile.write("\t".join([ref] + [str(v) for v in vals]) + "\n")


def run_instrain(args):
    require_tool("inStrain")
    if not args.references:
        sys.exit("--references is required for the inStrain driver")
    dirs = _subdirs(args.output_dir)
    refs = {Path(r).stem: r for r in args.references}
    bams = {
        sample: composite_alignment(refs, dirs[sample], sample, reads, args.n_cpu)
        for sample, reads in _sample_reads(args).items()
    }

    composite = dirs["sampleA"] + "composite_reference.fasta"
    stb = dirs["sampleA"] + "composite_reference.txt"
    for sample in SAMPLES:
        run(
            f"inStrain profile {bams[sample]} {composite} --stb {stb} "
            f"-o {dirs[sample]} --skip_plot_generation -p {args.n_cpu}"
        )
    run(
        f"inStrain compare -i {dirs['sampleA']} {dirs['sampleB']} "
        f"--min_cov 2 -o {args.output_dir}compare_instrain -p {args.n_cpu}"
    )

    out = args.output_dir + "compare_instrain_summary.tsv"
    summarise_instrain(
        args.output_dir
        + "compare_instrain/output/compare_instrain_comparisonsTable.tsv",
        out,
    )
    print("summary:", out)


# ---------------------------------------------------------------------------
# MIDAS2 (reference scripts/run-midas.py)
# ---------------------------------------------------------------------------


def count_rare_snps(lines) -> int:
    """MIDAS2 rare-SNV count from a snps_info table body: a covered site
    (total allele depth > 1 over the A/C/G/T count columns 8-11) counts as
    a SNP when NO allele reaches depth 2 — i.e. the minor evidence is a
    single read, the 'rare' pooled-SNV definition the reference evaluates
    (run-midas.py:173-184)."""
    nsnp = 0
    for line in lines:
        row = line.strip().split()
        depths = [int(row[i]) for i in range(8, 12)]
        if sum(depths) > 1 and max(depths) < 2:
            nsnp += 1
    return nsnp


def _open_snps_info(path: str):
    """snps_info may be .tsv.lz4 (needs the lz4 module) or plain .tsv."""
    if path.endswith(".lz4"):
        import lz4.frame

        return lz4.frame.open(path, mode="rt")
    return open(path)


def load_species_names(metadata_tsv: str) -> dict:
    """MIDAS2 database metadata: species id (col 2) -> taxon name (col 5)."""
    names = {}
    with open(metadata_tsv) as infile:
        for line in infile:
            row = line.split("\t")
            names[row[1]] = row[4]
    return names


def summarise_midas(merge_dir: str, db_dir: str, out_path: str) -> None:
    """Per-species SNP distances + coverage summary (reference
    run-midas.py:151-187): species name from the DB metadata, fraction/mean
    coverage per sample from snps_summary.tsv (last two columns), and the
    rare-SNV count from each species' snps_info table."""
    names = load_species_names(os.path.join(db_dir, "metadata.tsv"))
    cov = {}
    with open(os.path.join(merge_dir, "snps", "snps_summary.tsv")) as infile:
        for line in infile:
            row = line.strip().split()
            cov[(row[0], row[1])] = row[-2:]

    with open(out_path, "w") as outfile:
        outfile.write("speciesID\tsnp_dist\tspecies_name\tfcovA\tmcovA\tfcovB\tmcovB\n")
        infos = sorted(
            glob.glob(os.path.join(merge_dir, "snps", "*", "*snps_info.tsv*"))
        )
        for info in infos:
            species = os.path.basename(info).split(".snps_info")[0]
            with _open_snps_info(info) as fp:
                next(fp)
                nsnp = count_rare_snps(fp)
            outfile.write(
                "\t".join(
                    [species, str(nsnp), names.get(species, "NA")]
                    + cov.get(("sampleA", species), ["NA", "NA"])
                    + cov.get(("sampleB", species), ["NA", "NA"])
                )
                + "\n"
            )


def run_midas(args):
    require_tool("midas2")
    if not args.midas_db:
        sys.exit("--midas-db is required for the MIDAS2 driver")
    db = args.midas_db
    reads = _sample_reads(args)
    # species profiling then SNP calling, per sample (reference
    # run-midas.py:100-126)
    for step in ("run_species", "run_snps"):
        for sample, files in reads.items():
            r2 = f" -2 {files[1]}" if len(files) > 1 else ""
            run(
                f"midas2 {step} --sample_name {sample} -1 {files[0]}{r2} "
                f"--midasdb_name gtdb --midasdb_dir {db} "
                f"--num_cores {args.n_cpu} {args.output_dir}"
            )

    manifest = args.output_dir + "midas_list_of_samples.tsv"
    with open(manifest, "w") as fh:
        fh.write("sample_name\tmidas_outdir\n")
        for sample in SAMPLES:
            fh.write(f"{sample}\t{args.output_dir}\n")

    merge_dir = args.output_dir + "merge"
    # pooled rare-SNV calls with the reference's site filters
    # (run-midas.py:135-146)
    run(
        f"midas2 merge_snps --samples_list {manifest} "
        f"--midasdb_name gtdb --midasdb_dir {db} "
        "--site_ratio 100 --genome_coverage 0.1 --genome_depth 0.01 "
        "--snv_type rare --site_prev 1 --snp_pooled_method abundance "
        f"--num_cores {args.n_cpu} {merge_dir}"
    )

    out = args.output_dir + "summary_snp_dist.tsv"
    summarise_midas(merge_dir, db, out)
    print("summary:", out)


# ---------------------------------------------------------------------------
# StrainPhlAn (reference scripts/run-strainphlan.py)
# ---------------------------------------------------------------------------


def species_of_clades(profile_paths) -> dict:
    """Map each strain-level clade (t__...) seen in MetaPhlAn profiles to
    its parent species-level name (reference run-strainphlan.py:139-146)."""
    names = {}
    for path in profile_paths:
        with open(path) as infile:
            for line in infile:
                if line.startswith("#"):
                    continue
                taxa = line.split()[0].split("|")
                if "t__" in taxa[-1]:
                    names[taxa[-1]] = taxa[-2]
    return names


def clades_with_msa(print_clades_tsv: str) -> list:
    """SGB clades StrainPhlAn reports as alignable (reference
    run-strainphlan.py:163-168)."""
    specs = []
    with open(print_clades_tsv) as infile:
        next(infile)
        for line in infile:
            if "t__SGB" in line:
                specs.append(line.split()[0])
    return specs


def clade_snp_distances(aln_path: str, species: str, clade: str, outfile) -> None:
    """Pairwise SNP distances over one clade's concatenated marker MSA via
    tracs_tpu's own pairsnp kernel (the reference shells out to the pairsnp
    binary, run-strainphlan.py:206-210).  Rows naming the padding 'temp'
    markers are dropped; '<S>_metagenome' names become '<S>_<clade>'."""
    from tracs_tpu.ops.pairsnp import pairsnp

    rows, cols, dists, names, _f, _nn = pairsnp([aln_path])
    for r, c, d in zip(rows, cols, dists):
        a, b = names[r], names[c]
        if "temp" in a or "temp" in b:
            continue
        a = a.replace("_metagenome", f"_{clade}")
        b = b.replace("_metagenome", f"_{clade}")
        outfile.write(f"{species},{a},{b},{int(d)}\n")


def run_strainphlan(args):
    for tool in ("metaphlan", "sample2markers.py", "extract_markers.py",
                 "strainphlan"):
        require_tool(tool)
    if not args.metaphlan_db:
        sys.exit("--metaphlan-db is required for the StrainPhlAn driver")
    db = os.path.abspath(args.metaphlan_db)
    dirs = _subdirs(args.output_dir)
    temp_dir = os.path.join(tempfile.mkdtemp(dir=args.output_dir), "")

    # 1. taxonomic profiling (resumable from a saved bowtie2out,
    #    reference run-strainphlan.py:100-117)
    for sample, reads in _sample_reads(args).items():
        d = dirs[sample]
        tag = sample[-1]  # 'A' / 'B'
        bt2 = d + tag + "_metagenome.bowtie2.bz2"
        if os.path.exists(bt2):
            cmd = f"metaphlan --input_type bowtie2out {bt2}"
        else:
            cmd = f"metaphlan --input_type fastq {','.join(reads)} --bowtie2out {bt2}"
        run(
            cmd + f" --bowtie2db {db} -s {d}{tag}_metagenome.sam.bz2 "
            f"-o {d}profiled_metagenome.txt --nproc {args.n_cpu}"
        )

    # 2. per-sample consensus markers
    marker_dir = args.output_dir + "consensus_markers/"
    os.makedirs(marker_dir, exist_ok=True)
    run(
        f"sample2markers.py -d {db} -i {args.output_dir}sample*/*metagenome.sam.bz2 "
        f"-o {marker_dir} --tmp {temp_dir} -n {args.n_cpu}"
    )
    # StrainPhlAn refuses MSAs with <4 samples; padding duplicate copies of
    # sample A's markers (dropped from the final distances) talks it into
    # running on a pair (reference run-strainphlan.py:132-136)
    for pad in ("temp1", "temp2"):
        shutil.copyfile(
            marker_dir + "A_metagenome.pkl",
            marker_dir + pad + "_A_metagenome.pkl",
        )

    species = species_of_clades(
        dirs[s] + "profiled_metagenome.txt" for s in SAMPLES
    )

    # 3. enumerate alignable clades
    em_db = glob.glob(db + "/*.pkl")[0]
    pa_dir = args.output_dir + "strainphlan_pa/"
    os.makedirs(pa_dir, exist_ok=True)
    run(
        f"strainphlan -s {marker_dir}*.pkl -o {pa_dir} --print_clades_only -d {em_db}"
    )
    clades = clades_with_msa(pa_dir + "print_clades_only.tsv")
    print("clades:", clades)

    # 4. per-clade marker extraction + MSA
    db_markers = args.output_dir + "db_markers/"
    os.makedirs(db_markers, exist_ok=True)
    msa_dir = args.output_dir + "strainphlan_output/"
    for clade in clades:
        run(f"extract_markers.py -c {clade} -o {db_markers} -d {em_db}")
        clade_dir = msa_dir + clade
        os.makedirs(clade_dir, exist_ok=True)
        run(
            f"strainphlan -s {marker_dir}*.pkl -m {db_markers}{clade}.fna "
            f"-o {clade_dir} -c {clade} -d {db}"
        )

    # 5. SNP distances per clade over the concatenated marker MSAs
    out = args.output_dir + "strainphlan_distances.tsv"
    with open(out, "w") as outfile:
        outfile.write("species,sample1,sample2,snp_dist\n")
        for clade in clades:
            aln = f"{msa_dir}{clade}/{clade}.StrainPhlAn4_concatenated.aln"
            clade_snp_distances(aln, species.get(clade, "NA"), clade, outfile)
    shutil.rmtree(temp_dir)
    print("summary:", out)


def main():
    parser = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    parser.add_argument("tool", choices=["instrain", "midas", "strainphlan"])
    io_opts = parser.add_argument_group("Input/output")
    io_opts.add_argument("--inputA", dest="input_files_A", required=True,
                         type=os.path.abspath, nargs="+",
                         help="path to fastq files in sample A")
    io_opts.add_argument("--inputB", dest="input_files_B", required=True,
                         type=os.path.abspath, nargs="+",
                         help="path to fastq files in sample B")
    io_opts.add_argument("--references", dest="references", default=[],
                         type=os.path.abspath, nargs="*",
                         help="path to reference fastas (instrain)")
    io_opts.add_argument("-o", "--output", dest="output_dir", required=True,
                         type=os.path.abspath)
    parser.add_argument("--midas-db", dest="midas_db", default=None,
                        type=os.path.abspath, help="MIDAS2 gtdb database dir")
    parser.add_argument("--metaphlan-db", dest="metaphlan_db", default=None,
                        help="MetaPhlAn bowtie2 database dir (strainphlan)")
    parser.add_argument("-t", "--threads", dest="n_cpu", type=int, default=1)
    args = parser.parse_args()

    os.makedirs(args.output_dir, exist_ok=True)
    args.output_dir = os.path.join(args.output_dir, "")

    {"instrain": run_instrain, "midas": run_midas,
     "strainphlan": run_strainphlan}[args.tool](args)


if __name__ == "__main__":
    main()
