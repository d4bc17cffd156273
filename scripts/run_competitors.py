"""Competitor-evaluation drivers: inStrain, MIDAS2, StrainPhlAn.

Capability parity with the reference's paper-evaluation wrappers
(reference scripts/run-instrain.py, run-midas.py, run-strainphlan.py):
given two samples' read sets and reference genomes, run a competitor
pipeline and summarise its pairwise comparison per reference genome, so
tracs-tpu's accuracy can be benchmarked against it on simulated truth
(scripts/tracs_sim.py).  Each driver is gated on its external tool.

Usage:
  python scripts/run_competitors.py instrain \
      --inputA A_1.fq.gz A_2.fq.gz --inputB B_1.fq.gz B_2.fq.gz \
      --references ref1.fasta ref2.fasta -o out/
"""

from __future__ import annotations

import argparse
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tracs_tpu.io.external import require_tool, run  # noqa: E402
from tracs_tpu.io.fasta import read_fasta  # noqa: E402


def composite_alignment(references: dict, outdir: str, prefix: str, r1, r2, n_cpu: int) -> str:
    """Align reads once against a composite of all references (ref@contig
    renaming + an .stb-style mapping file), returning the sorted BAM."""
    for tool in ("minimap2", "samtools"):
        require_tool(tool)
    composite = outdir + "composite_reference.fasta"
    with open(composite, "w") as outfile, open(outdir + "composite_reference.txt", "w") as stb:
        for ref, path in references.items():
            for name, seq in read_fasta(path):
                outfile.write(f">{ref}@{name}\n{seq}\n")
                stb.write(f"{ref}@{name}\t{ref}\n")

    bam = outdir + prefix + "_composite_aln.bam"
    if os.path.exists(bam):
        return bam
    cmd = f"minimap2 -t {n_cpu} -p 1 -N 10 -ax sr {composite} {r1}"
    if r2:
        cmd += f" {r2}"
    cmd += (
        f" | samtools view -S -b --threads {n_cpu} - | "
        f"samtools sort --threads {n_cpu} - > {bam}"
    )
    run(cmd)
    run(f"samtools index {bam}")
    return bam


def run_instrain(args):
    require_tool("inStrain")
    dirs = {}
    bams = {}
    refs = {os.path.splitext(os.path.basename(r))[0]: r for r in args.references}
    for sample, reads in [("sampleA", args.input_files_A), ("sampleB", args.input_files_B)]:
        d = args.output_dir + sample + "/"
        os.makedirs(d, exist_ok=True)
        dirs[sample] = d
        r2 = reads[1] if len(reads) > 1 else None
        bams[sample] = composite_alignment(refs, d, sample, reads[0], r2, args.n_cpu)

    composite = dirs["sampleA"] + "composite_reference.fasta"
    stb = dirs["sampleA"] + "composite_reference.txt"
    for sample in dirs:
        run(
            f"inStrain profile {bams[sample]} {composite} --stb {stb} "
            f"-o {dirs[sample]} --skip_plot_generation -p {args.n_cpu}"
        )

    run(
        "inStrain compare -i "
        + dirs["sampleA"] + " " + dirs["sampleB"]
        + f" --min_cov 2 -o {args.output_dir}compare_instrain -p {args.n_cpu}"
    )

    # summarise per reference genome: compared bases, consensus/population
    # SNPs, popANI (reference run-instrain.py:248-264)
    table = args.output_dir + "compare_instrain/output/compare_instrain_comparisonsTable.tsv"
    counts = defaultdict(lambda: [0, 0, 0, 0])
    with open(table) as infile:
        header = next(infile).strip().split()
        for line in infile:
            row = line.strip().split()
            ref = row[0].split("@")[0]
            for i, col in enumerate([4, 6, 7, 8]):
                counts[ref][i] += int(row[col])
    out = args.output_dir + "compare_instrain_summary.tsv"
    with open(out, "w") as outfile:
        outfile.write("\t".join(header[k] for k in [0, 4, 6, 7, 8]) + "\n")
        for ref, vals in counts.items():
            outfile.write("\t".join([ref] + [str(v) for v in vals]) + "\n")
    print("summary:", out)


def run_midas(args):
    require_tool("midas2")
    db = args.midas_db or (args.output_dir + "midas_db")
    for sample, reads in [("sampleA", args.input_files_A), ("sampleB", args.input_files_B)]:
        r2 = f" -2 {reads[1]}" if len(reads) > 1 else ""
        run(
            f"midas2 run_snps --sample_name {sample} -1 {reads[0]}{r2} "
            f"--midasdb_name uhgg --midasdb_dir {db} --num_cores {args.n_cpu} "
            f"{args.output_dir}"
        )
    with open(args.output_dir + "samples_list.tsv", "w") as fh:
        fh.write("sample_name\tmidas_outdir\n")
        for sample in ("sampleA", "sampleB"):
            fh.write(f"{sample}\t{args.output_dir}\n")
    run(
        f"midas2 merge_snps --samples_list {args.output_dir}samples_list.tsv "
        f"--midasdb_name uhgg --midasdb_dir {db} --num_cores {args.n_cpu} "
        f"{args.output_dir}merged"
    )
    print("merged MIDAS2 SNP output:", args.output_dir + "merged")


def run_strainphlan(args):
    for tool in ("metaphlan", "sample2markers.py", "strainphlan"):
        require_tool(tool)
    markers = []
    for sample, reads in [("sampleA", args.input_files_A), ("sampleB", args.input_files_B)]:
        sam = args.output_dir + sample + ".sam.bz2"
        run(
            f"metaphlan {','.join(reads)} --input_type fastq -s {sam} "
            f"--bowtie2out {args.output_dir}{sample}.bowtie2.bz2 "
            f"-o {args.output_dir}{sample}_profile.tsv --nproc {args.n_cpu}"
        )
        run(
            f"sample2markers.py -i {sam} -o {args.output_dir} --nproc {args.n_cpu}"
        )
        markers.append(args.output_dir + sample + ".json.bz2")
    run(
        f"strainphlan -s {' '.join(markers)} -o {args.output_dir}strainphlan "
        f"--nproc {args.n_cpu}" + (f" -c {args.clade}" if args.clade else "")
    )
    print("strainphlan output:", args.output_dir + "strainphlan")


def main():
    parser = argparse.ArgumentParser(description=__doc__)
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
    parser.add_argument("--midas-db", dest="midas_db", default=None)
    parser.add_argument("--clade", dest="clade", default=None,
                        help="clade for strainphlan")
    parser.add_argument("-t", "--threads", dest="n_cpu", type=int, default=1)
    args = parser.parse_args()

    os.makedirs(args.output_dir, exist_ok=True)
    args.output_dir = os.path.join(args.output_dir, "")

    {"instrain": run_instrain, "midas": run_midas, "strainphlan": run_strainphlan}[args.tool](args)


if __name__ == "__main__":
    main()
