"""``combine`` stage: gather per-sample align outputs into per-reference
combined alignments + merged metadata.

Parity with reference tracs/combine.py: scans each sample directory for
``*posterior_counts_ref_<REF>.fasta*``, writes ``<REF>_combined.fasta.gz``
with records renamed to the sample (one sequence per input enforced,
combine.py:230-236), computes the fraction of N calls, and merges sourmash
hit CSVs into ``combined_metadata.csv`` (coverage columns are "NA", matching
the reference's commented-out coverage calculation, combine.py:145-163).
"""

from __future__ import annotations

import argparse
import glob
import gzip
import logging
import os
import re
import sys
from collections import ChainMap, defaultdict

from joblib import Parallel, delayed

from tracs_tpu.io.fasta import read_fasta
from tracs_tpu.utils import add_loglevel_arg, setup_logging


def combine_parser(parser):
    parser.description = "Combine runs of align ready for distance estimation"

    io_opts = parser.add_argument_group("Input/output")
    io_opts.add_argument(
        "-i", "--input", dest="directories", required=True,
        help="Paths to each directory containing the output of the align function",
        type=os.path.abspath, nargs="+",
    )
    io_opts.add_argument(
        "-o", "--output", dest="output_dir", required=True,
        help="name of the output directory to store the combined alignments.",
        type=str,
    )

    parser.add_argument(
        "-t", "--threads", dest="n_cpu",
        help="number of threads to use (default=1)", type=int, default=1,
    )
    add_loglevel_arg(parser)
    parser.set_defaults(func=combine)
    return parser


def sum_after_semicolon(line: str) -> int:
    """Total read depth from a pileup line's count column
    (reference combine.py:77-81)."""
    last_column = line.strip().split()[-1]
    numbers_str = last_column.replace(":", ",")
    numbers = map(int, numbers_str.split(",")[2:])
    return sum(numbers)


def calculate_coverage(pileup: str):
    """Covered-site count and total depth for a pileup file (the reference
    defines this helper but leaves it unused, combine.py:84-103; here it is
    kept working for ad-hoc coverage summaries).  Returns
    (sample, ref, covered_sites, total_depth); NaN on truncated files."""
    import math

    sample = os.path.dirname(pileup).split(os.sep)[-1]
    ref = re.search(r"ref_(.+)_pileup", os.path.basename(pileup)).group(1)
    try:
        with gzip.open(pileup, "rt") as infile:
            cov = 0
            depth = 0
            for line in infile:
                c = sum_after_semicolon(line)
                if c > 0:
                    cov += 1
                depth += c
    except EOFError as e:
        logging.error(str(e))
        logging.error("Error: An EOFError occurred reading %s", pileup)
        return (sample, ref, math.nan, math.nan)
    return (sample, ref, cov, depth)


def find_ref(filename: str) -> str:
    result = re.search(r"posterior_counts_ref_(.+)\.fasta", filename)
    if not result:
        logging.error("ERROR: %s is not the expected output of align", filename)
        sys.exit(1)
    return result.group(1)


def write_alignment(ref, alns, output_dir):
    output_file = output_dir + ref + "_combined.fasta.gz"
    ncov = {}
    logging.info("Writing combined alignment for %s to %s", ref, output_file)
    with gzip.open(output_file, "wt") as fasta_file:
        for sample, path in alns:
            count = 0
            for _name, seq in read_fasta(path):
                fasta_file.write(f">{sample}\n{seq}\n")
                count += 1
                if count > 1:
                    logging.error("ERROR: %s contains more than one sequence", path)
                    sys.exit(1)
                ncov[(sample, ref)] = (seq.count("N") / len(seq), len(seq))
    return ncov


def combine(args):
    setup_logging(args.loglevel)

    # a single non-directory argument is a file listing directories
    if len(args.directories) == 1 and not os.path.isdir(args.directories[0]):
        with open(args.directories[0], "r") as infile:
            args.directories = [line.strip() for line in infile.readlines()]

    for directory in args.directories:
        if not os.path.isdir(directory):
            logging.error("ERROR: %s is not a directory", directory)
            sys.exit(1)

    if not os.path.exists(args.output_dir):
        os.mkdir(args.output_dir)
    args.output_dir = os.path.join(args.output_dir, "")

    alignments = defaultdict(list)
    for directory in args.directories:
        sample = os.path.basename(os.path.normpath(directory))
        for aln in glob.iglob(os.path.join(directory, "*posterior_counts_ref_*.fasta*")):
            ref = find_ref(aln)
            alignments[ref].append((sample, aln))

    ncovs = Parallel(n_jobs=args.n_cpu)(
        delayed(write_alignment)(ref, alns, args.output_dir)
        for ref, alns in alignments.items()
    )
    ncovs = ChainMap(*ncovs)

    # merge sourmash gather results (coverage columns intentionally NA)
    with open(args.output_dir + "combined_metadata.csv", "w") as outfile:
        outfile.write(
            "sample,accession,intersect_bp,f_orig_query,f_match,"
            "f_unique_to_query,coverage,mean_depth,mean_nonzero_depth,frac_N,species\n"
        )
        for directory in args.directories:
            sample = os.path.basename(os.path.normpath(directory))
            for sourmash in glob.iglob(os.path.join(directory, "*_sourmash_hits.csv")):
                with open(sourmash, "r") as infile:
                    next(infile)
                    for line in infile:
                        line = line.strip().split(",")
                        accession = line[9].split()[0].strip('"')
                        species = line[9].replace(accession, "").replace('"', "").strip()
                        if (sample, accession) in ncovs:
                            ncov = str(ncovs[(sample, accession)][0])
                        else:
                            ncov = "NA"
                        outfile.write(
                            ",".join(
                                [sample, accession]
                                + line[:4]
                                + ["NA", "NA", "NA", ncov, species]
                            )
                            + "\n"
                        )
    return


def main():
    parser = argparse.ArgumentParser()
    parser = combine_parser(parser)
    args = parser.parse_args()
    args.func(args)
    return


if __name__ == "__main__":
    main()
