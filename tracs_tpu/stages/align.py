"""``align`` stage: per-sample reference selection, read alignment, and
coverage-aware posterior allele calling.

Pipeline parity with reference tracs/align.py:255-647:
  (a) reference selection via sourmash gather against a database zip, or a
      single ``--refseqs`` fasta;
  (b) assemblies are shredded into pseudo-reads (align.py:394-398);
  (c) per-reference minimap2/samtools/htsbox alignment + pileup;
  (d) pileup -> [L, 4] count matrix (native parser, io/pileup.py);
  (e) coverage statistics and skip rules (<25% covered, align.py:530-534);
  (f) consensus mode: argmax one-hot with low-coverage rows -> N;
  (g) Dirichlet-multinomial prior fit + posterior thresholding on device
      (models/dirichlet.py);
  (h) coverage-outlier masking from alphas + IQR (align.py:550-563,599-613);
  (i) posterior-count csv.gz + one-record IUPAC fasta via the little-endian
      nibble table (align.py:285-323, 616-641; skip if >75% N).

Genbank auto-download (reference align.py:209-234, ncbi_genome_download) is
gated: it raises a clear error when the package is unavailable, steering
users to a database zip or --refseqs folder.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import logging
import os
import shutil
import sys
import tempfile
from collections import Counter
from zipfile import ZipFile

import numpy as np

from tracs_tpu.io.external import align_and_pileup, generate_reads, run_gather
from tracs_tpu.io.fasta import read_fasta
from tracs_tpu.io.pileup import parse_pileup
from tracs_tpu.models.dirichlet import calculate_posteriors, find_dirichlet_priors
from tracs_tpu.ops.packing import IUPAC_BY_NIBBLE
from tracs_tpu.utils import add_loglevel_arg, setup_logging


def align_parser(parser):
    parser.description = (
        "Uses sourmash to identify reference genomes within a read set and "
        "then aligns reads to each reference using minimap2"
    )

    io_opts = parser.add_argument_group("Input/output")
    io_opts.add_argument(
        "-i", "--input", dest="input_files", required=True,
        help="path to query signature", type=os.path.abspath, nargs="+",
    )
    io_opts.add_argument(
        "--database", dest="database",
        help="path to database signatures", type=os.path.abspath, default=None,
    )
    io_opts.add_argument(
        "--refseqs", dest="refseqs",
        help="path to reference fasta files", type=os.path.abspath, default=None,
    )
    io_opts.add_argument(
        "-o", "--output", dest="output_dir", required=True,
        help="location of an output directory", type=os.path.abspath,
    )
    io_opts.add_argument(
        "-p", "--prefix", dest="prefix", default=None,
        help="prefix to describe the input sample read files", type=str,
    )

    alignment = parser.add_argument_group("Alignment options")
    alignment.add_argument(
        "--minimap_preset", dest="minimap_preset",
        help="minimap preset to use - one of 'sr' (default), 'map-ont' or 'map-pb'",
        default="sr", type=str,
    )
    alignment.add_argument(
        "--composite", dest="composite",
        help="align reads ONCE against a composite of all selected references "
             "and split the pileup per reference (faster for metagenomic "
             "samples hitting many references)",
        action="store_true", default=False,
    )

    pileup = parser.add_argument_group("Pileup options")
    pileup.add_argument("-Q", "--min_base_qual", dest="min_base_qual",
                        help="minimum base quality (default=0)", type=int, default=0)
    pileup.add_argument("-q", "--min_map_qual", dest="min_map_qual",
                        help="minimum mapping quality (default=0)", type=int, default=0)
    pileup.add_argument("-l", "--min_query_len", dest="min_query_len",
                        help="minimum query length (default=0)", type=int, default=0)
    pileup.add_argument("-V", "--max_div", dest="max_div",
                        help="ignore queries with per-base divergence > max_div (default=1)",
                        type=float, default=1)
    pileup.add_argument("--trim", dest="trim",
                        help="ignore bases within TRIM-bp from either end of a read (default=0)",
                        type=int, default=0)

    posterior = parser.add_argument_group("Posterior count estimates")
    posterior.add_argument(
        "--consensus", dest="consensus",
        help="Turns on consensus mode. Only the most common allele at each "
             "site will be reported and all other filters will be ignored.",
        action="store_true", default=False,
    )
    posterior.add_argument("--min-cov", dest="min_cov", default=5,
                           help="Minimum read coverage (default=5).", type=int)
    posterior.add_argument(
        "--keep-cov-outliers", dest="keep_cov_outliers",
        help="Turns off filtering of genome regions with unusual coverage. "
             "Useful if no gene gain/loss is expected.",
        action="store_true", default=False,
    )
    posterior.add_argument(
        "--error-perc", dest="error_threshold", default=0.01,
        help="Threshold to exclude likely erroneous variants.", type=float,
    )
    posterior.add_argument(
        "--either-strand", dest="require_both_strands",
        help="turns off the requirement that a variant is supported by both strands",
        action="store_false", default=True,
    )
    posterior.add_argument(
        "--keep-all", dest="keep_all",
        help="turns on keeping of variants with support below the posterior "
             "frequency threshold",
        action="store_true", default=False,
    )

    parser.add_argument("-t", "--threads", dest="n_cpu",
                        help="number of threads to use (default=1)", type=int, default=1)
    add_loglevel_arg(parser)
    parser.set_defaults(func=align)
    return parser


def fetch_genbank_assembly(accession: str, outdir: str) -> str:
    """Download one assembly by accession into ``outdir`` and return the
    fasta path.  Tries the Genbank section first, then RefSeq (reference
    align.py:209-234).  Gated: the downloader package is optional here."""
    try:
        import ncbi_genome_download as ngd
    except ImportError as e:
        raise RuntimeError(
            "Automatic Genbank reference download requires the "
            "ncbi_genome_download package, which is not available in this "
            "environment. Build a database zip with 'build-db' or pass "
            "--refseqs with a local genome folder instead."
        ) from e
    for section in ("genbank", "refseq"):
        status = ngd.download(
            groups="bacteria", section=section, file_formats="fasta",
            flat_output=True, output=outdir, assembly_accessions=accession,
        )
        if status == 0:
            return glob.glob(os.path.join(outdir, "*fna.gz"))[0]
    raise ValueError("Could not download reference for: ", accession)


def gtdb_fasta_path(root_dir: str, accession: str) -> str:
    """Resolve an accession inside a GTDB-style genome folder, which nests
    genomes by accession segments (GCA_000123456 ->
    GCA/000/123/456/*.fna.gz; reference align.py:236-252)."""
    segments = (accession[:3], accession[4:7], accession[7:10], accession[10:13])
    nested = os.path.join(root_dir, *segments)
    for path in glob.glob(os.path.join(nested, "*.fna.gz")):
        return path
    raise ValueError("Could not find reference for: ", accession)


# keep the reference's public helper names importable
download_ref = fetch_genbank_assembly
find_fasta = gtdb_fasta_path


def nibble_sequence(mask01: np.ndarray) -> str:
    """[L, 4] 0/1 allele-presence -> IUPAC string via the little-endian
    nibble (reference align.py:285-323: np.packbits bitorder='little')."""
    nib = (
        mask01[:, 0].astype(np.uint8)
        | (mask01[:, 1].astype(np.uint8) << 1)
        | (mask01[:, 2].astype(np.uint8) << 2)
        | (mask01[:, 3].astype(np.uint8) << 3)
    )
    return IUPAC_BY_NIBBLE[nib].tobytes().decode("utf-8")


def _gather_reference_names(args, temp_dir: str) -> list[str]:
    """Run reference selection (gather) against the database and return the
    selected names.  Prefers the native FracMinHash gather whenever the db
    zip carries no SBT, or carries native sketches and sourmash is absent;
    otherwise shells out to sourmash gather against the (possibly embedded)
    SBT index."""
    from tracs_tpu.sketch import load_db_sketches, native_gather

    is_bare_sbt = ".sbt.zip" in args.database
    if not is_bare_sbt:
        with ZipFile(args.database) as archive:
            has_sbt = "sourmashDB.sbt.zip" in archive.namelist()
        sourmash_available = shutil.which("sourmash") is not None
        if not has_sbt or (not sourmash_available and load_db_sketches(args.database)):
            logging.info("Selecting references with the native FracMinHash gather")
            return native_gather(
                args.input_files,
                args.database,
                args.output_dir + args.prefix + "_sourmash_hits.csv",
            )

    if is_bare_sbt:
        sbt = args.database
    else:
        with ZipFile(args.database) as archive:
            archive.extract("sourmashDB.sbt.zip", temp_dir)
        sbt = temp_dir + "sourmashDB.sbt.zip"
    return run_gather(
        input_files=args.input_files,
        databasefile=sbt,
        output=args.output_dir + args.prefix + "_sourmash_hits",
        temp_dir=temp_dir,
    )


def _locate_accession(args, accession: str) -> str:
    """Fasta path for one selected accession when the database zip carries
    no genomes (bare SBT): a GTDB-style --refseqs folder if given, else a
    cached-or-fresh Genbank download under genbank_references/."""
    if args.refseqs is not None:
        return gtdb_fasta_path(args.refseqs, accession)
    cache_dir = args.output_dir + "genbank_references/" + accession + "/"
    if os.path.exists(cache_dir):
        logging.info("Reference already downloaded: %s", accession)
        return glob.glob(cache_dir + "*.fna.gz")[0]
    os.makedirs(cache_dir)
    return fetch_genbank_assembly(accession, cache_dir)


def select_references(args, temp_dir: str) -> dict[str, str]:
    """{reference name: fasta path} from whichever source the CLI gave:

    * ``--refseqs <fasta>`` with no database — that one genome;
    * a build-db zip — gather (native or sourmash), genomes extracted
      straight from the zip;
    * a bare ``.sbt.zip`` — sourmash gather, genomes resolved from a GTDB
      folder or downloaded from Genbank (reference align.py:264-388).
    """
    if args.database is None:
        name = os.path.splitext(os.path.basename(args.refseqs))[0]
        return {name: args.refseqs}

    selected = _gather_reference_names(args, temp_dir)

    if ".sbt.zip" in args.database:
        logging.warning(
            "No references provided. tracs_tpu will attempt to locate or "
            "download references"
        )
        accessions = [name.split()[0].strip('"') for name in selected]
        logging.debug("%s", accessions)
        return {acc: _locate_accession(args, acc) for acc in accessions}

    with ZipFile(args.database) as archive:
        for ref in selected:
            archive.extract(ref + ".fasta.gz", temp_dir)
    return {ref: temp_dir + ref + ".fasta.gz" for ref in selected}


def _resolve_reads(args, temp_dir: str):
    """(r1, r2) read files for the aligner; a single bare assembly fasta is
    shredded into pseudo-reads first (reference align.py:394-398)."""
    if len(args.input_files) == 2:
        return args.input_files[0], args.input_files[1]
    (single,) = args.input_files
    if os.path.splitext(single)[1] in (".fasta", ".fa"):
        shredded = temp_dir + "simulated_" + os.path.basename(single) + ".gz"
        generate_reads(single, shredded)
        return shredded, None
    return single, None


def align(args):
    setup_logging(args.loglevel)

    if args.database is None and args.refseqs is None:
        logging.error("Must provide either a database or reference sequences!")
        sys.exit(1)
    if args.database is not None and ".zip" not in args.database:
        logging.error("Database must be a zip file!")
        sys.exit(1)
    if args.database is None and args.refseqs is not None:
        if ".fna" not in args.refseqs and ".fasta" not in args.refseqs:
            logging.error(
                "Reference sequences must be a fasta file if not using a database!"
            )
            sys.exit(1)

    os.makedirs(args.output_dir, exist_ok=True)
    args.output_dir = os.path.join(args.output_dir, "")
    if args.refseqs is not None and args.database is not None:
        # with a database, --refseqs is a GTDB-style genome FOLDER
        args.refseqs = os.path.join(args.refseqs, "")
    temp_dir = os.path.join(tempfile.mkdtemp(dir=args.output_dir), "")

    if args.prefix is None:
        args.prefix = os.path.splitext(os.path.basename(args.input_files[0]))[0]

    ref_locs = select_references(args, temp_dir)
    references = list(ref_locs)
    r1, r2 = _resolve_reads(args, temp_dir)

    if getattr(args, "composite", False):
        from tracs_tpu.io.external import align_and_pileup_composite

        align_and_pileup_composite(
            {ref: ref_locs[ref] for ref in references},
            temp_dir,
            args.output_dir + args.prefix,
            r1,
            r2=r2,
            aligner="minimap2",
            minimap_preset=args.minimap_preset,
            minimap_params=None,
            Q=args.min_base_qual,
            q=args.min_map_qual,
            l=args.min_query_len,
            V=args.max_div,
            T=args.trim,
            n_cpu=args.n_cpu,
        )
    else:
        for ref in references:
            align_and_pileup(
                ref_locs[ref],
                temp_dir,
                args.output_dir + args.prefix + "_ref_" + str(ref),
                r1,
                r2=r2,
                aligner="minimap2",
                minimap_preset=args.minimap_preset,
                minimap_params=None,
                Q=args.min_base_qual,
                q=args.min_map_qual,
                l=args.min_query_len,
                V=1,
                T=args.trim,
                max_div=args.max_div,
                n_cpu=args.n_cpu,
            )

    for ref in references:
        logging.info("Analysing reference: %s", ref)
        process_reference(args, ref, ref_locs[ref])

    shutil.rmtree(temp_dir)
    logging.info("Successfully completed align!")
    return


def process_reference(args, ref, ref_loc):
    """Posterior-calling for one reference from its pileup file — the
    numerical core of the align stage (reference align.py:444-641)."""
    contig_lengths = {name: len(seq) for name, seq in read_fasta(ref_loc)}
    pileup_path = args.output_dir + args.prefix + "_ref_" + str(ref) + "_pileup.txt.gz"
    all_counts = parse_pileup(
        pileup_path, contig_lengths, require_both_strands=args.require_both_strands
    )

    rs = np.sum(all_counts, 1)
    nz_cov = np.sum(all_counts[rs > 0,], 1)
    total_cov = np.sum(rs > 0) / all_counts.shape[0]
    median_cov = np.median(nz_cov) if nz_cov.size else 0.0

    out_fasta = (
        args.output_dir + args.prefix + "_posterior_counts_ref_" + str(ref) + ".fasta"
    )

    if args.consensus:
        logging.info("Consensus requested. Skipping all coverage filters!")
        all_counts_01 = np.zeros_like(all_counts, dtype=int)
        max_indices = np.argmax(all_counts, axis=1)
        all_counts_01[np.arange(all_counts.shape[0]), max_indices] = 1
        all_counts_01[rs < args.min_cov,] = 1
        sequence = nibble_sequence(all_counts_01 > 0)
        logging.info("allelecount: %s", Counter(sequence))

        if sequence.count("N") / float(len(sequence)) > 0.75:
            logging.info(
                "Skipping reference: %s as less than 25%% of the genome has "
                "sufficient read coverage.", ref,
            )
            return
        with open(out_fasta, "w") as outfile:
            outfile.write(">" + args.prefix + "_" + str(ref) + "\n")
            outfile.write(sequence + "\n")
        return

    expected_freq_threshold = max(args.min_cov / median_cov, args.error_threshold) if median_cov else 1.0
    total_cov_min_threshold = np.sum(rs >= args.min_cov) / all_counts.shape[0]

    logging.info("Fraction of genome with read coverage: %s", total_cov)
    logging.info(
        "Fraction of genome with read coverage >= %s: %s",
        args.min_cov, total_cov_min_threshold,
    )
    logging.info("Median non-zero coverage: %s", median_cov)

    if total_cov_min_threshold < 0.25:
        logging.info(
            "Skipping reference: %s as less than 25%% of the genome has "
            "sufficient read coverage.", ref,
        )
        return

    alphas = find_dirichlet_priors(
        all_counts, method="FPI", error_filt_threshold=args.error_threshold
    )
    logging.info("Calculated alphas: %s", alphas)

    if expected_freq_threshold <= alphas[1] / (median_cov + np.sum(alphas)):
        expected_freq_threshold = alphas[1] / (median_cov + np.sum(alphas)) + 0.01
        logging.warning(
            "WARNING: Frequency threshold is set too low! The majority of the "
            "genome will be called as ambiguous."
        )
        logging.warning(
            "WARNING: The threshold has been automatically increased to: %s",
            expected_freq_threshold,
        )

    # coverage-outlier band (gene gain/loss guard, align.py:550-563)
    cov_filter_threshold = 50
    bad_cov_lower_bound = bad_cov_upper_bound = None
    if not args.keep_cov_outliers:
        if (median_cov > cov_filter_threshold) and (
            alphas[1] / np.sum(alphas) > expected_freq_threshold
        ):
            bad_cov_lower_bound = alphas[1] / expected_freq_threshold - np.sum(alphas)
            lq = np.quantile(nz_cov, [0.25, 0.5])
            bad_cov_upper_bound = lq[0] - 1.5 * (lq[1] - lq[0])
            if bad_cov_lower_bound < bad_cov_upper_bound:
                logging.info("Lower coverage bound: %s", bad_cov_lower_bound)
                logging.info("Upper coverage bound: %s", bad_cov_upper_bound)

    logging.info("Using frequency threshold: %s", expected_freq_threshold)
    logging.info("Calculating posterior frequency estimates...")
    logging.info(
        "Filtering sites with posterior estimates below frequency threshold: %s",
        expected_freq_threshold,
    )
    if args.keep_all:
        logging.info("Keeping all observed alleles")

    all_counts = calculate_posteriors(
        all_counts, alphas, args.keep_all, expected_freq_threshold
    )

    logging.info("saving to file...")
    with gzip.open(
        args.output_dir + args.prefix + "_posterior_counts_ref_" + str(ref) + ".csv.gz",
        "wb",
    ) as outfile:
        np.savetxt(outfile, all_counts, delimiter=",", newline="\n", fmt="%0.5f")
        outfile.write(b"\n")

    if bad_cov_lower_bound is not None:
        logging.info(
            "Fraction of genome filtered by coverage: %s",
            np.sum((rs < bad_cov_upper_bound) & (rs > bad_cov_lower_bound)) / len(rs),
        )
        if bad_cov_upper_bound > bad_cov_lower_bound:
            all_counts[(rs <= bad_cov_upper_bound) & (rs >= bad_cov_lower_bound),] = 1
    all_counts[rs < args.min_cov,] = 1

    sequence = nibble_sequence(all_counts > 0)
    logging.info("allelecount: %s", Counter(sequence))

    if sequence.count("N") / float(len(sequence)) > 0.75:
        logging.info(
            "Skipping reference: %s as greater than 75%% of the genome has "
            "completely ambiguous (N) base calls!", ref,
        )
        return

    with open(out_fasta, "w") as outfile:
        outfile.write(">" + args.prefix + "_" + str(ref) + "\n")
        outfile.write(sequence + "\n")
    return


def main():
    parser = argparse.ArgumentParser()
    parser = align_parser(parser)
    args = parser.parse_args()
    args.func(args)
    return


if __name__ == "__main__":
    main()
