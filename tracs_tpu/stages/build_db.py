"""``build-db`` stage: reference database zip construction.

Parity with reference tracs/build_db.py: sourmash-sketch every genome
(joblib-parallel), ``sourmash index`` them into sourmashDB.sbt.zip, then zip
the SBT plus each genome as ``<prefix>.fasta.gz`` plus a ``summary.tsv``.
Accepts either many fasta arguments or a single ``path,prefix`` list file.
"""

from __future__ import annotations

import argparse
import gzip
import logging
import os
import shutil
import subprocess
import tempfile
from zipfile import ZipFile

from joblib import Parallel, delayed

from tracs_tpu.io.external import require_tool, run_sketch
from tracs_tpu.utils import add_loglevel_arg, setup_logging

try:
    from tqdm import tqdm
except ImportError:  # pragma: no cover
    def tqdm(x, **kw):
        return x


def build_db_parser(parser):
    parser.description = "Builds a reference database"

    parser.add_argument(
        "-i", "--input", dest="input_files", required=True,
        help="path to genome fasta files (one per reference genome).",
        type=os.path.abspath, nargs="+",
    )
    parser.add_argument(
        "-o", "--output", dest="dbname", required=True,
        help="name of the database file", type=os.path.abspath,
    )
    parser.add_argument(
        "--ksize", dest="ksize", default=51, type=int,
        help="the kmer length used in sourmash (default=51)",
    )
    parser.add_argument(
        "--scale", dest="scale", default=1000, type=int,
        help="the scale used in sourmash (default=1000)",
    )
    parser.add_argument(
        "-t", "--threads", dest="n_cpu", default=1, type=int,
        help="number of threads to use (default=1)",
    )
    add_loglevel_arg(parser)
    parser.set_defaults(func=build_db)
    return parser


def build_sourmash_db(inputs, outputdir, ksize=51, scale=1000, n_cpu=1):
    require_tool("sourmash")
    temp_dir = os.path.join(tempfile.mkdtemp(dir=outputdir), "")

    Parallel(n_jobs=n_cpu)(
        delayed(run_sketch)([f], prefix, temp_dir + prefix + ".sig", ksize, scale)
        for f, prefix in tqdm(inputs)
    )

    cmd = "sourmash index "
    cmd += outputdir + "sourmashDB.sbt.zip "
    cmd += temp_dir + "*.sig"
    logging.info("running cmd: %s", cmd)
    subprocess.run(cmd, shell=True, check=True)

    shutil.rmtree(temp_dir)
    return outputdir + "sourmashDB.sbt.zip"


def build_db(args):
    setup_logging(args.loglevel)

    wd = os.path.dirname(os.path.realpath(args.dbname))
    temp_dir = os.path.join(tempfile.mkdtemp(dir=wd), "")

    if len(args.input_files) == 1:
        with open(args.input_files[0], "r") as infile:
            inputs = []
            for line in infile:
                line = line.strip().split(",")
                inputs.append((line[1], line[0]))
    else:
        inputs = [
            (f, os.path.splitext(os.path.basename(f))[0]) for f in args.input_files
        ]

    import shutil as _shutil

    have_sourmash = _shutil.which("sourmash") is not None
    with ZipFile(args.dbname + ".zip", "w") as archive:
        if have_sourmash:
            path_to_sourmashdb = build_sourmash_db(
                inputs, temp_dir, ksize=args.ksize, scale=args.scale, n_cpu=1
            )
            archive.write(path_to_sourmashdb, "sourmashDB.sbt.zip")
        else:
            logging.warning(
                "sourmash not found: building the database with native "
                "FracMinHash sketches only (align will use the native gather)"
            )

        for f, prefix in inputs:
            if f.split(".")[-1] == "gz":
                archive.write(f, prefix + ".fasta.gz")
            else:
                newloc = temp_dir + prefix + ".fasta.gz"
                with open(f, "rb") as f_in:
                    with gzip.open(newloc, "wb") as f_out:
                        shutil.copyfileobj(f_in, f_out)
                archive.write(newloc, prefix + ".fasta.gz")
                os.remove(newloc)

        with open(temp_dir + "summary.tsv", "w") as outfile:
            for f, prefix in inputs:
                outfile.write(prefix + "," + prefix + ".fasta.gz")
        archive.write(temp_dir + "summary.tsv", "summary.tsv")

    # native FracMinHash sketches: every database is usable without sourmash
    from tracs_tpu.sketch import write_db_sketches

    write_db_sketches(args.dbname + ".zip", inputs, ksize=args.ksize, scaled=args.scale)

    shutil.rmtree(temp_dir)
    return


def main():
    parser = argparse.ArgumentParser()
    parser = build_db_parser(parser)
    args = parser.parse_args()
    args.func(args)
    return


if __name__ == "__main__":
    main()
