"""External-tool contracts: sourmash, minimap2, samtools, htsbox.

The reference shells out to these via ``subprocess`` (reference
tracs/utils.py:11-83, tracs/pileup.py:115-219); this module keeps the same
command contracts but centralises availability checks so the framework
degrades with a clear error (and the rest of the pipeline — packing,
distances, clustering — keeps working without them).
"""

from __future__ import annotations

import gzip
import logging
import os
import random
import shutil
import subprocess

from tracs_tpu.io.fasta import read_fasta

_RC = str.maketrans("ACGTMRWSYKVHDBNacgtmrwsykvhdbn", "TGCAKYWSRMBDHVNtgcakywsrmbdhvn")


def require_tool(name: str) -> None:
    if shutil.which(name) is None:
        raise RuntimeError(
            f"External tool {name!r} is required for this stage but was not "
            f"found on PATH. Install it or supply pre-computed inputs "
            f"(pileups / MSAs) to the downstream stages."
        )


def run(cmd: str) -> None:
    logging.info("running cmd: %s", cmd)
    subprocess.run(cmd, shell=True, check=True)


# ---------------------------------------------------------------------------
# sourmash (reference selection)
# ---------------------------------------------------------------------------

def run_sketch(input_files, prefix, output, ksize=51, scaled=10000):
    require_tool("sourmash")
    cmd = "sourmash sketch dna"
    cmd += " --merge " + prefix
    cmd += " -p " + f"scaled={scaled},k={ksize},noabund"
    cmd += " -o " + output
    cmd += " " + " ".join(input_files)
    logging.info("sketching input files...")
    run(cmd)


def run_gather(
    input_files,
    databasefile,
    output,
    temp_dir,
    ksize=51,
    scaled=10000,
    threshold_bp=50000,
    max_hits=99999,
    p_match=0.1,
    cache_size=0,
):
    """sourmash gather + the reference's hit-selection rule: keep references
    with f_unique_to_query >= p_match, or within 98% of the previous hit's
    coverage while the run of such hits is unbroken (reference
    tracs/utils.py:70-82)."""
    run_sketch(
        input_files=input_files,
        prefix="query",
        output=temp_dir + "query.sig",
        ksize=ksize,
        scaled=scaled,
    )

    require_tool("sourmash")
    cmd = "sourmash gather"
    cmd += " -o " + output + ".csv"
    cmd += " --threshold-bp " + str(threshold_bp)
    cmd += " --ignore-abundance"
    cmd += " " + temp_dir + "query.sig"
    cmd += " " + databasefile
    logging.info("finding references...")
    run(cmd)

    references = []
    potential = []
    with open(output + ".csv", "r") as infile:
        next(infile)
        for line in infile:
            line = line.strip().split(",")
            line[2] = float(line[2])
            line[0] = float(line[0])
            potential.append(line)

    potential = sorted(potential, reverse=True)

    prev = True
    pcov = potential[0][0]
    for line in potential:
        if (line[2] >= p_match) or (prev and (line[0] / pcov >= 0.98)):
            logging.debug("%s", line)
            logging.info("Using reference: %s", line[8])
            references.append(line[9])
        else:
            prev = False
        pcov = line[0]

    return references


# ---------------------------------------------------------------------------
# read simulation (assembly shredding)
# ---------------------------------------------------------------------------

def generate_reads(fasta, outputfile, coverage=10, read_length=300):
    """Shred an assembly into pseudo-reads for alignment (reference
    tracs/utils.py:102-117: ~coverage x, alternating strands)."""
    with gzip.open(outputfile, "wt") as outfile:
        for name, seq in read_fasta(fasta):
            seq_length = len(seq)
            forward = seq
            reverse = seq.translate(_RC)[::-1]
            nreads = max(coverage + 10, int((seq_length / read_length) * coverage + 1))
            for i in range(nreads):
                start = random.randint(0, max(0, seq_length - read_length))
                if i % 2 == 0:
                    r = forward[start : (start + read_length)]
                else:
                    r = reverse[start : (start + read_length)]
                outfile.write(f">{name}_read{i}\n{r}\n")
    return


# ---------------------------------------------------------------------------
# alignment + pileup (minimap2 | samtools | htsbox)
# ---------------------------------------------------------------------------

def align_and_pileup_composite(
    references: dict,
    outdir,
    prefix,
    r1,
    r2=None,
    aligner="minimap2",
    minimap_preset="sr",
    minimap_params=None,
    Q=0,
    q=0,
    l=0,
    S=0,
    V=1,
    T=0,
    n_cpu=1,
    lowdisk=True,
):
    """Composite-reference mode (reference tracs/pileup.py:9-112): all
    reference genomes are concatenated with ``ref@contig`` renaming, reads
    are aligned ONCE against the composite, and the pileup is split back out
    per reference.  One aligner pass instead of one per reference — the
    better default for metagenomic samples hitting many references."""
    if aligner != "minimap2":
        raise ValueError("Minimap2 is the only currently supported aligner!")
    for tool in ("minimap2", "samtools", "htsbox"):
        require_tool(tool)

    logging.info("Generating composite alignment and pileup...")

    composite = os.path.join(outdir, "composite_reference.fasta")
    with open(composite, "w") as outfile:
        for ref, path in references.items():
            for name, seq in read_fasta(path):
                outfile.write(">" + str(ref) + "@" + name + "\n" + seq + "\n")

    import tempfile

    temp_file = tempfile.NamedTemporaryFile(delete=False, dir=outdir)
    temp_file.close()

    cmd = "minimap2"
    cmd += " -t " + str(n_cpu)
    cmd += " -p 1 -N 10"
    if minimap_params is not None:
        cmd += " " + minimap_params
    else:
        cmd += " -ax " + minimap_preset
    cmd += " " + composite
    cmd += " " + r1
    if r2 is not None:
        cmd += " " + r2
    cmd += (
        " | samtools view -S -b --threads "
        + str(n_cpu)
        + " - | samtools sort --threads "
        + str(n_cpu)
        + " - > "
        + temp_file.name
    )
    run(cmd)

    pile = os.path.join(outdir, "composite_pileup.txt")
    cmd = "htsbox pileup -C -s 0"
    cmd += " -f " + composite
    cmd += " -Q " + str(Q)
    cmd += " -q " + str(q)
    cmd += " -l " + str(l)
    cmd += " -S " + str(S)
    cmd += " -V " + str(V)
    cmd += " -T " + str(T)
    cmd += " " + temp_file.name
    cmd += " > " + pile
    run(cmd)

    # split per reference, stripping the ref@ prefix back off contig names
    writers = {}
    try:
        for ref in references:
            writers[str(ref)] = gzip.open(
                prefix + "_ref_" + str(ref) + "_pileup.txt.gz", "wt"
            )
        with open(pile, "r") as infile:
            for line in infile:
                head, _, rest = line.partition("@")
                w = writers.get(head)
                if w is not None:
                    w.write(rest)
    finally:
        for w in writers.values():
            w.close()

    os.remove(temp_file.name)
    return


def align_and_pileup(
    reference,
    outdir,
    prefix,
    r1,
    r2=None,
    aligner="minimap2",
    minimap_preset="sr",
    minimap_params=None,
    max_div=1,
    Q=0,  # minimum base quality
    q=0,  # minimum mapping quality
    l=0,  # minimum query length
    S=0,  # minimum supplementary alignment length
    V=1,  # ignore queries with per-base divergence > FLOAT
    T=0,  # ignore bases within INT-bp of either end of a read
    n_cpu=1,
    lowdisk=True,
):
    """minimap2 -> samtools view (divergence filter) | sort -> htsbox pileup
    -> gzip (reference tracs/pileup.py:115-219; the duplicated sort rerun at
    pileup.py:191-193 is intentionally not reproduced).  Defaults to the
    piped low-disk path."""
    if aligner != "minimap2":
        raise ValueError("Minimap2 is the only currently supported aligner!")
    for tool in ("minimap2", "samtools", "htsbox"):
        require_tool(tool)

    logging.info("Generating alignment and pileup...")

    import tempfile

    temp_file = tempfile.NamedTemporaryFile(delete=False, dir=outdir)
    temp_file.close()

    cmd = "minimap2"
    cmd += " -t " + str(n_cpu)
    cmd += " -p 1 -N 10"
    if minimap_params is not None:
        cmd += " " + minimap_params
    else:
        cmd += " -ax " + minimap_preset
    cmd += " " + reference
    cmd += " " + r1
    if r2 is not None:
        cmd += " " + r2

    if lowdisk:
        cmd += (
            " | samtools view -S -b --threads "
            + str(n_cpu)
            + ' --input-fmt-option "filter=[de] < '
            + str(max_div)
            + '" - | samtools sort --threads '
            + str(n_cpu)
            + " - > "
            + temp_file.name
        )
        run(cmd)
    else:
        cmd += " > " + outdir + "read_aln.sam"
        run(cmd)
        run(
            "samtools view -S -b --threads "
            + str(n_cpu)
            + ' --input-fmt-option "filter=[de] < '
            + str(max_div)
            + '" '
            + outdir
            + "read_aln.sam | samtools sort --threads "
            + str(n_cpu)
            + " - > "
            + temp_file.name
        )

    cmd = "htsbox pileup -C -s 0"
    cmd += " -f " + reference
    cmd += " -Q " + str(Q)
    cmd += " -q " + str(q)
    cmd += " -l " + str(l)
    cmd += " -S " + str(S)
    cmd += " -V " + str(V)
    cmd += " -T " + str(T)
    cmd += " " + temp_file.name
    cmd += " > " + prefix + "_pileup.txt"
    run(cmd)

    run("gzip -f " + prefix + "_pileup.txt")

    os.remove(temp_file.name)
    return
