"""The COMMANDS table renders byte-identical command lines to the
reference's hand-assembled subprocess strings (reference
tracs/pileup.py:115-219, tracs/utils.py:11-83).  These goldens ARE the
external-tool contract: a drift here is a behavior change for every
pipeline run, so it must be deliberate."""

from tracs_tpu.io.external import COMMANDS, VERSION_PROBES, render


def test_sketch_command_golden():
    cmd = render(
        "sourmash_sketch",
        prefix="query",
        scaled=10000,
        ksize=51,
        output="/tmp/t/query.sig",
        inputs="a.fastq.gz b.fastq.gz",
    )
    assert cmd == (
        "sourmash sketch dna --merge query -p scaled=10000,k=51,noabund"
        " -o /tmp/t/query.sig a.fastq.gz b.fastq.gz"
    )


def test_gather_command_golden():
    cmd = render(
        "sourmash_gather",
        output="out/s1_sourmash_hits.csv",
        threshold_bp=50000,
        query_sig="/tmp/t/query.sig",
        database="db/sourmashDB.sbt.zip",
    )
    assert cmd == (
        "sourmash gather -o out/s1_sourmash_hits.csv --threshold-bp 50000"
        " --ignore-abundance /tmp/t/query.sig db/sourmashDB.sbt.zip"
    )


def test_map_filter_sort_golden():
    """The low-disk minimap2 | samtools view | samtools sort pipe
    (reference tracs/pileup.py:137-168)."""
    cmd = render(
        "map_filter_sort",
        n_cpu=3,
        mode="-ax sr",
        reference="ref.fasta",
        reads="r1.fq.gz r2.fq.gz",
        max_div=0.2,
        bam="/tmp/t/tmpbam",
    )
    assert cmd == (
        "minimap2 -t 3 -p 1 -N 10 -ax sr ref.fasta r1.fq.gz r2.fq.gz"
        " | samtools view -S -b --threads 3"
        ' --input-fmt-option "filter=[de] < 0.2" -'
        " | samtools sort --threads 3 - > /tmp/t/tmpbam"
    )


def test_map_filter_sort_params_override_preset():
    cmd = render(
        "map_filter_sort",
        n_cpu=1,
        mode="-x map-ont -a",
        reference="ref.fasta",
        reads="r1.fq.gz",
        max_div=1,
        bam="b",
    )
    assert cmd.startswith("minimap2 -t 1 -p 1 -N 10 -x map-ont -a ref.fasta r1.fq.gz")


def test_two_step_sam_goldens():
    """lowdisk=False: SAM on disk, then filter+sort
    (reference tracs/pileup.py:171-193)."""
    cmd = render(
        "map_to_sam", n_cpu=2, mode="-ax sr", reference="ref.fasta",
        reads="r1.fq", sam="out/read_aln.sam",
    )
    assert cmd == "minimap2 -t 2 -p 1 -N 10 -ax sr ref.fasta r1.fq > out/read_aln.sam"
    cmd = render(
        "filter_sort_sam", n_cpu=2, max_div=1, sam="out/read_aln.sam", bam="B"
    )
    assert cmd == (
        "samtools view -S -b --threads 2"
        ' --input-fmt-option "filter=[de] < 1" out/read_aln.sam'
        " | samtools sort --threads 2 - > B"
    )


def test_composite_map_sort_golden():
    """Composite mode has no divergence filter (reference
    tracs/pileup.py:60-74)."""
    cmd = render(
        "map_sort_composite",
        n_cpu=4,
        mode="-ax sr",
        reference="out/composite_reference.fasta",
        reads="r1.fq.gz",
        bam="/tmp/t/tmpbam",
    )
    assert cmd == (
        "minimap2 -t 4 -p 1 -N 10 -ax sr out/composite_reference.fasta r1.fq.gz"
        " | samtools view -S -b --threads 4 -"
        " | samtools sort --threads 4 - > /tmp/t/tmpbam"
    )


def test_pileup_command_golden():
    """htsbox pileup flags (reference tracs/pileup.py:196-209)."""
    cmd = render(
        "pileup",
        reference="ref.fasta",
        Q=0, q=0, l=0, S=0, V=1, T=0,
        bam="/tmp/t/tmpbam",
        output="out/s1_pileup.txt",
    )
    assert cmd == (
        "htsbox pileup -C -s 0 -f ref.fasta -Q 0 -q 0 -l 0 -S 0 -V 1 -T 0"
        " /tmp/t/tmpbam > out/s1_pileup.txt"
    )


def test_gzip_command_golden():
    assert render("gzip", file="out/s1_pileup.txt") == "gzip -f out/s1_pileup.txt"


def test_every_command_binary_has_a_version_probe():
    """doctor's presence/version report is driven by VERSION_PROBES; every
    binary any template invokes must appear there."""
    for name, spec in COMMANDS.items():
        for binary in spec.binaries:
            assert binary in VERSION_PROBES, (name, binary)


def test_templates_declare_their_output():
    """Every file-producing template names its output field so run_command
    can verify the file landed (doctor's output check)."""
    for name, spec in COMMANDS.items():
        if spec.output_field is not None:
            assert "{" + spec.output_field + "}" in spec.template, name
