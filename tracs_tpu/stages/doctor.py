"""``doctor`` stage: external-tool preflight.

The reference's CI installs sourmash + minimap2 + samtools + htsbox and
runs them for real (reference .github/workflows/tracs_test.yml:38-67,
tests/test_pipe.py:6-40); on machines without them, a flag drift in one
of the subprocess contracts (io/external.py) would otherwise surface only
deep inside an ``align`` run.  ``tracs-tpu doctor`` front-loads that:

* presence + version of every external tool each stage shells out to;
* a live micro-pipeline on a built-in 2 kb synthetic genome — shred,
  align, pileup through the EXACT production command lines
  (io/external.py::align_and_pileup), then parse the pileup and check the
  consensus recovers the genome — so flag incompatibilities fail here,
  in seconds, with the offending command printed;
* native/runtime checks: the C++ ingest library builds, JAX devices are
  visible.

Exit code 0 = everything needed for full ``pipe`` runs works; 1 = some
capability is missing (each line says which stages it blocks).
"""

from __future__ import annotations

import argparse
import logging
import os
import random
import shutil
import subprocess
import sys
import tempfile

from tracs_tpu.io.external import VERSION_PROBES as _TOOLS
from tracs_tpu.utils import add_loglevel_arg, setup_logging

_OPTIONAL = {
    "art_illumina": "read simulation (scripts/tracs_sim.py --simulator art)",
    "badread": "read simulation (scripts/tracs_sim.py --simulator badread)",
}


def doctor_parser(parser):
    parser.description = (
        "Checks that the external tools, native runtime and devices needed "
        "by each stage are present and flag-compatible."
    )
    parser.add_argument(
        "--full", action="store_true",
        help="also run the live micro-pipeline through the real aligner "
             "command lines (default: run it whenever the alignment tools "
             "are present)",
    )
    add_loglevel_arg(parser)
    parser.set_defaults(func=doctor)
    return parser


def _version_of(tool: str, version_cmd: str | None) -> str:
    if version_cmd is None:
        return "present"
    try:
        out = subprocess.run(
            version_cmd, shell=True, capture_output=True, text=True, timeout=30
        )
        first = (out.stdout or out.stderr).strip().splitlines()
        return first[0][:79] if first else "present"
    except Exception:
        return "present (version probe failed)"


def check_tools() -> tuple[list[str], list[str]]:
    """(ok_lines, problem_lines) for the required external tools — driven
    by the same declarative table (io/external.py::VERSION_PROBES /
    COMMANDS) the pipeline stages render their command lines from."""
    ok, problems = [], []
    for tool, (version_cmd, needed_by) in _TOOLS.items():
        if shutil.which(tool):
            ok.append(f"{tool}: {_version_of(tool, version_cmd)}")
        else:
            problems.append(
                f"{tool}: NOT FOUND on PATH — blocks {needed_by}. The "
                f"packing/distance/cluster stages still work from "
                f"pre-computed pileups or MSAs."
            )
    for tool, needed_by in _OPTIONAL.items():
        if shutil.which(tool):
            ok.append(f"{tool}: {_version_of(tool, None)} (optional)")
        else:
            ok.append(f"{tool}: absent (optional — only {needed_by})")
    return ok, problems


def _write_micro_dataset(d: str) -> tuple[str, str]:
    """A 2 kb random genome and a shredded read set for the live probe."""
    rng = random.Random(20240917)
    genome = "".join(rng.choice("ACGT") for _ in range(2000))
    ref = os.path.join(d, "ref.fasta")
    with open(ref, "w") as fh:
        fh.write(">doctor_ref\n" + genome + "\n")
    reads = os.path.join(d, "reads.fasta.gz")
    from tracs_tpu.io.external import generate_reads

    generate_reads(ref, reads, coverage=8, read_length=150)
    return ref, reads


def run_micro_pipeline() -> list[str]:
    """Drive the PRODUCTION align_and_pileup command contract end-to-end on
    a synthetic genome; returns problem lines (empty = pass).  This is the
    flag-drift detector: it fails if any of the minimap2/samtools/htsbox
    invocations in io/external.py stops matching the installed tools."""
    from tracs_tpu.io.external import align_and_pileup
    from tracs_tpu.io.pileup import parse_pileup

    import numpy as np

    problems = []
    with tempfile.TemporaryDirectory() as d:
        ref, reads = _write_micro_dataset(d)
        prefix = os.path.join(d, "probe")
        try:
            align_and_pileup(ref, d + os.sep, prefix, reads, n_cpu=1)
        except subprocess.CalledProcessError as e:
            return [f"pileup pipeline FAILED (flag drift?): {e.cmd!r} "
                    f"exited {e.returncode}"]
        except Exception as e:  # noqa: BLE001 — report, don't crash doctor
            return [f"pileup pipeline FAILED: {e}"]
        pile = prefix + "_pileup.txt.gz"
        if not os.path.exists(pile):
            return [f"pileup pipeline produced no output at {pile}"]
        counts = parse_pileup(pile, {"doctor_ref": 2000}, True)
        covered = (counts.sum(axis=1) > 0).mean()
        if covered < 0.5:
            problems.append(
                f"pileup parsed but only {covered:.0%} of the genome is "
                f"covered — check htsbox/samtools output formats"
            )
        else:
            # consensus must recover the reference at covered sites
            with open(ref) as fh:
                fh.readline()
                genome = np.frombuffer(
                    fh.readline().strip().encode(), dtype="S1"
                )
            idx = np.nonzero(counts.sum(axis=1) > 0)[0]
            call = np.array([b"A", b"C", b"G", b"T"])[
                counts[idx].argmax(axis=1)
            ]
            mismatch = (call != genome[idx]).mean()
            if mismatch > 0.01:
                problems.append(
                    f"consensus mismatches the reference at {mismatch:.1%} "
                    f"of covered sites — pileup column semantics drifted"
                )
    return problems


def check_runtime() -> tuple[list[str], list[str]]:
    ok, problems = [], []
    try:
        from tracs_tpu.runtime.native import get_lib

        if get_lib() is not None:
            ok.append("native ingest library: built and loadable")
        else:
            problems.append(
                "native ingest library failed to build (g++ missing?) — "
                "numpy fallbacks keep everything working, slower ingest"
            )
    except Exception as e:  # noqa: BLE001
        problems.append(f"native ingest probe failed: {e}")
    try:
        import jax

        devs = jax.devices()
        ok.append(
            f"jax devices: {len(devs)} x {devs[0].platform if devs else '?'}"
        )
    except Exception as e:  # noqa: BLE001
        problems.append(f"jax device probe failed: {e} — device kernels "
                        f"unavailable")
    return ok, problems


def doctor(args) -> int:
    setup_logging(getattr(args, "loglevel", "INFO"))
    ok, problems = check_tools()
    from tracs_tpu.io.external import COMMANDS

    ok.append(
        "command contracts: "
        + ", ".join(sorted(COMMANDS))
        + " (io/external.py COMMANDS — templates shared by stages and this probe)"
    )
    ok2, problems2 = check_runtime()
    ok += ok2
    problems += problems2

    aligner_ready = all(
        shutil.which(t) for t in ("minimap2", "samtools", "htsbox", "gzip")
    )
    if aligner_ready or getattr(args, "full", False):
        logging.info("running live pileup micro-pipeline...")
        micro = run_micro_pipeline()
        if micro:
            problems += micro
        else:
            ok.append("live pileup micro-pipeline: consensus recovered OK")
    else:
        ok.append("live pileup micro-pipeline: skipped (aligner tools absent)")

    for line in ok:
        print("  ok  " + line)
    for line in problems:
        print("FAIL  " + line)
    if problems:
        print(f"\n{len(problems)} problem(s) found.")
        return 1
    print("\nAll checks passed.")
    return 0


def main():
    parser = doctor_parser(argparse.ArgumentParser())
    args = parser.parse_args()
    sys.exit(args.func(args))


if __name__ == "__main__":
    main()
