"""htsbox pileup text -> [L, 4] allele-count matrices.

This is the reference's hottest host loop (per-line Python parse,
tracs/align.py:449-474).  Here the native C++ parser (src/tracs_native.cpp)
is used when built, with a Python fallback that reproduces the exact
reference semantics:

* counts only single-character A/C/G/T alleles, and only when the reference
  base itself is one of A/C/G/T (case-sensitive, align.py:467)
* with ``require_both_strands``, alleles seen on a single strand are zeroed
  (align.py:469-471)
* positions are 1-based in the file; later contigs are concatenated in
  reference-genome record order (align.py:449-474)
"""

from __future__ import annotations

import gzip
import logging
import os

import numpy as np

_NPOS = {"A": 0, "C": 1, "G": 2, "T": 3}


def _open_text(path):
    if os.fspath(path).endswith(".gz"):
        return gzip.open(path, "rt")
    return open(path, "r")


def parse_pileup(path, contig_lengths: dict[str, int], require_both_strands: bool = True) -> np.ndarray:
    """Parse a pileup into one concatenated [sum(L_c), 4] float matrix, with
    rows laid out contig-after-contig in ``contig_lengths`` order."""
    offsets = {}
    off = 0
    for name, length in contig_lengths.items():
        offsets[name] = off
        off += int(length)
    total = off

    native = _parse_native(path, contig_lengths, total, require_both_strands)
    if native is not None:
        return native

    counts = np.zeros((total, 4), dtype=float)
    with _open_text(path) as infile:
        for line in infile:
            line = line.strip().split()
            if len(line) < 4:
                continue
            contig = line[0]
            if contig not in offsets:
                continue
            pos = int(line[1]) - 1
            nucs = line[-2].split(",")
            ncounts = line[-1].split(":")[1:]
            row = np.zeros(4, dtype=float)
            for nuc, c1, c2 in zip(nucs, ncounts[0].split(","), ncounts[1].split(",")):
                c1 = int(c1)
                c2 = int(c2)
                if (nuc not in _NPOS) or (line[2] not in _NPOS):
                    continue
                if require_both_strands and (c1 == 0 or c2 == 0):
                    c1 = c2 = 0
                row[_NPOS[nuc]] = c1 + c2
            counts[offsets[contig] + pos, :] = row
    return counts


def scan_pileup_depth(path):
    """Per-covered-line total allele depth from a pileup file, as an int64
    array (one entry per pileup line).  The htsbox count column lists two
    quality summaries followed by per-allele per-strand counts; total depth
    is the sum of everything after the first two numbers.  Truncated gzip
    files yield the depths read so far (None if nothing was readable)."""
    depths = []
    try:
        with _open_text(path) as fh:
            for line in fh:
                parts = line.rsplit(None, 2)
                if len(parts) < 3:
                    continue
                nums = parts[-1].replace(":", ",").split(",")
                try:
                    depths.append(sum(int(x) for x in nums[2:]))
                except ValueError:
                    continue
    except EOFError:
        logging.warning("truncated pileup %s: %d lines read", path, len(depths))
    if not depths:
        return None
    return np.asarray(depths, dtype=np.int64)


def _parse_native(path, contig_lengths, total, require_both_strands):
    from tracs_tpu.runtime.native import get_lib

    lib = get_lib()
    if lib is None:
        return None
    counts = np.zeros((total, 4), dtype=np.float32)
    offs = []
    names_blob = b""
    off = 0
    for name, length in contig_lengths.items():
        offs.append(off)
        names_blob += name.encode() + b"\x00"
        off += int(length)
    offs = np.asarray(offs, dtype=np.int64)
    names_arr = np.frombuffer(names_blob, dtype=np.uint8)
    rc = lib.tn_parse_pileup(
        os.fspath(path).encode(), counts, total, offs, len(offs),
        np.ascontiguousarray(names_arr), len(names_arr),
        1 if require_both_strands else 0,
    )
    if rc < 0:
        logging.warning("native pileup parse failed (%s); falling back", rc)
        return None
    return counts.astype(float)
