"""Minimal, dependency-free FASTA reader/writer (gzip-capable).

Replaces the reference's kseq.h (reference src/kseq.h) and pyfastx usage
(reference tracs/align.py:449, tracs/combine.py:229) with a small pure-Python
implementation; the performance-critical packing of sequences into bit-planes
is vectorised in numpy / native code, not here.
"""

from __future__ import annotations

import gzip
import io
import os
from typing import Iterator, Tuple


def _open_text(path: str | os.PathLike):
    path = os.fspath(path)
    if path.endswith(".gz"):
        return io.TextIOWrapper(gzip.open(path, "rb"), encoding="ascii")
    return open(path, "r", encoding="ascii")


def read_fasta(path: str | os.PathLike) -> Iterator[Tuple[str, str]]:
    """Yield (name, sequence) records.  Name is the first whitespace token
    after '>' (kseq semantics: reference src/pairsnp.hpp:101 uses seq->name.s)."""
    name = None
    chunks: list[str] = []
    with _open_text(path) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            if line.startswith(">"):
                if name is not None:
                    yield name, "".join(chunks)
                name = line[1:].split()[0] if len(line) > 1 else ""
                chunks = []
            else:
                chunks.append(line)
        if name is not None:
            yield name, "".join(chunks)


def write_fasta(path: str | os.PathLike, records, width: int = 0) -> None:
    """Write (name, seq) records.  width=0 writes each sequence on one line
    (matching the reference align-stage output, tracs/align.py:640-641)."""
    path = os.fspath(path)
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "wt") as fh:
        for name, seq in records:
            fh.write(f">{name}\n")
            if width and width > 0:
                for i in range(0, len(seq), width):
                    fh.write(seq[i : i + width] + "\n")
            else:
                fh.write(seq + "\n")
