"""Scatter/line plot stages on synthetic pileups (plotly optional: falls
back to a static PNG) and the combine coverage helper."""

import gzip
import os

import numpy as np


def write_pileup(path, bases, depth=10):
    with gzip.open(path, "wt") as fh:
        for pos0, b in enumerate(bases):
            fh.write(f"chr1\t{pos0+1}\t{b}\t.\t{b}\t2:{depth}:{depth}\n")


def test_plot_scatter_and_line(tmp_path, rng):
    from tracs_tpu.stages.plots import plot_pairwise_line, plot_pairwise_scatter

    L = 300
    a = rng.choice(list("ACGT"), size=L)
    b = a.copy()
    for x in (10, 50, 100):
        b[x] = {"A": "C", "C": "G", "G": "T", "T": "A"}[b[x]]
    pa = str(tmp_path / "a.txt.gz")
    pb = str(tmp_path / "b.txt.gz")
    write_pileup(pa, a)
    write_pileup(pb, b)

    out_s = str(tmp_path / "scatter")
    plot_pairwise_scatter(pa, pb, out_s, min_freq=0.01)
    assert os.path.exists(out_s + ".csv")
    assert os.path.exists(out_s + ".html") or os.path.exists(out_s + ".png")

    out_l = str(tmp_path / "line")
    plot_pairwise_line(pa, pb, out_l, min_freq=0.0)
    # consensus-differing sites exist; the png is always written
    assert os.path.exists(out_l + ".png")


def test_combine_pileup_coverage(tmp_path):
    # the --coverage opt-in (the working replacement for the reference's
    # dead calculate_coverage helper, reference combine.py:84-103): depth
    # per line sums everything after the first two count-column numbers
    from tracs_tpu.stages.combine import pileup_coverage

    d = tmp_path / "s1"
    d.mkdir()
    pile = str(d / "s1_ref_REFX_pileup.txt.gz")
    write_pileup(pile, list("ACGT"), depth=5)  # per line: 2:5:5 -> depth 5
    covered, mean_depth, mean_nonzero = pileup_coverage(pile)
    assert covered == 4
    assert mean_depth == 5.0 and mean_nonzero == 5.0
