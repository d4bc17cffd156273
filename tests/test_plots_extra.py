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
    # the interactive HTML is ALWAYS written (no plotly package needed):
    # figure JSON embedded next to a plotly.js script tag
    html = open(out_s + ".html").read()
    assert "Plotly.newPlot" in html
    assert "cdn.plot.ly" in html
    import json as _json
    import pandas as pd

    fig = _json.loads(html.split("const fig = ", 1)[1].split(";\nPlotly", 1)[0])
    pdf = pd.read_csv(out_s + ".csv")
    # every CSV row lands in exactly one trace; mismatched sites carry the
    # open symbol, matches the filled one
    n_pts = sum(len(t["x"]) for t in fig["data"])
    assert n_pts == len(pdf)
    open_pts = sum(
        len(t["x"]) for t in fig["data"]
        if t["marker"]["symbol"] == "circle-open"
    )
    assert open_pts == int((~pdf["match"].astype(bool)).sum())
    for t in fig["data"]:
        assert t["yaxis"].startswith("y") and len(t["x"]) == len(t["y"])

    out_l = str(tmp_path / "line")
    plot_pairwise_line(pa, pb, out_l, min_freq=0.0)
    # consensus-differing sites exist; the png is always written
    assert os.path.exists(out_l + ".png")


def test_read_pileup_frequency_values(tmp_path):
    """Value-level golden for the pileup -> frequency matrices (reference
    plots.py:182-212 semantics): per-site normalisation by max(1, depth),
    strand-requirement zeroing, non-ACGT ref/allele skipping, uncovered
    rows all-zero, per-contig split."""
    from tracs_tpu.stages.plots import read_pileup

    p = str(tmp_path / "p.txt.gz")
    with gzip.open(p, "wt") as fh:
        # site 1: A=6 (4+2), C=2 (1+1) -> freqs 0.75 / 0.25
        fh.write("c1\t1\tA\t.\tA,C\t2:4,1:2,1\n")
        # site 2: G fwd-only -> zeroed under require_both_strands
        fh.write("c1\t2\tG\t.\tG\t2:5:0\n")
        # site 3: ref base N -> every allele skipped
        fh.write("c1\t3\tN\t.\tA\t2:3:3\n")
        # second contig, site 1: T only
        fh.write("c2\t1\tT\t.\tT\t2:2:2\n")
    lengths = {"c1": 4, "c2": 2}

    f = read_pileup(p, lengths, require_both_strands=True)
    assert set(f) == {"c1", "c2"}
    want_c1 = np.zeros((4, 4))
    want_c1[0] = [6 / 8, 2 / 8, 0, 0]
    np.testing.assert_allclose(f["c1"], want_c1)
    want_c2 = np.zeros((2, 4))
    want_c2[0] = [0, 0, 0, 1.0]
    np.testing.assert_allclose(f["c2"], want_c2)

    # --either-strand keeps the fwd-only G
    f2 = read_pileup(p, lengths, require_both_strands=False)
    np.testing.assert_allclose(f2["c1"][1], [0, 0, 1.0, 0])

    # keep_contigs filters to the named contig only
    f3 = read_pileup(p, lengths, keep_contigs=["c2"])
    assert set(f3) == {"c2"}


def test_scatter_frame_values(tmp_path):
    """The scatter CSV's per-site selections: match (allele shared by both
    samples), allmismatch (no shared allele at a covered site), variable
    (summed freq above min_freq for >1 allele), and the min-freq row
    filter (reference plots.py:214-334)."""
    import pandas as pd

    from tracs_tpu.stages.plots import _pairwise_frame, read_pileup

    pa, pb = str(tmp_path / "A.txt.gz"), str(tmp_path / "B.txt.gz")
    with gzip.open(pa, "wt") as fh:
        fh.write("c1\t1\tA\t.\tA\t2:5:5\n")        # both pure A -> match
        fh.write("c1\t2\tC\t.\tC\t2:5:5\n")        # A pure C, B pure G -> allmismatch
        fh.write("c1\t3\tA\t.\tA,C\t2:3,1:3,1\n")  # A mixed, B pure A -> A matches
    with gzip.open(pb, "wt") as fh:
        fh.write("c1\t1\tA\t.\tA\t2:4:4\n")
        fh.write("c1\t2\tG\t.\tG\t2:4:4\n")
        fh.write("c1\t3\tA\t.\tA\t2:4:4\n")
    lengths = {"c1": 3}
    fA = read_pileup(pa, lengths)
    fB = read_pileup(pb, lengths)
    pdf = _pairwise_frame(pa, pb, fA, fB, min_freq=0.01)

    a_rows = pdf[pdf["sample"] == "A"].set_index(["position", "allele"])
    # pos 2: no shared allele -> allmismatch True, match False
    assert bool(a_rows.loc[(2, "C"), "allmismatch"])
    assert not bool(a_rows.loc[(2, "C"), "match"])
    # pos 1: pure A in both -> uninformative (freq > 1-min_freq, not
    # variable, not allmismatch) and therefore DROPPED from the frame
    assert (1, "A") not in a_rows.index
    # pos 3: sample A carries A (6/8, match) and C (2/8, no match in B)
    assert a_rows.loc[(3, "A"), "frequency"] == 0.75
    assert bool(a_rows.loc[(3, "A"), "match"])
    assert a_rows.loc[(3, "C"), "frequency"] == 0.25
    assert not bool(a_rows.loc[(3, "C"), "match"])
    assert bool(a_rows.loc[(3, "C"), "variable"])
    # min_freq filter: zero-frequency alleles never appear
    assert (pdf["frequency"] >= 0.01).all()


def test_line_selects_consensus_diff_minor_alleles(tmp_path, rng):
    """plot_pairwise_line's CSV keeps only consensus-differing sites and
    frequencies in [min_freq, 1-min_freq] (reference plots.py:336-455):
    assert the actual selected positions/frequencies, not just the PNG."""
    import pandas as pd

    from tracs_tpu.stages.plots import plot_pairwise_line

    pa, pb = str(tmp_path / "A.txt.gz"), str(tmp_path / "B.txt.gz")
    with gzip.open(pa, "wt") as fh:
        fh.write("c1\t1\tA\t.\tA,C\t2:6,4:6,4\n")  # consensus A (0.6/0.4)
        fh.write("c1\t2\tG\t.\tG\t2:5:5\n")        # consensus G in both
    with gzip.open(pb, "wt") as fh:
        fh.write("c1\t1\tC\t.\tA,C\t2:4,6:4,6\n")  # consensus C (0.4/0.6)
        fh.write("c1\t2\tG\t.\tG\t2:5:5\n")
    out = str(tmp_path / "line")
    plot_pairwise_line(pa, pb, out, min_freq=0.05)
    pdf = pd.read_csv(out + ".csv")
    # only position 1 differs in consensus; both alleles, both samples
    assert set(pdf["position"]) == {1}
    assert set(pdf["allele"]) == {"A", "C"}
    a_freqs = sorted(pdf[pdf["sample"] == "A"]["frequency"])
    assert np.allclose(a_freqs, [0.4, 0.6])
    # sample_code 1 for file A, 0 for file B
    assert set(pdf[pdf["sample"] == "A"]["sample_code"]) == {1}
    assert set(pdf[pdf["sample"] == "B"]["sample_code"]) == {0}


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
