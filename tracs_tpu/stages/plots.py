"""``plot`` stage: heatmap / pairwise scatter / minor-allele line plots.

Parity with reference tracs/plots.py:457-487 (three plot types sharing the
pileup-frequency reader).  The scatter plot is interactive plotly HTML in
the reference; plotly is optional here — when unavailable the same data CSV
is written and a static matplotlib PNG is produced instead.
"""

from __future__ import annotations

import argparse
import gzip
import logging
import os
from collections import Counter

import numpy as np
import pandas as pd

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
from matplotlib.collections import LineCollection  # noqa: E402
from scipy.cluster.hierarchy import leaves_list, linkage  # noqa: E402

_ALLELE_COLORS = {"A": "#e41a1c", "C": "#377eb8", "G": "#4daf4a", "T": "#984ea3"}


def plots_parser(parser):
    parser.description = "Generates plots from a pileup file."

    io_opts = parser.add_argument_group("Input/output")
    io_opts.add_argument(
        "-i", "--input", dest="input_files", required=True,
        help="input file(s): a distance csv (heatmap) or two pileups "
             "(scatter/line)",
        type=os.path.abspath, nargs="+",
    )
    io_opts.add_argument(
        "-p", "--prefix", dest="output_file", required=True,
        help="prefix of output file", type=os.path.abspath,
    )
    io_opts.add_argument(
        "--type", dest="plot_type", required=True,
        help="Type of plot (scatter, line, heatmap)",
        choices=["scatter", "line", "heatmap"], type=str,
    )

    pileup = parser.add_argument_group("Pileup options")
    pileup.add_argument("--min-freq", dest="min_freq", type=float, default=0.0,
                        help="minimum frequency to include a variant (default=0.0)")
    pileup.add_argument("--either-strand", dest="require_both_strands",
                        action="store_false", default=True,
                        help="turns off the requirement that a variant is supported by "
                             "both strands")
    pileup.add_argument("--contigs", dest="contigs", default=["All"], type=str,
                        nargs="+", help="contigs for plotting (default=All)")

    distance = parser.add_argument_group("Transmission distance options")
    distance.add_argument("--column-name", dest="column_name", type=str,
                          default="SNP distance",
                          help="Column name in distance matrix to use "
                               "(default='SNP distance')")
    distance.add_argument("--threshold", dest="threshold", type=float, default=None,
                          help="threshold to filter transmission distances (default=None)")

    plot = parser.add_argument_group("Plot options")
    plot.add_argument("--alpha", dest="alpha", type=float, default=0.1,
                      help="alpha value for plotting (default=0.1)")
    plot.add_argument("--height", dest="height", type=float, default=7,
                      help="height value for plotting (default=7)")
    plot.add_argument("--width", dest="width", type=float, default=10,
                      help="width value for plotting (default=10)")

    parser.set_defaults(func=plots)
    return parser


def open_file(file_path):
    if file_path.endswith(".gz"):
        return gzip.open(file_path, "rt")
    return open(file_path, "r")


def plot_heatmap(distance_file, outfile, column="SNP distance", threshold=None,
                 height=7, width=10):
    df = pd.read_csv(distance_file)
    if threshold is not None:
        df = df[df[column] <= threshold]

    heatmap_data = df.pivot(index="sampleA", columns="sampleB", values="SNP distance")
    samples = sorted(set(df["sampleA"]).union(set(df["sampleB"])))
    heatmap_data = heatmap_data.combine_first(heatmap_data.T)
    temp_data = heatmap_data.fillna(heatmap_data.max().max() + 100)

    linkage_matrix = linkage(temp_data, method="single")
    ordered_indices = leaves_list(linkage_matrix)
    ordered_samples = [samples[i] for i in ordered_indices]
    ordered = heatmap_data.reindex(index=ordered_samples, columns=ordered_samples)

    fig, ax = plt.subplots(figsize=(width, height))
    cax = ax.matshow(ordered.values, cmap="viridis")
    cbar = fig.colorbar(cax)
    cbar.set_label(column)
    ax.set_xticks(np.arange(len(ordered_samples)))
    ax.set_yticks(np.arange(len(ordered_samples)))
    ax.set_xticklabels(ordered_samples, rotation=90)
    ax.set_yticklabels(ordered_samples)
    plt.title("Heatmap of " + column)
    plt.savefig(outfile + ".png", dpi=300, bbox_inches="tight")
    plt.close(fig)
    return


def read_pileup(inputfile, contig_length, require_both_strands=True, keep_contigs="All"):
    """Per-contig [L, 4] allele-frequency matrices.

    Same output contract as reference plots.py:182-212 (rows are per-site
    A/C/G/T counts normalised by max(1, site depth); uncovered sites stay
    all-zero; non-ACGT alleles or reference bases contribute nothing), but
    the parse itself goes through the shared pileup reader — the native C++
    codec with its Python fallback (io/pileup.py) — instead of a second
    per-line Python loop."""
    from tracs_tpu.io.pileup import parse_pileup

    wanted = {
        c: int(n) for c, n in contig_length.items()
        if ("All" in keep_contigs) or (c in keep_contigs)
    }
    counts = parse_pileup(inputfile, wanted, require_both_strands)
    freqs = counts / np.maximum(1.0, counts.sum(axis=1, keepdims=True))
    split_at = np.cumsum([n for n in wanted.values()])[:-1]
    return dict(zip(wanted, np.split(freqs, split_at)))


def _contig_lengths(count_file_A, count_file_B, keep_contigs):
    contig_length_A = Counter()
    contig_length_B = Counter()
    for path, lengths in [(count_file_A, contig_length_A), (count_file_B, contig_length_B)]:
        with open_file(path) as infile:
            for line in infile:
                line = line.strip().split()
                if ("All" in keep_contigs) or (line[0] in keep_contigs):
                    if lengths[line[0]] < int(line[1]):
                        lengths[line[0]] = int(line[1])

    if len(set(contig_length_A).intersection(contig_length_B)) == 0:
        raise ValueError("No contig names match!")

    contig_length = Counter()
    for c in contig_length_A:
        contig_length[c] = max(contig_length_A[c], contig_length_B.get(c, 0))
    for c in contig_length_B:
        if c not in contig_length_A:
            contig_length[c] = contig_length_B[c]
    return contig_length


def _pairwise_frame(count_file_A, count_file_B, fA, fB, min_freq, with_match=True):
    columns = ["A", "C", "G", "T"]
    allmismatches = {}
    variablesites = {}
    matches = {}
    for contig in fA:
        allmismatch = ((fA[contig] > 0) & (fB[contig] > 0)).sum(axis=1) == 0
        allmismatches[contig] = (
            allmismatch
            & (np.sum(fA[contig], axis=1) > 0)
            & (np.sum(fB[contig], axis=1) > 0)
        )
        variablesites[contig] = ((fA[contig] + fB[contig]) > min_freq).sum(axis=1) > 1
        temp = pd.DataFrame((fA[contig] > 0) & (fB[contig] > 0), columns=columns)
        matches[contig] = np.array(
            temp.melt(ignore_index=False, var_name="allele", value_name="match")["match"]
        )

    pdf = None
    for sample, f in zip([count_file_A, count_file_B], [fA, fB]):
        for contig in f:
            df = pd.DataFrame(f[contig], columns=columns)
            df["allmismatch"] = allmismatches[contig]
            df["variable"] = variablesites[contig]
            long_df = df.melt(
                ignore_index=False, var_name="allele", value_name="frequency",
                id_vars=["allmismatch", "variable"],
            )
            long_df["match"] = matches[contig]
            long_df = long_df[long_df["frequency"] >= min_freq]
            long_df = long_df[
                (long_df["frequency"] <= 1 - min_freq)
                | long_df["variable"]
                | long_df["allmismatch"]
            ]
            long_df.reset_index(inplace=True)
            if long_df.shape[0] < 1:
                continue
            long_df.rename(columns={"index": "position"}, inplace=True)
            long_df["position"] += 1
            long_df["sample"] = os.path.basename(sample).replace(".txt.gz", "")
            long_df["contig"] = contig
            pdf = long_df if pdf is None else pd.concat([pdf, long_df], ignore_index=True)
    return pdf


def plot_pairwise_scatter(count_file_A, count_file_B, outfile,
                          require_both_strands=True, min_freq=0.01,
                          keep_contigs="All"):
    logging.info("Counting entries in pileup files...")
    contig_length = _contig_lengths(count_file_A, count_file_B, keep_contigs)

    logging.info("Generating frequency matrices...")
    fA = read_pileup(count_file_A, contig_length, require_both_strands, keep_contigs)
    fB = read_pileup(count_file_B, contig_length, require_both_strands, keep_contigs)

    logging.info("Computing pairwise comparisons...")
    pdf = _pairwise_frame(count_file_A, count_file_B, fA, fB, min_freq)
    if pdf is None:
        logging.warning("Nothing to plot!")
        return
    pdf.to_csv(outfile + ".csv", index=False)

    try:
        import plotly.express as px
        import plotly.offline as offline

        fig = px.scatter(
            pdf, x="position", y="frequency", facet_col="contig",
            facet_row="sample", color="allele", symbol="match", opacity=0.7,
            symbol_sequence=["circle", "circle-open"],
            color_discrete_map=_ALLELE_COLORS,
            hover_data=["allele", "frequency", "match"],
        )
        fig.update_layout(yaxis_range=[-0.05, 1.05])
        if len(keep_contigs) > 1:
            fig.update_xaxes(matches=None)
        offline.plot(fig, filename=outfile + ".html", auto_open=False)
    except ImportError:
        logging.warning("plotly not available; writing static PNG instead of HTML")
        contigs = pdf["contig"].unique()
        samples = pdf["sample"].unique()
        fig, axes = plt.subplots(
            len(samples), len(contigs), figsize=(10, 7), squeeze=False, sharey=True
        )
        for si, sample in enumerate(samples):
            for ci, contig in enumerate(contigs):
                sub = pdf[(pdf["sample"] == sample) & (pdf["contig"] == contig)]
                ax = axes[si][ci]
                for allele, color in _ALLELE_COLORS.items():
                    a = sub[sub["allele"] == allele]
                    filled = a[a["match"]]
                    opened = a[~a["match"]]
                    ax.scatter(filled["position"], filled["frequency"], s=8,
                               color=color, alpha=0.7, label=allele)
                    ax.scatter(opened["position"], opened["frequency"], s=8,
                               facecolors="none", edgecolors=color, alpha=0.7)
                ax.set_ylim(-0.05, 1.05)
                ax.set_title(f"{sample} / {contig}", fontsize=8)
        axes[0][0].legend(fontsize=6)
        plt.savefig(outfile + ".png", dpi=300, bbox_inches="tight")
        plt.close(fig)
    return


def plot_pairwise_line(count_file_A, count_file_B, outfile, keep_contigs="All",
                       require_both_strands=True, min_freq=0.01, alpha=0.1,
                       height=7, width=10):
    logging.info("Counting entries in pileup files...")
    contig_length = _contig_lengths(count_file_A, count_file_B, keep_contigs)

    logging.info("Generating frequency matrices...")
    fA = read_pileup(count_file_A, contig_length, require_both_strands, keep_contigs)
    fB = read_pileup(count_file_B, contig_length, require_both_strands, keep_contigs)

    columns = ["A", "C", "G", "T"]
    consensus_diff = {}
    for contig in fA:
        consensus_diff[contig] = np.argmax(fA[contig], axis=1) != np.argmax(fB[contig], axis=1)

    pdf = None
    for sample, f in zip([count_file_A, count_file_B], [fA, fB]):
        for contig in f:
            df = pd.DataFrame(f[contig][consensus_diff[contig], :], columns=columns)
            long_df = df.melt(ignore_index=False, var_name="allele", value_name="frequency")
            long_df = long_df[long_df["frequency"] >= min_freq]
            long_df = long_df[(long_df["frequency"] <= 1 - min_freq)]
            long_df.reset_index(inplace=True)
            if long_df.shape[0] < 1:
                continue
            long_df.rename(columns={"index": "position"}, inplace=True)
            long_df["position"] += 1
            long_df["sample"] = os.path.basename(sample).replace(".txt.gz", "")
            long_df["contig"] = contig
            pdf = long_df if pdf is None else pd.concat([pdf, long_df], ignore_index=True)

    if pdf is None:
        logging.warning("Nothing to plot!")
        return

    logging.info("Generating figure...")
    pdf["sample_code"] = (
        pdf["sample"] == os.path.basename(count_file_A).replace(".txt.gz", "")
    ) * 1
    pdf = pdf.groupby(["allele", "contig", "position"]).filter(lambda x: len(x) > 1)
    groups = pdf.groupby(["allele", "contig", "position"])

    lines = [
        np.column_stack([group["sample_code"], group["frequency"]])
        for _name, group in groups
    ]
    lc = LineCollection(lines, linewidths=0.5, alpha=alpha)

    fig, ax = plt.subplots(figsize=(width, height))
    ax.add_collection(lc)
    ax.set_xticks([0, 1])
    snames = [os.path.basename(n).split(".")[0] for n in [count_file_A, count_file_B]]
    ax.set_xticklabels(snames, rotation=90)
    ax.set_xlabel("Sample")
    ax.set_ylabel("Frequency")
    ax.set_title("Minor allele frequency by sample")
    plt.savefig(outfile + ".png", dpi=300, bbox_inches="tight")
    plt.close(fig)
    pdf.to_csv(outfile + ".csv", index=False)
    return


def plots(args):
    logging.basicConfig(
        format="%(asctime)s - %(message)s", datefmt="%d-%b-%y %H:%M:%S",
        level=logging.INFO,
    )
    if args.plot_type == "scatter":
        plot_pairwise_scatter(
            args.input_files[0], args.input_files[1], args.output_file,
            require_both_strands=args.require_both_strands,
            min_freq=args.min_freq, keep_contigs=args.contigs,
        )
    elif args.plot_type == "line":
        plot_pairwise_line(
            args.input_files[0], args.input_files[1], args.output_file,
            require_both_strands=args.require_both_strands,
            min_freq=args.min_freq, keep_contigs=args.contigs,
            alpha=args.alpha, height=args.height, width=args.width,
        )
    elif args.plot_type == "heatmap":
        plot_heatmap(
            args.input_files[0], args.output_file, column=args.column_name,
            threshold=args.threshold, height=args.height, width=args.width,
        )
    return


def main():
    parser = argparse.ArgumentParser()
    parser = plots_parser(parser)
    args = parser.parse_args()
    args.func(args)
    return


if __name__ == "__main__":
    main()
