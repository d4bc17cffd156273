"""``cluster`` stage: single-linkage transmission clusters.

Parity with reference tracs/cluster.py: the metric picks a CSV column
(snp→3, filter→6, direct→4, expectedK→5, cluster.py:90-97), edges are pairs
with value <= threshold, clusters are connected components, and sample
indices are assigned in order of first appearance in the distance file
(cluster.py:11-21) — samples only appear if present in some row.
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np
from scipy.sparse import csr_matrix
from scipy.sparse.csgraph import connected_components

from tracs_tpu.utils import add_loglevel_arg, setup_logging

_METRIC_COLUMNS = {"snp": 3, "filter": 6, "direct": 4, "expectedK": 5}


def cluster_parser(parser):
    parser.description = (
        "Groups samples into putative transmission clusters using single "
        "linkage clustering"
    )

    io_opts = parser.add_argument_group("Input/output")
    io_opts.add_argument(
        "-d", "--distances", dest="distance_file", required=True,
        help="Pairwise distance estimates obtained from running the "
             "'distance' function",
        type=os.path.abspath,
    )
    io_opts.add_argument(
        "-o", "--output", dest="output_file", required=True,
        help="name of the output file to store the resulting cluster assignments",
        type=str,
    )

    cluster_opts = parser.add_argument_group("Cluster options")
    cluster_opts.add_argument(
        "-c", "--threshold", dest="threshold",
        help="Distance threshold. Samples will be grouped together if the "
             "distance between them is below this threshold.",
        type=float, required=True,
    )
    cluster_opts.add_argument(
        "-D", "--distance", dest="distance",
        help="The type of transmission distance to use. Can be one of "
             "'snp', 'filter', 'direct', 'expectedK'",
        choices=["snp", "filter", "direct", "expectedK"],
        type=str, required=True,
    )

    add_loglevel_arg(parser)
    parser.set_defaults(func=cluster)
    return parser


def cluster(args):
    setup_logging(args.loglevel)

    col_index = _METRIC_COLUMNS[args.distance]

    # first-appearance sample indexing (reference index_count, cluster.py:11-21)
    indices: dict[str, int] = {}

    def index_of(name: str) -> int:
        if name not in indices:
            indices[name] = len(indices)
        return indices[name]

    # Native C++ reader (src/tracs_native.cpp::tn_read_dist_csv) — a
    # 10k-sample all-pairs run emits ~50M rows.  Semantics preserved:
    # header skipped blindly, row-by-row first-appearance sample indexing,
    # float() parsing of the metric column (a literal "NA" raises).
    from tracs_tpu.runtime.native import native_read_dist_csv

    nat = native_read_dist_csv(args.distance_file, col_index, args.threshold)
    if nat is not None:
        I, J, nat_names, count = nat
        for nm in nat_names:
            indices[nm] = len(indices)
        return _finish_cluster(args, indices, I, J, count)

    # pandas fallback (chunked C engine); the interleaved ravel of
    # (sampleA, sampleB) reproduces the first-appearance indexing exactly
    import pandas as pd

    I_parts, J_parts = [], []
    count = 0
    # header=None + skiprows=1: the reference skips the header line blindly.
    # keep_default_na=False + na_values=[]: a literal "NA" in the metric
    # column raises, exactly like the reference's float(line[col]).
    for chunk in pd.read_csv(
        args.distance_file, header=None, skiprows=1,
        usecols=[0, 1, col_index], dtype={col_index: np.float64},
        keep_default_na=False, na_values=[],
        chunksize=2_000_000, engine="c",
    ):
        a = chunk.iloc[:, 0].to_numpy()
        b = chunk.iloc[:, 1].to_numpy()
        inter = np.empty(2 * len(a), dtype=object)
        inter[0::2] = a
        inter[1::2] = b
        codes, uniques = pd.factorize(inter)
        gids = np.empty(len(uniques), dtype=np.int64)
        for u_i, u in enumerate(uniques):
            gids[u_i] = index_of(u)
        vals = chunk.iloc[:, 2].to_numpy()
        keep = vals <= args.threshold
        I_parts.append(gids[codes[0::2]][keep])
        J_parts.append(gids[codes[1::2]][keep])
        count += len(a)

    I = np.concatenate(I_parts) if I_parts else np.zeros(0, dtype=np.int64)
    J = np.concatenate(J_parts) if J_parts else np.zeros(0, dtype=np.int64)
    return _finish_cluster(args, indices, I, J, count)


def _finish_cluster(args, indices, I, J, count):
    if count <= 0:
        logging.warning("No distances available! Abandoning clustering.")
        return

    names = list(indices.keys())
    nsamples = len(names)

    logging.info("Clustering %s samples...", nsamples)

    G = csr_matrix((np.ones(len(I), dtype=np.int64), (I, J)), shape=(nsamples, nsamples))
    n_components, labels = connected_components(
        csgraph=G, directed=False, return_labels=True
    )

    logging.info("%s putative transmission clusters found!", n_components)

    with open(args.output_file, "w") as outfile:
        outfile.write("sample,cluster\n")
        for i, lab in enumerate(labels):
            outfile.write(names[i] + "," + str(lab) + "\n")
    return


def main():
    parser = argparse.ArgumentParser()
    parser = cluster_parser(parser)
    args = parser.parse_args()
    args.func(args)
    return


if __name__ == "__main__":
    main()
