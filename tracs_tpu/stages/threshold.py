"""``threshold`` stage: estimate a SNP threshold separating recent
transmission from background diversity.

Model parity with reference tracs/threshold.py: a negative binomial is
MLE-fitted (Nelder-Mead) to the "distant" pair distances, then a
Poisson+NB mixture to the "close" pairs; the reported threshold is
``poisson.ppf(0.95, lambda) * 3`` (threshold.py:103).

Deviations (documented):
* the reference only logs the result and never writes the output file despite
  accepting ``-o`` (threshold.py:100-107); here the fitted parameters and
  threshold are also written to the output file.
* the reference passes the *positive* mixture log-likelihood to a minimiser
  (threshold.py:67,98), which finds the worst-fitting parameters; here the
  negative log-likelihood is minimised so the mixture fit is an actual MLE.
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np
import pandas as pd
import scipy.optimize as optimize
from scipy import stats
from scipy.special import logsumexp


def threshold_parser(parser):
    parser.description = "Estimates transmission thresholds."

    io_opts = parser.add_argument_group("Input/output")
    io_opts.add_argument(
        "--close", dest="close_file", required=True,
        help="path to csv file with distances between isolates mostly linked "
             "by recent transmission",
        type=os.path.abspath,
    )
    io_opts.add_argument(
        "--distant", dest="distant_file", required=True,
        help="path to csv file with distances between isolates not related "
             "by recent transmission",
        type=os.path.abspath,
    )
    io_opts.add_argument(
        "-o", "--output", dest="output_file", required=True,
        help="location of an output file", type=os.path.abspath,
    )
    io_opts.add_argument(
        "--column", dest="column", default=1,
        help="index of column containing SNP distances (default=1)", type=int,
    )

    parser.set_defaults(func=threshold)
    return parser


def negbinom_ll(params, data):
    r, p = params
    if r <= 0 or p <= 0 or p >= 1:
        return np.inf
    return -np.sum(stats.nbinom.logpmf(data, r, p))


def mixture(params, data, r, p):
    """Mixture log-likelihood of Poisson(lambd) with weight q and NB(r, p)."""
    q, lambd = params
    if q <= 0 or q >= 1 or lambd <= 0:
        return -np.inf
    logpmf_poisson = np.log(q) + stats.poisson.logpmf(data, mu=lambd)
    logpmf_nbinom = np.log(1 - q) + stats.nbinom.logpmf(data, r, p)
    return sum(logsumexp([logpmf_poisson, logpmf_nbinom], axis=0))


def optimizer_NM(func, x0):
    result = optimize.minimize(func, x0, method="nelder-mead")
    return result.x


def estimate_thresholds(close_file, distant_file, outfile, column):
    logging.info("Loading distances...")
    df = pd.read_csv(close_file)
    close_distances = df.iloc[:, column].astype(float).values

    df = pd.read_csv(distant_file)
    far_distances = df.iloc[:, column].astype(float).values

    logging.info("Fitting distribution...")

    initial_params = np.array([100, 0.5])
    far_fitted_params = optimizer_NM(
        lambda params: negbinom_ll(params, far_distances), initial_params
    )
    r, p = far_fitted_params

    initial_params = np.array([0.5, 1])
    # minimise the NEGATIVE log-likelihood (reference bug fix, see docstring)
    mix_fitted_params = optimizer_NM(
        lambda params: -mixture(params, close_distances, r, p), initial_params
    )
    q, lambd = mix_fitted_params

    logging.info("Fitted parameters - r:%s, p:%s, q:%s, lambda:%s", r, p, q, lambd)

    snp_threshold = stats.poisson.ppf(0.95, mu=lambd) * 3
    logging.info("SNP threshold: %s", snp_threshold)

    if outfile:
        with open(outfile, "w") as fh:
            fh.write("parameter,value\n")
            fh.write(f"r,{r}\np,{p}\nq,{q}\nlambda,{lambd}\n")
            fh.write(f"snp_threshold,{snp_threshold}\n")
    return snp_threshold


def threshold(args):
    logging.basicConfig(
        format="%(asctime)s - %(message)s",
        datefmt="%d-%b-%y %H:%M:%S",
        level=logging.INFO,
    )
    estimate_thresholds(args.close_file, args.distant_file, args.output_file, args.column)
    return


def main():
    parser = argparse.ArgumentParser()
    parser = threshold_parser(parser)
    args = parser.parse_args()
    args.func(args)
    return


if __name__ == "__main__":
    main()
