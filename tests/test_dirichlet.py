import numpy as np
import pytest

from tracs_tpu.models.dirichlet import calculate_posteriors, find_dirichlet_priors

R_COUNTS = np.array(
    [[1, 19, 73], [1, 19, 90], [0, 33, 53], [5, 19, 91], [3, 17, 57],
     [3, 13, 77], [5, 6, 89], [1, 23, 85], [2, 29, 67], [7, 6, 99],
     [0, 17, 96], [0, 10, 86], [4, 5, 85], [6, 25, 65], [0, 5, 86],
     [0, 16, 91], [23, 14, 73], [4, 9, 96], [2, 19, 71], [9, 24, 78]]
)
R_RESULT = np.array([20.8156311152126, 4.38181182238621, 0.889048781117318])


def test_fpi_golden_vs_R_MGLM():
    # golden from R MGLM::MGLMfit (reference tests/test_dirichlet_multinomial.py)
    alphas = find_dirichlet_priors(R_COUNTS, tol=1e-10, method="FP")
    assert np.max(np.abs(alphas - R_RESULT)) < 1e-3


def test_loo_matches_reference_fixed_point():
    # the reference golden test only passes LOO via a signed np.max; the true
    # LOO fixed point (computed with the reference numpy implementation) is:
    ref_loo = np.array([19.39792305, 4.12033856, 0.82532347])
    alphas = find_dirichlet_priors(R_COUNTS, tol=1e-10, method="LOO")
    assert np.max(np.abs(alphas - ref_loo)) < 1e-6
    # and the reference's (signed) assertion also holds
    assert np.max(alphas - R_RESULT) < 1e-3


def test_few_polymorphic_rows_sentinel():
    counts = np.zeros((100, 4))
    counts[:, 0] = 50  # monomorphic everywhere
    alphas = find_dirichlet_priors(counts)
    assert np.array_equal(alphas, [0, 0, 0, 1.0])
    # exactly 6 polymorphic rows are required (reference: np.sum(nz>1) > 5)
    counts[:5, 1] = 3
    assert np.array_equal(find_dirichlet_priors(counts), [0, 0, 0, 1.0])
    counts[5, 1] = 3
    counts[:6, 2] = 1
    assert len(find_dirichlet_priors(counts)) == 4


def test_error_filt_threshold_zeroes_minor_alleles():
    rng = np.random.default_rng(3)
    counts = np.zeros((50, 4))
    counts[:, 0] = 100
    counts[:, 1] = rng.integers(20, 40, size=50)
    counts[:, 2] = 1  # sub-threshold noise allele
    a_filt = find_dirichlet_priors(counts, error_filt_threshold=0.05)
    # with the noise zeroed there are exactly 2 nonzero alleles per row
    counts2 = counts.copy()
    counts2[:, 2] = 0
    a_clean = find_dirichlet_priors(counts2)
    assert np.allclose(a_filt, a_clean)


def posteriors_oracle(counts, alphas, keep, expected):
    """Direct per-row port of the C++ walk (src/dmultinomial.hpp:33-83)."""
    alphas = sorted(alphas, reverse=True)
    a0 = sum(alphas)
    a_min = alphas[0] / a0
    out = np.zeros_like(counts, dtype=float)
    for i, row in enumerate(counts):
        denom = row.sum()
        idx = sorted(range(len(row)), key=lambda j: -row[j])
        ai = 0
        for m, j in enumerate(idx):
            if denom <= 0:
                out[i, j] = a_min
            else:
                out[i, j] = (row[j] + alphas[ai]) / (denom + a0)
                if m < len(row) - 1 and row[idx[m]] != row[idx[m + 1]]:
                    ai += 1
        for j in range(len(row)):
            if out[i, j] <= expected:
                out[i, j] = expected if (keep and row[j] > 0) else 0.0
    return out


@pytest.mark.parametrize("keep", [False, True])
def test_posteriors_matches_cpp_walk(rng, keep):
    counts = rng.integers(0, 6, size=(500, 4)).astype(float)
    counts[rng.random(500) < 0.15] = 0  # zero-coverage rows
    alphas = [2.0, 0.5, 0.13, 0.02]
    got = calculate_posteriors(counts, alphas, keep, 0.11)
    want = posteriors_oracle(counts, np.array(alphas), keep, 0.11)
    assert np.array_equal(got, want)


def test_posteriors_tie_handling():
    # ties share an alpha rank; rank advances only at value boundaries
    counts = np.array([[5.0, 5.0, 3.0, 3.0], [7.0, 1.0, 1.0, 0.0]])
    alphas = [4.0, 2.0, 1.0, 0.5]
    got = calculate_posteriors(counts, alphas, False, 0.0)
    want = posteriors_oracle(counts, np.array(alphas), False, 0.0)
    assert np.array_equal(got, want)
    # both 5s use alpha[0]=4, both 3s use alpha[1]=2
    a0 = 7.5
    assert got[0, 0] == got[0, 1] == (5 + 4) / (16 + a0)
    assert got[0, 2] == got[0, 3] == (3 + 2) / (16 + a0)


def test_posteriors_zero_coverage_rows():
    counts = np.zeros((3, 4))
    alphas = [1.0, 0.5, 0.25, 0.25]
    # a_min = 1/2 > threshold -> kept as a_min
    got = calculate_posteriors(counts, alphas, False, 0.1)
    assert np.all(got == 0.5)
    # a_min <= threshold -> zeroed (keep cannot rescue: raw counts are 0)
    got = calculate_posteriors(counts, alphas, True, 0.6)
    assert np.all(got == 0.0)
