import numpy as np
import pytest
from scipy.special import gammaln

from tracs_tpu.models.transcluster import (
    calculate_trans_prob,
    lprob_k_given_N,
    trans_dist,
)


def test_lprob_k_given_N_sage_golden():
    # golden from a symbolic Sage integral (reference tests/test_llk.py:27-28)
    lgamma = gammaln(range(20))
    lp, lhs = lprob_k_given_N(7, 4, 0.16963, 3, 52, lgamma)
    assert abs(lp + 17.9565184209608) < 1e-6
    assert abs(lhs - 12.0861694243766) < 1e-6


def test_lprob_delta_zero_closed_form():
    lgamma = gammaln(range(50))
    N, k, lamb, beta = 5, 3, 29.903, 73.0
    lp, lhs = lprob_k_given_N(N, k, 0.0, lamb, beta, lgamma)
    want = (
        (N + 1) * np.log(lamb)
        + k * np.log(beta)
        + gammaln(N + k + 1)
        - gammaln(N + 1)
        - gammaln(k + 1)
        - (N + k + 1) * np.log(lamb + beta)
    )
    assert abs(lp - want) < 1e-12
    assert lp == lhs


def test_trans_dist_reference_goldens():
    # the end-to-end distance-stage goldens (reference
    # tests/test_trans_distance.py:29-43): lambda=29.903, beta=73,
    # precision=0.01, delta = 1 day = 86400/31556952 years
    delta = 0.002737907006988508
    p0, eK = trans_dist([0, 2], [delta, delta], 29.903, 73.0, 0.01)
    assert abs(np.exp(p0[0]) - 0.23794988406662973) < 1e-6
    assert abs(np.exp(p0[1]) - 0.024467137572328577) < 1e-6
    assert abs(eK[0] - 2.6335200453700187) < 1e-6
    assert abs(eK[1] - 7.315670110063259) < 1e-6


def test_trans_dist_memoised_scatter():
    # duplicate (N, delta) pairs must produce identical outputs in order
    d = [5, 0, 5, 2, 0]
    dd = [0.1, 0.2, 0.1, 0.2, 0.2]
    p0, eK = trans_dist(d, dd, 29.903, 73.0, 0.01)
    assert p0[0] == p0[2]
    assert eK[1] == eK[4]
    assert len(p0) == len(eK) == 5


def test_trans_dist_delta_zero_quirk():
    # the reference's upper_bound_E produces NaN at delta=0 (0 * log 0), so
    # the k-loop exits after k=1 and E(K) = P(k=1 | N); we reproduce that
    p0, eK = trans_dist([3], [0.0], 29.903, 73.0, 0.01)
    lgamma = gammaln(range(50))
    lp1, _ = lprob_k_given_N(3, 1, 0.0, 29.903, 73.0, lgamma)
    assert abs(eK[0] - np.exp(lp1)) < 1e-12
    lp0, _ = lprob_k_given_N(3, 0, 0.0, 29.903, 73.0, lgamma)
    assert abs(p0[0] - lp0) < 1e-12


def test_trans_dist_empty():
    p0, eK = trans_dist([], [], 29.903, 73.0)
    assert len(p0) == 0 and len(eK) == 0


def test_variant_equivalence():
    # variant-1 (public API) and the vectorised variant-2 engine agree on
    # lprob for k=0 across a parameter sweep
    lgamma = gammaln(range(200))
    rng = np.random.default_rng(7)
    for _ in range(25):
        N = int(rng.integers(0, 60))
        delta = float(rng.uniform(0.001, 2.0))
        lamb = float(rng.uniform(0.5, 40.0))
        beta = float(rng.uniform(1.0, 100.0))
        lp_v1, _ = lprob_k_given_N(N, 0, delta, lamb, beta, lgamma)
        p0, _ = trans_dist([N], [delta], lamb, beta, 0.01)
        assert abs(p0[0] - lp_v1) < 1e-9, (N, delta, lamb, beta)


def test_large_N_stability():
    # the reference lgamma table stops at 10000 (UB beyond); our direct
    # lgamma evaluation must stay finite and sane for large N
    p0, eK = trans_dist([20000], [0.5], 29.903, 73.0, 0.01)
    assert np.isfinite(p0[0])
    assert np.isfinite(eK[0])
    assert p0[0] < 0


def test_calculate_trans_prob_dates():
    from datetime import date

    dates = {
        "s0": ("2019-01-14", date.fromisoformat("2019-01-14")),
        "s1": ("2019-01-15", date.fromisoformat("2019-01-15")),
    }
    p0, eK, dd = calculate_trans_prob(
        [[0], [1], [2]],
        sample_dates=dates,
        K=100,
        lamb=29.903,
        beta=73.0,
        samplenames=["s0", "s1"],
        log=False,
        precision=0.01,
    )
    assert abs(dd[0] - 0.002737907006988508) < 1e-15
    assert abs(np.exp(np.log(p0[0])) - p0[0]) < 1e-12  # p0 exponentiated
    assert abs(p0[0] - 0.024467137572328577) < 1e-6


def test_extended_regime_bound_guard():
    """Beyond the reference's defined regime (lamb*delta >> N: upper bound
    ~1e61, threshold 1e-6) the bound comparison is pure f64 cancellation;
    a spurious ulp-crossing must NOT truncate the sum.  Exact math runs to
    the k cap; E(K) lands near the transmission-rate expectation and the
    blocked engine matches the monolithic oracle."""
    import jax
    import jax.numpy as jnp
    from tracs_tpu.models.transcluster import (
        _cpu, _sum_cap, _trans_dist_batch, _K_CAP, trans_dist,
    )

    p0, eK = trans_dist([27], [7.3101], 29.903, 73)
    assert 400 < eK[0] < 700  # ~beta*delta intermediate hosts, not ~1e-44

    cap_p = _sum_cap(29.903 * 7.3101, 27)
    cap_i = _sum_cap(7.3101 * (29.903 + 73), 27 + _K_CAP)
    with jax.default_device(_cpu()):
        p0_m, eK_m = _trans_dist_batch(
            jnp.asarray([27.0]), jnp.asarray([7.3101]),
            lamb=29.903, beta=73.0, threshold_Ek=1e-6,
            cap_pois=cap_p, cap_int=cap_i,
        )
    np.testing.assert_allclose(eK, np.asarray(eK_m), rtol=1e-7)
    np.testing.assert_allclose(p0, np.asarray(p0_m), rtol=1e-9)


def test_extended_regime_tiny_term_exit():
    """The tiny-term early exit on bound-unusable lanes must return the
    same E(K) the full 10000-step loop would: once k*P(k) decays below
    ~ulp(e_sum), every further add is a no-op in f64.  Emulate the exact
    _k_step_fast linear accumulation in numpy to the k cap and compare
    tightly (libm exp/log differ across backends at ~1ulp, so not ==)."""
    import math
    from scipy.special import gammaln
    from tracs_tpu.models.transcluster import trans_dist, upper_bound_E, _K_CAP

    lamb, beta = 29.903, 73.0
    cases = [(27, 7.3101), (3, 9.99), (120, 6.5)]
    for N, delta in cases:
        assert upper_bound_E(delta, lamb, beta, N) * 1e-12 >= 0.01  # unusable
    p0, eK = trans_dist([c[0] for c in cases], [c[1] for c in cases],
                        lamb, beta, 0.01)

    log_lb = math.log(lamb + beta)
    for (N, delta), got in zip(cases, eK):
        # seeds (same series formulas as the engine)
        i = np.arange(0, N + 1)
        log_pois = np.logaddexp.reduce(i * np.log(lamb * delta) - gammaln(i + 1.0))
        j = np.arange(0, N + 1)
        log_I = np.logaddexp.reduce(
            j * np.log(delta) - gammaln(j + 1.0) - (N - j + 1.0) * log_lb
        )
        e_sum = 0.0
        lg_N1 = gammaln(N + 1.0)
        for k in range(1, _K_CAP):
            M = N + k
            log_I = np.logaddexp(
                M * np.log(delta) - gammaln(M + 1.0) - log_lb, log_I - log_lb
            )
            lp = (
                (N + 1.0) * math.log(lamb) + k * math.log(beta)
                + gammaln(M + 1.0) - lg_N1 - gammaln(k + 1.0)
                - delta * beta - log_pois + log_I
            )
            e_sum += math.exp(lp + math.log(k)) if k > 1 else math.exp(lp)
        np.testing.assert_allclose(got, e_sum, rtol=1e-11)
