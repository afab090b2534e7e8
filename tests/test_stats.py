"""Distribution-function and HWE exact-test accuracy tests.

scipy (available in the test environment) serves as the correctness oracle
for the self-contained implementations, mirroring the reference's use of
plink 1.9 as an independent oracle (2.0/Tests/run_tests.sh)."""

import numpy as np
import pytest

scipy_stats = pytest.importorskip("scipy.stats")
scipy_special = pytest.importorskip("scipy.special")

from plink_tpu.stats import chisq_logsf, f_logsf, gammaln, normal_logsf, t_logsf
from plink_tpu.stats.distributions import t_logp_2sided, zstat_logp_2sided
from plink_tpu.stats.hwe import hwe_exact_pvals


def test_gammaln():
    x = np.concatenate([np.linspace(0.01, 10, 500), np.logspace(1, 15, 200)])
    np.testing.assert_allclose(gammaln(x), scipy_special.gammaln(x), rtol=1e-12)


def test_chisq_logsf():
    x = np.concatenate([np.linspace(0.001, 50, 300), np.logspace(1.7, 4, 50)])
    for df in (1, 2, 5, 10, 100):
        got = chisq_logsf(x, df)
        want = scipy_stats.chi2.logsf(x, df)
        finite = np.isfinite(want)  # scipy underflows to -inf past ~-745
        np.testing.assert_allclose(got[finite], want[finite], rtol=1e-10, atol=1e-12)
        assert np.isfinite(got).all() and (np.diff(got) < 1e-9).all()


def test_chisq_extreme_lnspace():
    # ln p at chisq = 5000, df=1: far below DBL_MIN in linear space.
    lp = chisq_logsf(np.array([5000.0]), 1)
    # scipy.chi2.logsf underflows here; norm.logsf stays in log space:
    # Q_chi2(x, 1) = 2 * P(Z > sqrt(x)).
    want = np.log(2) + scipy_stats.norm.logsf(np.sqrt(5000.0))
    np.testing.assert_allclose(lp, [want], rtol=1e-12)
    assert lp[0] < -2000


def test_t_logsf():
    t = np.linspace(-30, 30, 400)
    for df in (1, 3, 10, 120, 5000):
        np.testing.assert_allclose(
            t_logsf(t, df), scipy_stats.t.logsf(t, df), rtol=1e-9, atol=1e-11
        )
        np.testing.assert_allclose(
            t_logp_2sided(t, df),
            np.log(2) + scipy_stats.t.logsf(np.abs(t), df),
            rtol=1e-9,
            atol=1e-11,
        )


def test_f_logsf():
    f = np.linspace(0.01, 200, 300)
    for d1, d2 in ((1, 10), (2, 100), (5, 5), (10, 10000)):
        got = f_logsf(f, d1, d2)
        want = scipy_stats.f.logsf(f, d1, d2)
        # scipy's logsf loses accuracy approaching linear-space underflow
        # (verified against an exact binomial-sum identity); compare tightly
        # only where scipy is reliable.
        solid = want > -600
        np.testing.assert_allclose(got[solid], want[solid], rtol=1e-9, atol=1e-11)
        deep = (~solid) & (want > -700)  # scipy unreliable past subnormal range
        np.testing.assert_allclose(got[deep], want[deep], rtol=1e-4)
        assert np.isfinite(got).all() and (np.diff(got) < 1e-9).all()


def test_normal_logsf():
    z = np.linspace(-40, 40, 500)
    np.testing.assert_allclose(normal_logsf(z), scipy_stats.norm.logsf(z), rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(
        zstat_logp_2sided(z), np.log(2) + scipy_stats.norm.logsf(np.abs(z)), rtol=1e-9
    )


def _hwe_reference(hom1, het, hom2):
    """Literal-transcription scalar SNP-HWE (Wigginton 2005) as oracle."""
    obs_homr, obs_homc = min(hom1, hom2), max(hom1, hom2)
    n = hom1 + het + hom2
    rare = 2 * obs_homr + het
    if n == 0:
        return np.nan
    probs = np.zeros(rare + 1)
    mid = rare * (2 * n - rare) // (2 * n)
    if (mid % 2) != (rare % 2):
        mid += 1
    probs[mid] = 1.0
    curr_homr = (rare - mid) // 2
    curr_homc = n - mid - curr_homr
    h, homr, homc = mid, curr_homr, curr_homc
    while h > 1:
        probs[h - 2] = probs[h] * h * (h - 1.0) / (4.0 * (homr + 1.0) * (homc + 1.0))
        h -= 2
        homr += 1
        homc += 1
    h, homr, homc = mid, curr_homr, curr_homc
    while h <= rare - 2:
        probs[h + 2] = probs[h] * 4.0 * homr * homc / ((h + 2.0) * (h + 1.0))
        h += 2
        homr -= 1
        homc -= 1
    total = probs.sum()
    p_obs = probs[het]
    return min(1.0, probs[probs <= p_obs * (1 + 1e-12)].sum() / total)


def test_hwe_exact_matches_scalar_oracle(rng):
    cases = []
    for _ in range(60):
        n = int(rng.integers(5, 2000))
        maf = rng.uniform(0.01, 0.5)
        g = rng.binomial(2, maf, size=n)
        cases.append(((g == 0).sum(), (g == 1).sum(), (g == 2).sum()))
    cases += [(100, 0, 0), (0, 100, 0), (0, 0, 100), (50, 0, 50), (1, 1, 1)]
    hom1 = np.array([c[0] for c in cases])
    het = np.array([c[1] for c in cases])
    hom2 = np.array([c[2] for c in cases])
    got = hwe_exact_pvals(hom1, het, hom2)
    want = np.array([_hwe_reference(*c) for c in cases])
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_hwe_midp_smaller(rng):
    hom1 = np.array([30, 500]); het = np.array([40, 100]); hom2 = np.array([30, 2])
    p = hwe_exact_pvals(hom1, het, hom2, midp=False)
    pm = hwe_exact_pvals(hom1, het, hom2, midp=True)
    assert (pm < p).all()
