"""Convergence diagnostics (stats/diagnostics.py) against statistical
oracles: split-R-hat and ESS on chains with KNOWN mixing properties."""

import numpy as np
import pytest

from geconpy_tpu.stats.diagnostics import summarize_chains


def _summ(chains, names=("p",)):
    arr = np.asarray(chains)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return summarize_chains(arr, list(names))


def test_rhat_of_identical_iid_chains_is_one():
    rng = np.random.default_rng(0)
    chains = rng.normal(size=(4, 2000))
    s = _summ(chains)
    assert abs(float(s["r_hat"].iloc[0]) - 1.0) < 0.01


def test_rhat_detects_mean_shifted_chains():
    """Chains centered 3 sd apart: R-hat must fire far above any threshold."""
    rng = np.random.default_rng(1)
    chains = rng.normal(size=(4, 1000)) + np.array([0., 3., -3., 6.])[:, None]
    s = _summ(chains)
    assert float(s["r_hat"].iloc[0]) > 1.5


def test_rhat_detects_within_chain_trend():
    """Split-R-hat catches a chain that drifts (first half != second half)
    even when the full-chain means agree."""
    rng = np.random.default_rng(2)
    n = 1000
    trend = np.linspace(-2.0, 2.0, n)
    chains = rng.normal(size=(4, n)) + trend[None, :]
    s = _summ(chains)
    assert float(s["r_hat"].iloc[0]) > 1.2


def test_ess_of_iid_chains_is_about_total_draws():
    rng = np.random.default_rng(3)
    c, n = 4, 2000
    s = _summ(rng.normal(size=(c, n)))
    ess = float(s["ess"].iloc[0])
    assert 0.75 * c * n <= ess <= 1.35 * c * n


def test_ess_of_ar1_chain_matches_theory():
    """AR(1) draws with autocorrelation rho have ESS ~ N (1-rho)/(1+rho)."""
    rng = np.random.default_rng(4)
    rho = 0.9
    c, n = 4, 8000
    chains = np.zeros((c, n))
    innov = rng.normal(size=(c, n)) * np.sqrt(1 - rho ** 2)
    for t in range(1, n):
        chains[:, t] = rho * chains[:, t - 1] + innov[:, t]
    s = _summ(chains)
    ess = float(s["ess"].iloc[0])
    theory = c * n * (1 - rho) / (1 + rho)
    assert 0.5 * theory <= ess <= 2.0 * theory, (ess, theory)


def test_hdi_covers_the_right_mass_for_gaussian_draws():
    rng = np.random.default_rng(5)
    chains = 2.0 + 0.5 * rng.normal(size=(4, 5000))
    s = _summ(chains)
    row = s.iloc[0]
    np.testing.assert_allclose(row["mean"], 2.0, atol=0.03)
    np.testing.assert_allclose(row["sd"], 0.5, atol=0.03)
    lo_cols = [c for c in s.columns if c.startswith("hdi_3") or c == "hdi_lo"]
    hi_cols = [c for c in s.columns if c.startswith("hdi_9") or c == "hdi_hi"]
    if lo_cols and hi_cols:
        lo, hi = float(row[lo_cols[0]]), float(row[hi_cols[0]])
        # central 94%: +-1.88 sd
        np.testing.assert_allclose([lo, hi], [2 - 1.88 * 0.5, 2 + 1.88 * 0.5],
                                   atol=0.06)


def test_multiparameter_summary_orders_rows_by_name_argument():
    rng = np.random.default_rng(6)
    arr = np.stack([rng.normal(size=(4, 500)),
                    5.0 + rng.normal(size=(4, 500))], axis=-1)
    s = summarize_chains(arr, ["a", "b"])
    assert list(s.index) == ["a", "b"]
    assert abs(float(s.loc["b", "mean"]) - 5.0) < 0.2
