"""Detrending utilities (stats/detrend.py).

The reference ships no detrenders; these pin the mathematical contracts:
exact-solution identities, NaN layout, and panel == per-series consistency.
"""

import numpy as np
import pytest

from geconpy_tpu.stats.detrend import (hamilton_filter, hp_filter,
                                       one_sided_hp_filter)


def _trend_series(T=120):
    t = np.arange(T, dtype=float)
    return 0.5 * t + 3.0


class TestHPFilter:
    def test_linear_trend_passes_through(self):
        y = _trend_series()
        trend, cycle = hp_filter(y)
        # a linear path has zero second difference: penalty is free, so the
        # exact solution is trend == y
        np.testing.assert_allclose(trend, y, atol=1e-8)
        np.testing.assert_allclose(cycle, 0.0, atol=1e-8)

    def test_decomposition_identity(self):
        rng = np.random.default_rng(0)
        y = _trend_series() + rng.normal(size=120)
        trend, cycle = hp_filter(y)
        np.testing.assert_allclose(trend + cycle, y, atol=1e-10)

    def test_large_lambda_approaches_ols_line(self):
        rng = np.random.default_rng(1)
        T = 80
        y = _trend_series(T) + rng.normal(size=T)
        trend, _ = hp_filter(y, lam=1e12)
        X = np.column_stack([np.ones(T), np.arange(T)])
        line = X @ np.linalg.lstsq(X, y, rcond=None)[0]
        np.testing.assert_allclose(trend, line, atol=1e-3)

    def test_panel_matches_per_series(self):
        rng = np.random.default_rng(2)
        Y = rng.normal(size=(60, 3)).cumsum(axis=0)
        trend, cycle = hp_filter(Y)
        for j in range(3):
            tj, cj = hp_filter(Y[:, j])
            np.testing.assert_allclose(trend[:, j], tj)
            np.testing.assert_allclose(cycle[:, j], cj)

    def test_rejects_nan_and_short(self):
        with pytest.raises(ValueError):
            hp_filter(np.array([1.0, np.nan, 3.0, 4.0]))
        with pytest.raises(ValueError):
            hp_filter(np.array([1.0, 2.0]))


class TestOneSidedHP:
    def test_tracks_linear_trend(self):
        y = _trend_series(200)
        trend, cycle = one_sided_hp_filter(y)
        # the LLT filter locks onto a deterministic linear path
        np.testing.assert_allclose(trend[50:], y[50:], atol=1e-2)

    def test_causal_no_lookahead(self):
        # perturbing the future must not change earlier trend values
        rng = np.random.default_rng(3)
        y = _trend_series(100) + rng.normal(size=100)
        t1, _ = one_sided_hp_filter(y)
        y2 = y.copy()
        y2[-1] += 50.0
        t2, _ = one_sided_hp_filter(y2)
        np.testing.assert_allclose(t1[:-1], t2[:-1])

    def test_panel_matches_per_series(self):
        rng = np.random.default_rng(4)
        Y = rng.normal(size=(60, 2)).cumsum(axis=0)
        trend, _ = one_sided_hp_filter(Y)
        for j in range(2):
            tj, _ = one_sided_hp_filter(Y[:, j])
            np.testing.assert_allclose(trend[:, j], tj)


class TestHamiltonFilter:
    def test_linear_trend_zero_cycle(self):
        y = _trend_series()
        trend, cycle = hamilton_filter(y, h=8, p=4)
        # y_{t+h} is an exact affine function of the lags, so the fitted
        # value is exact where defined
        valid = ~np.isnan(cycle)
        assert valid.sum() == len(y) - 8 - (4 - 1)
        np.testing.assert_allclose(cycle[valid], 0.0, atol=1e-8)
        np.testing.assert_allclose(trend[valid], y[valid], atol=1e-8)

    def test_nan_layout(self):
        y = np.random.default_rng(5).normal(size=50).cumsum()
        _, cycle = hamilton_filter(y, h=8, p=4)
        assert np.isnan(cycle[:8 + 4 - 1]).all()
        assert np.isfinite(cycle[8 + 4 - 1:]).all()

    def test_panel_matches_per_series(self):
        # regression coefficients are per-series: a panel must decompose
        # exactly as its columns do independently
        rng = np.random.default_rng(6)
        Y = rng.normal(size=(80, 3)).cumsum(axis=0)
        trend, cycle = hamilton_filter(Y)
        for j in range(3):
            tj, cj = hamilton_filter(Y[:, j])
            np.testing.assert_allclose(trend[:, j], tj)
            np.testing.assert_allclose(cycle[:, j], cj)

    def test_rejects_too_short(self):
        with pytest.raises(ValueError):
            hamilton_filter(np.ones(12), h=8, p=4)
