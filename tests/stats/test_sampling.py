"""Prior-sampling unit tests (stats/sampling.py).

Reference role: gEconpy/model/sampling.py (bounds_from_priors:8,
sample_from_priors:46, sample_uniform_from_priors:148,
sample_from_priors_qmc:187).
"""

import numpy as np
import pytest

from geconpy_tpu.dists import Beta, Gamma, Normal
from geconpy_tpu.stats.sampling import (
    bounds_from_priors,
    sample_from_priors,
    sample_from_priors_qmc,
    sample_uniform_from_priors,
)


@pytest.fixture
def priors():
    return {
        "alpha": Beta(2.0, 5.0),
        "rho": Normal(0.9, 0.05),
        "sigma": Gamma(2.0, 0.5),
    }


def test_bounds_cover_central_mass(priors):
    bounds = bounds_from_priors(priors, mass=0.99)
    assert set(bounds) == set(priors)
    lo, hi = bounds["alpha"]
    assert 0.0 <= lo < hi <= 1.0
    lo, hi = bounds["rho"]
    assert lo < 0.9 < hi


def test_mc_draws_shapes_and_moments(priors):
    draws = sample_from_priors(priors, n_draws=20_000, seed=1)
    assert set(draws) == set(priors)
    assert all(v.shape == (20_000,) for v in draws.values())
    assert abs(draws["rho"].mean() - 0.9) < 0.01
    assert abs(draws["rho"].std() - 0.05) < 0.005
    # Beta(2,5) mean = 2/7
    assert abs(draws["alpha"].mean() - 2 / 7) < 0.01


def test_mc_draws_reproducible(priors):
    d1 = sample_from_priors(priors, n_draws=16, seed=3)
    d2 = sample_from_priors(priors, n_draws=16, seed=3)
    for n in priors:
        np.testing.assert_array_equal(d1[n], d2[n])
    d3 = sample_from_priors(priors, n_draws=16, seed=4)
    assert not np.allclose(d1["rho"], d3["rho"])


@pytest.mark.parametrize("method", ["lhs", "sobol", "halton"])
def test_uniform_space_filling_within_bounds(priors, method):
    draws = sample_uniform_from_priors(priors, n_draws=128, method=method, seed=0)
    bounds = bounds_from_priors(priors, mass=0.99)
    for name, vals in draws.items():
        lo, hi = bounds[name]
        assert vals.shape == (128,)
        assert (vals >= lo).all() and (vals <= hi).all()


def test_lhs_stratification():
    # LHS: exactly one draw per 1/n stratum in each marginal
    priors = {"u": Normal(0.0, 1.0)}
    draws = sample_uniform_from_priors(priors, n_draws=64, method="lhs",
                                       mass=0.99, seed=0)
    lo, hi = bounds_from_priors(priors, 0.99)["u"]
    unit = (draws["u"] - lo) / (hi - lo)
    strata = np.floor(unit * 64).astype(int)
    assert sorted(strata) == list(range(64))


def test_qmc_inverse_cdf_draws_from_prior(priors):
    draws = sample_from_priors_qmc(priors, n_draws=1024, method="sobol", seed=0)
    # inverse-CDF Sobol draws estimate the mean with low discrepancy
    assert abs(draws["rho"].mean() - 0.9) < 0.005
    assert (draws["alpha"] > 0).all() and (draws["alpha"] < 1).all()
    assert (draws["sigma"] > 0).all()


def test_unknown_method_raises(priors):
    with pytest.raises(ValueError, match="unknown QMC method"):
        sample_uniform_from_priors(priors, method="banana")
