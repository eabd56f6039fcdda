"""End-to-end Bayesian estimation smoke test (config 3 of BASELINE.json).

Short chains — this is a correctness smoke test (finite logp, no divergence
storm, posterior concentrates near truth), not a full inference run.
"""

import pathlib

import jax
import numpy as np
import pytest

from geconpy_tpu import model_from_gcn
from geconpy_tpu.stats.estimation import fit
from geconpy_tpu.stats.statespace import DSGEStateSpace

DATA = pathlib.Path(__file__).parents[2] / "geconpy_tpu" / "data"


@pytest.fixture(scope="module")
def setup():
    model = model_from_gcn(str(DATA / "rbc_estimation.gcn"))
    ss = DSGEStateSpace(model)
    # estimate only the shock process params; freeze structural ones to keep
    # the smoke test fast and well-identified with one observable
    ss.configure(observed_states=["Y"],
                 constant_params=["alpha", "sigma_C"])
    data, draw = ss.data_from_prior(jax.random.PRNGKey(42), periods=120)
    return ss, data, draw


def test_estimation_smoke(setup):
    ss, data, draw = setup
    res = fit(ss, data, num_chains=2, num_warmup=150, num_samples=150,
              seed=1, max_depth=5)
    assert res.samples.shape == (2, 150, 2)
    assert np.isfinite(res.logp).all()
    assert res.diverging.mean() < 0.2

    means = res.posterior_mean()
    # rho_A posterior near the generating value
    assert abs(means["rho_A"] - draw["rho_A"]) < 0.1, \
        (means, draw)
    # sigma_A within a factor ~2
    assert 0.4 < means["sigma_A"] / draw["sigma_A"] < 2.5, (means, draw)

    summary = res.summary()
    assert set(summary.index) == {"rho_A", "sigma_A"}
    assert (summary["ess"] > 15).all()


def test_estimation_pooled_adaptation(setup):
    """fit(pooled_adaptation=True): shared warmup across chains still
    produces finite, truth-concentrating posteriors."""
    ss, data, draw = setup
    res = fit(ss, np.asarray(data), num_chains=4, num_warmup=150,
              num_samples=150, seed=3, pooled_adaptation=True)
    assert np.isfinite(res.logp).all()
    # shared adaptation: one step size for all chains
    assert np.unique(np.asarray(res.step_size)).size == 1
    summ = res.summary()
    truth = {k: float(v) for k, v in zip(ss.param_labels,
                                         np.asarray(ss.constrain(
                                             ss.unconstrain(draw))))}
    for name in ss.param_labels:
        mean = float(summ.loc[name, "mean"])
        sd = float(summ.loc[name, "sd"])
        assert abs(mean - truth[name]) < 6 * sd + 0.1, \
            (name, mean, truth[name], sd)
