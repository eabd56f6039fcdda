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
