"""R-hat-converged multi-parameter estimation (config-3 scale).

Stronger than the smoke test in test_estimation.py: a 4-parameter NK
estimation with pooled cross-chain adaptation must CONVERGE by standard
MCMC criteria (split-R-hat < 1.05, ESS > 100 per parameter) and cover the
data-generating values.  ~4-6 min on CPU; marked slow alongside the NUTS
end-to-end tests.
"""

import jax
import numpy as np
import pytest

from geconpy_tpu import get_example_gcn, model_from_gcn
from geconpy_tpu.stats.estimation import fit
from geconpy_tpu.stats.statespace import DSGEStateSpace


@pytest.fixture(scope="module")
def setup():
    model = model_from_gcn(get_example_gcn("nk_3eq"), verbose=False)
    ss = DSGEStateSpace(model)
    # estimate the full shock block: two persistences + two volatilities
    ss.configure(observed_states=["x", "pi"],
                 filter_type="stationary", kalman_settle=48,
                 constant_params=["beta", "kappa", "sigma", "phi_pi",
                                  "phi_x"])
    data, draw = ss.data_from_prior(jax.random.PRNGKey(7), periods=250)
    return ss, np.asarray(data), draw


def test_multiparameter_estimation_converges(setup):
    ss, data, truth = setup
    assert ss.n_estimated == 4

    res = fit(ss, data, num_chains=4, num_warmup=300, num_samples=300,
              seed=2, max_depth=7, pooled_adaptation=True)
    summ = res.summary()

    assert (summ["r_hat"] < 1.05).all(), summ
    assert (summ["ess"] > 100).all(), summ
    assert res.diverging.mean() < 0.05

    # posterior 94% HDI covers the data-generating value for every param
    for name in res.param_names:
        lo, hi = summ.loc[name, "hdi_3%"], summ.loc[name, "hdi_97%"]
        assert lo <= truth[name] <= hi, (
            f"{name}: truth {truth[name]:.4f} outside [{lo:.4f}, {hi:.4f}]")
