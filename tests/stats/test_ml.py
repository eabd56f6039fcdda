"""Maximum-likelihood estimation (stats/ml.py)."""

import jax
import numpy as np
import pytest

from geconpy_tpu import get_example_gcn, model_from_gcn
from geconpy_tpu.stats.ml import fit_ml
from geconpy_tpu.stats.statespace import DSGEStateSpace


@pytest.fixture(scope="module")
def setup():
    model = model_from_gcn(get_example_gcn("rbc_estimation"), verbose=False)
    ss = DSGEStateSpace(model)
    ss.configure(observed_states=["Y", "C"],
                 filter_type="stationary", kalman_settle=48,
                 measurement_error={"Y": 0.005, "C": 0.005},
                 constant_params=["alpha", "sigma_C"])
    data, _ = ss.data_from_prior(
        jax.random.PRNGKey(5), periods=600,
        params={"rho_A": 0.92, "sigma_A": 0.012})
    return ss, np.asarray(data)


def test_mle_recovers_and_reports(setup):
    ss, data = setup
    res = fit_ml(ss, data)
    assert res.success
    # T=600 with tight ME: tight recovery
    assert abs(res.params["rho_A"] - 0.92) < 0.05
    assert abs(res.params["sigma_A"] - 0.012) < 0.003
    # SEs: positive, plausibly sized, truth within ~3 SE
    for name, true in [("rho_A", 0.92), ("sigma_A", 0.012)]:
        se = res.std_errors[name]
        assert 0 < se < 0.2
        assert abs(res.params[name] - true) < 4 * se + 1e-3
    assert np.isfinite(res.aic) and np.isfinite(res.bic)
    assert res.bic > res.aic  # k ln T > 2k at T = 600
    summ = res.summary()
    assert set(summ.index) == {"rho_A", "sigma_A"}
    assert (summ["t_stat"].abs() > 2).all()
