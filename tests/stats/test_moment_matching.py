"""GMM moment matching (stats/moment_matching.py).

Consistency on model-generated data: with long samples the GMM estimates
concentrate on the generating parameters; the moment table matches the
sample; SEs shrink with T.
"""

import jax
import numpy as np
import pytest

from geconpy_tpu import get_example_gcn, model_from_gcn
from geconpy_tpu.stats.moment_matching import fit_moment_matching
from geconpy_tpu.stats.statespace import DSGEStateSpace


@pytest.fixture(scope="module")
def setup():
    model = model_from_gcn(get_example_gcn("rbc_estimation"), verbose=False)
    ss = DSGEStateSpace(model)
    ss.configure(observed_states=["Y", "C"],
                 constant_params=["alpha", "sigma_C"],
                 measurement_error={"Y": 1e-4, "C": 1e-4},
                 filter_type="sequential")
    data, _ = ss.data_from_prior(
        jax.random.PRNGKey(21), periods=4000,
        params={"rho_A": 0.9, "sigma_A": 0.015})
    return ss, np.asarray(data)


def test_gmm_recovers_parameters(setup):
    ss, data = setup
    res = fit_moment_matching(ss, data, lags=(1, 2))
    assert res.success
    assert abs(res.params["rho_A"] - 0.9) < 0.04
    assert abs(res.params["sigma_A"] - 0.015) < 0.003
    # SEs are positive and in a plausible range for T=4000
    assert 0 < res.std_errors["rho_A"] < 0.1
    assert 0 < res.std_errors["sigma_A"] < 0.01
    # moment table: model moments close to sample at the optimum (weighted)
    assert res.n_moments == 2 + 3 + 4 * 2
    assert len(res.moments) == res.n_moments
    var_rows = res.moments.xs("cov", level="kind")
    np.testing.assert_allclose(var_rows["model"], var_rows["sample"],
                               rtol=0.25)


def test_gmm_weights_and_validation(setup):
    ss, data = setup
    res_id = fit_moment_matching(ss, data, lags=(1,), weights="identity",
                                 adam_steps=200)
    assert res_id.success
    assert abs(res_id.params["rho_A"] - 0.9) < 0.06

    with pytest.raises(ValueError, match="positive"):
        fit_moment_matching(ss, data, lags=(0,))
    bad = data.copy()
    bad[0, 0] = np.nan
    with pytest.raises(ValueError, match="fully observed"):
        fit_moment_matching(ss, bad)
