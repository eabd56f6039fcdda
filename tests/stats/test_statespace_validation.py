"""configure()/builder input validation: every misconfiguration fails FAST
on the host with a specific, actionable message — before any tracing or
device compile.  Role parity with the reference's configure-time checks
(``gEconpy/model/statespace.py:822-1005``), including the stochastic-
singularity guard.
"""

import numpy as np
import pytest

from geconpy_tpu import get_example_gcn, model_from_gcn
from geconpy_tpu.stats.statespace import DSGEStateSpace


@pytest.fixture(scope="module")
def model():
    return model_from_gcn(get_example_gcn("rbc_estimation"), verbose=False)


def fresh(model):
    return DSGEStateSpace(model)


def test_unknown_observed_state(model):
    with pytest.raises(ValueError, match="observed_states not in model.*Zz"):
        fresh(model).configure(observed_states=["Zz"])


def test_unknown_filter_type(model):
    with pytest.raises(ValueError, match="filter_type must be"):
        fresh(model).configure(observed_states=["Y"], filter_type="kalmann")


def test_unknown_settle_method(model):
    with pytest.raises(ValueError, match="kalman_settle_method"):
        fresh(model).configure(observed_states=["Y"],
                               filter_type="stationary",
                               kalman_settle_method="sad")


def test_unknown_p0_init(model):
    with pytest.raises(ValueError, match="p0_init must be"):
        fresh(model).configure(observed_states=["Y"], p0_init="flat")


def test_diffuse_requires_exact_filter(model):
    with pytest.raises(ValueError, match="diffuse.*requires filter_type"):
        fresh(model).configure(observed_states=["Y"], p0_init="diffuse",
                               filter_type="stationary")


def test_measurement_error_on_unobserved_state(model):
    with pytest.raises(ValueError, match="not observed"):
        fresh(model).configure(observed_states=["Y"],
                               measurement_error=["C"])


def test_stochastic_singularity_guard(model):
    """More observables than shocks + measurement errors cannot yield a
    nonsingular likelihood; configure must refuse with the reference's
    diagnosis (gEconpy/model/statespace.py:995-1005)."""
    n_shocks = model.functions.n_shocks
    obs = [v for v in model.functions.variable_names][:n_shocks + 1]
    assert len(obs) > n_shocks
    with pytest.raises(ValueError, match="stochastic singularity"):
        fresh(model).configure(observed_states=obs)


def test_measurement_error_lifts_singularity(model):
    n_shocks = model.functions.n_shocks
    obs = [v for v in model.functions.variable_names][:n_shocks + 1]
    ss = fresh(model)
    ss.configure(observed_states=obs, measurement_error=[obs[-1]])
    assert len(ss.observed_states) == len(obs)


def test_observation_equation_unknown_variable(model):
    with pytest.raises(ValueError, match="unknown .*variable"):
        fresh(model).configure(observed_states=["dY"],
                               observation_equations={"dY": "Y[] - Q[-1]"})


def test_observation_equation_future_reference(model):
    with pytest.raises(ValueError, match="future"):
        fresh(model).configure(observed_states=["lead"],
                               observation_equations={"lead": "Y[1]"})


def test_data_shape_mismatch(model):
    ss = fresh(model)
    ss.configure(observed_states=["Y"],
                 constant_params=["alpha", "sigma_C"])
    with pytest.raises(ValueError, match=r"data must be \(periods, 1\)"):
        ss.build_logpost(np.zeros((30, 2)))


def test_stationary_filter_rejects_aperiodic_missingness(model):
    ss = fresh(model)
    ss.configure(observed_states=["Y"],
                 constant_params=["alpha", "sigma_C"],
                 filter_type="stationary")
    y = np.random.default_rng(0).standard_normal((40, 1)) * 0.01
    y[7, 0] = np.nan   # a single hole is not a periodic pattern
    with pytest.raises(ValueError, match="periodic"):
        ss.build_logpost(y)


def test_steady_state_filter_rejects_any_missingness(model):
    ss = fresh(model)
    ss.configure(observed_states=["Y"],
                 constant_params=["alpha", "sigma_C"],
                 filter_type="steady_state")
    y = np.zeros((40, 1))
    y[3, 0] = np.nan
    with pytest.raises(ValueError, match="fully observed"):
        ss.build_logpost(y)


def test_batched_builder_rejects_bad_policy_and_settle(model):
    ss = fresh(model)
    ss.configure(observed_states=["Y"],
                 constant_params=["alpha", "sigma_C"],
                 filter_type="stationary")
    y = np.zeros((30, 1), np.float32)
    with pytest.raises(ValueError, match="policy must be"):
        ss.build_batched_loglik(y, policy="cuda")
    with pytest.raises(ValueError, match="settle must be"):
        ss.build_batched_logpost(y, settle="hewer2")


def test_aggregation_method_validated(model):
    from geconpy_tpu.stats.statespace import aggregated_obs_equation

    with pytest.raises(ValueError, match="unknown aggregation method"):
        aggregated_obs_equation("Y", "median", 3)


def test_pct_missing_range_validated(model):
    ss = fresh(model)
    ss.configure(observed_states=["Y"],
                 constant_params=["alpha", "sigma_C"])
    import jax

    with pytest.raises(ValueError, match="pct_missing"):
        ss.data_from_prior(jax.random.PRNGKey(0), periods=10,
                           pct_missing=1.5)
