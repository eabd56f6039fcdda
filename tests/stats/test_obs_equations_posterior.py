import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geconpy_tpu import model_from_gcn
from geconpy_tpu.stats.posterior import (
    posterior_autocorrelation,
    posterior_diagnostics,
    posterior_fevd,
    posterior_irfs,
    posterior_smoothed_states,
    prepare_mixed_frequency_data,
)
from geconpy_tpu.stats.statespace import DSGEStateSpace, aggregated_obs_equation
from geconpy_tpu.stats.estimation import PosteriorResult

DATA = pathlib.Path(__file__).parents[2] / "geconpy_tpu" / "data"


@pytest.fixture(scope="module")
def model():
    return model_from_gcn(str(DATA / "rbc_estimation.gcn"))


def _fake_posterior(ss_mod, key=0, n=8):
    """A tiny synthetic 'posterior': jittered prior means (for tooling tests)."""
    u0 = ss_mod.initial_position()
    rng = np.random.default_rng(key)
    us = np.asarray(u0)[None, None, :] + 0.05 * rng.normal(
        size=(2, n // 2, len(u0)))
    constrain = jax.vmap(jax.vmap(ss_mod.constrain))
    return PosteriorResult(
        samples=np.asarray(constrain(jnp.asarray(us))),
        unconstrained=us,
        logp=np.zeros((2, n // 2)),
        param_names=ss_mod.param_labels,
        diverging=np.zeros((2, n // 2), dtype=bool),
        accept_prob=np.ones((2, n // 2)),
        step_size=np.ones(2),
    )


def test_observation_equation_growth_rate(model):
    """dY = Y[] - Y[-1] as a synthetic observable: lag augmentation + exact
    coefficients; loglik finite and equal to manually-filtered system."""
    ss = DSGEStateSpace(model)
    ss.configure(observed_states=["dY"],
                 observation_equations={"dY": "Y[] - Y[-1]"},
                 constant_params=["alpha", "sigma_C"],
                 measurement_error={"dY": 0.001})
    assert ss._obs_max_lag == 1
    data, draw = ss.data_from_prior(jax.random.PRNGKey(0), periods=100)
    extras = jax.jit(ss.build_logpost_extras(data))
    ex = extras(ss.unconstrain(draw))
    assert np.isfinite(float(ex.logpost)), ex

    # gradient flows through the augmented system
    g = jax.grad(ss.build_logpost(data))(ss.unconstrain(draw))
    assert np.all(np.isfinite(np.asarray(g)))


def test_observation_equation_validation(model):
    ss = DSGEStateSpace(model)
    with pytest.raises(ValueError, match="unknown"):
        ss.configure(observed_states=["z"],
                     observation_equations={"z": "NOPE[] + Y[]"})
    with pytest.raises(ValueError, match="future"):
        ss.configure(observed_states=["z"],
                     observation_equations={"z": "Y[1]"})


def test_aggregated_obs_equation_sugar():
    assert aggregated_obs_equation("Y", "sum", 3) == "Y[] + Y[-1] + Y[-2]"
    assert aggregated_obs_equation("Y", "mean", 2) == "(Y[] + Y[-1]) / 2"
    assert aggregated_obs_equation("Y", "last", 3) == "Y[]"
    assert aggregated_obs_equation("Y", "first", 3) == "Y[-2]"


def test_temporal_aggregation_pipeline(model):
    """Quarterly-observed aggregate of a monthly model variable."""
    ss = DSGEStateSpace(model)
    ss.configure(observed_states=["Y_q"],
                 aggregate={"Y_q": ("Y", "sum", 3)},
                 constant_params=["alpha", "sigma_C"],
                 measurement_error={"Y_q": 0.001})
    assert ss._obs_max_lag == 2
    data, draw = ss.data_from_prior(jax.random.PRNGKey(1), periods=90)
    # keep only every 3rd observation (end of quarter)
    low_freq = np.asarray(data)[2::3]
    padded = prepare_mixed_frequency_data(low_freq, period=3,
                                          n_high_freq=90)
    assert padded.shape == (90, 1)
    assert np.isnan(padded).sum() == 60
    ex = jax.jit(ss.build_logpost_extras(padded))(ss.unconstrain(draw))
    assert np.isfinite(float(ex.logpost)), ex


def test_mixed_frequency_stationary_filter(model):
    """filter_type='stationary' auto-routes periodically-missing data through
    the cyclostationary filter (periodic DARE, per-phase frozen gains) and
    stays close to the exact sequential filter on a long sample."""
    def build(filter_type):
        ss = DSGEStateSpace(model)
        ss.configure(observed_states=["Y_q", "C"],
                     aggregate={"Y_q": ("Y", "sum", 3)},
                     filter_type=filter_type,
                     constant_params=["alpha", "sigma_C"],
                     measurement_error={"Y_q": 0.001, "C": 0.001})
        return ss

    ss_seq = build("sequential")
    ss_cyc = build("stationary")
    full, draw = ss_seq.data_from_prior(jax.random.PRNGKey(2), periods=480)
    full = np.asarray(full)
    # quarterly observable: keep every 3rd row, consumption stays monthly
    full[:, 0] = prepare_mixed_frequency_data(
        full[2::3, 0], period=3, n_high_freq=480)[:, 0]
    u = ss_seq.unconstrain(draw)

    gaps = {}
    for T_len in (240, 480):
        data = full[:T_len]
        ll_seq = float(jax.jit(ss_seq.build_logpost_extras(data))(u).loglik)
        ll_cyc = float(jax.jit(ss_cyc.build_logpost_extras(data))(u).loglik)
        assert np.isfinite(ll_seq) and np.isfinite(ll_cyc)
        gaps[T_len] = abs(ll_seq - ll_cyc)
    # the two filters differ only in initialization (Lyapunov P0 vs periodic
    # DARE fixed point): the gap is a bounded transient, NOT O(periods)
    assert gaps[240] < 10.0, gaps
    assert gaps[480] < gaps[240] + 1.0, gaps

    # gradients flow through the implicit periodic-DARE adjoint
    g = jax.grad(ss_cyc.build_logpost(data))(u)
    assert np.all(np.isfinite(np.asarray(g)))


def test_stationary_filter_rejects_aperiodic_missingness(model):
    ss = DSGEStateSpace(model)
    ss.configure(observed_states=["Y"], filter_type="stationary",
                 constant_params=["alpha", "sigma_C"])
    data, _ = ss.data_from_prior(jax.random.PRNGKey(3), periods=50)
    data = np.asarray(data)
    rng = np.random.default_rng(0)
    data[rng.choice(50, 11, replace=False), 0] = np.nan
    with pytest.raises(ValueError, match="periodic"):
        ss.build_logpost_extras(data)


@pytest.fixture(scope="module")
def configured(model):
    ss = DSGEStateSpace(model)
    ss.configure(observed_states=["Y"],
                 constant_params=["alpha", "sigma_C"])
    return ss


def test_posterior_irfs(configured):
    res = _fake_posterior(configured)
    irf = posterior_irfs(configured, res, periods=10, max_draws=None)
    assert {"mean", "q0.05", "q0.5", "q0.95"} <= set(irf.columns)
    # one-sd technology shock raises output on impact across the posterior
    assert irf.loc[("epsilon_A", "Y", 0), "q0.05"] > 0


def test_posterior_acf_and_fevd(configured):
    res = _fake_posterior(configured)
    acf = posterior_autocorrelation(configured, res, n_lags=4, max_draws=None)
    np.testing.assert_allclose(
        acf.loc[(0, "Y"), "mean"], 1.0, atol=1e-8)
    fevd = posterior_fevd(configured, res, horizon=10, max_draws=None)
    np.testing.assert_allclose(fevd.sum(axis=1).to_numpy(), 1.0, atol=1e-8)


def test_posterior_smoother_and_diagnostics(configured):
    res = _fake_posterior(configured)
    data, _ = configured.data_from_prior(jax.random.PRNGKey(3), periods=40)
    sm = posterior_smoothed_states(configured, res, data, max_draws=None)
    assert sm.loc[(0, "Y")].notna().all()
    diag = posterior_diagnostics(configured, res, max_draws=None)
    assert diag["ss_success"].all()
    assert (diag["deterministic_norm"] < 1e-6).all()


def test_filter_data_api(configured):
    import jax

    data, draw = configured.data_from_prior(jax.random.PRNGKey(5), periods=60)
    filt = configured.filter_data(data, params=draw)
    assert filt.shape == (60, 9)
    assert np.isfinite(filt.attrs["loglik"])
    sm = configured.filter_data(data, params=draw, smoother=True)
    assert sm.shape == (60, 9)
    # smoothed Y tracks observed Y closely (Y is observed w/o meas. error)
    corr = np.corrcoef(sm["Y"], np.asarray(data)[:, 0])[0, 1]
    assert corr > 0.99


def test_prior_predictive_sweep_sharded(configured):
    """Config-5 workload: draws sharded over the 8-device virtual mesh."""
    from geconpy_tpu.parallel.mesh import make_mesh
    from geconpy_tpu.stats.prior_predictive import prior_predictive_sweep

    out = prior_predictive_sweep(configured, n_draws=24, periods=8,
                                 fevd_horizon=6, mesh=make_mesh())
    assert out["success_rate"] > 0.8
    assert {"mean", "q0.5"} <= set(out["irf"].columns)
    np.testing.assert_allclose(out["fevd"].sum(axis=1).to_numpy(), 1.0,
                               atol=1e-8)
    assert (out["std"]["mean"] > 0).all()
    # technology IRF on output positive across the prior
    assert out["irf"].loc[("epsilon_A", "Y", 0), "q0.05"] > 0


def test_historical_shock_decomposition(configured):
    from geconpy_tpu.stats.posterior import historical_shock_decomposition

    data, _ = configured.data_from_prior(jax.random.PRNGKey(5), periods=60)
    res = _fake_posterior(configured, n=4)
    dec = historical_shock_decomposition(configured, res, np.asarray(data),
                                         max_draws=None)
    assert dec.index.names == ["time", "variable"]
    shocks = [c for c in dec.columns if c not in ("initial", "smoothed")]
    assert shocks == ["epsilon_A"]
    # exact additivity: contributions + initial == smoothed
    total = dec[shocks].sum(axis=1) + dec["initial"]
    np.testing.assert_allclose(total.values, dec["smoothed"].values,
                               atol=1e-8)
    # the technology shock drives most of the smoothed output variation
    y_dec = dec.xs("Y", level="variable")
    var_shock = np.var(y_dec["epsilon_A"].values)
    var_init = np.var(y_dec["initial"].values)
    assert var_shock > var_init


def test_posterior_predictive_bands(model):
    """Posterior predictive simulation: bands cover the observables'
    stationary scale and the frame is well-formed."""
    from geconpy_tpu.stats.posterior import posterior_predictive

    ss = DSGEStateSpace(model)
    ss.configure(observed_states=["Y", "C"], measurement_error=["Y", "C"])
    post = _fake_posterior(ss)
    df = posterior_predictive(ss, post, jax.random.PRNGKey(0), periods=60,
                              max_draws=8)
    assert set(df.index.get_level_values("variable")) == {"Y", "C"}
    assert len(df) == 2 * 60
    assert np.isfinite(df.to_numpy()).all()
    # quantiles ordered
    assert (df["q0.05"] <= df["q0.5"]).all()
    assert (df["q0.5"] <= df["q0.95"]).all()
    # simulated spread is nonzero (real shock realizations)
    assert df["q0.95"].std() > 0


def test_posterior_girfs_bands(model):
    """Second-order GIRF posterior bands: finite, labeled, nonzero response
    of Y to a technology shock, decaying toward zero."""
    from geconpy_tpu.stats.posterior import posterior_girfs

    ss = DSGEStateSpace(model)
    ss.configure(observed_states=["Y", "C"], measurement_error=["Y", "C"])
    post = _fake_posterior(ss)
    df = posterior_girfs(ss, post, "epsilon_A", jax.random.PRNGKey(1),
                         periods=20, n_mc=32, max_draws=4)
    assert np.isfinite(df.to_numpy()).all()
    y_path = df.loc["Y"]["mean"].to_numpy()
    assert abs(y_path[0]) > 1e-6            # impact response
    assert abs(y_path[-1]) < abs(y_path[:3]).max()  # mean reversion
