"""Out-of-sample forecasting (stats/forecast.py).

Uses a tiny fitted posterior on the rbc_estimation model so the per-draw
machinery (solution fn + Kalman filter + horizon scans) is the real path.
The conditional-forecast identities are exact, so tolerances are tight.
"""

import jax
import numpy as np
import pytest

from geconpy_tpu import get_example_gcn, model_from_gcn
from geconpy_tpu.stats.estimation import fit
from geconpy_tpu.stats.forecast import conditional_forecast, posterior_forecast
from geconpy_tpu.stats.statespace import DSGEStateSpace

HORIZON = 8


@pytest.fixture(scope="module")
def fitted():
    model = model_from_gcn(get_example_gcn("rbc_estimation"), verbose=False)
    ss = DSGEStateSpace(model)
    ss.configure(observed_states=["Y", "C"],
                 filter_type="stationary", kalman_settle=48,
                 measurement_error={"Y": 0.01, "C": 0.01})
    data, _ = ss.data_from_prior(
        jax.random.PRNGKey(3), periods=120,
        params={"alpha": 0.35, "sigma_C": 1.5, "rho_A": 0.9,
                "sigma_A": 0.012})
    data = np.asarray(data)
    res = fit(ss, data, num_chains=2, num_warmup=100, num_samples=60,
              seed=4, max_depth=6, pooled_adaptation=True)
    return ss, data, res


def test_posterior_forecast_bands(fitted):
    ss, data, res = fitted
    fc = posterior_forecast(ss, res, data, horizon=HORIZON, max_draws=40,
                            n_paths_per_draw=3, seed=1)
    assert set(fc.index.get_level_values("variable")) == {"Y", "C"}
    assert list(fc.index.get_level_values("time").unique()) == \
        list(range(1, HORIZON + 1))
    assert np.isfinite(fc.to_numpy()).all()
    # quantile monotonicity and non-degenerate bands
    assert (fc["q0.05"] <= fc["q0.5"] + 1e-12).all()
    assert (fc["q0.5"] <= fc["q0.95"] + 1e-12).all()
    assert (fc["q0.95"] - fc["q0.05"] > 0).all()
    # fan should start near the end-of-sample level, not at zero
    y_end = data[-1, 0]
    med1 = float(fc.loc[("Y", 1), "q0.5"])
    assert abs(med1 - y_end) < 0.2 * max(1.0, abs(y_end))


def test_conditional_forecast_hits_targets(fitted):
    ss, data, res = fitted
    # pin Y two periods, leave a NaN gap, pin one more
    path = np.array([1.01, 1.015, np.nan, 1.02]) * data[:, 0].mean()
    fc, shocks = conditional_forecast(
        ss, res, data, {"Y": path}, horizon=HORIZON, max_draws=30)
    for t, v in [(1, path[0]), (2, path[1]), (4, path[3])]:
        got = fc.loc[("Y", t)]
        # every draw hits the target exactly -> zero-width bands at targets
        np.testing.assert_allclose(got["mean"], v, rtol=1e-6)
        np.testing.assert_allclose(got["q0.05"], got["q0.95"], rtol=1e-6)
    # free entries keep posterior spread
    free = fc.loc[("Y", 3)]
    assert free["q0.95"] - free["q0.05"] > 1e-8
    assert np.isfinite(shocks.to_numpy()).all()


def test_conditional_forecast_zero_gap_zero_shocks(fitted):
    """Conditioning on the baseline path itself implies (near-)zero
    shocks: compute the unconditional mean path first, then condition on
    it."""
    ss, data, res = fitted
    # deterministic baseline per draw differs; use a single draw
    res_single = res
    u = res.unconstrained.reshape(-1, res.unconstrained.shape[-1])[:1]

    import jax.numpy as jnp

    from geconpy_tpu.ops.kalman import kalman_filter

    solve_draw = ss.build_solution_fn(full_state=True)
    sol = jax.jit(solve_draw)(jnp.asarray(u[0]))
    filt = kalman_filter(jnp.asarray(data), sol["T_aug"], sol["R_aug"],
                         sol["Q"], sol["Z"], sol["H"], d=sol["d"])
    x = np.asarray(filt.filtered_mean[-1])
    Tm, Z, d = np.asarray(sol["T_aug"]), np.asarray(sol["Z"]), \
        np.asarray(sol["d"])
    base = []
    for _ in range(HORIZON):
        x = Tm @ x
        base.append(Z @ x + d)
    base = np.asarray(base)

    class _OneDraw:
        unconstrained = u[None, :, :]

    fc, shocks = conditional_forecast(
        ss, _OneDraw, data, {"Y": base[:3, 0]}, horizon=HORIZON,
        max_draws=None)
    np.testing.assert_allclose(shocks["mean"].to_numpy(), 0.0, atol=1e-7)
    np.testing.assert_allclose(
        fc["mean"].to_numpy().reshape(2, HORIZON),
        base.T, atol=1e-7)
