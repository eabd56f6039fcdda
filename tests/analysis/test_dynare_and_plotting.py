import pathlib

import matplotlib

matplotlib.use("Agg")

import jax
import numpy as np
import pytest

from geconpy_tpu import model_from_gcn, simulate, impulse_response_function
from geconpy_tpu.analysis.dynare import make_mod_file
from geconpy_tpu.analysis import plotting
from geconpy_tpu.dists import Beta, Gamma
from geconpy_tpu.stats.covariance import autocovariance_matrix, stationary_covariance_matrix

DATA = pathlib.Path(__file__).parents[2] / "geconpy_tpu" / "data"


@pytest.fixture(scope="module")
def rbc():
    return model_from_gcn(str(DATA / "rbc.gcn"))


@pytest.fixture(scope="module")
def solution(rbc):
    return rbc.solve_model(verbose=False)


def test_make_mod_file(rbc):
    mod = make_mod_file(rbc, shock_std=0.01)
    for block in ["var ", "varexo ", "parameters ", "model;",
                  "steady_state_model;", "shocks;", "stoch_simul"]:
        assert block in mod, block
    # dynare timing syntax present
    assert "K(-1)" in mod
    assert "epsilon_A" in mod
    assert "alpha = 0.35" in mod
    # every equation terminated
    model_body = mod.split("model;")[1].split("end;")[0]
    eqs = [l for l in model_body.splitlines() if l.strip()]
    assert all(l.strip().endswith(";") for l in eqs)
    assert len(eqs) == len(rbc.primitives.equations)


def test_plot_simulation_and_irf(rbc, solution):
    sim = simulate(solution, periods=30, n_simulations=10)
    fig = plotting.plot_simulation(sim, variables=["Y", "C", "K"])
    assert len(fig.axes) >= 3

    irf = impulse_response_function(solution, periods=20)
    fig = plotting.plot_irf(irf, variables=["Y", "C"])
    assert fig is not None


def test_plot_eigenvalues(rbc):
    bk = rbc.check_bk_condition(verbose=False)
    ax = plotting.plot_eigenvalues(bk)
    assert ax is not None


def test_plot_covariance_and_acf(solution):
    cov = stationary_covariance_matrix(solution, shock_std=0.01)
    ax = plotting.plot_covariance_matrix(cov)
    assert ax is not None
    acf = autocovariance_matrix(solution, n_lags=4, shock_std=0.01)
    fig = plotting.plot_acf(acf, variables=["Y", "A"])
    assert fig is not None


def test_plot_priors_and_corner():
    priors = {"rho": Beta(28.5, 1.5), "sig": Gamma(4.0, 2.0)}
    fig = plotting.plot_priors(priors)
    assert fig is not None

    rng = np.random.default_rng(0)
    samples = rng.normal(size=(2, 200, 2))
    fig = plotting.plot_corner(samples, names=["a", "b"])
    assert fig is not None


def test_plot_solvability(rbc):
    from geconpy_tpu.stats.perturbation_diagnostics import solvability_check

    rng = np.random.default_rng(0)
    draws = {"alpha": np.clip(0.35 + 0.1 * rng.normal(size=12), 0.05, 0.95)}
    df = solvability_check(rbc, draws)
    fig = plotting.plot_solvability(df)
    assert fig is not None
    ax = plotting.plot_solvability_summary(df)
    assert ax is not None


def test_plot_kalman(solution):
    from geconpy_tpu.ops.kalman import kalman_filter

    T = solution.T.to_numpy()
    R = solution.R.to_numpy()
    Q = 0.0001 * np.eye(R.shape[1])
    Z = np.eye(T.shape[0])[:2]
    H = 0.0001 * np.eye(2)
    y = np.asarray(simulate(solution, periods=50, n_simulations=1,
                            shock_std=0.01)).reshape(50, -1)[:, :2]
    res = kalman_filter(y, T, R, Q, Z, H)
    fig = plotting.plot_kalman_filter(res, state_names=solution.T.columns)
    assert fig is not None


def test_plot_irf_posterior_bands_and_grouping(solution):
    """Quantile-frame IRFs render HDI bands; group_by='shock' flips panels."""
    import pandas as pd

    periods, variables = 15, ["Y", "C"]
    shocks = ["epsilon_A"]
    index = pd.MultiIndex.from_product(
        [shocks, variables, range(periods)],
        names=["shock", "variable", "time"])
    rng = np.random.default_rng(1)
    base = rng.normal(size=len(index))
    post = pd.DataFrame(index=index)
    post["mean"] = base
    post["q0.05"] = base - 0.2
    post["q0.5"] = base
    post["q0.95"] = base + 0.2
    fig = plotting.plot_irf(post, ci=0.9)
    # each visible panel has one line + one band polygon
    visible = [ax for ax in fig.axes if ax.get_visible()]
    assert len(visible) == 2
    assert all(len(ax.lines) >= 1 and len(ax.collections) >= 1
               for ax in visible)

    fig2 = plotting.plot_irf(post, group_by="shock")
    vis2 = [ax for ax in fig2.axes if ax.get_visible()]
    assert len(vis2) == 1 and len(vis2[0].lines) >= 2  # line per variable

    # cumulative point IRF still works
    irf = impulse_response_function(solution, periods=10)
    fig3 = plotting.plot_irf(irf, variables=["Y"], cumulative=True)
    assert fig3 is not None


def test_plot_acf_posterior_whiskers():
    import pandas as pd

    lags, variables = range(5), ["Y", "C"]
    index = pd.MultiIndex.from_product([lags, variables],
                                       names=["lag", "variable"])
    rng = np.random.default_rng(2)
    vals = rng.uniform(-0.5, 0.9, size=len(index))
    post = pd.DataFrame(index=index)
    post["mean"] = vals
    post["q0.05"] = vals - 0.1
    post["q0.5"] = vals
    post["q0.95"] = vals + 0.1
    fig = plotting.plot_acf(post, n_obs=100)
    visible = [ax for ax in fig.axes if ax.get_visible()]
    assert len(visible) == 2
    # bars + errorbar containers + significance span
    assert all(len(ax.patches) >= 5 for ax in visible)
    assert all(len(ax.containers) >= 2 for ax in visible)


def test_plot_kalman_multi_kind_with_data(solution):
    from geconpy_tpu.ops.kalman import kalman_filter, kalman_smoother

    T = solution.T.to_numpy()
    R = solution.R.to_numpy()
    Q = 0.0001 * np.eye(R.shape[1])
    Z = np.eye(T.shape[0])[:2]
    H = 0.0001 * np.eye(2)
    y = np.asarray(simulate(solution, periods=40, n_simulations=1,
                            shock_std=0.01)).reshape(40, -1)[:, :2]
    res = kalman_filter(y, T, R, Q, Z, H)
    fig = plotting.plot_kalman_filter(
        res, data=y, observed_idx=[0, 1], kind=("filtered", "predicted"),
        state_names=solution.T.columns)
    visible = [ax for ax in fig.axes if ax.get_visible()]
    # two mean lines per panel; observed scatter on the first two panels
    assert all(len(ax.lines) >= 2 for ax in visible)
    assert len(visible[0].collections) >= 3  # 2 bands + scatter


def test_plot_posterior_overlays():
    from dataclasses import dataclass

    @dataclass
    class FakeResult:
        samples: np.ndarray
        param_names: list

    rng = np.random.default_rng(3)
    res = FakeResult(samples=rng.normal(0.5, 0.05, size=(2, 300, 2)),
                     param_names=["rho", "sig"])
    priors = {"rho": Beta(28.5, 1.5), "sig": Gamma(4.0, 2.0)}
    fig = plotting.plot_posterior_with_prior(
        res, priors, true_values={"rho": 0.5}, per_chain=True)
    visible = [ax for ax in fig.axes if ax.get_visible()]
    assert len(visible) == 2
    # prior curve + true-value line + posterior-mean line on first panel
    assert len(visible[0].lines) >= 3

    fig2 = plotting.plot_corner(res.samples, names=res.param_names,
                                truths={"rho": 0.5, "sig": 0.5})
    assert fig2 is not None


def test_plot_simulation_spaghetti(solution):
    sim = simulate(solution, periods=20, n_simulations=8)
    fig = plotting.plot_simulation(sim, variables=["Y"], n_paths=5)
    visible = [ax for ax in fig.axes if ax.get_visible()]
    # 5 spaghetti + 1 mean line
    assert len(visible[0].lines) >= 6


def test_plot_shock_decomposition_smoke():
    import matplotlib
    matplotlib.use("Agg")
    import numpy as np
    import pandas as pd

    from geconpy_tpu.analysis.plotting import plot_shock_decomposition

    t = 16
    idx = pd.MultiIndex.from_product([range(t), ["Y", "C", "K"]],
                                     names=["time", "variable"])
    rng = np.random.default_rng(1)
    df = pd.DataFrame({"eps_A": rng.normal(size=3 * t),
                       "eps_m": rng.normal(size=3 * t),
                       "initial": 0.1 * rng.normal(size=3 * t)}, index=idx)
    df["smoothed"] = df[["eps_A", "eps_m", "initial"]].sum(axis=1)

    fig = plot_shock_decomposition(df)
    import matplotlib.pyplot as plt

    visible = [a for a in fig.axes if a.get_visible()]
    assert len(visible) == 3
    ax0 = visible[0]
    # 3 stacked series x (positive + negative) bar containers + overlay line
    assert len(ax0.containers) == 6
    assert len(ax0.lines) >= 1
    assert ax0.get_legend() is not None
    plt.close(fig)

    fig2 = plot_shock_decomposition(df, variables=["Y"])
    assert len([a for a in fig2.axes if a.get_visible()]) == 1
    plt.close(fig2)


@pytest.mark.parametrize(
    "kwargs, n_axes",
    [({}, 3),
     ({"variables": ["Y", "C"]}, 2),
     ({"fig_kwargs": {"figsize": (8, 6), "dpi": 80}, "color": "tab:green"}, 3)],
    ids=["defaults", "subset", "fig_and_line_kwargs"],
)
def test_plot_timeseries(kwargs, n_axes):
    """Mirror of the reference's plot_timeseries cases
    (tests/test_plotting.py:302-312)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import pandas as pd

    rng = np.random.default_rng(0)
    idx = pd.date_range("1980-01-01", periods=80, freq="QS")
    df = pd.DataFrame(rng.normal(size=(80, 3)), index=idx,
                      columns=["Y", "C", "K"])
    fig = plotting.plot_timeseries(df, **kwargs)
    assert len([a for a in fig.axes if a.get_visible()]) == n_axes
    if "color" in kwargs:
        ax0 = [a for a in fig.axes if a.get_visible()][0]
        import matplotlib.colors as mcolors

        assert mcolors.to_hex(ax0.lines[0].get_color()) == \
            mcolors.to_hex("tab:green")
    plt.close(fig)

    fig2 = plotting.plot_timeseries(df.reset_index(drop=True), **kwargs)
    assert len([a for a in fig2.axes if a.get_visible()]) == n_axes
    plt.close(fig2)


def test_plot_forecast_smoke():
    import matplotlib
    matplotlib.use("Agg")
    import numpy as np
    import pandas as pd

    from geconpy_tpu.analysis.plotting import plot_forecast

    H = 8
    idx = pd.MultiIndex.from_product([["Y", "C"], range(1, H + 1)],
                                     names=["variable", "time"])
    rng = np.random.default_rng(2)
    base = rng.normal(size=2 * H).cumsum() * 0.01 + 1.0
    df = pd.DataFrame({"mean": base,
                       "q0.05": base - 0.05, "q0.16": base - 0.02,
                       "q0.84": base + 0.02, "q0.95": base + 0.05},
                      index=idx)
    data = 1.0 + 0.01 * rng.normal(size=(60, 2))

    fig = plot_forecast(df, data=data, observed_names=["Y", "C"], history=30)
    visible = [a for a in fig.axes if a.get_visible()]
    assert len(visible) == 2
    ax0 = visible[0]
    # two nested bands + history line + mean line
    assert len(ax0.collections) == 2
    assert len(ax0.lines) >= 2
