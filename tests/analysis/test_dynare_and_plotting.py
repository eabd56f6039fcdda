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
