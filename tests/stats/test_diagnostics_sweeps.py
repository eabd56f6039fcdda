import pathlib

import numpy as np
import pytest

from geconpy_tpu import model_from_gcn
from geconpy_tpu.dists import Beta, Gamma, Normal
from geconpy_tpu.stats.perturbation_diagnostics import (
    eigenvalue_sensitivity,
    prior_solvability_check,
    solvability_check,
    summarize_perturbation_solution,
)
from geconpy_tpu.stats.sampling import (
    bounds_from_priors,
    sample_from_priors,
    sample_from_priors_qmc,
    sample_uniform_from_priors,
)

DATA = pathlib.Path(__file__).parents[2] / "geconpy_tpu" / "data"


@pytest.fixture(scope="module")
def rbc():
    return model_from_gcn(str(DATA / "rbc.gcn"))


@pytest.fixture(scope="module")
def rbc_est():
    return model_from_gcn(str(DATA / "rbc_estimation.gcn"))


def test_sampling_priors():
    priors = {"rho": Beta(28.5, 1.5), "sig": Gamma(4.0, 2.0)}
    draws = sample_from_priors(priors, 2000, seed=0)
    assert abs(draws["rho"].mean() - 0.95) < 0.01
    assert abs(draws["sig"].mean() - 2.0) < 0.1

    bounds = bounds_from_priors(priors)
    assert bounds["rho"][0] < 0.95 < bounds["rho"][1]

    lhs = sample_uniform_from_priors(priors, 64, method="lhs", seed=1)
    assert lhs["rho"].shape == (64,)
    assert (lhs["rho"] >= bounds["rho"][0] - 1e-12).all()

    qmc = sample_from_priors_qmc(priors, 64, method="halton", seed=1)
    assert abs(qmc["rho"].mean() - 0.95) < 0.02


def test_solvability_check(rbc):
    rng = np.random.default_rng(0)
    draws = {
        "alpha": np.clip(0.35 + 0.05 * rng.normal(size=16), 0.1, 0.9),
        "beta": np.concatenate([np.full(15, 0.99), [1.05]]),  # last invalid
    }
    df = solvability_check(rbc, draws)
    assert len(df) == 16
    assert df["success"][:15].all()
    assert not df["success"].iloc[15]
    assert df["failure_stage"].iloc[15] == "steady_state"
    assert (df["failure_stage"][:15] == "none").all()


def test_prior_solvability_check(rbc_est):
    df = prior_solvability_check(rbc_est, n_samples=32, how="qmc", seed=0)
    assert len(df) == 32
    # RBC priors are centered on a solvable region
    assert df["success"].mean() > 0.9
    assert {"alpha", "rho_A", "sigma_C"} <= set(df.columns)


def test_summarize_perturbation_solution(rbc):
    sol = rbc.solve_model()
    table = summarize_perturbation_solution(sol)
    assert "A" in table.attrs["states"] and "K" in table.attrs["states"]
    # P block persistence of technology
    np.testing.assert_allclose(table.loc[("P", "A"), "A"], 0.95, atol=1e-8)


def test_spectral_radius_sensitivity(rbc):
    from geconpy_tpu.stats import spectral_radius_sensitivity

    df = spectral_radius_sensitivity(rbc)
    assert np.isfinite(df["d_rho_d_param"]).all()
    # persistence parameter rho_A raises the spectral radius
    assert df.loc["rho_A", "d_rho_d_param"] > 0


def test_eigenvalue_sensitivity_table(rbc):
    """Per-eigenvalue d|λ|/dθ table matches central finite differences
    (reference role: perturbation_diagnostics.py:244)."""
    df = eigenvalue_sensitivity(rbc)
    mods = np.asarray(df.attrs["modulus"])
    assert np.all(np.isfinite(df.to_numpy()))

    # the AR(1) technology eigenvalue |λ| = rho_A must have d|λ|/d rho_A = 1
    tech = int(np.argmin(np.abs(mods - 0.95)))
    np.testing.assert_allclose(
        df.loc[(tech, "modulus"), "rho_A"], 1.0, atol=1e-5)

    # finite-difference check wrt beta on an eigenvalue-ORDER-invariant
    # scalar (individual indices can swap between the θ±eps calls when
    # moduli cross): sum of finite-root moduli
    # exclude regularized infinite roots AND near-zero roots (|λ| is not
    # differentiable at 0, so FD there is noise)
    finite_roots = (mods < 1e6) & (mods > 1e-4)
    eps = 1e-4
    hi = eigenvalue_sensitivity(rbc, beta=0.99 + eps)
    lo = eigenvalue_sensitivity(rbc, beta=0.99 - eps)
    fd = (np.asarray(hi.attrs["modulus"])[finite_roots].sum() -
          np.asarray(lo.attrs["modulus"])[finite_roots].sum()) / (2 * eps)
    got = df.xs("modulus", level="part")["beta"].to_numpy()[finite_roots].sum()
    np.testing.assert_allclose(got, fd, rtol=1e-4)
