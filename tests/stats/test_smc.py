"""Likelihood-tempered SMC sampler (stats/smc.py).

Same identified 2-parameter rbc_estimation target the Pallas-filter batched
loglik is validated on: SMC must reach phi = 1, concentrate on the
data-generating point, and produce a marginal-likelihood estimate agreeing
with the Laplace approximation.
"""

import jax
import numpy as np
import pytest

from geconpy_tpu import get_example_gcn, model_from_gcn
from geconpy_tpu.stats.smc import fit_smc
from geconpy_tpu.stats.statespace import DSGEStateSpace


@pytest.fixture(scope="module")
def setup():
    model = model_from_gcn(get_example_gcn("rbc_estimation"), verbose=False)
    ss = DSGEStateSpace(model)
    ss.configure(observed_states=["Y"],
                 constant_params=["alpha", "sigma_C"],
                 filter_type="steady_state", kalman_settle=32)
    data, draw = ss.data_from_prior(
        jax.random.PRNGKey(11), periods=150,
        params={"rho_A": 0.9, "sigma_A": 0.012})
    return ss, np.asarray(data), draw


def test_smc_posterior_and_evidence(setup):
    ss, data, truth = setup
    res = fit_smc(ss, data, n_particles=384, n_mh=2, seed=0,
                  interpret=True)
    assert res.phi_schedule[-1] == pytest.approx(1.0)
    assert res.samples.shape == (384, 2)
    summ = res.summary()

    # posterior concentrates on the generating point
    for name, val in [("rho_A", truth["rho_A"]),
                      ("sigma_A", truth["sigma_A"])]:
        lo = float(np.quantile(res.samples[:, res.param_names.index(name)],
                               0.005))
        hi = float(np.quantile(res.samples[:, res.param_names.index(name)],
                               0.995))
        assert lo <= float(val) <= hi, (name, lo, float(val), hi)
    assert float(summ.loc["rho_A", "sd"]) < 0.1

    # mutation keeps moving and the schedule is adaptive (several stages)
    assert len(res.phi_schedule) >= 3
    assert (res.accept_rates > 0.05).all()

    # evidence agrees with the Laplace approximation (tight posterior, so
    # the Gaussian approximation is good; a few nats of slack)
    from geconpy_tpu.stats.model_comparison import marginal_likelihood

    ml = marginal_likelihood(ss, data, method="laplace")
    assert np.isfinite(res.log_evidence)
    assert abs(res.log_evidence - float(ml)) < 5.0, \
        (res.log_evidence, float(ml))


def test_smc_reproducible(setup):
    ss, data, _ = setup
    a = fit_smc(ss, data, n_particles=128, n_mh=1, seed=7, interpret=True)
    b = fit_smc(ss, data, n_particles=128, n_mh=1, seed=7, interpret=True)
    np.testing.assert_allclose(a.samples, b.samples)
    assert a.log_evidence == b.log_evidence


def test_smc_mesh_sharded_matches(setup):
    """Sharding the particle cloud over the 8-device virtual mesh leaves
    the result unchanged (same seed, same draws)."""
    ss, data, _ = setup
    from geconpy_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    assert mesh.size == 8
    a = fit_smc(ss, data, n_particles=128, n_mh=1, seed=5, interpret=True)
    b = fit_smc(ss, data, n_particles=128, n_mh=1, seed=5, interpret=True,
                mesh=mesh)
    np.testing.assert_allclose(a.samples, b.samples, rtol=1e-8)
    np.testing.assert_allclose(a.log_evidence, b.log_evidence, rtol=1e-8)

    with pytest.raises(ValueError, match="divisible"):
        fit_smc(ss, data, n_particles=100, mesh=mesh, interpret=True)
