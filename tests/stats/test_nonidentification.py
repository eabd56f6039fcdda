"""Label-switching non-identification in nk_3eq with only (x, pi) observed.

Substituting the Taylor rule into the IS curve shows the likelihood depends
on the two AR(1) disturbances only through rn_t - v_t, so the
(rho_rn, sigma_rn) and (rho_v, sigma_v) blocks are exactly exchangeable:
the posterior is bimodal and chain-convergence diagnostics CANNOT settle.
This test pins the symmetry at the likelihood level (fast), documenting why
convergence fixtures must observe the policy rate (or estimate one block).
"""

import jax
import numpy as np

from geconpy_tpu import get_example_gcn, model_from_gcn
from geconpy_tpu.stats.statespace import DSGEStateSpace


def test_shock_blocks_exchangeable_without_rate():
    model = model_from_gcn(get_example_gcn("nk_3eq"), verbose=False)
    ss = DSGEStateSpace(model)
    ss.configure(observed_states=["x", "pi"],
                 constant_params=["beta", "kappa", "sigma", "phi_pi",
                                  "phi_x"])
    data, draw = ss.data_from_prior(jax.random.PRNGKey(3), periods=120)
    loglik = lambda d: float(  # noqa: E731
        jax.jit(ss.build_logpost_extras(np.asarray(data)))(
            ss.unconstrain(d)).loglik)

    point = {"rho_rn": 0.8, "rho_v": 0.3,
             "sigma_rn": 0.004, "sigma_v": 0.002}
    swapped = {"rho_rn": 0.3, "rho_v": 0.8,
               "sigma_rn": 0.002, "sigma_v": 0.004}
    ll_a, ll_b = loglik(point), loglik(swapped)
    assert np.isfinite(ll_a)
    np.testing.assert_allclose(ll_a, ll_b, rtol=1e-9)


def test_observing_the_rate_breaks_the_symmetry():
    model = model_from_gcn(get_example_gcn("nk_3eq"), verbose=False)
    ss = DSGEStateSpace(model)
    ss.configure(observed_states=["x", "pi", "i"],
                 measurement_error={"i": 0.001},
                 constant_params=["beta", "kappa", "sigma", "phi_pi",
                                  "phi_x"])
    data, _ = ss.data_from_prior(jax.random.PRNGKey(3), periods=120)
    loglik = lambda d: float(  # noqa: E731
        jax.jit(ss.build_logpost_extras(np.asarray(data)))(
            ss.unconstrain(d)).loglik)

    point = {"rho_rn": 0.8, "rho_v": 0.3,
             "sigma_rn": 0.004, "sigma_v": 0.002}
    swapped = {"rho_rn": 0.3, "rho_v": 0.8,
               "sigma_rn": 0.002, "sigma_v": 0.004}
    ll_a, ll_b = loglik(point), loglik(swapped)
    assert np.isfinite(ll_a) and np.isfinite(ll_b)
    assert abs(ll_a - ll_b) > 1.0, (ll_a, ll_b)
