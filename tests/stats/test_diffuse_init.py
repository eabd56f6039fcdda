"""Approximate-diffuse Kalman initialization (configure(p0_init="diffuse")).

A unit-root (random-walk) technology model is estimable only under the
diffuse init: the stationary path gates it to -inf (spectral radius 1),
the Lyapunov P0 does not exist.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geconpy_tpu import model_from_gcn
from geconpy_tpu.stats.statespace import DSGEStateSpace

UNIT_ROOT_GCN = """
options { linear = TRUE; };
block STEADY_STATE {
    identities { a[ss] = 0; y[ss] = 0; };
};
block UR {
    identities {
        a[] = a[-1] + epsilon_a[];
        y[] = a[] + g * y[-1] - g * a[-1];
    };
    shocks { epsilon_a[] ~ Normal(mu=0, sigma=sigma_a); };
    calibration {
        g = 0.5;
        sigma_a ~ InverseGamma(alpha=5, beta=0.02) = 0.01;
    };
};
"""


@pytest.fixture(scope="module")
def model():
    return model_from_gcn(UNIT_ROOT_GCN, verbose=False)


def _simulate(seed, T, sigma=0.01, g=0.5):
    rng = np.random.default_rng(seed)
    eps = sigma * rng.normal(size=T)
    a = np.cumsum(eps)
    y = np.zeros(T)
    for t in range(T):
        y[t] = a[t] + (g * (y[t - 1] - a[t - 1]) if t else 0.0)
    return y[:, None]


def test_unit_root_needs_diffuse(model):
    data = _simulate(0, 200)

    ss_diff = DSGEStateSpace(model)
    ss_diff.configure(observed_states=["y"], p0_init="diffuse",
                      diffuse_presample=2)
    lp = ss_diff.build_logpost(np.asarray(data))
    u0 = ss_diff.initial_position()
    val, grad = jax.value_and_grad(lp)(jnp.asarray(u0))
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(grad)).all()

    ss_stat = DSGEStateSpace(model)
    ss_stat.configure(observed_states=["y"])
    lp_stat = ss_stat.build_logpost(np.asarray(data))
    assert float(lp_stat(jnp.asarray(u0))) == -np.inf


def test_diffuse_recovers_sigma(model):
    true_sigma = 0.02
    data = _simulate(1, 400, sigma=true_sigma)
    ss = DSGEStateSpace(model)
    ss.configure(observed_states=["y"], p0_init="diffuse",
                 diffuse_presample=2)
    lp = ss.build_logpost(np.asarray(data))

    # profile the 1-d likelihood over sigma_a
    sigmas = np.linspace(0.005, 0.05, 40)
    vals = [float(lp(jnp.asarray(ss.unconstrain(
        np.asarray([s]))))) for s in sigmas]
    best = sigmas[int(np.argmax(vals))]
    assert abs(best - true_sigma) < 0.005


def test_diffuse_matches_stationary_when_stationary(model):
    """On a *stationary* AR version, diffuse + presample converges to the
    stationary-init likelihood shape (same argmax)."""
    data = _simulate(2, 300)

    ss = DSGEStateSpace(model)
    with pytest.raises(ValueError, match="requires filter_type"):
        ss.configure(observed_states=["y"], p0_init="diffuse",
                     filter_type="stationary")
    with pytest.raises(ValueError, match="p0_init must be"):
        ss.configure(observed_states=["y"], p0_init="nope")

    # parallel filter path also accepts diffuse
    ss2 = DSGEStateSpace(model)
    ss2.configure(observed_states=["y"], p0_init="diffuse",
                  filter_type="parallel", diffuse_presample=2)
    lp2 = ss2.build_logpost(np.asarray(data))
    ss3 = DSGEStateSpace(model)
    ss3.configure(observed_states=["y"], p0_init="diffuse",
                  diffuse_presample=2)
    lp3 = ss3.build_logpost(np.asarray(data))
    u = ss2.initial_position()
    np.testing.assert_allclose(float(lp2(jnp.asarray(u))),
                               float(lp3(jnp.asarray(u))), rtol=1e-8)
