import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st

from geconpy_tpu.dists import (
    Beta,
    CompositeDistribution,
    Gamma,
    HalfNormal,
    InverseGamma,
    LogNormal,
    Normal,
    StudentT,
    Truncated,
    Uniform,
    ast_to_distribution,
    maxent,
)
from geconpy_tpu.lang.parser import parse_gcn


CASES = [
    (Normal(mu=1.0, sigma=2.0), st.norm(1.0, 2.0)),
    (HalfNormal(sigma=1.5), st.halfnorm(scale=1.5)),
    (Beta(alpha=2.0, beta=5.0), st.beta(2.0, 5.0)),
    (Gamma(alpha=3.0, beta=2.0), st.gamma(3.0, scale=0.5)),
    (InverseGamma(alpha=4.0, beta=2.0), st.invgamma(4.0, scale=2.0)),
    (Uniform(lower_=-1.0, upper_=3.0), st.uniform(-1.0, 4.0)),
    (LogNormal(mu=0.1, sigma=0.4), st.lognorm(0.4, scale=np.exp(0.1))),
    (StudentT(nu=5.0, mu=0.5, sigma=1.2), st.t(5.0, loc=0.5, scale=1.2)),
]


@pytest.mark.parametrize("dist,ref", CASES, ids=lambda c: type(c).__name__)
def test_logpdf_matches_scipy(dist, ref):
    lo, hi = dist.support()
    xs = np.linspace(max(lo, -10) + 0.05, min(hi, 10) - 0.05, 23)
    np.testing.assert_allclose(
        np.asarray(dist.logpdf(jnp.asarray(xs))), ref.logpdf(xs),
        rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("dist,ref", CASES, ids=lambda c: type(c).__name__)
def test_sampling_moments(dist, ref):
    key = jax.random.PRNGKey(0)
    draws = np.asarray(dist.sample(key, (200_000,)))
    np.testing.assert_allclose(draws.mean(), ref.mean(), atol=4 * ref.std() / 400)


def test_unconstrained_roundtrip():
    for dist in [Beta(2, 5), Gamma(3, 2), Normal(0, 1), Uniform(-1.0, 3.0)]:
        x = jnp.asarray(dist.mean())
        u = dist.to_unconstrained(x)
        x2, logjac = dist.from_unconstrained(u)
        np.testing.assert_allclose(float(x2), float(x), rtol=1e-8)
        assert np.isfinite(float(logjac))


def test_truncated():
    d = Truncated(Normal(0.0, 1.0), lower=0.5, upper=2.0)
    ref = st.truncnorm(0.5, 2.0)
    xs = np.linspace(0.55, 1.95, 11)
    np.testing.assert_allclose(np.asarray(d.logpdf(jnp.asarray(xs))),
                               ref.logpdf(xs), rtol=1e-8)
    # outside the support
    assert float(d.logpdf(jnp.asarray(0.0))) == -np.inf


def test_maxent_beta():
    d = maxent(Beta(), lower=0.95, upper=0.999, mass=0.99)
    mass = st.beta(d.alpha, d.beta).cdf(0.999) - st.beta(d.alpha, d.beta).cdf(0.95)
    assert abs(mass - 0.99) < 0.01
    assert 0.95 < d.mean() < 0.999


def test_maxent_gamma():
    d = maxent(Gamma(), lower=1.01, upper=10.0, mass=0.99)
    fr = st.gamma(d.alpha, scale=1.0 / d.beta)
    assert abs(fr.cdf(10.0) - fr.cdf(1.01) - 0.99) < 0.01


def _parse_dist(stmt: str):
    src = f"""
    block B
    {{
        identities {{ x[] = rho * x[-1] + eps[]; }};
        shocks {{ eps[]; }};
        calibration {{ {stmt} rho = 0.9; }};
    }};
    """
    model = parse_gcn(src)
    return model.blocks[0].get("calibration").distributions[0]


def test_ast_to_distribution():
    d = ast_to_distribution(_parse_dist("theta ~ Beta(alpha=2, beta=5) = 0.3;"))
    assert isinstance(d, Beta) and d.alpha == 2 and d.beta == 5

    d = ast_to_distribution(_parse_dist("theta ~ Gamma(mu=2, sigma=0.5) = 2;"))
    assert isinstance(d, Gamma)
    np.testing.assert_allclose(d.mean(), 2.0, rtol=1e-10)

    d = ast_to_distribution(
        _parse_dist("theta ~ maxent(Beta(), lower=0.8, upper=0.99, mass=0.95) = 0.9;"))
    assert isinstance(d, Beta)

    d = ast_to_distribution(
        _parse_dist("theta ~ Truncated(Normal(mu=0, sigma=1), lower=0) = 0.5;"))
    assert float(d.logpdf(jnp.asarray(-0.5))) == -np.inf


def test_composite_shock_distribution():
    src = """
    block B
    {
        identities { x[] = rho * x[-1] + eps[]; };
        shocks { eps[] ~ Normal(mu=0, sigma=sigma_eps); };
        calibration
        {
            rho = 0.9;
            sigma_eps ~ InverseGamma(alpha=3, beta=0.1) = 0.05;
        };
    };
    """
    model = parse_gcn(src)
    shock_ast = model.blocks[0].get("shocks").distributions[0]
    d = ast_to_distribution(shock_ast)
    assert isinstance(d, CompositeDistribution)
    assert d.sigma_param == "sigma_eps"
    concrete = d.concretize({"sigma_eps": 0.05})
    assert isinstance(concrete, Normal)
    assert concrete.sigma == 0.05


# ---- unconstrained transform round trips (the sampler's parameterization)

import jax


@pytest.mark.parametrize("dist,x", [
    (Normal(0.5, 2.0), 1.3),             # unbounded
    (Gamma(alpha=2.0, beta=0.5), 3.1),   # lower-bounded
    (Beta(2.0, 5.0), 0.27),              # doubly bounded
    (InverseGamma(alpha=3.0, beta=0.02), 0.011),
])
def test_unconstrained_roundtrip(dist, x):
    u = dist.to_unconstrained(jnp.asarray(x))
    x_back, logjac = dist.from_unconstrained(u)
    np.testing.assert_allclose(float(x_back), x, rtol=1e-10)
    assert np.isfinite(float(logjac))


@pytest.mark.parametrize("dist", [
    Normal(0.5, 2.0),
    Gamma(alpha=2.0, beta=0.5),
    Beta(2.0, 5.0),
])
def test_from_unconstrained_jacobian_is_exact(dist):
    """log|dx/du| returned by from_unconstrained must equal the autodiff
    derivative of the transform (it enters every log posterior)."""
    for u0 in (-1.2, 0.0, 0.7):
        u = jnp.asarray(u0)
        dxdu = jax.grad(lambda v: dist.from_unconstrained(v)[0])(u)
        _, logjac = dist.from_unconstrained(u)
        np.testing.assert_allclose(float(logjac), float(jnp.log(dxdu)),
                                   rtol=1e-8)


def test_partial_correlation_lkj_marginal():
    from geconpy_tpu.dists import PartialCorrelation

    d = PartialCorrelation.lkj_marginal(eta=2.0, dim=4, order=1)
    assert d.alpha == pytest.approx(2.0 + (4 - 2 - 1) / 2)
    # density integrates to one on (-1, 1)
    xs = np.linspace(-0.999, 0.999, 20_001)
    pdf = np.exp(np.asarray(jax.vmap(d.logpdf)(jnp.asarray(xs))))
    np.testing.assert_allclose(np.trapezoid(pdf, xs), 1.0, atol=1e-3)
    # symmetric around zero
    assert float(d.logpdf(jnp.asarray(0.3))) == pytest.approx(
        float(d.logpdf(jnp.asarray(-0.3))), rel=1e-12)
    # outside support -> -inf
    assert float(d.logpdf(jnp.asarray(1.5))) == -np.inf
    # sampling moments match the stated variance
    draws = np.asarray(d.sample(jax.random.PRNGKey(0), (50_000,)))
    np.testing.assert_allclose(draws.var(), d.variance(), rtol=0.05)


def test_lkj_marginal_d2_eta1_is_uniform():
    """Oracle: LKJ(1) in d=2 is the uniform prior on the correlation, so the
    vine marginal must be Beta(1, 1) scaled — constant density 1/2."""
    from geconpy_tpu.dists import PartialCorrelation

    d = PartialCorrelation.lkj_marginal(eta=1.0, dim=2, order=0)
    assert d.alpha == pytest.approx(1.0)
    for x in (-0.9, -0.3, 0.0, 0.5, 0.99):
        assert float(d.logpdf(jnp.asarray(x))) == pytest.approx(
            np.log(0.5), abs=1e-10)
    # classic element-marginal check: order-0 in dim d has a = eta+(d-2)/2
    d3 = PartialCorrelation.lkj_marginal(eta=1.0, dim=3, order=0)
    assert d3.alpha == pytest.approx(1.5)


def test_lkj_vine_marginals_reproduce_lkj_density():
    """Oracle: in d=3 the product of the vine marginals times the
    change-of-variables Jacobian must be proportional to the LKJ density
    det(R)^(eta-1) in the (r21, r31, r32) coordinates.

    Vine coordinates: r21, r31 are conditioning-set-size-0 partial
    correlations, p = rho_{32|1} has conditioning-set size 1, and
    r32 = p*sqrt((1-r21^2)(1-r31^2)) + r21*r31 with
    dr32/dp = sqrt((1-r21^2)(1-r31^2)).
    """
    from geconpy_tpu.dists import PartialCorrelation

    eta, dim = 2.0, 3
    d0 = PartialCorrelation.lkj_marginal(eta, dim, order=0)
    d1 = PartialCorrelation.lkj_marginal(eta, dim, order=1)

    rng = np.random.default_rng(7)
    pts = rng.uniform(-0.85, 0.85, size=(12, 3))
    ratios = []
    for r21, r31, p in pts:
        jac = np.sqrt((1 - r21**2) * (1 - r31**2))
        r32 = p * jac + r21 * r31
        log_vine = (float(d0.logpdf(jnp.asarray(r21)))
                    + float(d0.logpdf(jnp.asarray(r31)))
                    + float(d1.logpdf(jnp.asarray(p)))
                    - np.log(jac))
        R = np.array([[1, r21, r31], [r21, 1, r32], [r31, r32, 1.0]])
        log_lkj = (eta - 1.0) * np.log(np.linalg.det(R))
        ratios.append(log_vine - log_lkj)
    # constant ratio across points <=> densities proportional
    np.testing.assert_allclose(ratios, ratios[0], atol=1e-8)
