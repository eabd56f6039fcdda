"""Distribution layer vs the scipy.stats oracle, one distribution at a time.

The reference delegates its prior machinery to preliz (scipy-backed); this
framework implements every prior as a jittable JAX distribution
(``dists/core.py``), so each one is pinned here against scipy.stats:
log-density on a support-spanning grid (with -inf outside the support),
quantiles, analytic moments, sampling moments, and the unconstrained
transform round-trip whose log-Jacobian must match autodiff.
"""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats as sps

from geconpy_tpu.dists.core import (
    Beta,
    Exponential,
    Gamma,
    HalfNormal,
    InverseGamma,
    LogNormal,
    Normal,
    PartialCorrelation,
    StudentT,
    Truncated,
    TruncatedNormal,
    Uniform,
)

# ---------------------------------------------------------------- helpers


def _grid(dist, n=41):
    lo, hi = dist.support()
    a = lo if np.isfinite(lo) else dist.ppf(0.001)
    b = hi if np.isfinite(hi) else dist.ppf(0.999)
    pad = 0.02 * (b - a)
    return np.linspace(a + pad, b - pad, n)


def check_logpdf(dist, sp):
    x = _grid(dist)
    got = np.asarray(jax.jit(jax.vmap(dist.logpdf))(jnp.asarray(x)))
    np.testing.assert_allclose(got, sp.logpdf(x), rtol=1e-6, atol=1e-8)
    lo, hi = dist.support()
    if np.isfinite(lo):
        assert float(dist.logpdf(lo - 0.5)) == -np.inf
    if np.isfinite(hi):
        assert float(dist.logpdf(hi + 0.5)) == -np.inf


def check_ppf(dist, sp):
    q = np.array([0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99])
    np.testing.assert_allclose(np.asarray(dist.ppf(q)), sp.ppf(q),
                               rtol=1e-6, atol=1e-8)
    lo, hi = dist.hdi(0.9)
    np.testing.assert_allclose([lo, hi], [sp.ppf(0.05), sp.ppf(0.95)],
                               rtol=1e-6, atol=1e-8)


def check_moments(dist, sp):
    np.testing.assert_allclose(float(dist.mean()), sp.mean(),
                               rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(float(dist.variance()), sp.var(),
                               rtol=1e-6, atol=1e-10)


def check_sampling_and_transform(dist, n=40_000, seed=0):
    xs = np.asarray(dist.sample(jax.random.PRNGKey(seed), (n,)))
    lo, hi = dist.support()
    assert (xs >= lo).all() and (xs <= hi).all()
    se = dist.std() / np.sqrt(n)
    assert abs(xs.mean() - dist.mean()) < 6 * se
    # unconstrained round-trip + autodiff-verified log-Jacobian
    x0 = jnp.asarray(dist.ppf(0.37))
    u = dist.to_unconstrained(x0)
    x_back, logjac = dist.from_unconstrained(u)
    np.testing.assert_allclose(float(x_back), float(x0), rtol=1e-6)
    dxdu = jax.grad(lambda uu: dist.from_unconstrained(uu)[0])(u)
    np.testing.assert_allclose(float(logjac), float(jnp.log(jnp.abs(dxdu))),
                               rtol=1e-6)


# ------------------------------------------------------------------ Normal

_NORM = Normal(1.3, 0.7), sps.norm(1.3, 0.7)


def test_normal_logpdf():
    check_logpdf(*_NORM)


def test_normal_ppf():
    check_ppf(*_NORM)


def test_normal_moments():
    check_moments(*_NORM)


def test_normal_sampling_and_transform():
    check_sampling_and_transform(_NORM[0])


# -------------------------------------------------------------- HalfNormal

_HNORM = HalfNormal(0.4), sps.halfnorm(scale=0.4)


def test_halfnormal_logpdf():
    check_logpdf(*_HNORM)


def test_halfnormal_ppf():
    check_ppf(*_HNORM)


def test_halfnormal_moments():
    check_moments(*_HNORM)


def test_halfnormal_sampling_and_transform():
    check_sampling_and_transform(_HNORM[0])


# ----------------------------------------------------------------- Uniform

_UNIF = Uniform(-0.5, 2.0), sps.uniform(loc=-0.5, scale=2.5)


def test_uniform_logpdf():
    check_logpdf(*_UNIF)


def test_uniform_ppf():
    check_ppf(*_UNIF)


def test_uniform_moments():
    check_moments(*_UNIF)


def test_uniform_sampling_and_transform():
    check_sampling_and_transform(_UNIF[0])


# -------------------------------------------------------------------- Beta

_BETA = Beta(2.5, 4.0), sps.beta(2.5, 4.0)


def test_beta_logpdf():
    check_logpdf(*_BETA)


def test_beta_ppf():
    check_ppf(*_BETA)


def test_beta_moments():
    check_moments(*_BETA)


def test_beta_sampling_and_transform():
    check_sampling_and_transform(_BETA[0])


# ------------------------------------------------------------------- Gamma

# package convention: beta is the RATE (scipy scale = 1/beta)
_GAMMA = Gamma(3.0, 2.0), sps.gamma(3.0, scale=0.5)


def test_gamma_logpdf():
    check_logpdf(*_GAMMA)


def test_gamma_ppf():
    check_ppf(*_GAMMA)


def test_gamma_moments():
    check_moments(*_GAMMA)


def test_gamma_sampling_and_transform():
    check_sampling_and_transform(_GAMMA[0])


# ------------------------------------------------------------ InverseGamma

# package convention: beta is the SCALE (scipy invgamma scale = beta)
_IGAMMA = InverseGamma(4.0, 1.5), sps.invgamma(4.0, scale=1.5)


def test_invgamma_logpdf():
    check_logpdf(*_IGAMMA)


def test_invgamma_ppf():
    check_ppf(*_IGAMMA)


def test_invgamma_moments():
    check_moments(*_IGAMMA)


def test_invgamma_sampling_and_transform():
    check_sampling_and_transform(_IGAMMA[0])


# --------------------------------------------------------------- LogNormal

_LNORM = LogNormal(0.2, 0.5), sps.lognorm(s=0.5, scale=np.exp(0.2))


def test_lognormal_logpdf():
    check_logpdf(*_LNORM)


def test_lognormal_ppf():
    check_ppf(*_LNORM)


def test_lognormal_moments():
    check_moments(*_LNORM)


def test_lognormal_sampling_and_transform():
    check_sampling_and_transform(_LNORM[0])


# ------------------------------------------------------------- Exponential

_EXPON = Exponential(2.5), sps.expon(scale=1 / 2.5)


def test_exponential_logpdf():
    check_logpdf(*_EXPON)


def test_exponential_ppf():
    check_ppf(*_EXPON)


def test_exponential_moments():
    check_moments(*_EXPON)


def test_exponential_sampling_and_transform():
    check_sampling_and_transform(_EXPON[0])


# ---------------------------------------------------------------- StudentT

_T = StudentT(6.0, 0.3, 1.2), sps.t(6.0, loc=0.3, scale=1.2)


def test_studentt_logpdf():
    check_logpdf(*_T)


def test_studentt_ppf():
    check_ppf(*_T)


def test_studentt_moments():
    check_moments(*_T)


def test_studentt_sampling_and_transform():
    check_sampling_and_transform(_T[0])


# --------------------------------------------------------- TruncatedNormal

_a, _b = (0.1 - 0.5) / 0.4, (1.5 - 0.5) / 0.4
_TNORM = (TruncatedNormal(0.5, 0.4, 0.1, 1.5),
          sps.truncnorm(_a, _b, loc=0.5, scale=0.4))


def test_truncnorm_logpdf():
    check_logpdf(*_TNORM)


def test_truncnorm_ppf():
    check_ppf(*_TNORM)


def test_truncnorm_moments():
    check_moments(*_TNORM)


def test_truncnorm_sampling_and_transform():
    check_sampling_and_transform(_TNORM[0])


def test_truncated_wrapper_dispatches_normal():
    d = Truncated(Normal(0.5, 0.4), lower=0.1, upper=1.5)
    assert isinstance(d, TruncatedNormal)
    x = np.linspace(0.12, 1.48, 21)
    np.testing.assert_allclose(
        np.asarray(jax.vmap(d.logpdf)(jnp.asarray(x))),
        _TNORM[1].logpdf(x), rtol=1e-6)


# ------------------------------------------------------ PartialCorrelation

# x = 2 B - 1 with B ~ Beta(a, a): f(x) = f_B((x + 1) / 2) / 2


class _ScaledBetaOracle:
    def __init__(self, a):
        self.b = sps.beta(a, a)

    def logpdf(self, x):
        return self.b.logpdf((np.asarray(x) + 1) / 2) - np.log(2.0)

    def ppf(self, q):
        return 2 * self.b.ppf(q) - 1

    def mean(self):
        return 0.0

    def var(self):
        return 4 * self.b.var()


_PC = PartialCorrelation(3.0), _ScaledBetaOracle(3.0)


def test_partialcorr_logpdf():
    check_logpdf(*_PC)


def test_partialcorr_ppf():
    check_ppf(*_PC)


def test_partialcorr_moments():
    check_moments(*_PC)


def test_partialcorr_sampling_and_transform():
    check_sampling_and_transform(_PC[0])


# -------------------------------------------------------- generic Truncated


def test_truncated_generic_gamma_renormalizes():
    """Truncated(Gamma) must equal scipy's truncated-gamma density: the
    base logpdf minus the log of the retained mass, -inf outside."""
    base = Gamma(3.0, 2.0)
    sp_base = sps.gamma(3.0, scale=0.5)
    d = Truncated(base, lower=0.5, upper=3.0)
    mass = sp_base.cdf(3.0) - sp_base.cdf(0.5)
    x = np.linspace(0.55, 2.95, 25)
    got = np.asarray(jax.vmap(d.logpdf)(jnp.asarray(x)))
    np.testing.assert_allclose(got, sp_base.logpdf(x) - np.log(mass),
                               rtol=1e-5, atol=1e-7)
    assert float(d.logpdf(0.4)) == -np.inf
    assert float(d.logpdf(3.1)) == -np.inf


def test_truncated_generic_sampling_inside_support():
    d = Truncated(Gamma(3.0, 2.0), lower=0.5, upper=3.0)
    xs = np.asarray(d.sample(jax.random.PRNGKey(0), (4000,)))
    assert (xs >= 0.5).all() and (xs <= 3.0).all()
    # quantiles match scipy's conditional quantiles
    sp_base = sps.gamma(3.0, scale=0.5)
    q_lo, q_hi = sp_base.cdf(0.5), sp_base.cdf(3.0)
    for q in (0.1, 0.5, 0.9):
        np.testing.assert_allclose(
            float(d.ppf(q)), sp_base.ppf(q_lo + q * (q_hi - q_lo)),
            rtol=1e-5)
