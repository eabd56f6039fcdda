"""JAX-native probability distributions for priors and shock laws.

Replaces the reference's preliz/pymc dependency
(``gEconpy/classes/distributions.py``, ``parser/transform/to_distribution.py``):
each distribution provides a jittable ``logpdf``, sampling, quantiles (for
QMC prior sweeps), moments, and an unconstraining bijector so NUTS runs in
R^d.  Parameter *fitting* helpers (maxent) run host-side at model-build time
with scipy.
"""

from __future__ import annotations

import dataclasses
from typing import ClassVar

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import gammaln, ndtr, ndtri

__all__ = [
    "Distribution", "Normal", "HalfNormal", "TruncatedNormal", "Beta",
    "Gamma", "InverseGamma", "Uniform", "LogNormal", "Exponential",
    "PartialCorrelation",
    "StudentT", "Truncated", "maxent", "DIST_REGISTRY", "get_distribution_class",
]

_SQRT2 = 1.4142135623730951
_LOG2PI = 1.8378770664093453


@dataclasses.dataclass(frozen=True)
class Distribution:
    """Base: scalar continuous distribution with fixed (host-side) params."""

    #: support bounds; None = unbounded on that side
    lower: ClassVar[float | None] = None
    upper: ClassVar[float | None] = None

    name: ClassVar[str] = "Distribution"

    def logpdf(self, x):
        """Log density at ``x`` (jittable; -inf outside the support)."""
        raise NotImplementedError

    def sample(self, key, shape=()):
        """Draw ``shape``-shaped samples with a jax PRNG ``key``."""
        raise NotImplementedError

    def ppf(self, q):
        """Quantile function (host/numpy ok; used for QMC sweeps)."""
        raise NotImplementedError

    def mean(self):
        """Distribution mean (host-side float)."""
        raise NotImplementedError

    def std(self):
        """Standard deviation (host-side float)."""
        return float(np.sqrt(self.variance()))

    def variance(self):
        """Variance (host-side float)."""
        raise NotImplementedError

    # ---- support / transforms ------------------------------------------------
    def support(self) -> tuple[float, float]:
        """(lower, upper) support bounds, +-inf when unbounded."""
        lo = self.lower if self.lower is not None else -np.inf
        hi = self.upper if self.upper is not None else np.inf
        return (lo, hi)

    def to_unconstrained(self, x):
        """Map a value in the support to R (for NUTS initialization)."""
        lo, hi = self.support()
        if np.isfinite(lo) and np.isfinite(hi):
            p = (x - lo) / (hi - lo)
            p = jnp.clip(p, 1e-12, 1 - 1e-12)
            return jnp.log(p) - jnp.log1p(-p)
        if np.isfinite(lo):
            return jnp.log(jnp.maximum(x - lo, 1e-300))
        if np.isfinite(hi):
            return jnp.log(jnp.maximum(hi - x, 1e-300))
        return x

    def from_unconstrained(self, u):
        """Inverse of :meth:`to_unconstrained`; returns (x, log|dx/du|)."""
        lo, hi = self.support()
        if np.isfinite(lo) and np.isfinite(hi):
            s = jax.nn.sigmoid(u)
            x = lo + (hi - lo) * s
            logjac = jnp.log(hi - lo) + jax.nn.log_sigmoid(u) + jax.nn.log_sigmoid(-u)
            return x, logjac
        if np.isfinite(lo):
            return lo + jnp.exp(u), u
        if np.isfinite(hi):
            return hi - jnp.exp(u), u
        return u, jnp.zeros_like(u)

    def hdi(self, mass: float = 0.94) -> tuple[float, float]:
        """Central interval of the given mass (used for prior sweep bounds)."""
        a = (1 - mass) / 2
        return float(self.ppf(a)), float(self.ppf(1 - a))


@dataclasses.dataclass(frozen=True)
class Normal(Distribution):
    mu: float = 0.0
    sigma: float = 1.0
    name: ClassVar[str] = "Normal"

    def logpdf(self, x):
        z = (x - self.mu) / self.sigma
        return -0.5 * (z * z + _LOG2PI) - jnp.log(self.sigma)

    def sample(self, key, shape=()):
        return self.mu + self.sigma * jax.random.normal(key, shape)

    def ppf(self, q):
        return self.mu + self.sigma * ndtri(q)

    def mean(self):
        return self.mu

    def variance(self):
        return self.sigma**2


@dataclasses.dataclass(frozen=True)
class HalfNormal(Distribution):
    sigma: float = 1.0
    lower: ClassVar[float] = 0.0
    name: ClassVar[str] = "HalfNormal"

    def logpdf(self, x):
        z = x / self.sigma
        base = 0.5 * jnp.log(2.0 / jnp.pi) - jnp.log(self.sigma) - 0.5 * z * z
        return jnp.where(x >= 0, base, -jnp.inf)

    def sample(self, key, shape=()):
        return jnp.abs(self.sigma * jax.random.normal(key, shape))

    def ppf(self, q):
        return self.sigma * ndtri((1.0 + q) / 2.0)

    def mean(self):
        return self.sigma * float(np.sqrt(2 / np.pi))

    def variance(self):
        return self.sigma**2 * (1 - 2 / np.pi)


@dataclasses.dataclass(frozen=True)
class Uniform(Distribution):
    lower_: float = 0.0
    upper_: float = 1.0
    name: ClassVar[str] = "Uniform"

    def support(self):
        return (self.lower_, self.upper_)

    def logpdf(self, x):
        inside = (x >= self.lower_) & (x <= self.upper_)
        return jnp.where(inside, -jnp.log(self.upper_ - self.lower_), -jnp.inf)

    def sample(self, key, shape=()):
        return jax.random.uniform(key, shape, minval=self.lower_,
                                  maxval=self.upper_)

    def ppf(self, q):
        return self.lower_ + (self.upper_ - self.lower_) * np.asarray(q)

    def mean(self):
        return 0.5 * (self.lower_ + self.upper_)

    def variance(self):
        return (self.upper_ - self.lower_) ** 2 / 12


@dataclasses.dataclass(frozen=True)
class Beta(Distribution):
    alpha: float = 1.0
    beta: float = 1.0
    lower: ClassVar[float] = 0.0
    upper: ClassVar[float] = 1.0
    name: ClassVar[str] = "Beta"

    @classmethod
    def from_moments(cls, mu: float, sigma: float) -> "Beta":
        """Beta with the given mean and standard deviation (moment matching)."""
        nu = mu * (1 - mu) / sigma**2 - 1
        return cls(alpha=mu * nu, beta=(1 - mu) * nu)

    def logpdf(self, x):
        a, b = self.alpha, self.beta
        norm = gammaln(a + b) - gammaln(a) - gammaln(b)
        inside = (x > 0) & (x < 1)
        xs = jnp.clip(x, 1e-12, 1 - 1e-12)
        return jnp.where(
            inside, norm + (a - 1) * jnp.log(xs) + (b - 1) * jnp.log1p(-xs),
            -jnp.inf)

    def sample(self, key, shape=()):
        return jax.random.beta(key, self.alpha, self.beta, shape)

    def ppf(self, q):
        from scipy.stats import beta as sp_beta

        return sp_beta.ppf(q, self.alpha, self.beta)

    def mean(self):
        return self.alpha / (self.alpha + self.beta)

    def variance(self):
        a, b = self.alpha, self.beta
        return a * b / ((a + b) ** 2 * (a + b + 1))


@dataclasses.dataclass(frozen=True)
class PartialCorrelation(Distribution):
    """Scaled Beta on (-1, 1): x = 2 B - 1 with B ~ Beta(alpha, alpha).

    The canonical-partial-correlation marginal of the LKJ(eta) correlation
    prior (Lewandowski-Kurowicka-Joe vine construction): a partial
    correlation with conditioning-set size k of a d-dimensional LKJ(eta)
    matrix is 2 Beta(a, a) - 1 with a = eta + (d - 2 - k) / 2 (LKJ 2009,
    C-vine: tree level k+1 gets shape eta + (d - 1 - (k+1)) / 2; the k = 0
    element marginal is the classic eta + (d - 2) / 2, and d = 2, eta = 1
    gives the uniform a = 1).  Used by
    ``DSGEStateSpace.configure(full_shock_covariance=True)`` to put an LKJ
    prior on the shock correlation Cholesky factor (reference role: the full
    PSD state_cov of ``gEconpy/model/statespace.py:240``).
    """

    alpha: float = 1.0
    lower: ClassVar[float] = -1.0
    upper: ClassVar[float] = 1.0
    name: ClassVar[str] = "PartialCorrelation"

    @classmethod
    def lkj_marginal(cls, eta: float, dim: int, order: int
                     ) -> "PartialCorrelation":
        """Marginal of the ``order``-th canonical partial correlation under
        LKJ(eta) in dimension ``dim`` (vine decomposition)."""
        return cls(alpha=eta + (dim - 2 - order) / 2.0)

    def logpdf(self, x):
        a = self.alpha
        norm = gammaln(2 * a) - 2 * gammaln(a)
        inside = (x > -1) & (x < 1)
        b = jnp.clip((x + 1) / 2, 1e-12, 1 - 1e-12)
        # density of x: Beta(a, a) pdf at (x+1)/2, times d b / d x = 1/2
        return jnp.where(
            inside,
            norm + (a - 1) * (jnp.log(b) + jnp.log1p(-b)) - jnp.log(2.0),
            -jnp.inf)

    def sample(self, key, shape=()):
        return 2.0 * jax.random.beta(key, self.alpha, self.alpha, shape) - 1.0

    def ppf(self, q):
        from scipy.stats import beta as sp_beta

        return 2.0 * sp_beta.ppf(q, self.alpha, self.alpha) - 1.0

    def mean(self):
        return 0.0

    def variance(self):
        return 1.0 / (2.0 * self.alpha + 1.0)


@dataclasses.dataclass(frozen=True)
class Gamma(Distribution):
    alpha: float = 2.0          # shape
    beta: float = 1.0           # rate
    lower: ClassVar[float] = 0.0
    name: ClassVar[str] = "Gamma"

    @classmethod
    def from_moments(cls, mu: float, sigma: float) -> "Gamma":
        """Gamma with the given mean and standard deviation."""
        return cls(alpha=(mu / sigma) ** 2, beta=mu / sigma**2)

    def logpdf(self, x):
        a, b = self.alpha, self.beta
        xs = jnp.maximum(x, 1e-300)
        val = a * jnp.log(b) - gammaln(a) + (a - 1) * jnp.log(xs) - b * xs
        return jnp.where(x > 0, val, -jnp.inf)

    def sample(self, key, shape=()):
        return jax.random.gamma(key, self.alpha, shape) / self.beta

    def ppf(self, q):
        from scipy.stats import gamma as sp_gamma

        return sp_gamma.ppf(q, self.alpha, scale=1.0 / self.beta)

    def mean(self):
        return self.alpha / self.beta

    def variance(self):
        return self.alpha / self.beta**2


@dataclasses.dataclass(frozen=True)
class InverseGamma(Distribution):
    alpha: float = 3.0
    beta: float = 1.0            # scale
    lower: ClassVar[float] = 0.0
    name: ClassVar[str] = "InverseGamma"

    @classmethod
    def from_moments(cls, mu: float, sigma: float) -> "InverseGamma":
        """InverseGamma with the given mean and standard deviation."""
        alpha = mu**2 / sigma**2 + 2
        return cls(alpha=alpha, beta=mu * (alpha - 1))

    def logpdf(self, x):
        a, b = self.alpha, self.beta
        xs = jnp.maximum(x, 1e-300)
        val = a * jnp.log(b) - gammaln(a) - (a + 1) * jnp.log(xs) - b / xs
        return jnp.where(x > 0, val, -jnp.inf)

    def sample(self, key, shape=()):
        return self.beta / jax.random.gamma(key, self.alpha, shape)

    def ppf(self, q):
        from scipy.stats import invgamma

        return invgamma.ppf(q, self.alpha, scale=self.beta)

    def mean(self):
        if self.alpha <= 1:
            return np.nan
        return self.beta / (self.alpha - 1)

    def variance(self):
        if self.alpha <= 2:
            return np.nan
        return self.beta**2 / ((self.alpha - 1) ** 2 * (self.alpha - 2))


@dataclasses.dataclass(frozen=True)
class LogNormal(Distribution):
    mu: float = 0.0
    sigma: float = 1.0
    lower: ClassVar[float] = 0.0
    name: ClassVar[str] = "LogNormal"

    def logpdf(self, x):
        xs = jnp.maximum(x, 1e-300)
        z = (jnp.log(xs) - self.mu) / self.sigma
        val = -0.5 * (z * z + _LOG2PI) - jnp.log(self.sigma) - jnp.log(xs)
        return jnp.where(x > 0, val, -jnp.inf)

    def sample(self, key, shape=()):
        return jnp.exp(self.mu + self.sigma * jax.random.normal(key, shape))

    def ppf(self, q):
        return np.exp(self.mu + self.sigma * np.asarray(ndtri(q)))

    def mean(self):
        return float(np.exp(self.mu + self.sigma**2 / 2))

    def variance(self):
        s2 = self.sigma**2
        return float((np.exp(s2) - 1) * np.exp(2 * self.mu + s2))


@dataclasses.dataclass(frozen=True)
class Exponential(Distribution):
    lam: float = 1.0
    lower: ClassVar[float] = 0.0
    name: ClassVar[str] = "Exponential"

    def logpdf(self, x):
        return jnp.where(x >= 0, jnp.log(self.lam) - self.lam * x, -jnp.inf)

    def sample(self, key, shape=()):
        return jax.random.exponential(key, shape) / self.lam

    def ppf(self, q):
        return -np.log1p(-np.asarray(q)) / self.lam

    def mean(self):
        return 1.0 / self.lam

    def variance(self):
        return 1.0 / self.lam**2


@dataclasses.dataclass(frozen=True)
class StudentT(Distribution):
    nu: float = 5.0
    mu: float = 0.0
    sigma: float = 1.0
    name: ClassVar[str] = "StudentT"

    def logpdf(self, x):
        nu, mu, s = self.nu, self.mu, self.sigma
        z = (x - mu) / s
        return (gammaln((nu + 1) / 2) - gammaln(nu / 2)
                - 0.5 * jnp.log(nu * jnp.pi) - jnp.log(s)
                - (nu + 1) / 2 * jnp.log1p(z * z / nu))

    def sample(self, key, shape=()):
        return self.mu + self.sigma * jax.random.t(key, self.nu, shape)

    def ppf(self, q):
        from scipy.stats import t as sp_t

        return sp_t.ppf(q, self.nu, loc=self.mu, scale=self.sigma)

    def mean(self):
        return self.mu

    def variance(self):
        return self.sigma**2 * self.nu / (self.nu - 2) if self.nu > 2 else np.nan


@dataclasses.dataclass(frozen=True)
class TruncatedNormal(Distribution):
    mu: float = 0.0
    sigma: float = 1.0
    lower_: float = -np.inf
    upper_: float = np.inf
    name: ClassVar[str] = "TruncatedNormal"

    def support(self):
        return (self.lower_, self.upper_)

    def _log_z(self):
        a = (self.lower_ - self.mu) / self.sigma
        b = (self.upper_ - self.mu) / self.sigma
        return jnp.log(ndtr(b) - ndtr(a))

    def logpdf(self, x):
        z = (x - self.mu) / self.sigma
        base = -0.5 * (z * z + _LOG2PI) - jnp.log(self.sigma) - self._log_z()
        inside = (x >= self.lower_) & (x <= self.upper_)
        return jnp.where(inside, base, -jnp.inf)

    def sample(self, key, shape=()):
        a = (self.lower_ - self.mu) / self.sigma
        b = (self.upper_ - self.mu) / self.sigma
        u = jax.random.uniform(key, shape)
        pa, pb = ndtr(a), ndtr(b)
        return self.mu + self.sigma * ndtri(pa + u * (pb - pa))

    def ppf(self, q):
        from scipy.stats import truncnorm

        a = (self.lower_ - self.mu) / self.sigma
        b = (self.upper_ - self.mu) / self.sigma
        return truncnorm.ppf(q, a, b, loc=self.mu, scale=self.sigma)

    def mean(self):
        from scipy.stats import truncnorm

        a = (self.lower_ - self.mu) / self.sigma
        b = (self.upper_ - self.mu) / self.sigma
        return float(truncnorm.mean(a, b, loc=self.mu, scale=self.sigma))

    def variance(self):
        from scipy.stats import truncnorm

        a = (self.lower_ - self.mu) / self.sigma
        b = (self.upper_ - self.mu) / self.sigma
        return float(truncnorm.var(a, b, loc=self.mu, scale=self.sigma))


def Truncated(dist: Distribution, lower: float | None = None,
              upper: float | None = None) -> Distribution:
    """Generic truncation wrapper (renormalized via the base CDF)."""
    if isinstance(dist, Normal):
        return TruncatedNormal(
            mu=dist.mu, sigma=dist.sigma,
            lower_=lower if lower is not None else -np.inf,
            upper_=upper if upper is not None else np.inf)
    return _TruncatedGeneric(dist, lower, upper)


@dataclasses.dataclass(frozen=True)
class _TruncatedGeneric(Distribution):
    base: Distribution = None  # type: ignore[assignment]
    lower_: float | None = None
    upper_: float | None = None
    name: ClassVar[str] = "Truncated"

    def support(self):
        lo, hi = self.base.support()
        if self.lower_ is not None:
            lo = max(lo, self.lower_)
        if self.upper_ is not None:
            hi = min(hi, self.upper_)
        return (lo, hi)

    def _mass(self):
        lo, hi = self.support()
        base_lo, base_hi = self.base.support()
        q_lo = 0.0 if lo <= base_lo else self._cdf_host(lo)
        q_hi = 1.0 if hi >= base_hi else self._cdf_host(hi)
        return q_lo, q_hi

    def _cdf_host(self, x):
        # bisection against ppf (host-side constant, computed once)
        from scipy.optimize import brentq

        return brentq(lambda q: float(self.base.ppf(q)) - x, 1e-12, 1 - 1e-12)

    def logpdf(self, x):
        q_lo, q_hi = self._mass()
        lo, hi = self.support()
        inside = (x >= lo) & (x <= hi)
        return jnp.where(inside,
                         self.base.logpdf(x) - jnp.log(q_hi - q_lo),
                         -jnp.inf)

    def sample(self, key, shape=()):
        q_lo, q_hi = self._mass()
        u = jax.random.uniform(key, shape, minval=q_lo, maxval=q_hi)
        return jnp.asarray(self.base.ppf(np.asarray(u)))

    def ppf(self, q):
        q_lo, q_hi = self._mass()
        return self.base.ppf(q_lo + np.asarray(q) * (q_hi - q_lo))

    def mean(self):
        return float(self.ppf(0.5))

    def variance(self):
        qs = self.ppf(np.linspace(0.005, 0.995, 199))
        return float(np.var(qs))


# ---------------------------------------------------------------- maxent fit

_MAXENT_FITTERS = {
    "Beta": ("alpha", "beta", Beta),
    "Gamma": ("alpha", "beta", Gamma),
    "InverseGamma": ("alpha", "beta", InverseGamma),
    "Normal": ("mu", "sigma", Normal),
    "LogNormal": ("mu", "sigma", LogNormal),
}


def maxent(dist: Distribution, lower: float, upper: float, mass: float = 0.99
           ) -> Distribution:
    """Maximum-entropy member of ``dist``'s family with
    P(lower < X < upper) = mass.

    Host-side scipy fit at model-build time (mirrors preliz.maxent as used by
    the reference's GCN calibration blocks).
    """
    import scipy.optimize as opt
    import scipy.stats as st

    family = type(dist).name
    if family not in _MAXENT_FITTERS:
        raise ValueError(f"maxent not supported for {family}")
    p1, p2, cls = _MAXENT_FITTERS[family]

    def scipy_frozen(a, b):
        if family == "Beta":
            return st.beta(a, b)
        if family == "Gamma":
            return st.gamma(a, scale=1.0 / b)
        if family == "InverseGamma":
            return st.invgamma(a, scale=b)
        if family == "Normal":
            return st.norm(a, b)
        if family == "LogNormal":
            return st.lognorm(b, scale=np.exp(a))
        raise AssertionError

    def neg_entropy_penalized(params):
        a, b = params
        if family in ("Beta", "Gamma", "InverseGamma") and (a <= 0 or b <= 0):
            return 1e6
        if family in ("Normal", "LogNormal") and b <= 0:
            return 1e6
        fr = scipy_frozen(a, b)
        interval_mass = fr.cdf(upper) - fr.cdf(lower)
        penalty = 5000.0 * (interval_mass - mass) ** 2
        try:
            ent = fr.entropy()
        except Exception:
            return 1e6
        return -float(ent) + penalty

    # reasonable starting point: match the central interval roughly
    mid = 0.5 * (lower + upper)
    spread = max((upper - lower) / 4, 1e-3)
    if family == "Beta":
        mid_c = float(np.clip(mid, 0.01, 0.99))
        sd_c = float(min(spread, np.sqrt(mid_c * (1 - mid_c)) * 0.9))
        b0 = Beta.from_moments(mid_c, sd_c)
        x0 = np.array([b0.alpha, b0.beta])
    elif family == "Gamma":
        g0 = Gamma.from_moments(max(mid, 1e-3), spread)
        x0 = np.array([g0.alpha, g0.beta])
    elif family == "InverseGamma":
        ig0 = InverseGamma.from_moments(max(mid, 1e-3), spread)
        x0 = np.array([ig0.alpha, ig0.beta])
    elif family == "LogNormal":
        x0 = np.array([np.log(max(mid, 1e-3)), 0.5])
    else:
        x0 = np.array([mid, spread])

    res = opt.minimize(neg_entropy_penalized, x0, method="Nelder-Mead",
                       options={"maxiter": 2000, "xatol": 1e-10, "fatol": 1e-12})
    a, b = res.x
    return cls(**{p1: float(a), p2: float(b)})


DIST_REGISTRY: dict[str, type] = {
    "normal": Normal,
    "halfnormal": HalfNormal,
    "truncatednormal": TruncatedNormal,
    "beta": Beta,
    "gamma": Gamma,
    "inversegamma": InverseGamma,
    "invgamma": InverseGamma,
    "uniform": Uniform,
    "lognormal": LogNormal,
    "exponential": Exponential,
    "studentt": StudentT,
    "t": StudentT,
}


def get_distribution_class(name: str):
    """Distribution class by GCN name (did-you-mean KeyError on typos)."""
    cls = DIST_REGISTRY.get(name.lower())
    if cls is None:
        raise KeyError(name)
    return cls
