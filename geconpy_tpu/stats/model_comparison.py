"""Marginal data density (model evidence) estimators.

Standard Bayesian DSGE model comparison (Dynare's ``model_comparison`` /
marginal-density machinery; no counterpart in the reference gEconpy):

- **Laplace approximation** at the posterior mode:
  log p(y) ~= log p(y, theta*) + d/2 log(2 pi) - 1/2 log |-H(theta*)|,
  with the mode found by jitted Adam + Newton polish and the Hessian by
  ``jax.hessian`` on the unconstrained log posterior where the graph
  supports forward mode, else central differences of the exact
  reverse-mode gradient (see :func:`neg_hessian_fn`).
- **Modified harmonic mean** (Geweke 1999) over posterior draws:
  1 / p(y) = E_post[ f(theta) / p(y, theta) ]  for any density f inside the
  posterior support; f is the fitted Gaussian truncated to its central
  ``tau`` probability ellipsoid, which keeps the estimator's variance
  finite.

Both operate in the sampler's unconstrained parameterization, so the prior
transform Jacobians are already inside the log posterior and no extra
bookkeeping is needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.precision import highest_precision

__all__ = ["find_map", "laplace_evidence", "modified_harmonic_mean",
           "marginal_likelihood", "neg_hessian_fn"]

_LOG2PI = 1.8378770664093453


def neg_hessian_fn(logpost_fn, u_proto):
    """Hessian of ``-logpost`` — exact where the graph allows, FD else.

    ``jax.hessian`` (forward-over-reverse) is exact, but forward mode is
    rejected by any ``custom_vjp`` in the graph (e.g. the cyclostationary
    mixed-frequency filter), and reverse-over-reverse is blocked by the
    ``while_loop``s inside the implicit adjoints.  Those configurations get
    central finite differences of the *exact reverse-mode gradient* —
    2·dim vmapped gradient evaluations, accurate to ~eps^(2/3) relative
    (the standard Dynare approach for the Hessian at the mode).  The choice
    is made once per logpost by probing with ``jax.eval_shape``.
    """
    exact = jax.hessian(lambda x: -logpost_fn(x))
    grad = jax.grad(lambda x: -logpost_fn(x))

    def _exact_traces():
        try:
            jax.eval_shape(exact, jax.ShapeDtypeStruct(
                jnp.shape(u_proto), jnp.asarray(u_proto).dtype))
            return True
        except TypeError:
            return False  # forward-mode rejected: custom_vjp in the graph

    def _exact_is_right():
        """Forward-over-reverse can also FAIL SILENTLY: jvp through a
        ``stop_gradient`` inside an implicit-adjoint backward (e.g. the
        stationary filter's DARE fixed point) zeroes the tangents and
        returns a near-zero Hessian with no error.  Validate one FD
        directional derivative of the exact gradient at the prototype
        point before trusting the exact path."""
        u = jnp.asarray(u_proto)
        if isinstance(u, jax.core.Tracer):
            return False  # can't validate under trace; FD is always right
        H = np.asarray(exact(u))
        if not np.all(np.isfinite(H)):
            return False
        eps = float(jnp.finfo(u.dtype).eps)
        e = jnp.ones_like(u) / np.sqrt(u.shape[0])
        h = eps ** (1.0 / 3.0) * max(1.0, float(jnp.linalg.norm(u)))
        fd_dir = np.asarray((grad(u + h * e) - grad(u - h * e)) / (2 * h))
        if not np.all(np.isfinite(fd_dir)):
            return True  # cannot probe here (e.g. -inf shell); trust trace
        ref = float(np.linalg.norm(fd_dir))
        err = float(np.linalg.norm(H @ np.asarray(e) - fd_dir))
        return err <= 1e-3 * max(ref, 1e-8)

    if _exact_traces() and _exact_is_right():
        return exact

    def fd_hessian(u):
        u = jnp.asarray(u)
        eps = jnp.finfo(u.dtype).eps
        h = eps ** (1.0 / 3.0) * jnp.maximum(1.0, jnp.abs(u))
        E = jnp.eye(u.shape[0], dtype=u.dtype) * h[:, None]
        rows = jax.vmap(lambda e: grad(u + e) - grad(u - e))(E)
        H = rows / (2.0 * h[:, None])
        return 0.5 * (H + H.T)

    return fd_hessian


def find_map(logpost_fn, u0, adam_steps: int = 500, newton_steps: int = 5,
             learning_rate: float = 0.02):
    """Posterior mode in unconstrained space: Adam to the basin, Newton to
    machine precision.  Newton steps that do not improve the log posterior
    (indefinite Hessian far from the mode) are rejected."""
    u0 = jnp.asarray(u0)
    value_and_grad = jax.value_and_grad(lambda u: -logpost_fn(u))
    neg_hess = neg_hessian_fn(logpost_fn, u0)

    @jax.jit
    def adam(u):
        def step(carry, i):
            u, m, v = carry
            _, g = value_and_grad(u)
            g = jnp.where(jnp.isfinite(g), g, 0.0)
            m = 0.9 * m + 0.1 * g
            v = 0.999 * v + 0.001 * g * g
            mhat = m / (1 - 0.9 ** (i + 1))
            vhat = v / (1 - 0.999 ** (i + 1))
            u = u - learning_rate * mhat / (jnp.sqrt(vhat) + 1e-8)
            return (u, m, v), None

        (u, _, _), _ = jax.lax.scan(
            step, (u, jnp.zeros_like(u), jnp.zeros_like(u)),
            jnp.arange(adam_steps))
        return u

    @jax.jit
    @highest_precision
    def newton(u):
        def step(u, _):
            f, g = value_and_grad(u)
            H = neg_hess(u)
            delta = jnp.linalg.solve(H, g)
            u_new = u - delta
            f_new, _ = value_and_grad(u_new)
            better = jnp.isfinite(f_new) & (f_new <= f) \
                & jnp.all(jnp.isfinite(u_new))
            return jnp.where(better, u_new, u), None

        u, _ = jax.lax.scan(step, u, None, length=newton_steps)
        return u

    return newton(adam(u0))


def laplace_evidence(logpost_fn, u_mode) -> float:
    """log p(y) by Laplace approximation at the (unconstrained) mode."""
    u_mode = jnp.asarray(u_mode)
    d = u_mode.shape[0]
    H = jax.jit(neg_hessian_fn(logpost_fn, u_mode))(u_mode)
    sign, logdet = jnp.linalg.slogdet(H)
    logp = logpost_fn(u_mode)
    out = float(logp + 0.5 * d * _LOG2PI - 0.5 * logdet)
    if float(sign) <= 0:
        return float("nan")
    return out


def modified_harmonic_mean(unconstrained, logp, tau: float = 0.5) -> float:
    """Geweke's modified-harmonic-mean log evidence from posterior draws.

    Parameters
    ----------
    unconstrained
        (draws, dim) or (chains, draws, dim) posterior sample in the
        unconstrained space.
    logp
        matching log-posterior values (UN-normalized, i.e. log p(y, theta)
        up to the constant the sampler used — which is exactly what
        ``PosteriorResult.logp`` stores).
    tau
        probability content of the Gaussian truncation ellipsoid.
    """
    from scipy.stats import chi2

    u = np.asarray(unconstrained, dtype=np.float64).reshape(
        -1, np.shape(unconstrained)[-1])
    lp = np.asarray(logp, dtype=np.float64).reshape(-1)
    finite = np.isfinite(lp)
    u, lp = u[finite], lp[finite]
    n, d = u.shape

    mu = u.mean(axis=0)
    S = np.cov(u.T, ddof=1).reshape(d, d)
    Sinv = np.linalg.inv(S)
    _, logdetS = np.linalg.slogdet(S)

    delta = u - mu
    quad = np.einsum("ij,jk,ik->i", delta, Sinv, delta)
    thresh = chi2.ppf(tau, df=d)
    inside = quad <= thresh

    # log f(theta): truncated multivariate normal, renormalized by tau
    log_f = -0.5 * (d * _LOG2PI + logdetS + quad) - np.log(tau)
    # 1/p(y) = mean over draws of exp(log f - logp) restricted to the
    # ellipsoid; log-sum-exp for stability
    w = log_f[inside] - lp[inside]
    if w.size == 0:
        return float("nan")
    m = w.max()
    log_inv_evidence = m + np.log(np.exp(w - m).sum()) - np.log(n)
    return float(-log_inv_evidence)


def marginal_likelihood(ss_mod, data, result=None, method: str = "laplace",
                        **kwargs) -> float:
    """Log marginal data density for a configured DSGEStateSpace.

    ``method="laplace"`` needs no posterior sample (mode search from the
    prior initial position, or from the posterior mean when ``result`` is
    given); ``method="harmonic"`` needs ``result`` from ``fit``.
    """
    logpost = ss_mod.build_logpost(np.asarray(data))
    if method == "laplace":
        if result is not None:
            u0 = jnp.asarray(
                np.asarray(result.unconstrained).reshape(
                    -1, np.shape(result.unconstrained)[-1]).mean(axis=0))
        else:
            u0 = ss_mod.initial_position()
        u_mode = find_map(jax.jit(logpost), u0, **kwargs)
        return laplace_evidence(jax.jit(logpost), u_mode)
    if method == "harmonic":
        if result is None:
            raise ValueError("method='harmonic' requires a fit() result")
        return modified_harmonic_mean(result.unconstrained, result.logp,
                                      **kwargs)
    raise ValueError(f"method must be 'laplace' or 'harmonic', got {method!r}")


def compare_models(candidates: dict, data, method: str = "laplace",
                   prior_probs: dict | None = None, **kwargs):
    """Evidence table for competing models of the SAME dataset.

    ``candidates``: ``{name: DSGEStateSpace}`` (each already configured
    with its own observables mapped to the columns of ``data``).  Returns
    a DataFrame sorted by log marginal likelihood with log Bayes factors
    vs the best model and posterior model probabilities (uniform model
    prior unless ``prior_probs`` gives one weight per name).

    Role: Dynare's ``model_comparison`` command (no reference
    counterpart).
    """
    import pandas as pd

    if prior_probs is None:
        prior_probs = {k: 1.0 / len(candidates) for k in candidates}
    if set(prior_probs) != set(candidates):
        raise ValueError("prior_probs keys must match candidates")
    rows = {}
    for name, ss_mod in candidates.items():
        rows[name] = marginal_likelihood(ss_mod, data, method=method,
                                         **kwargs)
    out = pd.DataFrame({"log_ml": rows}).sort_values(
        "log_ml", ascending=False)
    out["log_bayes_factor"] = out["log_ml"] - out["log_ml"].iloc[0]
    logw = out["log_ml"] + np.log(
        np.asarray([prior_probs[k] for k in out.index]))
    w = np.exp(logw - logw.max())
    out["posterior_prob"] = w / w.sum()
    return out
