"""Maximum-likelihood estimation (the Dynare default-mode workflow).

Frequentist MLE of the configured parameters: maximize the Kalman
log-likelihood alone (no prior term in the objective — but the search
still runs in the priors' unconstrained space, so bounds/positivity are
respected), then invert the Hessian at the mode for asymptotic standard
errors.  Composes the same Adam-to-basin + Newton-polish optimizer and
exact/FD Hessian machinery as the posterior-mode search
(``stats/model_comparison.py``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .model_comparison import find_map, neg_hessian_fn

__all__ = ["MLResult", "fit_ml"]


class MLResult(NamedTuple):
    params: dict               # MLE point estimates (constrained)
    std_errors: dict           # inverse-Hessian (delta-method) SEs
    loglik: float              # log-likelihood at the MLE
    aic: float
    bic: float
    success: bool
    unconstrained: np.ndarray  # the mode in unconstrained space

    def summary(self):
        """Point estimates with asymptotic (inverse-Hessian) standard errors."""
        import pandas as pd

        rows = {n: (self.params[n], self.std_errors[n])
                for n in self.params}
        out = pd.DataFrame(rows, index=["estimate", "std_error"]).T
        out["t_stat"] = out["estimate"] / out["std_error"]
        return out


def fit_ml(ss_mod, data: np.ndarray, u0=None, adam_steps: int = 500,
           newton_steps: int = 8, learning_rate: float = 0.02) -> MLResult:
    """MLE of the state-space's estimated parameters.

    The objective is the flag-gated log-likelihood (solver failures are
    ``-inf`` and rejected by the optimizer); SEs are
    ``sqrt(diag(H^{-1}))`` of the negative log-likelihood Hessian at the
    mode, mapped to constrained space through the transform Jacobian.
    ``aic``/``bic`` use the number of finite-likelihood observations
    (rows of ``data`` with at least one observed entry).
    """
    extras_fn = ss_mod.build_logpost_extras(data)

    def loglik(u):
        ex = extras_fn(u)
        # gate like the posterior does, but on the likelihood alone
        return jnp.where(jnp.isfinite(ex.logpost), ex.loglik,
                         jnp.asarray(-jnp.inf, ex.loglik.dtype))

    u0 = jnp.asarray(ss_mod.initial_position() if u0 is None else u0)
    u_hat = find_map(loglik, u0, adam_steps=adam_steps,
                     newton_steps=newton_steps, learning_rate=learning_rate)

    H = np.asarray(neg_hessian_fn(loglik, u_hat)(u_hat))
    cov_u = np.linalg.inv(H + 1e-12 * np.eye(H.shape[0]))
    J_c = np.asarray(jax.jacrev(ss_mod.constrain)(u_hat))
    cov_theta = J_c @ cov_u @ J_c.T
    se = np.sqrt(np.clip(np.diag(cov_theta), 0, np.inf))

    theta_hat = np.asarray(ss_mod.constrain(u_hat))
    ll = float(loglik(u_hat))
    k = len(theta_hat)
    T_obs = int(np.isfinite(np.asarray(data)).any(axis=1).sum())
    names = ss_mod.param_labels
    return MLResult(
        params=dict(zip(names, theta_hat.tolist())),
        std_errors=dict(zip(names, se.tolist())),
        loglik=ll,
        aic=2 * k - 2 * ll,
        bic=k * np.log(max(T_obs, 1)) - 2 * ll,
        success=bool(np.isfinite(ll) and np.isfinite(se).all()),
        unconstrained=np.asarray(u_hat),
    )
