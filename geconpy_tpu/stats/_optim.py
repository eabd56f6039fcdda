"""Shared minimum-distance optimizer: Adam to the basin, Gauss-Newton to
machine precision.

Used by the IRF-matching and moment-matching estimators (the scalar-
objective counterpart for posterior/likelihood modes is
``model_comparison.find_map``).  ``residuals_fn(z) -> (r, ok)`` returns
the weighted residual vector and a solver-success flag; failures gate the
loss to +inf, so Adam's gradients are zeroed there and Gauss-Newton steps
into failure regions are rejected.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.precision import highest_precision

__all__ = ["adam_gauss_newton"]


def adam_gauss_newton(residuals_fn, z0, adam_steps: int = 400,
                      newton_steps: int = 6, learning_rate: float = 0.02):
    def loss(z):
        r, ok = residuals_fn(z)
        return jnp.where(ok, jnp.sum(r * r), jnp.inf)

    value_and_grad = jax.value_and_grad(loss)

    @jax.jit
    def adam(z):
        def step(carry, i):
            z, m, v = carry
            _, g = value_and_grad(z)
            g = jnp.where(jnp.isfinite(g), g, 0.0)
            m = 0.9 * m + 0.1 * g
            v = 0.999 * v + 0.001 * g * g
            mhat = m / (1 - 0.9 ** (i + 1))
            vhat = v / (1 - 0.999 ** (i + 1))
            return (z - learning_rate * mhat / (jnp.sqrt(vhat) + 1e-8),
                    m, v), None

        (z, _, _), _ = jax.lax.scan(
            step, (z, jnp.zeros_like(z), jnp.zeros_like(z)),
            jnp.arange(adam_steps))
        return z

    @jax.jit
    @highest_precision
    def gauss_newton(z):
        def step(z, _):
            r, _ = residuals_fn(z)
            # reverse-mode Jacobian: the policy-solve custom_vjp adjoints
            # reject forward mode
            J = jax.jacrev(lambda zz: residuals_fn(zz)[0])(z)
            H = J.T @ J + 1e-12 * jnp.eye(z.shape[0], dtype=z.dtype)
            z_new = z - jnp.linalg.solve(H, J.T @ r)
            f_new = loss(z_new)
            better = jnp.isfinite(f_new) & (f_new <= jnp.sum(r * r))
            return jnp.where(better, z_new, z), None

        z, _ = jax.lax.scan(step, z, None, length=newton_steps)
        return z

    return gauss_newton(adam(jnp.asarray(z0)))
