"""Implicit-function differentiation for iterative root solves.

``lax.while_loop`` is not reverse-mode differentiable, and differentiating
*through* solver iterations is wasteful anyway.  This wraps any root solver
with the implicit function theorem: at the solution f(x*, θ) = 0,

    dx*/dθ = -(∂f/∂x)⁻¹ ∂f/∂θ

so the VJP solves one linear system with the Jacobian at the solution and
pulls back through f's θ-dependence — the same trick the reference uses for
its solver Ops' analytic adjoints (``gEconpy/solvers/gensys.py:668``,
``solvers/shared.py:12``), generalized.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .precision import highest_precision

__all__ = ["implicit_root"]


def implicit_root(f: Callable, solver: Callable):
    """Wrap ``solver`` so its solution differentiates implicitly.

    Parameters
    ----------
    f
        Residual ``f(x, theta) -> (m,)`` with x of shape (m,) (square system).
        ``theta`` is a single pytree argument (pack multiple args yourself).
    solver
        ``solver(x0, theta) -> (x_star, aux)`` running the iteration.  ``aux``
        (flags, norms, counters) is passed through with zero gradient.

    Returns
    -------
    solve(x0, theta) -> (x_star, aux), differentiable in ``theta``
    (gradient w.r.t. ``x0`` is defined as zero: the solution of a converged
    root solve does not depend on the initial guess).
    """

    @jax.custom_vjp
    def solve(x0, theta):
        return solver(x0, theta)

    def fwd(x0, theta):
        x_star, aux = solver(x0, theta)
        return (x_star, aux), (x_star, theta)

    @highest_precision
    def bwd(residuals, cotangents):
        x_star, theta = residuals
        x_bar, _aux_bar = cotangents
        J = jax.jacfwd(f, argnums=0)(x_star, theta)
        # solve Jᵀ w = x̄ ;  θ̄ = -(∂f/∂θ)ᵀ w
        w = jnp.linalg.solve(J.T, x_bar)
        _, vjp_theta = jax.vjp(lambda th: f(x_star, th), theta)
        (theta_bar,) = vjp_theta(-w)
        x0_bar = jax.tree_util.tree_map(jnp.zeros_like, x_star)
        return (x0_bar, theta_bar)

    solve.defvjp(fwd, bwd)
    return solve
