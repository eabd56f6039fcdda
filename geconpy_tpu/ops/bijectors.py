"""Bijective reparameterizations for constrained steady-state variables.

Role parity with the reference's PyMC-transform-based bounded-variable
reparameterization (``gEconpy/model/model.py:70`` infer_variable_transform,
``:105`` transform_steady_state_system): variables with sign assumptions from
the GCN ``assumptions`` block are solved in an unconstrained space so Newton
never leaves the domain.

All transforms are elementwise and static per model, so one vectorized
forward/inverse pair covers the whole state vector.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["VectorBijector", "make_bijector", "IDENTITY", "LOG", "NEG_LOG"]

IDENTITY = 0   # x = u
LOG = 1        # x = exp(u)      (positive variables)
NEG_LOG = 2    # x = -exp(u)     (negative variables)


class VectorBijector(NamedTuple):
    """Elementwise map between unconstrained u and constrained x."""

    kinds: jax.Array  # int array, one code per element

    def forward(self, u: jax.Array) -> jax.Array:
        """Unconstrained R^n -> constrained values (elementwise)."""
        x = jnp.where(self.kinds == LOG, jnp.exp(u), u)
        x = jnp.where(self.kinds == NEG_LOG, -jnp.exp(u), x)
        return x

    def inverse(self, x: jax.Array) -> jax.Array:
        """Constrained values -> unconstrained R^n (elementwise)."""
        safe_pos = jnp.log(jnp.where(self.kinds == LOG, jnp.maximum(x, 1e-300), 1.0))
        safe_neg = jnp.log(jnp.where(self.kinds == NEG_LOG, jnp.maximum(-x, 1e-300), 1.0))
        u = jnp.where(self.kinds == LOG, safe_pos, x)
        u = jnp.where(self.kinds == NEG_LOG, safe_neg, u)
        return u


def make_bijector(assumption_dicts: list[dict]) -> VectorBijector:
    """Build the per-element transform codes from sympy assumption dicts."""
    kinds = []
    for assumptions in assumption_dicts:
        if assumptions.get("positive"):
            kinds.append(LOG)
        elif assumptions.get("negative"):
            kinds.append(NEG_LOG)
        else:
            kinds.append(IDENTITY)
    return VectorBijector(jnp.asarray(kinds))
