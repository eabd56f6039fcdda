"""Dtype-aware numeric tolerances.

Success thresholds must scale with machine epsilon so the same compiled
pipeline is correct in float64 (tests, parity) and float32 (TPU default).
"""

import jax.numpy as jnp
import numpy as np

__all__ = ["success_tol"]


def success_tol(dtype, base: float = 1e-8, eps_multiple: float = 1000.0) -> float:
    """max(base, eps_multiple * machine-eps(dtype)):
    float64 -> base (strict); float32 -> ~1.2e-4."""
    eps = float(np.finfo(np.dtype(dtype)).eps)
    return max(float(base), eps_multiple * eps)
