"""Matmul-precision guard for numeric kernels.

On TPU, float32 matmuls default to bfloat16 MXU passes; iterative linear-
algebra kernels (cycle reduction, Lyapunov doubling, Newton, Kalman) need
full float32 accumulation to converge.  Wrapping kernel entry points in
``highest_precision`` makes them correct regardless of the global setting.
"""

import functools

import jax

__all__ = ["highest_precision"]


def highest_precision(fn):
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)
    return wrapped
