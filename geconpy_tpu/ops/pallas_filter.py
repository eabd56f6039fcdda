"""Pallas TPU kernel: fused constant-gain Kalman filter tail.

The steady-state filter's per-step work is a handful of n x n matvecs per
draw — far too small to use the MXU, and XLA's batched lowering leaves the
chip ~99% idle.  This kernel flips the layout: the **batch dimension becomes
the vector-lane dimension** (draws-last, padded to 128 lanes), so every
per-draw matvec entry is one VPU multiply-add over a (sublane, 128) tile and
the whole 150+-step recursion runs inside a single kernel with all state
resident in VMEM — no HBM round-trips between time steps.

Per tile of ``BT`` draws and time step t:

    v      = y_t - Z x - d                 (k, BT)
    ll    += const - 0.5 * v' Finv v       (BT,)
    x      = M x + TK (y_t - d)            (n, BT)

where M = T - T K Z and Finv are the frozen steady-state filter matrices.
Shapes are static per model; grid = batch tiles.  Used by the batched
likelihood sweep path (gradient-free: prior/posterior predictive sweeps and
the benchmark); NUTS keeps the XLA filter, which is reverse-differentiable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["pallas_filter_tail", "reference_filter_tail"]


def _tail_kernel(y_ref, M_ref, TK_ref, Z_ref, d_ref, Finv_ref, const_ref,
                 x0_ref, out_ref, *, n_steps: int, n: int, k: int):
    x0 = x0_ref[...]                    # (n, BT)
    bt = x0.shape[-1]
    ll0 = jnp.zeros((1, bt), dtype=x0.dtype)

    M = M_ref[...]                      # (n, n, BT)
    TK = TK_ref[...]                    # (n, k, BT)
    Z = Z_ref[...]                      # (k, n, BT)
    d = d_ref[...]                      # (k, BT)
    Finv = Finv_ref[...]                # (k, k, BT)
    const = const_ref[...]              # (1, BT)

    def step(t, carry):
        x, ll = carry
        y_t = y_ref[t]                  # (k,)
        yd = y_t[:, None] - d           # (k, BT)
        # innovation v = yd - Z x   (reduce over state dim)
        v = yd - jnp.sum(Z * x[None, :, :], axis=1)            # (k, BT)
        quad = jnp.sum(v[:, None, :] * Finv * v[None, :, :],
                       axis=(0, 1))                             # (BT,)
        ll = ll + const - 0.5 * quad[None, :]
        # state update x' = M x + TK yd
        x = jnp.sum(M * x[None, :, :], axis=1) \
            + jnp.sum(TK * yd[None, :, :], axis=1)              # (n, BT)
        return (x, ll)

    _, ll = jax.lax.fori_loop(0, n_steps, step, (x0, ll0))
    out_ref[...] = ll


def pallas_filter_tail(y_tail, M, TK, Z, d, Finv, const, x0,
                       tile: int = 512, interpret: bool = False):
    """Run the constant-gain tail for a batch of draws.

    Parameters (B = batch, T = tail length, n = states, k = observables):

    - ``y_tail``: (T, k) shared observations
    - ``M``: (B, n, n), ``TK``: (B, n, k), ``Z``: (B, k, n), ``d``: (B, k),
      ``Finv``: (B, k, k), ``const``: (B,), ``x0``: (B, n)

    Returns per-draw tail log-likelihoods (B,).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, n, _ = M.shape
    k = Z.shape[1]
    T_steps = y_tail.shape[0]
    dtype = M.dtype

    tile = min(tile, max(128, 1 << (B - 1).bit_length()))
    pad = (-B) % tile
    Bp = B + pad

    def to_lanes(a, *lead):
        """(B, *lead) -> (*lead, Bp): draws into the last (lane) axis."""
        a = jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], dtype)], axis=0) if pad else a
        perm = tuple(range(1, a.ndim)) + (0,)
        return jnp.transpose(a, perm)

    M_l = to_lanes(M)                 # (n, n, Bp)
    TK_l = to_lanes(TK)               # (n, k, Bp)
    Z_l = to_lanes(Z)                 # (k, n, Bp)
    d_l = to_lanes(d)                 # (k, Bp)
    Finv_l = to_lanes(Finv)           # (k, k, Bp)
    const_l = to_lanes(const[:, None])  # (1, Bp)
    x0_l = to_lanes(x0)               # (n, Bp)

    n_tiles = Bp // tile
    kernel = functools.partial(_tail_kernel, n_steps=T_steps, n=n, k=k)

    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((T_steps, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, k, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, k, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )

    ll = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, Bp), dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(jnp.asarray(y_tail, dtype), M_l, TK_l, Z_l, d_l, Finv_l, const_l, x0_l)
    return ll[0, :B]


def reference_filter_tail(y_tail, M, TK, Z, d, Finv, const, x0):
    """Plain-XLA reference of the same recursion (for parity tests)."""

    def one_draw(M_, TK_, Z_, d_, Finv_, const_, x0_):
        def step(carry, y_t):
            x, ll = carry
            yd = y_t - d_
            v = yd - Z_ @ x
            ll = ll + const_ - 0.5 * (v @ Finv_ @ v)
            x = M_ @ x + TK_ @ yd
            return (x, ll), None

        (x, ll), _ = jax.lax.scan(step, (x0_, jnp.zeros((), M_.dtype)),
                                  y_tail)
        return ll

    return jax.vmap(one_draw)(M, TK, Z, d, Finv, const, x0)
