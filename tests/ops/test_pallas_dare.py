"""Lane-batched DARE settle kernel tests (ops/pallas_dare.py), interpret
mode on CPU; scipy solve_discrete_are is the oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg

from geconpy_tpu.ops.pallas_dare import pallas_dare_settle


def make_batch(B=12, n=8, k=3, seed=0, rho=0.9):
    rng = np.random.default_rng(seed)
    M = rng.normal(size=(B, n, n))
    rad = np.abs(np.linalg.eigvals(M)).max(axis=1)
    T = rho * M / rad[:, None, None]
    R = rng.normal(size=(B, n, k)) * 0.1
    RQR = np.einsum("bij,bkj->bik", R, R) + 1e-8 * np.eye(n)
    Z = rng.normal(size=(B, k, n))
    H = np.broadcast_to(0.01 * np.eye(k), (B, k, k)).copy()
    return (jnp.asarray(T), jnp.asarray(RQR), jnp.asarray(Z), jnp.asarray(H))


def test_matches_scipy_dare():
    T, RQR, Z, H = make_batch()
    P = pallas_dare_settle(T, RQR, Z, H, tile=8, interpret=True)
    for i in range(T.shape[0]):
        P_ref = scipy.linalg.solve_discrete_are(
            np.asarray(T[i]).T, np.asarray(Z[i]).T,
            np.asarray(RQR[i]), np.asarray(H[i]))
        np.testing.assert_allclose(np.asarray(P[i]), P_ref,
                                   rtol=1e-8, atol=1e-10)


def test_fixed_point_property():
    # P must satisfy the predictive Riccati equation exactly
    from geconpy_tpu.ops.kalman import _dare_step

    T, RQR, Z, H = make_batch(B=4, seed=3, rho=0.95)
    P = pallas_dare_settle(T, RQR, Z, H, tile=4, interpret=True)
    for i in range(4):
        P_next = _dare_step(P[i], T[i], RQR[i], Z[i], H[i])
        np.testing.assert_allclose(np.asarray(P_next), np.asarray(P[i]),
                                   rtol=1e-9, atol=1e-11)


def test_padding_lanes_isolated():
    # batch not a multiple of tile: padded lanes must not contaminate output
    T, RQR, Z, H = make_batch(B=5, seed=7)
    P5 = pallas_dare_settle(T, RQR, Z, H, tile=8, interpret=True)
    P4 = pallas_dare_settle(T[:4], RQR[:4], Z[:4], H[:4], tile=4,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(P5[:4]), np.asarray(P4), rtol=1e-10)
