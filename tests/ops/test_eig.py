"""Differentiable host-callback eigenvalue op unit tests (ops/eig.py).

Reference role: the differentiable RealEig pytensor op
(gEconpy/pytensorf/real_eig.py:10,105).
"""

import jax
import jax.numpy as jnp
import numpy as np

from geconpy_tpu.ops.eig import eig_vals


def test_values_match_numpy_sorted_by_modulus():
    rng = np.random.default_rng(0)
    M = rng.normal(size=(6, 6))
    re, im = eig_vals(jnp.asarray(M))
    lam = np.asarray(re) + 1j * np.asarray(im)
    ref = np.linalg.eigvals(M)
    ref = ref[np.argsort(np.abs(ref), kind="stable")]
    np.testing.assert_allclose(lam, ref, rtol=1e-10, atol=1e-12)
    assert np.all(np.diff(np.abs(lam)) >= -1e-12)


def test_complex_pairs_detected():
    # rotation matrix: eigenvalues e^{±i theta}
    th = 0.7
    M = jnp.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    re, im = eig_vals(M)
    np.testing.assert_allclose(np.asarray(re), [np.cos(th)] * 2, rtol=1e-12)
    np.testing.assert_allclose(np.sort(np.asarray(im)),
                               [-np.sin(th), np.sin(th)], rtol=1e-12)


def test_gradient_matches_finite_differences():
    rng = np.random.default_rng(3)
    M0 = rng.normal(size=(4, 4))

    def loss(M):
        re, im = eig_vals(M)
        return jnp.sum(re**2 + im**2)  # = sum |lambda|^2, order-invariant

    g = jax.grad(loss)(jnp.asarray(M0))
    eps = 1e-6
    for idx in [(0, 0), (1, 2), (3, 1)]:
        d = np.zeros((4, 4))
        d[idx] = 1.0
        fd = (loss(jnp.asarray(M0 + eps * d)) - loss(jnp.asarray(M0 - eps * d))) / (2 * eps)
        np.testing.assert_allclose(float(g[idx]), float(fd), rtol=1e-5)


def test_spectral_abscissa_gradient_direction():
    # d(max |lambda|)/dA for diag A is a one-hot on the dominant entry
    A = jnp.diag(jnp.array([0.3, 0.9, 0.5]))

    def top_modulus(M):
        re, im = eig_vals(M)
        return jnp.sqrt(re[-1] ** 2 + im[-1] ** 2)  # sorted ascending

    g = np.asarray(jax.grad(top_modulus)(A))
    expected = np.zeros((3, 3))
    expected[1, 1] = 1.0
    np.testing.assert_allclose(g, expected, atol=1e-9)


def test_vmap():
    rng = np.random.default_rng(5)
    Ms = jnp.asarray(rng.normal(size=(4, 3, 3)))
    re, im = jax.vmap(eig_vals)(Ms)
    for i in range(4):
        ref = np.linalg.eigvals(np.asarray(Ms[i]))
        np.testing.assert_allclose(
            np.sort(np.abs(ref)), np.abs(np.asarray(re[i] + 1j * im[i])),
            rtol=1e-10)


def test_jit():
    M = jnp.diag(jnp.array([2.0, -1.0]))
    re, im = jax.jit(eig_vals)(M)
    np.testing.assert_allclose(np.asarray(re), [-1.0, 2.0], atol=1e-12)
    np.testing.assert_allclose(np.asarray(im), [0.0, 0.0], atol=1e-12)
