"""Implicit-function-theorem wrapper unit tests (ops/implicit.py).

Reference role: analytic adjoints on solver Ops
(gEconpy/solvers/gensys.py:668, solvers/shared.py:12), generalized.
"""

import jax
import jax.numpy as jnp
import numpy as np

from geconpy_tpu.ops.implicit import implicit_root


def _newton_solver(f, n_iter=30):
    def solver(x0, theta):
        def body(x, _):
            J = jax.jacfwd(f, argnums=0)(x, theta)
            x_new = x - jnp.linalg.solve(J, f(x, theta))
            return x_new, None
        x_star, _ = jax.lax.scan(body, x0, None, length=n_iter)
        aux = {"resid": jnp.linalg.norm(f(x_star, theta))}
        return x_star, aux
    return solver


def test_sqrt_gradient():
    # x* = sqrt(theta);  dx*/dtheta = 1 / (2 sqrt(theta))
    def f(x, theta):
        return x**2 - theta

    solve = implicit_root(f, _newton_solver(f))
    theta = jnp.array([4.0])
    x0 = jnp.array([1.0])
    x_star, aux = solve(x0, theta)
    np.testing.assert_allclose(float(x_star[0]), 2.0, rtol=1e-12)
    assert float(aux["resid"]) < 1e-10

    g = jax.grad(lambda th: solve(x0, th)[0].sum())(theta)
    np.testing.assert_allclose(float(g[0]), 0.25, rtol=1e-10)


def test_multivariate_system_gradient_vs_fd():
    # coupled system: x0^2 + x1 - theta0 = 0, x0 - x1^3 - theta1 = 0
    def f(x, theta):
        return jnp.array([x[0] ** 2 + x[1] - theta[0],
                          x[0] - x[1] ** 3 - theta[1]])

    solve = implicit_root(f, _newton_solver(f))
    theta = jnp.array([2.0, 0.5])
    x0 = jnp.array([1.0, 0.5])

    def loss(th):
        x, _ = solve(x0, th)
        return jnp.sum(jnp.sin(x))

    g = jax.grad(loss)(theta)
    eps = 1e-6
    for i in range(2):
        d = jnp.zeros(2).at[i].set(1.0)
        fd = (loss(theta + eps * d) - loss(theta - eps * d)) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), float(fd), rtol=1e-5)


def test_pytree_theta():
    def f(x, theta):
        return theta["a"] * x + theta["b"]

    solve = implicit_root(f, _newton_solver(f))
    theta = {"a": jnp.array([2.0]), "b": jnp.array([-6.0])}
    x_star, _ = solve(jnp.array([0.0]), theta)
    np.testing.assert_allclose(float(x_star[0]), 3.0, rtol=1e-10)

    g = jax.grad(lambda th: solve(jnp.array([0.0]), th)[0].sum())(theta)
    # x* = -b/a: dx/da = -x*/a = -1.5, dx/db = -1/a = -0.5
    np.testing.assert_allclose(float(g["a"][0]), -1.5, rtol=1e-8)
    np.testing.assert_allclose(float(g["b"][0]), -0.5, rtol=1e-8)


def test_x0_gradient_is_zero():
    def f(x, theta):
        return x - theta

    solve = implicit_root(f, _newton_solver(f))
    g = jax.grad(lambda x0: solve(x0, jnp.array([5.0]))[0].sum())(jnp.array([1.0]))
    np.testing.assert_array_equal(np.asarray(g), [0.0])


def test_vmap_over_theta():
    def f(x, theta):
        return x**2 - theta

    solve = implicit_root(f, _newton_solver(f))
    thetas = jnp.array([[1.0], [4.0], [9.0]])
    x0 = jnp.array([1.0])
    xs, _ = jax.vmap(lambda th: solve(x0, th))(thetas)
    np.testing.assert_allclose(np.asarray(xs).ravel(), [1.0, 2.0, 3.0], rtol=1e-10)
