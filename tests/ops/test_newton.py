import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geconpy_tpu.ops.newton import levenberg_marquardt_solve, newton_solve, root


def quad(x):
    # roots at x = [1, 2]
    return jnp.array([x[0] ** 2 - 1.0, x[1] ** 2 - 4.0])


def rosenbrock_grad(x):
    # gradient of rosenbrock: root at (1, 1)
    a, b = 1.0, 100.0
    return jnp.array([
        -2 * (a - x[0]) - 4 * b * x[0] * (x[1] - x[0] ** 2),
        2 * b * (x[1] - x[0] ** 2),
    ])


@pytest.mark.parametrize("solver", [newton_solve, levenberg_marquardt_solve])
def test_simple_quadratic(solver):
    res = solver(quad, jnp.array([3.0, 3.0]))
    assert bool(res.success)
    np.testing.assert_allclose(np.asarray(res.x), [1.0, 2.0], atol=1e-8)


def test_rosenbrock_root():
    res = root(rosenbrock_grad, jnp.array([-1.2, 1.0]), method="hybrid",
               maxiter=200)
    assert bool(res.success)
    np.testing.assert_allclose(np.asarray(res.x), [1.0, 1.0], atol=1e-6)


def test_newton_vmap():
    """Batched solving with per-draw success flags."""
    def f(x, c):
        return jnp.array([x[0] ** 2 - c[0]])

    cs = jnp.array([[4.0], [9.0], [-1.0]])  # last one has no real root
    solve = jax.vmap(lambda c: newton_solve(f, jnp.array([1.0]), (c,), maxiter=50))
    res = solve(cs)
    assert res.x.shape == (3, 1)
    assert bool(res.success[0]) and bool(res.success[1])
    assert not bool(res.success[2])
    np.testing.assert_allclose(np.asarray(res.x[:2, 0]), [2.0, 3.0], atol=1e-8)


def test_newton_jit_and_grad_through_solution():
    """Implicit-style check: solution x(c)=sqrt(c) so dx/dc = 1/(2 sqrt(c)).
    (Differentiating through the iteration — fine for few iters.)"""
    def solve(c):
        res = newton_solve(lambda x, c: jnp.array([x[0] ** 2 - c]),
                           jnp.array([2.0]), (c,), maxiter=40)
        return res.x[0]

    c0 = 4.0
    x = jax.jit(solve)(c0)
    np.testing.assert_allclose(float(x), 2.0, atol=1e-10)


def test_dogleg_solver():
    from geconpy_tpu.ops.newton import dogleg_solve

    res = dogleg_solve(quad, jnp.array([3.0, 3.0]))
    assert bool(res.success)
    np.testing.assert_allclose(np.asarray(res.x), [1.0, 2.0], atol=1e-8)

    # stiff exponential system (Broyden-style), far initial point
    def stiff(x):
        return jnp.array([
            jnp.exp(x[0]) - 2.0,
            x[0] * x[1] - jnp.log(2.0),
        ])

    res = root(stiff, jnp.array([5.0, -4.0]), method="dogleg", maxiter=300)
    assert bool(res.success)
    np.testing.assert_allclose(np.asarray(res.x),
                               [np.log(2.0), 1.0], atol=1e-7)


def test_dogleg_vmap():
    from geconpy_tpu.ops.newton import dogleg_solve

    def f(x, c):
        return jnp.array([x[0] ** 3 - c[0]])

    cs = jnp.array([[8.0], [27.0]])
    res = jax.vmap(lambda c: dogleg_solve(f, jnp.array([1.5]), (c,)))(cs)
    np.testing.assert_allclose(np.asarray(res.x[:, 0]), [2.0, 3.0], atol=1e-8)


@pytest.mark.parametrize("method", ["chord", "gauss_newton", "newton_nm"])
def test_extended_solver_family(method):
    """Chord / Gauss-Newton-CG / nonmonotone Newton all solve the standard
    problems (role parity with the reference's sparse_root family)."""
    res = root(quad, jnp.array([3.0, 3.0]), method=method)
    assert bool(res.success)
    np.testing.assert_allclose(np.asarray(res.x), [1.0, 2.0], atol=1e-6)

    def stiff(x):
        return jnp.array([jnp.exp(x[0]) - 2.0, 10.0 * x[1] + x[0] ** 3 - 1.3])

    res2 = root(stiff, jnp.array([5.0, -4.0]), method=method, maxiter=500)
    assert bool(res2.success)
    np.testing.assert_allclose(float(res2.x[0]), np.log(2.0), atol=1e-6)


@pytest.mark.parametrize("method", ["chord", "newton_nm"])
def test_extended_family_rosenbrock(method):
    """Globalized variants also handle the Rosenbrock-gradient root."""
    res = root(rosenbrock_grad, jnp.array([-1.2, 1.0]), method=method,
               maxiter=500)
    assert bool(res.success)
    np.testing.assert_allclose(np.asarray(res.x), [1.0, 1.0], atol=1e-5)


def test_chord_reuses_jacobian():
    """The chord iteration should need far fewer Jacobian factorizations
    than iterations (n_feval counts iters + refactors)."""
    from geconpy_tpu.ops.newton import chord_solve

    # nearly-linear system: one factorization should carry the whole solve
    def f(x):
        return x - 0.01 * jnp.tanh(x) - jnp.array([0.3, -0.7])

    res = chord_solve(f, jnp.zeros(2))
    assert bool(res.success)
    n_refactor = int(res.n_feval) - int(res.n_iter)
    assert n_refactor <= 2, (int(res.n_iter), n_refactor)


def test_gauss_newton_cg_vmap():
    from geconpy_tpu.ops.newton import gauss_newton_cg_solve

    def f(x, target):
        return jnp.array([x[0] ** 2 - target, x[1] - x[0]])

    targets = jnp.array([1.0, 4.0, 9.0])
    res = jax.vmap(lambda t: gauss_newton_cg_solve(
        f, jnp.array([2.0, 2.0]), args=(t,)))(targets)
    assert bool(jnp.all(res.success))
    np.testing.assert_allclose(np.asarray(res.x[:, 0]), [1.0, 2.0, 3.0],
                               atol=1e-6)


def test_newton_krylov_matches_newton_on_standard_fixtures():
    """The matrix-free GMRES direction reaches the same roots as dense
    Newton (reference: InexactNewtonKrylov, sparse_root/direction.py:124)."""
    import jax
    import jax.numpy as jnp

    from geconpy_tpu.ops.newton import newton_krylov_solve, newton_solve

    def broyden_tridiag(x):
        # banded nonlinear system — the stacked-time structure the Krylov
        # direction exists for
        xm = jnp.concatenate([jnp.zeros(1), x[:-1]])
        xp = jnp.concatenate([x[1:], jnp.zeros(1)])
        return (3.0 - 2.0 * x) * x - xm - 2.0 * xp + 1.0

    def exp_coupled(x):
        xm = jnp.concatenate([jnp.zeros(1), x[:-1]])
        return x - 0.4 * jnp.tanh(xm) + 0.2 * jnp.exp(-x) - 0.5

    for f, x0 in [(broyden_tridiag, -jnp.ones(30)),
                  (exp_coupled, jnp.zeros(24))]:
        ref = newton_solve(f, x0, tol=1e-10)
        got = jax.jit(lambda x, f=f: newton_krylov_solve(f, x, tol=1e-10))(x0)
        assert bool(ref.success) and bool(got.success)
        np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                                   rtol=1e-7, atol=1e-9)


def test_newton_krylov_never_materializes_jacobian():
    """Dimension large enough that a dense (d, d) Jacobian would be felt:
    the Krylov solve converges with only jvp evaluations."""
    import jax.numpy as jnp

    from geconpy_tpu.ops.newton import newton_krylov_solve

    d = 3000

    def f(x):
        # diagonally-dominant nonlinear tridiagonal system (bounded
        # condition number: unpreconditioned restarted GMRES territory —
        # a raw discrete Laplacian would need ~d inner iterations)
        xm = jnp.concatenate([jnp.zeros(1), x[:-1]])
        xp = jnp.concatenate([x[1:], jnp.zeros(1)])
        return 3 * x - 0.5 * xm - 0.5 * xp + 0.1 * jnp.exp(-x) - 0.05

    res = newton_krylov_solve(f, jnp.zeros(d), tol=1e-9, gmres_maxiter=40)
    assert bool(res.success), float(res.norm)
    assert float(res.norm) < 1e-8
