"""Depth tests for the sympy -> JAX lowering (codegen/lower.py).

The reference's bridge is exercised implicitly through every compiled model
(gEconpy/model/compile.py); lowering bugs are silent — a mis-printed
function evaluates without error and poisons every downstream Jacobian.
These tests pin the printer against sympy-evaluated oracles: exact values
on hand-picked expressions, fuzzed random expression trees, and autodiff
vs symbolic-derivative agreement.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import sympy as sp

from geconpy_tpu.codegen.lower import lower_to_jax

x, y, z = sp.symbols("x y z", real=True)


def _eval1(expr, vals, **kw):
    """Lower [expr] over (x, y, z) and evaluate at vals."""
    f = lower_to_jax([expr], [("v", [x, y, z])], **kw)
    return float(f(jnp.asarray(vals, dtype=jnp.float64))[0])


def _oracle(expr, vals):
    return float(sp.lambdify([x, y, z], expr, "numpy")(*vals))


# ---------------------------------------------------------------------------
# special functions (the gamma/erf family used by GCN priors)
# ---------------------------------------------------------------------------

SPECIAL = [
    sp.erf(x), sp.erfc(x), sp.gamma(x), sp.loggamma(x), sp.digamma(x),
    sp.polygamma(1, x), sp.tanh(x), sp.cosh(x), sp.sinh(x), sp.atan(x),
    sp.atan2(y, x), sp.asinh(x), sp.floor(3 * x), sp.ceiling(3 * x),
    sp.Mod(5 * x, sp.Integer(2)), sp.Heaviside(x - sp.Rational(1, 2)),
]


@pytest.mark.parametrize("expr", SPECIAL, ids=lambda e: sp.srepr(e)[:40])
def test_special_function_values(expr):
    vals = (0.7, -1.3, 2.1)
    import scipy.special  # noqa: F401  (lambdify 'numpy' handles these via scipy)

    f = sp.lambdify([x, y, z], expr, ["numpy", "scipy"])
    ref = float(f(*vals))
    got = _eval1(expr, vals)
    np.testing.assert_allclose(got, ref, rtol=5e-6, atol=1e-12)


def test_erf_gradient_traces_and_matches():
    f = lower_to_jax([sp.erf(x / 2)], [("v", [x, y, z])])
    g = float(jax.grad(lambda v: f(v)[0])(jnp.array([0.8, 0.0, 0.0]))[0])
    ref = math.exp(-0.16) / math.sqrt(math.pi)  # d/dx erf(x/2)
    np.testing.assert_allclose(g, ref, rtol=1e-6)


# ---------------------------------------------------------------------------
# conditionals and extrema (OccBin-style kink terms)
# ---------------------------------------------------------------------------

def test_piecewise_three_branches():
    expr = sp.Piecewise((x**2, x < -1), (sp.exp(x), x < 1), (2 * x, True))
    for v in (-2.0, 0.3, 4.0):
        np.testing.assert_allclose(
            _eval1(expr, (v, 0, 0)), _oracle(expr, (v, 0, 0)), rtol=1e-6)


def test_piecewise_gradient_per_branch():
    expr = sp.Piecewise((x**2, x < 0), (3 * x, True))
    f = lower_to_jax([expr], [("v", [x, y, z])])

    def scalar(v):
        return f(jnp.array([v, 0.0, 0.0]))[0]

    assert float(jax.grad(scalar)(-2.0)) == pytest.approx(-4.0)
    assert float(jax.grad(scalar)(5.0)) == pytest.approx(3.0)


def test_min_max_nested_and_grad():
    expr = sp.Max(sp.Min(x, y), z)
    vals = (0.4, -0.2, 0.1)
    np.testing.assert_allclose(_eval1(expr, vals), _oracle(expr, vals))
    f = lower_to_jax([expr], [("v", [x, y, z])])
    g = jax.grad(lambda v: f(v)[0])(jnp.array([0.4, -0.2, 0.1]))
    # max(min(0.4, -0.2), 0.1) = max(-0.2, 0.1) = 0.1 -> grad flows to z only
    np.testing.assert_allclose(np.asarray(g), [0.0, 0.0, 1.0])


def test_abs_and_sign():
    expr = sp.Abs(x) * sp.sign(y)
    for vals in [(0.5, -2.0, 0.0), (-1.5, 3.0, 0.0)]:
        np.testing.assert_allclose(_eval1(expr, vals), _oracle(expr, vals))


# ---------------------------------------------------------------------------
# numeric literals and powers
# ---------------------------------------------------------------------------

def test_negative_and_fractional_powers():
    for expr in [x**-3, x**sp.Rational(-1, 2), x**sp.Rational(7, 3),
                 (x + y)**-1, 2**x, sp.Rational(3, 2)**x]:
        vals = (1.7, 0.4, 0.0)
        np.testing.assert_allclose(
            _eval1(expr, vals), _oracle(expr, vals), rtol=1e-6)


def test_constants_pi_e_exact():
    got = _eval1(sp.pi * x + sp.E * y + sp.sqrt(sp.Integer(2)) * z,
                 (1.0, 1.0, 1.0))
    np.testing.assert_allclose(got, math.pi + math.e + math.sqrt(2),
                               rtol=1e-12)


def test_constant_only_output():
    f = lower_to_jax([sp.Rational(22, 7), sp.Integer(-3)], [("v", [x])])
    np.testing.assert_allclose(np.asarray(f(jnp.array([0.0]))),
                               [22 / 7, -3.0], rtol=1e-12)


def test_big_integer_coefficients_stay_exact():
    # 2**40 + 1 is representable in float64 but not float32: the printed
    # literal must be the exact integer, conversion happens at trace time
    big = sp.Integer(2**40 + 1)
    f = lower_to_jax([big * x], [("v", [x])])
    assert "1099511627777" in f.source


# ---------------------------------------------------------------------------
# symbol mangling
# ---------------------------------------------------------------------------

def test_python_keyword_symbol_names():
    lam, cls = sp.Symbol("lambda"), sp.Symbol("class")
    f = lower_to_jax([lam + 2 * cls], [("p", [lam, cls])])
    np.testing.assert_allclose(float(f(jnp.array([1.0, 3.0]))[0]), 7.0)


def test_unicode_and_punctuated_names():
    a = sp.Symbol("α")          # allowed by sympy, not ascii-alnum
    b = sp.Symbol("K[ss]")      # brackets must mangle away
    c = sp.Symbol("1st")        # leading digit
    f = lower_to_jax([a + b + c], [("p", [a, b, c])])
    np.testing.assert_allclose(float(f(jnp.array([1.0, 2.0, 4.0]))[0]), 7.0)


def test_mangling_no_collisions_across_similar_names():
    # distinct sympy symbols whose raw names differ only in punctuation must
    # stay distinct after mangling
    s1, s2 = sp.Symbol("a_b"), sp.Symbol("a.b")
    f = lower_to_jax([s1 - s2], [("p", [s1, s2])])
    got = float(f(jnp.array([5.0, 3.0]))[0])
    np.testing.assert_allclose(got, 2.0)


# ---------------------------------------------------------------------------
# CSE
# ---------------------------------------------------------------------------

def test_cse_chain_three_deep():
    u = sp.log(x + y)
    v = sp.exp(u) + u
    w = v * u + sp.sin(v)
    f = lower_to_jax([w, v, u], [("v", [x, y, z])], cse=True)
    vals = (1.4, 0.3, 0.0)
    ref = [_oracle(e, vals) for e in (w, v, u)]
    np.testing.assert_allclose(
        np.asarray(f(jnp.array(vals))), ref, rtol=1e-6)
    # the shared log is emitted once (printer may qualify it either way)
    assert f.source.count("log(") == 1


def test_cse_does_not_change_gradients():
    expr = sp.exp(x * y) * sp.log(1 + sp.exp(x * y)) + sp.cos(x * y)
    f1 = lower_to_jax([expr], [("v", [x, y, z])], cse=True)
    f2 = lower_to_jax([expr], [("v", [x, y, z])], cse=False)
    v = jnp.array([0.7, -0.4, 0.0])
    g1 = jax.grad(lambda a: f1(a)[0])(v)
    g2 = jax.grad(lambda a: f2(a)[0])(v)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6)


# ---------------------------------------------------------------------------
# autodiff vs symbolic-derivative oracle
# ---------------------------------------------------------------------------

DIFF_CASES = [
    x * sp.exp(-(y**2)) + sp.log(x + 2) * z,
    sp.sqrt(x**2 + y**2 + z**2 + sp.Rational(1, 10)),
    x**y,                                     # requires x > 0
    sp.atan2(y, x) + sp.tanh(x * z),
    (1 - sp.exp(-x)) / (x + sp.Rational(1, 2)),
]


@pytest.mark.parametrize("expr", DIFF_CASES, ids=lambda e: str(e)[:40])
def test_jacfwd_matches_symbolic_gradient(expr):
    vals = (0.8, -0.6, 1.3)
    f = lower_to_jax([expr], [("v", [x, y, z])])
    got = np.asarray(jax.jacfwd(f)(jnp.asarray(vals, dtype=jnp.float64)))[0]
    ref = [_oracle(sp.diff(expr, s), vals) for s in (x, y, z)]
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-10)


def test_second_derivatives_match():
    expr = sp.exp(x * y) + x**3 * y
    vals = (0.5, -0.7, 0.0)
    f = lower_to_jax([expr], [("v", [x, y, z])])
    H = np.asarray(jax.hessian(lambda v: f(v)[0])(
        jnp.asarray(vals, dtype=jnp.float64)))
    for i, si in enumerate((x, y, z)):
        for j, sj in enumerate((x, y, z)):
            ref = _oracle(sp.diff(expr, si, sj), vals)
            np.testing.assert_allclose(H[i, j], ref, rtol=1e-6, atol=1e-10,
                                       err_msg=f"d2/d{si}d{sj}")


# ---------------------------------------------------------------------------
# fuzz: random expression trees vs sympy's own numeric evaluation
# ---------------------------------------------------------------------------

def _random_expr(rng, depth):
    """Random smooth expression over x, y with bounded magnitudes."""
    if depth == 0:
        choice = rng.integers(0, 3)
        if choice == 0:
            return x
        if choice == 1:
            return y
        return sp.Rational(int(rng.integers(-3, 4)), int(rng.integers(1, 4)))
    op = rng.integers(0, 6)
    a = _random_expr(rng, depth - 1)
    if op == 0:
        return a + _random_expr(rng, depth - 1)
    if op == 1:
        return a * _random_expr(rng, depth - 1)
    if op == 2:
        return sp.exp(a / 4)
    if op == 3:
        return sp.log(a**2 + 1)
    if op == 4:
        return sp.sin(a)
    return sp.tanh(a)


def test_fuzz_random_trees_match_sympy_evalf():
    rng = np.random.default_rng(20260819)
    n_checked = 0
    for _ in range(40):
        expr = _random_expr(rng, 3)
        if not expr.free_symbols:
            continue
        f = lower_to_jax([expr], [("v", [x, y, z])], cse=True)
        for _ in range(3):
            vx, vy = rng.uniform(-1.5, 1.5, size=2)
            ref = complex(expr.evalf(subs={x: vx, y: vy}))
            assert abs(ref.imag) < 1e-12
            got = float(f(jnp.array([vx, vy, 0.0], dtype=jnp.float64))[0])
            np.testing.assert_allclose(got, ref.real, rtol=1e-8, atol=1e-10,
                                       err_msg=str(expr))
            n_checked += 1
    assert n_checked >= 60  # fuzz actually exercised real trees


# ---------------------------------------------------------------------------
# shape / composition contracts
# ---------------------------------------------------------------------------

def test_empty_output_list():
    f = lower_to_jax([], [("v", [x])])
    out = f(jnp.array([1.0]))
    assert out.shape == (0,)


def test_matrix_output_row_major_order():
    M = sp.Matrix([[x, 2 * x, 3 * x], [y, 2 * y, 3 * y]])
    f = lower_to_jax(M, [("v", [x, y, z])])
    out = np.asarray(f(jnp.array([1.0, 10.0, 0.0])))
    np.testing.assert_allclose(out, [[1, 2, 3], [10, 20, 30]])


def test_vmap_over_lowered_function():
    f = lower_to_jax([x * y, x - y], [("v", [x, y, z])])
    batch = jnp.stack([jnp.array([1.0, 2.0, 0.0]),
                       jnp.array([3.0, 4.0, 0.0])])
    out = np.asarray(jax.vmap(f)(batch))
    np.testing.assert_allclose(out, [[2, -1], [12, -1]])


def test_duplicate_symbol_across_groups_last_slot_wins():
    # the same symbol listed in two groups reads from exactly one slot at
    # run time — pin the behavior: the later group's binding shadows the
    # earlier one (dicts and sequential assignment both make this stable)
    f = lower_to_jax([x], [("a", [x]), ("b", [x])])
    got = float(f(jnp.array([1.0]), jnp.array([2.0]))[0])
    assert got == 2.0
