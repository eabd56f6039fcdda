"""sympy -> JAX lowering unit tests (codegen/lower.py).

Reference role: the sympy -> pytensor bridge (gEconpy/model/compile.py:
sympy_to_pytensor:104, build_symbolic_jacobians:163, pack_and_compile:402),
re-designed as source generation of jittable functions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import sympy as sp

from geconpy_tpu.codegen.lower import _FN_CACHE, lower_to_jax
from geconpy_tpu.symbolic import TimeAwareSymbol

x, y = sp.symbols("x y", real=True)
alpha = sp.Symbol("alpha", real=True, positive=True)


def test_basic_evaluation():
    f = lower_to_jax([x + y, x * y], [("vars", [x, y])])
    out = f(jnp.array([2.0, 3.0]))
    np.testing.assert_allclose(np.asarray(out), [5.0, 6.0])
    assert f.output_shape == (2,)


def test_multiple_groups_packing():
    f = lower_to_jax([alpha * x + y], [("vars", [x, y]), ("params", [alpha])])
    out = f(jnp.array([2.0, 10.0]), jnp.array([0.5]))
    np.testing.assert_allclose(np.asarray(out), [11.0])


def test_matrix_output_shape():
    M = sp.Matrix([[x, y], [x * y, x - y]])
    f = lower_to_jax(M, [("vars", [x, y])])
    out = f(jnp.array([3.0, 2.0]))
    assert out.shape == (2, 2)
    np.testing.assert_allclose(np.asarray(out), [[3, 2], [6, 1]])


def test_missing_symbol_raises():
    z = sp.Symbol("z")
    with pytest.raises(ValueError, match="not present in any input group"):
        lower_to_jax([x + z], [("vars", [x])])


def test_unused_symbols_allowed():
    f = lower_to_jax([x], [("vars", [x, y])])  # y unused
    np.testing.assert_allclose(np.asarray(f(jnp.array([7.0, 9.0]))), [7.0])


def test_rationals_are_float_safe():
    # Rational(1,3) must not truncate to integer division of ints
    f = lower_to_jax([sp.Rational(1, 3) * x], [("vars", [x])])
    np.testing.assert_allclose(float(f(jnp.array([3.0]))[0]), 1.0, rtol=1e-12)


def test_special_functions_lower_to_jnp():
    f = lower_to_jax([sp.log(x), sp.exp(y), sp.sqrt(x)], [("vars", [x, y])])
    out = np.asarray(f(jnp.array([4.0, 0.5])))
    np.testing.assert_allclose(out, [np.log(4), np.exp(0.5), 2.0], rtol=1e-12)


def test_time_aware_symbols_mangled_uniquely():
    C, Cm1 = TimeAwareSymbol("C", 0, real=True), TimeAwareSymbol("C", -1, real=True)
    f = lower_to_jax([C - 0.9 * Cm1], [("now", [C]), ("lag", [Cm1])])
    out = f(jnp.array([1.0]), jnp.array([1.0]))
    np.testing.assert_allclose(np.asarray(out), [0.1], rtol=1e-12)


def test_cse_shares_subexpressions():
    big = sp.log(x + y)
    f = lower_to_jax([big + 1, big * 2, sp.sin(big)], [("vars", [x, y])], cse=True)
    # the shared subexpression is computed exactly once (one CSE assignment)
    assert f.source.count("log(") == 1
    v = np.log(1.5)
    np.testing.assert_allclose(
        np.asarray(f(jnp.array([1.0, 0.5]))), [v + 1, 2 * v, np.sin(v)],
        rtol=1e-12)


def test_no_cse_still_correct():
    f = lower_to_jax([sp.exp(x) + sp.exp(x)], [("vars", [x])], cse=False)
    np.testing.assert_allclose(float(f(jnp.array([0.0]))[0]), 2.0)


def test_source_cache_reuses_function():
    before = len(_FN_CACHE)
    f1 = lower_to_jax([x + 1], [("vars", [x])], name="cached_fn_test")
    f2 = lower_to_jax([x + 1], [("vars", [x])], name="cached_fn_test")
    assert f1.fn is f2.fn
    assert len(_FN_CACHE) == before + 1


def test_jit_grad_vmap_compose():
    f = lower_to_jax([alpha * sp.log(x)], [("vars", [x]), ("params", [alpha])])

    def scalar(v, p):
        return f(v, p)[0]

    g = jax.grad(scalar)(jnp.array([2.0]), jnp.array([3.0]))
    np.testing.assert_allclose(float(g[0]), 1.5, rtol=1e-12)

    batched = jax.jit(jax.vmap(scalar, in_axes=(0, None)))
    vals = batched(jnp.array([[1.0], [np.e]]), jnp.array([1.0]))
    np.testing.assert_allclose(np.asarray(vals), [0.0, 1.0], rtol=1e-12)


def test_jacfwd_matches_symbolic_derivative():
    # the design choice: Jacobians come from jacfwd on the lowered residual
    exprs = [x**2 * y, sp.sin(x) + y**3]
    f = lower_to_jax(exprs, [("vars", [x, y])])
    J = jax.jacfwd(f)(jnp.array([1.2, 0.7]))
    J_sym = sp.Matrix(exprs).jacobian([x, y])
    J_ref = np.array(J_sym.subs({x: 1.2, y: 0.7}), dtype=float)
    np.testing.assert_allclose(np.asarray(J), J_ref, rtol=1e-10)


def test_empty_outputs():
    f = lower_to_jax([], [("vars", [x])])
    assert f(jnp.array([1.0])).shape == (0,)
