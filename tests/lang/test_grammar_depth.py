"""Grammar-depth tests: expression corners, statement suffixes, special
blocks, and distribution syntax, each pinned to an exact sympy form or AST
shape.

Coverage model: the reference's pyparsing grammar suites
(``gEconpy/tests/parser/grammar/test_expressions.py``,
``test_components.py``, ``test_blocks.py``, ``test_statements.py``,
``test_distributions.py``) — the cases here are hand-derived for this
parser, not ports.
"""

import pytest
import sympy as sp

from geconpy_tpu.lang import (
    GCNSyntaxError,
    ast_nodes as A,
    ast_to_sympy,
    parse_expression,
    parse_gcn,
)
from geconpy_tpu.lang.lexer import TokenKind, tokenize
from geconpy_tpu.symbolic import TimeAwareSymbol


def V(name, idx=0):
    return TimeAwareSymbol(name, idx, real=True)


def P(name):
    return sp.Symbol(name, real=True)


def as_sympy(text):
    return ast_to_sympy(parse_expression(text))


# ---------------------------------------------------------------------------
# numbers and lexical forms
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("text, value", [
    ("0", 0.0),
    ("7", 7.0),
    ("0.99", 0.99),
    (".5", 0.5),
    ("1e-5", 1e-5),
    ("1E6", 1e6),
    ("3.5E+2", 350.0),
    ("2.", 2.0),
])
def test_number_forms(text, value):
    node = parse_expression(text)
    assert isinstance(node, A.Number)
    assert node.value == pytest.approx(value)


def test_number_followed_by_ident_splits():
    # '2x' is NUMBER(2) IDENT(x) — the parser then rejects the trailing token
    toks = tokenize("2x")
    assert [t.kind for t in toks[:-1]] == [TokenKind.NUMBER, TokenKind.IDENT]
    with pytest.raises(GCNSyntaxError) as err:
        parse_expression("2x")
    assert err.value.code == "E017"


def test_identifier_with_underscores_and_digits():
    e = parse_expression("sigma_eps_2")
    assert isinstance(e, A.Parameter)
    assert e.name == "sigma_eps_2"


def test_leading_underscore_identifier():
    assert parse_expression("_tmp").name == "_tmp"


def test_comments_are_whitespace():
    e = parse_expression("a + # a comment with = and ; inside\n b")
    assert as_sympy("a + b") == ast_to_sympy(e)


# ---------------------------------------------------------------------------
# operator precedence and associativity (pinned to exact sympy forms)
# ---------------------------------------------------------------------------

def test_add_mul_precedence():
    assert as_sympy("a + b * c") == P("a") + P("b") * P("c")
    assert as_sympy("a * b + c") == P("a") * P("b") + P("c")


def test_div_binds_tighter_than_sub():
    assert as_sympy("a - b / c") == P("a") - P("b") / P("c")


def test_power_binds_tightest():
    assert as_sympy("a * b ^ c") == P("a") * P("b") ** P("c")
    assert as_sympy("a ^ b * c") == P("a") ** P("b") * P("c")


def test_subtraction_left_associative():
    assert as_sympy("a - b - c") == P("a") - P("b") - P("c")
    assert as_sympy("a - (b - c)") == P("a") - P("b") + P("c")


def test_division_left_associative():
    assert as_sympy("a / b / c") == P("a") / (P("b") * P("c"))
    assert as_sympy("a / (b / c)") == P("a") * P("c") / P("b")


def test_power_right_associative_both_spellings():
    assert as_sympy("2 ^ 3 ^ 2") == 512
    assert as_sympy("2 ** 3 ** 2") == 512
    assert as_sympy("2 ** 3 ^ 2") == 512
    assert as_sympy("(2 ^ 3) ^ 2") == 64


def test_unary_minus_binds_looser_than_power():
    assert as_sympy("-2 ^ 2") == -4
    assert as_sympy("(-2) ^ 2") == 4


def test_negative_exponent():
    assert as_sympy("2 ^ -3") == sp.Rational(1, 8)
    assert as_sympy("x ^ -alpha") == P("x") ** (-P("alpha"))
    assert as_sympy("2 ^ - - 3") == 8


def test_unary_plus_is_identity():
    assert as_sympy("+x") == P("x")
    assert as_sympy("a + +b") == P("a") + P("b")


def test_double_negation():
    assert as_sympy("a - -b") == P("a") + P("b")
    assert as_sympy("--a") == P("a")


def test_unary_minus_distributes_over_product_term():
    assert as_sympy("-a * b") == -P("a") * P("b")


def test_deeply_nested_parentheses():
    assert as_sympy("(((((a)))))") == P("a")
    assert as_sympy("((a + b) * ((c - d) / (e + f)))") == \
        (P("a") + P("b")) * (P("c") - P("d")) / (P("e") + P("f"))


def test_long_sum_chain():
    expr = " + ".join(f"x{i}" for i in range(12))
    assert as_sympy(expr) == sum(P(f"x{i}") for i in range(12))


# ---------------------------------------------------------------------------
# variables, time indices, expectations
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("text, name, idx", [
    ("X[]", "X", 0),
    ("X[0]", "X", 0),
    ("X[-1]", "X", -1),
    ("X[1]", "X", 1),
    ("X[-4]", "X", -4),
    ("X[3]", "X", 3),
    ("X[ss]", "X", "ss"),
    ("K_d[ss]", "K_d", "ss"),
])
def test_variable_index_forms(text, name, idx):
    node = parse_expression(text)
    assert isinstance(node, A.Variable)
    assert (node.name, node.time_index) == (name, idx)


@pytest.mark.parametrize("text", ["X[1.5]", "X[1e3]", "X[alpha]", "X[--1]"])
def test_bad_time_index_is_E008(text):
    with pytest.raises(GCNSyntaxError) as err:
        parse_expression(text)
    assert err.value.code == "E008"


def test_variable_vs_parameter_distinction():
    s = as_sympy("K[-1] * alpha")
    assert V("K", -1) in s.free_symbols
    assert P("alpha") in s.free_symbols
    assert not any(isinstance(f, TimeAwareSymbol) and f.base_name == "alpha"
                   for f in s.free_symbols)


def test_expectation_identity_under_re():
    assert as_sympy("E[][X[1]]") == V("X", 1)


def test_expectation_of_compound_expression():
    s = as_sympy("E[][lambda[1] / lambda[] * r[1]]")
    assert s == V("lambda", 1) / V("lambda", 0) * V("r", 1)


def test_expectation_information_set_index_ignored():
    # 'E[-1][...]' — the first bracket's content is accepted and discarded
    assert as_sympy("E[-1][X[1]]") == V("X", 1)


def test_nested_expectations():
    assert as_sympy("E[][E[][X[2]]]") == V("X", 2)


def test_bare_E_is_a_parameter():
    node = parse_expression("E + 1")
    assert as_sympy("E + 1") == P("E") + 1


# ---------------------------------------------------------------------------
# functions
# ---------------------------------------------------------------------------

def test_nested_function_calls():
    assert as_sympy("log(exp(x))") == sp.log(sp.exp(P("x")))
    assert as_sympy("sqrt(x ^ 2 + y ^ 2)") == \
        sp.sqrt(P("x") ** 2 + P("y") ** 2)


def test_two_argument_functions():
    assert as_sympy("max(a, b)") == sp.Max(P("a"), P("b"))
    assert as_sympy("min(a, 0)") == sp.Min(P("a"), 0)


def test_ln_is_log():
    assert as_sympy("ln(x)") == sp.log(P("x"))


def test_function_names_case_insensitive():
    assert as_sympy("LOG(x)") == sp.log(P("x"))
    assert as_sympy("Exp(x)") == sp.exp(P("x"))


def test_unknown_function_suggestion():
    from geconpy_tpu.lang.errors import GCNSemanticError

    with pytest.raises(GCNSemanticError) as err:
        as_sympy("lgo(x)")
    assert err.value.code == "E017"
    assert "log" in err.value.suggestions


def test_function_call_with_expression_args():
    assert as_sympy("log(C[] - chabb * C[-1])") == \
        sp.log(V("C") - P("chabb") * V("C", -1))


# ---------------------------------------------------------------------------
# economics-shaped expressions (hand-derived exact forms)
# ---------------------------------------------------------------------------

def test_crra_utility():
    s = as_sympy("(C[] ^ (1 - sigma) - 1) / (1 - sigma)")
    sigma = P("sigma")
    assert sp.simplify(s - (V("C") ** (1 - sigma) - 1) / (1 - sigma)) == 0


def test_habit_utility():
    s = as_sympy("(C[] - h * C[-1]) ^ (1 - sigma) / (1 - sigma)")
    h, sigma = P("h"), P("sigma")
    expected = (V("C") - h * V("C", -1)) ** (1 - sigma) / (1 - sigma)
    assert sp.simplify(s - expected) == 0


def test_cobb_douglas_production():
    s = as_sympy("A[] * K[-1] ^ alpha * L[] ^ (1 - alpha)")
    alpha = P("alpha")
    assert s == V("A") * V("K", -1) ** alpha * V("L") ** (1 - alpha)


def test_ces_aggregator():
    s = as_sympy("(omega * K[-1] ^ rho + (1 - omega) * L[] ^ rho) ^ (1 / rho)")
    omega, rho = P("omega"), P("rho")
    expected = (omega * V("K", -1) ** rho
                + (1 - omega) * V("L") ** rho) ** (1 / rho)
    assert sp.simplify(s - expected) == 0


def test_euler_equation_residual():
    s = as_sympy(
        "C[] ^ -sigma - beta * E[][C[1] ^ -sigma * (1 + r[1] - delta)]")
    sigma, beta, delta = P("sigma"), P("beta"), P("delta")
    expected = V("C") ** -sigma - beta * (
        V("C", 1) ** -sigma * (1 + V("r", 1) - delta))
    assert sp.simplify(s - expected) == 0


def test_taylor_rule_with_smoothing():
    s = as_sympy(
        "rho_r * r[-1] + (1 - rho_r) * (phi_pi * pi[] + phi_y * y[]) + e_m[]")
    rho_r, phi_pi, phi_y = P("rho_r"), P("phi_pi"), P("phi_y")
    expected = (rho_r * V("r", -1)
                + (1 - rho_r) * (phi_pi * V("pi") + phi_y * V("y"))
                + V("e_m"))
    assert sp.expand(s - expected) == 0


def test_investment_adjustment_cost():
    s = as_sympy("I[] * (1 - kappa / 2 * (I[] / I[-1] - 1) ^ 2)")
    kappa = P("kappa")
    expected = V("I") * (1 - kappa / 2 * (V("I") / V("I", -1) - 1) ** 2)
    assert sp.simplify(s - expected) == 0


def test_log_ar1():
    s = as_sympy("rho * log(A[-1]) + (1 - rho) * log(A[ss]) + eps_A[]")
    rho = P("rho")
    expected = (rho * sp.log(V("A", -1))
                + (1 - rho) * sp.log(TimeAwareSymbol("A", "ss", real=True))
                + V("eps_A"))
    assert sp.expand(s - expected) == 0


def test_deep_lead_and_lag_mix():
    s = as_sympy("a * X[2] + b * X[1] + c * X[] + d * X[-1] + e * X[-2]")
    assert {f.time_index for f in s.free_symbols
            if isinstance(f, TimeAwareSymbol)} == {-2, -1, 0, 1, 2}


# ---------------------------------------------------------------------------
# equation statements: suffix combinations
# ---------------------------------------------------------------------------

def _one_block(body):
    return parse_gcn("block B\n{\n" + body + "\n};")


def test_multiplier_and_calibrating_together():
    m = _one_block("""
    constraints { C[] + I[] = Y[] : lambda[] -> alpha; };
    """)
    eq = m.blocks[0].get("constraints").equations[0]
    assert eq.multiplier == "lambda"
    assert eq.calibrating_parameter == "alpha"


def test_multiple_tags_accumulate():
    m = _one_block("""
    identities { @exclude @minimize X[] = Y[]; };
    """)
    eq = m.blocks[0].get("identities").equations[0]
    assert eq.tags == ("exclude", "minimize")


def test_tag_suggestion_on_typo():
    with pytest.raises(GCNSyntaxError) as err:
        _one_block("identities { @exclud X[] = 1; };")
    assert err.value.code == "E020"
    assert "exclude" in err.value.suggestions


def test_multiplier_must_be_time_t():
    with pytest.raises(GCNSyntaxError) as err:
        _one_block("constraints { C[] = Y[] : lambda[-1]; };")
    assert err.value.code == "E015"


def test_multiplier_must_be_identifier():
    with pytest.raises(GCNSyntaxError) as err:
        _one_block("constraints { C[] = Y[] : 5; };")
    assert err.value.code == "E015"


def test_calibrating_target_not_variable():
    with pytest.raises(GCNSyntaxError) as err:
        _one_block("calibration { K[ss] / Y[ss] = 10 -> alpha[]; };")
    assert err.value.code == "E016"


def test_equation_spanning_multiple_lines():
    m = _one_block("""
    identities {
        Y[] = C[]
            + I[]
            + G[];
    };
    """)
    eq = m.blocks[0].get("identities").equations[0]
    s = ast_to_sympy(eq.rhs)
    assert s == V("C") + V("I") + V("G")


# ---------------------------------------------------------------------------
# distribution statements
# ---------------------------------------------------------------------------

def test_distribution_positional_and_keyword_mix():
    m = _one_block("""
    identities { X[] = rho; };
    calibration { rho ~ Beta(2, beta=5) = 0.9; };
    """)
    d = m.blocks[0].get("calibration").distributions[0]
    assert d.args[0].name is None
    assert isinstance(d.args[0].value, A.Number)
    assert d.args[0].value.value == 2.0
    assert d.args[1].name == "beta"
    assert d.initial_value == 0.9


def test_distribution_negative_initial_value():
    m = _one_block("""
    identities { X[] = mu; };
    calibration { mu ~ Normal(mu=0, sigma=1) = -0.5; };
    """)
    d = m.blocks[0].get("calibration").distributions[0]
    assert d.initial_value == -0.5


def test_truncated_wrapper_distribution():
    m = _one_block("""
    identities { X[] = s; };
    calibration { s ~ Truncated(Normal(mu=0, sigma=1), lower=0) = 0.5; };
    """)
    d = m.blocks[0].get("calibration").distributions[0]
    assert d.dist_name == "Truncated"
    inner = d.args[0].value
    assert isinstance(inner, A.GCNDistribution)
    assert inner.dist_name == "Normal"
    lower = [a for a in d.args if a.name == "lower"][0]
    assert isinstance(lower.value, A.Number)


def test_distribution_arg_arithmetic_expression():
    m = _one_block("""
    identities { X[] = s; };
    shocks { eps[] ~ Normal(mu=0, sigma=2 * s_base); };
    calibration { s = 1; s_base = 0.1; };
    """)
    d = m.blocks[0].get("shocks").distributions[0]
    sigma = [a for a in d.args if a.name == "sigma"][0]
    assert isinstance(sigma.value, A.BinaryOp)


def test_distribution_missing_tilde_is_E005():
    # without '~' the statement is parsed as an equation; 'rho Beta(...)'
    # then fails the missing-equals production
    with pytest.raises(GCNSyntaxError) as err:
        _one_block("calibration { rho Beta(alpha=1, beta=1) = 0.5; };")
    assert err.value.code == "E005"


def test_shock_distribution_target_index():
    m = _one_block("""
    identities { X[] = eps[]; };
    shocks { eps[] ~ Normal(mu=0, sigma=0.01); };
    """)
    d = m.blocks[0].get("shocks").distributions[0]
    assert d.target == "eps"
    assert d.target_time_index == 0


def test_parameter_distribution_has_no_target_index():
    m = _one_block("""
    identities { X[] = rho; };
    calibration { rho ~ Beta(alpha=2, beta=2) = 0.5; };
    """)
    d = m.blocks[0].get("calibration").distributions[0]
    assert d.target_time_index is None


# ---------------------------------------------------------------------------
# special blocks
# ---------------------------------------------------------------------------

def test_options_value_types():
    m = parse_gcn("""
    options
    {
        output logfile = TRUE;
        output LaTeX = false;
        periods = 200;
        shock scale = -1.5;
        solver = gensys;
    };
    block B { identities { X[] = 1; }; };
    """)
    assert m.options["output logfile"] is True
    assert m.options["output LaTeX"] is False
    assert m.options["periods"] == 200.0
    assert m.options["shock scale"] == -1.5
    assert m.options["solver"] == "gensys"


def test_tryreduce_accumulates_across_blocks():
    m = parse_gcn("""
    tryreduce { U[], TC[]; };
    tryreduce { PI[]; };
    block B { identities { U[] = TC[] + PI[] + X[]; }; };
    """)
    assert [v.name for v in m.tryreduce] == ["U", "TC", "PI"]


def test_assumptions_merge_duplicate_groups():
    m = parse_gcn("""
    assumptions
    {
        positive { K[], alpha; };
    };
    assumptions
    {
        positive { beta; };
        real { Z[]; };
    };
    block B { identities { K[] = alpha * beta + Z[]; }; };
    """)
    assert m.assumptions["positive"] == ("K", "alpha", "beta")
    assert m.assumptions["real"] == ("Z",)


def test_empty_options_block():
    m = parse_gcn("options { }; block B { identities { X[] = 1; }; };")
    assert m.options == {}


def test_assumptions_apply_to_sympy_symbols():
    m = parse_gcn("""
    assumptions { positive { K[], alpha; }; };
    block B { identities { Y[] = K[-1] ^ alpha; }; };
    """)
    assumption_map = {name: {group: True}
                      for group, names in m.assumptions.items()
                      for name in names}
    eq = m.blocks[0].get("identities").equations[0]
    s = ast_to_sympy(eq.rhs, assumption_map)
    K = [f for f in s.free_symbols if isinstance(f, TimeAwareSymbol)][0]
    assert K.is_positive
    alpha = [f for f in s.free_symbols if not isinstance(f, TimeAwareSymbol)][0]
    assert alpha.is_positive


# ---------------------------------------------------------------------------
# file-level structure and errors
# ---------------------------------------------------------------------------

def test_component_name_case_insensitive():
    m = parse_gcn("block B { IDENTITIES { X[] = 1; }; };")
    assert m.blocks[0].components[0].name == "identities"


def test_component_suggestion_on_typo():
    with pytest.raises(GCNSyntaxError) as err:
        parse_gcn("block B { identites { X[] = 1; }; };")
    assert err.value.code == "E010"
    assert "identities" in err.value.suggestions


def test_top_level_suggestion():
    with pytest.raises(GCNSyntaxError) as err:
        parse_gcn("blocks B { identities { X[] = 1; }; };")
    assert err.value.code == "E009"
    assert "block" in err.value.suggestions


def test_unterminated_component_E002():
    with pytest.raises(GCNSyntaxError) as err:
        parse_gcn("block B { identities { X[] = 1;")
    assert err.value.code == "E002"


def test_error_location_column_points_at_token():
    src = "block B { identities { X[] = ; }; };"
    with pytest.raises(GCNSyntaxError) as err:
        parse_gcn(src)
    loc = err.value.loc
    assert src[loc.column] == ";"


def test_error_rendering_contains_catalog_fix():
    with pytest.raises(GCNSyntaxError) as err:
        parse_gcn("block B { identities { X[] = 1 }; };")
    text = str(err.value)
    assert "error[E003]" in text
    assert "fix:" in text


def test_multiple_components_preserve_order():
    m = parse_gcn("""
    block HOUSEHOLD
    {
        definitions { u[] = log(C[]); };
        controls { C[], K[]; };
        objective { U[] = u[] + beta * E[][U[1]]; };
        constraints { C[] + K[] = r[] * K[-1] : lambda[]; };
        calibration { beta = 0.99; };
    };
    """)
    assert [c.name for c in m.blocks[0].components] == [
        "definitions", "controls", "objective", "constraints", "calibration"]
