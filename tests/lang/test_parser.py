import pathlib

import pytest
import sympy as sp

from geconpy_tpu.lang import (
    GCNSyntaxError,
    ast_nodes as A,
    ast_to_sympy,
    parse_expression,
    parse_gcn,
    print_expression,
    print_model,
    tokenize,
    full_validation,
)
from geconpy_tpu.lang.lexer import TokenKind
from geconpy_tpu.symbolic import TimeAwareSymbol

DATA = pathlib.Path(__file__).parents[2] / "geconpy_tpu" / "data"


# ---- lexer -------------------------------------------------------------

def test_tokenize_basics():
    toks = tokenize("C[] + K[-1] ^ alpha -> beta; # comment\nE[][U[1]]")
    kinds = [t.kind for t in toks]
    assert TokenKind.ARROW in kinds
    assert kinds[-1] is TokenKind.EOF
    assert toks[0].text == "C"


def test_tokenize_numbers():
    toks = tokenize("0.99 1e-5 3.5E+2 7")
    values = [t.text for t in toks[:-1]]
    assert values == ["0.99", "1e-5", "3.5E+2", "7"]


def test_tokenize_double_star_is_power():
    toks = tokenize("x ** 2")
    assert toks[1].kind is TokenKind.CARET


def test_tokenize_bad_char():
    with pytest.raises(GCNSyntaxError) as err:
        tokenize("C[] $ K[]")
    assert err.value.code == "E001"


# ---- expressions --------------------------------------------------------

def test_power_right_associative():
    e = parse_expression("2 ^ 3 ^ 2")
    s = ast_to_sympy(e)
    assert s == 512


def test_precedence():
    assert ast_to_sympy(parse_expression("2 + 3 * 4")) == 14
    assert ast_to_sympy(parse_expression("(2 + 3) * 4")) == 20
    assert ast_to_sympy(parse_expression("-2 ^ 2")) == -4  # unary binds looser than ^


def test_variable_indices():
    e = parse_expression("X[-2] + X[] + X[2] + X[ss]")
    vars_ = {(v.name, v.time_index) for v in A.collect(e, A.Variable)}
    assert vars_ == {("X", -2), ("X", 0), ("X", 2), ("X", "ss")}


def test_expectation():
    e = parse_expression("E[][U[1] + C[1]]")
    assert isinstance(e, A.Expectation)
    s = ast_to_sympy(e)
    assert TimeAwareSymbol("U", 1, real=True) in s.free_symbols


def test_function_call():
    s = ast_to_sympy(parse_expression("log(A[]) - rho * log(A[-1])"))
    A0 = TimeAwareSymbol("A", 0, real=True)
    assert sp.log(A0) in s.args or s.has(sp.log)


def test_sympify_division_and_power():
    s = ast_to_sympy(parse_expression("K[-1] ^ alpha * L[] ^ (1 - alpha)"))
    K = TimeAwareSymbol("K", -1, real=True)
    alpha = sp.Symbol("alpha", real=True)
    assert s.has(K**alpha)


# ---- statements / blocks -------------------------------------------------

def test_parse_rbc_file():
    src = (DATA / "rbc.gcn").read_text()
    model = parse_gcn(src, "rbc.gcn")
    assert [b.name for b in model.blocks] == ["STEADY_STATE", "HOUSEHOLD", "FIRM", "TECHNOLOGY"]
    assert {v.name for v in model.tryreduce} == {"U", "TC"}

    hh = model.get_block("HOUSEHOLD")
    controls = hh.get("controls")
    assert [v.name for v in controls.variables] == ["C", "L", "I", "K"]

    constraints = hh.get("constraints")
    assert constraints.equations[0].multiplier == "lambda"
    assert constraints.equations[1].multiplier is None

    cal = hh.get("calibration")
    assert len(cal.equations) == 4

    firm = model.get_block("FIRM")
    assert firm.get("constraints").equations[0].multiplier == "mc"

    tech = model.get_block("TECHNOLOGY")
    assert [v.name for v in tech.get("shocks").variables] == ["epsilon_A"]

    full_validation(model)  # should not raise


def test_parse_options_and_assumptions():
    src = """
    options
    {
        output logfile = TRUE;
        output LaTeX = FALSE;
    };
    assumptions
    {
        positive { K[], alpha, beta; };
        negative { TC[]; };
    };
    block B
    {
        identities { K[] = alpha + beta + TC[]; };
        calibration { alpha = 0.3; beta = 0.9; };
    };
    """
    model = parse_gcn(src)
    assert model.options == {"output logfile": True, "output LaTeX": False}
    assert model.assumptions["positive"] == ("K", "alpha", "beta")
    assert model.assumptions["negative"] == ("TC",)


def test_parse_distributions():
    src = """
    block B
    {
        identities { log(A[]) = rho * log(A[-1]) + eps[]; };
        shocks { eps[] ~ Normal(mu=0, sigma=sigma_eps); };
        calibration
        {
            rho ~ Beta(alpha=2, beta=5) = 0.95;
            sigma_eps ~ InverseGamma(alpha=3, beta=0.5) = 0.01;
            theta ~ maxent(Gamma(), lower=1.01, upper=10.0, mass=0.99) = 1.5;
        };
    };
    """
    model = parse_gcn(src)
    cal = model.blocks[0].get("calibration")
    dists = {d.target: d for d in cal.distributions}
    assert dists["rho"].dist_name == "Beta"
    assert dists["rho"].initial_value == 0.95
    assert dists["theta"].dist_name == "maxent"
    # nested wrapped distribution
    inner = dists["theta"].args[0]
    assert inner.name is None and isinstance(inner.value, A.GCNDistribution)
    assert inner.value.dist_name == "Gamma"

    shocks = model.blocks[0].get("shocks")
    assert shocks.distributions[0].target == "eps"
    assert shocks.distributions[0].target_time_index == 0
    # shock sigma references a hyperparameter
    sigma_arg = [a for a in shocks.distributions[0].args if a.name == "sigma"][0]
    assert isinstance(sigma_arg.value, A.Parameter)


def test_calibrating_equation_arrow():
    src = """
    block B
    {
        identities { Y[] = K[-1] ^ alpha; };
        calibration { K[ss] / Y[ss] = 10.0 -> alpha; };
    };
    """
    model = parse_gcn(src)
    cal = model.blocks[0].get("calibration")
    eq = cal.equations[0]
    assert eq.calibrating_parameter == "alpha"


def test_equation_tags():
    src = """
    block B
    {
        identities
        {
            @exclude
            X[] = Y[];
            Y[] = 2;
        };
    };
    """
    model = parse_gcn(src)
    eqs = model.blocks[0].get("identities").equations
    assert eqs[0].tags == ("exclude",)
    assert eqs[1].tags == ()


# ---- error productions ------------------------------------------------------

@pytest.mark.parametrize(
    "src, code",
    [
        ("block B { identities { X[] Y[]; }; };", "E005"),      # missing '='
        ("block B { identities { = Y[]; }; };", "E006"),          # missing lhs
        ("block B { identities { X[] = ; }; };", "E007"),         # missing rhs
        ("block B { identities { X[] = Y[] }; };", "E003"),       # missing ';'
        ("block B { identities { X[1.5] = 1; }; };", "E008"),     # bad time index
        ("block B { wrongname { X[] = 1; }; };", "E010"),         # bad component
        ("notablock B { };", "E009"),                              # bad top level
        ("block B { identities { X[] = 1; };", "E002"),           # unterminated
        ("block B { calibration { rho Beta(a=1) = 0.5; }; };", "E005"),
        ("block B { identities { @wrongtag X[] = 1; }; };", "E020"),
        ("block B { }; block B { };", "E019"),                    # duplicate block
    ],
)
def test_error_codes(src, code):
    with pytest.raises(GCNSyntaxError) as err:
        parse_gcn(src)
    assert err.value.code == code


def test_error_message_has_location():
    src = "block B\n{\n    identities { X[] = ; };\n};"
    with pytest.raises(GCNSyntaxError) as err:
        parse_gcn(src)
    assert err.value.loc.line == 3
    assert "^" in str(err.value)


# ---- round trip ---------------------------------------------------------

def test_print_expression_roundtrip():
    cases = [
        "C[] + I[]",
        "K[-1] ^ alpha * L[] ^ (1 - alpha)",
        "log(A[]) - rho_A * log(A[-1])",
        "-(r[] * K[-1] + w[] * L[])",
        "C[] ^ (1 - sigma_C) / (1 - sigma_C)",
        "E[][U[1]]",
        "(a + b) / (c - d)",
        "x[ss] - 2 ^ -3",
    ]
    for src in cases:
        ast1 = parse_expression(src)
        printed = print_expression(ast1)
        ast2 = parse_expression(printed)
        s1, s2 = ast_to_sympy(ast1), ast_to_sympy(ast2)
        assert sp.simplify(s1 - s2) == 0, f"{src} -> {printed}"


def test_print_model_roundtrip():
    src = (DATA / "rbc.gcn").read_text()
    model1 = parse_gcn(src)
    printed = print_model(model1)
    model2 = parse_gcn(printed)
    assert len(model1.blocks) == len(model2.blocks)
    for b1, b2 in zip(model1.blocks, model2.blocks):
        assert b1.name == b2.name
        for c1, c2 in zip(b1.components, b2.components):
            assert c1.name == c2.name
            assert len(c1.equations) == len(c2.equations)
            for e1, e2 in zip(c1.equations, c2.equations):
                r1 = ast_to_sympy(e1.lhs) - ast_to_sympy(e1.rhs)
                r2 = ast_to_sympy(e2.lhs) - ast_to_sympy(e2.rhs)
                assert sp.simplify(r1 - r2) == 0
