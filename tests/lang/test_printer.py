"""AST -> GCN source printer round-trip tests.

Role parity with the reference's tests/parser/ast/test_printer.py: printing
then re-parsing must be a fixpoint, and the sympy semantics of the reparse
must match the original parse.
"""

import pathlib

import pytest
import sympy as sp

import geconpy_tpu
from geconpy_tpu.lang import (
    ast_to_sympy,
    parse_expression,
    parse_gcn,
    print_expression,
    print_model,
)
from geconpy_tpu.lang.printer import print_equation

DATA = pathlib.Path(geconpy_tpu.__file__).parent / "data"
FIXTURES = pathlib.Path(__file__).parents[1] / "_gcn_fixtures"

EXPRESSIONS = [
    "C[] + K[-1] ^ alpha",
    "a - (b - c)",
    "a - b - c",
    "a / (b / c)",
    "(a + b) * c",
    "2 ^ 3 ^ 2",
    "(2 ^ 3) ^ 2",
    "-(a + b)",
    "-a ^ 2",
    "(-a) ^ 2",
    "log(C[]) - rho * log(C[-1])",
    "E[][U[1]] + beta * V[1]",
    "K[ss] * alpha / (1 - alpha)",
    "exp(eps_A[]) * A[-1] ^ rho",
    "a * b / c * d",
    "1 - delta + r[]",
    "x[-2] + x[2]",
]


@pytest.mark.parametrize("src", EXPRESSIONS)
def test_expression_print_parse_semantics(src):
    ast1 = parse_expression(src)
    printed = print_expression(ast1)
    ast2 = parse_expression(printed)
    s1, s2 = ast_to_sympy(ast1), ast_to_sympy(ast2)
    assert sp.simplify(s1 - s2) == 0, f"{src!r} -> {printed!r} changed meaning"


@pytest.mark.parametrize("src", EXPRESSIONS)
def test_expression_print_is_fixpoint(src):
    printed = print_expression(parse_expression(src))
    again = print_expression(parse_expression(printed))
    assert printed == again


def test_equation_with_tag_multiplier_calibration():
    model = parse_gcn(
        """
block HOUSEHOLD
{
    objective
    {
        U[] = log(C[]) + beta * E[][U[1]];
    };
    controls
    {
        C[];
    };
    constraints
    {
        @exclude
        C[] = w[] : lambda[];
    };
    calibration
    {
        L[ss] / K[ss] = 0.36 -> alpha;
        beta = 0.99;
    };
};
"""
    )
    block = model.blocks[0]
    constraint = block.components_by_name["constraints"].equations[0] \
        if hasattr(block, "components_by_name") else \
        next(c for c in block.components if c.name == "constraints").equations[0]
    line = print_equation(constraint)
    assert line.startswith("@exclude ")
    assert ": lambda[]" in line
    calib = next(c for c in block.components if c.name == "calibration").equations[0]
    assert "-> alpha" in print_equation(calib)


ALL_MODELS = sorted(p.stem for p in DATA.glob("*.gcn"))


@pytest.mark.parametrize("name", ALL_MODELS)
def test_model_print_roundtrip_fixpoint(name):
    src = geconpy_tpu.get_example_gcn(name)
    model1 = parse_gcn(src)
    printed1 = print_model(model1)
    model2 = parse_gcn(printed1)
    printed2 = print_model(model2)
    assert printed1 == printed2

    # structure is preserved
    assert [b.name for b in model2.blocks] == [b.name for b in model1.blocks]
    assert model2.options == model1.options
    for b1, b2 in zip(model1.blocks, model2.blocks):
        n_eq1 = sum(len(c.equations) for c in b1.components)
        n_eq2 = sum(len(c.equations) for c in b2.components)
        assert n_eq1 == n_eq2


FIXTURE_MODELS = sorted(p.stem for p in FIXTURES.glob("*.gcn"))


@pytest.mark.parametrize("name", FIXTURE_MODELS)
def test_fixture_print_roundtrip_fixpoint(name):
    src = (FIXTURES / f"{name}.gcn").read_text()
    printed1 = print_model(parse_gcn(src))
    printed2 = print_model(parse_gcn(printed1))
    assert printed1 == printed2
