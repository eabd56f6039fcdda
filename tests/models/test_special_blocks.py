"""Specialized-block FOCs must equal the generic Lagrangian path exactly.

Mirrors the reference's tests/model/block/test_cobb_douglas.py and
test_ces.py equivalence strategy.
"""

import sympy as sp

from geconpy_tpu.lang import parse_gcn
from geconpy_tpu.lang.sympify import SympyConverter
from geconpy_tpu.models.block import Block
from geconpy_tpu.models.special_blocks import (
    CESBlock,
    CobbDouglasBlock,
    decompose_ces,
    decompose_monomial,
)
from geconpy_tpu.symbolic import TimeAwareSymbol


FIRM_CD = """
block FIRM
{
    controls { K[-1], L[]; };
    objective { TC[] = -(r[] * K[-1] + w[] * L[]); };
    constraints { Y[] = A[] * K[-1] ^ alpha * L[] ^ (1 - alpha) : mc[]; };
    calibration { alpha = 0.35; };
};
"""

FIRM_CES = """
block BUNDLER
{
    controls { X1[], X2[]; };
    objective { TC[] = -(p1[] * X1[] + p2[] * X2[]); };
    constraints { Y[] = (a * X1[] ^ rho + (1 - a) * X2[] ^ rho) ^ (1 / rho) : pc[]; };
    calibration { a = 0.5; rho = 0.5; };
};
"""


def _make_blocks(src, cls):
    ast_block = parse_gcn(src).blocks[0]
    conv = SympyConverter()
    generic = Block.from_ast(ast_block, conv)
    special = cls.from_ast(ast_block, conv)
    return generic, special


def test_decompose_monomial():
    conv = SympyConverter()
    A = conv.variable("A", 0)
    K = conv.variable("K", -1)
    L = conv.variable("L", 0)
    alpha = conv.parameter("alpha")
    expr = A * K**alpha * L ** (1 - alpha)
    coeff, powers = decompose_monomial(expr)
    # A is a power factor (exponent 1)
    assert powers[K] == alpha
    assert powers[L] == 1 - alpha
    assert powers[A] == 1

    assert decompose_monomial(A + K) is None


def test_decompose_ces():
    conv = SympyConverter()
    X1 = conv.variable("X1", 0)
    X2 = conv.variable("X2", 0)
    a, rho = conv.parameter("a"), conv.parameter("rho")
    expr = (a * X1**rho + (1 - a) * X2**rho) ** (1 / rho)
    scale, outer, inner, terms = decompose_ces(expr)
    assert sp.simplify(outer - 1 / rho) == 0
    assert sp.simplify(inner - rho) == 0
    assert len(terms) == 2


def test_cobb_douglas_detection_and_equivalence():
    generic, special = _make_blocks(FIRM_CD, CobbDouglasBlock)
    assert CobbDouglasBlock.detect(generic)
    assert not CESBlock.detect(generic)

    generic.solve_optimization()
    special.solve_optimization()
    assert len(generic.system_equations) == len(special.system_equations)
    for eq_g, eq_s in zip(generic.system_equations, special.system_equations):
        assert sp.simplify(sp.expand(eq_g - eq_s)) == 0, (eq_g, eq_s)


def test_ces_detection_and_equivalence():
    generic, special = _make_blocks(FIRM_CES, CESBlock)
    assert CESBlock.detect(generic)
    assert not CobbDouglasBlock.detect(generic)

    generic.solve_optimization()
    special.solve_optimization()
    assert len(generic.system_equations) == len(special.system_equations)
    for eq_g, eq_s in zip(generic.system_equations, special.system_equations):
        assert sp.simplify(sp.expand(eq_g - eq_s)) == 0, (eq_g, eq_s)


def test_registry_dispatches_specialized():
    import geconpy_tpu.models.special_blocks  # noqa: F401  (registers)
    from geconpy_tpu.models.registry import dispatch_block

    ast_block = parse_gcn(FIRM_CD).blocks[0]
    block = dispatch_block(ast_block, SympyConverter())
    assert isinstance(block, CobbDouglasBlock)

    ast_block = parse_gcn(FIRM_CES).blocks[0]
    block = dispatch_block(ast_block, SympyConverter())
    assert isinstance(block, CESBlock)


def test_household_not_matched():
    """A Bellman household problem must fall back to the generic block."""
    src = """
    block HH
    {
        controls { C[], K[]; };
        objective { U[] = log(C[]) + beta * E[][U[1]]; };
        constraints { C[] + K[] = r[] * K[-1] : lam[]; };
        calibration { beta = 0.99; };
    };
    """
    ast_block = parse_gcn(src).blocks[0]
    generic = Block.from_ast(ast_block, SympyConverter())
    assert not CobbDouglasBlock.detect(generic)
    assert not CESBlock.detect(generic)
