"""FOC derivation tests against hand-derived RBC conditions.

Mirrors the strategy of the reference's tests/model/block/test_basic.py:
assert the Lagrangian FOCs reproduce the textbook Euler equation, labor
supply condition, and firm demand curves.
"""

import pathlib

import sympy as sp

from geconpy_tpu.lang import parse_gcn
from geconpy_tpu.lang.sympify import SympyConverter
from geconpy_tpu.models.block import Block
from geconpy_tpu.symbolic import TimeAwareSymbol

DATA = pathlib.Path(__file__).parents[2] / "geconpy_tpu" / "data"


def _rbc_blocks():
    model = parse_gcn((DATA / "rbc.gcn").read_text())
    conv = SympyConverter()
    blocks = {}
    for b in model.blocks:
        if b.name == "STEADY_STATE":
            continue
        blocks[b.name] = Block.from_ast(b, conv)
    return blocks, conv


def _sym(name, t=0):
    return TimeAwareSymbol(name, t, real=True)


def test_discount_factor():
    blocks, _ = _rbc_blocks()
    hh = blocks["HOUSEHOLD"]
    beta = sp.Symbol("beta", real=True)
    assert hh._get_discount_factor() == beta

    firm = blocks["FIRM"]
    assert firm._get_discount_factor() == 1


def test_household_focs():
    blocks, _ = _rbc_blocks()
    hh = blocks["HOUSEHOLD"]
    hh.solve_optimization()

    C, L, I, K, lam = (_sym(n) for n in ["C", "L", "I", "K", "lambda"])
    r, w = _sym("r"), _sym("w")
    beta, delta, sigma_C, sigma_L = sp.symbols(
        "beta delta sigma_C sigma_L", real=True)

    system = hh.system_equations

    # Budget constraint and capital accumulation must be in the system
    budget = C + I - r * K.set_t(-1) - w * L
    assert any(sp.simplify(eq - budget) == 0 or sp.simplify(eq + budget) == 0
               for eq in system)

    # FOC wrt C: C^-sigma_C - lambda = 0 (up to sign)
    foc_c = C ** (-sigma_C) - lam
    assert any(sp.simplify(sp.powsimp(eq) - foc_c) == 0
               or sp.simplify(sp.powsimp(eq) + foc_c) == 0
               for eq in system), f"no consumption FOC found in {system}"

    # FOC wrt L: -L^sigma_L + lambda*w = 0 (up to sign)
    foc_l = lam * w - L**sigma_L
    assert any(sp.simplify(sp.powsimp(eq) - foc_l) == 0
               or sp.simplify(sp.powsimp(eq) + foc_l) == 0
               for eq in system), f"no labor FOC found in {system}"

    # Euler equation: combining FOC wrt I and K after eliminating the
    # generated multiplier on capital accumulation:
    #   -lambda + beta*E[lambda(+1) * (r(+1) + 1 - delta)] = 0
    lam1, r1 = lam.set_t(1), r.set_t(1)
    euler = -lam + beta * lam1 * (r1 + 1 - delta)
    assert any(sp.simplify(sp.expand(eq) - sp.expand(euler)) == 0
               or sp.simplify(sp.expand(eq) + sp.expand(euler)) == 0
               for eq in system), f"no Euler equation found in {system}"

    # generated multiplier was eliminated
    assert hh.eliminated_multipliers, "expected the I-FOC to eliminate the generated multiplier"


def test_firm_focs():
    blocks, _ = _rbc_blocks()
    firm = blocks["FIRM"]
    firm.solve_optimization()

    K, L, Y, A = _sym("K", -1), _sym("L"), _sym("Y"), _sym("A")
    r, w, mc = _sym("r"), _sym("w"), _sym("mc")
    alpha = sp.Symbol("alpha", real=True)

    system = [sp.powsimp(sp.expand(eq)) for eq in firm.system_equations]

    # factor demands: r = mc * alpha * Y/K  and  w = mc * (1-alpha) * Y/L
    # via the production-function constraint with multiplier mc
    demand_k = -r + mc * alpha * A * K ** (alpha - 1) * L ** (1 - alpha)
    demand_l = -w + mc * (1 - alpha) * A * K**alpha * L ** (-alpha)

    def contains(target):
        t = sp.expand(sp.powsimp(target))
        return any(sp.simplify(eq - t) == 0 or sp.simplify(eq + t) == 0
                   for eq in system)

    assert contains(demand_k), f"capital demand not found in {system}"
    assert contains(demand_l), f"labor demand not found in {system}"


def test_minimize_tag_negates_objective():
    src = """
    block COST_MIN
    {
        controls { x[]; };
        objective { @minimize J[] = x[] ^ 2 - 2 * x[]; };
    };
    """
    model = parse_gcn(src)
    conv = SympyConverter()
    block = Block.from_ast(model.blocks[0], conv)
    block.solve_optimization()
    x = _sym("x")
    # minimize x^2-2x -> FOC -(2x - 2) = 0
    focs = [eq for eq in block.system_equations if eq.has(x) and not eq.has(_sym("J"))]
    assert any(sp.simplify(eq - (2 - 2 * x)) == 0 or sp.simplify(eq - (2 * x - 2)) == 0
               for eq in focs)


def test_static_problem_discount_is_one():
    src = """
    block STATIC
    {
        controls { a[], b[]; };
        objective { P[] = a[] ^ 0.5 * b[] ^ 0.5; };
        constraints { a[] + p[] * b[] = m[] : mu[]; };
    };
    """
    model = parse_gcn(src)
    conv = SympyConverter()
    block = Block.from_ast(model.blocks[0], conv)
    assert block._get_discount_factor() == 1
    block.solve_optimization()
    # 2 constraints? no: 1 constraint + 1 objective + 2 FOCs = 4 equations
    assert len(block.system_equations) == 4
