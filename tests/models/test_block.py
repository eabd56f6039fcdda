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


# --------------------------------------------------------------------------
# Hand-derived FOC cases at reference depth (mirrors the coverage of the
# reference's tests/model/block/test_basic.py: multi-constraint problems,
# tags, Bellman discount edge cases, multiplier elimination boundaries,
# and the specialized-block dispatch/fallback boundary).
# --------------------------------------------------------------------------

import pytest

from geconpy_tpu.lang.errors import GCNError
from geconpy_tpu.models.registry import dispatch_block
from geconpy_tpu.models.special_blocks import CESBlock, CobbDouglasBlock


def _block(src: str, name: str | None = None) -> Block:
    model = parse_gcn(src)
    conv = SympyConverter()
    blocks = [b for b in model.blocks if name is None or b.name == name]
    return Block.from_ast(blocks[0], conv)


def _dispatched(src: str) -> Block:
    model = parse_gcn(src)
    return dispatch_block(model.blocks[0], SympyConverter())


def _contains(system, target):
    """True if ±target appears in the system (after expand/powsimp)."""
    t = sp.expand(sp.powsimp(target))
    return any(sp.simplify(sp.expand(sp.powsimp(eq)) - t) == 0
               or sp.simplify(sp.expand(sp.powsimp(eq)) + t) == 0
               for eq in system)


class TestDirectCapitalChoice:
    """Household choosing K directly (control appears lagged in the shifted
    constraint): the K-FOC must pick up the discounted t+1 contribution."""

    SRC = """
    block HH
    {
        controls { C[], K[]; };
        objective { U[] = C[] ^ (1 - sigma) / (1 - sigma) + beta * E[][U[1]]; };
        constraints { C[] + K[] = r[] * K[-1] + (1 - delta) * K[-1] + w[] : lam[]; };
    };
    """

    def test_focs(self):
        blk = _block(self.SRC)
        blk.solve_optimization()
        C, K, lam, r = (_sym(n) for n in ["C", "K", "lam", "r"])
        beta, delta, sigma = sp.symbols("beta delta sigma", real=True)

        # FOC C: C^-sigma - lam = 0
        assert _contains(blk.system_equations, C ** (-sigma) - lam)
        # FOC K: -lam + beta * lam(+1) * (r(+1) + 1 - delta) = 0
        euler = -lam + beta * lam.set_t(1) * (r.set_t(1) + 1 - delta)
        assert _contains(blk.system_equations, sp.expand(euler))

    def test_system_size(self):
        blk = _block(self.SRC)
        blk.solve_optimization()
        # constraint + objective + 2 FOCs
        assert len(blk.system_equations) == 4


class TestTwoConstraintTobinsQ:
    """Budget + capital accumulation with explicit multipliers: the three
    FOCs are the marginal-utility condition, lam = q, and the Tobin's-q
    asset-pricing recursion."""

    SRC = """
    block HH
    {
        controls { C[], I[], K[]; };
        objective { U[] = log(C[]) + beta * E[][U[1]]; };
        constraints
        {
            C[] + I[] = r[] * K[-1] + w[] : lam[];
            K[] = (1 - delta) * K[-1] + I[] : q[];
        };
    };
    """

    def test_focs(self):
        blk = _block(self.SRC)
        blk.solve_optimization()
        C, I, K, lam, q, r = (_sym(n) for n in ["C", "I", "K", "lam", "q", "r"])
        beta, delta = sp.symbols("beta delta", real=True)
        system = blk.system_equations

        assert _contains(system, 1 / C - lam)
        assert _contains(system, -lam + q)
        tobin = -q + beta * (lam.set_t(1) * r.set_t(1)
                             + (1 - delta) * q.set_t(1))
        assert _contains(system, sp.expand(tobin))

    def test_both_constraints_kept(self):
        blk = _block(self.SRC)
        blk.solve_optimization()
        C, I, K, r, w = (_sym(n) for n in ["C", "I", "K", "r", "w"])
        delta = sp.Symbol("delta", real=True)
        assert _contains(blk.system_equations,
                         C + I - r * K.set_t(-1) - w)
        assert _contains(blk.system_equations,
                         K - (1 - delta) * K.set_t(-1) - I)

    def test_no_generated_multipliers(self):
        blk = _block(self.SRC)
        blk.solve_optimization()
        assert blk.eliminated_multipliers == []
        assert all(m.base_name in ("lam", "q") for m in blk.multipliers)


class TestExcludeTag:
    """@exclude drops a constraint from the emitted system while keeping it
    in the Lagrangian (its multiplier still appears in the FOCs)."""

    SRC = """
    block HH
    {
        controls { C[], M[]; };
        objective { U[] = log(C[]) + beta * E[][U[1]]; };
        constraints
        {
            C[] = w[] : lam[];
            @exclude M[] = C[] : mu[];
        };
    };
    """

    def test_excluded_constraint_not_in_system(self):
        blk = _block(self.SRC)
        blk.solve_optimization()
        C, M = _sym("C"), _sym("M")
        assert not _contains(blk.system_equations, M - C)

    def test_multiplier_still_in_focs(self):
        blk = _block(self.SRC)
        blk.solve_optimization()
        C, lam, mu = _sym("C"), _sym("lam"), _sym("mu")
        # FOC C: 1/C - lam + mu = 0  (mu enters via the excluded constraint)
        assert _contains(blk.system_equations, 1 / C - lam + mu)
        # FOC M: -mu = 0
        assert _contains(blk.system_equations, mu)


class TestCostMinimization:
    """@minimize + Cobb-Douglas constraint: the classic conditional factor
    demands, through the generic diff path and the specialized block."""

    SRC = """
    block FIRM
    {
        controls { K[], L[]; };
        objective { @minimize TC[] = r[] * K[] + w[] * L[]; };
        constraints { Y[] = A[] * K[] ^ alpha * L[] ^ (1 - alpha) : mc[]; };
    };
    """

    def _check(self, blk):
        blk.solve_optimization()
        K, L, Y, A_, r, w, mc = (_sym(n) for n in
                                 ["K", "L", "Y", "A", "r", "w", "mc"])
        alpha = sp.Symbol("alpha", real=True)
        demand_k = -r + mc * alpha * A_ * K ** (alpha - 1) * L ** (1 - alpha)
        demand_l = -w + mc * (1 - alpha) * A_ * K ** alpha * L ** (-alpha)
        assert _contains(blk.system_equations, demand_k)
        assert _contains(blk.system_equations, demand_l)

    def test_generic_path(self):
        self._check(_block(self.SRC))

    def test_dispatches_to_cobb_douglas(self):
        blk = _dispatched(self.SRC)
        assert isinstance(blk, CobbDouglasBlock)
        self._check(blk)

    def test_specialized_equals_generic(self):
        generic = _block(self.SRC)
        generic.solve_optimization()
        special = _dispatched(self.SRC)
        special.solve_optimization()
        assert len(generic.system_equations) == len(special.system_equations)
        for g in generic.system_equations:
            assert _contains(special.system_equations, g), g


class TestDiscountFactorEdgeCases:
    def test_compound_parameter_discount(self):
        src = """
        block HH
        {
            controls { C[]; };
            objective { U[] = log(C[]) + beta * theta * E[][U[1]]; };
            constraints { C[] = w[] : lam[]; };
        };
        """
        blk = _block(src)
        beta, theta = sp.symbols("beta theta", real=True)
        assert sp.simplify(blk._get_discount_factor() - beta * theta) == 0

    def test_time_varying_discount_steps_forward(self):
        """Variable discount b[]: the K-FOC must use b at time t, and the
        t+1 Lagrangian contribution steps everything (including b) forward."""
        src = """
        block HH
        {
            controls { C[], K[]; };
            objective { U[] = log(C[]) + b[] * E[][U[1]]; };
            constraints { C[] + K[] = r[] * K[-1] : lam[]; };
        };
        """
        blk = _block(src)
        b = _sym("b")
        assert blk._get_discount_factor() == b
        blk.solve_optimization()
        K, lam, r = _sym("K"), _sym("lam"), _sym("r")
        foc_k = -lam + b * lam.set_t(1) * r.set_t(1)
        assert _contains(blk.system_equations, sp.expand(foc_k))

    def test_missing_continuation_raises(self):
        src = """
        block HH
        {
            controls { C[]; };
            objective { U[] = log(C[]) + beta * E[][V[1]]; };
            constraints { C[] = w[] : lam[]; };
        };
        """
        blk = _block(src)
        with pytest.raises(GCNError):
            blk._get_discount_factor()

    def test_static_objective_with_lags_discount_one(self):
        src = """
        block HH
        {
            controls { C[]; };
            objective { U[] = log(C[]) + gamma * log(C[-1]); };
            constraints { C[] = w[] : lam[]; };
        };
        """
        blk = _block(src)
        assert blk._get_discount_factor() == 1


class TestGeneratedMultiplierElimination:
    def test_linear_constraint_eliminates(self):
        """Constraint without a multiplier whose FOC pins the generated
        multiplier to a constant/variable: it must be substituted away."""
        src = """
        block B
        {
            controls { x[], y[]; };
            objective { J[] = y[] - x[] ^ 2; };
            constraints { y[] = 2 * x[]; };
        };
        """
        blk = _block(src)
        blk.solve_optimization()
        assert blk.eliminated_multipliers, "generated multiplier kept"
        x = _sym("x")
        # after eliminating lm = 1: FOC x becomes -2x + 2 = 0
        assert _contains(blk.system_equations, 2 - 2 * x)
        # no lambda__ symbols survive
        for eq in blk.system_equations:
            assert not any(a.base_name.startswith("lambda__")
                           for a in eq.atoms(TimeAwareSymbol)), eq

    def test_trivial_pin_through_nonlinear_constraint(self):
        """Even with a nonlinear constraint, a control entering the
        objective linearly pins the generated multiplier trivially
        (FOC y: 1 - lm = 0) — it must be eliminated and its value
        substituted into the other FOC."""
        src = """
        block B
        {
            controls { x[], y[]; };
            objective { J[] = y[] - x[] ^ 2; };
            constraints { y[] = x[] ^ 3; };
        };
        """
        blk = _block(src)
        blk.solve_optimization()
        assert blk.eliminated_multipliers
        x = _sym("x")
        # lm = 1 substituted: FOC x becomes 3x^2 - 2x = 0
        assert _contains(blk.system_equations, 3 * x**2 - 2 * x)

    def test_nonseparable_constraint_keeps_multiplier(self):
        """Both FOCs couple the controls through the generated multiplier
        (xy = z): no trivial pin exists, so the multiplier must survive."""
        src = """
        block B
        {
            controls { x[], y[]; };
            objective { J[] = - x[] ^ 2 - y[] ^ 2; };
            constraints { x[] * y[] = z[]; };
        };
        """
        blk = _block(src)
        blk.solve_optimization()
        assert blk.eliminated_multipliers == []
        x, y = _sym("x"), _sym("y")
        lm = TimeAwareSymbol("lambda__B_1", 0, real=True)
        # FOC x: -2x - lm*y = 0 ; FOC y: -2y - lm*x = 0
        assert _contains(blk.system_equations, 2 * x + lm * y)
        assert _contains(blk.system_equations, 2 * y + lm * x)


class TestDefinitionSubstitution:
    def test_chained_definitions(self):
        """Definitions referencing definitions flatten before the Lagrangian
        is built (u -> v -> C)."""
        src = """
        block HH
        {
            definitions
            {
                v[] = log(C[]);
                u[] = v[] - chi * L[] ^ 2;
            };
            controls { C[], L[]; };
            objective { U[] = u[] + beta * E[][U[1]]; };
            constraints { C[] = w[] * L[] : lam[]; };
        };
        """
        blk = _block(src)
        blk.solve_optimization()
        C, L, lam, w = _sym("C"), _sym("L"), _sym("lam"), _sym("w")
        chi = sp.Symbol("chi", real=True)
        assert _contains(blk.system_equations, 1 / C - lam)
        assert _contains(blk.system_equations, -2 * chi * L + lam * w)
        # the definition symbols are substituted out of the system
        for eq in blk.system_equations:
            names = {a.base_name for a in eq.atoms(TimeAwareSymbol)}
            assert "u" not in names and "v" not in names, eq


class TestSpecializedDispatchBoundaries:
    CES_SRC = """
    block FIRM
    {
        controls { K[], L[]; };
        objective { @minimize TC[] = r[] * K[] + w[] * L[]; };
        constraints
        {
            Y[] = (a * K[] ^ p + (1 - a) * L[] ^ p) ^ (1 / p) : mc[];
        };
    };
    """

    def test_ces_dispatch_and_focs(self):
        blk = _dispatched(self.CES_SRC)
        assert isinstance(blk, CESBlock)
        blk.solve_optimization()
        K, L, r, mc = _sym("K"), _sym("L"), _sym("r"), _sym("mc")
        a, p = sp.symbols("a p", real=True)
        # d(Y)/dK for Y = S^(1/p), S = a K^p + (1-a) L^p:
        #   a K^(p-1) S^(1/p - 1)   (the engine keeps S explicit)
        S = a * K**p + (1 - a) * L**p
        demand_k = -r + mc * a * K ** (p - 1) * S ** (1 / p - 1)
        assert _contains(blk.system_equations, demand_k)

    def test_ces_equals_generic(self):
        generic = _block(self.CES_SRC)
        generic.solve_optimization()
        special = _dispatched(self.CES_SRC)
        special.solve_optimization()
        for g in generic.system_equations:
            assert _contains(special.system_equations, g), g

    def test_additive_production_falls_back_to_generic(self):
        src = """
        block FIRM
        {
            controls { K[], L[]; };
            objective { @minimize TC[] = r[] * K[] + w[] * L[]; };
            constraints { Y[] = A[] * K[] ^ alpha + L[] : mc[]; };
        };
        """
        blk = _dispatched(src)
        assert type(blk) is Block
        blk.solve_optimization()
        K, r, mc, A_ = _sym("K"), _sym("r"), _sym("mc"), _sym("A")
        alpha = sp.Symbol("alpha", real=True)
        assert _contains(blk.system_equations,
                         -r + mc * alpha * A_ * K ** (alpha - 1))

    def test_multi_constraint_never_specializes(self):
        src = """
        block FIRM
        {
            controls { K[], L[]; };
            objective { @minimize TC[] = r[] * K[] + w[] * L[]; };
            constraints
            {
                Y[] = A[] * K[] ^ alpha * L[] ^ (1 - alpha) : mc[];
                K[] = L[] : eta[];
            };
        };
        """
        blk = _dispatched(src)
        assert type(blk) is Block
