"""Semantic-validation depth tests: every E1xx diagnostic exercised with
hand-built models, plus multi-error accumulation and suggestion quality.

Coverage model: ``gEconpy/tests/parser/ast/test_validation.py`` (357 LoC) —
cases hand-derived for this validator, not ports.
"""

import pytest

from geconpy_tpu.lang import parse_gcn, full_validation
from geconpy_tpu.lang.errors import (
    ErrorCollector,
    GCNErrorCollection,
    GCNSemanticError,
)
from geconpy_tpu.lang.validate import validate_block, validate_model


def codes_of(excinfo):
    err = excinfo.value
    if isinstance(err, GCNErrorCollection):
        return [e.code for e in err.errors]
    return [err.code]


def collect_codes(src):
    model = parse_gcn(src)
    collector = ErrorCollector()
    for block in model.blocks:
        validate_block(block, collector)
    validate_model(model, collector)
    return [e.code for e in collector.errors]


# ---------------------------------------------------------------------------
# clean models produce no diagnostics
# ---------------------------------------------------------------------------

def test_minimal_identity_model_valid():
    assert collect_codes("block B { identities { X[] = 1; }; };") == []


def test_full_optimization_block_valid():
    src = """
    block HOUSEHOLD
    {
        definitions { u[] = log(C[]) - L[] ^ 2 / 2; };
        controls { C[], L[], K[]; };
        objective { U[] = u[] + beta * E[][U[1]]; };
        constraints { C[] + K[] = w[] * L[] + r[] * K[-1] : lambda[]; };
        calibration { beta = 0.99; };
    };
    """
    assert collect_codes(src) == []


def test_control_appearing_only_in_definitions_valid():
    # L appears in the objective only through the substituted definition u[]
    src = """
    block B
    {
        definitions { u[] = log(C[]) - L[] ^ 2; };
        controls { C[], L[]; };
        objective { U[] = u[] + beta * E[][U[1]]; };
        constraints { C[] = w[] * L[]; };
        calibration { beta = 0.99; };
    };
    """
    assert collect_codes(src) == []


def test_steady_state_block_valid():
    src = """
    block STEADY_STATE
    {
        definitions { r_ss[ss] = 1 / beta - 1 + delta; };
        identities { K[ss] = alpha / r_ss[ss]; };
    };
    block B
    {
        identities { K[] = K[-1]; };
        calibration { alpha = 0.3; beta = 0.99; delta = 0.02; };
    };
    """
    assert collect_codes(src) == []


# ---------------------------------------------------------------------------
# block-level diagnostics
# ---------------------------------------------------------------------------

def test_duplicate_component_E010():
    src = """
    block B
    {
        identities { X[] = 1; };
        identities { Y[] = 2; };
    };
    """
    assert "E010" in collect_codes(src)


def test_objective_two_equations_E014():
    src = """
    block B
    {
        controls { C[]; };
        objective
        {
            U[] = log(C[]);
            W[] = C[];
        };
        constraints { C[] = 1; };
    };
    """
    assert "E014" in collect_codes(src)


def test_objective_lhs_not_variable_E111():
    src = """
    block B
    {
        controls { C[]; };
        objective { U[] + 1 = log(C[]); };
        constraints { C[] = 1; };
    };
    """
    assert "E111" in collect_codes(src)


def test_controls_without_problem_E106():
    src = "block B { controls { C[]; }; identities { X[] = 1; }; };"
    assert "E106" in collect_codes(src)


def test_control_not_in_problem_E105_with_suggestion():
    src = """
    block B
    {
        controls { Cc[]; };
        objective { U[] = log(C[]); };
        constraints { C[] = 1; };
    };
    """
    model = parse_gcn(src)
    collector = ErrorCollector()
    validate_block(model.blocks[0], collector)
    errs = [e for e in collector.errors if e.code == "E105"]
    assert len(errs) == 1
    assert "C" in errs[0].suggestions


def test_steady_state_disallowed_component_E107():
    src = """
    block STEADY_STATE
    {
        controls { C[]; };
        identities { C[ss] = 1; };
    };
    """
    assert "E107" in collect_codes(src)


def test_steady_state_non_ss_index_E107():
    src = "block STEADY_STATE { identities { K[ss] = Y[] * 10; }; };"
    codes = collect_codes(src)
    assert codes.count("E107") == 1


def test_shock_with_lag_E110():
    src = """
    block B
    {
        identities { X[] = eps[]; };
        shocks { eps[-1]; };
    };
    """
    assert "E110" in collect_codes(src)


def test_duplicate_variable_in_list_E109():
    src = """
    block B
    {
        controls { C[], C[]; };
        objective { U[] = log(C[]); };
    };
    """
    assert "E109" in collect_codes(src)


# ---------------------------------------------------------------------------
# model-level diagnostics
# ---------------------------------------------------------------------------

def test_duplicate_calibration_across_blocks_E104():
    src = """
    block A
    {
        identities { X[] = beta; };
        calibration { beta = 0.99; };
    };
    block B
    {
        identities { Y[] = beta * X[]; };
        calibration { beta = 0.98; };
    };
    """
    assert "E104" in collect_codes(src)


def test_duplicate_distribution_calibration_E104():
    src = """
    block A
    {
        identities { X[] = rho; };
        calibration { rho ~ Beta(alpha=2, beta=2) = 0.5; };
    };
    block B
    {
        identities { Y[] = rho * X[]; };
        calibration { rho = 0.9; };
    };
    """
    assert "E104" in collect_codes(src)


def test_same_name_calibrated_once_ok():
    src = """
    block A
    {
        identities { X[] = beta; };
        calibration { beta = 0.99; };
    };
    block B { identities { Y[] = beta * X[]; }; };
    """
    assert collect_codes(src) == []


def test_calibrating_arrow_counts_as_definition():
    # alpha is defined by the '-> alpha' calibrating equation; a second
    # definition in another block collides
    src = """
    block A
    {
        identities { Y[] = K[-1] ^ alpha; };
        calibration { K[ss] / Y[ss] = 10 -> alpha; };
    };
    block B
    {
        identities { Z[] = alpha * Y[]; };
        calibration { alpha = 0.3; };
    };
    """
    assert "E104" in collect_codes(src)


def test_unknown_assumption_group_E108():
    src = """
    assumptions { positif { K; }; };
    block B { identities { K[] = 1; }; };
    """
    model = parse_gcn(src)
    collector = ErrorCollector()
    validate_model(model, collector)
    errs = [e for e in collector.errors if e.code == "E108"]
    assert len(errs) == 1
    assert "positive" in errs[0].suggestions


def test_tryreduce_unknown_variable_E112():
    src = """
    tryreduce { Q[]; };
    block B { identities { X[] = 1; }; };
    """
    model = parse_gcn(src)
    collector = ErrorCollector()
    validate_model(model, collector)
    assert [e.code for e in collector.errors] == ["E112"]


def test_tryreduce_known_variable_ok():
    src = """
    tryreduce { X[]; };
    block B { identities { X[] = 1; }; };
    """
    assert collect_codes(src) == []


def test_multiplier_counts_as_model_variable():
    src = """
    tryreduce { lambda[]; };
    block B
    {
        controls { C[]; };
        objective { U[] = log(C[]); };
        constraints { C[] = 1 : lambda[]; };
    };
    """
    assert collect_codes(src) == []


# ---------------------------------------------------------------------------
# accumulation and raising behavior
# ---------------------------------------------------------------------------

def test_multiple_errors_accumulate():
    src = """
    block A
    {
        controls { C[]; };
        identities { X[] = beta; };
        shocks { eps[1]; };
        calibration { beta = 0.99; };
    };
    block B
    {
        identities { Y[] = beta; };
        calibration { beta = 0.98; };
    };
    """
    codes = collect_codes(src)
    assert "E106" in codes    # controls without objective/constraints
    assert "E110" in codes    # shock with time index
    assert "E104" in codes    # duplicate beta
    assert len(codes) >= 3


def test_full_validation_raises_single_error_directly():
    src = """
    tryreduce { Q[]; };
    block B { identities { X[] = 1; }; };
    """
    with pytest.raises(GCNSemanticError) as err:
        full_validation(parse_gcn(src))
    assert err.value.code == "E112"


def test_full_validation_raises_collection_for_many():
    src = """
    block A
    {
        controls { C[]; };
        identities { X[] = beta; };
        calibration { beta = 0.99; };
    };
    block B
    {
        identities { Y[] = beta; };
        calibration { beta = 0.98; };
    };
    """
    with pytest.raises(GCNErrorCollection) as err:
        full_validation(parse_gcn(src))
    assert len(err.value.errors) == 2
    assert str(err.value).count("error[") == 2


def test_full_validation_passes_all_bundled_models():
    import pathlib

    import geconpy_tpu

    data = pathlib.Path(geconpy_tpu.__file__).parent / "data"
    gcns = sorted(data.glob("*.gcn"))
    assert len(gcns) >= 20
    for path in gcns:
        full_validation(parse_gcn(path.read_text(), str(path)))
