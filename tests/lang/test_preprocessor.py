import pytest
import sympy as sp

from geconpy_tpu import get_example_gcn
from geconpy_tpu.lang.preprocessor import (
    ParseResult,
    preprocess,
    print_gcn_html,
    quick_parse,
)
from geconpy_tpu.lang.errors import GCNSemanticError


def test_preprocess_and_views():
    result = preprocess(get_example_gcn("rbc"))
    assert "HOUSEHOLD" in result.block_names
    eqs = result.equations
    assert len(eqs["HOUSEHOLD"]) >= 3
    assert all(isinstance(e, sp.Eq) for e in eqs["HOUSEHOLD"])

    html = print_gcn_html(result)
    assert "HOUSEHOLD" in html and "\\[" in html

    model = result.to_model(verbose=False)
    assert model.n_variables == 9


def test_quick_parse_skips_validation():
    # orphan parameter: quick_parse is fine, full build would raise
    src = """
    block B
    {
        identities { X[] = rho * X[-1] + eps[]; };
        shocks { eps[]; };
        calibration { rho = 0.9; unused = 1.0; };
    };
    """
    ast = quick_parse(src)
    assert ast.blocks[0].name == "B"
    result = preprocess(src)  # AST-level validation also passes
    with pytest.raises(GCNSemanticError):
        result.to_model(verbose=False)
