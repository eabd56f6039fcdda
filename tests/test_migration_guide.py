"""The migration guide (docs/migrating.md) must stay truthful.

Every ``gt.name`` the guide tells a gEconpy user to call must exist in
``geconpy_tpu``'s public API, every plotting / posterior-tooling name it
lists must exist in its module, and every keyword argument its code blocks
pass to ``configure`` / ``fit`` / ``steady_state`` / ``solve_model`` must be
accepted by the real signature.  (Role model: the reference ships executed
example notebooks whose code is exercised in CI —
/root/reference/docs/source/examples/.)
"""

import inspect
import re
from pathlib import Path

import pytest

import geconpy_tpu as gt
from geconpy_tpu.analysis import plotting
from geconpy_tpu.stats import posterior
from geconpy_tpu.stats.estimation import fit
from geconpy_tpu.stats.statespace import DSGEStateSpace

GUIDE = Path(__file__).resolve().parents[1] / "docs" / "migrating.md"
TEXT = GUIDE.read_text()


def test_guide_exists_and_is_substantial():
    assert len(TEXT) > 4000
    assert "gEconpy" in TEXT and "geconpy_tpu" in TEXT


def test_every_gt_symbol_exists():
    # every `gt.name` mentioned anywhere in the guide (tables + code blocks)
    names = set(re.findall(r"\bgt\.([A-Za-z_][A-Za-z0-9_]*)", TEXT))
    assert len(names) > 30, "guide lost its API mapping tables"
    missing = sorted(n for n in names if not hasattr(gt, n))
    assert not missing, f"guide references absent symbols: {missing}"


def test_every_gt_symbol_is_public():
    names = set(re.findall(r"\bgt\.([A-Za-z_][A-Za-z0-9_]*)", TEXT))
    not_public = sorted(n for n in names if n not in gt.__all__)
    assert not not_public, f"guide references non-__all__ symbols: {not_public}"


def test_plotting_names_exist():
    names = set(re.findall(r"\b(plot_[a-z_]+)\b", TEXT))
    names.add("prepare_gridspec_figure")
    assert len(names) >= 18
    missing = sorted(n for n in names if not hasattr(plotting, n))
    assert not missing, f"guide lists absent plotting functions: {missing}"


def test_posterior_tooling_names_exist():
    for name in ("posterior_irfs", "posterior_autocorrelation",
                 "posterior_smoothed_states", "posterior_predictive",
                 "historical_shock_decomposition", "posterior_fevd",
                 "posterior_girfs", "posterior_diagnostics"):
        assert name in TEXT, f"guide dropped {name}"
        assert hasattr(posterior, name)


def _kwargs_in_code_blocks(callee: str) -> set[str]:
    """Keyword names passed to gt.<callee>(...) or .<callee>(...) inside
    fenced code blocks."""
    out = set()
    for block in re.findall(r"```python\n(.*?)```", TEXT, re.S):
        for call in re.findall(
                rf"\b{callee}\((.*?)\)\n", block, re.S):
            out |= set(re.findall(r"(\w+)\s*=", call))
    return out


@pytest.mark.parametrize("callee, func", [
    ("configure", DSGEStateSpace.configure),
    ("fit", fit),
])
def test_code_block_kwargs_are_real(callee, func):
    used = _kwargs_in_code_blocks(callee)
    assert used, f"guide has no {callee} example any more"
    params = set(inspect.signature(func).parameters)
    bogus = sorted(used - params)
    assert not bogus, f"{callee} example passes unknown kwargs: {bogus}"


def test_mentioned_method_and_solver_choices_are_real():
    # steady-state methods the guide enumerates must be accepted strings
    from geconpy_tpu.models.steady_state import make_steady_state_solver  # noqa: F401
    for m in ("hybrid", "newton", "newton_nm", "chord", "lm", "dogleg",
              "gauss_newton"):
        assert f"`{m}`" in TEXT or f"'{m}'" in TEXT or m in TEXT
    # fit() defaults the guide relies on
    sig = inspect.signature(fit)
    for kw in ("policy", "init", "mass_matrix", "mesh", "segment_size",
               "pooled_adaptation", "order", "cache_dir"):
        assert kw in sig.parameters


def test_stats_entry_points_exist():
    from geconpy_tpu.stats.smc import fit_smc            # noqa: F401
    from geconpy_tpu.stats.pmmh import sample_pmmh       # noqa: F401
    from geconpy_tpu.stats.model_comparison import (     # noqa: F401
        compare_models, find_map)
