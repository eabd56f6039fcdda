"""Examples-gallery guard: every example imports cleanly (syntax + API
surface), and the introductory one runs end-to-end.

Full executions of the heavier examples (estimation, second order) are
manual: ``python examples/NN_*.py --fast``.
"""

import importlib.util
import pathlib

import pytest

EXAMPLES = sorted(
    (pathlib.Path(__file__).parents[1] / "examples").glob("*.py"))


def _load(path):
    spec = importlib.util.spec_from_file_location(path.stem, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("path", EXAMPLES, ids=[p.stem for p in EXAMPLES])
def test_example_imports_and_declares_main(path):
    mod = _load(path)
    assert callable(getattr(mod, "main", None)), \
        f"{path.name} must define main(fast=False)"


def test_intro_example_runs_fast():
    mod = _load(EXAMPLES[0])  # 01_intro_rbc
    sol = mod.main(fast=True)
    assert bool(sol.success)
