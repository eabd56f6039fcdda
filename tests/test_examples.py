"""Examples-gallery guards.

Every example must import cleanly and declare ``main(fast=False)``; the
introductory one runs end-to-end (with figures); and the COMMITTED rendered
gallery (``docs/examples/``, produced by ``docs/gen_examples.py``) must stay
in sync with the example sources: one page per script, captured output
non-empty, every referenced image present on disk.

Full executions of the heavier examples (estimation, second order) are
exercised by the gallery job: ``python docs/gen_examples.py``.
"""

import importlib.util
import pathlib
import re

import pytest

ROOT = pathlib.Path(__file__).parents[1]
EXAMPLES = sorted((ROOT / "examples").glob("*.py"))
GALLERY = ROOT / "docs" / "examples"


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


def test_intro_example_runs_fast_with_figures():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.close("all")
    mod = _load(EXAMPLES[0])  # 01_intro_rbc
    sol = mod.main(fast=True)
    assert bool(sol.success)
    assert len(plt.get_fignums()) >= 3, "intro example lost its figures"
    plt.close("all")


def test_gallery_page_per_example():
    pages = {p.stem for p in GALLERY.glob("*.md")} - {"README"}
    scripts = {p.stem for p in EXAMPLES}
    assert pages == scripts, (
        f"gallery out of sync: missing {scripts - pages}, "
        f"stale {pages - scripts} — run python docs/gen_examples.py")


@pytest.mark.parametrize("stem", [p.stem for p in EXAMPLES])
def test_gallery_page_content(stem):
    page = GALLERY / f"{stem}.md"
    text = page.read_text()
    # captured output present and non-trivial
    m = re.search(r"```text\n(.*?)```", text, re.DOTALL)
    assert m and len(m.group(1).strip()) > 20, f"{stem}: empty output block"
    # every referenced image exists
    for img in re.findall(r"!\[[^\]]*\]\(img/([^)]+)\)", text):
        assert (GALLERY / "img" / img).exists(), f"{stem}: missing {img}"


def test_gallery_has_figures():
    """The gallery must actually SHOW something: the figure-bearing examples
    commit at least one PNG each."""
    for stem in ("01_intro_rbc", "05_estimation", "08_perfect_foresight",
                 "10_occbin_zlb"):
        text = (GALLERY / f"{stem}.md").read_text()
        assert "![", f"{stem} renders no figures"
        assert re.search(r"!\[[^\]]*\]\(img/", text), \
            f"{stem} renders no figures"


def test_gallery_index_links_every_page():
    index = (GALLERY / "README.md").read_text()
    for p in EXAMPLES:
        assert f"({p.stem}.md)" in index, f"index missing {p.stem}"
