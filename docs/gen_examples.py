"""Render the examples gallery: execute every ``examples/*.py`` and commit
its output as readable docs.

The reference ships executed notebooks with stored outputs
(``/root/reference/docs/source/examples/``, sphinx nbsphinx machinery); the
TPU build's examples are plain scripts, so the gallery is rendered by
running each script's ``main(fast=True)`` headless, capturing stdout and
every matplotlib figure, and writing ``docs/examples/<name>.md`` plus
``docs/examples/img/<name>_figN.png``.

Regenerate after changing an example:

    python docs/gen_examples.py            # all examples
    python docs/gen_examples.py 01 05      # by number prefix

``tests/test_examples.py`` asserts the rendered gallery stays in sync with
the example sources (one page per script, images referenced by each page
exist, captured output non-empty).
"""

from __future__ import annotations

import ast
import contextlib
import importlib.util
import io
import pathlib
import sys
import time

ROOT = pathlib.Path(__file__).parents[1]
EXAMPLES = ROOT / "examples"
OUT = ROOT / "docs" / "examples"
IMG = OUT / "img"


def render_one(path: pathlib.Path) -> pathlib.Path:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.close("all")
    spec = importlib.util.spec_from_file_location(path.stem, path)
    mod = importlib.util.module_from_spec(spec)
    buf = io.StringIO()
    t0 = time.time()
    with contextlib.redirect_stdout(buf):
        spec.loader.exec_module(mod)
        mod.main(fast=True)
    elapsed = time.time() - t0
    stdout = buf.getvalue().rstrip()

    IMG.mkdir(parents=True, exist_ok=True)
    images = []
    for i, num in enumerate(plt.get_fignums(), start=1):
        img = IMG / f"{path.stem}_fig{i}.png"
        plt.figure(num).savefig(img, dpi=110, bbox_inches="tight")
        images.append(img.name)
    plt.close("all")

    docstring = ast.get_docstring(ast.parse(path.read_text())) or ""
    title = docstring.splitlines()[0].rstrip(".") if docstring else path.stem

    page = OUT / f"{path.stem}.md"
    lines = [f"# {title}", "",
             f"*Rendered from [`examples/{path.name}`](../../examples/"
             f"{path.name}) — `main(fast=True)`, {elapsed:.1f}s.*", ""]
    if docstring:
        lines += [docstring, ""]
    lines += ["## Output", "", "```text", stdout or "(no stdout)", "```", ""]
    if images:
        lines += ["## Figures", ""]
        lines += [f"![{name}](img/{name})\n" for name in images]
    page.write_text("\n".join(lines) + "\n")
    return page


def write_index(pages: list[pathlib.Path]) -> None:
    lines = ["# Examples gallery", "",
             "Executed output of every script in `examples/` "
             "(regenerate with `python docs/gen_examples.py`).", ""]
    for page in sorted(OUT.glob("*.md")):
        if page.name == "README.md":
            continue
        title = page.read_text().splitlines()[0].lstrip("# ")
        lines.append(f"- [{page.stem}]({page.name}) — {title}")
    (OUT / "README.md").write_text("\n".join(lines) + "\n")


def main(argv: list[str]) -> None:
    sys.path.insert(0, str(ROOT))
    # render on CPU: examples run fine there, and the doc job must neither
    # depend on nor contend with the TPU tunnel (the env pre-sets
    # JAX_PLATFORMS=axon; config.update after import is required)
    import os

    os.environ.setdefault("GECONPY_PLATFORM", "cpu")
    if os.environ["GECONPY_PLATFORM"] == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    selected = sorted(EXAMPLES.glob("*.py"))
    if argv:
        selected = [p for p in selected
                    if any(p.name.startswith(a) for a in argv)]
    pages = []
    for path in selected:
        print(f"rendering {path.name} ...", flush=True)
        pages.append(render_one(path))
    write_index(pages)
    print(f"wrote {len(pages)} pages to {OUT}")


if __name__ == "__main__":
    main(sys.argv[1:])
