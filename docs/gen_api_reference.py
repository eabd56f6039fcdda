"""Generate the per-subpackage API reference (docs/api/*.md).

Introspects every public name — the top-level ``geconpy_tpu.__all__`` plus
each subpackage's ``__all__`` (falling back to non-underscore module
members) — and renders one markdown page per subpackage with signatures and
docstrings.  Run after changing any public surface:

    python docs/gen_api_reference.py

The generated pages are committed (docs/api/), so the reference is browsable
without tooling; this script is the single source of truth for their
content.  Role parity with the reference's Sphinx API docs
(``/root/reference/docs/source/``), markdown-first.
"""

import importlib
import inspect
import os
import pkgutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import geconpy_tpu  # noqa: E402

OUT = Path(__file__).parent / "api"


def _signature(obj):
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def _clean_doc(obj, limit=None):
    doc = inspect.getdoc(obj) or "*(undocumented)*"
    if limit is not None:
        paras = doc.split("\n\n")
        doc = "\n\n".join(paras[:limit])
    return doc


def _anchor(name):
    return name.lower().replace(".", "").replace("_", "")


def _mro_doc(cls, mname):
    """First docstring for ``mname`` found along the MRO (so subclasses
    implementing a documented base contract — e.g. every Distribution's
    ``logpdf`` — inherit the contract's description)."""
    for klass in cls.__mro__:
        member = vars(klass).get(mname)
        if member is None:
            continue
        target = member.fget if isinstance(member, property) else member
        if isinstance(target, (classmethod, staticmethod)):
            target = target.__func__
        doc = getattr(target, "__doc__", None)
        if doc:
            return inspect.cleandoc(doc)
    return ""


def _document_class(name, obj, lines):
    lines.append(f"### `{name}{_signature(obj)}`\n")
    lines.append(_clean_doc(obj) + "\n")
    methods = []
    for mname, member in sorted(vars(obj).items()):
        if mname.startswith("_") and mname not in ("__call__",):
            continue
        if callable(member) or isinstance(member, (property, classmethod,
                                                   staticmethod)):
            methods.append((mname, member))
    if methods:
        lines.append("**Methods/properties:**\n")
        for mname, member in methods:
            if isinstance(member, property):
                sig = ""
            elif isinstance(member, (classmethod, staticmethod)):
                sig = _signature(member.__func__)
            else:
                sig = _signature(member)
            doc = _mro_doc(obj, mname).split("\n\n")[0]
            doc = " ".join(doc.split())
            lines.append(f"- `{mname}{sig}` — {doc or '*(undocumented)*'}")
        lines.append("")


def _document_function(name, obj, lines):
    lines.append(f"### `{name}{_signature(obj)}`\n")
    lines.append(_clean_doc(obj) + "\n")


def _public_names(mod):
    names = getattr(mod, "__all__", None)
    if names is None:
        names = [n for n in vars(mod)
                 if not n.startswith("_") and not inspect.ismodule(
                     getattr(mod, n))]
    return list(names)


def render_module(modname: str) -> str:
    mod = importlib.import_module(modname)
    title = modname.split(".")[-1] if "." in modname else modname
    lines = [f"# `{modname}` API reference\n"]
    head = inspect.getdoc(mod)
    if head:
        lines.append(head + "\n")

    names = _public_names(mod)
    # index
    lines.append("## Index\n")
    for n in names:
        lines.append(f"- [`{n}`](#{_anchor(title + n)})")
    lines.append("")

    for n in names:
        obj = getattr(mod, n)
        if inspect.isclass(obj):
            _document_class(n, obj, lines)
        elif callable(obj):
            _document_function(n, obj, lines)
        else:
            lines.append(f"### `{n}`\n")
            lines.append(f"Constant/value: `{obj!r}`\n")
    return "\n".join(lines) + "\n"


def main():
    OUT.mkdir(exist_ok=True)
    pages = {}

    # top level
    pages["geconpy_tpu.md"] = render_module("geconpy_tpu")
    subpackages = sorted(
        m.name for m in pkgutil.iter_modules(geconpy_tpu.__path__))
    for sub in subpackages:
        pages[f"{sub}.md"] = render_module(f"geconpy_tpu.{sub}")

    for fname, content in pages.items():
        (OUT / fname).write_text(content)
        n_entries = content.count("\n### ")
        print(f"wrote docs/api/{fname} ({n_entries} entries)")

    # index page
    idx = ["# API reference\n",
           "One page per subpackage; every name exported in the package and "
           "subpackage `__all__`s is documented.  Regenerate with "
           "`python docs/gen_api_reference.py`.\n"]
    idx.append("| Page | Contents |")
    idx.append("|---|---|")
    descr = {
        "geconpy_tpu": "top-level API (model_from_gcn, fit, simulate, ...)",
        "analysis": "IRFs, simulation, perfect foresight, OccBin, plotting, Dynare export",
        "codegen": "sympy -> JAX lowering, compiled model functions",
        "dists": "prior distributions, transforms, GCN prior resolution",
        "lang": "GCN lexer/parser/AST/validation/printer, error catalog",
        "models": "model build, steady state, perturbation, blocks/FOC engine",
        "ops": "device kernels: solvers, filters, Pallas kernels, linalg",
        "parallel": "device meshes, sharded sweeps",
        "stats": "state-space, NUTS/SMC/PMMH estimation, diagnostics, forecasting",
        "symbolic": "TimeAwareSymbol, containers, time-shift algebra",
        "utils": "formatting and reporting helpers",
    }
    for fname in ["geconpy_tpu.md"] + [f"{s}.md" for s in subpackages]:
        stem = fname[:-3]
        idx.append(f"| [{stem}]({fname}) | {descr.get(stem, '')} |")
    (OUT / "README.md").write_text("\n".join(idx) + "\n")
    print(f"wrote docs/api/README.md ({len(pages)} pages)")


if __name__ == "__main__":
    main()
