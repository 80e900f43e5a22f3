"""Docs-honesty tests.

Two contracts keep the documentation truthful as the code moves:

* every Python code fence in ``docs/examples.md`` EXECUTES, in order,
  in one shared namespace (the chapter is a single narrative: later
  examples read files earlier ones wrote) — with sizes shrunk via a
  literal substitution table so CI stays fast; and
* every backticked dotted ``tpgsd.*`` name anywhere under ``docs/``
  resolves to a real module/attribute.

The reference ships a documentation chapter with examples that can rot
silently (pgsd/doc/pgsd.tex:1217-1326); these tests make rot loud.
"""

import importlib
import re
from pathlib import Path

import pytest

DOCS = Path(__file__).resolve().parent.parent / "docs"

# same code, smaller sizes: the docs show production scales, the test
# runs the identical statements with these literals swapped
_SHRINK = [
    ("n_side=40", "n_side=12"),
    ("(100_000, 3)", "(1_000, 3)"),
    ("[100_000], np.uint32", "[1_000], np.uint32"),
    ("range(1000)", "range(3)"),
    ("range(100)", "range(3)"),
    ("static=...", "static=None"),
    ('"reference_written.gsd"', '"demo.gsd"'),
]


def _python_fences(text):
    out = []
    for m in re.finditer(r"```python\n(.*?)```", text, re.DOTALL):
        out.append(m.group(1))
    return out


def test_examples_md_executes(tmp_path, monkeypatch):
    text = (DOCS / "examples.md").read_text()
    fences = _python_fences(text)
    assert len(fences) >= 8, "examples.md lost its code fences?"
    monkeypatch.chdir(tmp_path)
    ns = {}
    for i, fence in enumerate(fences):
        src = fence
        for old, new in _SHRINK:
            src = src.replace(old, new)
        try:
            exec(compile(src, f"docs/examples.md[fence {i}]", "exec"), ns)
        except Exception as e:  # pragma: no cover - failure reporting
            pytest.fail(
                "docs/examples.md fence %d does not run: %s\n---\n%s"
                % (i, e, src)
            )


_DOTTED = re.compile(r"`(tpgsd(?:\.[A-Za-z_][A-Za-z0-9_]*)+)")


def _resolve(dotted):
    parts = dotted.split(".")
    # longest importable module prefix, then getattr the rest
    for cut in range(len(parts), 0, -1):
        try:
            obj = importlib.import_module(".".join(parts[:cut]))
        except ImportError:
            continue
        try:
            for attr in parts[cut:]:
                obj = getattr(obj, attr)
        except AttributeError:
            return False
        return True
    return False


def test_docs_dotted_names_resolve():
    missing = []
    for md in sorted(DOCS.glob("*.md")):
        for dotted in set(_DOTTED.findall(md.read_text())):
            if not _resolve(dotted):
                missing.append("%s: %s" % (md.name, dotted))
    assert not missing, "docs name symbols that do not exist:\n" + "\n".join(
        sorted(missing)
    )
