"""Regenerate tests/builder_fingerprints.json — the snapshot that makes
the hand-maintained catalog._EDITED_ROUND registry self-enforcing.

Run AFTER bumping _EDITED_ROUND for the builders you edited:

    python tests/update_builder_fingerprints.py

test_export_order.test_edited_round_registry_tracks_builder_edits fails
when a builder's fingerprint differs from this snapshot without a
corresponding _EDITED_ROUND bump to the current round — the failure
mode the registry was built to prevent is forgetting the bump entirely
(r6 review finding: nothing could detect the omission).
"""

from __future__ import annotations

import ast
import hashlib
import inspect
import json
import os
import re
import sys
import textwrap

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SNAPSHOT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "builder_fingerprints.json")

_IMPORT_RE = re.compile(r"from (logvision_spark[.\w]+) import")


_HELPERS_MEMO: dict[str, str] | None = None


def _catalog_helpers() -> dict[str, str]:
    """name -> source for every module-level callable defined in
    logvision_spark.catalog that is NOT itself a registered builder —
    the shared-helper surface (_t, _run_stream_to_memory,
    _events_stream, _shared_shingles, ...) whose edits the r6 tripwire
    could not see (r6 ADVICE: the _run_stream_to_memory refactor
    removed the direct pipeline imports from the stream builders, so a
    provider-migration edit to the helper left every fingerprint
    unchanged)."""
    global _HELPERS_MEMO
    if _HELPERS_MEMO is not None:
        return _HELPERS_MEMO
    import logvision_spark.catalog as cat

    builders = {c.builder.__name__ for c in cat.CATALOG.values()}
    out: dict[str, str] = {}
    for nm, obj in vars(cat).items():
        if not callable(obj) or isinstance(obj, type):
            continue
        if getattr(obj, "__module__", None) != "logvision_spark.catalog":
            continue
        if nm in builders:
            continue
        try:
            out[nm] = inspect.getsource(obj)
        except (OSError, TypeError):
            pass
    _HELPERS_MEMO = out
    return out


def _referenced_names(src: str) -> set[str]:
    """Identifiers referenced by CODE in ``src`` — ast-based, so a
    helper mentioned only in a docstring or comment does not get pulled
    into the fingerprint closure (r7 ADVICE: the bare-name regex over
    raw source made fingerprints churn on doc-only edits to helpers
    that were merely mentioned). Falls back to the over-inclusive word
    scan if the snippet does not parse standalone — over-triggering
    re-greens is the safe direction."""
    try:
        tree = ast.parse(textwrap.dedent(src))
    except SyntaxError:  # pragma: no cover - decorator/partial snippets
        return {m.group(0) for m in re.finditer(r"\w+", src)}
    # Docstring Constant nodes are excluded from the string scan below —
    # pulling them in is exactly the doc-edit churn the r7 fix removed.
    # So are strings inside @register(...) decorator calls (r9 ADVICE):
    # inspect.getsource(builder) includes the decorator, and its oracle=
    # SQL / doc= prose are documentation, not code — a helper merely
    # MENTIONED there must not pull its source into the closure. Strings
    # in the builder BODY (F.expr/spark.sql text naming a UDF) still
    # count, which is the r8 case the scan exists for.
    excluded: set[int] = set()
    for node in ast.walk(tree):
        if isinstance(node, (ast.Module, ast.FunctionDef,
                             ast.AsyncFunctionDef, ast.ClassDef)):
            body = getattr(node, "body", [])
            if (body and isinstance(body[0], ast.Expr)
                    and isinstance(body[0].value, ast.Constant)
                    and isinstance(body[0].value.value, str)):
                excluded.add(id(body[0].value))
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for dec in node.decorator_list:
                if (isinstance(dec, ast.Call)
                        and isinstance(dec.func, ast.Name)
                        and dec.func.id == "register"):
                    for sub in ast.walk(dec):
                        if (isinstance(sub, ast.Constant)
                                and isinstance(sub.value, str)):
                            excluded.add(id(sub))
    names: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            names.add(node.id)
        elif isinstance(node, ast.Attribute):
            names.add(node.attr)
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                               ast.ClassDef)):
            names.add(node.name)
        elif isinstance(node, ast.alias):
            names.add(node.asname or node.name.split(".")[0])
        elif (isinstance(node, ast.Constant)
              and isinstance(node.value, str)
              and id(node) not in excluded):
            # r8 ADVICE: a helper referenced only inside a string
            # literal (a UDF named in F.expr()/spark.sql() text) must
            # still reach the fingerprint closure.
            names.update(re.findall(r"\w+", node.value))
    return names


def fingerprint_material(name: str) -> list[tuple[str, str]]:
    """The (label, content) parts hashed into an entry's fingerprint:
    the builder's own source, then — transitively — the source of every
    catalog-module helper the reachable CODE references (ast-scanned,
    so docstring/comment mentions don't count), and the full file
    content of every logvision_spark module any reachable source
    imports. Deterministic order: builder first, then sorted helper
    names, then sorted module paths. Still best-effort (module-level
    CONSTANTS and helpers referenced only via getattr are not
    captured), but the helper closure now covers exactly the class of
    edit the r6 registry missed."""
    sys.path.insert(0, ROOT)
    from logvision_spark.catalog import CATALOG

    helpers = _catalog_helpers()
    builder_src = inspect.getsource(CATALOG[name].builder)
    used: dict[str, str] = {}
    mods: set[str] = set(_IMPORT_RE.findall(builder_src))
    frontier = [builder_src]
    while frontier:
        src = frontier.pop()
        referenced = _referenced_names(src)
        for helper, hsrc in helpers.items():
            if helper in used:
                continue
            if helper in referenced:
                used[helper] = hsrc
                mods.update(_IMPORT_RE.findall(hsrc))
                frontier.append(hsrc)
    parts: list[tuple[str, str]] = [("builder", builder_src)]
    for helper in sorted(used):
        parts.append((f"helper:{helper}", used[helper]))
    for mod in sorted(mods):
        path = os.path.join(ROOT, *mod.split(".")) + ".py"
        if os.path.exists(path):
            with open(path, encoding="utf-8") as f:
                parts.append((f"module:{mod}", f.read()))
    return parts


def builder_fingerprint(name: str) -> str:
    h = hashlib.sha256()
    for label, content in fingerprint_material(name):
        h.update(label.encode())
        h.update(b"\x00")
        h.update(content.encode())
        h.update(b"\x00")
    return h.hexdigest()


def main() -> None:
    sys.path.insert(0, ROOT)
    from logvision_spark.catalog import CATALOG

    snap = {name: builder_fingerprint(name) for name in CATALOG}
    with open(SNAPSHOT, "w") as f:
        json.dump(snap, f, indent=0, sort_keys=True)
        f.write("\n")
    print(f"wrote {len(snap)} fingerprints to {SNAPSHOT}")


if __name__ == "__main__":
    main()
