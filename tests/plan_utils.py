"""Shared plan-inspection helpers for the batch-side plan-shape tests
(one definition of the AQE-section split and the Python-eval blacklist;
review finding: test_multiplex and test_streaming_plan_quality had
copy-pasted both)."""

from __future__ import annotations

import pytest

PYTHON_EVAL_NODES = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "FlatMapGroupsInPandas",
)


def final_plan(df) -> str:
    """Executed-plan text, FINAL section only. AQE's toString appends an
    '== Initial Plan ==' copy after the final plan, so counting nodes
    over the raw string doubles everything.

    `_jdf.queryExecution()` is private API (same class of risk as
    test_streaming_plan_quality._explain_internal, which got the
    version guard in r7) — skip rather than error if a PySpark upgrade
    removes it, so a plan-SHAPE pin never masquerades as a correctness
    failure."""
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    except AttributeError:  # pragma: no cover - private-API drift
        pytest.skip("DataFrame._jdf.queryExecution unavailable")
    return plan.split("== Initial Plan ==")[0]


def assert_no_python_eval(plan: str) -> None:
    for node in PYTHON_EVAL_NODES:
        assert node not in plan, plan[:1500]
