"""Shared plan-inspection helpers for the batch-side plan-shape tests
(one definition of the AQE-section split and the Python-eval blacklist;
review finding: test_multiplex and test_streaming_plan_quality had
copy-pasted both)."""

from __future__ import annotations

PYTHON_EVAL_NODES = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "FlatMapGroupsInPandas",
)


def final_plan(df) -> str:
    """Executed-plan text, FINAL section only. AQE's toString appends an
    '== Initial Plan ==' copy after the final plan, so counting nodes
    over the raw string doubles everything."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def assert_no_python_eval(plan: str) -> None:
    for node in PYTHON_EVAL_NODES:
        assert node not in plan, plan[:1500]
