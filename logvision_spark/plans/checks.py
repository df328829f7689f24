"""Physical-plan introspection helpers.

The engine's scale guarantees are plan *shapes*, not hopes: filters reach
the parquet scan, projections prune columns, small dims broadcast, top-k
plans as TakeOrderedAndProject, hot paths stay inside WholeStageCodegen
(no Python evaluation nodes). These helpers make those shapes assertable
in tests so a refactor that silently de-optimizes a query fails CI.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def explain_str(df: DataFrame) -> str:
    """Executed physical plan as text (same content as .explain())."""
    return df._jdf.queryExecution().executedPlan().toString()


@dataclass
class PlanFeatures:
    take_ordered: bool = False
    broadcast_joins: int = 0
    sort_merge_joins: int = 0
    hash_aggregates: int = 0
    python_eval: bool = False
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)

    def reads_only(self, *cols: str) -> bool:
        """True if every scan reads a subset of the given columns."""
        allowed = set(cols)
        for rs in self.read_schemas:
            names = {f.split(":")[0] for f in re.split(r",(?=\w+:)", rs) if f}
            if not names <= allowed:
                return False
        return True


def broadcast_hint_count(df: DataFrame) -> int:
    """Number of explicit user-pinned broadcast hints (``F.broadcast``)
    in the ANALYZED logical plan — distinct from runtime broadcast
    choices, which the autoBroadcastJoinThreshold / AQE make in the
    physical plan and which are free to vary with data size. A pin on an
    SF-scaling table bypasses both and OOMs at the 100 TB design point,
    so tests assert pins exist ONLY on true constants (nation/region,
    single-row aggregates)."""
    plan = df._jdf.queryExecution().analyzed().toString()
    return plan.count("ResolvedHint (strategy=broadcast)")


def plan_features(df: DataFrame) -> PlanFeatures:
    plan = explain_str(df)
    return PlanFeatures(
        take_ordered="TakeOrderedAndProject" in plan,
        broadcast_joins=len(re.findall("BroadcastHashJoin", plan)),
        sort_merge_joins=len(re.findall("SortMergeJoin", plan)),
        hash_aggregates=len(re.findall("HashAggregate", plan)),
        python_eval=("BatchEvalPython" in plan or "ArrowEvalPython" in plan),
        # the filter list may be truncated with '…' before its closing
        # bracket (TreeNode maxFields) — capture to end of line
        pushed_filters=[
            m.rstrip("], ")
            for m in re.findall(r"PushedFilters: \[([^\n]*)", plan)
            if m.strip("[], ")
        ],
        read_schemas=re.findall(r"ReadSchema: struct<([^>]*)>", plan),
    )
