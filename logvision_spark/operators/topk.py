"""Sort / top-k / rank operators K1-K7 (SURVEY.md §2.5).

The reference's ORDER BY/LIMIT surface is Redis `zrevrange` plus client-side
Python sorts (flask/app.py:131,163,185,218,241,264-271). Here:

- top-k = `orderBy(...).limit(k)` → Spark plans `TakeOrderedAndProject`:
  each partition keeps a bounded k-row heap and only k rows per partition
  travel to the driver — no global sort, no full shuffle. This is the plan
  that survives 100 TB (k rows/task, not rows/task).
- ranking = `row_number()` over a window; for the global-rank case we first
  take-ordered k rows, THEN rank the k-row result — windowing k rows, not
  the full table (a global un-partitioned window at 100 TB would serialize
  on one task).

Determinism: ties are broken by the key column so results are stable across
partitionings — required for the oracle hash-compare and just as desirable
in production.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(
    df: DataFrame,
    order_col: str | Column,
    k: int,
    tiebreak: str | Column | None = None,
    ascending: bool = False,
) -> DataFrame:
    """K1-K5: top-k rows by a measure with deterministic tie-break.

    K1 top-10 urls (app.py:163), K2 top-14 ips (app.py:185), K3 top-51
    hosts (app.py:131,288), K4 top-101 status/methods (app.py:218,241).
    """
    order = F.col(order_col) if isinstance(order_col, str) else order_col
    order = order.asc() if ascending else order.desc()
    cols = [order]
    if tiebreak is not None:
        tb = F.col(tiebreak) if isinstance(tiebreak, str) else tiebreak
        cols.append(tb.asc())
    return df.orderBy(*cols).limit(k)


def ranked(
    df: DataFrame,
    order_col: str | Column,
    tiebreak: str | Column | None = None,
    rank_alias: str = "rank",
    ascending: bool = False,
) -> DataFrame:
    """K6: attach 1-based rank (the reference's hand-rolled `no += 1` loop,
    app.py:165-169,187-201). Call on an already-reduced or top-k'd frame;
    the un-partitioned window is fine there because the input is small by
    construction (post-limit / post-aggregation)."""
    order = F.col(order_col) if isinstance(order_col, str) else order_col
    order = order.asc() if ascending else order.desc()
    cols = [order]
    if tiebreak is not None:
        tb = F.col(tiebreak) if isinstance(tiebreak, str) else tiebreak
        cols.append(tb.asc())
    w = Window.orderBy(*cols)
    return df.withColumn(rank_alias, F.row_number().over(w))


def top_k_ranked(
    df: DataFrame,
    order_col: str,
    k: int,
    tiebreak: str | None = None,
    rank_alias: str = "rank",
) -> DataFrame:
    """top-k then rank the k rows — the composition every reference
    ranking panel uses (app.py:163-169: zrevrange + enumerate)."""
    return ranked(top_k(df, order_col, k, tiebreak), order_col, tiebreak, rank_alias)
