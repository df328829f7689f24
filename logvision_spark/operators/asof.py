"""As-of (most-recent-match) join — an operator Spark's join menu lacks,
composed from existing DataFrame ops (the union + forward-fill-window
formulation), per the engine rule: compose built-ins before reaching for
Pandas UDFs.

Semantics: for each left row, attach the latest right row with the same
key and right.ts <= left.ts (ties: the right row wins, i.e. inclusive).

Physical shape: one union, one shuffle by key, one sort per partition —
the same cost class as a sort-merge join. No per-key driver loops, no
Python. Scale note: partitioning is by key only; a single hyperactive key
serializes its window — salt by coarse time bucket first if a key can
exceed one task's memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: tuple[str, ...] = (),
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every left row + the most recent right row per key.

    ``value_cols``: right columns to carry (forward-filled); the matched
    right timestamp always arrives as ``{right_ts}{suffix}``.
    """
    lcols = left.columns
    l = left.withColumn("_src", F.lit(1)).withColumn("_ts", F.col(left_ts))
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("_rts"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    ).withColumn("_src", F.lit(0)).withColumn("_ts", F.col("_rts"))

    carried = [f"{c}{suffix}" for c in value_cols] + ["_rts"]
    combined = l.unionByName(
        r.select(
            key, "_src", "_ts", *carried
        ),
        allowMissingColumns=True,
    )
    # right rows sort before left rows at equal timestamps → inclusive <=
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts").asc(), F.col("_src").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = combined.select(
        "*",
        *[
            F.last(F.col(c), ignorenulls=True).over(w).alias(f"_f_{c}")
            for c in carried
        ],
    )
    suffixed = [f"{c}{suffix}" for c in value_cols]
    out = filled.where(F.col("_src") == 1).select(
        *lcols,
        *[F.col(f"_f_{name}").alias(name) for name in suffixed],
        F.col("_f__rts").alias(f"{right_ts}{suffix}"),
    )
    return out
