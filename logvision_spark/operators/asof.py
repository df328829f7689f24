"""As-of (most-recent-match) join — an operator Spark's join menu lacks,
composed from existing DataFrame ops (the union + forward-fill-window
formulation), per the engine rule: compose built-ins before reaching for
Pandas UDFs.

Semantics (``direction``):
- ``backward`` (default): latest right row with right.ts <= left.ts;
- ``forward``: earliest right row with right.ts >= left.ts;
- ``nearest``: whichever of the two candidates is closer in time
  (ties prefer the backward/earlier row).
Equal timestamps match in every direction (inclusive).

Physical shape: one union, one shuffle by key, one sort per partition
(two sorts for ``nearest``) — the same cost class as a sort-merge join.
No per-key driver loops, no Python. Scale note: partitioning is by key
only; a single hyperactive key serializes its window — salt by coarse
time bucket first if a key can exceed one task's memory.
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
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: every left row + the matched right row per key.

    ``value_cols``: right columns to carry; the matched right timestamp
    always arrives as ``{right_ts}{suffix}``.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest: {direction}")
    lcols = left.columns
    l = left.withColumn("_src", F.lit(1)).withColumn("_ts", F.col(left_ts))
    # The matched right row travels as ONE struct, so every carried
    # field comes from the SAME row as the reported timestamp: filling
    # each column independently with last(ignorenulls) fabricated data —
    # a NULL value in the true match was silently replaced by a stale
    # value from an older row (review finding). Right rows with a NULL
    # key or NULL timestamp are excluded up front: SQL join semantics
    # never match NULL keys (Window.partitionBy would have grouped
    # them), and a row without a timestamp has no as-of position.
    r = (
        right.where(F.col(key).isNotNull() & F.col(right_ts).isNotNull())
        .select(
            F.col(key),
            F.col(right_ts).alias("_rts"),
            F.struct(
                F.col(right_ts).alias("_rts"),
                *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
            ).alias("_rpack"),
        )
        .withColumn("_src", F.lit(0))
        .withColumn("_ts", F.col("_rts"))
    )

    combined = l.unionByName(
        r.select(key, "_src", "_ts", "_rpack"),
        allowMissingColumns=True,
    )
    # right rows (_src=0) sort before left rows at equal timestamps in
    # BOTH directions → equal-ts matches are inclusive
    w_back = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts").asc(), F.col("_src").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts").desc(), F.col("_src").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    suffixed = [f"{c}{suffix}" for c in value_cols]

    def unpack(pack, out_names):
        return [
            *[pack[name].alias(name) for name in out_names],
            pack["_rts"].alias(f"{right_ts}{suffix}"),
        ]

    if direction in ("backward", "forward"):
        w = w_back if direction == "backward" else w_fwd
        filled = combined.select(
            "*", F.last(F.col("_rpack"), ignorenulls=True).over(w).alias("_f")
        )
        return filled.where(F.col("_src") == 1).select(
            *lcols, *unpack(F.col("_f"), suffixed)
        )

    # nearest: fill both directions, pick the closer candidate per row
    filled = combined.select(
        "*",
        F.last(F.col("_rpack"), ignorenulls=True).over(w_back).alias("_fb"),
        F.last(F.col("_rpack"), ignorenulls=True).over(w_fwd).alias("_ff"),
    ).where(F.col("_src") == 1)
    l_us = F.unix_micros(F.col("_ts"))
    back_us = F.unix_micros(F.col("_fb")["_rts"])
    fwd_us = F.unix_micros(F.col("_ff")["_rts"])
    use_back = F.col("_fb")["_rts"].isNotNull() & (
        F.col("_ff")["_rts"].isNull() | ((l_us - back_us) <= (fwd_us - l_us))
    )
    pick = F.when(use_back, F.col("_fb")).otherwise(F.col("_ff"))
    return filled.select(*lcols, *unpack(pick, suffixed))
