"""Property-based melt equivalence: for ARBITRARY row data and counter
specs, `melted_counter_deltas` must equal running each spec as its own
groupBy — NULL members kept, NULL weights dropped, `when` predicates
honored, totals exact in integer units. The example-based tests pin the
log-schema catalog; this pins the OPERATOR for any spec a user writes.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from logvision_spark.streaming.multiplex import (
    CounterSpec,
    melted_counter_deltas,
)

# small alphabets on purpose: collisions are the interesting case
member = st.one_of(st.none(), st.sampled_from(["a", "b", "c", ""]))
weight = st.one_of(st.none(), st.integers(-5, 5))
flag = st.booleans()
row = st.tuples(member, weight, flag)

SET = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(rows=st.lists(row, min_size=1, max_size=25))
@SET
def test_melt_equals_per_spec_groupbys(spark, rows):
    df = spark.createDataFrame(
        rows, "m string, w long, f boolean"
    )
    specs = [
        # plain count over every row
        CounterSpec("cnt_all", F.col("m")),
        # weighted, gated on the flag (NULL weights must drop)
        CounterSpec("w_flagged", F.col("m"), weight=F.col("w"),
                    when=F.col("f")),
        # fixed-member total (the "totals" shape)
        CounterSpec("totals", F.lit("sum_w"), weight=F.col("w")),
    ]
    got = {
        (r["counter"], r["member"]): r["delta"]
        for r in melted_counter_deltas(df, specs).collect()
    }

    expect = {}
    for r in df.groupBy("m").agg(F.count(F.lit(1)).alias("d")).collect():
        expect[("cnt_all", r["m"])] = r["d"]
    for r in (
        df.where(F.col("f") & F.col("w").isNotNull())
        .groupBy("m").agg(F.sum("w").alias("d")).collect()
    ):
        expect[("w_flagged", r["m"])] = r["d"]
    tot = df.agg(F.sum("w").alias("d")).collect()[0]["d"]
    if tot is not None:
        expect[("totals", "sum_w")] = tot

    assert got == expect


@given(rows=st.lists(row, min_size=1, max_size=25))
@SET
def test_melt_split_merge_equals_whole(spark, rows):
    """Delta additivity — the property the KV merge relies on: melting
    two halves and adding deltas equals melting the whole."""
    df = spark.createDataFrame(rows, "m string, w long, f boolean")
    specs = [
        CounterSpec("cnt", F.col("m")),
        CounterSpec("w", F.col("m"), weight=F.col("w"), when=F.col("f")),
    ]
    whole = {
        (r["counter"], r["member"]): r["delta"]
        for r in melted_counter_deltas(df, specs).collect()
    }
    n = max(1, len(rows) // 2)
    merged: dict = {}
    for part in (rows[:n], rows[n:]):
        if not part:
            continue
        pdf = spark.createDataFrame(part, "m string, w long, f boolean")
        for r in melted_counter_deltas(pdf, specs).collect():
            k = (r["counter"], r["member"])
            merged[k] = merged.get(k, 0) + r["delta"]
    assert merged == whole


if __name__ == "__main__":  # pragma: no cover
    pytest.main([__file__, "-q"])
