#!/usr/bin/env python
"""Interleaved same-JVM A/B for q21_waiting_suppliers join strategy
(r18 verdict item 6): the declared semi+anti self-join plans two
SortMergeJoins over three Exchange+Sort pairs; SHUFFLE_HASH hints on
the semi/anti RIGHT sides (l2/l3 — the build sides) should drop the
sorts while keeping the declared shape. Also probes hinting the LEFT
(probe) side only, which Spark uses to build-left. Timed region is
builder+collect per the bench methodology; arms alternate per round."""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(spark, sf_dir, hint_l2l3: bool):
    from pyspark.sql import functions as F

    from logvision_spark.catalog import _t

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    s = _t(spark, sf_dir, "supplier")
    ll = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ).alias("late"),
    )
    l1 = ll.where(F.col("late")).alias("l1")
    l2 = ll.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    l3 = ll.where(F.col("late")).select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    if hint_l2l3:
        l2 = l2.hint("shuffle_hash")
        l3 = l3.hint("shuffle_hash")
    l2, l3 = l2.alias("l2"), l3.alias("l3")
    waiting = (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("ok2"))
            & (F.col("l1.l_suppkey") != F.col("sk2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("ok3"))
            & (F.col("l1.l_suppkey") != F.col("sk3")),
            "left_anti",
        )
    )
    return (
        waiting.join(s, F.col("l1.l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import bench

    spark = bench._get_spark()

    ra = build(spark, sf_dir, False).collect()
    rb = build(spark, sf_dir, True).collect()
    assert [tuple(r) for r in ra] == [tuple(r) for r in rb], "results differ"
    plan = spark._jvm.PythonSQLUtils.explainString(
        build(spark, sf_dir, True)._jdf.queryExecution(), "formatted"
    )
    n_smj = plan.count("SortMergeJoin")
    n_shj = plan.count("ShuffledHashJoin")
    n_sort = plan.count("(") - plan.count("")  # placeholder, recomputed below
    n_sort = sum(1 for ln in plan.splitlines() if ln.strip().startswith("(") is False and "Sort (" in ln)
    print(f"hinted plan: SortMergeJoin={n_smj} ShuffledHashJoin={n_shj}")

    a_times, b_times = [], []
    for i in range(rounds):
        for name, flag, acc in (("smj", False, a_times), ("shj", True, b_times)):
            spark.sparkContext.setJobDescription(f"q21 {name} r{i}")
            t0 = time.perf_counter()
            build(spark, sf_dir, flag).collect()
            acc.append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)

    def stats(xs):
        return f"min {min(xs):.3f} p50 {statistics.median(xs):.3f} max {max(xs):.3f}"

    print(f"unhinted (SMJ): {stats(a_times)}")
    print(f"SHUFFLE_HASH l2/l3: {stats(b_times)}")
    spark.stop()


if __name__ == "__main__":
    main()
