"""Writer tests: partition pruning actually prunes; bucketed joins
actually skip the shuffle (Exchange-free plan)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from logvision_spark.plans.checks import explain_str
from logvision_spark.sources.readers import load_table
from logvision_spark.sources.writers import write_bucketed_table, write_partitioned


def test_partitioned_write_prunes_on_read(spark, sf_dir, tmp_path):
    ev = load_table(spark, "events", sf_dir)
    out = str(tmp_path / "events_by_type")
    write_partitioned(ev, out, partition_by=("event_type",))
    assert sorted(d for d in os.listdir(out) if d.startswith("event_type="))
    back = spark.read.parquet(out).where(F.col("event_type") == "error")
    plan = explain_str(back)
    # partition filter must appear as pruning, not a data filter over all rows
    assert "PartitionFilters" in plan and "error" in plan


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    # warehouse.dir is static config — park the tables in a LOCATION'd db
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktest LOCATION '{tmp_path}/wh'")
    orders = load_table(spark, "orders", sf_dir)
    lineitem = load_table(spark, "lineitem", sf_dir)
    write_bucketed_table(
        orders.select("o_orderkey", "o_totalprice"),
        "bktest.orders_b", "o_orderkey", num_buckets=8, sort_by="o_orderkey",
    )
    write_bucketed_table(
        lineitem.select("l_orderkey", "l_quantity"),
        "bktest.lineitem_b", "l_orderkey", num_buckets=8, sort_by="l_orderkey",
    )
    ob, lb = spark.table("bktest.orders_b"), spark.table("bktest.lineitem_b")
    # force sort-merge so the test checks bucketing, not broadcast
    joined = ob.hint("merge").join(lb, ob.o_orderkey == lb.l_orderkey)
    plan = explain_str(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, "bucketed join must not shuffle"
    # and it still computes the right thing
    expected = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey).count()
    )
    assert joined.count() == expected
    spark.sql("DROP DATABASE bktest CASCADE")
