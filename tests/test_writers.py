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


def test_zorder_key_morton_roundtrip(spark):
    """De-interleaving even/odd bits of the Morton key must reconstruct
    both inputs exactly — the bijectivity that makes the layout key safe
    to sort by."""
    from logvision_spark.sources.writers import zorder_key

    df = spark.createDataFrame(
        [(x, y) for x in (0, 1, 5, 255, 65535) for y in (0, 3, 128, 65535)],
        ["x", "y"],
    )
    rows = df.select(
        "x", "y", zorder_key(F.col("x"), F.col("y")).alias("z")
    ).collect()
    for r in rows:
        x = sum(((r["z"] >> (2 * i)) & 1) << i for i in range(16))
        y = sum(((r["z"] >> (2 * i + 1)) & 1) << i for i in range(16))
        assert (x, y) == (r["x"], r["y"])


def test_zordered_write_gives_nonoverlapping_key_ranges(spark, sf_dir, tmp_path):
    """Files written by write_zordered own contiguous Z-key ranges (the
    property footer-stats skipping needs) and both dimensions show
    per-file locality: average per-file user_id span is well under the
    global span."""
    import os

    from logvision_spark.sources.writers import write_zordered, zorder_key

    ev = load_table(spark, "events", sf_dir).select(
        "event_id",
        F.pmod(F.col("user_id"), F.lit(65536)).alias("uid"),
        F.pmod(
            F.unix_timestamp(F.date_trunc("second", F.col("ts"))), F.lit(65536)
        ).alias("sec"),
    )
    out = str(tmp_path / "ev_z")
    write_zordered(ev, out, "uid", "sec", num_files=8)
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) > 1
    spans, ranges = [], []
    for f in files:
        pdf = spark.read.parquet(os.path.join(out, f)).select(
            "uid", "sec", zorder_key(F.col("uid"), F.col("sec")).alias("z")
        ).toPandas()
        if len(pdf) == 0:
            continue
        ranges.append((int(pdf["z"].min()), int(pdf["z"].max())))
        spans.append(int(pdf["sec"].max()) - int(pdf["sec"].min()))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, "z-key ranges overlap across files"
    # locality shows on the dimension wide enough to split (sec spans
    # ~65k values; the fixture's user_id domain is narrower than the
    # file count, so its span can't shrink)
    g = ev.agg(
        (F.max("sec") - F.min("sec")).alias("span")
    ).collect()[0]["span"]
    assert sum(spans) / len(spans) < 0.8 * g, "no per-file locality gained"
