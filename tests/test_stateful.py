"""Custom stateful operator test: state accumulates across micro-batches
(applyInPandasWithState) and final totals equal a batch aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from logvision_spark.parser import parse_access_log, read_access_log
from logvision_spark.streaming.stateful import visit_tracker


def test_visit_tracker_accumulates_across_batches(spark, tmp_path):
    d = tmp_path / "logs"
    d.mkdir()
    # batch 1: host a twice; batch 2: host a once more + host b
    (d / "f0.log").write_text(
        '10.0.0.1 - - [10/Oct/2020:13:55:00 +0000] "GET /x HTTP/1.1" 200 100\n'
        '10.0.0.1 - - [10/Oct/2020:13:55:01 +0000] "GET /y HTTP/1.1" 200 200\n'
    )
    (d / "f1.log").write_text(
        '10.0.0.1 - - [10/Oct/2020:13:55:02 +0000] "GET /z HTTP/1.1" 200 300\n'
        '10.0.0.2 - - [10/Oct/2020:13:55:03 +0000] "GET /w HTTP/1.1" 200 -\n'
    )
    stream = (
        spark.readStream.format("text").option("maxFilesPerTrigger", 1).load(str(d))
    )
    from logvision_spark.streaming.pipeline import rocksdb_state_store

    tracked = visit_tracker(parse_access_log(stream))
    # run on the production state backend: applyInPandasWithState keeps
    # one opaque tuple per key, and RocksDB is what survives that at
    # the reference's unbounded-key cardinality
    with rocksdb_state_store(spark):
        q = (
            tracked.writeStream.format("memory")
            .queryName("visit_state")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # update mode appends per-trigger rows; the LAST row per host is the
    # accumulated state
    rows = spark.table("visit_state").collect()
    last = {}
    for r in rows:
        last[r["host"]] = (r["visits"], r["total_bytes"])
    assert last["10.0.0.1"] == (3, 600)  # accumulated across two batches
    assert last["10.0.0.2"] == (1, 0)    # '-' bytes → 0 contribution

    # equivalence with batch aggregation
    batch = (
        parse_access_log(
            spark.createDataFrame(
                [(l,) for f in ("f0.log", "f1.log") for l in (d / f).read_text().splitlines()],
                ["value"],
            )
        )
        .where(F.col("parsed"))
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("v"), F.sum(F.coalesce("bytes", F.lit(0))).alias("b"))
    )
    expected = {r["host"]: (r["v"], r["b"]) for r in batch.collect()}
    assert last == expected


def test_transform_with_state_user_totals(spark, sf_dir):
    """Stateful-v2 (transformWithStateInPandas): per-user ValueState
    totals under AvailableNow must equal the batch groupBy exactly.
    Environment-gated: the API's state protocol needs google.protobuf."""
    import pytest

    from logvision_spark.streaming.stateful import tws_available, user_totals_tws

    if not tws_available():
        pytest.skip("google.protobuf not installed; stateful-v2 unavailable")

    import tempfile

    from pyspark.sql import functions as F

    from logvision_spark.sources.readers import load_table

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    from logvision_spark.catalog import _events_stream

    src = _events_stream(spark, sf_dir)
    out = user_totals_tws(src)
    q = (
        out.writeStream.format("memory")
        .queryName("tws_totals")
        .outputMode("update")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="lv_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["n_events"], r["value_cents"])
        for r in spark.table("tws_totals")
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"), F.max("value_cents").alias("value_cents"))
        .collect()
    }
    exp = {
        (r["user_id"], r["n"], r["c"])
        for r in load_table(spark, "events", sf_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("c"),
        )
        .collect()
    }
    assert got == exp
