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
    tracked = visit_tracker(parse_access_log(stream))
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
