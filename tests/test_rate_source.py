"""S5/rate-source path: deterministic rate stream mapped onto sample log
lines drives the same parse + counter lineage; and HLL distinct counts
stay inside their error band vs exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from logvision_spark.parser import parse_access_log
from logvision_spark.sources.readers import load_table, read_rate_stream
from logvision_spark.streaming.pipeline import counter_views

SAMPLES = [
    '10.0.0.1 - - [10/Oct/2020:13:55:00 +0000] "GET /a HTTP/1.1" 200 10',
    '10.0.0.2 - - [10/Oct/2020:13:55:01 +0000] "POST /b HTTP/1.1" 302 20',
    '10.0.0.3 - - [10/Oct/2020:13:55:02 +0000] "GET /c HTTP/1.1" 404 30',
]


def test_rate_source_maps_onto_log_lines(spark, tmp_path):
    rate = read_rate_stream(spark, rows_per_second=50)
    lines = rate.select(
        F.element_at(
            F.array(*[F.lit(s) for s in SAMPLES]),
            (F.col("value") % len(SAMPLES) + 1).cast("int"),
        ).alias("value")
    )
    views = counter_views(parse_access_log(lines))
    q = (
        views["req_method"]
        .writeStream.format("memory")
        .queryName("rate_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        # wait until at least one non-empty trigger processed
        import time

        deadline = time.time() + 60
        while time.time() < deadline:
            rows = spark.table("rate_counts").collect()
            if rows and sum(r["cnt"] for r in rows) >= 10:
                break
            time.sleep(1)
    finally:
        q.stop()
        q.awaitTermination(30)
    got = {r["member"] for r in spark.table("rate_counts").collect()}
    assert got <= {"GET", "POST"} and "GET" in got


def test_approx_distinct_within_band(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    exact = ev.agg(F.count_distinct("user_id")).collect()[0][0]
    approx = ev.agg(F.approx_count_distinct("user_id")).collect()[0][0]
    assert abs(approx - exact) / exact <= 0.05  # default rsd 0.05
    tight = ev.agg(F.approx_count_distinct("user_id", rsd=0.01)).collect()[0][0]
    assert abs(tight - exact) / exact <= 0.02
