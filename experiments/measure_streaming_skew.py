"""Streaming-state hot-key skew at 10M rows (r7 VERDICT item 4) —
results in ARCHITECTURE.md "Round-8 delta".

The batch side has salted aggregation with a driver oracle
(`a3_count_by_user_salted`, skew.py). The streaming side's stateful
aggregation shuffles by key into state partitions, and the reference's
real workload shape is Zipf-hot (host/url, SURVEY.md §4.2) — so: does a
90%-hot-key feed serialize triggers on one state partition?

Two arms over the SAME feed (10M rows, 8 files → 8 triggers, 90% of
rows on ONE host, the rest over 1M cold hosts), both on RocksDB:

- plain  — groupBy(host).count() in update mode: the counter_views
           shape. Hypothesis: safe, because streaming aggregation runs
           a PARTIAL HashAggregate BEFORE the state-partition exchange
           (same map-side combine as batch), so the hot key arrives at
           its state partition as ~num_tasks partial rows per trigger,
           not 1.125M raw rows.
- salted — two-phase: groupBy(host, salt%16).count() partials in
           update mode, merged at read (the form to SHIP if the
           hypothesis fails).

Per-trigger durations from StreamingQuery.recentProgress decide; both
arms must agree with one batch groupBy over the whole feed.

Run: PYTHONPATH=/root/repo python experiments/measure_streaming_skew.py
"""

import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from logvision_spark.streaming.pipeline import rocksdb_state_store  # noqa: E402

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

N_ROWS = 10_000_000
N_FILES = 8
N_COLD = 1_000_000
rows_per_file = N_ROWS // N_FILES

feed = tempfile.mkdtemp(prefix="lv_skew_")
for i in range(N_FILES):
    (
        spark.range(i * rows_per_file, (i + 1) * rows_per_file)
        .select(
            F.when(
                F.pmod(F.xxhash64("id"), F.lit(10)) < 9, F.lit("hot.example")
            )
            .otherwise(
                F.concat(
                    F.lit("c"),
                    ((F.xxhash64(F.col("id") + 3) % N_COLD + N_COLD)
                     % N_COLD).cast("string"),
                )
            )
            .alias("host"),
            # row id rides along as the salt source: salting must be
            # retry-deterministic (xxhash64 of a stable column, never
            # rand() — skew.py doctrine), and host is the only other col
            F.col("id"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{feed}/f{i}")
    )
print(f"feed: {N_ROWS} rows, 90% on one host, ~{N_COLD} cold hosts")

expected = (
    spark.read.parquet(f"{feed}/f*")
    .groupBy("host")
    .count()
    .agg(
        F.count(F.lit(1)).alias("hosts"),
        F.max("count").alias("hot"),
        # pmod keeps cnt*hash inside BIGINT (ANSI sum overflow otherwise)
        F.sum(F.col("count") * F.pmod(F.xxhash64("host"), F.lit(1000003))).alias("chk"),
    )
    .collect()[0]
)


def _stream():
    return (
        spark.readStream.schema("host string, id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{feed}/f*")
    )


def _run(name, agg_df, finalize):
    ck = tempfile.mkdtemp(prefix=f"lv_skew_{name}_")
    with rocksdb_state_store(spark):
        t0 = time.perf_counter()
        q = (
            agg_df.writeStream.format("memory")
            .queryName(f"skew_{name}")
            .outputMode("update")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(3600):
            raise TimeoutError(name)
        wall = time.perf_counter() - t0
    trig = [
        p["durationMs"]["triggerExecution"]
        for p in q.recentProgress
        if p["numInputRows"] > 0
    ]
    got = finalize(spark.table(f"skew_{name}")).collect()[0]
    assert (got["hosts"], got["hot"], got["chk"]) == (
        expected["hosts"], expected["hot"], expected["chk"]
    ), (name, got, expected)
    print(f"{name:7s} wall {wall:6.1f}s  per-trigger ms: {trig}")
    return wall


def _final_plain(tbl):
    # update-mode memory sink: last emission per host is the total
    return tbl.groupBy("host").agg(F.max("cnt").alias("cnt")).agg(
        F.count(F.lit(1)).alias("hosts"),
        F.max("cnt").alias("hot"),
        F.sum(F.col("cnt") * F.pmod(F.xxhash64("host"), F.lit(1000003))).alias("chk"),
    )


def _final_salted(tbl):
    # max per (host, salt) partial, then sum partials per host
    return (
        tbl.groupBy("host", "salt")
        .agg(F.max("cnt").alias("cnt"))
        .groupBy("host")
        .agg(F.sum("cnt").alias("cnt"))
        .agg(
            F.count(F.lit(1)).alias("hosts"),
            F.max("cnt").alias("hot"),
            F.sum(F.col("cnt") * F.pmod(F.xxhash64("host"), F.lit(1000003))).alias("chk"),
        )
    )


print()
plain = _run(
    "plain",
    _stream().groupBy("host").agg(F.count(F.lit(1)).alias("cnt")),
    _final_plain,
)
salted = _run(
    "salted",
    _stream()
    .withColumn("salt", F.pmod(F.xxhash64("id"), F.lit(16)))
    .groupBy("host", "salt")
    .agg(F.count(F.lit(1)).alias("cnt")),
    _final_salted,
)
print(
    f"\nplain/salted wall ratio: {plain / salted:.2f} "
    f"(<1.15 -> partial agg already collapses the hot key map-side; "
    f"salting buys nothing for combinable counters)"
)

import shutil  # noqa: E402

shutil.rmtree(feed, ignore_errors=True)
spark.stop()
