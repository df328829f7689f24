"""RocksDB recovery-latency measurement at 1M-key state scale.

Mirrors the r6 provider A/B fixture (10M rows, ~1M distinct dedup keys,
8 landing files x 1.25M rows, dropDuplicatesWithinWatermark, local[32]):
run ~half the batches, STOP the query mid-stream, restart from the same
checkpoint, and measure restart-to-first-batch-commit — the state-reload
latency — plus per-commit times and checkpoint sizes, under both RocksDB
checkpoint modes (full-snapshot vs changelog).

Usage: MODE=changelog|snapshot python experiments/measure_rocksdb_recovery.py
"""
import json
import os
import subprocess
import sys
import tempfile
import time

MODE = os.environ["MODE"]
assert MODE in ("snapshot", "changelog")

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
sys.path.insert(0, "/root/repo")
from logvision_spark.operators.dedup import streaming_exact_dedup  # noqa: E402
from logvision_spark.streaming.pipeline import rocksdb_state_store  # noqa: E402

N = 10_000_000
KEYS = 1_000_000
FILES = 8

land = tempfile.mkdtemp(prefix=f"lv_rec_{MODE}_in_")
ckpt = tempfile.mkdtemp(prefix=f"lv_rec_{MODE}_ckpt_")
base = 1_700_000_000
rows = spark.range(N).select(
    F.col("id").alias("event_id"),
    F.concat(F.lit("k"), F.pmod(F.xxhash64("id"), F.lit(KEYS)).cast("string")).alias("key"),
    F.timestamp_seconds(F.lit(base) + F.col("id") % 86_400).alias("ts"),
)
for i in range(FILES):
    rows.where(F.col("event_id") % FILES == i).coalesce(1).write.mode(
        "append"
    ).parquet(land)
print(f"landed {FILES} files in {land}")


def du(path):
    return int(subprocess.check_output(["du", "-sb", path]).split()[0])


out = tempfile.mkdtemp(prefix=f"lv_rec_{MODE}_out_")


def start_query(tag):
    src = (
        spark.readStream.schema("event_id long, key string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(land)
    )
    dd = streaming_exact_dedup(src, content_col="key", ts_col="ts",
                               watermark="7 days").select("event_id", "key")
    # parquet sink: supports exactly-once checkpoint recovery (the
    # memory sink refuses to resume an append-mode checkpoint)
    return (
        dd.writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )


def batches_of(q):
    return [p for p in (json.loads(x.json) for x in q.recentProgress)
            if p["numInputRows"] > 0]


with rocksdb_state_store(spark, changelog=(MODE == "changelog")):
    # phase 1: run, then stop after >=4 data batches have committed
    t0 = time.perf_counter()
    q = start_query("p1")
    commit_ms = []
    while True:
        time.sleep(0.2)
        done = batches_of(q)
        if len(done) >= 4 or not q.isActive:
            break
    q.stop()
    q.awaitTermination(60)
    p1 = batches_of(q)
    commit_ms = [p["durationMs"].get("triggerExecution") for p in p1]
    n_p1 = len(p1)
    ckpt_mid = du(ckpt)
    print(f"phase1: stopped after {n_p1} batches, "
          f"triggerExecution_ms={commit_ms}, ckpt={ckpt_mid/1e6:.1f}MB")

    # phase 2: restart from the same checkpoint — measure to first commit
    t_restart = time.perf_counter()
    q2 = start_query("p2")
    first_commit = None
    while q2.isActive:
        time.sleep(0.05)
        got = batches_of(q2)
        if got and first_commit is None:
            first_commit = time.perf_counter() - t_restart
    q2.awaitTermination(120)
    total_restart = time.perf_counter() - t_restart
    got = batches_of(q2)
    if got and first_commit is None:
        first_commit = total_restart
    survivors = spark.read.parquet(out).count()
    expected = spark.read.parquet(land).dropDuplicates(["key"]).count()
    print(
        f"RESULT mode={MODE} restart_to_first_commit={first_commit:.2f}s "
        f"drain_after_restart={total_restart:.2f}s "
        f"p2_batches={len(got)} "
        f"p2_trigger_ms={[p['durationMs'].get('triggerExecution') for p in got]} "
        f"ckpt_mid={ckpt_mid/1e6:.1f}MB ckpt_final={du(ckpt)/1e6:.1f}MB "
        f"survivors={survivors} expected={expected} "
        f"exact={survivors == expected}"
    )
spark.stop()
