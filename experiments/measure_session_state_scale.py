"""Session-window MERGING-state scale measurement (r7).

The r6 provider A/B measured flat-keyed dedup state at 1M keys; this is
the same protocol for the other stateful class the engine ships:
`session_window` keeps state per (key, OPEN session) and must merge
windows when a new event bridges two of them — a different state layout
and update path from tumbling windows or dedup.

Fixture: 8M rows, 500k users, 8 landing files = 8 event-time blocks
2h apart; within a block each user emits 2 events < 30min apart, so
each (user, block) is one session (4M sessions total). With a 10-min
watermark, the arrival of block i+1 advances the watermark past block
i's session ends: every batch carries ~500k OPEN sessions into state,
emits ~500k finalized sessions from the previous block, and evicts
them — the steady-state production pattern, not unbounded growth.

Per micro-batch we record triggerExecution, state rows, and the state
operator's memoryUsedBytes under each provider; exactly-once is
checked by comparing the emitted session set to a batch
`session_window` pass over the same corpus.

Usage: MODE=hdfs|rocksdb|rocksdb_changelog python measure_session_state_scale.py
"""
import json
import os
import sys
import tempfile
import time

MODE = os.environ["MODE"]
assert MODE in ("hdfs", "rocksdb", "rocksdb_changelog")

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
from logvision_spark.streaming.pipeline import rocksdb_state_store  # noqa: E402

N = 8_000_000
USERS = 500_000
FILES = 8
BLOCK_SEC = 7200  # blocks 2h apart; gap 30min => one session per block
base = 1_700_000_000

land = tempfile.mkdtemp(prefix=f"lv_sess_{MODE}_in_")
out = tempfile.mkdtemp(prefix=f"lv_sess_{MODE}_out_")
ckpt = tempfile.mkdtemp(prefix=f"lv_sess_{MODE}_ckpt_")

# row -> (user, block, event#): user from a hash (uniform), 2 events per
# (user, block) 0/600s apart, user-dependent offset inside the block so
# session starts are spread, not aligned
rows = spark.range(N).select(
    F.pmod(F.xxhash64("id"), F.lit(USERS)).alias("user_id"),
    (F.col("id") % FILES).cast("int").alias("block"),
    F.timestamp_seconds(
        F.lit(base)
        + (F.col("id") % FILES) * BLOCK_SEC
        + F.pmod(F.xxhash64("id"), F.lit(USERS)) % 900
        + (F.col("id") % (2 * FILES) >= FILES).cast("long") * 600
    ).alias("ts"),
)
for i in range(FILES):
    rows.where(F.col("block") == i).drop("block").coalesce(2).write.mode(
        "append"
    ).parquet(land)
print(f"landed {FILES} blocks in {land}")


def sessions(df):
    return (
        df.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("ss"),
            F.col("w.end").alias("se"),
            "n_events",
        )
    )


def run():
    src = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 2)  # one block (2 files) per batch
        .parquet(land)
        .withWatermark("ts", "10 minutes")
    )
    q = (
        sessions(src)
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(1800)
    return [
        p
        for p in (json.loads(x.json) for x in q.recentProgress)
        if p["numInputRows"] > 0
    ]


t0 = time.perf_counter()
if MODE == "hdfs":
    batches = run()
else:
    with rocksdb_state_store(spark, changelog=(MODE == "rocksdb_changelog")):
        batches = run()
wall = time.perf_counter() - t0

trig = [p["durationMs"].get("triggerExecution") for p in batches]
ops = [(p.get("stateOperators") or [{}])[0] for p in batches]
state_rows = [o.get("numRowsTotal") for o in ops]
mem_mb = [round((o.get("memoryUsedBytes") or 0) / 1e6, 1) for o in ops]

emitted = spark.read.parquet(out)
expected = sessions(spark.read.parquet(land))
# the final block's sessions never close (stream ends before the
# watermark passes them) -> compare on the watermark-closed prefix.
# 1h margin: block-7 session ends are all within 15+10 min + 30 min
# of max(se), block-6 ends all >= 1h07 before it — clean separation
cut = expected.agg(F.max("se")).first()[0]
closed = expected.where(
    F.col("se") < F.lit(cut) - F.expr("INTERVAL 1 HOUR")
)
n_emit = emitted.count()
n_closed = closed.count()
diff = emitted.join(closed, ["user_id", "ss", "se", "n_events"], "full_outer")
exact = diff.count() == n_emit == n_closed

print(
    f"RESULT mode={MODE} wall={wall:.1f}s batches={len(batches)} "
    f"trigger_ms={trig} state_rows={state_rows} state_mem_mb={mem_mb} "
    f"emitted={n_emit} expected_closed={n_closed} exact={exact}"
)
spark.stop()
