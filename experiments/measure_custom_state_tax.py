"""Custom-Python-state cost at 1M keys (backfills the r5/r6
ARCHITECTURE.md "Custom Python state at 1 M keys, measured" claim as a
runnable script — r7 VERDICT item 6).

Three arms over the SAME feed (8M rows in 8 parquet files, one file
per trigger, 1M distinct users, integer cents staged JVM-side):

- apws/rocksdb — `user_totals_apws` (applyInPandasWithState) on the
  RocksDB provider: every row crosses the Arrow/Python boundary and
  every touched key's state round-trips through Python.
- apws/default — same operator on the heap provider.
- jvm/rocksdb  — the built-in `groupBy(user_id).agg(sum, count)` in
  update mode: identical semantics, state stays JVM-side.

The gap between the apws arms and the JVM arm is the per-row tax of
arbitrary Python state — the measured reason applyInPandasWithState
stays the DECLARED escape hatch (semantics built-ins cannot express)
while built-in stateful aggregation is the production path everywhere
it can be. All three arms must agree on a checksum of the final
per-user totals before any timing is reported.

Run: PYTHONPATH=/root/repo python experiments/measure_custom_state_tax.py
"""

import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from logvision_spark.streaming.pipeline import rocksdb_state_store  # noqa: E402
from logvision_spark.streaming.stateful import user_totals_apws  # noqa: E402

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

N_ROWS = 8_000_000
N_FILES = 8
N_USERS = 1_000_000

feed = tempfile.mkdtemp(prefix="lv_state_tax_")
# one file per micro-batch, sliced by row-id range; user_id and the
# 2-decimal value are deterministic in id
rows_per_file = N_ROWS // N_FILES
for i in range(N_FILES):
    (
        spark.range(i * rows_per_file, (i + 1) * rows_per_file)
        .select(
            ((F.xxhash64("id") % N_USERS + N_USERS) % N_USERS).alias("user_id"),
            ((F.pmod(F.xxhash64(F.col("id") + 1), F.lit(100000))) / 100.0).alias("value"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{feed}/f{i}")
    )
print(f"feed: {N_ROWS} rows / {N_USERS} users in {N_FILES} files")


def _stream():
    # glob the per-batch dirs; one leaf file each -> 8 triggers
    return (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{feed}/f*")
    )


def _run(name, df, checksum_cols):
    ck = tempfile.mkdtemp(prefix=f"lv_tax_{name}_")
    t0 = time.perf_counter()
    q = (
        df.writeStream.format("memory")
        .queryName(f"tax_{name}")
        .outputMode("update")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(3600):
        raise TimeoutError(name)
    wall = time.perf_counter() - t0
    batches = [
        p["batchId"] for p in q.recentProgress if p["numInputRows"] > 0
    ]
    # update-mode memory sink appends every emission; the LAST row per
    # user is the final total
    final = (
        spark.table(f"tax_{name}")
        .groupBy("user_id")
        .agg(*[F.max(c).alias(c) for c in checksum_cols])
    )
    chk = final.agg(
        F.sum(F.col("user_id") * F.col(checksum_cols[0])).alias("c")
    ).collect()[0]["c"]
    n = final.count()
    print(f"{name:14s} wall {wall:7.1f}s  ({len(batches)} batches, "
          f"{n} users, checksum {chk})")
    return chk


print()
with rocksdb_state_store(spark):
    c1 = _run("apws_rocksdb", user_totals_apws(_stream()), ["value_cents"])
c2 = _run("apws_default", user_totals_apws(_stream()), ["value_cents"])
jvm = _stream().select(
    "user_id", F.round(F.col("value") * 100).cast("long").alias("cents")
).groupBy("user_id").agg(
    F.sum("cents").alias("value_cents"), F.count(F.lit(1)).alias("n_events")
)
with rocksdb_state_store(spark):
    c3 = _run("jvm_rocksdb", jvm, ["value_cents"])

assert c1 == c2 == c3, (c1, c2, c3)
print("\nequality: all three arms agree on the per-user totals checksum")

import shutil  # noqa: E402

shutil.rmtree(feed, ignore_errors=True)
spark.stop()
