"""Hot-key NEAREST as-of measurement: plain vs bucketed at a 2M-row
hyperactive key (same fixture shape as the r6 backward measurement —
~2.2M-row corpus, 91% of rows on ONE key, ~55h span; results in
ARCHITECTURE.md "Hot-key NEAREST as-of"). min-of-2 per variant; the
checksum equality is the oracle (bucketing must be invisible).

Run: PYTHONPATH=/root/repo python experiments/measure_asof_nearest_hotkey.py
"""
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .config("spark.sql.adaptive.enabled", "true")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from logvision_spark.operators.asof import asof_join, asof_join_bucketed

N = 2_200_000
SPAN = 55 * 3600
base = 1_700_000_000
events = (
    spark.range(N)
    .select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") % 100 < 91, F.lit("hot"))
        .otherwise(F.concat(F.lit("u"), (F.col("id") % 997).cast("string")))
        .alias("user"),
        F.timestamp_seconds(F.lit(base) + (F.xxhash64("id") % SPAN + SPAN) % SPAN).alias("ts"),
    )
    .cache()
)
events.count()
left = events
right = events.where(F.col("event_id") % 3 == 0).select(
    "user", "ts", F.col("event_id").alias("tag")
).cache()
right.count()

def run(df):
    t0 = time.perf_counter()
    row = df.agg(F.sum(F.unix_seconds(F.col("ts_asof"))).alias("s"),
                 F.count(F.lit(1)).alias("n")).collect()[0]
    return time.perf_counter() - t0, row["s"], row["n"]

plain = lambda: asof_join(left, right, key="user", direction="nearest")
buck = lambda: asof_join_bucketed(left, right, key="user", direction="nearest", bucket="1 hour")
# warm
run(plain().limit(0)); run(buck().limit(0))
res = {}
for label, f in [("plain", plain), ("bucketed", buck)]:
    walls = []
    for i in range(2):
        w, c, n = run(f())
        walls.append(w)
        res[label] = (c, n)
    print(f"{label}: walls={['%.2f'%x for x in walls]} min={min(walls):.2f}s checksum={c} rows={n}")
print("checksums_equal=", res["plain"] == res["bucketed"])
