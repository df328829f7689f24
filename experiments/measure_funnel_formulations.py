"""Conversion-funnel formulation A/B at 20M rows / 2M users (results in
ARCHITECTURE.md "Executed-plan scan audit", round 7).

Three formulations of the ordered view→click→purchase funnel
(a_conversion_funnel's semantics), identical results required:

- old       — per-step counting: each stage DataFrame counted
              separately, recomputing its predecessors (6 scans of the
              events source in the executed plan).
- leftjoin  — stages chain through LEFT joins carrying every viewer to
              the final frame; all three counts from ONE subtree
              (3 scans, each stage computed once). SHIPPED.
- window    — one scan: stacked strictly-earlier range-frame flags
              (range (unboundedPreceding, -1) on event-time micros)
              over one (user, ts) sort, then a per-user max + global
              sum. Verified oracle-exact, but shuffles every raw event
              row where leftjoin shuffles map-side-combined per-user
              minima — measured SLOWER, which is why it is the recorded
              alternative and not the shipped form.

Run: PYTHONPATH=/root/repo python experiments/measure_funnel_formulations.py
"""
import sys
import time

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

N = 20_000_000
ev = (
    spark.range(N)
    .select(
        (F.col("id") % 2_000_000).alias("user_id"),
        F.timestamp_seconds(
            F.lit(1_700_000_000)
            + (F.xxhash64("id") % 864000 + 864000) % 864000
        ).alias("ts"),
        F.element_at(
            F.array(
                F.lit("view"), F.lit("click"), F.lit("purchase"), F.lit("scroll")
            ),
            ((F.xxhash64(F.col("id") + 7) % 4 + 4) % 4 + 1).cast("int"),
        ).alias("event_type"),
    )
    .cache()
)
ev.count()


def _unpivot(t):
    return t.select(
        F.explode(
            F.array(
                F.struct(F.lit("s1").alias("step"), F.col("s1").alias("n")),
                F.struct(F.lit("s2").alias("step"), F.col("s2").alias("n")),
                F.struct(F.lit("s3").alias("step"), F.col("s3").alias("n")),
            )
        ).alias("_e")
    ).select("_e.step", F.col("_e.n").cast("long").alias("n"))


def old_funnel(ev):
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    rows = [
        v.agg(F.count(F.lit(1)).alias("n")).select(F.lit("s1").alias("step"), "n"),
        c.agg(F.count(F.lit(1)).alias("n")).select(F.lit("s2").alias("step"), "n"),
        p.agg(F.count(F.lit(1)).alias("n")).select(F.lit("s3").alias("step"), "n"),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def leftjoin_funnel(ev):
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    cl = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("_cu"), F.col("ts").alias("_cts")
    )
    vc = (
        v.join(cl, (v["user_id"] == cl["_cu"]) & (cl["_cts"] > v["t1"]), "left")
        .groupBy("user_id")
        .agg(F.min("_cts").alias("t2"))
    )
    pu = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("_pu"), F.col("ts").alias("_pts")
    )
    vcp = (
        vc.join(pu, (vc["user_id"] == pu["_pu"]) & (pu["_pts"] > vc["t2"]), "left")
        .groupBy("user_id")
        .agg(F.min("t2").alias("t2"), F.min("_pts").alias("t3"))
    )
    return _unpivot(
        vcp.agg(
            F.count(F.lit(1)).alias("s1"),
            F.count("t2").alias("s2"),
            F.count("t3").alias("s3"),
        )
    )


def window_funnel(ev):
    ev = ev.where(F.col("event_type").isin("view", "click", "purchase"))
    order_us = F.coalesce(F.unix_micros("ts"), F.lit(9223372036854775807))
    w = (
        Window.partitionBy("user_id")
        .orderBy(order_us)
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    anchor_view = (
        (F.col("event_type") == "view") & F.col("ts").isNotNull()
    ).cast("int")
    fl = ev.select(
        "user_id", "ts", "event_type", F.max(anchor_view).over(w).alias("_sv")
    )
    qc = (
        (F.col("event_type") == "click")
        & (F.col("_sv") == 1)
        & F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
    ).cast("int")
    fl = fl.select("*", F.max(qc).over(w).alias("_sc"))
    qp = (
        (F.col("event_type") == "purchase")
        & (F.col("_sc") == 1)
        & F.col("ts").isNotNull()
    ).cast("int")
    pu = fl.groupBy("user_id").agg(
        F.max((F.col("event_type") == "view").cast("int")).alias("_v"),
        F.max(qc).alias("_c"),
        F.max(qp).alias("_p"),
    )
    return _unpivot(
        pu.agg(
            F.sum("_v").alias("s1"), F.sum("_c").alias("s2"), F.sum("_p").alias("s3")
        )
    )


results = {}
for label, fn in [
    ("old", old_funnel),
    ("leftjoin", leftjoin_funnel),
    ("window", window_funnel),
]:
    walls, res = [], None
    for _ in range(3):
        t0 = time.perf_counter()
        res = sorted(map(tuple, fn(ev).collect()))
        walls.append(time.perf_counter() - t0)
    results[label] = res
    print(
        f"{label}: walls={['%.2f' % x for x in walls]} "
        f"min={min(walls):.2f}s result={res}"
    )
print("all_equal=", len({tuple(v) for v in results.values()}) == 1)
