"""LSH band-count recall/cost A/B at 500k docs (backfills the r6
ARCHITECTURE.md "16 real LSH bands, measured" table as a runnable
script — r7 VERDICT item 6).

Corpus: 450k unique 40-token docs + 50k planted clones at shingle-
Jaccard EXACTLY 26/50 = 0.52 — deliberately just above the 0.5 drop
threshold, the similarity where single-row banding actually misses
(miss probability (1-s)^bands; at s=0.9 it is ~1e-8 and the A/B would
be vacuous). A clone keeps its source's first 28 tokens and replaces
the last 12: shared 3-gram shingles 26, per-side unique 12, so
J = 26 / (26+12+12) = 0.52 by construction.

Measured: wall time, recall on the 50k planted pairs (a pair is
recalled when at least one member lands on the drop list), and false
drops (drop-list entries beyond one-per-recalled-pair; the exact-
Jaccard verify step should keep precision at 1.0).

Run: SPARK_GRAFT_DRIVER_MEM=32g PYTHONPATH=/root/repo \
     python experiments/measure_lsh_band_recall.py
(32g: ~19M exploded shingle rows; the 8g default GC-thrashes at 32
threads — see .claude/skills/verify gotchas.)
"""

import os
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from logvision_spark.operators.dedup import near_dup_drop_list  # noqa: E402

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config(
        "spark.driver.memory",
        os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"),
    )
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

N_UNIQUE = 450_000
N_CLONES = 50_000
CLONE_BASE = 500_000  # clone of doc i gets id CLONE_BASE + i


def _tok(prefix, doc, j):
    return F.concat(F.lit(prefix), doc.cast("string"), F.lit("_"),
                    j.cast("string"))


uniques = spark.range(N_UNIQUE).select(
    F.col("id").alias("doc_id"),
    F.concat_ws(
        " ", F.transform(F.sequence(F.lit(0), F.lit(39)),
                         lambda j: _tok("d", F.col("id"), j))
    ).alias("text"),
)
clones = spark.range(N_CLONES).select(
    (F.col("id") + CLONE_BASE).alias("doc_id"),
    F.concat_ws(
        " ",
        F.concat(
            F.transform(F.sequence(F.lit(0), F.lit(27)),
                        lambda j: _tok("d", F.col("id"), j)),
            F.transform(F.sequence(F.lit(0), F.lit(11)),
                        lambda j: _tok("c", F.col("id"), j)),
        ),
    ).alias("text"),
)
docs = uniques.unionByName(clones).persist()
print(f"corpus: {docs.count()} docs ({N_UNIQUE} unique + {N_CLONES} "
      f"clones at J=0.52)")

print(f"\n{'bands':>5s} {'wall':>8s} {'recall on planted pairs':>28s} "
      f"{'false drops':>11s}")
for num_hashes, bands in ((8, 8), (16, 16)):
    t0 = time.perf_counter()
    drops = near_dup_drop_list(
        docs, threshold=0.5, num_hashes=num_hashes, bands=bands
    )
    dropped = {r["doc_id"] for r in drops.collect()}
    wall = time.perf_counter() - t0
    recalled = sum(
        1 for i in range(N_CLONES)
        if i in dropped or (CLONE_BASE + i) in dropped
    )
    false_drops = len(dropped) - recalled
    print(f"{bands:>5d} {wall:7.1f}s {recalled:>10d}/{N_CLONES} = "
          f"{100.0 * recalled / N_CLONES:6.2f}% {false_drops:>11d}")

docs.unpersist()
spark.stop()
