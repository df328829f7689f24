#!/usr/bin/env python
"""r19 interleaved A/B: cross_corpus_overlap with the Arrow byte-slice
shingle+hash pass (hashed_shingle_rows) vs the shipped JVM
explode+xxhash64 path. Same JVM, alternating runs (the bench's mixed-
query regime), bench methodology (builder + collect timed together).
Reports min / p25 / p50 and run lists. Done-bar (r18 verdict item 3):
min AND p50 better, variance within 1.5x of the JVM path."""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_old(spark, sf_dir):
    from logvision_spark.catalog import CATALOG

    return CATALOG["decontam_ngram_overlap"].builder(spark, sf_dir)


def build_new(spark, sf_dir):
    from pyspark.sql import functions as F

    from logvision_spark.catalog import _t
    from rejected_arrow_shingles_r19 import hashed_shingle_rows

    d = _t(spark, sf_dir, "documents")
    corpus = d.where(F.col("source") != "src0")
    evalset = d.where(F.col("source") == "src0")
    c = hashed_shingle_rows(corpus, n=8)
    e = hashed_shingle_rows(evalset, n=8).select("shingle").distinct()
    return (
        c.join(e, "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def main() -> None:
    import bench

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("AB_ROUNDS", "10"))
    spark = bench._get_spark()
    print("worker.reuse =", spark.conf.get("spark.python.worker.reuse", "true"))
    bench._warm_up(spark, sf_dir)
    # result-identity gate before timing
    old_rows = sorted(map(tuple, build_old(spark, sf_dir).collect()))
    new_rows = sorted(map(tuple, build_new(spark, sf_dir).collect()))
    assert old_rows == new_rows, (len(old_rows), len(new_rows))
    print("results identical:", len(old_rows), "rows")

    times = {"old": [], "new": []}
    for i in range(rounds):
        for tag, fn in (("old", build_old), ("new", build_new)):
            spark.sparkContext.setJobDescription(f"ab {tag} {i}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            times[tag].append(time.perf_counter() - t0)
    for tag, ts in times.items():
        ts_s = sorted(ts)
        print(
            f"{tag}: min={ts_s[0]:.3f} p25={ts_s[len(ts_s)//4]:.3f} "
            f"p50={statistics.median(ts_s):.3f} max={ts_s[-1]:.3f} "
            f"runs={[round(t, 3) for t in ts]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
