#!/usr/bin/env python
"""Interleaved same-JVM A/B: the r18 two-branch ivf_topk_batch recall
harness (operator top-k ⋈SMJ brute-force top-k — two corpus scans) vs
the r19 shared-scan ivf_recall_table form. Bench methodology: the timed
region is builder+collect, alternating A/B per round so box-speed
drift hits both arms equally. Uses the memoized quantizer exactly like
the catalog entry (fit off the clock in both arms — the fit price is
the COLD sidecar's job)."""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import bench
    from pyspark.sql import functions as F

    from logvision_spark.catalog import _ivf_model, _t
    from logvision_spark.operators.similarity import (
        cosine_cols_sql,
        ivf_recall_table,
        ivf_topk_batch,
    )

    spark = bench._get_spark()

    def old_form():
        emb = _t(spark, sf_dir, "embeddings")
        qs = emb.where(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
        )
        base = emb.where(F.col("vec_id") >= 3)
        model = _ivf_model(base, sf_dir, "ge3", n_cells=16, seed=42)
        ivf = ivf_topk_batch(
            base, qs, k=10, n_cells=16, n_probe=15, seed=42, model=model
        )
        scored = base.crossJoin(F.broadcast(qs)).selectExpr(
            "q_id",
            "vec_id",
            f"round({cosine_cols_sql('embedding', 'qe')}, 6) AS cos_sim",
        )
        exact = (
            scored.selectExpr(
                "*",
                "row_number() OVER (PARTITION BY q_id "
                "ORDER BY cos_sim DESC, vec_id) AS rn",
            )
            .where(F.col("rn") <= 10)
            .drop("rn")
        )
        hits = ivf.join(exact, ["q_id", "vec_id", "cos_sim"])
        return hits.groupBy("q_id").agg(
            (F.count(F.lit(1)) >= 7).alias("recall_ok")
        )

    def new_form():
        emb = _t(spark, sf_dir, "embeddings")
        qs = emb.where(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
        )
        base = emb.where(F.col("vec_id") >= 3)
        model = _ivf_model(base, sf_dir, "ge3", n_cells=16, seed=42)
        hits = ivf_recall_table(
            base, qs, k=10, n_cells=16, n_probe=15, seed=42, model=model
        )
        return hits.groupBy("q_id").agg(
            (F.count(F.lit(1)) >= 7).alias("recall_ok")
        )

    # warm-up both arms (plan/codegen + the fit memo) off the clock
    ra = sorted(map(tuple, old_form().collect()))
    rb = sorted(map(tuple, new_form().collect()))
    assert ra == rb, (ra, rb)

    a_times, b_times = [], []
    for i in range(rounds):
        for name, fn, acc in (("old", old_form, a_times), ("new", new_form, b_times)):
            spark.sparkContext.setJobDescription(f"ivf recall {name} r{i}")
            t0 = time.perf_counter()
            fn().collect()
            acc.append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)

    def stats(xs):
        return f"min {min(xs):.3f} p50 {statistics.median(xs):.3f} max {max(xs):.3f}"

    print(f"old (two-branch): {stats(a_times)}")
    print(f"new (shared-scan): {stats(b_times)}")
    spark.stop()


if __name__ == "__main__":
    main()
