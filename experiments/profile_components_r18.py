#!/usr/bin/env python
"""Component-level timing for the r18 hot queries (guide §1.4: noop sink
so the computation is timed, not the sink; §1.5: labeled jobs). One JVM,
min of N runs per component — attribution only, not the published bench.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def t(label, thunk, runs=3):
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        thunk()
        best = min(best, time.perf_counter() - t0)
    print(f"{best:8.3f}  {label}", flush=True)
    return best


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import bench
    from pyspark.sql import functions as F

    from logvision_spark.catalog import CATALOG, _t
    from logvision_spark.operators import dedup as D

    spark = bench._get_spark()
    bench._warm_up(spark, sf_dir)
    sc = spark.sparkContext
    docs = _t(spark, sf_dir, "documents")

    which = sys.argv[1:] or ["simhash", "minhash", "clusters", "ivf"]

    if "simhash" in which:
        sc.setJobDescription("simhash: explode unigrams only")
        sh = D.exploded_shingles(docs, n=1, outer=True)
        t("simhash/explode only", lambda: noop(sh))
        sc.setJobDescription("simhash: explode + poly hash")
        hashed = sh.select("doc_id", D.poly_hash(F.col("shingle")).alias("_h"))
        t("simhash/explode+polyhash", lambda: noop(hashed))
        sc.setJobDescription("simhash: full agg")
        full = D.simhash_agg(docs, bits=32, n=1)
        t("simhash/full", lambda: noop(full))

    if "minhash" in which:
        sc.setJobDescription("minhash_sig: staged folds only")
        staged = docs.select(
            F.col("doc_id"), F.split(F.col("text"), " ").alias("_toks")
        ).select(
            "doc_id",
            D.word_poly_folds(F.col("_toks")).alias("_wh"),
            F.size("_toks").alias("_nt"),
        )
        t("minhash/word folds only", lambda: noop(staged))
        hashed = staged.select(
            "doc_id",
            F.explode_outer(
                D.shingle_hashes_from_folds(F.col("_wh"), F.col("_nt"), 3)
            ).alias("_h"),
        )
        sc.setJobDescription("minhash_sig: + shingle hashes exploded")
        t("minhash/+shingle hashes", lambda: noop(hashed))
        sc.setJobDescription("minhash_sig: full")
        t("minhash/full", lambda: noop(D.minhash_signatures_agg(docs, num_hashes=4)))

    if "clusters" in which:
        sc.setJobDescription("clusters: capped shingles")
        cs = D.capped_shingles(docs, "doc_id", "text", 3, 1000)
        t("clusters/capped shingles", lambda: noop(cs))
        sc.setJobDescription("clusters: pairs only")
        pairs = D.ngram_jaccard_pairs(docs, threshold=0.5).select(
            "doc_a", "doc_b"
        )
        t("clusters/jaccard pairs", lambda: noop(pairs))
        sc.setJobDescription("clusters: full")
        t("clusters/full", lambda: CATALOG["dedup_clusters"].builder(spark, sf_dir).collect())

    if "ivf" in which:
        from logvision_spark.catalog import _ivf_model
        from logvision_spark.operators.similarity import cosine, ivf_topk_batch
        from pyspark.sql import Window

        emb = _t(spark, sf_dir, "embeddings")
        qs = emb.where(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
        )
        base = emb.where(F.col("vec_id") >= 3)
        sc.setJobDescription("ivf: model fit (memoized)")
        t("ivf/model fit memo-warm", lambda: _ivf_model(base, sf_dir, "ge3", n_cells=16, seed=42))
        model = _ivf_model(base, sf_dir, "ge3", n_cells=16, seed=42)
        ivf = ivf_topk_batch(base, qs, k=10, n_cells=16, n_probe=15, seed=42, model=model)
        sc.setJobDescription("ivf: ivf side only")
        t("ivf/ivf side", lambda: noop(ivf))
        scored = base.crossJoin(F.broadcast(qs)).select(
            "q_id", "vec_id",
            F.round(cosine(F.col("embedding"), F.col("qe")), 6).alias("cos_sim"),
        )
        sc.setJobDescription("ivf: exact brute force side")
        ew = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        exact = scored.withColumn("rn", F.row_number().over(ew)).where(F.col("rn") <= 10).drop("rn")
        t("ivf/exact side", lambda: noop(exact))
        sc.setJobDescription("ivf: full recall query")
        t("ivf/full", lambda: CATALOG["ivf_topk_batch"].builder(spark, sf_dir).collect())

    spark.stop()


if __name__ == "__main__":
    main()
