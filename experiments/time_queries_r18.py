#!/usr/bin/env python
"""r18 optimization-loop timer: run named catalog queries in ONE JVM with
the bench's methodology (warm-up, min of N collect() runs) so per-query
deltas are attributable while iterating. NOT the round's published number
— bench.py (isolated JVMs) stays the deliverable; this is the inner loop.

Usage:
  python experiments/time_queries_r18.py q1 q2 ...     # specific queries
  python experiments/time_queries_r18.py --top         # the expensive set
  python experiments/time_queries_r18.py --runs 3 q1   # more samples
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOP = [
    "dedup_drop_list_16band",
    "a_user_trend_slope",
    "dedup_clusters",
    "dedup_drop_list",
    "ivf_topk_batch",
    "j6_asof_bucketed_nearest",
    "j6_asof_bucketed",
    "dedup_simhash",
    "corpus_quality_funnel",
    "dedup_minhash_sig",
    "decontam_ngram_overlap",
    "a13_class_timeline",
    "q21_waiting_suppliers",
    "dedup_minhash_fast",
    "a_value_decile_histogram_approx",
    "text_tfidf_top_terms",
    "a_conversion_funnel",
    "q8_market_share",
    "a6_count_by_second",
    "j6_asof_nearest",
]


def main() -> None:
    args = [a for a in sys.argv[1:]]
    runs = 2
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    names = TOP if "--top" in args else [a for a in args if not a.startswith("-")]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import bench
    from logvision_spark.catalog import CATALOG

    spark = bench._get_spark()
    cache_sec = bench._warm_up(spark, sf_dir)
    out: dict[str, float] = {}
    for name in names:
        if name not in CATALOG:
            print(f"SKIP unknown {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"r18 timing: {name}")
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            CATALOG[name].builder(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 4)
        print(f"{out[name]:8.3f}  {name}", flush=True)
    print(json.dumps({"queries": out, "shingle_cache_build_sec": cache_sec}))
    spark.stop()


if __name__ == "__main__":
    main()
