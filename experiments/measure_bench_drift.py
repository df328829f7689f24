"""Disposition of the r7 bench drift (r7 VERDICT item 2) — results in
ARCHITECTURE.md "Round-8 delta".

r6→r7 pass-1 movers were ALL in code untouched since r6 (verified by
the judge via git diff): dedup_simhash 1.06→1.46 s (+38%),
dedup_minhash_sig 0.98→1.26, j8_range_join_incidents 0.42→0.60,
q3_shipping_priority 0.71→0.97, parse_rows_per_sec_4m 3.09M→2.16M.
The hypothesis is ambient co-tenant load during the bench window (the
documented band); this script tests it the way r6 dispositioned
dedup_clusters: min/median over N=5 repeats in ONE fresh JVM at sf0.1,
plus 3 repeats of the 4M-row parse throughput. If the min lands back at
the r6 figure the drift is ambient (the min is the engine number); a
reproducible elevation across all 5 repeats would be a real regression.

Run: PYTHONPATH=/root/repo python experiments/measure_bench_drift.py
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MOVERS = {
    # name -> (r6 pass-1, r7 pass-1) from BENCH_r06/r07.json
    "dedup_simhash": (1.056, 1.4603),
    "dedup_minhash_sig": (0.9805, 1.2552),
    "j8_range_join_incidents": (0.4194, 0.6046),
    "q3_shipping_priority": (0.711, 0.9658),
}
REPEATS = 5

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

# same off-the-clock warm-up as bench.py (codegen paths + shingle cache)
import bench  # noqa: E402

bench._warm_up(spark, SF_DIR)

from logvision_spark.catalog import CATALOG  # noqa: E402

print(f"{'query':28s} {'r6':>7s} {'r7':>7s} {'min':>7s} {'med':>7s} "
      f"{'max':>7s}  disposition")
for name, (r6, r7) in MOVERS.items():
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        CATALOG[name].builder(spark, SF_DIR).collect()
        times.append(time.perf_counter() - t0)
    times.sort()
    mn, med, mx = times[0], times[len(times) // 2], times[-1]
    verdict = (
        "ambient (min at/below r6)" if mn <= r6 * 1.10
        else "REGRESSION (elevated across all repeats)"
        if mn > r7 * 0.90
        else "partial recovery — ambient, wide band"
    )
    print(f"{name:28s} {r6:7.3f} {r7:7.3f} {mn:7.3f} {med:7.3f} "
          f"{mx:7.3f}  {verdict}")

# one call only: the helper itself takes best-of-3 over one synthesized
# corpus (calling it in a loop re-pays the 4M-line synthesis and leaks a
# ~0.5 GB temp dir per call — review finding)
best = bench._bench_parse_throughput(spark, n_rows=4_000_000)
print(f"\nparse_rows_per_sec_4m: best-of-3 {best:,.0f} "
      f"(r6 3,094,286 / r7 2,164,522) -> "
      f"{'ambient' if best >= 2_800_000 else 'investigate'}")

spark.stop()
