#!/usr/bin/env python
"""r18: measure PURE driver-side construction time per bench builder —
the py4j round-trip tax paid before any Spark job runs (guide §5: the
driver should do almost no work). Builds each query's DataFrame (no
action) N times in one JVM and reports the min. Queries whose build
dominates their bench time are candidates for the single-parse
F.expr construction recipe."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from logvision_spark.session import get_spark  # noqa: E402
from logvision_spark import catalog as cat  # noqa: E402
import bench  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("RUNS", "3"))
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    names = bench.CORE + bench.NEW + bench.R4 + bench.R5 + bench.R6 + bench.R7
    # warm the table readers / shingle cache path lazily (build only)
    out = {}
    for name in names:
        b = cat.CATALOG[name].builder
        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            b(spark, sf_dir)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 4)
    for k, v in sorted(out.items(), key=lambda x: -x[1]):
        print(f"{v:8.3f}  {k}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
