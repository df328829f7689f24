#!/usr/bin/env python
"""Dump .explain('formatted') for named catalog queries to
plans/r19/<name>_after.txt (or _before.txt with --before)."""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    args = sys.argv[1:]
    suffix = "_before" if "--before" in args else "_after"
    names = [a for a in args if not a.startswith("-")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import bench
    from logvision_spark.catalog import CATALOG

    spark = bench._get_spark()
    out_dir = os.path.join(ROOT, "plans", "r19")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = CATALOG[name].builder(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
