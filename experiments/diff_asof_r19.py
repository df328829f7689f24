#!/usr/bin/env python
"""r19 differential: asof_join_bucketed value_cols≠() carry rework
(hash-agg extremes + winners re-join + row_number pick) vs the r18
max_by/min_by form, loaded from git HEAD. Compares FULL ROWS on a
tie-free adversarial fixture (NULL keys/ts, bucket boundaries, hot key,
empty buckets) and matched TIMESTAMPS on a tie-full one (tie tags are
arbitrary in both forms — the documented contract), for all
3 directions × {(), (v,)} value_cols × 2 bucket widths, plus a
no-SortAggregate plan assert on the new form."""

from __future__ import annotations

import datetime
import importlib.util
import os
import random
import subprocess
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def load_old_asof():
    src = subprocess.run(
        ["git", "show", "HEAD:logvision_spark/operators/asof.py"],
        capture_output=True, text=True, cwd=ROOT, check=True,
    ).stdout
    d = tempfile.mkdtemp(prefix="asof_old_")
    p = os.path.join(d, "asof_old.py")
    with open(p, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location("asof_old", p)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def fixtures(spark, tie_free: bool):
    rng = random.Random(7 if tie_free else 13)
    base = datetime.datetime(2024, 1, 1)
    sec = datetime.timedelta(seconds=1)
    left = [
        (i, f"u{rng.randrange(5)}", base + rng.randrange(40_000) * sec)
        for i in range(400)
    ] + [(9001, None, base), (9002, "u0", None)]
    if tie_free:
        seen, rrows = set(), []
        for j in range(300):
            k = (f"u{rng.choice([0, 0, 0, 1, 2, 3])}",
                 rng.choice([rng.randrange(40_000), 3600 * rng.randrange(11)]))
            if k in seen:
                continue
            seen.add(k)
            rrows.append((k[0], base + k[1] * sec, f"t{j}"))
    else:
        rrows = [
            (f"u{rng.choice([0, 0, 0, 1, 2, 3])}",
             base + rng.choice(
                 [rng.randrange(200), 3600 * rng.randrange(11)]) * sec,
             f"t{j}")
            for j in range(300)
        ]
    rrows += [(None, base, "tnull"), ("u0", None, "tnullts")]
    ldf = spark.createDataFrame(left, ["event_id", "user", "ts"])
    rdf = spark.createDataFrame(rrows, ["user", "ts", "tag"])
    return ldf, rdf


def main() -> None:
    from pyspark.sql import SparkSession

    from logvision_spark.operators import asof as asof_new

    asof_old = load_old_asof()
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    bad = []
    n_cfg = 0
    for tie_free in (True, False):
        ldf, rdf = fixtures(spark, tie_free)
        for direction in ("backward", "forward", "nearest"):
            for vcols in ((), ("tag",)):
                for bucket in ("17 minutes", "1 hour"):
                    n_cfg += 1
                    kw = dict(key="user", value_cols=vcols,
                              bucket=bucket, direction=direction)
                    new_df = asof_new.asof_join_bucketed(ldf, rdf, **kw)
                    old_df = asof_old.asof_join_bucketed(ldf, rdf, **kw)
                    if tie_free:
                        key_fn = lambda r: tuple(r)
                    else:
                        # tie-full: compare matched ts only
                        key_fn = lambda r: (r["event_id"], r["ts_asof"])
                    new_rows = sorted(map(key_fn, new_df.collect()))
                    old_rows = sorted(map(key_fn, old_df.collect()))
                    tag = (tie_free, direction, vcols, bucket)
                    if new_rows != old_rows:
                        bad.append(tag)
                        print("MISMATCH", tag)
                    else:
                        print("OK", tag, len(new_rows), "rows")
                    if vcols and tie_free and bucket == "1 hour":
                        plan = (new_df._jdf.queryExecution()
                                .executedPlan().toString())
                        assert "SortAggregate" not in plan, (
                            "SortAggregate present", direction)
                        print("   no SortAggregate:", direction)
    print(f"configs: {n_cfg}, mismatches: {bad if bad else 'none'}")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
