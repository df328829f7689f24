#!/usr/bin/env python
"""Per-entry DuckDB oracle check for the r18 inner loop — the verify
skill's compare (order-insensitive, sorted columns/rows, datetime-unit
unified) on a NAMED subset of entries, at one or more SF dirs. Vanilla
SparkSession like the driver. Full-catalog verification still goes
through the skill; this is the fast per-change gate.

Usage: python experiments/oracle_check_r18.py [--sf sf0.01,sf0.1] name...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sfs = ["sf0.01"]
    if "--sf" in args:
        i = args.index("--sf")
        sfs = args[i + 1].split(",")
        del args[i : i + 2]
    names = [a for a in args if not a.startswith("-")]

    import duckdb
    import pandas as pd
    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs, osql = e.queries(), e.oracle_sql()
    bad = []
    for sf_name in sfs:
        sf = f"/root/testdata/{sf_name}"
        con = duckdb.connect()
        for t in (
            "region nation customer supplier part orders lineitem "
            "events documents embeddings"
        ).split():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
        for name in names:
            if name not in qs:
                print(f"SKIP unknown {name}")
                continue
            spdf = qs[name](spark, sf).toPandas()
            if name not in osql:
                print(f"{sf_name} {name}: rows-only {len(spdf)}")
                continue
            ddf = con.execute(osql[name]).df()
            s = spdf[sorted(spdf.columns)].copy()
            d = ddf[sorted(ddf.columns)].copy()
            for fr in (s, d):
                for c in fr.columns:
                    if pd.api.types.is_datetime64_any_dtype(fr[c]):
                        fr[c] = fr[c].astype("datetime64[ns]")
            s = s.sort_values(by=sorted(s.columns), ignore_index=True)
            d = d.sort_values(by=sorted(d.columns), ignore_index=True)
            ok = len(s) == len(d) and list(s.columns) == list(d.columns)
            if ok:
                for c in s.columns:
                    try:
                        pd.testing.assert_series_equal(
                            s[c], d[c], check_dtype=False
                        )
                    except AssertionError:
                        ok = False
                        break
            print(f"{sf_name} {name}: {'OK' if ok else 'MISMATCH'} ({len(s)} rows)")
            if not ok:
                bad.append(f"{sf_name}/{name}")
    print("MISMATCHES:", bad if bad else "none")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
