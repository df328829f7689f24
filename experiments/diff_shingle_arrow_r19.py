#!/usr/bin/env python
"""r19 differential: hashed_shingle_rows (Arrow byte-slice + canonical
XXH64) vs the JVM path (exploded_shingles -> F.xxhash64) — multiset
equality of (id[, _chash], shingle) rows at sf0.01/sf0.1 for
n in {3, 8} x outer x with_chash, plus adversarial edge docs."""

from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def jvm_path(df, id_col, text_col, n, outer, with_chash):
    from pyspark.sql import functions as F

    from logvision_spark.operators.dedup import exploded_shingles

    carry = ("_chash",) if with_chash else ()
    src = df
    if with_chash:
        src = df.select(
            F.col(id_col),
            F.xxhash64(F.col(text_col)).alias("_chash"),
            F.col(text_col),
        )
    sh = exploded_shingles(src, id_col, text_col, n, outer=outer, carry=carry)
    pre = F.when(
        F.col("shingle").isNotNull(), F.xxhash64(F.col("shingle"))
    ).alias("shingle")
    return sh.select(id_col, *carry, pre)


def main() -> None:
    from pyspark.sql import SparkSession

    from rejected_arrow_shingles_r19 import hashed_shingle_rows

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    bad = []

    edge = spark.createDataFrame(
        [
            (1, ""),
            (2, "one"),
            (3, "a b c"),
            (4, "a  b   c d"),            # doubled/tripled separators
            (5, "trailing sep "),
            (6, " leading"),
            (7, "unicode éè€ tokens ünïcode mixé in here too"),
            (8, None),
            (9, "a b c d e f g h i j k l m"),
            (10, "dup dup dup dup dup dup dup dup dup"),
        ],
        ["doc_id", "text"],
    )
    corpora = [("edge", edge)]
    for sf in ("sf0.01", "sf0.1"):
        corpora.append(
            (sf, spark.read.parquet(f"/root/testdata/{sf}/documents.parquet"))
        )

    for tag, df in corpora:
        for n in (3, 8):
            for outer in (False, True):
                for with_chash in (False, True):
                    a = Counter(
                        map(tuple, hashed_shingle_rows(
                            df, n=n, outer=outer, with_chash=with_chash
                        ).collect())
                    )
                    b = Counter(
                        map(tuple, jvm_path(
                            df, "doc_id", "text", n, outer, with_chash
                        ).collect())
                    )
                    cfg = (tag, n, outer, with_chash)
                    if a != b:
                        bad.append(cfg)
                        extra = list((a - b).items())[:3]
                        miss = list((b - a).items())[:3]
                        print("MISMATCH", cfg, "extra:", extra, "missing:", miss)
                    else:
                        print("OK", cfg, sum(a.values()), "rows")
    print("MISMATCHES:", bad if bad else "none")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
