"""Skew-operator equivalence: the balanced formulations must produce
exactly the naive results on skewed data."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from logvision_spark.operators.skew import (
    distinct_count_by_key_balanced,
    salted_agg,
)


def make_skewed(spark, n=5000, seed=3):
    rng = random.Random(seed)
    # Zipf-ish: key 'hot' gets ~80% of rows
    rows = [
        ("hot" if rng.random() < 0.8 else f"k{rng.randrange(50)}",
         f"v{rng.randrange(200)}", rng.randrange(1000))
        for _ in range(n)
    ]
    return spark.createDataFrame(rows, ["key", "val", "num"])


def test_balanced_distinct_equals_naive(spark):
    df = make_skewed(spark)
    naive = {
        r["key"]: r["d"]
        for r in df.groupBy("key").agg(F.count_distinct("val").alias("d")).collect()
    }
    balanced = {
        r["key"]: r["distinct_cnt"]
        for r in distinct_count_by_key_balanced(df, "key", "val").collect()
    }
    assert balanced == naive
    assert naive["hot"] == 200  # the hot key saw every value


def test_balanced_distinct_excludes_nulls_like_count_distinct(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("a", None), ("a", "y"), ("b", None)], ["key", "val"]
    )
    naive = {
        r["key"]: r["d"]
        for r in df.groupBy("key").agg(F.count_distinct("val").alias("d")).collect()
    }
    balanced = {
        r["key"]: r["distinct_cnt"]
        for r in distinct_count_by_key_balanced(df, "key", "val").collect()
    }
    assert naive == {"a": 2, "b": 0}
    # exact match including the NULL-only key appearing with count 0
    assert balanced == naive


def test_salted_sum_equals_naive(spark):
    df = make_skewed(spark)
    naive = {
        r["key"]: r["s"]
        for r in df.groupBy("key").agg(F.sum("num").alias("s")).collect()
    }
    salted = {
        r["key"]: r["merged"]
        for r in salted_agg(df, "key", F.sum("num"), F.sum("_partial")).collect()
    }
    assert salted == naive


def test_salted_join_equals_plain_join(spark, sf_dir):
    """The salted form must be row-identical to the plain join, including
    duplicate join matches (every big-side row keeps exactly its one
    dimension match)."""
    from pyspark.sql import functions as F

    from logvision_spark.operators.skew import salted_skew_join
    from logvision_spark.sources.readers import load_table

    ev = load_table(spark, "events", sf_dir).select(
        "event_id", F.pmod(F.col("user_id"), F.lit(25)).alias("nkey")
    )
    nat = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("nkey"), "n_name"
    )
    salted = {(r["event_id"], r["n_name"])
              for r in salted_skew_join(ev, nat, key="nkey").collect()}
    plain = {(r["event_id"], r["n_name"])
             for r in ev.join(nat, "nkey").collect()}
    assert salted == plain and len(salted) == ev.count()


def test_salt_skips_maptype_and_accepts_discriminator(spark):
    """xxhash64 rejects MapType at analysis: the salt must skip map
    columns (review finding), and a caller-supplied salt_cols list must
    be honored for duplicate-heavy hot keys."""
    from pyspark.sql import functions as F

    from logvision_spark.operators.skew import salted_agg

    df = spark.createDataFrame(
        [("k", 1, {"a": 1}), ("k", 2, {"b": 2})],
        "key string, v int, m map<string,int>",
    )
    out = salted_agg(df, "key", F.sum("v"), F.sum("_partial")).collect()
    assert out == [("k", 3)] or (out[0]["key"] == "k" and out[0]["merged"] == 3)
    out2 = salted_agg(
        df, "key", F.sum("v"), F.sum("_partial"), salt_cols=["v"]
    ).first()
    assert out2["merged"] == 3


def test_salt_skips_nested_maps(spark):
    """xxhash64 rejects maps at ANY nesting depth — struct fields and
    array elements containing maps must be excluded from the default
    salt columns, not just top-level MapType (review finding)."""
    from pyspark.sql import functions as F

    from logvision_spark.operators.skew import salted_agg

    df = spark.createDataFrame(
        [("k", 1, ({"a": 1},), [{"b": 2}]), ("k", 2, ({"c": 3},), [])],
        "key string, v int, s struct<m:map<string,int>>, a array<map<string,int>>",
    )
    out = salted_agg(df, "key", F.sum("v"), F.sum("_partial")).first()
    assert out["merged"] == 3
