"""Join / set operators J1-J3 (SURVEY.md §2.6).

The reference has exactly three join shapes: RDD union of labeled corpora
(learning.scala:23-25), a client-side full-outer join of good/bad
time-series on the timestamp axis (flask/app.py:436-453), and per-IP HTTP
geo enrichment (app.py:136-147 etc.). Standard equi/broadcast/sort-merge
joins come free via `df.join`; these builders encode the two non-trivial
reference shapes with the physical strategy pinned where it matters.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def union_labeled(good: DataFrame, bad: DataFrame) -> DataFrame:
    """J1: union of labeled corpora (learning.scala:23-25) — by name, so
    column order differences can't silently misalign."""
    return good.unionByName(bad)


def timeline_full_outer(
    good: DataFrame,
    bad: DataFrame,
    key: str = "second",
    good_alias: str = "good_cnt",
    bad_alias: str = "bad_cnt",
) -> DataFrame:
    """J2: align two per-timestamp counter views on the time axis, filling
    the missing side with 0 (the reference does this in Python over two
    Redis ZSETs, app.py:436-453).

    Both inputs are already-aggregated (one row per second), so this is a
    small-on-small sort-merge join; at 100 TB the inputs are still only
    cardinality(time buckets), never raw rows.
    """
    g = good.select(F.col(key), F.col(good_alias))
    b = bad.select(F.col(key), F.col(bad_alias))
    return (
        g.join(b, on=key, how="full_outer")
        .select(
            F.col(key),
            F.coalesce(F.col(good_alias), F.lit(0)).alias(good_alias),
            F.coalesce(F.col(bad_alias), F.lit(0)).alias(bad_alias),
        )
    )


def geo_enrich(
    facts: DataFrame,
    geo_dim: DataFrame,
    fact_key: str = "host",
    dim_key: str = "ip",
) -> DataFrame:
    """J3: IP → geo enrichment. The reference issues one blocking HTTP call
    per IP per refresh and drops non-resolving rows (app.py:136-147).
    Engine form: inner **broadcast** join against a geo dimension — the dim
    is tiny relative to facts at every scale, so we pin `broadcast()`
    rather than trusting the threshold; inner join preserves the
    reference's drop-unresolved semantics."""
    # drop the DIMENSION's key column by reference: .drop(dim_key) by
    # name removes BOTH copies when fact_key == dim_key, silently losing
    # the join key from the output (review finding)
    return facts.join(
        F.broadcast(geo_dim), on=facts[fact_key] == geo_dim[dim_key], how="inner"
    ).drop(geo_dim[dim_key])


def geo_enrich_live(
    facts: DataFrame,
    resolver: "Callable[[str], tuple[float, float] | None]",
    fact_key: str = "host",
) -> DataFrame:
    """J3 live-enrichment variant (SURVEY §4.2(3)): per-key lookup through
    a pluggable resolver — the interface the reference's per-IP HTTP
    geocoder (app.py:136-147) plugs into — executed as Arrow-batched
    ``mapInPandas`` so resolver calls run ON THE EXECUTORS, batched per
    Arrow batch, never on the driver.

    `resolver(key) -> (coor_x, coor_y) | None`; None rows are dropped
    (the reference's drop-unresolved semantics). Output schema matches
    `geo_enrich`: facts columns + coor_x, coor_y.

    Scale notes: the resolver must be a picklable top-level callable
    (e.g. a dict-backed fixture, an LRU-cached HTTP client). For hot-key
    dedup, enrich the DISTINCT keys and broadcast-join back — this
    operator is the raw per-row interface; `geo_enrich` over a resolved
    dimension is the preferred production shape.
    """
    import pandas as pd  # local import: executors need it, driver may not

    out_schema = T.StructType(
        list(facts.schema.fields)
        + [
            T.StructField("coor_x", T.DoubleType()),
            T.StructField("coor_y", T.DoubleType()),
        ]
    )

    def enrich(batches):
        cache: dict[str, tuple[float, float] | None] = {}
        for pdf in batches:
            keys = pdf[fact_key]
            xs, ys, keep = [], [], []
            for k in keys:
                if k not in cache:
                    cache[k] = resolver(k)
                hit = cache[k]
                keep.append(hit is not None)
                xs.append(hit[0] if hit else None)
                ys.append(hit[1] if hit else None)
            out = pdf.copy()
            out["coor_x"] = pd.array(xs, dtype="float64")
            out["coor_y"] = pd.array(ys, dtype="float64")
            yield out[pd.Series(keep, index=out.index)]

    return facts.mapInPandas(enrich, schema=out_schema)


def range_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start_ts: str = "start_ts",
    end_ts: str = "end_ts",
    bucket_seconds: int = 60,
) -> DataFrame:
    """Point-in-interval range join (``start <= t < end``) without a
    cross join — an operator Spark's join menu lacks (SparkSQL would plan
    the bare inequality join as BroadcastNestedLoop/cartesian).

    Physical shape: both sides map to coarse time buckets (intervals
    explode to every bucket they overlap — ceil(span/bucket)+1 rows), the
    join runs as an EQUI-join on the bucket id, and the exact inequality
    filters the matched pairs. Work is O(points + Σ interval spans +
    true matches·collision factor) instead of O(points × intervals).

    Scale notes: pick ``bucket_seconds`` ≈ the typical interval length —
    each interval then explodes to ~2 buckets and each bucket-join
    partition holds one time-slice of both sides; the shuffle key is the
    bucket id, which is uniformly distributed over time (no hot key
    unless the data itself has a hot second). Empty/negative intervals
    are dropped (they can match nothing; the guard also keeps
    F.sequence from generating a descending bucket range).
    Column names must not collide between the two inputs.
    """
    bucket_us = F.lit(bucket_seconds * 1_000_000)
    p = points.withColumn(
        "_b", F.floor(F.unix_micros(F.col(point_ts)) / bucket_us)
    )
    i = (
        intervals.where(F.col(end_ts) > F.col(start_ts))
        .withColumn(
            "_b",
            F.explode(
                F.sequence(
                    F.floor(F.unix_micros(F.col(start_ts)) / bucket_us),
                    # end is exclusive: the last overlapped bucket is the
                    # one containing end - 1 microsecond
                    F.floor((F.unix_micros(F.col(end_ts)) - 1) / bucket_us),
                )
            ),
        )
    )
    return (
        p.join(i, "_b")
        .where(
            (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) < F.col(end_ts))
        )
        .drop("_b")
    )
