"""Aggregation operators A1-A18 (SURVEY.md §2.4).

Every reference aggregation is a hash aggregation by one key with count/sum,
executed as DStream ``reduceByKey`` then merged across batches via Redis
``zincrby`` (reference: spark/src/main/scala/streaming.scala:93-173,
flask/app.py:84-109). Here each is one ``groupBy().agg()``: Catalyst plans
partial (map-side) + final aggregation automatically — the `reduceByKey`
combiner the reference hand-codes — and the same builder works on a
streaming DataFrame in update mode, where Spark's StateStore replaces Redis.

Scale notes:
- `groupBy(key).count()` over Zipf-skewed keys (host/url) is safe because
  partial aggregation collapses the hot key map-side before the shuffle;
  only the already-reduced (key, partial_count) rows move.
- `distinct_count` defaults to `approx_count_distinct` (HLL++, no shuffle of
  raw values) with an `exact=True` escape hatch for oracle comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# Shared aggregate EXPRESSIONS: the single-metric builders below and the
# streaming counter catalog's one-pass "totals" (pipeline.counter_views)
# both build from these, so the NULL-bytes rule and unit constants have
# exactly one definition.
def line_cnt_expr() -> Column:
    return F.count(F.lit(1))


def size_kb_expr(text_col: str = "raw") -> Column:
    return F.sum(F.length(F.col(text_col))) / F.lit(1024.0)


def traffic_mb_expr(bytes_col: str = "bytes") -> Column:
    return F.sum(F.coalesce(F.col(bytes_col), F.lit(0))) / F.lit(1048576.0)


def global_count(df: DataFrame, alias: str = "cnt") -> DataFrame:
    """A1: total record count (streaming.scala:93-95)."""
    return df.agg(line_cnt_expr().alias(alias))


def size_kb(df: DataFrame, text_col: str = "raw", alias: str = "size_kb") -> DataFrame:
    """A2: "log size in KB" — the reference splits every record into single
    characters and counts them (streaming.scala:98-101); `sum(length())`
    is the same number without the per-char explosion."""
    return df.agg(size_kb_expr(text_col).alias(alias))


def count_by(df: DataFrame, key: str | Column | list, alias: str = "cnt") -> DataFrame:
    """A3-A10: per-key counters (streaming.scala:104-139). One builder for
    host/rfc931/username/second-bucket/method/url/protocol/status."""
    keys = key if isinstance(key, list) else [key]
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias(alias))


def count_by_second(df: DataFrame, ts_col: str = "ts", alias: str = "cnt") -> DataFrame:
    """A6: per-second counters — the log format has second resolution so the
    reference keys on the raw epoch-ms string (streaming.scala:117-119);
    typed equivalent is a tumbling 1s bucket."""
    return (
        df.groupBy(F.date_trunc("second", F.col(ts_col)).alias("second"))
        .agg(F.count(F.lit(1)).alias(alias))
    )


def traffic_mb(df: DataFrame, bytes_col: str = "bytes", alias: str = "traffic_mb") -> DataFrame:
    """A11 (sane variant): total response MB = sum(bytes)/1024/1024 with
    NULL ('-') bytes contributing 0 (streaming.scala:142-149)."""
    return df.agg(traffic_mb_expr(bytes_col).alias(alias))


def sum_mb_faithful(
    df: DataFrame,
    bytes_col: str = "bytes",
    alias: str = "traffic_mb",
    divisor: int = 1048576,
) -> DataFrame:
    """A11 (bit-faithful variant): the reference does *integer division
    per record* before summing — `bytes.toInt/1024/1024`
    (streaming.scala:145) — so every response under 1 MiB contributes 0.
    `divisor` parameterizes the unit (1 MiB in the reference)."""
    b = F.col(bytes_col)
    per_row = F.when(b.isNotNull(), F.floor(b / F.lit(divisor))).otherwise(F.lit(0))
    return df.agg(F.sum(per_row).cast("long").alias(alias))


def distinct_count(
    df: DataFrame, key: str, alias: str = "distinct_cnt", exact: bool = False
) -> DataFrame:
    """A15/A16: distinct visitors/resources — the reference reads
    `zcard(key)` (flask/app.py:100,103). HLL++ by default (scale path:
    no shuffle of raw members), exact for oracle checks."""
    fn = F.count_distinct if exact else F.approx_count_distinct
    return df.agg(fn(F.col(key)).alias(alias))


def status_class_counts(
    df: DataFrame, status_col: str = "status_code"
) -> DataFrame:
    """F3+A18: success (2xx: 200-207) vs other split, computed client-side
    in the reference by summing ZSET scores (flask/app.py:87-97). One
    conditional aggregate — a single pass, no second scan."""
    s = F.col(status_col)
    ok = s.between(200, 207)
    return df.agg(
        F.sum(F.when(ok, 1).otherwise(0)).cast("long").alias("success_cnt"),
        F.sum(F.when(~ok | s.isNull(), 1).otherwise(0)).cast("long").alias("other_cnt"),
    )


def counter_lookup(counter_df: DataFrame, key_col: str, member: str) -> DataFrame:
    """A17: point lookup of one member's accumulated count
    (`zscore`, flask/app.py:84,106). Over a counter view this is a filter —
    at scale it prunes to one aggregation group, no full materialization."""
    return counter_df.where(F.col(key_col) == F.lit(member))


def grouped_trend_slope(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-key least-squares trend: slope of `value` over event time, in
    value-units per DAY, via a key-partitioned ``mapInPandas`` whose body
    computes all of a partition's groups with vectorized numpy segment
    reductions — the template for per-entity model fits (churn slopes,
    sensor drift, per-user engagement trends) that SQL aggregates can't
    express once the per-group science outgrows closed forms. (r18: this
    replaced a per-group ``applyInPandas`` — semantics identical, but
    grouped-map pays ~2 ms of Python/pandas overhead per GROUP, which at
    per-entity cardinalities dwarfs the math.)

    Numerics are chosen for cross-engine exactness: x is centered days
    (epoch-seconds / 86400, range ~30 at the fixture, not ~1e9), the
    slope is the two-pass centered form Σ(x-x̄)(y-ȳ) / Σ(x-x̄)² — the
    same numerically stable covariance shape DuckDB's `regr_slope`
    computes — and the output rounds to 6 decimals, so the ~1e-15
    relative FP noise between engines never reaches the compare.

    Scale: groups shuffle once by `key` (repartition, same exchange the
    grouped-map form paid); the Python side then computes EVERY group in
    a partition with numpy segment reductions over one Arrow transfer —
    not one Python call + one 1-row pandas frame per group. The per-group
    formulation measured 3.15 s at sf0.1 (1,500 groups ≈ 2 ms of pure
    per-group interpreter/pandas overhead each) vs ~0.5 s vectorized on
    identical numerics; the cost model is per-BATCH, so group count stops
    mattering (optimization guide §4.2: hand whole batches to vectorized
    native code). Per-task memory is its partition's three narrow
    columns — the standard shuffle-partition bound. The pure-JVM
    alternative for THIS particular fit is ``F.regr_slope(value, x)`` —
    kept in the docstring on purpose: use the built-in when it exists,
    the vectorized Arrow map when it doesn't."""
    import numpy as np
    import pandas as pd

    def _fit_partition(batches):
        chunks = [b for b in batches if len(b)]
        if not chunks:
            return
        pdf = chunks[0] if len(chunks) == 1 else pd.concat(
            chunks, ignore_index=True
        )
        # factorize handles any key type (ints, strings, NULL-as-group)
        codes, uniques = pd.factorize(pdf[key], use_na_sentinel=False)
        order = np.argsort(codes, kind="stable")
        c = codes[order]
        x = pdf["_x_days"].to_numpy()[order]
        y = pdf[value_col].to_numpy()[order]
        starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
        counts = np.diff(np.append(starts, len(c)))
        # two-pass centered covariance per segment — the same numerically
        # stable shape (and ~1e-15 relative noise class) as the per-group
        # pandas form; round-6 keeps it under the cross-engine contract
        xm = np.add.reduceat(x, starts) / counts
        ym = np.add.reduceat(y, starts) / counts
        xc = x - np.repeat(xm, counts)
        yc = y - np.repeat(ym, counts)
        denom = np.add.reduceat(xc * xc, starts)
        num = np.add.reduceat(xc * yc, starts)
        # Python round per GROUP (not per row), matching the grouped-map
        # form exactly (incl. NaN propagation and the denom<=0 -> NULL
        # contract); object dtype so None crosses Arrow as null
        slopes = pd.Series(
            [
                round(float(n / d), 6) if d > 0.0 else None
                for n, d in zip(num, denom)
            ],
            dtype=object,
        )
        yield pd.DataFrame(
            {
                key: np.asarray(uniques)[c[starts]],
                "n_events": counts.astype("int64"),
                "slope_per_day": slopes,
            }
        )

    staged = df.select(
        key,
        value_col,
        (F.col(ts_col).cast("double") / F.lit(86400.0)).alias("_x_days"),
    )
    key_type = df.schema[key].dataType.simpleString()
    return staged.repartition(key).mapInPandas(
        _fit_partition,
        schema=f"{key} {key_type}, n_events long, slope_per_day double",
    )
