"""Skew-mitigation operators (SURVEY.md §4.2: host/url counters are
Zipf-skewed; at 100 TB a hot key can pin one reducer).

What's already safe without help:
- `groupBy(k).count()/sum()` — partial aggregation collapses hot keys
  map-side; the shuffle carries one partial row per (task, key).
- joins — AQE skew-join splits oversized partitions at runtime
  (spark.sql.adaptive.skewJoin.enabled, on in session.py).

What needs explicit treatment:
- per-key DISTINCT aggregates: `groupBy(k).agg(countDistinct(v))` must
  co-locate every (k, v) pair of a hot key on one reducer before partial
  aggregation can help. The two-phase form below shuffles by (k, v) —
  uniformly distributed even when k is Zipfian — dedups there, then
  counts by k (now one row per distinct value, hot keys already shrunk).
- arbitrary per-key state (collect_set/sketches) over hot keys: salt the
  key for a partial phase, merge salts in a second phase.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, MapType, StructType


def _contains_map(dt) -> bool:
    """True if the type contains a MapType ANYWHERE (top level, struct
    field, array element, map key/value): xxhash64 rejects maps at any
    nesting depth, not just as the column's own type."""
    if isinstance(dt, MapType):
        return True
    if isinstance(dt, ArrayType):
        return _contains_map(dt.elementType)
    if isinstance(dt, StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False


def _salt_expr(df: DataFrame, salt_buckets: int, salt_cols=None) -> Column:
    """Deterministic per-row salt in [0, buckets): pmod(xxhash64(cols)).

    Columns default to every HASHABLE column — any column whose type
    CONTAINS a map (top-level, struct field, array element) is excluded
    because xxhash64 rejects maps at analysis (maps have no canonical
    order), where the old monotonically_increasing_id salt accepted any
    schema but was retry-unsafe (review finding). Callers with
    duplicate-heavy hot keys should pass ``salt_cols`` naming a unique
    discriminator column: byte-identical rows necessarily share a hash
    salt, so exact duplicates of a hot key all land in one bucket and
    the spread degrades to the number of DISTINCT rows of that key."""
    if salt_cols is None:
        salt_cols = [
            f.name for f in df.schema.fields if not _contains_map(f.dataType)
        ]
        if not salt_cols:
            raise ValueError(
                "no xxhash64-hashable columns to salt on; pass salt_cols "
                "with a projectable discriminator"
            )
    return F.pmod(
        F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(salt_buckets)
    )


def distinct_count_by_key_balanced(
    df: DataFrame, key: str, value: str, alias: str = "distinct_cnt"
) -> DataFrame:
    """Exact per-key distinct count, skew-balanced: shuffle on (key, value)
    (uniform), dedup, then count per key. Same result as
    `groupBy(key).agg(countDistinct(value))` — including NULL exclusion,
    which countDistinct (and SQL count(DISTINCT …)) applies but a bare
    distinct()+count would not — with a different physical shape: no
    reducer ever sees more than the deduped stream of one key."""
    return (
        df.select(key, value)
        .distinct()
        .groupBy(key)
        # count(value) skips NULLs — so a NULL value never counts as a
        # distinct value, yet a key whose values are ALL NULL still
        # appears with count 0, exactly like countDistinct
        .agg(F.count(F.col(value)).alias(alias))
    )


def salted_agg(
    df: DataFrame,
    key: str,
    agg_col: Column,
    merge_col: Column,
    salt_buckets: int = 16,
    partial_alias: str = "_partial",
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Generic two-phase salted aggregation: phase 1 groups by
    (key, salt) — a hot key spreads over `salt_buckets` reducers — and
    computes `agg_col`; phase 2 groups by key and merges partials with
    `merge_col` (which sees the partial as column `_partial`).

    Example (sum):
        salted_agg(df, "host", F.sum("bytes"), F.sum("_partial"))

    The salt hashes the WHOLE ROW (like salted_skew_join), never
    monotonically_increasing_id: that id is nondeterministic across
    task retries, so a fetch-failure recompute would route re-fetched
    rows to different (key, salt) reducers than the rows already
    consumed — the SPARK-23207 class of silent double-count/loss
    (review finding). Fully duplicate rows share a salt, which only
    costs spread when a hot key's rows are byte-identical — pass
    ``salt_cols=[unique_col]`` to mix in a caller-supplied
    discriminator when that matters. MapType columns are skipped
    (xxhash64 can't hash maps); see _salt_expr."""
    salted = df.withColumn("_salt", _salt_expr(df, salt_buckets, salt_cols))
    partial = salted.groupBy(key, "_salt").agg(agg_col.alias(partial_alias))
    return partial.groupBy(key).agg(merge_col.alias(partial_alias)).withColumnRenamed(
        partial_alias, "merged"
    )


def salted_skew_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
    salt_col: str = "_salt",
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Skew-safe equi-join by salting: the big (skewed) side gets a
    deterministic per-row salt in [0, buckets), the small side is
    replicated once per salt value, and the join runs on (key, salt) —
    a hot key's rows now spread over `buckets` reducers instead of
    pinning one. Result is row-identical to the plain join.

    This is the MANUAL fallback: AQE's skew join (on in session.py)
    handles sort-merge skew at runtime and should be preferred; salting
    is for when the engine can't help — e.g. a skewed key feeding a
    subsequent aggregation that must stay co-partitioned, or an engine
    boundary where AQE is off. The salt is pmod(xxhash64(whole row
    surrogate), buckets) — deterministic, so retries/speculative tasks
    agree; MapType columns are excluded and duplicate rows share a salt
    (see _salt_expr). Replication multiplies the small side by
    `buckets`: keep it for genuinely small dims."""
    salted_big = big.withColumn(salt_col, _salt_expr(big, salt_buckets, salt_cols))
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(salt_buckets - 1))
    ).alias(salt_col)
    replicated = small.select("*", salts)
    out = salted_big.join(replicated, on=[key, salt_col], how="inner")
    return out.drop(salt_col)
