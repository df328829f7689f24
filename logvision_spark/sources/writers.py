"""Batch writers: partitioned parquet/json archives and bucketed tables.

Partitioning gives partition pruning on the read side (a day-partitioned
archive turns a time-range query into a directory listing); bucketing
pre-shuffles a table by join key at write time so repeated joins/aggs on
that key skip their exchange entirely — the cheapest join at 100 TB is
the shuffle you did once at ingest instead of every query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = (),
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Date/key-partitioned columnar archive (the batch form of W3)."""
    w = df.write.format(fmt).mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: str,
    num_buckets: int = 32,
    sort_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: co-locates rows by hash(bucket_by) at write
    time. Joins/aggregations on the bucket key between two tables bucketed
    the same way plan with ZERO Exchange nodes. sort_by additionally
    pre-sorts within buckets (sort-merge join without the sort)."""
    w = df.write.mode(mode).bucketBy(num_buckets, bucket_by)
    if sort_by:
        w = w.sortBy(sort_by)
    w.saveAsTable(table)


def zorder_key(a, b, bits: int = 16):
    """Morton (Z-order) key: interleave the low `bits` of two integer
    columns (a → even bit positions, b → odd). Sorting/range-partitioning
    by this key gives BOTH dimensions spatial locality in the file
    layout, so per-file column min/max statistics prune scans on either
    predicate — the data-skipping layout trick (Delta/Iceberg OPTIMIZE
    ZORDER) as a pure column expression. 2×16 bits covers 65k distinct
    values per dimension; pre-bucket wider domains with pmod.

    Static sum of shift/mask terms — whole-stage-codegens to long
    arithmetic, no HOF, no Python."""
    from pyspark.sql import functions as F

    al, bl = a.cast("long"), b.cast("long")
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = key + F.shiftleft(F.shiftright(al, i).bitwiseAND(F.lit(1)), 2 * i)
        key = key + F.shiftleft(
            F.shiftright(bl, i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    num_files: int = 8,
    bits: int = 16,
    fmt: str = "parquet",
) -> None:
    """Write `df` laid out along the Z-curve of (col_a, col_b):
    range-partition by the Morton key so files own contiguous,
    non-overlapping key ranges, then sort within each file. Readers
    filtering on EITHER column skip whole files via footer min/max —
    the layout step a 100 TB table does once at ingest to make every
    later point/range query cheap."""
    from pyspark.sql import functions as F

    zk = zorder_key(F.col(col_a), F.col(col_b), bits).alias("_zkey")
    (
        df.select("*", zk)
        .repartitionByRange(num_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.format(fmt)
        .mode("overwrite")
        .save(path)
    )
