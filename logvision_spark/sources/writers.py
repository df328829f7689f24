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
