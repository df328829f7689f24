"""Deterministic test fixtures (FIXTURES.md §4): the geo-enrichment
dimension replacing the reference's per-IP Baidu geocoder calls
(flask/app.py:136-147) with a joinable table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logvision_spark.schemas import GEO_DIM_SCHEMA


def geo_dim_for_hosts(
    spark: SparkSession, hosts_df: DataFrame, host_col: str = "host",
    resolve_ratio_mod: int = 10,
) -> DataFrame:
    """Build a deterministic (ip, coor_x, coor_y) dim covering the distinct
    hosts of a frame. Coordinates derive from a hash of the IP so they're
    stable across runs; roughly 1/resolve_ratio_mod of IPs are withheld to
    preserve the reference's drop-unresolved inner-join semantics."""
    ips = hosts_df.select(F.col(host_col).alias("ip")).distinct()
    h = F.abs(F.xxhash64("ip"))
    return (
        ips.where(F.pmod(h, F.lit(resolve_ratio_mod)) != 0)
        .select(
            "ip",
            (F.pmod(h, F.lit(36000)) / 100.0 - 180.0).alias("coor_x"),
            (F.pmod(F.abs(F.xxhash64("ip", F.lit(1))), F.lit(18000)) / 100.0 - 90.0).alias(
                "coor_y"
            ),
        )
    )


def geo_dim_static(spark: SparkSession, rows: list[tuple[str, float, float]]) -> DataFrame:
    return spark.createDataFrame(rows, GEO_DIM_SCHEMA)
