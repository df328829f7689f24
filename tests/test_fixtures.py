from __future__ import annotations

from pyspark.sql import functions as F

from logvision_spark.operators.joins import geo_enrich
from logvision_spark.sources.fixtures import geo_dim_for_hosts


def test_geo_dim_deterministic_and_partial(spark):
    hosts = spark.createDataFrame(
        [(f"10.0.{i}.{j}",) for i in range(10) for j in range(10)], ["host"]
    )
    dim1 = geo_dim_for_hosts(spark, hosts).collect()
    dim2 = geo_dim_for_hosts(spark, hosts).collect()
    assert sorted(map(tuple, dim1)) == sorted(map(tuple, dim2))  # stable
    assert 0 < len(dim1) < 100  # some IPs deliberately unresolved
    for r in dim1:
        assert -180 <= r["coor_x"] <= 180 and -90 <= r["coor_y"] <= 90

    dim = geo_dim_for_hosts(spark, hosts)
    enriched = geo_enrich(hosts, dim)
    assert enriched.count() == dim.count()  # inner join drops unresolved


def test_geo_enrich_live_matches_broadcast_join(spark):
    """The mapInPandas live-enrichment interface (pluggable resolver —
    where the reference's per-IP HTTP geocoder plugs in) must return
    exactly the rows of the broadcast-dim join on the same mapping,
    including drop-unresolved semantics."""
    from logvision_spark.operators.joins import geo_enrich_live
    from logvision_spark.schemas import GEO_DIM_SCHEMA

    table = {"10.0.0.1": (1.0, 2.0), "10.0.0.2": (3.0, 4.0)}
    hosts = spark.createDataFrame(
        [("10.0.0.1", 5), ("10.0.0.2", 7), ("10.0.0.3", 9), ("10.0.0.1", 2)],
        ["host", "cnt"],
    )
    dim = spark.createDataFrame(
        [(k, x, y) for k, (x, y) in table.items()], GEO_DIM_SCHEMA
    )

    def resolver(ip):
        return table.get(ip)

    via_join = geo_enrich(hosts, dim)
    via_live = geo_enrich_live(hosts, resolver)
    assert via_join.columns == via_live.columns
    assert sorted(map(tuple, via_join.collect())) == sorted(
        map(tuple, via_live.collect())
    )
    assert via_live.count() == 3  # 10.0.0.3 unresolved → dropped


def test_load_table_resolution_cache(spark, sf_dir):
    """Repeated loads of one table reuse the resolved DataFrame (the
    metastore-catalog behavior: no re-listing/schema inference per
    query); clearing the cache re-resolves."""
    from logvision_spark.sources.readers import (
        load_table,
        load_table_cache_clear,
    )

    a = load_table(spark, "nation", sf_dir)
    b = load_table(spark, "nation", sf_dir)
    assert a is b
    load_table_cache_clear()
    c = load_table(spark, "nation", sf_dir)
    assert c is not a
    assert c.count() == a.count()
