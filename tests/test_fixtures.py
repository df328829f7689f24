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
