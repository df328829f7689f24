"""Serving catalog tests: every §3.3 namespace view computes over a parsed
+ scored fixture and produces the shape the dashboard consumes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logvision_spark.parser import parse_access_log
from logvision_spark.schemas import GEO_DIM_SCHEMA
from logvision_spark.serving.views import ServingCatalog

LINES = [
    '10.0.0.1 - - [10/Oct/2020:13:55:36 +0000] "GET /a HTTP/1.1" 200 1000',
    '10.0.0.1 - - [10/Oct/2020:13:55:36 +0000] "GET /a HTTP/1.1" 200 2000',
    '10.0.0.2 - - [10/Oct/2020:13:55:37 +0000] "POST /b HTTP/1.1" 302 -',
    '10.0.0.3 - - [10/Oct/2020:13:55:38 +0000] "GET /c HTTP/1.1" 404 500',
    "garbage line",
]


@pytest.fixture(scope="module")
def catalog(spark):
    parsed = parse_access_log(spark.createDataFrame([(l,) for l in LINES], ["value"]))
    # fake scored frame: /b and /c are "bad"
    scored = parsed.where(F.col("parsed")).withColumn(
        "prediction", F.when(F.col("url") == "/a", 0.0).otherwise(1.0)
    ).withColumn("probability", F.array(F.lit(0.5), F.lit(0.5)))
    geo = spark.createDataFrame(
        [("10.0.0.1", 1.0, 2.0), ("10.0.0.2", 3.0, 4.0)], GEO_DIM_SCHEMA
    )
    return ServingCatalog(parsed, scored=scored, geo_dim=geo)


def test_count_board_single_pass(catalog):
    r = catalog.count_board().collect()[0]
    assert r["line_cnt"] == 5  # raw lines incl. malformed (A1 semantics)
    assert r["visitors"] == 3
    # status split covers parsed records only — the malformed "garbage
    # line" must NOT inflate other_cnt (reference counters are built from
    # parsed records exclusively)
    assert r["success_cnt"] == 2 and r["other_cnt"] == 2


def test_hot_url_rank(catalog):
    rows = catalog.hot_url().collect()
    assert rows[0]["url"] == "/a" and rows[0]["cnt"] == 2 and rows[0]["rank"] == 1
    assert len(rows) == 3


def test_hot_geo_drops_unresolved(catalog):
    hosts = {r["host"] for r in catalog.hot_geo().collect()}
    assert hosts == {"10.0.0.1", "10.0.0.2"}  # 10.0.0.3 unresolved → dropped


def test_pies(catalog):
    sc = {r["status_code"]: r["cnt"] for r in catalog.status_code_pie().collect()}
    assert sc == {200: 2, 302: 1, 404: 1}
    rm = {r["req_method"]: r["cnt"] for r in catalog.req_method_pie().collect()}
    assert rm == {"GET": 3, "POST": 1}


def test_timeline_ordered_with_display_string(catalog):
    rows = catalog.req_count_timeline().collect()
    assert [r["cnt"] for r in rows] == [2, 1, 1]
    assert rows[0]["second_str"] == "2020-10-10 13:55:36"


def test_class_views(catalog):
    cc = {r["prediction"]: r["cnt"] for r in catalog.class_counts().collect()}
    assert cc == {0.0: 2, 1.0: 2}
    tl = catalog.class_timeline().collect()
    assert [(r["good_cnt"], r["bad_cnt"]) for r in tl] == [(2, 0), (0, 1), (0, 1)]
    bd = catalog.class_detail(1.0).collect()
    assert len(bd) == 2 and all(r["prediction"] == 1.0 for r in bd)


def test_scored_feed_json_payloads(catalog):
    """S4: the re-chunk feed emits one JSON payload per scored record,
    newest first, class-filterable."""
    import json

    rows = catalog.scored_feed_json(k=3).collect()
    assert len(rows) == 3
    payloads = [json.loads(r["payload"]) for r in rows]
    assert all({"host", "url", "prediction"} <= set(p) for p in payloads)
    bad_only = [
        json.loads(r["payload"])
        for r in catalog.scored_feed_json(prediction=1.0).collect()
    ]
    assert len(bad_only) == 2 and all(p["prediction"] == 1.0 for p in bad_only)


def test_all_views_complete_catalog(catalog):
    views = catalog.all_views()
    expected = {
        "count_board", "hot_url", "hot_ip", "ip_ranking", "status_code_pie",
        "req_method_pie", "req_count_timeline", "hot_geo",
        "good_count_bad_count", "url_cate_count_timeline", "good_detail",
        "bad_detail", "good_geo", "bad_geo",
    }
    assert set(views) == expected
    for name, df in views.items():
        assert df.count() >= 0, name


def test_count_board_empty_board_reads_zero(spark):
    """A just-started board (no rows yet) must read 0 counters like the
    reference's Redis defaults — sum() over zero rows is NULL without
    the coalesce (review finding)."""
    from logvision_spark.serving.views import ServingCatalog

    empty = spark.createDataFrame(
        [],
        "host string, url string, status_code int, bytes long, "
        "parsed boolean, raw string",
    )
    r = ServingCatalog(empty).count_board().collect()[0]
    assert (r["line_cnt"], r["success_cnt"], r["other_cnt"]) == (0, 0, 0)
    assert r["traffic_mb"] == 0.0
