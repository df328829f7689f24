"""Golden tests for the combined-log parser (SURVEY.md §5.2): valid lines,
'-' placeholders, no-protocol requests, truncated request fields, garbage.

Reference behavior being re-expressed: 11-group regex parse at
streaming.scala:75-89 with sentinel fallback rows; here → typed columns +
``parsed`` flag.
"""

from __future__ import annotations

import datetime

import pytest

from logvision_spark.parser import parse_access_log, split_lines

GOLDEN_LINES = [
    # full combined line
    '203.0.113.7 - frank [10/Oct/2020:13:55:36 +0800] "GET /index.html HTTP/1.1" 200 2326 "http://example.com/" "Mozilla/5.0"',
    # '-' bytes (e.g. 302 with no body)
    '198.51.100.2 - - [10/Oct/2020:13:55:36 +0800] "POST /login.php HTTP/1.0" 302 - "-" "curl/7.58"',
    # no protocol, no referrer/UA tail
    '192.0.2.9 - - [10/Oct/2020:13:55:37 +0800] "GET /favicon.ico" 404 209',
    # method only (truncated request)
    '192.0.2.9 - - [10/Oct/2020:13:55:38 +0800] "GET" 400 0',
    # > 1 MiB response (A11 integer-division semantics fixture)
    '10.0.0.1 - alice [01/Jan/2021:00:00:00 +0000] "GET /big.iso HTTP/1.1" 200 3145728 "-" "wget/1.20"',
    # malformed garbage
    "not a log line at all %%%",
]


@pytest.fixture(scope="module")
def parsed(spark):
    df = spark.createDataFrame([(l,) for l in GOLDEN_LINES], ["value"])
    rows = parse_access_log(df).collect()
    return {r["raw"]: r for r in rows}


def test_full_line(parsed):
    r = parsed[GOLDEN_LINES[0]]
    assert r["parsed"] is True
    assert r["host"] == "203.0.113.7"
    assert r["rfc931"] == "-"
    assert r["username"] == "frank"
    # 13:55:36 +0800 == 05:55:36 UTC
    assert r["ts"] == datetime.datetime(2020, 10, 10, 5, 55, 36)
    assert r["req_method"] == "GET"
    assert r["url"] == "/index.html"
    assert r["protocol"] == "HTTP/1.1"
    assert r["status_code"] == 200
    assert r["bytes"] == 2326
    assert r["referrer"] == "http://example.com/"
    assert r["user_agent"] == "Mozilla/5.0"


def test_dash_bytes_is_null(parsed):
    r = parsed[GOLDEN_LINES[1]]
    assert r["parsed"] is True
    assert r["status_code"] == 302
    assert r["bytes"] is None  # '-' → NULL, replaces ad-hoc toInt guards (F4)


def test_no_protocol(parsed):
    r = parsed[GOLDEN_LINES[2]]
    assert r["parsed"] is True
    assert r["url"] == "/favicon.ico"
    assert r["protocol"] is None
    assert r["referrer"] is None and r["user_agent"] is None


def test_method_only(parsed):
    r = parsed[GOLDEN_LINES[3]]
    assert r["parsed"] is True
    assert r["req_method"] == "GET"
    assert r["url"] is None and r["protocol"] is None


def test_big_response(parsed):
    r = parsed[GOLDEN_LINES[4]]
    assert r["bytes"] == 3145728


def test_malformed_line_gets_flag_not_sentinel(parsed):
    r = parsed[GOLDEN_LINES[5]]
    assert r["parsed"] is False
    assert r["host"] is None  # no "foo" sentinel (streaming.scala:85-88)
    assert r["ts"] is None and r["status_code"] is None


def test_split_lines_explodes_multiline_payloads(spark):
    payload = "\n".join(GOLDEN_LINES[:3])
    df = spark.createDataFrame([(payload,), (GOLDEN_LINES[3],)], ["value"])
    out = split_lines(df)
    assert out.count() == 4


def test_parse_stays_jvm_side(spark):
    """The parse must be pure built-in expressions (WholeStageCodegen), no
    Python round-trip — `.explain` should show no BatchEvalPython."""
    df = spark.createDataFrame([(GOLDEN_LINES[0],)], ["value"])
    plan = parse_access_log(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
