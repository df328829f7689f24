"""Property-based parser tests: generated combined-log lines round-trip
through the parse with every field recovered; arbitrary garbage never
crashes and always lands as parsed=false."""

from __future__ import annotations

import datetime

from hypothesis import given, settings
from hypothesis import strategies as st

from logvision_spark.parser import parse_access_log

MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
          "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]

ip = st.tuples(*[st.integers(0, 255)] * 4).map(lambda t: ".".join(map(str, t)))
token = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_.-",
    min_size=1,
    max_size=12,
)
url_path = st.lists(token, min_size=1, max_size=3).map(lambda p: "/" + "/".join(p))
method = st.sampled_from(["GET", "POST", "PUT", "DELETE", "HEAD"])
proto = st.sampled_from(["HTTP/1.0", "HTTP/1.1"])
status = st.integers(100, 599)
nbytes = st.one_of(st.integers(0, 10**9), st.none())
ts_parts = st.tuples(
    st.integers(1, 28), st.integers(0, 11), st.integers(2000, 2030),
    st.integers(0, 23), st.integers(0, 59), st.integers(0, 59),
    st.sampled_from(["+0000", "+0800", "-0500"]),
)


@st.composite
def log_line(draw):
    host = draw(ip)
    user = draw(st.one_of(st.just("-"), token))
    d, mo, y, h, mi, s, tz = draw(ts_parts)
    m = draw(method)
    u = draw(url_path)
    p = draw(proto)
    sc = draw(status)
    b = draw(nbytes)
    bs = "-" if b is None else str(b)
    line = (
        f"{host} - {user} [{d:02d}/{MONTHS[mo]}/{y}:{h:02d}:{mi:02d}:{s:02d} {tz}] "
        f'"{m} {u} {p}" {sc} {bs}'
    )
    expected = dict(
        host=host, username=user, req_method=m, url=u, protocol=p,
        status_code=sc, bytes=b,
    )
    # expected UTC timestamp
    off = {"+0000": 0, "+0800": 8, "-0500": -5}[tz]
    expected["ts"] = datetime.datetime(
        y, mo + 1, d, h, mi, s
    ) - datetime.timedelta(hours=off)
    return line, expected


@settings(max_examples=30, deadline=None)
@given(st.lists(log_line(), min_size=1, max_size=20))
def test_valid_lines_round_trip(spark, cases):
    df = spark.createDataFrame([(l,) for l, _ in cases], ["value"])
    rows = parse_access_log(df).collect()
    by_raw = {r["raw"]: r for r in rows}
    for line, exp in cases:
        r = by_raw[line]
        assert r["parsed"] is True, line
        for k, v in exp.items():
            assert r[k] == v, (line, k, r[k], v)


@settings(max_examples=20, deadline=None)
@given(st.lists(st.text(max_size=80).filter(lambda s: "\n" not in s),
                min_size=1, max_size=20))
def test_garbage_never_crashes(spark, junk):
    rows_in = [(j,) for j in junk if j]
    if not rows_in:
        return
    df = spark.createDataFrame(rows_in, ["value"])
    rows = parse_access_log(df).collect()
    for r in rows:
        if r["parsed"] is False:
            assert r["host"] is None and r["ts"] is None
