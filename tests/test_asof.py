"""As-of join unit semantics: inclusive ties, no-match nulls, key isolation."""

from __future__ import annotations

import datetime

from logvision_spark.operators.asof import asof_join


def ts(s):
    return datetime.datetime(2024, 1, 1, 0, 0, s)


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [(1, "u1", ts(10)), (2, "u1", ts(5)), (3, "u2", ts(10)), (4, "u3", ts(10))],
        ["event_id", "user", "ts"],
    )
    right = spark.createDataFrame(
        [("u1", ts(5), "a"), ("u1", ts(8), "b"), ("u2", ts(11), "c")],
        ["user", "ts", "tag"],
    )
    out = {
        r["event_id"]: (r["ts_asof"], r["tag_asof"])
        for r in asof_join(left, right, key="user", value_cols=("tag",)).collect()
    }
    assert out[1] == (ts(8), "b")   # latest <= 10
    assert out[2] == (ts(5), "a")   # tie at 5 is inclusive
    assert out[3] == (None, None)   # u2's only right row is later
    assert out[4] == (None, None)   # u3 has no right rows
    assert len(out) == 4            # left rows all preserved
