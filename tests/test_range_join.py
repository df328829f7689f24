"""Range (point-in-interval) join: boundary inclusivity, empty intervals,
bucket-spanning intervals, and the no-cartesian plan guarantee."""

from __future__ import annotations

import datetime

from logvision_spark.operators.joins import range_interval_join


def ts(s):
    return datetime.datetime(2024, 1, 1, 0, 0, 0) + datetime.timedelta(seconds=s)


def test_range_join_semantics(spark):
    points = spark.createDataFrame(
        [(1, ts(0)), (2, ts(59)), (3, ts(60)), (4, ts(125)), (5, ts(500))],
        ["pid", "ts"],
    )
    intervals = spark.createDataFrame(
        [
            (10, ts(0), ts(60)),     # [0, 60): pids 1, 2 — not 3 (end excl.)
            (11, ts(59), ts(126)),   # spans 3 buckets: pids 2, 3, 4
            (12, ts(200), ts(200)),  # empty interval matches nothing
            (13, ts(300), ts(250)),  # negative interval matches nothing
        ],
        ["iid", "start_ts", "end_ts"],
    )
    got = {
        (r["iid"], r["pid"])
        for r in range_interval_join(
            points, intervals, "ts", "start_ts", "end_ts", bucket_seconds=60
        ).collect()
    }
    assert got == {(10, 1), (10, 2), (11, 2), (11, 3), (11, 4)}


def test_range_join_no_cartesian(spark):
    from logvision_spark.plans.checks import explain_str

    points = spark.createDataFrame([(1, ts(0))], ["pid", "ts"])
    intervals = spark.createDataFrame(
        [(10, ts(0), ts(60))], ["iid", "start_ts", "end_ts"]
    )
    plan = explain_str(
        range_interval_join(points, intervals, "ts", "start_ts", "end_ts")
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
