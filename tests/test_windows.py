"""Sliding and session window semantics (capabilities beyond the
reference's 1-second buckets) — batch assertions + streaming parity."""

from __future__ import annotations

import datetime

from logvision_spark.parser import parse_access_log
from logvision_spark.streaming.pipeline import (
    session_window_counts,
    sliding_window_counts,
)


def lines_at(seconds_and_hosts):
    return [
        (
            f'{host} - - [10/Oct/2020:00:00:{s:02d} +0000] '
            f'"GET /x HTTP/1.1" 200 1',
        )
        for s, host in seconds_and_hosts
    ]


def test_sliding_windows_double_count(spark):
    # events at t=0,1,7 → 10s/5s sliding windows
    df = spark.createDataFrame(
        lines_at([(0, "a"), (1, "a"), (7, "a")]), ["value"]
    )
    parsed = parse_access_log(df)
    out = {
        (r["win_start"].second if r["win_start"].minute == 0 else -r["win_start"].minute,
         ): r["cnt"]
        for r in sliding_window_counts(parsed).collect()
    }
    # window [55..05) catches t=0,1; [00..10) catches all 3; [05..15) catches t=7
    counts = sorted(
        r["cnt"] for r in sliding_window_counts(parsed).collect()
    )
    assert counts == [1, 2, 3]


def test_session_windows_split_on_gap(spark):
    # host a: hits at 0,10,50 with 30s gap → sessions {0,10} and {50}
    # host b: one hit → one session
    df = spark.createDataFrame(
        lines_at([(0, "a"), (10, "a"), (50, "a"), (5, "b")]), ["value"]
    )
    parsed = parse_access_log(df)
    rows = session_window_counts(parsed, gap="30 seconds").collect()
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r["requests"])
    assert sorted(by_host["a"]) == [1, 2]
    assert by_host["b"] == [1]
    # session end = last event + gap
    a_sessions = sorted(
        (r["session_start"], r["session_end"])
        for r in rows
        if r["host"] == "a"
    )
    assert a_sessions[0][1] - a_sessions[0][0] == datetime.timedelta(seconds=40)


def test_sliding_windows_streaming_equals_batch(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    all_lines = lines_at([(0, "a"), (1, "a"), (7, "b"), (22, "c")])
    for i, l in enumerate(all_lines):
        (d / f"f{i}.log").write_text(l[0] + "\n")
    stream = (
        spark.readStream.format("text").option("maxFilesPerTrigger", 1).load(str(d))
    )
    sw = sliding_window_counts(parse_access_log(stream))
    q = (
        sw.writeStream.format("memory")
        .queryName("slide_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["win_start"], r["win_end"]): r["cnt"]
        for r in spark.table("slide_stream").collect()
    }
    batch_df = spark.createDataFrame(all_lines, ["value"])
    batch = {
        (r["win_start"], r["win_end"]): r["cnt"]
        for r in sliding_window_counts(parse_access_log(batch_df)).collect()
    }
    assert streamed == batch
