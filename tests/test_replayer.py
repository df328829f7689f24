"""End-to-end live-stream test: replayer feeds the watched directory while
a streaming counter runs; final state equals the full replay corpus."""

from __future__ import annotations

import time

from logvision_spark.parser import parse_access_log
from logvision_spark.sources.replayer import LogReplayer
from logvision_spark.streaming.pipeline import counter_views


def test_replayer_drives_live_stream(spark, tmp_path):
    lines = [
        f'10.0.0.{1 + (i % 3)} - - [10/Oct/2020:13:55:{i % 60:02d} +0000] '
        f'"GET /p{i % 4} HTTP/1.1" 200 {100 + i}'
        for i in range(30)
    ]
    log_dir = str(tmp_path / "live")
    rep = LogReplayer(lines, log_dir, lines_per_tick=10, tick_seconds=0.3).start()
    rep.drain()

    stream = spark.readStream.format("text").load(log_dir)
    views = counter_views(parse_access_log(stream))
    q = (
        views["host"]
        .writeStream.format("memory")
        .queryName("live_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rep.stop()

    got = {r["member"]: r["cnt"] for r in spark.table("live_counts").collect()}
    assert got == {"10.0.0.1": 10, "10.0.0.2": 10, "10.0.0.3": 10}
    assert rep.files_written == 3


def test_replayer_prefix_isolates_resumed_replays(tmp_path):
    """A second replayer resuming into the same watched dir restarts its
    chunk index at 0 — without a distinct file_prefix the atomic rename
    would OVERWRITE an already-ingested file (the file source treats
    visible files as immutable). The prefix keeps both replays' files
    side by side."""
    d = str(tmp_path / "resume")
    LogReplayer(["one"], d, lines_per_tick=1, tick_seconds=0.01).start().drain()
    LogReplayer(
        ["two"], d, lines_per_tick=1, tick_seconds=0.01, file_prefix="tail"
    ).start().drain()
    import os

    names = sorted(os.listdir(d))
    assert names == ["part-000000.log", "tail-000000.log"], names
    assert open(os.path.join(d, "part-000000.log")).read() == "one\n"
    assert open(os.path.join(d, "tail-000000.log")).read() == "two\n"
