"""Checkpoint recovery: stop a streaming counter mid-input, restart from
the same checkpoint with more input present, and verify totals equal one
batch pass — no double counting across restarts (the reference's
at-least-once zincrby gap, SURVEY.md §2.9)."""

from __future__ import annotations

import time

from logvision_spark.parser import parse_access_log, read_access_log
from logvision_spark.streaming.pipeline import counter_views


def _lines(host: str, n: int, base_sec: int) -> str:
    return "\n".join(
        f'{host} - - [10/Oct/2020:13:55:{(base_sec + i) % 60:02d} +0000] '
        f'"GET /r HTTP/1.1" 200 10'
        for i in range(n)
    )


def _start(spark, log_dir, ckpt):
    stream = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 1)
        .load(log_dir)
    )
    views = counter_views(parse_access_log(stream))
    return (
        views["host"]
        .writeStream.format("memory")
        .queryName("recovery_counts")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )


def test_restart_from_checkpoint_no_double_count(spark, tmp_path):
    log_dir = tmp_path / "logs"
    log_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")

    # phase 1: two files, run to completion, stop
    (log_dir / "f0.log").write_text(_lines("10.0.0.1", 5, 0) + "\n")
    (log_dir / "f1.log").write_text(_lines("10.0.0.2", 3, 10) + "\n")
    q = _start(spark, str(log_dir), ckpt)
    q.awaitTermination(120)

    first = {
        r["member"]: r["cnt"] for r in spark.table("recovery_counts").collect()
    }
    assert first == {"10.0.0.1": 5, "10.0.0.2": 3}

    # phase 2: more data lands while the query is down; restart SAME ckpt
    (log_dir / "f2.log").write_text(_lines("10.0.0.1", 4, 20) + "\n")
    q2 = _start(spark, str(log_dir), ckpt)
    q2.awaitTermination(120)

    recovered = {
        r["member"]: r["cnt"] for r in spark.table("recovery_counts").collect()
    }
    # exactly-once: f0/f1 not re-counted, f2 picked up from the offset log
    batch = counter_views(read_access_log(spark, str(log_dir)))["host"]
    expected = {r["member"]: r["cnt"] for r in batch.collect()}
    assert recovered == expected == {"10.0.0.1": 9, "10.0.0.2": 3}
