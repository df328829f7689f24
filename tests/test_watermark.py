"""Watermark semantics (the documented divergence, SURVEY.md §2.9): in
append mode a window only emits once the watermark passes it, and events
arriving later than the watermark are dropped — unlike the reference's
accept-forever Redis merge."""

from __future__ import annotations

from pyspark.sql import functions as F

from logvision_spark.parser import parse_access_log


def line(sec: int, host: str = "10.0.0.1") -> str:
    return (
        f'{host} - - [10/Oct/2020:14:{sec // 60:02d}:{sec % 60:02d} +0000] '
        f'"GET /x HTTP/1.1" 200 1'
    )


def _run_windowed(spark, log_dir, ckpt, out):
    stream = spark.readStream.format("text").load(log_dir)
    parsed = parse_access_log(stream).where(F.col("parsed"))
    windowed = (
        parsed.withWatermark("ts", "60 seconds")
        .groupBy(F.window("ts", "10 seconds"))  # full window col: keeps
        .agg(F.count(F.lit(1)).alias("cnt"))    # watermark tracking intact
        .select(F.col("window.start").alias("win"), "cnt")
    )
    q = (
        windowed.writeStream.format("parquet")  # file sink: supports
        .option("path", out)                    # checkpoint recovery
        .outputMode("append")  # emits only finalized windows
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _read_windows(spark, out):
    return {
        r["win"].second + r["win"].minute * 60: r["cnt"]
        for r in spark.read.parquet(out).collect()
    }


def test_late_events_dropped_in_append_mode(spark, tmp_path):
    d = tmp_path / "logs"
    d.mkdir()
    ckpt = str(tmp_path / "ckpt")

    # run 1: t=0..2 plus a watermark-advancing event at t=300
    out = str(tmp_path / "out")
    (d / "f0.log").write_text("\n".join(line(s) for s in (0, 1, 2)) + "\n")
    (d / "f1.log").write_text(line(300) + "\n")
    _run_windowed(spark, str(d), ckpt, out)
    # watermark reached 300-60=240 > window end 10 → the [0,10) window was
    # finalized with 3 events; the [300,310) window stays open (unemitted)
    assert _read_windows(spark, out) == {0: 3}

    # run 2: a LATE event back at t=3 arrives after the watermark passed;
    # restart from the same checkpoint (watermark state restored)
    (d / "f2.log").write_text(line(3) + "\n")
    _run_windowed(spark, str(d), ckpt, out)
    # the late event is dropped: the finalized window is not re-emitted or
    # amended (unlike the reference's zincrby, which would merge it
    # forever — the documented divergence)
    assert _read_windows(spark, out) == {0: 3}
