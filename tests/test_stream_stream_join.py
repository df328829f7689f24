"""Stream-stream join (a capability absent from the reference's DStream
design): join two live log streams — requests vs errors — on host within
a time bound, with watermarks on both sides bounding the join state."""

from __future__ import annotations

from pyspark.sql import functions as F

from logvision_spark.parser import parse_access_log


def line(sec: int, host: str, status: int) -> str:
    return (
        f'{host} - - [10/Oct/2020:14:00:{sec:02d} +0000] '
        f'"GET /x HTTP/1.1" {status} 1'
    )


def test_interval_join_of_two_streams(spark, tmp_path):
    d1, d2 = tmp_path / "s1", tmp_path / "s2"
    d1.mkdir(), d2.mkdir()
    # stream 1: successful requests; stream 2: errors shortly after some
    (d1 / "a.log").write_text(
        "\n".join([line(0, "10.0.0.1", 200), line(10, "10.0.0.2", 200),
                   line(40, "10.0.0.3", 200)]) + "\n"
    )
    (d2 / "b.log").write_text(
        "\n".join([line(3, "10.0.0.1", 500),   # within 5s of request → joins
                   line(30, "10.0.0.2", 500),  # 20s later → outside bound
                   line(41, "10.0.0.3", 500)]) + "\n"
    )

    reqs = parse_access_log(
        spark.readStream.format("text").load(str(d1))
    ).where(F.col("parsed")).select(
        F.col("host").alias("r_host"), F.col("ts").alias("r_ts")
    ).withWatermark("r_ts", "1 minute")
    errs = parse_access_log(
        spark.readStream.format("text").load(str(d2))
    ).where(F.col("parsed")).select(
        F.col("host").alias("e_host"), F.col("ts").alias("e_ts")
    ).withWatermark("e_ts", "1 minute")

    joined = reqs.join(
        errs,
        (F.col("r_host") == F.col("e_host"))
        & (F.col("e_ts") >= F.col("r_ts"))
        & (F.col("e_ts") <= F.col("r_ts") + F.expr("INTERVAL 5 SECONDS")),
        "inner",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["r_host"], r["e_ts"].second) for r in spark.table("ss_join").collect()}
    assert got == {("10.0.0.1", 3), ("10.0.0.3", 41)}
