"""Whole-system integration: the reference's end-to-end pipeline
(ingest → parse → counters + ML scoring → sinks) re-expressed and run
live: replayer feeds a watched dir, Structured Streaming parses and
scores each micro-batch with a loaded-once model inside foreachBatch,
emitting per-class counts and a JSON archive — the engine-native form of
streaming.scala:189-235 without the per-batch model reload or the
driver-side Kafka collect."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from logvision_spark.ml.corpus import synth_good_urls
from logvision_spark.ml.intrusion import BAD, GOOD, load_corpus, score_stream, train
from logvision_spark.parser import parse_access_log
from logvision_spark.sources.replayer import LogReplayer

ATTACKS = [
    "/a.php?q='+union+select+password--",
    "/x?<script>alert(1)</script>",
    "/cgi/../../etc/passwd",
]
BENIGN = ["/index.html", "/news/today", "/img/logo.gif"]


@pytest.fixture(scope="module")
def tiny_model(spark, tmp_path_factory):
    """Small fast model: synthetic benign + a slice of attack-ish strings.
    Integration cares about plumbing, not holdout accuracy."""
    d = tmp_path_factory.mktemp("mini")
    (d / "good.txt").write_text("\n".join(synth_good_urls(800)) + "\n")
    bad_lines = [f"/p.php?a='or {i}={i}--" for i in range(200)]
    bad_lines += [f"/s?<script>alert({i})</script>" for i in range(200)]
    bad_lines += [f"/cgi/../../../etc/file{i}" for i in range(100)]
    (d / "bad.txt").write_text("\n".join(bad_lines) + "\n")
    return train(
        load_corpus(spark, str(d / "good.txt"), GOOD),
        load_corpus(spark, str(d / "bad.txt"), BAD),
    )


def test_live_pipeline_scores_and_archives(spark, tiny_model, tmp_path):
    lines = []
    for i in range(10):
        url = BENIGN[i % 3] if i % 2 == 0 else ATTACKS[i % 3]
        lines.append(
            f'10.0.0.{i % 4} - - [10/Oct/2020:13:55:{i:02d} +0000] '
            f'"GET {url} HTTP/1.1" 200 {100 + i}'
        )
    log_dir = str(tmp_path / "live")
    LogReplayer(lines, log_dir, lines_per_tick=5, tick_seconds=0.2).start().drain()

    archive = str(tmp_path / "archive")
    class_counts: dict[float, int] = {}

    def score_batch(batch_df, batch_id):
        # model captured once per process — NOT reloaded per batch
        scored = score_stream(tiny_model, batch_df)
        for r in scored.groupBy("prediction").count().collect():
            class_counts[r["prediction"]] = (
                class_counts.get(r["prediction"], 0) + r["count"]
            )
        scored.drop("raw").write.mode("append").json(archive)

    stream = spark.readStream.format("text").load(log_dir)
    parsed = parse_access_log(stream)
    q = (
        parsed.writeStream.foreachBatch(score_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    assert sum(class_counts.values()) == 10
    # some attacks flagged (the deliberately-tiny model isn't the accuracy
    # gate — test_ml_intrusion holds the published band)
    assert class_counts.get(1.0, 0) >= 2
    # archive is valid JSON with the scored schema
    recs = []
    for fn in os.listdir(archive):
        if fn.endswith(".json"):
            with open(os.path.join(archive, fn)) as f:
                recs += [json.loads(l) for l in f if l.strip()]
    assert len(recs) == 10
    assert all("prediction" in r and "host" in r for r in recs)
