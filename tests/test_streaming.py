"""Streaming semantics tests (SURVEY.md §5.2): the Redis-zincrby equivalence
property — cross-batch accumulated counter state must equal a batch groupBy
over the concatenated input — plus update-mode delta behavior via
foreachBatch.
"""

from __future__ import annotations

import random

import pytest

from logvision_spark.parser import parse_access_log, read_access_log
from logvision_spark.streaming.pipeline import counter_views, start_counter_query
from logvision_spark.streaming.sinks import foreach_batch_kv

HOSTS = ["10.0.0.1", "10.0.0.2", "10.0.0.3", "192.168.1.9"]
METHODS = ["GET", "POST", "PUT"]


def make_lines(n: int, seed: int) -> list[str]:
    rng = random.Random(seed)
    lines = []
    for i in range(n):
        host = rng.choice(HOSTS)
        meth = rng.choice(METHODS)
        sec = rng.randrange(0, 30)
        lines.append(
            f'{host} - - [10/Oct/2020:13:55:{sec:02d} +0000] '
            f'"{meth} /page{rng.randrange(5)} HTTP/1.1" 200 {rng.randrange(100, 5000)}'
        )
    # some malformed lines — must be excluded from key counters
    lines += ["garbage %%%", "also not a log line"]
    return lines


@pytest.fixture(scope="module")
def log_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("logs")
    # three files → three potential micro-batches
    for i in range(3):
        (d / f"part-{i}.log").write_text("\n".join(make_lines(40, seed=i)) + "\n")
    return str(d)


def test_streaming_exact_dedup_equals_batch(spark, tmp_path):
    """Streaming dedup (dropDuplicatesWithinWatermark over the content
    hash) must keep exactly one row per distinct content across
    micro-batches — same survivor COUNT as batch dedup over the
    concatenated input."""
    import json

    from pyspark.sql import functions as F

    from logvision_spark.operators.dedup import streaming_exact_dedup

    d = tmp_path / "docs"
    d.mkdir()
    # 3 files × 20 rows with heavy cross-file duplication: 10 distinct texts
    for i in range(3):
        with open(d / f"docs-{i}.json", "w") as f:
            for j in range(20):
                f.write(json.dumps({
                    "ts": f"2024-01-01T00:{i:02d}:{j:02d}",
                    "text": f"document body number {(i * 20 + j) % 10}",
                }) + "\n")
    stream = (
        spark.readStream.format("json")
        .schema("ts timestamp, text string")
        .option("maxFilesPerTrigger", 1)
        .load(str(d))
    )
    deduped = streaming_exact_dedup(stream, watermark="10 minutes")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "dedup_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("dedup_stream").collect()
    batch = spark.read.schema("ts timestamp, text string").json(str(d))
    expected = streaming_exact_dedup(batch, watermark="10 minutes").count()
    assert len(got) == expected == 10
    assert len({r["text"] for r in got}) == 10  # one survivor per content


def test_streaming_counters_equal_batch(spark, log_dir, tmp_path):
    """Accumulated streaming state == one batch aggregation over all input:
    the property Redis zincrby provides in the reference (streaming.scala:163),
    here provided by StateStore + complete mode."""
    stream = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .load(log_dir)
    )
    views = counter_views(parse_access_log(stream))
    q = start_counter_query(
        views["host"], "host_counts_stream", str(tmp_path / "ckpt"), available_now=True
    )
    q.awaitTermination(120)

    streamed = {
        r["member"]: r["cnt"] for r in spark.table("host_counts_stream").collect()
    }
    batch_views = counter_views(read_access_log(spark, log_dir))
    batch = {r["member"]: r["cnt"] for r in batch_views["host"].collect()}
    assert streamed == batch
    assert None not in streamed  # malformed rows filtered by `parsed`


def test_streaming_second_buckets_equal_batch(spark, log_dir, tmp_path):
    stream = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 1)
        .load(log_dir)
    )
    views = counter_views(parse_access_log(stream))
    q = start_counter_query(
        views["datetime"], "sec_counts_stream", str(tmp_path / "ckpt2"), available_now=True
    )
    q.awaitTermination(120)
    streamed = {
        r["second"]: r["cnt"] for r in spark.table("sec_counts_stream").collect()
    }
    batch_views = counter_views(read_access_log(spark, log_dir))
    batch = {r["second"]: r["cnt"] for r in batch_views["datetime"].collect()}
    assert streamed == batch


def test_update_mode_foreach_batch_deltas_accumulate(spark, log_dir, tmp_path):
    """W1 path: update-mode deltas shipped per batch via foreachBatch must
    merge (last-write-wins per key) to the same totals."""
    kv: dict[str, int] = {}

    def write_batch(batch_df, batch_id):
        for r in batch_df.collect():  # test sink only; prod sinks stay distributed
            kv[r["member"]] = r["cnt"]

    stream = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 1)
        .load(log_dir)
    )
    views = counter_views(parse_access_log(stream))
    q = foreach_batch_kv(
        views["req_method"], write_batch, str(tmp_path / "ckpt3"), output_mode="update"
    )
    # availableNow not set on foreachBatch helper; stop after processing
    import time

    deadline = time.time() + 90
    while time.time() < deadline:
        if q.lastProgress and q.lastProgress["numInputRows"] == 0 and kv:
            break
        time.sleep(1)
    q.stop()
    q.awaitTermination(30)

    batch_views = counter_views(read_access_log(spark, log_dir))
    batch = {r["member"]: r["cnt"] for r in batch_views["req_method"].collect()}
    assert kv == batch


def test_streaming_hll_sketch_state_merges_across_batches(spark, sf_dir, tmp_path):
    """The stream_sketch_daily_users catalog entry claims CROSS-BATCH
    sketch-state merge; pin that the 4-file landing dir with
    maxFilesPerTrigger=1 really yields >= 4 micro-batches, and that the
    accumulated estimate equals the one-shot batch sketch exactly
    (same buffer merge, so bit-identical estimate, not just in-band)."""
    from pyspark.sql import functions as F

    from logvision_spark.sources.readers import load_table

    ev = load_table(spark, "events", sf_dir).select("ts", "user_id")
    land = str(tmp_path / "land")
    ev.repartition(4).write.parquet(land)
    src = (
        spark.readStream.schema("ts timestamp, user_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(land)
    )
    agg = src.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("hll_batches_probe")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 4, f"expected >=4 micro-batches, got {n_batches}"
    streamed = {r["day"]: r["est"] for r in spark.table("hll_batches_probe").collect()}
    batch = {
        r["day"]: r["est"]
        for r in ev.where(F.col("ts").isNotNull())
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .collect()
    }
    assert streamed == batch


def _run_counting_memory_query(spark, name, checkpoint):
    """Shared recipe for the state-store-conf tests: land 100 rows with a
    7-value key in parquet, stream them through a groupBy-count into a
    complete-mode memory sink under AvailableNow, and return lastProgress.
    Must be called inside the state-store context under test; raises if
    the query fails to drain (and stops it) so a slow host produces a
    timeout error, not a misleading artifact-missing failure."""
    import tempfile

    from pyspark.sql import functions as F

    d = tempfile.mkdtemp(prefix=f"lv_{name}_in_")
    spark.range(100).select(
        F.col("id"), F.pmod("id", F.lit(7)).alias("k")
    ).write.mode("append").parquet(d)
    src = spark.readStream.schema("id long, k long").parquet(d)
    agg = src.groupBy("k").agg(F.count(F.lit(1)).alias("cnt"))
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(120), "query did not drain within 120s"
        return q.lastProgress
    finally:
        q.stop()


def test_rocksdb_state_store_context_scopes_and_restores(spark, sf_dir):
    """The RocksDB context must (a) actually engage the provider for
    queries started inside it — verified via the query's state-operator
    customMetrics, which only a RocksDB store emits — and (b) restore
    the session's previous provider setting afterwards, so the driver's
    vanilla session never inherits engine conf."""
    import tempfile

    from logvision_spark.streaming.pipeline import (
        ROCKSDB_PROVIDER,
        rocksdb_state_store,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    before = spark.conf.get(key)
    assert "RocksDB" not in before  # default provider going in

    with rocksdb_state_store(spark):
        assert spark.conf.get(key) == ROCKSDB_PROVIDER
        progress = _run_counting_memory_query(
            spark, "rdb_scope_t", tempfile.mkdtemp(prefix="lv_ck_")
        )
    assert spark.conf.get(key) == before
    ops = (progress or {}).get("stateOperators") or []
    assert ops and any(
        "rocksdb" in m for m in (ops[0].get("customMetrics") or {})
    ), ops
    assert spark.table("rdb_scope_t").count() == 7


def test_rocksdb_changelog_mode_engages_and_restores(spark, sf_dir):
    """changelog=True must (a) set the changelog-checkpointing conf for
    queries started inside the context and restore it after, and (b)
    actually produce changelog checkpoint artifacts (.changelog files
    in the state dir) instead of only per-batch snapshots."""
    import glob
    import tempfile

    from logvision_spark.streaming.pipeline import (
        CHANGELOG_KEY,
        rocksdb_state_store,
    )

    before = spark.conf.get(CHANGELOG_KEY, None)
    ck = tempfile.mkdtemp(prefix="lv_rdb_cl_ck_")
    with rocksdb_state_store(spark, changelog=True):
        assert spark.conf.get(CHANGELOG_KEY) == "true"
        _run_counting_memory_query(spark, "rdb_changelog_t", ck)
    assert spark.conf.get(CHANGELOG_KEY, None) == before
    logs = glob.glob(f"{ck}/state/**/*.changelog", recursive=True)
    assert logs, f"no changelog artifacts under {ck}/state"
    assert spark.table("rdb_changelog_t").count() == 7
