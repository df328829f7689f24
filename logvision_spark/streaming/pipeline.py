"""Structured Streaming pipeline (SURVEY.md §2.9, §3.1).

The reference registers 11 DStream aggregations that each `foreachRDD`
into Redis ZSET counters merged with `zincrby`
(reference: spark/src/main/scala/streaming.scala:93-186). Our engine keeps
the running state where it belongs: streaming `groupBy().agg()` in
**update/complete output mode**, state in Spark's StateStore, offsets in the
checkpoint — giving effective exactly-once where the reference is
at-least-once with possible double counting (streaming.scala:263,163).

One parsed streaming DataFrame → N derived counter views; the SAME builders
(`operators.aggregations`) drive batch and streaming — that is the whole
point of Structured Streaming's unified lineage.

Watermark policy: the reference never expires state (`zincrby` accepts
arbitrarily late keys forever). Spark requires a watermark for update-mode
windowed aggs, so time-keyed views default to a generous 1-hour watermark to
approximate "accept everything"; unbounded key-counters (host/url/...) carry
no watermark at all, exactly like the reference. Documented divergence:
events later than the watermark are dropped rather than merged.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

DEFAULT_WATERMARK = "1 hour"

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


CHANGELOG_KEY = (
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
)


@contextmanager
def rocksdb_state_store(spark: SparkSession, changelog: bool = False):
    """Run the enclosed streaming query on the RocksDB state store — the
    production backend for stateful streaming at scale. The default
    HDFSBackedStateStoreProvider keeps every key's state in executor
    JVM heap maps; at the reference's unbounded-Redis key cardinality
    (streaming.scala:155-173) scaled 100×, heap state is the first
    thing that dies. RocksDB spills to local SSD, snapshots/changelogs
    to the checkpoint, and bounds memory via block-cache — OSS Spark 4
    native, no extra deps.

    The provider is read at QUERY START, so setting the session conf
    around ``.start()`` scopes it to the query; the previous value is
    restored afterwards (the driver's vanilla session must not inherit
    engine conf — the same leak discipline as the arrow-batch tests).
    ``get(key, None)`` returns the EXPLICITLY-SET value or None —
    unlike the no-default form, it does not fall back to the SQLConf
    built-in default — so a previously-unset key is unset again on
    exit rather than pinned to a copy of the default string (review
    finding).

    ``changelog=True`` additionally enables RocksDB CHANGELOG
    checkpointing — per-commit the store uploads only that batch's
    delta (the changelog) instead of a full snapshot, and snapshots
    are produced asynchronously in the background; recovery replays
    the latest snapshot plus subsequent changelogs. At large state
    (100 TB-scale key cardinality) this turns the per-batch
    checkpoint cost from O(state) into O(delta) — the production
    knob for high-cardinality stateful queries. The conf is sticky
    per CHECKPOINT (Spark 4 records the mode in the state metadata
    and supports switching either way on restart); it is read at
    query start, so the same set/restore scoping applies.

    DELIBERATE: the context PINS the changelog mode BOTH ways — with
    ``changelog=False`` it sets the conf to 'false' even if the
    session carries an ambient changelogCheckpointing=true (restored
    on exit). A query run inside this context gets exactly the mode
    the call site names, never an inherited one: the recovery/scale
    experiments A/B the two modes and an ambient override would
    silently invalidate the "no changelog" arm (r7 ADVICE — chosen
    over only-set-when-True)."""
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    prev_cl = spark.conf.get(CHANGELOG_KEY, None)
    spark.conf.set(key, ROCKSDB_PROVIDER)
    spark.conf.set(CHANGELOG_KEY, "true" if changelog else "false")
    try:
        yield
    finally:
        for k, p in ((key, prev), (CHANGELOG_KEY, prev_cl)):
            if p is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, p)

# The reference's Redis key catalog (streaming.scala:176-186): one counter
# view per key, over the parsed log schema.
COUNTER_KEYS = (
    "host",
    "rfc931",
    "username",
    "req_method",
    "url",
    "protocol",
    "status_code",
)


def counter_views(
    parsed: DataFrame, watermark: str = DEFAULT_WATERMARK
) -> dict[str, DataFrame]:
    """All counter views over a parsed (batch OR streaming) log DataFrame.

    Returns the ZSET-equivalent catalog: per-key running counts, the
    per-second time series, the global line/size/traffic totals.
    """
    from logvision_spark.operators.aggregations import (
        count_by,
        line_cnt_expr,
        size_kb_expr,
        traffic_mb_expr,
    )

    views: dict[str, DataFrame] = {}
    ok = parsed.where(F.col("parsed"))

    for key in COUNTER_KEYS:
        views[key] = count_by(ok, F.col(key).alias("member"))

    # per-second event-time counter needs a watermark in update mode.
    # group by the FULL window column (extracting .start inside groupBy
    # severs watermark tracking → append mode rejects + state never ages)
    ts_src = ok.withWatermark("ts", watermark) if ok.isStreaming else ok
    views["datetime"] = (
        ts_src.groupBy(F.window("ts", "1 second"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("window.start").alias("second"), "cnt")
    )

    # global counters: line count, size KB, traffic MB — still ONE
    # aggregation pass, but the expressions are the aggregations-module
    # definitions (one place owns the NULL-bytes rule and constants)
    views["totals"] = parsed.agg(
        line_cnt_expr().alias("line_cnt"),
        size_kb_expr("raw").alias("size_kb"),
        traffic_mb_expr("bytes").alias("traffic_mb"),
    )
    return views


def sliding_window_counts(
    parsed: DataFrame,
    window_len: str = "10 seconds",
    slide: str = "5 seconds",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Sliding-window request counts — a capability the reference lacks
    entirely (its only windows are the log's own 1-second buckets,
    SURVEY.md §2.9); free via `window(ts, len, slide)`. Each event lands
    in len/slide windows; state is bounded by the watermark."""
    src = parsed.where(F.col("parsed"))
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    # group by the FULL window column — the same rule counter_views
    # documents: extracting .start/.end inside groupBy severs watermark
    # tracking, so append mode was rejected and update-mode window state
    # never aged out (review finding, confirmed by execution)
    return (
        src.groupBy(F.window("ts", window_len, slide))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "cnt",
        )
    )


def session_window_counts(
    parsed: DataFrame,
    key: str = "host",
    gap: str = "30 seconds",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Per-key session windows (gap-based): groups a visitor's requests
    into visits — `session_window` keeps state per (key, open session) and
    closes on gap timeout; requires a watermark when streaming."""
    src = parsed.where(F.col("parsed"))
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    sw = F.session_window("ts", gap)
    return src.groupBy(F.col(key), sw).agg(
        F.count(F.lit(1)).alias("requests")
    ).select(
        key,
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        "requests",
    )


def processing_time_uv_counts(
    records: DataFrame,
    user_col: str = "host",
    window_len: str = "10 seconds",
    exact: bool = False,
) -> DataFrame:
    """Processing-time tumbling UV (unique-visitor) counts — parity with
    the reference's v3 Flink job (v3/flink_uv_counter.py:33-37: 10 s
    TumblingProcessingTimeWindows over a per-window distinct-user count).

    Each record is stamped with its ARRIVAL time (current_timestamp at
    micro-batch materialization) and counted in that wall-clock bucket
    regardless of event time — deliberately different from every other
    window in this module, which keys on event time. Processing time
    never arrives late, so no watermark is involved and state for a
    bucket stops growing as soon as the wall clock leaves it.

    Distinct counting uses HLL++ (`approx_count_distinct`) by default —
    streaming-safe and shuffle-light at 100 TB; `exact=True` switches to
    `count_distinct` for batch verification.

    A short watermark on the processing-time column bounds state: wall
    clock is never late, so nothing is ever dropped, but without it a
    long-running update-mode query keeps one StateStore entry (holding
    an HLL sketch) per closed window FOREVER (review finding)."""
    stamped = records.withColumn("_proc_ts", F.current_timestamp())
    if stamped.isStreaming:
        stamped = stamped.withWatermark("_proc_ts", "1 minute")
    agg = F.count_distinct if exact else F.approx_count_distinct
    return (
        stamped.groupBy(F.window("_proc_ts", window_len).alias("win"))
        .agg(agg(F.col(user_col)).alias("uv"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "uv",
        )
    )


def start_counter_query(
    view: DataFrame,
    name: str,
    checkpoint_dir: str | None = None,
    output_mode: str = "complete",
    available_now: bool = False,
) -> StreamingQuery:
    """Materialize one streaming counter view to an in-memory table queryable
    as ``spark.table(name)`` — the engine-native stand-in for the Redis read
    path (app.py zrange/zscore). Production sinks (kafka/parquet/foreachBatch
    to a KV store) hang off the same view via streaming/sinks.py."""
    writer = (
        view.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", f"{checkpoint_dir}/{name}")
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
