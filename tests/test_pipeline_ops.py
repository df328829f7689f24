"""Training-pipeline operator tests: grouped-map regression, sequence
packing, and time-series gap fill — properties beyond the catalog's
oracle equality (which test_catalog_vs_duckdb already mirrors)."""

from __future__ import annotations

from pyspark.sql import functions as F

from logvision_spark.operators.aggregations import grouped_trend_slope
from logvision_spark.operators.text import pack_token_bins
from logvision_spark.sources.readers import load_table


def test_trend_slope_matches_jvm_regr_slope(spark, sf_dir):
    """The applyInPandas fit must agree with Spark's own built-in
    regr_slope (the pure-JVM production path it validates) to the same
    6-decimal contract as the DuckDB oracle."""
    ev = load_table(spark, "events", sf_dir)
    pandas_fit = {
        r["user_id"]: r["slope_per_day"]
        for r in grouped_trend_slope(ev).collect()
    }
    jvm = {
        r["user_id"]: r["s"]
        for r in ev.select(
            "user_id",
            "value",
            (F.col("ts").cast("double") / F.lit(86400.0)).alias("x"),
        )
        .groupBy("user_id")
        .agg(F.round(F.expr("regr_slope(value, x)"), 6).alias("s"))
        .collect()
    }
    assert pandas_fit == jvm


def test_trend_slope_degenerate_group_is_null(spark):
    """A single-event group (zero x-variance) must yield NULL, not a
    division error — same as regr_slope's NULL contract."""
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 5.0),
         (2, "2024-01-01 00:00:00", 1.0),
         (2, "2024-01-02 00:00:00", 3.0)],
        ["user_id", "ts", "value"],
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r["user_id"]: r["slope_per_day"] for r in grouped_trend_slope(df).collect()}
    assert got[1] is None
    assert got[2] == 2.0  # +2 value over exactly one day


def test_pack_token_bins_budget_alignment(spark, sf_dir):
    """Bins are exclusive-prefix-sum aligned: within every shard the doc
    order is id order, bin ids are non-decreasing, and each doc's bin
    equals its predecessor-sum divided by the budget. Also: no bin is
    left empty between used bins (contiguity)."""
    docs = load_table(spark, "documents", sf_dir)
    rows = pack_token_bins(docs, budget=512, num_shards=8).collect()
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) == set(range(8))
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r["doc_id"])
        prior = 0
        bins = []
        for r in rs:
            assert r["shard"] == r["doc_id"] % 8
            assert r["bin_in_shard"] == prior // 512, (shard, r)
            prior += r["n_tok"]
            bins.append(r["bin_in_shard"])
        assert bins == sorted(bins)
        assert set(bins) == set(range(max(bins) + 1))  # contiguous


def test_gap_fill_spine_is_dense(spark, sf_dir):
    from logvision_spark.catalog import CATALOG

    out = CATALOG["ts_gap_fill"].builder(spark, sf_dir).toPandas()
    assert out["minute"].is_unique
    import pandas as pd

    minutes = pd.to_datetime(out["minute"]).sort_values()
    deltas = minutes.diff().dropna().unique()
    assert list(deltas) == [pd.Timedelta(minutes=1)]  # no holes, no dupes
    filled = out[out["gap_filled"]]
    assert (filled["cnt"] == 0).all()
    assert len(filled) > 0  # the fixture really has gaps


def test_chunk_windows_reconstruction(spark):
    """Chunks must tile the document: stride-aligned starts, overlap of
    size-stride tokens between consecutive chunks, and concatenating the
    non-overlapping prefixes reconstructs the original text."""
    from logvision_spark.operators.text import chunk_windows

    text = " ".join(f"w{i}" for i in range(70))  # 70 tokens → starts 0,24,48
    df = spark.createDataFrame([(1, text), (2, "a b"), (3, "x")], ["doc_id", "text"])
    rows = chunk_windows(df, size=32, stride=24).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_id"]] = r
    c1 = by_doc[1]
    assert sorted(c1) == [0, 1, 2]
    assert c1[0]["n_tokens"] == 32 and c1[1]["n_tokens"] == 32
    assert c1[2]["n_tokens"] == 70 - 48
    # overlap: last 8 tokens of chunk k = first 8 of chunk k+1
    assert c1[0]["chunk_text"].split()[24:] == c1[1]["chunk_text"].split()[:8]
    # reconstruction from stride-prefixes + final tail
    recon = (
        c1[0]["chunk_text"].split()[:24]
        + c1[1]["chunk_text"].split()[:24]
        + c1[2]["chunk_text"].split()
    )
    assert " ".join(recon) == text
    # short docs: single chunk, full text
    assert by_doc[2][0]["chunk_text"] == "a b" and by_doc[2][0]["n_tokens"] == 2
    assert by_doc[3][0]["chunk_text"] == "x"


def test_latest_event_ts_tie_broken_by_id(spark):
    """Two events on the same timestamp must resolve to the higher
    event_id on every engine — the tie-break the oracle encodes."""
    from pyspark.sql import functions as F

    from logvision_spark.catalog import CATALOG  # noqa: F401  (shape parity)

    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 7, "a"), (2, "2024-01-01 10:00:00", 7, "b"),
         (3, "2024-01-01 09:00:00", 7, "c")],
        ["event_id", "ts", "user_id", "event_type"],
    ).withColumn("ts", F.to_timestamp("ts"))
    order = F.concat_ws(
        "|",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    got = df.groupBy("user_id").agg(
        F.max_by("event_id", order).alias("last_id"),
        F.max_by("event_type", order).alias("last_type"),
    ).collect()[0]
    assert got["last_id"] == 2 and got["last_type"] == "b"


def test_spread_small_input_is_adaptive(spark):
    """r19 optimization pin for dedup._spread_small_input (guide §2.5):
    a sub-parallelism input is round-robin spread to the session's
    default parallelism so per-row stages (the minhash Arrow fold) stop
    serializing in one scan task; an input already at or above the
    parallelism passes through UNCHANGED (the no-op-at-scale contract);
    row multiset is preserved."""
    from logvision_spark.operators.dedup import (
        _spread_small_input,
        minhash_signatures_rows,
    )

    target = spark.sparkContext.defaultParallelism
    small = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2} w{i+3}") for i in range(50)],
        ["doc_id", "text"],
    ).coalesce(1)
    spread = _spread_small_input(small)
    assert spread.rdd.getNumPartitions() == target
    assert sorted(map(tuple, spread.collect())) == sorted(
        map(tuple, small.collect())
    )

    wide = small.repartition(target + 3)
    assert _spread_small_input(wide) is wide

    # the portable MinHash Arrow pass rides the spread: same rows as an
    # unspread input, more than one task on a multi-core session
    sig_small = sorted(map(tuple, minhash_signatures_rows(small, n=2).collect()))
    sig_wide = sorted(map(tuple, minhash_signatures_rows(wide, n=2).collect()))
    assert sig_small == sig_wide
