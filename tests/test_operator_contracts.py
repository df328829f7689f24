"""Contracts pinned after the round-5 self-review of dedup/similarity:
zero-norm cosine, seed-wrap refusal, deterministic batch dedup,
type-generic driver union-find, and band-divisibility errors."""

import pytest
from pyspark.sql import functions as F

from logvision_spark.operators.dedup import (
    MINHASH_SEEDS,
    connected_components,
    minhash_candidate_pairs,
    minhash_signatures_agg,
    streaming_exact_dedup,
)
from logvision_spark.operators.similarity import (
    brute_force_topk,
    cosine,
    near_dup_pairs_cosine,
)


def test_zero_norm_vector_scores_zero_not_nan(spark):
    """A zero vector must score 0.0: NaN compares greater than every
    number in Spark, so an unguarded 0/0 would pass every >= threshold
    filter and sort FIRST in a desc top-k."""
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.9, 0.1])],
        "vec_id long, embedding array<float>",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in near_dup_pairs_cosine(df, threshold=0.5).collect()
    }
    assert (1, 2) not in pairs and (2, 3) not in pairs, pairs
    assert (1, 3) in pairs
    # and the scalar form itself
    row = (
        spark.range(1)
        .select(
            cosine(
                F.lit([0.0, 0.0]).cast("array<double>"),
                F.lit([1.0, 2.0]).cast("array<double>"),
            ).alias("c")
        )
        .first()
    )
    assert row["c"] == 0.0
    # zero vector must rank LAST, not first, in brute-force top-k
    q = spark.createDataFrame([([1.0, 0.0],)], "qe array<float>")
    top = brute_force_topk(df, q, k=1).collect()
    assert top[0]["vec_id"] != 2


def test_minhash_seed_wrap_refused(spark):
    """num_hashes beyond the seed list must raise, not silently reuse
    seeds (duplicate LSH bands add shuffle work at zero recall)."""
    assert len(MINHASH_SEEDS) == len(set(MINHASH_SEEDS)) == 32
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    with pytest.raises(ValueError, match="seeds"):
        minhash_signatures_agg(df, num_hashes=33).collect()
    # 16 hashes (the drop-list setting) must now be 16 DISTINCT signatures
    row = minhash_signatures_agg(df, num_hashes=16).first()
    sigs = [row[f"h{j}"] for j in range(16)]
    assert sigs[8:] != sigs[:8], "seeds wrapped: bands 8-15 duplicate 0-7"


def test_minhash_bands_divisibility_raises(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="divisible"):
        minhash_candidate_pairs(df, num_hashes=8, bands=3)


def test_batch_dedup_keeps_first_occurrence(spark):
    """The batch fallback documents 'first occurrence passes': for rows
    with identical content the survivor must be the earliest ts, not an
    arbitrary partition's pick."""
    rows = [(i, "dup text", f"2024-01-01 00:00:{i:02d}") for i in range(20)]
    df = (
        spark.createDataFrame(rows, "event_id long, text string, ts_s string")
        .select("event_id", "text", F.col("ts_s").cast("timestamp").alias("ts"))
        .repartition(8)
    )
    out = streaming_exact_dedup(df).collect()
    assert len(out) == 1
    assert out[0]["event_id"] == 0, out


def test_connected_components_string_ids_small_graph(spark):
    """The driver union-find finish must not hardcode long ids: a small
    string-id graph used to crash ONLY below the driver threshold."""
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "doc_a string, doc_b string"
    )
    ids = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("x",), ("y",), ("solo",)], "doc_id string"
    )
    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pairs, ids).collect()
    }
    assert labels == {
        "a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "solo": "solo",
    }


def test_parser_survives_unparseable_datetime(spark):
    """A datetime that matches the regex but not the format (single-digit
    day, non-English month) must yield ts=NULL — under ANSI a plain
    to_timestamp aborted the whole job."""
    from logvision_spark.parser import parse_access_log

    lines = spark.createDataFrame(
        [
            ('1.2.3.4 - u [1/Oct/2020:13:55:36 +0800] "GET /x HTTP/1.1" 200 10 "r" "a"',),
            ('1.2.3.4 - u [10/Okt/2020:13:55:36 +0800] "GET /x HTTP/1.1" 200 10 "r" "a"',),
            ('1.2.3.4 - u [10/Oct/2020:13:55:36 +0800] "GET /x HTTP/1.1" 200 10 "r" "a"',),
        ],
        "value string",
    )
    rows = parse_access_log(lines).select("ts", "host").collect()
    assert [r["ts"] is None for r in rows] == [True, True, False]
    assert all(r["host"] == "1.2.3.4" for r in rows)


def test_quality_features_survive_empty_documents(spark):
    """Empty text is a routine raw-corpus input: punct_ratio must yield
    NULL (DuckDB's x/0 semantics), not an ANSI DIVIDE_BY_ZERO abort."""
    from logvision_spark.operators.text import quality_features

    df = spark.createDataFrame(
        [(1, ""), (2, "hello, world!")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in quality_features(df).collect()}
    assert rows[1]["punct_ratio"] is None
    assert rows[2]["punct_ratio"] > 0


def test_stopwords_match_case_insensitively(spark):
    """'The' must count like 'the' for both the quality ratio and
    language ID (capitalized prose scored 0 before — review finding)."""
    from logvision_spark.operators.text import lang_id, quality_features

    df = spark.createDataFrame(
        [(1, "The Cat And The Hat Of It All Was For")],
        "doc_id long, text string",
    )
    q = quality_features(df).first()
    assert q["stopword_ratio"] > 0
    assert lang_id(df).first()["pred_lang"] == "en"


def test_sliding_window_counts_supports_append_mode(spark, sf_dir, tmp_path):
    """Grouping by window.start/.end severed watermark tracking, so
    append mode was rejected (review finding, confirmed): the fixed
    form must run in append mode and emit finalized windows."""
    from logvision_spark.streaming.pipeline import sliding_window_counts

    spark.createDataFrame(
        [(f"2024-01-01 00:00:{i:02d}", True) for i in range(30)],
        "ts_s string, parsed boolean",
    ).select(F.col("ts_s").cast("timestamp").alias("ts"), "parsed").write.parquet(
        str(tmp_path / "in")
    )
    src = (
        spark.readStream.schema("ts timestamp, parsed boolean")
        .parquet(str(tmp_path / "in"))
    )
    q = (
        sliding_window_counts(src, watermark="5 seconds")
        .writeStream.format("memory")
        .queryName("swc_append_probe")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.table("swc_append_probe").collect()
    assert all(r["cnt"] > 0 for r in out)


def test_asof_join_carries_values_from_the_matched_row_only(spark):
    """A NULL value in the true match must stay NULL — filling each
    column independently fabricated a non-null value from an OLDER row
    and attributed it to the matched timestamp (review finding)."""
    from logvision_spark.operators.asof import asof_join

    right = spark.createDataFrame(
        [("k", "2024-01-01 00:00:01", 5.0), ("k", "2024-01-01 00:00:02", None)],
        "key string, ts_s string, v double",
    ).select("key", F.col("ts_s").cast("timestamp").alias("ts"), "v")
    left = spark.createDataFrame(
        [("k", "2024-01-01 00:00:03")], "key string, ts_s string"
    ).select("key", F.col("ts_s").cast("timestamp").alias("ts"))
    r = asof_join(left, right, key="key", value_cols=("v",)).first()
    assert r["ts_asof"] is not None and r["ts_asof"].second == 2
    assert r["v_asof"] is None, "stale value fabricated from the ts=1 row"


def test_asof_join_null_keys_never_match(spark):
    """SQL join semantics: NULL keys match nothing — Window.partitionBy
    grouped the NULLs together and matched them (review finding)."""
    from logvision_spark.operators.asof import asof_join

    right = spark.createDataFrame(
        [(None, "2024-01-01 00:00:01", 9.0)], "key string, ts_s string, v double"
    ).select("key", F.col("ts_s").cast("timestamp").alias("ts"), "v")
    left = spark.createDataFrame(
        [(None, "2024-01-01 00:00:05")], "key string, ts_s string"
    ).select("key", F.col("ts_s").cast("timestamp").alias("ts"))
    r = asof_join(left, right, key="key", value_cols=("v",)).first()
    assert r["v_asof"] is None and r["ts_asof"] is None


def test_geo_enrich_same_key_name_keeps_fact_key(spark):
    """fact_key == dim_key must keep the facts-side key column —
    .drop(name) removed both copies (review finding)."""
    from logvision_spark.operators.joins import geo_enrich

    facts = spark.createDataFrame([("1.2.3.4", 1)], "ip string, n int")
    dim = spark.createDataFrame([("1.2.3.4", "US")], "ip string, country string")
    out = geo_enrich(facts, dim, fact_key="ip", dim_key="ip")
    assert out.columns.count("ip") == 1
    assert out.first()["ip"] == "1.2.3.4"


def test_sql_registry_degenerate_inputs(spark):
    """The SQL surface must agree with the hardened DataFrame surface on
    degenerate inputs: empty text, zero vectors, all-nonpositive groups
    (each previously an ANSI crash or a NaN that outsorts everything)."""
    from logvision_spark.functions.registry import register_sql_functions

    register_sql_functions(spark)
    r = spark.sql(
        "SELECT lv_punct_ratio('') AS pr, "
        "lv_cosine(array(0.0F, 0.0F), array(1.0F, 2.0F)) AS cz"
    ).first()
    assert r["pr"] is None and r["cz"] == 0.0
    g = (
        spark.createDataFrame([(1, -1.0), (1, 0.0)], "k int, v double")
        .groupBy("k")
        .agg(F.expr("lv_pandas_geomean(v)").alias("gm"))
        .first()
    )
    assert g["gm"] is None


def test_grouped_trend_slope_string_key(spark):
    """The grouped-map template must honor the declared generic key
    parameter — the output schema hardcoded `long` (review finding)."""
    from logvision_spark.operators.aggregations import grouped_trend_slope

    df = spark.createDataFrame(
        [("h1", "2024-01-01 00:00:00", 1.0), ("h1", "2024-01-02 00:00:00", 3.0)],
        "host string, ts_s string, value double",
    ).select("host", F.col("ts_s").cast("timestamp").alias("ts"), "value")
    r = grouped_trend_slope(df, key="host").first()
    assert r["host"] == "h1" and abs(r["slope_per_day"] - 2.0) < 1e-9


def test_null_embedding_propagates_null_not_zero(spark):
    """NULL *inputs* must propagate to NULL (SQL/DuckDB semantics) on all
    three cosine surfaces — the zero-norm guard coalesced NULL inputs to
    0.0, silently scoring missing embeddings (review finding)."""
    from logvision_spark.functions.registry import register_sql_functions

    register_sql_functions(spark)
    r = (
        spark.range(1)
        .select(
            cosine(
                F.lit(None).cast("array<double>"),
                F.lit([1.0, 2.0]).cast("array<double>"),
            ).alias("c")
        )
        .first()
    )
    assert r["c"] is None
    s = spark.sql(
        "SELECT lv_cosine(CAST(NULL AS ARRAY<FLOAT>), array(1.0F)) AS c, "
        "lv_pandas_cosine(CAST(NULL AS ARRAY<FLOAT>), array(1.0F)) AS p"
    ).first()
    assert s["c"] is None and s["p"] is None
    # zero-norm still scores 0.0 (not NULL, not NaN) when both present
    z = spark.sql(
        "SELECT lv_pandas_cosine(array(0.0F, 0.0F), array(1.0F, 2.0F)) AS z"
    ).first()
    assert z["z"] == 0.0


def test_ivf_memo_keeps_live_sibling_tags(spark, monkeypatch):
    """The memo must evict only STALE entries (dead session / regenerated
    parquet) — a blanket clear() made alternating tags (ne0/ge3) refit
    KMeans on every call, defeating the memo entirely (review finding)."""
    import logvision_spark.catalog as cat
    from logvision_spark.operators import similarity as sim

    fits = []
    monkeypatch.setattr(
        sim, "fit_ivf", lambda base, n_cells, seed: fits.append(1) or object()
    )
    monkeypatch.setattr(cat, "_table_fingerprint", lambda d, t: "fp1")
    monkeypatch.setattr(cat, "_IVF_MODELS", {})
    base = spark.range(1)
    m_a = cat._ivf_model(base, "/sf", "tag_a", n_cells=4, seed=1)
    m_b = cat._ivf_model(base, "/sf", "tag_b", n_cells=4, seed=1)
    # alternating calls must hit the memo, not refit
    assert cat._ivf_model(base, "/sf", "tag_a", n_cells=4, seed=1) is m_a
    assert cat._ivf_model(base, "/sf", "tag_b", n_cells=4, seed=1) is m_b
    assert len(fits) == 2
    # a regenerated parquet (new fingerprint) evicts both
    monkeypatch.setattr(cat, "_table_fingerprint", lambda d, t: "fp2")
    cat._ivf_model(base, "/sf", "tag_a", n_cells=4, seed=1)
    assert len(fits) == 3 and len(cat._IVF_MODELS) == 1


def test_generated_sql_tolerates_backtick_and_rejects_quote_names(spark):
    """r18 ADVICE hardening of the single-parse builders: identifiers
    interpolated into generated SQL must escape embedded backticks
    (quote_ident), and strings embedded as SQL literals (named_struct
    field names, the bucket width) must fail with a MEANINGFUL error
    instead of a confusing parse failure deep in the expression."""
    import pytest
    from decimal import Decimal

    from logvision_spark.operators.asof import asof_join, asof_join_bucketed
    from logvision_spark.operators.dedup import near_dup_drop_list
    from logvision_spark.operators.similarity import cosine_cols

    # backtick-bearing column names through the cosine SQL twin
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0])], "`a``b` array<float>, `q``e` array<float>"
    )
    got = df.select(cosine_cols("a`b", "q`e").alias("c")).first()["c"]
    assert got == 1.0

    # ...and through the as-of frame constructions (key, ts, value col)
    left = spark.createDataFrame(
        [(1, 10)], "`k``ey` long, `t``s` long"
    ).selectExpr("`k``ey`", "timestamp_micros(`t``s`) AS `t``s`")
    right = spark.createDataFrame(
        [(1, 5, 99)], "`k``ey` long, `t``s` long, `v``al` long"
    ).selectExpr(
        "`k``ey`", "timestamp_micros(`t``s`) AS `t``s`", "`v``al`"
    )
    out = asof_join(
        left, right, key="k`ey", left_ts="t`s", right_ts="t`s",
        value_cols=("v`al",),
    ).first()
    assert out["v`al_asof"] == 99

    # a Decimal threshold must coerce, not fail the ANSI cast
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d")], "doc_id long, text string"
    )
    assert near_dup_drop_list(
        docs, threshold=Decimal("0.5"), n=3, num_hashes=4, bands=2
    ).count() == 1

    # a quoted bucket width fails fast with the boundary error
    with pytest.raises(ValueError, match="bucket width"):
        asof_join_bucketed(left, right, key="k`ey", left_ts="t`s",
                           right_ts="t`s", bucket="1' hour")
    # ...and so does a value_col whose suffixed name embeds a quote
    with pytest.raises(ValueError, match="value_col name"):
        asof_join(left, right, key="k`ey", left_ts="t`s", right_ts="t`s",
                  value_cols=("v`al",), suffix="_a'sof")
