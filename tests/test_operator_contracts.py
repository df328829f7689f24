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
