"""Pins for the r18 single-parse (F.expr / selectExpr) rewrites: each hot
expression tree that moved from py4j Column construction to one SQL parse
must stay value- AND schema-identical to the reference Column form it
replaced. The reference forms below are frozen copies of the pre-rewrite
code — if a parse-side edit drifts the semantics (operator precedence,
literal typing, NULL arms, frame bounds), these fail while the coarser
oracle fixtures might still pass by luck.

Edge corpus: empty/one-token/exactly-n docs, doubled separators, a NULL
text, unicode — the cases where split/element_at/when guards differ
soonest.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from logvision_spark.operators.dedup import (
    POLY_MOD,
    _seed,
    exploded_shingles,
    minhash_exact_groups,
)


@pytest.fixture(scope="module")
def edge_docs(spark):
    rows = [
        (1, ""),
        (2, "a"),
        (3, "a b c"),
        (4, "a  b   c d"),
        (5, "x y z w "),
        (6, "héllo wörld foo bar"),
        (7, None),
        (8, "a b c a b c a b c"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _ref_exploded_shingles(df, id_col, text_col, n, outer=False, carry=()):
    """Frozen pre-r18 Column-form exploded_shingles."""
    staged = df.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        F.split(F.col(text_col), " ").alias("_toks"),
    )
    tk = F.col("_toks")
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(tk) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(tk, i + j + 1) for j in range(n)]
            ),
        )
    )
    guarded = F.when(F.size(tk) >= n, shingles).otherwise(
        F.array().cast("array<string>")
    )
    exploder = F.explode_outer if outer else F.explode
    return staged.select(id_col, *carry, exploder(guarded).alias("shingle"))


@pytest.mark.parametrize("n,outer", [(1, False), (2, False), (3, True), (8, False)])
def test_exploded_shingles_matches_column_form(spark, edge_docs, n, outer):
    got = exploded_shingles(edge_docs, "doc_id", "text", n, outer=outer)
    ref = _ref_exploded_shingles(edge_docs, "doc_id", "text", n, outer=outer)
    assert got.schema == ref.schema
    assert got.exceptAll(ref).count() == 0
    assert ref.exceptAll(got).count() == 0


def test_minhash_exact_groups_matches_column_form(spark, edge_docs):
    """Frozen pre-r18 Column-form of the signature+window pipeline."""
    d = edge_docs.where(F.col("text").isNotNull())
    pre = d.select(
        F.col("doc_id"), F.xxhash64(F.col("text")).alias("_chash"), F.col("text")
    )
    sh = _ref_exploded_shingles(
        pre, "doc_id", "text", 3, outer=True, carry=("_chash",)
    )
    h = F.pmod(F.xxhash64(F.col("shingle")), F.lit(POLY_MOD))
    hashed = sh.select(F.col("doc_id"), F.col("_chash"), h.alias("_h"))
    aggs = []
    for j in range(8):
        a, b = _seed(j)
        aggs.append(F.min((F.col("_h") * a + b) % POLY_MOD).alias(f"h{j}"))
    sig = hashed.groupBy("doc_id", "_chash").agg(*aggs)
    sig_cols = [f"h{j}" for j in range(8)]
    w = Window.partitionBy(*sig_cols, "_chash")
    ref = sig.select(
        F.col("doc_id"), F.min("doc_id").over(w).alias("group_min_id")
    )
    got = minhash_exact_groups(d, "doc_id", "text")
    assert got.schema == ref.schema
    assert got.exceptAll(ref).count() == 0
    assert ref.exceptAll(got).count() == 0


def test_asof_nearest_pick_matches_column_form(spark):
    """The SQL CASE pick (asof._nearest_pick_sql) against the frozen
    Column-form when()/unix_micros tree, on packs covering every arm:
    both present (closer back / closer fwd / exact tie), back-only,
    fwd-only, neither."""
    from logvision_spark.operators.asof import _nearest_pick_sql

    rows = [
        # (_ts, back_rts, fwd_rts)
        ("2024-03-01 00:10:00", "2024-03-01 00:09:00", "2024-03-01 00:12:00"),
        ("2024-03-01 00:10:00", "2024-03-01 00:07:00", "2024-03-01 00:11:00"),
        ("2024-03-01 00:10:00", "2024-03-01 00:09:00", "2024-03-01 00:11:00"),
        ("2024-03-01 00:10:00", "2024-03-01 00:09:00", None),
        ("2024-03-01 00:10:00", None, "2024-03-01 00:12:00"),
        ("2024-03-01 00:10:00", None, None),
    ]
    df = spark.createDataFrame(
        rows, "ts string, bts string, fts string"
    ).selectExpr(
        "CAST(ts AS TIMESTAMP) AS _ts",
        "named_struct('_rts', CAST(bts AS TIMESTAMP)) AS _fb",
        "named_struct('_rts', CAST(fts AS TIMESTAMP)) AS _ff",
    ).selectExpr(
        "*",
        # normalize the NULL-rts packs to NULL packs like the fills yield
        "CASE WHEN _fb._rts IS NULL THEN NULL ELSE _fb END AS _fbn",
        "CASE WHEN _ff._rts IS NULL THEN NULL ELSE _ff END AS _ffn",
    ).selectExpr("_ts", "_fbn AS _fb", "_ffn AS _ff")

    l_us = F.unix_micros(F.col("_ts"))
    back_us = F.unix_micros(F.col("_fb")["_rts"])
    fwd_us = F.unix_micros(F.col("_ff")["_rts"])
    use_back = F.col("_fb")["_rts"].isNotNull() & (
        F.col("_ff")["_rts"].isNull() | ((l_us - back_us) <= (fwd_us - l_us))
    )
    ref_pick = F.when(use_back, F.col("_fb")).otherwise(F.col("_ff"))
    ref = [r[0] for r in df.select(ref_pick["_rts"]).collect()]
    got = [
        r[0]
        for r in df.selectExpr(
            f"{_nearest_pick_sql('_fb', '_ff')}._rts"
        ).collect()
    ]
    assert got == ref
