"""SQL function surface tests: registered functions agree with their
DataFrame-API builders and the pandas examples vectorize correctly."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from logvision_spark.functions import register_sql_functions
from logvision_spark.operators.similarity import cosine
from logvision_spark.operators.text import fingerprint
from logvision_spark.sources.readers import load_table


@pytest.fixture(scope="module", autouse=True)
def registered(spark):
    register_sql_functions(spark)


def test_parse_ok_from_sql(spark):
    spark.createDataFrame(
        [('1.2.3.4 - - [10/Oct/2020:13:55:36 +0000] "GET /a HTTP/1.1" 200 5',),
         ("garbage",)],
        ["line"],
    ).createOrReplaceTempView("raw_lines")
    rows = spark.sql("SELECT line, lv_parse_ok(line) AS ok FROM raw_lines").collect()
    got = {r["line"][:7]: r["ok"] for r in rows}
    assert got["1.2.3.4"] is True and got["garbage"] is False


def test_fingerprint_sql_equals_dataframe(spark, sf_dir):
    d = load_table(spark, "documents", sf_dir).limit(50)
    d.createOrReplaceTempView("docs50")
    via_sql = {
        r["doc_id"]: r["fp"]
        for r in spark.sql("SELECT doc_id, lv_fingerprint(text) AS fp FROM docs50").collect()
    }
    via_df = {
        r["doc_id"]: r["fp"]
        for r in d.select("doc_id", fingerprint(F.col("text")).alias("fp")).collect()
    }
    assert via_sql == via_df


def test_cosine_sql_equals_dataframe_and_pandas(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir).limit(20)
    emb.createOrReplaceTempView("emb20")
    sql_rows = spark.sql(
        """
        SELECT a.vec_id ia, b.vec_id ib,
               lv_cosine(a.embedding, b.embedding) AS c_sql,
               lv_pandas_cosine(a.embedding, b.embedding) AS c_pd
        FROM emb20 a JOIN emb20 b ON a.vec_id < b.vec_id
        """
    ).collect()
    a = emb.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("eb"))
    df_rows = {
        (r["ia"], r["ib"]): r["c"]
        for r in a.join(b, F.col("ia") < F.col("ib"))
        .select("ia", "ib", cosine(F.col("ea"), F.col("eb")).alias("c"))
        .collect()
    }
    assert sql_rows
    for r in sql_rows:
        assert r["c_sql"] == df_rows[(r["ia"], r["ib"])]  # same JVM expression
        assert math.isclose(r["c_pd"], r["c_sql"], rel_tol=1e-12)  # numpy path


def test_pandas_geomean_grouped(spark):
    df = spark.createDataFrame(
        [("a", 2.0), ("a", 8.0), ("b", 3.0)], ["k", "v"]
    )
    df.createOrReplaceTempView("gm")
    got = {
        r["k"]: r["g"]
        for r in spark.sql("SELECT k, lv_pandas_geomean(v) AS g FROM gm GROUP BY k").collect()
    }
    assert math.isclose(got["a"], 4.0, rel_tol=1e-12)
    assert math.isclose(got["b"], 3.0, rel_tol=1e-12)


def test_sql_functions_stay_jvm_side(spark, sf_dir):
    """The lv_* SQL UDFs (except pandas ones) must not add Python nodes."""
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("docs_all")
    df = spark.sql("SELECT doc_id, lv_fingerprint(text) f, lv_token_count(text) t FROM docs_all")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
