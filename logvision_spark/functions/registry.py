"""SQL function surface: makes the engine's column-level operators callable
from `spark.sql(...)` — the reference's only "SQL surface" is the string
predicate in `where("prediction = 0.0")` (streaming.scala:198-200); we
expose the full function library to SQL users.

Most registrations are **SQL UDFs** (CREATE TEMPORARY FUNCTION ... RETURN
<expr>): they expand to the same built-in Catalyst expressions the
DataFrame API uses, so SQL callers stay on the JVM fast path — no Python
round-trip. The two `lv_pandas_*` functions are deliberately Python
(Arrow-vectorized) to provide the scalar-pandas_udf and grouped-agg-UDAF
capability surface.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from logvision_spark.operators.dedup import poly_hash
from logvision_spark.operators.similarity import cosine
from logvision_spark.operators.text import (
    bpe_like_token_count,
    punct_ratio,
    stopword_ratio,
    token_count,
)
from logvision_spark.parser import COMBINED_LOG_PATTERN

__all__ = [
    "register_sql_functions",
    "poly_hash",
    "cosine",
    "token_count",
    "bpe_like_token_count",
    "punct_ratio",
    "stopword_ratio",
]


def _sql_quote_regex(pattern: str) -> str:
    """Escape a regex for embedding in a single-quoted Spark SQL literal
    (backslashes doubled, quotes doubled)."""
    return pattern.replace("\\", "\\\\").replace("'", "''")


def register_sql_functions(spark: SparkSession) -> None:
    """Install the engine's function library for SQL use.

    JVM expression-backed SQL UDFs:
      lv_parse_ok(line)        — combined-log validity test
      lv_token_count(str)      lv_bpe_count(str)
      lv_punct_ratio(str)      lv_fingerprint(str)
      lv_cosine(arr, arr)
    Arrow-vectorized Python:
      lv_pandas_cosine(arr, arr)  lv_pandas_geomean(double)
    """
    pat = _sql_quote_regex(COMBINED_LOG_PATTERN)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION lv_parse_ok(line STRING) "
        "RETURNS BOOLEAN RETURN line RLIKE '" + pat + "'"
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION lv_token_count(t STRING)
        RETURNS INT RETURN size(split(t, ' '))
        """
    )
    spark.sql(
        r"""
        CREATE OR REPLACE TEMPORARY FUNCTION lv_bpe_count(t STRING)
        RETURNS INT
        RETURN size(regexp_extract_all(t, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]', 0))
        """
    )
    spark.sql(
        r"""
        CREATE OR REPLACE TEMPORARY FUNCTION lv_punct_ratio(t STRING)
        RETURNS DOUBLE
        RETURN try_divide(
               CAST(length(regexp_replace(t, '[A-Za-z0-9\\s]', '')) AS DOUBLE),
               length(t))
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION lv_fingerprint(t STRING)
        RETURNS BIGINT
        RETURN aggregate(filter(split(t, ''), c -> c != ''),
                         CAST(7 AS BIGINT),
                         (acc, c) -> (acc * 31 + ascii(c)) % 1000000007)
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION lv_cosine(a ARRAY<FLOAT>, b ARRAY<FLOAT>)
        RETURNS DOUBLE
        RETURN CASE WHEN a IS NOT NULL AND b IS NOT NULL THEN
               coalesce(try_divide(
               aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                         CAST(0.0 AS DOUBLE), (acc, v) -> acc + v),
               sqrt(aggregate(transform(a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                               CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))
              * sqrt(aggregate(transform(b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                               CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))), 0.0D)
               END
        """
    )

    @F.pandas_udf(DoubleType())
    def lv_pandas_cosine(a: pd.Series, b: pd.Series) -> pd.Series:
        import numpy as np

        def cos(u, v):
            if u is None or v is None:  # NULL propagates (matches lv_cosine)
                return None
            u = np.asarray(u, dtype=float)
            v = np.asarray(v, dtype=float)
            nu, nv = np.linalg.norm(u), np.linalg.norm(v)
            return float(u.dot(v) / (nu * nv)) if nu and nv else 0.0

        return pd.Series([cos(u, v) for u, v in zip(a, b)])

    spark.udf.register("lv_pandas_cosine", lv_pandas_cosine)

    @F.pandas_udf(DoubleType())
    def lv_pandas_geomean(v: pd.Series) -> float:
        import numpy as np

        x = v[v > 0]
        # None (NULL), never NaN: NaN sorts ABOVE every number in Spark,
        # so a degenerate all-nonpositive group would rank FIRST in any
        # desc ordering and pass >= thresholds (review finding)
        return float(np.exp(np.log(x).mean())) if len(x) else None

    spark.udf.register("lv_pandas_geomean", lv_pandas_geomean)
