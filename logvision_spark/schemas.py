"""Typed schemas for the engine's tables.

Replaces the reference's stringly-typed 9-field case class
(reference: spark/src/main/scala/streaming.scala:24-32) with a real
StructType — see SURVEY.md §1.3. Parse failures become NULL columns plus a
``parsed`` flag instead of the reference's ``"foo"`` sentinel rows
(streaming.scala:85-88), so downstream filters are `WHERE parsed` rather
than string comparisons at the serving layer (flask/app.py:223 etc.).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Parsed Apache combined-log record. We keep referrer/user_agent, which the
# reference regex captures but drops (streaming.scala:81-83).
ACCESS_LOG_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("rfc931", T.StringType()),
        T.StructField("username", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("req_method", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("protocol", T.StringType()),
        T.StructField("status_code", T.IntegerType()),
        T.StructField("bytes", T.LongType()),
        T.StructField("referrer", T.StringType()),
        T.StructField("user_agent", T.StringType()),
        T.StructField("parsed", T.BooleanType(), nullable=False),
        T.StructField("raw", T.StringType()),
    ]
)

# Scored record appended by the intrusion-detection pipeline (SURVEY.md §1.1
# item 1; learning.scala:114-116): parsed columns + prediction artifacts.
SCORED_LOG_EXTRA = T.StructType(
    [
        T.StructField("probability", T.ArrayType(T.DoubleType())),
        T.StructField("prediction", T.DoubleType()),
    ]
)

# Geo-enrichment dimension fixture (FIXTURES.md §4) replacing the per-IP
# HTTP geocoder calls at flask/app.py:136-147 with a broadcast join.
GEO_DIM_SCHEMA = T.StructType(
    [
        T.StructField("ip", T.StringType()),
        T.StructField("coor_x", T.DoubleType()),
        T.StructField("coor_y", T.DoubleType()),
    ]
)

# URL classification corpus line (learning.scala:13).
URL_CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("label", T.IntegerType()),
    ]
)

# Driver-generated testdata tables (TESTDATA.md). Parquet is self-describing;
# these exist for documentation and for constructing empty/streaming frames.
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

# Multimodal asset table (SURVEY.md §7 phase 6 / north-star extensions):
# opaque binary payload + typed metadata. Decode is stubbed (no codec libs
# in this container) but the Spark-side plumbing is real and tested.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)
