"""logvision_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query & data-processing capabilities of
the reference system (xander-wang/logvision: web-log analytics + intrusion
detection) as an idiomatic PySpark DataFrame / SQL / Structured Streaming
engine, extended with the operators a large-scale training-data pipeline
needs (dedup, similarity search, text analysis, multimodal plumbing).

Design rules (see SURVEY.md §1.3/§4):
- Declare plans with the DataFrame/SQL API; let Catalyst + Tungsten pick the
  physical strategy (predicate pushdown, partial aggregation, broadcast vs
  sort-merge joins, AQE skew handling).
- Built-in ``pyspark.sql.functions`` in every hot path; Pandas UDFs only
  where built-ins genuinely can't express the semantics.
- One streaming DataFrame, N derived views — state lives in Spark's
  StateStore, not an external KV store.
"""

__version__ = "0.1.0"

from logvision_spark.session import get_spark  # noqa: F401
