"""Driver contract for the spark-graft builder (PySpark target).

Thin re-export of the engine's query catalog (logvision_spark/catalog.py):
one (PySpark builder, DuckDB oracle) pair per implemented operator from
SURVEY.md §2 plus the training-data-pipeline extensions.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the driver may import this module by file path; make the package
# resolvable regardless of how we were loaded
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from logvision_spark import catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    return catalog.CATALOG["q1_pricing_summary"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted ⇒ rows-only check)."""
    return catalog.oracle_sql()
