"""Mirror of the driver's correctness gate: run every catalog query on
Spark AND its DuckDB oracle, compare row-count + schema-compatible values
order-insensitively (columns sorted by name, rows sorted by all columns).

Catching an oracle mismatch here is strictly cheaper than in the driver's
CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from logvision_spark.catalog import CATALOG


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        # unify int flavors (duckdb int32 vs spark int64 etc.)
        if pd.api.types.is_integer_dtype(out[c]):
            out[c] = out[c].astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(out[c]):
            # unify resolution: spark → ns, duckdb → us; NaT-safe
            out[c] = pd.to_datetime(out[c]).astype("datetime64[ns]")
    return out.sort_values(by=list(out.columns), ignore_index=True)


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(duck_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(duck_pdf.columns)}"
    )
    s, d = normalize(spark_pdf), normalize(duck_pdf)
    for c in s.columns:
        if pd.api.types.is_float_dtype(s[c]) or pd.api.types.is_float_dtype(d[c]):
            sv, dv = s[c].astype(float).to_numpy(), d[c].astype(float).to_numpy()
            for i, (a, b) in enumerate(zip(sv, dv)):
                if math.isnan(a) and math.isnan(b):
                    continue
                assert a == b, f"{name}.{c}[{i}]: spark {a!r} != oracle {b!r}"
        else:
            pd.testing.assert_series_equal(
                s[c], d[c], check_dtype=False, obj=f"{name}.{c}"
            )


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_catalog_query_matches_oracle(spark, duck, sf_dir, name):
    entry = CATALOG[name]
    sdf = entry.builder(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if entry.oracle is None:
        assert len(spark_pdf) >= 0  # rows-only check, like the driver
        return
    duck_pdf = duck.execute(entry.oracle).df()
    assert_frames_match(spark_pdf, duck_pdf, name)
