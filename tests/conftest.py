"""Shared pytest fixtures: one SparkSession per test session, DuckDB
oracle helpers mirroring the driver's comparison (column-name-sorted,
order-insensitive, exact values)."""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_20_warehouse_spark.catalog import TABLE_NAMES  # noqa: E402
from hadoop_20_warehouse_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_session()
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    yield con
    con.close()


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Driver-style normalization: sort columns by name, then rows by
    all columns, reset index."""
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), ignore_index=True)
    return pdf.reset_index(drop=True)


def assert_matches_oracle(spark_df, duck_con, sql: str, *, approx_cols: tuple = ()):
    """Compare a Spark result with the DuckDB oracle result exactly
    (the driver hashes values — exact match is the bar)."""
    got = normalize(spark_df.toPandas())
    want = normalize(duck_con.sql(sql).df())
    assert list(got.columns) == list(want.columns), (
        f"column mismatch: spark={list(got.columns)} duckdb={list(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} duckdb={len(want)}"
    # dtype drift (e.g. DuckDB HUGEINT sums → float64) would break the
    # driver's value hash even when values print alike — catch it here.
    mismatched = [
        (c, str(got[c].dtype), str(want[c].dtype))
        for c in got.columns
        if str(got[c].dtype) != str(want[c].dtype)
    ]
    assert not mismatched, f"dtype mismatch (spark vs duckdb): {mismatched}"
    for col in got.columns:
        g, w = got[col], want[col]
        if col in approx_cols:
            pd.testing.assert_series_equal(
                g.astype("float64"), w.astype("float64"), check_names=False,
                rtol=1e-9, atol=1e-12,
            )
        else:
            try:
                pd.testing.assert_series_equal(
                    g, w, check_names=False, check_dtype=False, check_exact=True
                )
            except AssertionError as e:
                diff = (g != w) & ~(g.isna() & w.isna())
                sample = pd.DataFrame({"spark": g[diff], "duckdb": w[diff]}).head(5)
                raise AssertionError(f"column {col!r} differs:\n{sample}\n{e}") from None
