"""Golden gate: every inventory query with an oracle must match DuckDB
exactly at the test scale factor — the local mirror of the driver's
CORRECTNESS check (BASELINE.json t2)."""

from __future__ import annotations

import pytest

from hadoop_20_warehouse_spark.inventory import ORACLES, QUERIES
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    assert_matches_oracle(QUERIES[name](spark, sf_dir), duck, ORACLES[name])


def test_all_queries_have_callables():
    assert QUERIES, "inventory must not be empty"
    for name in ORACLES:
        assert name in QUERIES


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
