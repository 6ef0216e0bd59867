"""Query/oracle registry shared by the inventory modules.

``QUERIES`` maps name → callable(spark, sf_dir) → DataFrame (the
engine under test); ``ORACLES`` maps name → DuckDB SQL string (the
correctness oracle). Queries without an oracle get the driver's weaker
rows-only check (genuinely non-SQL-expressible ops only).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optionally its oracle) to the
    inventory. Column names must match between both programs — the
    driver sorts columns by name before hashing."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco
