"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001;
``queries()``/``oracle_sql()`` expose the full operator inventory
(hadoop_20_warehouse_spark/inventory.py) for the DuckDB correctness
gate at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hadoop_20_warehouse_spark import inventory  # noqa: E402
from hadoop_20_warehouse_spark import inventory_llm  # noqa: E402,F401
from hadoop_20_warehouse_spark.registry import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing_summary) on /root/testdata/sf0.001."""
    return inventory.QUERIES["pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted ⇒ rows-only check)."""
    return dict(ORACLES)
