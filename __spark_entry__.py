"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001;
``queries()``/``oracle_sql()`` expose the full operator inventory
(hadoop_20_warehouse_spark/inventory.py) for the DuckDB correctness
gate at sf0.01.

Rotation: the driver's CORRECTNESS gate checks the first 50 entries of
``queries()`` in registration order (CORRECTNESS_r01.json covered exactly
the first 50 of 98).  To get every registered query a driver verdict,
``queries()`` orders entries stalest-verdict-first: for each name it
finds the most recent ``CORRECTNESS_r*.json`` round that checked it and
sorts ascending on that round number (never-checked names sort first),
stable on registration order.  This bounds staleness directly — the 50
queries whose latest verdict is oldest re-enter the window every round —
unlike the earlier lifetime-count sort, which could strand a cohort on
six-round-old verdicts behind less-checked-but-fresher names (the r15
judge found 27 queries stuck on r9 verdicts).  The schedule is
deterministic given the committed CORRECTNESS files.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

from hadoop_20_warehouse_spark import inventory  # noqa: E402
from hadoop_20_warehouse_spark import inventory_llm  # noqa: E402,F401
from hadoop_20_warehouse_spark.registry import ORACLES, QUERIES  # noqa: E402

def _last_checked_round() -> dict[str, int]:
    """Most recent CORRECTNESS_r*.json round that checked each query.

    A ``no_oracle`` row does NOT count as a check for a query that NOW
    has an oracle registered: the row predates the oracle, so the
    oracle has never had a driver verdict and the query must rotate
    back into the window (r4 case: ``agg_uniq_approx`` gained its
    invariant oracle after two rows-only rounds).  Queries with no
    oracle registered (streaming etc.) keep counting their rows-only
    checks, so they don't hog the window forever."""
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        if isinstance(rows, dict):
            for name, row in rows.items():
                if (
                    isinstance(row, dict)
                    and row.get("err") == "no_oracle"
                    and name in ORACLES
                ):
                    continue
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def _rotation_order(names: list[str]) -> list[str]:
    latest = _last_checked_round()
    index = {name: i for i, name in enumerate(names)}

    def key(name: str):
        return (
            latest.get(name, 0),  # stalest latest-verdict first (0 = never)
            index[name],          # stable registration order
        )

    return sorted(names, key=key)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing_summary) on /root/testdata/sf0.001."""
    return inventory.QUERIES["pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2,
    least-driver-checked first (see module docstring)."""
    return {name: QUERIES[name] for name in _rotation_order(list(QUERIES))}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted ⇒ rows-only check)."""
    order = _rotation_order(list(QUERIES))
    return {name: ORACLES[name] for name in order if name in ORACLES}
