"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001;
``queries()``/``oracle_sql()`` expose the full operator inventory
(hadoop_20_warehouse_spark/inventory.py) for the DuckDB correctness
gate at sf0.01.

Rotation: the driver's CORRECTNESS gate checks the first 50 entries of
``queries()`` in registration order (CORRECTNESS_r01.json covered exactly
the first 50 of 98).  To get every registered query a driver verdict,
``queries()`` orders entries least-driver-checked-first: it counts how
often each name appears across all ``CORRECTNESS_r*.json`` files in the
repo root and sorts ascending (stable on registration order), with names
registered-but-unchecked in round 1 ahead of brand-new names so the full
round-1 inventory is covered by the end of round 2.  The schedule is
deterministic given the committed CORRECTNESS files.
"""

from __future__ import annotations

import glob
import json
import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

from hadoop_20_warehouse_spark import inventory  # noqa: E402
from hadoop_20_warehouse_spark import inventory_llm  # noqa: E402,F401
from hadoop_20_warehouse_spark.registry import ORACLES, QUERIES  # noqa: E402

# The 48 queries registered in round 1 that got no CORRECTNESS_r01 row
# (driver checked only the first 50 of 98).  They outrank queries first
# registered in later rounds so the round-1 inventory closes first.
_R1_UNCHECKED = frozenset({
    "stream_running_stats", "stream_interval_join", "stream_enrich_static",
    "stream_distinct_users", "pipe_field_extract", "pipe_reduce_uniq",
    "multimodal_meta", "multimodal_resize", "multimodal_frame_sample",
    "kv_text_split", "logalyzer_grep_sort", "inverse_map",
    "agg_uniq_capped", "agg_uniq_approx", "reduce_apply_weighted",
    "inverted_index", "join_theta_next_order", "pi_estimate",
    "json_extract_histogram", "agg_salted_skew",
    "sql_shipping_priority", "sql_top_suppliers", "sql_customer_rank",
    "sql_order_priority", "sql_local_supplier_volume",
    "sql_revenue_forecast", "sql_returned_items", "sql_small_qty_revenue",
    "sql_rollup_revenue", "sql_promo_revenue", "sql_status_priority",
    "sql_volume_shipping", "sql_market_share", "sql_product_profit",
    "sql_customer_distribution", "sql_large_volume_customers",
    "sql_discounted_revenue", "sql_waiting_supplier",
    "sql_inactive_customers", "sql_min_cost_supplier",
    "sql_moving_avg_revenue", "sql_ntile_spend", "sql_sessionize_events",
    "sql_event_funnel", "sql_cube_event_stats", "sql_first_last_order",
    "sql_event_retention", "sql_bad_records_skip",
})


def _driver_check_counts() -> dict[str, int]:
    """How many committed CORRECTNESS_r*.json rounds checked each query.

    A ``no_oracle`` row does NOT count as a check for a query that NOW
    has an oracle registered: the row predates the oracle, so the
    oracle has never had a driver verdict and the query must rotate
    back into the window (r4 case: ``agg_uniq_approx`` gained its
    invariant oracle after two rows-only rounds, which left it sorted
    behind the once-checked pool and outside the 50-slot window).
    Queries with no oracle registered (streaming etc.) keep counting
    their rows-only checks, so they don't hog the window forever."""
    counts: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
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
                counts[name] = counts.get(name, 0) + 1
    return counts


def _rotation_order(names: list[str]) -> list[str]:
    counts = _driver_check_counts()
    index = {name: i for i, name in enumerate(names)}

    def key(name: str):
        return (
            counts.get(name, 0),               # least-checked first
            0 if name in _R1_UNCHECKED else 1,  # close the r1 backlog first
            index[name],                        # stable registration order
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
