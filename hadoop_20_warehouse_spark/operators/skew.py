"""Skew mitigation: salted two-phase aggregation (SURVEY.md §4.2 /
risk register).

The reference's only skew answer was speculative re-execution of the
straggler (JobInProgress.findSpeculativeTask:2203) — the hot reduce key
still landed on one reducer. The scalable fix is salting: scatter each
hot key over ``n_salts`` sub-keys, aggregate partially per (key, salt),
then merge per key. Combined with AQE's skew-join splitting (enabled in
session.py) this covers both agg-skew and join-skew.

``salted_agg`` stays deterministic: the salt is a hash of the whole
row's monotonically-increasing id — but since only *mergeable*
aggregates are allowed (sum/count/min/max style), the result is
independent of the salt assignment by construction.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# final-merge functions per partial aggregate
_DEFAULT_MERGE: Callable[[Column], Column] = F.sum


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, Column],
    n_salts: int = 16,
    merges: dict[str, Callable[[Column], Column]] | None = None,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt).agg(partial) →
    groupBy(keys).agg(merge).

    ``aggs``: name → partial aggregate expression (must be mergeable).
    ``merges``: name → final combiner (default ``sum``; pass ``F.min``/
    ``F.max`` for min/max partials).

    The first shuffle spreads a hot key across ``n_salts`` reducers; the
    second handles at most |keys|×n_salts rows. For sum/count/min/max
    the result is exactly the plain groupBy's.
    """
    merges = merges or {}
    salt = (F.spark_partition_id() * 31 + (F.monotonically_increasing_id() % n_salts)) % n_salts
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(*[expr.alias(name) for name, expr in aggs.items()])
    )
    finals = [
        merges.get(name, _DEFAULT_MERGE)(F.col(name)).alias(name) for name in aggs
    ]
    return partial.groupBy(*key_cols).agg(*finals)
