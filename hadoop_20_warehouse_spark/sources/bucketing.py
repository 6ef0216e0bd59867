"""Bucketed tables — the real analog of the reference's map-side
merge join (SURVEY.md §2.4/§4.2).

CompositeInputFormat (mapred/join/CompositeInputFormat.java:48) could
join n sources with ZERO shuffle because the user guaranteed all
sources were sorted by key and identically partitioned; the framework
then stream-merged them map-side. Spark's equivalent guarantee is a
bucketed, sorted table: ``bucketBy(n, key).sortBy(key)`` at write time
makes every subsequent equi-join/aggregation on that key shuffle-free
(Exchange elided; SortMergeJoin reads buckets directly).

At 100 TB this is the difference between re-shuffling the fact table
per query and paying the layout cost once at ingest — exactly the
trade the reference's warehouse made by keeping sources co-sorted.

Bucketed tables must go through the session catalog (``saveAsTable``);
set ``spark.sql.warehouse.dir`` (session factory does) or pass
``path`` to place data explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Write a bucketed+sorted catalog table. ``n_buckets`` should be
    sized so one bucket of the largest co-joined table fits an
    executor's memory at target scale."""
    w = (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
        .format("parquet")
    )
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket key —
    plans as SortMergeJoin with NO Exchange on either side (verify with
    plans.explain.count_exchanges == 0), the CompositeInputFormat
    contract reproduced."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
