"""scatter() contract (session.py): the NLineInputFormat analog must
spread narrow inputs, honor explicit partitioning, leave big/unknown
frames untouched via the STATS path (no driver-side plan compile), and
fall back to the RDD probe only on py4j failure — loudly."""

from __future__ import annotations

import logging

from pyspark.sql import functions as F

from hadoop_20_warehouse_spark.catalog import load_table
from hadoop_20_warehouse_spark.session import scatter
from tests.conftest import SF_DIR


def test_scatter_spreads_single_split_input(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = scatter(docs, min_partitions=8)
    assert out.rdd.getNumPartitions() >= 8
    assert out.count() == docs.count()


def test_scatter_honors_explicit_repartition(spark):
    docs = load_table(spark, SF_DIR, "documents").repartition(3)
    assert scatter(docs, min_partitions=8) is docs


def test_scatter_stats_path_no_fallback(spark, caplog):
    """Scan, projection, filter, AND post-shuffle aggregate frames must
    all resolve through the plan-stats probe — zero fallback warnings.
    The post-shuffle case is the one the r1 fix left untested: its
    stats are estimates (or unknown = Long.Max -> treated large), and
    the probe must handle that without raising."""
    docs = load_table(spark, SF_DIR, "documents")
    frames = [
        docs,
        docs.select("doc_id", "lang"),
        docs.filter(F.col("doc_id") > 10),
        docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")),
        docs.join(docs.select("doc_id"), on="doc_id"),
    ]
    with caplog.at_level(logging.WARNING, "hadoop_20_warehouse_spark.session"):
        for f in frames:
            scatter(f)
    assert not [r for r in caplog.records if "scatter" in r.getMessage()], (
        caplog.text
    )


def test_scatter_fallback_fires_loudly_on_py4j_failure(spark, caplog):
    """If the py4j internals drift (queryExecution API change), scatter
    must still work via the RDD probe AND warn — a silent fallback
    reintroduces a per-call driver-side plan compile invisibly."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id")

    class _Broken:
        """Fails the stats probe (queryExecution) but delegates the
        rest, like a partial py4j API drift would."""

        def __init__(self, real):
            self._real = real

        def __getattr__(self, name):
            if name == "queryExecution":
                raise RuntimeError("simulated py4j drift")
            return getattr(self._real, name)

    real = docs._jdf
    docs._jdf = _Broken(real)
    try:
        with caplog.at_level(
            logging.WARNING, "hadoop_20_warehouse_spark.session"
        ):
            out = scatter(docs, min_partitions=8)
    finally:
        docs._jdf = real
    assert [r for r in caplog.records if "falling back" in r.getMessage()]
    assert out.rdd.getNumPartitions() >= 8
