"""Bucketed no-shuffle joins (CompositeInputFormat parity) and salted
skew aggregation."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from hadoop_20_warehouse_spark.catalog import load_table
from hadoop_20_warehouse_spark.plans.explain import count_exchanges, physical_plan
from hadoop_20_warehouse_spark.sources.bucketing import bucketed_join, write_bucketed
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    # spark.sql.warehouse.dir is static; place table data via explicit
    # path options instead (metadata lives in the in-memory catalog)
    wh = str(tmp_path_factory.mktemp("warehouse"))
    orders = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    write_bucketed(
        orders, "orders_b", ["o_orderkey"], 8, path=f"{wh}/orders_b"
    )
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        ["o_orderkey"],
        8,
        path=f"{wh}/lineitem_b",
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_no_shuffle(spark, bucketed_tables):
    left, right = bucketed_tables
    # disable auto-broadcast so the join strategy is SMJ over buckets,
    # not a broadcast that would trivially avoid the exchange
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, left, right, ["o_orderkey"])
        plan = physical_plan(joined)
        assert "SortMergeJoin" in plan
        assert count_exchanges(joined) == 0, f"bucketed join must not shuffle:\n{plan}"
        # and it is correct
        expected = (
            load_table(spark, SF_DIR, "orders")
            .join(
                load_table(spark, SF_DIR, "lineitem").withColumnRenamed(
                    "l_orderkey", "o_orderkey"
                ),
                on="o_orderkey",
            )
            .count()
        )
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_salted_aggregation_matches_plain(spark):
    """Two-phase salted aggregation for skewed keys (SURVEY.md risk
    register): partial agg on (key, salt) then final on key — same
    result, bounded per-task key volume."""
    from hadoop_20_warehouse_spark.operators.skew import salted_agg

    # skewed frame: one hot key with 50k rows, many cold keys
    hot = spark.range(50_000).select(
        F.lit("hot").alias("k"), F.col("id").alias("v")
    )
    cold = spark.range(5_000).select(
        F.concat(F.lit("c"), (F.col("id") % 500).cast("string")).alias("k"),
        F.col("id").alias("v"),
    )
    df = hot.unionByName(cold)
    got = salted_agg(
        df, ["k"], {"total": F.sum("v"), "n": F.count(F.lit(1))}, n_salts=16
    )
    want = df.groupBy("k").agg(F.sum("v").alias("total"), F.count(F.lit(1)).alias("n"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
