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


def test_aqe_skew_join_splitting_engages(spark):
    """The 100 TB story leans on 'AQE handles join skew' (SURVEY §4.2,
    session.py skewJoin.enabled) — this pins that the knob actually
    FIRES: a deliberately skewed key distribution (one hot key carrying
    ~95% of the bytes) must make AQE mark the SortMergeJoin as a skew
    join and split the hot partition. Thresholds are scaled down to
    test size (the production defaults are 256MB partitions); the
    MECHANISM under test is identical."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
        )
    }
    try:
        # force SMJ (no broadcast escape), and scale the skew detector
        # down to test data volume: a partition is "skewed" above 64KB
        # and 2x the median, split target 16KB.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16384")
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize", "1024"
        )
        # payload = md5(id): survives the join (it's collected), so the
        # shuffle carries real, incompressible bytes — a constant pad
        # would compress away and never cross the skew threshold
        hot = spark.range(120_000).select(
            F.lit(0).alias("k"), F.md5(F.col("id").cast("string")).alias("v")
        )
        cold = spark.range(6_000).select(
            (F.col("id") % 600 + 1).alias("k"),
            F.md5(F.col("id").cast("string")).alias("v"),
        )
        left = hot.unionByName(cold)
        right = spark.range(601).select(
            F.col("id").alias("k"), F.lit("dim").alias("name")
        )
        joined = left.join(right, "k")
        assert len(joined.collect()) == 126_000
        # the FINAL adaptive plan (post-execution) must carry the skew
        # marker ON the SMJ / AQE shuffle-read nodes themselves — a
        # whole-plan substring match on 'skewed' could vacuously pass
        # (or a format change could silently fail) without any
        # behavior change (ADVICE r5). Known per-version markers:
        # SortMergeJoin prints ', skew=true' on its own line; the AQE
        # read node prints 'AQEShuffleRead skewed' (and in some
        # versions 'coalesced and skewed').
        plan = joined._jdf.queryExecution().executedPlan().toString()
        marked = [
            line
            for line in plan.splitlines()
            if ("SortMergeJoin" in line and "skew=true" in line)
            or ("AQEShuffleRead" in line and "skew" in line)
        ]
        assert marked, (
            f"AQE skew-join splitting did not engage (no skew marker on "
            f"any SortMergeJoin/AQEShuffleRead node):\n{plan}"
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
