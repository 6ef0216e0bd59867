"""ChainMapper/JobControl/Counters analogs (SURVEY.md §2.8/§2.5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_20_warehouse_spark.catalog import load_table
from hadoop_20_warehouse_spark.operators.chain import JobGraph, chain, with_counters
from tests.conftest import SF_DIR


def test_chain_composition(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    pipeline = chain(
        lambda df: df.filter(F.col("l_quantity") > 10),
        lambda df: df.select("l_orderkey", "l_quantity"),
        lambda df: df.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q")),
    )
    out = pipeline(li)
    manual = (
        li.filter(F.col("l_quantity") > 10)
        .select("l_orderkey", "l_quantity")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, manual.collect()))


def test_job_graph_order(spark, tmp_path):
    ran = []
    g = JobGraph()
    g.add("c", lambda: ran.append("c"), depends_on=["a", "b"])
    g.add("a", lambda: ran.append("a"))
    g.add("b", lambda: ran.append("b"), depends_on=["a"])
    g.run()
    assert ran.index("a") < ran.index("b") < ran.index("c")


def test_counters_observe(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    df, obs = with_counters(
        li,
        "job",
        n_rows=F.count(F.lit(1)),
        n_high_qty=F.sum((F.col("l_quantity") > 45).cast("long")),
    )
    total = df.count()  # the action that flows rows through observe
    got = obs.get
    assert got["n_rows"] == total
    assert got["n_high_qty"] == li.filter(F.col("l_quantity") > 45).count()
