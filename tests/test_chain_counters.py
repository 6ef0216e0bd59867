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


# --- Streaming pipe extras: -combiner stage + reporter:counter: -----------


def test_pipe_reduce_with_combiner(spark):
    """The -combiner path must produce the same global aggregate as the
    no-combiner reducer-only path (Streaming -combiner contract:
    map-sorted stream -> combiner -> shuffle on leading key fields ->
    reducer)."""
    from hadoop_20_warehouse_spark.operators import pipe as P

    docs = load_table(spark, SF_DIR, "documents")
    toks = docs.select(
        F.explode(F.split(F.col("text"), r"\s+")).alias("token")
    ).filter(F.col("token") != "")
    agg_awk = (
        "awk -F'\\t' '{c[$1]+=($2==\"\"?1:$2)} END "
        '{for (t in c) printf "%s\\t%d\\n", t, c[t]}\''
    )
    out = P.pipe_reduce(toks, agg_awk, ["token"], combiner=agg_awk)
    got = {
        (r["key"], int(r["value"]))
        for r in P.split_kv(out).collect()
    }
    want = {
        (r["token"], r["cnt"])
        for r in toks.groupBy("token").agg(F.count("*").alias("cnt")).collect()
    }
    assert got == want


def test_pipe_reporter_counters_propagate(spark):
    """Real-subprocess e2e for the reporter:counter: stderr protocol:
    an awk that echoes rows to stdout and one counter line per row to
    stderr; the observation must see the exact row count and the data
    frame must carry only the data lines."""
    from hadoop_20_warehouse_spark.operators import pipe as P

    orders = load_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").cast("string"), F.col("o_orderpriority")
    )
    n = orders.count()
    cmd = (
        "awk -F'\\t' '{print; "
        'print "reporter:counter:wc,rows,1" > "/dev/stderr"}\''
    )
    data, obs = P.pipe_with_counters(
        orders, cmd, counters=[("wc", "rows")]
    )
    rows = data.count()
    assert rows == n
    assert obs.get["wc_rows"] == n
    assert obs.get["reporter_lines"] == n


def test_stream_job_full_wiring(spark):
    """stream_job = mapper (with stderr counters) -> combiner ->
    keyfield-partitioned shuffle -> reducer, in one call. Counter
    totals sum across map tasks; data totals are global counts."""
    from hadoop_20_warehouse_spark.operators import pipe as P

    docs = load_table(spark, SF_DIR, "documents").limit(50)
    lines = docs.select(F.col("text"))
    mapper = (
        "awk '{for (i = 1; i <= NF; i++) printf \"%s\\t1\\n\", $i; "
        'print "reporter:counter:wc,map_lines,1" > "/dev/stderr"}\''
    )
    agg_awk = (
        "awk -F'\\t' '{c[$1]+=($2==\"\"?1:$2)} END "
        '{for (t in c) printf "%s\\t%d\\n", t, c[t]}\''
    )
    data, counters = P.stream_job(lines, mapper, agg_awk, combiner=agg_awk)
    kv = P.split_kv(data)
    got = {
        r.key: int(r.value) for r in kv.collect()
    }
    expected = {
        r.token: r.cnt
        for r in docs.select(
            F.explode(F.split("text", r"\s+")).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got == expected
    crows = {(r.group, r.name): r.amount for r in counters.collect()}
    assert crows == {("wc", "map_lines"): 50}
