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


def test_stream_job_no_combiner_e2e(spark):
    """The combiner is optional (StreamJob only wires -combiner when
    given); the mapper->shuffle->reducer path must produce identical
    global aggregates without one."""
    from hadoop_20_warehouse_spark.operators import pipe as P

    docs = load_table(spark, SF_DIR, "documents").limit(50)
    lines = docs.select(F.col("text"))
    mapper = "awk '{for (i = 1; i <= NF; i++) printf \"%s\\t1\\n\", $i}'"
    agg_awk = (
        "awk -F'\\t' '{c[$1]+=($2==\"\"?1:$2)} END "
        '{for (t in c) printf "%s\\t%d\\n", t, c[t]}\''
    )
    data, counters = P.stream_job(lines, mapper, agg_awk, combiner=None)
    got = {r.key: int(r.value) for r in P.split_kv(data).collect()}
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
    assert counters.count() == 0  # mapper emitted no reporter lines


def test_stream_sentinel_keeps_streams_unambiguous(spark):
    """ADVICE r3: (a) a stdout DATA line that happens to start with
    'reporter:' must stay data, not be dropped or miscounted; (b) a
    non-reporter stderr line (diagnostic) must NOT leak into the data
    path — the reference routes stderr to task logs only."""
    from hadoop_20_warehouse_spark.operators import pipe as P

    rows = spark.createDataFrame([("reporter:is_my_data",), ("plain",)], "v string")
    # mapper: echoes input to stdout, writes one diagnostic AND one
    # counter line to stderr per partition
    cmd = (
        "bash -c 'cat; echo \"some awk warning\" >&2; "
        "echo \"reporter:counter:g,n,1\" >&2'"
    )
    data, obs = P.pipe_with_counters(rows, cmd, counters=[("g", "n")])
    got = sorted(r.line for r in data.collect())
    assert got == ["plain", "reporter:is_my_data"]
    nparts = rows.rdd.getNumPartitions()
    assert obs.get["g_n"] == nparts
    assert obs.get["reporter_lines"] == nparts  # warning line not counted

    # same contract through stream_job: identity reducer (reducer sees
    # key<TAB>value lines, so keys carry the payload here)
    data2, counters2 = P.stream_job(rows, cmd, "cat")
    vals = sorted(r.key for r in P.split_kv(data2).collect())
    assert "reporter:is_my_data" in vals
    assert not any("awk warning" in v for v in vals)
    crows = {(r.group, r.name): r.amount for r in counters2.collect()}
    assert crows == {("g", "n"): nparts}


def test_stream_job_scoped_releases_cache(spark):
    """stream_job persists the map output (mapper runs once for data +
    counters); stream_job_scoped must unpersist it on exit so repeated
    jobs in one session don't leak cached RDDs (ADVICE r3)."""
    from hadoop_20_warehouse_spark.operators import pipe as P

    jsc = spark.sparkContext._jsc.sc()
    spark.catalog.clearCache()
    base = jsc.getPersistentRDDs().size()
    rows = spark.createDataFrame([("a",), ("b",), ("a",)], "v string")
    agg_awk = (
        "awk -F'\\t' '{c[$1]+=1} END "
        '{for (t in c) printf "%s\\t%d\\n", t, c[t]}\''
    )
    for _ in range(3):
        with P.stream_job_scoped(rows, "cat", agg_awk) as (data, counters):
            got = {r.key: int(r.value) for r in P.split_kv(data).collect()}
            assert got == {"a": 2, "b": 1}
            assert counters.count() == 0
    # clearCache()/unpersist are ASYNC (blocking=false): ``base`` may
    # have counted entries from earlier tests that were still draining
    # and finish removal mid-test, so the floor can legitimately dip
    # BELOW base.  A leak is size staying ABOVE base; poll past the
    # async removals before asserting (order-dependent flake, r19).
    import time

    deadline = time.time() + 30
    while time.time() < deadline and jsc.getPersistentRDDs().size() > base:
        time.sleep(0.5)
    assert jsc.getPersistentRDDs().size() <= base
