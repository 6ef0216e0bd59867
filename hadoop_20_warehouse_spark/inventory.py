"""Query inventory: one entry per implemented operator (SURVEY.md §2).

Each query is a pair: a Spark DataFrame program (the engine under
test) and an ANSI-SQL oracle string DuckDB runs on the same parquet
tables. The driver hash-compares them at sf0.01 (BASELINE.json t2).

Determinism conventions (so Spark and DuckDB agree bit-for-bit):
- Money/measure sums go through DECIMAL (exact), then one cast to
  DOUBLE; averages divide the exact sum by the exact count in double.
- All hashing (sampling, dedup, LSH) uses md5 (functions/hashing.py) —
  identical in both engines, unlike xxhash/murmur.
- Timestamp outputs are formatted to strings so timezone/naive
  representations can't diverge.
- Every computed column is aliased identically in both programs, and
  every top-k has a total-order tiebreak.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_20_warehouse_spark.catalog import load_table
from hadoop_20_warehouse_spark.functions.hashing import (
    md5_sample_keep,
    md5_sample_keep_sql,
)
from hadoop_20_warehouse_spark.operators import agg as A
from hadoop_20_warehouse_spark.operators import join as J
from hadoop_20_warehouse_spark.operators import select as S
from hadoop_20_warehouse_spark.operators import sort as SRT
from hadoop_20_warehouse_spark.registry import ORACLES, QUERIES, register

__all__ = ["QUERIES", "ORACLES", "register"]

QueryFn = Callable[[SparkSession, str], DataFrame]


def _dec_sum(col, alias: str, scale="decimal(18,2)"):
    """Exact decimal sum surfaced as double (see module docstring)."""
    return F.sum(col.cast(scale)).cast("double").alias(alias)


# ===========================================================================
# §2.5 aggregation / GridMix monsterQuery-stage shapes
# ===========================================================================


@register(
    "pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1-shaped pricing summary.

    Models the reference's sort-based partial+final aggregation path
    (combiner: Task.CombinerRunner, MapTask.sortAndSpill:1210) — in
    Spark a single hash aggregate with map-side partials, whole-stage
    codegen, and only (flag, status) grouping keys shuffled.

    r18 optimization round: the filtered scan is scattered before the
    partial aggregation — the single-row-group local file plans ≤3
    tasks, serializing the decimal-heavy partial agg on 3 of 32 cores
    (measured 1.37 → 1.06 s at sf0.1).  The date filter still pushes
    to parquet (scatter sits above the scan), and a well-split
    production scan passes through with no extra exchange.
    """
    from hadoop_20_warehouse_spark.session import scatter

    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    disc_price = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    charge = disc_price * (F.lit(1) + dec("l_tax"))
    n = F.count(F.lit(1))
    return (
        scatter(
            li.filter(
                F.col("l_shipdate")
                <= F.lit("2001-09-02 00:00:00").cast("timestamp")
            )
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum(F.col("l_quantity"), "sum_qty"),
            _dec_sum(F.col("l_extendedprice"), "sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(dec("l_quantity")).cast("double") / n).alias("avg_qty"),
            (F.sum(dec("l_extendedprice")).cast("double") / n).alias("avg_price"),
            (F.sum(dec("l_discount")).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@register(
    "wordcount",
    oracle="""
SELECT token, COUNT(*) AS token_count
FROM (SELECT unnest(string_split_regex(text, '[ \\t\\n\\x0b\\f\\r]+')) AS token FROM documents)
WHERE token <> ''
GROUP BY token
""",
)
def q_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GridMix 'combiner' class = wordcount (GridMixRunner.java:203),
    TokenCountMapper + LongSumReducer (SURVEY.md §2.3/§2.5). Map-side
    partial agg is the combiner."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        S.tokenize(docs, "text")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("token_count"))
    )


@register(
    "grep_topk",
    oracle="""
SELECT match, COUNT(*) AS match_count
FROM (SELECT unnest(regexp_extract_all(text, '[a-z]*ar[a-z]*', 0)) AS match FROM documents)
GROUP BY match
ORDER BY match_count DESC, match ASC
LIMIT 20
""",
)
def q_grep_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grep two-job pipeline (examples/Grep.java:48-84): regex match →
    count → sort desc → top-k. Spark plans TakeOrdered (no global
    sort); tiebreak on match keeps the limit deterministic."""
    docs = load_table(spark, sf_dir, "documents")
    return S.grep_count(docs, "text", "[a-z]*ar[a-z]*").limit(20)


@register(
    "aggregate_report",
    oracle="""
SELECT 'LongValueSum:' || token AS key, CAST(COUNT(*) AS VARCHAR) AS value
FROM (SELECT unnest(string_split_regex(text, '[ \\t\\n\\x0b\\f\\r]+')) AS token FROM documents)
WHERE token <> ''
GROUP BY token
UNION ALL
SELECT 'UniqValueCount:lang' AS key, CAST(COUNT(DISTINCT lang) AS VARCHAR) AS value FROM documents
UNION ALL
SELECT 'LongValueMax:n_chars' AS key, CAST(MAX(n_chars) AS VARCHAR) AS value FROM documents
UNION ALL
SELECT 'LongValueMin:n_chars' AS key, CAST(MIN(n_chars) AS VARCHAR) AS value FROM documents
UNION ALL
SELECT 'StringValueMax:source' AS key, MAX(source) AS value FROM documents
""",
)
def q_aggregate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ValueAggregator framework end-to-end (TestAggregates shape,
    lib/aggregate/TestAggregates.java:42): mapper emits typed
    descriptors, generic combiner/reducer folds them by
    (aggregator type, id). One conditional-aggregation pass."""
    docs = load_table(spark, sf_dir, "documents")
    tok = S.tokenize(docs, "text").select(
        F.lit("LongValueSum").alias("atype"),
        F.col("token").alias("aid"),
        F.lit("1").alias("aval"),
    )
    meta = docs.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("UniqValueCount").alias("atype"),
                    F.lit("lang").alias("aid"),
                    F.col("lang").alias("aval"),
                ),
                F.struct(
                    F.lit("LongValueMax").alias("atype"),
                    F.lit("n_chars").alias("aid"),
                    F.col("n_chars").cast("string").alias("aval"),
                ),
                F.struct(
                    F.lit("LongValueMin").alias("atype"),
                    F.lit("n_chars").alias("aid"),
                    F.col("n_chars").cast("string").alias("aval"),
                ),
                F.struct(
                    F.lit("StringValueMax").alias("atype"),
                    F.lit("source").alias("aid"),
                    F.col("source").alias("aval"),
                ),
            )
        ).alias("d")
    ).select("d.atype", "d.aid", "d.aval")
    return A.aggregate_job(tok.unionByName(meta))


@register(
    "value_histogram",
    oracle=A.value_histogram_sql("events", ["event_type"], "user_id"),
)
def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ValueHistogram report (lib/aggregate/ValueHistogram.java:33):
    per event_type, the distribution of per-user activity."""
    ev = load_table(spark, sf_dir, "events")
    return A.value_histogram(ev, ["event_type"], "user_id")


@register(
    "agg_pandas_udaf",
    oracle="""
WITH ranked AS (
  SELECT o_orderpriority, o_orderkey,
         DENSE_RANK() OVER (
           PARTITION BY o_orderpriority ORDER BY o_orderkey DESC
         ) AS dr
  FROM (SELECT DISTINCT o_orderpriority, o_orderkey FROM orders)
)
SELECT o_orderpriority, o_orderkey AS second_max_key
FROM ranked WHERE dr = 2
""",
)
def q_agg_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-defined aggregate through the Arrow path (operators/agg.py
    second_max_udaf — pandas_udf GROUPED_AGG): second-largest distinct
    order key per priority. The plugin surface for aggregators the
    expression registry can't express; Arrow batches, never
    row-at-a-time Python."""
    from hadoop_20_warehouse_spark.operators.agg import second_max_udaf

    orders = load_table(spark, sf_dir, "orders")
    udaf = second_max_udaf()
    return orders.groupBy("o_orderpriority").agg(
        udaf(F.col("o_orderkey")).alias("second_max_key")
    )


@register(
    "agg_quartiles",
    oracle="""
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.25) AS q25,
       quantile_cont(l_quantity, 0.50) AS q50,
       quantile_cont(l_quantity, 0.75) AS q75,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem GROUP BY l_returnflag
""",
)
def q_agg_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quartiles per return flag — the ValueHistogram
    report's median generalized (ValueHistogram.java:78-132). Exact
    `percentile` is the oracle-checkable form ((1-g)*a + g*b is exact
    in binary for quarter fractions over integer-valued quantities);
    at 100 TB swap in `percentile_approx` — same plan shape, sketch
    merge instead of a per-group sort."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.25)").alias("q25"),
        F.expr("percentile(l_quantity, 0.50)").alias("q50"),
        F.expr("percentile(l_quantity, 0.75)").alias("q75"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "monster_query",
    oracle=f"""
WITH stage1 AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
         COUNT(*) AS n_lines
  FROM lineitem
  WHERE {md5_sample_keep_sql("CAST(l_orderkey AS VARCHAR)", 10)}
  GROUP BY l_orderkey
), stage2 AS (
  SELECT o.o_custkey,
         CAST(SUM(CAST(s.revenue AS DECIMAL(24,6))) AS DOUBLE) AS cust_revenue,
         CAST(SUM(s.n_lines) AS BIGINT) AS cust_lines
  FROM stage1 s JOIN orders o ON s.l_orderkey = o.o_orderkey
  GROUP BY o.o_custkey
)
SELECT c.c_mktsegment AS mktsegment,
       CAST(SUM(CAST(s2.cust_revenue AS DECIMAL(24,6))) AS DOUBLE) AS segment_revenue,
       CAST(SUM(s2.cust_lines) AS BIGINT) AS segment_lines,
       COUNT(*) AS n_customers
FROM stage2 s2 JOIN customer c ON s2.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""",
)
def q_monster_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GridMix monsterQuery (GridMixRunner.java:230): a 3-stage
    pipeline — sample+agg, regroup, regroup. The reference ran 3 jobs
    with HDFS materialization between; here it is one lazy plan and
    Catalyst pipelines the stages (no intermediate I/O).

    The 10% keep uses the MD5Filter semantics
    (SequenceFileInputFilter.java:195) so the sample is deterministic
    and oracle-checkable. Revenue re-sums go through decimal to stay
    order-insensitively exact.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    disc_price = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    stage1 = (
        li.filter(md5_sample_keep(F.col("l_orderkey").cast("string"), 10))
        .groupBy("l_orderkey")
        .agg(
            F.sum(disc_price).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
    stage2 = (
        stage1.join(orders, stage1.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.sum(F.col("revenue").cast("decimal(24,6)")).cast("double").alias("cust_revenue"),
            F.sum("n_lines").alias("cust_lines"),
        )
    )
    return (
        stage2.join(cust, stage2.o_custkey == cust.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.sum(F.col("cust_revenue").cast("decimal(24,6)")).cast("double").alias("segment_revenue"),
            F.sum("cust_lines").alias("segment_lines"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


@register(
    "db_count_pageview",
    oracle="""
SELECT event_type AS url, COUNT(*) AS pageview
FROM events GROUP BY event_type
""",
)
def q_db_count_pageview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBCountPageView (examples/DBCountPageView.java:79-80): JDBC-in →
    count per url → JDBC-out. The count core over the events table;
    JDBC endpoints are covered by sources/jdbc (read/write pass-through)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.col("event_type").alias("url")).agg(
        F.count(F.lit(1)).alias("pageview")
    )


# ===========================================================================
# §2.1 scans: filters / samplers
# ===========================================================================


@register(
    "scan_filter_sample",
    oracle=f"""
SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
FROM lineitem
WHERE {md5_sample_keep_sql("CAST(l_orderkey AS VARCHAR) || '/' || CAST(l_linenumber AS VARCHAR)", 200)}
""",
)
def q_scan_filter_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GridMix webdataScan 'reference select' (GridMixRunner.java:172,
    keep 0.2% map / 5% reduce) + SequenceFileInputFilter sampling
    semantics (MD5Filter, SequenceFileInputFilter.java:195). Projection
    + filter only: Catalyst prunes the parquet scan to 6 columns and
    ships no shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    key = F.concat_ws("/", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string"))
    return li.filter(md5_sample_keep(key, 200)).select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )


@register(
    "scan_regex_filter",
    oracle="""
SELECT doc_id, lang, source
FROM documents
WHERE regexp_matches(text, 'window.*join|join.*window')
""",
)
def q_scan_regex_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SequenceFileInputFilter.RegexFilter (scan-time regex predicate,
    SequenceFileInputFilter.java:103): pushdown-friendly filter, no
    shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.col("text").rlike("window.*join|join.*window")).select(
        "doc_id", "lang", "source"
    )


# ===========================================================================
# §2.3 field selection / keyfield sort
# ===========================================================================

_ORDERS_LINE_SQL = (
    "CAST(o_orderkey AS VARCHAR) || chr(9) || CAST(o_custkey AS VARCHAR) || chr(9) || "
    "o_orderstatus || chr(9) || CAST(o_totalprice AS VARCHAR) || chr(9) || o_orderpriority"
)


_STRATA_RATES = {"click": 10, "view": 5, "purchase": 50, "signup": 100, "error": 25}


@register(
    "scan_stratified_sample",
    oracle=f"""
SELECT event_id, event_type, user_id
FROM events
WHERE CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 <
      CASE event_type {' '.join(f"WHEN '{k}' THEN {v}" for k, v in _STRATA_RATES.items())} ELSE 0 END
""",
)
def q_scan_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: per-stratum keep rates via
    the md5-bucket idiom (PercentFilter/MD5Filter generalized per key,
    SequenceFileInputFilter.java:146-195; `sampleBy` analog that is
    reproducible across engines and runs — no RNG state). Evaluates
    at the scan, before any wide op."""
    from hadoop_20_warehouse_spark.functions.hashing import md5_int64

    ev = load_table(spark, sf_dir, "events")
    rate = F.lit(0)
    for k, v in _STRATA_RATES.items():
        rate = F.when(F.col("event_type") == k, F.lit(v)).otherwise(rate)
    return ev.filter(md5_int64(F.col("event_id")) % 100 < rate).select(
        "event_id", "event_type", "user_id"
    )


@register(
    "field_selection",
    oracle=f"""
WITH lines AS (SELECT {_ORDERS_LINE_SQL} AS line FROM orders),
split AS (SELECT string_split(line, chr(9)) AS f FROM lines)
SELECT f[3] || chr(9) || f[1] AS key,
       f[2] || chr(9) || array_to_string(f[4:], chr(9)) AS value
FROM split
""",
)
def q_field_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FieldSelectionMapReduce (mapred/lib/FieldSelectionMapReduce.java:64)
    with spec "2,0:1,3-" over tab-separated order lines: key = fields
    2,0; value = field 1 then fields 3..end."""
    orders = load_table(spark, sf_dir, "orders")
    lines = orders.select(
        F.concat_ws(
            "\t",
            F.col("o_orderkey").cast("string"),
            F.col("o_custkey").cast("string"),
            F.col("o_orderstatus"),
            F.col("o_totalprice").cast("string"),
            F.col("o_orderpriority"),
        ).alias("line")
    )
    return S.field_select(lines, "line", "2,0:1,3-")


@register(
    "keyfield_sort_topk",
    oracle=f"""
WITH lines AS (SELECT {_ORDERS_LINE_SQL} AS line FROM orders),
split AS (SELECT line, string_split(line, chr(9)) AS f FROM lines)
SELECT line FROM split
ORDER BY CAST(f[4] AS DOUBLE) DESC, f[1] ASC
LIMIT 100
""",
)
def q_keyfield_sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KeyFieldBasedComparator sort spec "-k4,4nr -k1,1" (numeric
    descending on field 4 = totalprice, ascending text on field 1 =
    orderkey as tiebreak), top 100 (mapred/lib/KeyFieldBasedComparator.java:46,
    KeyFieldHelper.java:28-49). sort(1)/reference fields are 1-based."""
    orders = load_table(spark, sf_dir, "orders")
    lines = orders.select(
        F.concat_ws(
            "\t",
            F.col("o_orderkey").cast("string"),
            F.col("o_custkey").cast("string"),
            F.col("o_orderstatus"),
            F.col("o_totalprice").cast("string"),
            F.col("o_orderpriority"),
        ).alias("line")
    )
    cols = SRT.keyfield_sort_columns("line", "-k4,4nr -k1,1", "\t")
    return lines.orderBy(*cols).limit(100)


# ===========================================================================
# §2.4 joins — composite expression language + broadcast/semi/anti
# ===========================================================================

_JOIN_SRC_SQL = """
src0 AS (SELECT o_orderkey AS key, o_totalprice AS total FROM orders WHERE o_orderkey % 2 = 0),
src1 AS (SELECT o_orderkey AS key, o_custkey AS cust FROM orders WHERE o_orderkey % 3 = 0),
src2 AS (SELECT l_orderkey AS key, l_linenumber AS line, l_quantity AS qty FROM lineitem WHERE l_orderkey % 5 = 0)
"""


def _join_sources(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """TestDatamerge-style interleaved presence pattern
    (mapred/join/TestDatamerge.java:76-100): three sources keyed by
    orderkey, each holding a different residue-class subset, src2 with
    duplicate keys (one row per lineitem) for cross-product checks."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return {
        "src0": orders.filter(F.col("o_orderkey") % 2 == 0).select(
            F.col("o_orderkey").alias("key"), F.col("o_totalprice").alias("total")
        ),
        "src1": orders.filter(F.col("o_orderkey") % 3 == 0).select(
            F.col("o_orderkey").alias("key"), F.col("o_custkey").alias("cust")
        ),
        "src2": li.filter(F.col("l_orderkey") % 5 == 0).select(
            F.col("l_orderkey").alias("key"),
            F.col("l_linenumber").alias("line"),
            F.col("l_quantity").alias("qty"),
        ),
    }


@register(
    "join_inner",
    oracle=f"""
WITH {_JOIN_SRC_SQL}
SELECT s0.key AS key, s0.total AS total_src0, s1.cust AS cust_src1,
       s2.line AS line_src2, s2.qty AS qty_src2
FROM src0 s0 JOIN src1 s1 ON s0.key = s1.key JOIN src2 s2 ON s0.key = s2.key
""",
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """inner(src0, src1, src2) via the composite join expression
    language (CompositeInputFormat.java:48, InnerJoinRecordReader.java:41):
    emit only keys present in all sources, cross product of duplicates."""
    return J.compose_join("inner(src0, src1, src2)", _join_sources(spark, sf_dir))


@register(
    "join_outer",
    oracle=f"""
WITH {_JOIN_SRC_SQL}
SELECT COALESCE(s0.key, s1.key, s2.key) AS key,
       s0.total AS total_src0, s1.cust AS cust_src1,
       s2.line AS line_src2, s2.qty AS qty_src2
FROM src0 s0
FULL OUTER JOIN src1 s1 ON s0.key = s1.key
FULL OUTER JOIN src2 s2 ON COALESCE(s0.key, s1.key) = s2.key
""",
)
def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """outer(src0, src1, src2): n-ary full outer, NULL slots for absent
    sources (OuterJoinRecordReader.java:41, TupleWritable empty slots)."""
    return J.compose_join("outer(src0, src1, src2)", _join_sources(spark, sf_dir))


@register(
    "join_override",
    oracle=f"""
WITH {_JOIN_SRC_SQL},
tagged AS (
  SELECT key, 0 AS _src, total, NULL::BIGINT AS cust, NULL::INTEGER AS line, NULL::DOUBLE AS qty FROM src0
  UNION ALL
  SELECT key, 1, NULL, cust, NULL, NULL FROM src1
  UNION ALL
  SELECT key, 2, NULL, NULL, line, qty FROM src2
),
ranked AS (SELECT *, MAX(_src) OVER (PARTITION BY key) AS _max_src FROM tagged)
SELECT key, total AS total_src0, cust AS cust_src1, line AS line_src2, qty AS qty_src2
FROM ranked WHERE _src = _max_src
""",
)
def q_join_override(spark: SparkSession, sf_dir: str) -> DataFrame:
    """override(src0, src1, src2): per key keep the rightmost source's
    full value stream (OverrideRecordReader.java:36,49-60) — the
    dedup/priority-merge operator. Union + windowed max-source filter:
    one shuffle, no join."""
    return J.compose_join("override(src0, src1, src2)", _join_sources(spark, sf_dir))


@register(
    "join_composite_nested",
    oracle=f"""
WITH {_JOIN_SRC_SQL},
ij AS (
  SELECT s0.key AS key, s0.total AS total_src0, s1.cust AS cust_src1
  FROM src0 s0 JOIN src1 s1 ON s0.key = s1.key
),
tagged AS (
  SELECT key, 0 AS _src, total_src0, cust_src1,
         NULL::INTEGER AS line, NULL::DOUBLE AS qty FROM ij
  UNION ALL
  SELECT key, 1, NULL, NULL, line, qty FROM src2
),
ranked AS (SELECT *, MAX(_src) OVER (PARTITION BY key) AS _max_src FROM tagged)
SELECT key, total_src0, cust_src1, line AS line_src2, qty AS qty_src2
FROM ranked WHERE _src = _max_src
""",
)
def q_join_composite_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested composite expression ``override(inner(src0, src1), src2)``
    (the reference grammar's recursive form, CompositeInputFormat.java:61-63,
    e.g. Join.java:144-146 composes these): keys with lineitems (src2)
    take the lineitem stream; keys only in the inner(orders∩orders)
    branch keep that branch's rows — parser → recursive evaluation →
    one override shuffle on top of the inner join."""
    return J.compose_join(
        "override(inner(src0, src1), src2)", _join_sources(spark, sf_dir)
    )


_MULTIFILTER_SRC_SQL = """
m0 AS (SELECT o_orderkey AS key, o_totalprice AS v FROM orders WHERE o_orderkey % 2 = 0),
m1 AS (SELECT o_orderkey AS key, CAST(o_custkey AS DOUBLE) AS v FROM orders WHERE o_orderkey % 3 = 0),
m2 AS (SELECT l_orderkey AS key, l_quantity AS v FROM lineitem WHERE l_orderkey % 5 = 0)
"""


def _multifilter_sources(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """The TestDatamerge interleaved-presence fixture narrowed to one
    DOUBLE value per source (MultiFilter children must share a value
    class, MultiFilterRecordReader.java:92-101); m2 keeps duplicate
    keys (one row per lineitem) so the cross-product multiplicity of
    the tuple stream is exercised."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return {
        "m0": orders.filter(F.col("o_orderkey") % 2 == 0).select(
            F.col("o_orderkey").alias("key"), F.col("o_totalprice").alias("v")
        ),
        "m1": orders.filter(F.col("o_orderkey") % 3 == 0).select(
            F.col("o_orderkey").alias("key"),
            F.col("o_custkey").cast("double").alias("v"),
        ),
        "m2": li.filter(F.col("l_orderkey") % 5 == 0).select(
            F.col("l_orderkey").alias("key"), F.col("l_quantity").alias("v")
        ),
    }


@register(
    "join_multifilter",
    oracle=f"""
WITH {_MULTIFILTER_SRC_SQL},
tuples AS (
  SELECT COALESCE(m0.key, m1.key, m2.key) AS key, m0.v AS v0, m1.v AS v1, m2.v AS v2
  FROM m0
  FULL OUTER JOIN m1 ON m0.key = m1.key
  FULL OUTER JOIN m2 ON COALESCE(m0.key, m1.key) = m2.key
)
SELECT key, COALESCE(v0, v1, v2) AS v_m0 FROM tuples
WHERE COALESCE(v0, v1, v2) IS NOT NULL
""",
)
def q_join_multifilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """multifilter(m0, m1, m2): the composite outer-join tuple stream
    with each tuple collapsed to one emitted value — leftmost non-null
    slot — keeping duplicate-key cross-product multiplicity
    (MultiFilterRecordReader.java:36-87; the 4th op of the composite
    family, CompositeInputFormat.java:82-85)."""
    return J.compose_join(
        "multifilter(m0, m1, m2)", _multifilter_sources(spark, sf_dir)
    )


@register(
    "join_asof_attribution",
    oracle="""
WITH l AS (SELECT user_id, event_id AS purchase_id, ts FROM events WHERE event_type = 'purchase'),
r AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'),
u AS (
  SELECT user_id, ts AS __ts, 1 AS __tag, NULL::BIGINT AS __tb,
         purchase_id, ts, NULL::BIGINT AS event_id_asof, NULL::TIMESTAMP AS ts_asof
  FROM l
  UNION ALL
  SELECT user_id, ts, 0, event_id, NULL, NULL, event_id, ts FROM r
),
c AS (
  SELECT user_id, __tag, purchase_id, ts,
         LAST_VALUE(event_id_asof IGNORE NULLS) OVER w AS event_id_asof,
         LAST_VALUE(ts_asof IGNORE NULLS) OVER w AS ts_asof
  FROM u
  WINDOW w AS (PARTITION BY user_id ORDER BY __ts, __tag, __tb
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT user_id, purchase_id, epoch_us(ts) AS purchase_us,
       event_id_asof AS last_click_id,
       epoch_us(ts) - epoch_us(ts_asof) AS gap_us
FROM c WHERE __tag = 1
""",
)
def q_join_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/join.py asof_join): every purchase gets
    the same user's most recent click at-or-before it — the
    attribution shape. Union+window, ONE shuffle of |L|+|R| rows,
    no range-join blowup; the oracle mirrors the construction."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    out = J.asof_join(
        purchases, clicks, on=["user_id"], ts_left="ts", ts_right="ts",
        right_tiebreak="event_id",
    )
    return out.select(
        "user_id",
        "purchase_id",
        F.unix_micros(F.col("ts")).alias("purchase_us"),
        F.col("event_id_asof").alias("last_click_id"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("ts_asof"))).alias("gap_us"),
    )


@register(
    "join_band_events",
    oracle="""
SELECT e.user_id, e.event_id AS error_id, v.event_id AS view_id,
       epoch_us(v.ts) - epoch_us(e.ts) AS dt_us
FROM events e
JOIN events v
  ON v.user_id = e.user_id
 AND abs(epoch_us(v.ts) - epoch_us(e.ts)) <= 300000000
WHERE e.event_type = 'error' AND v.event_type = 'view'
""",
)
def q_join_band_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (band) join (operators/join.py band_join): error events
    paired with same-user views within ±5 minutes. Bucketized
    equi-join (bucket = band width, left replicated to 3 adjacent
    buckets) + exact filter — never the |L|x|R| theta scan."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.col("event_id").alias("error_id"), "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "event_id", "ts"
    )
    out = J.band_join(
        errors, views, on=["user_id"], ts_left="ts", ts_right="ts",
        band_us=300_000_000,
    )
    return out.select(
        "user_id",
        "error_id",
        F.col("event_id_r").alias("view_id"),
        (F.unix_micros(F.col("ts_r")) - F.unix_micros(F.col("ts"))).alias("dt_us"),
    )


@register(
    "join_broadcast_dims",
    oracle="""
SELECT r.r_name AS region, n.n_name AS nation,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
""",
)
def q_join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-side hash join pattern (DistributedCache small-table ship,
    SURVEY.md §2.4): dims broadcast to every task, zero shuffle for the
    joins; only the final group-by shuffles (25 nation rows)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        cust.join(J.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(J.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _dec_sum(F.col("c_acctbal"), "total_acctbal"),
        )
    )


@register(
    "join_semi",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
""",
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI (EXISTS) — SURVEY.md §2.4 'not present as named
    operator' in the reference (data_join presence-filter pattern);
    first-class here."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return J.semi_join(
        cust, orders.select(F.col("o_custkey").alias("c_custkey")), "c_custkey"
    ).select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI (NOT EXISTS): customers without orders."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return J.anti_join(
        cust, orders.select(F.col("o_custkey").alias("c_custkey")), "c_custkey"
    ).select("c_custkey", "c_name")


# ===========================================================================
# §2.6 sort / secondary sort / top-k
# ===========================================================================


@register(
    "sort_topk",
    oracle="""
SELECT l_orderkey, l_linenumber, strftime(l_shipdate, '%Y-%m-%d') AS shipdate, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
LIMIT 1000
""",
)
def q_sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k over a total order (Grep.java:79 single-reducer-head
    pattern → TakeOrderedAndProject in Spark: per-partition heaps, no
    global sort)."""
    li = load_table(spark, sf_dir, "lineitem")
    return SRT.top_k(
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.date_format("l_shipdate", "yyyy-MM-dd").alias("shipdate"),
            "l_extendedprice",
        ),
        1000,
        F.desc("l_extendedprice"),
        F.asc("l_orderkey"),
        F.asc("l_linenumber"),
    )


@register(
    "secondary_sort",
    oracle="""
SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate, rn FROM (
  SELECT o_custkey, o_orderkey, o_orderdate,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn <= 3
""",
)
def q_secondary_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Secondary sort (examples/SecondarySort.java:51): partition by
    custkey, order by (orderdate, orderkey) within the group — Window
    form; first 3 orders per customer."""
    orders = load_table(spark, sf_dir, "orders")
    ranked = SRT.grouped_rank(
        orders, ["o_custkey"], [F.asc("o_orderdate"), F.asc("o_orderkey")]
    )
    return ranked.filter(F.col("rn") <= 3).select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        "rn",
    )


# ===========================================================================
# §2.7 set operations
# ===========================================================================


@register(
    "set_distinct",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def q_set_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT = group-by-key identity reduce (SURVEY.md §2.7)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select("user_id", "event_type").distinct()


@register(
    "set_intersect",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
""",
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT via tag-and-count pattern (data_join presence filter,
    SURVEY.md §2.7) — native set intersect here: customers ordering in
    both halves of the date range."""
    orders = load_table(spark, sf_dir, "orders")
    cut = F.lit("1998-01-01 00:00:00").cast("timestamp")
    early = orders.filter(F.col("o_orderdate") < cut).select("o_custkey")
    late = orders.filter(F.col("o_orderdate") >= cut).select("o_custkey")
    return early.intersect(late)


@register(
    "set_except",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
""",
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customers who ordered only in the early half."""
    orders = load_table(spark, sf_dir, "orders")
    cut = F.lit("1998-01-01 00:00:00").cast("timestamp")
    early = orders.filter(F.col("o_orderdate") < cut).select("o_custkey")
    late = orders.filter(F.col("o_orderdate") >= cut).select("o_custkey")
    return early.subtract(late)


@register(
    "set_union_heterogeneous",
    oracle="""
SELECT o_custkey AS entity, 'order' AS src, o_totalprice AS amount FROM orders
UNION ALL
SELECT l_suppkey AS entity, 'line' AS src, l_extendedprice AS amount FROM lineitem
""",
)
def q_set_union_heterogeneous(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MultipleInputs/DelegatingInputFormat (mapred/lib/MultipleInputs.java:34):
    per-source normalizing mapper, then UNION ALL."""
    from hadoop_20_warehouse_spark.operators.setops import union_inputs

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return union_inputs(
        [orders, li],
        mappers=[
            lambda df: df.select(
                F.col("o_custkey").alias("entity"),
                F.lit("order").alias("src"),
                F.col("o_totalprice").alias("amount"),
            ),
            lambda df: df.select(
                F.col("l_suppkey").alias("entity"),
                F.lit("line").alias("src"),
                F.col("l_extendedprice").alias("amount"),
            ),
        ],
    )


# Register sibling inventories on import so `from ... import inventory`
# always exposes the full query surface.
from hadoop_20_warehouse_spark import inventory_llm  # noqa: E402,F401
from hadoop_20_warehouse_spark import inventory_streaming  # noqa: E402,F401
from hadoop_20_warehouse_spark import inventory_ext  # noqa: E402,F401
from hadoop_20_warehouse_spark import inventory_sql  # noqa: E402,F401
from hadoop_20_warehouse_spark import inventory_curation  # noqa: E402,F401
from hadoop_20_warehouse_spark import inventory_analytics  # noqa: E402,F401
from hadoop_20_warehouse_spark import inventory_snapshots  # noqa: E402,F401
