"""Inventory: external-process (Hadoop Streaming contract), multimodal
metadata, and text-format semantics (KeyValueTextInputFormat)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_20_warehouse_spark.catalog import load_table
from hadoop_20_warehouse_spark.multimodal.binary import decode_meta
from hadoop_20_warehouse_spark.operators import pipe as P
from hadoop_20_warehouse_spark.registry import register


@register(
    "pipe_field_extract",
    oracle="""
SELECT CAST(o_orderkey AS VARCHAR) AS key, o_orderpriority AS value
FROM orders
""",
)
def q_pipe_field_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-side external process (Streaming mapper contract,
    PipeMapper.map:84): rows piped tab-separated through ``cut -f1,3``,
    stdout split back into key/value on the separator
    (PipeMapRed.java:341-346)."""
    orders = load_table(spark, sf_dir, "orders")
    inp = orders.select(
        F.col("o_orderkey").cast("string"),
        F.col("o_orderstatus"),
        F.col("o_orderpriority"),
    )
    out = P.pipe_map(inp, "cut -f1,3")
    return P.split_kv(out)


@register(
    "pipe_reduce_uniq",
    oracle="""
SELECT token AS key, COUNT(*) AS cnt
FROM (SELECT unnest(string_split_regex(text, '\\s+')) AS token FROM documents)
WHERE token <> ''
GROUP BY token
""",
)
def q_pipe_reduce_uniq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reduce-side external process (Streaming reducer contract,
    PipeReducer.reduce:81): tokens co-located by key and sorted within
    each partition, then ``uniq -c`` — because repartition(key) sends
    every copy of a token to one partition, the per-partition counts
    are the global counts (exactly the reference's reducer guarantee)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.col("text"), r"\s+")).alias("token")
    ).filter(F.col("token") != "")
    piped = P.pipe_reduce(toks, "uniq -c", ["token"])
    return piped.select(
        F.regexp_extract("line", r"^\s*(\d+)\s+(.*)$", 2).alias("key"),
        F.regexp_extract("line", r"^\s*(\d+)\s+(.*)$", 1).cast("long").alias("cnt"),
    )


@register(
    "multimodal_meta",
    oracle="""
SELECT doc_id AS id,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       md5(text) AS content_md5,
       CAST('0x' || substring(md5(text), 1, 15) AS BIGINT) % 1024 + 1 AS width,
       CAST('0x' || substring(md5(text), 16, 15) AS BIGINT) % 1024 + 1 AS height
FROM documents
""",
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode plumbing (multimodal/binary.py): text bytes
    stood in for media payloads in a binary column, metadata extracted
    via Arrow-batched mapInPandas (byte length, digest, stub decode
    dims). The oracle reproduces the digest-derived fake dimensions."""
    docs = load_table(spark, sf_dir, "documents")
    with_bin = docs.select(
        F.col("doc_id"), F.col("text").cast("binary").alias("payload")
    )
    return decode_meta(with_bin, "doc_id", "payload")


@register(
    "kv_text_split",
    oracle="""
WITH lines AS (
  SELECT o_orderstatus || chr(9) || o_orderpriority || chr(9) || CAST(o_custkey AS VARCHAR) AS line
  FROM orders
)
SELECT split_part(line, chr(9), 1) AS key,
       CASE WHEN strpos(line, chr(9)) > 0
            THEN substring(line, strpos(line, chr(9)) + 1)
            ELSE '' END AS value
FROM lines
""",
)
def q_kv_text_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KeyValueTextInputFormat semantics
    (mapred/KeyValueTextInputFormat.java:34): split each line at the
    FIRST separator only — key before, everything after (including
    further separators) is the value."""
    orders = load_table(spark, sf_dir, "orders")
    lines = orders.select(
        F.concat_ws(
            "\t", F.col("o_orderstatus"), F.col("o_orderpriority"), F.col("o_custkey").cast("string")
        ).alias("line")
    )
    tab = F.lit("\t")
    has_tab = F.instr(F.col("line"), "\t") > 0
    return lines.select(
        F.substring_index(F.col("line"), "\t", 1).alias("key"),
        F.when(
            has_tab,
            F.expr("substring(line, instr(line, '\t') + 1)"),
        ).otherwise(F.lit("")).alias("value"),
    )


@register(
    "logalyzer_grep_sort",
    oracle="""
WITH lines AS (
  SELECT CAST(l_orderkey AS VARCHAR) || chr(9) || l_returnflag || chr(9) ||
         CAST(l_quantity AS VARCHAR) || chr(9) || l_linestatus AS line
  FROM lineitem
),
matched AS (SELECT line FROM lines WHERE regexp_matches(line, chr(9) || 'R' || chr(9)))
SELECT line FROM matched
ORDER BY CAST(string_split(line, chr(9))[3] AS DOUBLE) DESC,
         string_split(line, chr(9))[1] ASC
LIMIT 500
""",
)
def q_logalyzer_grep_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logalyzer (tools/Logalyzer.java:64-145): grep lines by regex,
    then sort by a chosen column with a separator
    (mapred.reducer.sort/separator) — filter + KeyField-style column
    sort, top 500 with orderkey tiebreak."""
    from hadoop_20_warehouse_spark.operators.sort import keyfield_sort_columns

    li = load_table(spark, sf_dir, "lineitem")
    lines = li.select(
        F.concat_ws(
            "\t",
            F.col("l_orderkey").cast("string"),
            F.col("l_returnflag"),
            F.col("l_quantity").cast("string"),
            F.col("l_linestatus"),
        ).alias("line")
    )
    matched = lines.filter(F.col("line").rlike("\tR\t"))
    cols = keyfield_sort_columns("line", "-k3,3nr -k1,1", "\t")
    return matched.orderBy(*cols).limit(500)


@register(
    "inverse_map",
    oracle="SELECT o_totalprice AS key, o_orderkey AS value FROM orders",
)
def q_inverse_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InverseMapper (mapred/lib/InverseMapper.java:33): (k,v)→(v,k) —
    a pure projection, zero shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        F.col("o_totalprice").alias("key"), F.col("o_orderkey").alias("value")
    )


@register(
    "agg_uniq_capped",
    oracle="""
SELECT event_type, least(COUNT(DISTINCT user_id), 100) AS uniq_capped
FROM events GROUP BY event_type
""",
)
def q_agg_uniq_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniqValueCount with maxNumItems cap
    (lib/aggregate/UniqValueCount.java:30, cap at :81-85): the
    reference truncates the distinct SET by insertion order (not
    parallel-reproducible) but the reported COUNT equals
    min(cap, true distinct) — which is deterministic, so that is the
    semantics we implement and oracle-check."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.least(F.countDistinct("user_id"), F.lit(100)).alias("uniq_capped")
    )


@register("agg_uniq_approx")  # rows-only: HLL sketch values are engine-specific
def q_agg_uniq_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct (approx_count_distinct / HyperLogLog++) —
    the bounded-memory mode of UniqValueCount for 100 TB cardinalities.
    No oracle: sketch estimates are engine-specific by design; the
    driver records the weaker rows/schema check."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("uniq_approx")
    )
