"""Inventory: the SQL entry point.

The reference had no SQL — Hive supplied it one layer up (SURVEY.md
§0). In this engine ``spark.sql`` over the catalog views IS the Hive
analog. Each query below is ONE ANSI-SQL string executed verbatim by
BOTH engines (Spark runs it via ``spark.sql`` on registered temp
views, DuckDB runs it as the oracle) — the strongest possible parity
statement for the SQL surface: same text, same answer.

Dialect constraints for dual-engine strings: TIMESTAMP literals,
DECIMAL casts, CASE, EXISTS, window functions are common ground; avoid
engine-specific functions (strftime/date_format) and HUGEINT-producing
bare SUM over BIGINT (wrap in CAST ... AS BIGINT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hadoop_20_warehouse_spark.catalog import load_tables
from hadoop_20_warehouse_spark.registry import register

_SHIPPING_PRIORITY_SQL = """
SELECT l.l_orderkey,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderpriority
"""

_TOP_SUPPLIERS_SQL = """
SELECT s.s_suppkey, s.s_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
FROM supplier s
JOIN lineitem l ON l.l_suppkey = s.s_suppkey
GROUP BY s.s_suppkey, s.s_name
ORDER BY total_revenue DESC, s.s_suppkey ASC
LIMIT 10
"""

_CUSTOMER_RANK_SQL = """
SELECT c_custkey, c_mktsegment, spend, seg_rank FROM (
  SELECT c.c_custkey, c.c_mktsegment,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend,
         CAST(ROW_NUMBER() OVER (
            PARTITION BY c.c_mktsegment
            ORDER BY SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) DESC, c.c_custkey ASC
         ) AS BIGINT) AS seg_rank
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey, c.c_mktsegment
) WHERE seg_rank <= 5
"""


def _sql_query(sql: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        load_tables(spark, sf_dir, register_views=True)
        return spark.sql(sql)

    return run


for _name, _sql in (
    ("sql_shipping_priority", _SHIPPING_PRIORITY_SQL),
    ("sql_top_suppliers", _TOP_SUPPLIERS_SQL),
    ("sql_customer_rank", _CUSTOMER_RANK_SQL),
):
    register(_name, oracle=_sql)(_sql_query(_sql))
