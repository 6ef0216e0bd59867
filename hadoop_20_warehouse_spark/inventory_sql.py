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


_ORDER_PRIORITY_SQL = """
SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o.o_orderpriority
"""

_LOCAL_SUPPLIER_VOLUME_SQL = """
SELECT n.n_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
"""

_REVENUE_FORECAST_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
  AND CAST(l_discount AS DECIMAL(18,2)) BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""

_RETURNED_ITEMS_SQL = """
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey ASC
LIMIT 20
"""

_SMALL_QTY_REVENUE_SQL = """
WITH pa AS (
  SELECT l_partkey,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_qty_revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN pa ON pa.l_partkey = l.l_partkey
WHERE p.p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
  AND 5 * CAST(l.l_quantity AS DECIMAL(18,2)) * pa.cnt < pa.sum_qty
"""

_PROMO_REVENUE_SQL = """
SELECT CAST(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
            / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
       AS DOUBLE) AS promo_pct,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1998-07-01 00:00:00'
"""

_STATUS_PRIORITY_SQL = """
SELECT l.l_linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate > o.o_orderdate
GROUP BY l.l_linestatus
"""

_ROLLUP_REVENUE_SQL = """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
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
    ("sql_order_priority", _ORDER_PRIORITY_SQL),
    ("sql_local_supplier_volume", _LOCAL_SUPPLIER_VOLUME_SQL),
    ("sql_revenue_forecast", _REVENUE_FORECAST_SQL),
    ("sql_returned_items", _RETURNED_ITEMS_SQL),
    ("sql_small_qty_revenue", _SMALL_QTY_REVENUE_SQL),
    ("sql_rollup_revenue", _ROLLUP_REVENUE_SQL),
    ("sql_promo_revenue", _PROMO_REVENUE_SQL),
    ("sql_status_priority", _STATUS_PRIORITY_SQL),
):
    register(_name, oracle=_sql)(_sql_query(_sql))
