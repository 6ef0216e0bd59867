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


_VOLUME_SHIPPING_SQL = """
SELECT supp_nation, cust_nation, l_year, CAST(SUM(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS l_year,
         CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
  JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                         AND TIMESTAMP '1999-12-31 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""

_MARKET_SHARE_SQL = """
SELECT o_year,
       CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS nation_volume,
       CAST(SUM(volume) AS DOUBLE) AS total_volume
FROM (
  SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
         CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume,
         n2.n_name AS nation
  FROM part p
  JOIN lineitem l ON l.l_partkey = p.p_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n1.n_regionkey
  JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
  WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
) all_nations
GROUP BY o_year
"""

_PRODUCT_PROFIT_SQL = """
SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
FROM (
  SELECT n.n_name AS nation,
         CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
         CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
           - CAST(0.05 AS DECIMAL(4,2)) * CAST(p.p_retailprice AS DECIMAL(18,2)) * CAST(l.l_quantity AS DECIMAL(18,2)) AS amount
  FROM part p
  JOIN lineitem l ON l.l_partkey = p.p_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE p.p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
"""

_CUSTOMER_DISTRIBUTION_SQL = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
"""

_LARGE_VOLUME_CUSTOMERS_SQL = """
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       CAST(o.o_orderdate AS STRING) AS o_orderdate,
       CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300
)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
"""

_DISCOUNTED_REVENUE_SQL = """
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25 AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#5'  AND p.p_size BETWEEN 1 AND 35 AND l.l_quantity BETWEEN 20 AND 30)
"""

_WAITING_SUPPLIER_SQL = """
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier s
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey AND l3.l_shipdate > o3.o_orderdate
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
  )
  AND n.n_name IN ('NATION_4', 'NATION_5', 'NATION_6')
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 20
"""

_INACTIVE_CUSTOMERS_SQL = """
SELECT c.c_nationkey AS nation, CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer c
WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) * (SELECT COUNT(*) FROM customer WHERE c_acctbal > 0.0)
      > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
  )
GROUP BY c.c_nationkey
"""

_MIN_COST_SUPPLIER_SQL = """
SELECT p.p_partkey, p.p_name, s.s_name, n.n_name,
       CAST(best.l_extendedprice AS DOUBLE) AS best_price
FROM (
  SELECT l_partkey, l_suppkey, l_extendedprice,
         ROW_NUMBER() OVER (
           PARTITION BY l_partkey
           ORDER BY l_extendedprice, l_suppkey
         ) AS rn
  FROM lineitem
) best
JOIN part p ON p.p_partkey = best.l_partkey
JOIN supplier s ON s.s_suppkey = best.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE best.rn = 1 AND p.p_size <= 5
"""

_MOVING_AVG_REVENUE_SQL = """
WITH daily AS (
  SELECT DATE_TRUNC('day', l_shipdate) AS ship_day,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS revenue,
         CAST(COUNT(*) AS BIGINT) AS n_lines
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-04-01 00:00:00'
  GROUP BY DATE_TRUNC('day', l_shipdate)
)
SELECT CAST(CAST(ship_day AS DATE) AS STRING) AS ship_day,
       CAST(revenue AS DOUBLE) AS revenue, n_lines,
       CAST(CAST(SUM(revenue) OVER w AS DOUBLE)
            / CAST(COUNT(*) OVER w AS DOUBLE) AS DOUBLE) AS revenue_7d_avg
FROM daily
WINDOW w AS (ORDER BY ship_day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
"""

_NTILE_SPEND_SQL = """
SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(spend) AS DOUBLE) AS decile_spend
FROM (
  SELECT c.c_custkey,
         SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS spend,
         CAST(NTILE(10) OVER (
           ORDER BY SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) DESC, c.c_custkey
         ) AS BIGINT) AS decile
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey
) deciles
GROUP BY decile
"""

_BAD_RECORDS_SQL = """
WITH parsed AS (
  SELECT TRY_CAST(split_part(o_orderpriority, '-', 1) AS INTEGER) AS prio_num,
         TRY_CAST(o_orderstatus AS INTEGER) AS status_num,
         o_totalprice
  FROM orders
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN prio_num IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_prio,
       CAST(SUM(CASE WHEN status_num IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_status,
       CAST(SUM(CASE WHEN prio_num IS NOT NULL
                 THEN CAST(prio_num AS BIGINT) ELSE 0 END) AS BIGINT) AS prio_sum
FROM parsed
"""

_FIRST_LAST_ORDER_SQL = """
SELECT DISTINCT o_custkey,
       CAST(FIRST_VALUE(o_totalprice) OVER w AS DOUBLE) AS first_price,
       CAST(LAST_VALUE(o_totalprice) OVER w AS DOUBLE) AS last_price,
       CAST(FIRST_VALUE(o_orderkey) OVER w AS BIGINT) AS first_order,
       CAST(LAST_VALUE(o_orderkey) OVER w AS BIGINT) AS last_order
FROM orders
WINDOW w AS (
  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
)
"""

_EVENT_RETENTION_SQL = """
WITH active AS (
  SELECT DISTINCT user_id, CAST(DATE_TRUNC('week', ts) AS DATE) AS week_start
  FROM events
),
flags AS (
  SELECT a.user_id, a.week_start,
         CASE WHEN EXISTS (
           SELECT 1 FROM active b
           WHERE b.user_id = a.user_id AND b.week_start = a.week_start + 7
         ) THEN 1 ELSE 0 END AS retained
  FROM active a
)
SELECT CAST(week_start AS STRING) AS week_start,
       CAST(COUNT(*) AS BIGINT) AS n_active,
       CAST(SUM(retained) AS BIGINT) AS n_retained
FROM flags
GROUP BY week_start
"""

_CUBE_EVENT_STATS_SQL = """
SELECT COALESCE(event_type, 'ALL') AS event_type,
       COALESCE(CAST(user_id % 10 AS BIGINT), -1) AS user_mod,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
FROM events
GROUP BY CUBE(event_type, CAST(user_id % 10 AS BIGINT))
"""

_EVENT_FUNNEL_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
       CAST(SUM(CASE WHEN t_view < t_click THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click,
       CAST(SUM(CASE WHEN t_view < t_click AND t_click < t_purchase THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
FROM (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events
  GROUP BY user_id
) funnel
"""

_SESSIONIZE_EVENTS_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                OR ts > LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                        + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT user_id, ts, event_id,
         CAST(SUM(new_session) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MIN(ts) AS STRING) AS session_start,
       CAST(MAX(ts) AS STRING) AS session_end
FROM numbered
GROUP BY user_id, session_id
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
    ("sql_volume_shipping", _VOLUME_SHIPPING_SQL),
    ("sql_market_share", _MARKET_SHARE_SQL),
    ("sql_product_profit", _PRODUCT_PROFIT_SQL),
    ("sql_customer_distribution", _CUSTOMER_DISTRIBUTION_SQL),
    ("sql_large_volume_customers", _LARGE_VOLUME_CUSTOMERS_SQL),
    ("sql_discounted_revenue", _DISCOUNTED_REVENUE_SQL),
    ("sql_waiting_supplier", _WAITING_SUPPLIER_SQL),
    ("sql_inactive_customers", _INACTIVE_CUSTOMERS_SQL),
    ("sql_min_cost_supplier", _MIN_COST_SUPPLIER_SQL),
    ("sql_moving_avg_revenue", _MOVING_AVG_REVENUE_SQL),
    ("sql_ntile_spend", _NTILE_SPEND_SQL),
    ("sql_sessionize_events", _SESSIONIZE_EVENTS_SQL),
    ("sql_event_funnel", _EVENT_FUNNEL_SQL),
    ("sql_cube_event_stats", _CUBE_EVENT_STATS_SQL),
    ("sql_first_last_order", _FIRST_LAST_ORDER_SQL),
    ("sql_event_retention", _EVENT_RETENTION_SQL),
    ("sql_bad_records_skip", _BAD_RECORDS_SQL),
):
    register(_name, oracle=_sql)(_sql_query(_sql))
