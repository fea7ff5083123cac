"""SQL-text surface: the reference's users write SQL (psql views);
this module lets them run ANSI SQL against the same engine through
``spark.sql`` — same Catalyst plans as the DataFrame API.

``register_views`` mounts the test tables (with the events ns→µs
normalization) as temp views; ``run_sql`` executes a statement.
The SQL-defined queries below ride the same oracle gate as the
DataFrame ones, proving the two surfaces are interchangeable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def register_views(spark: SparkSession, sf_dir: str) -> None:
    from nass_summary_spark.plans.queries import _t

    for t in TABLES:
        _t(spark, sf_dir, t).createOrReplaceTempView(t)


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(sql)


#: SQL that runs UNCHANGED on both Spark and the DuckDB oracle —
#: the portability bar the engine holds itself to.
PORTABLE_SQL: dict[str, str] = {
    "sql_revenue_by_nation": """
        SELECT n_name,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                   * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
          COUNT(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "sql_priority_share": """
        SELECT o_orderpriority, COUNT(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY o_orderpriority
    """,
    # CTE + ranked window (top-3 customers per nation by revenue)
    "sql_top_customers_window": """
        WITH cust_rev AS (
          SELECT c_nationkey, c_name,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
          FROM customer JOIN orders ON o_custkey = c_custkey
          GROUP BY c_nationkey, c_name
        )
        SELECT c_nationkey, c_name, revenue, rnk FROM (
          SELECT c_nationkey, c_name, revenue,
            CAST(ROW_NUMBER() OVER (
              PARTITION BY c_nationkey ORDER BY revenue DESC, c_name
            ) AS BIGINT) AS rnk
          FROM cust_rev
        ) ranked WHERE rnk <= 3
    """,
    # correlated EXISTS (TPC-H Q4 shape)
    "sql_exists_late_ship": """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders o
        WHERE EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
        )
        GROUP BY o_orderpriority
    """,
    # correlated NOT EXISTS anti-join + dim rollup (customers who
    # never placed a large order)
    "sql_customers_without_orders": """
        SELECT n_name, COUNT(*) AS n_customers
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        WHERE NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_totalprice > 300000
        )
        GROUP BY n_name
    """,
    # conditional aggregation + HAVING (parts sourced by few suppliers)
    "sql_scarce_parts": """
        SELECT p_type,
               COUNT(DISTINCT p_partkey) AS n_parts,
               CAST(SUM(CASE WHEN p_size > 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_large
        FROM part
        GROUP BY p_type
        HAVING COUNT(DISTINCT p_partkey) >= 20
    """,
    # ROLLUP + GROUPING() flags (the multigrain A23 shape as raw SQL)
    "sql_rollup_grouping": """
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_price
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    # set operations: INTERSECT / EXCEPT compose in one statement
    "sql_intersect_except": """
        SELECT 'both' AS bucket, COUNT(*) AS n FROM (
          SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
          INTERSECT
          SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
        )
        UNION ALL
        SELECT 'urgent_only', COUNT(*) FROM (
          SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
          EXCEPT
          SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
        )
    """,
    # sliding ROWS frame over an ordered per-key series (moving sum)
    "sql_moving_frame": """
        SELECT c_nationkey, c_custkey,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) OVER (
                 PARTITION BY c_nationkey ORDER BY c_custkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS moving_bal
        FROM customer
    """,
    # inverse-distribution aggregate: WITHIN GROUP percentile
    "sql_percentile_within": """
        SELECT l_linestatus,
               ROUND(PERCENTILE_CONT(0.5)
                 WITHIN GROUP (ORDER BY CAST(l_quantity AS DOUBLE)), 6)
                 AS median_qty,
               ROUND(PERCENTILE_CONT(0.9)
                 WITHIN GROUP (ORDER BY CAST(l_quantity AS DOUBLE)), 6)
                 AS p90_qty
        FROM lineitem
        GROUP BY l_linestatus
    """,
}
