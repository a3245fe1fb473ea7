"""TPC-H-shaped benchmark queries (the subset expressible on the driver
fixtures' columns — no partsupp table, no commit/receipt dates).

Every query here is ONE SQL text executed verbatim by both engines
(spark.sql over registered fixture views, DuckDB as the oracle): the
engine's SQL surface is the thing under test, not a DataFrame translation.
Spark still plans them through Catalyst/AQE — plan shapes (broadcasts,
partial aggs, semi joins) come from the optimizer, as they would for any
warehouse user pointing existing SQL at this engine. Monetary sums are
cast to DECIMAL inside the SQL (exact, order-independent) — double
summation order differs between engines and flips the last cent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import register_fixtures
from ..registry import register


def _sql_query(name: str, tables: tuple[str, ...], sql: str, doc: str):
    @register(name, oracle=sql, doc=doc)
    def run(spark: SparkSession, sf_dir: str, _sql=sql, _tables=tables) -> DataFrame:
        register_fixtures(spark, sf_dir, tables=_tables)
        return spark.sql(_sql)

    run.__name__ = name
    return run


_sql_query(
    "tpch_q3_shipping_priority",
    ("customer", "orders", "lineitem"),
    """
    SELECT l.l_orderkey AS order_key,
           ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue,
           o.o_orderdate AS order_date
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1996-06-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1996-06-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, order_key
    LIMIT 10
    """,
    "TPC-H Q3 shape: unshipped-order revenue by segment — selective dim "
    "filter joined into two fact filters, group on the join key, top-k "
    "(fixture has no o_shippriority column; grouping drops it).",
)

_sql_query(
    "tpch_q5_local_supplier_volume",
    ("customer", "orders", "lineitem", "supplier", "nation", "region"),
    """
    SELECT n.n_name AS nation,
           ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, nation
    """,
    "TPC-H Q5 shape: local-supplier volume — the 6-way snowflake join "
    "(region -> nation -> customer + supplier co-location on the fact), "
    "the join-reordering stress test; every dim side should broadcast.",
)

_sql_query(
    "tpch_q6_revenue_forecast",
    ("lineitem",),
    """
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    "TPC-H Q6 shape: pure scan-filter-aggregate — the pushdown/codegen "
    "speed-of-light query (no join, no group key).",
)

_sql_query(
    "tpch_q10_returned_items",
    ("customer", "orders", "lineitem", "nation"),
    """
    SELECT c.c_custkey AS cust_key, c.c_name AS cust_name, n.n_name AS nation,
           ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, cust_key
    LIMIT 20
    """,
    "TPC-H Q10 shape: returned-item revenue per customer — 4-way join, "
    "group, top-k.",
)

_sql_query(
    "tpch_q13_order_distribution",
    ("customer", "orders"),
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
             AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    "TPC-H Q13 shape: customer order-count distribution — outer join with "
    "an ON-clause filter (not WHERE: zero-order customers must survive), "
    "double aggregation.",
)

_sql_query(
    "tpch_q14_promo_share",
    ("lineitem", "part"),
    """
    SELECT ROUND(
        100.00 * CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                          THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                               * CAST(1 - l.l_discount AS DECIMAL(18,4))
                          ELSE CAST(0 AS DECIMAL(24,6)) END) AS DOUBLE)
        / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                   * CAST(1 - l.l_discount AS DECIMAL(18,4))) AS DOUBLE), 4) AS promo_revenue_pct
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
    """,
    "TPC-H Q14 shape: promotion revenue share — conditional aggregation "
    "over a fact-dim join, single-row result.",
)

_sql_query(
    "tpch_q18_large_orders",
    ("customer", "orders", "lineitem"),
    """
    SELECT c.c_name AS cust_name, c.c_custkey AS cust_key,
           o.o_orderkey AS order_key, o.o_orderdate AS order_date,
           ROUND(o.o_totalprice, 2) AS total_price,
           ROUND(SUM(l.l_quantity), 2) AS sum_qty
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY total_price DESC, order_key
    LIMIT 25
    """,
    "TPC-H Q18 shape: large-volume orders — IN over a grouped HAVING "
    "subquery (planned as a semi join on an aggregate), then re-join and "
    "re-aggregate.",
)

_sql_query(
    "tpch_q19_discounted_revenue",
    ("lineitem", "part"),
    """
    SELECT ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity >= 10 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity >= 20 AND l.l_quantity <= 40)
    """,
    "TPC-H Q19 shape: disjunctive multi-predicate join filter — the "
    "OR-of-conjunctions pattern optimizers must not turn into a cross "
    "product (Spark pushes the common join key, evaluates the residual "
    "disjunction post-join).",
)
