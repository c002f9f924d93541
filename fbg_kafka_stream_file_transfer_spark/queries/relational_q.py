"""Relational surface: joins, aggregations, windows, set ops, top-k.

The reference has no in-engine joins/sorts/set-ops (SURVEY §2 preamble) —
Spark SQL provides them for free, and the driver's oracle exercises a
relational inventory, so they're first-class here. Shared-SQL queries run
the identical string on Spark and DuckDB; DataFrame-API queries exercise
the engine's operator surface (semi/anti joins, window ranking, pivot)
with a hand-written oracle.

Scale notes: dimension joins (region/nation/customer) are broadcast
(small side < autoBroadcastJoinThreshold; `F.broadcast` forces it where
the stats lie); fact-fact joins shuffle on the join key and AQE handles
skew. Top-k uses rank-truncation (window + filter), which Spark executes
as a partial top-k per partition before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table
from .base import Q, local_df, shared_sql


def _semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with ≥1 high-value order — left_semi (EXISTS)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


def _anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no orders at all — left_anti (NOT EXISTS). Mirrors the
    'arrived but never processed' reconciliation (SURVEY §7 step 2)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


def _window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price (rank-truncated window)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.round(F.col("o_totalprice"), 2).desc(), F.col("o_orderkey"))
    )
    return (
        orders.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            "rank",
        )
    )


def _window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per customer over order date (cumulative window)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


def _pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-priority order counts by status column."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
        .na.fill(0, ["O", "F", "P"])
    )


def _broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast of the nation→region dimension chain (P16-style
    map-side lookup join; no shuffle of the fact side)."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    dim = nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return (
        customer.join(F.broadcast(dim), customer.c_nationkey == dim.n_nationkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("customers"),
            # exact decimal sum → double: order-independent money agg
            # (base.py conventions; see module docstring on -0/float sums)
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(18,4)")), 2
            ).cast("double").alias("total_acctbal"),
        )
    )


QUERIES: dict[str, Q] = {
    # --- shared-SQL (identical string on both engines) ---
    "tpch_q1_pricing_summary": shared_sql(
        """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))), 2) AS DOUBLE) AS sum_disc_price,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,8))), 2) AS DOUBLE) AS sum_charge,
       round(avg(l_quantity), 6) AS avg_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(l_extendedprice), 6) AS avg_price,
       round(CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
        ("lineitem",),
        parallel=("lineitem",),
    ),
    "tpch_q3_shipping_priority": shared_sql(
        """
SELECT o_orderkey,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))), 2) AS DOUBLE) AS revenue,
       o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
        ("customer", "orders", "lineitem"),
    ),
    "tpch_q5_local_supplier_volume": shared_sql(
        """
SELECT n_name,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))), 2) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name IN ('AMERICA', 'ASIA')
GROUP BY n_name
""",
        ("customer", "orders", "lineitem", "supplier", "nation", "region"),
    ),
    "agg_rollup": shared_sql(
        """
SELECT l_returnflag, l_linestatus,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_price,
       count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
        ("lineitem",),
    ),
    "agg_cube": shared_sql(
        """
SELECT o_orderpriority, o_orderstatus,
       count(*) AS n,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
""",
        ("orders",),
    ),
    "agg_distinct": shared_sql(
        """
SELECT l_returnflag,
       count(DISTINCT l_suppkey) AS distinct_suppliers,
       count(DISTINCT l_partkey) AS distinct_parts,
       count(*) AS n
FROM lineitem
GROUP BY l_returnflag
""",
        ("lineitem",),
    ),
    "set_union": shared_sql(
        """
SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
UNION
SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
""",
        ("customer", "orders"),
    ),
    "set_intersect": shared_sql(
        """
SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
""",
        ("customer", "orders"),
    ),
    "set_except": shared_sql(
        """
SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
""",
        ("customer", "orders"),
    ),
    "order_stats_per_customer": shared_sql(
        """
SELECT o_custkey,
       count(*) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_spent,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / count(o_totalprice), 6) AS avg_order,
       round(min(o_totalprice), 2) AS min_order,
       round(max(o_totalprice), 2) AS max_order
FROM orders
GROUP BY o_custkey
""",
        ("orders",),
    ),
    # --- DataFrame-API operators with hand-written oracles ---
    "join_semi": Q(
        _semi_join,
        """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 300000)
""",
        doc="left_semi join (EXISTS reconciliation, SURVEY §7 step 2)",
    ),
    "join_anti": Q(
        _anti_join,
        """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
        doc="left_anti join ('arrived but never processed')",
    ),
    "window_topk_per_group": Q(
        _window_topk,
        """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice,
       CAST(row_number() OVER (PARTITION BY o_custkey
            ORDER BY round(o_totalprice, 2) DESC, o_orderkey) AS INTEGER) AS rank
FROM orders
QUALIFY rank <= 3
""",
        doc="top-k per group via rank-truncated window",
    ),
    "window_running_sum": Q(
        _window_running,
        """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
FROM orders
""",
        doc="cumulative window aggregation",
    ),
    "pivot_order_status": Q(
        _pivot_status,
        """
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
       count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
       count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
FROM orders GROUP BY o_orderpriority
""",
        doc="pivot (conditional aggregation)",
    ),
    "join_broadcast_dims": Q(
        _broadcast_dim_join,
        """
SELECT r_name, n_name, count(*) AS customers,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
        doc="broadcast dimension-chain join (P16 analogue)",
    ),
}


# --- extended relational coverage (shared-SQL: identical string on both
# engines; rounding per base.py conventions) ---

def _shared(
    sql: str,
    tables: tuple[str, ...],
    doc: str,
    parallel: tuple[str, ...] = (),
) -> Q:
    base = shared_sql(sql, tables, parallel=parallel)
    return Q(base.spark, base.oracle, doc=doc)


QUERIES["tpch_q6_forecast_revenue"] = _shared(
    """
SELECT CAST(round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(28,8))), 2) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
""",
    ("lineitem",),
    doc="TPC-H q6 shape: tight scan filters — pushdown/pruning showcase",
)

QUERIES["tpch_q4_priority_exists"] = _shared(
        """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
GROUP BY o_orderpriority
""",
        ("orders", "lineitem"),
    doc="TPC-H q4 shape: correlated EXISTS → left-semi join",
)

QUERIES["tpch_q10_returned_revenue"] = _shared(
        """
SELECT c_custkey, c_name, n_name,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))), 2) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
""",
        ("customer", "orders", "lineitem", "nation"),
    doc="TPC-H q10 shape: 4-way join + grouped revenue",
)

QUERIES["tpch_q14_promo_ratio"] = _shared(
        """
SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                                   THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))
                                   ELSE CAST(0 AS DECIMAL(28,8)) END) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))) AS DOUBLE), 6) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
""",
        ("lineitem", "part"),
    doc="TPC-H q14 shape: conditional-agg ratio over a fact-dim join",
)

QUERIES["tpch_q18_large_orders"] = _shared(
        """
SELECT o_orderkey, round(CAST(sum(l_quantity) AS DOUBLE), 2) AS total_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderkey
HAVING sum(l_quantity) > 300
""",
        ("lineitem", "orders"),
    doc="TPC-H q18 shape: grouped HAVING filter (agg pushdown target)",
)

QUERIES["tpch_q7_volume_shipping"] = _shared(
    """
SELECT supp_nation, cust_nation, l_year,
       CAST(round(sum(CAST(volume AS DECIMAL(28,8))), 2) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INTEGER) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1999-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
""",
    ("supplier", "lineitem", "orders", "customer", "nation"),
    doc="TPC-H q7 shape: bidirectional nation-pair volume, dual dim-join aliases",
)

QUERIES["tpch_q8_market_share"] = _shared(
    """
SELECT o_year,
       round(CAST(sum(CASE WHEN nation = 'NATION_3' THEN CAST(volume AS DECIMAL(28,8))
                           ELSE CAST(0 AS DECIMAL(28,8)) END) AS DOUBLE)
             / CAST(sum(CAST(volume AS DECIMAL(28,8))) AS DOUBLE), 6) AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
) all_nations
GROUP BY o_year
""",
    ("part", "lineitem", "supplier", "orders", "customer", "nation", "region"),
    doc="TPC-H q8 shape: 7-table star join + conditional market-share ratio",
)

# the fixture has no l_shipmode/l_commitdate (TESTDATA.md), so the q12
# two-bucket priority count keys on l_linestatus instead — same shape:
# join + date-window filter + CASE-sum buckets.
QUERIES["tpch_q12_priority_buckets"] = _shared(
    """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_linestatus
""",
    ("orders", "lineitem"),
    doc="TPC-H q12 shape: date-window join + two-bucket CASE counts (fixture lacks l_shipmode)",
)

# q19's disjunction-of-conjunctions predicate (brand/size/quantity here;
# the fixture lacks p_container/l_shipmode) — the OR-pushdown showcase.
QUERIES["tpch_q19_disjunctive_revenue"] = _shared(
    """
SELECT CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))), 2) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1 AND l_quantity <= 20)
   OR (p_brand = 'Brand#12' AND p_size BETWEEN 10 AND 30
       AND l_quantity >= 10 AND l_quantity <= 30)
   OR (p_brand = 'Brand#20' AND p_size BETWEEN 20 AND 50
       AND l_quantity >= 20 AND l_quantity <= 40)
""",
    ("lineitem", "part"),
    doc="TPC-H q19 shape: disjunctive multi-clause predicate over a fact-dim join",
)

# q13's o_comment NOT LIKE filter has no fixture column — the excluded
# class keys on o_orderpriority instead; the shape (outer join preserving
# zero-order customers → count → histogram of counts) is intact.
QUERIES["tpch_q13_customer_distribution"] = _shared(
    """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '3-MEDIUM'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
""",
    ("customer", "orders"),
    doc="TPC-H q13 shape: zero-preserving outer join + histogram of per-key counts",
)

QUERIES["tpch_q15_top_supplier"] = _shared(
    """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))), 2) AS DOUBLE)
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
""",
    ("supplier", "lineitem"),
    doc="TPC-H q15 shape: CTE revenue view + scalar-max subquery (argmax join)",
)

# q17's p_container predicate keys on p_size (no container column); the
# shape — correlated per-part avg threshold gating a fact scan — is intact.
# The 0.2×avg threshold is rounded to 6 dp so an engine-order float ulp
# can't flip an exactly-at-boundary integer quantity.
QUERIES["tpch_q17_small_quantity_revenue"] = _shared(
    """
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0, 2) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#1' AND p_size < 5
  AND l_quantity < (
    SELECT round(CAST(0.2 * avg(l2.l_quantity) AS DOUBLE), 6)
    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
""",
    ("lineitem", "part"),
    doc="TPC-H q17 shape: correlated per-group avg threshold (decorrelated agg join)",
)

# q21's lateness is l_receiptdate > l_commitdate; the fixture carries
# neither, so late := shipped more than 60 days after the order date.
# The operator shape — EXISTS (another supplier on the order) AND NOT
# EXISTS (another LATE supplier) — is the point and is intact.
QUERIES["tpch_q21_waiting_supplier"] = _shared(
    """
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND n_name = 'NATION_1'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
""",
    ("supplier", "lineitem", "orders", "nation"),
    doc="TPC-H q21 shape: dual correlated EXISTS/NOT-EXISTS (sole-late-supplier)",
)

# q22's phone-prefix country code keys on c_nationkey (no c_phone column);
# shape intact: uncorrelated avg subquery + NOT EXISTS anti-join + rollup.
QUERIES["tpch_q22_global_sales_opportunity"] = _shared(
    """
SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS totacctbal
FROM (
  SELECT CAST(c_nationkey AS INTEGER) AS cntrycode, c_acctbal, c_custkey
  FROM customer
  WHERE c_nationkey IN (1, 2, 3, 4)
    AND c_acctbal > (SELECT avg(c_acctbal) FROM customer
                     WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 2, 3, 4))
) custsale
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY cntrycode
""",
    ("customer", "orders"),
    doc="TPC-H q22 shape: scalar avg threshold + NOT-EXISTS anti-join + country rollup",
)

# --- TPC-H completion: q2/q9/q11/q16/q20 (the partsupp-dependent five).
# The fixture carries no partsupp table, so the part↔supplier cost
# relation is DERIVED from lineitem (min observed unit price per
# (partkey, suppkey) — a deterministic aggregate of the same fact
# table); q9's supply cost proxies as 0.6×p_retailprice. Every OPERATOR
# shape the original queries exercise — correlated scalar-min over the
# cost relation, multi-way dimension chains, fraction-of-total HAVING,
# null-aware NOT IN anti-join with count-distinct, nested IN chains
# with HAVING — is intact (same adaptation policy as q17/q21/q22
# above). With all five, the registry covers the full 22-query TPC-H
# operator surface.

QUERIES["tpch_q2_min_cost_supplier"] = _shared(
    """
WITH ps AS (
  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
         round(min(l_extendedprice / l_quantity), 6) AS supplycost
  FROM lineitem GROUP BY 1, 2
)
SELECT round(s_acctbal, 2) + 0.0 AS s_acctbal, s_name, n_name,
       p_partkey, p_name, supplycost
FROM part
JOIN ps ON p_partkey = ps.partkey
JOIN supplier ON s_suppkey = ps.suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE p_size <= 5 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
  AND ps.supplycost = (
    SELECT min(ps2.supplycost)
    FROM ps ps2
    JOIN supplier s2 ON s2.s_suppkey = ps2.suppkey
    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
    WHERE ps2.partkey = p_partkey AND r2.r_name = 'EUROPE')
""",
    ("part", "lineitem", "supplier", "nation", "region"),
    doc="TPC-H q2 shape: correlated scalar-min over the cost relation + region chain",
)

QUERIES["tpch_q9_product_type_profit"] = _shared(
    """
SELECT nation, o_year,
       CAST(round(sum(amount), 2) AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name AS nation,
         CAST(year(o_orderdate) AS INTEGER) AS o_year,
         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))
           - CAST(0.6 * p_retailprice * l_quantity AS DECIMAL(28,8)) AS amount
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
""",
    ("part", "lineitem", "supplier", "orders", "nation"),
    doc="TPC-H q9 shape: 5-way join, per-line profit expression, nation×year rollup",
)

# fraction-of-total threshold compared as round(v/total, 9): both
# engines derive the SAME doubles from the same exact decimals, so the
# comparison can't flip on summation order (tfidf r9 pattern)
QUERIES["tpch_q11_important_stock"] = _shared(
    """
WITH val AS (
  SELECT l_partkey AS partkey,
         sum(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                  * CAST(l_quantity AS DECIMAL(18,4)) AS DECIMAL(38,8))) AS v
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
  GROUP BY 1
)
SELECT partkey, CAST(round(v, 2) AS DOUBLE) AS value
FROM val
WHERE round(CAST(v AS DOUBLE) / (SELECT CAST(sum(v) AS DOUBLE) FROM val), 9)
      >= 0.0012
""",
    ("lineitem", "supplier", "nation", "region"),
    doc="TPC-H q11 shape: group value vs fraction-of-total scalar subquery",
)

QUERIES["tpch_q16_parts_supplier_relationship"] = _shared(
    """
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
    ("part", "lineitem", "supplier"),
    doc="TPC-H q16 shape: null-aware NOT IN anti-join + count-distinct rollup",
)

QUERIES["tpch_q20_potential_promotion"] = _shared(
    """
SELECT s_name, round(s_acctbal, 2) + 0.0 AS s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_suppkey
    HAVING sum(l_quantity) > 50)
""",
    ("supplier", "nation", "region", "lineitem", "part"),
    doc="TPC-H q20 shape: nested IN chain gated by a HAVING quantity threshold",
)

QUERIES["agg_grouping_sets"] = _shared(
        """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       round(CAST(sum(l_quantity) AS DOUBLE), 2) AS sum_qty,
       count(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus), ())
""",
        ("lineitem",),
    doc="explicit GROUPING SETS (beyond rollup/cube)",
)

QUERIES["correlated_scalar_subquery"] = _shared(
        """
SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
FROM orders o
WHERE o_totalprice > 2 * (SELECT avg(o2.o_totalprice) FROM orders o2
                          WHERE o2.o_custkey = o.o_custkey)
""",
        ("orders",),
    doc="correlated scalar subquery (decorrelated to an agg join by Catalyst)",
)

QUERIES["monthly_revenue_trend"] = _shared(
        """
SELECT CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS STRING) AS month,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
       count(*) AS n_orders
FROM orders
GROUP BY 1
""",
        ("orders",),
    doc="time-bucketed trend agg (date_trunc shared semantics)",
)


def _q_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-stage aggregation (operators.scale.salted_agg); the
    oracle is the PLAIN groupBy — salting must be invisible in results."""
    from ..operators.scale import salted_agg

    orders = load_table(spark, sf_dir, "orders").withColumn(
        # exact decimal money column: the two-stage (partial-then-final)
        # salted sum must be order-independent to equal the plain-groupBy
        # oracle bit-for-bit at any scale
        "o_totalprice_dec", F.col("o_totalprice").cast("decimal(18,4)")
    )
    out = salted_agg(
        orders,
        ["o_orderpriority"],
        {"n_orders": ("o_orderkey", "count"), "total": ("o_totalprice_dec", "sum")},
        n_salts=16,
    )
    return out.select(
        "o_orderpriority",
        "n_orders",
        F.round(F.col("total"), 2).cast("double").alias("total"),
    )


QUERIES["salted_groupby_equivalence"] = Q(
    _q_salted,
    """
SELECT o_orderpriority, count(*) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total
FROM orders GROUP BY 1
""",
    doc="skew salting: two-stage agg ≡ plain groupBy (the skew-mitigation path)",
)


# epoch-seconds has no engine-shared spelling (Spark: unix_timestamp,
# DuckDB: epoch) — template the one differing expression.
_RANGE_TMPL = """
SELECT o_orderkey, o_custkey,
       round(CAST(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY {EPOCH}
         RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE), 2)
       AS revenue_30d
FROM orders
"""


def _q_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_RANGE_TMPL.format(EPOCH="unix_timestamp(o_orderdate)"))


QUERIES["window_range_frame"] = Q(
    _q_range_frame,
    _RANGE_TMPL.format(EPOCH="CAST(floor(epoch(o_orderdate)) AS BIGINT)"),
    doc="RANGE-frame window: per-customer trailing-30-day revenue",
)

QUERIES["window_ntile_lag"] = _shared(
    """
SELECT o_orderkey,
       CAST(ntile(4) OVER w AS INTEGER) AS price_quartile,
       round(o_totalprice - lag(o_totalprice, 1, o_totalprice) OVER w, 2) AS delta_prev,
       round(CAST(percent_rank() OVER w AS DOUBLE), 6) AS pct_rank
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY round(o_totalprice, 2), o_orderkey)
""",
    ("orders",),
    doc="window-function sampler: ntile / lag-with-default / percent_rank",
)

QUERIES["join_full_outer_reconciliation"] = _shared(
    """
SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
       max(c.c_mktsegment) AS segment,
       count(o.o_orderkey) AS n_big_orders
FROM (SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING') c
FULL OUTER JOIN (SELECT o_custkey, o_orderkey FROM orders WHERE o_totalprice > 350000) o
  ON c.c_custkey = o.o_custkey
GROUP BY 1
""",
    ("customer", "orders"),
    doc="FULL OUTER join (both-sides-filtered reconciliation; the join kind no other query covers)",
)

QUERIES["agg_median_mode"] = _shared(
    """
SELECT l_returnflag,
       round(CAST(median(l_quantity) AS DOUBLE), 6) AS median_qty,
       CAST(mode(l_linestatus) AS STRING) AS mode_status,
       round(CAST(stddev_samp(l_extendedprice) AS DOUBLE), 4) AS stddev_price
FROM lineitem
GROUP BY l_returnflag
""",
    ("lineitem",),
    doc="median / mode / stddev aggregate sampler",
)


def _q_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative DQ suite over orders: four row rules in ONE scan
    (conditional sums, map-side partials), key uniqueness (one keyed
    shuffle), referential integrity vs customer (broadcast anti-join).
    Output is one tiny row per rule."""
    from ..operators import expectations as X

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    rows = X.check_rows(
        orders,
        {
            "orderdate_not_null": F.col("o_orderdate").isNotNull(),
            "priority_format": F.col("o_orderpriority").rlike("^[1-5]-"),
            "status_in_set": F.col("o_orderstatus").isin("O", "F", "P"),
            "totalprice_positive": F.col("o_totalprice") > 0,
        },
    )
    uniq = X.check_unique(orders, ["o_orderkey"])
    ref = X.check_references(orders, "o_custkey", customer, "c_custkey")
    return X.expectation_suite(rows, uniq, ref)


QUERIES["dq_expectations_orders"] = Q(
    _q_dq_expectations,
    """
WITH row_rules AS (
  SELECT count(*)::BIGINT AS n,
         sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)::BIGINT AS v_date,
         sum(CASE WHEN o_orderpriority IS NULL
                   OR NOT regexp_matches(o_orderpriority, '^[1-5]-')
                  THEN 1 ELSE 0 END)::BIGINT AS v_prio,
         sum(CASE WHEN o_orderstatus IS NULL
                   OR o_orderstatus NOT IN ('O','F','P')
                  THEN 1 ELSE 0 END)::BIGINT AS v_status,
         sum(CASE WHEN o_totalprice IS NULL OR NOT (o_totalprice > 0)
                  THEN 1 ELSE 0 END)::BIGINT AS v_price
  FROM orders
), uniq AS (
  SELECT count(*)::BIGINT AS n,
         (count(*) - count(DISTINCT o_orderkey))::BIGINT AS v
  FROM orders
), ref AS (
  SELECT count(*)::BIGINT AS n,
         sum(CASE WHEN c._pk IS NULL THEN 1 ELSE 0 END)::BIGINT AS v
  FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey AS _pk FROM customer) c
    ON o.o_custkey = c._pk
)
SELECT rule, n_rows, n_violations,
       CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS pass_flag
FROM (
  SELECT 'orderdate_not_null' AS rule, n AS n_rows, v_date AS n_violations FROM row_rules
  UNION ALL SELECT 'priority_format', n, v_prio FROM row_rules
  UNION ALL SELECT 'status_in_set', n, v_status FROM row_rules
  UNION ALL SELECT 'totalprice_positive', n, v_price FROM row_rules
  UNION ALL SELECT 'unique_o_orderkey', n, v FROM uniq
  UNION ALL SELECT 'ref_o_custkey_in_c_custkey', n, v FROM ref
)
""",
    doc="declarative data-quality suite: row rules one-scan, uniqueness, referential integrity",
)


def _q_morton(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout key over two event dimensions — the clustering
    expression behind cluster_by_morton, oracle-checked bit-for-bit
    (portable shifts/AND only). Map-side codegen, zero shuffle."""
    from ..operators.layout import morton_key

    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        morton_key(F.col("user_id") % 1024, F.col("event_id") % 1024, bits=10).alias(
            "zkey"
        ),
    )


def _morton_oracle() -> str:
    from ..operators.layout import morton_sql

    return (
        "SELECT event_id, "
        + morton_sql("user_id % 1024", "event_id % 1024", 10)
        + " AS zkey FROM events"
    )


QUERIES["layout_morton_key"] = Q(
    _q_morton,
    _morton_oracle(),
    doc="Z-order (Morton) clustering key: bit-interleave of two bucketed dimensions",
)


def _q_compaction_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-compaction binning over the corpus listing: global running
    byte total via the DISTRIBUTED prefix sum (no single-partition
    window), then bin = floor(exclusive_prefix / target) — each doc
    lands in the bin where it starts."""
    from ..operators.scale import distributed_running_sum

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    run = distributed_running_sum(docs, ["doc_id"], "n_chars", num_partitions=8)
    return run.select(
        "doc_id",
        F.col("running_n_chars").cast("bigint").alias("running_n_chars"),
        F.floor(
            (F.col("running_n_chars") - F.col("n_chars")) / F.lit(100000.0)
        ).cast("bigint").alias("bin"),
    )


QUERIES["layout_compaction_bins"] = Q(
    _q_compaction_bins,
    """
SELECT doc_id,
       CAST(sum(n_chars) OVER w AS BIGINT) AS running_n_chars,
       CAST(floor((sum(n_chars) OVER w - n_chars) / 100000.0) AS BIGINT) AS bin
FROM documents
WINDOW w AS (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
    doc="compaction-bin planning: distributed global running sum (two-phase prefix), floor-binned",
)


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _q_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decimal-exact Pearson matrix over lineitem numerics — one scan,
    order-independent moments (vs engine-varying running-double corr)."""
    from ..operators.profile import profile_correlations
    from ..sources.tables import ensure_parallelism

    # 90 decimal-exact conditional sums over a 1-row-group (1-task) scan
    # pin the whole matrix to one core; spreading the scan is a pure-agg
    # win (measured 10.9 s -> 2.0 s; same rule as tpch_q1)
    li = ensure_parallelism(load_table(spark, sf_dir, "lineitem"))
    return profile_correlations(li, _CORR_COLS)


def _corr_oracle(cols: list[str]) -> str:
    """DuckDB mirror generated from the SAME pair loop as the operator."""
    selects = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            # quantize at 6 dp exactly like the operator. The holder is
            # (28,6) — NOT the operator's (18,6) — because DuckDB
            # multiplies width-18 decimals in int64 (overflows); (28,6)
            # forces int128. Within the |x| < 1e12 domain guard the
            # quantized VALUE is identical in either holder, so the
            # engines still agree bit-for-bit.
            qa = f"CAST({a} AS DECIMAL(28,6))"
            qb = f"CAST({b} AS DECIMAL(28,6))"
            both = (
                f"{a} IS NOT NULL AND {b} IS NOT NULL"
                f" AND abs({a}) < 1e12 AND abs({b}) < 1e12"
            )
            n = f"CAST(sum(CASE WHEN {both} THEN 1 END) AS BIGINT)"
            sx = f"CAST(sum(CASE WHEN {both} THEN {qa} END) AS DOUBLE)"
            sy = f"CAST(sum(CASE WHEN {both} THEN {qb} END) AS DOUBLE)"
            sxy = f"CAST(sum(CASE WHEN {both} THEN CAST({qa} * {qb} AS DECIMAL(38,12)) END) AS DOUBLE)"
            sxx = f"CAST(sum(CASE WHEN {both} THEN CAST({qa} * {qa} AS DECIMAL(38,12)) END) AS DOUBLE)"
            syy = f"CAST(sum(CASE WHEN {both} THEN CAST({qb} * {qb} AS DECIMAL(38,12)) END) AS DOUBLE)"
            nn = f"CAST({n} AS DOUBLE)"
            cov = f"({nn} * {sxy} - {sx} * {sy})"
            vx = f"({nn} * {sxx} - {sx} * {sx})"
            vy = f"({nn} * {syy} - {sy} * {sy})"
            corr = (
                f"CASE WHEN {vx} > 0 AND {vy} > 0 "
                f"THEN round({cov} / sqrt({vx} * {vy}), 6) + 0.0 END"
            )
            selects.append(
                f"SELECT '{a}' AS col_a, '{b}' AS col_b, {n} AS n, {corr} AS corr FROM lineitem"
            )
    return "\nUNION ALL\n".join(selects)


QUERIES["profile_correlations_lineitem"] = Q(
    _q_correlations,
    _corr_oracle(_CORR_COLS),
    doc="pairwise Pearson matrix with decimal-exact (order-independent) moments, one scan",
)


def _q_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth price histogram — broadcast exact-quantile boundaries,
    map-side bucketing; no single-partition ntile window."""
    from ..operators.profile import equidepth_histogram
    from ..sources.tables import ensure_parallelism

    # exact-percentile partial agg + bucket pass over a 1-task scan:
    # spread it (pure-agg win, same rule as tpch_q1)
    li = ensure_parallelism(load_table(spark, sf_dir, "lineitem"))
    return equidepth_histogram(li, "l_extendedprice", buckets=10)


def _equidepth_oracle(col: str, buckets: int) -> str:
    probs = [i / buckets for i in range(1, buckets)]
    qs = ", ".join(
        f"quantile_cont({col}, {p!r}) AS q{i}" for i, p in enumerate(probs)
    )
    terms = " + ".join(f"({col} >= q{i})::INT" for i in range(len(probs)))
    return f"""
WITH b AS (SELECT {qs} FROM lineitem WHERE {col} IS NOT NULL)
SELECT {terms} AS bucket, count(*)::BIGINT AS n,
       round(min({col}), 6) AS lo, round(max({col}), 6) AS hi
FROM lineitem, b WHERE {col} IS NOT NULL GROUP BY 1
"""


QUERIES["agg_equidepth_histogram"] = Q(
    _q_equidepth,
    _equidepth_oracle("l_extendedprice", 10),
    doc="equi-depth histogram via broadcast exact-quantile boundaries (no global ntile window)",
)


def _q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized summary of the heavy tail: clip event values at the
    exact 1st/99th percentiles, report per-flag counts and the
    decimal-exact mean of the clipped column."""
    from ..operators.profile import clip_outliers

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    clipped = clip_outliers(ev, "value", 0.01, 0.99)
    q = F.col("value_clipped").cast("decimal(18,6)")
    return clipped.groupBy("clip_flag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.sum(q).cast("double") / F.count(F.lit(1)), 6).alias("mean_clipped"),
    )


QUERIES["profile_winsorized_values"] = Q(
    _q_winsorize,
    """
WITH b AS (
  SELECT quantile_cont(value, 0.01) AS lo, quantile_cont(value, 0.99) AS hi
  FROM events WHERE value IS NOT NULL
), c AS (
  SELECT CASE WHEN value < lo THEN -1 WHEN value > hi THEN 1 ELSE 0 END AS clip_flag,
         CAST(least(greatest(value, lo), hi) AS DECIMAL(18,6)) AS vc
  FROM events, b WHERE value IS NOT NULL
)
SELECT clip_flag, count(*)::BIGINT AS n,
       round(CAST(sum(vc) AS DOUBLE) / count(*), 6) AS mean_clipped
FROM c GROUP BY 1
""",
    doc="winsorization at exact percentile bounds (broadcast 1-row bounds, map-side clip)",
)


def _q_kmv_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type from k=64 per-group KMV sketches
    (bounded state; sketch rows merge across shards/days)."""
    from ..operators.rollup import kmv_distinct_per_group

    ev = load_table(spark, sf_dir, "events")
    return kmv_distinct_per_group(ev, "event_type", "user_id", k=64)


QUERIES["sketch_distinct_per_group"] = Q(
    _q_kmv_per_group,
    f"""
WITH d AS (
  SELECT DISTINCT event_type AS g,
         (('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
          / CAST({float(16**15)} AS DOUBLE)) AS h
  FROM events WHERE user_id IS NOT NULL
), r AS (
  SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn FROM d
)
SELECT g AS event_type, count(*)::BIGINT AS n_kept,
       round(max(h), 9) AS kth_hash,
       round(CASE WHEN count(*) < 64 THEN count(*)::DOUBLE
                  ELSE 63 / max(h) END, 3) AS estimate
FROM r WHERE rn <= 64 GROUP BY 1
""",
    doc="per-group KMV distinct estimates (bounded, mergeable per-group sketch state)",
)


_PSI_CUTOFF = 1705363200  # 2024-01-16 UTC: splits the 30-day event span


def _q_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-distribution drift between the first and second half of
    the event stream (PSI over baseline-decile bins)."""
    from ..functions.derivations import epoch_seconds
    from ..operators.profile import psi_drift

    ev = load_table(spark, sf_dir, "events")
    sec = epoch_seconds(F.col("ts"))
    return psi_drift(
        ev.filter(sec < _PSI_CUTOFF), ev.filter(sec >= _PSI_CUTOFF), "value", 10
    )


def _psi_oracle(buckets: int = 10) -> str:
    probs = [i / buckets for i in range(1, buckets)]
    qs = ", ".join(f"quantile_cont(value, {p!r}) AS q{i}" for i, p in enumerate(probs))
    terms = " + ".join(f"(value >= q{i})::INT" for i in range(len(probs)))
    return f"""
WITH base AS (SELECT value FROM events
              WHERE value IS NOT NULL AND epoch(ts) < {_PSI_CUTOFF}),
cur AS (SELECT value FROM events
        WHERE value IS NOT NULL AND epoch(ts) >= {_PSI_CUTOFF}),
bd AS (SELECT {qs} FROM base),
bb AS (SELECT {terms} AS bucket, count(*)::BIGINT AS n_base FROM base, bd GROUP BY 1),
cc AS (SELECT {terms} AS bucket, count(*)::BIGINT AS n_cur FROM cur, bd GROUP BY 1),
j AS (SELECT coalesce(bb.bucket, cc.bucket) AS bucket,
             coalesce(n_base, 0) AS n_base, coalesce(n_cur, 0) AS n_cur
      FROM bb FULL JOIN cc ON bb.bucket = cc.bucket),
t AS (SELECT bucket,
             (n_base + 1) / (sum(n_base) OVER () + {buckets}) AS p,
             (n_cur + 1) / (sum(n_cur) OVER () + {buckets}) AS q
      FROM j)
SELECT bucket, round(p, 6) AS p_baseline, round(q, 6) AS p_current,
       round((q - p) * ln(q / p), 6) AS psi_term
FROM t
"""


QUERIES["drift_psi_values"] = Q(
    _q_psi,
    _psi_oracle(10),
    doc="PSI drift monitor: baseline-decile bins broadcast, per-bucket drift terms",
)


def _q_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level DQ routing: orders grouped by first failed rule
    (NULL group = clean rows) — the quarantine split report."""
    from ..operators.expectations import quarantine

    orders = load_table(spark, sf_dir, "orders")
    routed = quarantine(
        orders,
        {
            "priority_urgent": F.col("o_orderpriority").rlike("^[1-3]-"),
            "status_closed": F.col("o_orderstatus").isin("O", "F"),
            "totalprice_big": F.col("o_totalprice") > 150000,
        },
    )
    return routed.groupBy("failed_rule").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )


QUERIES["dq_quarantine_orders"] = Q(
    _q_quarantine,
    """
SELECT CASE
         WHEN o_orderpriority IS NULL
              OR NOT regexp_matches(o_orderpriority, '^[1-3]-') THEN 'priority_urgent'
         WHEN o_orderstatus IS NULL
              OR o_orderstatus NOT IN ('O','F') THEN 'status_closed'
         WHEN o_totalprice IS NULL OR NOT (o_totalprice > 150000) THEN 'totalprice_big'
       END AS failed_rule,
       count(*)::BIGINT AS n_rows
FROM orders GROUP BY 1
""",
    doc="row-level DQ quarantine routing (first failed rule per row, map-side CASE chain)",
)


def _q_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed tokenization of customer ids: same salt → same token, so
    cross-table joins survive the clearing pass."""
    from ..functions.derivations import pseudonymize

    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        pseudonymize(F.col("c_custkey"), "s42").alias("token"),
    )


QUERIES["privacy_pseudonymize_customers"] = Q(
    _q_pseudonymize,
    "SELECT c_custkey, md5('s42:' || CAST(c_custkey AS VARCHAR)) AS token FROM customer",
    doc="deterministic keyed tokenization (referential-integrity-preserving pseudonymization)",
)


def _q_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew report for the order join key: top-10 customers by order
    count with row share and cumulative share."""
    from ..operators.profile import profile_key_skew

    return profile_key_skew(load_table(spark, sf_dir, "orders"), "o_custkey", 10)


QUERIES["profile_key_skew"] = Q(
    _q_key_skew,
    """
WITH c AS (
  SELECT coalesce(CAST(o_custkey AS VARCHAR), '<NULL>') AS key,
         count(*)::BIGINT AS n_rows
  FROM orders GROUP BY 1
), t AS (SELECT sum(n_rows)::DOUBLE AS total FROM c),
top AS (
  SELECT key, n_rows FROM c ORDER BY n_rows DESC, key ASC LIMIT 10
)
SELECT key, n_rows,
       round(n_rows / t.total, 6) AS share,
       round(sum(n_rows) OVER (ORDER BY n_rows DESC, key ASC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             / t.total, 6) AS cum_share
FROM top, t
""",
    doc="key-skew diagnostic: top-N heavy keys with shares (the pre-salting report)",
)


# --- round-7 additions: multiset set-ops, null-aware NOT IN semantics,
# k-anonymity audit ---

QUERIES["set_intersect_all"] = _shared(
    """
SELECT nationkey, CAST(count(*) AS BIGINT) AS n
FROM (
  SELECT c_nationkey AS nationkey FROM customer
  INTERSECT ALL
  SELECT s_nationkey FROM supplier
) m
GROUP BY nationkey
""",
    ("customer", "supplier"),
    doc="INTERSECT ALL multiset semantics (per-value min of multiplicities)",
)

# NOT IN over a subquery containing NULLs is three-valued: one NULL in
# the list makes `x NOT IN (...)` never TRUE, so the count collapses to
# 0 while NOT EXISTS (binary, null-safe) keeps matching — THE classic
# anti-join correctness trap, pinned here across both engines. The
# NULLs are synthesized deterministically from event_type.
QUERIES["join_not_in_null_semantics"] = _shared(
    """
SELECT
  (SELECT count(*) FROM orders
   WHERE o_custkey NOT IN
     (SELECT CASE WHEN event_type = 'error' THEN NULL ELSE user_id END
      FROM events)) AS not_in_cnt,
  (SELECT count(*) FROM orders o
   WHERE NOT EXISTS
     (SELECT 1 FROM events e
      WHERE CASE WHEN e.event_type = 'error' THEN NULL ELSE e.user_id END
            = o.o_custkey)) AS not_exists_cnt
""",
    ("orders", "events"),
    doc="null-aware NOT IN vs NOT EXISTS divergence (three-valued anti-join semantics)",
)


def _q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release-gate privacy audit: quasi-identifier combos (nation,
    segment, coarse balance bucket) with fewer than k=5 customers —
    each listed combo needs generalization or suppression."""
    from ..operators.expectations import k_anonymity_audit

    cust = load_table(spark, sf_dir, "customer").withColumn(
        "bal_bucket", F.floor(F.col("c_acctbal") / 1000).cast("bigint")
    )
    return k_anonymity_audit(
        cust, ["c_nationkey", "c_mktsegment", "bal_bucket"], k=5
    )


QUERIES["privacy_k_anonymity"] = Q(
    _q_k_anonymity,
    """
SELECT coalesce(CAST(c_nationkey AS VARCHAR), '<NULL>') AS c_nationkey,
       coalesce(c_mktsegment, '<NULL>') AS c_mktsegment,
       coalesce(CAST(CAST(floor(c_acctbal / 1000) AS BIGINT) AS VARCHAR),
                '<NULL>') AS bal_bucket,
       CAST(count(*) AS BIGINT) AS n_rows
FROM customer
GROUP BY 1, 2, 3
HAVING count(*) < 5
""",
    doc="k-anonymity audit: QI combos below k (re-identifiable rows before release)",
)


def _q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe salted join ≡ plain join (the oracle IS the plain
    form): orders ⋈ customer over 16 salts, rolled up per segment."""
    from ..operators.scale import salted_join

    orders = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_custkey", "custkey"
    )
    cust = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "custkey"
    ).select("custkey", "c_mktsegment")
    j = salted_join(orders, cust, ["custkey"], n_salts=16)
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2
        ).cast("double").alias("total_price"),
    )


QUERIES["join_skew_salted_equivalence"] = Q(
    _q_salted_join,
    """
SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
    doc="salted (16-way) skew-safe join == plain join (deterministic AQE-skew fallback)",
)


# --- round-7 SQL-surface completions: FILTER clause, ordered string
# agg, pure-inequality (theta) join ---

QUERIES["agg_filter_clause"] = _shared(
    """
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) FILTER (WHERE l_discount > 0.05) AS BIGINT) AS n_discounted,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)))
                  FILTER (WHERE l_quantity > 25), 2) AS DOUBLE) AS big_qty_price
FROM lineitem GROUP BY 1
""",
    ("lineitem",),
    doc="ANSI FILTER (WHERE …) conditional aggregation clause",
)


def _q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string rollup per region: deterministic via sort before
    join (collect_list order is partition-dependent; sort_array fixes
    it — the registry's rounded-rank convention applied to strings)."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.concat_ws(
                "|", F.sort_array(F.collect_list("n_name"))
            ).alias("nations"),
            F.count(F.lit(1)).cast("bigint").alias("n_nations"),
        )
    )


QUERIES["agg_string_concat_ordered"] = Q(
    _q_string_agg,
    """
SELECT r_name, string_agg(n_name, '|' ORDER BY n_name) AS nations,
       CAST(count(*) AS BIGINT) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
""",
    doc="ordered string aggregation (listagg/string_agg shape, order pinned)",
)

# a join with NO equality predicate compiles to BroadcastNestedLoopJoin —
# the physical shape every banding/range-lookup query without an equi key
# needs; pinned here so the path stays exercised (the bucketed range join
# in timejoin.py is the scale path when the bands table grows)
QUERIES["join_theta_bands"] = _shared(
    """
SELECT lo, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total
FROM orders JOIN (
  VALUES (0.0, 150000.0), (150000.0, 300000.0), (300000.0, 1000000000.0)
) AS bands(lo, hi)
  ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY lo
""",
    ("orders",),
    doc="pure-inequality (theta) band join -> BroadcastNestedLoopJoin physical path",
)


def _q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit: QI combos whose market segment is carried by
    fewer than 3 distinct values — large-but-homogeneous groups leak
    the sensitive attribute even when k-anonymous."""
    from ..operators.expectations import l_diversity_audit

    cust = load_table(spark, sf_dir, "customer").withColumn(
        "bal_bucket", F.floor(F.col("c_acctbal") / 1000).cast("bigint")
    )
    return l_diversity_audit(
        cust, ["c_nationkey", "bal_bucket"], "c_mktsegment", l=3
    )


QUERIES["privacy_l_diversity"] = Q(
    _q_l_diversity,
    """
SELECT coalesce(CAST(c_nationkey AS VARCHAR), '<NULL>') AS c_nationkey,
       coalesce(CAST(CAST(floor(c_acctbal / 1000) AS BIGINT) AS VARCHAR),
                '<NULL>') AS bal_bucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_distinct_sensitive
FROM customer
GROUP BY 1, 2
HAVING count(DISTINCT c_mktsegment) < 3
""",
    doc="l-diversity audit: QI combos with a homogeneous sensitive attribute",
)


QUERIES["window_ratio_to_report"] = _shared(
    """
SELECT o_orderkey, o_orderpriority,
       round(CAST(o_totalprice AS DOUBLE)
             / CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
                    OVER (PARTITION BY o_orderpriority) AS DOUBLE), 9) + 0.0
         AS share_of_priority
FROM orders
""",
    ("orders",),
    doc="ratio-to-report window: each row's share of its partition total (BI staple)",
)

QUERIES["agg_rollup_grouping_id"] = _shared(
    """
SELECT coalesce(l_returnflag, '-') AS returnflag,
       coalesce(l_linestatus, '-') AS linestatus,
       CAST(grouping(l_returnflag) AS INTEGER) AS g_flag,
       CAST(grouping(l_linestatus) AS INTEGER) AS g_status,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
    ("lineitem",),
    doc="GROUPING() markers on rollup levels (subtotal rows distinguished from NULL data)",
)


def _q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI UNPIVOT (DataFrame ``unpivot``): wide per-part numeric
    columns to (part, metric, value) long form — the melt every
    metrics table needs before generic per-metric analysis."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.select(
            "p_partkey",
            F.col("p_size").cast("double").alias("size"),
            F.round(F.col("p_retailprice"), 2).alias("retailprice"),
        )
        .unpivot("p_partkey", ["size", "retailprice"], "metric", "value")
    )


QUERIES["agg_unpivot_metrics"] = Q(
    _q_unpivot,
    """
SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
UNION ALL
SELECT p_partkey, 'retailprice' AS metric, round(p_retailprice, 2) AS value FROM part
""",
    doc="UNPIVOT/melt: wide metric columns to long (part, metric, value) form",
)


QUERIES["window_first_last_frame"] = _shared(
    """
SELECT o_orderkey,
       first_value(o_orderkey) OVER w AS priciest_order,
       last_value(o_orderkey) OVER (
         PARTITION BY o_orderpriority
         ORDER BY round(o_totalprice, 2) DESC, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       ) AS cheapest_order,
       nth_value(o_orderkey, 2) OVER (
         PARTITION BY o_orderpriority
         ORDER BY round(o_totalprice, 2) DESC, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       ) AS runner_up_order
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY round(o_totalprice, 2) DESC, o_orderkey)
""",
    ("orders",),
    doc="first/last/nth_value with explicit full frames (last_value's default-frame trap pinned)",
)

QUERIES["agg_fixed_width_histogram"] = _shared(
    """
SELECT CAST(floor(value / 25.0) AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       round(min(value), 6) AS lo,
       round(max(value), 6) AS hi
FROM events
WHERE value IS NOT NULL
GROUP BY 1
""",
    ("events",),
    doc="fixed-width histogram (floor-bucket groupBy — the equi-WIDTH twin of the equi-depth one)",
)

# global hash ORDER BY: fine at report scale; the every-nth contract is
# for auditable systematic samples — for rate-based sampling at corpus
# scale use sampling.deterministic_sample (no global sort)
QUERIES["sample_systematic_every_nth"] = _shared(
    """
SELECT doc_id, CAST(rn AS BIGINT) AS sample_rank
FROM (
  SELECT doc_id,
         row_number() OVER (ORDER BY md5(CAST(doc_id AS STRING)), doc_id) AS rn
  FROM documents
)
WHERE rn % 20 = 1
""",
    ("documents",),
    doc="systematic every-nth sampling over portable hash order (audit-sample contract)",
)


# --- round-8: partition-pruned batch MERGE into a persisted table ---

_EBUCKET = "(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT % 10000)"


def _q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-pruned MERGE certification (round 8): persist events
    partitioned by event_type, build a deterministic delta touching
    ONLY the 'click' and 'error' partitions (updates: bucket<1000 rows
    get a ' [v2]' props suffix; deletes: bucket in [1000,1500);
    inserts: bucket<300 re-keyed +10M with ' [new]'), run
    operators.scale.merge_into_partitioned, and summarize the FINAL
    table per event_type. The three untouched partitions must survive
    byte-identically (their files are never rewritten — dynamic
    partition overwrite), which the id_checksum certifies; the oracle
    recomputes the post-merge state relationally (anti-join + union).

    Scale shape: delta-sized work only — touched-partition scan, one
    anti-join shuffle on the key, rewrite of 2/5 partitions."""
    import shutil
    import tempfile

    from ..operators.sampling import rate_bucket
    from ..operators.scale import merge_into_partitioned

    ev = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="merge_target_")
    path = f"{work}/events_by_type"
    try:
        ev.write.partitionBy("event_type").parquet(path, mode="overwrite")

        b = rate_bucket(F.col("event_id"))
        touched = F.col("event_type").isin("click", "error")
        upd = ev.filter(touched & (b < 1000)).withColumn(
            "props", F.concat(F.col("props"), F.lit(" [v2]"))
        ).withColumn("op", F.lit("U"))
        dele = ev.filter(touched & (b >= 1000) & (b < 1500)).withColumn(
            "op", F.lit("D")
        )
        ins = (
            ev.filter(touched & (b < 300))
            .withColumn("event_id", F.col("event_id") + F.lit(10_000_000))
            .withColumn("props", F.concat(F.col("props"), F.lit(" [new]")))
            .withColumn("op", F.lit("U"))
        )
        updates = upd.unionByName(dele).unionByName(ins)
        merge_into_partitioned(
            spark, path, updates, ["event_id"], ["event_type"], op_col="op"
        )

        final = spark.read.parquet(path)
        manifest = (
            final.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum(
                    F.when(F.col("props").contains("[v2]"), 1).otherwise(0)
                ).cast("bigint").alias("n_updated"),
                F.sum(
                    F.when(F.col("event_id") >= 10_000_000, 1).otherwise(0)
                ).cast("bigint").alias("n_inserted"),
                F.sum("event_id").cast("bigint").alias("id_checksum"),
            )
            .collect()  # materialize before the temp table is removed
        )
        return local_df(
            spark,
            manifest,
            "event_type string, n_rows bigint, n_updated bigint,"
            " n_inserted bigint, id_checksum bigint",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["merge_upsert_partitioned"] = Q(
    _q_merge_upsert,
    f"""
WITH ev AS (SELECT *, {_EBUCKET} AS bk,
                   event_type IN ('click', 'error') AS touched
            FROM events),
upd AS (SELECT event_id, event_type, props || ' [v2]' AS props
        FROM ev WHERE touched AND bk < 1000),
del AS (SELECT event_id FROM ev WHERE touched AND bk >= 1000 AND bk < 1500),
ins AS (SELECT event_id + 10000000 AS event_id, event_type,
               props || ' [new]' AS props
        FROM ev WHERE touched AND bk < 300),
keys AS (SELECT event_id FROM upd UNION ALL SELECT event_id FROM del),
surv AS (SELECT e.event_id, e.event_type, e.props
         FROM ev e LEFT JOIN keys k USING (event_id)
         WHERE k.event_id IS NULL),
final AS (
  SELECT * FROM surv
  UNION ALL SELECT * FROM upd
  UNION ALL SELECT * FROM ins
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN props LIKE '%[v2]%' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_updated,
       CAST(sum(CASE WHEN event_id >= 10000000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_inserted,
       CAST(sum(event_id) AS BIGINT) AS id_checksum
FROM final
GROUP BY 1
""",
    doc="partition-pruned MERGE (upsert/delete/insert) into persisted table == relational recomputation",
)


_DBUCKET = "(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000)"


def _q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution certification (round 8): a long-lived table's
    early files carry an OLD schema (doc_id, text, lang) and later
    files an EVOLVED one (adds source, n_chars, and a new
    quality_tier). Reading with mergeSchema must surface the union
    schema with NULLs for columns a file predates — summarized per
    (generation, quality_tier) so a reader that drops old files,
    misaligns columns, or defaults instead of NULLing cannot
    hash-match the arithmetic oracle.

    Scale shape: schema merge is a FOOTER-only operation (one metadata
    pass over file footers, no data read) and the summary is one
    grouped agg; at 100 TB pin the table schema in the catalog and
    use mergeSchema only on evolution boundaries."""
    import shutil
    import tempfile

    from ..operators.sampling import rate_bucket

    d = load_table(spark, sf_dir, "documents")
    b = rate_bucket(F.col("doc_id"))
    work = tempfile.mkdtemp(prefix="schema_evo_")
    path = f"{work}/table"
    try:
        # generation 1: the original 3-column schema
        d.filter(b < 5000).select("doc_id", "text", "lang").write.parquet(
            path, mode="overwrite"
        )
        # generation 2: evolved — two added columns + a brand-new one
        d.filter(b >= 5000).select(
            "doc_id",
            "text",
            "lang",
            "source",
            "n_chars",
            F.when(F.col("n_chars") % 3 == 0, "hi")
            .when(F.col("n_chars") % 3 == 1, "mid")
            .otherwise("lo")
            .alias("quality_tier"),
        ).write.parquet(path, mode="append")

        merged = spark.read.option("mergeSchema", True).parquet(path)
        manifest = (
            merged.groupBy(
                # generation is derived from quality_tier (the column
                # ONLY gen2 files carry, constructed non-null), not
                # from source: a hostile fixture row with a NULL source
                # in gen2 would otherwise classify differently here
                # than in the bucket-based oracle
                F.when(F.col("quality_tier").isNull(), "gen1")
                .otherwise("gen2")
                .alias("generation"),
                F.coalesce(F.col("quality_tier"), F.lit("none")).alias(
                    "quality_tier"
                ),
            )
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                F.sum(F.coalesce(F.col("n_chars"), F.lit(0)))
                .cast("bigint")
                .alias("total_chars"),
                F.sum(F.length("text")).cast("bigint").alias("total_text_chars"),
            )
            .collect()  # materialize before the temp table is removed
        )
        return local_df(spark, 
            manifest,
            "generation string, quality_tier string, n_docs bigint,"
            " total_chars bigint, total_text_chars bigint",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["table_schema_evolution"] = Q(
    _q_schema_evolution,
    f"""
WITH gen AS (
  SELECT doc_id, text, n_chars,
         CASE WHEN {_DBUCKET} < 5000 THEN 'gen1' ELSE 'gen2' END AS generation,
         CASE WHEN {_DBUCKET} < 5000 THEN 'none'
              WHEN n_chars % 3 = 0 THEN 'hi'
              WHEN n_chars % 3 = 1 THEN 'mid'
              ELSE 'lo' END AS quality_tier
  FROM documents
)
SELECT generation, quality_tier,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN generation = 'gen1' THEN 0 ELSE n_chars END)
            AS BIGINT) AS total_chars,
       CAST(sum(length(text)) AS BIGINT) AS total_text_chars
FROM gen
GROUP BY 1, 2
""",
    doc="mergeSchema evolution: union schema with NULLs for pre-evolution files == arithmetic oracle",
)


# --- round-9: atomic manifest-committed MERGE + time travel ---


def _q_merge_atomic_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atomic-commit MERGE certification (round 9): persist events as a
    MANIFEST table (operators/table.py — versioned manifests + pointer
    swap, the commit protocol under which readers see old-or-new and
    never a partition-granular tear), then run TWO merges — the r8
    upsert/delete/insert delta on the click/error partitions, then a
    view-partition delete — and summarize the final table per
    event_type with the resulting table version. Exercises the whole
    chain the plain-layout query cannot: create → manifest-routed
    merge → version advance → manifest-pruned read, with results that
    must equal the relational recomputation of both deltas.

    Scale shape: identical to the plain merge (delta-sized work,
    touched partitions only), plus O(touched) manifest metadata; the
    commit itself is two small-file writes and a rename."""
    import shutil
    import tempfile

    from ..operators.sampling import rate_bucket
    from ..operators.scale import merge_into_partitioned
    from ..operators.table import ManifestTable, read_table

    ev = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="merge_manifest_")
    path = f"{work}/events_by_type"
    try:
        mt = ManifestTable(spark, path)
        mt.create(ev, ["event_type"])

        b = rate_bucket(F.col("event_id"))
        touched = F.col("event_type").isin("click", "error")
        upd = ev.filter(touched & (b < 1000)).withColumn(
            "props", F.concat(F.col("props"), F.lit(" [v2]"))
        ).withColumn("op", F.lit("U"))
        dele = ev.filter(touched & (b >= 1000) & (b < 1500)).withColumn(
            "op", F.lit("D")
        )
        ins = (
            ev.filter(touched & (b < 300))
            .withColumn("event_id", F.col("event_id") + F.lit(10_000_000))
            .withColumn("props", F.concat(F.col("props"), F.lit(" [new]")))
            .withColumn("op", F.lit("U"))
        )
        merge_into_partitioned(
            spark, path, upd.unionByName(dele).unionByName(ins),
            ["event_id"], ["event_type"], op_col="op",
        )
        # second commit: empty-out part of the view partition —
        # advances the version chain and exercises GC + re-pruning
        dele2 = ev.filter(
            (F.col("event_type") == "view") & (b < 500)
        ).withColumn("op", F.lit("D"))
        merge_into_partitioned(
            spark, path, dele2, ["event_id"], ["event_type"], op_col="op"
        )

        version = mt.current_version()  # create=1, +2 merges → 3
        final = read_table(spark, path)
        manifest = (
            final.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum(
                    F.when(F.col("props").contains("[v2]"), 1).otherwise(0)
                ).cast("bigint").alias("n_updated"),
                F.sum(
                    F.when(F.col("event_id") >= 10_000_000, 1).otherwise(0)
                ).cast("bigint").alias("n_inserted"),
                F.sum("event_id").cast("bigint").alias("id_checksum"),
            )
            .withColumn("table_version", F.lit(version).cast("int"))
            .collect()  # materialize before the temp table is removed
        )
        return local_df(spark, 
            manifest,
            "event_type string, n_rows bigint, n_updated bigint,"
            " n_inserted bigint, id_checksum bigint, table_version int",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["merge_atomic_manifest"] = Q(
    _q_merge_atomic_manifest,
    f"""
WITH ev AS (SELECT *, {_EBUCKET} AS bk,
                   event_type IN ('click', 'error') AS touched
            FROM events),
upd AS (SELECT event_id, event_type, props || ' [v2]' AS props
        FROM ev WHERE touched AND bk < 1000),
del AS (SELECT event_id FROM ev WHERE touched AND bk >= 1000 AND bk < 1500),
ins AS (SELECT event_id + 10000000 AS event_id, event_type,
               props || ' [new]' AS props
        FROM ev WHERE touched AND bk < 300),
keys AS (SELECT event_id FROM upd UNION ALL SELECT event_id FROM del),
surv AS (SELECT e.event_id, e.event_type, e.props
         FROM ev e LEFT JOIN keys k USING (event_id)
         WHERE k.event_id IS NULL),
after1 AS (
  SELECT * FROM surv
  UNION ALL SELECT * FROM upd
  UNION ALL SELECT * FROM ins
),
del2 AS (SELECT event_id FROM ev WHERE event_type = 'view' AND bk < 500),
final AS (SELECT a.* FROM after1 a LEFT JOIN del2 d USING (event_id)
          WHERE d.event_id IS NULL OR a.event_type <> 'view')
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN props LIKE '%[v2]%' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_updated,
       CAST(sum(CASE WHEN event_id >= 10000000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_inserted,
       CAST(sum(event_id) AS BIGINT) AS id_checksum,
       CAST(3 AS INT) AS table_version
FROM final
GROUP BY 1
""",
    doc="atomic manifest-committed MERGE (two versioned commits) == relational recomputation",
)


def _q_merge_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-travel certification (round 9): a manifest table's retained
    versions are full consistent snapshots. Create v1 from the
    documents with bucket<7000, merge a delta (delete bucket<1000,
    insert bucket∈[7000,8000)) producing v2, then summarize BOTH
    versions from their manifests. v1 must still read exactly the
    pre-merge corpus (snapshot isolation across the commit) and v2 the
    post-merge one — the oracle recomputes both states arithmetically,
    so a reader that leaks rows across versions cannot hash-match.

    Scale shape: each versioned read is manifest-pruned file listing
    plus one scan; retention is bounded (retain_versions), so time
    travel costs metadata only."""
    import shutil
    import tempfile

    from ..operators.sampling import rate_bucket
    from ..operators.scale import merge_into_partitioned
    from ..operators.table import ManifestTable

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    b = rate_bucket(F.col("doc_id"))
    work = tempfile.mkdtemp(prefix="merge_tt_")
    path = f"{work}/docs_by_lang"
    try:
        mt = ManifestTable(spark, path)
        mt.create(d.filter(b < 7000), ["lang"])
        dele = d.filter(b < 1000).withColumn("op", F.lit("D"))
        ins = d.filter((b >= 7000) & (b < 8000)).withColumn("op", F.lit("U"))
        merge_into_partitioned(
            spark, path, dele.unionByName(ins), ["doc_id"], ["lang"],
            op_col="op",
        )
        rows = []
        for v in mt.versions():  # retained: [1, 2]
            s = (
                mt.read(version=v)
                .agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                    F.sum("n_chars").cast("bigint").alias("total_chars"),
                    F.sum("doc_id").cast("bigint").alias("id_checksum"),
                )
                .collect()[0]
            )
            rows.append((v, s["n_docs"], s["total_chars"], s["id_checksum"]))
        return local_df(spark, 
            rows,
            "version int, n_docs bigint, total_chars bigint,"
            " id_checksum bigint",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["merge_time_travel"] = Q(
    _q_merge_time_travel,
    f"""
WITH d AS (SELECT doc_id, n_chars, {_DBUCKET} AS bk FROM documents)
SELECT CAST(1 AS INT) AS version,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(doc_id) AS BIGINT) AS id_checksum
FROM d WHERE bk < 7000
UNION ALL
SELECT CAST(2 AS INT),
       CAST(count(*) AS BIGINT),
       CAST(sum(n_chars) AS BIGINT),
       CAST(sum(doc_id) AS BIGINT)
FROM d WHERE bk >= 1000 AND bk < 8000
""",
    doc="manifest time travel: both retained versions equal their arithmetic snapshot oracles",
)


def _q_table_incremental_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental version-diff read (round 9): the CDF-style feed a
    downstream consumer tails instead of re-reading the table. Persist
    events (id/type/props) as a manifest table, merge the standard
    update/delete/insert delta, then read ``changes(1, 2)`` — every
    updated key must surface as one delete of its exact old row plus
    one insert of its rewritten row, deletes and fresh inserts as
    single rows, and rows of untouched keys must NOT appear even
    though their partitions were rewritten. The oracle recomputes the
    full diff relationally, so both a leaked unchanged row and a
    missed change break the hash.

    Scale shape: the manifest diff names the changed partitions;
    only their two generations are scanned and the exceptAll shuffles
    only delta-sized row sets — an incremental consumer pays O(delta),
    never O(table). Reference parity: this is the read side of the
    effectively-once sink contract (SURVEY §2.f ST1) — what the
    processed-bucket consumer would tail."""
    import shutil
    import tempfile

    from ..operators.sampling import rate_bucket
    from ..operators.scale import merge_into_partitioned
    from ..operators.table import ManifestTable

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "props"
    )
    b = rate_bucket(F.col("event_id"))
    touched = F.col("event_type").isin("click", "error")
    work = tempfile.mkdtemp(prefix="table_cdf_")
    path = f"{work}/events_by_type"
    try:
        mt = ManifestTable(spark, path)
        mt.create(ev, ["event_type"])
        upd = ev.filter(touched & (b < 1000)).withColumn(
            "props", F.concat(F.col("props"), F.lit(" [v2]"))
        ).withColumn("op", F.lit("U"))
        dele = ev.filter(touched & (b >= 1000) & (b < 1500)).withColumn(
            "op", F.lit("D")
        )
        ins = (
            ev.filter(touched & (b < 300))
            .withColumn("event_id", F.col("event_id") + F.lit(10_000_000))
            .withColumn("props", F.concat(F.col("props"), F.lit(" [new]")))
            .withColumn("op", F.lit("U"))
        )
        merge_into_partitioned(
            spark, path, upd.unionByName(dele).unionByName(ins),
            ["event_id"], ["event_type"], op_col="op",
        )
        rows = (
            mt.changes(1, 2)
            .groupBy(
                "event_type",
                F.col("_change_type").alias("change_type"),
            )
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum("event_id").cast("bigint").alias("id_checksum"),
                F.sum(
                    F.when(
                        F.col("props").contains("[v2]")
                        | F.col("props").contains("[new]"),
                        1,
                    ).otherwise(0)
                ).cast("bigint").alias("n_marked"),
            )
            .collect()  # materialize before the temp table is removed
        )
        return local_df(spark, 
            rows,
            "event_type string, change_type string, n_rows bigint,"
            " id_checksum bigint, n_marked bigint",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["table_incremental_changes"] = Q(
    _q_table_incremental_changes,
    f"""
WITH ev AS (SELECT event_id, event_type, props, {_EBUCKET} AS bk,
                   event_type IN ('click', 'error') AS touched
            FROM events),
-- an update whose rewrite leaves the row identical (NULL props) is
-- NOT a change; membership derives from the data, not the op list
upd AS (SELECT event_id, event_type, props AS old_props,
               props || ' [v2]' AS new_props
        FROM ev WHERE touched AND bk < 1000
          AND props || ' [v2]' IS DISTINCT FROM props),
del AS (SELECT event_id, event_type, props FROM ev
        WHERE touched AND bk >= 1000 AND bk < 1500),
ins AS (SELECT event_id + 10000000 AS event_id, event_type,
               props || ' [new]' AS props
        FROM ev WHERE touched AND bk < 300),
deletes AS (SELECT event_type, event_id, old_props AS props FROM upd
            UNION ALL SELECT event_type, event_id, props FROM del),
inserts AS (SELECT event_type, event_id, new_props AS props FROM upd
            UNION ALL SELECT event_type, event_id, props FROM ins)
SELECT event_type, 'delete' AS change_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(event_id) AS BIGINT) AS id_checksum,
       CAST(sum(CASE WHEN props LIKE '%[v2]%' OR props LIKE '%[new]%'
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_marked
FROM deletes GROUP BY 1
UNION ALL
SELECT event_type, 'insert',
       CAST(count(*) AS BIGINT),
       CAST(sum(event_id) AS BIGINT),
       CAST(sum(CASE WHEN props LIKE '%[v2]%' OR props LIKE '%[new]%'
                     THEN 1 ELSE 0 END) AS BIGINT)
FROM inserts GROUP BY 1
""",
    doc="manifest incremental changes (CDF read): version diff == relational recomputation of the delta",
)


def _q_table_compaction_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction certification (round 9): ``ManifestTable.compact()``
    rewrites every live partition into one fresh generation — it must
    be semantically invisible. Create a documents table, merge a
    delta, compact, then return the per-lang post-compaction state
    plus two invariants computed from the metadata itself: the
    row-level diff across the compaction commit (must be 0 — consumers
    of the changes feed see data, not maintenance) and the number of
    live generations (must be 1 — the multi-merge read fans back into
    a single-generation scan). The oracle recomputes the merged state
    arithmetically and pins both constants.

    Scale shape: compaction is one full read + write of live data —
    the scheduled-maintenance cost class — and the equivalence check
    itself is manifest-diff + delta-sized exceptAll, O(changed
    partitions) = all of them here by design."""
    import shutil
    import tempfile

    from ..operators.sampling import rate_bucket
    from ..operators.scale import merge_into_partitioned
    from ..operators.table import ManifestTable

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    b = rate_bucket(F.col("doc_id"))
    work = tempfile.mkdtemp(prefix="table_compact_")
    path = f"{work}/docs_by_lang"
    try:
        mt = ManifestTable(spark, path)
        mt.create(d.filter(b < 7000), ["lang"])
        dele = d.filter(b < 1000).withColumn("op", F.lit("D"))
        ins = d.filter((b >= 7000) & (b < 8000)).withColumn("op", F.lit("U"))
        merge_into_partitioned(
            spark, path, dele.unionByName(ins), ["doc_id"], ["lang"],
            op_col="op",
        )
        mt.compact()  # v3; keep-current default retains [1, 2, 3]
        maintenance_rows = mt.changes(2, 3).count()
        gens = {
            e["dir"].split("/")[1] for e in mt.manifest()["entries"]
        }
        rows = (
            mt.read()
            .groupBy("lang")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                F.sum("n_chars").cast("bigint").alias("total_chars"),
                F.sum("doc_id").cast("bigint").alias("id_checksum"),
            )
            .withColumn(
                "compaction_row_changes",
                F.lit(maintenance_rows).cast("bigint"),
            )
            .withColumn("live_generations", F.lit(len(gens)).cast("int"))
            .collect()
        )
        return local_df(spark, 
            rows,
            "lang string, n_docs bigint, total_chars bigint,"
            " id_checksum bigint, compaction_row_changes bigint,"
            " live_generations int",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["table_compaction_equivalence"] = Q(
    _q_table_compaction_equivalence,
    f"""
WITH d AS (SELECT doc_id, lang, n_chars, {_DBUCKET} AS bk FROM documents)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(doc_id) AS BIGINT) AS id_checksum,
       CAST(0 AS BIGINT) AS compaction_row_changes,
       CAST(1 AS INT) AS live_generations
FROM d WHERE bk >= 1000 AND bk < 8000
GROUP BY 1
""",
    doc="manifest compaction is semantically invisible: state equals the merged oracle, version diff 0, one live generation",
)


# ---- round 10: manifest-table partition machinery at sf scale -------

_LINE_ID = "l_orderkey * 10 + l_linenumber"


def _q_table_multilevel_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level partitioned manifest table (round 10): persist
    lineitem keyed by a derived line id and partitioned by
    (l_returnflag, l_linestatus), merge an update/delete delta into
    the A/R partitions, and summarize the final state per partition
    pair. Certifies the single-walk partition-directory mapping
    (operators/table.py _map_partition_dirs — one breadth-first
    listing of the generation tree) on a MULTI-LEVEL layout: every
    touched (flag, status) pair must land in the manifest under its
    exact directory, untouched pairs must survive from generation 1.

    Scale shape: delta-sized merge work, O(written dirs) metadata
    RPCs for the directory mapping (not O(touched x depth)), and the
    final read is one manifest-pruned scan."""
    import shutil
    import tempfile

    from ..operators.sampling import rate_bucket
    from ..operators.scale import merge_into_partitioned
    from ..operators.table import ManifestTable

    # the fixture's (orderkey, linenumber) pairs are NOT unique —
    # collapse to one row per derived line id so the keyed merge and
    # the row-level oracle agree on what a "key" is
    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias(
                "line_id"
            )
        )
        .agg(
            F.max("l_returnflag").alias("l_returnflag"),
            F.max("l_linestatus").alias("l_linestatus"),
            F.sum("l_quantity").alias("l_quantity"),
        )
    )
    b = rate_bucket(F.col("line_id"))
    touched = F.col("l_returnflag").isin("A", "R")
    work = tempfile.mkdtemp(prefix="table_ml_")
    path = f"{work}/lineitem_by_rf_ls"
    try:
        mt = ManifestTable(spark, path)
        mt.create(li, ["l_returnflag", "l_linestatus"])
        upd = li.filter(touched & (b < 1000)).withColumn(
            "l_quantity", F.col("l_quantity") + F.lit(100)
        ).withColumn("op", F.lit("U"))
        dele = li.filter(touched & (b >= 1000) & (b < 1500)).withColumn(
            "op", F.lit("D")
        )
        merge_into_partitioned(
            spark, path, upd.unionByName(dele),
            ["line_id"], ["l_returnflag", "l_linestatus"], op_col="op",
        )
        rows = (
            mt.read()
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum("line_id").cast("bigint").alias("id_checksum"),
                F.sum(F.col("l_quantity").cast("bigint"))
                .cast("bigint")
                .alias("qty_sum"),
            )
            .collect()  # materialize before the temp table is removed
        )
        return local_df(spark, 
            rows,
            "l_returnflag string, l_linestatus string, n_rows bigint,"
            " id_checksum bigint, qty_sum bigint",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["table_multilevel_partitions"] = Q(
    _q_table_multilevel_partitions,
    f"""
WITH base AS (SELECT {_LINE_ID} AS line_id,
                     max(l_returnflag) AS l_returnflag,
                     max(l_linestatus) AS l_linestatus,
                     sum(l_quantity) AS l_quantity
              FROM lineitem GROUP BY 1),
l AS (SELECT line_id, l_returnflag, l_linestatus, l_quantity,
             (('0x' || substring(md5(CAST(line_id AS VARCHAR)), 1, 15))::BIGINT
              % 10000) AS bk,
             l_returnflag IN ('A', 'R') AS touched
      FROM base),
upd AS (SELECT line_id, l_returnflag, l_linestatus,
               l_quantity + 100 AS l_quantity
        FROM l WHERE touched AND bk < 1000),
del AS (SELECT line_id FROM l WHERE touched AND bk >= 1000 AND bk < 1500),
keys AS (SELECT line_id FROM upd UNION ALL SELECT line_id FROM del),
surv AS (SELECT l.line_id, l.l_returnflag, l.l_linestatus, l.l_quantity
         FROM l LEFT JOIN keys k ON l.line_id = k.line_id
         WHERE k.line_id IS NULL),
fin AS (SELECT * FROM surv UNION ALL SELECT * FROM upd)
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(line_id) AS BIGINT) AS id_checksum,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum
FROM fin GROUP BY 1, 2
""",
    doc="two-level partitioned manifest merge: per (returnflag, linestatus) state equals the relational recomputation",
)


_PBUCKET = "(('0x' || substring(md5(CAST(p_partkey AS VARCHAR)), 1, 15))::BIGINT % 10000)"
#: partition value with a space, '#', '/', and a NULL arm — every
#: character class the escaped-directory mapping has to survive
_PVAL = (
    "CASE WHEN p_partkey % 97 = 0 THEN NULL"
    " ELSE p_brand || ' /' || substring(p_type, 1, 5) END"
)


def _pval_col() -> F.Column:
    return F.when(F.col("p_partkey") % 97 == 0, F.lit(None)).otherwise(
        F.concat(
            F.col("p_brand"), F.lit(" /"), F.substring(F.col("p_type"), 1, 5)
        )
    )


def _build_escaped_partition_table(spark, sf_dir, work):
    """Shared build for the two escaped-partition-value queries:
    part persisted as a manifest table partitioned by a derived value
    containing spaces, '#', '/', and NULL, then one update/delete
    merge against it."""
    from ..operators.sampling import rate_bucket
    from ..operators.scale import merge_into_partitioned
    from ..operators.table import ManifestTable

    pt = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        _pval_col().alias("pv"),
        "p_retailprice",
    )
    b = rate_bucket(F.col("p_partkey"))
    path = f"{work}/part_by_pv"
    mt = ManifestTable(spark, path)
    mt.create(pt, ["pv"])
    upd = pt.filter(b < 2000).withColumn(
        "p_retailprice", F.col("p_retailprice") + F.lit(1)
    ).withColumn("op", F.lit("U"))
    dele = pt.filter((b >= 2000) & (b < 2500)).withColumn("op", F.lit("D"))
    merge_into_partitioned(
        spark, path, upd.unionByName(dele), ["p_partkey"], ["pv"],
        op_col="op",
    )
    return mt


def _q_table_escaped_partition_values(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Escaped partition values end-to-end (round 10): partition a
    manifest table by a derived string containing spaces, '#', '/',
    and NULL (the characters Spark percent-escapes in directory
    names, plus the __HIVE_DEFAULT_PARTITION__ arm), merge into it,
    and read back per-partition aggregates. The directory mapping
    matches by VALUE through the unescaped raw (never by
    re-formatting values into names), so any escaping mismatch —
    a silently skipped delete, a duplicated partition entry —
    breaks count, checksum, or a whole group.

    Scale shape: same as the plain manifest merge; the value
    matching is memoized per (level, value) so each distinct value
    is compared against each distinct on-disk raw at most once."""
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="table_esc_")
    try:
        mt = _build_escaped_partition_table(spark, sf_dir, work)
        rows = (
            mt.read()
            .groupBy("pv")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum("p_partkey").cast("bigint").alias("id_checksum"),
                # round BEFORE the bigint cast: prices are doubles, and
                # 1424.99*100 = 142498.999... truncates in Spark but
                # rounds in DuckDB (engine-parity convention)
                F.sum(F.round(F.col("p_retailprice") * 100, 0).cast("bigint"))
                .cast("bigint")
                .alias("price_cents"),
            )
            .collect()
        )
        return local_df(spark, 
            rows,
            "pv string, n_rows bigint, id_checksum bigint,"
            " price_cents bigint",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["table_escaped_partition_values"] = Q(
    _q_table_escaped_partition_values,
    f"""
WITH p AS (SELECT p_partkey, {_PVAL} AS pv, p_retailprice,
                  {_PBUCKET} AS bk
           FROM part),
upd AS (SELECT p_partkey, pv, p_retailprice + 1 AS p_retailprice
        FROM p WHERE bk < 2000),
del AS (SELECT p_partkey FROM p WHERE bk >= 2000 AND bk < 2500),
keys AS (SELECT p_partkey FROM upd UNION ALL SELECT p_partkey FROM del),
surv AS (SELECT p.p_partkey, p.pv, p.p_retailprice
         FROM p LEFT JOIN keys k ON p.p_partkey = k.p_partkey
         WHERE k.p_partkey IS NULL),
fin AS (SELECT * FROM surv UNION ALL SELECT * FROM upd)
SELECT pv, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(p_partkey) AS BIGINT) AS id_checksum,
       CAST(sum(CAST(round(p_retailprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS price_cents
FROM fin GROUP BY 1
""",
    doc="manifest merge with space/'#'/'/'/NULL partition values: per-partition state equals the relational recomputation",
)


def _q_table_changes_escaped_partitions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Version diff over escaped partition directories (round 10):
    the same escaped-value table, read through changes(1, 2) — every
    update must surface as delete-of-old + insert-of-new inside its
    escaped directory, deletes as single rows, untouched partitions
    absent. Exercises the manifest diff's changed-partition naming
    (key comparison, not directory-string comparison) across every
    escaping class including the NULL partition.

    Scale shape: O(changed partitions) scans, one signed-weight
    shuffle — identical to table_incremental_changes."""
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="table_escchg_")
    try:
        mt = _build_escaped_partition_table(spark, sf_dir, work)
        rows = (
            mt.changes(1, 2)
            .groupBy(F.col("_change_type").alias("change_type"))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum("p_partkey").cast("bigint").alias("id_checksum"),
                F.sum(F.round(F.col("p_retailprice") * 100, 0).cast("bigint"))
                .cast("bigint")
                .alias("price_cents"),
                F.countDistinct("pv").cast("bigint").alias("n_partitions"),
            )
            .collect()
        )
        return local_df(spark, 
            rows,
            "change_type string, n_rows bigint, id_checksum bigint,"
            " price_cents bigint, n_partitions bigint",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["table_changes_escaped_partitions"] = Q(
    _q_table_changes_escaped_partitions,
    f"""
WITH p AS (SELECT p_partkey, {_PVAL} AS pv, p_retailprice,
                  {_PBUCKET} AS bk
           FROM part),
-- the diff of the merge: updates = delete old + insert new (price
-- moved by exactly +1, so old and new rows always differ), deletes
-- = one delete row each
chg AS (
  SELECT 'delete' AS change_type, p_partkey, pv, p_retailprice
  FROM p WHERE bk < 2500
  UNION ALL
  SELECT 'insert' AS change_type, p_partkey, pv,
         p_retailprice + 1 AS p_retailprice
  FROM p WHERE bk < 2000
)
SELECT change_type, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(p_partkey) AS BIGINT) AS id_checksum,
       CAST(sum(CAST(round(p_retailprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS price_cents,
       CAST(count(DISTINCT pv) AS BIGINT) AS n_partitions
FROM chg GROUP BY 1
""",
    doc="changes() over escaped/NULL partition dirs: diff equals delete-old+insert-new of the delta, untouched rows absent",
)


def _q_table_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-level partition pruning (round 10): persist events as
    a manifest table, merge a delta, then read ONLY the click/error
    partitions through ``read(partitions=...)`` — the manifest names
    the two directories, nothing else is listed or scanned (no
    filter-after-full-scan). The oracle recomputes the merged state of
    exactly those partitions, so a prune that reads too much (leaked
    view rows) or too little (missed generation) breaks the hash.

    Scale shape: O(named partitions) metadata + scan, independent of
    table width — the point of manifest pruning at 10⁴+ partitions."""
    import shutil
    import tempfile

    from ..operators.sampling import rate_bucket
    from ..operators.scale import merge_into_partitioned
    from ..operators.table import ManifestTable

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "props"
    )
    b = rate_bucket(F.col("event_id"))
    touched = F.col("event_type").isin("click", "error")
    work = tempfile.mkdtemp(prefix="table_pruned_")
    path = f"{work}/events_by_type"
    try:
        mt = ManifestTable(spark, path)
        mt.create(ev, ["event_type"])
        upd = ev.filter(touched & (b < 1000)).withColumn(
            "props", F.concat(F.col("props"), F.lit(" [v2]"))
        ).withColumn("op", F.lit("U"))
        dele = ev.filter(touched & (b >= 1000) & (b < 1500)).withColumn(
            "op", F.lit("D")
        )
        merge_into_partitioned(
            spark, path, upd.unionByName(dele),
            ["event_id"], ["event_type"], op_col="op",
        )
        rows = (
            mt.read(partitions=[("click",), ("error",)])
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum("event_id").cast("bigint").alias("id_checksum"),
                F.sum(
                    F.when(F.col("props").contains("[v2]"), 1).otherwise(0)
                ).cast("bigint").alias("n_updated"),
            )
            .collect()  # materialize before the temp table is removed
        )
        return local_df(spark, 
            rows,
            "event_type string, n_rows bigint, id_checksum bigint,"
            " n_updated bigint",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["table_pruned_read"] = Q(
    _q_table_pruned_read,
    f"""
WITH ev AS (SELECT event_id, event_type, props, {_EBUCKET} AS bk
            FROM events
            WHERE event_type IN ('click', 'error')),
upd AS (SELECT event_id, event_type,
               props || ' [v2]' AS props
        FROM ev WHERE bk < 1000),
del AS (SELECT event_id FROM ev WHERE bk >= 1000 AND bk < 1500),
keys AS (SELECT event_id FROM upd UNION ALL SELECT event_id FROM del),
surv AS (SELECT e.event_id, e.event_type, e.props
         FROM ev e LEFT JOIN keys k ON e.event_id = k.event_id
         WHERE k.event_id IS NULL),
fin AS (SELECT * FROM surv UNION ALL SELECT * FROM upd)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(event_id) AS BIGINT) AS id_checksum,
       CAST(sum(CASE WHEN props LIKE '%[v2]%' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_updated
FROM fin GROUP BY 1
""",
    doc="manifest-level pruned read: exactly the named partitions' merged state, untouched partitions never scanned",
)


def _q_table_sharded_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharded manifest list end-to-end (round 10): persist events
    across 300 hash partitions with ``shard_target=64`` — past the
    threshold the manifest becomes a LIST of content-addressed entry
    shards (300/64 → 8 hash buckets), and a merge rewrites only the
    buckets its touched partitions hash into plus one small list
    file, never the O(live partitions) monolith. The query merges an
    update/delete delta, then aggregates the final state; the shard
    count (deterministic: next power of two ≥ 300/64) and the table
    version ride along as literals so a format regression (fell back
    to a monolith, wrong bucket fan-out) breaks the hash alongside
    any data divergence.

    Scale shape: commit metadata cost drops from O(live partitions)
    bytes to ~O(touched) — the r10 answer to the r9 verdict's
    manifest-size ceiling; measured in SCALE.md at 10k partitions."""
    import shutil
    import tempfile

    from ..operators.sampling import rate_bucket
    from ..operators.scale import merge_into_partitioned
    from ..operators.table import ManifestTable

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        (F.col("event_id") % 300).cast("int").alias("pt"),
        "event_type",
    )
    b = rate_bucket(F.col("event_id"))
    work = tempfile.mkdtemp(prefix="table_shard_")
    path = f"{work}/events_by_hash"
    try:
        mt = ManifestTable(spark, path, shard_target=64)
        mt.create(ev, ["pt"])
        upd = ev.filter(b < 1000).withColumn(
            "event_type", F.concat(F.col("event_type"), F.lit("-v2"))
        ).withColumn("op", F.lit("U"))
        dele = ev.filter((b >= 1000) & (b < 1500)).withColumn(
            "op", F.lit("D")
        )
        merge_into_partitioned(
            spark, path, upd.unionByName(dele), ["event_id"], ["pt"],
            op_col="op",
        )
        n_shards = len(mt._manifest_raw(2)["entry_shards"])
        rows = (
            mt.read()
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum("event_id").cast("bigint").alias("id_checksum"),
                F.countDistinct("pt").cast("bigint").alias("n_partitions"),
            )
            .withColumn("n_shards", F.lit(n_shards).cast("int"))
            .withColumn(
                "table_version",
                F.lit(mt.current_version()).cast("int"),
            )
            .collect()  # materialize before the temp table is removed
        )
        return local_df(spark, 
            rows,
            "event_type string, n_rows bigint, id_checksum bigint,"
            " n_partitions bigint, n_shards int, table_version int",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["table_sharded_manifest"] = Q(
    _q_table_sharded_manifest,
    f"""
WITH ev AS (SELECT event_id, CAST(event_id % 300 AS INTEGER) AS pt,
                   event_type, {_EBUCKET} AS bk
            FROM events),
upd AS (SELECT event_id, pt, event_type || '-v2' AS event_type
        FROM ev WHERE bk < 1000),
del AS (SELECT event_id FROM ev WHERE bk >= 1000 AND bk < 1500),
keys AS (SELECT event_id FROM upd UNION ALL SELECT event_id FROM del),
surv AS (SELECT e.event_id, e.pt, e.event_type
         FROM ev e LEFT JOIN keys k ON e.event_id = k.event_id
         WHERE k.event_id IS NULL),
fin AS (SELECT * FROM surv UNION ALL SELECT * FROM upd)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(event_id) AS BIGINT) AS id_checksum,
       CAST(count(DISTINCT pt) AS BIGINT) AS n_partitions,
       CAST(8 AS INT) AS n_shards,
       CAST(2 AS INT) AS table_version
FROM fin GROUP BY 1
""",
    doc="sharded manifest list: 300 partitions across 8 content-addressed shards; merged state equals the relational oracle",
)


def _q_table_restore_rollback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only rollback (round 10): persist events as a manifest
    table, merge the standard update/delete/insert delta, then
    ``restore(1)`` — the RESTORE TABLE analog. The new commit
    re-references version 1's entries without reading, writing, or
    moving any data file (a 100 TB rollback costs one small-file
    write), so the final state must equal the ORIGINAL table exactly:
    any surviving [v2] marker, missing deleted row, or leaked insert
    breaks count or checksum. The table version rides along as a
    literal (create + merge + restore = 3).

    Scale shape: O(live partitions) manifest metadata for the restore
    commit, zero data I/O; the final read is one manifest-pruned scan
    of the re-referenced generation-1 directories."""
    import shutil
    import tempfile

    from ..operators.sampling import rate_bucket
    from ..operators.scale import merge_into_partitioned
    from ..operators.table import ManifestTable

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "props"
    )
    b = rate_bucket(F.col("event_id"))
    touched = F.col("event_type").isin("click", "error")
    work = tempfile.mkdtemp(prefix="table_restore_")
    path = f"{work}/events_by_type"
    try:
        mt = ManifestTable(spark, path)
        mt.create(ev, ["event_type"])
        upd = ev.filter(touched & (b < 1000)).withColumn(
            "props", F.concat(F.col("props"), F.lit(" [v2]"))
        ).withColumn("op", F.lit("U"))
        dele = ev.filter(touched & (b >= 1000) & (b < 1500)).withColumn(
            "op", F.lit("D")
        )
        ins = (
            ev.filter(touched & (b < 300))
            .withColumn("event_id", F.col("event_id") + F.lit(10_000_000))
            .withColumn("props", F.concat(F.col("props"), F.lit(" [new]")))
            .withColumn("op", F.lit("U"))
        )
        merge_into_partitioned(
            spark, path, upd.unionByName(dele).unionByName(ins),
            ["event_id"], ["event_type"], op_col="op",
            retain_versions=10,
        )
        version = mt.restore(1, retain_versions=10)
        rows = (
            mt.read()
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum("event_id").cast("bigint").alias("id_checksum"),
                F.sum(
                    F.when(
                        F.col("props").contains("[v2]")
                        | F.col("props").contains("[new]"),
                        1,
                    ).otherwise(0)
                ).cast("bigint").alias("n_leaked"),
            )
            .withColumn("table_version", F.lit(version).cast("int"))
            .collect()  # materialize before the temp table is removed
        )
        return local_df(spark, 
            rows,
            "event_type string, n_rows bigint, id_checksum bigint,"
            " n_leaked bigint, table_version int",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["table_restore_rollback"] = Q(
    _q_table_restore_rollback,
    """
SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(event_id) AS BIGINT) AS id_checksum,
       CAST(0 AS BIGINT) AS n_leaked,
       CAST(3 AS INT) AS table_version
FROM events GROUP BY 1
""",
    doc="metadata-only restore(1) after a merge: state equals the original table exactly, zero data I/O",
)


def _q_table_stats_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stats-based data skipping end-to-end (round 11): persist
    events as a manifest table range-partitioned into 8 event_id
    buckets; every commit records per-entry min/max/null bounds for
    the non-partition columns (``stats_cols='auto'``), and
    ``read(where=[("event_id", "between", ...)])`` skips the entries
    whose bounds exclude the range BEFORE any file is listed — the
    Iceberg-style pruning a partition key alone cannot give. The
    in-function assertion pins that skipping actually happened
    (scanned < total); the oracle pins exact row values (the same
    predicate is applied as a pushed-down row filter, so a stats bug
    that pruned a matching entry breaks the hash).

    Scale shape: the stats pass is ONE column-pruned aggregation of
    the written generation per commit (O(delta)); the pruned read is
    O(matching entries) metadata + scan — at 10³ partitions × 10³
    files a selective range predicate touches the handful of
    partitions whose bounds admit it instead of every live file."""
    import math
    import shutil
    import tempfile

    from ..operators.table import ManifestTable

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "props"
    )
    max_id = ev.agg(F.max("event_id")).collect()[0][0]
    k = math.ceil((max_id + 1) / 8)
    evp = ev.withColumn(
        "pt", F.floor(F.col("event_id") / F.lit(k)).cast("int")
    )
    work = tempfile.mkdtemp(prefix="table_stats_")
    path = f"{work}/events_by_range"
    try:
        mt = ManifestTable(spark, path)
        mt.create(evp, ["pt"])
        lo, hi = 2 * k + 10, 4 * k - 10
        where = [
            ("event_id", "between", (lo, hi)),
            ("event_type", "in", ["click", "error", "purchase"]),
        ]
        scanned, total = mt.prune_stats(where)
        # the pruning proof lives in the gate: a stats regression that
        # stops skipping turns this into a loud failure, not a silent
        # full scan
        assert scanned < total, (scanned, total)
        rows = (
            mt.read(where=where)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum("event_id").cast("bigint").alias("id_checksum"),
                F.sum(F.length("props")).cast("bigint").alias("props_len"),
            )
            .withColumn(
                "entries_scanned", F.lit(scanned).cast("int")
            )
            .collect()  # materialize before the temp table is removed
        )
        return local_df(spark, 
            rows,
            "event_type string, n_rows bigint, id_checksum bigint,"
            " props_len bigint, entries_scanned int",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["table_stats_pruned_read"] = Q(
    _q_table_stats_pruned_read,
    """
WITH k AS (SELECT CAST(ceil((MAX(event_id) + 1) / 8.0) AS BIGINT) AS k
           FROM events)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(event_id) AS BIGINT) AS id_checksum,
       CAST(sum(length(props)) AS BIGINT) AS props_len,
       CAST(2 AS INT) AS entries_scanned
FROM events, k
WHERE event_id BETWEEN 2 * k.k + 10 AND 4 * k.k - 10
  AND event_type IN ('click', 'error', 'purchase')
GROUP BY 1
""",
    doc="stats-pruned read: per-entry min/max bounds skip 6 of 8 range partitions, values equal the plain filtered aggregate",
)


def _q_table_optimistic_rebase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimistic concurrency end-to-end (round 11): writer A stages
    a full rewrite of the ``click`` partition (tagging bucket < 500
    rows ``[A]``) against version 1 WITHOUT the lease —
    ``stage_commit`` evaluates the plan into a GC-invisible staging
    generation. A locked winner then merges a disjoint delta into
    ``error`` (tagging bucket < 300 rows ``[W]``), moving the table
    to v2. A's ``commit_staged`` detects the move, proves
    disjointness from the manifest diff, REBASES, and publishes v3 —
    both writers' effects land, no recompute, no lost update (the
    Delta/Iceberg optimistic-commit model; r10 verdict gap #2). The
    oracle recomputes both effects relationally; the in-function
    assertion pins that the rebase really took the three-version
    path.

    Scale shape: A's shuffle + generation write + stats pass all run
    outside the lease; the lease covers one rename + an O(written
    dirs) metadata walk + the manifest publish — lease hold time is
    metadata-sized no matter how big the staged data is."""
    import shutil
    import tempfile

    from ..operators.sampling import rate_bucket
    from ..operators.scale import merge_into_partitioned
    from ..operators.table import ManifestTable

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "props"
    )
    b = rate_bucket(F.col("event_id"))
    work = tempfile.mkdtemp(prefix="table_opt_")
    path = f"{work}/events_by_type"
    try:
        mt = ManifestTable(spark, path)
        mt.create(ev, ["event_type"])
        # A: stage a full rewrite of 'click' against v1, no lease
        click = ev.filter(F.col("event_type") == "click")
        rewritten = click.withColumn(
            "props",
            F.when(
                b < 500, F.concat(F.col("props"), F.lit(" [A]"))
            ).otherwise(F.col("props")),
        )
        staged = mt.stage_commit(rewritten, [("click",)], base_version=1)
        # winner: locked merge into the DISJOINT 'error' partition
        upd = (
            ev.filter((F.col("event_type") == "error") & (b < 300))
            .withColumn("props", F.concat(F.col("props"), F.lit(" [W]")))
            .withColumn("op", F.lit("U"))
        )
        merge_into_partitioned(
            spark, path, upd, ["event_id"], ["event_type"], op_col="op",
            retain_versions=10,
        )
        v = mt.commit_staged(staged, retain_versions=10)
        assert v == 3 and mt.current_version() == 3, v  # rebase path
        rows = (
            mt.read()
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum("event_id").cast("bigint").alias("id_checksum"),
                F.sum(
                    F.when(F.col("props").contains("[A]"), 1).otherwise(0)
                ).cast("bigint").alias("n_a"),
                F.sum(
                    F.when(F.col("props").contains("[W]"), 1).otherwise(0)
                ).cast("bigint").alias("n_w"),
            )
            .collect()  # materialize before the temp table is removed
        )
        return local_df(spark, 
            rows,
            "event_type string, n_rows bigint, id_checksum bigint,"
            " n_a bigint, n_w bigint",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["table_optimistic_rebase"] = Q(
    _q_table_optimistic_rebase,
    f"""
WITH ev AS (SELECT event_id, event_type, props, {_EBUCKET} AS bk
            FROM events)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(event_id) AS BIGINT) AS id_checksum,
       CAST(sum(CASE WHEN event_type = 'click' AND bk < 500
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       CAST(sum(CASE WHEN event_type = 'error' AND bk < 300
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_w
FROM ev GROUP BY 1
""",
    doc="optimistic staged commit rebases over a disjoint locked winner: both writers' effects land at v3, no lost update",
)


def _q_table_column_where_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data skipping driven by a pyspark Column predicate (round 11):
    same range-partitioned events table as ``table_stats_pruned_read``
    but the predicate is written the Spark-first way —
    ``(F.col(...) >= lo) & (F.col(...) < hi) & isin & isNotNull`` —
    and the prunable conjuncts are extracted from the Column's
    expression tree (Spark 4 ColumnNode walk). The in-function
    assertion pins that extraction actually pruned (scanned < total);
    the oracle pins exact values (the ORIGINAL Column runs as the row
    filter, so extraction can only skip work, never change results).

    Scale shape: identical to the tuple-clause path — O(matching
    entries) metadata + scan; the extraction itself is a driver-side
    tree walk, O(predicate size)."""
    import math
    import shutil
    import tempfile

    from ..operators.table import ManifestTable

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "props"
    )
    max_id = ev.agg(F.max("event_id")).collect()[0][0]
    k = math.ceil((max_id + 1) / 8)
    evp = ev.withColumn(
        "pt", F.floor(F.col("event_id") / F.lit(k)).cast("int")
    )
    work = tempfile.mkdtemp(prefix="table_colwhere_")
    path = f"{work}/events_by_range"
    try:
        mt = ManifestTable(spark, path)
        mt.create(evp, ["pt"])
        lo, hi = 5 * k + 3, 7 * k - 3
        pred = (
            (F.col("event_id") >= lo)
            & (F.col("event_id") < hi)
            & F.col("event_type").isin("view", "click")
            & F.col("props").isNotNull()
        )
        scanned, total = mt.prune_stats(pred)
        assert scanned < total, (scanned, total)
        rows = (
            mt.read(where=pred)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum("event_id").cast("bigint").alias("id_checksum"),
            )
            .withColumn("entries_scanned", F.lit(scanned).cast("int"))
            .collect()  # materialize before the temp table is removed
        )
        return local_df(spark, 
            rows,
            "event_type string, n_rows bigint, id_checksum bigint,"
            " entries_scanned int",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["table_column_where_read"] = Q(
    _q_table_column_where_read,
    """
WITH k AS (SELECT CAST(ceil((MAX(event_id) + 1) / 8.0) AS BIGINT) AS k
           FROM events)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(event_id) AS BIGINT) AS id_checksum,
       CAST(2 AS INT) AS entries_scanned
FROM events, k
WHERE event_id >= 5 * k.k + 3 AND event_id < 7 * k.k - 3
  AND event_type IN ('view', 'click') AND props IS NOT NULL
GROUP BY 1
""",
    doc="Column-predicate data skipping: conjuncts extracted from the ColumnNode tree prune 6 of 8 range partitions, values equal the plain filtered aggregate",
)

def _q_table_partition_where_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-column predicates prune from the entry KEY values
    (round 12): events persisted as a manifest table partitioned by
    ``event_type``; the natural user spelling
    ``read(where=F.col("event_type").isin(...) & ...)`` — naming the
    PARTITION column, not a stats column — must skip the other
    partitions' entries before any file is listed. Before r12 this
    answered correctly but silently full-scanned: stats deliberately
    exclude partition columns and nothing consulted the entry's key
    values (r11 verdict item 2). The clause is evaluated against the
    entry's exact value (min == max == the key) through the same
    Spark-coercion-faithful comparison machinery as data-column
    stats. The in-function assertion pins the pruning; the oracle
    pins exact row values AND the pruned-entry count in the hash.

    Scale shape: O(live entries) driver-side key comparisons — the
    same cost class as the manifest read itself; at 10⁵ partitions a
    one-partition predicate lists one directory, not 10⁵."""
    import shutil
    import tempfile

    from ..operators.table import ManifestTable

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "props"
    )
    max_id = ev.agg(F.max("event_id")).collect()[0][0]
    lo = (max_id + 1) // 2
    work = tempfile.mkdtemp(prefix="table_pwhere_")
    path = f"{work}/events_by_type"
    try:
        mt = ManifestTable(spark, path)
        mt.create(ev, ["event_type"])
        pred = F.col("event_type").isin("click", "view") & (
            F.col("event_id") >= lo
        )
        scanned, total = mt.prune_stats(pred)
        # the pcol clause alone decides: every partition spans the
        # full event_id range, so only key pruning can cut entries —
        # a regression to full scan fails loudly here
        assert (scanned, total) == (2, 5), (scanned, total)
        # the tuple spelling must prune identically
        assert mt.prune_stats(
            [("event_type", "in", ["click", "view"]), ("event_id", ">=", lo)]
        ) == (2, 5)
        rows = (
            mt.read(where=pred)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum("event_id").cast("bigint").alias("id_checksum"),
                F.sum(F.length("props")).cast("bigint").alias("props_len"),
            )
            .withColumn("entries_scanned", F.lit(scanned).cast("int"))
            .collect()  # materialize before the temp table is removed
        )
        return local_df(spark, 
            rows,
            "event_type string, n_rows bigint, id_checksum bigint,"
            " props_len bigint, entries_scanned int",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["table_partition_where_read"] = Q(
    _q_table_partition_where_read,
    """
WITH lo AS (SELECT (MAX(event_id) + 1) // 2 AS lo FROM events)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(event_id) AS BIGINT) AS id_checksum,
       CAST(sum(length(props)) AS BIGINT) AS props_len,
       CAST(2 AS INT) AS entries_scanned
FROM events, lo
WHERE event_type IN ('click', 'view') AND event_id >= lo.lo
GROUP BY 1
""",
    doc="partition-column where-clause pruning: entry key values skip 3 of 5 partitions for the natural read(where=F.col('event_type').isin(...)) spelling",
)


def _q_table_file_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-FILE data skipping end-to-end (round 12): events persisted
    as a manifest table partitioned into 4 buckets, written as one
    sorted task rolled every 125 records, so each directory holds a
    sequence of event_id-blocked files. Every commit records min/max
    bounds PER FILE (same single aggregation as entry stats, keyed by
    ``input_file_name()``); ``read(where=event_id >= cut)`` selects
    the surviving FILES within surviving partitions — the
    file-granularity skipping Iceberg/Delta get from their manifests,
    one level below r11's per-entry pruning. The in-function
    assertions pin that file pruning actually happened AND that
    ``inputFiles()`` agrees with ``prune_file_stats``; the oracle
    recomputes files_scanned/files_total from first principles
    (row-number blocks over the same sort), so a capture or selection
    regression breaks the hash, not just an assert.

    Scale shape: bounds capture shuffles O(files) stat rows, not
    O(rows); the pruned read lists only surviving files — at 10³
    files per partition a selective predicate reads the handful of
    blocks whose bounds admit it instead of the whole directory."""
    import shutil
    import tempfile

    from ..operators.table import ManifestTable

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "props"
    )
    max_id, n = ev.agg(F.max("event_id"), F.count(F.lit(1))).collect()[0]
    cut = 3 * (max_id + 1) // 4
    # roll size scales with the corpus so files-per-partition stays in
    # the 2.._FILE_STATS_MAX band at EVERY sf (125 records at sf1's
    # 250k rows/partition would mean 2000 files — past the cap, stats
    # rightly decline and the pruning assert would fire); the oracle
    # recomputes the identical ceil
    m = max(125, (n + 799) // 800)
    evp = (
        ev.withColumn("pt", (F.col("event_id") % 4).cast("int"))
        .repartition(1)
        .sortWithinPartitions("pt", "event_id")
    )
    work = tempfile.mkdtemp(prefix="table_fstats_")
    path = f"{work}/events_blocked"
    _mrpf = "spark.sql.files.maxRecordsPerFile"
    prior_m = spark.conf.get(_mrpf)  # engine default "0" when unset

    def _restore_mrpf():
        if prior_m in (None, "0"):
            spark.conf.unset(_mrpf)
        else:
            spark.conf.set(_mrpf, prior_m)

    spark.conf.set(_mrpf, str(m))
    try:
        mt = ManifestTable(spark, path)
        mt.create(evp, ["pt"])
        _restore_mrpf()
        where = [("event_id", ">=", cut)]
        ps = mt.prune_file_stats(where)
        # file pruning must bite, and nothing may fall back to a
        # whole-dir scan (every entry carries file bounds here)
        assert ps["entries_without_file_stats"] == 0, ps
        assert 0 < ps["files_scanned"] < ps["files_total"], ps
        pruned = mt.read(where=where)
        assert len(pruned.inputFiles()) == ps["files_scanned"], ps
        rows = (
            pruned.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum("event_id").cast("bigint").alias("id_checksum"),
            )
            .withColumn(
                "files_scanned", F.lit(ps["files_scanned"]).cast("int")
            )
            .withColumn(
                "files_total", F.lit(ps["files_total"]).cast("int")
            )
            .collect()  # materialize before the temp table is removed
        )
        return local_df(spark, 
            rows,
            "event_type string, n_rows bigint, id_checksum bigint,"
            " files_scanned int, files_total int",
        )
    finally:
        _restore_mrpf()
        shutil.rmtree(work, ignore_errors=True)


QUERIES["table_file_pruned_read"] = Q(
    _q_table_file_pruned_read,
    """
WITH cut AS (SELECT 3 * (MAX(event_id) + 1) // 4 AS cut FROM events),
m AS (SELECT GREATEST(125, (COUNT(*) + 799) // 800) AS m FROM events),
blk AS (
    SELECT event_id, event_type,
           event_id % 4 AS pt,
           (ROW_NUMBER() OVER (PARTITION BY event_id % 4
                               ORDER BY event_id) - 1) // m.m AS b
    FROM events, m
),
fs AS (
    SELECT CAST(COUNT(*) AS INT) AS files_scanned FROM (
        SELECT DISTINCT pt, b FROM blk, cut WHERE event_id >= cut.cut
    )
),
ft AS (
    SELECT CAST(COUNT(*) AS INT) AS files_total FROM (
        SELECT DISTINCT pt, b FROM blk
    )
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(event_id) AS BIGINT) AS id_checksum,
       fs.files_scanned, ft.files_total
FROM blk, cut, fs, ft
WHERE event_id >= cut.cut
GROUP BY event_type, fs.files_scanned, ft.files_total
""",
    doc="per-file data skipping: file-level min/max bounds select event_id blocks within partitions; the oracle recomputes files scanned/total from row-number blocks",
)


def _q_table_clustered_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustered compaction makes file skipping earn its keep (round
    12): events land in a DELIBERATELY bad layout (round-robin files —
    every file spans the full event_id range, so the per-file bounds
    the commit records prune nothing), then
    ``compact(cluster_by=["event_id"])`` rewrites each partition
    range-split and sorted, after which the same
    ``read(where=event_id >= cut)`` selects a strict subset of files.
    The in-function asserts pin the before (no file pruned) and after
    (files pruned) states plus the compaction-is-a-data-no-op diff;
    the oracle pins exact row values. This is the Delta ``OPTIMIZE
    ZORDER``-lite leg of the r12 skipping story: bounds exist at
    commit, LAYOUT is what makes them selective.

    Scale shape: one shuffle (range partitioner over pt + cluster
    key) + one partitioned write — the same cost class as the plain
    compaction it extends; no per-partition single-task skew (a big
    partition spreads over many range tasks, each emitting a
    bounds-disjoint file run)."""
    import shutil
    import tempfile

    from ..operators.table import ManifestTable

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "props"
    )
    max_id, n = ev.agg(F.max("event_id"), F.count(F.lit(1))).collect()[0]
    cut = 3 * (max_id + 1) // 4
    m = max(125, (n + 799) // 800)
    evp = ev.withColumn(
        "pt", (F.col("event_id") % 4).cast("int")
    ).repartition(8)  # round-robin: every file spans the full range
    work = tempfile.mkdtemp(prefix="table_ccomp_")
    path = f"{work}/events_clustered"
    _mrpf = "spark.sql.files.maxRecordsPerFile"
    prior_m = spark.conf.get(_mrpf)  # engine default "0" when unset

    def _restore_mrpf():
        if prior_m in (None, "0"):
            spark.conf.unset(_mrpf)
        else:
            spark.conf.set(_mrpf, prior_m)

    spark.conf.set(_mrpf, str(m))
    try:
        mt = ManifestTable(spark, path)
        mt.create(evp, ["pt"])
        _restore_mrpf()
        where = [("event_id", ">=", cut)]
        before = mt.prune_file_stats(where)
        # merge-order layout: bounds admit (almost) everything — a
        # stray boundary file may prune, the layout as a whole must
        # not (≥90% of files scanned)
        assert before["files_total"] > 4, before
        assert (
            before["files_scanned"] >= 0.9 * before["files_total"]
        ), before
        mt.compact(
            cluster_by=["event_id"],
            target_records_per_file=m,
            retain_versions=3,
        )
        assert mt.changes(1, 2).count() == 0  # data no-op
        after = mt.prune_file_stats(where)
        # clustering must strictly improve the scan fraction and
        # leave a strict subset
        assert 0 < after["files_scanned"] < after["files_total"], after
        assert (
            after["files_scanned"] / after["files_total"]
            < before["files_scanned"] / before["files_total"]
        ), (before, after)
        rows = (
            mt.read(where=where)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum("event_id").cast("bigint").alias("id_checksum"),
                F.sum(F.length("props")).cast("bigint").alias("props_len"),
            )
            .collect()  # materialize before the temp table is removed
        )
        return local_df(spark, 
            rows,
            "event_type string, n_rows bigint, id_checksum bigint,"
            " props_len bigint",
        )
    finally:
        _restore_mrpf()
        shutil.rmtree(work, ignore_errors=True)


QUERIES["table_clustered_compaction"] = Q(
    _q_table_clustered_compaction,
    """
WITH cut AS (SELECT 3 * (MAX(event_id) + 1) // 4 AS cut FROM events)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(event_id) AS BIGINT) AS id_checksum,
       CAST(sum(length(props)) AS BIGINT) AS props_len
FROM events, cut
WHERE event_id >= cut.cut
GROUP BY 1
""",
    doc="clustered compaction (OPTIMIZE ZORDER-lite): a sort-by-key rewrite turns prune-nothing round-robin file bounds into a strict-subset file scan, values unchanged",
)


def _q_table_zorder_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ordered compaction certification (round 13):
    ``compact(zorder_by=["event_id", "user_id"])`` is the full Delta
    ``OPTIMIZE ZORDER`` analog — where a hierarchical
    ``cluster_by=[a, b]`` sort leaves every file near-full-range on
    ``b``, bit-interleaving the min/max-bucketed dims keeps each file
    narrow in BOTH, so predicates on EITHER column skip files. Events
    land round-robin (every file spans both full ranges — in-function
    asserts pin ≥90% scanned on each dim), then one Z-ordered rewrite
    makes BOTH single-dim top-quarter predicates scan ≤75% and
    strictly fewer files, with the maintenance commit diffing to zero
    rows. The oracle recomputes the two-dim filtered state
    arithmetically — integer cuts, bigint checksums, no float
    summation in the hash.

    Scale shape: identical to ``cluster_by`` — ONE range shuffle over
    (pt, zkey), sort rides the write; the Z-key is an ephemeral
    shifts/AND expression (map-side codegen, never enters the written
    schema) with quantization bounds folded from the manifest's own
    entry stats (zero extra I/O; reference Delta OPTIMIZE ZORDER
    semantics, docs/delta-io — no reference-engine counterpart, the
    reference stores raw S3 objects per README.md:45-52)."""
    import shutil
    import tempfile

    from ..operators.table import ManifestTable

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    max_id, max_u, n = ev.agg(
        F.max("event_id"), F.max("user_id"), F.count(F.lit(1))
    ).collect()[0]
    cut = 3 * (max_id + 1) // 4
    ucut = 3 * (max_u + 1) // 4
    # fixed ~16 files per partition at EVERY sf: enough z-cells that a
    # top-quarter predicate on either dim skips most files, few enough
    # that sf0.001's 1k rows still roll multiple files
    m = max(1, (n + 63) // 64)
    # DETERMINISTIC scatter layout: one task, rows ordered by pt then
    # a hash of the id — every rolled file spans BOTH full ranges at
    # every sf (a bare round-robin repartition inherits contiguous
    # id runs from multi-split inputs at larger fixtures and starts
    # pruning on its own, found in the sf1 stress run)
    evp = (
        ev.withColumn("pt", (F.col("event_id") % 4).cast("int"))
        .repartition(1)
        .sortWithinPartitions(
            "pt", F.pmod(F.xxhash64("event_id"), F.lit(997))
        )
    )
    work = tempfile.mkdtemp(prefix="table_zcomp_")
    path = f"{work}/events_zordered"
    _mrpf = "spark.sql.files.maxRecordsPerFile"
    prior_m = spark.conf.get(_mrpf)  # engine default "0" when unset

    def _restore_mrpf():
        if prior_m in (None, "0"):
            spark.conf.unset(_mrpf)
        else:
            spark.conf.set(_mrpf, prior_m)

    spark.conf.set(_mrpf, str(m))
    try:
        mt = ManifestTable(spark, path)
        mt.create(evp, ["pt"])
        _restore_mrpf()
        w_id = [("event_id", ">=", cut)]
        w_user = [("user_id", ">=", ucut)]
        for w in (w_id, w_user):
            b = mt.prune_file_stats(w)
            assert b["files_total"] > 4, b
            assert b["files_scanned"] >= 0.9 * b["files_total"], b
        mt.compact(
            zorder_by=["event_id", "user_id"],
            target_records_per_file=m,
            retain_versions=3,
        )
        assert mt.changes(1, 2).count() == 0  # data no-op
        for w in (w_id, w_user):
            a = mt.prune_file_stats(w)
            # BOTH dims must skip: strict subset, ≤75% scanned
            assert 0 < a["files_scanned"] < a["files_total"], a
            assert a["files_scanned"] <= 0.75 * a["files_total"], a
        rows = (
            mt.read(where=w_id + w_user)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum("event_id").cast("bigint").alias("id_checksum"),
                F.sum("user_id").cast("bigint").alias("user_checksum"),
            )
            .collect()  # materialize before the temp table is removed
        )
        return local_df(spark, 
            rows,
            "event_type string, n_rows bigint, id_checksum bigint,"
            " user_checksum bigint",
        )
    finally:
        _restore_mrpf()
        shutil.rmtree(work, ignore_errors=True)


QUERIES["table_zorder_compaction"] = Q(
    _q_table_zorder_compaction,
    """
WITH c AS (
    SELECT 3 * (MAX(event_id) + 1) // 4 AS idcut,
           3 * (MAX(user_id) + 1) // 4 AS ucut
    FROM events
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(event_id) AS BIGINT) AS id_checksum,
       CAST(sum(user_id) AS BIGINT) AS user_checksum
FROM events, c
WHERE event_id >= c.idcut AND user_id >= c.ucut
GROUP BY 1
""",
    doc="Z-ordered compaction (OPTIMIZE ZORDER): bit-interleaved two-dim rewrite makes BOTH single-column predicates skip files (<=75% scanned, pinned in-function), values unchanged",
)


def _q_table_metadata_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only COUNT certification (round 13):
    ``ManifestTable.count()`` answers bare, ``partitions=``, and
    exactly-decidable partition-column ``where`` counts from the
    MANIFEST's per-entry row counts — zero data I/O, O(live entries)
    driver work (Delta answers COUNT(*) from the log; at 100 TB a
    count must not be a scan). Build an events table partitioned by
    ``pt = event_id % 4``, merge in a 10% tail of NEW rows (so the
    counted state is a MERGED multi-generation table, not the raw
    parquet), then take every count through the metadata path — each
    pinned ``entries_scanned == 0`` — and prove the zero-I/O claim
    by DELETING the table's entire ``_data`` tree and counting
    again: identical numbers from a table whose data no longer
    exists. The oracle recomputes all five numbers over the
    equivalent UNION in SQL.

    Scale shape: O(entries) dict walks on the driver; the only Spark
    jobs in the metadata path are none at all."""
    import shutil
    import tempfile

    from ..operators.scale import merge_into_partitioned
    from ..operators.table import ManifestTable

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type"
    )
    max_id, n = ev.agg(F.max("event_id"), F.count(F.lit(1))).collect()[0]
    extra = (n + 9) // 10
    evp = ev.withColumn("pt", (F.col("event_id") % 4).cast("int"))
    work = tempfile.mkdtemp(prefix="table_mcount_")
    path = f"{work}/events_counted"
    try:
        mt = ManifestTable(spark, path)
        mt.create(evp, ["pt"])
        delta = (
            spark.range(max_id + 1, max_id + 1 + extra)
            .select(
                F.col("id").alias("event_id"),
                F.lit("synthetic").alias("event_type"),
                (F.col("id") % 4).cast("int").alias("pt"),
            )
        )
        merge_into_partitioned(
            spark, path, delta, ["event_id"], ["pt"], retain_versions=3
        )

        def _meta(**kw) -> int:
            d = mt.count(detail=True, **kw)
            assert d["entries_scanned"] == 0, (kw, d)
            return d["rows"]

        def _all_counts():
            return {
                "per_pt": {
                    p: _meta(partitions=[(p,)]) for p in range(4)
                },
                "total": _meta(),
                "n_pt13": _meta(where=[("pt", "in", [1, 3])]),
                "n_ptlt2": _meta(where=[("pt", "<", 2)]),
            }

        counts = _all_counts()
        # the zero-I/O pin: no data files on disk, same answers
        shutil.rmtree(f"{path}/_data")
        assert _all_counts() == counts
        return local_df(spark, 
            [
                (
                    p,
                    counts["per_pt"][p],
                    counts["total"],
                    counts["n_pt13"],
                    counts["n_ptlt2"],
                )
                for p in range(4)
            ],
            "pt int, n_rows bigint, total bigint, n_pt13 bigint,"
            " n_ptlt2 bigint",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["table_metadata_count"] = Q(
    _q_table_metadata_count,
    """
WITH params AS (
    SELECT MAX(event_id) AS mx, (COUNT(*) + 9) // 10 AS extra
    FROM events
),
gen AS (
    SELECT p.mx + rn AS event_id
    FROM (SELECT ROW_NUMBER() OVER () AS rn FROM events) r, params p
    WHERE r.rn <= p.extra
),
u AS (
    SELECT event_id FROM events
    UNION ALL
    SELECT event_id FROM gen
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM u),
p13 AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pt13
    FROM u WHERE event_id % 4 IN (1, 3)
),
plt AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_ptlt2
    FROM u WHERE event_id % 4 < 2
)
SELECT CAST(event_id % 4 AS INT) AS pt,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       tot.total, p13.n_pt13, plt.n_ptlt2
FROM u, tot, p13, plt
GROUP BY 1, tot.total, p13.n_pt13, plt.n_ptlt2
""",
    doc="metadata-only COUNT: bare/partition/pcol-where counts answered from manifest row counts with entries_scanned==0 pinned, proven zero-I/O by deleting _data and re-counting",
)


def _q_table_shallow_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shallow clone certification (round 13): ``clone_to()`` is the
    Delta ``CREATE TABLE ... CLONE`` analog — a METADATA-ONLY v1
    commit at the destination whose entries point at the source's
    data by absolute location (zero data I/O, O(entries) driver
    work, instant at 100 TB), immediately writable and fully
    isolated both ways. Build an events table, clone it, then let
    the two histories DIVERGE: the source bumps ``value`` by 1000
    for the top id quarter, the clone bumps by 500 for the bottom
    quarter within pt=0 only. In-function pins: the clone has NO
    ``_data`` before its own merge (the zero-copy proof), its
    metadata count answers with ``entries_scanned == 0``, and after
    the divergent merges the clone still BORROWS the three
    partitions it never wrote (absolute dirs) while pt=0 went
    local. The oracle recomputes both divergent states
    arithmetically from the raw events — clone and source checksums
    in one frame prove neither table saw the other's write.

    Scale shape: the clone itself runs no Spark job at all; the
    merges after it are ordinary delta-sized partition-pruned
    commits."""
    import os as _os
    import shutil
    import tempfile

    from ..operators.scale import merge_into_partitioned
    from ..operators.table import ManifestTable, _is_abs_dir

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    max_id, n = ev.agg(F.max("event_id"), F.count(F.lit(1))).collect()[0]
    cut1 = (max_id + 1) // 4
    cut3 = 3 * (max_id + 1) // 4
    evp = ev.withColumn("pt", (F.col("event_id") % 4).cast("int"))
    work = tempfile.mkdtemp(prefix="table_clone_")
    try:
        src = ManifestTable(spark, f"{work}/src")
        src.create(evp, ["pt"])
        clone = src.clone_to(f"{work}/clone")
        # zero-copy proof: the clone owns no data at all yet
        assert not _os.path.exists(f"{clone.path}/_data")
        d = clone.count(detail=True)
        assert d["entries_scanned"] == 0 and d["rows"] == n, d
        # source moves on (invisible to the clone)
        d3 = evp.filter(F.col("event_id") >= cut3).withColumn(
            "value", F.col("value") + F.lit(1000.0)
        )
        merge_into_partitioned(
            spark, src.path, d3, ["event_id"], ["pt"], retain_versions=5
        )
        # clone diverges in pt=0 only (invisible to the source)
        d2 = evp.filter(
            (F.col("event_id") < cut1) & (F.col("pt") == 0)
        ).withColumn("value", F.col("value") + F.lit(500.0))
        merge_into_partitioned(
            spark, clone.path, d2, ["event_id"], ["pt"],
            retain_versions=5,
        )
        dirs = {
            e["key"]: e["dir"] for e in clone.manifest()["entries"]
        }
        borrowed = sum(1 for v in dirs.values() if _is_abs_dir(v))
        assert borrowed == 3, dirs  # pt 1..3 still borrow, pt0 local
        ck = F.sum(
            F.round(F.col("value") * 100).cast("bigint")
        ).cast("bigint")
        cl = clone.read().groupBy("event_type").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            ck.alias("clone_cksum"),
        )
        sr = src.read().groupBy("event_type").agg(
            ck.alias("src_cksum")
        )
        rows = cl.join(sr, "event_type").collect()
        return local_df(spark, 
            rows,
            "event_type string, n_rows bigint, clone_cksum bigint,"
            " src_cksum bigint",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["table_shallow_clone"] = Q(
    _q_table_shallow_clone,
    """
WITH c AS (
    SELECT (MAX(event_id) + 1) // 4 AS cut1,
           3 * (MAX(event_id) + 1) // 4 AS cut3
    FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(ROUND((value + CASE
            WHEN event_id < c.cut1 AND event_id % 4 = 0 THEN 500
            ELSE 0 END) * 100) AS BIGINT)) AS BIGINT) AS clone_cksum,
       CAST(SUM(CAST(ROUND((value + CASE
            WHEN event_id >= c.cut3 THEN 1000
            ELSE 0 END) * 100) AS BIGINT)) AS BIGINT) AS src_cksum
FROM events, c
GROUP BY 1
""",
    doc="shallow clone: metadata-only zero-copy fork (no _data, entries_scanned==0 pinned), divergent merges isolated both ways, 3 of 4 partitions still borrowed after the clone-side merge",
)


def _q_table_hidden_partitioning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hidden partitioning certification (round 13): Iceberg-style
    derived partitions — the table persists ``ts_day = day(ts)`` at
    create (reference semantics: Iceberg partition transforms /
    Delta generated-column partition filters; the reference engine
    itself keys S3 objects by a derived ``processingDate``,
    file-pipeline.yaml:66), every commit ENFORCES the derivation
    row-wise, and the scan PROJECTS the raw ``ts`` predicate onto
    the day key: ``read(where=[("ts", ">=", cut)])`` prunes day
    partitions with no day clause ever spelled. The events ``ts`` is
    TIMESTAMP_NTZ, so projection is zone-free and EXACT — the
    entries-scanned count is pinned IN THE HASH and the oracle
    recomputes it as the distinct days at-or-after the cut's day
    (the widening contract w=0; the zoned ±2-day variant is pinned
    in units). Values prove the residual filter stayed the exact
    raw-``ts`` predicate, not the coarser day clause.

    Scale shape: projection is O(clauses × derivations) driver work;
    the scan reads only surviving day directories — at 100 TB this
    is the difference between a calendar-range query touching 3% of
    the table and touching all of it because nobody spelled the
    partition-key clause Iceberg would have derived."""
    import datetime as dt
    import shutil
    import tempfile

    from ..operators.table import (
        ManifestTable,
        partition_transform_column,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type"
    )
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    lo_d, hi_d = lo.date(), hi.date()
    span = (hi_d - lo_d).days
    cut_d = lo_d + dt.timedelta(days=3 * span // 4)
    cut = dt.datetime.combine(cut_d, dt.time())
    evp = ev.withColumn(
        "ts_day", partition_transform_column("day", "ts")
    )
    work = tempfile.mkdtemp(prefix="table_hidden_")
    try:
        mt = ManifestTable(
            spark,
            f"{work}/events_by_day",
            derived_partitions={
                "ts_day": {"transform": "day", "source": "ts"}
            },
        )
        mt.create(evp, ["ts_day"])
        w = [("ts", ">=", cut)]
        kept, total = mt.prune_stats(w)
        # the raw-ts predicate must have pruned through the derived
        # day key — no day clause was spelled anywhere above
        assert 0 < kept < total, (kept, total)
        rows = (
            mt.read(where=w)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum("event_id").cast("bigint").alias("id_checksum"),
            )
            .withColumn("days_scanned", F.lit(kept).cast("int"))
            .withColumn("days_total", F.lit(total).cast("int"))
            .collect()  # materialize before the temp table is removed
        )
        return local_df(spark, 
            rows,
            "event_type string, n_rows bigint, id_checksum bigint,"
            " days_scanned int, days_total int",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["table_hidden_partitioning"] = Q(
    _q_table_hidden_partitioning,
    """
WITH c AS (
    SELECT CAST(MIN(ts) AS DATE)
           + (3 * DATEDIFF('day', CAST(MIN(ts) AS DATE),
                           CAST(MAX(ts) AS DATE)) // 4)
             * INTERVAL 1 DAY AS cut_d
    FROM events
),
ds AS (
    SELECT CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS INT) AS days_scanned
    FROM events, c WHERE CAST(ts AS DATE) >= c.cut_d
),
dtot AS (
    SELECT CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS INT) AS days_total
    FROM events
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(event_id) AS BIGINT) AS id_checksum,
       ds.days_scanned, dtot.days_total
FROM events, c, ds, dtot
WHERE ts >= CAST(c.cut_d AS TIMESTAMP)
GROUP BY 1, ds.days_scanned, dtot.days_total
""",
    doc="hidden partitioning: day(ts) derived key enforced per commit; a raw-ts predicate prunes day partitions via transform projection, scanned/total day counts pinned in the hash, values prove the exact residual filter",
)


def _q_table_dml_delete_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DML certification (round 13): ``delete_where`` /
    ``update_where`` — the Delta ``DELETE FROM`` / ``UPDATE`` surface
    over the manifest table. Three sequential statements, each ONE
    atomic commit: (1) ``DELETE WHERE pt = 3`` takes the
    whole-partition fast path — the entry DROPS metadata-only, the
    surviving entries carry forward dict-identical with their data
    files' mtimes untouched (pinned in-function); (2) ``DELETE WHERE
    event_id >= cut3`` rewrites exactly the three surviving
    partitions' kept rows; (3) ``UPDATE SET value = value + 500
    WHERE event_id < cut1`` rewrites with CASE projections. All
    three matched-row counts are PINNED IN THE HASH; the oracle
    recomputes the final state and every count arithmetically. The
    change feed sees real delete/insert rows (DML, not
    maintenance).

    Scale shape: each statement touches O(matching partitions) — the
    partition-delete is O(1) data I/O regardless of partition size,
    the row statements scan only may-match entries (stats + pcol +
    hidden-partitioning projection all prune first)."""
    import shutil
    import tempfile

    from ..operators.table import ManifestTable

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    max_id = ev.agg(F.max("event_id")).collect()[0][0]
    cut1 = (max_id + 1) // 4
    cut3 = 3 * (max_id + 1) // 4
    evp = ev.withColumn("pt", (F.col("event_id") % 4).cast("int"))
    work = tempfile.mkdtemp(prefix="table_dml_")
    try:
        mt = ManifestTable(spark, f"{work}/events_dml")
        mt.create(evp, ["pt"])
        ent0 = {e["key"]: e for e in mt.manifest()["entries"]}
        r1 = mt.delete_where([("pt", "=", 3)], retain_versions=5)
        assert r1["entries_dropped"] == 1 and r1["entries_rewritten"] == 0, r1
        ent1 = {e["key"]: e for e in mt.manifest()["entries"]}
        # survivors carried forward verbatim: metadata-only delete
        assert all(ent1[k] == ent0[k] for k in ent1), "rewrote survivors"
        r2 = mt.delete_where(
            [("event_id", ">=", cut3)], retain_versions=5
        )
        assert r2["entries_rewritten"] == 3, r2
        r3 = mt.update_where(
            [("event_id", "<", cut1)],
            set={"value": "value + 500"},
            retain_versions=5,
        )
        rows = (
            mt.read()
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum("event_id").cast("bigint").alias("id_checksum"),
                F.sum(F.round(F.col("value") * 100).cast("bigint"))
                .cast("bigint")
                .alias("v_checksum"),
            )
            .withColumn(
                "del_partition", F.lit(r1["rows_deleted"]).cast("bigint")
            )
            .withColumn(
                "del_rows", F.lit(r2["rows_deleted"]).cast("bigint")
            )
            .withColumn(
                "upd_rows", F.lit(r3["rows_updated"]).cast("bigint")
            )
            .collect()  # materialize before the temp table is removed
        )
        return local_df(spark, 
            rows,
            "event_type string, n_rows bigint, id_checksum bigint,"
            " v_checksum bigint, del_partition bigint,"
            " del_rows bigint, upd_rows bigint",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["table_dml_delete_update"] = Q(
    _q_table_dml_delete_update,
    """
WITH c AS (
    SELECT (MAX(event_id) + 1) // 4 AS cut1,
           3 * (MAX(event_id) + 1) // 4 AS cut3
    FROM events
),
d1 AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events
    WHERE event_id % 4 = 3
),
d2 AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events, c
    WHERE event_id % 4 <> 3 AND event_id >= c.cut3
),
u AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events, c
    WHERE event_id % 4 <> 3 AND event_id < c.cut3
      AND event_id < c.cut1
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(event_id) AS BIGINT) AS id_checksum,
       CAST(SUM(CAST(ROUND((value + CASE
            WHEN event_id < c.cut1 THEN 500 ELSE 0
            END) * 100) AS BIGINT)) AS BIGINT) AS v_checksum,
       d1.n AS del_partition, d2.n AS del_rows, u.n AS upd_rows
FROM events, c, d1, d2, u
WHERE event_id % 4 <> 3 AND event_id < c.cut3
GROUP BY 1, d1.n, d2.n, u.n
""",
    doc="DML: whole-partition DELETE drops the entry metadata-only (survivors mtime-pinned), row DELETE rewrites only matching partitions, UPDATE applies CASE projections - all matched counts pinned in the hash",
)


def _q_table_selective_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective compaction certification (round 13):
    ``compact(partitions=[...])`` rewrites ONLY the named partitions
    into the fresh generation and re-references every untouched entry
    verbatim — at 100 TB nobody full-rewrites a table because one hot
    partition accreted small files. Build an events table partitioned
    by ``pt = event_id % 4``, merge a delta into pt=0 only (value
    bumped by 1000 for the upper half), then selectively compact
    pt=0. In-function pins: the untouched entries carry forward
    DICT-IDENTICAL with their data files' mtimes untouched (never
    read, never rewritten), the selected entry moves to the new
    generation, and the compaction commit diffs to ZERO rows
    (maintenance is invisible to the change feed). The oracle
    recomputes the merged state arithmetically and pins the metadata
    constants.

    Scale shape: the rewrite reads and writes ONE partition —
    O(selected), not O(table); the untouched-entry carry-forward is
    the same mixed-generation mechanics every merge commit uses."""
    import glob as _glob
    import os as _os
    import shutil
    import tempfile

    from ..operators.scale import merge_into_partitioned
    from ..operators.table import ManifestTable, _partition_key

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    max_id = ev.agg(F.max("event_id")).collect()[0][0]
    cut = (max_id + 1) // 2
    evp = ev.withColumn("pt", (F.col("event_id") % 4).cast("int"))
    work = tempfile.mkdtemp(prefix="table_selcomp_")
    path = f"{work}/events_by_pt"
    try:
        mt = ManifestTable(spark, path)
        mt.create(evp, ["pt"])
        delta = evp.filter(
            (F.col("pt") == 0) & (F.col("event_id") >= cut)
        ).withColumn("value", F.col("value") + F.lit(1000.0))
        merge_into_partitioned(
            spark, path, delta, ["event_id"], ["pt"], retain_versions=5
        )
        ver0 = mt.current_version()
        ent0 = {e["key"]: e for e in mt.manifest()["entries"]}
        untouched = [_partition_key((p,)) for p in (1, 2, 3)]

        def _mtimes(ent, key):
            d = f"{path}/{ent[key]['dir']}"
            return sorted(
                (_os.path.basename(p), _os.path.getmtime(p))
                for p in _glob.glob(f"{d}/*.parquet")
            )

        mt0 = {k: _mtimes(ent0, k) for k in untouched}
        n_rewritten = mt.compact(partitions=[(0,)])
        assert n_rewritten == 1, n_rewritten
        ent1 = {e["key"]: e for e in mt.manifest()["entries"]}
        intact = all(
            ent1[k] == ent0[k] and _mtimes(ent1, k) == mt0[k]
            for k in untouched
        )
        assert intact, "untouched entries changed across selective compact"
        ka = _partition_key((0,))
        assert ent1[ka]["dir"] != ent0[ka]["dir"]
        diff_rows = mt.changes(ver0, ver0 + 1).count()
        assert diff_rows == 0, diff_rows
        rows = (
            mt.read()
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum(
                    F.round(F.col("value") * 100, 0).cast("bigint")
                ).alias("val_cents"),
                F.sum("event_id").cast("bigint").alias("id_checksum"),
            )
            .withColumn("rewritten", F.lit(n_rewritten).cast("int"))
            .withColumn(
                "untouched_intact", F.lit(int(intact)).cast("int")
            )
            .withColumn(
                "compact_diff_rows", F.lit(diff_rows).cast("int")
            )
            .collect()  # materialize before the temp table is removed
        )
        return local_df(spark, 
            rows,
            "event_type string, n_rows bigint, val_cents bigint,"
            " id_checksum bigint, rewritten int, untouched_intact int,"
            " compact_diff_rows int",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["table_selective_compaction"] = Q(
    _q_table_selective_compaction,
    """
WITH cut AS (SELECT (MAX(event_id) + 1) // 2 AS cut FROM events),
m AS (
    SELECT event_id, event_type,
           CASE WHEN event_id % 4 = 0 AND event_id >= cut.cut
                THEN value + 1000.0 ELSE value END AS value
    FROM events, cut
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS val_cents,
       CAST(SUM(event_id) AS BIGINT) AS id_checksum,
       CAST(1 AS INT) AS rewritten,
       CAST(1 AS INT) AS untouched_intact,
       CAST(0 AS INT) AS compact_diff_rows
FROM m GROUP BY event_type
""",
    doc="selective compaction: compact(partitions=[(0,)]) rewrites one partition, untouched entries dict- and mtime-identical, zero-row maintenance diff",
)


def _q_merge_conditional_clauses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional MERGE certification (round 13): the Delta-shaped
    clause surface on ``merge_into_partitioned`` — partial-column
    ``WHEN MATCHED AND cond THEN UPDATE SET``, conditional inserts,
    and a ``WHEN NOT MATCHED BY SOURCE THEN DELETE`` scoped to the
    touched partitions. The delta is derived deterministically from
    the events table: matched rows (``event_id % 10 = 3``) carry
    ``amount = value - 500`` (mixed signs, so the update condition
    ``s.amount > 0`` genuinely gates), insert rows are fresh keys
    (``event_id + 100000`` for ``event_id % 997 = 0``), and every
    current ``error`` row with ``value < 100`` in a TOUCHED partition
    is swept by the not-matched-by-source clause. The oracle
    recomputes all three clause classes relationally, INCLUDING the
    touched-partition scope (``pt IN (SELECT DISTINCT pt FROM
    delta)``) — at small scale factors the delta may not touch every
    partition, and the scope is part of the contract.

    Scale shape: one full-outer join on the key sized by touched
    partitions + delta (Delta's phase-2 plan); untouched partitions
    never read."""
    import shutil
    import tempfile

    from ..operators.scale import merge_into_partitioned
    from ..operators.table import ManifestTable

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        (F.col("event_id") % 4).cast("int").alias("pt"),
        "event_type",
        "value",
    )
    work = tempfile.mkdtemp(prefix="merge_cond_")
    path = f"{work}/events_by_pt"
    try:
        mt = ManifestTable(spark, path)
        mt.create(ev, ["pt"])
        dm = ev.filter(F.col("event_id") % 10 == 3).select(
            "event_id", "pt", "event_type", "value",
            (F.col("value") - 500.0).alias("amount"),
        )
        di = ev.filter(F.col("event_id") % 997 == 0).select(
            (F.col("event_id") + 100000).alias("event_id"),
            ((F.col("event_id") + 100000) % 4).cast("int").alias("pt"),
            F.lit("inserted").alias("event_type"),
            F.lit(42.0).alias("value"),
            F.lit(7.0).alias("amount"),
        )
        merge_into_partitioned(
            spark, path, dm.unionByName(di), ["event_id"], ["pt"],
            when_matched_update={"value": "t.value + s.amount"},
            when_matched_condition="s.amount > 0",
            when_not_matched_by_source_delete=(
                "t.event_type = 'error' AND t.value < 100"
            ),
        )
        rows = (
            mt.read()
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum(
                    F.round(F.col("value") * 100, 0).cast("bigint")
                ).alias("val_cents"),
                F.sum("event_id").cast("bigint").alias("id_checksum"),
            )
            .collect()  # materialize before the temp table is removed
        )
        return local_df(spark, 
            rows,
            "event_type string, n_rows bigint, val_cents bigint,"
            " id_checksum bigint",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["merge_conditional_clauses"] = Q(
    _q_merge_conditional_clauses,
    """
WITH ev AS (
    SELECT event_id, CAST(event_id % 4 AS INT) AS pt, event_type, value
    FROM events
),
dm AS (
    SELECT event_id, pt, event_type, value, value - 500 AS amount
    FROM ev WHERE event_id % 10 = 3
),
di AS (
    SELECT event_id + 100000 AS event_id,
           CAST((event_id + 100000) % 4 AS INT) AS pt,
           'inserted' AS event_type, 42.0 AS value, 7.0 AS amount
    FROM ev WHERE event_id % 997 = 0
),
delta AS (SELECT * FROM dm UNION ALL SELECT * FROM di),
tch AS (SELECT DISTINCT pt FROM delta),
matched AS (
    SELECT e.event_id, e.event_type,
           CASE WHEN d.amount > 0 THEN e.value + d.amount
                ELSE e.value END AS value
    FROM ev e JOIN delta d ON e.event_id = d.event_id
),
tonly AS (
    SELECT e.event_id, e.event_type, e.value FROM ev e
    WHERE e.event_id NOT IN (SELECT event_id FROM delta)
      AND NOT (e.pt IN (SELECT pt FROM tch)
               AND e.event_type = 'error' AND e.value < 100)
),
sonly AS (
    SELECT d.event_id, d.event_type, d.value FROM delta d
    WHERE d.event_id NOT IN (SELECT event_id FROM ev)
),
final AS (
    SELECT * FROM matched
    UNION ALL SELECT * FROM tonly
    UNION ALL SELECT * FROM sonly
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS val_cents,
       CAST(SUM(event_id) AS BIGINT) AS id_checksum
FROM final GROUP BY event_type
""",
    doc="conditional MERGE: partial-column WHEN MATCHED AND cond UPDATE SET, fresh-key inserts, and a touched-partition-scoped NOT MATCHED BY SOURCE delete == relational recomputation",
)


def _q_table_drop_column_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution drop certification (round 13):
    ``drop_columns()`` removes a column as a METADATA-ONLY commit —
    entries re-referenced verbatim, zero data I/O, the drop commit
    diffs to ZERO rows, and a diff ACROSS the boundary is expressed
    in the to-schema (rows differing only in the dropped column
    collapse). The dropped name is tombstoned: pre-drop data files
    still carry values under it, and a name-resolved parquet re-add
    would resurrect them (the field-ID problem — rename is the
    documented NO, SCALE.md r13). In-function pins: entry dicts and
    data-file mtimes identical across the drop, re-add refused. The
    oracle recomputes the merged state without the column and pins
    the CDC row count across the boundary (2 rows per updated key)
    plus the metadata constants."""
    import glob as _glob
    import os as _os
    import shutil
    import tempfile

    from ..operators.scale import merge_into_partitioned
    from ..operators.table import ManifestTable

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        (F.col("event_id") % 4).cast("int").alias("pt"),
        "event_type",
        "value",
        "props",
    )
    work = tempfile.mkdtemp(prefix="table_dropcol_")
    path = f"{work}/events_by_pt"
    try:
        mt = ManifestTable(spark, path)
        mt.create(ev, ["pt"])
        delta = ev.filter(F.col("event_id") % 7 == 0).withColumn(
            "value", F.col("value") + F.lit(500.0)
        )
        merge_into_partitioned(
            spark, path, delta, ["event_id"], ["pt"], retain_versions=9
        )
        ver0 = mt.current_version()
        ent0 = {e["key"]: e for e in mt.manifest()["entries"]}

        def _mtimes(ent):
            return {
                k: sorted(
                    (_os.path.basename(p), _os.path.getmtime(p))
                    for p in _glob.glob(f"{path}/{e['dir']}/*.parquet")
                )
                for k, e in ent.items()
            }

        mt0 = _mtimes(ent0)
        v = mt.drop_columns(["props"])
        ent1 = {e["key"]: e for e in mt.manifest()["entries"]}
        # entries re-referenced in place (same dirs) with ONLY the
        # dropped column's dead stats bounds shed; data untouched
        assert {k: e["dir"] for k, e in ent1.items()} == {
            k: e["dir"] for k, e in ent0.items()
        }, "drop moved an entry"
        for e in ent1.values():
            assert "props" not in e.get("stats", {}).get("cols", {})
        assert _mtimes(ent1) == mt0, "drop touched a data file"
        drop_diff = mt.changes(ver0, v).count()
        assert drop_diff == 0, drop_diff
        assert "props" not in mt.read().columns
        # tombstone: re-adding the name refuses loudly
        try:
            mt.overwrite_partitions(
                mt.read()
                .filter(F.col("pt") == 0)
                .withColumn("props", F.lit("zz")),
                [(0,)],
            )
            raise AssertionError("tombstoned re-add did not refuse")
        except ValueError:
            pass
        # the cross-boundary diff is expressed in the to-schema:
        # 2 rows (delete+insert) per key the merge updated
        cdc_rows = mt.changes(1, v).count()
        rows = (
            mt.read()
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum(
                    F.round(F.col("value") * 100, 0).cast("bigint")
                ).alias("val_cents"),
            )
            .withColumn("cdc_rows", F.lit(cdc_rows).cast("bigint"))
            .withColumn("drop_diff_rows", F.lit(drop_diff).cast("int"))
            .collect()  # materialize before the temp table is removed
        )
        return local_df(spark, 
            rows,
            "event_type string, n_rows bigint, val_cents bigint,"
            " cdc_rows bigint, drop_diff_rows int",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["table_drop_column_evolution"] = Q(
    _q_table_drop_column_evolution,
    """
WITH m AS (
    SELECT event_id, event_type,
           CASE WHEN event_id % 7 = 0 THEN value + 500.0
                ELSE value END AS value
    FROM events
),
cdc AS (
    SELECT 2 * COUNT(*) AS cdc_rows FROM events WHERE event_id % 7 = 0
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS val_cents,
       CAST(cdc.cdc_rows AS BIGINT) AS cdc_rows,
       CAST(0 AS INT) AS drop_diff_rows
FROM m, cdc GROUP BY event_type, cdc.cdc_rows
""",
    doc="metadata-only column drop: zero-byte zero-diff commit, tombstoned re-add refused, cross-boundary CDC expressed in the to-schema (2 rows per updated key)",
)


def _q_table_repartition_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-evolution certification (round 13):
    ``repartition_table()`` changes the partition columns as one
    lease-held full rewrite — data identical, the boundary commit
    diffs to ZERO rows (a tailing CDC consumer sees maintenance, not
    data), the old version stays readable under its own layout, and
    the NEW key prunes immediately. In-function pins: the
    post-rewrite manifest holds exactly the new keyspace and
    ``prune_stats`` on the new key skips all-but-one entry. The
    oracle recomputes the state (identical rows under any
    partitioning) and pins the pruning and diff constants."""
    import shutil
    import tempfile

    from ..operators.scale import merge_into_partitioned
    from ..operators.table import ManifestTable

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        (F.col("event_id") % 4).cast("int").alias("pt"),
        (F.col("event_id") % 5).cast("int").alias("hr"),
        "event_type",
        "value",
    )
    work = tempfile.mkdtemp(prefix="table_repart_")
    path = f"{work}/events_by_pt"
    try:
        mt = ManifestTable(spark, path)
        mt.create(ev, ["pt"])
        delta = ev.filter(F.col("event_id") % 11 == 0).withColumn(
            "value", F.col("value") + F.lit(250.0)
        )
        merge_into_partitioned(
            spark, path, delta, ["event_id"], ["pt"], retain_versions=9
        )
        ver0 = mt.current_version()
        v = mt.repartition_table(["hr"])
        assert mt.partition_cols() == ["hr"]
        repart_diff = mt.changes(ver0, v).count()
        assert repart_diff == 0, repart_diff
        assert mt.read(version=ver0).count() == mt.read().count()
        entries_after = len(mt.manifest()["entries"])
        assert entries_after == 5, entries_after
        pruned, total = mt.prune_stats([("hr", "=", 2)])
        assert (pruned, total) == (1, 5), (pruned, total)
        rows = (
            mt.read(where=[("hr", "=", 2)])
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum(
                    F.round(F.col("value") * 100, 0).cast("bigint")
                ).alias("val_cents"),
                F.sum("event_id").cast("bigint").alias("id_checksum"),
            )
            .withColumn(
                "repart_diff_rows", F.lit(repart_diff).cast("int")
            )
            .withColumn(
                "entries_scanned", F.lit(pruned).cast("int")
            )
            .withColumn(
                "entries_total", F.lit(total).cast("int")
            )
            .collect()  # materialize before the temp table is removed
        )
        return local_df(spark, 
            rows,
            "event_type string, n_rows bigint, val_cents bigint,"
            " id_checksum bigint, repart_diff_rows int,"
            " entries_scanned int, entries_total int",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["table_repartition_evolution"] = Q(
    _q_table_repartition_evolution,
    """
WITH m AS (
    SELECT event_id, event_type,
           CASE WHEN event_id % 11 = 0 THEN value + 250.0
                ELSE value END AS value
    FROM events
    WHERE event_id % 5 = 2
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS val_cents,
       CAST(SUM(event_id) AS BIGINT) AS id_checksum,
       CAST(0 AS INT) AS repart_diff_rows,
       CAST(1 AS INT) AS entries_scanned,
       CAST(5 AS INT) AS entries_total
FROM m GROUP BY event_type
""",
    doc="partition evolution: daily->hourly-style rewrite with zero-diff feed continuity, old version readable, new key pruning immediately (1/5 entries pinned)",
)


def _q_table_check_constraint_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHECK-constraint certification (round 13): the
    ``ALTER TABLE ADD CONSTRAINT ... CHECK`` analog — a persisted
    row-level invariant every generation-writing commit validates,
    O(written data). The scenario: constrain ``value >= 0``, apply a
    GOOD delta (lands), then attempt a VIOLATING delta — refused with
    :class:`CheckConstraintViolation`, the table bit-for-bit
    unchanged (version AND state pinned in-function), the refused
    generation an invisible husk the next vacuum sweeps. The oracle
    recomputes the good-delta-only state: the hash itself proves the
    violating merge left nothing behind.

    Scale shape: enforcement is ONE combined violation probe
    (all constraints OR-ed, LIMIT 1) over the freshly written
    generation — the same delta-sized cost class as the stats
    aggregation riding the same commit."""
    import shutil
    import tempfile

    from ..operators.scale import merge_into_partitioned
    from ..operators.table import (
        CheckConstraintViolation,
        ManifestTable,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        (F.col("event_id") % 4).cast("int").alias("pt"),
        "event_type",
        "value",
    )
    work = tempfile.mkdtemp(prefix="table_check_")
    path = f"{work}/events_by_pt"
    try:
        mt = ManifestTable(spark, path)
        mt.create(ev, ["pt"])
        mt.add_check_constraint("value_nonneg", "value >= 0")
        good = ev.filter(F.col("event_id") % 13 == 0).withColumn(
            "value", F.col("value") + F.lit(100.0)
        )
        merge_into_partitioned(
            spark, path, good, ["event_id"], ["pt"], retain_versions=9
        )
        ver = mt.current_version()
        bad = ev.filter(F.col("event_id") % 17 == 0).withColumn(
            "value", F.lit(-1.0)
        )
        refused = 0
        try:
            merge_into_partitioned(
                spark, path, bad, ["event_id"], ["pt"]
            )
        except CheckConstraintViolation:
            refused = 1
        assert refused == 1, "violating merge was not refused"
        assert mt.current_version() == ver, "refusal published a version"
        mt.vacuum()  # sweeps the refused generation husk
        rows = (
            mt.read()
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum(
                    F.round(F.col("value") * 100, 0).cast("bigint")
                ).alias("val_cents"),
            )
            .withColumn("merge_refused", F.lit(refused).cast("int"))
            .collect()  # materialize before the temp table is removed
        )
        return local_df(spark, 
            rows,
            "event_type string, n_rows bigint, val_cents bigint,"
            " merge_refused int",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["table_check_constraint_merge"] = Q(
    _q_table_check_constraint_merge,
    """
WITH m AS (
    SELECT event_id, event_type,
           CASE WHEN event_id % 13 = 0 THEN value + 100.0
                ELSE value END AS value
    FROM events
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS val_cents,
       CAST(1 AS INT) AS merge_refused
FROM m GROUP BY event_type
""",
    doc="CHECK constraint: good merge lands, violating merge refused with the table bit-for-bit unchanged (the hash proves it) and the husk vacuumed",
)


def _q_table_file_granular_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-granular DML certification (round 14,
    deletion-vector-lite): on an id-clustered table, ``delete_where``
    / ``update_where`` rewrite only the FILES whose per-file bounds
    admit the predicate and carry every other file of the touched
    entry forward byte-identically as a carried reference inside the
    same entry — a point statement in a hot partition touches one
    file, not the partition (the cost class Delta needs deletion
    vectors for, here without the read-side merge tax).

    Build events partitioned by ``pt = event_id % 4``, range-
    clustered into several id-disjoint files per partition. Then:
    (1) DELETE a narrow id band, (2) UPDATE a different narrow band.
    In-function pins: both statements took the file-scoped path,
    ``files_rewritten < files_rewritten + files_carried`` (a strict
    file subset), EVERY pre-statement data file is mtime-untouched
    (generations are immutable; survivors are re-referenced, never
    copied), the new entries carry out-of-dir references, and the
    change feed sees exactly the deleted band. The oracle recomputes
    the final state and both matched counts arithmetically and pins
    the two file-scoped statements as constants.

    Scale shape: each statement's data I/O is O(matching FILES) —
    stats prune entries, per-file bounds prune files, and carried
    survivors cost zero bytes; rewriting 1-of-N files per touched
    partition is the weekly GDPR-delete cost class at 100 TB."""
    import glob as _glob
    import os as _os
    import shutil
    import tempfile

    from ..operators.table import ManifestTable

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    max_id = ev.agg(F.max("event_id")).collect()[0][0]
    # two narrow, non-overlapping bands well inside [0, max_id]
    d_lo, d_hi = (max_id + 1) // 10, (max_id + 1) // 10 + (max_id + 1) // 50
    u_lo, u_hi = (max_id + 1) // 2, (max_id + 1) // 2 + (max_id + 1) // 50
    evp = (
        ev.withColumn("pt", (F.col("event_id") % 4).cast("int"))
        .repartitionByRange(16, F.col("pt"), F.col("event_id"))
        .sortWithinPartitions("pt", "event_id")
    )
    work = tempfile.mkdtemp(prefix="table_fg_dml_")
    try:
        mt = ManifestTable(spark, f"{work}/events_fg")
        mt.create(evp, ["pt"])
        mtimes0 = {
            p: _os.path.getmtime(p)
            for p in _glob.glob(
                f"{mt.path}/_data/**/*.parquet", recursive=True
            )
        }
        r1 = mt.delete_where(
            [("event_id", ">=", d_lo), ("event_id", "<", d_hi)],
            retain_versions=5,
        )
        assert r1["entries_file_scoped"] >= 1, r1
        assert r1["files_carried"] >= 1, r1
        r2 = mt.update_where(
            [("event_id", ">=", u_lo), ("event_id", "<", u_hi)],
            set={"value": "value + 250"},
            retain_versions=5,
        )
        assert r2["entries_file_scoped"] >= 1, r2
        assert r2["files_carried"] >= 1, r2
        # survivors are REFERENCED, never copied: every pre-statement
        # file is byte-untouched
        assert all(
            _os.path.getmtime(p) == t for p, t in mtimes0.items()
        ), "a pre-statement data file was modified"
        # the touched entries really carry out-of-dir references
        assert any(
            any("/" in n for n in e.get("files") or ())
            for e in mt.manifest()["entries"]
        ), "no carried references in the manifest"
        # CDC sees exactly the deleted band
        assert (
            mt.changes(1, 2).count()
            == r1["rows_deleted"]
        ), "change feed disagrees with the delete"
        fg_stmts = int(r1["entries_file_scoped"] >= 1) + int(
            r2["entries_file_scoped"] >= 1
        )
        rows = (
            mt.read()
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum("event_id").cast("bigint").alias("id_checksum"),
                F.sum(F.round(F.col("value") * 100).cast("bigint"))
                .cast("bigint")
                .alias("v_checksum"),
            )
            .withColumn(
                "del_rows", F.lit(r1["rows_deleted"]).cast("bigint")
            )
            .withColumn(
                "upd_rows", F.lit(r2["rows_updated"]).cast("bigint")
            )
            .withColumn("fg_stmts", F.lit(fg_stmts).cast("int"))
            .collect()  # materialize before the temp table is removed
        )
        return local_df(spark, 
            rows,
            "event_type string, n_rows bigint, id_checksum bigint,"
            " v_checksum bigint, del_rows bigint, upd_rows bigint,"
            " fg_stmts int",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["table_file_granular_dml"] = Q(
    _q_table_file_granular_dml,
    """
WITH c AS (
    SELECT (MAX(event_id) + 1) // 10 AS d_lo,
           (MAX(event_id) + 1) // 10 + (MAX(event_id) + 1) // 50 AS d_hi,
           (MAX(event_id) + 1) // 2 AS u_lo,
           (MAX(event_id) + 1) // 2 + (MAX(event_id) + 1) // 50 AS u_hi
    FROM events
),
d AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events, c
    WHERE event_id >= c.d_lo AND event_id < c.d_hi
),
u AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events, c
    WHERE event_id NOT BETWEEN c.d_lo AND c.d_hi - 1
      AND event_id >= c.u_lo AND event_id < c.u_hi
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(event_id) AS BIGINT) AS id_checksum,
       CAST(SUM(CAST(ROUND((value + CASE
            WHEN event_id >= c.u_lo AND event_id < c.u_hi THEN 250
            ELSE 0 END) * 100) AS BIGINT)) AS BIGINT) AS v_checksum,
       d.n AS del_rows, u.n AS upd_rows, CAST(2 AS INT) AS fg_stmts
FROM events, c, d, u
WHERE event_id < c.d_lo OR event_id >= c.d_hi
GROUP BY 1, d.n, u.n
""",
    doc="File-granular DML (deletion-vector-lite): point DELETE/UPDATE rewrite only the files whose bounds admit the predicate, survivors re-referenced byte-identically (mtime-pinned), matched counts and state in the hash",
)


def _q_table_zorder_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal Z-order certification (round 14): ``compact(
    zorder_by=["ts", "value"])`` — date/timestamp columns now project
    onto a monotone epoch axis inside the ephemeral Z-key, so the
    time dimension every real table clusters on works directly (the
    r13 numeric-only guard relaxed). Events land in a deterministic
    scatter (every file spans the full ts AND value ranges —
    in-function asserts pin ≥90% scanned on each dim), then one
    Z-ordered rewrite makes BOTH single-dim predicates scan ≤75% and
    strictly fewer files, with the maintenance commit diffing to zero
    rows. The time cut is integer-DAY arithmetic (min + 3/4 of the
    day span) so Spark and DuckDB compute the identical boundary; the
    oracle recomputes the filtered state arithmetically.

    Scale shape: identical to numeric zorder — ONE range shuffle,
    sort rides the write, the epoch projection is a map-side cast
    (zero extra I/O; the projection frame can blur edge buckets by
    one zone offset, which costs locality only — pruning correctness
    comes from the recorded column stats, never the key)."""
    import datetime as _dt
    import shutil
    import tempfile

    from ..operators.table import ManifestTable

    # the fixture's ts arrives TIMESTAMP_NTZ, which is deliberately
    # stats-INELIGIBLE (r11: driver-side NTZ bound comparison is
    # unsound against session-tz literal coercion) — so file bounds
    # could never prune it. Ingest as zoned TIMESTAMP (the session
    # frame), the type a real time-clustered table carries
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "value",
        "event_type",
    )
    mn_d, mx_d, n = ev.agg(
        F.min(F.to_date("ts")), F.max(F.to_date("ts")), F.count(F.lit(1))
    ).collect()[0]
    cut_date = mn_d + _dt.timedelta(days=3 * (mx_d - mn_d).days // 4)
    cut_ts = _dt.datetime(cut_date.year, cut_date.month, cut_date.day)
    # value dim cut at the 75th PERCENTILE, not 0.75*max — a skewed
    # value tail would park the max-derived cut above almost every
    # row and the pre-zorder "nothing prunes" pin would fail for the
    # wrong reason (this cut feeds in-function asserts only, never
    # the hash, so approxQuantile determinism is not load-bearing)
    vcut = ev.approxQuantile("value", [0.75], 0.001)[0]
    m = max(1, (n + 63) // 64)
    evp = (
        ev.withColumn("pt", (F.col("event_id") % 4).cast("int"))
        .repartition(1)
        .sortWithinPartitions(
            "pt", F.pmod(F.xxhash64("event_id"), F.lit(997))
        )
    )
    work = tempfile.mkdtemp(prefix="table_zts_")
    _mrpf = "spark.sql.files.maxRecordsPerFile"
    prior_m = spark.conf.get(_mrpf)

    def _restore_mrpf():
        if prior_m in (None, "0"):
            spark.conf.unset(_mrpf)
        else:
            spark.conf.set(_mrpf, prior_m)

    spark.conf.set(_mrpf, str(m))
    try:
        mt = ManifestTable(spark, f"{work}/events_zts")
        mt.create(evp, ["pt"])
        _restore_mrpf()
        w_ts = [("ts", ">=", cut_ts)]
        w_val = [("value", ">=", vcut)]
        for w in (w_ts, w_val):
            b = mt.prune_file_stats(w)
            assert b["files_total"] > 4, b
            assert b["files_scanned"] >= 0.9 * b["files_total"], b
        mt.compact(
            zorder_by=["ts", "value"],
            target_records_per_file=m,
            retain_versions=3,
        )
        assert mt.changes(1, 2).count() == 0  # data no-op
        a = mt.prune_file_stats(w_ts)
        # the TEMPORAL dim must skip: strict subset, ≤75% scanned
        # (ts bounds are widened ±2 days for zone safety, so the cut
        # sits ≫ 2 days inside the span by construction)
        assert 0 < a["files_scanned"] < a["files_total"], a
        assert a["files_scanned"] <= 0.75 * a["files_total"], a
        av = mt.prune_file_stats(w_val)
        # the numeric second dim skips too (the z-order property)
        assert 0 < av["files_scanned"] < av["files_total"], av
        rows = (
            mt.read(where=w_ts)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum("event_id").cast("bigint").alias("id_checksum"),
                F.sum(F.round(F.col("value") * 100).cast("bigint"))
                .cast("bigint")
                .alias("v_cents"),
            )
            .collect()  # materialize before the temp table is removed
        )
        return local_df(spark, 
            rows,
            "event_type string, n_rows bigint, id_checksum bigint,"
            " v_cents bigint",
        )
    finally:
        _restore_mrpf()
        shutil.rmtree(work, ignore_errors=True)


QUERIES["table_zorder_timestamp"] = Q(
    _q_table_zorder_timestamp,
    """
WITH c AS (
    SELECT MIN(CAST(ts AS DATE))
           + CAST(
               ((MAX(CAST(ts AS DATE)) - MIN(CAST(ts AS DATE))) * 3)
               // 4 AS INTEGER
             ) AS cut
    FROM events
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(event_id) AS BIGINT) AS id_checksum,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
           AS v_cents
FROM events, c
WHERE ts >= CAST(c.cut AS TIMESTAMP)
GROUP BY 1
""",
    doc="Temporal Z-order: zorder_by=[ts, value] projects timestamps onto an epoch axis in the ephemeral key; both dims scan strict file subsets (pinned in-function), filtered state in the hash",
)


def _q_merge_file_granular(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-granular MERGE certification (round 14): on a
    key-clustered manifest table, a blind upsert+tombstone delta
    whose keys live in a narrow band rewrites ONLY the files whose
    key bounds intersect the band — every other file of the touched
    partitions carries forward byte-identically (the same
    deletion-vector-lite machinery as DML, applied to the merge's
    current-state side). This is the streaming CDC batch cost class:
    per batch, O(delta + matching files), never O(touched
    partitions').

    Build events partitioned by ``pt = event_id % 4``,
    range-clustered into id-disjoint files; merge ONE delta carrying
    value+1000 upserts for band A and tombstones for the adjacent
    band B. In-function pins: the merge took the file-scoped path in
    every touched partition, carried references exist, every
    pre-merge data file is mtime-untouched, and the change feed
    between the versions carries exactly |A| updates (delete+insert
    pairs) plus |B| deletes. The oracle recomputes the merged state
    and both band counts arithmetically; fg engagement is pinned as
    a hashed constant.

    Scale shape: one delta-sized shuffle (the blind anti-join), a
    file-subset scan on the current side, carried survivors cost
    zero bytes — at 100 TB the per-batch rewrite is the hot FILES,
    not the hot partitions."""
    import glob as _glob
    import os as _os
    import shutil
    import tempfile

    from ..operators.scale import merge_into_partitioned
    from ..operators.table import ManifestTable

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    max_id = ev.agg(F.max("event_id")).collect()[0][0]
    band = max(1, (max_id + 1) // 50)
    a_lo = (max_id + 1) // 10
    a_hi = a_lo + band
    b_hi = a_hi + band  # band B adjacent: combined key range stays narrow
    evp = (
        ev.withColumn("pt", (F.col("event_id") % 4).cast("int"))
        .repartitionByRange(16, F.col("pt"), F.col("event_id"))
        .sortWithinPartitions("pt", "event_id")
    )
    work = tempfile.mkdtemp(prefix="merge_fg_")
    try:
        mt = ManifestTable(spark, f"{work}/events_fgm")
        mt.create(evp, ["pt"])
        mtimes0 = {
            p: _os.path.getmtime(p)
            for p in _glob.glob(
                f"{mt.path}/_data/**/*.parquet", recursive=True
            )
        }
        upd = evp.filter(
            (F.col("event_id") >= a_lo) & (F.col("event_id") < a_hi)
        ).select(
            "event_id",
            "event_type",
            (F.col("value") + 1000).alias("value"),
            "pt",
            F.lit("U").alias("op"),
        )
        dele = evp.filter(
            (F.col("event_id") >= a_hi) & (F.col("event_id") < b_hi)
        ).select(
            "event_id", "event_type", "value", "pt",
            F.lit("D").alias("op"),
        )
        n_upd, n_del = upd.count(), dele.count()
        merge_into_partitioned(
            spark,
            mt.path,
            upd.unionByName(dele),
            ["event_id"],
            ["pt"],
            op_col="op",
            retain_versions=5,
        )
        op = [
            h.get("op") or {}
            for h in mt.history()
            if (h.get("op") or {}).get("name") == "merge"
        ][-1]
        assert op.get("file_scoped") == op["n_partitions"], op
        assert any(
            any("/" in n for n in e.get("files") or ())
            for e in mt.manifest()["entries"]
        ), "no carried references after the merge"
        assert all(
            _os.path.getmtime(p) == t for p, t in mtimes0.items()
        ), "a pre-merge data file was modified"
        # feed: |A| updated keys appear as delete+insert pairs, |B|
        # keys as deletes — 2|A| + |B| rows
        assert mt.changes(1, 2).count() == 2 * n_upd + n_del
        fg = int(op.get("file_scoped") == op["n_partitions"])
        rows = (
            mt.read()
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum("event_id").cast("bigint").alias("id_checksum"),
                F.sum(F.round(F.col("value") * 100).cast("bigint"))
                .cast("bigint")
                .alias("v_cents"),
            )
            .withColumn("upd_rows", F.lit(n_upd).cast("bigint"))
            .withColumn("del_rows", F.lit(n_del).cast("bigint"))
            .withColumn("fg_merge", F.lit(fg).cast("int"))
            .collect()  # materialize before the temp table is removed
        )
        return local_df(spark, 
            rows,
            "event_type string, n_rows bigint, id_checksum bigint,"
            " v_cents bigint, upd_rows bigint, del_rows bigint,"
            " fg_merge int",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["merge_file_granular"] = Q(
    _q_merge_file_granular,
    """
WITH c AS (
    SELECT (MAX(event_id) + 1) // 10 AS a_lo,
           (MAX(event_id) + 1) // 10
             + GREATEST(1, (MAX(event_id) + 1) // 50) AS a_hi,
           (MAX(event_id) + 1) // 10
             + 2 * GREATEST(1, (MAX(event_id) + 1) // 50) AS b_hi
    FROM events
),
u AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events, c
    WHERE event_id >= c.a_lo AND event_id < c.a_hi
),
d AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events, c
    WHERE event_id >= c.a_hi AND event_id < c.b_hi
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(event_id) AS BIGINT) AS id_checksum,
       CAST(SUM(CAST(ROUND((value + CASE
            WHEN event_id >= c.a_lo AND event_id < c.a_hi THEN 1000
            ELSE 0 END) * 100) AS BIGINT)) AS BIGINT) AS v_cents,
       u.n AS upd_rows, d.n AS del_rows, CAST(1 AS INT) AS fg_merge
FROM events, c, u, d
WHERE event_id < c.a_hi OR event_id >= c.b_hi
GROUP BY 1, u.n, d.n
""",
    doc="File-granular MERGE: a narrow-band upsert+tombstone delta rewrites only the key-intersecting files per touched partition, survivors mtime-pinned, feed and state in the hash",
)


def _q_merge_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE schema-evolution certification (round 15): the defined
    contract for delta columns the stored schema lacks. On a
    partitioned manifest table built from ``events``, a blind delta
    carrying a NEW ``tier`` column (band-A upserts at value+1000,
    band-B tombstones) first REFUSES without the opt-in — pinned
    in-function as a raised ValueError with the version unchanged —
    then, with ``schema_evolution=True``, appends ``tier`` nullable:
    winners carry their tier, every survivor and untouched partition
    NULL-backfills (the manifest's explicit-schema scan), time travel
    to v1 keeps the old shape, and the change feed crosses the
    boundary under the add-only contract (from-side deletes read
    tier as NULL). The oracle recomputes the evolved final state —
    band membership, checksums, per-type non-NULL/gold tier counts —
    arithmetically from ``events``; the refusal and boundary pins are
    hashed constants a regression breaks.

    Scale shape: evolution adds ZERO data I/O beyond the merge itself
    — history is never rewritten (NULL backfill happens at scan time
    from the manifest schema), which is the only affordable add-column
    on a 100 TB table."""
    import shutil
    import tempfile

    from ..operators.scale import merge_into_partitioned
    from ..operators.table import ManifestTable

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    max_id = ev.agg(F.max("event_id")).collect()[0][0]
    band = max(1, (max_id + 1) // 50)
    a_lo = (max_id + 1) // 10
    a_hi = a_lo + band
    b_hi = a_hi + band
    evp = (
        ev.withColumn("pt", (F.col("event_id") % 4).cast("int"))
        .repartitionByRange(16, F.col("pt"), F.col("event_id"))
        .sortWithinPartitions("pt", "event_id")
    )
    work = tempfile.mkdtemp(prefix="merge_evo_")
    try:
        mt = ManifestTable(spark, f"{work}/events_evo")
        mt.create(evp, ["pt"])
        tier = F.when(
            F.col("event_id") % 3 == 0, F.lit("gold")
        ).otherwise(F.lit("std"))
        upd = evp.filter(
            (F.col("event_id") >= a_lo) & (F.col("event_id") < a_hi)
        ).select(
            "event_id",
            "event_type",
            (F.col("value") + 1000).alias("value"),
            "pt",
            tier.alias("tier"),
            F.lit("U").alias("op"),
        )
        dele = evp.filter(
            (F.col("event_id") >= a_hi) & (F.col("event_id") < b_hi)
        ).select(
            "event_id", "event_type", "value", "pt",
            F.lit(None).cast("string").alias("tier"),
            F.lit("D").alias("op"),
        )
        n_upd, n_del = upd.count(), dele.count()
        # pin 1: the default REFUSES loudly and commits nothing
        refused = 0
        try:
            merge_into_partitioned(
                spark, mt.path, upd.limit(1), ["event_id"], ["pt"],
                op_col="op", retain_versions=5,
            )
        except ValueError as exc:
            refused = int(
                "schema_evolution" in str(exc)
                and mt.current_version() == 1
            )
        assert refused, "extras without opt-in must refuse pre-commit"
        merge_into_partitioned(
            spark, mt.path, upd.unionByName(dele), ["event_id"],
            ["pt"], op_col="op", schema_evolution=True,
            retain_versions=5,
        )
        last = mt.schema().fields[-1]
        assert last.name == "tier" and last.nullable, last
        assert "tier" not in mt.read(version=1).columns
        # feed across the boundary: 2|A| update pairs + |B| deletes,
        # from-side rows NULL-backfilled in tier
        d = mt.changes(1, 2)
        assert d.count() == 2 * n_upd + n_del
        assert (
            d.filter("_change_type = 'delete' and tier is not null")
            .count()
            == 0
        )
        rows = (
            mt.read()
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum("event_id").cast("bigint").alias("id_checksum"),
                F.sum(F.round(F.col("value") * 100).cast("bigint"))
                .cast("bigint")
                .alias("v_cents"),
                F.count("tier").cast("bigint").alias("tier_nonnull"),
                F.count(F.when(F.col("tier") == "gold", 1))
                .cast("bigint")
                .alias("tier_gold"),
            )
            .withColumn("refused_default", F.lit(refused).cast("int"))
            .collect()
        )
        return local_df(spark, 
            rows,
            "event_type string, n_rows bigint, id_checksum bigint,"
            " v_cents bigint, tier_nonnull bigint, tier_gold bigint,"
            " refused_default int",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["merge_schema_evolution"] = Q(
    _q_merge_schema_evolution,
    """
WITH c AS (
    SELECT (MAX(event_id) + 1) // 10 AS a_lo,
           (MAX(event_id) + 1) // 10
             + GREATEST(1, (MAX(event_id) + 1) // 50) AS a_hi,
           (MAX(event_id) + 1) // 10
             + 2 * GREATEST(1, (MAX(event_id) + 1) // 50) AS b_hi
    FROM events
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(event_id) AS BIGINT) AS id_checksum,
       CAST(SUM(CAST(ROUND((value + CASE
            WHEN event_id >= c.a_lo AND event_id < c.a_hi THEN 1000
            ELSE 0 END) * 100) AS BIGINT)) AS BIGINT) AS v_cents,
       CAST(SUM(CASE WHEN event_id >= c.a_lo AND event_id < c.a_hi
            THEN 1 ELSE 0 END) AS BIGINT) AS tier_nonnull,
       CAST(SUM(CASE WHEN event_id >= c.a_lo AND event_id < c.a_hi
            AND event_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS tier_gold,
       CAST(1 AS INT) AS refused_default
FROM events, c
WHERE event_id < c.a_hi OR event_id >= c.b_hi
GROUP BY 1
""",
    doc="MERGE schema evolution: extras refuse by default (pinned pre-commit), opt-in appends the column nullable with NULL backfill for survivors/history and an add-only CDC boundary",
)


def _q_table_compact_reclaim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Carried-ref reclaim loop certification (round 15): after a
    file-granular DELETE leaves carried references pinning the create
    generation against GC, ``compact(min_carried=1)`` — the knob the
    sink's ``compact_min_carried`` arms — selects exactly the
    carrying partition, localizes it, and the formerly pinned
    generation becomes sweepable. In-function pins: the delete was
    file-scoped (fewer files rewritten than exist, carried refs
    present), the vacuum dry-run names the pinned generation, the
    reclaim compaction publishes an EMPTY change-feed diff
    (maintenance, not data), and after it the pinned list is empty
    and the old generation directory is actually gone. The oracle
    recomputes the surviving state arithmetically; every reclaim pin
    is a hashed constant.

    Scale shape: trigger evaluation is zero data I/O (carried counts
    live in the manifest); the sweep rewrites only carrying
    partitions — the reclaim cost a long-running CDC sink pays is
    O(its own hot partitions), never O(table)."""
    import os as _os
    import shutil
    import tempfile

    from ..operators.table import ManifestTable

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    max_id = ev.agg(F.max("event_id")).collect()[0][0]
    band = max(1, (max_id + 1) // 50)
    a_lo = (max_id + 1) // 10
    a_hi = a_lo + band
    evp = (
        ev.withColumn("pt", F.lit(0).cast("int"))
        .repartitionByRange(8, F.col("event_id"))
        .sortWithinPartitions("event_id")
    )
    work = tempfile.mkdtemp(prefix="reclaim_")
    try:
        mt = ManifestTable(spark, f"{work}/events_rc")
        mt.create(evp, ["pt"])
        r = mt.delete_where(
            [("event_id", ">=", a_lo), ("event_id", "<", a_hi)],
            retain_versions=1,
        )
        assert r["files_carried"] >= 1, r
        rep = {x["key"]: x for x in mt.small_file_report()}
        carried_before = sum(x["carried"] for x in rep.values())
        assert carried_before == r["files_carried"], (rep, r)
        pinned = mt.vacuum(dry_run=True, retain_versions=1)[
            "generations_pinned_by_carried_refs"
        ]
        assert pinned == ["g00000001"], pinned
        vbefore = mt.current_version()
        # retain 2 here so the pre-compaction version stays readable
        # for the empty-diff pin; the vacuum below then narrows to 1
        n = mt.compact(min_carried=1, retain_versions=2)
        assert n == 1, n
        assert mt.changes(vbefore, vbefore + 1).count() == 0
        carried_after = sum(
            x["carried"] for x in mt.small_file_report()
        )
        assert carried_after == 0
        plan = mt.vacuum(dry_run=True, retain_versions=1)
        assert plan["generations_pinned_by_carried_refs"] == []
        mt.vacuum(retain_versions=1)
        reclaimed = int(
            not _os.path.isdir(f"{mt.path}/_data/g00000001")
        )
        assert reclaimed, "vacuum did not drop the unpinned gen"
        rows = (
            mt.read()
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum("event_id").cast("bigint").alias("id_checksum"),
                F.sum(F.round(F.col("value") * 100).cast("bigint"))
                .cast("bigint")
                .alias("v_cents"),
            )
            .withColumn(
                "rows_deleted",
                F.lit(r["rows_deleted"]).cast("bigint"),
            )
            .withColumn(
                "had_carried",
                F.lit(int(carried_before >= 1)).cast("int"),
            )
            .withColumn(
                "carried_after", F.lit(carried_after).cast("bigint")
            )
            .withColumn("reclaimed", F.lit(reclaimed).cast("int"))
            .collect()
        )
        return local_df(spark, 
            rows,
            "event_type string, n_rows bigint, id_checksum bigint,"
            " v_cents bigint, rows_deleted bigint, had_carried int,"
            " carried_after bigint, reclaimed int",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["table_compact_reclaim"] = Q(
    _q_table_compact_reclaim,
    """
WITH c AS (
    SELECT (MAX(event_id) + 1) // 10 AS a_lo,
           (MAX(event_id) + 1) // 10
             + GREATEST(1, (MAX(event_id) + 1) // 50) AS a_hi
    FROM events
),
d AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events, c
    WHERE event_id >= c.a_lo AND event_id < c.a_hi
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(event_id) AS BIGINT) AS id_checksum,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
         AS v_cents,
       d.n AS rows_deleted, CAST(1 AS INT) AS had_carried,
       CAST(0 AS BIGINT) AS carried_after, CAST(1 AS INT) AS reclaimed
FROM events, c, d
WHERE event_id < c.a_lo OR event_id >= c.a_hi
GROUP BY 1, d.n
""",
    doc="Reclaim loop: compact(min_carried=) localizes carried refs after fg DELETE, pinned generation swept, empty maintenance diff — the sink's compact_min_carried trigger",
)


def _q_merge_optimistic_file_granular(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Optimistic file-granular MERGE certification (round 15): the
    same narrow-band upsert+tombstone delta as ``merge_file_granular``
    but committed through the OPTIMISTIC path — the whole compute
    (delta snapshot, file-scoped current read, merge shuffle, parquet
    write, stats) runs outside the write lease and the publish rebases
    under it, now carrying survivor references through
    ``stage_commit(carry_files=)``. Sound because the rebase compares
    whole entry identities (dir + files map): it succeeds exactly when
    the carrying entries are unchanged between base and winner.
    In-function pins: the op record says optimistic AND file-scoped in
    every touched partition, carried references exist, every pre-merge
    file is mtime-untouched, and the feed carries exactly 2|A| + |B|
    rows. The oracle recomputes the merged state and band counts
    arithmetically — identical final state to the locked path, which
    IS the contract (commit protocol must not change semantics).

    Scale shape: two pipelines merging disjoint key bands overlap
    their heavy work fully, each rewriting only its matching files —
    the concurrent-writer CDC cost class at 100 TB."""
    import glob as _glob
    import os as _os
    import shutil
    import tempfile

    from ..operators.scale import merge_into_partitioned
    from ..operators.table import ManifestTable

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    max_id = ev.agg(F.max("event_id")).collect()[0][0]
    band = max(1, (max_id + 1) // 50)
    a_lo = (max_id + 1) // 10
    a_hi = a_lo + band
    b_hi = a_hi + band
    evp = (
        ev.withColumn("pt", (F.col("event_id") % 4).cast("int"))
        .repartitionByRange(16, F.col("pt"), F.col("event_id"))
        .sortWithinPartitions("pt", "event_id")
    )
    work = tempfile.mkdtemp(prefix="merge_ofg_")
    try:
        mt = ManifestTable(spark, f"{work}/events_ofg")
        # parquet-roundtripped create df (evp reads from the source
        # parquet, all-nullable) — the optimistic rebase refuses
        # nullability drift, so the schema must be stable up front
        mt.create(evp, ["pt"])
        mtimes0 = {
            p: _os.path.getmtime(p)
            for p in _glob.glob(
                f"{mt.path}/_data/**/*.parquet", recursive=True
            )
        }
        upd = evp.filter(
            (F.col("event_id") >= a_lo) & (F.col("event_id") < a_hi)
        ).select(
            "event_id",
            "event_type",
            (F.col("value") + 1000).alias("value"),
            "pt",
            F.lit("U").alias("op"),
        )
        dele = evp.filter(
            (F.col("event_id") >= a_hi) & (F.col("event_id") < b_hi)
        ).select(
            "event_id", "event_type", "value", "pt",
            F.lit("D").alias("op"),
        )
        n_upd, n_del = upd.count(), dele.count()
        merge_into_partitioned(
            spark,
            mt.path,
            upd.unionByName(dele),
            ["event_id"],
            ["pt"],
            op_col="op",
            optimistic=True,
            retain_versions=5,
        )
        op = [
            h.get("op") or {}
            for h in mt.history()
            if (h.get("op") or {}).get("name") == "merge"
        ][-1]
        assert op.get("optimistic") is True, op
        assert op.get("file_scoped") == op["n_partitions"], op
        assert any(
            any("/" in n for n in e.get("files") or ())
            for e in mt.manifest()["entries"]
        ), "no carried references after the optimistic merge"
        assert all(
            _os.path.getmtime(p) == t for p, t in mtimes0.items()
        ), "a pre-merge data file was modified"
        assert mt.changes(1, 2).count() == 2 * n_upd + n_del
        fg = int(
            op.get("optimistic") is True
            and op.get("file_scoped") == op["n_partitions"]
        )
        rows = (
            mt.read()
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum("event_id").cast("bigint").alias("id_checksum"),
                F.sum(F.round(F.col("value") * 100).cast("bigint"))
                .cast("bigint")
                .alias("v_cents"),
            )
            .withColumn("upd_rows", F.lit(n_upd).cast("bigint"))
            .withColumn("del_rows", F.lit(n_del).cast("bigint"))
            .withColumn("fg_optimistic", F.lit(fg).cast("int"))
            .collect()
        )
        return local_df(spark, 
            rows,
            "event_type string, n_rows bigint, id_checksum bigint,"
            " v_cents bigint, upd_rows bigint, del_rows bigint,"
            " fg_optimistic int",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["merge_optimistic_file_granular"] = Q(
    _q_merge_optimistic_file_granular,
    """
WITH c AS (
    SELECT (MAX(event_id) + 1) // 10 AS a_lo,
           (MAX(event_id) + 1) // 10
             + GREATEST(1, (MAX(event_id) + 1) // 50) AS a_hi,
           (MAX(event_id) + 1) // 10
             + 2 * GREATEST(1, (MAX(event_id) + 1) // 50) AS b_hi
    FROM events
),
u AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events, c
    WHERE event_id >= c.a_lo AND event_id < c.a_hi
),
d AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events, c
    WHERE event_id >= c.a_hi AND event_id < c.b_hi
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(event_id) AS BIGINT) AS id_checksum,
       CAST(SUM(CAST(ROUND((value + CASE
            WHEN event_id >= c.a_lo AND event_id < c.a_hi THEN 1000
            ELSE 0 END) * 100) AS BIGINT)) AS BIGINT) AS v_cents,
       u.n AS upd_rows, d.n AS del_rows,
       CAST(1 AS INT) AS fg_optimistic
FROM events, c, u, d
WHERE event_id < c.a_hi OR event_id >= c.b_hi
GROUP BY 1, u.n, d.n
""",
    doc="Optimistic file-granular MERGE: lease-free compute + rebase publish now carries survivor refs (stage_commit carry_files), identical final state to the locked path, mtimes/feed/fg pinned",
)


def _q_table_add_columns_backfill(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Metadata-only ADD COLUMNS + the full rename recipe (round 15):
    ``add_columns`` appends a nullable column as a zero-data-I/O
    commit (entries verbatim, empty change-feed diff, every file
    mtime-untouched — pinned in-function), ``update_where`` backfills
    it from the old column (the one honest O(table) step), and
    ``drop_columns`` retires the old name — the add-new → backfill →
    drop-old recipe SCALE.md documents instead of an in-place RENAME.
    The oracle recomputes the end state (value re-typed into integer
    cents under a new name) arithmetically from ``events``; the
    metadata-only pins are hashed constants.

    Scale shape: the add is O(manifest) regardless of table size —
    the only affordable add-column at 100 TB; the backfill cost is
    explicit and skippable when the column starts life NULL."""
    import glob as _glob
    import os as _os
    import shutil
    import tempfile

    from ..operators.table import ManifestTable

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    evp = (
        ev.withColumn("pt", (F.col("event_id") % 4).cast("int"))
        .repartitionByRange(16, F.col("pt"), F.col("event_id"))
        .sortWithinPartitions("pt", "event_id")
    )
    work = tempfile.mkdtemp(prefix="addcols_")
    try:
        mt = ManifestTable(spark, f"{work}/events_ac")
        mt.create(evp, ["pt"])
        mtimes0 = {
            p: _os.path.getmtime(p)
            for p in _glob.glob(
                f"{mt.path}/_data/**/*.parquet", recursive=True
            )
        }
        mt.add_columns({"value_cents": "bigint"}, retain_versions=5)
        # metadata-only pins: zero diff, zero data I/O, old shape
        # retained at v1
        assert mt.changes(1, 2).count() == 0
        assert all(
            _os.path.getmtime(p) == t for p, t in mtimes0.items()
        ), "the metadata-only add touched a data file"
        assert "value_cents" not in mt.read(version=1).columns
        meta_only = 1
        r = mt.update_where(
            [("event_id", ">=", 0)],
            set={"value_cents": "CAST(ROUND(value * 100) AS BIGINT)"},
            retain_versions=5,
        )
        n_backfilled = r["rows_updated"]
        mt.drop_columns(["value"], retain_versions=5)
        rows = (
            mt.read()
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum("event_id").cast("bigint").alias("id_checksum"),
                F.sum("value_cents").cast("bigint").alias("v_cents"),
            )
            .withColumn(
                "backfilled", F.lit(n_backfilled).cast("bigint")
            )
            .withColumn("meta_only_add", F.lit(meta_only).cast("int"))
            .collect()
        )
        return local_df(spark, 
            rows,
            "event_type string, n_rows bigint, id_checksum bigint,"
            " v_cents bigint, backfilled bigint, meta_only_add int",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["table_add_columns_backfill"] = Q(
    _q_table_add_columns_backfill,
    """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(event_id) AS BIGINT) AS id_checksum,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
         AS v_cents,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM events) AS backfilled,
       CAST(1 AS INT) AS meta_only_add
FROM events
GROUP BY 1
""",
    doc="Metadata-only ADD COLUMNS + backfill + drop (the rename recipe): zero-diff zero-I/O add pinned, value re-typed to integer cents under a new name",
)


def _q_merge_type_widening(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE stored-type WIDENING certification (round 16): the
    contract for a delta column WIDER than the stored column. On a
    partitioned manifest table holding ``vc`` as INT (integer cents),
    a band-A delta carries ``vc`` as BIGINT with values offset by
    2^40 — out of int range, the r15-verdict corruption repro shape
    (with ANSI off the old alignment cast silently WRAPPED 2^40+7 to
    7). Pinned in-function: the default REFUSES loudly pre-commit
    (version unchanged — never a silent wrap), then
    ``schema_evolution=True`` widens the stored type to bigint as a
    ZERO-REWRITE evolution: only the touched partitions rewrite;
    untouched partitions keep their narrow bytes and read back exact
    through the wide manifest schema (the Spark 4 parquet widening
    read); time travel to v1 keeps INT; the change feed crosses the
    boundary emitting the wide type with the delete side holding the
    narrow original values. Band B tombstones ride the same merge.
    The oracle recomputes the widened final state arithmetically from
    ``events``.

    Scale shape: at 100 TB a type widening that rewrote history would
    be an O(table) job; this one is O(delta) — the manifest schema
    changes, the bytes don't (Delta/Iceberg type widening)."""
    import shutil
    import tempfile

    from ..operators.scale import merge_into_partitioned
    from ..operators.table import ManifestTable

    OFFSET = 2**40
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    max_id = ev.agg(F.max("event_id")).collect()[0][0]
    band = max(1, (max_id + 1) // 50)
    a_lo = (max_id + 1) // 10
    a_hi = a_lo + band
    b_hi = a_hi + band
    evp = (
        ev.withColumn("pt", (F.col("event_id") % 4).cast("int"))
        .withColumn(
            "vc", F.round(F.col("value") * 100).cast("int")
        )
        .drop("value")
        .repartitionByRange(16, F.col("pt"), F.col("event_id"))
        .sortWithinPartitions("pt", "event_id")
    )
    work = tempfile.mkdtemp(prefix="merge_widen_")
    try:
        mt = ManifestTable(spark, f"{work}/events_widen")
        mt.create(evp, ["pt"])
        wide_vc = (
            F.round(F.col("value") * 100).cast("bigint")
            + F.lit(OFFSET).cast("bigint")
        )
        upd = (
            ev.filter(
                (F.col("event_id") >= a_lo) & (F.col("event_id") < a_hi)
            )
            .withColumn("pt", (F.col("event_id") % 4).cast("int"))
            .select(
                "event_id", "event_type",
                wide_vc.alias("vc"), "pt",
                F.lit("U").alias("op"),
            )
        )
        dele = (
            ev.filter(
                (F.col("event_id") >= a_hi) & (F.col("event_id") < b_hi)
            )
            .withColumn("pt", (F.col("event_id") % 4).cast("int"))
            .select(
                "event_id", "event_type",
                F.lit(None).cast("bigint").alias("vc"), "pt",
                F.lit("D").alias("op"),
            )
        )
        n_upd = upd.count()
        # pin 1: the default refuses the narrowing LOUDLY, pre-commit
        refused = 0
        try:
            merge_into_partitioned(
                spark, mt.path, upd.limit(1), ["event_id"], ["pt"],
                op_col="op", retain_versions=5,
            )
        except ValueError as exc:
            refused = int(
                "schema_evolution=True" in str(exc)
                and mt.current_version() == 1
            )
        assert refused, "a wider delta must refuse pre-commit"
        merge_into_partitioned(
            spark, mt.path, upd.unionByName(dele), ["event_id"],
            ["pt"], op_col="op", schema_evolution=True,
            retain_versions=5,
        )
        # pin 2: stored type widened; time travel keeps the old one
        wide_now = mt.schema()["vc"].dataType.simpleString()
        old_type = mt.read(version=1).schema["vc"].dataType.simpleString()
        assert (wide_now, old_type) == ("bigint", "int"), (
            wide_now, old_type,
        )
        # pin 3: the feed crosses the boundary wide, delete side
        # carrying the NARROW originals read up-cast
        d = mt.changes(1, 2)
        assert d.schema["vc"].dataType.simpleString() == "bigint"
        assert (
            d.filter(
                (F.col("_change_type") == "delete")
                & (F.col("vc") >= OFFSET)
            ).count()
            == 0
        )
        widened_ok = int(
            d.filter(
                (F.col("_change_type") == "insert")
                & (F.col("vc") >= OFFSET)
            ).count()
            == n_upd
        )
        rows = (
            mt.read()
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum("event_id").cast("bigint").alias("id_checksum"),
                F.sum("vc").cast("bigint").alias("vc_sum"),
                F.count(F.when(F.col("vc") >= OFFSET, 1))
                .cast("bigint")
                .alias("n_wide"),
            )
            .withColumn("refused_narrowing", F.lit(refused).cast("int"))
            .withColumn("feed_widened", F.lit(widened_ok).cast("int"))
            .collect()
        )
        return local_df(spark, 
            rows,
            "event_type string, n_rows bigint, id_checksum bigint,"
            " vc_sum bigint, n_wide bigint, refused_narrowing int,"
            " feed_widened int",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["merge_type_widening"] = Q(
    _q_merge_type_widening,
    """
WITH c AS (
    SELECT (MAX(event_id) + 1) // 10 AS a_lo,
           (MAX(event_id) + 1) // 10
             + GREATEST(1, (MAX(event_id) + 1) // 50) AS a_hi,
           (MAX(event_id) + 1) // 10
             + 2 * GREATEST(1, (MAX(event_id) + 1) // 50) AS b_hi
    FROM events
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(event_id) AS BIGINT) AS id_checksum,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT) + CASE
            WHEN event_id >= c.a_lo AND event_id < c.a_hi
            THEN 1099511627776 ELSE 0 END) AS BIGINT) AS vc_sum,
       CAST(SUM(CASE WHEN event_id >= c.a_lo AND event_id < c.a_hi
            THEN 1 ELSE 0 END) AS BIGINT) AS n_wide,
       CAST(1 AS INT) AS refused_narrowing,
       CAST(1 AS INT) AS feed_widened
FROM events, c
WHERE event_id < c.a_hi OR event_id >= c.b_hi
GROUP BY 1
""",
    doc="MERGE type widening: a wider-typed delta refuses by default (the ANSI-off wrap corruption class, pinned pre-commit); schema_evolution=True widens the stored type zero-rewrite, time travel keeps the narrow shape, the feed crosses the boundary wide",
)


def _q_dml_cast_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DML cast-guard certification (round 16): the silently-wrapping
    cast class is refused on EVERY expression surface, not just merge
    alignment. On a manifest table holding ``vc`` as INT: (1) an
    ``update_where`` whose SET expression analyzes to BIGINT refuses
    driver-side BEFORE any job (version unchanged — the old behavior
    wrapped the value); (2) a conditional-merge
    ``when_matched_update`` with a BIGINT expression refuses the same
    way; (3) the documented opt-in — an EXPLICIT cast inside the
    expression — still works, two's-complement wrap and all (pinned
    arithmetically: +2^40+7 wraps to +7 in int32). The oracle
    recomputes the final state from ``events``; the refusal pins are
    hashed constants a regression breaks.

    Scale shape: both refusals are driver-side schema analysis — zero
    jobs, zero data I/O; the opt-in update pays the normal
    entry-pruned rewrite."""
    import shutil
    import tempfile

    from ..operators.scale import merge_into_partitioned
    from ..operators.table import ManifestTable

    WRAP = 2**40 + 7  # int32-wraps to +7
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    max_id = ev.agg(F.max("event_id")).collect()[0][0]
    band = max(1, (max_id + 1) // 50)
    a_lo = (max_id + 1) // 10
    a_hi = a_lo + band
    evp = (
        ev.withColumn("pt", (F.col("event_id") % 4).cast("int"))
        .withColumn("vc", F.round(F.col("value") * 100).cast("int"))
        .drop("value")
        .repartitionByRange(16, F.col("pt"), F.col("event_id"))
        .sortWithinPartitions("pt", "event_id")
    )
    work = tempfile.mkdtemp(prefix="dml_guard_")
    try:
        mt = ManifestTable(spark, f"{work}/events_guard")
        mt.create(evp, ["pt"])
        where = [
            ("event_id", ">=", a_lo),
            ("event_id", "<", a_hi),
        ]
        refused_update = 0
        try:
            mt.update_where(where, {"vc": f"vc + {WRAP}"})
        except ValueError as exc:
            refused_update = int(
                "wraps/truncates" in str(exc)
                and mt.current_version() == 1
            )
        assert refused_update, "bigint SET into int must refuse"
        refused_merge = 0
        try:
            merge_into_partitioned(
                spark, mt.path,
                evp.filter(
                    (F.col("event_id") >= a_lo)
                    & (F.col("event_id") < a_hi)
                ).select("event_id", "pt"),
                ["event_id"], ["pt"],
                when_matched_update={"vc": f"t.vc + {WRAP}"},
            )
        except ValueError as exc:
            refused_merge = int(
                "wraps/truncates" in str(exc)
                and mt.current_version() == 1
            )
        assert refused_merge, "bigint clause SET into int must refuse"
        # the documented opt-in: explicit cast = chosen wrap (+7)
        mt.update_where(
            where, {"vc": f"cast(vc + {WRAP} as int)"}
        )
        rows = (
            mt.read()
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum("event_id").cast("bigint").alias("id_checksum"),
                F.sum("vc").cast("bigint").alias("vc_sum"),
            )
            .withColumn(
                "refused_update", F.lit(refused_update).cast("int")
            )
            .withColumn(
                "refused_merge", F.lit(refused_merge).cast("int")
            )
            .collect()
        )
        return local_df(spark, 
            rows,
            "event_type string, n_rows bigint, id_checksum bigint,"
            " vc_sum bigint, refused_update int, refused_merge int",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["dml_cast_guard"] = Q(
    _q_dml_cast_guard,
    """
WITH c AS (
    SELECT (MAX(event_id) + 1) // 10 AS a_lo,
           (MAX(event_id) + 1) // 10
             + GREATEST(1, (MAX(event_id) + 1) // 50) AS a_hi
    FROM events
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(event_id) AS BIGINT) AS id_checksum,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT) + CASE
            WHEN event_id >= c.a_lo AND event_id < c.a_hi
            THEN 7 ELSE 0 END) AS BIGINT) AS vc_sum,
       CAST(1 AS INT) AS refused_update,
       CAST(1 AS INT) AS refused_merge
FROM events, c
GROUP BY 1
""",
    doc="DML cast guard: silently-wrapping SET expressions refuse driver-side on update_where and conditional merge (version unchanged, zero jobs); an explicit in-expression cast remains the documented lossy opt-in",
)


def _q_table_bloom_point_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file Bloom membership certification (round 16): point DML
    stays FILE-granular on an UNCLUSTERED key. The table is built
    from ``events`` with an md5-string key scattered across ~32 files
    per partition (every file's key bounds span the whole keyspace —
    the uuid-keyed CDC cold-start shape where min/max bounds prune
    NOTHING and r15's fg selection degraded to partition-granular).
    With ``bloom_cols=["k"]`` each commit records a small packed
    Bloom filter per file; a single-key DELETE then rewrites a strict
    tiny subset of the partition's files (pinned), a probe for an
    absent key scans ZERO files (pinned — false-positive-only
    semantics: a filter can admit a file without a match, never
    exclude one with it, enforced by the rows_deleted==1 pin), and
    untouched files carry forward byte-identically. The oracle
    recomputes the final state arithmetically from ``events``.

    Scale shape: the filter bytes are bounded (recorded only for
    files with ≤1024 distinct keys — the small delta files a
    streaming sink writes); a point DELETE in a hot 10 GB scattered
    partition reads and rewrites ~one file instead of all of them —
    the Delta bloom-index / Iceberg puffin analogue, inlined into the
    manifest (operators/table.py _collect_file_blooms)."""
    import shutil
    import tempfile

    from ..operators.table import ManifestTable

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    max_id = ev.agg(F.max("event_id")).collect()[0][0]
    target_id = (max_id + 1) // 10
    evp = (
        ev.withColumn("pt", (F.col("event_id") % 4).cast("int"))
        .withColumn("k", F.md5(F.col("event_id").cast("string")))
        .withColumn("vc", F.round(F.col("value") * 100).cast("bigint"))
        .drop("value")
        .repartition(32)  # SCATTERED: no key clustering anywhere
    )
    work = tempfile.mkdtemp(prefix="bloom_dml_")
    try:
        mt = ManifestTable(
            spark, f"{work}/events_bloom", bloom_cols=["k"]
        )
        mt.create(evp, ["pt"])
        man = mt.manifest()
        files_by_pt = {
            e["values"][0][1]: len(e["files"])
            for e in man["entries"]
        }
        blooms_everywhere = int(
            all(
                "bloom" in st
                for e in man["entries"]
                for st in e["files"].values()
            )
        )
        # pin 1: an ABSENT key scans zero files (pure bloom win —
        # bounds admit everything here)
        rep = mt.prune_file_stats(
            [("k", "=", "no-such-key-in-any-file")]
        )
        absent_prunes = int(rep["files_scanned"] == 0)
        # pin 2: the point DELETE rewrites a strict tiny subset
        target_k = (
            local_df(spark, [(int(target_id),)], "i bigint")
            .select(F.md5(F.col("i").cast("string")).alias("k"))
            .collect()[0]["k"]
        )
        r = mt.delete_where([("k", "=", target_k)])
        tpt = int(target_id % 4)
        file_granular = int(
            r["rows_deleted"] == 1
            and 1 <= r["files_rewritten"] <= 3
            and r["files_rewritten"] < files_by_pt[tpt]
        )
        rows = (
            mt.read()
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum("event_id").cast("bigint").alias("id_checksum"),
                F.sum("vc").cast("bigint").alias("vc_sum"),
            )
            .withColumn(
                "blooms_recorded",
                F.lit(blooms_everywhere).cast("int"),
            )
            .withColumn(
                "absent_prunes", F.lit(absent_prunes).cast("int")
            )
            .withColumn(
                "file_granular", F.lit(file_granular).cast("int")
            )
            .collect()
        )
        return local_df(spark, 
            rows,
            "event_type string, n_rows bigint, id_checksum bigint,"
            " vc_sum bigint, blooms_recorded int, absent_prunes int,"
            " file_granular int",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["table_bloom_point_dml"] = Q(
    _q_table_bloom_point_dml,
    """
WITH c AS (
    SELECT (MAX(event_id) + 1) // 10 AS target_id FROM events
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(event_id) AS BIGINT) AS id_checksum,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
         AS vc_sum,
       CAST(1 AS INT) AS blooms_recorded,
       CAST(1 AS INT) AS absent_prunes,
       CAST(1 AS INT) AS file_granular
FROM events, c
WHERE event_id <> c.target_id
GROUP BY 1
""",
    doc="per-file Bloom membership: point DELETE on an UNCLUSTERED md5 key rewrites ~1 of ~32 scattered files per partition (bounds prune nothing), absent keys scan zero files, false-positive-only semantics",
)


def _q_table_alter_widen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only widening ALTER certification (round 16):
    ``alter_column_type`` widens a stored INT column to BIGINT ahead
    of the data — zero data I/O (every entry re-referenced verbatim,
    pinned by an empty change-feed diff and untouched file mtimes
    in-function), narrow history reading through the wide manifest
    schema, time travel keeping the old shape — then a PLAIN blind
    merge lands out-of-int-range values with no evolution flag (the
    delta's bigint now matches the stored type exactly). The
    explicit-ALTER twin of ``merge_type_widening``'s write-side path:
    widen BEFORE an int column approaches 2^31 instead of when the
    first wide delta arrives. The oracle recomputes the final state
    arithmetically from ``events``.

    Scale shape: the ALTER is O(manifest) — at 100 TB the alternative
    (rewrite every file wider) is an O(table) job; here the bytes
    never move (Spark 4 parquet widening read, probe-verified
    pairs)."""
    import glob
    import os
    import shutil
    import tempfile

    from ..operators.scale import merge_into_partitioned
    from ..operators.table import ManifestTable

    OFFSET = 2**40
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    max_id = ev.agg(F.max("event_id")).collect()[0][0]
    band = max(1, (max_id + 1) // 50)
    a_lo = (max_id + 1) // 10
    a_hi = a_lo + band
    evp = (
        ev.withColumn("pt", (F.col("event_id") % 4).cast("int"))
        .withColumn("vc", F.round(F.col("value") * 100).cast("int"))
        .drop("value")
        .repartitionByRange(16, F.col("pt"), F.col("event_id"))
        .sortWithinPartitions("pt", "event_id")
    )
    work = tempfile.mkdtemp(prefix="alter_widen_")
    try:
        mt = ManifestTable(spark, f"{work}/events_alter")
        mt.create(evp, ["pt"])
        files = glob.glob(
            os.path.join(mt.path, "_data", "**", "*.parquet"),
            recursive=True,
        )
        mtimes = {f: os.path.getmtime(f) for f in files}
        mt.alter_column_type("vc", "bigint", retain_versions=5)
        meta_only = int(
            {f: os.path.getmtime(f) for f in files} == mtimes
            and mt.changes(1, 2).count() == 0
            and mt.read(version=1)
            .schema["vc"]
            .dataType.simpleString()
            == "int"
            and mt.read().schema["vc"].dataType.simpleString()
            == "bigint"
        )
        assert meta_only, "the ALTER must be a zero-I/O empty diff"
        upd = (
            ev.filter(
                (F.col("event_id") >= a_lo) & (F.col("event_id") < a_hi)
            )
            .withColumn("pt", (F.col("event_id") % 4).cast("int"))
            .select(
                "event_id",
                "event_type",
                (
                    F.round(F.col("value") * 100).cast("bigint")
                    + F.lit(OFFSET).cast("bigint")
                ).alias("vc"),
                "pt",
            )
        )
        # no schema_evolution flag: the types already match
        merge_into_partitioned(
            spark, mt.path, upd, ["event_id"], ["pt"],
            retain_versions=5,
        )
        rows = (
            mt.read()
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum("event_id").cast("bigint").alias("id_checksum"),
                F.sum("vc").cast("bigint").alias("vc_sum"),
            )
            .withColumn("meta_only_alter", F.lit(meta_only).cast("int"))
            .collect()
        )
        return local_df(spark, 
            rows,
            "event_type string, n_rows bigint, id_checksum bigint,"
            " vc_sum bigint, meta_only_alter int",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["table_alter_widen"] = Q(
    _q_table_alter_widen,
    """
WITH c AS (
    SELECT (MAX(event_id) + 1) // 10 AS a_lo,
           (MAX(event_id) + 1) // 10
             + GREATEST(1, (MAX(event_id) + 1) // 50) AS a_hi
    FROM events
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(event_id) AS BIGINT) AS id_checksum,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT) + CASE
            WHEN event_id >= c.a_lo AND event_id < c.a_hi
            THEN 1099511627776 ELSE 0 END) AS BIGINT) AS vc_sum,
       CAST(1 AS INT) AS meta_only_alter
FROM events, c
GROUP BY 1
""",
    doc="metadata-only widening ALTER COLUMN TYPE: zero data I/O (mtimes + empty diff pinned), narrow history reads wide, a later plain merge lands out-of-int-range values with no evolution flag",
)


def _q_merge_dup_key_refusal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE at-most-one-row-per-key ENFORCEMENT certification
    (round 16, second pass): the contract blind and conditional
    merges always documented is now checked — a delta carrying TWO
    rows for the same key refuses loudly BEFORE any table I/O
    (Delta's DELTA_MULTIPLE_SOURCE_ROW_MATCHING analogue; the old
    behavior silently landed both rows in blind mode and fanned the
    matched row out per source row in conditional mode — duplicate
    keys, no error). Pinned in-function: (1) the blind merge of a
    dup-keyed delta refuses pre-commit, version unchanged; (2) the
    conditional-clause merge of the same delta refuses too; (3) the
    SAME dup delta merges fine through ORDERED mode (``ts_col``),
    whose documented job is folding multi-row-per-key changelogs —
    the (ts)-max write wins per key. The oracle recomputes the folded
    final state arithmetically from ``events``.

    Scale shape: the guard is one O(|delta|) short-circuited
    aggregation over the already-snapshotted delta parquet — never
    table-sized; ordered mode (the streaming sink's path) is exempt
    and pays nothing."""
    import shutil
    import tempfile

    from ..operators.scale import merge_into_partitioned
    from ..operators.table import ManifestTable

    OFFSET = 2**40
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    max_id = ev.agg(F.max("event_id")).collect()[0][0]
    band = max(1, (max_id + 1) // 50)
    a_lo = (max_id + 1) // 10
    a_hi = a_lo + band
    evp = (
        ev.withColumn("pt", (F.col("event_id") % 4).cast("int"))
        .withColumn("vc", F.round(F.col("value") * 100).cast("bigint"))
        .withColumn("ts", F.lit(0).cast("bigint"))
        .drop("value")
        .repartitionByRange(16, F.col("pt"), F.col("event_id"))
        .sortWithinPartitions("pt", "event_id")
    )
    work = tempfile.mkdtemp(prefix="merge_dupkey_")
    try:
        mt = ManifestTable(spark, f"{work}/events_dup")
        mt.create(evp, ["pt"])
        in_band = ev.filter(
            (F.col("event_id") >= a_lo) & (F.col("event_id") < a_hi)
        ).withColumn("pt", (F.col("event_id") % 4).cast("int"))
        loser = in_band.select(
            "event_id", "event_type",
            F.lit(-1).cast("bigint").alias("vc"), "pt",
            F.lit(1).cast("bigint").alias("ts"),
        )
        winner = in_band.select(
            "event_id", "event_type",
            (
                F.round(F.col("value") * 100).cast("bigint")
                + F.lit(OFFSET).cast("bigint")
            ).alias("vc"),
            "pt",
            F.lit(2).cast("bigint").alias("ts"),
        )
        dup = loser.unionByName(winner)
        n_band = in_band.count()
        # refusal pins use a TINY literal dup delta: the guard fires
        # before any table I/O, so a 2-row probe pins the identical
        # contract without writing the full band to staging twice
        probe = local_df(spark, 
            [(0, "t", 1, 0, 1), (0, "t", 2, 0, 2)],
            "event_id bigint, event_type string, vc bigint,"
            " pt int, ts bigint",
        )
        # pin 1: blind mode refuses the dup-keyed delta pre-commit
        refused_blind = 0
        try:
            merge_into_partitioned(
                spark, mt.path, probe.drop("ts"), ["event_id"], ["pt"],
                retain_versions=5,
            )
        except ValueError as exc:
            refused_blind = int(
                "at most one" in str(exc) and mt.current_version() == 1
            )
        assert refused_blind, "blind dup-key merge must refuse"
        # pin 2: conditional mode refuses the same shape
        refused_cond = 0
        try:
            merge_into_partitioned(
                spark, mt.path, probe.drop("ts"), ["event_id"], ["pt"],
                when_matched_update={"vc": "s.vc"},
                retain_versions=5,
            )
        except ValueError as exc:
            refused_cond = int(
                "at most one" in str(exc) and mt.current_version() == 1
            )
        assert refused_cond, "conditional dup-key merge must refuse"
        # pin 3: ordered mode FOLDS the full dup delta — (ts)-max wins
        merge_into_partitioned(
            spark, mt.path,
            dup.withColumn("op", F.lit("U")),
            ["event_id"], ["pt"],
            op_col="op", ts_col="ts", retain_versions=5,
        )
        rows = (
            mt.read()
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum("event_id").cast("bigint").alias("id_checksum"),
                F.sum("vc").cast("bigint").alias("vc_sum"),
                F.count(F.when(F.col("vc") >= OFFSET, 1))
                .cast("bigint")
                .alias("n_folded"),
                F.count(F.when(F.col("vc") == -1, 1)).alias("n_loser"),
            )
            .withColumn("refused_blind", F.lit(refused_blind).cast("int"))
            .withColumn("refused_cond", F.lit(refused_cond).cast("int"))
            .collect()
        )
        # fold assertions from the SAME aggregation — no extra scans
        assert sum(r["n_loser"] for r in rows) == 0
        assert sum(r["n_folded"] for r in rows) == n_band
        rows = [
            (
                r["event_type"], r["n_rows"], r["id_checksum"],
                r["vc_sum"], r["n_folded"], r["refused_blind"],
                r["refused_cond"],
            )
            for r in rows
        ]
        return local_df(spark, 
            rows,
            "event_type string, n_rows bigint, id_checksum bigint,"
            " vc_sum bigint, n_folded bigint, refused_blind int,"
            " refused_cond int",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["merge_dup_key_refusal"] = Q(
    _q_merge_dup_key_refusal,
    """
WITH c AS (
    SELECT (MAX(event_id) + 1) // 10 AS a_lo,
           (MAX(event_id) + 1) // 10
             + GREATEST(1, (MAX(event_id) + 1) // 50) AS a_hi
    FROM events
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(event_id) AS BIGINT) AS id_checksum,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT) + CASE
            WHEN event_id >= c.a_lo AND event_id < c.a_hi
            THEN 1099511627776 ELSE 0 END) AS BIGINT) AS vc_sum,
       CAST(SUM(CASE WHEN event_id >= c.a_lo AND event_id < c.a_hi
            THEN 1 ELSE 0 END) AS BIGINT) AS n_folded,
       CAST(1 AS INT) AS refused_blind,
       CAST(1 AS INT) AS refused_cond
FROM events, c
GROUP BY 1
""",
    doc="MERGE dup-key enforcement: a delta with two rows per key refuses loudly pre-commit in blind AND conditional modes (Delta's multiple-source-rows-matched analogue; previously landed duplicate keys silently); ordered mode folds the same delta, (ts)-max wins",
)


def _q_table_metadata_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only aggregates (round 16, second pass):
    ``metadata_agg`` answers ``count(*) / count(col) / null_count /
    min / max`` under a partition predicate from the MANIFEST's
    recorded per-entry stats — ``count()``'s r13 architecture
    generalized to the full stats surface. Pinned in-function: the
    whole aggregate set over ``pt IN (1, 2)`` resolves with ZERO
    entries scanned (``_detail``), and the answer is BYTE-IDENTICAL
    after every data file is deleted outright — the zero-data-I/O
    proof. The oracle recomputes the same aggregates by scanning
    ``events`` in DuckDB.

    Scale shape: at 100 TB this is the difference between an
    O(live entries) driver fold over the manifest and a full scan —
    the Delta-log / parquet-footer answer, manifest-native. Exactness
    is contractual, never approximate: any entry whose stats cannot
    PROVE the aggregate (truncated string bounds, NaN-unbounded
    sides, timestamp zone frames, missing stats) is demoted to an
    exact scan of just that entry."""
    import shutil
    import tempfile

    from ..operators.table import ManifestTable

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    evp = (
        ev.withColumn("pt", (F.col("event_id") % 4).cast("int"))
        .withColumn(
            "vc",
            F.when(F.col("event_id") % 7 == 0, None).otherwise(
                F.round(F.col("value") * 100).cast("bigint")
            ),
        )
        .drop("value")
        .repartitionByRange(16, F.col("pt"), F.col("event_id"))
        .sortWithinPartitions("pt", "event_id")
    )
    work = tempfile.mkdtemp(prefix="meta_agg_")
    try:
        mt = ManifestTable(spark, f"{work}/events_meta")
        mt.create(evp, ["pt"])
        aggs = [
            ("count", "*"), ("count", "vc"), ("null_count", "vc"),
            ("min", "event_id"), ("max", "event_id"),
            ("min", "vc"), ("max", "vc"),
            ("sum", "vc"), ("sum", "event_id"),
        ]
        sel = [("pt", "in", [1, 2])]
        r = mt.metadata_agg(aggs, where=sel, detail=True)
        meta_only = int(
            r["_detail"]["entries_scanned"] == 0
            and r["_detail"]["entries_metadata"] == 2
        )
        assert meta_only, r["_detail"]
        # the zero-I/O proof: with every data file gone, the manifest
        # still answers — identically
        shutil.rmtree(f"{mt.path}/_data")
        r2 = mt.metadata_agg(aggs, where=sel, detail=True)
        zero_io = int(
            all(r2[f"{fn}({c})"] == r[f"{fn}({c})"] for fn, c in aggs)
        )
        assert zero_io, (r, r2)
        return local_df(spark, 
            [
                (
                    r["count(*)"], r["count(vc)"], r["null_count(vc)"],
                    r["min(event_id)"], r["max(event_id)"],
                    r["min(vc)"], r["max(vc)"],
                    r["sum(vc)"], r["sum(event_id)"],
                    meta_only, zero_io,
                )
            ],
            "n_rows bigint, n_vc bigint, n_vc_null bigint,"
            " min_id bigint, max_id bigint, min_vc bigint,"
            " max_vc bigint, sum_vc bigint, sum_id bigint,"
            " meta_only int, zero_io int",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["table_metadata_agg"] = Q(
    _q_table_metadata_agg,
    """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(CASE WHEN event_id % 7 <> 0 THEN 1 END) AS BIGINT)
         AS n_vc,
       CAST(COUNT(CASE WHEN event_id % 7 = 0 THEN 1 END) AS BIGINT)
         AS n_vc_null,
       CAST(MIN(event_id) AS BIGINT) AS min_id,
       CAST(MAX(event_id) AS BIGINT) AS max_id,
       CAST(MIN(CASE WHEN event_id % 7 <> 0
            THEN CAST(ROUND(value * 100) AS BIGINT) END) AS BIGINT)
         AS min_vc,
       CAST(MAX(CASE WHEN event_id % 7 <> 0
            THEN CAST(ROUND(value * 100) AS BIGINT) END) AS BIGINT)
         AS max_vc,
       CAST(SUM(CASE WHEN event_id % 7 <> 0
            THEN CAST(ROUND(value * 100) AS BIGINT) END) AS BIGINT)
         AS sum_vc,
       CAST(SUM(event_id) AS BIGINT) AS sum_id,
       CAST(1 AS INT) AS meta_only,
       CAST(1 AS INT) AS zero_io
FROM events
WHERE event_id % 4 IN (1, 2)
""",
    doc="metadata-only aggregates: count/count(col)/null_count/min/max/sum under a partition predicate answered from manifest stats with zero entries scanned, byte-identical after deleting every data file; per-entry exactness demotion to scan (truncated strings, NaN, ts zone frames, float sums, pre-sum manifests)",
)


def _q_table_partition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition metadata profile (round 16, second pass):
    ``partition_profile`` — :meth:`metadata_agg` grouped by the
    partition columns. One live manifest entry per partition means
    the grouped answer IS the per-entry stats: row-count skew,
    per-partition value ranges, null densities and exact sums — the
    O(live entries) profile an operator reads before choosing a
    repartition/salt strategy on a 100 TB table. Pinned in-function:
    every partition answers with ZERO entries scanned, and the
    profile is byte-identical after deleting every data file. The
    oracle recomputes the same per-partition aggregates with a
    GROUP BY in DuckDB."""
    import shutil
    import tempfile

    from ..operators.table import ManifestTable

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    evp = (
        ev.withColumn("pt", (F.col("event_id") % 4).cast("int"))
        .withColumn(
            "vc",
            F.when(F.col("event_id") % 7 == 0, None).otherwise(
                F.round(F.col("value") * 100).cast("bigint")
            ),
        )
        .drop("value")
        .repartitionByRange(16, F.col("pt"), F.col("event_id"))
        .sortWithinPartitions("pt", "event_id")
    )
    work = tempfile.mkdtemp(prefix="part_profile_")
    try:
        mt = ManifestTable(spark, f"{work}/events_profile")
        mt.create(evp, ["pt"])
        aggs = [
            ("count", "*"), ("count", "vc"), ("null_count", "vc"),
            ("min", "event_id"), ("max", "event_id"), ("sum", "vc"),
        ]
        rows, d = mt.partition_profile(aggs, detail=True)
        meta_only = int(
            d["entries_scanned"] == 0
            and d["entries_metadata"] == d["entries_total"] == 4
        )
        assert meta_only, d
        shutil.rmtree(f"{mt.path}/_data")
        rows2 = mt.partition_profile(aggs)
        zero_io = int(rows2 == rows)
        assert zero_io
        return local_df(spark, 
            [
                (
                    r["pt"], r["count(*)"], r["count(vc)"],
                    r["null_count(vc)"], r["min(event_id)"],
                    r["max(event_id)"], r["sum(vc)"],
                    meta_only, zero_io,
                )
                for r in rows
            ],
            "pt int, n_rows bigint, n_vc bigint, n_vc_null bigint,"
            " min_id bigint, max_id bigint, sum_vc bigint,"
            " meta_only int, zero_io int",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["table_partition_profile"] = Q(
    _q_table_partition_profile,
    """
SELECT CAST(event_id % 4 AS INT) AS pt,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(CASE WHEN event_id % 7 <> 0 THEN 1 END) AS BIGINT)
         AS n_vc,
       CAST(COUNT(CASE WHEN event_id % 7 = 0 THEN 1 END) AS BIGINT)
         AS n_vc_null,
       CAST(MIN(event_id) AS BIGINT) AS min_id,
       CAST(MAX(event_id) AS BIGINT) AS max_id,
       CAST(SUM(CASE WHEN event_id % 7 <> 0
            THEN CAST(ROUND(value * 100) AS BIGINT) END) AS BIGINT)
         AS sum_vc,
       CAST(1 AS INT) AS meta_only,
       CAST(1 AS INT) AS zero_io
FROM events
GROUP BY 1
""",
    doc="per-partition metadata profile: grouped count/nulls/min/max/sum answered from per-entry manifest stats with zero entries scanned (skew + range + null-density in O(live entries)), byte-identical after deleting every data file",
)


def _q_merge_key_move_refusal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-function contract certification (round 16, second
    pass): ``check_key_moves=True`` makes the last documented-only
    merge contract CHECKABLE. A delta that assigns a key a partition
    different from where its stored row lives, while that stored
    partition is UNTOUCHED by the delta, would leave the old row in
    place and land a second one — a silent cross-partition duplicate
    key. Pinned in-function: (1) such a delta REFUSES pre-commit
    (version unchanged); (2) the LEGAL move — the delta touches the
    key's old partition too, so the stored row is contested and
    folds normally — relocates a whole band of keys to
    ``(event_id % 4 + 1) % 4`` in one merge. The oracle recomputes
    the relocated layout arithmetically from ``events``.

    Scale shape: the probe is manifest-pruned by the delta's key
    range for single rangeable keys (a clustered table reads almost
    nothing); worst case is a column-pruned key scan of untouched
    partitions — the reason it is opt-in."""
    import shutil
    import tempfile

    from ..operators.scale import merge_into_partitioned
    from ..operators.table import ManifestTable

    OFFSET = 2**40
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    max_id = ev.agg(F.max("event_id")).collect()[0][0]
    band = max(1, (max_id + 1) // 50)
    a_lo = (max_id + 1) // 10
    a_hi = a_lo + band
    evp = (
        ev.withColumn("pt", (F.col("event_id") % 4).cast("int"))
        .withColumn("vc", F.round(F.col("value") * 100).cast("bigint"))
        .drop("value")
        .repartitionByRange(16, F.col("pt"), F.col("event_id"))
        .sortWithinPartitions("pt", "event_id")
    )
    work = tempfile.mkdtemp(prefix="merge_keymove_")
    try:
        mt = ManifestTable(spark, f"{work}/events_move")
        mt.create(evp, ["pt"])
        # pin 1: a probe key re-homed while its stored partition is
        # untouched refuses loudly pre-commit
        probe_id = a_lo  # lives in pt = a_lo % 4
        wrong_pt = (probe_id % 4 + 1) % 4
        probe = local_df(spark, 
            [(probe_id, "t", 0, wrong_pt)],
            "event_id bigint, event_type string, vc bigint, pt int",
        )
        refused = 0
        try:
            merge_into_partitioned(
                spark, mt.path, probe, ["event_id"], ["pt"],
                check_key_moves=True, retain_versions=5,
            )
        except ValueError as exc:
            refused = int(
                "UNTOUCHED" in str(exc) and mt.current_version() == 1
            )
        assert refused, "an untouched-partition key move must refuse"
        # pin 2: the LEGAL move — the band spans all four partitions,
        # so every key's old partition is touched and folds normally;
        # the whole band relocates one partition over in one merge
        mover = (
            ev.filter(
                (F.col("event_id") >= a_lo) & (F.col("event_id") < a_hi)
            )
            .select(
                "event_id", "event_type",
                (
                    F.round(F.col("value") * 100).cast("bigint")
                    + F.lit(OFFSET).cast("bigint")
                ).alias("vc"),
                ((F.col("event_id") % 4 + 1) % 4)
                .cast("int")
                .alias("pt"),
            )
        )
        merge_into_partitioned(
            spark, mt.path, mover, ["event_id"], ["pt"],
            check_key_moves=True, retain_versions=5,
        )
        rows = (
            mt.read()
            .groupBy("pt")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum("event_id").cast("bigint").alias("id_checksum"),
                F.sum("vc").cast("bigint").alias("vc_sum"),
                F.count(F.when(F.col("vc") >= OFFSET, 1))
                .cast("bigint")
                .alias("n_moved"),
            )
            .withColumn("refused_untouched", F.lit(refused).cast("int"))
            .collect()
        )
        # no key may have duplicated through the move
        assert sum(r["n_rows"] for r in rows) == mt.read().select(
            "event_id"
        ).distinct().count()
        return local_df(spark, 
            rows,
            "pt int, n_rows bigint, id_checksum bigint,"
            " vc_sum bigint, n_moved bigint, refused_untouched int",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["merge_key_move_refusal"] = Q(
    _q_merge_key_move_refusal,
    """
WITH c AS (
    SELECT (MAX(event_id) + 1) // 10 AS a_lo,
           (MAX(event_id) + 1) // 10
             + GREATEST(1, (MAX(event_id) + 1) // 50) AS a_hi
    FROM events
), m AS (
    SELECT event_id,
           CASE WHEN event_id >= c.a_lo AND event_id < c.a_hi
                THEN CAST((event_id % 4 + 1) % 4 AS INT)
                ELSE CAST(event_id % 4 AS INT) END AS pt,
           CAST(ROUND(value * 100) AS BIGINT) + CASE
                WHEN event_id >= c.a_lo AND event_id < c.a_hi
                THEN 1099511627776 ELSE 0 END AS vc
    FROM events, c
)
SELECT pt, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(event_id) AS BIGINT) AS id_checksum,
       CAST(SUM(vc) AS BIGINT) AS vc_sum,
       CAST(SUM(CASE WHEN vc >= 1099511627776 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_moved,
       CAST(1 AS INT) AS refused_untouched
FROM m
GROUP BY 1
""",
    doc="partition-function contract made checkable: check_key_moves=True refuses pre-commit a key re-homed while its stored partition is untouched (the silent cross-partition duplicate); a move whose old partition IS touched folds normally — a whole band relocates one partition over, no key duplicated",
)
