"""SQL entry path (SURVEY.md §3 entry point 3): the engine accepts raw
ANSI SQL over registered views — same Catalyst pipeline as the DataFrame
builders, plus the ANTLR parse in front. One representative query proves
the path; its text is dialect-portable and doubles as its own oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog import register_tables
from .registry import query

_Q3_SQL = """
SELECT o.o_orderkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       o.o_orderdate
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue DESC, o.o_orderkey
LIMIT 10
"""


@query("sql_entry_topk_revenue", oracle=_Q3_SQL)
def sql_entry_topk_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape submitted as a SQL string over registered views —
    the identical text runs on DuckDB as the oracle, proving dialect
    portability end-to-end (parse -> analyze -> optimize -> execute)."""
    register_tables(spark, sf_dir, ["customer", "orders", "lineitem"])
    return spark.sql(_Q3_SQL)


_TOP2_SQL = """
WITH ranked AS (
  SELECT n.n_name,
         c.c_name,
         round(c.c_acctbal, 2) AS acctbal,
         row_number() OVER (PARTITION BY n.n_name
                            ORDER BY c.c_acctbal DESC, c.c_custkey) AS rn
  FROM customer c
  JOIN nation n ON c.c_nationkey = n.n_nationkey
)
SELECT n_name, c_name, acctbal, rn
FROM ranked
WHERE rn <= 2
ORDER BY n_name, rn
"""


@query("sql_entry_window_cte", oracle=_TOP2_SQL)
def sql_entry_window_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second SQL-entry proof point: CTE + join + window + qualify-style
    filter in ONE dialect-portable text (top-2 customers per nation).
    Exercises the parser paths the Q3 shape doesn't — WITH resolution and
    window-in-CTE — again with the identical text as its own oracle."""
    register_tables(spark, sf_dir, ["customer", "nation"])
    return spark.sql(_TOP2_SQL)


_SPINE_SQL = """
WITH RECURSIVE spine(day) AS (
  SELECT CAST('2024-01-01' AS DATE)
  UNION ALL
  SELECT CAST(day + INTERVAL '1' DAY AS DATE) FROM spine
  WHERE day < CAST('2024-01-30' AS DATE)
),
daily AS (
  SELECT CAST(ts AS DATE) AS day,
         count(*) AS n_events,
         round(sum(value), 2) AS total_value
  FROM events
  GROUP BY CAST(ts AS DATE)
)
SELECT CAST(s.day AS VARCHAR(10)) AS day,
       COALESCE(d.n_events, 0) AS n_events,
       COALESCE(d.total_value, 0.0) AS total_value
FROM spine s
LEFT JOIN daily d ON s.day = d.day
ORDER BY s.day
"""


@query("sql_entry_recursive_spine", oracle=_SPINE_SQL)
def sql_entry_recursive_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-CTE entry: generate a calendar day spine (WITH RECURSIVE,
    Spark 4's iterative CTE execution) and gap-fill the daily event
    aggregate against it — the canonical time-series densification
    utility, in ONE dialect-portable text that is also its own oracle.
    The recursion is 30 driver-side rows (a spine, not data); the data
    path stays one scan + one hash aggregate + a broadcast-sized join."""
    register_tables(spark, sf_dir, ["events"])
    return spark.sql(_SPINE_SQL)


_LATERAL_SQL = """
SELECT n.n_name, t.c_name, t.c_acctbal
FROM nation n
CROSS JOIN LATERAL (
  SELECT c_name, c_acctbal
  FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_name
  LIMIT 2
) t
ORDER BY n.n_name, t.c_acctbal DESC, t.c_name
"""


@query("sql_entry_lateral_topk", oracle=_LATERAL_SQL)
def sql_entry_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery entry: top-2 customers per nation as a
    per-row dependent subquery — the third SQL parser surface (after CTE+
    window and recursive CTE) in ONE dialect-portable text that is its own
    oracle. Catalyst decorrelates the lateral into a ranked join (the
    rewrite DomainJoin → window-filter), so despite the row-at-a-time
    surface syntax, the physical plan is the same one shuffle + local
    rank as `win_row_number_topn` — nothing executes per-outer-row."""
    register_tables(spark, sf_dir, ["customer", "nation"])
    return spark.sql(_LATERAL_SQL)


_PIVOT_SQL = """
SELECT prio,
       round(O, 2) AS total_open,
       round(F, 2) AS total_filled,
       round(P, 2) AS total_pending
FROM (SELECT o_orderpriority AS prio, o_orderstatus AS st, o_totalprice AS v
      FROM orders)
PIVOT (sum(v) FOR st IN ('O', 'F', 'P'))
ORDER BY prio
"""


@query("sql_entry_pivot_sql", oracle=_PIVOT_SQL)
def sql_entry_pivot_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-standard PIVOT clause entry (the fourth parser surface):
    revenue by priority × order status as ONE dialect-portable text that
    is its own oracle — the aggregate stays pure inside the PIVOT (both
    engines require it) and the rounding happens in the outer projection
    over the pivoted columns. Spark plans this as the same single
    two-phase pivot aggregate as the DataFrame `agg_pivot` twin — the
    IN-list makes the output schema static, so no distinct-values job
    runs first."""
    register_tables(spark, sf_dir, ["orders"])
    return spark.sql(_PIVOT_SQL)


_Q8_SQL = """
WITH rev AS (
  SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
         CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
              AS BIGINT) AS cents,
         r.r_name AS supp_region
  FROM lineitem l
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  JOIN region r   ON n.n_regionkey = r.r_regionkey
)
SELECT o_year,
       ROUND(CAST(SUM(CASE WHEN supp_region = 'ASIA' THEN cents ELSE 0 END)
                  AS DOUBLE) / CAST(SUM(cents) AS DOUBLE), 6) AS asia_share,
       ROUND(CAST(SUM(cents) AS DOUBLE) / 100.0, 2) AS total_revenue
FROM rev
GROUP BY o_year
ORDER BY o_year
"""


@query("sql_entry_market_share", oracle=_Q8_SQL)
def sql_entry_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): the yearly revenue share
    supplied from one region, as ONE dialect-portable text that is its
    own oracle. Exact-arithmetic discipline: line revenue is rounded to
    int64 CENTS before any aggregation, so both engines sum identical
    integers in any order and the share divides two exact integers —
    no float-accumulation drift at any parallelism. Plan shape at scale:
    the fact-fact lineitem⋈orders equi-shuffles on orderkey; supplier,
    nation and region are dimension tables under the AQE auto-broadcast
    threshold (nation/region bounded by geography at ANY corpus size),
    so the plan is one shuffle chain plus broadcast hash probes, then a
    7-group hash aggregate."""
    register_tables(
        spark, sf_dir, ["lineitem", "orders", "supplier", "nation", "region"]
    )
    return spark.sql(_Q8_SQL)


_Q7_SQL = """
WITH flows AS (
  SELECT cn.n_name AS cust_nation,
         sn.n_name AS supp_nation,
         CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
              AS BIGINT) AS cents
  FROM lineitem l
  JOIN orders o    ON l.l_orderkey = o.o_orderkey
  JOIN customer c  ON o.o_custkey = c.c_custkey
  JOIN nation cn   ON c.c_nationkey = cn.n_nationkey
  JOIN supplier s  ON l.l_suppkey = s.s_suppkey
  JOIN nation sn   ON s.s_nationkey = sn.n_nationkey
  WHERE cn.n_nationkey <> sn.n_nationkey
)
SELECT cust_nation, supp_nation,
       ROUND(CAST(SUM(cents) AS DOUBLE) / 100.0, 2) AS trade_volume,
       COUNT(*) AS n_items
FROM flows
GROUP BY cust_nation, supp_nation
ORDER BY trade_volume DESC, cust_nation, supp_nation
LIMIT 20
"""


@query("sql_entry_nation_trade", oracle=_Q7_SQL)
def sql_entry_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): cross-border trade volume per
    (customer nation, supplier nation) pair, top-20 lanes — ONE
    dialect-portable text that is its own oracle, with the same int64
    CENTS discipline as the Q8 twin so both engines aggregate exact
    integers. The self-referenced nation dimension appears under two
    aliases; Catalyst broadcasts both probes (25 rows each at any data
    scale) while the two fact hops (lineitem⋈orders on orderkey, then
    ⋈customer on custkey) stay equi-shuffles. The ≤ n²−n lane space is
    bounded by geography, so the final aggregate and the top-20 sort
    never grow with the corpus."""
    register_tables(
        spark, sf_dir, ["lineitem", "orders", "customer", "supplier", "nation"]
    )
    return spark.sql(_Q7_SQL)


_GBA_SQL = """
SELECT o_orderpriority, o_orderstatus,
       COUNT(*) AS n_orders,
       ROUND(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
             / 100.0, 2) AS revenue
FROM orders
GROUP BY ALL
ORDER BY o_orderpriority, o_orderstatus
"""


@query("sql_entry_groupby_all", oracle=_GBA_SQL)
def sql_entry_groupby_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL (the modern analyst shorthand — every non-aggregate
    select item becomes a grouping key) as a fifth dialect-portable
    parser surface: supported natively by both engines (Spark ≥ 3.4,
    DuckDB), one text is its own oracle. Same int64-cent discipline;
    plans as the ordinary two-phase hash aggregate — the sugar is
    purely analysis-time."""
    register_tables(spark, sf_dir, ["orders"])
    return spark.sql(_GBA_SQL)


# Spark-side text carries optimizer HINTS (/*+ BROADCAST, MERGE */) —
# a semantic no-op, so the UNHINTED text is the DuckDB oracle.
_HINTS_SQL_SPARK = """
SELECT /*+ BROADCAST(n), MERGE(o) */
       n.n_name,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS cents
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name
ORDER BY n.n_name
"""

_HINTS_SQL_ORACLE = _HINTS_SQL_SPARK.replace(
    "/*+ BROADCAST(n), MERGE(o) */", ""
)


@query("sql_entry_join_hints", oracle=_HINTS_SQL_ORACLE)
def sql_entry_join_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL optimizer HINTS surface: the query text carries
    `/*+ BROADCAST(n), MERGE(o) */`, steering the nation dim into a
    broadcast hash join and the orders-customer join into sort-merge —
    the escape hatch users reach for when stats mislead Catalyst at
    100 TB (a hinted plan is reproducible; an auto-planned one depends
    on collected stats). Hints are semantic no-ops, so the oracle runs
    the identical text minus the hint comment; the hint's physical
    effect (BroadcastHashJoin on nation, SortMergeJoin on the fact
    chain) is asserted in tests/test_plans.py."""
    register_tables(spark, sf_dir, ["orders", "customer", "nation"])
    return spark.sql(_HINTS_SQL_SPARK)


_Q17_SQL = """
WITH promo AS (
  SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_type = 'PROMO')
SELECT CAST(count(*) AS BIGINT) AS n_small,
       ROUND(CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                  AS DOUBLE) / 700.0, 2) AS avg_yearly
FROM promo l
WHERE l.l_quantity < 0.5 * (SELECT avg(l2.l_quantity)
                            FROM lineitem l2
                            WHERE l2.l_partkey = l.l_partkey)
"""


@query("sql_entry_small_qty_revenue", oracle=_Q17_SQL)
def sql_entry_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue) as dialect-portable
    SQL text: the per-part average-quantity CORRELATED scalar subquery is
    the whole point — Catalyst de-correlates it into an aggregate +
    equi-join on l_partkey (asserted in tests/test_plans.py), which is
    the only shape that survives 100 TB (a per-row re-scan of lineitem
    would be O(n²); the de-correlated form is one extra hash aggregate
    partitioned on the SAME key as the probe join, so AQE can co-locate
    both sides). Adapted to this corpus's schema: the Q17 p_brand /
    p_container filter becomes p_type = 'PROMO' (part carries no
    container column here — TESTDATA.md).

    Determinism: l_quantity is integral (1..50, verified in tests), so
    each per-part avg is an exact-integer sum over a bounded fan-in
    divided by a count — bit-identical across engines regardless of
    summation order; revenue rides the int64-cent discipline and divides
    by 7 years only after the exact cent sum."""
    register_tables(spark, sf_dir, ["lineitem", "part"])
    return spark.sql(_Q17_SQL)


_Q21_SQL = """
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM supplier s
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 150 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1
                  FROM lineitem l3
                  JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 150 DAY)
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 25
"""


@query("sql_entry_waiting_suppliers", oracle=_Q21_SQL)
def sql_entry_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): the hardest
    correlated-subquery topology in the TPC-H suite — one EXISTS and one
    NOT EXISTS, both correlated on the fact table's own key, stacked on
    a three-way join. Catalyst rewrites them into a left-semi and a
    left-anti join on l_orderkey; because ALL THREE lineitem legs hash
    on the same key, the physical plan is one shuffle of lineitem reused
    across the semi/anti probes rather than three scans shuffled three
    ways — the difference between feasible and not at 100 TB. Adapted to
    this corpus's schema: Q21's l_receiptdate > l_commitdate lateness
    becomes l_shipdate > o_orderdate + 150 days (lineitem carries no
    receipt/commit dates here — TESTDATA.md); multi-supplier F-status
    orders with exactly one late supplier are the target, as in spec.

    Determinism: pure integer/date predicates, count aggregate, total
    ORDER BY (numwait DESC, s_name) before LIMIT."""
    register_tables(spark, sf_dir, ["supplier", "lineitem", "orders"])
    return spark.sql(_Q21_SQL)


_Q22_SQL = """
WITH hot AS (
  SELECT avg(CAST(ROUND(c2.c_acctbal * 100) AS BIGINT)) AS avg_cents
  FROM customer c2
  WHERE c2.c_acctbal > 0
    AND c2.c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
SELECT c.c_nationkey AS cntrycode,
       CAST(count(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
         AS totacctbal_cents
FROM customer c
WHERE c.c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
  AND CAST(ROUND(c.c_acctbal * 100) AS BIGINT) >
      (SELECT avg_cents FROM hot)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY c.c_nationkey
ORDER BY c.c_nationkey
"""


@query("sql_entry_sales_opportunity", oracle=_Q22_SQL)
def sql_entry_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): above-average-balance
    customers in a 7-country set who have never placed a 1-URGENT order.
    Exercises the remaining subquery surfaces the other SQL entries
    don't: an UNCORRELATED scalar subquery used as a filter threshold
    (planned as a 1-row broadcast — a subquery that re-ran per row would
    be quadratic at scale) plus a correlated NOT EXISTS that Catalyst
    turns into a left-anti join on o_custkey. Adapted to this corpus's
    schema: Q22's substring(c_phone,1,2) country code becomes
    c_nationkey (customer carries no phone column here — TESTDATA.md),
    and "no orders at all" becomes "no urgent orders" because this dense
    synthetic corpus gives every customer at least two orders.

    Determinism: the threshold is an avg over EXACT int64 cents (sum of
    integers is order-independent in double up to 2^53 — bit-identical
    across engines), compared against int64 cents, so no float summation
    order can flip a borderline row; output rides the cent discipline."""
    register_tables(spark, sf_dir, ["customer", "orders"])
    return spark.sql(_Q22_SQL)
