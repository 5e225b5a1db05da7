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
