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
