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
