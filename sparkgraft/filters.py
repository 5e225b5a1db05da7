"""Projection / filter / predicate operators (SURVEY.md §2.2).

The Hadoop `grep`-style utilities, Spark-first: every predicate here is a
Catalyst ``Column`` expression, so it is pushed into the Parquet scan
(PushedFilters) and evaluated inside whole-stage codegen — zero shuffle,
embarrassingly parallel at any scale. Tests assert the pushdown
(tests/test_plans.py).

Null-handling note: the corpus has no NULL cells (FIXTURES.md), so
``filter_null_handling`` derives them with ``nullif`` — same construct in
both dialects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load
from .registry import query


@query(
    "filter_simple",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1995-06-15 00:00:00'
    """,
)
def filter_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-predicate σ — the grep utility. Predicate reaches the parquet
    scan as a PushedFilter; only 4 of 11 columns are read."""
    return (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit("1995-06-15 00:00:00").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
    )


@query(
    "filter_conjunctive",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    WHERE (l_discount >= 0.05 AND l_quantity < 25.0 AND NOT l_returnflag = 'A')
       OR (l_tax = 0.0 AND l_linestatus = 'F')
    """,
)
def filter_conjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/NOT predicate tree as Column boolean algebra."""
    li = load(spark, sf_dir, "lineitem")
    pred = (
        (F.col("l_discount") >= 0.05)
        & (F.col("l_quantity") < 25.0)
        & ~(F.col("l_returnflag") == "A")
    ) | ((F.col("l_tax") == 0.0) & (F.col("l_linestatus") == "F"))
    return li.filter(pred).select("l_orderkey", "l_linenumber", "l_extendedprice")


@query(
    "filter_in_list",
    oracle="""
    SELECT event_id, event_type, user_id
    FROM events
    WHERE event_type IN ('purchase', 'signup', 'error')
    """,
)
def filter_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "signup", "error"))
        .select("event_id", "event_type", "user_id")
    )


@query(
    "filter_like",
    oracle=r"""
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE p_type LIKE '%BRASS%' OR regexp_matches(p_name, '^[a-f].*e$')
    """,
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE + regex predicates. NB regexp dialect: Spark rlike is
    unanchored search, same as DuckDB regexp_matches — anchors written
    explicitly so both mean the same."""
    return (
        load(spark, sf_dir, "part")
        .filter(F.col("p_type").like("%BRASS%") | F.col("p_name").rlike(r"^[a-f].*e$"))
        .select("p_partkey", "p_name", "p_type")
    )


@query(
    "filter_null_handling",
    oracle="""
    SELECT o_orderkey,
           nullif(o_orderstatus, 'O')                          AS status_or_null,
           (nullif(o_orderstatus, 'O') IS NOT DISTINCT FROM NULL) AS is_open
    FROM orders
    WHERE nullif(o_orderstatus, 'O') IS NULL
       OR nullif(o_orderstatus, 'O') IS NOT DISTINCT FROM 'F'
    """,
)
def filter_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS NULL + null-safe equality (<=>). Corpus has no physical NULLs,
    so they are derived via nullif — identical semantics both engines."""
    o = load(spark, sf_dir, "orders")
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return (
        o.filter(status_or_null.isNull() | status_or_null.eqNullSafe(F.lit("F")))
        .select(
            "o_orderkey",
            status_or_null.alias("status_or_null"),
            status_or_null.eqNullSafe(F.lit(None).cast("string")).alias("is_open"),
        )
    )


@query(
    "filter_between_range",
    oracle="""
    SELECT event_id, ts, value
    FROM events
    WHERE ts BETWEEN TIMESTAMP '2024-01-10 00:00:00' AND TIMESTAMP '2024-01-12 00:00:00'
      AND value BETWEEN 10.0 AND 50.0
    """,
)
def filter_between_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .filter(
            F.col("ts").between("2024-01-10 00:00:00", "2024-01-12 00:00:00")
            & F.col("value").between(10.0, 50.0)
        )
        .select("event_id", "ts", "value")
    )


@query(
    "project_computed",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount)               AS disc_price,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
           l_quantity * 2                                   AS double_qty
    FROM lineitem
    WHERE l_linenumber = 1
    """,
)
def project_computed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row arithmetic is returned RAW, never rounded: IEEE-754 ops with
    identical operand order are bit-identical across engines, whereas
    round() itself diverges (Spark rounds the decimal shortest-repr,
    DuckDB rounds the binary value — a .xxx5 boundary flips). Rounding is
    reserved for order-sensitive aggregates (SURVEY.md §5.3, sharpened)."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        disc.alias("disc_price"),
        (disc * (1 + F.col("l_tax"))).alias("charge"),
        (F.col("l_quantity") * 2).alias("double_qty"),
    )


@query(
    "project_case_when",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 200000 THEN 'high'
                WHEN o_totalprice >= 100000 THEN 'mid'
                ELSE 'low' END                                    AS price_band,
           CASE o_orderstatus WHEN 'O' THEN 'open'
                              WHEN 'F' THEN 'finished'
                              ELSE 'other' END                    AS status_word
    FROM orders
    """,
)
def project_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 200000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.when(F.col("o_orderstatus") == "O", "open")
        .when(F.col("o_orderstatus") == "F", "finished")
        .otherwise("other")
        .alias("status_word"),
    )
