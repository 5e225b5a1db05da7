"""Aggregation operators (SURVEY.md §2.4).

All pure ``pyspark.sql.functions`` — Catalyst plans each groupBy as a
two-phase hash aggregate (partial map-side combine + final after shuffle),
which is exactly the MapReduce combiner pattern the reference world hand
wires, for free (SURVEY.md §4).

Dialect-parity rule (SURVEY.md §5.3): every floating-point aggregate is
rounded identically in the Spark expression and in the oracle SQL, because
summation order differs between engines at the last ulp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load
from .registry import query

# Cutoff used by the flagship pricing summary (TPC-H Q1 shape).
_Q1_CUTOFF = "1998-09-02 00:00:00"


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: scan → filter → groupBy(2) → 7 aggregates → sort.

    The canonical 'report aggregation' Hadoop batch job, Spark-first:
    filter pushes to the parquet scan, the aggregation is partial+final,
    the 6-row result sort is trivial. Scales linearly in input: the only
    shuffle moves (returnflag, linestatus) partial aggregates — a few
    dozen rows per task regardless of input size.
    """
    lineitem = load(spark, sf_dir, "lineitem")
    return (
        lineitem
        .filter(F.col("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


query(
    "agg_groupby_hash",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                              AS sum_qty,
           round(sum(l_extendedprice), 2)                         AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)      AS sum_disc_price,
           round(avg(l_quantity), 6)                              AS avg_qty,
           round(avg(l_extendedprice), 6)                         AS avg_price,
           round(avg(l_discount), 6)                              AS avg_disc,
           count(*)                                               AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF}'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)(pricing_summary)


@query(
    "agg_global",
    oracle="""
    SELECT count(*)                            AS n_rows,
           round(sum(l_quantity), 2)           AS total_qty,
           round(min(l_extendedprice), 2)      AS min_price,
           round(max(l_extendedprice), 2)      AS max_price,
           round(avg(l_discount), 6)           AS avg_disc
    FROM lineitem
    """,
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-wide aggregate, no grouping — the wordcount-total shape.
    Single partial-agg pass, one-row shuffle to the final stage."""
    return load(spark, sf_dir, "lineitem").agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
    )
