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

from pyspark.sql import DataFrame, SparkSession, Window
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


@query(
    "agg_count_distinct",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           count(*)                AS n_events
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct per group. Catalyst plans this as expand + two-phase
    aggregate (partial distinct before the shuffle), the scalable form."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
        .orderBy("event_type")
    )


@query("agg_approx_count_distinct")  # rows-only: HLL estimates are engine-specific
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct — THE 100 TB cardinality tool (one pass, no
    expand, fixed-size sketch). Estimates differ per engine, so no oracle;
    the invariant test pins the estimate within rsd of exact."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.02).alias("approx_users"))
        .orderBy("event_type")
    )


@query(
    "agg_distinct_rows",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
)
def agg_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT == groupBy(all cols) — the exact-dedup utility on rows."""
    return load(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@query(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           grouping(l_returnflag)::INT  AS g_flag,
           grouping(l_linestatus)::INT  AS g_status,
           round(sum(l_quantity), 2)    AS sum_qty,
           count(*)                     AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals: (flag,status) → (flag) → (). grouping()
    columns disambiguate real NULLs from subtotal rows."""
    return (
        load(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count("*").alias("n"),
        )
    )


@query(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           grouping(l_returnflag)::INT  AS g_flag,
           grouping(l_linestatus)::INT  AS g_status,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           grouping(l_returnflag)::INT AS g_flag,
           grouping(l_linestatus)::INT AS g_status,
           count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets via the SQL path (the DataFrame API has no
    direct grouping-sets builder; spark.sql IS the idiomatic route)."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("_gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS INT) AS g_flag,
               CAST(grouping(l_linestatus) AS INT) AS g_status,
               count(*) AS n
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


@query(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_discount), 6)              AS sd_disc,
           round(var_samp(l_discount), 6)                 AS var_disc,
           round(corr(l_quantity, l_discount), 6)         AS corr_qty_disc,
           round(covar_samp(l_quantity, l_discount), 6)   AS cov_qty_disc,
           round(avg(l_quantity), 6)                      AS avg_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate family. Small-magnitude columns on purpose:
    rounding big variances is ulp-fragile across engines (SURVEY.md §5.3);
    skewness/kurtosis are excluded from the oracle because Spark uses the
    population formula and DuckDB the sample-adjusted one."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_discount"), 6).alias("sd_disc"),
            F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
            F.round(F.corr("l_quantity", "l_discount"), 6).alias("corr_qty_disc"),
            F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias("cov_qty_disc"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_collect_sorted",
    oracle="""
    SELECT l_orderkey,
           array_to_string(list(l_linenumber ORDER BY l_linenumber), '|') AS line_numbers
    FROM lineitem
    GROUP BY l_orderkey
    """,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group sorted list. collect_list order is nondeterministic under
    parallelism — sort_array AFTER collection restores determinism; the
    sort happens on the INT array (so 10 sorts after 2), then the surface
    projects to a '|'-joined string for driver hashability."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.array_join(
                F.sort_array(F.collect_list("l_linenumber")).cast("array<string>"), "|"
            ).alias("line_numbers")
        )
    )


@query(
    "agg_min_max_by",
    oracle="""
    SELECT o_custkey,
           max_by(o_orderkey, o_totalprice) AS best_order,
           min_by(o_orderkey, o_totalprice) AS worst_order,
           round(max(o_totalprice), 2)      AS best_price
    FROM orders
    GROUP BY o_custkey
    """,
)
def agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmax/argmin. Determinism note: verified zero per-custkey
    o_totalprice ties in the corpus; with ties max_by picks arbitrarily in
    both engines and the key would need a struct-valued ordering."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.max_by("o_orderkey", "o_totalprice").alias("best_order"),
            F.min_by("o_orderkey", "o_totalprice").alias("worst_order"),
            F.round(F.max("o_totalprice"), 2).alias("best_price"),
        )
    )


@query(
    "agg_conditional",
    oracle="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END), 2) AS qty_open,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END), 2) AS qty_finished,
           count(CASE WHEN l_discount > 0.05 THEN 1 END)                          AS n_discounted
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manual pivot via sum(CASE WHEN) — fixed output columns, unlike
    .pivot() whose column set is data-dependent (SURVEY.md §2.4 note)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.sum(F.when(F.col("l_linestatus") == "O", F.col("l_quantity")).otherwise(0.0)), 2).alias("qty_open"),
            F.round(F.sum(F.when(F.col("l_linestatus") == "F", F.col("l_quantity")).otherwise(0.0)), 2).alias("qty_finished"),
            F.count(F.when(F.col("l_discount") > 0.05, F.lit(1))).alias("n_discounted"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_histogram",
    oracle="""
    SELECT CAST(floor(value / 50.0) AS BIGINT) AS bucket,
           count(*)                            AS n,
           round(avg(value), 6)                AS avg_value
    FROM events
    GROUP BY 1
    ORDER BY bucket
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via floor-divide (DuckDB 1.0 lacks
    width_bucket, so the portable construction is arithmetic)."""
    return (
        load(spark, sf_dir, "events")
        .groupBy(F.floor(F.col("value") / 50.0).cast("bigint").alias("bucket"))
        .agg(F.count("*").alias("n"), F.round(F.avg("value"), 6).alias("avg_value"))
        .orderBy("bucket")
    )


@query(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
           round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.90), 4) AS p90,
           round(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
           round(median(l_quantity), 4)                   AS med_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles per group (Spark `percentile` ==
    DuckDB `quantile_cont`: both linear-interpolation, parity verified to
    the 4th decimal). Exact percentile is a full-sort-per-group operator —
    fine as the small-N verification baseline; the 100 TB path is
    `agg_approx_quantile` below, whose sketch merges associatively."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_extendedprice, 0.25)"), 4).alias("p25"),
            F.round(F.expr("percentile(l_extendedprice, 0.50)"), 4).alias("p50"),
            F.round(F.expr("percentile(l_extendedprice, 0.90)"), 4).alias("p90"),
            F.round(F.expr("percentile(l_extendedprice, 0.99)"), 4).alias("p99"),
            F.round(F.expr("median(l_quantity)"), 4).alias("med_qty"),
        )
        .orderBy("l_returnflag")
    )


@query("agg_approx_quantile")  # rows-only: sketch estimates are engine-specific
def agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles via the Greenwald-Khanna sketch
    (`approx_percentile`, accuracy 10000 -> max rank error 0.01%).
    The scale path for quantiles: sketches merge associatively in the
    partial-aggregate stage, so no per-group sort ever happens; error is
    invariant-tested against `agg_percentiles` (tests/test_invariants)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("approx_percentile(l_extendedprice, 0.25, 10000)"), 4).alias("p25"),
            F.round(F.expr("approx_percentile(l_extendedprice, 0.50, 10000)"), 4).alias("p50"),
            F.round(F.expr("approx_percentile(l_extendedprice, 0.90, 10000)"), 4).alias("p90"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_mode_deterministic",
    oracle="""
    SELECT event_type, k_mode, n FROM (
      SELECT event_type, k, count(*) AS n,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY count(*) DESC, k) AS rn
      FROM (SELECT event_type,
                   CAST(json_extract_string(props, '$.k') AS INT) AS k
            FROM events) t
      GROUP BY event_type, k
    ) r(event_type, k_mode, n, rn)
    WHERE rn = 1
    ORDER BY event_type
    """,
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-frequent value per group with a pinned tie-break (lowest value
    wins) — built from count + rank instead of `F.mode`, whose tie choice
    is undefined. Two hash aggregates + a tiny window; the count
    aggregation is the only data-sized shuffle."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events").select(
        "event_type", F.get_json_object("props", "$.k").cast("int").alias("k")
    )
    counts = e.groupBy("event_type", "k").agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy(F.desc("n"), "k")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_type", F.col("k").alias("k_mode"), "n")
        .orderBy("event_type")
    )


@query(
    "agg_pivot",
    oracle="""
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'O')                    AS "O_n",
           round(coalesce(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 0), 2) AS "O_total",
           count(*) FILTER (WHERE o_orderstatus = 'F')                    AS "F_n",
           round(coalesce(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 0), 2) AS "F_total",
           count(*) FILTER (WHERE o_orderstatus = 'P')                    AS "P_n",
           round(coalesce(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'P'), 0), 2) AS "P_total"
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide pivot: order counts and totals per priority × status.

    The pivot values are an EXPLICIT list — with an implicit list Spark
    runs a distinct-collect job over the pivot column first, a hidden
    corpus-sized action; with explicit values the whole thing is one
    partial+final hash aggregate, shuffling only the group keys. Missing
    (priority, status) cells surface as count 0 / total 0, matching the
    oracle's coalesce."""
    o = load(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        # count(lit(1)): pivot rejects the '*' star expression
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("total"))
    )
    # pivot cells with no rows come back null; normalize AFTER the pivot
    # (pivot agg expressions must be bare aggregates, so the rounding
    # can't live inside the .agg)
    cols = [F.col("o_orderpriority")]
    for s in ("O", "F", "P"):
        cols.append(F.coalesce(F.col(f"{s}_n"), F.lit(0)).alias(f"{s}_n"))
        cols.append(
            F.round(F.coalesce(F.col(f"{s}_total"), F.lit(0.0)), 2).alias(f"{s}_total")
        )
    return piv.select(*cols).orderBy("o_orderpriority")


@query(
    "agg_unpivot",
    oracle="""
    WITH long_ AS (
      SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS v FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
    )
    SELECT l_returnflag, measure,
           count(*)            AS n,
           round(sum(v), 2)    AS total,
           round(avg(v), 6)    AS mean
    FROM long_
    GROUP BY l_returnflag, measure
    ORDER BY l_returnflag, measure
    """,
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (melt) + per-measure stats — the inverse of
    `agg_pivot` and the standard reshape before a generic per-metric
    aggregation. `DataFrame.unpivot` is a zero-shuffle narrow transform
    (each row expands to 3 in place); only the follow-up groupBy
    shuffles, and only (flag, measure) keys at that."""
    li = load(spark, sf_dir, "lineitem")
    long_ = li.unpivot(
        ids=["l_returnflag"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="measure",
        valueColumnName="v",
    )
    return (
        long_.groupBy("l_returnflag", "measure")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("v"), 2).alias("total"),
            F.round(F.avg("v"), 6).alias("mean"),
        )
        .orderBy("l_returnflag", "measure")
    )


@query(
    "agg_corr",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6)       AS corr_qty_price,
           round(covar_samp(l_quantity, l_discount), 6)      AS covar_qty_disc,
           round(covar_pop(l_quantity, l_discount), 6)       AS covar_pop_qty_disc,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS slope_price_on_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics per group: correlation, sample/population
    covariance, and the regression slope — all streaming co-moment
    aggregates (partial+final, single shuffle of 3 groups). Rounded
    identically on both sides because co-moment accumulation order
    differs between engines at the last ulp."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
            F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias("covar_qty_disc"),
            F.round(F.covar_pop("l_quantity", "l_discount"), 6).alias("covar_pop_qty_disc"),
            F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope_price_on_qty"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_boolean",
    oracle="""
    SELECT event_type,
           bool_and(value > 1.0)    AS all_above_1,
           bool_or(value > 180.0)   AS any_above_180,
           count_if(value > 50.0)::BIGINT AS n_above_50,
           count_if(value > 50.0) * 1.0 / count(*) AS frac_above_50
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def agg_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean reduction family — every/any/conditional-count, the
    predicate-audit shape ("do ALL rows satisfy the invariant; how many
    violate it"). Boolean partials AND/OR-combine map-side like any
    other partial aggregate, so the shuffle carries one bit per group."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.bool_and(F.col("value") > 1.0).alias("all_above_1"),
            F.bool_or(F.col("value") > 180.0).alias("any_above_180"),
            F.count_if(F.col("value") > 50.0).alias("n_above_50"),
            (
                F.count_if(F.col("value") > 50.0) * F.lit(1.0) / F.count("*")
            ).alias("frac_above_50"),
        )
        .orderBy("event_type")
    )


@query(
    "agg_weighted_avg",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 6)
             AS qty_weighted_price,
           round(sum(l_extendedprice * (1 - l_discount)) /
                 sum(l_extendedprice), 6) AS effective_discount_factor
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted means (Σw·x / Σw) — the shape behind every per-group
    blended metric. Two plain sums per group, partial+final; never
    avg(x*w) (wrong) and never a two-pass join (wasteful)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_quantity"))
                / F.sum("l_quantity"),
                6,
            ).alias("qty_weighted_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                / F.sum("l_extendedprice"),
                6,
            ).alias("effective_discount_factor"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_having",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             count(*)::BIGINT AS n_items
      FROM lineitem
      GROUP BY l_suppkey)
    SELECT r.l_suppkey AS suppkey, s.s_name, r.revenue, r.n_items
    FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.revenue > (SELECT avg(revenue) FROM rev)
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING-over-aggregate with a scalar-subquery threshold (TPC-H Q15
    shape): per-supplier revenue, kept only above the all-supplier mean.
    The mean is a 1-row aggregate-of-aggregate broadcast onto the grouped
    frame — no second pass over lineitem, no driver collect; the grouped
    frame is computed once and reused for both sides."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.count("*").alias("n_items"),
    )
    mean = rev.agg(F.avg("revenue").alias("mean_rev"))
    return (
        rev.join(F.broadcast(mean))
        .filter(F.col("revenue") > F.col("mean_rev"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(F.col("l_suppkey").alias("suppkey"), "s_name", "revenue", "n_items")
    )


@query("agg_hll_sketch")  # rows-only: sketch estimates are engine-specific
def agg_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HyperLogLog distinct counting (Apache DataSketches HLL,
    built into Spark 3.5+): distinct customers per order priority as a
    sketch AGGREGATE, then an estimate over the merged sketch.

    This — not exact count_distinct — is the 100 TB cardinality path:
    sketches are fixed-size (lgK=12 → ~2.5 KB), merge associatively in
    the partial/final aggregate (no Expand blow-up, no second shuffle),
    and can be stored per-partition and re-merged across days without
    rescanning. Invariant-tested against exact distinct counts
    (tests/test_invariants.py): estimate within the published HLL error
    envelope."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col("o_custkey"), F.lit(12))
            ).alias("approx_customers")
        )
        .orderBy("o_orderpriority")
    )


@query(
    "agg_skewness_kurtosis",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             avg(l_quantity)                       AS mu,
             avg(l_quantity * l_quantity)          AS e2,
             avg(l_quantity ^ 3)                   AS e3,
             avg(l_quantity ^ 4)                   AS e4,
             count(*)::BIGINT                      AS n_rows
      FROM lineitem GROUP BY l_returnflag),
    c AS (
      SELECT l_returnflag, n_rows,
             e2 - mu * mu                                        AS m2,
             e3 - 3 * mu * e2 + 2 * mu ^ 3                       AS m3,
             e4 - 4 * mu * e3 + 6 * mu * mu * e2 - 3 * mu ^ 4    AS m4
      FROM m)
    SELECT l_returnflag,
           round(m3 / m2 ^ 1.5, 6)      AS skew,
           round(m4 / (m2 * m2) - 3, 6) AS kurt,
           n_rows
    FROM c
    ORDER BY l_returnflag
    """,
)
def agg_skewness_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-moment distribution profiling per group — the data-quality
    screen that catches skewed/heavy-tailed columns before they skew
    shuffles. Spark's skewness/kurtosis are POPULATION moments computed
    as streaming central-moment aggregates (one pass, partial+final);
    DuckDB's builtins are sample-corrected, so the oracle derives the
    population formulas explicitly from power sums — same algebra,
    rounded identically."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.skewness("l_quantity"), 6).alias("skew"),
            F.round(F.kurtosis("l_quantity"), 6).alias("kurt"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_behavior_bitmap",
    oracle="""
    WITH coded AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
                  WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8
                  ELSE 16 END AS bit
      FROM events),
    masks AS (
      SELECT user_id, day, bit_or(bit)::BIGINT AS type_mask
      FROM coded GROUP BY user_id, day)
    SELECT type_mask, count(*)::BIGINT AS n_user_days
    FROM masks GROUP BY type_mask
    ORDER BY type_mask
    """,
)
def agg_behavior_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-membership profiles as bitmasks: which of the 5 event types
    did each (user, day) produce, cohorted by the exact combination.
    The per-key set is ONE long (bit_or of per-type bits), not a
    collect_set — the bitmap is the constant-size, mergeable carrier
    for small-domain membership at 100 TB (bitwise partial aggregates,
    no array shuffle), and the cohort rollup is a plain second hash
    aggregate over at most 2^5 masks."""
    e = load(spark, sf_dir, "events")
    bit = (
        F.when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "error", 2)
        .when(F.col("event_type") == "purchase", 4)
        .when(F.col("event_type") == "signup", 8)
        .otherwise(16)
    )
    masks = (
        e.select("user_id", F.to_date("ts").alias("day"), bit.alias("bit"))
        .groupBy("user_id", "day")
        .agg(F.bit_or("bit").cast("long").alias("type_mask"))
    )
    return (
        masks.groupBy("type_mask")
        .agg(F.count("*").alias("n_user_days"))
        .orderBy("type_mask")
    )


@query(
    "agg_funnel_steps",
    oracle="""
    WITH clicks AS (
      SELECT user_id, min(ts) AS first_click
      FROM events WHERE event_type = 'click' GROUP BY user_id),
    conv AS (
      SELECT c.user_id, c.first_click, min(e.ts) AS first_purchase
      FROM clicks c
      LEFT JOIN events e
        ON e.user_id = c.user_id AND e.event_type = 'purchase'
       AND e.ts > c.first_click
      GROUP BY c.user_id, c.first_click)
    SELECT strftime(CAST(first_click AS DATE), '%Y-%m-%d') AS click_day,
           count(*)::BIGINT AS n_clicked,
           count(first_purchase)::BIGINT AS n_converted,
           COALESCE(round(avg(
             (epoch_us(first_purchase) - epoch_us(first_click)) / 3600000000.0
           ), 4), 0.0) AS avg_hours_to_convert
    FROM conv
    GROUP BY click_day
    ORDER BY click_day
    """,
)
def agg_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-step conversion funnel (click → later purchase), cohorted by
    first-click day — the canonical product-analytics report. Each step
    is a keyed min-aggregate (partial+final); the step join is per-user
    equi + time predicate, so the intermediate is bounded by events per
    user, never a cross of steps. Hours-to-convert is computed on epoch
    MICROseconds on both engines (the µs-truncation-safe carrier for
    this corpus's second-granularity timestamps)."""
    e = load(spark, sf_dir, "events")
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    conv = (
        clicks.join(
            purchases,
            (clicks["user_id"] == purchases["user_id"])
            & (purchases["p_ts"] > clicks["first_click"]),
            "left",
        )
        .groupBy(clicks["user_id"], "first_click")
        .agg(F.min("p_ts").alias("first_purchase"))
    )
    hours = (
        F.unix_micros("first_purchase") - F.unix_micros("first_click")
    ) / 3600000000.0
    return (
        conv.groupBy(F.date_format("first_click", "yyyy-MM-dd").alias("click_day"))
        .agg(
            F.count("*").alias("n_clicked"),
            F.count("first_purchase").alias("n_converted"),
            F.coalesce(F.round(F.avg(hours), 4), F.lit(0.0)).alias(
                "avg_hours_to_convert"
            ),
        )
        .orderBy("click_day")
    )


@query(
    "agg_cohort_retention",
    oracle="""
    WITH cohorts AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
      FROM events WHERE event_type = 'signup' GROUP BY user_id),
    activity AS (
      SELECT DISTINCT c.user_id,
             strftime(c.cohort_day, '%Y-%m-%d') AS cohort_day,
             (date_diff('day', c.cohort_day, CAST(e.ts AS DATE)) // 7)::BIGINT
               AS week_offset
      FROM cohorts c
      JOIN events e ON e.user_id = c.user_id
      WHERE CAST(e.ts AS DATE) >= c.cohort_day)
    SELECT cohort_day, week_offset, count(*)::BIGINT AS n_active_users
    FROM activity
    GROUP BY cohort_day, week_offset
    ORDER BY cohort_day, week_offset
    """,
)
def agg_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users bucketed by first-signup day,
    counted as active in each week offset since. The workhorse growth
    report, built from two keyed aggregates and one per-user equi-join
    — the cohort side is user-cardinality (broadcastable against the
    event log at scale), and the distinct collapses to (user, cohort,
    week) before the final count, so the shuffle never carries raw
    events twice."""
    e = load(spark, sf_dir, "events")
    cohorts = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.to_date("ts")).alias("cohort_day"))
    )
    activity = (
        e.select("user_id", F.to_date("ts").alias("day"))
        .join(cohorts, "user_id")
        .filter(F.col("day") >= F.col("cohort_day"))
        .select(
            "user_id",
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            (F.datediff("day", "cohort_day") / 7).cast("long").alias("week_offset"),
        )
        .distinct()
    )
    return (
        activity.groupBy("cohort_day", "week_offset")
        .agg(F.count("*").alias("n_active_users"))
        .orderBy("cohort_day", "week_offset")
    )


@query(
    "agg_entropy",
    oracle="""
    WITH c AS (
      SELECT source, lang, count(*) * 1.0 AS cnt
      FROM documents GROUP BY source, lang),
    t AS (SELECT source, sum(cnt) AS total FROM c GROUP BY source)
    SELECT c.source,
           round(-sum((c.cnt / t.total) * ln(c.cnt / t.total)), 6) AS lang_entropy,
           count(*)::BIGINT AS n_langs
    FROM c JOIN t ON c.source = t.source
    GROUP BY c.source ORDER BY c.source
    """,
)
def agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each source's language mix — the diversity
    metric that flags single-language (or language-collapsed) sources in
    a corpus audit. Natural log pinned on both engines. The corpus-sized
    work is ONE hash aggregate to (source, lang) counts; the per-source
    total is a window over that already-tiny frame (≤ sources × langs
    rows), so no second pass over the data and no join."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    counts = (
        d.groupBy("source", "lang").agg(F.count("*").cast("double").alias("cnt"))
    )
    p = F.col("cnt") / F.sum("cnt").over(Window.partitionBy("source"))
    return (
        counts.select("source", (p * F.log(p)).alias("plogp"))
        .groupBy("source")
        .agg(
            F.round(-F.sum("plogp"), 6).alias("lang_entropy"),
            F.count("*").alias("n_langs"),
        )
        .orderBy("source")
    )


@query(
    "agg_rolling_active_users",
    oracle="""
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
    days AS (SELECT DISTINCT day FROM du),
    cov AS (
      SELECT du.day + (o.off)::INT AS cover_day, du.user_id
      FROM du, (SELECT unnest(range(0, 7)) AS off) o)
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           count(DISTINCT c.user_id)::BIGINT AS wau
    FROM days d JOIN cov c ON c.cover_day = d.day
    GROUP BY d.day ORDER BY day
    """,
)
def agg_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day active users per day (the WAU curve). COUNT
    DISTINCT over a sliding RANGE window has no distributed form, so the
    scale-correct construction is: distinct (day, user) — the only
    corpus-sized shuffle — then a bounded ×7 offset fan-out (each active
    day covers itself and the next 6 report days) and a day-keyed exact
    distinct count. Day cardinality is bounded by the calendar, and the
    distinct count is Spark's own two-phase expand — no window state, no
    self-join on a range predicate."""
    e = load(spark, sf_dir, "events")
    du = e.select(F.to_date("ts").alias("day"), "user_id").distinct()
    cov = du.withColumn("off", F.explode(F.sequence(F.lit(0), F.lit(6)))).select(
        F.expr("date_add(day, off)").alias("cover_day"), "user_id"
    )
    days = du.select("day").distinct()
    return (
        days.join(cov, days.day == cov.cover_day)
        .groupBy(days.day)
        .agg(F.countDistinct("user_id").alias("wau"))
        .select(F.date_format("day", "yyyy-MM-dd").alias("day"), "wau")
        .orderBy("day")
    )


@query(
    "agg_bitmap_distinct",
    oracle="""
    SELECT o_orderpriority,
           count(DISTINCT o_custkey)::BIGINT AS n_customers
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting through roaring-style bitmaps — the
    mergeable alternative to count(DISTINCT) when the expand+re-shuffle
    of exact distinct gets expensive and an HLL estimate isn't
    acceptable. Two-level plan: keys bucket into fixed 4KB bitmap pages
    (bitmap_bucket_number / bitmap_bit_position), pages OR-merge as
    partial aggregates within (group, bucket), then per-group distinct
    = sum of per-page popcounts. Every shuffled payload is a bounded
    bitmap page, never a value list — the property that lets this run
    at 100 TB where collect_set dies. The oracle is plain exact
    count(DISTINCT): same answer, different physical strategy."""
    o = load(spark, sf_dir, "orders")
    pages = (
        o.groupBy(
            "o_orderpriority",
            F.expr("bitmap_bucket_number(o_custkey)").alias("bucket"),
        )
        .agg(
            F.expr("bitmap_construct_agg(bitmap_bit_position(o_custkey))").alias(
                "page"
            )
        )
    )
    return (
        pages.groupBy("o_orderpriority")
        .agg(F.sum(F.expr("bitmap_count(page)")).alias("n_customers"))
        .orderBy("o_orderpriority")
    )


@query(
    "agg_topk_share",
    oracle="""
    WITH rev AS (
      SELECT p.p_brand, l.l_partkey,
             sum(l.l_extendedprice * (1 - l.l_discount)) AS rev
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY p.p_brand, l.l_partkey),
    r AS (
      SELECT p_brand, rev,
             row_number() OVER (PARTITION BY p_brand
                                ORDER BY rev DESC, l_partkey) AS rnk
      FROM rev)
    SELECT p_brand, count(*)::BIGINT AS n_parts,
           round(sum(CASE WHEN rnk <= 3 THEN rev ELSE 0 END) / sum(rev), 6)
             AS top3_share
    FROM r GROUP BY p_brand ORDER BY p_brand
    """,
)
def agg_topk_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration audit: what share of each brand's revenue
    its top-3 parts capture — the skew diagnostic that predicts which
    group-by keys need salting before they hit a 1000-executor shuffle.
    Per-(brand, part) revenue is one partial+final hash aggregate; the
    rank and the share ride the SAME brand-keyed exchange (window +
    final agg co-partitioned). The part dim broadcasts; ranks pin a
    p_partkey tie-break so top-3 membership is deterministic."""
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("r")
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rev = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "l_partkey")
        .agg(F.sum("r").alias("rev"))
    )
    rnk = F.row_number().over(
        Window.partitionBy("p_brand").orderBy(F.col("rev").desc(), F.col("l_partkey"))
    )
    return (
        rev.withColumn("rnk", rnk)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_parts"),
            F.round(
                F.sum(F.when(F.col("rnk") <= 3, F.col("rev")).otherwise(0.0))
                / F.sum("rev"),
                6,
            ).alias("top3_share"),
        )
        .orderBy("p_brand")
    )


@query(
    "agg_daily_seasonality",
    oracle="""
    SELECT (dayofweek(ts) + 1)::INT AS dow,
           hour(ts)::INT AS hod,
           count(*)::BIGINT AS n_events,
           round(avg(value), 6) AS avg_value
    FROM events
    GROUP BY dow, hod
    ORDER BY dow, hod
    """,
)
def agg_daily_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic-seasonality profile: event volume and mean value by
    (day-of-week × hour-of-day) — the 7×24 heat-map behind capacity
    planning and anomaly baselines. One hash aggregate onto a bounded
    168-cell key space (partials collapse to ≤168 rows per task at any
    scale). Dialect trap pinned in the oracle: Spark's dayofweek is
    1=Sunday..7, DuckDB's is 0=Sunday..6, so the oracle adds 1."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.dayofweek("ts").alias("dow"), F.hour("ts").alias("hod")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .orderBy("dow", "hod")
    )


@query(
    "agg_linear_regression",
    oracle="""
    SELECT event_type,
           CAST(regr_count(value, CAST(extract(hour FROM ts) AS DOUBLE)) AS BIGINT)
             AS n,
           round(regr_slope(value, CAST(extract(hour FROM ts) AS DOUBLE)), 6)
             AS slope,
           round(regr_intercept(value, CAST(extract(hour FROM ts) AS DOUBLE)), 6)
             AS intercept,
           round(regr_r2(value, CAST(extract(hour FROM ts) AS DOUBLE)), 6) AS r2
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
)
def agg_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS fit (value vs hour-of-day) with the SQL-standard
    regr_* aggregate family — the trend-per-segment query behind every
    metrics dashboard. All four statistics decompose into the same five
    running moments (n, Σx, Σy, Σxy, Σx²), so Spark computes them in ONE
    partial+final hash aggregate pass — no second scan, no window, no
    collect. Rounded at 6dp where the two engines' moment accumulation
    order can differ in the last ulp."""
    x = F.hour("ts").cast("double")
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.regr_count("value", x).cast("long").alias("n"),
            F.round(F.regr_slope("value", x), 6).alias("slope"),
            F.round(F.regr_intercept("value", x), 6).alias("intercept"),
            F.round(F.regr_r2("value", x), 6).alias("r2"),
        )
        .orderBy("event_type")
    )


# Count-min sketch geometry (r4): d=4 pairwise-independent integer hash
# rows × w=256 buckets. Hashing is ((user_id % P) · A_d + B_d) % P % w —
# pre-reducing mod P keeps the product inside int64 for ANY key value
# (ANSI overflow-safe at 100 TB id ranges), and plain integer arithmetic
# is bit-identical in every engine, so the DuckDB twin reproduces the
# sketch exactly (a production build swaps in xxhash64 for speed; the
# relational shape is unchanged).
_CMS_PARAMS = [(2654435761, 1), (2246822519, 7), (3266489917, 31), (668265263, 127)]
_CMS_P = 2147483647
_CMS_W = 256
_CMS_PROBES = 20


@query(
    "agg_cms_counts",
    oracle=f"""
    WITH params(d, a, b) AS (VALUES {", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(_CMS_PARAMS))}),
    h AS (
      SELECT p.d,
             ((e.user_id % {_CMS_P}) * p.a + p.b) % {_CMS_P} % {_CMS_W} AS bucket
      FROM events e CROSS JOIN params p),
    sketch AS (SELECT d, bucket, count(*) AS cnt FROM h GROUP BY d, bucket),
    probes AS (SELECT unnest(range(0, {_CMS_PROBES})) AS user_id),
    pb AS (
      SELECT pr.user_id, p.d,
             ((pr.user_id % {_CMS_P}) * p.a + p.b) % {_CMS_P} % {_CMS_W} AS bucket
      FROM probes pr CROSS JOIN params p),
    est AS (
      SELECT user_id, min(coalesce(s.cnt, 0))::BIGINT AS est_cnt
      FROM pb LEFT JOIN sketch s USING (d, bucket) GROUP BY user_id),
    exact AS (
      SELECT user_id, count(*)::BIGINT AS exact_cnt
      FROM events WHERE user_id < {_CMS_PROBES} GROUP BY user_id)
    SELECT e_.user_id, e_.est_cnt,
           coalesce(x.exact_cnt, 0)::BIGINT AS exact_cnt
    FROM est e_ LEFT JOIN exact x USING (user_id) ORDER BY user_id
    """,
)
def agg_cms_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch as a RELATION: per-key event-frequency estimates
    from a fixed d×w count table (Cormode & Muthukrishnan 2005) — the
    bounded-memory heavy-hitter path when exact per-key counts would
    shuffle billions of group keys. The sketch is ONE hash aggregate
    onto d·w = 1,024 cells (map-side partial combine, constant size at
    any corpus scale); estimates for the fixed probe set come from a
    bounded join against those cells, taking min over the d rows.
    Deterministic integer hashing makes the whole construction
    hash-checkable against the oracle; the exact probe counts ride
    along (pushed-down filter on the probe list) as the overcount
    audit — est_cnt ≥ exact_cnt always, with equality when no collision
    lands in all d rows."""
    depths = F.array(
        *[
            F.struct(F.lit(i).alias("d"), F.lit(a).alias("a"), F.lit(b).alias("b"))
            for i, (a, b) in enumerate(_CMS_PARAMS)
        ]
    )

    def bucket(key: F.Column) -> F.Column:
        return ((key % _CMS_P) * F.col("h.a") + F.col("h.b")) % _CMS_P % _CMS_W

    e = load(spark, sf_dir, "events").select("user_id")
    sketch = (
        e.select("user_id", F.explode(depths).alias("h"))
        .select(F.col("h.d").alias("d"), bucket(F.col("user_id")).alias("bucket"))
        .groupBy("d", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    probes = spark.range(_CMS_PROBES).select(F.col("id").alias("user_id"))
    est = (
        probes.select("user_id", F.explode(depths).alias("h"))
        .select("user_id", F.col("h.d").alias("d"), bucket(F.col("user_id")).alias("bucket"))
        .join(sketch, ["d", "bucket"], "left")
        .groupBy("user_id")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est_cnt"))
    )
    exact = (
        e.filter(F.col("user_id") < _CMS_PROBES)
        .groupBy("user_id")
        .agg(F.count("*").alias("exact_cnt"))
    )
    return (
        est.join(exact, "user_id", "left")
        .select(
            "user_id",
            "est_cnt",
            F.coalesce(F.col("exact_cnt"), F.lit(0)).cast("long").alias("exact_cnt"),
        )
        .orderBy("user_id")
    )


@query("agg_hll_union_rollup")  # rows-only: DataSketches estimates are engine-internal
def agg_hll_union_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch ROLLUP — the pattern that makes 100 TB distinct
    counting tractable: sketch each (event_type, day) partition once with
    HyperLogLog (DataSketches `hll_sketch_agg`, lgK=12, ~2.5 KB fixed),
    persist the sketches, then answer any coarser rollup by UNIONING the
    binaries (`hll_union_agg`) instead of rescanning raw data. The union
    is exactly associative: re-aggregating daily sketches yields the SAME
    estimate as sketching the raw stream directly, which the invariant
    test pins (tests/test_invariants.py) along with a ≤5% error envelope
    vs exact distinct. Both aggregation levels are partial+final hash
    aggs over constant-size state."""
    e = load(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day"), "user_id"
    )
    daily = e.groupBy("event_type", "day").agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sketch")
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_daily_sketches"),
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est_users"),
        )
        .orderBy("event_type")
    )


# Heavy-hitter survivor threshold: φ = 1/50 of rows (cross-multiplied as
# cnt·50 > n so both engines stay in exact integer arithmetic). The
# per-batch prescreen keeps keys with batch count c_b·50 > m_b; by the
# pigeonhole sum Σm_b = n, any key with global count > n/50 must clear
# that bar in at least one batch, so the candidate set is a guaranteed
# superset of the true heavy hitters (Misra-Gries survivor bound,
# Misra & Gries 1982) and the exact recount makes the final answer
# deterministic regardless of how rows were batched.
_HH_INV_PHI = 50


def _hh_candidates(batches):
    """Per-Arrow-batch heavy-hitter prescreen: emit keys clearing the
    φ-fraction bar within the batch. State is bounded by the Arrow batch
    size (spark.sql.execution.arrow.maxRecordsPerBatch), never by corpus
    cardinality."""
    import pandas as pd

    for pdf in batches:
        m = len(pdf)
        if m == 0:
            continue
        vc = pdf["hh_key"].value_counts()
        keep = vc[vc * _HH_INV_PHI > m]
        yield pd.DataFrame({"hh_key": keep.index})


@query(
    "agg_heavy_hitters",
    oracle="""
    WITH keyed AS (
      SELECT length(bin(1 + user_id % 1024)) - 1 AS hh_key FROM events)
    SELECT hh_key, count(*) AS cnt
    FROM keyed
    GROUP BY hh_key
    HAVING count(*) * 50 > (SELECT count(*) FROM keyed)
    ORDER BY cnt DESC, hh_key
    """,
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact φ-heavy hitters (keys holding > 1/50 of all rows) without
    shuffling the full key space. A plain groupBy-HAVING exchanges every
    distinct key — at 100 TB of web-scale ids that shuffle IS the cost.
    This is the candidate + exact-recount pattern: (1) an Arrow-batched
    prescreen keeps only keys that clear the φ bar within their batch —
    a guaranteed superset of the global heavy hitters by the Misra-Gries
    pigeonhole bound (see _HH_INV_PHI) and a tiny relation (≤ 1/φ keys
    per batch); (2) a semi-join recounts exactly those candidates — AQE
    broadcasts the candidate side when it is small, and the recount's
    hash aggregate carries only candidate keys; (3) the φ filter on the
    exact counts discards prescreen overshoot. Output is therefore
    EXACTLY the true heavy hitters with exact counts — deterministic
    under any partitioning — which is what makes a sketch-class
    algorithm hash-checkable against a GROUP BY/HAVING oracle.

    The fixtures are skew-free by construction, so the hunted key is a
    geometric derivation with scale-INDEPENDENT shares: floor(log₂(1 +
    user_id mod 1024)) — computed as length(bin(x)) − 1, pure
    integer/string arithmetic, bit-identical across engines — puts ≈2⁻ᵏ
    of rows on key (9−k), giving real heavy hitters at every SF instead
    of an answer that goes empty as uniform ids outgrow φ."""
    ev = load(spark, sf_dir, "events").select(
        (F.length(F.bin(1 + F.col("user_id") % 1024)) - 1).alias("hh_key")
    )
    cand = ev.mapInPandas(_hh_candidates, "hh_key long").distinct()
    exact = (
        ev.join(cand, "hh_key", "left_semi")
        .groupBy("hh_key")
        .agg(F.count("*").alias("cnt"))
    )
    total = F.broadcast(ev.agg(F.count("*").alias("n")))
    return (
        exact.join(total)
        .filter(F.col("cnt") * _HH_INV_PHI > F.col("n"))
        .select("hh_key", "cnt")
        .orderBy(F.desc("cnt"), "hh_key")
    )


@query(
    "agg_window_funnel",
    oracle="""
    WITH c AS (
      SELECT user_id, ts AS c_ts FROM events WHERE event_type = 'click'),
    v AS (
      SELECT c.user_id, c.c_ts, min(e.ts) AS v_ts
      FROM c LEFT JOIN events e
        ON e.user_id = c.user_id AND e.event_type = 'view'
       AND e.ts > c.c_ts AND e.ts <= c.c_ts + INTERVAL 1 HOUR
      GROUP BY c.user_id, c.c_ts),
    p AS (
      SELECT v.user_id, v.c_ts, v.v_ts, min(e.ts) AS p_ts
      FROM v LEFT JOIN events e
        ON e.user_id = v.user_id AND e.event_type = 'purchase'
       AND v.v_ts IS NOT NULL
       AND e.ts > v.v_ts AND e.ts <= v.c_ts + INTERVAL 1 HOUR
      GROUP BY v.user_id, v.c_ts, v.v_ts),
    depth AS (
      SELECT user_id,
             max(CASE WHEN p_ts IS NOT NULL THEN 3
                      WHEN v_ts IS NOT NULL THEN 2
                      ELSE 1 END) AS funnel_depth
      FROM p GROUP BY user_id)
    SELECT funnel_depth, count(*) AS n_users
    FROM depth GROUP BY funnel_depth ORDER BY funnel_depth
    """,
)
def agg_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order windowed funnel (ClickHouse `windowFunnel`
    semantics): deepest click → view → purchase chain with strictly
    increasing timestamps, all inside one hour of the opening click, max
    over each user's attempts. Greedy-earliest is exact here: if ANY
    (view, purchase) chain completes inside a click's window, the chain
    through the EARLIEST in-window view also completes (it only widens
    the remaining window) — which is what lets both engines avoid
    enumerating chains. The oracle does it with per-user min-joins; the
    Spark plan is shuffle-free of time-range joins entirely: ONE ordered
    per-user window computes, for every event, the next view ts and next
    purchase ts (min-over-following-frame, O(n) state), then a single
    (user_id, ts) equi-join hops click → its earliest view row to read
    that row's next-purchase column. Per-user windows + one equi
    shuffle — the same plan at 100 TB of events."""
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    ev = (
        load(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .withColumn(
            "nv",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(
                w_next
            ),
        )
        .withColumn(
            "np",
            F.min(
                F.when(F.col("event_type") == "purchase", F.col("ts"))
            ).over(w_next),
        )
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("ts").alias("c_ts"),
            # nv is next-by-ROW-order; the > guard restores the oracle's
            # strictly-later-in-TIME contract for same-µs neighbors.
            F.when(
                (F.col("nv") > F.col("ts"))
                & (F.col("nv") <= F.col("ts") + F.expr("INTERVAL 1 HOUR")),
                F.col("nv"),
            ).alias("v_ts"),
        )
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("v_ts"), F.col("np").alias("p_after_v")
    )
    depth = (
        clicks.join(views, ["user_id", "v_ts"], "left")
        .select(
            "user_id",
            F.when(
                (F.col("p_after_v") > F.col("v_ts"))
                & (
                    F.col("p_after_v")
                    <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")
                ),
                F.lit(3),
            )
            .when(F.col("v_ts").isNotNull(), F.lit(2))
            .otherwise(F.lit(1))
            .alias("d"),
        )
        .groupBy("user_id")
        .agg(F.max("d").alias("funnel_depth"))
    )
    return (
        depth.groupBy("funnel_depth")
        .agg(F.count("*").alias("n_users"))
        .orderBy("funnel_depth")
    )


@query(
    "agg_decayed_sum",
    oracle="""
    WITH horizon AS (
      SELECT max(CAST(ts AS DATE)) AS max_day FROM events),
    term AS (
      SELECT user_id,
             CAST(round(value * 100) AS BIGINT)
               * power(2.0, -date_diff('day', CAST(ts AS DATE),
                                       (SELECT max_day FROM horizon)))
               AS w
      FROM events)
    SELECT user_id,
           count(*) AS n_events,
           round(sum(w) / 100.0, 6) AS decayed_score
    FROM term
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def agg_decayed_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decayed engagement score per user — the feature-store
    staple: recent activity counts fully, day-old activity half, with a
    half-life of one day against the corpus horizon (max event day).
    One hash aggregate after a row-local weight computation; the horizon
    is a 1-row broadcast (bounded by construction). The arithmetic is
    chosen so distributed summation order CANNOT matter: value is exact
    integer cents (≤2¹⁶), the decay 2^(−whole days) is an exact dyadic
    double, so every term is exact with ≤16 mantissa bits at offset
    ≤ the corpus's day span — for spans + log₂(group volume) under 53
    bits the sum is EXACT in IEEE double under any order (this corpus:
    16 + 30 + log₂(67·490) ≈ 62... the cents and the span overlap, so
    the true bound is span + log₂(Σcents) ≈ 30 + 22 = 52 bits — inside
    the 53-bit mantissa). Only the final /100 display divide is
    floating."""
    ev = load(spark, sf_dir, "events")
    horizon = F.broadcast(
        ev.agg(F.max(F.to_date("ts")).alias("max_day"))
    )
    term = ev.crossJoin(horizon).select(
        "user_id",
        (
            F.round(F.col("value") * 100).cast("long")
            * F.pow(F.lit(2.0), -F.datediff("max_day", F.to_date("ts")))
        ).alias("w"),
    )
    return (
        term.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("w") / 100.0, 6).alias("decayed_score"),
        )
        .orderBy("user_id")
    )


@query(
    "agg_ratio_ci",
    oracle="""
    WITH g AS (
      SELECT event_type,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CASE WHEN value > 100.0 THEN 1 ELSE 0 END) AS DOUBLE)
               AS k
      FROM events GROUP BY event_type)
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           CAST(k AS BIGINT) AS k,
           round(k / n, 6) AS p_hat,
           round(((k / n + 3.8416 / (2.0 * n))
                  - 1.96 * sqrt((k / n) * (1.0 - k / n) / n
                                + 3.8416 / (4.0 * n * n)))
                 / (1.0 + 3.8416 / n), 6) AS ci_lo,
           round(((k / n + 3.8416 / (2.0 * n))
                  + 1.96 * sqrt((k / n) * (1.0 - k / n) / n
                                + 3.8416 / (4.0 * n * n)))
                 / (1.0 + 3.8416 / n), 6) AS ci_hi
    FROM g ORDER BY event_type
    """,
)
def agg_ratio_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson 95 % score interval on a per-group success ratio (share of
    events with value > 100) — the uncertainty band a quality dashboard
    puts around every rate, robust near 0/1 where the normal interval
    collapses. The heavy work is ONE integer hash aggregate (count +
    conditional count, partial+final); the interval itself is row-local
    double arithmetic over (k, n) written in the identical operation
    order as the oracle (division and sqrt are correctly-rounded IEEE
    ops, so same order ⟹ same bits ⟹ the rounded 6th decimal
    hash-matches). z = 1.96, z² = 3.8416 as exact literals."""
    g = (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("double").alias("n"),
            F.sum(
                F.when(F.col("value") > 100.0, F.lit(1)).otherwise(F.lit(0))
            )
            .cast("double")
            .alias("k"),
        )
    )
    n, k = F.col("n"), F.col("k")
    p = k / n
    center = p + F.lit(3.8416) / (F.lit(2.0) * n)
    half = F.lit(1.96) * F.sqrt(
        p * (F.lit(1.0) - p) / n + F.lit(3.8416) / (F.lit(4.0) * n * n)
    )
    denom = F.lit(1.0) + F.lit(3.8416) / n
    return g.select(
        "event_type",
        n.cast("long").alias("n"),
        k.cast("long").alias("k"),
        F.round(p, 6).alias("p_hat"),
        F.round((center - half) / denom, 6).alias("ci_lo"),
        F.round((center + half) / denom, 6).alias("ci_hi"),
    ).orderBy("event_type")


@query(
    "agg_welch_ttest",
    oracle="""
    WITH s AS (
      SELECT
        sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n1,
        sum(CASE WHEN event_type = 'click'
                 THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS s1,
        sum(CASE WHEN event_type = 'click'
                 THEN CAST(round(value * 100) AS BIGINT)
                      * CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS q1,
        sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n2,
        sum(CASE WHEN event_type = 'error'
                 THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS s2,
        sum(CASE WHEN event_type = 'error'
                 THEN CAST(round(value * 100) AS BIGINT)
                      * CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS q2
      FROM events WHERE event_type IN ('click', 'error')),
    m AS (
      SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
             s1 / (n1 * 100.0) AS m1, s2 / (n2 * 100.0) AS m2,
             (q1 / 10000.0 - n1 * (s1 / (n1 * 100.0)) * (s1 / (n1 * 100.0)))
               / (n1 - 1.0) AS v1,
             (q2 / 10000.0 - n2 * (s2 / (n2 * 100.0)) * (s2 / (n2 * 100.0)))
               / (n2 - 1.0) AS v2
      FROM s)
    SELECT n1, n2, round(m1, 6) AS mean_click, round(m2, 6) AS mean_error,
           round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 6) AS t_stat,
           round((v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)
                 / ((v1 / n1) * (v1 / n1) / (n1 - 1.0)
                    + (v2 / n2) * (v2 / n2) / (n2 - 1.0)), 4) AS welch_df
    FROM m
    """,
)
def agg_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch two-sample t-test on event value between the 'click' and
    'error' populations — the A/B-testing readout, unequal variances
    assumed. The distributed part is ONE conditional hash aggregate
    collecting exact integer sufficient statistics (n, Σcents, Σcents²
    per arm — int64-exact, so accumulation order cannot matter); the
    t statistic and Welch–Satterthwaite degrees of freedom are then
    row-local doubles over those six integers, written in the identical
    operation order as the oracle so every IEEE op rounds the same
    way. This is the textbook map-side-combinable test: 100 TB of
    events reduce to six numbers before any float is touched."""
    v100 = F.round(F.col("value") * 100).cast("long")
    is1 = F.col("event_type") == "click"
    is2 = F.col("event_type") == "error"
    s = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "error"))
        .agg(
            F.sum(F.when(is1, 1).otherwise(0)).alias("n1"),
            F.sum(F.when(is1, v100).otherwise(F.lit(0))).alias("s1"),
            F.sum(F.when(is1, v100 * v100).otherwise(F.lit(0))).alias("q1"),
            F.sum(F.when(is2, 1).otherwise(0)).alias("n2"),
            F.sum(F.when(is2, v100).otherwise(F.lit(0))).alias("s2"),
            F.sum(F.when(is2, v100 * v100).otherwise(F.lit(0))).alias("q2"),
        )
    )
    n1, n2 = F.col("n1"), F.col("n2")
    m1 = F.col("s1") / (n1 * 100.0)
    m2 = F.col("s2") / (n2 * 100.0)
    v1 = (F.col("q1") / 10000.0 - n1 * m1 * m1) / (n1 - 1.0)
    v2 = (F.col("q2") / 10000.0 - n2 * m2 * m2) / (n2 - 1.0)
    se2_1 = v1 / n1
    se2_2 = v2 / n2
    return s.select(
        n1.cast("long").alias("n1"),
        n2.cast("long").alias("n2"),
        F.round(m1, 6).alias("mean_click"),
        F.round(m2, 6).alias("mean_error"),
        F.round((m1 - m2) / F.sqrt(se2_1 + se2_2), 6).alias("t_stat"),
        F.round(
            (se2_1 + se2_2) * (se2_1 + se2_2)
            / (
                se2_1 * se2_1 / (n1 - 1.0)
                + se2_2 * se2_2 / (n2 - 1.0)
            ),
            4,
        ).alias("welch_df"),
    )


@query(
    "agg_gini_daily",
    oracle="""
    WITH d AS (
      SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev
      FROM orders GROUP BY 1, 2),
    r AS (
      SELECT priority, day, rev,
             row_number() OVER (PARTITION BY priority ORDER BY rev, day) AS i,
             count(*) OVER (PARTITION BY priority) AS n,
             sum(rev) OVER (PARTITION BY priority) AS tot
      FROM d)
    SELECT priority, CAST(max(n) AS BIGINT) AS n_days,
           round(max(tot) / 100.0, 2) AS total_rev,
           round(2.0 * sum(i * rev) / (max(n) * 1.0 * max(tot))
                 - (max(n) + 1.0) / max(n), 6) AS gini
    FROM r GROUP BY priority ORDER BY priority
    """,
)
def agg_gini_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of revenue concentration across calendar days per
    order priority — the burstiness audit (is demand smooth or spiky?).
    The corpus-sized work is ONE hash aggregate to (priority, day) cent
    sums; the rank formula G = 2·Σi·x₍ᵢ₎/(n·Σx) − (n+1)/n then runs over
    a window whose partition size is bounded by the CALENDAR, not the
    data, so the single-task frame is safe at 100 TB. All accumulation is
    exact int64 (cents, rank·cents); floats appear only in the final
    row-local divide, in oracle-identical operation order. Ties in daily
    revenue are rank-sum-invariant (equal x over a contiguous i block),
    and the order is pinned by (rev, day) anyway."""
    o = load(spark, sf_dir, "orders")
    d = (
        o.groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.to_date("o_orderdate").alias("day"),
        )
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev"))
    )
    wp = Window.partitionBy("priority")
    r = d.select(
        "priority",
        "rev",
        F.row_number().over(wp.orderBy("rev", "day")).alias("i"),
        F.count("*").over(wp).alias("n"),
        F.sum("rev").over(wp).alias("tot"),
    )
    n, tot = F.max("n"), F.max("tot")
    return (
        r.groupBy("priority")
        .agg(
            n.cast("long").alias("n_days"),
            F.round(tot / 100.0, 2).alias("total_rev"),
            F.round(
                F.lit(2.0) * F.sum(F.col("i") * F.col("rev")) / (n * 1.0 * tot)
                - (n + 1.0) / n,
                6,
            ).alias("gini"),
        )
        .orderBy("priority")
    )


@query(
    "agg_markov_transition",
    oracle="""
    WITH p AS (
      SELECT event_type AS src,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS dst
      FROM events),
    c AS (
      SELECT src, dst, count(*) AS cnt FROM p
      WHERE dst IS NOT NULL GROUP BY src, dst)
    SELECT src, dst, CAST(cnt AS BIGINT) AS cnt,
           round(cnt * 1.0 / sum(cnt) OVER (PARTITION BY src), 6) AS p_next
    FROM c ORDER BY src, dst
    """,
)
def agg_markov_transition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    sequence — P(next event type | current), the session-model primitive
    behind next-action prediction and bot detection. lead() runs over
    per-user ordered windows (partition size = one user's history, never
    corpus-sized), pair counting is a partial+final hash aggregate, and
    the row-normalising window runs over the |types|² matrix — a few
    dozen rows regardless of corpus size. Order pinned by (ts, event_id)
    so concurrent-timestamp rows sequence identically in both engines."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        load(spark, sf_dir, "events")
        .select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
    )
    c = pairs.groupBy("src", "dst").agg(F.count("*").alias("cnt"))
    return c.select(
        "src",
        "dst",
        F.col("cnt").cast("long").alias("cnt"),
        F.round(
            F.col("cnt") * 1.0 / F.sum("cnt").over(Window.partitionBy("src")), 6
        ).alias("p_next"),
    ).orderBy("src", "dst")


@query(
    "agg_churn_rate",
    oracle="""
    WITH aw AS (
      SELECT DISTINCT
        datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS wi,
        user_id
      FROM events),
    mx AS (SELECT max(wi) AS last_wi FROM aw),
    j AS (
      SELECT a.wi, a.user_id,
             CASE WHEN b.user_id IS NULL THEN 1 ELSE 0 END AS churned
      FROM aw a LEFT JOIN aw b
        ON b.user_id = a.user_id AND b.wi = a.wi + 1)
    SELECT strftime(DATE '1970-01-01' + CAST(wi * 7 AS INT), '%Y-%m-%d')
             AS week_start,
           CAST(count(*) AS BIGINT) AS active_users,
           CAST(sum(churned) AS BIGINT) AS churned_users,
           round(sum(churned) * 1.0 / count(*), 6) AS churn_rate
    FROM j, mx WHERE wi < last_wi
    GROUP BY wi ORDER BY week_start
    """,
)
def agg_churn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week user churn: of the users active in week w, the
    share with NO activity in w+1 — the retention dashboard's headline
    number. The corpus reduces immediately to DISTINCT (week-index,
    user) — the only corpus-sized shuffle — then churn is a self
    LEFT JOIN on (user, week+1): a plain shuffle equi-join, no window
    over users, no per-week recount of raw events. The final week is
    excluded (churn undefined without a successor). Weeks are carried
    as an exact integer index (epoch days // 7) so the join key and
    the calendar arithmetic are identical in both engines."""
    e = load(spark, sf_dir, "events")
    aw = (
        e.select(
            F.expr(
                "datediff(CAST(ts AS DATE), DATE '1970-01-01') div 7"
            ).alias("wi"),
            "user_id",
        ).distinct()
    )
    last_wi = aw.agg(F.max("wi").alias("last_wi"))
    b = aw.select(F.col("wi").alias("bwi"), F.col("user_id").alias("buid"))
    j = aw.join(
        b,
        (F.col("buid") == F.col("user_id")) & (F.col("bwi") == F.col("wi") + 1),
        "left",
    ).select(
        "wi", F.when(F.col("buid").isNull(), 1).otherwise(0).alias("churned")
    )
    return (
        j.crossJoin(F.broadcast(last_wi))
        .filter(F.col("wi") < F.col("last_wi"))
        .groupBy("wi")
        .agg(
            F.count("*").cast("long").alias("active_users"),
            F.sum("churned").cast("long").alias("churned_users"),
            F.round(F.sum("churned") * 1.0 / F.count("*"), 6).alias("churn_rate"),
        )
        .select(
            F.expr(
                "date_format(date_add(DATE '1970-01-01', CAST(wi * 7 AS INT)),"
                " 'yyyy-MM-dd')"
            ).alias("week_start"),
            "active_users",
            "churned_users",
            "churn_rate",
        )
        .orderBy("week_start")
    )


@query(
    "agg_log_histogram",
    oracle="""
    WITH v AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
    b AS (SELECT cents, length(format('{:b}', cents)) - 1 AS bucket FROM v)
    SELECT bucket,
           CAST((1::BIGINT << bucket) AS BIGINT) AS bucket_floor_cents,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(cents) / 100.0, 2) AS total_value,
           round(sum(cents) / (100.0 * count(*)), 2) AS avg_value
    FROM b GROUP BY bucket ORDER BY bucket
    """,
)
def agg_log_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two (HDR-style) histogram of order value — the log-scale
    latency/size-distribution canon, one bucket per binary order of
    magnitude. The bucket is floor(log₂(cents)) computed EXACTLY as the
    bit length of the integer cent value (length of the binary string
    minus one) — never a float log whose boundary rounding could
    disagree between engines at exact powers of two. One hash aggregate
    over a handful of buckets; int64 cent sums are order-immune."""
    v = load(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    b = v.select(
        "cents", (F.length(F.bin("cents")) - 1).alias("bucket")
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.round(F.sum("cents") / 100.0, 2).alias("total_value"),
            F.round(F.sum("cents") / (100.0 * F.count("*")), 2).alias("avg_value"),
        )
        .select(
            "bucket",
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT))")
            .alias("bucket_floor_cents"),
            "n_orders",
            "total_value",
            "avg_value",
        )
        .orderBy("bucket")
    )


@query(
    "agg_mad_outliers",
    oracle="""
    WITH v AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c FROM events),
    med AS (SELECT event_type, median(c) AS med FROM v GROUP BY event_type),
    dev AS (
      SELECT v.event_type, v.c, abs(v.c - med.med) AS ad, med.med AS med
      FROM v JOIN med ON v.event_type = med.event_type),
    mad AS (SELECT event_type, median(ad) AS mad FROM dev GROUP BY event_type)
    SELECT d.event_type,
           round(max(d.med) / 100.0, 2) AS median_value,
           round(max(m.mad) / 100.0, 2) AS mad_value,
           CAST(sum(CASE WHEN d.ad > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers,
           CAST(count(*) AS BIGINT) AS n
    FROM dev d JOIN mad m ON d.event_type = m.event_type
    GROUP BY d.event_type ORDER BY d.event_type
    """,
)
def agg_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier count per event type via median absolute deviation
    (|x − median| > 3·MAD) — the anomaly gate that, unlike z-scores, a
    single wild value cannot poison. Values are cent-quantized so both
    medians are exact over an integer domain (deviations are k or k+0.5,
    both dyadic-exact in IEEE double; 3·MAD likewise), making the
    boundary comparison bit-identical across engines. The two median
    frames are |event_type| rows, so both join-backs auto-broadcast;
    the only corpus-sized shuffles are the two per-type exact-median
    aggregates, whose state is bounded by the DISTINCT cent values of a
    bounded metric domain, not by row count."""
    v = load(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("c")
    )
    med = v.groupBy("event_type").agg(F.median("c").alias("med"))
    dev = v.join(med, "event_type").select(
        "event_type", "c", F.abs(F.col("c") - F.col("med")).alias("ad"), "med"
    )
    mad = dev.groupBy("event_type").agg(F.median("ad").alias("mad"))
    return (
        dev.join(mad, "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.max("med") / 100.0, 2).alias("median_value"),
            F.round(F.max("mad") / 100.0, 2).alias("mad_value"),
            F.sum(
                F.when(F.col("ad") > 3 * F.col("mad"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
            F.count("*").cast("long").alias("n"),
        )
        .orderBy("event_type")
    )


@query(
    "agg_new_vs_returning",
    oracle="""
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
    firsts AS (SELECT user_id, min(day) AS fday FROM du GROUP BY user_id)
    SELECT strftime(du.day, '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT) AS dau,
           CAST(sum(CASE WHEN du.day = f.fday THEN 1 ELSE 0 END) AS BIGINT)
             AS new_users,
           CAST(sum(CASE WHEN du.day = f.fday THEN 0 ELSE 1 END) AS BIGINT)
             AS returning_users,
           round(sum(CASE WHEN du.day = f.fday THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS pct_new
    FROM du JOIN firsts f ON du.user_id = f.user_id
    GROUP BY du.day ORDER BY day
    """,
)
def agg_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users split into first-timers vs returners — the
    acquisition-vs-retention dashboard row. First-seen attribution
    again: DISTINCT (day, user) and a per-user min-day aggregate are the
    only corpus-sized shuffles, rejoined on user_id as a plain shuffle
    equi-join (users grow with the corpus — never broadcast). Every
    output number is an exact integer count; the mix ratio is the one
    rounded float."""
    du = (
        load(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
    )
    firsts = du.groupBy("user_id").agg(F.min("day").alias("fday"))
    is_new = F.when(F.col("day") == F.col("fday"), 1).otherwise(0)
    return (
        du.join(firsts, "user_id")
        .groupBy("day")
        .agg(
            F.count("*").cast("long").alias("dau"),
            F.sum(is_new).cast("long").alias("new_users"),
            F.sum(1 - is_new).cast("long").alias("returning_users"),
            F.round(F.sum(is_new) * 1.0 / F.count("*"), 6).alias("pct_new"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau",
            "new_users",
            "returning_users",
            "pct_new",
        )
        .orderBy("day")
    )


@query(
    "agg_cohort_ltv",
    oracle="""
    WITH ev AS (
      SELECT user_id,
             datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS wi,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events),
    firsts AS (SELECT user_id, min(wi) AS cw FROM ev GROUP BY user_id),
    sizes AS (SELECT cw, count(*) AS n_users FROM firsts GROUP BY cw),
    wk AS (
      SELECT f.cw, e.wi - f.cw AS age_weeks, sum(e.cents) AS week_cents
      FROM ev e JOIN firsts f ON e.user_id = f.user_id
      GROUP BY f.cw, e.wi - f.cw),
    cum AS (
      SELECT cw, age_weeks, week_cents,
             sum(week_cents) OVER (PARTITION BY cw ORDER BY age_weeks
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cents
      FROM wk)
    SELECT strftime(DATE '1970-01-01' + CAST(c.cw * 7 AS INT), '%Y-%m-%d')
             AS cohort_week,
           CAST(c.age_weeks AS BIGINT) AS age_weeks,
           CAST(s.n_users AS BIGINT) AS n_users,
           round(c.week_cents / 100.0, 2) AS week_rev,
           round(c.cum_cents / 100.0, 2) AS cum_rev,
           round(c.cum_cents / (100.0 * s.n_users), 6) AS ltv_per_user
    FROM cum c JOIN sizes s ON c.cw = s.cw
    ORDER BY cohort_week, age_weeks
    """,
)
def agg_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value triangle: cumulative revenue per signup-week
    cohort by week age, per member — the LTV curve finance projects
    from. First-seen attribution pins each user to a cohort (one
    per-user min aggregate); revenue rolls up to (cohort, age) — a
    calendar² bounded key space — and the cumulative window runs inside
    each cohort over ≤ |weeks| rows. Cents stay exact int64 through the
    cumsum; the per-user divide is the only float. The user join is a
    plain shuffle equi-join (users grow with the corpus — never
    broadcast)."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.expr("datediff(CAST(ts AS DATE), DATE '1970-01-01') div 7").alias("wi"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    firsts = ev.groupBy("user_id").agg(F.min("wi").alias("cw"))
    sizes = firsts.groupBy("cw").agg(F.count("*").alias("n_users"))
    wk = (
        ev.join(firsts, "user_id")
        .groupBy("cw", (F.col("wi") - F.col("cw")).alias("age_weeks"))
        .agg(F.sum("cents").alias("week_cents"))
    )
    w = (
        Window.partitionBy("cw")
        .orderBy("age_weeks")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = wk.withColumn("cum_cents", F.sum("week_cents").over(w))
    return (
        cum.join(sizes, "cw")
        .select(
            F.expr(
                "date_format(date_add(DATE '1970-01-01', CAST(cw * 7 AS INT)),"
                " 'yyyy-MM-dd')"
            ).alias("cohort_week"),
            F.col("age_weeks").cast("long").alias("age_weeks"),
            F.col("n_users").cast("long").alias("n_users"),
            F.round(F.col("week_cents") / 100.0, 2).alias("week_rev"),
            F.round(F.col("cum_cents") / 100.0, 2).alias("cum_rev"),
            F.round(F.col("cum_cents") / (100.0 * F.col("n_users")), 6).alias(
                "ltv_per_user"
            ),
        )
        .orderBy("cohort_week", "age_weeks")
    )


@query(
    "agg_hist_percentiles",
    oracle="""
    WITH v AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
    h AS (
      SELECT length(format('{:b}', cents)) - 1 AS bucket, count(*) AS cnt
      FROM v GROUP BY 1),
    c AS (
      SELECT bucket,
             (1::BIGINT << bucket) AS lo, (1::BIGINT << (bucket + 1)) AS hi,
             cnt,
             sum(cnt) OVER (ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(cnt) OVER () AS n
      FROM h),
    p AS (SELECT unnest([0.5, 0.9, 0.99]) AS p),
    hit AS (
      SELECT p.p, c.lo, c.hi, c.cnt, c.cum - c.cnt AS prev, p.p * c.n AS target,
             row_number() OVER (PARTITION BY p.p ORDER BY c.bucket) AS rn
      FROM p JOIN c ON c.cum >= p.p * c.n)
    SELECT p,
           round((lo + (target - prev) * (hi - lo) / cnt) / 100.0, 2)
             AS est_value
    FROM hit WHERE rn = 1 ORDER BY p
    """,
)
def agg_hist_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentiles estimated from the power-of-two histogram (p50 / p90 /
    p99 of order value by within-bucket linear interpolation) — the
    mergeable-sketch percentile path: at 100 TB the full histogram is a
    few dozen int64 cells that partial-aggregate map-side and merge
    associatively, so percentile serving costs one bounded reduction
    instead of a quantile sort. Bucket boundaries are exact integer
    powers of two (bit-length bucketing); the interpolation arithmetic
    runs in oracle-identical operation order."""
    v = load(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    h = (
        v.select((F.length(F.bin("cents")) - 1).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
    )
    wc = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = h.select(
        "bucket",
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT))").alias("lo"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket + 1 AS INT))").alias(
            "hi"
        ),
        "cnt",
        F.sum("cnt").over(wc).alias("cum"),
        F.sum("cnt").over(Window.partitionBy()).alias("n"),
    )
    p = spark.createDataFrame([(0.5,), (0.9,), (0.99,)], "p double")
    hit = (
        p.join(c, F.col("cum") >= F.col("p") * F.col("n"))
        .select(
            "p",
            "lo",
            "hi",
            "cnt",
            (F.col("cum") - F.col("cnt")).alias("prev"),
            (F.col("p") * F.col("n")).alias("target"),
            F.row_number()
            .over(Window.partitionBy("p").orderBy("bucket"))
            .alias("rn"),
        )
        .filter(F.col("rn") == 1)
    )
    return hit.select(
        "p",
        F.round(
            (
                F.col("lo")
                + (F.col("target") - F.col("prev"))
                * (F.col("hi") - F.col("lo"))
                / F.col("cnt")
            )
            / 100.0,
            2,
        ).alias("est_value"),
    ).orderBy("p")


@query(
    "agg_conversion_latency",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_buy
      FROM events GROUP BY user_id),
    lat AS (
      SELECT epoch_us(first_buy) - epoch_us(first_click) AS lat_us
      FROM per_user
      WHERE first_click IS NOT NULL AND first_buy IS NOT NULL
        AND first_buy >= first_click)
    SELECT CAST(count(*) AS BIGINT) AS n_converted,
           round(quantile_cont(lat_us, 0.5) / 1e6, 3) AS p50_sec,
           round(quantile_cont(lat_us, 0.9) / 1e6, 3) AS p90_sec,
           round(avg(lat_us) / 1e6, 3) AS mean_sec
    FROM lat
    """,
)
def agg_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-click → first-purchase conversion latency distribution —
    the funnel-speed metric growth teams watch. ONE conditional-min
    hash aggregate per user collapses the corpus (no ordering, no
    window, no self-join); latency is exact integer microseconds, and
    the exact percentiles run over the already-reduced converted-user
    set. Users who purchased before ever clicking (direct-entry) are
    excluded on both sides."""
    pu = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias(
                "first_click"
            ),
            F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
                "first_buy"
            ),
        )
    )
    lat = pu.filter(
        F.col("first_click").isNotNull()
        & F.col("first_buy").isNotNull()
        & (F.col("first_buy") >= F.col("first_click"))
    ).select(
        (F.unix_micros("first_buy") - F.unix_micros("first_click")).alias(
            "lat_us"
        )
    )
    return lat.agg(
        F.count("*").cast("long").alias("n_converted"),
        F.round(F.percentile("lat_us", F.lit(0.5)) / 1e6, 3).alias("p50_sec"),
        F.round(F.percentile("lat_us", F.lit(0.9)) / 1e6, 3).alias("p90_sec"),
        F.round(F.avg("lat_us") / 1e6, 3).alias("mean_sec"),
    )


@query(
    "agg_benford_first_digit",
    oracle="""
    WITH v AS (
      SELECT substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR),
                    1, 1) AS d
      FROM orders WHERE o_totalprice > 0),
    c AS (SELECT d, count(*) AS n FROM v GROUP BY d),
    t AS (SELECT sum(n) AS total FROM c)
    SELECT c.d AS digit, CAST(c.n AS BIGINT) AS n,
           round(c.n * 1.0 / t.total, 6) AS observed,
           round(log10(1.0 + 1.0 / CAST(c.d AS INT)), 6) AS benford,
           round((c.n * 1.0 / t.total - log10(1.0 + 1.0 / CAST(c.d AS INT)))
                 * (c.n * 1.0 / t.total - log10(1.0 + 1.0 / CAST(c.d AS INT)))
                 / log10(1.0 + 1.0 / CAST(c.d AS INT)), 6) AS chi2_term
    FROM c, t ORDER BY digit
    """,
)
def agg_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order values — the classic
    anomaly/fraud screen: natural multiplicative data follows
    P(d) = log₁₀(1 + 1/d), fabricated numbers don't. The first digit is
    taken from the exact integer cent value's decimal string (never
    float log10-mantissa arithmetic, which disagrees at powers of ten);
    everything reduces to a 9-row digit histogram via one hash
    aggregate, and the χ² deviation terms are row-local doubles in
    oracle-identical operation order."""
    v = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 0)
        .select(
            F.substring(
                F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
                1,
                1,
            ).alias("d")
        )
    )
    c = v.groupBy("d").agg(F.count("*").alias("n"))
    t = c.agg(F.sum("n").alias("total"))
    obs = F.col("n") * 1.0 / F.col("total")
    ben = F.log10(F.lit(1.0) + 1.0 / F.col("d").cast("int"))
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            F.col("d").alias("digit"),
            F.col("n").cast("long").alias("n"),
            F.round(obs, 6).alias("observed"),
            F.round(ben, 6).alias("benford"),
            F.round((obs - ben) * (obs - ben) / ben, 6).alias("chi2_term"),
        )
        .orderBy("digit")
    )


@query(
    "agg_geo_mean",
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(count(*) AS BIGINT) AS n,
           round(exp(avg(ln(o_totalprice))), 2) AS geo_mean,
           round(avg(o_totalprice), 2) AS arith_mean
    FROM orders WHERE o_totalprice > 0
    GROUP BY o_orderpriority ORDER BY priority
    """,
)
def agg_geo_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric mean of order value per priority (exp of the log-mean)
    beside the arithmetic mean — the right-skew-robust center that
    pricing and latency dashboards should use and rarely do. ln/avg/exp
    is a single streaming hash aggregate (map-side combinable — the
    log-sum is associative); libm's last ulp differs per engine so both
    outputs round at 2 decimal cents precision."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    return (
        o.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.exp(F.avg(F.log("o_totalprice"))), 2).alias("geo_mean"),
            F.round(F.avg("o_totalprice"), 2).alias("arith_mean"),
        )
        .orderBy("priority")
    )


@query(
    "agg_autocorr_daily",
    oracle="""
    WITH d AS (
      SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev
      FROM orders GROUP BY 1, 2),
    j AS (
      SELECT a.priority, a.rev AS rev_t, b.rev AS rev_next
      FROM d a JOIN d b
        ON a.priority = b.priority AND b.day = a.day + 1)
    SELECT priority, CAST(count(*) AS BIGINT) AS n_pairs,
           round(corr(rev_t * 1.0, rev_next * 1.0), 6) AS lag1_autocorr
    FROM j GROUP BY priority ORDER BY priority
    """,
)
def agg_autocorr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of the daily revenue series per priority —
    does today's demand predict tomorrow's? The corpus reduces to
    (priority, day) cent sums (hash agg); the lag pairing is a self
    equi-join on (priority, day+1) over the CALENDAR-bounded day table —
    no window, no corpus-sized state — and corr() is a streaming
    five-moment aggregate, rounded for cross-engine moment-accumulation
    drift."""
    o = load(spark, sf_dir, "orders")
    d = (
        o.groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.to_date("o_orderdate").alias("day"),
        )
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev"))
    )
    b = d.select(
        F.col("priority").alias("bp"),
        F.col("day").alias("bday"),
        F.col("rev").alias("rev_next"),
    )
    j = d.join(
        b,
        (F.col("bp") == F.col("priority"))
        & (F.col("bday") == F.expr("date_add(day, 1)")),
    )
    return (
        j.groupBy("priority")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.round(
                F.corr(F.col("rev") * 1.0, F.col("rev_next") * 1.0), 6
            ).alias("lag1_autocorr"),
        )
        .orderBy("priority")
    )


@query(
    "agg_wow_growth",
    oracle="""
    WITH wk AS (
      SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) // 7
               AS wi,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents,
             count(*) AS n_orders
      FROM orders GROUP BY 1)
    SELECT strftime(DATE '1970-01-01' + CAST(a.wi * 7 AS INT), '%Y-%m-%d')
             AS week_start,
           round(a.cents / 100.0, 2) AS revenue,
           CAST(a.n_orders AS BIGINT) AS n_orders,
           round((a.cents - b.cents) * 100.0 / b.cents, 4) AS wow_pct
    FROM wk a LEFT JOIN wk b ON b.wi = a.wi - 1
    ORDER BY week_start
    """,
)
def agg_wow_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week revenue growth — the Δ% every business review
    opens with. One hash aggregate to weekly int64 cent totals, then the
    previous week arrives via a self LEFT JOIN on the exact integer week
    index over the CALENDAR-bounded weekly table (no window needed, no
    corpus re-scan); the first week's delta is NULL by construction.
    The growth ratio divides two exact integers in oracle-identical
    order."""
    wk = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.expr(
                "datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') div 7"
            ).alias("wi")
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "cents"
            ),
            F.count("*").alias("n_orders"),
        )
    )
    b = wk.select(
        F.col("wi").alias("bwi"), F.col("cents").alias("prev_cents")
    )
    return (
        wk.join(b, F.col("bwi") == F.col("wi") - 1, "left")
        .select(
            F.expr(
                "date_format(date_add(DATE '1970-01-01', CAST(wi * 7 AS INT)),"
                " 'yyyy-MM-dd')"
            ).alias("week_start"),
            F.round(F.col("cents") / 100.0, 2).alias("revenue"),
            F.col("n_orders").cast("long").alias("n_orders"),
            F.round(
                (F.col("cents") - F.col("prev_cents"))
                * 100.0
                / F.col("prev_cents"),
                4,
            ).alias("wow_pct"),
        )
        .orderBy("week_start")
    )


@query(
    "agg_regression_residuals",
    oracle="""
    WITH spend AS (
      SELECT c.c_mktsegment AS seg, c.c_custkey AS custkey,
             CAST(round(c.c_acctbal * 100) AS BIGINT) AS x,
             sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS y
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment, c.c_custkey, round(c.c_acctbal * 100)),
    fit AS (
      SELECT seg,
             (CAST(count(*) AS DOUBLE) * CAST(sum(x * y) AS DOUBLE)
              - CAST(sum(x) AS DOUBLE) * CAST(sum(y) AS DOUBLE))
             / nullif(CAST(count(*) AS DOUBLE) * CAST(sum(x * x) AS DOUBLE)
                - CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE), 0.0)
               AS slope,
             CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS my,
             CAST(sum(x) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mx
      FROM spend GROUP BY seg),
    resid AS (
      SELECT s.seg, s.custkey,
             (CAST(s.y AS DOUBLE)
              - (f.my + f.slope * (CAST(s.x AS DOUBLE) - f.mx))) / 100.0
               AS residual
      FROM spend s JOIN fit f ON f.seg = s.seg),
    ranked AS (
      SELECT seg, custkey, residual,
             row_number() OVER (PARTITION BY seg
                                ORDER BY abs(residual) DESC, custkey) AS rnk
      FROM resid)
    SELECT seg, CAST(custkey AS BIGINT) AS custkey,
           round(residual, 2) AS residual, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 3 ORDER BY seg, rnk
    """,
)
def agg_regression_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment OLS residual outliers: fit spend ~ account balance
    within each market segment, then surface the 3 customers whose spend
    deviates most from the segment's own line — the 'who is off-trend'
    audit behind every churn/fraud review. Float-parity discipline: x
    and y enter as EXACT int64 cents, every OLS sum (Σx Σy Σxy Σx²) is
    therefore exact, and both engines evaluate the identical double
    expression over those integers (slope in centered form ŷ = ȳ +
    b(x−x̄) to avoid catastrophic cancellation in the intercept). Scale:
    one equi-shuffle join + hash agg to per-customer spend, a ≤|segments|
    fit table joined back BROADCAST (bounded by the segment domain, not
    the corpus), and the top-3 rank runs per segment over residuals —
    window keyed by segment, with the heavy reduction already done."""
    spend = (
        load(spark, sf_dir, "customer")
        .join(
            load(spark, sf_dir, "orders"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("c_custkey").alias("custkey"),
            F.round(F.col("c_acctbal") * 100).cast("long").alias("x"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("y")
        )
    )
    n = F.count("*").cast("double")
    sx = F.sum("x").cast("double")
    sy = F.sum("y").cast("double")
    sxy = F.sum(F.col("x") * F.col("y")).cast("double")
    sxx = F.sum(F.col("x") * F.col("x")).cast("double")
    fit = spend.groupBy("seg").agg(
        # nullif guards the degenerate all-same-x segment: Spark's
        # non-ANSI 0/0 yields NULL while DuckDB yields inf/nan — with
        # the guard BOTH engines emit NULL and agree (ADVICE r4)
        (
            (n * sxy - sx * sy) / F.nullif(n * sxx - sx * sx, F.lit(0.0))
        ).alias("slope"),
        (sy / n).alias("my"),
        (sx / n).alias("mx"),
    )
    resid = spend.join(F.broadcast(fit), "seg").select(
        "seg",
        "custkey",
        (
            (
                F.col("y").cast("double")
                - (
                    F.col("my")
                    + F.col("slope") * (F.col("x").cast("double") - F.col("mx"))
                )
            )
            / 100.0
        ).alias("residual"),
    )
    w = Window.partitionBy("seg").orderBy(
        F.desc(F.abs(F.col("residual"))), "custkey"
    )
    return (
        resid.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "seg",
            F.col("custkey").cast("long").alias("custkey"),
            F.round("residual", 2).alias("residual"),
            F.col("rnk").cast("int").alias("rnk"),
        )
        .orderBy("seg", "rnk")
    )


@query(
    "agg_gap_survival",
    oracle="""
    WITH gaps AS (
      SELECT o_custkey,
             datediff('day', CAST(o_orderdate AS DATE),
                      lead(CAST(o_orderdate AS DATE))
                        OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey)) AS gap_days
      FROM orders),
    g AS (SELECT gap_days FROM gaps WHERE gap_days IS NOT NULL),
    h AS (SELECT unnest([7, 14, 30, 60, 90, 180]) AS horizon_days)
    SELECT CAST(h.horizon_days AS INT) AS horizon_days,
           count(*) AS n_gaps,
           CAST(sum(CASE WHEN g.gap_days >= h.horizon_days
                         THEN 1 ELSE 0 END) AS BIGINT) AS surviving,
           round(CAST(sum(CASE WHEN g.gap_days >= h.horizon_days
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS survival_rate
    FROM g, h
    GROUP BY h.horizon_days ORDER BY horizon_days
    """,
)
def agg_gap_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase-gap survival curve: P(next order takes ≥ d days)
    for a grid of horizons — the empirical survival function behind
    reorder-window and churn-definition choices. The corpus-sized work
    is ONE keyed window (lead over each customer's order dates — keyed
    by custkey, never global); the surviving-gap counts then come from a
    single pass that fans each gap out to the CONSTANT 6-row horizon
    grid (a broadcast nested-loop over a 6-row literal table — bounded
    at any corpus size) and hash-aggregates per horizon into 6 rows."""
    day = F.col("o_orderdate").cast("date")
    gaps = (
        load(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            F.datediff(
                F.lead(day).over(
                    Window.partitionBy("o_custkey").orderBy(
                        "o_orderdate", "o_orderkey"
                    )
                ),
                day,
            ).alias("gap_days"),
        )
        .filter(F.col("gap_days").isNotNull())
    )
    horizons = F.array(*[F.lit(d) for d in (7, 14, 30, 60, 90, 180)])
    return (
        gaps.select(
            "gap_days", F.explode(horizons).alias("horizon_days")
        )
        .groupBy("horizon_days")
        .agg(
            F.count("*").alias("n_gaps"),
            F.sum(
                F.when(F.col("gap_days") >= F.col("horizon_days"), 1).otherwise(
                    0
                )
            ).alias("surviving"),
        )
        .select(
            F.col("horizon_days").cast("int").alias("horizon_days"),
            "n_gaps",
            "surviving",
            F.round(
                F.col("surviving").cast("double")
                / F.col("n_gaps").cast("double"),
                6,
            ).alias("survival_rate"),
        )
        .orderBy("horizon_days")
    )


@query(
    "agg_rfm_segments",
    oracle="""
    WITH base AS (
      SELECT o_custkey AS custkey,
             datediff('day', max(CAST(o_orderdate AS DATE)),
                      (SELECT max(CAST(o_orderdate AS DATE)) FROM orders))
               AS recency_days,
             count(*) AS frequency,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders GROUP BY o_custkey),
    n AS (SELECT count(*) AS n_cust FROM base),
    ranked AS (
      SELECT b.*, n.n_cust,
             row_number() OVER (ORDER BY b.recency_days, b.custkey) AS r_rnk,
             row_number() OVER (ORDER BY b.frequency DESC, b.custkey) AS f_rnk,
             row_number() OVER (ORDER BY b.cents DESC, b.custkey) AS m_rnk
      FROM base b, n),
    seg AS (
      SELECT CAST((r_rnk - 1) * 5 // n_cust + 1 AS INT) AS r_q,
             CAST((f_rnk - 1) * 5 // n_cust + 1 AS INT) AS f_q,
             CAST((m_rnk - 1) * 5 // n_cust + 1 AS INT) AS m_q,
             cents
      FROM ranked)
    SELECT r_q, f_q, m_q, count(*) AS n_customers,
           CAST((2 * CAST(sum(cents) AS BIGINT) + count(*))
                // (2 * count(*)) AS DOUBLE) / 100.0 AS avg_monetary
    FROM seg GROUP BY r_q, f_q, m_q
    ORDER BY r_q, f_q, m_q
    """,
)
def agg_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) quintile segmentation — the
    classic CRM cube. Each customer is ranked on all three axes and
    bucketed by the EXPLICIT integer formula (rank−1)·5 div n + 1 (the
    same text on both engines — ntile()'s uneven-bucket convention is
    not portable), then the ≤125 segment cells are counted. The per-axis
    global rankings use the engine's sampled range-bucketed rank
    (ranking.with_global_rank) — NO single-partition window touches the
    per-customer frame, which at 100 TB is itself corpus-sized. Monetary
    stays int64 cents until the one output divide."""
    from .ranking import with_global_rank

    o = load(spark, sf_dir, "orders")
    mx = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("corpus_max"))
    base = (
        o.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max(F.col("o_orderdate").cast("date")).alias("last_day"),
            F.count("*").alias("frequency"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "cents"
            ),
        )
        .crossJoin(F.broadcast(mx))
        .select(
            "custkey",
            F.datediff("corpus_max", "last_day").alias("recency_days"),
            "frequency",
            "cents",
        )
    )
    # materialize the per-customer frame ONCE (same pattern as
    # dedup_cluster_cc): the three rank constructions each re-evaluate
    # their input several times — without this the orders aggregate
    # would run ~8× (ruinous when orders is the 100 TB fact)
    base = base.localCheckpoint()
    n_cust = base.count()
    ranked = with_global_rank(
        base, [("recency_days", "asc"), ("custkey", "asc")], rank_col="r_rnk"
    )
    ranked = with_global_rank(
        ranked, [("frequency", "desc"), ("custkey", "asc")], rank_col="f_rnk"
    )
    ranked = with_global_rank(
        ranked, [("cents", "desc"), ("custkey", "asc")], rank_col="m_rnk"
    )

    def quint(rnk):
        # exact int64 division (both engines' `/` is FLOAT division —
        # an epsilon-under quotient would truncate into the wrong bucket)
        return (
            F.expr(f"({rnk} - 1) * 5 div {n_cust}").cast("int") + 1
        )

    return (
        ranked.select(
            quint("r_rnk").alias("r_q"),
            quint("f_rnk").alias("f_q"),
            quint("m_rnk").alias("m_q"),
            "cents",
        )
        .groupBy("r_q", "f_q", "m_q")
        .agg(
            F.count("*").alias("n_customers"),
            # exact integer half-up division to whole cents, ONE float
            # divide at the end — round(S/(100n), 2) on the raw double
            # is engine-dependent when the quotient lands on a .xx5
            (
                F.expr(
                    "CAST((2 * sum(cents) + count(*))"
                    " div (2 * count(*)) AS DOUBLE)"
                )
                / 100.0
            ).alias("avg_monetary"),
        )
        .orderBy("r_q", "f_q", "m_q")
    )


@query(
    "agg_stickiness_ratio",
    oracle="""
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
    dau AS (SELECT day, count(*) AS dau FROM du GROUP BY day),
    days AS (SELECT DISTINCT day FROM du),
    cov AS (
      SELECT du.day + (o.off)::INT AS cover_day, du.user_id
      FROM du, (SELECT unnest(range(0, 7)) AS off) o),
    wau AS (
      SELECT d.day, count(DISTINCT c.user_id) AS wau
      FROM days d JOIN cov c ON c.cover_day = d.day
      GROUP BY d.day)
    SELECT strftime(w.day, '%Y-%m-%d') AS day,
           CAST(a.dau AS BIGINT) AS dau,
           CAST(w.wau AS BIGINT) AS wau,
           round(CAST(a.dau AS DOUBLE) / CAST(w.wau AS DOUBLE), 6)
             AS stickiness
    FROM wau w JOIN dau a ON a.day = w.day
    ORDER BY day
    """,
)
def agg_stickiness_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per day — the engagement-frequency ratio every
    growth review tracks. Same scale-correct WAU construction as
    `agg_rolling_active_users` (distinct (day, user) → bounded ×7
    offset fan-out → day-keyed exact distinct; no range window, no
    self-join), joined to the direct DAU count on the calendar-bounded
    day key; the ratio divides two exact integers once per output
    row."""
    e = load(spark, sf_dir, "events")
    du = e.select(F.to_date("ts").alias("day"), "user_id").distinct()
    dau = du.groupBy("day").agg(F.count("*").alias("dau"))
    cov = du.withColumn(
        "off", F.explode(F.sequence(F.lit(0), F.lit(6)))
    ).select(F.expr("date_add(day, off)").alias("cover_day"), "user_id")
    days = du.select("day").distinct()
    wau = (
        days.join(cov, days.day == cov.cover_day)
        .groupBy(days.day)
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return (
        wau.join(dau, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("dau").cast("long").alias("dau"),
            F.col("wau").cast("long").alias("wau"),
            F.round(
                F.col("dau").cast("double") / F.col("wau").cast("double"), 6
            ).alias("stickiness"),
        )
        .orderBy("day")
    )


@query(
    "agg_iqr_outlier_days",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders GROUP BY CAST(o_orderdate AS DATE)),
    q AS (
      SELECT quantile_cont(cents, 0.25) AS q1,
             quantile_cont(cents, 0.75) AS q3
      FROM daily)
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           round(CAST(d.cents AS DOUBLE) / 100.0, 2) AS revenue,
           CASE WHEN CAST(d.cents AS DOUBLE) > q.q3 + 1.5 * (q.q3 - q.q1)
                THEN 'high' ELSE 'low' END AS side
    FROM daily d, q
    WHERE CAST(d.cents AS DOUBLE) > q.q3 + 1.5 * (q.q3 - q.q1)
       OR CAST(d.cents AS DOUBLE) < q.q1 - 1.5 * (q.q3 - q.q1)
    ORDER BY day
    """,
)
def agg_iqr_outlier_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier days: daily revenue beyond 1.5×IQR of the
    day-level distribution — the robust anomaly screen that, unlike a
    z-score, is immune to the outliers it hunts. Daily totals are exact
    int64 cents; Q1/Q3 are exact linear-interpolated percentiles (Spark
    `percentile` ≡ DuckDB `quantile_cont`, parity pinned by
    `agg_percentiles`) computed over the CALENDAR-bounded daily frame,
    and the 2-value fence table rides a broadcast nested-loop that is
    bounded (1 row) by construction. Both engines evaluate the same
    fence arithmetic on the same exact inputs."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "cents"
            )
        )
    )
    q = daily.agg(
        F.expr("percentile(cents, 0.25)").alias("q1"),
        F.expr("percentile(cents, 0.75)").alias("q3"),
    )
    c = F.col("cents").cast("double")
    hi = F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
    lo = F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))
    return (
        daily.crossJoin(F.broadcast(q))
        .filter((c > hi) | (c < lo))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.round(c / 100.0, 2).alias("revenue"),
            F.when(c > hi, "high").otherwise("low").alias("side"),
        )
        .orderBy("day")
    )


# Block fan-in of the pareto front's distributed prefix-max; module-level
# so tests can shrink it to exercise the multi-level recursion on small
# fixtures (at 1024, two levels only engage beyond ~1M survivors).
_PARETO_BLK = 1024


@query(
    "agg_pareto_front",
    oracle="""
    WITH pts AS (
      SELECT CAST(round(c.c_acctbal * 100) AS BIGINT) AS x,
             sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS y,
             count(DISTINCT c.c_custkey) AS n_customers
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, round(c.c_acctbal * 100))
    , grp AS (
      SELECT x, CAST(y AS BIGINT) AS y,
             CAST(sum(n_customers) AS BIGINT) AS n_customers
      FROM pts GROUP BY x, y)
    SELECT round(CAST(p.x AS DOUBLE) / 100.0, 2) AS acctbal,
           round(CAST(p.y AS DOUBLE) / 100.0, 2) AS spend,
           p.n_customers
    FROM grp p
    WHERE NOT EXISTS (
      SELECT 1 FROM grp q
      WHERE q.x >= p.x AND q.y >= p.y AND (q.x > p.x OR q.y > p.y))
    ORDER BY acctbal DESC
    """,
)
def agg_pareto_front(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto front (skyline) of customers on (account balance,
    total spend) — 'who is undominated on both axes', the classic
    skyline query. Distributed as the textbook TWO-PHASE skyline: a
    per-partition sweep (sort by x desc, y desc; a point survives iff
    its y strictly exceeds the running max of everything before it)
    prunes each partition to its LOCAL front; the global sweep over the
    survivors then runs WITHOUT a single-partition window (in
    anti-correlated data the whole corpus is on the front, so the
    survivor set — and the answer — can be corpus-sized): survivors get
    a range-bucketed global rank (the sort_global machinery), and the
    prefix-max decomposes into a block-KEYED window plus a carry-in of
    block maxima, recursing on the 1024×-smaller block-max table until
    the top level is constant-sized — only that ≤1024-row table is ever
    scanned unpartitioned. Coordinates are exact int64 cents, points
    are first deduped on (x, y) (duplicates never dominate each other,
    so both engines keep them symmetric), and the sweep's strict y
    comparison is exact, so the front is bit-identical to the oracle's
    O(n²) NOT-EXISTS definition."""
    pts = (
        load(spark, sf_dir, "customer")
        .join(
            load(spark, sf_dir, "orders"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            "c_custkey",
            F.round(F.col("c_acctbal") * 100).cast("long").alias("x"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("y")
        )
        .groupBy("x", "y")
        .agg(F.countDistinct("c_custkey").cast("long").alias("n_customers"))
    )

    def sweep(df, part_cols):
        w = (
            Window.partitionBy(*part_cols)
            .orderBy(F.desc("x"), F.desc("y"))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        prev = F.max("y").over(w)
        return df.withColumn("prev_max", prev).filter(
            F.col("prev_max").isNull() | (F.col("y") > F.col("prev_max"))
        ).drop("prev_max")

    local = sweep(
        pts.withColumn("pid", F.spark_partition_id()), ["pid"]
    ).drop("pid")
    # Global sweep WITHOUT a single-partition window: in anti-correlated
    # data every point is on the front, so the survivor set (and the
    # answer itself) is corpus-sized and a global `Window.orderBy` would
    # funnel it into one task. Instead: range-bucketed global rank
    # (ranking.with_global_rank — the sort_global machinery), then the
    # prefix-max splits into a KEYED per-block window plus a carry-in of
    # block maxima, recursing on the block-max table (1024× smaller per
    # level) until it is driver-trivial — the classic distributed scan
    # composition.
    from .ranking import with_global_rank

    _BLK = _PARETO_BLK
    ranked = with_global_rank(
        local, [("x", "desc"), ("y", "desc")], rank_col="r"
    ).localCheckpoint()
    level = ranked.select(F.expr(f"(r - 1) div {_BLK}").alias("blk"), "y")
    carries = []  # (level_df of blk -> carry_in) lowest level last
    while level.count() > _BLK:
        blk_max = level.groupBy("blk").agg(F.max("y").alias("y"))
        carries.append(blk_max)
        level = blk_max.select(
            F.expr(f"blk div {_BLK}").alias("blk"), "y"
        )
    # Fold carry-ins back down, top level first. The loop exit condition
    # bounds carries[-1] at ≤ _BLK rows, so only the TOPMOST prefix scan
    # runs unpartitioned (over ≤ _BLK rows — a constant); every lower
    # level's prefix is a window KEYED by the parent block plus an
    # equi-join of the parent carry (AQE broadcasts it when small; it is
    # never forced — at extreme survivor counts it stays a shuffle).
    carry_df = None
    for i in range(len(carries) - 1, -1, -1):
        cur = carries[i]  # blk -> max y of that block (bottom level i=0)
        if carry_df is None:
            w = Window.orderBy("blk").rowsBetween(
                Window.unboundedPreceding, -1
            )
            carry_df = cur.select(
                "blk", F.max("y").over(w).alias("carry_in")
            )
        else:
            parent = carry_df.select(
                F.col("blk").alias("pblk"), F.col("carry_in").alias("pc")
            )
            wk = (
                Window.partitionBy("pblk")
                .orderBy("blk")
                .rowsBetween(Window.unboundedPreceding, -1)
            )
            carry_df = (
                cur.withColumn("pblk", F.expr(f"blk div {_BLK}"))
                .join(parent, "pblk", "left")
                .select(
                    "blk",
                    F.greatest(F.max("y").over(wk), F.col("pc")).alias(
                        "carry_in"
                    ),
                )
            )
    if carry_df is None:
        # survivors fit in one block — plain bounded sweep
        front = sweep(ranked.withColumn("g", F.lit(0)), ["g"]).drop("g", "r")
    else:
        blocked = ranked.withColumn("blk", F.expr(f"(r - 1) div {_BLK}"))
        wloc = (
            Window.partitionBy("blk")
            .orderBy("r")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        front = (
            blocked.join(carry_df, "blk", "left")
            .withColumn(
                "prev_max",
                F.greatest(
                    F.coalesce(F.max("y").over(wloc), F.lit(-(10**18))),
                    F.coalesce("carry_in", F.lit(-(10**18))),
                ),
            )
            .filter(F.col("y") > F.col("prev_max"))
            .drop("prev_max", "carry_in", "blk", "r")
        )
    return front.select(
        F.round(F.col("x").cast("double") / 100.0, 2).alias("acctbal"),
        F.round(F.col("y").cast("double") / 100.0, 2).alias("spend"),
        "n_customers",
    ).orderBy(F.desc("acctbal"))


@query(
    "agg_mutual_information",
    oracle="""
    WITH c AS (
      SELECT event_type AS x, CAST(EXTRACT(HOUR FROM ts) AS INT) AS y,
             count(*) * 1.0 AS n_xy
      FROM events GROUP BY event_type, EXTRACT(HOUR FROM ts)),
    t AS (SELECT sum(n_xy) AS n FROM c),
    mx AS (SELECT x, sum(n_xy) AS n_x FROM c GROUP BY x),
    my AS (SELECT y, sum(n_xy) AS n_y FROM c GROUP BY y)
    SELECT round(sum((c.n_xy / t.n)
                     * ln(c.n_xy * t.n / (mx.n_x * my.n_y))), 6) AS mi_nats,
           round(-sum((c.n_xy / t.n) * ln(c.n_xy / t.n)), 6) AS h_xy,
           count(*) AS n_cells
    FROM c JOIN mx ON mx.x = c.x JOIN my ON my.y = c.y CROSS JOIN t
    """,
)
def agg_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between event type and hour-of-day — the
    dependence probe behind 'is this metric seasonal' questions, in
    nats with the joint entropy alongside. The corpus-sized work is ONE
    hash aggregate to the ≤ |types|×24 contingency cells; margins and
    the total are re-aggregated from that bounded frame (never a second
    corpus pass), joined back as bounded equi/broadcast probes. Natural
    log pinned on both engines; the cell sum is over a CONSTANT-bounded
    domain, so the round-6 output is deterministic in practice (same
    discipline as agg_entropy)."""
    e = load(spark, sf_dir, "events")
    c = (
        e.groupBy(
            F.col("event_type").alias("x"),
            F.hour("ts").cast("int").alias("y"),
        )
        .agg(F.count("*").cast("double").alias("n_xy"))
    )
    t = c.agg(F.sum("n_xy").alias("n"))
    mx = c.groupBy("x").agg(F.sum("n_xy").alias("n_x"))
    my = c.groupBy("y").agg(F.sum("n_xy").alias("n_y"))
    j = (
        c.join(mx, "x")
        .join(my, "y")
        .crossJoin(F.broadcast(t))
    )
    p = F.col("n_xy") / F.col("n")
    return j.agg(
        F.round(
            F.sum(
                p
                * F.log(
                    F.col("n_xy") * F.col("n") / (F.col("n_x") * F.col("n_y"))
                )
            ),
            6,
        ).alias("mi_nats"),
        F.round(-F.sum(p * F.log(p)), 6).alias("h_xy"),
        F.count("*").alias("n_cells"),
    )


@query(
    "agg_chi_square",
    oracle="""
    WITH c AS (
      SELECT source, lang, count(*) * 1.0 AS o
      FROM documents GROUP BY source, lang),
    t AS (SELECT sum(o) AS n FROM c),
    ms AS (SELECT source, sum(o) AS n_s FROM c GROUP BY source),
    ml AS (SELECT lang, sum(o) AS n_l FROM c GROUP BY lang),
    cells AS (
      SELECT c.o, ms.n_s * ml.n_l / t.n AS e
      FROM c JOIN ms ON ms.source = c.source
             JOIN ml ON ml.lang = c.lang CROSS JOIN t),
    dims AS (
      SELECT count(DISTINCT source) AS r, count(DISTINCT lang) AS k
      FROM documents)
    SELECT round(sum((o - e) * (o - e) / e), 4) AS chi2,
           CAST((SELECT (r - 1) * (k - 1) FROM dims) AS BIGINT) AS dof,
           count(*) AS n_observed_cells
    FROM cells
    """,
)
def agg_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson χ² independence test on the source × language
    contingency table — the drift alarm a corpus-intake pipeline runs
    to catch a source whose language mix shifted. Same bounded-cell
    shape as agg_mutual_information: one corpus-sized hash aggregate to
    the observed cells, margins re-aggregated from that tiny frame,
    expected counts from exact margin products, and a constant-domain
    sum for the statistic (dof from the margin cardinalities). Note the
    statistic sums only OBSERVED cells — zero-observed cells contribute
    their expectation; for a drift alarm on the same corpus the
    convention is pinned identically in both engines."""
    d = load(spark, sf_dir, "documents")
    c = d.groupBy("source", "lang").agg(
        F.count("*").cast("double").alias("o")
    )
    t = c.agg(F.sum("o").alias("n"))
    ms = c.groupBy("source").agg(F.sum("o").alias("n_s"))
    ml = c.groupBy("lang").agg(F.sum("o").alias("n_l"))
    dims = d.agg(
        F.countDistinct("source").alias("r"), F.countDistinct("lang").alias("k")
    )
    e = F.col("n_s") * F.col("n_l") / F.col("n")
    cells = (
        c.join(ms, "source").join(ml, "lang").crossJoin(F.broadcast(t))
    )
    return (
        cells.agg(
            F.round(
                F.sum((F.col("o") - e) * (F.col("o") - e) / e), 4
            ).alias("chi2"),
            F.count("*").alias("n_observed_cells"),
        )
        .crossJoin(F.broadcast(dims))
        .select(
            "chi2",
            ((F.col("r") - 1) * (F.col("k") - 1)).cast("long").alias("dof"),
            "n_observed_cells",
        )
    )


@query(
    "agg_lead_time_percentiles",
    oracle="""
    WITH lt AS (
      SELECT o.o_orderpriority AS prio,
             datediff('day', CAST(o.o_orderdate AS DATE),
                      CAST(l.l_shipdate AS DATE)) AS lead_days
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey)
    SELECT prio,
           count(*) AS n_lines,
           round(quantile_cont(lead_days, 0.50), 4) AS p50,
           round(quantile_cont(lead_days, 0.90), 4) AS p90,
           round(quantile_cont(lead_days, 0.99), 4) AS p99,
           CAST(max(lead_days) AS BIGINT) AS worst
    FROM lt GROUP BY prio ORDER BY prio
    """,
)
def agg_lead_time_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship lead-time SLA percentiles per priority class — the
    fulfillment-latency review. Lead times are exact integer day diffs
    (order date → line ship date), the fact-fact join equi-shuffles on
    orderkey, and the interpolated percentiles run per priority (Spark
    `percentile` ≡ DuckDB `quantile_cont`, parity pinned by
    agg_percentiles) over exact integer inputs."""
    lt = (
        load(spark, sf_dir, "lineitem")
        .join(
            load(spark, sf_dir, "orders"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(
            F.col("o_orderpriority").alias("prio"),
            F.datediff(
                F.col("l_shipdate").cast("date"),
                F.col("o_orderdate").cast("date"),
            ).alias("lead_days"),
        )
    )
    return (
        lt.groupBy("prio")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.expr("percentile(lead_days, 0.50)"), 4).alias("p50"),
            F.round(F.expr("percentile(lead_days, 0.90)"), 4).alias("p90"),
            F.round(F.expr("percentile(lead_days, 0.99)"), 4).alias("p99"),
            F.max("lead_days").cast("long").alias("worst"),
        )
        .orderBy("prio")
    )


@query(
    "agg_hhi_concentration",
    oracle="""
    WITH sup AS (
      SELECT p.p_brand AS brand, l.l_suppkey AS supp,
             sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS cents
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY p.p_brand, l.l_suppkey),
    tot AS (SELECT brand, sum(cents) AS t FROM sup GROUP BY brand)
    SELECT s.brand,
           count(*) AS n_suppliers,
           round(sum((CAST(s.cents AS DOUBLE) / CAST(t.t AS DOUBLE))
                     * (CAST(s.cents AS DOUBLE) / CAST(t.t AS DOUBLE)))
                 * 10000, 4) AS hhi,
           round(max(CAST(s.cents AS DOUBLE) / CAST(t.t AS DOUBLE)), 6)
             AS top_share
    FROM sup s JOIN tot t ON t.brand = s.brand
    GROUP BY s.brand ORDER BY s.brand
    """,
)
def agg_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman supplier-concentration index per part brand
    — the market-concentration metric behind supply-risk reviews
    (10000 = single supplier, →0 = fragmented). One corpus-sized hash
    aggregate to (brand, supplier) int64 cent revenue; brand totals are
    re-aggregated from that bounded frame and joined back on the brand
    key; the share squares sum over the per-brand supplier list with
    the usual round-discipline (exact integer inputs, one divide per
    share)."""
    sup = (
        load(spark, sf_dir, "lineitem")
        .join(
            load(spark, sf_dir, "part"),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy(F.col("p_brand").alias("brand"), F.col("l_suppkey").alias("supp"))
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "cents"
            )
        )
    )
    tot = sup.groupBy("brand").agg(F.sum("cents").alias("t"))
    share = F.col("cents").cast("double") / F.col("t").cast("double")
    return (
        sup.join(tot, "brand")
        .groupBy("brand")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.round(F.sum(share * share) * 10000, 4).alias("hhi"),
            F.round(F.max(share), 6).alias("top_share"),
        )
        .orderBy("brand")
    )


@query(
    "agg_basket_lift",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM lineitem),
    freq AS (SELECT l_partkey, count(*) AS f FROM items GROUP BY l_partkey),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             count(*) AS together
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2)
    SELECT p.part_a, p.part_b,
           CAST(p.together AS BIGINT) AS together,
           round(CAST(p.together AS DOUBLE) * CAST(n.n_orders AS DOUBLE)
                 / (CAST(fa.f AS DOUBLE) * CAST(fb.f AS DOUBLE)), 4) AS lift
    FROM pairs p
    JOIN freq fa ON fa.l_partkey = p.part_a
    JOIN freq fb ON fb.l_partkey = p.part_b
    CROSS JOIN n
    WHERE p.together >= 2
    ORDER BY together DESC, lift DESC, part_a, part_b
    LIMIT 20
    """,
)
def agg_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence with lift — 'bought together' at the
    pair level, the association-rule staple. The pair generator is a
    SELF EQUI-JOIN ON THE ORDER KEY, so fan-out per order is k²/2 where
    k is that order's line count — bounded by basket size (single
    digits), NOT the corpus; there is no corpus-wide pair space
    anywhere. Lift = P(ab)·N / (P(a)·P(b)·N²) cancels to
    together·N/(f_a·f_b) — four exact integers and one divide. Support
    floor ≥ 2 prunes noise pairs before the bounded top-20 cut."""
    items = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_orders = (
        load(spark, sf_dir, "lineitem").select("l_orderkey").distinct().count()
    )
    freq = items.groupBy("l_partkey").agg(F.count("*").alias("f"))
    a = items.alias("a")
    b = items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("together"))
        .filter(F.col("together") >= 2)
    )
    fa = freq.select(F.col("l_partkey").alias("part_a"), F.col("f").alias("fa"))
    fb = freq.select(F.col("l_partkey").alias("part_b"), F.col("f").alias("fb"))
    lift = (
        F.col("together").cast("double")
        * F.lit(float(n_orders))
        / (F.col("fa").cast("double") * F.col("fb").cast("double"))
    )
    return (
        pairs.join(fa, "part_a")
        .join(fb, "part_b")
        .select(
            "part_a",
            "part_b",
            F.col("together").cast("long").alias("together"),
            F.round(lift, 4).alias("lift"),
        )
        .orderBy(F.desc("together"), F.desc("lift"), "part_a", "part_b")
        .limit(20)
    )


@query(
    "agg_forecast_backtest",
    oracle="""
    WITH daily AS (
      SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS day,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders GROUP BY 1, 2),
    j AS (
      SELECT a.prio, a.cents AS actual, b.cents AS forecast
      FROM daily a JOIN daily b
        ON b.prio = a.prio AND b.day = a.day - 7)
    SELECT prio, count(*) AS n_days,
           round(CAST(sum(abs(actual - forecast)) AS DOUBLE)
                 / (CAST(count(*) AS DOUBLE) * 100.0), 2) AS mae,
           round(100.0 * sum(CAST(abs(actual - forecast) AS DOUBLE)
                             / CAST(actual AS DOUBLE))
                 / CAST(count(*) AS DOUBLE), 4) AS mape_pct
    FROM j WHERE actual > 0
    GROUP BY prio ORDER BY prio
    """,
)
def agg_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: ŷ(t) = y(t−7) scored with
    MAE/MAPE per priority — the baseline every forecasting system must
    beat, and the query that measures it. The 7-day lag arrives via a
    SELF EQUI-JOIN on the exact day key over the calendar-bounded daily
    table (same identity as agg_wow_growth — no window state), errors
    are exact int64 cent differences, and the two score divides happen
    once per output row."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("prio"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"))
    )
    b = daily.select(
        F.col("prio").alias("bprio"),
        F.col("day").alias("bday"),
        F.col("cents").alias("forecast"),
    )
    j = daily.join(
        b,
        (F.col("bprio") == F.col("prio"))
        & (F.col("bday") == F.date_sub("day", 7)),
    ).filter(F.col("cents") > 0)
    err = F.abs(F.col("cents") - F.col("forecast"))
    return (
        j.groupBy("prio")
        .agg(
            F.count("*").alias("n_days"),
            F.round(
                F.sum(err).cast("double")
                / (F.count("*").cast("double") * 100.0),
                2,
            ).alias("mae"),
            F.round(
                100.0
                * F.sum(err.cast("double") / F.col("cents").cast("double"))
                / F.count("*").cast("double"),
                4,
            ).alias("mape_pct"),
        )
        .orderBy("prio")
    )


@query(
    "agg_column_profile",
    oracle="""
    WITH m AS (
      SELECT count(*) AS n,
             count(*) - count(o_orderkey) AS nn_key,
             count(DISTINCT o_orderkey) AS nd_key,
             CAST(min(o_orderkey) AS VARCHAR) AS mn_key,
             CAST(max(o_orderkey) AS VARCHAR) AS mx_key,
             count(*) - count(o_orderstatus) AS nn_st,
             count(DISTINCT o_orderstatus) AS nd_st,
             min(o_orderstatus) AS mn_st, max(o_orderstatus) AS mx_st,
             count(*) - count(o_totalprice) AS nn_tp,
             count(DISTINCT o_totalprice) AS nd_tp,
             CAST(min(CAST(round(o_totalprice * 100) AS BIGINT)) AS VARCHAR)
               AS mn_tp,
             CAST(max(CAST(round(o_totalprice * 100) AS BIGINT)) AS VARCHAR)
               AS mx_tp,
             count(*) - count(o_orderdate) AS nn_dt,
             count(DISTINCT o_orderdate) AS nd_dt,
             strftime(min(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS mn_dt,
             strftime(max(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS mx_dt,
             count(*) - count(o_orderpriority) AS nn_pr,
             count(DISTINCT o_orderpriority) AS nd_pr,
             min(o_orderpriority) AS mn_pr, max(o_orderpriority) AS mx_pr
      FROM orders)
    SELECT 'o_orderkey' AS column_name, n AS n_rows,
           CAST(nn_key AS BIGINT) AS n_nulls,
           CAST(nd_key AS BIGINT) AS n_distinct, mn_key AS min_repr,
           mx_key AS max_repr FROM m
    UNION ALL SELECT 'o_orderstatus', n, CAST(nn_st AS BIGINT),
           CAST(nd_st AS BIGINT), mn_st, mx_st FROM m
    UNION ALL SELECT 'o_totalprice', n, CAST(nn_tp AS BIGINT),
           CAST(nd_tp AS BIGINT), mn_tp, mx_tp FROM m
    UNION ALL SELECT 'o_orderdate', n, CAST(nn_dt AS BIGINT),
           CAST(nd_dt AS BIGINT), mn_dt, mx_dt FROM m
    UNION ALL SELECT 'o_orderpriority', n, CAST(nn_pr AS BIGINT),
           CAST(nd_pr AS BIGINT), mn_pr, mx_pr FROM m
    ORDER BY column_name
    """,
)
def agg_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass data-quality column profile of the orders table — row
    count, null count, EXACT distinct count, and canonical min/max
    representations per column, the summary every intake dashboard
    shows. All 5 columns profile in a SINGLE aggregate pass (20 partial
    aggregates over one scan — not one scan per column), then a
    row-local stack() unpivots the wide row into the per-column report.
    Representations are canonicalized per type (ints/cents verbatim,
    dates ISO) so both engines render identical strings — raw double
    formatting is NOT portable and never appears."""
    o = load(spark, sf_dir, "orders")
    n = F.count("*")
    m = o.agg(
        n.alias("n"),
        (n - F.count("o_orderkey")).alias("nn_key"),
        F.countDistinct("o_orderkey").alias("nd_key"),
        F.min("o_orderkey").cast("string").alias("mn_key"),
        F.max("o_orderkey").cast("string").alias("mx_key"),
        (n - F.count("o_orderstatus")).alias("nn_st"),
        F.countDistinct("o_orderstatus").alias("nd_st"),
        F.min("o_orderstatus").alias("mn_st"),
        F.max("o_orderstatus").alias("mx_st"),
        (n - F.count("o_totalprice")).alias("nn_tp"),
        F.countDistinct("o_totalprice").alias("nd_tp"),
        F.min(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("string")
        .alias("mn_tp"),
        F.max(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("string")
        .alias("mx_tp"),
        (n - F.count("o_orderdate")).alias("nn_dt"),
        F.countDistinct("o_orderdate").alias("nd_dt"),
        F.date_format(F.min(F.col("o_orderdate").cast("date")), "yyyy-MM-dd")
        .alias("mn_dt"),
        F.date_format(F.max(F.col("o_orderdate").cast("date")), "yyyy-MM-dd")
        .alias("mx_dt"),
        (n - F.count("o_orderpriority")).alias("nn_pr"),
        F.countDistinct("o_orderpriority").alias("nd_pr"),
        F.min("o_orderpriority").alias("mn_pr"),
        F.max("o_orderpriority").alias("mx_pr"),
    )
    return (
        m.select(
            F.expr(
                "stack(5,"
                " 'o_orderkey', nn_key, nd_key, mn_key, mx_key,"
                " 'o_orderstatus', nn_st, nd_st, mn_st, mx_st,"
                " 'o_totalprice', nn_tp, nd_tp, mn_tp, mx_tp,"
                " 'o_orderdate', nn_dt, nd_dt, mn_dt, mx_dt,"
                " 'o_orderpriority', nn_pr, nd_pr, mn_pr, mx_pr)"
                " AS (column_name, n_nulls, n_distinct, min_repr, max_repr)"
            ),
            F.col("n").alias("n_rows"),
        )
        .select(
            "column_name",
            "n_rows",
            F.col("n_nulls").cast("long").alias("n_nulls"),
            F.col("n_distinct").cast("long").alias("n_distinct"),
            "min_repr",
            "max_repr",
        )
        .orderBy("column_name")
    )


@query(
    "agg_growth_accounting",
    oracle="""
    WITH du AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    lagd AS (
      SELECT user_id, day,
             lag(day) OVER (PARTITION BY user_id ORDER BY day) AS prev_day
      FROM du),
    staged AS (
      SELECT day,
             CASE WHEN prev_day IS NULL THEN 'new'
                  WHEN day - prev_day <= 7 THEN 'retained'
                  ELSE 'resurrected' END AS stage
      FROM lagd)
    SELECT strftime(day, '%Y-%m-%d') AS day, stage,
           count(*) AS n_users
    FROM staged GROUP BY day, stage
    ORDER BY day, stage
    """,
)
def agg_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: every active user-day classified as NEW
    (first ever), RETAINED (active within the last 7 days) or
    RESURRECTED (returning after a 7+ day gap) — the standard DAU
    decomposition every growth team reports. One distinct (user, day)
    pass — the only corpus-sized shuffle — then a user-keyed lag()
    window over each user's ACTIVE DAYS (≤ calendar days per user, far
    smaller than raw events) and a bounded (days × 3 stages) hash
    aggregate. Day arithmetic is exact integer days on both engines."""
    du = (
        load(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    staged = du.select(
        "day",
        F.when(F.lag("day").over(w).isNull(), "new")
        .when(F.datediff("day", F.lag("day").over(w)) <= 7, "retained")
        .otherwise("resurrected")
        .alias("stage"),
    )
    return (
        staged.groupBy("day", "stage")
        .agg(F.count("*").alias("n_users"))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "stage",
            "n_users",
        )
        .orderBy("day", "stage")
    )


@query(
    "agg_audience_overlap",
    oracle="""
    WITH tu AS (
      SELECT DISTINCT event_type, user_id FROM events),
    sz AS (SELECT event_type, count(*) AS n FROM tu GROUP BY event_type),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(*) AS both_users
      FROM tu a JOIN tu b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2)
    SELECT p.type_a, p.type_b,
           CAST(p.both_users AS BIGINT) AS both_users,
           round(CAST(p.both_users AS DOUBLE)
                 / CAST(sa.n + sb.n - p.both_users AS DOUBLE), 6) AS jaccard
    FROM pairs p
    JOIN sz sa ON sa.event_type = p.type_a
    JOIN sz sb ON sb.event_type = p.type_b
    ORDER BY type_a, type_b
    """,
)
def agg_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix: exact Jaccard between the user sets of
    every event-type pair — 'how much do clickers and purchasers
    overlap'. The pair generator is a self EQUI-JOIN ON user_id, so
    fan-out per user is bounded by |event types|² (a domain constant,
    ~25 pairs), never the corpus; set sizes re-aggregate from the same
    distinct (type, user) frame and join back on the bounded type key.
    |A∪B| comes from the inclusion–exclusion identity on exact
    integers — no union is ever materialized."""
    tu = (
        load(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .distinct()
    )
    sz = tu.groupBy("event_type").agg(F.count("*").alias("n"))
    a = tu.alias("a")
    b = tu.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("both_users"))
    )
    sa = sz.select(F.col("event_type").alias("type_a"), F.col("n").alias("na"))
    sb = sz.select(F.col("event_type").alias("type_b"), F.col("n").alias("nb"))
    return (
        pairs.join(sa, "type_a")
        .join(sb, "type_b")
        .select(
            "type_a",
            "type_b",
            F.col("both_users").cast("long").alias("both_users"),
            F.round(
                F.col("both_users").cast("double")
                / (F.col("na") + F.col("nb") - F.col("both_users")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


@query(
    "agg_control_chart",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             count(*) AS n,
             sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS errs
      FROM events GROUP BY CAST(ts AS DATE)),
    pbar AS (
      SELECT CAST(sum(errs) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS p
      FROM daily)
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           CAST(d.n AS BIGINT) AS n_events,
           round(CAST(d.errs AS DOUBLE) / CAST(d.n AS DOUBLE), 6) AS err_rate,
           round(pb.p + 3 * sqrt(pb.p * (1 - pb.p) / CAST(d.n AS DOUBLE)), 6)
             AS ucl,
           (CAST(d.errs AS DOUBLE) / CAST(d.n AS DOUBLE)
            > pb.p + 3 * sqrt(pb.p * (1 - pb.p) / CAST(d.n AS DOUBLE)))
             AS out_of_control
    FROM daily d CROSS JOIN pbar pb
    ORDER BY day
    """,
)
def agg_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p-chart (attribute control chart) of the daily error rate with
    3σ binomial control limits — the SPC alarm an operations review
    runs on failure metrics. Daily numerators/denominators are exact
    integer counts from ONE hash aggregate; the center line p̄ is a
    1-row aggregate over the calendar-bounded daily frame, broadcast
    back (the documented bounded crossJoin); the out-of-control flag
    compares the SAME double expressions on both engines (exact
    integer inputs → identical doubles → identical booleans)."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(F.col("event_type") == "error", 1).otherwise(0)
            ).alias("errs"),
        )
    )
    pbar = daily.agg(
        (F.sum("errs").cast("double") / F.sum("n").cast("double")).alias("p")
    )
    rate = F.col("errs").cast("double") / F.col("n").cast("double")
    ucl = F.col("p") + 3 * F.sqrt(
        F.col("p") * (1 - F.col("p")) / F.col("n").cast("double")
    )
    return (
        daily.crossJoin(F.broadcast(pbar))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("n").cast("long").alias("n_events"),
            F.round(rate, 6).alias("err_rate"),
            F.round(ucl, 6).alias("ucl"),
            (rate > ucl).alias("out_of_control"),
        )
        .orderBy("day")
    )


@query(
    "agg_srm_check",
    oracle="""
    WITH assigned AS (
      SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
                  THEN 'A' ELSE 'B' END AS arm
      FROM (SELECT DISTINCT user_id FROM events)),
    c AS (
      SELECT sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS na,
             count(*) AS n
      FROM assigned)
    SELECT CAST(na AS BIGINT) AS n_a,
           CAST(n - na AS BIGINT) AS n_b,
           round((CAST(na AS DOUBLE) - CAST(n AS DOUBLE) / 2)
                 / sqrt(CAST(n AS DOUBLE) / 4), 4) AS z_score,
           (abs(CAST(na AS DOUBLE) - CAST(n AS DOUBLE) / 2)
            > 3 * sqrt(CAST(n AS DOUBLE) / 4)) AS srm_flag
    FROM c
    """,
)
def agg_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-Ratio-Mismatch check for a hash-based 50/50 experiment
    split — the FIRST validity gate any A/B analysis runs (a biased
    assignment invalidates everything downstream). Assignment uses the
    same engine-portable md5-prefix rule as `text_split_assign`
    (reproducible, growth-stable, no random()); the binomial z-score
    against the exact 50% expectation comes from exact integer counts,
    and the 3σ flag compares the SAME double expression on both
    engines. One distinct pass + one 1-row aggregate."""
    users = load(spark, sf_dir, "events").select("user_id").distinct()
    arm = F.when(
        F.substring(
            F.md5(F.encode(F.col("user_id").cast("string"), "UTF-8")), 1, 1
        )
        < "8",
        "A",
    ).otherwise("B")
    c = users.select(arm.alias("arm")).agg(
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0)).alias("na"),
        F.count("*").alias("n"),
    )
    na = F.col("na").cast("double")
    n = F.col("n").cast("double")
    dev = na - n / 2
    sd = F.sqrt(n / 4)
    return c.select(
        F.col("na").cast("long").alias("n_a"),
        (F.col("n") - F.col("na")).cast("long").alias("n_b"),
        F.round(dev / sd, 4).alias("z_score"),
        (F.abs(dev) > 3 * sd).alias("srm_flag"),
    )


@query(
    "agg_string_agg",
    oracle="""
    WITH top5 AS (
      SELECT n.n_name, c.c_name, c.c_acctbal,
             row_number() OVER (PARTITION BY n.n_name
                                ORDER BY c.c_acctbal DESC, c.c_custkey)
               AS rn
      FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey)
    SELECT n_name,
           string_agg(c_name, ',' ORDER BY rn) AS top_customers,
           count(*) AS n_listed
    FROM top5 WHERE rn <= 5
    GROUP BY n_name ORDER BY n_name
    """,
)
def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG / string_agg (SQL:2016) — the ordered string
    concatenation every report footer needs, with the two disciplines
    that make it scale-sane and portable: the input is CUT to a bounded
    top-5 per group BEFORE aggregation (an unbounded listagg
    concatenates the whole corpus into one value — the classic OOM),
    and the ordering inside the aggregate is EXPLICIT (engines differ
    on default aggregation order). Spark spells it
    array_join(sort-collected structs); DuckDB spells it
    string_agg(... ORDER BY) — same contract."""
    w = Window.partitionBy("n_name").orderBy(
        F.desc("c_acctbal"), "c_custkey"
    )
    top5 = (
        load(spark, sf_dir, "customer")
        .join(
            load(spark, sf_dir, "nation"),
            F.col("n_nationkey") == F.col("c_nationkey"),
        )
        .select("n_name", "c_name", "c_acctbal", "c_custkey")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
    )
    return (
        top5.groupBy("n_name")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("rn", "c_name"))),
                    lambda s: s["c_name"],
                ),
                ",",
            ).alias("top_customers"),
            F.count("*").alias("n_listed"),
        )
        .orderBy("n_name")
    )


@query(
    "agg_ks_test",
    oracle="""
    WITH s AS (
      SELECT n_chars,
             CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS is_a
      FROM documents WHERE source IN ('src0', 'src1')),
    tot AS (
      SELECT sum(is_a) AS na, sum(1 - is_a) AS nb FROM s),
    v AS (
      SELECT n_chars,
             sum(is_a) AS ca, sum(1 - is_a) AS cb
      FROM s GROUP BY n_chars),
    c AS (
      SELECT n_chars,
             sum(ca) OVER (ORDER BY n_chars
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS cum_a,
             sum(cb) OVER (ORDER BY n_chars
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS cum_b
      FROM v),
    d AS (
      SELECT c.n_chars,
             abs(c.cum_a * t.nb - c.cum_b * t.na) AS d_scaled,
             t.na, t.nb
      FROM c CROSS JOIN tot t),
    mx AS (SELECT max(d_scaled) AS mx FROM d)
    SELECT CAST(min(d.n_chars) AS INT) AS ks_at_value,
           round(CAST(any_value(mx.mx) AS DOUBLE)
                 / (CAST(any_value(d.na) AS DOUBLE)
                    * CAST(any_value(d.nb) AS DOUBLE)), 6) AS ks_d,
           CAST(any_value(d.na) AS BIGINT) AS n_a,
           CAST(any_value(d.nb) AS BIGINT) AS n_b
    FROM d JOIN mx ON d.d_scaled = mx.mx
    """,
)
def agg_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift statistic between two
    sources' document-length distributions — the distribution-shift
    alarm run between corpus snapshots. EXACT end-to-end: the supremum
    of |ECDF_A − ECDF_B| is kept in the cross-multiplied integer form
    |cumA·N_B − cumB·N_A| (no per-step float divide can reorder the
    argmax), evaluated on the DISTINCT value domain (bounded by the
    length domain, not the corpus — same boundedness argument as the
    histogram family), with min-value tie-break; the single float
    divide reports D at the end. One corpus pass to per-value counts,
    then windows over the bounded value table."""
    s = (
        load(spark, sf_dir, "documents")
        .filter(F.col("source").isin("src0", "src1"))
        .select(
            "n_chars",
            F.when(F.col("source") == "src0", 1).otherwise(0).alias("is_a"),
        )
    )
    v = s.groupBy("n_chars").agg(
        F.sum("is_a").alias("ca"), F.sum(1 - F.col("is_a")).alias("cb")
    )
    tot = s.agg(
        F.sum("is_a").alias("na"), F.sum(1 - F.col("is_a")).alias("nb")
    )
    w = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0)
    c = v.select(
        "n_chars",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
    )
    # decimal(38,0) keeps the cross-multiplied form exact past the int64
    # wrap point (na*nb > 2^63 at ~3e9 rows/side); DuckDB already
    # promotes its window sums to HUGEINT, so this is the Spark-side
    # match at the 100 TB posture (ADVICE r4)
    dec = "decimal(38,0)"
    d = c.crossJoin(F.broadcast(tot)).select(
        "n_chars",
        F.abs(
            F.col("cum_a").cast(dec) * F.col("nb")
            - F.col("cum_b").cast(dec) * F.col("na")
        ).alias("d_scaled"),
        "na",
        "nb",
    )
    mx = d.agg(F.max("d_scaled").alias("mx"))
    return (
        d.join(F.broadcast(mx), F.col("d_scaled") == F.col("mx"))
        .agg(
            F.min("n_chars").cast("int").alias("ks_at_value"),
            F.round(
                F.any_value("mx").cast("double")
                / (
                    F.any_value("na").cast("double")
                    * F.any_value("nb").cast("double")
                ),
                6,
            ).alias("ks_d"),
            F.any_value("na").cast("long").alias("n_a"),
            F.any_value("nb").cast("long").alias("n_b"),
        )
    )


@query(
    "agg_cvar_tail",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders GROUP BY CAST(o_orderdate AS DATE)),
    q AS (SELECT quantile_cont(cents, 0.05) AS var5 FROM daily),
    tail AS (
      SELECT d.cents, q.var5 FROM daily d CROSS JOIN q
      WHERE CAST(d.cents AS DOUBLE) <= q.var5)
    SELECT count(*) AS n_tail_days,
           round(CAST(any_value(var5) AS DOUBLE) / 100.0, 2) AS var_5pct,
           round(CAST(sum(cents) AS DOUBLE)
                 / (CAST(count(*) AS DOUBLE) * 100.0), 2) AS cvar_5pct
    FROM tail
    """,
)
def agg_cvar_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-at-Risk and Conditional VaR (expected shortfall) of the
    daily revenue series: the 5th-percentile day and the MEAN of the
    days at or below it — the tail-risk number a finance review reads
    past the average. Daily totals are exact int64 cents; the VaR
    threshold is the exact interpolated percentile over the
    calendar-bounded daily frame (parity pinned by agg_percentiles),
    broadcast back as ONE row; the tail mean aggregates exact integers
    with one divide per output."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "cents"
            )
        )
    )
    q = daily.agg(F.expr("percentile(cents, 0.05)").alias("var5"))
    tail = daily.crossJoin(F.broadcast(q)).filter(
        F.col("cents").cast("double") <= F.col("var5")
    )
    return tail.agg(
        F.count("*").alias("n_tail_days"),
        F.round(F.any_value("var5").cast("double") / 100.0, 2).alias(
            "var_5pct"
        ),
        F.round(
            F.sum("cents").cast("double")
            / (F.count("*").cast("double") * 100.0),
            2,
        ).alias("cvar_5pct"),
    )


@query(
    "agg_spearman_corr",
    oracle="""
    WITH spend AS (
      SELECT c.c_custkey AS custkey,
             CAST(round(c.c_acctbal * 100) AS BIGINT) AS x,
             sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS y
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, round(c.c_acctbal * 100)),
    ranked AS (
      SELECT row_number() OVER (ORDER BY x, custkey) AS rx,
             row_number() OVER (ORDER BY y, custkey) AS ry
      FROM spend),
    n AS (SELECT count(*) AS n FROM spend)
    SELECT CAST(any_value(n.n) AS BIGINT) AS n_customers,
           round(1.0 - 6.0 * CAST(sum((rx - ry) * (rx - ry)) AS DOUBLE)
                 / (CAST(any_value(n.n) AS DOUBLE)
                    * (CAST(any_value(n.n) AS DOUBLE)
                       * CAST(any_value(n.n) AS DOUBLE) - 1.0)), 6)
             AS spearman_rho
    FROM ranked CROSS JOIN n
    """,
)
def agg_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between account balance and total
    spend — the monotone-association complement to `agg_corr`'s
    Pearson (robust to the heavy right tail both variables have). Ranks
    are deterministic row_numbers with a custkey tie-break (identical
    on both engines — the classical tie-correction is deliberately NOT
    applied; the tie-break IS the declared semantics), assigned by the
    engine's sampled range-bucketed rank so NO single-partition window
    touches the corpus-sized customer frame; Σd² sums exact integers
    and ρ evaluates in one closed-form expression."""
    from .ranking import with_global_rank

    spend = (
        load(spark, sf_dir, "customer")
        .join(
            load(spark, sf_dir, "orders"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.round(F.col("c_acctbal") * 100).cast("long").alias("x"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("y")
        )
        .localCheckpoint()
    )
    ranked = with_global_rank(
        spend, [("x", "asc"), ("custkey", "asc")], rank_col="rx"
    )
    ranked = with_global_rank(
        ranked, [("y", "asc"), ("custkey", "asc")], rank_col="ry"
    )
    n = spend.count()
    # Σd² in decimal(38,0): a single (rx-ry)² term approaches 2^63 at
    # ~3e9 rows and the running int64 sum silently wraps in non-ANSI
    # Spark, while DuckDB promotes to HUGEINT (ADVICE r4)
    d = (F.col("rx") - F.col("ry")).cast("decimal(38,0)")
    d2 = F.sum(d * (F.col("rx") - F.col("ry"))).cast("double")
    nn = float(n)
    return ranked.agg(
        F.lit(n).cast("long").alias("n_customers"),
        F.round(
            1.0 - 6.0 * d2 / (F.lit(nn) * (F.lit(nn) * F.lit(nn) - 1.0)), 6
        ).alias("spearman_rho"),
    )


@query(
    "agg_winsorized_stats",
    oracle="""
    WITH q AS (
      SELECT o_orderpriority AS prio,
             quantile_cont(o_totalprice, 0.05) AS p5,
             quantile_cont(o_totalprice, 0.95) AS p95
      FROM orders GROUP BY o_orderpriority),
    w AS (
      SELECT o.o_orderpriority AS prio,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS rc,
             o.o_totalprice AS rv, q.p5, q.p95
      FROM orders o JOIN q ON q.prio = o.o_orderpriority),
    g AS (
      SELECT prio, count(*) AS n, sum(rc) AS sum_rc,
             sum(CASE WHEN rv < p5 THEN 1 ELSE 0 END) AS nlo,
             sum(CASE WHEN rv > p95 THEN 1 ELSE 0 END) AS nhi,
             sum(CASE WHEN rv >= p5 AND rv <= p95 THEN rc ELSE 0 END)
               AS sin_c,
             any_value(p5) AS p5, any_value(p95) AS p95
      FROM w GROUP BY prio)
    SELECT prio, n,
           CAST((2 * sum_rc * 100 + n) // (2 * n) AS DOUBLE) / 10000.0
             AS raw_mean,
           round((CAST(sin_c AS DOUBLE) + nlo * p5 * 100 + nhi * p95 * 100)
                 / (CAST(n AS DOUBLE) * 100.0), 4) AS winsorized_mean,
           round(CAST((2 * sum_rc * 100 + n) // (2 * n) AS DOUBLE) / 10000.0
                 - round((CAST(sin_c AS DOUBLE)
                          + nlo * p5 * 100 + nhi * p95 * 100)
                         / (CAST(n AS DOUBLE) * 100.0), 4), 4)
             AS tail_influence
    FROM g ORDER BY prio
    """,
)
def agg_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    r"""Winsorized mean per priority — the robust-preprocessing step
    that clips each group's values into its own [p5, p95] band before
    averaging, reported against the raw mean so the tail influence is
    visible. The per-group clip thresholds are exact interpolated
    percentiles over each group (parity pinned by agg_percentiles),
    joined back on the BOUNDED priority key (AQE broadcasts the
    small threshold table). Int64-cents discipline (ADVICE r4): the
    raw mean is the exact half-up integer-division idiom; the
    winsorized mean sums interior rows as exact int64 cents and adds
    the two clipped tails as count x per-group-constant threshold, so
    the one double expression per group is partition-order independent
    and bit-identical in both engines — no float summation anywhere."""
    o = load(spark, sf_dir, "orders")
    q = o.groupBy(F.col("o_orderpriority").alias("prio")).agg(
        F.expr("percentile(o_totalprice, 0.05)").alias("p5"),
        F.expr("percentile(o_totalprice, 0.95)").alias("p95"),
    )
    rv = F.col("o_totalprice")
    w = o.join(
        F.broadcast(q), F.col("prio") == F.col("o_orderpriority")
    ).select(
        "prio",
        F.round(rv * 100).cast("long").alias("rc"),
        rv.alias("rv"),
        "p5",
        "p95",
    )
    g = w.groupBy("prio").agg(
        F.count("*").alias("n"),
        F.sum("rc").alias("sum_rc"),
        F.sum(F.when(F.col("rv") < F.col("p5"), 1).otherwise(0)).alias("nlo"),
        F.sum(F.when(F.col("rv") > F.col("p95"), 1).otherwise(0)).alias("nhi"),
        F.sum(
            F.when(
                (F.col("rv") >= F.col("p5")) & (F.col("rv") <= F.col("p95")),
                F.col("rc"),
            ).otherwise(0)
        ).alias("sin_c"),
        F.any_value("p5").alias("p5"),
        F.any_value("p95").alias("p95"),
    )
    raw_mean = (
        F.expr("CAST((2 * sum_rc * 100 + n) div (2 * n) AS DOUBLE)") / 10000.0
    )
    wins_mean = F.round(
        (
            F.col("sin_c").cast("double")
            + F.col("nlo") * F.col("p5") * 100
            + F.col("nhi") * F.col("p95") * 100
        )
        / (F.col("n").cast("double") * 100.0),
        4,
    )
    return g.select(
        "prio",
        "n",
        raw_mean.alias("raw_mean"),
        wins_mean.alias("winsorized_mean"),
        F.round(raw_mean - wins_mean, 4).alias("tail_influence"),
    ).orderBy("prio")


_MIGRATION_SPLIT = "1998-01-01"


@query(
    "agg_band_migration",
    oracle=f"""
    WITH halves AS (
      SELECT o_custkey AS custkey,
             CASE WHEN o_orderdate < TIMESTAMP '{_MIGRATION_SPLIT}'
                  THEN 'h1' ELSE 'h2' END AS half,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders GROUP BY 1, 2),
    banded AS (
      SELECT custkey, half,
             CASE WHEN cents < 20000000 THEN 'low'
                  WHEN cents < 60000000 THEN 'mid'
                  ELSE 'high' END AS band
      FROM halves),
    m AS (
      SELECT COALESCE(a.custkey, b.custkey) AS custkey,
             COALESCE(a.band, 'inactive') AS band_h1,
             COALESCE(b.band, 'inactive') AS band_h2
      FROM (SELECT * FROM banded WHERE half = 'h1') a
      FULL OUTER JOIN (SELECT * FROM banded WHERE half = 'h2') b
        ON b.custkey = a.custkey)
    SELECT band_h1, band_h2, count(*) AS n_customers
    FROM m GROUP BY band_h1, band_h2
    ORDER BY band_h1, band_h2
    """,
)
def agg_band_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer value-band MIGRATION MATRIX between the two halves of
    the timeline (who upgraded, who lapsed into 'inactive') — the
    period-over-period movement table behind every retention deck,
    entity-level where `agg_markov_transition` is event-level. Exact
    int64-cent half-totals band through FIXED thresholds (quantile
    banding would entangle the two periods), the halves re-join FULL
    OUTER on the customer key so appearing/disappearing customers land
    in the 'inactive' margin instead of vanishing, and the matrix
    output is bounded by (bands+1)² cells."""
    o = load(spark, sf_dir, "orders")
    halves = (
        o.groupBy(
            F.col("o_custkey").alias("custkey"),
            F.when(
                F.col("o_orderdate") < F.lit(_MIGRATION_SPLIT).cast("timestamp"),
                "h1",
            )
            .otherwise("h2")
            .alias("half"),
        )
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"))
    )
    band = (
        F.when(F.col("cents") < 20000000, "low")
        .when(F.col("cents") < 60000000, "mid")
        .otherwise("high")
    )
    banded = halves.select("custkey", "half", band.alias("band"))
    a = banded.filter(F.col("half") == "h1").select(
        F.col("custkey").alias("ck_a"), F.col("band").alias("band_a")
    )
    b = banded.filter(F.col("half") == "h2").select(
        F.col("custkey").alias("ck_b"), F.col("band").alias("band_b")
    )
    m = a.join(b, F.col("ck_a") == F.col("ck_b"), "full_outer").select(
        F.coalesce("band_a", F.lit("inactive")).alias("band_h1"),
        F.coalesce("band_b", F.lit("inactive")).alias("band_h2"),
    )
    return (
        m.groupBy("band_h1", "band_h2")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("band_h1", "band_h2")
    )


@query(
    "agg_revenue_waterfall",
    oracle="""
    WITH t AS (
      SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS gross,
             sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT))
               AS disc,
             sum(CAST(round(l_extendedprice * (1 - l_discount) * l_tax * 100)
                      AS BIGINT)) AS tax
      FROM lineitem)
    SELECT step, amount, running_total FROM (
      SELECT 1 AS ord, 'gross_revenue' AS step,
             round(CAST(gross AS DOUBLE) / 100.0, 2) AS amount,
             round(CAST(gross AS DOUBLE) / 100.0, 2) AS running_total
      FROM t
      UNION ALL
      SELECT 2, 'discounts',
             round(CAST(-disc AS DOUBLE) / 100.0, 2),
             round(CAST(gross - disc AS DOUBLE) / 100.0, 2)
      FROM t
      UNION ALL
      SELECT 3, 'tax_collected',
             round(CAST(tax AS DOUBLE) / 100.0, 2),
             round(CAST(gross - disc + tax AS DOUBLE) / 100.0, 2)
      FROM t) s
    ORDER BY ord
    """,
)
def agg_revenue_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue waterfall: gross → −discounts → +tax with running
    totals — the finance bridge chart as a table. Each component is
    rounded to int64 cents AT THE LINE LEVEL before summation (the
    invoicing convention — summing raw products then rounding once
    would differ by accumulated sub-cent drift and is also
    order-dependent), so one corpus aggregate yields three exact
    integers and the waterfall rows are pure arithmetic re-projections
    of that single row."""
    t = load(spark, sf_dir, "lineitem").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
            "gross"
        ),
        F.sum(
            F.round(F.col("l_extendedprice") * F.col("l_discount") * 100).cast(
                "long"
            )
        ).alias("disc"),
        F.sum(
            F.round(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * F.col("l_tax")
                * 100
            ).cast("long")
        ).alias("tax"),
    )
    d = F.col("amount_cents").cast("double") / 100.0
    rt = F.col("running_cents").cast("double") / 100.0
    return (
        t.select(
            F.expr(
                "stack(3,"
                " 1, 'gross_revenue', gross, gross,"
                " 2, 'discounts', -disc, gross - disc,"
                " 3, 'tax_collected', tax, gross - disc + tax)"
                " AS (ord, step, amount_cents, running_cents)"
            )
        )
        .select(
            "step",
            F.round(d, 2).alias("amount"),
            F.round(rt, 2).alias("running_total"),
            "ord",
        )
        .orderBy("ord")
        .drop("ord")
    )


@query(
    "agg_dispersion_index",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
      FROM events GROUP BY event_type, CAST(ts AS DATE)),
    s AS (
      SELECT event_type,
             count(*) AS n_days,
             CAST(sum(n) AS BIGINT) AS total,
             CAST(sum(n * n) AS BIGINT) AS total_sq
      FROM daily GROUP BY event_type)
    SELECT event_type, n_days, total,
           round((CAST(n_days AS DOUBLE) * CAST(total_sq AS DOUBLE)
                  - CAST(total AS DOUBLE) * CAST(total AS DOUBLE))
                 / (CAST(n_days AS DOUBLE) * CAST(total AS DOUBLE)), 6)
             AS dispersion_index
    FROM s ORDER BY event_type
    """,
)
def agg_dispersion_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index of dispersion (variance-to-mean ratio) of daily event
    counts per type — the Poisson-ness probe: ≈1 means memoryless
    arrivals, ≫1 means bursty/contagious traffic (bot waves,
    incident retries). The population-variance/mean ratio is evaluated
    in the cross-multiplied form (n·Σx² − (Σx)²)/(n·Σx) over EXACT
    integer daily counts — one corpus hash aggregate, one bounded
    re-aggregate, one divide per output row."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("n"))
    )
    s = daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.sum("n").cast("long").alias("total"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("total_sq"),
    )
    nd = F.col("n_days").cast("double")
    t = F.col("total").cast("double")
    tq = F.col("total_sq").cast("double")
    return s.select(
        "event_type",
        "n_days",
        "total",
        F.round((nd * tq - t * t) / (nd * t), 6).alias("dispersion_index"),
    ).orderBy("event_type")


@query(
    "agg_price_index",
    oracle="""
    WITH pq AS (
      SELECT l_partkey,
             CASE WHEN l_shipdate < TIMESTAMP '1998-01-01'
                  THEN 'base' ELSE 'cur' END AS period,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents,
             sum(CAST(round(l_quantity) AS BIGINT)) AS qty
      FROM lineitem GROUP BY 1, 2),
    j AS (
      SELECT b.l_partkey, b.cents AS base_cents, b.qty AS base_qty,
             c.cents AS cur_cents, c.qty AS cur_qty
      FROM (SELECT * FROM pq WHERE period = 'base') b
      JOIN (SELECT * FROM pq WHERE period = 'cur') c
        ON c.l_partkey = b.l_partkey
      WHERE b.qty > 0 AND c.qty > 0)
    SELECT count(*) AS n_parts,
           round(sum(CAST(cur_cents AS DOUBLE) / CAST(cur_qty AS DOUBLE)
                     * CAST(base_qty AS DOUBLE))
                 / sum(CAST(base_cents AS DOUBLE)), 6) AS laspeyres_index
    FROM j
    """,
)
def agg_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres price index: current unit prices weighted by
    BASE-period quantities, over parts shipped in both halves of the
    timeline — the inflation-style 'are the same goods getting more
    expensive' number, immune to mix shift by construction. Per-part
    cents/quantities are exact int64 aggregates; the index is
    Σ(p̄_cur·q_base)/Σ(p̄_base·q_base) where p̄_base·q_base collapses
    to the exact base cents — the numerator's per-part unit-price
    doubles derive from exact integers, summed over a bounded
    catalog-sized frame with the repo rounding discipline. One
    equi-join on the part key."""
    pq = (
        load(spark, sf_dir, "lineitem")
        .groupBy(
            "l_partkey",
            F.when(
                F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"),
                "base",
            )
            .otherwise("cur")
            .alias("period"),
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "cents"
            ),
            F.sum(F.round("l_quantity").cast("long")).alias("qty"),
        )
    )
    b = pq.filter((F.col("period") == "base") & (F.col("qty") > 0)).select(
        "l_partkey",
        F.col("cents").alias("base_cents"),
        F.col("qty").alias("base_qty"),
    )
    c = pq.filter((F.col("period") == "cur") & (F.col("qty") > 0)).select(
        "l_partkey",
        F.col("cents").alias("cur_cents"),
        F.col("qty").alias("cur_qty"),
    )
    j = b.join(c, "l_partkey")
    num = F.sum(
        F.col("cur_cents").cast("double")
        / F.col("cur_qty").cast("double")
        * F.col("base_qty").cast("double")
    )
    den = F.sum(F.col("base_cents").cast("double"))
    return j.agg(
        F.count("*").alias("n_parts"),
        F.round(num / den, 6).alias("laspeyres_index"),
    )


@query(
    "agg_freshness_lag",
    oracle="""
    WITH t AS (
      SELECT event_type, max(epoch_us(ts)) AS type_max
      FROM events GROUP BY event_type),
    g AS (SELECT max(type_max) AS corpus_max FROM t)
    SELECT t.event_type,
           strftime(make_timestamp(t.type_max), '%Y-%m-%d %H:%M:%S')
             AS last_seen,
           CAST((g.corpus_max - t.type_max) // 60000000 AS BIGINT)
             AS lag_minutes,
           ((g.corpus_max - t.type_max) > CAST(3600000000 AS BIGINT))
             AS stale_alert
    FROM t CROSS JOIN g
    ORDER BY event_type
    """,
)
def agg_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-freshness monitor: how far each event stream's latest
    record trails the newest record in the corpus (the pipeline-health
    panel that catches a stalled producer before dashboards silently
    flatline). Anchored to the CORPUS max — never wall-clock now(),
    which would make the answer nondeterministic and untestable; lag is
    exact integer microseconds floored to minutes, the >1 h alert
    compares exact integers, and the whole thing is one bounded
    aggregate + a 1-row broadcast."""
    t = (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.max(F.unix_micros("ts")).alias("type_max"))
    )
    g = t.agg(F.max("type_max").alias("corpus_max"))
    lag_us = F.col("corpus_max") - F.col("type_max")
    return (
        t.crossJoin(F.broadcast(g))
        .select(
            "event_type",
            F.date_format(
                F.timestamp_micros(F.col("type_max")), "yyyy-MM-dd HH:mm:ss"
            ).alias("last_seen"),
            F.expr(
                "CAST((corpus_max - type_max) div 60000000 AS BIGINT)"
            ).alias("lag_minutes"),
            (lag_us > 60 * 60000000).alias("stale_alert"),
        )
        .orderBy("event_type")
    )


@query(
    "agg_repeat_curve",
    oracle="""
    WITH per AS (
      SELECT o_custkey, count(*) AS n_orders
      FROM orders GROUP BY o_custkey),
    n AS (SELECT count(*) AS n_cust FROM per),
    grid AS (SELECT unnest(range(1, 11)) AS k)
    SELECT CAST(g.k AS INT) AS k,
           CAST(sum(CASE WHEN p.n_orders >= g.k THEN 1 ELSE 0 END)
                AS BIGINT) AS n_reaching,
           round(CAST(sum(CASE WHEN p.n_orders >= g.k THEN 1 ELSE 0 END)
                      AS DOUBLE) / CAST(any_value(n.n_cust) AS DOUBLE), 6)
             AS share
    FROM per p CROSS JOIN grid g CROSS JOIN n
    GROUP BY g.k ORDER BY k
    """,
)
def agg_repeat_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase curve: the share of customers reaching at least
    k orders, k = 1..10 — the DEPTH complement to `agg_gap_survival`'s
    time-based curve, and the number behind 'what fraction ever comes
    back'. One hash aggregate to per-customer order counts, a CONSTANT
    10-row grid fan-out (explode, bounded at any corpus size), and a
    10-row output of exact integer ratios."""
    per = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    n_cust = per.count()
    grid = F.array(*[F.lit(k) for k in range(1, 11)])
    return (
        per.select(
            "n_orders", F.explode(grid).alias("k")
        )
        .groupBy("k")
        .agg(
            F.sum(
                F.when(F.col("n_orders") >= F.col("k"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_reaching")
        )
        .select(
            F.col("k").cast("int").alias("k"),
            "n_reaching",
            F.round(
                F.col("n_reaching").cast("double") / F.lit(float(n_cust)), 6
            ).alias("share"),
        )
        .orderBy("k")
    )


_CUPED_SPLIT = "2024-01-16"


@query(
    "agg_cuped_adjusted",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             sum(CASE WHEN ts < TIMESTAMP '{_CUPED_SPLIT}'
                      THEN CAST(round(value * 100) AS BIGINT)
                      ELSE 0 END) AS x,
             sum(CASE WHEN ts >= TIMESTAMP '{_CUPED_SPLIT}'
                      THEN CAST(round(value * 100) AS BIGINT)
                      ELSE 0 END) AS y,
             max(CASE WHEN ts >= TIMESTAMP '{_CUPED_SPLIT}'
                      THEN 1 ELSE 0 END) AS has_post
      FROM events GROUP BY user_id),
    pop AS (
      SELECT user_id % 2 AS arm, x, y FROM per_user WHERE has_post = 1),
    arm_m AS (
      SELECT arm, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
      FROM pop GROUP BY arm),
    pool AS (
      SELECT sum(n) AS pn, sum(sx) AS psx, sum(sy) AS psy,
             sum(sxy) AS psxy, sum(sxx) AS psxx
      FROM arm_m),
    th AS (
      SELECT (CAST(pn AS DOUBLE) * CAST(psxy AS DOUBLE)
              - CAST(psx AS DOUBLE) * CAST(psy AS DOUBLE))
             / nullif(CAST(pn AS DOUBLE) * CAST(psxx AS DOUBLE)
                      - CAST(psx AS DOUBLE) * CAST(psx AS DOUBLE), 0.0)
               AS theta,
             CAST(psx AS DOUBLE) / CAST(pn AS DOUBLE) AS mx
      FROM pool)
    SELECT CAST(a.arm AS BIGINT) AS arm,
           CAST(a.n AS BIGINT) AS n_users,
           CAST((2 * a.sy * 100 + a.n) // (2 * a.n) AS DOUBLE) / 10000.0
             AS mean_y,
           round((CAST(a.sy AS DOUBLE) / CAST(a.n AS DOUBLE)
                  - t.theta * (CAST(a.sx AS DOUBLE) / CAST(a.n AS DOUBLE)
                               - t.mx)) / 100.0, 4) AS mean_adj,
           round(1.0 - ((CAST(a.n AS DOUBLE) * CAST(a.syy AS DOUBLE)
                         - CAST(a.sy AS DOUBLE) * CAST(a.sy AS DOUBLE))
                        - 2.0 * t.theta
                          * (CAST(a.n AS DOUBLE) * CAST(a.sxy AS DOUBLE)
                             - CAST(a.sx AS DOUBLE) * CAST(a.sy AS DOUBLE))
                        + t.theta * t.theta
                          * (CAST(a.n AS DOUBLE) * CAST(a.sxx AS DOUBLE)
                             - CAST(a.sx AS DOUBLE) * CAST(a.sx AS DOUBLE)))
                 / nullif(CAST(a.n AS DOUBLE) * CAST(a.syy AS DOUBLE)
                          - CAST(a.sy AS DOUBLE) * CAST(a.sy AS DOUBLE),
                          0.0), 6) AS var_reduction,
           round(t.theta, 6) AS theta
    FROM arm_m a CROSS JOIN th t
    ORDER BY arm
    """,
)
def agg_cuped_adjusted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng et al. 2013, "Improving the
    Sensitivity of Online Controlled Experiments") — the A/B-testing
    canon piece that `agg_welch_ttest` + `agg_srm_check` lead into:
    adjust each user's experiment-period metric y by their PRE-period
    covariate x (adjusted = y − θ(x − x̄), θ = cov(x,y)/var(x) pooled),
    reporting per deterministic arm (user_id % 2) the raw mean, the
    CUPED-adjusted mean, and the variance-reduction ratio — how much
    narrower the confidence interval gets for free.

    Float-parity discipline: x and y are exact int64 cents; all five
    moments (Σx Σy Σxy Σx² Σy²) are exact integer sums per arm (one hash
    agg over the user table), so θ, the means, and var(adj) — expanded
    ALGEBRAICALLY as var(y) − 2θcov + θ²var(x), never a float sum over
    per-user adjusted values — evaluate as identical double expressions
    over exact integers in both engines; zero-variance denominators are
    nullif-guarded. Scale: one user-keyed shuffle to per-user (x, y), a
    2-row arm-moment table, a 1-row pooled θ broadcast — nothing
    corpus-proportional past the first aggregation."""
    cents = F.round(F.col("value") * 100).cast("long")
    pre = F.col("ts") < F.lit(_CUPED_SPLIT).cast("timestamp")
    per_user = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(F.when(pre, cents).otherwise(0)).alias("x"),
            F.sum(F.when(~pre, cents).otherwise(0)).alias("y"),
            F.max(F.when(~pre, 1).otherwise(0)).alias("has_post"),
        )
    )
    pop = per_user.filter(F.col("has_post") == 1).select(
        (F.col("user_id") % 2).alias("arm"), "x", "y"
    )
    arm_m = pop.groupBy("arm").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    pool = arm_m.agg(
        F.sum("n").alias("pn"),
        F.sum("sx").alias("psx"),
        F.sum("sy").alias("psy"),
        F.sum("sxy").alias("psxy"),
        F.sum("sxx").alias("psxx"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    th = pool.select(
        (
            (d("pn") * d("psxy") - d("psx") * d("psy"))
            / F.nullif(d("pn") * d("psxx") - d("psx") * d("psx"), F.lit(0.0))
        ).alias("theta"),
        (d("psx") / d("pn")).alias("mx"),
    )
    ny_var = d("n") * d("syy") - d("sy") * d("sy")
    nxy_cov = d("n") * d("sxy") - d("sx") * d("sy")
    nx_var = d("n") * d("sxx") - d("sx") * d("sx")
    t = F.col("theta")
    return (
        arm_m.crossJoin(F.broadcast(th))
        .select(
            F.col("arm").cast("long").alias("arm"),
            F.col("n").cast("long").alias("n_users"),
            (
                F.expr("CAST((2 * sy * 100 + n) div (2 * n) AS DOUBLE)")
                / 10000.0
            ).alias("mean_y"),
            F.round(
                (d("sy") / d("n") - t * (d("sx") / d("n") - F.col("mx")))
                / 100.0,
                4,
            ).alias("mean_adj"),
            F.round(
                1.0
                - (ny_var - 2.0 * t * nxy_cov + t * t * nx_var)
                / F.nullif(ny_var, F.lit(0.0)),
                6,
            ).alias("var_reduction"),
            F.round(t, 6).alias("theta"),
        )
        .orderBy("arm")
    )


_US_PER_DAY = 86_400_000_000


@query(
    "agg_kaplan_meier",
    oracle=f"""
    WITH su AS (
      SELECT user_id, min(ts) AS su FROM events
      WHERE event_type = 'signup' GROUP BY user_id),
    pu AS (
      SELECT e.user_id, min(e.ts) AS pu
      FROM events e JOIN su ON su.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > su.su
      GROUP BY e.user_id),
    mx AS (SELECT max(ts) AS mx FROM events),
    subj AS (
      SELECT s.user_id,
             CASE WHEN p.pu IS NOT NULL
                  THEN (epoch_us(p.pu) - epoch_us(s.su)) // {_US_PER_DAY}
                  ELSE (epoch_us(mx.mx) - epoch_us(s.su)) // {_US_PER_DAY}
             END AS dur,
             (p.pu IS NOT NULL) AS ev
      FROM su s LEFT JOIN pu p ON p.user_id = s.user_id CROSS JOIN mx),
    tot AS (SELECT count(*) AS n FROM subj),
    hist AS (
      SELECT dur, sum(CASE WHEN ev THEN 1 ELSE 0 END) AS d,
             count(*) AS ends
      FROM subj GROUP BY dur),
    r AS (
      SELECT dur, d,
             t.n - coalesce(sum(ends) OVER (ORDER BY dur
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS n_risk
      FROM hist CROSS JOIN tot t),
    q AS (
      SELECT dur, d, n_risk,
             sum(CASE WHEN d < n_risk
                      THEN CAST(round(ln(CAST(n_risk - d AS DOUBLE)
                                        / CAST(n_risk AS DOUBLE)) * 1e6)
                                AS BIGINT)
                      ELSE 0 END)
               OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS cum_q,
             max(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
               OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS zeroed
      FROM r)
    SELECT CAST(dur AS INT) AS t_days,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS n_events,
           CASE WHEN zeroed = 1 THEN 0.0
                ELSE round(exp(CAST(cum_q AS DOUBLE) / 1e6), 6) END
             AS survival
    FROM q WHERE d > 0 ORDER BY t_days
    """,
)
def agg_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve for time-to-first-purchase after
    signup, right-censored at the corpus horizon — THE estimator for
    "how long until users convert" when many never do (dropping
    censored users biases the curve optimistic; `agg_gap_survival` is
    the uncensored gap variant). Each user contributes duration = days
    from first signup to first SUBSEQUENT purchase (event) or to the
    max timestamp (censored); S(t) = Π over event days ≤ t of
    (1 − d/n_risk).

    Determinism discipline: every KM factor is ln((r−d)/r) of EXACT
    integer risk/death counts, quantized to int64 µnats, summed by an
    ordered window over the BOUNDED day domain, and exponentiated once
    per output row — no float product chain whose association order
    could differ. Scale: two user-keyed aggregations, a 1-row horizon
    broadcast, and windows over ≤|days| rows."""
    ev = load(spark, sf_dir, "events")
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("su"))
    )
    pu = (
        ev.filter(F.col("event_type") == "purchase")
        .join(su, "user_id")
        .filter(F.col("ts") > F.col("su"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pu"))
    )
    mx = ev.agg(F.max("ts").alias("mx"))
    dur_ev = F.expr(
        f"(unix_micros(pu) - unix_micros(su)) div {_US_PER_DAY}"
    )
    dur_cn = F.expr(
        f"(unix_micros(mx) - unix_micros(su)) div {_US_PER_DAY}"
    )
    subj = (
        su.join(pu, "user_id", "left")
        .crossJoin(F.broadcast(mx))
        .select(
            F.when(F.col("pu").isNotNull(), dur_ev)
            .otherwise(dur_cn)
            .alias("dur"),
            F.col("pu").isNotNull().alias("ev"),
        )
        .localCheckpoint()  # subj feeds both the histogram and the total
    )
    tot = subj.agg(F.count("*").alias("n"))
    hist = subj.groupBy("dur").agg(
        F.sum(F.when(F.col("ev"), 1).otherwise(0)).alias("d"),
        F.count("*").alias("ends"),
    )
    w_prev = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, -1
    )
    r = hist.crossJoin(F.broadcast(tot)).select(
        "dur",
        "d",
        (
            F.col("n")
            - F.coalesce(F.sum("ends").over(w_prev), F.lit(0))
        ).alias("n_risk"),
    )
    # the final event day can empty the risk set (d == n_risk): the KM
    # factor is exactly 0 there, so ln() is guarded and a cumulative
    # flag pins survival to 0.0 from that day on (both engines)
    w_cum = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    q = r.select(
        "dur",
        "d",
        "n_risk",
        F.sum(
            F.when(
                F.col("d") < F.col("n_risk"),
                F.round(
                    F.log(
                        (F.col("n_risk") - F.col("d")).cast("double")
                        / F.col("n_risk").cast("double")
                    )
                    * 1e6
                ).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
        )
        .over(w_cum)
        .alias("cum_q"),
        F.max(
            F.when(F.col("d") == F.col("n_risk"), 1).otherwise(0)
        )
        .over(w_cum)
        .alias("zeroed"),
    )
    return (
        q.filter(F.col("d") > 0)
        .select(
            F.col("dur").cast("int").alias("t_days"),
            F.col("n_risk").cast("long").alias("n_risk"),
            F.col("d").cast("long").alias("n_events"),
            F.when(F.col("zeroed") == 1, F.lit(0.0))
            .otherwise(
                F.round(F.exp(F.col("cum_q").cast("double") / 1e6), 6)
            )
            .alias("survival"),
        )
        .orderBy("t_days")
    )


@query(
    "agg_diff_in_diff",
    oracle=f"""
    WITH cells AS (
      SELECT user_id % 2 AS arm,
             CASE WHEN ts >= TIMESTAMP '{_CUPED_SPLIT}' THEN 1 ELSE 0 END
               AS post,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events),
    m AS (
      SELECT arm, post, count(*) AS n, sum(cents) AS s,
             CAST((2 * sum(cents) * 100 + count(*))
                  // (2 * count(*)) AS DOUBLE) / 10000.0 AS mean_v
      FROM cells GROUP BY arm, post)
    SELECT CAST(any_value(CASE WHEN arm = 0 AND post = 0 THEN n END)
                + any_value(CASE WHEN arm = 0 AND post = 1 THEN n END)
                + any_value(CASE WHEN arm = 1 AND post = 0 THEN n END)
                + any_value(CASE WHEN arm = 1 AND post = 1 THEN n END)
                AS BIGINT) AS n_events,
           any_value(CASE WHEN arm = 0 AND post = 0 THEN mean_v END)
             AS ctrl_pre,
           any_value(CASE WHEN arm = 0 AND post = 1 THEN mean_v END)
             AS ctrl_post,
           any_value(CASE WHEN arm = 1 AND post = 0 THEN mean_v END)
             AS treat_pre,
           any_value(CASE WHEN arm = 1 AND post = 1 THEN mean_v END)
             AS treat_post,
           round((any_value(CASE WHEN arm = 1 AND post = 1 THEN mean_v END)
                  - any_value(CASE WHEN arm = 1 AND post = 0 THEN mean_v END))
                 - (any_value(CASE WHEN arm = 0 AND post = 1 THEN mean_v END)
                    - any_value(CASE WHEN arm = 0 AND post = 0 THEN mean_v END)),
                 4) AS did_estimate
    FROM m
    """,
)
def agg_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimator: (treatment post − pre) minus
    (control post − pre) over mean event value, with the same
    deterministic arm split and period boundary as `agg_cuped_adjusted`
    — the quasi-experimental workhorse when randomization happened at a
    time boundary rather than per request. The four cell means are
    exact half-up integer divisions on the 10⁻⁴-dollar grid, so the DiD
    estimate is one subtraction of exact grid values — nothing float
    accumulates. One conditional hash agg over events; the output is a
    single row."""
    post = (
        F.col("ts") >= F.lit(_CUPED_SPLIT).cast("timestamp")
    ).cast("int")
    cells = load(spark, sf_dir, "events").select(
        (F.col("user_id") % 2).alias("arm"),
        post.alias("post"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    m = cells.groupBy("arm", "post").agg(
        F.count("*").alias("n"),
        F.expr(
            "CAST((2 * sum(cents) * 100 + count(*))"
            " div (2 * count(*)) AS DOUBLE) / 10000.0"
        ).alias("mean_v"),
    )

    def cell(a, p, col):
        # max over the single matching cell — any_value would need
        # ignorenulls to skip the three non-matching NULLs
        return F.max(
            F.when((F.col("arm") == a) & (F.col("post") == p), F.col(col))
        )

    return m.agg(
        (
            cell(0, 0, "n") + cell(0, 1, "n") + cell(1, 0, "n")
            + cell(1, 1, "n")
        )
        .cast("long")
        .alias("n_events"),
        cell(0, 0, "mean_v").alias("ctrl_pre"),
        cell(0, 1, "mean_v").alias("ctrl_post"),
        cell(1, 0, "mean_v").alias("treat_pre"),
        cell(1, 1, "mean_v").alias("treat_post"),
        F.round(
            (cell(1, 1, "mean_v") - cell(1, 0, "mean_v"))
            - (cell(0, 1, "mean_v") - cell(0, 0, "mean_v")),
            4,
        ).alias("did_estimate"),
    )


# two-sided α=0.05, power 80%: (z_{0.975} + z_{0.8})² — fixed literals in
# both engines so the only data-dependent inputs are the exact moments
_POWER_Z_SUM_SQ = (1.959963984540054 + 0.8416212335729143) ** 2


@query(
    "agg_power_analysis",
    oracle=f"""
    WITH c AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'),
    m AS (
      SELECT count(*) AS n, sum(cents) AS s,
             sum(cents * cents) AS ss
      FROM c)
    SELECT CAST(n AS BIGINT) AS n_obs,
           CAST((2 * s * 100 + n) // (2 * n) AS DOUBLE) / 10000.0
             AS mean_value,
           round(sqrt((CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
                       - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                      / (CAST(n AS DOUBLE)
                         * (CAST(n AS DOUBLE) - 1.0))) / 100.0, 4)
             AS sd_value,
           CAST(ceil(2.0 * {_POWER_Z_SUM_SQ}
                     * ((CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
                         - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                        / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
                     / ((0.01 * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
                        * (0.01 * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))))
                AS BIGINT) AS n_per_arm_mde1pct,
           CAST(ceil(2.0 * {_POWER_Z_SUM_SQ}
                     * ((CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
                         - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                        / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
                     / ((0.05 * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
                        * (0.05 * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))))
                AS BIGINT) AS n_per_arm_mde5pct
    FROM m
    """,
)
def agg_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment POWER analysis from observed variance: the sample size
    per arm needed to detect a 1% (and 5%) relative lift in mean
    purchase value at two-sided α = 0.05 with 80% power —
    n = 2σ²(z₀.₉₇₅ + z₀.₈)²/δ², the planning number every A/B review
    asks for before `agg_welch_ttest` ever runs. The z constants are
    engine literals; mean and variance come from exact int64-cent
    moments (n, Σx, Σx²) in ONE hash-agg pass, so both engines evaluate
    the identical closed-form double and ceil() to the same integer.
    Completes the experimentation family: SRM gate → power plan → CUPED
    → Welch test → DiD."""
    c = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(F.round(F.col("value") * 100).cast("long").alias("cents"))
    )
    m = c.agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).alias("ss"),
    )
    d = lambda col: F.col(col).cast("double")  # noqa: E731
    var_c = (d("n") * d("ss") - d("s") * d("s")) / (d("n") * (d("n") - 1.0))
    mean_c = d("s") / d("n")

    def n_req(mde):
        return F.ceil(
            2.0 * _POWER_Z_SUM_SQ * var_c / ((mde * mean_c) * (mde * mean_c))
        ).cast("long")

    return m.select(
        F.col("n").cast("long").alias("n_obs"),
        (
            F.expr("CAST((2 * s * 100 + n) div (2 * n) AS DOUBLE)") / 10000.0
        ).alias("mean_value"),
        F.round(F.sqrt(var_c) / 100.0, 4).alias("sd_value"),
        n_req(0.01).alias("n_per_arm_mde1pct"),
        n_req(0.05).alias("n_per_arm_mde5pct"),
    )


_TW_HOURS = 6
_TW_US = _TW_HOURS * 3600 * 1000000


@query(
    "agg_time_window_buckets",
    oracle=f"""
    SELECT time_bucket(INTERVAL {_TW_HOURS} HOUR, ts) AS window_start,
           time_bucket(INTERVAL {_TW_HOURS} HOUR, ts)
             + INTERVAL {_TW_HOURS} HOUR AS window_end,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM events
    GROUP BY 1, 2 ORDER BY window_start
    """,
)
def agg_time_window_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch tumbling-time-window aggregation via Spark's `window()`
    FUNCTION — the same epoch-aligned bucketing primitive the streaming
    keys use (`stream_tumbling_counts`), exercised on the batch path:
    group events into 6-hour windows, emit (start, end,
    count, exact cents). One hash aggregate; the window struct is
    computed row-local in codegen, so this is exactly a groupBy on
    floor(epoch/width) with calendar-typed bounds. The oracle's
    `time_bucket` is epoch-aligned the same way; money follows the
    int64-cents discipline."""
    w = F.window("ts", f"{_TW_HOURS} hours")
    return (
        load(spark, sf_dir, "events")
        .groupBy(w.alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "cents",
        )
        .orderBy("window_start")
    )


_BM25_TERMS = ("scan", "hash", "data")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPN = 20


@query(
    "text_bm25_topk",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
      FROM documents),
    dlen AS (SELECT doc_id, count(*) AS len FROM tok GROUP BY doc_id),
    stats AS (
      SELECT count(*) AS n, sum(len) AS total_len FROM dlen),
    tf AS (
      SELECT doc_id, t, count(*) AS tf FROM tok
      WHERE t IN ({", ".join(f"'{t}'" for t in _BM25_TERMS)})
      GROUP BY doc_id, t),
    df AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
    scored AS (
      SELECT tf.doc_id,
             CAST(round(
               ln((s.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * (tf.tf * ({_BM25_K1} + 1.0))
               / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                  + {_BM25_B} * dl.len
                    / (CAST(s.total_len AS DOUBLE) / s.n)))
               * 1e6) AS BIGINT) AS q
      FROM tf
      JOIN df ON df.t = tf.t
      JOIN dlen dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats s),
    agg_ AS (
      SELECT doc_id, sum(q) AS score_u FROM scored GROUP BY doc_id)
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           round(CAST(score_u AS DOUBLE) / 1e6, 6) AS bm25
    FROM agg_
    ORDER BY score_u DESC, doc_id LIMIT {_BM25_TOPN}
    """,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval (Robertson–Spärck Jones probabilistic IR
    canon; k1=1.2, b=0.75): top-20 documents for
    a fixed conjunctive query, the relevance scoring `text_tfidf`'s
    weights feed in every search stack. Per-(doc, term) scores are
    closed-form doubles over EXACT integers (tf, df, N, doc length,
    total length) and QUANTIZE to int64 µ-units before the per-doc sum
    — so the cross-term addition is an exact integer in any partition
    order, and the ranking (with doc_id tie-break) cannot flip across
    engines. Scale: tf/df are token-keyed hash aggs pre-filtered to
    the query terms (the corpus-wide inverted index never materializes
    for a |q|-term query), corpus stats ride a 1-row broadcast, and
    the top-N is a TakeOrdered."""
    tok = load(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("t")
    )
    dlen = tok.groupBy("doc_id").agg(F.count("*").alias("len"))
    stats = dlen.agg(
        F.count("*").alias("n"), F.sum("len").alias("total_len")
    )
    tf = (
        tok.filter(F.col("t").isin(*_BM25_TERMS))
        .groupBy("doc_id", "t")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("t").agg(F.count("*").alias("df"))
    avglen = F.col("total_len").cast("double") / F.col("n")
    idf = F.log(
        (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    tf_norm = (F.col("tf") * (_BM25_K1 + 1.0)) / (
        F.col("tf")
        + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * F.col("len") / avglen)
    )
    scored = (
        tf.join(F.broadcast(df), "t")
        .join(dlen, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(idf * tf_norm * 1e6).cast("long").alias("q"),
        )
    )
    agg_ = scored.groupBy("doc_id").agg(F.sum("q").alias("score_u"))
    return (
        agg_.orderBy(F.desc("score_u"), "doc_id")
        .limit(_BM25_TOPN)
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.round(F.col("score_u").cast("double") / 1e6, 6).alias("bm25"),
        )
    )


@query(
    "agg_two_proportion_ztest",
    oracle=f"""
    WITH u AS (
      SELECT user_id % 2 AS arm,
             max(CASE WHEN event_type = 'purchase'
                      AND ts >= TIMESTAMP '{_CUPED_SPLIT}'
                      AND value >= 450.0
                      THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY user_id),
    m AS (
      SELECT arm, count(*) AS n, sum(converted) AS c
      FROM u GROUP BY arm),
    w AS (
      SELECT max(CASE WHEN arm = 0 THEN n END) AS n0,
             max(CASE WHEN arm = 0 THEN c END) AS c0,
             max(CASE WHEN arm = 1 THEN n END) AS n1,
             max(CASE WHEN arm = 1 THEN c END) AS c1
      FROM m)
    SELECT CAST(n0 AS BIGINT) AS n_ctrl, CAST(c0 AS BIGINT) AS conv_ctrl,
           CAST(n1 AS BIGINT) AS n_treat, CAST(c1 AS BIGINT) AS conv_treat,
           round(CAST(c0 AS DOUBLE) / n0, 6) AS rate_ctrl,
           round(CAST(c1 AS DOUBLE) / n1, 6) AS rate_treat,
           round((CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
                 / nullif(sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                        * (1.0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                        * (1.0 / n0 + 1.0 / n1)), 0.0), 4) AS z_score
    FROM w
    """,
)
def agg_two_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on post-period conversion rates between the
    deterministic arms — the binary-outcome sibling of
    `agg_welch_ttest` (means) in the experimentation family: pooled
    standard error under H₀, one z statistic. Per-user conversion flags
    and arm counts are exact integers from one user-keyed aggregation;
    the z expression is a single closed-form double over four exact
    integers, identical in both engines. Nothing after the first
    hash agg is corpus-sized."""
    # conversion = a HIGH-VALUE post-period purchase (>= $450): plain
    # any-purchase converts 100% of this corpus's users, collapsing the
    # pooled variance to zero (degenerate z); the guarded nullif below
    # keeps even that case engine-agreeing (NULL z both sides)
    converted = F.max(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("ts") >= F.lit(_CUPED_SPLIT).cast("timestamp"))
            & (F.col("value") >= 450.0),
            1,
        ).otherwise(0)
    )
    u = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(converted.alias("converted"))
        .select((F.col("user_id") % 2).alias("arm"), "converted")
    )
    m = u.groupBy("arm").agg(
        F.count("*").alias("n"), F.sum("converted").alias("c")
    )

    def cell(a, col):
        return F.max(F.when(F.col("arm") == a, F.col(col)))

    w = m.agg(
        cell(0, "n").alias("n0"),
        cell(0, "c").alias("c0"),
        cell(1, "n").alias("n1"),
        cell(1, "c").alias("c1"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    pool = (d("c0") + d("c1")) / (d("n0") + d("n1"))
    z = (d("c1") / d("n1") - d("c0") / d("n0")) / F.nullif(
        F.sqrt(pool * (1.0 - pool) * (1.0 / d("n0") + 1.0 / d("n1"))),
        F.lit(0.0),
    )
    return w.select(
        F.col("n0").cast("long").alias("n_ctrl"),
        F.col("c0").cast("long").alias("conv_ctrl"),
        F.col("n1").cast("long").alias("n_treat"),
        F.col("c1").cast("long").alias("conv_treat"),
        F.round(d("c0") / d("n0"), 6).alias("rate_ctrl"),
        F.round(d("c1") / d("n1"), 6).alias("rate_treat"),
        F.round(z, 4).alias("z_score"),
    )


@query(
    "agg_price_elasticity",
    oracle="""
    WITH per_part AS (
      SELECT l.l_partkey, p.p_brand,
             ln(CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                     AS DOUBLE)
                / sum(CAST(round(l.l_quantity) AS BIGINT))) AS ln_price,
             ln(CAST(sum(CAST(round(l.l_quantity) AS BIGINT)) AS DOUBLE))
               AS ln_qty
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY l.l_partkey, p.p_brand)
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n_parts,
           round(regr_slope(ln_qty, ln_price), 6) AS elasticity,
           round(regr_r2(ln_qty, ln_price), 6) AS r2
    FROM per_part GROUP BY p_brand ORDER BY p_brand
    """,
)
def agg_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRICE ELASTICITY of demand per brand: the log-log OLS slope of
    per-part quantity on average unit price (elasticity = d ln q /
    d ln p) — the pricing-economics headline every revenue team
    estimates, and the economic application of the `regr_*` family
    `agg_linear_regression` introduces. Each part contributes ONE
    (ln price, ln qty) point whose inputs are exact int64 cents/units
    (the ln of a ratio of exact integers is an identical double both
    engines); the per-brand regression is one regr_slope/regr_r2 hash
    agg, rounded at 6dp where moment accumulation order can differ in
    the last ulp (the `agg_linear_regression` precedent). Scale: one
    part-keyed aggregation, one bounded brand rollup."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("pc"),
        F.round("l_quantity").cast("long").alias("q"),
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    per_part = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "p_brand")
        .agg(F.sum("pc").alias("spc"), F.sum("q").alias("sq"))
        .select(
            "p_brand",
            F.log(F.col("spc").cast("double") / F.col("sq")).alias(
                "ln_price"
            ),
            F.log(F.col("sq").cast("double")).alias("ln_qty"),
        )
    )
    return (
        per_part.groupBy("p_brand")
        .agg(
            F.count("*").cast("long").alias("n_parts"),
            F.round(F.regr_slope("ln_qty", "ln_price"), 6).alias(
                "elasticity"
            ),
            F.round(F.regr_r2("ln_qty", "ln_price"), 6).alias("r2"),
        )
        .orderBy("p_brand")
    )


@query(
    "agg_abc_classification",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents
      FROM lineitem GROUP BY l_partkey),
    cum AS (
      SELECT cents,
             sum(cents) OVER (ORDER BY cents DESC, l_partkey
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS running
      FROM rev),
    tot AS (SELECT sum(cents) AS t FROM rev),
    classed AS (
      SELECT c.cents,
             CASE WHEN 5 * c.running <= 4 * t.t THEN 'A'
                  WHEN 20 * c.running <= 19 * t.t THEN 'B'
                  ELSE 'C' END AS abc
      FROM cum c CROSS JOIN tot t)
    SELECT abc,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(cents) AS BIGINT) AS revenue_cents,
           round(CAST(sum(cents) AS DOUBLE)
                 / (SELECT CAST(t AS DOUBLE) FROM tot), 6) AS revenue_share
    FROM classed GROUP BY abc ORDER BY abc
    """,
)
def agg_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory CLASSIFICATION — the 80/95 cumulative-revenue cut
    every supply-chain review starts with: parts ranked by revenue
    descending, class A while the running total stays ≤ 80% of total
    revenue, B to 95%, C after. The running total is the operation that
    breaks naive Spark (a global ordered cumsum = one-partition window);
    here it rides the NEW `with_global_prefix_sum` primitive — the same
    deterministic range-bucketing as the terasort rank, with per-bucket
    value totals prefix-summed through the bounded triangle join. Class
    cuts cross-multiply to exact integers (5·cum ≤ 4·T, 20·cum ≤ 19·T
    on decimal-exact cents) so no float boundary exists; the oracle is
    the plain single-node window."""
    from .ranking import with_global_prefix_sum

    rev = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("decimal(38,0)")
            .alias("cents")
        )
    )
    cum = with_global_prefix_sum(
        rev,
        [("cents", "desc"), ("l_partkey", "asc")],
        value_col="cents",
        out_col="running",
    )
    tot = rev.agg(F.sum("cents").cast("decimal(38,0)").alias("t"))
    classed = cum.crossJoin(F.broadcast(tot)).select(
        "cents",
        F.when(5 * F.col("running") <= 4 * F.col("t"), "A")
        .when(20 * F.col("running") <= 19 * F.col("t"), "B")
        .otherwise("C")
        .alias("abc"),
        "t",
    )
    return (
        classed.groupBy("abc")
        .agg(
            F.count("*").cast("long").alias("n_parts"),
            F.sum("cents").cast("long").alias("revenue_cents"),
            F.round(
                F.sum("cents").cast("double") / F.any_value("t").cast("double"),
                6,
            ).alias("revenue_share"),
        )
        .orderBy("abc")
    )


@query(
    "agg_lorenz_curve",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents
      FROM lineitem GROUP BY l_partkey),
    ranked AS (
      SELECT cents,
             row_number() OVER (ORDER BY cents DESC, l_partkey) AS rnk,
             sum(cents) OVER (ORDER BY cents DESC, l_partkey
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS running
      FROM rev),
    n AS (SELECT count(*) AS n, sum(cents) AS t FROM rev),
    cuts AS (SELECT unnest(range(1, 11)) AS decile)
    SELECT CAST(c.decile AS INT) AS decile,
           CAST((c.decile * n.n) // 10 AS BIGINT) AS n_top_parts,
           round(CAST(r.running AS DOUBLE) / CAST(n.t AS DOUBLE), 6)
             AS cum_revenue_share
    FROM cuts c
    CROSS JOIN n
    JOIN ranked r ON r.rnk = (c.decile * n.n) // 10
    ORDER BY decile
    """,
)
def agg_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LORENZ concentration curve over part revenue: for each top-k
    decile of parts (ranked by revenue descending), the cumulative
    revenue share — the 10-point curve whose area is `agg_gini_daily`'s
    coefficient and whose 80% crossing is `agg_abc_classification`'s A
    cut, read directly. Rank AND running total both come from the
    distributed range-bucketed primitives (`with_global_rank` +
    `with_global_prefix_sum` share one bucketing pass — no
    single-partition window anywhere); the ten cut ranks are exact
    integer (k·n) div 10 probes equi-joined against the ranked frame,
    so the corpus-sized work is one shuffle and the output is a fixed
    10-row table."""
    from .ranking import with_global_prefix_sum, with_global_rank

    rev = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("decimal(38,0)")
            .alias("cents")
        )
    )
    keys = [("cents", "desc"), ("l_partkey", "asc")]
    ranked = with_global_rank(rev, keys, rank_col="rnk")
    ranked = with_global_prefix_sum(
        ranked, keys, value_col="cents", out_col="running"
    )
    n_tot = rev.agg(
        F.count("*").alias("n"), F.sum("cents").alias("t")
    )
    cuts = spark.range(1, 11).select(F.col("id").cast("int").alias("decile"))
    probes = cuts.crossJoin(F.broadcast(n_tot)).select(
        "decile",
        F.expr("CAST((decile * n) div 10 AS BIGINT)").alias("cut_rnk"),
        "t",
    )
    return (
        probes.join(ranked, probes.cut_rnk == ranked.rnk)
        .select(
            "decile",
            F.col("cut_rnk").alias("n_top_parts"),
            F.round(
                F.col("running").cast("double") / F.col("t").cast("double"),
                6,
            ).alias("cum_revenue_share"),
        )
        .orderBy("decile")
    )


@query(
    "agg_gini_parts",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents
      FROM lineitem GROUP BY l_partkey),
    ranked AS (
      SELECT cents,
             row_number() OVER (ORDER BY cents, l_partkey) AS k
      FROM rev),
    s AS (
      SELECT count(*) AS n, sum(cents) AS t,
             sum(k * cents) AS kt
      FROM ranked)
    SELECT CAST(n AS BIGINT) AS n_parts,
           CAST(t AS BIGINT) AS total_cents,
           round(2.0 * CAST(kt AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(t AS DOUBLE))
                 - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 6)
             AS gini
    FROM s
    """,
)
def agg_gini_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of revenue concentration ACROSS PARTS — the
    scalar summary of `agg_lorenz_curve` (its curve's area), computed
    by the exact rank formula G = 2·Σk·vₖ/(n·Σv) − (n+1)/n over
    ascending-ranked revenues: Σk·vₖ is an EXACT integer because ranks
    come from the distributed range-bucketed `with_global_rank`
    (deterministic ties on partkey) and revenues are int64 cents, so
    the whole statistic is one closed-form double over three exact
    integers. The catalog-level twin of `agg_gini_daily` (days): one
    part-keyed aggregation, one rank shuffle, a 1-row answer."""
    from .ranking import with_global_rank

    rev = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .alias("cents")
        )
    )
    ranked = with_global_rank(
        rev, [("cents", "asc"), ("l_partkey", "asc")], rank_col="k"
    )
    s = ranked.agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("t"),
        F.sum(F.col("k") * F.col("cents")).alias("kt"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return s.select(
        F.col("n").cast("long").alias("n_parts"),
        F.col("t").cast("long").alias("total_cents"),
        F.round(
            2.0 * d("kt") / (d("n") * d("t")) - (d("n") + 1.0) / d("n"), 6
        ).alias("gini"),
    )


_APRIORI_MINSUP = 0.023  # fraction of baskets; splits the brand lattice
#                          nontrivially at every SF (129/109/73 of the 300
#                          possible pairs at sf0.001/0.01/0.1)


@query(
    "agg_itemsets_apriori",
    oracle=f"""
    WITH b AS MATERIALIZED (
      SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS br
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
    n AS (SELECT CAST(count(DISTINCT o) AS DOUBLE) AS n FROM b),
    f1 AS MATERIALIZED (
      SELECT br, count(*) AS s FROM b GROUP BY br
      HAVING CAST(count(*) AS DOUBLE) >= {_APRIORI_MINSUP} * (SELECT n FROM n)),
    f2 AS MATERIALIZED (
      SELECT a.br AS x, c.br AS y, count(*) AS s
      FROM b a JOIN b c ON a.o = c.o AND a.br < c.br
      GROUP BY a.br, c.br
      HAVING CAST(count(*) AS DOUBLE) >= {_APRIORI_MINSUP} * (SELECT n FROM n)),
    f3 AS MATERIALIZED (
      SELECT a.br AS x, c.br AS y, d.br AS z, count(*) AS s
      FROM b a
      JOIN b c ON c.o = a.o AND a.br < c.br
      JOIN b d ON d.o = a.o AND c.br < d.br
      GROUP BY a.br, c.br, d.br
      HAVING CAST(count(*) AS DOUBLE) >= {_APRIORI_MINSUP} * (SELECT n FROM n))
    SELECT CAST(1 AS INT) AS k, br AS i1, CAST(NULL AS VARCHAR) AS i2,
           CAST(NULL AS VARCHAR) AS i3, CAST(s AS BIGINT) AS support,
           round(CAST(s AS DOUBLE) / (SELECT n FROM n), 6) AS supp_frac
    FROM f1
    UNION ALL
    SELECT 2, x, y, NULL, CAST(s AS BIGINT),
           round(CAST(s AS DOUBLE) / (SELECT n FROM n), 6)
    FROM f2
    UNION ALL
    SELECT 3, x, y, z, CAST(s AS BIGINT),
           round(CAST(s AS DOUBLE) / (SELECT n FROM n), 6)
    FROM f3
    ORDER BY k, i1, i2, i3
    """,
)
def agg_itemsets_apriori(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent itemsets via A-PRIORI (Agrawal–Srikant VLDB'94) — the
    market-basket canon `agg_basket_lift`'s pairwise lift presupposes,
    run to the 3-itemset level at brand grain over order baskets with a
    2.3%-of-baskets support floor. The Spark path is the real
    level-wise algorithm, not the oracle's brute-force joins: baskets
    are first restricted to frequent ITEMS, level-2 enumerates pairs
    within basket and keeps the frequent ones, and level-3 only EXTENDS
    frequent pairs — each extension is semi-joined against the
    broadcast frequent-pair set twice ((x,z) and (y,z)), the downward-
    closure prune that keeps the candidate key space (and the final
    hash agg) bounded by the frequent lattice instead of the raw
    combination space. Scale: the item vocabulary is a bounded domain
    (brands), so freq1/freq2 are ≤ V/V² rows — broadcast constants at
    any corpus size; every per-basket enumeration is bounded by basket
    size (≤ 17 brands here); the heavy operations are two shuffle
    equi-joins on the basket key with map-side-combined counting.
    Monotonicity guarantees the pruned result equals the oracle's
    unpruned HAVING-filtered joins."""
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o"), "l_partkey"
    )
    pt = load(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), F.col("p_brand").alias("br")
    )
    b = li.join(pt, "l_partkey").select("o", "br").distinct()
    n = float(b.select("o").distinct().count())
    thr = _APRIORI_MINSUP * n

    f1 = (
        b.groupBy("br")
        .agg(F.count("*").alias("s"))
        .filter(F.col("s").cast("double") >= thr)
    )
    # restrict baskets to frequent items before any pair work
    bf = b.join(F.broadcast(f1.select("br")), "br").select("o", "br")
    pairs = (
        bf.alias("a")
        .join(
            bf.alias("c"),
            (F.col("a.o") == F.col("c.o")) & (F.col("a.br") < F.col("c.br")),
        )
        .select(
            F.col("a.o").alias("o"),
            F.col("a.br").alias("x"),
            F.col("c.br").alias("y"),
        )
    )
    f2 = (
        pairs.groupBy("x", "y")
        .agg(F.count("*").alias("s"))
        .filter(F.col("s").cast("double") >= thr)
    )
    f2b = F.broadcast(f2.select("x", "y"))
    # level 3: extend frequent pairs within basket; downward-closure
    # prune via two semi-joins against the broadcast frequent-pair set
    p2 = pairs.join(f2b, ["x", "y"])
    t3 = (
        p2.alias("p")
        .join(
            bf.alias("d"),
            (F.col("p.o") == F.col("d.o")) & (F.col("p.y") < F.col("d.br")),
        )
        .select("p.o", "p.x", "p.y", F.col("d.br").alias("z"))
        .join(
            F.broadcast(f2.select(F.col("x"), F.col("y").alias("z"))),
            ["x", "z"],
            "left_semi",
        )
        .join(
            F.broadcast(f2.select(F.col("x").alias("y"), F.col("y").alias("z"))),
            ["y", "z"],
            "left_semi",
        )
    )
    f3 = (
        t3.groupBy("x", "y", "z")
        .agg(F.count("*").alias("s"))
        .filter(F.col("s").cast("double") >= thr)
    )

    def level(df, k, cols):
        sel = [F.lit(k).cast("int").alias("k")]
        for i, c in enumerate(["i1", "i2", "i3"]):
            sel.append(
                (F.col(cols[i]) if i < len(cols) else F.lit(None))
                .cast("string")
                .alias(c)
            )
        sel.append(F.col("s").cast("long").alias("support"))
        sel.append(
            F.round(F.col("s").cast("double") / F.lit(n), 6).alias("supp_frac")
        )
        return df.select(*sel)

    return (
        level(f1, 1, ["br"])
        .unionByName(level(f2, 2, ["x", "y"]))
        .unionByName(level(f3, 3, ["x", "y", "z"]))
        .orderBy("k", "i1", "i2", "i3")
    )


_RULES_MINCONF = 0.152  # splits the rule set nontrivially at every SF
#                         (187/258, 158/218, 87/146 rules kept)


@query(
    "agg_association_rules",
    oracle=f"""
    WITH b AS MATERIALIZED (
      SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS br
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
    n AS (SELECT CAST(count(DISTINCT o) AS DOUBLE) AS n FROM b),
    f1 AS MATERIALIZED (SELECT br, count(*) AS s FROM b GROUP BY br),
    f2 AS MATERIALIZED (
      SELECT a.br AS x, c.br AS y, count(*) AS s
      FROM b a JOIN b c ON a.o = c.o AND a.br < c.br
      GROUP BY a.br, c.br
      HAVING CAST(count(*) AS DOUBLE) >= {_APRIORI_MINSUP} * (SELECT n FROM n)),
    rules AS (
      SELECT f2.x AS antecedent, f2.y AS consequent,
             f2.s AS s, fa.s AS s_ant, fb.s AS s_con
      FROM f2 JOIN f1 fa ON fa.br = f2.x JOIN f1 fb ON fb.br = f2.y
      UNION ALL
      SELECT f2.y, f2.x, f2.s, fb.s, fa.s
      FROM f2 JOIN f1 fa ON fa.br = f2.x JOIN f1 fb ON fb.br = f2.y)
    SELECT antecedent, consequent, CAST(s AS BIGINT) AS support,
           round(CAST(s AS DOUBLE) / s_ant, 6) AS confidence,
           round((CAST(s AS DOUBLE) / s_ant)
                 / (CAST(s_con AS DOUBLE) / (SELECT n FROM n)), 6) AS lift
    FROM rules
    WHERE CAST(s AS DOUBLE) / s_ant >= {_RULES_MINCONF}
    ORDER BY antecedent, consequent
    """,
)
def agg_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-RULE generation — phase 2 of the Agrawal–Srikant
    canon `agg_itemsets_apriori` runs phase 1 of: every frequent pair
    yields both directed rules antecedent→consequent, kept when
    confidence = s(ab)/s(a) clears the {_RULES_MINCONF} floor, with
    lift = confidence / (s(b)/N) reported alongside (`agg_basket_lift`
    reports undirected pair lift at part grain; this key is the
    DIRECTED rule form at the frequent-lattice grain, with confidence —
    what a recommender actually consumes). Scale: rule generation runs
    entirely over the frequent-pair set — a bounded-vocabulary constant
    (≤ V² rows) — joined twice against the ≤ V-row item-frequency
    table; the only corpus-scale work is the same basket self-join the
    itemset key does, map-side-combined. Confidence filtering happens
    on the UNROUNDED ratio in both engines; outputs round at 6dp."""
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o"), "l_partkey"
    )
    pt = load(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), F.col("p_brand").alias("br")
    )
    b = li.join(pt, "l_partkey").select("o", "br").distinct()
    n = float(b.select("o").distinct().count())
    thr = _APRIORI_MINSUP * n

    f1 = b.groupBy("br").agg(F.count("*").alias("s"))
    f2 = (
        b.alias("a")
        .join(
            b.alias("c"),
            (F.col("a.o") == F.col("c.o")) & (F.col("a.br") < F.col("c.br")),
        )
        .groupBy(F.col("a.br").alias("x"), F.col("c.br").alias("y"))
        .agg(F.count("*").alias("s"))
        .filter(F.col("s").cast("double") >= thr)
    )
    fa = F.broadcast(f1.select(F.col("br").alias("x"), F.col("s").alias("s_a")))
    fb = F.broadcast(f1.select(F.col("br").alias("y"), F.col("s").alias("s_b")))
    joined = f2.join(fa, "x").join(fb, "y")
    fwd = joined.select(
        F.col("x").alias("antecedent"),
        F.col("y").alias("consequent"),
        "s",
        F.col("s_a").alias("s_ant"),
        F.col("s_b").alias("s_con"),
    )
    rev = joined.select(
        F.col("y").alias("antecedent"),
        F.col("x").alias("consequent"),
        "s",
        F.col("s_b").alias("s_ant"),
        F.col("s_a").alias("s_con"),
    )
    conf = F.col("s").cast("double") / F.col("s_ant")
    return (
        fwd.unionByName(rev)
        .filter(conf >= _RULES_MINCONF)
        .select(
            "antecedent",
            "consequent",
            F.col("s").cast("long").alias("support"),
            F.round(conf, 6).alias("confidence"),
            F.round(
                conf / (F.col("s_con").cast("double") / F.lit(n)), 6
            ).alias("lift"),
        )
        .orderBy("antecedent", "consequent")
    )
