"""aggregates.core — split from the flat aggregates.py (r7); operator bodies unchanged, see the package __init__."""


from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query



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


