"""aggregates.stats — split from the flat aggregates.py (r7); operator bodies unchanged, see the package __init__."""


from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query


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
    from ..ranking import with_global_rank

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




# --- oracle-checked gradient-boosted-stumps TRAINING (agg_gbt_stumps_train) ---
#
# The boosting canon joins the oracle-checked iterative family (PageRank /
# PCA / BPE / logistic / k-means / ALS) with the same bit-identical-state
# discipline: residuals live as exact int64 MILLI-CENTS, per-round split
# scores and leaf means are single correctly-rounded double expressions
# over exact integer sums (+,*,/ only — no transcendentals, the ADVICE-#2
# lesson), and every quantization is floor(x + 0.5). Candidate thresholds
# are the calendar quarter boundaries inside the corpus's order-date range,
# precomputed here as epoch-day integer literals so NEITHER engine does
# date arithmetic inside the loop.

import datetime as _dt
import math as _math

_GBT_ROUNDS = 3
_GBT_CANDS = [
    (_dt.date(y, m, 1) - _dt.date(1970, 1, 1)).days
    for y in range(1995, 2002)
    for m in (1, 4, 7, 10)
    if _dt.date(1995, 4, 1) <= _dt.date(y, m, 1) <= _dt.date(2001, 7, 1)
]


def _gbt_oracle() -> str:
    cands = ", ".join(str(t) for t in _GBT_CANDS)
    parts = [f"""
    WITH y AS MATERIALIZED (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) * 1000 AS yv,
             date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS d
      FROM orders),
    cand AS (SELECT unnest([{cands}]) AS t),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(yv) AS HUGEINT) AS s FROM y),
    g0 AS (SELECT CAST(floor(CAST(s AS DOUBLE) / n + 0.5) AS BIGINT) AS g
           FROM tot),
    r0 AS MATERIALIZED (SELECT d, yv - g AS r FROM y CROSS JOIN g0),
    out0 AS (SELECT 0 AS step, CAST(NULL AS BIGINT) AS split_day,
                    CAST(NULL AS BIGINT) AS n_left,
                    g AS gamma_left, g AS gamma_right,
                    (SELECT CAST(sum(abs(r)) AS BIGINT) FROM r0) AS resid_abs
             FROM g0)"""]
    for k in range(1, _GBT_ROUNDS + 1):
        p = k - 1
        parts.append(f""",
    a{k} AS MATERIALIZED (
      SELECT t, count(*) FILTER (WHERE d < t) AS nl,
             CAST(coalesce(sum(r) FILTER (WHERE d < t), 0) AS HUGEINT) AS sl,
             count(*) AS n, CAST(sum(r) AS HUGEINT) AS st
      FROM r{p} CROSS JOIN cand GROUP BY t),
    b{k} AS MATERIALIZED (
      SELECT t, nl, n - nl AS nr, sl, st - sl AS sr
      FROM a{k} WHERE nl > 0 AND nl < n
      ORDER BY (CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE) / nl
              + CAST(st - sl AS DOUBLE) * CAST(st - sl AS DOUBLE) / (n - nl))
               DESC, t ASC
      LIMIT 1),
    g{k} AS MATERIALIZED (
      SELECT t, nl,
             CAST(floor(CAST(sl AS DOUBLE) / nl + 0.5) AS BIGINT) AS gl,
             CAST(floor(CAST(sr AS DOUBLE) / nr + 0.5) AS BIGINT) AS gr
      FROM b{k}),
    r{k} AS MATERIALIZED (
      SELECT d, r - CASE WHEN d < t THEN gl ELSE gr END AS r
      FROM r{p} CROSS JOIN g{k}),
    out{k} AS (SELECT {k} AS step, CAST(t AS BIGINT) AS split_day,
                      CAST(nl AS BIGINT) AS n_left,
                      gl AS gamma_left, gr AS gamma_right,
                      (SELECT CAST(sum(abs(r)) AS BIGINT) FROM r{k})
                        AS resid_abs
               FROM g{k})""")
    union = " UNION ALL ".join(
        f"SELECT * FROM out{k}" for k in range(_GBT_ROUNDS + 1)
    )
    parts.append(f"\n    SELECT * FROM ({union}) ORDER BY step")
    return "".join(parts)


@query("agg_gbt_stumps_train", oracle=_gbt_oracle())
def agg_gbt_stumps_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-CHECKED gradient-boosted STUMPS training: 3 boosting
    rounds of depth-1 regression trees predicting order value (exact
    milli-cents) from the order date, greedily choosing the quarter
    boundary that maximizes the SSE reduction
    S_L²/n_L + S_R²/n_R (the −S²/n term is round-constant and drops
    out of the argmax) and fitting each leaf with its residual mean.
    Boosting is THE remaining classic of the iterative training canon
    after PageRank/PCA/BPE/logistic/k-means/ALS; the per-round state
    (split day, leaf values, residual L1 norm) walks bit-identically
    against the unrolled MATERIALIZED-CTE oracle.

    Determinism: residuals are exact int64 milli-cents; per-candidate
    (n_L, S_L) are exact integer sums (decimal(38,0) / HUGEINT); the
    score and leaf means are single correctly-rounded double
    expressions over those integers evaluated in the identical
    operation order in both engines (+,*,/ only), quantized with
    floor(x+0.5); ties break on the smaller threshold.

    Scale: each round is ONE conditional-aggregation pass — the 26
    candidate thresholds become 52 accumulator columns in a single
    hash aggregate (map-side combined, one ~52-value row crossing to
    the driver per round, the k-means-partials pattern), and the
    residual update is a row-local map; `localCheckpoint` per round
    truncates lineage. Rounds = jobs; at 100 TB the same 3 rounds
    amortize over the full table scan exactly like any MLlib GBT
    iteration, with no per-candidate re-scan anywhere."""
    o = load(spark, sf_dir, "orders")
    y = o.select(
        (F.round(F.col("o_totalprice") * 100).cast("long") * 1000).alias(
            "yv"
        ),
        F.datediff(
            F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
        ).alias("d"),
    )
    tot = y.agg(
        F.count("*").alias("n"),
        F.sum(F.col("yv").cast("decimal(38,0)")).alias("s"),
    ).collect()[0]
    n_total = int(tot["n"])
    g0 = int(_math.floor(float(int(tot["s"])) / n_total + 0.5))
    resid = y.select(
        "d", (F.col("yv") - F.lit(g0)).alias("r")
    ).localCheckpoint()

    def _abs_sum(df: DataFrame) -> int:
        return int(
            df.agg(
                F.sum(F.abs(F.col("r")).cast("decimal(38,0)"))
            ).collect()[0][0]
        )

    # Each round's candidate aggregate scans the SAME residual frame the
    # previous round's |r| norm does, so the norm rides along as one more
    # accumulator column (identical exact-integer expression) instead of
    # its own job: 7 aggregate passes over the residuals become 4. The
    # row for step k is appended once round k+1's pass delivers its norm;
    # only the post-final-round norm needs a dedicated pass.
    pending = (0, None, None, g0, g0)
    rows = []
    for step in range(1, _GBT_ROUNDS + 1):
        aggs = []
        for idx, t in enumerate(_GBT_CANDS):
            left = F.col("d") < F.lit(t)
            aggs.append(
                F.sum(F.when(left, 1).otherwise(0))
                .cast("long")
                .alias(f"nl{idx}")
            )
            aggs.append(
                F.sum(
                    F.when(left, F.col("r"))
                    .otherwise(F.lit(0))
                    .cast("decimal(38,0)")
                ).alias(f"sl{idx}")
            )
        aggs.append(F.sum(F.col("r").cast("decimal(38,0)")).alias("st"))
        aggs.append(
            F.sum(F.abs(F.col("r")).cast("decimal(38,0)")).alias("ab")
        )
        p = resid.agg(*aggs).collect()[0]  # one bounded row per round
        rows.append(pending + (int(p["ab"]),))
        st = int(p["st"])
        best = None
        for idx, t in enumerate(_GBT_CANDS):
            nl = int(p[f"nl{idx}"])
            if nl == 0 or nl == n_total:
                continue
            sl = int(p[f"sl{idx}"])
            nr, sr = n_total - nl, st - sl
            score = (
                float(sl) * float(sl) / nl + float(sr) * float(sr) / nr
            )
            key = (score, -t)
            if best is None or key > best[0]:
                best = (key, t, nl, sl, nr, sr)
        _, t, nl, sl, nr, sr = best
        gl = int(_math.floor(float(sl) / nl + 0.5))
        gr = int(_math.floor(float(sr) / nr + 0.5))
        resid = resid.select(
            "d",
            (
                F.col("r")
                - F.when(F.col("d") < F.lit(t), F.lit(gl)).otherwise(
                    F.lit(gr)
                )
            ).alias("r"),
        ).localCheckpoint()
        pending = (step, t, nl, gl, gr)
    rows.append(pending + (_abs_sum(resid),))

    return spark.createDataFrame(
        rows,
        "step int, split_day long, n_left long, gamma_left long,"
        " gamma_right long, resid_abs long",
    ).orderBy("step")


@query(
    "agg_chain_ladder",
    oracle="""
    WITH ev AS (
      SELECT user_id,
             CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS ym,
             CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v
      FROM events),
    coh AS (SELECT user_id, min(ym) AS cym FROM ev GROUP BY 1),
    inc AS (
      SELECT c.cym, e.ym - c.cym AS age, sum(e.v) AS v
      FROM ev e JOIN coh c USING (user_id) GROUP BY 1, 2),
    mx AS (SELECT max(ym) AS mym FROM ev),
    spine AS (
      SELECT i.cym, u.age
      FROM (SELECT DISTINCT cym FROM inc) i CROSS JOIN mx,
           unnest(generate_series(0, mx.mym - i.cym)) AS u(age)),
    cum AS (
      SELECT s.cym, s.age,
             sum(coalesce(i.v, 0)) OVER
               (PARTITION BY s.cym ORDER BY s.age) AS c
      FROM spine s LEFT JOIN inc i
        ON i.cym = s.cym AND i.age = s.age),
    f AS (
      SELECT a.age AS age, count(*) AS n_cohorts,
             sum(a.c) AS sum_curr, sum(b.c) AS sum_next
      FROM cum a JOIN cum b ON b.cym = a.cym AND b.age = a.age + 1
      GROUP BY 1)
    SELECT CAST(age AS INT) AS age,
           CAST(n_cohorts AS BIGINT) AS n_cohorts,
           CAST(sum_curr AS BIGINT) AS sum_curr_micro,
           CAST(sum_next AS BIGINT) AS sum_next_micro,
           CAST(floor(sum_next * 1000000.0 / sum_curr + 0.5) AS BIGINT)
             AS factor_micro
    FROM f WHERE sum_curr > 0
    ORDER BY age
    """,
)
def agg_chain_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAIN-LADDER development triangle (the actuarial loss-development
    canon, equally the SaaS revenue-maturation curve): users cohort by
    first-activity month, activity value accumulates by age (months
    since cohort), and each age's DEVELOPMENT FACTOR is the ratio of
    total cumulative value at age j+1 to age j across every cohort old
    enough to observe both — the link ratios that project immature
    cohorts to ultimate. Ages a cohort hasn't reached yet are excluded
    by construction (the triangle's diagonal), silent days cumulate
    flat via the zero-filled spine.

    Determinism: per-event µ-quantize BEFORE exact integer sums
    (order-independent), cumulative sums stay integer, and each factor
    is one correctly-rounded double division over two exact integers,
    floor(+0.5)-quantized.

    Scale: two hash aggregates (per-user cohort, per-cell increment),
    a calendar-bounded spine fan-out (≤ span² cells overall), one
    cohort-keyed cumulative window over ≤ #days rows per cohort, and
    a final ≤ #days-row rollup — nothing anywhere scales with event
    volume except the first aggregation pass."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("ym"),
        F.floor(F.col("value") * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("v"),
    )
    coh = ev.groupBy("user_id").agg(F.min("ym").alias("cym"))
    inc = (
        ev.join(coh, "user_id")
        .groupBy("cym", (F.col("ym") - F.col("cym")).alias("age"))
        .agg(F.sum("v").alias("v"))
    )
    mx = ev.agg(F.max("ym").alias("mym"))
    spine = (
        inc.select("cym")
        .distinct()
        .crossJoin(F.broadcast(mx))
        .select(
            "cym",
            F.explode(
                F.sequence(F.lit(0), (F.col("mym") - F.col("cym")).cast("int"))
            ).alias("age"),
        )
    )
    w = (
        Window.partitionBy("cym")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = spine.join(inc, ["cym", "age"], "left").select(
        "cym",
        "age",
        F.sum(F.coalesce("v", F.lit(0))).over(w).alias("c"),
    )
    a, b = cum.alias("a"), cum.alias("b")
    f = (
        a.join(
            b,
            (F.col("b.cym") == F.col("a.cym"))
            & (F.col("b.age") == F.col("a.age") + 1),
        )
        .groupBy(F.col("a.age").alias("age"))
        .agg(
            F.count("*").alias("n_cohorts"),
            F.sum("a.c").alias("sum_curr"),
            F.sum("b.c").alias("sum_next"),
        )
    )
    return (
        f.filter(F.col("sum_curr") > 0)
        .select(
            F.col("age").cast("int").alias("age"),
            F.col("n_cohorts").cast("long").alias("n_cohorts"),
            F.col("sum_curr").cast("long").alias("sum_curr_micro"),
            F.col("sum_next").cast("long").alias("sum_next_micro"),
            F.floor(
                F.col("sum_next") * F.lit(1000000.0) / F.col("sum_curr")
                + F.lit(0.5)
            )
            .cast("long")
            .alias("factor_micro"),
        )
        .orderBy("age")
    )


# --- deterministic Poisson bootstrap (agg_poisson_bootstrap_ci) ---
#
# The Poisson(1) bootstrap is the MapReduce-era answer to "confidence
# intervals over data too big to resample by index": each replica gives
# every row an independent Poisson(1) weight, computable row-locally in
# one pass for all replicas. Made deterministic here: the per-(row,
# replica) uniform comes from the same Weyl-style integer mix
# sample_weighted_hash uses, and the Poisson inverse-CDF is a fixed
# integer threshold table (floor(CDF·2^20) literals), so both engines
# draw bit-identical weights with zero RNG and zero transcendentals.
_BOOT_REPLICAS = 32
# floor(2^20 · P(X<=k)) for X~Poisson(1), k=0..4; u >= last → weight 5
_BOOT_CUTS = [385749, 771499, 964374, 1028666, 1044739]


def _boot_weight_sql(u: str) -> str:
    return (
        f"(CASE WHEN {u} < {_BOOT_CUTS[0]} THEN 0"
        f" WHEN {u} < {_BOOT_CUTS[1]} THEN 1"
        f" WHEN {u} < {_BOOT_CUTS[2]} THEN 2"
        f" WHEN {u} < {_BOOT_CUTS[3]} THEN 3"
        f" WHEN {u} < {_BOOT_CUTS[4]} THEN 4"
        f" ELSE 5 END)"
    )


@query(
    "agg_poisson_bootstrap_ci",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey AS k,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),
    rep AS (
      SELECT r.r, b.k, b.cents,
             ((b.k * 2654435761 + r.r * 97003969 + 12345) % 1048576) AS u
      FROM base b CROSS JOIN
           (SELECT unnest(generate_series(0, {_BOOT_REPLICAS - 1})) AS r) r),
    wtd AS (
      SELECT r, {_boot_weight_sql('u')} AS w, cents FROM rep)
    SELECT CAST(r AS INT) AS replica,
           CAST(sum(w) AS BIGINT) AS n_eff,
           CAST(floor(CAST(sum(w * cents) AS DOUBLE) / sum(w) + 0.5)
                AS BIGINT) AS mean_cents
    FROM wtd GROUP BY r ORDER BY r
    """,
)
def agg_poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic POISSON BOOTSTRAP of the mean order value: 32
    replicas, each weighting every order by an independent Poisson(1)
    draw — the single-pass bootstrap that made resampling feasible on
    MapReduce-scale data (index resampling needs the whole dataset per
    replica; Poisson weights need one row-local draw per replica). The
    replica means ARE the bootstrap distribution — order statistics over
    this 32-row table give the CI at any level without a sqrt/SD in the
    data path. Fully deterministic: the uniform is an integer Weyl mix
    of (order key, replica), the Poisson inverse-CDF is a fixed integer
    threshold table, and each replica mean is one correctly-rounded
    double division over exact integer sums, floor(+0.5)-quantized.

    Scale: ONE pass over the table computes all 32 replicas (the
    replica fan-out is a generator explode, map-side combined into 32
    accumulator groups); output is always exactly 32 rows. At 100 TB
    this is the only bootstrap shape that works — and it parallelizes
    embarrassingly, replica count being a literal."""
    base = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    rep = base.select(
        "k",
        "cents",
        F.explode(
            F.sequence(F.lit(0), F.lit(_BOOT_REPLICAS - 1))
        ).alias("r"),
    ).withColumn(
        "u",
        (
            F.col("k").cast("long") * 2654435761
            + F.col("r").cast("long") * 97003969
            + 12345
        )
        % 1048576,
    )
    w = (
        F.when(F.col("u") < _BOOT_CUTS[0], 0)
        .when(F.col("u") < _BOOT_CUTS[1], 1)
        .when(F.col("u") < _BOOT_CUTS[2], 2)
        .when(F.col("u") < _BOOT_CUTS[3], 3)
        .when(F.col("u") < _BOOT_CUTS[4], 4)
        .otherwise(5)
    )
    return (
        rep.withColumn("w", w)
        .groupBy(F.col("r").cast("int").alias("replica"))
        .agg(
            F.sum("w").cast("long").alias("n_eff"),
            F.floor(
                F.sum(
                    (F.col("w") * F.col("cents")).cast("decimal(38,0)")
                ).cast("double")
                / F.sum("w")
                + F.lit(0.5)
            )
            .cast("long")
            .alias("mean_cents"),
        )
        .orderBy("replica")
    )


@query(
    "agg_theil_sen_trend",
    oracle="""
    WITH m AS MATERIALIZED (
      SELECT (CAST(year(o_orderdate) AS BIGINT) * 12
              + month(o_orderdate)) AS t,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS x
      FROM orders GROUP BY 1),
    p AS MATERIALIZED (
      SELECT a.t AS ti, b.t AS tj, a.x AS xi, b.x AS xj
      FROM m a JOIN m b ON b.t > a.t),
    st AS (
      SELECT CAST(sum(CASE WHEN xj > xi THEN 1
                           WHEN xj < xi THEN -1 ELSE 0 END) AS BIGINT)
               AS s_stat,
             CAST(count(*) AS BIGINT) AS n_pairs
      FROM p),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n_months FROM m),
    ties AS (
      SELECT CAST(coalesce(sum(c * (c - 1) * (2 * c + 5)), 0) AS BIGINT)
               AS tt
      FROM (SELECT count(*) AS c FROM m GROUP BY x
            HAVING count(*) > 1) q),
    slopes AS (
      SELECT (xj - xi) * 1.0 / (tj - ti) AS sl,
             row_number() OVER
               (ORDER BY (xj - xi) * 1.0 / (tj - ti), ti, tj) AS rk
      FROM p),
    med AS (
      SELECT sum(sl) / count(*) AS median_slope
      FROM slopes, st
      WHERE rk IN ((n_pairs + 1) // 2, (n_pairs + 2) // 2))
    SELECT nn.n_months, st.n_pairs, st.s_stat,
           CAST(nn.n_months * (nn.n_months - 1) * (2 * nn.n_months + 5)
                - ties.tt AS BIGINT) AS var_num,
           CAST(floor(med.median_slope * 1000 + 0.5) AS BIGINT)
             AS slope_milli_cents
    FROM nn, st, ties, med
    """,
)
def agg_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANN-KENDALL trend test + THEIL-SEN slope over monthly revenue —
    the robust-trend canon (no normality assumption, breakdown point
    29%): S = Σ sign(x_j − x_i) over all month pairs, the ties-corrected
    variance NUMERATOR n(n−1)(2n+5) − Σt(t−1)(2t+5) (the /18 and the
    z-score's sqrt stay OUT of the data path — consumers finish the
    test client-side, keeping the key transcendental-free), and the
    slope as the exact MEDIAN of all pairwise (Δx/Δt) slopes, picked by
    rank over a totally-ordered window (slope, then pair id) so even-n
    averaging is deterministic.

    Determinism: monthly sums are exact cents; S and the variance
    numerator are pure integer arithmetic; each pairwise slope is one
    correctly-rounded division of exact integers, the median picks rank
    positions (not float equality), and the single output quantization
    is floor(+0.5) at milli-cent granularity.

    Scale: the month rollup bounds everything — pairs form over ≤
    #months² rows (a few thousand at ANY corpus size; the rollup is
    the only pass that sees the table), so the pair join is a
    constant-size tail on a single hash aggregate."""
    o = load(spark, sf_dir, "orders")
    m = o.groupBy(
        (F.year("o_orderdate").cast("long") * 12 + F.month("o_orderdate"))
        .alias("t")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("x")
    )
    a, b = m.alias("a"), m.alias("b")
    p = a.join(b, F.col("b.t") > F.col("a.t")).select(
        F.col("a.t").alias("ti"),
        F.col("b.t").alias("tj"),
        F.col("a.x").alias("xi"),
        F.col("b.x").alias("xj"),
    )
    st = p.agg(
        F.sum(
            F.when(F.col("xj") > F.col("xi"), 1)
            .when(F.col("xj") < F.col("xi"), -1)
            .otherwise(0)
        )
        .cast("long")
        .alias("s_stat"),
        F.count("*").cast("long").alias("n_pairs"),
    )
    nn = m.agg(F.count("*").cast("long").alias("n_months"))
    ties = (
        m.groupBy("x")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("c") * (F.col("c") - 1) * (2 * F.col("c") + 5)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tt")
        )
    )
    sl = (F.col("xj") - F.col("xi")) * F.lit(1.0) / (
        F.col("tj") - F.col("ti")
    )
    slopes = p.select(
        sl.alias("sl"),
        F.row_number()
        .over(Window.orderBy(sl, F.col("ti"), F.col("tj")))
        .alias("rk"),
    )
    med = (
        slopes.crossJoin(F.broadcast(st.select("n_pairs")))
        .filter(
            (F.col("rk") == F.floor((F.col("n_pairs") + 1) / 2))
            | (F.col("rk") == F.floor((F.col("n_pairs") + 2) / 2))
        )
        .agg((F.sum("sl") / F.count("*")).alias("median_slope"))
    )
    return (
        nn.crossJoin(F.broadcast(st))
        .crossJoin(F.broadcast(ties))
        .crossJoin(F.broadcast(med))
        .select(
            "n_months",
            "n_pairs",
            "s_stat",
            (
                F.col("n_months")
                * (F.col("n_months") - 1)
                * (2 * F.col("n_months") + 5)
                - F.col("tt")
            )
            .cast("long")
            .alias("var_num"),
            F.floor(F.col("median_slope") * 1000 + F.lit(0.5))
            .cast("long")
            .alias("slope_milli_cents"),
        )
    )


_MED2P_BUCKETS = 8192


@query(
    "agg_median_two_pass",
    oracle="""
    WITH c AS (
      SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem)
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(2 * median(cents) AS BIGINT) AS median_x2
    FROM c
    """,
)
def agg_median_two_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT median by DISTRIBUTED SELECTION — the algorithm that
    replaces `percentile()` when the column no longer fits one task's
    sort buffer: pass 1 histograms the value domain into
    {_MED2P_BUCKETS} equal-width buckets (one map-side-combined
    aggregate; only the bounded bucket-count frame reaches the driver),
    the driver walks the cumulative counts to the bucket(s) holding the
    two middle order statistics, and pass 2 re-scans ONLY those buckets
    (a pushed-down range predicate on the cents column) and extracts
    the k-th smallest values with TakeOrdered heaps (orderBy + limit —
    per-task k-heaps + driver merge, NEVER a global sort). Exactness
    falls out because the second pass is exact within the narrowed
    slice; `agg_percentiles`' single-pass `percentile()` is the
    convenience form, this is the form that survives a 100 TB column
    (narrowed slice ≈ n/{_MED2P_BUCKETS}; recurse the same narrowing if
    a slice is still too fat — one extra pass per 8192× reduction).

    Determinism: pure int64-cent domain — bucket arithmetic, cumulative
    walk, and the middle-pair sum (median×2 stays integral for even n)
    are all exact; the oracle's interpolating median equals
    (k1th + k2th)/2 identically."""
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    vals = load(spark, sf_dir, "lineitem").select(cents.alias("c"))
    lo, hi, n = (
        vals.agg(F.min("c"), F.max("c"), F.count("*")).collect()[0]
    )  # bounded: 3 scalars
    width = max(1, (hi - lo + _MED2P_BUCKETS) // _MED2P_BUCKETS)
    # exact INTEGER division for pass-1 bucketing so it shares identical
    # semantics with pass 2's integer slice bounds — float `/` could
    # round a boundary value into the adjacent bucket at extreme domain
    # widths (≳1e12), silently corrupting the narrowing
    hist = (
        vals.groupBy(F.expr(f"(c - {lo}) div {width}").alias("b"))
        .agg(F.count("*").alias("cnt"))
        .orderBy("b")
        .collect()
    )  # bounded: <= _MED2P_BUCKETS rows
    k1, k2 = (n + 1) // 2, (n + 2) // 2
    cum = 0
    b1 = b2 = None
    off1 = off2 = None
    for r in hist:
        if b1 is None and cum + r.cnt >= k1:
            b1, off1 = r.b, k1 - cum
        if cum + r.cnt >= k2:
            b2, off2 = r.b, k2 - cum
            break
        cum += r.cnt
    # b2 may sit several buckets past b1 when the middles straddle a
    # run of EMPTY buckets (k2 = k1+1 lands in the first non-empty
    # bucket after b1, so everything strictly between is empty by
    # construction) — the slice below spans the gap, which adds no rows
    assert b1 is not None and b2 is not None and b2 >= b1
    # pass 2: only the narrowed bucket range is re-read — the range
    # predicate pushes into the parquet scan
    slice_lo = lo + b1 * width
    slice_hi = lo + (b2 + 1) * width
    narrowed = vals.filter(
        (F.col("c") >= slice_lo) & (F.col("c") < slice_hi)
    )
    # k-th smallest inside the slice via TakeOrdered (heap, no sort)
    if b1 == b2:
        local_k1, local_k2 = off1, off2
    else:
        # middles straddle bucket b1's upper edge: k1-th is the max of
        # bucket b1, k2-th is the (off2)-th of bucket b2; buckets
        # between b1 and b2 are empty, so only b1's count shifts off2
        local_k1 = off1
        local_k2 = off2 + sum(r.cnt for r in hist if r.b == b1)
    k1th = (
        narrowed.orderBy("c").limit(int(local_k1)).agg(F.max("c")).collect()[0][0]
    )
    k2th = (
        narrowed.orderBy("c").limit(int(local_k2)).agg(F.max("c")).collect()[0][0]
    )
    return spark.createDataFrame(
        [(int(n), int(k1th + k2th))], "n long, median_x2 long"
    )
