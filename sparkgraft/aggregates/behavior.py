"""aggregates.behavior — split from the flat aggregates.py (r7); operator bodies unchanged, see the package __init__."""


from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query


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
    from ..ranking import with_global_rank

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
    from ..ranking import with_global_rank

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


