"""Window-function operators (SURVEY.md §2.5).

Every window here is partitioned by a real key (custkey / user_id) — never
an empty ``Window.orderBy`` over the whole table, which would serialize
into one task at scale (global ordering goes through ranking.py instead).

Frames are always written out explicitly: default frames for
first_value/last_value differ across engines (SURVEY.md §5.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load
from .registry import query


@query(
    "win_row_number_topn",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
)
def win_row_number_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — the secondary-sort canon. One shuffle on
    the partition key; per-group sort is local. Unique orderkey tie-break
    keeps the cut deterministic."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        load(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


@query(
    "win_rank_dense",
    oracle="""
    SELECT o_orderpriority, o_orderkey,
           rank()         OVER w AS rnk,
           dense_rank()   OVER w AS drnk,
           percent_rank() OVER w AS prnk,
           ntile(4)       OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family over one shared window definition."""
    w = Window.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return load(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        # percent_rank = (rank-1)/(n-1): integer operands, one division —
        # bit-identical across engines, safe unrounded.
        F.percent_rank().over(w).alias("prnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "win_lag_lead_delta",
    oracle="""
    SELECT event_id, user_id, ts,
           epoch_us(ts) - lag(epoch_us(ts)) OVER w  AS gap_us,
           lead(event_id) OVER w                    AS next_event
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_lag_lead_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gap — the sessionization building block. Gap in
    integer microseconds (exact in both engines; interval types are not
    dialect-portable)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    return load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        (us - F.lag(us).over(w)).alias("gap_us"),
        F.lead("event_id").over(w).alias("next_event"),
    )


@query(
    "win_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_total,
           count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS n_so_far
    FROM orders
    """,
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue per customer. Rounded: window sums are NOT
    plain left-folds in every engine (DuckDB aggregates frames via a
    segment tree), so prefix values drift in the last ulp."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
        F.count("*").over(w).alias("n_so_far"),
    )


@query(
    "win_sliding_avg",
    oracle="""
    SELECT event_id, user_id,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6)
             AS avg_5
    FROM events
    """,
)
def win_sliding_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving average over the trailing 5 rows. Rounded: sliding frames are
    where engines differ internally (Spark re-aggregates per frame, DuckDB
    uses segment trees — different summation order, last-ulp drift)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    return load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 6).alias("avg_5"),
    )


@query(
    "win_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                          RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW)
             AS n_within_50k
    FROM orders
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame on a value axis: how many of the customer's orders fall
    within 50k below this one. count → integer, no float drift."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-50000, Window.currentRow)
    )
    return load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.count("*").over(w).alias("n_within_50k"),
    )


@query(
    "win_first_last",
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS first_order,
           last_value(o_orderkey)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_order
    FROM orders
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last value with the frame PINNED to the whole partition —
    the default frame (… AND CURRENT ROW) makes last_value echo the
    current row, a classic cross-engine trap."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
    )


# Session gap threshold shared by the batch operator and (later) the
# streaming session-window twin (SURVEY.md §2.9).
SESSION_GAP_MINUTES = 30


@query(
    "win_session_ids",
    oracle=f"""
    SELECT event_id, user_id, ts,
           (sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
             AS session_id
    FROM (
      SELECT event_id, user_id, ts,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > {SESSION_GAP_MINUTES} * 60 * 1000000
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events) t
    """,
)
def win_session_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization: flag a session start when the gap
    to the previous event exceeds 30 min, then a running sum of flags
    numbers the sessions 1..k per user. This batch query is the oracle for
    the streaming session_window operator (§2.9)."""
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    w = Window.partitionBy("user_id").orderBy(*order)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    is_new = F.when(
        gap.isNull() | (gap > SESSION_GAP_MINUTES * 60 * 1_000_000), 1
    ).otherwise(0)
    return (
        load(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts", is_new.alias("is_new"))
        .withColumn("session_id", F.sum("is_new").over(wsum))
        .select("event_id", "user_id", "ts", "session_id")
    )


@query(
    "win_cume_dist",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           round(cume_dist() OVER (PARTITION BY o_orderstatus
                                   ORDER BY o_totalprice, o_orderkey), 8) AS cd
    FROM orders
    """,
)
def win_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distribution per partition — the remaining member of the
    ranking family; the (price, unique key) order pins every tie."""
    from pyspark.sql import Window as W

    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.cume_dist().over(w), 8).alias("cd"),
    )


@query(
    "win_ntile",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           ntile(4) OVER (PARTITION BY o_orderpriority
                          ORDER BY o_totalprice DESC, o_orderkey) AS price_quartile
    FROM orders
    """,
)
def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency quartiles per priority class — the curriculum /
    quality-binning primitive of a training-data pipeline ("take the top
    quartile of each stratum"). NTILE's first (n mod 4) tiles take the
    extra row in both engines, and the (price desc, unique key) order
    pins every tie, so the assignment is deterministic and
    dialect-stable."""
    from pyspark.sql import Window as W

    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("price_quartile"),
    )


@query(
    "win_percent_rank",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           round(percent_rank() OVER (PARTITION BY o_orderstatus
                                      ORDER BY o_totalprice, o_orderkey), 8) AS pr
    FROM orders
    """,
)
def win_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(rank-1)/(n-1) relative rank — completes the ranking family next
    to rank/dense_rank/cume_dist/ntile; the (price, unique key) order
    pins every tie, and rounding both sides absorbs the division's last
    ulp."""
    from pyspark.sql import Window as W

    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.percent_rank().over(w), 8).alias("pr"),
    )


@query(
    "win_gaps_islands",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn_all,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn_type
      FROM events),
    islands AS (
      SELECT user_id, event_type, count(*)::BIGINT AS run_len
      FROM ordered
      GROUP BY user_id, event_type, rn_all - rn_type)
    SELECT event_type, run_len, count(*)::BIGINT AS n_runs
    FROM islands
    GROUP BY event_type, run_len
    ORDER BY event_type, run_len
    """,
)
def win_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of consecutive same-type events per
    user (the classic Tabibito/row_number-difference construction —
    rn_overall − rn_within_type is constant exactly along one run), then
    the run-length distribution per type. Both windows partition on
    user_id, so the shuffle is keyed and skew-bounded; no self-join, no
    lag-cascade — two ranks and two hash aggregates end to end."""
    e = load(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    islands = (
        e.select(
            "user_id",
            "event_type",
            (F.row_number().over(w_all) - F.row_number().over(w_type)).alias("grp"),
        )
        .groupBy("user_id", "event_type", "grp")
        .agg(F.count("*").alias("run_len"))
    )
    return (
        islands.groupBy("event_type", "run_len")
        .agg(F.count("*").alias("n_runs"))
        .orderBy("event_type", "run_len")
    )


@query(
    "dedup_cdc_latest",
    oracle="""
    WITH r AS (
      SELECT user_id, event_type, event_id, ts, value,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    SELECT user_id, event_type, event_id AS last_event_id,
           epoch_us(ts)::BIGINT AS last_ts_us, value AS last_value
    FROM r WHERE rn = 1
    """,
)
def dedup_cdc_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC log compaction: collapse an append-only change stream to the
    latest record per (user, event_type) key — the materialize-current-
    state step every incremental ETL runs. One keyed window shuffle
    carrying only the projected columns; ties broken by event_id so the
    survivor is deterministic. The timestamp is surfaced as epoch
    MICROseconds (bigint) on both engines — the µs-vs-ns-safe carrier
    for this corpus (SURVEY §5.3). At 100 TB this is the same plan:
    shuffle by key, one pass per partition, no driver state."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.select("user_id", "event_type", "event_id", "ts", "value")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("last_event_id"),
            F.unix_micros("ts").alias("last_ts_us"),
            F.col("value").alias("last_value"),
        )
    )


@query(
    "win_session_stats",
    oracle=f"""
    WITH flagged AS (
      SELECT event_id, user_id, ts, value,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > {SESSION_GAP_MINUTES} * 60 * 1000000
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events),
    sess AS (
      SELECT user_id, value, ts,
             (sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
               AS session_id
      FROM flagged)
    SELECT user_id, session_id,
           count(*)::BIGINT AS n_events,
           (max(epoch_us(ts)) - min(epoch_us(ts)))::BIGINT AS duration_us,
           round(sum(value), 6) AS total_value
    FROM sess GROUP BY user_id, session_id
    """,
)
def win_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-level rollup — the table sessionization actually exists to
    produce: per (user, session) event count, wall duration, and value
    total. Builds the same gaps-and-islands ids as win_session_ids, then
    one hash aggregate on the session key. Both windows and the final
    aggregate shuffle on user_id, so the whole pipeline is ONE exchange
    reused across stages (Catalyst sees the shared partitioning) —
    exactly how per-session features are computed over a 100 TB event
    log. Duration is epoch-µs arithmetic on both engines."""
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    w = Window.partitionBy("user_id").orderBy(*order)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    is_new = F.when(
        gap.isNull() | (gap > SESSION_GAP_MINUTES * 60 * 1_000_000), 1
    ).otherwise(0)
    sess = (
        load(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts", "value")
        .withColumn("session_id", F.sum(is_new).over(wsum))
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))).alias(
                "duration_us"
            ),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )


@query(
    "win_sliding_minmax",
    oracle="""
    SELECT user_id, event_id,
           round(min(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6)
             AS min_5,
           round(max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6)
             AS max_5
    FROM events
    """,
)
def win_sliding_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding min/max over the last 5 events per user — the monotonic-
    envelope primitive behind spike/drop detection on metric streams.
    Rows-frame extrema are exact (no float accumulation at all — min and
    max are selections), one keyed window shuffle, per-partition
    single-pass evaluation."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-4, Window.currentRow)
    )
    return load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.round(F.min("value").over(w), 6).alias("min_5"),
        F.round(F.max("value").over(w), 6).alias("max_5"),
    )


@query(
    "win_zscore_anomaly",
    oracle="""
    WITH stats AS (
      SELECT event_id, user_id, value,
             avg(value) OVER (PARTITION BY user_id) AS mu,
             stddev_pop(value) OVER (PARTITION BY user_id) AS sigma,
             count(*) OVER (PARTITION BY user_id) AS n_user
      FROM events)
    SELECT event_id, user_id,
           round((value - mu) / sigma, 4) + 0.0 AS zscore,
           (abs(value - mu) > 3 * sigma) AS is_anomaly
    FROM stats
    WHERE n_user >= 2 AND sigma > 0
    """,
)
def win_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score anomaly flags — the metric-outlier screen run
    before events feed a model. Population mean/stddev come from ONE
    unordered keyed window (whole-partition frame: computed once per
    user, no sort needed), the z and the 3σ flag are row-local. The
    anomaly PREDICATE compares |value−µ| against 3σ directly — never
    the rounded z — so the boolean is identical on both engines even
    when a z sits on the rounding boundary. Degenerate users (single
    event or zero variance) are excluded on both sides."""
    w = Window.partitionBy("user_id")
    mu = F.avg("value").over(w)
    sigma = F.stddev_pop("value").over(w)
    n_user = F.count("*").over(w)
    return (
        load(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            "value",
            mu.alias("mu"),
            sigma.alias("sigma"),
            n_user.alias("n_user"),
        )
        .filter((F.col("n_user") >= 2) & (F.col("sigma") > 0))
        .select(
            "event_id",
            "user_id",
            (
                # + 0.0 folds IEEE -0.0 to +0.0 on both engines — a value
                # an ulp below its user mean rounds to negative zero
                # (surfaced by the sf0.1 robustness sweep, r4)
                F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 4)
                + F.lit(0.0)
            ).alias("zscore"),
            (
                F.abs(F.col("value") - F.col("mu")) > 3 * F.col("sigma")
            ).alias("is_anomaly"),
        )
    )


@query(
    "win_ewma",
    oracle="""
    WITH lagged AS (
      SELECT event_id, user_id, value,
             lag(value, 1) OVER w AS l1, lag(value, 2) OVER w AS l2,
             lag(value, 3) OVER w AS l3, lag(value, 4) OVER w AS l4,
             lag(value, 5) OVER w AS l5, lag(value, 6) OVER w AS l6,
             lag(value, 7) OVER w AS l7
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT event_id, user_id, value,
           round((value
                  + 0.5 * COALESCE(l1, 0) + 0.25 * COALESCE(l2, 0)
                  + 0.125 * COALESCE(l3, 0) + 0.0625 * COALESCE(l4, 0)
                  + 0.03125 * COALESCE(l5, 0) + 0.015625 * COALESCE(l6, 0)
                  + 0.0078125 * COALESCE(l7, 0))
                 /
                 (1.0
                  + 0.5 * (CASE WHEN l1 IS NULL THEN 0 ELSE 1 END)
                  + 0.25 * (CASE WHEN l2 IS NULL THEN 0 ELSE 1 END)
                  + 0.125 * (CASE WHEN l3 IS NULL THEN 0 ELSE 1 END)
                  + 0.0625 * (CASE WHEN l4 IS NULL THEN 0 ELSE 1 END)
                  + 0.03125 * (CASE WHEN l5 IS NULL THEN 0 ELSE 1 END)
                  + 0.015625 * (CASE WHEN l6 IS NULL THEN 0 ELSE 1 END)
                  + 0.0078125 * (CASE WHEN l7 IS NULL THEN 0 ELSE 1 END)),
                 6) AS ewma_8
    FROM lagged
    """,
)
def win_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (α=0.5) over each user's last
    8 events — the smoothing pass behind metric dashboards and drift
    monitors. True EWMA is a recursion Spark can't vectorize, so this is
    the standard bounded-horizon expansion: 8 explicit lag() terms with
    geometric weights 0.5^k, renormalized over the lags that exist at the
    head of each series. All terms come from ONE ordered keyed window (one
    shuffle on user_id, local sort), the weighted sum is row-local
    whole-stage-codegen arithmetic written in the identical left-to-right
    IEEE order as the oracle. The dropped tail weight is 0.5^8 ≈ 0.4 % —
    the usual dashboard tolerance."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lags = [F.lag("value", k).over(w) for k in range(1, 8)]
    weights = [0.5 ** k for k in range(1, 8)]
    num = F.col("value")
    den = F.lit(1.0)
    for lk, wk in zip(lags, weights):
        num = num + F.lit(wk) * F.coalesce(lk, F.lit(0.0))
        den = den + F.lit(wk) * F.when(lk.isNull(), F.lit(0.0)).otherwise(F.lit(1.0))
    return load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "value",
        F.round(num / den, 6).alias("ewma_8"),
    )


@query(
    "win_cumulative_users",
    oracle="""
    WITH firsts AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS day FROM events GROUP BY user_id),
    new_by_day AS (
      SELECT day, count(*) AS new_users FROM firsts GROUP BY day),
    daily AS (
      SELECT CAST(ts AS DATE) AS day, count(DISTINCT user_id) AS dau
      FROM events GROUP BY CAST(ts AS DATE))
    SELECT CAST(d.day AS VARCHAR(10)) AS day, d.dau,
           CAST(COALESCE(n.new_users, 0) AS BIGINT) AS new_users,
           CAST(sum(COALESCE(n.new_users, 0)) OVER (
             ORDER BY d.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_users
    FROM daily d LEFT JOIN new_by_day n ON d.day = n.day
    ORDER BY d.day
    """,
)
def win_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users by day — the growth-curve query. A naive
    running COUNT(DISTINCT) over an expanding frame re-scans every prefix
    (O(days·N)); the scalable identity is first-seen attribution: each
    user contributes to exactly one day (their min day), so the cumulative
    distinct count is a running SUM of per-day first-timer counts. Two
    hash aggregates keyed on high-cardinality columns do the heavy
    lifting; the final window orders DAYS — calendar-bounded cardinality,
    immune to corpus growth — so its single-task frame is safe at 100 TB."""
    ev = load(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    firsts = ev.groupBy("user_id").agg(F.min("day").alias("day"))
    new_by_day = firsts.groupBy("day").agg(F.count("*").alias("new_users"))
    daily = ev.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        daily.join(new_by_day, "day", "left")
        .select(
            "day",
            "dau",
            F.coalesce("new_users", F.lit(0)).alias("new_users"),
        )
        .withColumn("cum_users", F.sum("new_users").over(w))
        .orderBy("day")
        .withColumn("day", F.col("day").cast("string"))
    )


@query(
    "win_rolling_corr",
    oracle="""
    WITH lagged AS (
      SELECT event_id, user_id, value,
             lag(value, 1) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_value
      FROM events)
    SELECT event_id, user_id,
           round(corr(value, prev_value) OVER (
             PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 4) + 0.0
             AS autocorr_10
    FROM lagged
    WHERE prev_value IS NOT NULL
    """,
)
def win_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling lag-1 autocorrelation of each user's metric over a 10-row
    trailing frame — the drift / regime-change detector run over metric
    streams. Two ordered keyed windows on the SAME user_id partitioning
    (Catalyst plans one exchange): lag() materializes the shifted series,
    then corr() — a five-moment aggregate — runs over the bounded frame,
    so state per row is O(1) and nothing re-scans. Head rows without a
    predecessor are excluded on both sides before the frame, keeping the
    window contents identical."""
    w_lag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_corr = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(-9, Window.currentRow)
    )
    return (
        load(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            "value",
            F.lag("value", 1).over(w_lag).alias("prev_value"),
        )
        .filter(F.col("prev_value").isNotNull())
        .select(
            "event_id",
            "user_id",
            (
                # + 0.0 folds IEEE -0.0 to +0.0 on both engines — a
                # window corr of constant values can round to either zero
                F.round(F.corr("value", "prev_value").over(w_corr), 4)
                + F.lit(0.0)
            ).alias("autocorr_10"),
        )
    )


@query(
    "win_forward_fill",
    oracle="""
    SELECT event_id, user_id,
           last_value(purchase_value IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS last_purchase_value
    FROM (SELECT event_id, user_id, ts,
                 CASE WHEN event_type = 'purchase' THEN value END
                   AS purchase_value
          FROM events) t
    """,
)
def win_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill (last-observation-carried-forward): every event gets
    the user's most recent purchase amount — the gap-filling pass behind
    sessionized feature tables and sparse sensor streams. The sparse
    column is masked row-local, then ONE ordered keyed window with
    last(ignorenulls) over the expanding frame carries it forward; Spark
    evaluates the frame incrementally (O(1) state per row), and the raw
    double is carried unrounded, so both engines emit bit-identical
    values."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    masked = F.when(F.col("event_type") == "purchase", F.col("value"))
    return load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.last(masked, ignorenulls=True).over(w).alias("last_purchase_value"),
    )


@query(
    "win_rolling_median",
    oracle="""
    SELECT event_id, user_id,
           round(quantile_cont(value, 0.5) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 6) AS med_10,
           round(quantile_cont(value, 0.9) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 6) AS p90_10
    FROM events
    """,
)
def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling exact median + p90 over a trailing 10-row frame per user —
    the robust-smoothing twin of `win_sliding_avg` (a median shrugs off
    the value spikes that drag a mean, which is why alerting pipelines
    trend on it). `percentile` is a true aggregate in Spark, so it rides
    the ordered keyed window like any frame aggregate: one shuffle on
    user_id, O(frame) per row, no self-join fan-out. Both engines use
    linear interpolation between order statistics (Spark `percentile` ≡
    DuckDB `quantile_cont`), rounded to absorb last-ulp interpolation
    drift."""
    frame = "ROWS BETWEEN 9 PRECEDING AND CURRENT ROW"
    over = f"OVER (PARTITION BY user_id ORDER BY ts, event_id {frame})"
    return load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.round(F.expr(f"percentile(value, 0.5) {over}"), 6).alias("med_10"),
        F.round(F.expr(f"percentile(value, 0.9) {over}"), 6).alias("p90_10"),
    )


@query(
    "win_time_weighted_avg",
    oracle="""
    WITH seg AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(round(value * 100) AS BIGINT) AS v100,
             lead(epoch_us(ts)) OVER (
               PARTITION BY user_id, CAST(ts AS DATE)
               ORDER BY ts, event_id) - epoch_us(ts) AS dt_us
      FROM events)
    SELECT user_id, CAST(day AS VARCHAR(10)) AS day,
           count(*) AS n_segments,
           CAST(sum(dt_us) AS BIGINT) AS held_us,
           round(sum(v100 * dt_us) / (100.0 * sum(dt_us)), 6) AS twa_value
    FROM seg
    WHERE dt_us IS NOT NULL
    GROUP BY user_id, day
    HAVING sum(dt_us) > 0
    ORDER BY user_id, day
    """,
)
def win_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per (user, day) over an irregular event
    series — the metric a plain AVG gets wrong whenever sampling is
    bursty (ten readings in one minute must not outvote one reading that
    held for an hour). LOCF weighting: each value holds from its event
    until the user's next event that day (lead() over ONE ordered keyed
    window — a single user_id+day shuffle), the day's last observation
    carries no weight. The weighted sum is computed in integer space —
    value is exact cents, duration exact microseconds, so sum(v100·dt_us)
    accumulates as int64 with no float-order sensitivity — and only the
    final divide is floating point, one operation, bit-identical across
    engines. Per-group state is one running int64 pair: safe at any
    corpus size."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").alias("day"),
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("v100"),
    )
    w = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    seg = ev.withColumn(
        "dt_us", F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts")
    ).filter(F.col("dt_us").isNotNull())
    return (
        seg.groupBy("user_id", "day")
        .agg(
            F.count("*").alias("n_segments"),
            F.sum("dt_us").alias("held_us"),
            F.sum(F.col("v100") * F.col("dt_us")).alias("num"),
        )
        .filter(F.col("held_us") > 0)
        .select(
            "user_id",
            F.col("day").cast("string").alias("day"),
            "n_segments",
            "held_us",
            F.round(F.col("num") / (100.0 * F.col("held_us")), 6).alias("twa_value"),
        )
        .orderBy("user_id", "day")
    )


@query(
    "win_streak_longest",
    oracle="""
    WITH du AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    n AS (
      SELECT user_id, day,
             datediff('day', DATE '1970-01-01', day)
             - row_number() OVER (PARTITION BY user_id ORDER BY day) AS isl
      FROM du),
    s AS (SELECT user_id, isl, count(*) AS len FROM n GROUP BY user_id, isl)
    SELECT user_id, CAST(max(len) AS BIGINT) AS longest_streak,
           CAST(sum(len) AS BIGINT) AS active_days
    FROM s GROUP BY user_id ORDER BY user_id
    """,
)
def win_streak_longest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the engagement
    metric every retention team asks for. Classic gaps-and-islands: the
    corpus first collapses to DISTINCT (user, day) — the only
    corpus-sized shuffle — then day-number minus row_number is constant
    within a run of consecutive days, so a hash aggregate on that island
    key yields streak lengths without comparing neighbouring rows. The
    window partitions by user and holds at most one row per calendar
    day, so its size is calendar-bounded regardless of event volume."""
    du = (
        load(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    n = du.select(
        "user_id",
        (F.datediff("day", F.lit("1970-01-01")) - F.row_number().over(w)).alias(
            "isl"
        ),
    )
    s = n.groupBy("user_id", "isl").agg(F.count("*").alias("len"))
    return (
        s.groupBy("user_id")
        .agg(
            F.max("len").cast("long").alias("longest_streak"),
            F.sum("len").cast("long").alias("active_days"),
        )
        .orderBy("user_id")
    )


@query(
    "win_drawdown_max",
    oracle="""
    WITH s AS (
      SELECT user_id, ts, event_id,
             sum(CAST(round(value * 100) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM events),
    r AS (
      SELECT user_id, cum,
             max(cum) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
      FROM s)
    SELECT user_id,
           round(max(peak - cum) / 100.0, 2) AS max_drawdown,
           round(max(peak) / 100.0, 2) AS peak_value
    FROM r GROUP BY user_id ORDER BY user_id
    """,
)
def win_drawdown_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of each user's cumulative metric series (largest
    peak-to-trough drop of the running cent sum, ordered by time) — the
    risk statistic for any monotone-hope curve: engagement scores, ad
    spend, account balance. Two ordered windows on the SAME per-user
    partitioning (one exchange, Catalyst folds them): a running int64
    cent sum, then a running max of that sum; the drawdown is their
    row-local difference and everything stays exact-integer until the
    final divide. Per-user partitions are one user's history — never
    corpus-sized. Ordering pinned by (ts, event_id)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.sum(F.round(F.col("value") * 100).cast("long")).over(w).alias("cum"),
    )
    r = s.select(
        "user_id",
        "cum",
        F.max("cum").over(w).alias("peak"),
    )
    return (
        r.groupBy("user_id")
        .agg(
            F.round(F.max(F.col("peak") - F.col("cum")) / 100.0, 2).alias(
                "max_drawdown"
            ),
            F.round(F.max("peak") / 100.0, 2).alias("peak_value"),
        )
        .orderBy("user_id")
    )


@query(
    "win_rank_delta",
    oracle="""
    WITH wk AS (
      SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS wi,
             event_type, count(*) AS cnt
      FROM events GROUP BY 1, 2),
    rk AS (
      SELECT wi, event_type, cnt,
             row_number() OVER (PARTITION BY wi
                                ORDER BY cnt DESC, event_type) AS rnk
      FROM wk),
    dl AS (
      SELECT wi, event_type, cnt, rnk,
             lag(rnk) OVER (PARTITION BY event_type ORDER BY wi) AS prev_rnk
      FROM rk)
    SELECT strftime(DATE '1970-01-01' + CAST(wi * 7 AS INT), '%Y-%m-%d')
             AS week_start,
           event_type, CAST(cnt AS BIGINT) AS cnt,
           CAST(rnk AS BIGINT) AS rnk,
           CAST(COALESCE(prev_rnk - rnk, 0) AS BIGINT) AS rank_delta
    FROM dl ORDER BY week_start, rnk
    """,
)
def win_rank_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly leaderboard movement: each event type's rank by volume
    within the week, and how many places it moved since the previous
    week (positive = climbed) — the trending-categories query. The
    corpus collapses to one (week, type) hash aggregate; both windows
    then run over BOUNDED partitions (≤ |types| rows per week for the
    rank, ≤ |weeks| rows per type for the lag), so there is no
    corpus-sized window state anywhere. Rank ties are pinned by
    (cnt DESC, event_type); first-week deltas are zero-filled."""
    wk = (
        load(spark, sf_dir, "events")
        .groupBy(
            F.expr(
                "datediff(CAST(ts AS DATE), DATE '1970-01-01') div 7"
            ).alias("wi"),
            "event_type",
        )
        .agg(F.count("*").alias("cnt"))
    )
    rk = wk.withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("wi").orderBy(F.desc("cnt"), "event_type")
        ),
    )
    dl = rk.withColumn(
        "prev_rnk",
        F.lag("rnk").over(Window.partitionBy("event_type").orderBy("wi")),
    )
    return dl.select(
        F.expr(
            "date_format(date_add(DATE '1970-01-01', CAST(wi * 7 AS INT)),"
            " 'yyyy-MM-dd')"
        ).alias("week_start"),
        "event_type",
        F.col("cnt").cast("long").alias("cnt"),
        F.col("rnk").cast("long").alias("rnk"),
        F.coalesce(F.col("prev_rnk") - F.col("rnk"), F.lit(0))
        .cast("long")
        .alias("rank_delta"),
    ).orderBy("week_start", "rnk")


@query(
    "win_pareto_days",
    oracle="""
    WITH d AS (
      SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev
      FROM orders GROUP BY 1, 2),
    r AS (
      SELECT priority, rev,
             row_number() OVER (PARTITION BY priority
                                ORDER BY rev DESC, day) AS i,
             sum(rev) OVER (PARTITION BY priority
                            ORDER BY rev DESC, day
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             sum(rev) OVER (PARTITION BY priority) AS tot,
             count(*) OVER (PARTITION BY priority) AS n
      FROM d),
    hit AS (
      SELECT priority, i, n, cum * 1.0 / tot AS cumshare
      FROM r WHERE cum * 1.0 / tot >= 0.8)
    SELECT priority,
           CAST(max(n) AS BIGINT) AS total_days,
           CAST(min(i) AS BIGINT) AS k_days_80,
           round(min_by(cumshare, i), 6) AS share_at_k
    FROM hit GROUP BY priority ORDER BY priority
    """,
)
def win_pareto_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration: the smallest number of (highest-revenue)
    calendar days that cover ≥ 80 % of each priority's revenue — the
    "how concentrated is demand" readout that pairs with
    ``agg_gini_daily``. Same scale shape as Gini: one corpus-sized hash
    aggregate to (priority, day) cent sums, then rank/cumsum windows
    over CALENDAR-bounded partitions. Cumulative sums stay exact int64;
    the share is one float divide, identical both sides, and the
    boundary row is picked by min_by on the pinned (rev DESC, day)
    order."""
    o = load(spark, sf_dir, "orders")
    d = (
        o.groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.to_date("o_orderdate").alias("day"),
        )
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev"))
    )
    wo = Window.partitionBy("priority").orderBy(F.desc("rev"), "day")
    wp = Window.partitionBy("priority")
    r = d.select(
        "priority",
        "rev",
        F.row_number().over(wo).alias("i"),
        F.sum("rev")
        .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
        F.sum("rev").over(wp).alias("tot"),
        F.count("*").over(wp).alias("n"),
    )
    hit = r.select(
        "priority", "i", "n", (F.col("cum") * 1.0 / F.col("tot")).alias("cumshare")
    ).filter(F.col("cumshare") >= 0.8)
    return (
        hit.groupBy("priority")
        .agg(
            F.max("n").cast("long").alias("total_days"),
            F.min("i").cast("long").alias("k_days_80"),
            F.round(F.min_by("cumshare", "i"), 6).alias("share_at_k"),
        )
        .orderBy("priority")
    )


@query(
    "win_gap_regularity",
    oracle="""
    WITH g AS (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events),
    s AS (
      SELECT user_id, count(*) AS n_gaps,
             avg(gap_us) AS mean_us, stddev_samp(gap_us) AS sd_us
      FROM g WHERE gap_us IS NOT NULL
      GROUP BY user_id HAVING count(*) >= 5)
    SELECT user_id, CAST(n_gaps AS BIGINT) AS n_gaps,
           round(mean_us / 1e6, 3) AS mean_gap_sec,
           round(sd_us / mean_us, 6) AS gap_cv,
           (sd_us / mean_us < 0.1) AS suspiciously_regular
    FROM s ORDER BY user_id
    """,
)
def win_gap_regularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap regularity per user: coefficient of variation of
    the gaps (σ/μ) — the bot detector's first cut, since humans are
    bursty (CV ≈ 1+) and schedulers are metronomes (CV → 0). One lag()
    over per-user ordered windows produces exact integer-µs gaps; the
    CV comes from a streaming-moment hash aggregate. Users with < 5
    gaps are excluded (CV of a handful of points is noise). The
    boundary flag compares the same IEEE expression both sides."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    g = load(spark, sf_dir, "events").select(
        "user_id", (us - F.lag(us).over(w)).alias("gap_us")
    )
    s = (
        g.filter(F.col("gap_us").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_gaps"),
            F.avg("gap_us").alias("mean_us"),
            F.stddev_samp("gap_us").alias("sd_us"),
        )
        .filter(F.col("n_gaps") >= 5)
    )
    cv = F.col("sd_us") / F.col("mean_us")
    return s.select(
        "user_id",
        F.col("n_gaps").cast("long").alias("n_gaps"),
        F.round(F.col("mean_us") / 1e6, 3).alias("mean_gap_sec"),
        F.round(cv, 6).alias("gap_cv"),
        (cv < 0.1).alias("suspiciously_regular"),
    ).orderBy("user_id")


@query(
    "win_cusum_shift",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             sum(CAST(round(value * 100) AS BIGINT)) AS cents
      FROM events GROUP BY event_type, CAST(ts AS DATE)),
    tot AS (
      SELECT event_type, day, cents,
             sum(cents) OVER (PARTITION BY event_type) AS s,
             count(*)   OVER (PARTITION BY event_type) AS n,
             sum(cents) OVER (PARTITION BY event_type ORDER BY day
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS prefix,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS t
      FROM daily),
    scored AS (
      SELECT event_type, day, n,
             abs(n * prefix - t * s) AS a
      FROM tot),
    mx AS (
      SELECT event_type, max(a) AS mx_a, any_value(n) AS n
      FROM scored GROUP BY event_type)
    SELECT m.event_type,
           strftime(min(s.day), '%Y-%m-%d') AS shift_day,
           round(CAST(m.mx_a AS DOUBLE)
                 / (CAST(m.n AS DOUBLE) * 100.0), 2) AS max_abs_cusum,
           CAST(m.n AS BIGINT) AS n_days
    FROM mx m JOIN scored s
      ON s.event_type = m.event_type AND s.a = m.mx_a
    GROUP BY m.event_type, m.mx_a, m.n ORDER BY m.event_type
    """,
)
def win_cusum_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection per event type: the day where the
    cumulative sum of deviations from the series mean peaks — the
    standard level-shift locator for metric monitoring. EXACT integer
    arithmetic end to end: daily totals are int64 cents, and instead of
    subtracting the (fractional) mean per step, the cusum is kept in the
    cross-multiplied form n·prefix_t − t·S (all int64, exact), whose
    argmax is identical to argmax |prefix_t − t·S/n|; the floating
    divide happens once, on the final reported maximum. Scale: one hash
    aggregate to (type, day) cents — the only corpus-sized shuffle —
    then every window runs keyed by event_type over calendar-bounded
    daily rows (≤ types × days), never over raw events."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
    )
    wk = Window.partitionBy("event_type")
    wo = wk.orderBy("day")
    scored = daily.select(
        "event_type",
        "day",
        F.count("*").over(wk).alias("n"),
        (
            F.count("*").over(wk)
            * F.sum("cents").over(wo.rowsBetween(Window.unboundedPreceding, 0))
            - F.row_number().over(wo) * F.sum("cents").over(wk)
        ).alias("cusum_scaled"),
    )
    return (
        scored.groupBy("event_type")
        .agg(
            F.date_format(
                F.min_by(
                    "day",
                    F.struct(
                        (-F.abs(F.col("cusum_scaled"))).alias("neg"),
                        F.col("day").alias("d"),
                    ),
                ),
                "yyyy-MM-dd",
            ).alias("shift_day"),
            F.round(
                F.max(F.abs("cusum_scaled")).cast("double")
                / (F.any_value("n").cast("double") * 100.0),
                2,
            ).alias("max_abs_cusum"),
            F.any_value("n").cast("long").alias("n_days"),
        )
        .orderBy("event_type")
    )


@query(
    "win_seasonal_trend",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders GROUP BY CAST(o_orderdate AS DATE)),
    sm AS (
      SELECT day, cents,
             sum(cents) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING
                              AND 3 FOLLOWING) AS wsum,
             count(*)   OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING
                              AND 3 FOLLOWING) AS wcnt
      FROM daily)
    SELECT strftime(day, '%Y-%m-%d') AS day,
           round(CAST(cents AS DOUBLE) / 100.0, 2) AS revenue,
           round(CAST(wsum AS DOUBLE) / (CAST(wcnt AS DOUBLE) * 100.0), 2)
             AS trend,
           round(CAST(cents AS DOUBLE) / 100.0
                 - CAST(wsum AS DOUBLE) / (CAST(wcnt AS DOUBLE) * 100.0), 2)
             AS detrended
    FROM sm
    WHERE wcnt = 7
    ORDER BY day
    """,
)
def win_seasonal_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive decomposition of the daily revenue series: a
    7-day centered moving average as the trend, and the detrended
    residual that exposes day-of-week seasonality. Exact int64-cent
    daily totals feed the window, so the moving sum is exact and both
    engines divide the same integers; edge days without a full 7-day
    frame are dropped (wcnt = 7) rather than averaged over a shorter
    frame. Scale: the corpus-sized work is ONE hash aggregate to daily
    cents; the unpartitioned ordered window then runs over
    CALENDAR-BOUNDED rows (one per day — thousands at a century), the
    documented bounded-input exception of this module's no-global-window
    rule."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "cents"
            )
        )
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    sm = daily.select(
        "day",
        "cents",
        F.sum("cents").over(w).alias("wsum"),
        F.count("*").over(w).alias("wcnt"),
    ).filter(F.col("wcnt") == 7)
    rev = F.col("cents").cast("double") / 100.0
    trend = F.col("wsum").cast("double") / (F.col("wcnt").cast("double") * 100.0)
    return sm.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round(rev, 2).alias("revenue"),
        F.round(trend, 2).alias("trend"),
        F.round(rev - trend, 2).alias("detrended"),
    ).orderBy("day")


@query(
    "win_path_sequences",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS nxt1,
             lead(event_type, 2) OVER w AS nxt2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    paths AS (
      SELECT event_type || '>' || nxt1 || '>' || nxt2 AS path
      FROM seq WHERE nxt2 IS NOT NULL)
    SELECT path, count(*) AS n_journeys
    FROM paths GROUP BY path
    ORDER BY n_journeys DESC, path
    LIMIT 15
    """,
)
def win_path_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top behavioral trigram paths (A>B>C event sequences) — the
    journey-mining query behind funnel discovery. ONE keyed ordered
    window (user_id; ts with event_id tiebreak) produces both lookahead
    steps, then a hash aggregate counts paths whose DOMAIN is bounded
    by |event types|³ — 125 possible paths at any corpus size, so the
    aggregate output, the sort and the top-15 cut are all constants.
    The corpus-sized work is exactly one shuffle on user_id."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = load(spark, sf_dir, "events").select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("nxt1"),
        F.lead("event_type", 2).over(w).alias("nxt2"),
    )
    return (
        seq.filter(F.col("nxt2").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "nxt1", "nxt2").alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").alias("n_journeys"))
        .orderBy(F.desc("n_journeys"), "path")
        .limit(15)
    )


@query(
    "win_bollinger_breakout",
    oracle="""
    WITH c AS (
      SELECT event_id, user_id, ts, value,
             CAST(round(value * 100) AS BIGINT) AS x
      FROM events),
    fr AS (
      SELECT event_id, user_id, value, x,
             sum(x)     OVER w AS s,
             sum(x * x) OVER w AS q,
             count(*)   OVER w AS n
      FROM c
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
    full_fr AS (
      SELECT *, n * x - s AS dev_scaled,
             n * q - s * s AS var_scaled
      FROM fr WHERE n = 20)
    SELECT event_id, user_id, value,
           round(CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 100.0), 4)
             AS band_mid,
           round(sqrt(CAST(var_scaled AS DOUBLE)
                      / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))
                 / 100.0, 4) AS band_sigma,
           CASE WHEN dev_scaled > 0 THEN 'high' ELSE 'low' END AS breakout
    FROM full_fr
    WHERE dev_scaled * dev_scaled * (n - 1) > 4 * n * var_scaled
    ORDER BY user_id, event_id
    """,
)
def win_bollinger_breakout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger-band breakouts: events outside ±2σ of their user's
    TRAILING 20-event band (vs `win_zscore_anomaly`'s whole-history
    frame — this one adapts to drift). EXACT integer decision rule:
    values enter as int64 cents, the frame keeps only Σx and Σx², and
    the breakout predicate is the cross-multiplied form
    (n·x−S)²·(n−1) > 4n·(nΣx²−S²) — pure int64 comparisons, so the
    flagged set is bit-identical on every engine and no float boundary
    can flip an event; the reported band mid/σ are the only float
    divides, done per emitted row. One keyed ordered window over the
    user shuffle, partial frames (< 20 events) excluded."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, 0)
    )
    x = F.round(F.col("value") * 100).cast("long")
    fr = (
        load(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts", "value", x.alias("x"))
        .select(
            "event_id",
            "user_id",
            "value",
            "x",
            F.sum("x").over(w).alias("s"),
            F.sum(F.col("x") * F.col("x")).over(w).alias("q"),
            F.count("*").over(w).alias("n"),
        )
        .filter(F.col("n") == 20)
        .withColumn("dev_scaled", F.col("n") * F.col("x") - F.col("s"))
        .withColumn(
            "var_scaled", F.col("n") * F.col("q") - F.col("s") * F.col("s")
        )
    )
    return (
        fr.filter(
            F.col("dev_scaled") * F.col("dev_scaled") * (F.col("n") - 1)
            > 4 * F.col("n") * F.col("var_scaled")
        )
        .select(
            "event_id",
            "user_id",
            "value",
            F.round(
                F.col("s").cast("double") / (F.col("n").cast("double") * 100.0),
                4,
            ).alias("band_mid"),
            F.round(
                F.sqrt(
                    F.col("var_scaled").cast("double")
                    / (
                        F.col("n").cast("double")
                        * (F.col("n") - 1).cast("double")
                    )
                )
                / 100.0,
                4,
            ).alias("band_sigma"),
            F.when(F.col("dev_scaled") > 0, "high")
            .otherwise("low")
            .alias("breakout"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "win_attribution_last_touch",
    oracle="""
    WITH tagged AS (
      SELECT event_id, user_id, ts, event_type,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch
      FROM events)
    SELECT event_id, user_id, coalesce(touch, 'direct') AS attributed_to
    FROM tagged
    WHERE event_type = 'purchase'
    ORDER BY user_id, event_id
    """,
)
def win_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase is credited to the user's
    most recent preceding NON-purchase event type ('direct' if none) —
    the marketing-attribution primitive. ONE keyed ordered window with
    an explicit UNBOUNDED..1-PRECEDING frame (excluding the current row
    — the default frame would let a purchase attribute to itself) and
    last_value(... IGNORE NULLS) carrying only the non-purchase types;
    the corpus-sized work is the single user shuffle, and the purchase
    filter happens after tagging so mid-stream purchases don't reset
    the lookback."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        load(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", touch.alias("touch"))
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.coalesce("touch", F.lit("direct")).alias("attributed_to"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "win_momentum_rsi",
    oracle="""
    WITH daily AS (
      SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS day,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders GROUP BY o_orderpriority, CAST(o_orderdate AS DATE)),
    d AS (
      SELECT prio, day, cents,
             cents - lag(cents) OVER (PARTITION BY prio ORDER BY day)
               AS delta
      FROM daily),
    g AS (
      SELECT prio, day,
             sum(CASE WHEN delta > 0 THEN delta ELSE 0 END)
               OVER w AS gains,
             sum(CASE WHEN delta < 0 THEN -delta ELSE 0 END)
               OVER w AS losses,
             count(delta) OVER w AS n
      FROM d
      WINDOW w AS (PARTITION BY prio ORDER BY day
                   ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
    SELECT prio, strftime(day, '%Y-%m-%d') AS day,
           round(100.0 * CAST(gains AS DOUBLE)
                 / CAST(gains + losses AS DOUBLE), 4) AS rsi
    FROM g
    WHERE n = 14 AND gains + losses > 0
    ORDER BY prio, day
    """,
)
def win_momentum_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-period RSI of the daily revenue series per order priority —
    the momentum oscillator, in its cut-over form RSI = 100·G/(G+L)
    (simple averages, not Wilder smoothing — the recursive form has no
    closed window expression; the identity avoids the avg-of-avg
    divide). G and L are trailing sums of EXACT int64 cent deltas, so
    the only float op is the single output divide; flat 14-day stretches
    (G+L = 0, RSI undefined) are excluded identically on both engines.
    One hash aggregate to (priority, day) cents, then two keyed windows
    over the calendar-bounded daily frame."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("prio"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"))
    )
    wl = Window.partitionBy("prio").orderBy("day")
    wf = wl.rowsBetween(-13, 0)
    d = daily.select(
        "prio", "day", (F.col("cents") - F.lag("cents").over(wl)).alias("delta")
    )
    g = d.select(
        "prio",
        "day",
        F.sum(F.when(F.col("delta") > 0, F.col("delta")).otherwise(0))
        .over(wf)
        .alias("gains"),
        F.sum(F.when(F.col("delta") < 0, -F.col("delta")).otherwise(0))
        .over(wf)
        .alias("losses"),
        F.count("delta").over(wf).alias("n"),
    )
    return (
        g.filter((F.col("n") == 14) & (F.col("gains") + F.col("losses") > 0))
        .select(
            "prio",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.round(
                100.0
                * F.col("gains").cast("double")
                / (F.col("gains") + F.col("losses")).cast("double"),
                4,
            ).alias("rsi"),
        )
        .orderBy("prio", "day")
    )


@query(
    "win_local_peaks",
    oracle="""
    WITH daily AS (
      SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS day,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders GROUP BY o_orderpriority, CAST(o_orderdate AS DATE)),
    fr AS (
      SELECT prio, day, cents,
             max(cents) OVER (PARTITION BY prio ORDER BY day
                              ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
               AS max_before,
             max(cents) OVER (PARTITION BY prio ORDER BY day
                              ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING)
               AS max_after,
             count(*) OVER (PARTITION BY prio ORDER BY day
                            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
               AS n_win
      FROM daily)
    SELECT prio, strftime(day, '%Y-%m-%d') AS day,
           round(CAST(cents AS DOUBLE) / 100.0, 2) AS revenue,
           round(CAST(cents AS DOUBLE)
                 / CAST(greatest(max_before, max_after) AS DOUBLE), 4)
             AS prominence
    FROM fr
    WHERE n_win = 7 AND cents > max_before AND cents > max_after
    ORDER BY prio, day
    """,
)
def win_local_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-peak days: strict maxima over a ±3-day neighborhood per
    priority, with a prominence ratio against the taller shoulder —
    the spike detector behind 'what happened on the 14th'. The peak
    PREDICATE compares exact int64 cents (no float can flip a peak);
    the two one-sided max frames are explicit (a symmetric frame would
    include the candidate itself and never find a strict peak); edge
    days without a full ±3 neighborhood are excluded on both engines.
    One hash aggregate, then keyed calendar-bounded windows."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("prio"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "cents"
            )
        )
    )
    wb = Window.partitionBy("prio").orderBy("day").rowsBetween(-3, -1)
    wa = Window.partitionBy("prio").orderBy("day").rowsBetween(1, 3)
    wn = Window.partitionBy("prio").orderBy("day").rowsBetween(-3, 3)
    fr = daily.select(
        "prio",
        "day",
        "cents",
        F.max("cents").over(wb).alias("max_before"),
        F.max("cents").over(wa).alias("max_after"),
        F.count("*").over(wn).alias("n_win"),
    )
    return (
        fr.filter(
            (F.col("n_win") == 7)
            & (F.col("cents") > F.col("max_before"))
            & (F.col("cents") > F.col("max_after"))
        )
        .select(
            "prio",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.round(F.col("cents").cast("double") / 100.0, 2).alias("revenue"),
            F.round(
                F.col("cents").cast("double")
                / F.greatest("max_before", "max_after").cast("double"),
                4,
            ).alias("prominence"),
        )
        .orderBy("prio", "day")
    )


@query(
    "win_vwap_running",
    oracle="""
    WITH li AS (
      SELECT l_partkey, l_shipdate, l_orderkey, l_linenumber,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
             CAST(round(l_quantity) AS BIGINT) AS q
      FROM lineitem),
    r AS (
      SELECT l_partkey, l_orderkey, l_linenumber,
             sum(pc) OVER w AS run_pc,
             sum(q)  OVER w AS run_q,
             row_number() OVER w AS n_fills
      FROM li
      WINDOW w AS (PARTITION BY l_partkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    SELECT l_partkey, l_orderkey, l_linenumber,
           CAST(n_fills AS BIGINT) AS n_fills,
           CAST((2 * run_pc * 100 + run_q) // (2 * run_q) AS DOUBLE) / 10000.0
             AS vwap
    FROM r ORDER BY l_partkey, n_fills
    """,
)
def win_vwap_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running volume-weighted average price per part over its shipment
    history — the VWAP every execution-quality and pricing-drift review
    uses. Both running sums carry EXACT int64 (price-cents, units), so
    the only float op is the final per-row divide; the window is keyed
    by part with a full (shipdate, orderkey, linenumber) tie-break, and
    the UNBOUNDED PRECEDING frame is a single streaming pass per
    partition — one shuffle on partkey, no re-sort downstream."""
    w = (
        Window.partitionBy("l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wr = Window.partitionBy("l_partkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("pc"),
        F.round("l_quantity").cast("long").alias("q"),
    )
    return li.select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        F.row_number().over(wr).cast("long").alias("n_fills"),
        F.sum("pc").over(w).alias("run_pc"),
        F.sum("q").over(w).alias("run_q"),
    ).select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        "n_fills",
        # exact integer half-up division to 4 decimals — round() on the
        # raw double quotient is engine-dependent on a .xxxx5 landing
        (
            F.expr("CAST((2 * run_pc * 100 + run_q) div (2 * run_q) AS DOUBLE)")
            / 10000.0
        ).alias("vwap"),
    ).orderBy("l_partkey", "n_fills")


@query(
    "win_time_to_conversion",
    oracle="""
    WITH t AS (
      SELECT event_id, user_id, ts, event_type,
             first_value(CASE WHEN event_type = 'purchase'
                              THEN epoch_us(ts) END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS next_purchase_us
      FROM events)
    SELECT event_id, user_id, event_type,
           CAST((2 * (next_purchase_us - epoch_us(ts)) + 1000) // 2000
                AS DOUBLE) / 1000.0 AS ttc_sec,
           (next_purchase_us IS NULL) AS censored
    FROM t
    WHERE event_type <> 'purchase'
    ORDER BY user_id, event_id
    """,
)
def win_time_to_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-conversion per touchpoint: for every non-purchase event,
    the seconds until that user's NEXT purchase (NULL + censored flag
    if none follows) — the label-generation query behind conversion
    models. One keyed ordered window with a STRICTLY-FORWARD frame
    (1 FOLLOWING .. UNBOUNDED) and first_value(... IGNORE NULLS)
    carrying only purchase timestamps; time arithmetic is exact integer
    microseconds until the single output divide. The purchase filter
    runs AFTER tagging so purchases still serve as targets for events
    before them."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    nxt = F.first(
        F.when(F.col("event_type") == "purchase", F.unix_micros("ts")),
        ignorenulls=True,
    ).over(w)
    return (
        load(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            "ts",
            "event_type",
            nxt.alias("next_purchase_us"),
        )
        .filter(F.col("event_type") != "purchase")
        .select(
            "event_id",
            "user_id",
            "event_type",
            # exact integer half-up µs→ms (round() of the raw /1e6
            # double diverges on a .xxx5 landing — sf0.1 sweep catch)
            (
                F.expr(
                    "CAST((2 * (next_purchase_us - unix_micros(ts)) + 1000)"
                    " div 2000 AS DOUBLE)"
                )
                / 1000.0
            ).alias("ttc_sec"),
            F.col("next_purchase_us").isNull().alias("censored"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "win_nth_value",
    oracle="""
    SELECT o_custkey,
           nth_value(o_orderkey, 2)
             OVER (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND UNBOUNDED FOLLOWING) AS second_best_order,
           nth_value(o_totalprice, 2)
             OVER (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND UNBOUNDED FOLLOWING) AS second_best_price
    FROM orders
    QUALIFY row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC, o_orderkey) = 1
    ORDER BY o_custkey
    """,
)
def win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value — the 'runner-up' accessor (second-highest order per
    customer, NULL for single-order customers): the frame is PINNED to
    the whole partition (the default …AND CURRENT ROW frame can't see
    forward to the 2nd row while positioned on the 1st — the same
    cross-engine trap as first/last), the ordering carries a unique
    tie-break, and one row per customer survives via the rank filter.
    The oracle says QUALIFY (DuckDB); Spark filters on the ranked
    column — same semantics, one shuffle + local sort either way."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        load(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            F.nth_value("o_orderkey", 2).over(wf).alias("second_best_order"),
            F.nth_value("o_totalprice", 2).over(wf).alias("second_best_price"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
        .orderBy("o_custkey")
    )


@query(
    "win_bounce_rate",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > {SESSION_GAP_MINUTES} * 60 * 1000000
                  OR lag(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events),
    sess AS (
      SELECT user_id,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS session_id,
             ts
      FROM flagged),
    per AS (
      SELECT CAST(min(ts) AS DATE) AS day, count(*) AS n_events
      FROM sess GROUP BY user_id, session_id)
    SELECT strftime(day, '%Y-%m-%d') AS day,
           count(*) AS n_sessions,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounces,
           round(CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                      AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
             AS bounce_rate
    FROM per GROUP BY day ORDER BY day
    """,
)
def win_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate: the share of sessions that contain exactly ONE
    event — the engagement-quality headline. Reuses the module's
    30-minute gaps-and-islands sessionization (same flags, same
    tie-break), attributes each session to its START day (min ts), and
    the ratio divides exact integer session counts. Corpus-sized work:
    the one user shuffle for the session windows + a session-keyed
    rollup; the daily output is calendar-bounded."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    flagged = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            (us - F.lag(us).over(w) > SESSION_GAP_MINUTES * 60 * 1000000)
            | F.lag("ts").over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    # running-sum window tie-broken by (ts, event_id) to match the
    # is_new flag window and win_session_ids — with duplicate
    # (user_id, ts) pairs session membership is otherwise
    # nondeterministic (ADVICE r4)
    ws = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sess = flagged.select(
        "user_id", "ts", F.sum("is_new").over(ws).alias("session_id")
    )
    per = sess.groupBy("user_id", "session_id").agg(
        F.min("ts").cast("date").alias("day"), F.count("*").alias("n_events")
    )
    bounce = F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
    return (
        per.groupBy("day")
        .agg(
            F.count("*").alias("n_sessions"),
            bounce.cast("long").alias("n_bounces"),
            F.round(
                bounce.cast("double") / F.count("*").cast("double"), 6
            ).alias("bounce_rate"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_sessions",
            "n_bounces",
            "bounce_rate",
        )
        .orderBy("day")
    )


@query(
    "win_recency_feature",
    oracle="""
    WITH t AS (
      SELECT event_id, user_id, ts, event_type,
             last_value(CASE WHEN event_type = 'purchase'
                             THEN epoch_us(ts) END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_purchase_us
      FROM events)
    SELECT event_id, user_id, event_type,
           CAST(CASE WHEN prev_purchase_us IS NULL THEN NULL
                     ELSE (2 * (epoch_us(ts) - prev_purchase_us) + 1000)
                          // 2000 END AS DOUBLE) / 1000.0 AS recency_sec,
           (prev_purchase_us IS NULL) AS never_purchased_before
    FROM t
    ORDER BY user_id, event_id
    """,
)
def win_recency_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency feature generation: seconds since the user's PREVIOUS
    purchase, stamped onto every event — the backward-looking twin of
    `win_time_to_conversion` and the single most predictive feature in
    most churn/propensity models. Same keyed window discipline: an
    explicit UNBOUNDED..1-PRECEDING frame (current row excluded so a
    purchase's own recency refers to the one before it), last_value
    IGNORE NULLS over purchase timestamps only, exact integer µs with
    the half-up division to milliseconds, NULL + flag when no purchase
    precedes."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.last(
        F.when(F.col("event_type") == "purchase", F.unix_micros("ts")),
        ignorenulls=True,
    ).over(w)
    return (
        load(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            "ts",
            "event_type",
            prev.alias("prev_purchase_us"),
        )
        .select(
            "event_id",
            "user_id",
            "event_type",
            (
                F.expr(
                    "CAST(CASE WHEN prev_purchase_us IS NULL THEN NULL"
                    " ELSE (2 * (unix_micros(ts) - prev_purchase_us) + 1000)"
                    " div 2000 END AS DOUBLE)"
                )
                / 1000.0
            ).alias("recency_sec"),
            F.col("prev_purchase_us").isNull().alias(
                "never_purchased_before"
            ),
        )
        .orderBy("user_id", "event_id")
    )


_OHLC_HOURS = 6


@query(
    "win_ohlc_candles",
    oracle=f"""
    WITH b AS (
      SELECT time_bucket(INTERVAL {_OHLC_HOURS} HOUR, ts) AS bucket,
             ts, event_id,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'),
    o AS (
      SELECT bucket,
             first(cents ORDER BY ts, event_id) AS open_c,
             max(cents) AS high_c, min(cents) AS low_c,
             last(cents ORDER BY ts, event_id) AS close_c,
             count(*) AS n_trades, sum(cents) AS vol_c
      FROM b GROUP BY bucket)
    SELECT bucket AS window_start,
           CAST(open_c AS DOUBLE) / 100.0 AS open,
           CAST(high_c AS DOUBLE) / 100.0 AS high,
           CAST(low_c AS DOUBLE) / 100.0 AS low,
           CAST(close_c AS DOUBLE) / 100.0 AS close,
           CAST(n_trades AS BIGINT) AS n_trades,
           CAST(vol_c AS BIGINT) AS volume_cents
    FROM o ORDER BY window_start
    """,
)
def win_ohlc_candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candle resampling — the financial tick→bar aggregation
    (open/high/low/close/volume per 6-hour bucket over purchase
    values): the ORDER-SENSITIVE bucket aggregate that plain min/max
    aggregation can't express, because open and close depend on event
    order within the bucket. Spark side: `min_by`/`max_by` on the
    (ts, event_id) tie-broken struct pick the first/last trade in ONE
    hash-aggregation pass — no window, no sort of the bucket contents;
    DuckDB's ordered `first()`/`last()` is the oracle twin. Prices are
    exact int64 cents end-to-end with one final display divide."""
    b = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.window("ts", f"{_OHLC_HOURS} hours")["start"].alias(
                "window_start"
            ),
            F.struct(F.col("ts"), F.col("event_id")).alias("ord"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    return (
        b.groupBy("window_start")
        .agg(
            (F.min_by("cents", "ord").cast("double") / 100.0).alias("open"),
            (F.max("cents").cast("double") / 100.0).alias("high"),
            (F.min("cents").cast("double") / 100.0).alias("low"),
            (F.max_by("cents", "ord").cast("double") / 100.0).alias(
                "close"
            ),
            F.count("*").cast("long").alias("n_trades"),
            F.sum("cents").cast("long").alias("volume_cents"),
        )
        .orderBy("window_start")
    )


@query(
    "win_attribution_position_based",
    oracle="""
    WITH conv AS (
      SELECT user_id, min(ts) AS first_purchase FROM events
      WHERE event_type = 'purchase' GROUP BY user_id),
    touches AS (
      SELECT e.user_id, e.event_type, e.ts, e.event_id,
             row_number() OVER (PARTITION BY e.user_id
                                ORDER BY e.ts, e.event_id) AS rn,
             count(*) OVER (PARTITION BY e.user_id) AS n
      FROM events e JOIN conv c ON c.user_id = e.user_id
      WHERE e.ts < c.first_purchase AND e.event_type <> 'purchase'),
    credit AS (
      SELECT event_type,
             CASE
               WHEN n = 1 THEN 100
               WHEN n = 2 THEN 50
               WHEN rn = 1 OR rn = n THEN 40
               ELSE 20 / (n - 2)
             END AS pct
      FROM touches)
    SELECT event_type,
           round(sum(pct) / 100.0, 4) AS conversions_credited
    FROM credit GROUP BY event_type ORDER BY event_type
    """,
)
def win_attribution_position_based(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution: each
    converting user's pre-purchase journey credits 40% to the FIRST
    touch, 40% to the LAST, and splits 20% across the middle (100%/50-50
    for 1-/2-touch journeys) — the industry-standard middle ground
    between `win_attribution_last_touch` and linear credit. Per-journey
    positions come from one user-keyed rank window over the
    pre-conversion touches ((ts, event_id) tie-break), the credit rule
    is row-local CASE arithmetic in integer percent (exact except the
    documented 20/(n−2) middle split, identical expression both
    engines), and channel totals are one bounded hash agg. Scale: one
    shuffle on user_id for the windows, one on event_type for the
    rollup."""
    ev = load(spark, sf_dir, "events")
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    touches = (
        ev.join(conv, "user_id")
        .filter(
            (F.col("ts") < F.col("first_purchase"))
            & (F.col("event_type") != "purchase")
        )
        .select("user_id", "event_type", "ts", "event_id")
    )
    wu = Window.partitionBy("user_id")
    ranked = touches.select(
        "event_type",
        F.row_number().over(wu.orderBy("ts", "event_id")).alias("rn"),
        F.count("*").over(wu).alias("n"),
    )
    pct = (
        F.when(F.col("n") == 1, F.lit(100.0))
        .when(F.col("n") == 2, F.lit(50.0))
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("n")), F.lit(40.0))
        .otherwise(20.0 / (F.col("n") - 2))
    )
    return (
        ranked.select("event_type", pct.alias("pct"))
        .groupBy("event_type")
        .agg(F.round(F.sum("pct") / 100.0, 4).alias("conversions_credited"))
        .orderBy("event_type")
    )


@query(
    "win_penny_allocation",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, l_linenumber,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS w
      FROM lineitem),
    tot AS (
      SELECT l_orderkey,
             sum(w) AS wsum,
             CAST(round(max(o.o_totalprice) * 100) AS BIGINT) AS target
      FROM li JOIN (SELECT o_orderkey, o_totalprice FROM orders) o
        ON o.o_orderkey = li.l_orderkey
      GROUP BY l_orderkey),
    base AS (
      SELECT li.l_orderkey, li.l_linenumber,
             (li.w * t.target) // t.wsum AS floor_c,
             (li.w * t.target) % t.wsum AS rem,
             t.target, t.wsum
      FROM li JOIN tot t ON t.l_orderkey = li.l_orderkey),
    short AS (
      SELECT l_orderkey,
             any_value(target) - sum(floor_c) AS missing
      FROM base GROUP BY l_orderkey),
    ranked AS (
      SELECT b.l_orderkey, b.l_linenumber, b.floor_c, s.missing,
             row_number() OVER (PARTITION BY b.l_orderkey
                                ORDER BY b.rem DESC, b.l_linenumber) AS rr
      FROM base b JOIN short s ON s.l_orderkey = b.l_orderkey),
    alloc AS (
      SELECT l_orderkey, l_linenumber,
             floor_c + CASE WHEN rr <= missing THEN 1 ELSE 0 END
               AS alloc_c
      FROM ranked)
    SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
           CAST(l_linenumber AS INT) AS l_linenumber,
           CAST(alloc_c AS BIGINT) AS allocated_cents
    FROM alloc ORDER BY l_orderkey, l_linenumber
    """,
)
def win_penny_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder PENNY ALLOCATION: distribute each order's exact
    total (int64 cents) across its line items proportionally to
    extended price so the per-line cents SUM EXACTLY to the order total
    — the financial-exactness kernel behind invoice splitting, tax
    apportionment, and revenue share, where naive round(share·total)
    leaks or double-counts pennies. All integer arithmetic: floor
    quotas via (w·target) div Σw, the per-order shortfall = target −
    Σfloors, and the shortfall pennies go to the largest remainders
    ((w·target) mod Σw, line-number tie-break) via one order-keyed rank
    window. Every engine-visible number is an exact integer; the
    invariant Σ allocated = target per order is structural. Scale: one
    order-keyed shuffle for totals + one for the window."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("w"),
    )
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("target"),
    )
    tot = li.groupBy("l_orderkey").agg(F.sum("w").alias("wsum"))
    base = (
        li.join(tot, "l_orderkey")
        .join(o, "l_orderkey")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.expr("(w * target) div wsum").alias("floor_c"),
            ((F.col("w") * F.col("target")) % F.col("wsum")).alias("rem"),
            "target",
        )
    )
    wo = Window.partitionBy("l_orderkey")
    ranked = base.select(
        "l_orderkey",
        "l_linenumber",
        "floor_c",
        (F.col("target") - F.sum("floor_c").over(wo)).alias("missing"),
        F.row_number()
        .over(wo.orderBy(F.desc("rem"), "l_linenumber"))
        .alias("rr"),
    )
    return (
        ranked.select(
            F.col("l_orderkey").cast("long").alias("l_orderkey"),
            F.col("l_linenumber").cast("int").alias("l_linenumber"),
            (
                F.col("floor_c")
                + F.when(F.col("rr") <= F.col("missing"), 1).otherwise(0)
            )
            .cast("long")
            .alias("allocated_cents"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "win_interval_merge",
    oracle="""
    WITH iv AS (
      SELECT user_id, epoch_us(ts) AS s,
             epoch_us(ts) + CAST(round(value) AS BIGINT) * 1000000 AS e,
             event_id
      FROM events),
    flagged AS (
      SELECT user_id, s, e, event_id,
             CASE WHEN s > coalesce(max(e) OVER (PARTITION BY user_id
                         ORDER BY s, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), -1)
                  THEN 1 ELSE 0 END AS new_grp
      FROM iv),
    grp AS (
      SELECT user_id, s, e,
             sum(new_grp) OVER (PARTITION BY user_id ORDER BY s, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS g
      FROM flagged),
    merged AS (
      SELECT user_id, g, min(s) AS ms, max(e) AS me
      FROM grp GROUP BY user_id, g)
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_merged,
           CAST((2 * sum(me - ms) + 1000000) // 2000000 AS BIGINT)
             AS covered_sec
    FROM merged GROUP BY user_id ORDER BY user_id
    """,
)
def win_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-INTERVAL MERGE (the classic coalesce-bookings /
    machine-uptime problem): each event spans [ts, ts + value seconds];
    per user, transitively overlapping spans collapse into maximal
    merged intervals, reported as merged-interval count and total
    covered seconds. The distributed-SQL solution: a span starts a new
    group iff its start exceeds the RUNNING MAX of all previous ends
    (one user-keyed window, (ts, event_id) tie-break — plain
    sort-by-start misses containment chains that a naive lag(end)
    comparison breaks on), group ids are the running sum of those
    flags, and merged bounds are one hash agg. Exact integer µs
    end-to-end; the covered-seconds report is the half-up integer
    division idiom. Scale: one shuffle on user_id, windows + agg inside
    it."""
    us = F.unix_micros(F.col("ts"))
    iv = load(spark, sf_dir, "events").select(
        "user_id",
        us.alias("s"),
        (us + F.round("value").cast("long") * 1000000).alias("e"),
        "event_id",
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.select(
        "user_id",
        "s",
        "e",
        "event_id",
        F.when(
            F.col("s") > F.coalesce(F.max("e").over(w_prev), F.lit(-1)), 1
        )
        .otherwise(0)
        .alias("new_grp"),
    )
    # cumsum tie-broken identically to the flag window — duplicate
    # (s, e) rows would otherwise shift group ids nondeterministically
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    grp = flagged.select(
        "user_id", "s", "e", F.sum("new_grp").over(w_cum).alias("g")
    )
    merged = grp.groupBy("user_id", "g").agg(
        F.min("s").alias("ms"), F.max("e").alias("me")
    )
    return (
        merged.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_merged"),
            F.expr(
                "CAST((2 * sum(me - ms) + 1000000) div 2000000 AS BIGINT)"
            ).alias("covered_sec"),
        )
        .orderBy("user_id")
    )


_FM_BRAND = "Brand#11"
_FM_START = "1997-01-01"  # emitted window
_FM_END = "1997-03-31"
_FM_PAD_START = "1996-12-25"  # 7-day lookback pad so Q1 lags are real


@query(
    "win_feature_matrix",
    oracle=f"""
    WITH parts AS (
      SELECT p_partkey FROM part WHERE p_brand = '{_FM_BRAND}'),
    days AS (
      SELECT unnest(generate_series(DATE '{_FM_PAD_START}',
                                    DATE '{_FM_END}',
                                    INTERVAL 1 DAY))::DATE AS day),
    demand AS (
      SELECT l_partkey, CAST(l_shipdate AS DATE) AS day,
             sum(CAST(round(l_quantity) AS BIGINT)) AS qty
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '{_FM_PAD_START}'
            AND DATE '{_FM_END}'
      GROUP BY 1, 2),
    spine AS (
      SELECT p.p_partkey, d.day, coalesce(dm.qty, 0) AS qty
      FROM parts p CROSS JOIN days d
      LEFT JOIN demand dm
        ON dm.l_partkey = p.p_partkey AND dm.day = d.day),
    feat AS (
      SELECT p_partkey, day, qty,
             lag(qty, 1) OVER w AS lag_1,
             lag(qty, 7) OVER w AS lag_7,
             sum(qty) OVER (PARTITION BY p_partkey ORDER BY day
                            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
               AS s7,
             count(*) OVER (PARTITION BY p_partkey ORDER BY day
                            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
               AS c7,
             CAST(isodow(day) AS INT) AS dow
      FROM spine
      WINDOW w AS (PARTITION BY p_partkey ORDER BY day))
    SELECT CAST(p_partkey AS BIGINT) AS p_partkey,
           strftime(day, '%Y-%m-%d') AS day,
           CAST(qty AS BIGINT) AS qty,
           CAST(lag_1 AS BIGINT) AS lag_1,
           CAST(lag_7 AS BIGINT) AS lag_7,
           CAST((2 * s7 * 10000 + c7) // (2 * c7) AS DOUBLE) / 10000.0
             AS ma_7,
           dow
    FROM feat
    WHERE day >= DATE '{_FM_START}'
    ORDER BY p_partkey, day
    """,
)
def win_feature_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Demand-forecasting FEATURE MATRIX — the canonical ML
    feature-engineering job: per (part, day) over a dense calendar
    spine (zero-filled days INCLUDED — training on observed-only rows
    biases every lag), one quarter's daily demand for one brand with
    lag-1 / lag-7 / trailing-7-day-mean / ISO-weekday features, plus a
    7-day lookback pad so the emitted window's lags are real values,
    not window-edge nulls. Spine = bounded |parts| × |days| dimension
    grid (both broadcast-sized); demand left-joins onto it keyed on
    (part, day); all features ride ONE part-keyed ordered window pass.
    Quantities are exact integers and the trailing mean is the half-up
    integer-division idiom. The emitted matrix is the training input a
    gradient-boosted demand model consumes."""
    parts = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_brand") == _FM_BRAND)
        .select("p_partkey")
    )
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(_FM_PAD_START).cast("date"),
                F.lit(_FM_END).cast("date"),
            )
        ).alias("day")
    )
    demand = (
        load(spark, sf_dir, "lineitem")
        .select(
            "l_partkey",
            F.col("l_shipdate").cast("date").alias("day"),
            F.round("l_quantity").cast("long").alias("q"),
        )
        .filter(
            F.col("day").between(
                F.lit(_FM_PAD_START).cast("date"),
                F.lit(_FM_END).cast("date"),
            )
        )
        .groupBy(F.col("l_partkey").alias("p_partkey"), "day")
        .agg(F.sum("q").alias("qty"))
    )
    spine = (
        parts.crossJoin(F.broadcast(days))
        .join(demand, ["p_partkey", "day"], "left")
        .select(
            "p_partkey", "day", F.coalesce("qty", F.lit(0)).alias("qty")
        )
    )
    w = Window.partitionBy("p_partkey").orderBy("day")
    w7 = w.rowsBetween(-6, 0)
    feat = spine.select(
        "p_partkey",
        "day",
        "qty",
        F.lag("qty", 1).over(w).alias("lag_1"),
        F.lag("qty", 7).over(w).alias("lag_7"),
        F.sum("qty").over(w7).alias("s7"),
        F.count("*").over(w7).alias("c7"),
        F.dayofweek(F.date_add("day", -1)).alias("_shift"),
    )
    # ISO weekday (Mon=1..Sun=7): Spark's dayofweek is Sun=1..Sat=7;
    # shifting the date back one day maps it exactly
    return (
        feat.filter(F.col("day") >= F.lit(_FM_START).cast("date"))
        .select(
            F.col("p_partkey").cast("long").alias("p_partkey"),
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("qty").cast("long").alias("qty"),
            F.col("lag_1").cast("long").alias("lag_1"),
            F.col("lag_7").cast("long").alias("lag_7"),
            (
                F.expr("CAST((2 * s7 * 10000 + c7) div (2 * c7) AS DOUBLE)")
                / 10000.0
            ).alias("ma_7"),
            F.col("_shift").cast("int").alias("dow"),
        )
        .orderBy("p_partkey", "day")
    )


_DECAY_HALFLIFE_H = 24.0


@query(
    "win_attribution_time_decay",
    oracle=f"""
    WITH conv AS (
      SELECT user_id, min(ts) AS cts FROM events
      WHERE event_type = 'purchase' GROUP BY user_id),
    touches AS (
      SELECT e.user_id, e.event_type,
             CAST(round(1e6 * power(2.0,
                  -((epoch_us(c.cts) - epoch_us(e.ts)) / 3.6e9)
                  / {_DECAY_HALFLIFE_H})) AS BIGINT) AS w_u
      FROM events e JOIN conv c ON c.user_id = e.user_id
      WHERE e.ts < c.cts AND e.event_type <> 'purchase'),
    norm AS (
      SELECT event_type,
             CAST(round(1e6 * CAST(w_u AS DOUBLE)
                  / sum(w_u) OVER (PARTITION BY user_id)) AS BIGINT)
               AS credit_u
      FROM touches)
    SELECT event_type,
           round(CAST(sum(credit_u) AS DOUBLE) / 1e6, 4)
             AS conversions_credited
    FROM norm GROUP BY event_type ORDER BY event_type
    """,
)
def win_attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-DECAY multi-touch attribution (24-hour half-life): each
    pre-conversion touch earns weight 2^(−Δt/halflife) toward the
    conversion, normalized per journey — completing the attribution
    trio with `win_attribution_last_touch` and
    `win_attribution_position_based`. Determinism discipline: the raw
    decay weight quantizes to int64 µ-units per touch (one pow() of
    exact µs deltas — identical double both engines), the per-journey
    normalizer is then an EXACT integer sum over a user-keyed window,
    each touch's normalized credit re-quantizes to µ-units, and channel
    totals sum exact integers — float accumulation never crosses rows.
    Scale: one user shuffle for the window, one bounded channel
    rollup."""
    ev = load(spark, sf_dir, "events")
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("cts"))
    )
    dh = (
        (F.unix_micros("cts") - F.unix_micros("ts")).cast("double") / 3.6e9
    )
    touches = (
        ev.join(conv, "user_id")
        .filter(
            (F.col("ts") < F.col("cts"))
            & (F.col("event_type") != "purchase")
        )
        .select(
            "user_id",
            "event_type",
            F.round(1e6 * F.pow(2.0, -dh / _DECAY_HALFLIFE_H))
            .cast("long")
            .alias("w_u"),
        )
    )
    wu = Window.partitionBy("user_id")
    norm = touches.select(
        "event_type",
        F.round(
            1e6 * F.col("w_u").cast("double") / F.sum("w_u").over(wu)
        )
        .cast("long")
        .alias("credit_u"),
    )
    return (
        norm.groupBy("event_type")
        .agg(
            F.round(F.sum("credit_u").cast("double") / 1e6, 4).alias(
                "conversions_credited"
            )
        )
        .orderBy("event_type")
    )


@query(
    "win_scd2_build",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             lag(event_type) OVER w AS prev_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    starts AS (
      SELECT user_id, event_type AS state, ts AS valid_from
      FROM ordered
      WHERE prev_type IS NULL OR prev_type <> event_type),
    versioned AS (
      SELECT user_id, state,
             epoch_us(valid_from) AS valid_from_us,
             epoch_us(lead(valid_from) OVER w2) AS valid_to_us,
             CAST(row_number() OVER w2 AS INT) AS version
      FROM starts
      WINDOW w2 AS (PARTITION BY user_id ORDER BY valid_from))
    SELECT user_id, state, valid_from_us, valid_to_us, version,
           (valid_to_us IS NULL) AS is_current
    FROM versioned
    ORDER BY user_id, version
    """,
)
def win_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BUILD a type-2 slowly-changing dimension from a change log (the
    reverse of `join_scd2_pointintime`, which consumes one): collapse
    each user's event stream into its distinct STATE RUNS — consecutive
    same-type events merge into one versioned row carrying
    [valid_from, valid_to) and an is_current flag on the open row. This
    is the warehouse-canon transform that turns CDC/event history into
    a dimension you can point-in-time join against.

    Mechanics: one ordered keyed window flags state changes via lag
    (ties broken on event_id so replays are deterministic), a filter
    keeps the run heads, and a second window over the (much smaller)
    run-head frame assigns valid_to = lead(valid_from) and the version
    number. Timestamps surface as exact epoch-µs integers.

    Scale: both windows partition by user_id — per-user frames are
    bounded by user activity, never corpus-wide; the run-head frame the
    second window sees is already collapsed (≤ #state-changes rows), so
    the expensive sort happens once on the raw stream and once on a
    strictly smaller one. No global window, no broadcast, one shuffle
    key throughout."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    starts = ordered.filter(
        F.col("prev_type").isNull()
        | (F.col("prev_type") != F.col("event_type"))
    ).select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from")
    return (
        starts.select(
            "user_id",
            "state",
            F.unix_micros("valid_from").alias("valid_from_us"),
            F.unix_micros(F.lead("valid_from").over(w2)).alias(
                "valid_to_us"
            ),
            F.row_number().over(w2).cast("int").alias("version"),
        )
        .withColumn("is_current", F.col("valid_to_us").isNull())
        .orderBy("user_id", "version")
    )


@query(
    "win_interpolate_linear",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT))
                  AS BIGINT) AS v_micro
      FROM events GROUP BY 1, 2),
    span AS (
      SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily
      GROUP BY 1),
    spine AS (
      SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY))
               AS day
      FROM span),
    joined AS (
      SELECT s.user_id, CAST(s.day AS DATE) AS day, d.v_micro
      FROM spine s LEFT JOIN daily d
        ON d.user_id = s.user_id AND d.day = CAST(s.day AS DATE)),
    bracketed AS (
      SELECT user_id, day, v_micro,
             last_value(v_micro IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY day
                ROWS UNBOUNDED PRECEDING) AS pv,
             last_value(CASE WHEN v_micro IS NOT NULL THEN day END
                        IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY day
                ROWS UNBOUNDED PRECEDING) AS pd,
             first_value(v_micro IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY day
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN v_micro IS NOT NULL THEN day END
                         IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY day
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
      FROM joined)
    SELECT user_id, CAST(CAST(day AS DATE) AS VARCHAR(10)) AS day,
           CASE WHEN v_micro IS NOT NULL THEN v_micro
                ELSE CAST(floor(
                  pv + (nv - pv) * (date_diff('day', pd, day) * 1.0
                                    / date_diff('day', pd, nd)) + 0.5)
                  AS BIGINT) END AS v_micro,
           CASE WHEN v_micro IS NOT NULL THEN 'obs'
                ELSE 'interp' END AS kind
    FROM bracketed
    WHERE v_micro IS NOT NULL OR (pv IS NOT NULL AND nv IS NOT NULL)
    ORDER BY user_id, day
    """,
)
def win_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR interpolation over time-series gaps: each user's daily
    value series is densified to a full day spine, and silent days
    BETWEEN two observations get the straight-line blend
    prev + (next−prev)·Δt/T — the third member of the gap-handling
    trio (`fn_sequence_gap_fill` creates zero rows, `win_forward_fill`
    carries the last value, this one interpolates). Leading/trailing
    gaps stay un-extrapolated (dropped), which is the honest default
    for feature pipelines.

    Determinism: per-event values quantize to µ-units BEFORE the daily
    sum, so the aggregate is exact integer arithmetic (order-independent
    under Spark's partial aggregation); the
    interpolation is one double expression over those integers and
    integer day distances, re-quantized with floor(+0.5) — both
    engines agree bitwise (+,×,/ only).

    Scale: spine fan-out is bounded by calendar span × users (the
    gap-fill argument), never event volume; the prev/next brackets are
    two frames of ONE ordered keyed window pass each (incremental
    evaluation, O(1) state per row); everything shuffles on user_id
    alone."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(
        # Quantize per ROW, sum as integers: exact and order-independent,
        # so Spark's partial-agg order can never flip a µ-boundary the
        # way quantizing a float sum could.
        F.sum(
            F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("long")
        )
        .cast("long")
        .alias("v_micro")
    )
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(F.sequence("d0", "d1")).alias("day"),
        )
    )
    joined = spine.join(daily, ["user_id", "day"], "left")
    back = Window.partitionBy("user_id").orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    fwd = Window.partitionBy("user_id").orderBy("day").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    obs_day = F.when(F.col("v_micro").isNotNull(), F.col("day"))
    bracketed = joined.select(
        "user_id",
        "day",
        "v_micro",
        F.last("v_micro", ignorenulls=True).over(back).alias("pv"),
        F.last(obs_day, ignorenulls=True).over(back).alias("pd"),
        F.first("v_micro", ignorenulls=True).over(fwd).alias("nv"),
        F.first(obs_day, ignorenulls=True).over(fwd).alias("nd"),
    )
    interp = F.floor(
        F.col("pv")
        + (F.col("nv") - F.col("pv"))
        * (
            F.datediff("day", "pd")
            * F.lit(1.0)
            / F.datediff("nd", "pd")
        )
        + F.lit(0.5)
    ).cast("long")
    return (
        bracketed.filter(
            F.col("v_micro").isNotNull()
            | (F.col("pv").isNotNull() & F.col("nv").isNotNull())
        )
        .select(
            "user_id",
            # ISO string surface: DuckDB DATE crosses pandas as a
            # Timestamp, so a typed date column can't hash-match — the
            # gap-fill precedent (fn_sequence_gap_fill).
            F.col("day").cast("string").alias("day"),
            F.coalesce("v_micro", interp).alias("v_micro"),
            F.when(F.col("v_micro").isNotNull(), F.lit("obs"))
            .otherwise(F.lit("interp"))
            .alias("kind"),
        )
        .orderBy("user_id", "day")
    )
