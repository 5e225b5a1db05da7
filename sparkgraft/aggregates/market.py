"""aggregates.market — split from the flat aggregates.py (r7); operator bodies unchanged, see the package __init__."""


from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query

from .stats import (  # noqa: F401
    _CUPED_SPLIT,
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
    from ..ranking import with_global_prefix_sum

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
    from ..ranking import with_global_prefix_sum, with_global_rank

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
    from ..ranking import with_global_rank

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
    # The distinct-basket subtree feeds EVERY level below (n, f1, bf —
    # which the pair self-join and the level-3 extension each read
    # twice): lazily it re-evaluates ~12x in the final plan (92 parquet
    # scans, 160 HashAggregates, zero exchange reuse under AQE — the
    # r13 plan read). Materialize it once (guide §5). r14 quiet-host
    # A/B, basket-only checkpoint, interleaved min-of-5: sf0.1 2.99 →
    # 2.43 s, sf1 5.45 → 4.80 s (rules sibling 1.76 → 1.58 / 3.66 →
    # 3.28). This supersedes the r13 revert, whose "lazy faster"
    # baseline was measured on a busier host (its note flagged exactly
    # that and asked for this re-measure); the redundancy grows
    # linearly with the corpus while the barrier does not.
    b = (
        li.join(pt, "l_partkey").select("o", "br").distinct()
        .localCheckpoint()
    )
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
    # basket subtree materialized once — measurement and rationale in
    # agg_itemsets_apriori above (r14 A/B: 1.76 → 1.58 s sf0.1,
    # 3.66 → 3.28 s sf1)
    b = (
        li.join(pt, "l_partkey").select("o", "br").distinct()
        .localCheckpoint()
    )
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
