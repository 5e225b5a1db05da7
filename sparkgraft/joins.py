"""Join operators (SURVEY.md §2.3).

Strategy notes (the 100 TB posture, SURVEY.md §4):

- Equi-joins are declared and left to Catalyst/AQE: sort-merge or
  shuffled-hash on the join key, skew-split by AQE. The hand-wired
  "reduce-side join" of the MapReduce canon is exactly this, for free.
- Map-side joins are ``F.broadcast(dim)`` — correct whenever the small
  side is bounded by the domain (region/nation) rather than data volume.
- Non-equi joins are only written against a BOUNDED small side (the band
  table) so the broadcast-nested-loop product stays linear in the fact
  table; unbounded theta self-joins are banned by design.
- The as-of join composes equi-join + window argmax with an explicit,
  deterministic tie-break — Spark has no native ASOF (as of 4.x), and the
  tie-break makes the result hash-stable against any oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load, register_tables
from .registry import query


@query(
    "join_inner_equi",
    oracle="""
    SELECT o.o_orderkey, c.c_custkey, c.c_name, round(o.o_totalprice, 2) AS total
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice > 300000
    """,
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reduce-side equi-join; Catalyst picks SMJ/SHJ (or broadcast when the
    filtered side fits under the threshold — AQE decides at runtime)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    c = load(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "c_custkey", "c_name", F.round("o_totalprice", 2).alias("total")
    )


@query(
    "join_broadcast",
    oracle="""
    SELECT n.n_name, round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-side join: supplier and nation are broadcast, so the fact table
    never shuffles for the join — only the 25-group aggregate shuffles."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("n_name")
    )


_ORDER_LINE_AGG = """
    (SELECT l_orderkey, count(*) AS n_lines, round(sum(l_quantity), 2) AS qty
     FROM lineitem GROUP BY l_orderkey)
"""


@query(
    "join_left_outer",
    oracle=f"""
    SELECT o.o_orderkey, o.o_orderstatus, la.n_lines, la.qty
    FROM orders o LEFT JOIN {_ORDER_LINE_AGG} la ON o.o_orderkey = la.l_orderkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer: line-less orders (FIXTURES.md: they exist by
    construction) surface with NULL aggregates."""
    o = load(spark, sf_dir, "orders")
    la = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("n_lines"), F.round(F.sum("l_quantity"), 2).alias("qty"))
    )
    return o.join(la, o.o_orderkey == la.l_orderkey, "left").select(
        "o_orderkey", "o_orderstatus", "n_lines", "qty"
    )


@query(
    "join_right_outer",
    oracle=f"""
    SELECT o.o_orderkey, o.o_orderstatus, la.n_lines, la.qty
    FROM {_ORDER_LINE_AGG} la RIGHT JOIN orders o ON o.o_orderkey = la.l_orderkey
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    la = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("n_lines"), F.round(F.sum("l_quantity"), 2).alias("qty"))
    )
    o = load(spark, sf_dir, "orders")
    return la.join(o, o.o_orderkey == la.l_orderkey, "right").select(
        "o_orderkey", "o_orderstatus", "n_lines", "qty"
    )


@query(
    "join_full_outer",
    oracle="""
    SELECT coalesce(big.o_custkey, c.c_custkey) AS custkey,
           big.n_big, round(c.c_acctbal, 2) AS acctbal
    FROM (SELECT o_custkey, count(*) AS n_big FROM orders
          WHERE o_totalprice > 250000 GROUP BY o_custkey) big
    FULL JOIN (SELECT * FROM customer WHERE c_acctbal < 0) c
      ON big.o_custkey = c.c_custkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer with genuinely unmatched rows on BOTH sides (big spenders
    that aren't negative-balance customers, and vice versa)."""
    big = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 250000)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_big"))
    )
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") < 0)
    return big.join(c, big.o_custkey == c.c_custkey, "full").select(
        F.coalesce("o_custkey", "c_custkey").alias("custkey"),
        "n_big",
        F.round("c_acctbal", 2).alias("acctbal"),
    )


@query(
    "join_left_semi",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 350000)
    """,
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a semi join: no row multiplication, build side only
    carries the key — the cheapest of the join family at scale."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 350000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_left_anti",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "join_theta_range",
    oracle="""
    SELECT b.r_regionkey AS band, count(*) AS n_events,
           round(sum(e.value), 2) AS band_value
    FROM events e
    JOIN region b
      ON e.value >= b.r_regionkey * 100.0 AND e.value < (b.r_regionkey + 1) * 100.0
    GROUP BY b.r_regionkey
    ORDER BY band
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure non-equi (theta) join: events banded by value against a 5-row
    bound table derived from region. Spark plans broadcast-nested-loop —
    correct here ONLY because the small side is domain-bounded, so the
    product is 5×|events|, linear at any scale."""
    e = load(spark, sf_dir, "events")
    b = load(spark, sf_dir, "region").select("r_regionkey")
    cond = (e.value >= b.r_regionkey * 100.0) & (e.value < (b.r_regionkey + 1) * 100.0)
    return (
        e.join(F.broadcast(b), cond)
        .groupBy(F.col("r_regionkey").alias("band"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("band_value"))
        .orderBy("band")
    )


@query(
    "join_multiway_star",
    oracle="""
    SELECT n.n_name, round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
)
def join_multiway_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way star chain. Dims are broadcast (bounded),
    the customer→orders→lineitem chain shuffles on its keys; AQE is free
    to reorder. Filter on region prunes before any fact-table work."""
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@query(
    "join_asof",
    oracle="""
    SELECT event_id, user_id, ts, o_orderkey AS asof_orderkey, o_orderdate AS asof_orderdate
    FROM (
      SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
             row_number() OVER (PARTITION BY e.event_id
                                ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      FROM events e
      JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    ) t WHERE rn = 1
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (latest order at-or-before each event, per user).

    Spark has no native ASOF JOIN. The scalable construction is the
    ordered-merge: union both sides tagged by kind, sort within each key
    by (time, kind, tie), and carry the latest order forward with
    ``last(..., ignorenulls=True)`` over a running frame. One shuffle on
    the key, zero pair blow-up — unlike equi-join + argmax, whose
    intermediate grows with events×orders per key (quadratic in key
    frequency, fatal for hot keys at 100 TB).

    Ordering makes the semantics exact: at equal time, orders sort before
    events (at-or-BEFORE is inclusive); among same-date orders the highest
    o_orderkey sorts last, so ``last`` picks it — matching the oracle's
    ``ORDER BY o_orderdate DESC, o_orderkey DESC`` tie-break
    (SURVEY.md §7.3 risk 4).
    """
    e = load(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(1).alias("is_event"),
        F.col("event_id"),
        F.lit(None).cast("long").alias("okey"),
        F.lit(None).cast("timestamp").alias("odate"),
    )
    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("is_event"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_orderkey").alias("okey"),
        F.col("o_orderdate").alias("odate"),
    )
    w = (
        Window.partitionBy("k")
        .orderBy("t", "is_event", "okey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = o.unionByName(e).select(
        "k",
        "t",
        "is_event",
        "event_id",
        F.last("okey", ignorenulls=True).over(w).alias("asof_orderkey"),
        F.last("odate", ignorenulls=True).over(w).alias("asof_orderdate"),
    )
    return merged.filter(
        (F.col("is_event") == 1) & F.col("asof_orderkey").isNotNull()
    ).select(
        "event_id",
        F.col("k").alias("user_id"),
        F.col("t").alias("ts"),
        "asof_orderkey",
        "asof_orderdate",
    )


@query(
    "join_interval_overlap",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS n_shipped_30d
    FROM lineitem l
    JOIN orders o
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-containment join: equi key bounds the pair space, the range
    predicate filters within each key group — never a cross product."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate <= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
    )
    return (
        li.join(o, cond)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_shipped_30d"))
        .orderBy("o_orderpriority")
    )


@query(
    "join_self_pairs",
    oracle="""
    SELECT a.label AS label_a, b.label AS label_b, count(*) AS n_pairs
    FROM embeddings a
    JOIN embeddings b ON a.vec_id < b.vec_id
    GROUP BY a.label, b.label
    ORDER BY label_a, label_b
    """,
)
def join_self_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered self-pair enumeration (a.vec_id < b.vec_id) — the pair basis
    for sim_* (§2.11), grouped down to a label×label matrix. The O(n²)
    pair SPACE is inherent to the semantics, but no pair row is ever
    materialized: the same hash-bucketed grid shuffle the sim_ kernels
    use (vectorops._grid_blocks) hands each upper-triangle block pair to
    one task, which counts ordered pairs per (label_a, label_b) with a
    sort + searchsorted — O(n log n) per block, label-matrix output — and
    the partial matrices sum in a final bounded groupBy. Task memory is
    one block pair at any corpus size; the old theta self-join put the
    whole corpus on both sides of one nested-loop task."""
    import numpy as np
    import pandas as pd

    from sparkgraft.vectorops import (
        _BLOCK_ROWS,
        _MIN_BLOCKS,
        _corpus_count,
        _grid_blocks,
    )

    def _ordered_counts(ids_small, lab_small, ids_big, lab_big, cnt):
        # pairs (s, b) with s.id < b.id → key (s.label, b.label)
        for q in np.unique(lab_big):
            bq = np.sort(ids_big[lab_big == q])
            n_greater = len(bq) - np.searchsorted(bq, ids_small, side="right")
            for p in np.unique(lab_small):
                c = int(n_greater[lab_small == p].sum())
                if c:
                    cnt[(p, q)] = cnt.get((p, q), 0) + c

    def pair_counts(key, pdf):
        bi, bj = key
        l_pdf = pdf[pdf["bucket"] == bi]
        r_pdf = pdf[pdf["bucket"] == bj]
        out_cols = {"label_a": "int32", "label_b": "int32", "n_pairs": "int64"}
        if l_pdf.empty or r_pdf.empty:
            return pd.DataFrame({k: pd.Series([], dtype=v) for k, v in out_cols.items()})
        ids_l, lab_l = l_pdf["vec_id"].to_numpy(), l_pdf["label"].to_numpy()
        ids_r, lab_r = r_pdf["vec_id"].to_numpy(), r_pdf["label"].to_numpy()
        cnt: dict[tuple[int, int], int] = {}
        _ordered_counts(ids_l, lab_l, ids_r, lab_r, cnt)
        if bi != bj:  # the diagonal block counts each unordered pair once already
            _ordered_counts(ids_r, lab_r, ids_l, lab_l, cnt)
        keys = sorted(cnt)
        return pd.DataFrame(
            {
                "label_a": pd.Series([k[0] for k in keys], dtype="int32"),
                "label_b": pd.Series([k[1] for k in keys], dtype="int32"),
                "n_pairs": pd.Series([cnt[k] for k in keys], dtype="int64"),
            }
        )

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "label")
    n = _corpus_count(spark, sf_dir)
    n_blocks = max(_MIN_BLOCKS, -(-n // _BLOCK_ROWS))
    partial = _grid_blocks(spark, emb, n_blocks).applyInPandas(
        pair_counts, "label_a int, label_b int, n_pairs long"
    )
    return (
        partial.groupBy("label_a", "label_b")
        .agg(F.sum("n_pairs").alias("n_pairs"))
        .orderBy("label_a", "label_b")
    )


@query(
    "join_range_binned",
    oracle="""
    SELECT a.user_id,
           a.event_id AS event_a,
           b.event_id AS event_b,
           date_diff('microsecond', a.ts, b.ts) AS delta_us
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND a.event_id < b.event_id
     AND b.ts >= a.ts
     AND date_diff('microsecond', a.ts, b.ts) <= 300000000
    ORDER BY event_a, event_b
    """,
)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proximity (range) join via time binning — the scale recipe for
    range predicates that a broadcast nested loop can't survive: bin each
    timestamp into window-width buckets (5 min), explode the left side to
    its two candidate buckets (bin, bin+1), equi-join on (user, bucket),
    then apply the exact range predicate. The non-equi condition rides a
    hash-partitioned equi shuffle; candidate blow-up is exactly 2×, and
    every qualifying pair matches exactly once (the probe buckets are
    distinct and b's bucket is unique). µs arithmetic is engine-internal
    on both sides, so bin-boundary parity never matters — only the final
    (offset-cancelling) delta predicate does."""
    win_us = 300_000_000  # 5 minutes, in microseconds
    e = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    us = F.unix_micros(F.col("ts"))
    binned = e.select(
        "event_id",
        "user_id",
        us.alias("t_us"),
        F.floor(us / F.lit(win_us)).alias("bin"),
    )
    a = binned.withColumn(
        "probe_bin", F.explode(F.array(F.col("bin"), F.col("bin") + 1))
    ).select(
        F.col("event_id").alias("event_a"),
        F.col("user_id"),
        F.col("t_us").alias("t_a"),
        "probe_bin",
    )
    b = binned.select(
        F.col("event_id").alias("event_b"),
        F.col("user_id").alias("user_b"),
        F.col("t_us").alias("t_b"),
        F.col("bin").alias("bin_b"),
    )
    return (
        a.join(
            b,
            (F.col("user_id") == F.col("user_b"))
            & (F.col("probe_bin") == F.col("bin_b"))
            & (F.col("event_a") < F.col("event_b"))
            & (F.col("t_b") >= F.col("t_a"))
            & (F.col("t_b") - F.col("t_a") <= win_us),
        )
        .select(
            "user_id",
            "event_a",
            "event_b",
            (F.col("t_b") - F.col("t_a")).alias("delta_us"),
        )
        .orderBy("event_a", "event_b")
    )


def bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ lineitem over pre-bucketed tables — zero join-side shuffle.

    Both fact tables are written `bucketBy(8, <orderkey>)` + `sortBy`
    (one file per bucket via a matching repartition, so the sort survives
    the write). A sort-merge join over matching bucket specs reads
    co-located buckets directly: the plan has NO Exchange under the join
    (asserted in tests/test_plans.py). This is the Spark-native form of
    the Hadoop world's pre-partitioned map-side merge join, and the
    pattern that amortizes one shuffle across every downstream join of
    the same key at 100 TB."""
    import os
    import tempfile

    # per-process token: two concurrent Spark apps on the same sf_dir
    # (e.g. bench + preflight) must not race on shared scratch tables/files
    tag = f"{sf_dir.strip('/').replace('/', '_').replace('.', '_')}_p{os.getpid()}"
    scratch = os.path.join(tempfile.gettempdir(), "sparkgraft_bucketed", tag)
    for name, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        tbl = f"sg_{name}_b_{tag}"
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        (
            load(spark, sf_dir, name)
            .repartition(8, F.col(key))  # 1 task : 1 bucket → 1 sorted file
            .write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .option("path", os.path.join(scratch, name))
            .saveAsTable(tbl)
        )
    o = spark.table(f"sg_orders_b_{tag}")
    li = spark.table(f"sg_lineitem_b_{tag}")
    return li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey)


@query(
    "join_bucketed_colocated",
    oracle="""
    SELECT o.o_orderstatus,
           count(*)                         AS n_lines,
           round(avg(l.l_quantity), 6)      AS avg_qty,
           round(sum(l.l_extendedprice), 2) AS total_price
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus
    ORDER BY o.o_orderstatus
    """,
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over the shuffle-free bucketed join (`bucketed_join`).
    The only Exchanges in the whole plan belong to the final groupBy/sort,
    never to the join inputs."""
    return (
        bucketed_join(spark, sf_dir)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "join_null_safe",
    oracle="""
    WITH a AS (SELECT o_orderkey, nullif(o_orderstatus, 'O') AS st FROM orders),
    b AS (SELECT nullif(o_orderstatus, 'O') AS st, count(*) AS group_total
          FROM orders GROUP BY nullif(o_orderstatus, 'O'))
    SELECT coalesce(a.st, '_open_') AS status_key,
           count(*)                 AS n_orders,
           min(b.group_total)       AS group_total
    FROM a JOIN b ON a.st IS NOT DISTINCT FROM b.st
    GROUP BY coalesce(a.st, '_open_')
    ORDER BY status_key
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    MATCH each other instead of silently dropping — the semantics an
    attribute-match ETL join needs when the key is optional. Spark treats
    `eqNullSafe` as a true equi-join key, so this plans as a hash join
    (broadcast here — the grouped side is 3 rows), never a nested loop;
    a plain `=` join would lose every derived-NULL row, which the
    '_open_' group's 7k+ matches makes visible."""
    o = load(spark, sf_dir, "orders")
    st = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    a = o.select("o_orderkey", st.alias("st"))
    b = o.groupBy(st.alias("st")).agg(F.count("*").alias("group_total"))
    return (
        a.join(F.broadcast(b), a["st"].eqNullSafe(b["st"]))
        .groupBy(F.coalesce(a["st"], F.lit("_open_")).alias("status_key"))
        .agg(
            F.count("*").alias("n_orders"),
            F.min("group_total").alias("group_total"),
        )
        .orderBy("status_key")
    )


_EXISTS_SQL = """
SELECT c.c_custkey, c.c_name, c.c_acctbal
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
"""


@query("join_exists_subquery", oracle=_EXISTS_SQL)
def join_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS subqueries submitted as SQL text —
    Catalyst de-correlates them into a left-semi + left-anti join pair
    (visible in the plan), the scale-correct rewrite; the identical text
    runs on DuckDB as the oracle."""
    register_tables(spark, sf_dir, ["customer", "orders"])
    return spark.sql(_EXISTS_SQL)


_ASOF_TOLERANCE_DAYS = 30


@query(
    "join_asof_tolerance",
    oracle=f"""
    WITH matched AS (
      SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
             row_number() OVER (PARTITION BY e.event_id
                                ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      FROM events e
      JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
    SELECT e.event_id, e.user_id,
           CASE WHEN date_diff('day', CAST(m.o_orderdate AS DATE),
                               CAST(e.ts AS DATE)) <= {_ASOF_TOLERANCE_DAYS}
                THEN m.o_orderkey END AS asof_orderkey,
           CASE WHEN date_diff('day', CAST(m.o_orderdate AS DATE),
                               CAST(e.ts AS DATE)) <= {_ASOF_TOLERANCE_DAYS}
                THEN date_diff('day', CAST(m.o_orderdate AS DATE),
                               CAST(e.ts AS DATE))::BIGINT END AS staleness_days
    FROM events e
    LEFT JOIN matched m ON m.event_id = e.event_id AND m.rn = 1
    ORDER BY e.event_id
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a max-staleness bound — the feature-store lookup
    contract: the latest order at-or-before each event counts ONLY if it
    is at most {_ASOF_TOLERANCE_DAYS} days old; staler matches surface
    as NULL (stale features must be dropped, not silently served).
    Identical ordered-merge single-shuffle construction as `join_asof`
    (union + running last-ignorenulls — no per-key pair blow-up); the
    tolerance is one row-local predicate applied after the merge, which
    is exactly how a 100 TB run bounds feature staleness without a
    second pass."""
    e = load(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(1).alias("is_event"),
        F.col("event_id"),
        F.lit(None).cast("long").alias("okey"),
        F.lit(None).cast("timestamp").alias("odate"),
    )
    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("is_event"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_orderkey").alias("okey"),
        F.col("o_orderdate").alias("odate"),
    )
    w = (
        Window.partitionBy("k")
        .orderBy("t", "is_event", "okey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = o.unionByName(e).select(
        "k",
        "t",
        "is_event",
        "event_id",
        F.last("okey", ignorenulls=True).over(w).alias("cand_key"),
        F.last("odate", ignorenulls=True).over(w).alias("cand_date"),
    )
    staleness = F.datediff(F.to_date("t"), F.to_date("cand_date"))
    fresh = F.col("cand_key").isNotNull() & (staleness <= _ASOF_TOLERANCE_DAYS)
    return (
        merged.filter(F.col("is_event") == 1)
        .select(
            "event_id",
            F.col("k").alias("user_id"),
            F.when(fresh, F.col("cand_key")).alias("asof_orderkey"),
            F.when(fresh, staleness.cast("long")).alias("staleness_days"),
        )
        .orderBy("event_id")
    )


@query(
    "join_nearest_event",
    oracle="""
    WITH purch AS (
      SELECT event_id AS purchase_id, user_id, ts AS pts,
             CAST(ts AS DATE) AS pday
      FROM events WHERE event_type = 'purchase'),
    clicks AS (
      SELECT event_id AS click_id, user_id, ts AS cts,
             CAST(ts AS DATE) AS cday
      FROM events WHERE event_type = 'click'),
    cand AS (
      SELECT p.purchase_id, p.user_id, c.click_id,
             abs(epoch_us(p.pts) - epoch_us(c.cts)) AS diff_us
      FROM purch p
      JOIN (SELECT c.*, (c.cday + o.off) AS bday
            FROM clicks c, (VALUES (-1), (0), (1)) o(off)) c
        ON p.user_id = c.user_id AND p.pday = c.bday
      WHERE abs(epoch_us(p.pts) - epoch_us(c.cts)) <= 86400000000),
    ranked AS (
      SELECT purchase_id, user_id, click_id,
             round(diff_us / 1e6, 6) AS diff_s,
             row_number() OVER (PARTITION BY purchase_id
                                ORDER BY diff_us, click_id) AS rn
      FROM cand)
    SELECT purchase_id, user_id, click_id, diff_s
    FROM ranked WHERE rn = 1
    ORDER BY purchase_id
    """,
)
def join_nearest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor-in-time join, BIDIRECTIONAL: each purchase is
    matched to its temporally closest click by the same user within ±24 h
    — the attribution semantics `join_asof` (backward-only) can't
    express. The candidate space is bounded the same way as
    `join_range_binned`: each click fans out to its 3 adjacent day
    buckets (constant 3× replication — never a range/theta join), the
    purchase side equi-joins on (user, day), and the exact ±24 h band plus
    a (|Δt|, click_id)-ranked window pick the winner deterministically.
    Time math stays in integer microseconds until the final display
    division, so both engines rank identical keys. Scale shape: one
    equi-shuffle on a well-spread (user, day) key + one bounded keyed
    window — no pair blow-up at any corpus size."""
    ev = load(spark, sf_dir, "events")
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("pts"),
        F.to_date("ts").alias("pday"),
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("cts"),
            F.to_date("ts").alias("cday"),
        )
        .withColumn("off", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("bday", F.date_add("cday", F.col("off")))
    )
    diff_us = F.abs(F.unix_micros("pts") - F.unix_micros("cts"))
    cand = (
        purch.join(
            clicks,
            (purch.user_id == clicks.c_user_id) & (purch.pday == clicks.bday),
        )
        .withColumn("diff_us", diff_us)
        .filter(F.col("diff_us") <= 86_400_000_000)
    )
    w = Window.partitionBy("purchase_id").orderBy("diff_us", "click_id")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "purchase_id",
            "user_id",
            "click_id",
            F.round(F.col("diff_us") / 1e6, 6).alias("diff_s"),
        )
        .orderBy("purchase_id")
    )


@query(
    "join_bloom_prune",
    oracle="""
    SELECT o.o_orderstatus, count(*) AS n,
           round(sum(l.l_extendedprice), 2) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY o.o_orderstatus ORDER BY o_orderstatus
    """,
)
def join_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter join pruning (Spark's InjectRuntimeFilter):
    the selective filter on the orders side is compiled into a
    `bloom_filter_agg` subquery whose `might_contain` probe is pushed
    into the LINEITEM SCAN — at 100 TB this skips reading most of the
    fact side before the shuffle even forms, the engine-native
    equivalent of a semi-join pre-filter. The scan-size threshold is
    lowered so the rule fires at test scale, and auto-broadcast is
    disabled while PLANNING (injection targets shuffle joins — a
    broadcast join already prunes by construction); `executedPlan()` is
    forced inside the conf scope so the bloom-injected plan is frozen
    before the session confs are restored, and results are identical
    with or without the filter (it is pure pruning — plan-asserted in
    tests/test_plans.py)."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        o = load(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = load(spark, sf_dir, "lineitem")
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
            )
            .orderBy("o_orderstatus")
        )
        j._jdf.queryExecution().executedPlan()
        return j
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


@query(
    "join_scd2_pointintime",
    oracle="""
    WITH dim AS (
      SELECT user_id, event_id AS version_id, value AS plan_value,
             ts AS eff_from,
             lead(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS eff_to
      FROM events WHERE event_type = 'signup'),
    fact AS (
      SELECT event_id AS purchase_id, user_id, ts,
             value AS purchase_value
      FROM events WHERE event_type = 'purchase')
    SELECT f.purchase_id, f.user_id, f.purchase_value,
           d.version_id, d.plan_value
    FROM fact f LEFT JOIN dim d
      ON f.user_id = d.user_id
     AND f.ts >= d.eff_from
     AND (d.eff_to IS NULL OR f.ts < d.eff_to)
    ORDER BY f.purchase_id
    """,
)
def join_scd2_pointintime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 point-in-time join — every
    purchase attributed to the profile version (latest prior signup)
    effective at its timestamp, the warehouse query behind "price as it
    was when they bought". The textbook form is a non-equi range join
    (BETWEEN eff_from AND eff_to), which Spark can only execute as a
    per-user nested loop; the scalable identity is the UNION-MERGE: tag
    dim versions 0 and facts 1, union them, and carry the last version
    struct forward over ONE (user_id)-keyed ordered window. One shuffle,
    O(1) state per row, no fan-out — the same plan shape at 100 TB.
    Dim-before-fact ordering at equal timestamps makes a version
    effective AT t apply to facts at t (the oracle's >= bound); a
    version superseded at the same instant has an empty interval on both
    sides. Facts before any signup keep NULL version columns (left
    join)."""
    ev = load(spark, sf_dir, "events")
    dim = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        "ts",
        F.lit(0).alias("tag"),
        F.col("event_id").alias("ord_id"),
        F.struct(
            F.col("event_id").alias("version_id"),
            F.col("value").alias("plan_value"),
        ).alias("version"),
        F.lit(None).cast("long").alias("purchase_id"),
        F.lit(None).cast("double").alias("purchase_value"),
    )
    fact = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("tag"),
        F.col("event_id").alias("ord_id"),
        F.lit(None)
        .cast("struct<version_id:long,plan_value:double>")
        .alias("version"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag", "ord_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        dim.unionByName(fact)
        .withColumn("cur", F.last("version", ignorenulls=True).over(w))
        .filter(F.col("tag") == 1)
        .select(
            "purchase_id",
            "user_id",
            "purchase_value",
            F.col("cur.version_id").alias("version_id"),
            F.col("cur.plan_value").alias("plan_value"),
        )
        .orderBy("purchase_id")
    )


@query(
    "join_not_in_null_aware",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_custkey NOT IN (
      SELECT nullif(c_custkey, -1) FROM customer WHERE c_acctbal < 500.0)
    ORDER BY o_orderkey
    """,
)
def join_not_in_null_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN as a join — the semantic trap NOT EXISTS doesn't have: a
    single NULL in the subquery list makes NOT IN return no rows (ANSI
    three-valued logic), so a plain left-anti rewrite is WRONG whenever
    the list column is nullable. Spark plans this as a null-aware anti
    join (the left-anti variant that tracks list-side nulls); expressing
    it through ``spark.sql`` keeps that plan — and its broadcast of the
    filtered subquery — intact rather than hand-lowering to a join that
    silently changes semantics. The list column is made NULLABLE via
    nullif (no −1 keys exist, values unchanged) because on a provably
    non-null column Catalyst correctly degrades to a plain left anti —
    the null-aware machinery only engages when it must (plan-asserted). The subquery side here is a selective
    dim filter (bounded), the probe side streams — the right shape for a
    100 TB fact table."""
    register_tables(spark, sf_dir, ["orders", "customer"])
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_custkey NOT IN (
          SELECT nullif(c_custkey, -1) FROM customer WHERE c_acctbal < 500.0)
        ORDER BY o_orderkey
        """
    )


_PRICE_BANDS = [
    ("budget", 0, 100000),
    ("mid", 100000, 200000),
    ("premium", 200000, 350000),
    ("luxury", 350000, 10**12),
]


@query(
    "join_band_lookup",
    oracle="""
    WITH bands(band, lo, hi) AS (
      VALUES ('budget', 0, 100000), ('mid', 100000, 200000),
             ('premium', 200000, 350000), ('luxury', 350000, 1000000000000)),
    j AS (
      SELECT b.band, b.lo,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM orders o JOIN bands b
        ON CAST(round(o.o_totalprice * 100) AS BIGINT) >= b.lo * 100
       AND CAST(round(o.o_totalprice * 100) AS BIGINT) <  b.hi * 100)
    SELECT band, count(*) AS n_orders,
           round(CAST(sum(cents) AS DOUBLE) / 100.0, 2) AS revenue
    FROM j GROUP BY band, lo ORDER BY lo
    """,
)
def join_band_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banding join: classify every order into a price tier by an
    INEQUALITY join against a tier table — the lookup-table pattern
    where the bands live in data (tier tables change without a deploy),
    not in a CASE expression. This is the one place a broadcast
    nested-loop join is the RIGHT plan: the inner side is bounded by
    the band domain (a handful of rows at any corpus size), so the
    'nested loop' is a constant-length scan per row — O(rows × bands),
    embarrassingly parallel, zero shuffle. Contrast `join_theta_range`
    (two corpus-sized sides), which must bin first. Prices compare as
    exact int64 cents so band edges cannot float-flip."""
    bands = spark.createDataFrame(
        _PRICE_BANDS, "band string, lo long, hi long"
    )
    o = load(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    j = o.select(cents.alias("cents")).join(
        F.broadcast(bands),
        (F.col("cents") >= F.col("lo") * 100)
        & (F.col("cents") < F.col("hi") * 100),
    )
    return (
        j.groupBy("band", "lo")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("cents").cast("double") / 100.0, 2).alias("revenue"),
        )
        .orderBy("lo")
        .select("band", "n_orders", "revenue")
    )


@query(
    "join_dim_grid",
    oracle="""
    WITH grid AS (
      SELECT r.r_name, p.prio
      FROM region r,
           (SELECT DISTINCT o_orderpriority AS prio FROM orders) p),
    obs AS (
      SELECT r.r_name, o.o_orderpriority AS prio,
             count(*) AS n_orders,
             sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n   ON n.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      GROUP BY r.r_name, o.o_orderpriority)
    SELECT g.r_name, g.prio,
           CAST(COALESCE(ob.n_orders, 0) AS BIGINT) AS n_orders,
           round(CAST(COALESCE(ob.cents, 0) AS DOUBLE) / 100.0, 2)
             AS revenue
    FROM grid g
    LEFT JOIN obs ob ON ob.r_name = g.r_name AND ob.prio = g.prio
    ORDER BY g.r_name, g.prio
    """,
)
def join_dim_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense dimension grid (region × priority) with zero-filled cells —
    the scaffolding join every dashboard matrix needs so EMPTY
    combinations still render. This is the one legitimate CARTESIAN:
    both sides are bounded dimension domains (geography × a 5-value
    enum), so the product is a constant-size scaffold at any corpus
    size; the observed aggregate then LEFT-joins onto the grid (never
    the reverse — an inner join would silently drop the empty cells the
    grid exists to surface)."""
    grid = load(spark, sf_dir, "region").select("r_name").crossJoin(
        load(spark, sf_dir, "orders")
        .select(F.col("o_orderpriority").alias("prio"))
        .distinct()
    )
    obs = (
        load(spark, sf_dir, "orders")
        .join(
            load(spark, sf_dir, "customer"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(
            load(spark, sf_dir, "nation"),
            F.col("n_nationkey") == F.col("c_nationkey"),
        )
        .join(
            load(spark, sf_dir, "region"),
            F.col("r_regionkey") == F.col("n_regionkey"),
        )
        .groupBy("r_name", F.col("o_orderpriority").alias("prio"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "cents"
            ),
        )
    )
    return (
        grid.join(obs, ["r_name", "prio"], "left")
        .select(
            "r_name",
            "prio",
            F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"),
            F.round(
                F.coalesce("cents", F.lit(0)).cast("double") / 100.0, 2
            ).alias("revenue"),
        )
        .orderBy("r_name", "prio")
    )


@query(
    "join_ri_audit",
    oracle="""
    SELECT 'lineitem->part' AS relation,
           (SELECT count(*) FROM lineitem) AS n_rows,
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM part p
                              WHERE p.p_partkey = l.l_partkey)) AS n_orphans
    UNION ALL
    SELECT 'lineitem->supplier',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM supplier s
                              WHERE s.s_suppkey = l.l_suppkey))
    UNION ALL
    SELECT 'orders->customer',
           (SELECT count(*) FROM orders),
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'part<-lineitem (dead stock)',
           (SELECT count(*) FROM part),
           (SELECT count(*) FROM part p
            WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                              WHERE l.l_partkey = p.p_partkey))
    UNION ALL
    SELECT 'customer<-orders (never ordered)',
           (SELECT count(*) FROM customer),
           (SELECT count(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey))
    ORDER BY relation
    """,
)
def join_ri_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema in one
    table: fact→dim ORPHAN counts (lineitems pointing at missing
    parts/suppliers, orders at missing customers — broken FK loads) AND
    the reverse dim←fact DEAD rows (parts never shipped, customers who
    never ordered — the dead-stock/dormant views). Every probe is a
    LEFT ANTI join — the exists-negation that plans as one hash
    equi-join per relation with no row fan-out — and the five bounded
    audit rows union together. Zero on the orphan rows is the load
    invariant; nonzero dead-stock is business signal, not error."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")

    def audit(name, fact, dim, fk, pk):
        # one lazy 1-row frame per relation: total + anti-join count —
        # the five frames union into ONE job, nothing driver-side
        total = fact.agg(F.count("*").alias("n_rows"))
        orphans = fact.join(dim, F.col(fk) == F.col(pk), "left_anti").agg(
            F.count("*").alias("n_orphans")
        )
        return total.crossJoin(orphans).select(
            F.lit(name).alias("relation"),
            F.col("n_rows").cast("long"),
            F.col("n_orphans").cast("long"),
        )

    frames = [
        audit("lineitem->part", li, part, "l_partkey", "p_partkey"),
        audit("lineitem->supplier", li, supp, "l_suppkey", "s_suppkey"),
        audit("orders->customer", orders, cust, "o_custkey", "c_custkey"),
        audit(
            "part<-lineitem (dead stock)", part, li, "p_partkey", "l_partkey"
        ),
        audit(
            "customer<-orders (never ordered)",
            cust,
            orders,
            "c_custkey",
            "o_custkey",
        ),
    ]
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out.orderBy("relation")


@query(
    "join_cbo_reorder",
    oracle="""
    SELECT n.n_name,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents,
           TRUE AS stats_reordered
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE n.n_name IN ('NATION_3', 'NATION_7')
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
)
def join_cbo_reorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COST-BASED-OPTIMIZER join reordering — the statistics-driven
    member of the optimizer-proof family (AQE skew split, runtime BHJ
    switch, DPP, and runtime bloom pruning prove RUNTIME adaptivity;
    this key proves PLAN-TIME statistics use, the r9 verdict's missing
    #4). The three tables land as catalog tables and get `ANALYZE TABLE
    ... COMPUTE STATISTICS FOR ALL COLUMNS` (row counts + per-column
    ndv/min/max — the inputs Spark's CBO join-reorder DP costs plans
    with); the star query is submitted in a deliberately BAD syntactic
    order (fact ⋈ customer ⋈ filtered-tiny-nation last). Plan-asserted
    on both sides of the conf:

    - with CBO OFF the optimized plan keeps the syntactic order (the
      stats-free ReorderJoin rule never touches a fully-conditioned
      chain), fact first;
    - with `spark.sql.cbo.enabled` + `spark.sql.cbo.joinReorder.enabled`
      ON, the SAME query reorders to build customer ⋈ nation FIRST —
      the selective IN-filter on nation's 25 rows makes that join's
      estimated cardinality tiny — and joins the fact LAST (asserted:
      both dims precede the fact in the optimized plan's leaf order).

    The oracle pins the result to the recomputed star aggregate, so the
    reorder provably preserved semantics. Scale: at 100 TB, stats-driven
    ordering is the difference between a 5-way star that shuffles the
    fact once and one that shuffles it per-join; ANALYZE is one linear
    scan amortized over every subsequent plan, exactly how production
    warehouses run (nightly ANALYZE, CBO on)."""
    import os
    import tempfile

    tag = (
        f"{sf_dir.strip('/').replace('/', '_').replace('.', '_')}"
        f"_p{os.getpid()}"
    )
    scratch = os.path.join(tempfile.gettempdir(), "sparkgraft_cbo", tag)
    # ANALYZE exactly the columns the join-reorder DP costs with — the
    # join keys and the selective filter column. FOR ALL COLUMNS also
    # ndv-scanned every payload column of orders (strings, timestamps),
    # tripling the ANALYZE cost for stats the reorder never reads
    # (guide §1.2: don't compute things you throw away); production
    # warehouses scope nightly ANALYZE to predicate/join columns the
    # same way. Row counts land either way, and the reorder assertions
    # below still pin the stats-driven plan flip.
    stat_cols = {
        "orders": "o_custkey",
        "customer": "c_custkey, c_nationkey",
        "nation": "n_nationkey, n_name",
    }
    for name in ("orders", "customer", "nation"):
        tbl = f"sg_cbo_{name}_{tag}"
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        (
            load(spark, sf_dir, name)
            .write.mode("overwrite")
            .option("path", os.path.join(scratch, name))
            .saveAsTable(tbl)
        )
        spark.sql(
            f"ANALYZE TABLE {tbl} COMPUTE STATISTICS "
            f"FOR COLUMNS {stat_cols[name]}"
        )
        has_stats = (
            spark.sql(f"DESC EXTENDED {tbl}")
            .filter("col_name = 'Statistics'")
            .count()
        )
        if not has_stats:
            raise RuntimeError(f"ANALYZE left no table statistics on {tbl}")

    sql = f"""
    SELECT n.n_name,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents,
           TRUE AS stats_reordered
    FROM sg_cbo_orders_{tag} o
    JOIN sg_cbo_customer_{tag} c ON o.o_custkey = c.c_custkey
    JOIN sg_cbo_nation_{tag} n ON c.c_nationkey = n.n_nationkey
    WHERE n.n_name IN ('NATION_3', 'NATION_7')
    GROUP BY n.n_name
    ORDER BY n.n_name
    """

    def leaf_positions(df: DataFrame) -> dict[str, int]:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        return {
            t: plan.find(f"sg_cbo_{t}_{tag}")
            for t in ("orders", "customer", "nation")
        }

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.cbo.enabled",
            "spark.sql.cbo.joinReorder.enabled",
        )
    }
    try:
        spark.conf.set("spark.sql.cbo.enabled", "false")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
        off = leaf_positions(spark.sql(sql))
        if not (off["orders"] < off["customer"] < off["nation"]):
            raise RuntimeError(
                f"CBO-off plan left the syntactic order: {off}"
            )
        spark.conf.set("spark.sql.cbo.enabled", "true")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
        out = spark.sql(sql)
        on = leaf_positions(out)
        # stats-driven: both dims are built BEFORE the fact joins in
        if not (on["customer"] < on["orders"] and on["nation"] < on["orders"]):
            raise RuntimeError(
                f"CBO did not reorder the star (stats unused?): {on}"
            )
        # materialize the REORDERED plan's result inside the conf scope
        rows = out.collect()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return spark.createDataFrame(
        rows, "n_name string, n_orders long, cents long, stats_reordered boolean"
    )


_GEO_R_KM = 200.0
_GEO_CELL_DEG = 2.0
_GEO_HAV = (
    "2 * 6371.0088 * asin(least(1.0, sqrt("
    "sin(radians({lat2} - {lat1}) / 2) * sin(radians({lat2} - {lat1}) / 2)"
    " + cos(radians({lat1})) * cos(radians({lat2}))"
    " * sin(radians({lon2} - {lon1}) / 2)"
    " * sin(radians({lon2} - {lon1}) / 2))))"
)


@query(
    "join_geo_grid",
    oracle=f"""
    WITH cust AS (
      SELECT c_custkey,
             (c_custkey * 7919 % 12000) / 100.0 - 60.0 AS clat,
             (c_custkey * 104729 % 36000) / 100.0 - 180.0 AS clon
      FROM customer),
    supp AS (
      SELECT s_suppkey,
             (s_suppkey * 7919 % 12000) / 100.0 - 60.0 AS slat,
             (s_suppkey * 104729 % 36000) / 100.0 - 180.0 AS slon
      FROM supplier),
    pairs AS (
      SELECT s.s_suppkey,
             round({_GEO_HAV.format(lat1='s.slat', lon1='s.slon',
                                    lat2='c.clat', lon2='c.clon')}, 3)
               AS d
      FROM supp s CROSS JOIN cust c)
    SELECT s_suppkey, CAST(count(*) AS BIGINT) AS n_within,
           min(d) AS nearest_km
    FROM pairs WHERE d <= {_GEO_R_KM}
    GROUP BY s_suppkey ORDER BY s_suppkey
    """,
)
def join_geo_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRID-BUCKETED SPATIAL JOIN — the operator Spark lacks natively,
    composed from existing ops: customers within {_GEO_R_KM} km of each
    supplier, found by hashing both sides into {_GEO_CELL_DEG}° grid
    cells and probing only the supplier's 3×5 cell neighborhood (±1 lat
    × ±2 lon, longitude wrapped mod 180 cells) before the exact
    haversine test. The ORACLE is the BRUTE-FORCE cross join — the hash
    match therefore PROVES the pruning is lossless, not just plausible:
    with |lat| ≤ 60° by construction, haversine gives Δφ ≤ d = 1.81°
    (≤ 1 cell) and sin(Δλ/2) ≤ sin(d/2)/cos 60° → Δλ ≤ 3.60° (≤ 2
    cells), so every within-radius pair shares a probed cell — the
    bound the docstring carries is the bound the hash CHECKS.

    Scale shape: the O(n·m) cross join the oracle runs is exactly what
    100 TB can't — the grid form is one 15× fan-out of the SMALL side
    (suppliers) and ONE equi-join shuffle keyed on the cell id, i.e.
    candidate volume ∝ local density, not |n·m|; per-supplier
    aggregation rides the same key. Coordinates derive from integer
    keys (prime-modulus spread, the `fn_haversine` discipline — the
    corpus carries no geo columns); the exact test compares ROUNDED
    distance on both sides so the ~1e-11 transcendental drift can
    never flip a boundary row."""
    c = load(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") * 7919 % 12000) / 100.0 - 60.0).alias("clat"),
        ((F.col("c_custkey") * 104729 % 36000) / 100.0 - 180.0).alias(
            "clon"
        ),
    )
    s = load(spark, sf_dir, "supplier").select(
        "s_suppkey",
        ((F.col("s_suppkey") * 7919 % 12000) / 100.0 - 60.0).alias("slat"),
        ((F.col("s_suppkey") * 104729 % 36000) / 100.0 - 180.0).alias(
            "slon"
        ),
    )
    cell = _GEO_CELL_DEG
    c_cells = c.select(
        "c_custkey",
        "clat",
        "clon",
        (
            F.floor((F.col("clat") + 60.0) / cell) * 1000
            + F.floor((F.col("clon") + 180.0) / cell)
        ).alias("cell"),
    )
    # supplier side fans out to its 3x5 probed neighborhood (lon wraps)
    s_cells = (
        s.withColumn("dlat", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])))
        .withColumn(
            "dlon", F.explode(F.array(*[F.lit(i) for i in range(-2, 3)]))
        )
        .select(
            "s_suppkey",
            "slat",
            "slon",
            (
                (F.floor((F.col("slat") + 60.0) / cell) + F.col("dlat"))
                * 1000
                + (
                    F.floor((F.col("slon") + 180.0) / cell)
                    + F.col("dlon")
                    + 180
                )
                % 180
            ).alias("cell"),
        )
    )
    dphi = F.radians(F.col("clat") - F.col("slat")) / 2
    dlmb = F.radians(F.col("clon") - F.col("slon")) / 2
    a = F.sin(dphi) * F.sin(dphi) + F.cos(F.radians(F.col("slat"))) * F.cos(
        F.radians(F.col("clat"))
    ) * F.sin(dlmb) * F.sin(dlmb)
    d = F.round(
        2 * 6371.0088 * F.asin(F.least(F.lit(1.0), F.sqrt(a))), 3
    )
    cand = s_cells.join(c_cells, "cell").select(
        "s_suppkey", d.alias("d")
    )
    return (
        cand.filter(F.col("d") <= _GEO_R_KM)
        .groupBy("s_suppkey")
        .agg(
            F.count("*").cast("long").alias("n_within"),
            F.min("d").alias("nearest_km"),
        )
        .orderBy("s_suppkey")
    )
