"""Sorts / limits / top-k / sampling (SURVEY.md §2.6) and set operations
(§2.7).

The oracle hash is order-insensitive, so a bare sort is unobservable; every
sort operator here materializes its order as an explicit rank column via
``ranking.with_global_rank`` (range-partitioned, no single-reducer), making
the sort itself hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load
from .ranking import with_global_rank
from .registry import query


@query(
    "sort_global",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rank
    FROM orders
    WHERE o_totalprice > 100000
    """,
)
def sort_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total order with materialized rank — terasort canon. Tie-break on the
    unique o_orderkey makes the order (hence the hash) deterministic."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return with_global_rank(
        o.select("o_orderkey", "o_totalprice"),
        [("o_totalprice", "desc"), ("o_orderkey", "asc")],
        cache_key="orders:totalprice_desc",
        corpus=sf_dir,
    )


@query(
    "sort_multi_key",
    oracle="""
    SELECT o_orderkey, status_or_null, o_totalprice, rank FROM (
      SELECT o_orderkey, nullif(o_orderstatus, 'P') AS status_or_null, o_totalprice,
             row_number() OVER (ORDER BY nullif(o_orderstatus, 'P') ASC NULLS FIRST,
                                o_totalprice DESC, o_orderkey) AS rank
      FROM orders) t
    WHERE rank <= 1000
    """,
)
def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort, mixed direction, explicit null placement (nulls are
    derived via nullif — the corpus has none physically)."""
    o = load(spark, sf_dir, "orders").withColumn(
        "status_or_null", F.nullif(F.col("o_orderstatus"), F.lit("P"))
    )
    ranked = with_global_rank(
        o.select("o_orderkey", "status_or_null", "o_totalprice"),
        [("status_or_null", "asc"), ("o_totalprice", "desc"), ("o_orderkey", "asc")],
        cache_key="orders:status_price",
        corpus=sf_dir,
    )
    return ranked.filter(F.col("rank") <= 1000)


@query(
    "topk_limit",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 25
    """,
)
def topk_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT k → Spark's TakeOrderedAndProject: each task keeps
    a k-heap, driver merges — O(k) memory, no global sort. Unique
    (orderkey, linenumber) tie-break keeps the result hash-stable."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(25)
    )


@query(
    "sample_deterministic",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE (l_orderkey * 37 + l_linenumber) % 100 = 0
    """,
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeatable ~1% sample via arithmetic on the key — NOT df.sample()
    (nondeterministic under repartitioning) and NOT hash() (Spark's
    Murmur3 ≠ DuckDB's hash). Pure modular arithmetic is identical
    everywhere and pushes into the scan."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_orderkey") * 37 + F.col("l_linenumber")) % 100 == 0
    ).select("l_orderkey", "l_linenumber", "l_quantity")


# ---------------------------------------------------------------------------
# §2.7 set operations
# ---------------------------------------------------------------------------

def _event_slice(spark: SparkSession, sf_dir: str, types: list[str]) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(types))
        .select("user_id", "event_type")
    )


@query(
    "set_union_all",
    oracle="""
    SELECT user_id, event_type FROM events WHERE event_type IN ('click', 'view')
    UNION ALL
    SELECT user_id, event_type FROM events WHERE event_type IN ('view', 'purchase')
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union — pure concatenation, no shuffle at all."""
    a = _event_slice(spark, sf_dir, ["click", "view"])
    b = _event_slice(spark, sf_dir, ["view", "purchase"])
    return a.unionByName(b)


@query(
    "set_union_distinct",
    oracle="""
    SELECT user_id, event_type FROM events WHERE event_type IN ('click', 'view')
    UNION
    SELECT user_id, event_type FROM events WHERE event_type IN ('view', 'purchase')
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _event_slice(spark, sf_dir, ["click", "view"])
    b = _event_slice(spark, sf_dir, ["view", "purchase"])
    return a.unionByName(b).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _event_slice(spark, sf_dir, ["purchase"]).select("user_id")
    b = _event_slice(spark, sf_dir, ["error"]).select("user_id")
    return a.intersect(b)


@query(
    "set_except",
    oracle="""
    SELECT o_custkey FROM orders
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_totalprice > 150000
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers whose every order is ≤ 150k: EXCEPT (set semantics)."""
    o = load(spark, sf_dir, "orders")
    all_keys = o.select("o_custkey")
    big = o.filter(F.col("o_totalprice") > 150000).select("o_custkey")
    return all_keys.subtract(big)  # subtract == EXCEPT (set semantics)


@query(
    "sample_stratified",
    oracle="""
    SELECT event_id, event_type, value
    FROM events
    WHERE (event_id * 37) % 100 <
          CASE event_type
            WHEN 'error'    THEN 50
            WHEN 'purchase' THEN 25
            WHEN 'signup'   THEN 10
            ELSE 5
          END
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum sampling rates (rare classes kept at 50%/25%, bulk
    classes at 5%) — the class-rebalancing step of a training-data
    pipeline. Same deterministic key-arithmetic acceptance test as
    `sample_deterministic` (df.sampleBy is nondeterministic under
    repartitioning and its RNG has no DuckDB twin); the CASE-threshold
    filter is a pure narrow predicate evaluated inside the scan's
    whole-stage codegen — no shuffle, no extra pass."""
    e = load(spark, sf_dir, "events")
    rate = (
        F.when(F.col("event_type") == "error", 50)
        .when(F.col("event_type") == "purchase", 25)
        .when(F.col("event_type") == "signup", 10)
        .otherwise(5)
    )
    return e.filter((F.col("event_id") * 37) % 100 < rate).select(
        "event_id", "event_type", "value"
    )


@query(
    "set_union_by_name",
    oracle="""
    SELECT id, amount, src, name FROM (
      SELECT o_orderkey AS id, o_totalprice AS amount, 'orders' AS src
      FROM orders
      UNION ALL BY NAME
      SELECT c_custkey AS id, c_name AS name, 'customer' AS src
      FROM customer)
    ORDER BY src, id
    """,
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift-tolerant union: two frames with only partially
    overlapping columns stack by COLUMN NAME, absent fields null-filled —
    the append that keeps working when an upstream feed adds or drops
    columns (Spark `unionByName(allowMissingColumns=True)`; the oracle is
    DuckDB's native `UNION ALL BY NAME`). Still a zero-shuffle bag union:
    both inputs scan in place and only the presentation sort exchanges."""
    a = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("id"),
        F.col("o_totalprice").alias("amount"),
        F.lit("orders").alias("src"),
    )
    b = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.lit("customer").alias("src"),
    )
    return a.unionByName(b, allowMissingColumns=True).orderBy("src", "id")


@query(
    "set_intersect_all",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT ALL
    SELECT user_id FROM events WHERE event_type = 'view'
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BAG intersection (INTERSECT ALL): each user survives min(count
    in A, count in B) times — the multiset semantics DISTINCT-based
    intersect silently loses. Spark plans `intersectAll` as a
    count-and-replicate aggregate (two partial counts + a generator),
    not a join of duplicates — one shuffle per side on the value key."""
    a = _event_slice(spark, sf_dir, ["click"]).select("user_id")
    b = _event_slice(spark, sf_dir, ["view"]).select("user_id")
    return a.intersectAll(b)


@query(
    "set_except_all",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    EXCEPT ALL
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BAG difference (EXCEPT ALL): each user survives max(0, count in
    A − count in B) times — the dedup-aware removal semantics (e.g.
    'remove one quarantined copy per matched record, not every
    occurrence'). Same count-and-replicate physical shape as the
    intersectAll twin."""
    a = _event_slice(spark, sf_dir, ["click"]).select("user_id")
    b = _event_slice(spark, sf_dir, ["error"]).select("user_id")
    return a.exceptAll(b)


@query(
    "sample_weighted_hash",
    oracle="""
    WITH w AS (
      SELECT doc_id, source, CAST(n_chars AS BIGINT) AS wt,
             (doc_id * 2654435761 + 12345) % 1048576 AS u
      FROM documents),
    mx AS (SELECT max(wt) AS wmax FROM w),
    k AS (
      SELECT source, wt,
             CASE WHEN u * wmax < 1048576 * wt THEN 1 ELSE 0 END AS kept
      FROM w CROSS JOIN mx)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(kept) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN kept = 1 THEN wt ELSE 0 END) AS BIGINT)
             AS kept_weight
    FROM k GROUP BY source ORDER BY source
    """,
)
def sample_weighted_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHT-PROPORTIONAL deterministic sampling: each document keeps
    with probability wt/wmax (wt = n_chars — the "sample long docs
    more" downweighting every corpus-mix pipeline runs), decided by
    pure integer arithmetic on the key — a Weyl-style multiplicative
    mix into [0, 2²⁰) compared cross-multiplied against the weight, so
    there is NO float, NO rng, and NO engine-specific hash anywhere
    (`sample_deterministic`'s argument, extended from uniform to
    weighted). Repeatable across runs, engines, and partitionings;
    selection decisions push into the scan as a codegen filter.

    Scale: the decision is row-local; wmax is a 1-row broadcast; the
    report is one hash aggregate keyed on the bounded source column.
    At 100 TB the sample materializes in the same single pass that
    reads the corpus — no shuffle beyond the final per-source rollup."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.col("n_chars").cast("long").alias("wt"),
        ((F.col("doc_id") * 2654435761 + 12345) % 1048576).alias("u"),
    )
    mx = d.agg(F.max("wt").alias("wmax"))
    return (
        d.crossJoin(F.broadcast(mx))
        .withColumn(
            "kept",
            F.when(
                F.col("u") * F.col("wmax") < F.lit(1048576) * F.col("wt"), 1
            ).otherwise(0),
        )
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("kept").cast("long").alias("n_kept"),
            F.sum(F.when(F.col("kept") == 1, F.col("wt")).otherwise(0))
            .cast("long")
            .alias("kept_weight"),
        )
        .orderBy("source")
    )


@query(
    "sample_reservoir_pergroup",
    oracle="""
    WITH ranked AS (
      SELECT c_mktsegment, c_custkey,
             CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents,
             row_number() OVER (
               PARTITION BY c_mktsegment
               ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey)
               AS draw
      FROM customer)
    SELECT c_mktsegment, CAST(draw AS BIGINT) AS draw, c_custkey,
           acctbal_cents
    FROM ranked WHERE draw <= 5
    ORDER BY c_mktsegment, draw
    """,
)
def sample_reservoir_pergroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIXED-SIZE PER-GROUP sample (reservoir semantics, k=5 per market
    segment): every group yields exactly min(k, |group|) rows, chosen
    uniformly — the per-stratum *count* guarantee `sample_stratified`'s
    per-stratum *rate* cannot give (a rate sample of a giant group is
    still giant). Selection orders each group by md5 of the row key — a
    uniform, engine-portable permutation (both engines spell md5
    identically; Spark's hash() has no DuckDB twin), so the draw is
    repeatable run-over-run, machine-over-machine — the property that
    makes eval/holdout draws auditable.

    Scale shape: ONE hash shuffle on the group key, then a per-group
    TOP-K heap — Spark plans rank-filter windows with a WindowGroupLimit
    pushdown (each task keeps k rows per group before the shuffle), so
    executor memory is O(k · groups/task), never O(group). A giant group
    never materializes sorted: only its k winners survive the map side.
    Draw determinism: md5 collisions break ties on the key itself."""
    c = load(spark, sf_dir, "customer")
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.md5(F.col("c_custkey").cast("string")), "c_custkey")
    )
    return (
        c.select(
            "c_mktsegment",
            F.row_number().over(w).cast("long").alias("draw"),
            "c_custkey",
            F.round(F.col("c_acctbal") * 100).cast("long").alias(
                "acctbal_cents"
            ),
        )
        .filter(F.col("draw") <= 5)
        .orderBy("c_mktsegment", "draw")
    )


@query(
    "topk_diversified",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey, o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY round(o_totalprice * 100) DESC, o_orderkey)
               AS rn
      FROM orders)
    SELECT o_orderkey, o_custkey, price_cents
    FROM per_cust
    WHERE rn <= 2
    ORDER BY price_cents DESC, o_orderkey
    LIMIT 20
    """,
)
def topk_diversified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIVERSIFIED top-k (global top-20 orders by price, but at most 2
    per customer) — the result-diversification contract every ranking
    surface carries: a single whale customer must not monopolize the
    leaderboard. Two-stage: per-customer row_number caps each customer
    at 2 candidates, then a global TakeOrderedAndProject picks 20 from
    the capped pool.

    Scale shape: the cap stage is the WindowGroupLimit shape (per-task
    2-heaps per customer key before/after one hash shuffle on
    o_custkey); the global stage is a k-heap per task + driver merge of
    20-row heads — no global sort anywhere. Ties break on o_orderkey in
    both stages, so the hash is order-stable; prices ride the int64-cent
    discipline."""
    o = load(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc(F.round(F.col("o_totalprice") * 100)), "o_orderkey"
    )
    return (
        o.select(
            "o_orderkey",
            "o_custkey",
            cents.alias("price_cents"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 2)
        .select("o_orderkey", "o_custkey", "price_cents")
        .orderBy(F.desc("price_cents"), "o_orderkey")
        .limit(20)
    )
