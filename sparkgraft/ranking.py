"""Distributed global ranking — the terasort pattern (SURVEY.md §2.6).

A naive ``row_number() OVER (ORDER BY ...)`` collapses the whole dataset
into ONE partition — fine at sf0.01, fatal at 100 TB. And Spark's own
``repartitionByRange`` cannot anchor a two-job rank computation: its
boundary sampling re-runs per job, so the counts job and the final job can
disagree on the layout (observed locally — duplicate/shifted ranks).

The construction here is deterministic end-to-end:

1. **Sample boundaries once, deterministically**: rows where
   ``xxhash64(key cols) % m == 0`` (no RNG), sorted driver-side, thinned to
   ~``buckets`` cut points on the FIRST sort key. The collect is bounded by
   the chosen sample size, not data volume.
2. **Bucket by literal comparison**: each row's bucket is the count of
   boundaries preceding its first-key value — a pure codegen-able
   expression, identical in every job that evaluates it. Rows with equal
   first keys always share a bucket, so bucketing respects the total order.
3. **Rank within bucket** via a window keyed by bucket (one shuffle), then
   add per-bucket offsets from a (#buckets)-row count table.

Skew bound: a single first-key value heavier than ~|data|/buckets collapses
into one bucket; callers ranking by a low-cardinality first key should put
a higher-cardinality column first or accept the larger local sort.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: (column name, "asc" | "desc") — first entry drives range bucketing;
#: the full list must be a total order for a deterministic rank.
KeySpec = list[tuple[str, str]]

#: boundary lists keyed by (corpus, label) — range boundaries are corpus
#: statistics (like the ANN index in vectorops): computing them is one
#: bounded pass, reusing them across queries of the same immutable input
#: is the standard amortization. The corpus component is MANDATORY
#: whenever a cache label is supplied (enforced in _cache_id): boundaries
#: from one corpus applied to another would produce wrong ranks, not slow
#: ones, so cross-corpus aliasing must be structurally impossible.
_BOUNDS_CACHE: dict[tuple[str, str], list] = {}

_EMPTY = object()  # sentinel: boundary sampling found an empty frame


def _cache_id(corpus: str | None, label: str | None) -> tuple[str, str] | None:
    if label is None:
        return None
    if not corpus:
        raise ValueError(
            "ranking cache labels require corpus= (the sf_dir / dataset "
            "identity); a bare label could silently reuse another "
            "corpus's range boundaries and corrupt ranks"
        )
    return (corpus, label)


def _order_cols(keys: KeySpec) -> list[Column]:
    cols = []
    for name, direction in keys:
        c = F.col(name)
        cols.append(c.desc_nulls_first() if direction == "desc" else c.asc_nulls_first())
    return cols


def _range_boundaries(
    df: DataFrame, keys: KeySpec, buckets: int, sample_target: int
) -> list[Any] | object:
    """Deterministic interior cut points on the first sort key, collected
    ONCE driver-side and baked as literals — so every downstream job sees
    the same layout no matter how it re-evaluates (unlike
    ``repartitionByRange``, which re-samples per job). Numeric keys use
    one approxQuantile pass; other types fall back to a deterministic
    hash-modulus sample (needs a count first to bound the collect).
    Returns the ``_EMPTY`` sentinel when the frame has no rows."""
    first_name, first_dir = keys[0]
    key_cols = [name for name, _ in keys]
    rev = first_dir == "desc"
    numeric = isinstance(
        df.schema[first_name].dataType,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
         T.FloatType, T.DoubleType, T.DecimalType),
    )
    if numeric:
        probs = [i / buckets for i in range(1, buckets)]
        sample = df.approxQuantile(first_name, probs, 1.0 / (4 * buckets))
        if not sample and df.isEmpty():
            return _EMPTY
        sample.sort(reverse=rev)
        # approxQuantile already returns only the buckets-1 interior cut
        # points — take them all (thinning would drop the first boundary).
        candidates = sample
    else:
        n = df.count()
        if n == 0:
            return _EMPTY
        m = max(1, n // sample_target)
        sample = [
            r[0]
            for r in df.filter(F.pmod(F.xxhash64(*key_cols), F.lit(m)) == 0)
            .select(first_name)
            .collect()
            if r[0] is not None
        ]
        sample.sort(reverse=rev)  # NULLs were dropped; they bucket to -1 below
        # thin the hash sample to ~buckets-1 interior cut points; starting
        # at index `step` (not 0) intentionally skips the sampled minimum,
        # which would create an empty leading bucket.
        step = max(1, len(sample) // buckets)
        candidates = sample[step::step]
    boundaries: list[Any] = []
    for v in candidates:
        if not boundaries or boundaries[-1] != v:
            boundaries.append(v)
    return boundaries


def _bucket_expr(keys: KeySpec, boundaries: list[Any]) -> Column:
    """Bucket = #boundaries strictly preceding the row's first-key value.
    NULLs sort first (matching asc_nulls_first/desc_nulls_first)."""
    first_name, first_dir = keys[0]
    rev = first_dir == "desc"
    first = F.col(first_name)
    bucket = F.lit(0)
    for b in boundaries:
        passed = (first < F.lit(b)) if rev else (first > F.lit(b))
        bucket = bucket + F.when(passed, 1).otherwise(0)
    return F.when(first.isNull(), F.lit(-1)).otherwise(bucket)


def _boundaries_cached(
    df: DataFrame,
    keys: KeySpec,
    buckets: int,
    sample_target: int,
    corpus: str | None,
    cache_key: str | None,
) -> list[Any] | object:
    cid = _cache_id(corpus, cache_key)
    if cid is not None and cid in _BOUNDS_CACHE:
        return _BOUNDS_CACHE[cid]
    boundaries = _range_boundaries(df, keys, buckets, sample_target)
    if cid is not None and boundaries is not _EMPTY:
        _BOUNDS_CACHE[cid] = boundaries
    return boundaries


def with_global_rank(
    df: DataFrame,
    keys: KeySpec,
    rank_col: str = "rank",
    buckets: int = 32,
    sample_target: int = 2048,
    cache_key: str | None = None,
    corpus: str | None = None,
) -> DataFrame:
    """Append a 1-based global row number following ``keys``.

    Equivalent to SQL ``row_number() OVER (ORDER BY ...)`` without the
    single-reducer bottleneck. ``cache_key`` (when the input is an
    immutable corpus) memoizes the sampled range boundaries; it must be
    accompanied by ``corpus`` (the sf_dir / dataset identity), which
    namespaces the cache so boundaries can never alias across corpora.
    """
    boundaries = _boundaries_cached(
        df, keys, buckets, sample_target, corpus, cache_key
    )
    if boundaries is _EMPTY:
        return df.withColumn(rank_col, F.lit(None).cast("long"))
    return _bucketed_rank(df, keys, boundaries, rank_col)


def _bucketed_rank(
    df: DataFrame, keys: KeySpec, boundaries: list[Any], rank_col: str
) -> DataFrame:
    bucketed = df.withColumn("_bkt", _bucket_expr(keys, boundaries))

    # 3. Local rank within bucket + bucket offsets, all in ONE action: the
    #    offsets side is a (#buckets)-row aggregate (Catalyst plans it as
    #    its own cheap pruned scan + partial agg — row_number is
    #    cardinality-preserving, so it never needs the sort), prefix-summed
    #    by a single-partition window that is trivially bounded (≤ buckets
    #    + 1 rows), then broadcast-joined back. No counts job, no driver
    #    collect — half the job round-trips of the collect-offsets form.
    w = Window.partitionBy("_bkt").orderBy(*_order_cols(keys))
    local = bucketed.withColumn("_rn", F.row_number().over(w))
    counts = bucketed.groupBy("_bkt").agg(F.count("*").alias("_n"))
    #    The prefix sum over the (≤ buckets+1 row) counts table is a
    #    triangle self-join rather than an unpartitioned window: same
    #    result, trivially cheap at this cardinality, and it keeps the
    #    bench log free of WindowExec's "No Partition Defined" warning
    #    (which at face value reads as a scale bug; here it never was —
    #    the input is bounded by the bucket count, not the data).
    prior = counts.select(
        F.col("_bkt").alias("_bkt_p"), F.col("_n").alias("_n_p")
    )
    offsets = (
        counts.join(prior, F.col("_bkt_p") < F.col("_bkt"), "left")
        .groupBy("_bkt")
        .agg(F.coalesce(F.sum("_n_p"), F.lit(0)).alias("_off"))
    )
    return (
        local.join(F.broadcast(offsets), "_bkt")
        .withColumn(rank_col, (F.col("_off") + F.col("_rn")).cast("long"))
        .drop("_bkt", "_rn", "_off")
    )


def with_global_prefix_sum(
    df: DataFrame,
    keys: KeySpec,
    value_col: str,
    out_col: str = "prefix_sum",
    buckets: int = 32,
    sample_target: int = 2048,
    cache_key: str | None = None,
    corpus: str | None = None,
) -> DataFrame:
    """Append the INCLUSIVE running total of ``value_col`` following
    ``keys`` — SQL's ``SUM(v) OVER (ORDER BY ... ROWS UNBOUNDED
    PRECEDING)`` without the single-reducer window (the same
    range-bucketing as :func:`with_global_rank`, sharing its boundary
    construction and bucket expression): local cumulative sums within
    each bucket, plus per-bucket VALUE totals prefix-summed by the
    bounded triangle join and broadcast back. Exactness is the caller's
    contract: pass an integer/decimal ``value_col`` (cast to
    decimal(38,0) for wrap-free sums at any scale) — the helper never
    converts to float. This is the terasort-era distributed prefix-sum
    primitive behind cumulative-share cuts (ABC/Pareto), quota fills,
    and capacity packing."""
    boundaries = _boundaries_cached(
        df, keys, buckets, sample_target, corpus, cache_key
    )
    if boundaries is _EMPTY:
        return df.withColumn(out_col, F.lit(None).cast("decimal(38,0)"))
    bucketed = df.withColumn("_bkt", _bucket_expr(keys, boundaries))

    w = (
        Window.partitionBy("_bkt")
        .orderBy(*_order_cols(keys))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = bucketed.withColumn(
        "_cum", F.sum(F.col(value_col)).over(w)
    )
    totals = bucketed.groupBy("_bkt").agg(
        F.sum(F.col(value_col)).alias("_t")
    )
    prior = totals.select(
        F.col("_bkt").alias("_bkt_p"), F.col("_t").alias("_t_p")
    )
    offsets = (
        totals.join(prior, F.col("_bkt_p") < F.col("_bkt"), "left")
        .groupBy("_bkt")
        .agg(F.coalesce(F.sum("_t_p"), F.lit(0)).alias("_voff"))
    )
    return (
        local.join(F.broadcast(offsets), "_bkt")
        .withColumn(out_col, F.col("_voff") + F.col("_cum"))
        .drop("_bkt", "_cum", "_voff")
    )
