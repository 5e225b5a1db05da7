"""Property/invariant tests for rows-only operators (SURVEY.md §5.4.3)."""

from __future__ import annotations

from pyspark.sql import functions as F

import sparkgraft
from conftest import SF_DIR
from sparkgraft.catalog import load


def test_approx_count_distinct_within_rsd(spark):
    approx = {
        r["event_type"]: r["approx_users"]
        for r in sparkgraft.QUERIES["agg_approx_count_distinct"](spark, SF_DIR).collect()
    }
    exact = {
        r["event_type"]: r["n_users"]
        for r in sparkgraft.QUERIES["agg_count_distinct"](spark, SF_DIR).collect()
    }
    assert approx.keys() == exact.keys()
    for k in exact:
        # rsd=0.02 → allow 5 sigma-ish slack
        assert abs(approx[k] - exact[k]) <= max(2, 0.1 * exact[k]), k


def test_global_rank_is_permutation(spark):
    df = sparkgraft.QUERIES["sort_global"](spark, SF_DIR)
    ranks = [r["rank"] for r in df.select("rank").collect()]
    assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_global_rank_follows_order(spark):
    rows = (
        sparkgraft.QUERIES["sort_global"](spark, SF_DIR)
        .orderBy("rank")
        .collect()
    )
    for a, b in zip(rows, rows[1:]):
        assert (a["o_totalprice"], -a["o_orderkey"]) >= (b["o_totalprice"], -b["o_orderkey"])


def test_distinct_idempotent(spark):
    df = sparkgraft.QUERIES["agg_distinct_rows"](spark, SF_DIR)
    assert df.count() == df.distinct().count()


def test_approx_quantile_within_rank_error(spark):
    """approx_percentile(accuracy=10000) must land within a small value
    band of the exact per-group percentile (GK sketch rank-error bound)."""
    exact = {
        r["l_returnflag"]: (r["p25"], r["p50"], r["p90"])
        for r in sparkgraft.QUERIES["agg_percentiles"](spark, SF_DIR).collect()
    }
    approx = {
        r["l_returnflag"]: (r["p25"], r["p50"], r["p90"])
        for r in sparkgraft.QUERIES["agg_approx_quantile"](spark, SF_DIR).collect()
    }
    assert approx.keys() == exact.keys()
    for flag in exact:
        for e, a in zip(exact[flag], approx[flag]):
            assert abs(a - e) <= 0.02 * abs(e) + 1.0, (flag, e, a)


def test_cc_clusters_are_consistent(spark):
    """Connected-component labels: canonical ≤ member, canonicals map to
    themselves, and both ends of every dup edge share one canonical."""
    labels = {
        r["doc_id"]: r["canonical_id"]
        for r in sparkgraft.QUERIES["dedup_cluster_cc"](spark, SF_DIR).collect()
    }
    assert all(c <= d for d, c in labels.items())
    assert all(labels[c] == c for c in set(labels.values()))
    for r in sparkgraft.QUERIES["dedup_ngram_jaccard"](spark, SF_DIR).collect():
        assert labels[r["doc_a"]] == labels[r["doc_b"]], (r["doc_a"], r["doc_b"])


def test_pagerank_is_a_distribution(spark):
    """Damped PageRank with dangling redistribution conserves mass: ranks
    are positive and sum to 1 (up to fp tolerance)."""
    rows = sparkgraft.QUERIES["graph_pagerank"](spark, SF_DIR).collect()
    ranks = [r["pagerank"] for r in rows]
    assert all(r > 0 for r in ranks)
    assert abs(sum(ranks) - 1.0) < 1e-6


def test_hll_sketch_within_error_envelope(spark):
    """DataSketches HLL at lgK=12 has ~1.6% relative standard error;
    assert estimates land within 5% (≈3σ) of exact distinct counts."""
    approx = {
        r.o_orderpriority: r.approx_customers
        for r in sparkgraft.QUERIES["agg_hll_sketch"](spark, SF_DIR).collect()
    }
    o = load(spark, SF_DIR, "orders")
    exact = {
        r.o_orderpriority: r.exact
        for r in o.groupBy("o_orderpriority")
        .agg(F.count_distinct("o_custkey").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, est in approx.items():
        assert abs(est - exact[k]) <= 0.05 * exact[k], (k, est, exact[k])


def test_python_sink_roundtrips_null_nan_inf(spark, tmp_path):
    """Regression: the sink serializer once crashed on NULL (%.17g on
    None) and round-tripped NaN to NULL via cast('nan' AS DOUBLE).
    Every IEEE special + NULL must survive write→read exactly-once."""
    from pyspark.sql import functions as F

    from sparkgraft.sources import _roundtrip_sink

    spark.dataSource.register(_roundtrip_sink())
    src = spark.createDataFrame(
        [(1, 1.5), (2, None), (3, float("nan")),
         (4, float("inf")), (5, float("-inf"))],
        "event_id long, value double",
    )
    out = str(tmp_path / "sink")
    import os

    os.makedirs(out)
    src.write.format("sg_roundtrip_sink").option("path", out).mode("append").save()
    with open(os.path.join(out, "_SUCCESS")) as f:
        assert int(f.read()) == 5
    back = (
        spark.read.text(os.path.join(out, "part-*.txt"))
        .select(F.split("value", ",").alias("p"))
        .select(
            F.col("p")[0].cast("long").alias("event_id"),
            F.nullif(F.col("p")[1], F.lit("")).cast("double").alias("value"),
        )
    )
    got = {r["event_id"]: r["value"] for r in back.collect()}
    assert len(got) == 5
    assert got[1] == 1.5
    assert got[2] is None
    assert got[3] != got[3]  # NaN round-trips as NaN, not NULL
    assert got[4] == float("inf")
    assert got[5] == float("-inf")


def test_cms_estimates_dominate_exact_counts(spark):
    # Count-min property: a sketch estimate can only OVER-count (hash
    # collisions add, never subtract). Checked at 10x the driver SF.
    from conftest import SF_DIR_MID

    rows = sparkgraft.QUERIES["agg_cms_counts"](spark, SF_DIR_MID).collect()
    assert rows
    for r in rows:
        assert r["est_cnt"] >= r["exact_cnt"], r


def test_hll_union_rollup_is_merge_consistent(spark):
    # THE mergeable-sketch contract: unioning per-day sketches must give
    # the SAME estimate as sketching the raw stream directly (sketch
    # union is exactly associative), and land within the lgK=12 error
    # envelope of the exact distinct.
    from pyspark.sql import functions as F

    from conftest import SF_DIR_MID

    rolled = {
        r["event_type"]: r["est_users"]
        for r in sparkgraft.QUERIES["agg_hll_union_rollup"](spark, SF_DIR_MID).collect()
    }
    e = sparkgraft.load(spark, SF_DIR_MID, "events")
    direct = {
        r["event_type"]: r["est"]
        for r in e.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias("est"))
        .collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert rolled == direct  # exact merge consistency, not approximate
    for k, est in rolled.items():
        assert abs(est - exact[k]) <= 0.05 * exact[k], (k, est, exact[k])


def test_pair_histogram_covers_every_pair(spark):
    # The histogram is a partition of the full pair space: bucket counts
    # must sum to exactly n(n-1)/2.
    from pyspark.sql import functions as F

    from conftest import SF_DIR_MID

    n = sparkgraft.load(spark, SF_DIR_MID, "embeddings").count()
    total = (
        sparkgraft.QUERIES["sim_pair_histogram"](spark, SF_DIR_MID)
        .agg(F.sum("n_pairs"))
        .collect()[0][0]
    )
    assert total == n * (n - 1) // 2


def test_clustered_write_sort_survives_planned_write(spark, tmp_path):
    """Regression for a silent un-clustering trap: Spark's planned write
    inserts its own Sort(partition columns) and EliminateSorts deletes a
    sortWithinPartitions that doesn't already satisfy it. The operator
    leads its sort with the partition column so the ts clustering
    survives; this test proves the mechanism by negative control — a
    partition-col-led sort by a DIFFERENT column must produce files that
    are genuinely NOT ts-sorted (i.e. user sort order reaches the files),
    while the operator's audit flag stays true."""
    from pyspark.sql import functions as F

    import sparkgraft

    out = str(tmp_path / "neg")
    (
        sparkgraft.load(spark, SF_DIR, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .repartition("event_type")
        .sortWithinPartitions("event_type", F.desc("value"))
        .write.mode("overwrite")
        .partitionBy("event_type")
        .parquet(out)
    )
    import glob

    import pyarrow.parquet as pq

    files = sorted(glob.glob(out + "/*/*.parquet"))
    assert files
    ts_sorted = [
        bool(pq.read_table(f, columns=["ts"]).to_pandas()["ts"].is_monotonic_increasing)
        for f in files
    ]
    vals_sorted = [
        bool(
            pq.read_table(f, columns=["value"])
            .to_pandas()["value"]
            .is_monotonic_decreasing
        )
        for f in files
    ]
    assert all(vals_sorted), "partition-col-led user sort must reach the files"
    assert not any(ts_sorted), "ts order would mean the user sort was eliminated"

    rows = sparkgraft.QUERIES["sink_clustered_write"](spark, SF_DIR).collect()
    assert rows and all(r["files_internally_sorted"] for r in rows)


def test_time_weighted_avg_bounded_by_extremes(spark):
    """A LOCF time-weighted mean is a convex combination of observed
    values, so every (user, day) twa must lie within that group's
    [min, max] value envelope."""
    twa = sparkgraft.QUERIES["win_time_weighted_avg"](spark, SF_DIR)
    ext = (
        load(spark, SF_DIR, "events")
        .select("user_id", F.to_date("ts").alias("day"), "value")
        .groupBy("user_id", "day")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .select("user_id", F.col("day").cast("string").alias("day"), "lo", "hi")
    )
    bad = twa.join(ext, ["user_id", "day"]).filter(
        (F.col("twa_value") < F.col("lo") - 1e-6)
        | (F.col("twa_value") > F.col("hi") + 1e-6)
    )
    assert bad.count() == 0


def test_heavy_hitters_partitioning_invariant(spark):
    """The prescreen sees different Arrow batches under a different
    physical partitioning; the exact-recount construction must make the
    final relation identical anyway."""
    base = sparkgraft.QUERIES["agg_heavy_hitters"](spark, SF_DIR).collect()
    ev = (
        load(spark, SF_DIR, "events")
        .select(
            (F.length(F.bin(1 + F.col("user_id") % 1024)) - 1).alias("hh_key")
        )
        .repartition(7, "hh_key")
    )
    from sparkgraft.aggregates import _HH_INV_PHI, _hh_candidates

    cand = ev.mapInPandas(_hh_candidates, "hh_key long").distinct()
    exact = (
        ev.join(cand, "hh_key", "left_semi")
        .groupBy("hh_key")
        .agg(F.count("*").alias("cnt"))
    )
    total = F.broadcast(ev.agg(F.count("*").alias("n")))
    alt = (
        exact.join(total)
        .filter(F.col("cnt") * _HH_INV_PHI > F.col("n"))
        .select("hh_key", "cnt")
        .orderBy(F.desc("cnt"), "hh_key")
        .collect()
    )
    assert [tuple(r) for r in base] == [tuple(r) for r in alt]


def test_pareto_front_recursive_prefix_max_matches_bounded_path(spark):
    """Force the distributed prefix-max recursion (block size 4 → several
    carry levels even on the sf0.001 fixture) and assert the front is
    IDENTICAL to the default path (block size 1024, which at this scale
    takes the bounded single-block sweep). Catches any carry-in
    off-by-one across block and level boundaries."""
    import sparkgraft.aggregates as agg
    from conftest import SF_DIR

    base = sorted(
        tuple(r) for r in sparkgraft.QUERIES["agg_pareto_front"](
            spark, SF_DIR
        ).collect()
    )
    old = agg._PARETO_BLK
    agg._PARETO_BLK = 4
    try:
        forced = sorted(
            tuple(r) for r in sparkgraft.QUERIES["agg_pareto_front"](
                spark, SF_DIR
            ).collect()
        )
    finally:
        agg._PARETO_BLK = old
    assert forced == base
    assert len(base) > 0
