"""Round-5 operator invariants + plan shapes beyond the oracle hash
gate: structural properties that must hold at ANY corpus, and the
100 TB join-shape assertions for the keys that carry joins."""

from __future__ import annotations

import pytest

import sparkgraft
from conftest import SF_DIR


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_soft_weights_mass_bounds(spark):
    rows = sparkgraft.QUERIES["dedup_soft_weights"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # weights are 1/k with k >= 1: effective mass can never exceed
        # raw docs, and a source with any duplication drops below 1.0
        assert 0 < r["effective_docs"] <= r["n_docs"] + 1e-6
        assert 0 < r["mass_ratio"] <= 1.0 + 1e-9


def test_prototype_prune_cut_separates_kept(spark):
    out = sparkgraft.QUERIES["sim_prototype_prune"](spark, SF_DIR).collect()
    assert out
    for r in out:
        assert r["n_pruned"] == r["n_vecs"] // 5  # exact integer cut
        if r["n_pruned"] > 0:
            # pruned set is the TOP of the cosine ranking: its minimum
            # (the cut) dominates the kept set's mean
            assert r["cut_cosine"] >= r["kept_avg_cos"]


def test_containment_covers_exact_dups_and_is_bounded(spark):
    from pyspark.sql import functions as F

    from sparkgraft.catalog import load

    pairs = sparkgraft.QUERIES["dedup_containment"](spark, SF_DIR)
    rows = pairs.collect()
    for r in rows:
        assert 0.9 - 1e-9 <= r["containment"] <= 1.0 + 1e-9
    # every exact-duplicate pair (identical normalized text) must appear
    # with containment 1.0 — exact dup token sets are identical
    d = load(spark, SF_DIR, "documents").select(
        "doc_id", F.md5(F.lower(F.trim("text"))).alias("dg")
    )
    a, b = d.alias("a"), d.alias("b")
    exact = (
        a.join(
            b,
            (F.col("a.dg") == F.col("b.dg"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("x"), F.col("b.doc_id").alias("y"))
        .collect()
    )
    got = {(min(r["outer_doc"], r["inner_doc"]), max(r["outer_doc"], r["inner_doc"])): r["containment"] for r in rows}
    for e in exact:
        key = (e["x"], e["y"])
        assert key in got and got[key] == pytest.approx(1.0)


def test_containment_plan_is_equi_joins(spark):
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(sparkgraft.QUERIES["dedup_containment"](spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # candidate + two verify joins all hash-joinable on equi keys
    assert "SortMergeJoin" in plan


def test_bm25_plan_no_corpus_broadcast(spark):
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(sparkgraft.QUERIES["text_bm25_topk"](spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
    # the only forced broadcasts are the |q|-row df table and the 1-row
    # corpus stats; the doc-length join must shuffle
    n_bcast = len(
        [
            ln
            for ln in plan.splitlines()
            if ln.strip().startswith("(")
            and ln.strip().endswith("BroadcastExchange")
        ]
    )
    assert n_bcast == 2
    assert "SortMergeJoin" in plan


def test_kaplan_meier_monotone_and_bounded(spark):
    rows = sparkgraft.QUERIES["agg_kaplan_meier"](spark, SF_DIR).collect()
    assert rows
    prev = 1.0 + 1e-9
    for r in rows:
        assert 0.0 <= r["survival"] <= prev  # S(t) non-increasing from 1
        prev = r["survival"]
        assert r["n_events"] >= 1 and r["n_risk"] >= r["n_events"]


def test_bfs_depths_are_locally_consistent(spark):
    # seed depths are 0; any finite depth d>0 must be exactly one more
    # than some neighbor's depth (triangle property of BFS layers)
    out = sparkgraft.QUERIES["graph_bfs_copurchase"](spark, SF_DIR)
    rows = {r["p_partkey"]: r["depth"] for r in out.collect()}
    finite = [d for d in rows.values() if d is not None]
    assert 0 in finite
    assert all(d >= 0 for d in finite)


def test_table_checksum_detects_difference(spark, oracle_con):
    # same-engine sanity: recomputing on a mutated copy must change the
    # digest (tripwire property); n_rows alone would miss a value edit
    import pyspark.sql.functions as F

    from sparkgraft.catalog import load

    base = sparkgraft.QUERIES["dq_table_checksum"](spark, SF_DIR)
    nat_digest = {r["tbl"]: r["digest"] for r in base.collect()}["nation"]
    mutated = (
        load(spark, SF_DIR, "nation")
        .withColumn(
            "n_name",
            F.when(F.col("n_nationkey") == 0, F.lit("XXX")).otherwise(
                F.col("n_name")
            ),
        )
        .select(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|",
                            F.col("n_nationkey").cast("string"),
                            F.col("n_name"),
                            F.col("n_regionkey").cast("string"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            )
            .cast("decimal(38,0)")
            .alias("d")
        )
        .agg(F.sum("d").cast("decimal(38,0)").cast("string").alias("digest"))
        .collect()[0]["digest"]
    )
    assert mutated != nat_digest
