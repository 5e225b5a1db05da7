"""Cross-key CONSERVATION invariants: quantities that must balance
exactly across operators regardless of corpus — the properties a
per-key oracle hash cannot see."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import sparkgraft
from conftest import SF_DIR
from sparkgraft.catalog import load


def _converting_users_with_touches(spark):
    ev = load(spark, SF_DIR, "events")
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("cts"))
    )
    return (
        ev.join(conv, "user_id")
        .filter(
            (F.col("ts") < F.col("cts"))
            & (F.col("event_type") != "purchase")
        )
        .select("user_id")
        .distinct()
        .count()
    )


@pytest.mark.parametrize(
    "key",
    [
        "win_attribution_position_based",
        "win_attribution_time_decay",
    ],
)
def test_attribution_credit_is_conserved(spark, key):
    # every multi-touch model redistributes exactly ONE conversion per
    # converting journey across channels — total credited conversions
    # must equal the count of converting users with >=1 pre-conversion
    # touch (to quantization tolerance: position-based rounds at 4dp,
    # time-decay quantizes per-touch micro-credits)
    n_journeys = _converting_users_with_touches(spark)
    credited = (
        sparkgraft.QUERIES[key](spark, SF_DIR)
        .agg(F.sum("conversions_credited"))
        .collect()[0][0]
    )
    assert credited == pytest.approx(n_journeys, abs=0.05)


def test_penny_allocation_sums_exactly_per_order(spark):
    alloc = sparkgraft.QUERIES["win_penny_allocation"](spark, SF_DIR)
    target = load(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("target"),
    )
    mismatches = (
        alloc.groupBy("l_orderkey")
        .agg(F.sum("allocated_cents").alias("s"))
        .join(target, "l_orderkey")
        .filter(F.col("s") != F.col("target"))
        .count()
    )
    assert mismatches == 0  # the whole point of largest-remainder


def test_interval_merge_bounds(spark):
    # merged coverage can never exceed each user's outer span, and the
    # merged count can never exceed the user's raw event count
    merged = sparkgraft.QUERIES["win_interval_merge"](spark, SF_DIR)
    ev = load(spark, SF_DIR, "events")
    span = ev.groupBy("user_id").agg(
        F.count("*").alias("n_raw"),
        (
            (
                F.unix_micros(F.max("ts"))
                - F.unix_micros(F.min("ts"))
            )
            / 1000000
            + F.round(F.max("value"))  # longest possible tail interval
        ).alias("span_sec_ub"),
    )
    bad = (
        merged.join(span, "user_id")
        .filter(
            (F.col("n_merged") > F.col("n_raw"))
            | (F.col("covered_sec") > F.col("span_sec_ub") + 1)
        )
        .count()
    )
    assert bad == 0


def test_soft_weights_and_ess_are_consistent(spark):
    # ESS <= effective docs <= raw docs per source, with equality of the
    # ESS and effective mass iff every family is size 1 (no dup): Kish
    # ESS of 1/k weights is always <= sum of weights
    sw = {
        r["source"]: r
        for r in sparkgraft.QUERIES["dedup_soft_weights"](
            spark, SF_DIR
        ).collect()
    }
    ess = {
        r["source"]: r
        for r in sparkgraft.QUERIES["agg_effective_sample_size"](
            spark, SF_DIR
        ).collect()
    }
    assert set(sw) == set(ess)
    for src in sw:
        assert ess[src]["n_docs"] == sw[src]["n_docs"]
        assert ess[src]["ess"] <= sw[src]["effective_docs"] + 1e-3
        assert ess[src]["ess"] <= sw[src]["n_docs"] + 1e-9


def test_bm25_scores_monotone_in_rank(spark):
    rows = sparkgraft.QUERIES["text_bm25_topk"](spark, SF_DIR).collect()
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_decile_lift_mass_balances(spark):
    rows = sparkgraft.QUERIES["agg_decile_lift"](spark, SF_DIR).collect()
    assert len(rows) == 10
    n = sum(r["n_docs"] for r in rows)
    npos = sum(r["n_positive"] for r in rows)
    d = load(spark, SF_DIR, "documents")
    assert n == d.count()
    assert npos == d.filter(F.col("lang") == "en").count()
    # deciles are equal-sized up to integer division remainders
    sizes = [r["n_docs"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
