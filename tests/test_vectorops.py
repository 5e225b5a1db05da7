"""Invariant tests for the similarity family (SURVEY.md §5.4.3).

The LSH/IVF candidate generators are rows-only (plane seeds / centroid
choices are engine-specific), so they are graded on recall against their
exact twins, plus a pruning bound proving the O(n²) space is actually cut.
Measured at sf0.01 (round 4: LSH re-swept to 32 bands × 7 bits;
fixed-cardinality centroid/query sets + 2-round Lloyd refinement,
probes 48/256): LSH recall@20 = 0.95 (29.7k/125k pairs materialized,
23.8% of pair space), IVF recall@5 = 0.96 at a 19% candidate fraction.
Both floors are pinned at production bars (LSH ≥ 0.85, IVF ≥ 0.9) so
bucketing/quantization quality can't silently degrade.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import sparkgraft
from conftest import SF_DIR_MID
from sparkgraft.catalog import load
from sparkgraft.vectorops import cosine


def test_lsh_recall_and_pruning(spark):
    exact = {
        (r.vec_a, r.vec_b)
        for r in sparkgraft.QUERIES["sim_cosine_topk"](spark, SF_DIR_MID).collect()
    }
    cand = {
        (r.vec_a, r.vec_b)
        for r in sparkgraft.QUERIES["sim_lsh_buckets"](spark, SF_DIR_MID).collect()
    }
    n = load(spark, SF_DIR_MID, "embeddings").count()
    pair_space = n * (n - 1) // 2
    assert len(exact & cand) / len(exact) >= 0.85
    assert len(cand) <= 0.35 * pair_space  # bucketing must actually prune


def test_ivf_recall_vs_exact_knn(spark):
    knn = {
        (r.qid, r.vec_id)
        for r in sparkgraft.QUERIES["sim_knn_per_query"](spark, SF_DIR_MID).collect()
    }
    ivf = {
        (r.qid, r.vec_id)
        for r in sparkgraft.QUERIES["sim_ivf_knn"](spark, SF_DIR_MID).collect()
    }
    assert len(knn & ivf) / len(knn) >= 0.9


def test_cosine_kernel_self_similarity(spark):
    e = load(spark, SF_DIR_MID, "embeddings")
    bad = e.select(
        (F.abs(cosine(F.col("embedding"), F.col("embedding")) - 1.0) > 1e-12).alias("bad")
    ).filter("bad")
    assert bad.count() == 0


def test_knn_ranks_are_dense_per_query(spark):
    rows = sparkgraft.QUERIES["sim_knn_per_query"](spark, SF_DIR_MID).collect()
    by_q: dict[int, list[int]] = {}
    for r in rows:
        by_q.setdefault(r.qid, []).append(r.rnk)
    assert by_q, "query set must be non-empty"
    for q, rnks in by_q.items():
        assert sorted(rnks) == [1, 2, 3, 4, 5], q


def test_mm_join_covers_all_docs(spark):
    total = (
        sparkgraft.QUERIES["mm_doc_embedding_join"](spark, SF_DIR_MID)
        .agg(F.sum("n_docs"))
        .collect()[0][0]
    )
    assert total == load(spark, SF_DIR_MID, "documents").count()


def test_matryoshka_overlap_bounds_and_signal(spark):
    # Overlap must be a count in [0, k]; and a 16/64 prefix of a real
    # embedding space must preserve MORE than chance-level neighborhood
    # structure on average (chance ≈ k²/N ≪ 1 of 5).
    rows = sparkgraft.QUERIES["sim_matryoshka_overlap"](spark, SF_DIR_MID).collect()
    assert len(rows) == 100
    assert all(0 <= r.overlap <= 5 for r in rows)
    mean = sum(r.overlap for r in rows) / len(rows)
    assert mean >= 0.5, f"prefix retrieval carries no signal (mean={mean})"


def test_gram_matrix_is_psd_and_trace_consistent(spark):
    """XᵀX must be symmetric positive semi-definite, and its trace must
    equal the sum of squared vector norms — ties the distributed
    outer-product aggregation to an independent per-row computation."""
    import numpy as np

    rows = sparkgraft.QUERIES["sim_gram_matrix"](spark, SF_DIR_MID).collect()
    dim = 64
    g = np.zeros((dim, dim))
    for r in rows:
        g[r.i, r.j] = r.g
        g[r.j, r.i] = r.g
    eig = np.linalg.eigvalsh(g)
    assert eig.min() >= -1e-6 * max(eig.max(), 1.0)
    sq = (
        load(spark, SF_DIR_MID, "embeddings")
        .select(
            F.aggregate(
                "embedding",
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            ).alias("sq")
        )
        .agg(F.sum("sq"))
        .first()[0]
    )
    assert abs(np.trace(g) - sq) < 1e-2


def test_ivf_probe_sweep_monotone_recall(spark):
    """More probes must never hurt recall; the production level (48)
    keeps the ≥ 0.9 floor and every level actually prunes."""
    rows = {
        r.probes: r
        for r in sparkgraft.QUERIES["sim_ivf_probe_sweep"](
            spark, SF_DIR_MID
        ).collect()
    }
    levels = sorted(rows)
    assert levels == [8, 16, 48]
    recalls = [rows[p].recall_at_5 for p in levels]
    fracs = [rows[p].candidate_fraction for p in levels]
    assert recalls == sorted(recalls)
    assert fracs == sorted(fracs)
    assert recalls[-1] >= 0.9
    assert all(f <= 0.35 for f in fracs)


def _planted_corpus(tmp_path):
    """sf0.001 embeddings + 25 jittered near-copies (cos ≈ 0.958–0.989)
    written as a standalone corpus dir — the synthetic ground for the
    candidate-first dedup's recall invariant (the driver corpus's cosine
    ceiling is ~0.51, far below the production τ=0.95)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    vec_ids = src.column("vec_id").to_numpy()
    labels = src.column("label").to_numpy()
    mat = np.stack(
        [np.asarray(x, dtype=np.float64) for x in src.column("embedding").to_pylist()]
    )
    matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    rng = np.random.RandomState(20260814)
    n_plant = 25
    planted = []
    for i in range(n_plant):
        base = matn[i]
        delta = 0.15 + 0.15 * (i / n_plant)
        u = rng.randn(base.shape[0])
        u -= (u @ base) * base
        u /= np.linalg.norm(u)
        v = base + delta * u
        planted.append(v / np.linalg.norm(v))
    full = np.vstack([matn, np.array(planted)])
    ids = np.concatenate([vec_ids, 10_000 + np.arange(n_plant)])
    labs = np.concatenate([labels, labels[:n_plant]]).astype(np.int32)
    out = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32) for row in full],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(labs, pa.int32()),
        }
    )
    pq.write_table(out, str(tmp_path / "embeddings.parquet"))
    # exact truth at τ=0.95 over the float32-stored values (what the
    # engine reads back), double-accumulated like the kernel
    stored = full.astype(np.float32).astype(np.float64)
    stored /= np.linalg.norm(stored, axis=1, keepdims=True)
    sims = stored @ stored.T
    iu = np.triu_indices(len(stored), 1)
    truth = {
        (int(min(ids[a], ids[b])), int(max(ids[a], ids[b])))
        for a, b, s in zip(iu[0], iu[1], sims[iu])
        if s >= 0.95
    }
    return truth


def test_dedup_embedding_cosine_candidate_first_recall(spark, tmp_path):
    truth = _planted_corpus(tmp_path)
    assert len(truth) >= 20  # the plant must be non-vacuous
    got = {
        (r.vec_a, r.vec_b)
        for r in sparkgraft.QUERIES["dedup_embedding_cosine"](
            spark, str(tmp_path)
        ).collect()
    }
    # recall floor pinned at 0.95 (analytic ≥ 0.998 at τ=0.95)
    assert len(got & truth) / len(truth) >= 0.95
    # precision is exact by construction: the verify step computes the
    # true cosine, so nothing below τ can be emitted
    assert got <= truth


def test_dedup_embedding_cosine_plan_has_no_allpairs_grid(spark):
    # the default key must be candidate-first: no grid-gemm
    # applyInPandas (FlatMapGroupsInPandas) anywhere in its plan —
    # that node now belongs only to the exact twin
    plan = sparkgraft.QUERIES["dedup_embedding_cosine"](
        spark, SF_DIR_MID
    )._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan
    exact_plan = sparkgraft.QUERIES["dedup_embedding_exact"](
        spark, SF_DIR_MID
    )._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in exact_plan
