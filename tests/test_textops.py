"""Invariant tests for the text/dedup family (SURVEY.md §5.4.3).

The MinHash/SimHash candidate generators are rows-only (hash seeds are
engine-specific), so correctness is enforced by invariants instead of the
oracle: every EXACT duplicate pair must surface as a candidate pair in
every LSH scheme, and dedup must be idempotent.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import sparkgraft
from conftest import SF_DIR, SF_DIR_MID
from sparkgraft.catalog import load

# Exact-duplicate texts exist only at sf0.1 (8 dup texts / 5000 docs,
# verified with DuckDB); sf0.01 is 500 fully-distinct docs.
SF_DIR_BIG = "/root/testdata/sf0.1"


def _exact_dup_pairs(spark, sf_dir):
    """All (doc_a < doc_b) pairs with byte-identical normalized text."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.lower(F.trim("text")).alias("norm")
    )
    a, b = d.alias("a"), d.alias("b")
    return {
        (r["doc_a"], r["doc_b"])
        for r in a.join(
            b,
            (F.col("a.norm") == F.col("b.norm"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .collect()
    }


def test_minhash_candidates_cover_exact_dups(spark):
    exact = _exact_dup_pairs(spark, SF_DIR_BIG)
    assert exact, "fixture should contain exact duplicate docs"
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in sparkgraft.QUERIES["dedup_near_minhash"](spark, SF_DIR_BIG).collect()
    }
    assert exact <= cand


def test_simhash_candidates_cover_exact_dups(spark):
    exact = _exact_dup_pairs(spark, SF_DIR_BIG)
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in sparkgraft.QUERIES["dedup_simhash"](spark, SF_DIR_BIG).collect()
    }
    assert exact <= cand


def test_exact_dedup_partitions_corpus(spark):
    """Each doc lands in exactly one hash group; keepers are distinct docs."""
    d = sparkgraft.QUERIES["dedup_exact_docs"](spark, SF_DIR)
    total_docs = load(spark, SF_DIR, "documents").count()
    agg = d.agg(
        F.sum("n_copies").alias("n"),
        F.count("*").alias("groups"),
        F.countDistinct("keeper").alias("keepers"),
    ).collect()[0]
    assert agg["n"] == total_docs
    assert agg["groups"] == agg["keepers"]


def test_jaccard_pairs_are_symmetric_free_and_bounded(spark):
    rows = sparkgraft.QUERIES["dedup_ngram_jaccard"](spark, SF_DIR).collect()
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert 0.6 <= r["jaccard"] <= 1.0 + 1e-9


def test_wordcount_total_equals_token_count(spark):
    """Σ wordcount == Σ per-doc whitespace tokens — explode loses nothing."""
    wc = (
        sparkgraft.QUERIES["text_wordcount"](spark, SF_DIR)
        .agg(F.sum("cnt"))
        .collect()[0][0]
    )
    tc = (
        sparkgraft.QUERIES["text_token_count"](spark, SF_DIR)
        .agg(F.sum("ws_tokens"))
        .collect()[0][0]
    )
    assert wc == tc


def test_candidate_key_methods_cover_exact_dups(spark):
    """Exact duplicates must share a ckey under BOTH candidate-key
    methods — the guarantee that lets keep-best dedup and edit-distance
    verification swap the prefix key for MinHash-LSH band keys at scale
    without losing true duplicate pairs."""
    from sparkgraft.textops import with_candidate_key

    exact = _exact_dup_pairs(spark, SF_DIR_BIG)
    assert exact, "fixture should contain exact duplicate docs"
    d = load(spark, SF_DIR_BIG, "documents").select("doc_id", "text")
    for method in ("prefix", "minhash_band"):
        keyed = with_candidate_key(d, method).select("doc_id", "ckey")
        a, b = keyed.alias("a"), keyed.alias("b")
        pairs = {
            (r["doc_a"], r["doc_b"])
            for r in a.join(
                b,
                (F.col("a.ckey") == F.col("b.ckey"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .distinct()
            .collect()
        }
        assert exact <= pairs, method


def test_candidate_key_rejects_unknown_method(spark):
    import pytest

    from sparkgraft.textops import with_candidate_key

    d = load(spark, SF_DIR, "documents")
    with pytest.raises(ValueError):
        with_candidate_key(d, "bogus")


def test_ngram_jaccard_sampled_is_full_restricted_to_sample(spark):
    """The sampled key's output must be EXACTLY the full key's pairs
    whose both endpoints survive the deterministic 1/16 doc sample —
    the property that makes the sampled dup-rate an unbiased pair-space
    estimate (and what the mirrored oracle predicate encodes)."""
    from sparkgraft.textops import _DOC_SAMPLE_MOD

    full = sparkgraft.QUERIES["dedup_ngram_jaccard"](spark, SF_DIR)
    sampled = sparkgraft.QUERIES["dedup_ngram_jaccard_sampled"](spark, SF_DIR)
    expect = {
        (r["doc_a"], r["doc_b"], r["overlap"], r["jaccard"])
        for r in full.collect()
        if r["doc_a"] % _DOC_SAMPLE_MOD == 0 and r["doc_b"] % _DOC_SAMPLE_MOD == 0
    }
    got = {
        (r["doc_a"], r["doc_b"], r["overlap"], r["jaccard"])
        for r in sampled.collect()
    }
    assert got == expect
    assert got, "sf0.001 sample should still surface dup pairs"


def test_burstiness_separates_content_from_glue(spark):
    """Fano factors must all exceed ~1 (any clumping at all), arrive in
    non-increasing order, and the burstiest term must clump far above
    the Poisson baseline (fano >> 1) — the Church-Gale property the
    feature exists to detect."""
    import sparkgraft
    from conftest import SF_DIR

    out = sparkgraft.QUERIES["text_burstiness_profile"](
        spark, SF_DIR
    ).toPandas()
    assert 0 < len(out) <= 20
    f = list(out.fano_micro)
    assert f == sorted(f, reverse=True)
    assert f[0] > 1_200_000  # burstiest term well above Poisson (1.0)
    assert (out.tf >= 50).all()
    assert (out.df >= 1).all()
