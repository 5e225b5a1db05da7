"""Text-analysis + deduplication operators over the documents corpus
(SURVEY.md §2.11 — the LLM-data-pipeline surface).

Everything is built from JVM-side primitives (split/explode/groupBy/
higher-order array functions) — no Python UDFs in any hot path. At 100 TB
the shapes hold: tokenization is a generator (no shuffle), counts are
partial+final aggregates, pair generation is always bucket-pruned (LSH)
before any join, never a naive O(n²) cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load
from .registry import query

# Tokenized view shared by most operators: (doc_id, lang, token).
def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id", "lang", F.explode(F.split(F.lower("text"), " ")).alias("token")
    )


@query(
    "text_wordcount",
    oracle="""
    SELECT token, count(*) AS cnt
    FROM (SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents) t
    GROUP BY token
    """,
)
def text_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE canonical Hadoop job. explode is map-side; the count is a
    partial+final aggregate — exactly mapper/combiner/reducer, declared."""
    return _tokens(spark, sf_dir).groupBy("token").agg(F.count("*").alias("cnt"))


@query(
    "text_tfidf",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM documents
    ),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
    df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT tf.doc_id, tf.token, tf.tf,
           round(tf.tf * ln(n.n_docs / df.df), 6) AS tfidf
    FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
    """,
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF, natural log pinned on both sides. The doc-frequency table
    grows with the corpus vocabulary (web text: typos, URLs, numbers →
    billions of distinct tokens at 100 TB), so it is joined back as a
    plain shuffle equi-join on ``token`` — never a forced broadcast.
    AQE's size-gated auto-broadcast still converts it map-side whenever
    the vocabulary is genuinely small, which is the only safe time."""
    tok = _tokens(spark, sf_dir)
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = load(spark, sf_dir, "documents").count()  # one scalar, driver-side
    return tf.join(df, "token").select(
        "doc_id",
        "token",
        "tf",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6).alias("tfidf"),
    )


@query(
    "text_ngrams",
    oracle="""
    SELECT lang, bigram, count(*) AS cnt FROM (
      SELECT lang,
             unnest(list_transform(range(1, len(string_split(lower(text), ' '))),
                                   i -> string_split(lower(text), ' ')[i] || ' ' ||
                                        string_split(lower(text), ' ')[i+1])) AS bigram
      FROM documents) t
    GROUP BY lang, bigram
    """,
)
def text_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram counts per language — positional array construction, no
    self-join. Spark's transform lambda exposes the 0-based index; DuckDB
    subscripts are 1-based, aligned in the oracle."""
    d = load(spark, sf_dir, "documents")
    # Guard single-token docs: Spark's sequence(1, 0) counts DOWN instead
    # of returning empty, unlike DuckDB's range. The token array is
    # materialized behind a projection boundary first — inlining split()
    # into each element_at re-evaluates it per element (r4 fix: ~8× on
    # the 5-gram twin below).
    base = d.select("lang", F.split(F.lower("text"), " ").alias("toks"))
    bigrams = F.expr(
        "CASE WHEN size(toks) < 2 THEN array()"
        " ELSE transform(sequence(1, size(toks) - 1),"
        " i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1))) END"
    )
    return (
        base.select("lang", F.explode(bigrams).alias("bigram"))
        .groupBy("lang", "bigram")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "text_lang_stats",
    oracle="""
    SELECT lang, source, count(*) AS n_docs,
           round(avg(n_chars), 6) AS avg_chars,
           min(n_chars) AS min_chars, max(n_chars) AS max_chars
    FROM documents
    GROUP BY lang, source
    """,
)
def text_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


@query(
    "text_inverted_index",
    oracle="""
    SELECT token,
           array_to_string(list(doc_id ORDER BY doc_id), '|') AS doc_ids,
           count(*) AS df
    FROM (SELECT DISTINCT doc_id, unnest(string_split(lower(text), ' ')) AS token
          FROM documents) t
    GROUP BY token
    """,
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index canon: term → sorted posting list. Posting lists are
    bounded by doc count; at web scale the long tail is fine and hot terms
    would be delta-encoded downstream — the groupBy shape is unchanged.
    The posting list sorts as INTs (10 after 2), then the surface projects
    to a '|'-joined string for driver hashability."""
    return (
        _tokens(spark, sf_dir)
        .select("doc_id", "token")
        .distinct()
        .groupBy("token")
        .agg(
            F.array_join(
                F.sort_array(F.collect_list("doc_id")).cast("array<string>"), "|"
            ).alias("doc_ids"),
            F.count("*").alias("df"),
        )
    )


_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]


@query(
    "text_quality_score",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, n_chars,
             string_split(lower(text), ' ') AS toks,
             len(string_split(lower(text), ' ')) AS n_tokens
      FROM documents)
    SELECT doc_id, n_tokens,
           n_chars // n_tokens AS avg_token_len_floor,
           len(list_filter(toks, x -> list_contains({_STOPWORDS}, x))) AS n_stop,
           len(list_filter(toks, x -> len(x) <= 2)) AS n_short,
           CASE WHEN n_tokens >= 20
                 AND len(list_filter(toks, x -> list_contains({_STOPWORDS}, x))) > 0
                THEN 'keep' ELSE 'flag' END AS verdict
    FROM t
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring for training-data filtering: token count,
    stopword presence, short-token count → keep/flag verdict. Integer
    features only — ratio thresholds stay exact across engines."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), " ")
    stop = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop, x)))
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        (F.col("n_chars") / n_tokens).cast("long").alias("avg_token_len_floor"),
        n_stop.alias("n_stop"),
        F.size(F.filter(toks, lambda x: F.length(x) <= 2)).alias("n_short"),
        F.when((n_tokens >= 20) & (n_stop > 0), "keep").otherwise("flag").alias("verdict"),
    )


@query(
    "text_token_count",
    oracle=r"""
    SELECT doc_id,
           len(string_split(text, ' '))                  AS ws_tokens,
           len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS re_tokens,
           length(text)                                  AS n_bytes
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split and a BPE-ish regex token
    class — the cheap pre-tokenizer cost estimate for LLM pipelines."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), 0)).alias("re_tokens"),
        F.length("text").alias("n_bytes"),
    )


@query(
    "text_fingerprint",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents)
    SELECT doc_id,
           (list_aggregate(list_transform(range(1, len(toks) + 1),
                                          i -> ascii(toks[i]) * ((i - 1) % 64 + 1)),
                           'sum') % 1000000007)::BIGINT AS fingerprint
    FROM t
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-sensitive document fingerprint: Σ ascii(first char of
    token_i) × (i mod 64 + 1), mod p. Pure integer arithmetic → exact in
    any engine; order-sensitive, unlike a bag-of-words hash."""
    d = load(spark, sf_dir, "documents")
    weighted = F.expr(
        "transform(split(lower(text), ' '), (x, i) -> ascii(x) * (i % 64 + 1))"
    )
    return d.select(
        "doc_id",
        (F.aggregate(weighted, F.lit(0).cast("long"), lambda acc, x: acc + x) % 1000000007)
        .alias("fingerprint"),
    )


@query(
    "text_lang_id",
    oracle=f"""
    SELECT doc_id, lang,
           CASE WHEN len(list_filter(string_split(lower(text), ' '),
                                     x -> list_contains({_STOPWORDS}, x))) * 10
                     >= len(string_split(lower(text), ' '))
                THEN 'en' ELSE 'other' END AS lang_guess
    FROM documents
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram-ish language ID heuristic: English stopword density ≥ 10% →
    'en'. (A real system compares per-language profile sets; the plumbing
    — token filter, density, argmax-by-threshold — is what scales.)"""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), " ")
    stop = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop, x)))
    return d.select(
        "doc_id",
        "lang",
        F.when(n_stop * 10 >= F.size(toks), "en").otherwise("other").alias("lang_guess"),
    )


# ---------------------------------------------------------------------------
# Deduplication family
# ---------------------------------------------------------------------------


@query(
    "dedup_exact_docs",
    oracle="""
    SELECT sha256(lower(trim(text))) AS text_hash,
           min(doc_id)  AS keeper,
           count(*)     AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via normalized content hash — groupBy on the digest, so
    the shuffle moves 32-byte keys, not documents. keeper = min(doc_id)
    makes the survivor deterministic."""
    d = load(spark, sf_dir, "documents")
    return (
        d.groupBy(F.sha2(F.lower(F.trim("text")), 256).alias("text_hash"))
        .agg(F.min("doc_id").alias("keeper"), F.count("*").alias("n_copies"))
    )


# MinHash parameters: k = BANDS × ROWS_PER_BAND hash functions.
_MINHASH_BANDS = 4
_MINHASH_ROWS = 4
_SHINGLE_W = 3  # word-shingle width


def _shingles(df: DataFrame) -> DataFrame:
    """(doc_id, shingle) — distinct w-word shingles per document. The
    token array is projected out first so split() runs once per row, not
    once per shingle position (r4 fix, see text_dup_ngram_coverage)."""
    base = df.select("doc_id", F.split(F.lower("text"), " ").alias("toks"))
    sh = F.expr(
        f"transform(sequence(1, greatest(size(toks) - {_SHINGLE_W - 1}, 1)),"
        f" i -> array_join(slice(toks, i, {_SHINGLE_W}), ' '))"
    )
    return base.select("doc_id", F.explode(sh).alias("shingle")).distinct()


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """One row per doc: minhash_0..minhash_{k-1} (k = bands × rows).

    Hash family: xxhash64(seed_i, shingle) — k independent functions from
    one primitive by folding the seed into the hash input. The k mins are
    computed in ONE groupBy pass (k partial-min aggregates), not k passes.
    """
    k = _MINHASH_BANDS * _MINHASH_ROWS
    sh = _shingles(docs)
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"mh_{i}") for i in range(k)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def band_keys(sigs: DataFrame) -> DataFrame:
    """(doc_id, band, band_key) — one LSH bucket key per (doc, band),
    band_key = hash of that band's minhash rows. Shared by the candidate
    pair generator (dedup_near_minhash) and with_candidate_key."""
    bands = []
    for b in range(_MINHASH_BANDS):
        cols = [F.col(f"mh_{b * _MINHASH_ROWS + r}") for r in range(_MINHASH_ROWS)]
        bands.append(
            sigs.select(
                "doc_id",
                F.lit(b).alias("band"),
                F.xxhash64(*cols).alias("band_key"),
            )
        )
    bucketed = bands[0]
    for other in bands[1:]:
        bucketed = bucketed.unionByName(other)
    return bucketed


@query("dedup_near_minhash")  # rows-only: hash-seed-specific buckets
def dedup_near_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs via MinHash-LSH banding.

    Pipeline: shingle → k minhashes (one pass) → band keys → groupBy band
    → pairs within buckets only. The O(n²) pair space is never formed;
    work is proportional to bucket sizes. Invariant-tested: every exact
    duplicate pair must surface as a candidate (tests/test_invariants.py).
    """
    bucketed = band_keys(minhash_signatures(load(spark, sf_dir, "documents")))
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return pairs


@query(
    "dedup_ngram_jaccard",
    oracle="""
    WITH tok AS (
      SELECT DISTINCT doc_id, unnest(string_split(lower(text), ' ')) AS token
      FROM documents),
    size_ AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS overlap
      FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT i.doc_a, i.doc_b, i.overlap,
           round(i.overlap * 1.0 / (sa.n + sb.n - i.overlap), 6) AS jaccard
    FROM inter i
    JOIN size_ sa ON i.doc_a = sa.doc_id
    JOIN size_ sb ON i.doc_b = sb.doc_id
    WHERE i.overlap * 1.0 / (sa.n + sb.n - i.overlap) >= 0.6
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set Jaccard ≥ 0.6 pairs via set-level deduplication.

    A near-dup corpus has far fewer distinct token SETS than documents
    (3,935 vs 5,000 at sf0.1), and identical sets pair at jaccard 1.0
    without any comparison — so work runs over distinct sets only, and
    doc pairs are expanded afterwards.

    Candidate generation is PREFIX FILTERING (the AllPairs/PPJoin
    family, Bayardo et al. WWW'07): under any fixed total order on
    tokens, two sets with Jaccard ≥ τ must share at least one token
    among the first n − ⌈τ·n⌉ + 1 tokens of each (their required
    overlap is ≥ ⌈τ·n⌉ given the size bound |A| ≥ τ|B|, so disjoint
    prefixes would leave too few tokens to reach it). Ordering tokens
    by ascending document frequency makes prefixes maximally rare, so
    candidates come from a plain shuffle EQUI-join on the prefix token
    — exact (zero false negatives), skew-resistant, and with NO
    corpus-proportional broadcast anywhere in the plan (plan-asserted
    in tests/test_plans.py). The naive token-join alternative explodes
    on high-frequency tokens (every stopword contributes df² pairs);
    prefix filtering is exactly the published fix and is the shape
    that survives 100 TB. `dedup_ngram_jaccard_sampled` is the
    routine-runnable form; this full pass is the verification baseline.
    """
    # Tokens become 64-bit hashes immediately: set comparisons downstream
    # are long-array ops, not string ops (collision odds are negligible
    # and only affect a rows-only-invisible intersect count).
    tok = (
        _tokens(spark, sf_dir)
        .select("doc_id", F.xxhash64("token").alias("tok"))
        .distinct()
    )
    return _jaccard_pairs_ppjoin(tok)


def _jaccard_pairs_ppjoin(tok: DataFrame, tau: float = 0.6) -> DataFrame:
    """Shared PPJoin core: distinct-token frame (doc_id, tok) → exact
    Jaccard ≥ τ doc pairs. See `dedup_ngram_jaccard` for the algorithm
    argument; `dedup_ngram_jaccard_sampled` runs the identical plan over
    the deterministic 1/16 doc sample."""
    docsets = tok.groupBy("doc_id").agg(
        F.sort_array(F.collect_set("tok")).alias("toks")
    )
    sets = (
        docsets.groupBy("toks")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("doc_ids"))
        .withColumn("n", F.size("toks"))
        # Scalar surrogate for "set identity" — orders the pair space with
        # one long compare instead of an array compare per candidate.
        .withColumn("skey", F.xxhash64("toks"))
    )

    # Prefix-filtered candidates: explode each distinct set's rarest
    # n − ⌈τ·n⌉ + 1 tokens (ascending-df order), equi-join on the token,
    # prune by the exact size-ratio bound, verify survivors with the
    # real intersection. Every join below is a shuffle equi-join keyed
    # on bounded-cardinality columns — nothing scales with corpus size
    # except partition counts.
    from pyspark.sql import Window

    stok = sets.select("skey", "n", F.explode("toks").alias("tok"))
    tok_df = stok.groupBy("tok").agg(F.count("*").alias("df"))
    prefix = (
        stok.join(tok_df, "tok")
        .withColumn(
            "pos",
            F.row_number().over(Window.partitionBy("skey").orderBy("df", "tok")),
        )
        .filter(F.col("pos") <= F.col("n") - F.ceil(F.lit(tau) * F.col("n")) + 1)
        .select("skey", "n", "tok", "pos")
    )
    pa, pb = prefix.alias("pa"), prefix.alias("pb")
    na, nb = F.col("pa.n"), F.col("pb.n")
    cand = (
        pa.join(
            pb,
            (F.col("pa.tok") == F.col("pb.tok"))
            & (F.col("pa.skey") < F.col("pb.skey"))
            & (na * F.lit(1.0) >= tau * nb)
            & (nb * F.lit(1.0) >= tau * na)
            # PPJoin positional filter: a match at positions (i, j) caps
            # the overlap at 1 + min(n_a - i, n_b - j); a true pair's
            # FIRST shared token (provably inside both prefixes, since
            # overlap ≥ τ·max(n_a, n_b)) always satisfies the bound, so
            # this prunes ~half the raw matches with zero false negatives
            # (Xiao et al., WWW'08).
            & (
                F.lit(1.0) + F.least(na - F.col("pa.pos"), nb - F.col("pb.pos"))
                >= F.lit(tau / (1.0 + tau)) * (na + nb)
            ),
        )
        .select(F.col("pa.skey").alias("skey_a"), F.col("pb.skey").alias("skey_b"))
        .distinct()
    )
    sa = sets.select(
        F.col("skey").alias("skey_a"),
        F.col("toks").alias("toks_a"),
        F.col("n").alias("n_a"),
        F.col("doc_ids").alias("ids_a"),
    )
    sb = sets.select(
        F.col("skey").alias("skey_b"),
        F.col("toks").alias("toks_b"),
        F.col("n").alias("n_b"),
        F.col("doc_ids").alias("ids_b"),
    )
    cross = (
        # Verify join-backs ride SHUFFLE-HASH joins: sort-merge would
        # range-sort millions of candidate rows (and re-sort the array-
        # carrying intermediate) just to probe a narrow per-partition
        # hash map of set metadata. Hash build side is the sets table
        # partition slice — bounded by partition count, never sorted.
        # Measured at sf0.1: 34.9 s -> 20.6 s for the full query.
        cand.join(sa.hint("shuffle_hash"), "skey_a")
        .join(sb.hint("shuffle_hash"), "skey_b")
        .withColumn(
            "overlap",
            F.size(F.array_intersect("toks_a", "toks_b")).cast("long"),
        )
        .withColumn(
            "jaccard",
            F.col("overlap") * 1.0 / (F.col("n_a") + F.col("n_b") - F.col("overlap")),
        )
        .filter(F.col("jaccard") >= tau)
        .select(F.explode("ids_a").alias("id_a"), "ids_b", "overlap", "jaccard")
        .select("id_a", F.explode("ids_b").alias("id_b"), "overlap", "jaccard")
        .select(
            F.least("id_a", "id_b").alias("doc_a"),
            F.greatest("id_a", "id_b").alias("doc_b"),
            "overlap",
            F.round("jaccard", 6).alias("jaccard"),
        )
    )

    # Identical sets: every in-group pair is a dup at jaccard exactly 1.
    within = (
        sets.filter(F.size("doc_ids") >= 2)
        .select("n", F.explode("doc_ids").alias("id_a"), F.col("doc_ids"))
        .select("n", "id_a", F.explode("doc_ids").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            F.col("id_a").alias("doc_a"),
            F.col("id_b").alias("doc_b"),
            F.col("n").cast("long").alias("overlap"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    return cross.unionByName(within)


# Deterministic 1/16 doc sample for the routine-runnable lexical-dup
# audit: every 16th doc_id — pure modular arithmetic (the
# sim_pair_histogram_sampled idiom), identical in any engine, applied to
# the documents scan BEFORE tokenization so everything downstream (token
# explode, set grouping, prefix join) shrinks 16×; the candidate pair
# space shrinks ~256×. A 1/256-of-pairs dup-rate estimate is what a
# daily corpus-health check needs — the full exact key stays as the
# verification baseline.
_DOC_SAMPLE_MOD = 16
_DOC_SAMPLE_SQL = f"doc_id % {_DOC_SAMPLE_MOD} = 0"


@query(
    "dedup_ngram_jaccard_sampled",
    oracle=f"""
    WITH tok AS (
      SELECT DISTINCT doc_id, unnest(string_split(lower(text), ' ')) AS token
      FROM documents WHERE {_DOC_SAMPLE_SQL}),
    size_ AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS overlap
      FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT i.doc_a, i.doc_b, i.overlap,
           round(i.overlap * 1.0 / (sa.n + sb.n - i.overlap), 6) AS jaccard
    FROM inter i
    JOIN size_ sa ON i.doc_a = sa.doc_id
    JOIN size_ sb ON i.doc_b = sb.doc_id
    WHERE i.overlap * 1.0 / (sa.n + sb.n - i.overlap) >= 0.6
    """,
)
def dedup_ngram_jaccard_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`dedup_ngram_jaccard` over the deterministic 1/16 doc sample —
    the form you actually schedule at 100 TB. The full exact audit is
    the single heaviest bench key (~16 s at sf0.1, 77% of its group);
    a routine lexical dup-rate health check doesn't need every pair, it
    needs an unbiased estimate, and a uniform 1/16 row sample estimates
    the pair-dup rate at 1/256 of the candidate volume. The sample
    predicate is plain modular arithmetic on doc_id fused into the
    documents scan (everything downstream shrinks with it), mirrored
    verbatim in the oracle so the key stays HASH-CHECKED: the surviving
    pairs are exactly the full key's pairs whose BOTH endpoints sample
    in. Same PPJoin plan, zero corpus-proportional broadcast."""
    tok = (
        _tokens_sampled(spark, sf_dir)
        .select("doc_id", F.xxhash64("token").alias("tok"))
        .distinct()
    )
    return _jaccard_pairs_ppjoin(tok)


def _tokens_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(
        F.col("doc_id") % _DOC_SAMPLE_MOD == 0
    )
    return d.select(
        "doc_id", "lang", F.explode(F.split(F.lower("text"), " ")).alias("token")
    )


@query("dedup_simhash")  # rows-only: hash-seed-specific signatures
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document + banded-LSH candidate pairs.

    Each bit b of the signature is sign(Σ_tokens ±1) where the ± comes
    from bit b of xxhash64(token) — all 64 bits computed as conditional-
    sum aggregates in ONE pass over the tokens. Candidates = pairs
    sharing any of the 4 16-bit bands (Hamming-distance LSH). Band width
    sets the bucket count (2^16 per band), which is what keeps buckets —
    and therefore the within-bucket pair blow-up — small as the corpus
    grows; a 16-bit signature with 4-bit bands degenerates to ~all-pairs
    at merely thousands of documents.
    """
    n_bits, band_bits = 64, 16
    n_bands = n_bits // band_bits
    tok = _tokens(spark, sf_dir).select("doc_id", "token")
    h = F.xxhash64("token")
    bit_aggs = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"bit_{i}")
        for i in range(n_bits)
    ]
    sig = tok.groupBy("doc_id").agg(*bit_aggs)
    band_keys = [
        sum(
            (
                F.when(F.col(f"bit_{nb * band_bits + i}") > 0, F.lit(2**i)).otherwise(0)
                for i in range(band_bits)
            ),
            F.lit(0),
        ).alias(f"band_{nb}")
        for nb in range(n_bands)
    ]
    bucketed = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(nb).alias("band"), band_keys[nb].alias("key"))
                    for nb in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


@query(
    "dedup_cluster_cc",
    oracle="""
    WITH RECURSIVE tok AS (
      SELECT DISTINCT doc_id, unnest(string_split(lower(text), ' ')) AS token
      FROM documents),
    size_ AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS overlap
      FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id),
    pairs AS (
      SELECT i.doc_a, i.doc_b
      FROM inter i
      JOIN size_ sa ON i.doc_a = sa.doc_id
      JOIN size_ sb ON i.doc_b = sb.doc_id
      WHERE i.overlap * 1.0 / (sa.n + sb.n - i.overlap) >= 0.6),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs),
    walk(doc_id, reach) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT w.doc_id, e.dst FROM walk w JOIN edges e ON w.reach = e.src)
    SELECT doc_id, min(reach) AS canonical_id FROM walk GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def dedup_cluster_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTERS: connected components over the exact
    Jaccard ≥ 0.6 pair graph (`dedup_ngram_jaccard` edges), each document
    labeled with the min doc_id of its component — the "pick one canonical
    copy per dup cluster" step of a training-data pipeline, which pairwise
    dedup alone cannot express (dup pairs chain transitively).

    Components come from alternating large-star/small-star contraction
    (`graph.connected_components`, Kiveris et al. SoCC 2014): O(log n)
    rounds regardless of component diameter — the r4 min-label
    propagation was O(diameter) rounds, which chain-shaped dup families
    make deep at 100 TB. Each round is two keyed aggregations + two
    equi-joins on doc ids with `localCheckpoint` lineage truncation;
    only scalar convergence counts reach the driver. The oracle walks
    reachability with a recursive CTE — min(reachable) is exactly the
    component minimum."""
    from .catalog import load as _load
    from .graph import connected_components

    pairs = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    vertices = _load(spark, sf_dir, "documents").select("doc_id")
    labels, _rounds = connected_components(
        pairs, vertices, id_col="doc_id", label_col="canonical_id"
    )
    return labels.orderBy("doc_id")


@query(
    "text_corpus_pipeline",
    oracle="""
    WITH keepers AS (
      SELECT min(doc_id) AS doc_id
      FROM documents
      GROUP BY sha256(lower(trim(text))))
    SELECT d.lang,
           count(*)                  AS n_docs_kept,
           round(avg(d.n_chars), 6)  AS avg_chars,
           round(sum(length(string_split(d.text, ' ')))
                 * 1.0 / count(*), 6) AS avg_tokens
    FROM documents d
    JOIN keepers k ON d.doc_id = k.doc_id
    WHERE d.n_chars >= 120
    GROUP BY d.lang
    ORDER BY d.lang
    """,
)
def text_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus curation, composed from this module's
    own operators: exact dedup (`dedup_exact_docs` keepers — the
    normalized-hash survivors) -> quality gate (length floor) ->
    per-language corpus stats with a whitespace token count. One
    composite query proving the operators chain the way a real pipeline
    uses them; every stage stays a shuffle-aware DataFrame program, so
    the composition inherits the scale posture of its parts. (The
    harsher near-dup purge is its own operator chain:
    `dedup_ngram_jaccard` -> `dedup_cluster_cc`, which at jaccard 0.6
    collapses this synthetic word-salad corpus to ~8% of its docs.)"""
    d = load(spark, sf_dir, "documents")
    keepers = dedup_exact_docs(spark, sf_dir).select(
        F.col("keeper").alias("doc_id")
    )
    kept = d.join(keepers, "doc_id").filter(F.col("n_chars") >= 120)
    tokens = F.size(F.split("text", " "))
    return (
        kept.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs_kept"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
            F.round(F.sum(tokens) / F.count("*"), 6).alias("avg_tokens"),
        )
        .orderBy("lang")
    )


_DUP_PREFIX_LEN = 60  # the corpus's built-in dup structure (FIXTURES.md);
# oracle SQL pairs with this as a literal `substr(text, 1, 60)`


def with_candidate_key(d: DataFrame, method: str = "prefix") -> DataFrame:
    """Attach the near-dup candidate bucket key ``ckey`` to each document
    — the composition point for everything downstream that needs "docs
    that might be duplicates share a key": keep-best dedup partitions on
    it, edit-distance verification equi-joins on it.

    - ``"prefix"`` (default): the corpus's built-in 60-char-prefix dup
      structure — deterministic, exactly ONE key per doc, expressible in
      the DuckDB oracle, so the hash-graded registered queries use it.
    - ``"minhash_band"``: MinHash-LSH band keys (the same generator
      dedup_near_minhash buckets with) — the content-defined candidate
      source that holds at 100 TB where no prefix structure exists;
      emits one row per (doc, band). Pair-generation consumers compose
      unchanged (equi-join on ckey + distinct); rank-based consumers
      must aggregate over a doc's buckets (keep iff best in EVERY
      bucket). Invariant-tested: exact duplicates always share a ckey
      under both methods (tests/test_textops.py).
    """
    if method == "prefix":
        return d.withColumn("ckey", F.substring("text", 1, _DUP_PREFIX_LEN))
    if method == "minhash_band":
        keys = band_keys(minhash_signatures(d)).select(
            "doc_id", F.concat_ws(":", "band", "band_key").alias("ckey")
        )
        return d.join(keys, "doc_id")
    raise ValueError(f"unknown candidate-key method: {method!r}")


@query(
    "dedup_keep_best",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM (
      SELECT doc_id, lang, n_chars,
             row_number() OVER (PARTITION BY substr(text, 1, 60)
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents
    ) t
    WHERE rn = 1
    """,
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup: within each near-dup cluster (shared
    candidate key, default = the corpus's prefix structure) keep the
    LONGEST document, ties to the lowest doc_id — the "pick the best
    copy, not an arbitrary one" curation step that plain keeper=min(id)
    dedup (`dedup_exact_docs`) cannot express. One window over the
    cluster key; the shuffle carries only (ckey, len, id), and a
    pre-aggregated max_by form drops the window entirely if clusters
    ever skew. Swap with_candidate_key(..., "minhash_band") to run the
    same shape over content-defined LSH buckets at scale."""
    from pyspark.sql import Window

    d = with_candidate_key(load(spark, sf_dir, "documents"))
    w = Window.partitionBy("ckey").orderBy(F.desc("n_chars"), "doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "n_chars")
    )


@query(
    "text_edit_distance",
    oracle="""
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           levenshtein(a.text, b.text) AS edit_dist,
           (levenshtein(a.text, b.text) * 100)
             // greatest(len(a.text), len(b.text)) AS dist_pct_floor
    FROM documents a
    JOIN documents b
      ON substr(a.text, 1, 60) = substr(b.text, 1, 60)
     AND a.doc_id < b.doc_id
    """,
)
def text_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance verification of near-dup CANDIDATES: Levenshtein is
    O(len²) per pair, so it must never run all-pairs — here it scores
    only pairs that share a candidate key (with_candidate_key; default =
    the corpus's prefix structure, and the identical code path runs over
    MinHash-LSH band keys at scale — tests/test_textops.py exercises
    that composition). The candidate join is a plain equi-join on the
    key; integer percent (floor) keeps the ratio exact across
    engines."""
    d = with_candidate_key(
        load(spark, sf_dir, "documents").select("doc_id", "text")
    )
    a, b = d.alias("a"), d.alias("b")
    dist = F.levenshtein(F.col("a.text"), F.col("b.text"))
    return (
        a.join(
            b,
            (F.col("a.ckey") == F.col("b.ckey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            dist.alias("edit_dist"),
            (
                (dist * 100)
                / F.greatest(F.length("a.text"), F.length("b.text"))
            ).cast("long").alias("dist_pct_floor"),
        )
    )


@query(
    "text_training_mix",
    oracle="""
    WITH quality AS (
      SELECT doc_id, text, lang, n_chars,
             len(string_split(lower(text), ' ')) AS n_tokens
      FROM documents
      WHERE len(string_split(lower(text), ' ')) >= 20
    ),
    dedup AS (
      SELECT doc_id, lang, n_chars, n_tokens,
             row_number() OVER (PARTITION BY substr(text, 1, 60)
                                ORDER BY n_chars DESC, doc_id) AS dup_rn
      FROM quality
    ),
    capped AS (
      SELECT doc_id, lang, n_chars, n_tokens,
             row_number() OVER (PARTITION BY lang
                                ORDER BY n_chars DESC, doc_id) AS lang_rn
      FROM dedup WHERE dup_rn = 1
    )
    SELECT lang,
           count(*)              AS n_docs,
           sum(n_chars)::BIGINT  AS total_chars,
           sum(n_tokens)::BIGINT AS total_tokens,
           min(n_chars)          AS min_chars
    FROM capped
    WHERE lang_rn <= 50
    GROUP BY lang
    ORDER BY lang
    """,
)
def text_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-set assembly — the composite every stage above
    exists for: quality gate (≥ 20 tokens) → keep-best dedup (longest doc
    per 60-char-prefix cluster) → per-language cap (top-50 by length,
    curriculum-style) → per-language manifest (doc/char/token budget).
    Every stage is a narrow filter or a window over a bounded partition
    key; nothing materializes between stages — Catalyst pipelines the
    whole thing into two window shuffles plus the final 5-row aggregate,
    which is exactly the plan you'd want over 100 TB of documents."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.lower("text"), " "))
    quality = d.select(
        "doc_id", "text", "lang", "n_chars", n_tokens.alias("n_tokens")
    ).filter(F.col("n_tokens") >= 20)
    w_dup = Window.partitionBy(F.substring("text", 1, 60)).orderBy(
        F.desc("n_chars"), "doc_id"
    )
    dedup = quality.withColumn("dup_rn", F.row_number().over(w_dup)).filter(
        F.col("dup_rn") == 1
    )
    w_lang = Window.partitionBy("lang").orderBy(F.desc("n_chars"), "doc_id")
    capped = dedup.withColumn("lang_rn", F.row_number().over(w_lang)).filter(
        F.col("lang_rn") <= 50
    )
    return (
        capped.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.min("n_chars").alias("min_chars"),
        )
        .orderBy("lang")
    )


@query(
    "text_decontaminate",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
    g AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
                 range(1, len(t) - 3),
                 i -> array_to_string(t[i:i+4], ' ')))) AS ng
      FROM toks WHERE len(t) >= 5)
    SELECT t.doc_id,
           count(DISTINCT t.ng)::BIGINT     AS shared_ngrams,
           count(DISTINCT b.doc_id)::BIGINT AS n_bench_docs
    FROM g t
    JOIN g b ON t.ng = b.ng
    WHERE b.doc_id % 97 = 0 AND t.doc_id % 97 <> 0
    GROUP BY t.doc_id
    HAVING count(DISTINCT t.ng) >= 3
    """,
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing >= 3 distinct
    5-grams with the held-out benchmark set (doc_id % 97 == 0 stands in
    for a fixed eval suite). Both sides explode to distinct (doc, ngram)
    pairs and meet in one equi-join on the ngram — shuffle-bounded,
    never all-pairs, so it scales like wordcount rather than O(n^2).
    At 100 TB the bench side is a fixed small table -> broadcast join."""
    d = load(spark, sf_dir, "documents")
    # toks behind a projection boundary: split once per row, not once
    # per shingle position inside the transform lambda (r4 fix class,
    # see text_dup_ngram_coverage).
    base = d.select("doc_id", F.split(F.lower("text"), " ").alias("toks"))
    toks = F.col("toks")
    ngrams = F.when(
        F.size(toks) >= 5,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 4),
            lambda i: F.concat_ws(" ", F.slice(toks, i, 5)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    pairs = base.select("doc_id", F.explode(F.array_distinct(ngrams)).alias("ng"))
    bench = pairs.filter(F.col("doc_id") % 97 == 0).withColumnRenamed("doc_id", "bench_id")
    train = pairs.filter(F.col("doc_id") % 97 != 0)
    return (
        train.join(bench, "ng")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("ng").alias("shared_ngrams"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
        .filter(F.col("shared_ngrams") >= 3)
    )


_PACK_BUDGET = 512  # tokens per packed training sequence


@query(
    "text_pack_sequences",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             len(string_split(lower(text), ' '))::BIGINT AS n_tokens
      FROM documents),
    cum AS (
      SELECT doc_id, lang, n_tokens,
             sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING) AS cum_before
      FROM toks),
    packed AS (
      SELECT lang, n_tokens,
             (COALESCE(cum_before, 0) // {_PACK_BUDGET})::BIGINT AS seq_id
      FROM cum)
    SELECT lang, seq_id,
           count(*)::BIGINT AS n_docs,
           sum(n_tokens)::BIGINT AS seq_tokens
    FROM packed
    GROUP BY lang, seq_id
    ORDER BY lang, seq_id
    """,
)
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing — the step that turns a curated corpus into
    fixed-budget training sequences: docs are laid out in a deterministic
    order (doc_id) within each shard key (lang) and assigned to sequence
    slots by their running token offset (slot = floor(offset/budget), so
    docs straddle boundaries exactly like a real packer's byte offsets).
    The manifest aggregates docs and tokens per slot.

    Scale shape: the running sum partitions by the shard key — there is
    NO global window; a 100 TB run packs within shards in parallel,
    which is how production packers shard anyway. Two keyed shuffles
    (window + rollup), both skew-bounded by the lang distribution; a
    heavier-skew corpus would swap lang for a hash-bucket shard key with
    identical semantics."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", F.size(F.split(F.lower("text"), " ")).cast("long").alias("n_tokens")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = toks.select(
        "lang",
        "n_tokens",
        (F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / F.lit(_PACK_BUDGET))
        .cast("long")
        .alias("seq_id"),
    )
    return (
        packed.groupBy("lang", "seq_id")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").alias("seq_tokens"))
        .orderBy("lang", "seq_id")
    )


@query(
    "text_repetition_score",
    oracle="""
    WITH g AS (
      SELECT doc_id, lang,
             list_transform(
               generate_series(1, greatest(len(string_split(lower(text), ' ')) - 2, 1)),
               i -> string_split(lower(text), ' ')[i] || ' ' ||
                    string_split(lower(text), ' ')[i+1] || ' ' ||
                    string_split(lower(text), ' ')[i+2]) AS trigrams
      FROM documents)
    SELECT doc_id, lang,
           len(trigrams)::BIGINT AS n_trigrams,
           len(list_distinct(trigrams))::BIGINT AS n_distinct,
           round(1.0 - len(list_distinct(trigrams)) * 1.0 / len(trigrams), 6)
             AS rep_ratio
    FROM g
    ORDER BY doc_id
    """,
)
def text_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-n-gram quality signal (the Rae et al. Gopher repetition
    filter): fraction of a doc's word trigrams that are duplicates of an
    earlier trigram in the same doc. High ratio = boilerplate/looping
    text a curation pipeline drops. Entirely row-local higher-order
    array expressions (transform over a sequence + array_distinct) — no
    shuffle at all until the output sort, so it scales as a pure map."""
    d = load(spark, sf_dir, "documents")
    # Two projection boundaries: toks so split() runs once per row, and
    # tri so the trigram transform isn't evaluated twice (it feeds both
    # the total and the distinct count).
    base = d.select("doc_id", "lang", F.split(F.lower("text"), " ").alias("toks")).select(
        "doc_id",
        "lang",
        F.expr(
            "transform(sequence(1, greatest(size(toks) - 2, 1)),"
            " i -> concat_ws(' ', slice(toks, i, 3)))"
        ).alias("tri"),
    )
    return (
        base.select(
            "doc_id",
            "lang",
            F.size("tri").cast("long").alias("n_trigrams"),
            F.size(F.array_distinct("tri")).cast("long").alias("n_distinct"),
        )
        .withColumn(
            "rep_ratio",
            F.round(
                F.lit(1.0) - F.col("n_distinct") * 1.0 / F.col("n_trigrams"), 6
            ),
        )
        .orderBy("doc_id")
    )


@query(
    "text_pii_scrub",
    oracle="""
    WITH enriched AS (
      SELECT doc_id, lang,
             text || ' contact user' || doc_id ||
             '@example.org or +1-555-' ||
             lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS raw
      FROM documents),
    scrubbed AS (
      SELECT doc_id, lang,
             len(regexp_extract_all(raw, '[a-z0-9.]+@[a-z0-9.]+'))::BIGINT
               + len(regexp_extract_all(raw, '\\+1-[0-9]{3}-[0-9]{4}'))::BIGINT
               AS n_redactions,
             regexp_replace(
               regexp_replace(raw, '[a-z0-9.]+@[a-z0-9.]+', '<EMAIL>', 'g'),
               '\\+1-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS clean
      FROM enriched)
    SELECT doc_id, lang, n_redactions,
           len(clean)::BIGINT AS clean_chars, md5(clean) AS clean_md5
    FROM scrubbed
    ORDER BY doc_id
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction — the safety pass every training corpus runs: find
    email/phone spans, replace with typed placeholders, and count the
    redactions for the audit manifest. (The corpus carries no real PII,
    so deterministic contact strings are synthesized per doc first; the
    scrub path is exactly what production runs.) Pure regexp expressions
    inside codegen — row-local, zero shuffle; the digest of the scrubbed
    text lets the oracle verify the transformation byte-for-byte."""
    d = load(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.org or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    email_re = "[a-z0-9.]+@[a-z0-9.]+"
    phone_re = r"\+1-[0-9]{3}-[0-9]{4}"
    clean = F.regexp_replace(
        F.regexp_replace(raw, email_re, "<EMAIL>"), phone_re, "<PHONE>"
    )
    n_red = (
        F.regexp_count(raw, F.lit(email_re)) + F.regexp_count(raw, F.lit(phone_re))
    ).cast("long")
    return d.select(
        "doc_id",
        "lang",
        n_red.alias("n_redactions"),
        F.length(clean).cast("long").alias("clean_chars"),
        F.md5(clean).alias("clean_md5"),
    ).orderBy("doc_id")


@query(
    "text_lang_confusion",
    oracle=f"""
    WITH pred AS (
      SELECT lang,
             CASE WHEN len(list_filter(string_split(lower(text), ' '),
                                       x -> list_contains({_STOPWORDS}, x))) * 10
                       >= len(string_split(lower(text), ' '))
                  THEN 'en' ELSE 'other' END AS lang_guess
      FROM documents)
    SELECT lang, lang_guess, count(*)::BIGINT AS n_docs
    FROM pred
    GROUP BY lang, lang_guess
    ORDER BY lang, lang_guess
    """,
)
def text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-audit confusion matrix: declared language vs the
    heuristic lang-ID prediction (text_lang_id), as (truth, predicted)
    counts — the evaluation table every corpus-curation run publishes
    next to its filters. One row-local prediction + one hash aggregate;
    composes on top of the same prediction expression so the audit can
    never drift from the classifier it audits."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), " ")
    stop = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop, x)))
    pred = F.when(n_stop * 10 >= F.size(toks), "en").otherwise("other")
    return (
        d.select("lang", pred.alias("lang_guess"))
        .groupBy("lang", "lang_guess")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang", "lang_guess")
    )


@query(
    "dedup_url_canonicalize",
    oracle="""
    WITH raw AS (
      SELECT doc_id,
             'HTTPS://WWW.' || source || '.Example.org:443/d/' || (doc_id % 50) ||
             '/?utm_source=feed&lang=' || lang || '&utm_campaign=x&ref=' || doc_id
               AS url
      FROM documents),
    canon AS (
      SELECT doc_id,
             lower(regexp_extract(url, '^[A-Za-z]+://(?:[Ww][Ww][Ww]\\.)?([^/:?]+)', 1))
               || regexp_replace(regexp_extract(url, '^[A-Za-z]+://[^/?]*(/[^?]*)', 1),
                                 '/$', '')
               || CASE WHEN len(list_filter(string_split(
                              regexp_extract(url, '\\?(.*)$', 1), '&'),
                              p -> NOT (p LIKE 'utm_%' OR p LIKE 'ref=%'))) > 0
                       THEN '?' || array_to_string(list_filter(string_split(
                              regexp_extract(url, '\\?(.*)$', 1), '&'),
                              p -> NOT (p LIKE 'utm_%' OR p LIKE 'ref=%')), '&')
                       ELSE '' END AS canonical
      FROM raw)
    SELECT canonical,
           min(doc_id) AS keeper,
           count(*)::BIGINT AS n_urls
    FROM canon
    GROUP BY canonical
    ORDER BY canonical
    """,
)
def dedup_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + dedup — the crawl-frontier step that stops a
    web corpus fetching/storing the same page under cosmetic variants:
    lowercase scheme-less host, strip leading www. and the port, drop the
    trailing slash, and remove tracking params (utm_*, ref) while keeping
    semantic ones, then group by the canonical form (keeper = min id).
    (URLs are synthesized deterministically with the variants baked in —
    mixed case, www, :443, utm noise — so the canonicalizer provably
    collapses them: 500 raw URLs → 50·langs canonical groups.) All
    row-local regex/filter expressions in codegen; the dedup is one
    digest-keyed hash aggregate, the same shuffle shape as
    dedup_exact_docs."""
    d = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("HTTPS://WWW."), "source", F.lit(".Example.org:443/d/"),
        (F.col("doc_id") % 50).cast("string"),
        F.lit("/?utm_source=feed&lang="), "lang",
        F.lit("&utm_campaign=x&ref="), F.col("doc_id").cast("string"),
    )
    host = F.lower(
        F.regexp_extract(url, r"^[A-Za-z]+://(?:[Ww][Ww][Ww]\.)?([^/:?]+)", 1)
    )
    path = F.regexp_replace(
        F.regexp_extract(url, r"^[A-Za-z]+://[^/?]*(/[^?]*)", 1), r"/$", ""
    )
    qparams = F.filter(
        F.split(F.regexp_extract(url, r"\?(.*)$", 1), "&"),
        lambda p: ~(p.startswith("utm_") | p.startswith("ref=")),
    )
    canonical = F.concat(
        host,
        path,
        F.when(
            F.size(qparams) > 0, F.concat(F.lit("?"), F.array_join(qparams, "&"))
        ).otherwise(""),
    )
    return (
        d.select("doc_id", canonical.alias("canonical"))
        .groupBy("canonical")
        .agg(F.min("doc_id").alias("keeper"), F.count("*").alias("n_urls"))
        .orderBy("canonical")
    )


@query(
    "dedup_rate_by_source",
    oracle="""
    WITH clusters AS (
      SELECT doc_id, source,
             count(*) OVER (PARTITION BY sha256(lower(trim(text)))) AS n_copies
      FROM documents)
    SELECT source,
           count(*)::BIGINT AS n_docs,
           count(CASE WHEN n_copies > 1 THEN 1 END)::BIGINT AS n_dup_docs,
           round(count(CASE WHEN n_copies > 1 THEN 1 END) * 1.0 / count(*), 6)
             AS dup_rate
    FROM clusters
    GROUP BY source
    ORDER BY source
    """,
)
def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation observability: which sources deliver duplicated content —
    per-source doc count, docs that belong to a >1-copy exact-dup
    cluster, and the dup rate. This is the feedback table that drives
    source-level sampling weights in a training mix. One digest-keyed
    window (same shuffle key as dedup_exact_docs — 32-byte hashes, not
    documents) + one hash aggregate."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    n_copies = F.count("*").over(
        Window.partitionBy(F.sha2(F.lower(F.trim("text")), 256))
    )
    clusters = d.select("doc_id", "source", n_copies.alias("n_copies"))
    return (
        clusters.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.count(F.when(F.col("n_copies") > 1, 1)).alias("n_dup_docs"),
            F.round(
                F.count(F.when(F.col("n_copies") > 1, 1)) * 1.0 / F.count("*"), 6
            ).alias("dup_rate"),
        )
        .orderBy("source")
    )


@query(
    "text_split_assign",
    oracle="""
    WITH assigned AS (
      SELECT doc_id, n_chars, lang,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'f6' THEN 'val'
                  ELSE 'test' END AS split
      FROM documents)
    SELECT split, count(*)::BIGINT AS n_docs,
           sum(n_chars)::BIGINT AS total_chars,
           count(DISTINCT lang)::BIGINT AS n_langs
    FROM assigned GROUP BY split ORDER BY split
    """,
)
def text_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split assignment — the canonical
    holdout protocol for a training corpus. The split key is the first
    md5 byte of the doc id (NOT a random() draw: hash-based assignment is
    reproducible across runs, engines, and re-partitioning, and stays
    stable when the corpus grows — the property random sampling lacks).
    Thresholds are hex-lexicographic on the fixed-width digest prefix
    ('e6' ≈ 89.8% train, 'f6' ≈ 6.3% val, rest test), identical strings
    on both engines. Pure map + one 3-group aggregate: zero joins, one
    shuffle carrying 3 partial rows per task at any corpus size."""
    d = load(spark, sf_dir, "documents")
    prefix = F.substring(F.md5(F.encode(F.col("doc_id").cast("string"), "UTF-8")), 1, 2)
    split = (
        F.when(prefix < "e6", "train").when(prefix < "f6", "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "n_chars", "lang")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .orderBy("split")
    )


@query(
    "text_chunk_windows",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
    s AS (
      SELECT doc_id, toks, unnest(range(0, len(toks), 48)) AS start FROM t)
    SELECT doc_id, (start // 48)::INT AS chunk_id,
           least(64, len(toks) - start)::BIGINT AS n_tokens,
           md5(array_to_string(list_slice(toks, start + 1, start + 64), ' ')) AS chunk_digest
    FROM s
    """,
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking for retrieval/training: each document is
    cut into overlapping 64-token windows with stride 48 (16-token
    overlap) — the standard RAG chunker. The chunk fan-out is a per-row
    generator (sequence + explode, no shuffle, no self-join); the chunk
    payload is verified by digest so the result stays narrow however
    wide the windows get. At 100 TB this is a pure map stage that
    pipelines into whatever sink or embedder follows."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), " ")
    chunks = (
        d.select("doc_id", toks.alias("toks"))
        .withColumn("start", F.explode(F.sequence(F.lit(0), F.size("toks") - 1, F.lit(48))))
    )
    return chunks.select(
        "doc_id",
        F.expr("CAST(start DIV 48 AS INT)").alias("chunk_id"),
        F.least(F.lit(64), F.size("toks") - F.col("start")).cast("long").alias("n_tokens"),
        F.md5(
            F.encode(F.array_join(F.slice("toks", F.col("start") + 1, 64), " "), "UTF-8")
        ).alias("chunk_digest"),
    )


@query(
    "text_unigram_logprob",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM documents),
    freq AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
    tot AS (SELECT count(*) * 1.0 AS n FROM tok)
    SELECT t.doc_id, count(*)::BIGINT AS n_tokens,
           round(avg(ln(f.cnt / (SELECT n FROM tot))), 6) AS avg_logprob
    FROM tok t JOIN freq f ON t.token = f.token
    GROUP BY t.doc_id
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model scoring — the cheapest member of the
    model-based quality-filter family (docs with very low mean token
    log-probability are gibberish; very high are boilerplate). The
    corpus LM is the token frequency table itself — and vocabulary grows
    with the corpus, so it rejoins the token stream as a plain shuffle
    equi-join on ``token`` (AQE auto-broadcasts only when actually
    small); the token TOTAL is a 1-row aggregate, the one broadcast that
    is bounded by construction. One explode + two hash aggregates + one
    token-keyed shuffle join."""
    tok = _tokens(spark, sf_dir)
    freq = tok.groupBy("token").agg(F.count("*").alias("cnt"))
    tot = freq.agg(F.sum("cnt").cast("double").alias("n"))
    return (
        tok.join(freq, "token")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg(F.log(F.col("cnt") / F.col("n"))), 6).alias("avg_logprob"),
        )
    )


@query(
    "text_dup_ngram_coverage",
    oracle="""
    WITH t AS (
      SELECT doc_id, source, string_split(lower(text), ' ') AS toks FROM documents),
    grams AS (
      SELECT DISTINCT doc_id, source,
             unnest(list_transform(range(1, len(toks) - 3),
                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
                         toks[i+3] || ' ' || toks[i+4])) AS ngram
      FROM t WHERE len(toks) >= 5),
    df AS (SELECT ngram, count(*) AS n_docs_with FROM grams GROUP BY ngram),
    cov AS (
      SELECT g.doc_id, any_value(g.source) AS source,
             count(CASE WHEN df.n_docs_with > 1 THEN 1 END) * 1.0 / count(*) AS coverage
      FROM grams g JOIN df ON g.ngram = df.ngram
      GROUP BY g.doc_id)
    SELECT source, count(*)::BIGINT AS n_docs,
           round(avg(coverage), 6) AS avg_dup_coverage
    FROM cov GROUP BY source ORDER BY source
    """,
)
def text_dup_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb-style duplicate-ngram coverage audit: per source, the
    mean fraction of each document's distinct 5-gram shingles that also
    occur in at least one other document — the observability metric that
    tells you HOW duplicated a source is, not just whether exact copies
    exist. r4 shape: shingles collapse to 64-bit hashes inside a row-
    local ``array_distinct(transform(...))`` (per-doc dedup costs ZERO
    shuffle — a doc's shingles live in one row), so the only corpus-wide
    exchanges are one window count keyed on the 8-byte shingle hash and
    the per-doc rollup — two long-keyed shuffles where the r3 plan moved
    full shingle strings through four. Hash collisions are negligible
    (same discipline and odds as dedup_ngram_jaccard's token hashing)
    and the construction is still never-broadcast: the shingle table
    grows with the corpus.
    """
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    # Token array materialized ONCE behind a projection boundary —
    # inlining split() into every element_at re-evaluates the full-text
    # split ~5× per shingle position (measured 8× slower at sf0.1).
    base = d.select("doc_id", "source", F.split(F.lower("text"), " ").alias("toks")).filter(
        F.size("toks") >= 5
    )
    grams5 = F.expr(
        "array_distinct(transform(sequence(1, size(toks) - 4),"
        " i -> xxhash64(concat_ws(' ', element_at(toks, i), element_at(toks, i + 1),"
        " element_at(toks, i + 2), element_at(toks, i + 3), element_at(toks, i + 4)))))"
    )
    grams = base.select("doc_id", "source", F.explode(grams5).alias("g"))
    cov = (
        grams.withColumn("n_docs_with", F.count("*").over(Window.partitionBy("g")))
        .groupBy("doc_id")
        .agg(
            F.any_value("source").alias("source"),
            (
                F.count(F.when(F.col("n_docs_with") > 1, 1)) * 1.0 / F.count("*")
            ).alias("coverage"),
        )
    )
    return (
        cov.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("coverage"), 6).alias("avg_dup_coverage"),
        )
        .orderBy("source")
    )


@query(
    "text_quality_buckets",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang, source, n_chars,
             len(string_split(lower(text), ' ')) AS n_tokens
      FROM documents),
    bucketed AS (
      SELECT lang, source, n_chars,
             ntile(4) OVER (PARTITION BY lang ORDER BY n_tokens, doc_id) AS bucket
      FROM scored)
    SELECT lang, bucket, count(*)::BIGINT AS n_docs,
           sum(n_chars)::BIGINT AS total_chars,
           count(DISTINCT source)::BIGINT AS n_sources
    FROM bucketed GROUP BY lang, bucket ORDER BY lang, bucket
    """,
)
def text_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum binning: split each language's documents into length
    quartiles and report the composition of every bucket — the table a
    mixture scheduler samples from when it wants "short-doc en" vs
    "long-doc zh" strata. ntile is PARTITIONED by lang (never a global
    single-partition window) with a pinned (n_tokens, doc_id) total
    order so bucket boundaries are deterministic on both engines."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.lower("text"), " "))
    w = Window.partitionBy("lang").orderBy(n_tokens.asc(), F.col("doc_id").asc())
    bucketed = d.select(
        "lang", "source", "n_chars", F.ntile(4).over(w).alias("bucket")
    )
    return (
        bucketed.groupBy("lang", "bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.countDistinct("source").alias("n_sources"),
        )
        .orderBy("lang", "bucket")
    )


@query(
    "text_gopher_rules",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, n_chars,
             string_split(lower(text), ' ') AS toks,
             len(string_split(lower(text), ' ')) AS n_tokens
      FROM documents),
    m AS (
      SELECT doc_id, n_tokens,
             (n_tokens BETWEEN 20 AND 1000) AS r_len,
             (len(list_filter(toks, x -> list_contains({_STOPWORDS}, x))) >= 1)
               AS r_stop,
             (len(list_filter(toks, x -> len(x) <= 2)) * 5 <= n_tokens * 2)
               AS r_short,
             (n_chars >= 2 * n_tokens AND n_chars < 13 * n_tokens) AS r_tok_len
      FROM t)
    SELECT doc_id, n_tokens,
           CASE WHEN r_len AND r_stop AND r_short AND r_tok_len
                THEN 'keep' ELSE 'drop' END AS verdict,
           concat_ws('|',
             CASE WHEN NOT r_len THEN 'len' END,
             CASE WHEN NOT r_stop THEN 'stop' END,
             CASE WHEN NOT r_short THEN 'short' END,
             CASE WHEN NOT r_tok_len THEN 'tok_len' END) AS reasons
    FROM m
    """,
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style composite quality gate with an AUDIT TRAIL: every
    rule (length band, stopword presence, short-token ratio, mean token
    length band) reports which checks a dropped doc failed, joined as a
    stable '|' string — the explainability layer a curation pipeline
    needs to tune thresholds. All features are integer-exact (the ratio
    threshold is cross-multiplied, never a float divide), so the verdict
    is bit-identical across engines. Pure map stage, zero shuffle."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), " ")
    stop = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop, x)))
    n_short = F.size(F.filter(toks, lambda x: F.length(x) <= 2))
    r_len = n_tokens.between(20, 1000)
    r_stop = n_stop >= 1
    r_short = n_short * 5 <= n_tokens * 2
    # mean-token-length band 2 <= n_chars/n_tokens < 13, cross-multiplied
    # so the comparison stays in exact integer arithmetic on both engines
    r_tok_len = (F.col("n_chars") >= 2 * n_tokens) & (
        F.col("n_chars") < 13 * n_tokens
    )
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.when(r_len & r_stop & r_short & r_tok_len, "keep")
        .otherwise("drop")
        .alias("verdict"),
        F.concat_ws(
            "|",
            F.when(~r_len, "len"),
            F.when(~r_stop, "stop"),
            F.when(~r_short, "short"),
            F.when(~r_tok_len, "tok_len"),
        ).alias("reasons"),
    )


@query(
    "text_keyword_extraction",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM documents),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
    df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.token,
             round(tf.tf * ln(n.n_docs / df.df), 6) AS tfidf
      FROM tf JOIN df ON tf.token = df.token CROSS JOIN n),
    r AS (
      SELECT doc_id, token, tfidf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, token) AS rnk
      FROM scored)
    SELECT doc_id, token, tfidf, rnk::BIGINT AS rnk
    FROM r WHERE rnk <= 3
    """,
)
def text_keyword_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword extraction: the top-3 TF-IDF terms per document — the
    per-doc tag set used for topic routing and index summaries. Same
    plan skeleton as text_tfidf (one corpus shuffle for tf, the
    corpus-growing df table rejoined via a shuffle equi-join on token —
    no forced broadcast), plus one doc-keyed window for the rank. Ranking is on the ROUNDED score with a token
    tie-break on both engines, so top-3 membership never depends on
    last-ulp libm differences."""
    from pyspark.sql import Window

    tok = _tokens(spark, sf_dir)
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dfreq = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = load(spark, sf_dir, "documents").count()  # one scalar, driver-side
    scored = tf.join(dfreq, "token").select(
        "doc_id",
        "token",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("tfidf"),
    )
    rnk = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("token"))
    )
    return (
        scored.withColumn("rnk", rnk.cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "token", "tfidf", "rnk")
    )


@query(
    "text_blocklist_filter",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source,
             md5(lower(trim(text))) AS digest,
             string_split(lower(text), ' ') AS toks,
             len(string_split(lower(text), ' ')) AS n_tokens
      FROM documents),
    blocked AS (
      SELECT DISTINCT digest FROM t
      WHERE NOT (n_tokens BETWEEN 20 AND 1000
                 AND len(list_filter(toks, x -> list_contains({_STOPWORDS}, x))) >= 1))
    SELECT t.source, count(*)::BIGINT AS n_kept
    FROM t
    WHERE t.digest NOT IN (SELECT digest FROM blocked)
    GROUP BY t.source ORDER BY t.source
    """,
)
def text_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deny-list filtering — the moderation step every training corpus
    runs: a bounded blocklist of content DIGESTS (here derived from the
    quality gate; in production, known-bad hashes) is broadcast and the
    corpus is swept with a broadcast LEFT ANTI join on the digest. The
    blocklist is digests, not documents — a few MB for millions of
    entries — so the anti join is map-side at any corpus size; content
    matching is by normalized hash, which also catches exact copies of
    a blocked document under different ids."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), " ")
    stop = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop, x)))
    scored = d.select(
        "doc_id",
        "source",
        F.md5(F.lower(F.trim("text"))).alias("digest"),
        (n_tokens.between(20, 1000) & (n_stop >= 1)).alias("ok"),
    )
    blocked = scored.filter(~F.col("ok")).select("digest").distinct()
    return (
        scored.join(F.broadcast(blocked), "digest", "left_anti")
        .groupBy("source")
        .agg(F.count("*").alias("n_kept"))
        .orderBy("source")
    )


@query(
    "text_sentence_split",
    oracle=r"""
    WITH sent AS (
      SELECT doc_id, trim(unnest(regexp_split_to_array(text, '[.!?]+'))) AS s
      FROM documents)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_sentences,
           round(avg(length(s)), 4) AS avg_sentence_chars,
           CAST(max(length(s)) AS BIGINT) AS max_sentence_chars
    FROM sent WHERE length(s) > 0
    GROUP BY doc_id ORDER BY doc_id
    """,
)
def text_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation stats per document — the pre-chunking pass a
    RAG/packing pipeline runs before deciding split points. Terminal
    punctuation ([.!?]+) splits map-side (explode is pipelined, never
    materialized), empty fragments from trailing punctuation are dropped,
    and ONE hash aggregate keyed on doc_id computes count/avg/max sentence
    length. Both engines split with the same regex class and measure
    trimmed character lengths, so the stats hash-match exactly."""
    d = load(spark, sf_dir, "documents")
    sent = d.select(
        "doc_id", F.explode(F.split("text", r"[.!?]+")).alias("s")
    ).select("doc_id", F.trim("s").alias("s")).filter(F.length("s") > 0)
    return (
        sent.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_sentences"),
            F.round(F.avg(F.length("s")), 4).alias("avg_sentence_chars"),
            F.max(F.length("s")).cast("long").alias("max_sentence_chars"),
        )
        .orderBy("doc_id")
    )


# GPT-2-style pretokenizer classes: letter runs, digit runs, and
# punctuation runs; whitespace is the implicit separator. The same RE2-
# compatible pattern text compiles identically under Java regex (Spark)
# and RE2 (DuckDB) — plain character classes only, no lookaround.
_PRETOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


@query(
    "text_bpe_pretokenize",
    oracle=rf"""
    WITH tok AS (
      SELECT lower(unnest(regexp_extract_all(text, '{_PRETOKEN_RE}'))) AS pretoken
      FROM documents)
    SELECT pretoken, count(*) AS cnt
    FROM tok GROUP BY pretoken
    ORDER BY cnt DESC, pretoken LIMIT 100
    """,
)
def text_bpe_pretokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style pretokenization census: split text into letter / digit /
    punctuation runs (the pre-merge alphabet every BPE/WordPiece trainer
    starts from) and count the top-100 pretokens. regexp_extract_all runs
    map-side inside codegen, explode pipelines into a partial+final hash
    aggregate, and the top-100 is a TakeOrdered — no full sort. This is
    the vocabulary-frequency pass of a tokenizer-training job, expressed
    as one scan + one aggregate."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(
            F.regexp_extract_all("text", F.lit(_PRETOKEN_RE), 0)
        ).alias("pretoken")
    ).select(F.lower("pretoken").alias("pretoken"))
    return (
        toks.groupBy("pretoken")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "pretoken")
        .limit(100)
    )


@query(
    "text_zipf_slope",
    oracle="""
    WITH freq AS (
      SELECT token, count(*) AS cnt
      FROM (SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents) t
      WHERE token <> ''
      GROUP BY token),
    ranked AS (
      SELECT cnt, row_number() OVER (ORDER BY cnt DESC, token) AS rnk
      FROM freq)
    SELECT CAST(count(*) AS BIGINT) AS n_terms,
           round(regr_slope(ln(cnt), ln(rnk)), 4) AS zipf_slope,
           round(regr_r2(ln(cnt), ln(rnk)), 4) AS r2
    FROM ranked WHERE rnk <= 500
    """,
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: OLS slope of log(freq)
    vs log(rank) for the top-500 terms — a one-number language-health
    check (natural text sits near −1; boilerplate or spam skews it).
    The frequency table is a hash aggregate; ranking the top 500 is a
    TakeOrdered-sized cut (the window runs over ≤500 survivors after a
    limit, not the full vocabulary); the regression is Spark's built-in
    regr_slope/regr_r2 — partial+final, single reduce row out."""
    from pyspark.sql import Window

    freq = (
        _tokens(spark, sf_dir)
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    top = freq.orderBy(F.desc("cnt"), "token").limit(500)
    ranked = top.withColumn(
        "rnk", F.row_number().over(Window.orderBy(F.desc("cnt"), "token"))
    )
    return ranked.agg(
        F.count("*").cast("long").alias("n_terms"),
        F.round(F.regr_slope(F.log("cnt"), F.log("rnk")), 4).alias("zipf_slope"),
        F.round(F.regr_r2(F.log("cnt"), F.log("rnk")), 4).alias("r2"),
    )


@query(
    "text_doc_cooccurrence",
    oracle="""
    WITH tok AS (
      SELECT DISTINCT doc_id, token
      FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
            FROM documents) t
      WHERE token <> ''),
    vocab AS (
      SELECT token, count(*) AS df FROM tok GROUP BY token
      ORDER BY df DESC, token LIMIT 50),
    dt AS (
      SELECT t.doc_id, t.token, v.df
      FROM tok t JOIN vocab v ON t.token = v.token),
    n AS (SELECT count(*) AS n_docs FROM documents),
    pairs AS (
      SELECT a.token AS tok_a, b.token AS tok_b,
             a.df AS df_a, b.df AS df_b, count(*) AS pair_docs
      FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.token < b.token
      GROUP BY 1, 2, 3, 4)
    SELECT tok_a, tok_b, CAST(pair_docs AS BIGINT) AS pair_docs,
           round(ln(CAST(pair_docs AS DOUBLE) * n_docs / (df_a * df_b)), 6)
             AS pmi
    FROM pairs, n
    ORDER BY pmi DESC, tok_a, tok_b
    LIMIT 100
    """,
)
def text_doc_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise-mutual-information over top-vocab term pairs — the
    collocation / topic-signal pass of corpus analysis. The vocabulary is
    CAPPED (top-50 by document frequency), so the pair space is a fixed
    ≤1225 keys regardless of corpus size: the per-doc self-join fans out
    at most vocab² rows per document and aggregates onto the bounded key
    set with map-side combine. The vocab table broadcasts (bounded
    constant); the only big shuffles are the two hash aggregates keyed on
    token and doc_id. The corpus size joins in as a broadcast 1-row
    aggregate — no collect. PMI is ordered by its ROUNDED value with the
    pair as tie-break, so libm-vs-Java last-ulp log noise can't reorder
    the cut."""
    d = load(spark, sf_dir, "documents")
    tok = (
        d.select(
            "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("token")
        )
        .filter(F.col("token") != "")
        .distinct()
    )
    vocab = (
        tok.groupBy("token")
        .agg(F.count("*").alias("df"))
        .orderBy(F.desc("df"), "token")
        .limit(50)
    )
    dt = tok.join(F.broadcast(vocab), "token").select("doc_id", "token", "df")
    n = d.agg(F.count("*").alias("n_docs"))
    a = dt.alias("a")
    b = dt.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.token") < F.col("b.token")),
        )
        .groupBy(
            F.col("a.token").alias("tok_a"),
            F.col("b.token").alias("tok_b"),
            F.col("a.df").alias("df_a"),
            F.col("b.df").alias("df_b"),
        )
        .agg(F.count("*").alias("pair_docs"))
    )
    return (
        pairs.crossJoin(F.broadcast(n))
        .select(
            "tok_a",
            "tok_b",
            F.col("pair_docs").cast("long").alias("pair_docs"),
            F.round(
                F.log(
                    F.col("pair_docs").cast("double")
                    * F.col("n_docs")
                    / (F.col("df_a") * F.col("df_b"))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "tok_a", "tok_b")
        .limit(100)
    )


# Markup-stripping rules, applied in order. Plain ERE — compiles
# identically under Java regex (Spark) and RE2 (DuckDB): no lookaround,
# no backreferences.
_STRIP_RULES = [
    (r"<[^>]*>", " "),          # tags
    (r"&[a-zA-Z]+;", " "),      # named entities
    (r"&#[0-9]+;", " "),        # numeric entities
    (r"\s+", " "),              # collapse runs
]


@query(
    "text_html_strip",
    oracle=r"""
    SELECT doc_id,
           length(text) AS raw_chars,
           length(cleaned) AS clean_chars,
           md5(cleaned) AS clean_digest
    FROM (
      SELECT doc_id, text,
             trim(regexp_replace(regexp_replace(regexp_replace(
               regexp_replace(text, '<[^>]*>', ' ', 'g'),
               '&[a-zA-Z]+;', ' ', 'g'),
               '&#[0-9]+;', ' ', 'g'),
               '\s+', ' ', 'g')) AS cleaned
      FROM documents) t
    ORDER BY doc_id
    """,
)
def text_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markup removal — the first cleaning pass of every web-scrape
    pretraining pipeline: drop tags and HTML entities, collapse
    whitespace, and emit before/after char counts plus a digest of the
    cleaned text (the digest is what downstream exact-dedup keys on, so
    it must be bit-stable across engines). A chain of regexp_replace
    calls runs row-local inside codegen — zero shuffle except the final
    presentation sort; the rule list is ERE-portable by construction
    (no lookaround), so both engines rewrite identically."""
    cleaned = F.col("text")
    for pat, rep in _STRIP_RULES:
        cleaned = F.regexp_replace(cleaned, pat, rep)
    cleaned = F.trim(cleaned)
    return (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.length("text").alias("raw_chars"),
            F.length(cleaned).alias("clean_chars"),
            F.md5(cleaned).alias("clean_digest"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_readability_score",
    oracle="""
    SELECT doc_id, n_words, n_sentences, n_syllables,
           round(206.835
                 - 1.015 * (CAST(n_words AS DOUBLE)
                            / greatest(n_sentences, 1))
                 - 84.6 * (CAST(n_syllables AS DOUBLE)
                           / greatest(n_words, 1)), 4) AS flesch
    FROM (
      SELECT doc_id,
             CAST(length(list_filter(string_split(text, ' '), x -> x <> ''))
                  AS BIGINT) AS n_words,
             CAST(length(regexp_extract_all(text, '[.!?]+')) AS BIGINT)
               AS n_sentences,
             CAST(length(regexp_extract_all(lower(text), '[aeiou]+'))
                  AS BIGINT) AS n_syllables
      FROM documents) t
    ORDER BY doc_id
    """,
)
def text_readability_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document, with the standard corpus-scale
    proxies: words = non-empty space tokens, sentences = terminal-
    punctuation runs, syllables = vowel groups (the classic cheap
    approximation — no dictionary, fully deterministic). All three
    counters are row-local regexp/array expressions in codegen: the
    whole score is a zero-shuffle map, which is what lets a quality
    gate apply it to every document of a 100 TB crawl as a scan-time
    filter. greatest(·,1) guards the degenerate empty-doc divisions
    identically on both engines."""
    toks = F.split("text", " ")
    n_words = F.size(F.filter(toks, lambda x: x != "")).cast("long")
    n_sentences = F.size(
        F.regexp_extract_all("text", F.lit(r"[.!?]+"), 0)
    ).cast("long")
    n_syllables = F.size(
        F.regexp_extract_all(F.lower("text"), F.lit(r"[aeiou]+"), 0)
    ).cast("long")
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        n_words.alias("n_words"),
        n_sentences.alias("n_sentences"),
        n_syllables.alias("n_syllables"),
    )
    flesch = (
        F.lit(206.835)
        - F.lit(1.015)
        * (F.col("n_words").cast("double") / F.greatest("n_sentences", F.lit(1)))
        - F.lit(84.6)
        * (F.col("n_syllables").cast("double") / F.greatest("n_words", F.lit(1)))
    )
    return d.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.round(flesch, 4).alias("flesch"),
    ).orderBy("doc_id")


@query(
    "text_bigram_perplexity",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
    big AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(toks)), i -> toks[i])) AS w1,
             unnest(list_transform(range(1, len(toks)), i -> toks[i+1])) AS w2
      FROM t WHERE len(toks) >= 2),
    bf AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY w1, w2),
    uf AS (SELECT w1, count(*) AS c1 FROM big GROUP BY w1)
    SELECT b.doc_id, count(*) AS n_bigrams,
           round(avg(ln(bf.c12 * 1.0 / uf.c1)), 6) AS avg_logprob,
           round(exp(-round(avg(ln(bf.c12 * 1.0 / uf.c1)), 6)), 4) AS ppl
    FROM big b
    JOIN bf ON b.w1 = bf.w1 AND b.w2 = bf.w2
    JOIN uf ON b.w1 = uf.w1
    GROUP BY b.doc_id
    ORDER BY b.doc_id
    """,
)
def text_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model perplexity per document — the CCNet-style
    quality filter one step up from `text_unigram_logprob`: conditioning
    on the previous token separates fluent text from scrambled word soup
    that unigram frequencies alone score identically. The corpus LM is
    MLE over its own bigrams, P(w₂|w₁) = C(w₁,w₂)/C(w₁) with the
    denominator counted over bigram CONTEXTS (so the conditional sums to
    1 and every scored bigram is observed — no smoothing needed when
    scoring the training corpus itself). Both model tables are
    corpus-derived and therefore rejoin the bigram stream as plain
    shuffle equi-joins on (w₁,w₂) and w₁ — never broadcast (the r3
    vocabulary-broadcast lesson; AQE still broadcasts when genuinely
    small). The token array is materialized behind a projection boundary
    so split() runs once per row, and perplexity is exp(−avg) computed
    from the ROUNDED mean both sides so the monotone transform cannot
    amplify a last-ulp disagreement."""
    base = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.split(F.lower("text"), " ").alias("toks"))
        .filter(F.size("toks") >= 2)
    )
    big = base.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> struct(element_at(toks, i) AS w1,"
                "             element_at(toks, i + 1) AS w2))"
            )
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    bf = big.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    uf = big.groupBy("w1").agg(F.count("*").alias("c1"))
    avg_lp = F.round(
        F.avg(F.log(F.col("c12") * 1.0 / F.col("c1"))), 6
    )
    return (
        big.join(bf, ["w1", "w2"])
        .join(uf, "w1")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            avg_lp.alias("avg_logprob"),
            F.round(F.exp(-avg_lp), 4).alias("ppl"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_js_divergence",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split(lower(text), ' ')) AS token
      FROM documents),
    st AS (SELECT source, token, count(*) AS sc FROM tok GROUP BY source, token),
    ct AS (SELECT token, count(*) AS cc FROM tok GROUP BY token),
    stot AS (SELECT source, sum(sc) AS sn FROM st GROUP BY source),
    ctot AS (SELECT sum(cc) AS cn FROM ct),
    grid AS (
      SELECT s.source, c.token, c.cc FROM ct c
      CROSS JOIN (SELECT DISTINCT source FROM documents) s),
    terms AS (
      SELECT g.source,
             COALESCE(st.sc, 0) * 1.0 / stot.sn AS ps,
             g.cc * 1.0 / ctot.cn AS pc
      FROM grid g
      LEFT JOIN st ON st.source = g.source AND st.token = g.token
      JOIN stot ON stot.source = g.source
      CROSS JOIN ctot)
    SELECT source,
           round(sum(
             CASE WHEN ps > 0
                  THEN 0.5 * ps * ln(ps / ((ps + pc) / 2)) ELSE 0.0 END
             + 0.5 * pc * ln(pc / ((ps + pc) / 2))), 6) AS jsd
    FROM terms GROUP BY source ORDER BY source
    """,
)
def text_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen–Shannon divergence between each source's token
    distribution and the whole-corpus distribution — the drift metric
    that flags a crawl slice whose vocabulary stopped looking like the
    mixture it feeds. Token counting is partial+final hash aggregation;
    the corpus-vocabulary table is fanned out per source via a cross
    join against the (bounded, handful-of-rows) source list and the
    per-source counts come back through a plain shuffle equi-join on
    (source, token) — the vocabulary is NEVER broadcast (the r3
    lesson). Natural log pinned on both engines; zero-support tokens
    contribute only their corpus half, exactly as the formula demands."""
    tok = load(spark, sf_dir, "documents").select(
        "source", F.explode(F.split(F.lower("text"), " ")).alias("token")
    )
    st = tok.groupBy("source", "token").agg(F.count("*").alias("sc"))
    ct = tok.groupBy("token").agg(F.count("*").alias("cc"))
    stot = st.groupBy("source").agg(F.sum("sc").alias("sn"))
    cn = float(ct.agg(F.sum("cc")).first()[0])  # one scalar, driver-side
    sources = load(spark, sf_dir, "documents").select("source").distinct()
    grid = ct.crossJoin(F.broadcast(sources))
    terms = (
        grid.join(st, ["source", "token"], "left")
        .join(F.broadcast(stot), "source")
        .select(
            "source",
            (F.coalesce("sc", F.lit(0)) * 1.0 / F.col("sn")).alias("ps"),
            (F.col("cc") * 1.0 / F.lit(cn)).alias("pc"),
        )
    )
    ps, pc = F.col("ps"), F.col("pc")
    m = (ps + pc) / 2
    return (
        terms.select(
            "source",
            (
                F.when(ps > 0, F.lit(0.5) * ps * F.log(ps / m)).otherwise(0.0)
                + F.lit(0.5) * pc * F.log(pc / m)
            ).alias("term"),
        )
        .groupBy("source")
        .agg(F.round(F.sum("term"), 6).alias("jsd"))
        .orderBy("source")
    )


@query(
    "text_vocab_growth",
    oracle="""
    WITH mx AS (SELECT max(doc_id) AS mid FROM documents),
    tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
      FROM documents),
    firsts AS (SELECT token, min(doc_id) AS fd FROM tok GROUP BY token),
    bydec AS (
      SELECT (f.fd * 10) // (mx.mid + 1) AS decile, count(*) AS new_tokens
      FROM firsts f, mx GROUP BY 1),
    spine AS (SELECT unnest(range(0, 10)) AS decile)
    SELECT CAST(s.decile AS BIGINT) AS decile,
           CAST(COALESCE(b.new_tokens, 0) AS BIGINT) AS new_tokens,
           CAST(sum(COALESCE(b.new_tokens, 0)) OVER (
             ORDER BY s.decile
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_vocab
    FROM spine s LEFT JOIN bydec b ON b.decile = s.decile
    ORDER BY decile
    """,
)
def text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth curve: distinct tokens accumulated
    after each tenth of the corpus (by doc_id order) — the saturation
    diagnostic that says whether more crawl still buys new vocabulary.
    An expanding COUNT(DISTINCT) re-scans every prefix, so the scalable
    identity is first-seen attribution (each token counts once, at its
    min doc_id) — the same trick as ``win_cumulative_users``. One hash
    aggregate over tokens, a 1-row max broadcast for the decile bound,
    and the cumulative window runs over exactly ten rows. Decile
    assignment is exact integer arithmetic (fd·10 // (max+1))."""
    d = load(spark, sf_dir, "documents")
    mid = d.agg(F.max("doc_id").alias("mid"))
    tok = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("token")
    )
    firsts = tok.groupBy("token").agg(F.min("doc_id").alias("fd"))
    bydec = (
        firsts.crossJoin(F.broadcast(mid))
        .select(F.expr("(fd * 10) div (mid + 1)").alias("decile"))
        .groupBy("decile")
        .agg(F.count("*").alias("new_tokens"))
    )
    spine = spark.range(0, 10).select(F.col("id").alias("decile"))
    w = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        spine.join(bydec, "decile", "left")
        .select(
            F.col("decile").cast("long").alias("decile"),
            F.coalesce("new_tokens", F.lit(0)).cast("long").alias("new_tokens"),
        )
        .withColumn("cum_vocab", F.sum("new_tokens").over(w).cast("long"))
        .orderBy("decile")
    )


@query(
    "text_mix_rebalance",
    oracle="""
    WITH tok AS (
      SELECT lang, count(*) AS n_tokens
      FROM (SELECT lang, unnest(string_split(lower(text), ' ')) AS token
            FROM documents) t
      GROUP BY lang),
    d AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
    m AS (SELECT min(n_tokens) AS mn FROM tok)
    SELECT t.lang, CAST(d.n_docs AS BIGINT) AS n_docs,
           CAST(t.n_tokens AS BIGINT) AS n_tokens,
           round(m.mn * 1.0 / t.n_tokens, 6) AS sample_weight,
           CAST(m.mn AS BIGINT) AS target_tokens
    FROM tok t JOIN d ON t.lang = d.lang CROSS JOIN m
    ORDER BY t.lang
    """,
)
def text_mix_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture rebalancing weights: the per-language sampling
    rate that equalises TOKEN budgets across languages (downsample every
    language to the smallest — the low-resource-language fairness
    baseline). Two hash aggregates (per-lang token and doc counts) do
    all corpus-sized work; the 1-row minimum broadcasts. The weight is a
    ratio of exact int64 token counts, so the only float is the final
    rounded divide — a downstream sampler applies it with the same
    deterministic key-arithmetic as ``sample_stratified``."""
    d = load(spark, sf_dir, "documents")
    tok = (
        d.select("lang", F.explode(F.split(F.lower("text"), " ")).alias("token"))
        .groupBy("lang")
        .agg(F.count("*").alias("n_tokens"))
    )
    docs = d.groupBy("lang").agg(F.count("*").alias("n_docs"))
    mn = tok.agg(F.min("n_tokens").alias("mn"))
    return (
        tok.join(docs, "lang")
        .crossJoin(F.broadcast(mn))
        .select(
            "lang",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.round(F.col("mn") * 1.0 / F.col("n_tokens"), 6).alias(
                "sample_weight"
            ),
            F.col("mn").cast("long").alias("target_tokens"),
        )
        .orderBy("lang")
    )


@query(
    "text_ngram_novelty",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
    grams AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(toks) - 1),
                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
               AS ngram
      FROM t WHERE len(toks) >= 3),
    f AS (SELECT ngram, min(doc_id) AS fd FROM grams GROUP BY ngram)
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(count(CASE WHEN f.fd = g.doc_id THEN 1 END) AS BIGINT)
             AS n_novel,
           round(count(CASE WHEN f.fd = g.doc_id THEN 1 END) * 1.0
                 / count(*), 6) AS novelty
    FROM grams g JOIN f ON g.ngram = f.ngram
    GROUP BY g.doc_id ORDER BY g.doc_id
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 3-gram novelty: the fraction of a doc's distinct
    shingles whose FIRST corpus occurrence (min doc_id) is that doc —
    the freshness/contamination signal that separates new contributions
    from recombinations of already-crawled text. Shingles collapse to
    64-bit hashes inside a row-local ``array_distinct(transform(...))``
    (zero-shuffle per-doc dedup, the ``text_dup_ngram_coverage``
    discipline); first-seen attribution is ONE min-window keyed on the
    8-byte hash, so the corpus never joins against itself and nothing
    vocabulary-sized is broadcast."""
    d = load(spark, sf_dir, "documents")
    base = d.select(
        "doc_id", F.split(F.lower("text"), " ").alias("toks")
    ).filter(F.size("toks") >= 3)
    grams3 = F.expr(
        "array_distinct(transform(sequence(1, size(toks) - 2),"
        " i -> xxhash64(concat_ws(' ', element_at(toks, i),"
        " element_at(toks, i + 1), element_at(toks, i + 2)))))"
    )
    grams = base.select("doc_id", F.explode(grams3).alias("g"))
    novel = F.when(
        F.col("doc_id") == F.min("doc_id").over(Window.partitionBy("g")), 1
    )
    return (
        grams.withColumn("is_novel", novel)
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.count("is_novel").cast("long").alias("n_novel"),
            F.round(F.count("is_novel") * 1.0 / F.count("*"), 6).alias("novelty"),
        )
        .orderBy("doc_id")
    )


@query(
    "dedup_source_matrix",
    oracle="""
    WITH g AS (
      SELECT sha256(substr(lower(trim(text)), 1, 60)) AS h, source,
             count(*) AS n
      FROM documents GROUP BY 1, 2),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b,
             sum(CASE WHEN a.source = b.source
                      THEN a.n * (a.n - 1) // 2
                      ELSE a.n * b.n END) AS n_pairs
      FROM g a JOIN g b
        ON a.h = b.h AND a.source <= b.source
      WHERE a.source < b.source OR a.source = b.source
      GROUP BY a.source, b.source)
    SELECT source_a, source_b, CAST(n_pairs AS BIGINT) AS n_pairs
    FROM pairs WHERE n_pairs > 0
    ORDER BY source_a, source_b
    """,
)
def dedup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix: for every pair of sources, how
    many near-duplicate DOCUMENT pairs they share (60-char normalized
    prefix digest — the ``dedup_keep_best`` cluster key) — the overlap audit
    that says which crawls re-collected the same pages. Never expands
    pairs row-by-row: per (digest, source) counts collapse first (one
    hash aggregate on the 32-byte digest), then pair counts come from
    the closed forms n·(n−1)/2 within a source and nₐ·n_b across — a
    digest-keyed equi-join of two tiny-per-key count tables, arithmetic
    instead of explosion, so a million-copy document costs one multiply, not
    10⁸ rows. Output is bounded by |sources|²."""
    g = (
        load(spark, sf_dir, "documents")
        .groupBy(
            F.sha2(F.substring(F.lower(F.trim("text")), 1, 60), 256).alias("h"),
            "source",
        )
        .agg(F.count("*").alias("n"))
    )
    a = g.select(F.col("h"), F.col("source").alias("source_a"), F.col("n").alias("na"))
    b = g.select(F.col("h"), F.col("source").alias("source_b"), F.col("n").alias("nb"))
    pairs = (
        a.join(b, "h")
        .filter(F.col("source_a") <= F.col("source_b"))
        .select(
            "source_a",
            "source_b",
            F.when(
                F.col("source_a") == F.col("source_b"),
                F.expr("na * (na - 1) div 2"),
            )
            .otherwise(F.col("na") * F.col("nb"))
            .alias("pc"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.sum("pc").alias("n_pairs"))
        .filter(F.col("n_pairs") > 0)
    )
    return pairs.select(
        "source_a", "source_b", F.col("n_pairs").cast("long").alias("n_pairs")
    ).orderBy("source_a", "source_b")


@query(
    "text_casing_profile",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS t FROM documents),
    c AS (
      SELECT source,
             count(*) AS n_tokens,
             sum(CASE WHEN t <> '' AND t = upper(t) AND t <> lower(t)
                      THEN 1 ELSE 0 END) AS n_allcaps,
             sum(CASE WHEN length(t) >= 2
                       AND substr(t, 1, 1) = upper(substr(t, 1, 1))
                       AND substr(t, 1, 1) <> lower(substr(t, 1, 1))
                       AND substr(t, 2) = lower(substr(t, 2))
                      THEN 1 ELSE 0 END) AS n_title,
             sum(CASE WHEN t = lower(t) THEN 1 ELSE 0 END) AS n_lower
      FROM tok GROUP BY source)
    SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
           round(n_allcaps * 1.0 / n_tokens, 6) AS allcaps_ratio,
           round(n_title * 1.0 / n_tokens, 6) AS title_ratio,
           round(n_lower * 1.0 / n_tokens, 6) AS lower_ratio
    FROM c ORDER BY source
    """,
)
def text_casing_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source casing mix: ALLCAPS / TitleCase / lowercase token
    ratios — the shoutiness signal that separates forum rant crawls from
    edited prose (a standard quality-filter feature alongside
    ``text_quality_score``'s length/punct ratios). Case tests are pure
    string comparisons (t = upper(t) etc. — no Unicode tables beyond
    what both engines share on ASCII-dominated corpora), in ONE
    conditional hash aggregate; ratios are exact-int64 count divides."""
    tok = load(spark, sf_dir, "documents").select(
        "source", F.explode(F.split("text", " ")).alias("t")
    )
    t = F.col("t")
    first = F.substring("t", 1, 1)
    rest = F.expr("substr(t, 2)")
    is_caps = (t != "") & (t == F.upper(t)) & (t != F.lower(t))
    is_title = (
        (F.length(t) >= 2)
        & (first == F.upper(first))
        & (first != F.lower(first))
        & (rest == F.lower(rest))
    )
    is_lower = t == F.lower(t)
    c = tok.groupBy("source").agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.when(is_caps, 1).otherwise(0)).alias("n_allcaps"),
        F.sum(F.when(is_title, 1).otherwise(0)).alias("n_title"),
        F.sum(F.when(is_lower, 1).otherwise(0)).alias("n_lower"),
    )
    return c.select(
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(F.col("n_allcaps") * 1.0 / F.col("n_tokens"), 6).alias(
            "allcaps_ratio"
        ),
        F.round(F.col("n_title") * 1.0 / F.col("n_tokens"), 6).alias(
            "title_ratio"
        ),
        F.round(F.col("n_lower") * 1.0 / F.col("n_tokens"), 6).alias(
            "lower_ratio"
        ),
    ).orderBy("source")


@query(
    "text_hapax_ratio",
    oracle="""
    WITH tok AS (
      SELECT lang, unnest(string_split(lower(text), ' ')) AS token
      FROM documents),
    tc AS (SELECT lang, token, count(*) AS c FROM tok GROUP BY lang, token)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS vocab,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
           round(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
             AS hapax_ratio
    FROM tc GROUP BY lang ORDER BY lang
    """,
)
def text_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax legomena ratio per language: the share of the vocabulary
    occurring exactly once — the lexical-richness / OCR-noise indicator
    (clean prose ≈ 0.4–0.6; shattered encodings push it toward 1). Two
    stacked hash aggregates — (lang, token) counts, then a per-lang
    conditional rollup — both partial+final map-side combinable; the
    vocabulary table is grouped, never broadcast or collected."""
    tok = load(spark, sf_dir, "documents").select(
        "lang", F.explode(F.split(F.lower("text"), " ")).alias("token")
    )
    tc = tok.groupBy("lang", "token").agg(F.count("*").alias("c"))
    return (
        tc.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("vocab"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
            .cast("long")
            .alias("hapax"),
            F.round(
                F.sum(F.when(F.col("c") == 1, 1).otherwise(0)) * 1.0
                / F.count("*"),
                6,
            ).alias("hapax_ratio"),
        )
        .orderBy("lang")
    )


@query(
    "text_tfidf_pairs",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
      FROM documents),
    tf AS (SELECT doc_id, token, count(*) AS tf
           FROM tok GROUP BY doc_id, token),
    dfq AS (SELECT token, count(DISTINCT doc_id) AS df
            FROM tok GROUP BY token),
    n AS (SELECT count(*) AS n_docs FROM documents),
    tfq AS (
      SELECT tf.doc_id, tf.token,
             CAST(round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfq.df)
                        * 1000) AS BIGINT) AS q
      FROM tf JOIN dfq ON dfq.token = tf.token CROSS JOIN n),
    norms AS (SELECT doc_id, sum(q * q) AS nrm FROM tfq GROUP BY doc_id),
    sig0 AS (
      SELECT token, doc_id FROM (
        SELECT token, doc_id,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY q DESC, token) AS rn
        FROM tfq) s WHERE rn <= 3),
    pop AS (SELECT token, count(*) AS c FROM sig0 GROUP BY token),
    sig AS (
      SELECT s.token, s.doc_id FROM sig0 s
      JOIN pop p ON p.token = s.token WHERE p.c <= 256),
    cand AS (
      SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
      FROM sig a JOIN sig b
        ON a.token = b.token AND a.doc_id < b.doc_id),
    dots AS (
      SELECT c.da, c.db, sum(ta.q * tb.q) AS dot,
             count(*) AS n_shared
      FROM cand c
      JOIN tfq ta ON ta.doc_id = c.da
      JOIN tfq tb ON tb.doc_id = c.db AND tb.token = ta.token
      GROUP BY c.da, c.db)
    SELECT d.da AS doc_a, d.db AS doc_b,
           CAST(d.n_shared AS BIGINT) AS n_shared,
           round(CAST(d.dot AS DOUBLE)
                 / (sqrt(CAST(na.nrm AS DOUBLE))
                    * sqrt(CAST(nb.nrm AS DOUBLE))), 6) AS cos_tfidf
    FROM dots d
    JOIN norms na ON na.doc_id = d.da
    JOIN norms nb ON nb.doc_id = d.db
    WHERE na.nrm > 0 AND nb.nrm > 0
    ORDER BY CAST(d.dot AS DOUBLE)
             / (sqrt(CAST(na.nrm AS DOUBLE))
                * sqrt(CAST(nb.nrm AS DOUBLE))) DESC, doc_a, doc_b
    LIMIT 20
    """,
)
def text_tfidf_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-IDF cosine similarity — the lexical complement of the
    dense-embedding `sim_*` family: top-20 most-similar document pairs
    under the bag-of-words model. Candidate generation is SIGNATURE
    BLOCKING WITH BLOCK PURGING (each doc contributes its 3
    highest-TF-IDF tokens; pairs must share a signature token; tokens
    whose signature block exceeds 256 docs are purged from pairing —
    the record-linkage guard that caps the worst block at 256²/2 pairs
    at ANY corpus size, without which one hot signature token pairs
    quadratically), and the exact dot product then runs ONLY over
    candidates via two composite-key equi-joins. Weights are QUANTIZED
    to int64 (round(tf·idf·1000)) so dots and norms aggregate exact
    integers in any order — the ranking needs no rounding tolerance;
    the cosine divides exact ints once per candidate. All joins are
    shuffle-hashable equi-joins."""
    tok = _tokens(spark, sf_dir).select("doc_id", "token")
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dfq = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = load(spark, sf_dir, "documents").count()
    tfq = tf.join(dfq, "token").select(
        "doc_id",
        "token",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")) * 1000
        )
        .cast("long")
        .alias("q"),
    )
    norms = tfq.groupBy("doc_id").agg(F.sum(F.col("q") * F.col("q")).alias("nrm"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("q"), "token")
    sig0 = (
        tfq.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("token", "doc_id")
    )
    # BLOCK PURGING (the record-linkage guard): a signature token whose
    # block exceeds 256 docs is dropped from pairing — without the cap a
    # single hot signature token pairs quadratically (measured: one
    # token signed 826 docs at sf0.1 → 4M candidates, 28 s; capped the
    # worst block costs ≤ 256²/2 pairs at ANY corpus size)
    pop = sig0.groupBy("token").agg(F.count("*").alias("c"))
    sig = (
        sig0.join(pop, "token")
        .filter(F.col("c") <= 256)
        .select("token", "doc_id")
    )
    a = sig.alias("a")
    b = sig.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .distinct()
    )
    ta = tfq.select(
        F.col("doc_id").alias("da"), "token", F.col("q").alias("qa")
    )
    tb = tfq.select(
        F.col("doc_id").alias("db"), "token", F.col("q").alias("qb")
    )
    dots = (
        cand.join(ta, "da")
        .join(tb, ["db", "token"])
        .groupBy("da", "db")
        .agg(
            F.sum(F.col("qa") * F.col("qb")).alias("dot"),
            F.count("*").alias("n_shared"),
        )
    )
    na = norms.select(F.col("doc_id").alias("da"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("doc_id").alias("db"), F.col("nrm").alias("nb"))
    cos = F.col("dot").cast("double") / (
        F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))
    )
    return (
        dots.join(na, "da")
        .join(nb, "db")
        .filter((F.col("na") > 0) & (F.col("nb") > 0))
        .orderBy(cos.desc(), "da", "db")
        .limit(20)
        .select(
            F.col("da").alias("doc_a"),
            F.col("db").alias("doc_b"),
            F.col("n_shared").cast("long").alias("n_shared"),
            F.round(cos, 6).alias("cos_tfidf"),
        )
    )


@query(
    "text_lang_logprob_audit",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS token
      FROM documents),
    doc_tf AS (
      SELECT doc_id, any_value(lang) AS labeled_lang, token,
             count(*) AS tf
      FROM tok GROUP BY doc_id, token),
    model AS (
      SELECT lang, token, count(*) AS c FROM tok GROUP BY lang, token),
    tot AS (SELECT lang, sum(c) AS t FROM model GROUP BY lang),
    vocab AS (SELECT count(DISTINCT token) AS v FROM tok),
    langs AS (SELECT DISTINCT lang FROM documents),
    q AS (
      SELECT m.lang, m.token,
             CAST(round(ln((m.c + 1.0) / (tt.t + vv.v)) * 1e6) AS BIGINT)
               AS q
      FROM model m JOIN tot tt ON tt.lang = m.lang CROSS JOIN vocab vv),
    q0 AS (
      SELECT tt.lang,
             CAST(round(ln(1.0 / (tt.t + vv.v)) * 1e6) AS BIGINT) AS q0
      FROM tot tt CROSS JOIN vocab vv),
    scored AS (
      SELECT d.doc_id, d.labeled_lang, l.lang,
             sum(d.tf * coalesce(q.q, q0.q0)) AS score
      FROM doc_tf d
      CROSS JOIN langs l
      JOIN q0 ON q0.lang = l.lang
      LEFT JOIN q ON q.lang = l.lang AND q.token = d.token
      GROUP BY d.doc_id, d.labeled_lang, l.lang),
    best AS (
      SELECT doc_id, labeled_lang, lang AS best_lang, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, lang) AS rn
      FROM scored),
    own AS (
      SELECT doc_id, score AS own_score FROM scored
      WHERE lang = labeled_lang)
    SELECT b.doc_id, b.labeled_lang, b.best_lang,
           CAST((2 * (b.score - o.own_score) + 100) // 200 AS DOUBLE)
             / 10000.0 AS margin_nats
    FROM best b JOIN own o ON o.doc_id = b.doc_id
    WHERE b.rn = 1 AND b.best_lang <> b.labeled_lang
    ORDER BY b.doc_id
    """,
)
def text_lang_logprob_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-label audit by unigram language models: score every doc
    under EVERY language's add-one-smoothed unigram LM and flag docs
    whose labeled language is not their argmax — the mislabel screen
    run before trusting `lang` for mixture decisions. Determinism the
    hard way: per-(lang, token) log-probs are QUANTIZED to int64
    (round(ln p · 1e6)) before any aggregation, so the per-(doc, lang)
    scores are exact integer sums in any order and the argmax (with
    lang tie-break) cannot flip across engines. Scale: the LM is a
    (lang × vocab) table joined back on ``token`` as a plain shuffle
    equi-join (never broadcast — vocabulary grows with the corpus); the
    |langs| fan-out per doc token is a CONSTANT of the domain; the
    unseen-token floor is a |langs|-row broadcast."""
    tok = _tokens(spark, sf_dir)
    doc_tf = tok.groupBy("doc_id", "token").agg(
        F.any_value("lang").alias("labeled_lang"), F.count("*").alias("tf")
    )
    model = tok.groupBy("lang", "token").agg(F.count("*").alias("c"))
    tot = model.groupBy("lang").agg(F.sum("c").alias("t"))
    v = tok.select("token").distinct().count()  # scalar vocab size
    q = model.join(tot, "lang").select(
        "lang",
        "token",
        F.round(F.log((F.col("c") + 1.0) / (F.col("t") + F.lit(float(v)))) * 1e6)
        .cast("long")
        .alias("q"),
    )
    q0 = tot.select(
        "lang",
        F.round(F.log(1.0 / (F.col("t") + F.lit(float(v)))) * 1e6)
        .cast("long")
        .alias("q0"),
    )
    langs = load(spark, sf_dir, "documents").select("lang").distinct()
    scored = (
        doc_tf.crossJoin(F.broadcast(langs))
        .join(F.broadcast(q0), "lang")
        .join(q, ["lang", "token"], "left")
        .groupBy("doc_id", "labeled_lang", "lang")
        .agg(F.sum(F.col("tf") * F.coalesce("q", "q0")).alias("score"))
    )
    # best + own in ONE grouped pass (a window + self-reference would
    # re-evaluate the whole scoring pipeline twice): min_by over the
    # struct (−score, lang) is argmax-score with lang ASC tie-break
    agg = scored.groupBy("doc_id", "labeled_lang").agg(
        F.min_by(
            "lang", F.struct((-F.col("score")).alias("ns"), F.col("lang"))
        ).alias("best_lang"),
        F.max("score").alias("best_score"),
        F.max(
            F.when(F.col("lang") == F.col("labeled_lang"), F.col("score"))
        ).alias("own_score"),
    )
    return (
        agg.filter(F.col("best_lang") != F.col("labeled_lang"))
        .select(
            "doc_id",
            "labeled_lang",
            "best_lang",
            # exact integer half-up to 4 decimals (µnat scores are
            # exact ints; round() of the raw /1e6 double diverges on a
            # .xxxx5 landing — caught by the sf0.1 sweep)
            (
                F.expr(
                    "CAST((2 * (best_score - own_score) + 100)"
                    " div 200 AS DOUBLE)"
                )
                / 10000.0
            ).alias("margin_nats"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_template_prefixes",
    oracle="""
    WITH pre AS (
      SELECT doc_id,
             md5(array_to_string(string_split(lower(text), ' ')[1:8], ' '))
               AS template_id,
             n_chars
      FROM documents),
    g AS (
      SELECT template_id, count(*) AS n_docs,
             CAST(min(doc_id) AS BIGINT) AS exemplar_doc,
             CAST(sum(n_chars) AS BIGINT) AS total_chars
      FROM pre GROUP BY template_id)
    SELECT template_id, n_docs, exemplar_doc, total_chars
    FROM g WHERE n_docs >= 2
    ORDER BY n_docs DESC, template_id
    """,
)
def text_template_prefixes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template/boilerplate detection by shared 8-token prefixes — the
    screen that catches mirrored pages, form letters, and scraper
    artifacts before they skew a training mix. The prefix is digested
    to a fixed 32-char md5 BEFORE the shuffle (only digests move, never
    prefix text — the same bounded-payload discipline as the dedup
    family), one hash aggregate groups them, and only groups with ≥ 2
    members survive. Flagged groups carry an exemplar doc id (min — the
    deterministic choice) and their total character mass, which is the
    number a curation pass weighs before dropping a template."""
    d = load(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        "n_chars",
        F.md5(
            F.concat_ws(
                " ", F.slice(F.split(F.lower("text"), " "), 1, 8)
            )
        ).alias("template_id"),
    )
    return (
        base.groupBy("template_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").cast("long").alias("exemplar_doc"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.desc("n_docs"), "template_id")
    )


@query(
    "dedup_family_histogram",
    oracle="""
    WITH fam AS (
      SELECT md5(substr(lower(trim(text)), 1, 60)) AS digest,
             count(*) AS s
      FROM documents GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT CAST(f.s AS BIGINT) AS family_size,
           count(*) AS n_families,
           CAST(f.s * count(*) AS BIGINT) AS n_docs,
           CAST((f.s - 1) * count(*) AS BIGINT) AS removable_docs,
           round(CAST(f.s * count(*) AS DOUBLE)
                 / CAST(any_value(n.n_docs) AS DOUBLE), 6) AS corpus_share
    FROM fam f CROSS JOIN n
    GROUP BY f.s ORDER BY family_size
    """,
)
def dedup_family_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-family size histogram — the 'how duplicated is this
    corpus' summary read before choosing a dedup policy: for each
    dup-family size s, how many families, how many docs they hold, and
    how many a keep-one policy would remove. Families are keyed on the
    60-char normalized PREFIX digest (the same near-dup signature
    `dedup_keep_best` keys on — strict content equality finds nothing
    in a near-dup corpus); docs are digested BEFORE the shuffle so only
    32-char keys move, the family sizes come from one hash aggregate,
    and the histogram is a second aggregate over the family table (≤
    one row per distinct size). Everything is exact integers except the
    one corpus-share divide."""
    d = load(spark, sf_dir, "documents")
    n_docs = d.count()
    fam = d.groupBy(
        F.md5(F.substring(F.lower(F.trim("text")), 1, 60)).alias("digest")
    ).agg(F.count("*").alias("s"))
    return (
        fam.groupBy("s")
        .agg(F.count("*").alias("n_families"))
        .select(
            F.col("s").cast("long").alias("family_size"),
            "n_families",
            (F.col("s") * F.col("n_families")).cast("long").alias("n_docs"),
            ((F.col("s") - 1) * F.col("n_families"))
            .cast("long")
            .alias("removable_docs"),
            F.round(
                (F.col("s") * F.col("n_families")).cast("double")
                / F.lit(float(n_docs)),
                6,
            ).alias("corpus_share"),
        )
        .orderBy("family_size")
    )


@query(
    "text_tokenizer_fertility",
    oracle=rf"""
    WITH t AS (
      SELECT lang,
             len(string_split(lower(text), ' ')) AS n_words,
             len(regexp_extract_all(text, '{_PRETOKEN_RE}')) AS n_pretokens
      FROM documents)
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS total_words,
           CAST(sum(n_pretokens) AS BIGINT) AS total_pretokens,
           round(CAST(sum(n_pretokens) AS DOUBLE)
                 / CAST(sum(n_words) AS DOUBLE), 6) AS fertility
    FROM t GROUP BY lang ORDER BY lang
    """,
)
def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language — pretokens emitted per
    whitespace word, the compression metric that decides whether a
    tokenizer is fair to a language (high fertility = more compute per
    word). Reuses the BPE pretoken alphabet from
    `text_bpe_pretokenize`; both counts are row-local regexp/split
    sizes feeding one bounded per-language aggregate — one scan, one
    shuffle of |langs| partial rows, and the ratio divides two exact
    integers per output row."""
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "lang",
        F.size(F.split(F.lower("text"), " ")).cast("long").alias("n_words"),
        F.size(F.regexp_extract_all("text", F.lit(_PRETOKEN_RE), 0))
        .cast("long")
        .alias("n_pretokens"),
    )
    return (
        t.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").cast("long").alias("total_words"),
            F.sum("n_pretokens").cast("long").alias("total_pretokens"),
            F.round(
                F.sum("n_pretokens").cast("double")
                / F.sum("n_words").cast("double"),
                6,
            ).alias("fertility"),
        )
        .orderBy("lang")
    )


@query(
    "text_dataset_card",
    oracle="""
    WITH base AS (
      SELECT source, count(*) AS n_docs,
             CAST(sum(len(string_split(lower(text), ' '))) AS BIGINT)
               AS total_tokens
      FROM documents GROUP BY source),
    lc AS (
      SELECT source, lang, count(*) AS c
      FROM documents GROUP BY source, lang),
    toplang AS (
      SELECT source, lang AS top_lang, c
      FROM (SELECT source, lang, c,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY c DESC, lang) AS rn
            FROM lc) t WHERE rn = 1),
    fam AS (
      SELECT source, md5(substr(lower(trim(text)), 1, 60)) AS digest,
             count(*) AS s
      FROM documents GROUP BY source, 2),
    dup AS (
      SELECT source, CAST(sum(s - 1) AS BIGINT) AS removable
      FROM fam GROUP BY source)
    SELECT b.source, b.n_docs, b.total_tokens,
           CAST((2 * b.total_tokens + b.n_docs)
                // (2 * b.n_docs) AS BIGINT) AS mean_tokens,
           t.top_lang,
           round(CAST(t.c AS DOUBLE) / CAST(b.n_docs AS DOUBLE), 6)
             AS top_lang_share,
           round(CAST(d.removable AS DOUBLE) / CAST(b.n_docs AS DOUBLE), 6)
             AS dup_rate
    FROM base b
    JOIN toplang t ON t.source = b.source
    JOIN dup d ON d.source = b.source
    ORDER BY b.source
    """,
)
def text_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DATASET CARD table — per-source doc count, token mass, exact
    half-up mean length, dominant language + its share, and the
    near-dup rate (prefix-60 families, the corpus's dup signature) —
    the one-page summary every published training corpus ships. Three
    keyed aggregates over the corpus (base stats, language mode with
    deterministic tie-break, dup families on pre-shuffled digests) join
    back on the bounded source key; every ratio divides exact
    integers."""
    d = load(spark, sf_dir, "documents")
    base = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split(F.lower("text"), " ")))
        .cast("long")
        .alias("total_tokens"),
    )
    lc = d.groupBy("source", "lang").agg(F.count("*").alias("c"))
    toplang = lc.groupBy("source").agg(
        F.min_by("lang", F.struct((-F.col("c")).alias("nc"), F.col("lang")))
        .alias("top_lang"),
        F.max("c").alias("top_c"),
    )
    fam = d.groupBy(
        "source", F.md5(F.substring(F.lower(F.trim("text")), 1, 60)).alias("dg")
    ).agg(F.count("*").alias("s"))
    dup = fam.groupBy("source").agg(
        F.sum(F.col("s") - 1).cast("long").alias("removable")
    )
    return (
        base.join(toplang, "source")
        .join(dup, "source")
        .select(
            "source",
            "n_docs",
            "total_tokens",
            F.expr(
                "CAST((2 * total_tokens + n_docs) div (2 * n_docs) AS BIGINT)"
            ).alias("mean_tokens"),
            "top_lang",
            F.round(
                F.col("top_c").cast("double") / F.col("n_docs").cast("double"),
                6,
            ).alias("top_lang_share"),
            F.round(
                F.col("removable").cast("double")
                / F.col("n_docs").cast("double"),
                6,
            ).alias("dup_rate"),
        )
        .orderBy("source")
    )


_BPE_MERGE_ROUNDS = 6

# Each unrolled oracle round: adjacent-pair census over the wrapped-symbol
# vocab, deterministic top pair (count desc, then lexicographic), then one
# literal string replace that IS greedy left-to-right BPE merging (see
# text_bpe_merges docstring for why the wrapping makes replace() exact).
_BPE_ORACLE_ROUND = """
pr{i} AS (
  SELECT l[i] AS x, l[i+1] AS y, cnt
  FROM (SELECT unnest(generate_series(1, len(l)-1)) AS i, l, cnt
        FROM (SELECT string_split(trim(s), '  ') AS l, cnt
              FROM v{p}) q1) q2),
top{i} AS (
  SELECT x, y, sum(cnt) AS pc FROM pr{i} GROUP BY x, y
  ORDER BY pc DESC, x, y LIMIT 1),
v{i} AS (
  SELECT replace(s, ' ' || t.x || '  ' || t.y || ' ',
                 ' ' || t.x || t.y || ' ') AS s, cnt
  FROM v{p} CROSS JOIN top{i} t)"""

_BPE_ORACLE = (
    r"""
    WITH tok AS (
      SELECT lower(unnest(regexp_extract_all(text, '"""
    + _PRETOKEN_RE
    + r"""'))) AS w
      FROM documents),
    cen AS (SELECT w, count(*) AS cnt FROM tok GROUP BY w),
    v0 AS (SELECT regexp_replace(w, '(.)', ' \1 ', 'g') AS s, cnt FROM cen),
"""
    + ",".join(
        _BPE_ORACLE_ROUND.format(i=i, p=i - 1)
        for i in range(1, _BPE_MERGE_ROUNDS + 1)
    )
    + "\n    SELECT * FROM (\n"
    + "\n      UNION ALL\n".join(
        f"      SELECT CAST({i} AS INTEGER) AS merge_rank, x AS lhs,"
        f" y AS rhs, x || y AS merged,"
        f" CAST(pc AS BIGINT) AS pair_count FROM top{i}"
        for i in range(1, _BPE_MERGE_ROUNDS + 1)
    )
    + "\n    ) ORDER BY merge_rank\n    "
)


@query("text_bpe_merges", oracle=_BPE_ORACLE)
def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge TRAINING loop — the other half of tokenizer training
    that `text_bpe_pretokenize`'s vocabulary census starts: k rounds of
    (adjacent-pair count -> pick the most frequent pair -> re-segment
    every vocab word), emitting the learned merge table in order. This
    is the classic iterative-MapReduce shape (same discipline as
    `graph_pagerank`): after ONE corpus pass builds the pretoken
    census, every round runs over the VOCAB (|distinct pretokens|, not
    the corpus), the chosen pair is a 1-row scalar on the driver, and
    `localCheckpoint` truncates lineage per round.

    The re-segmentation trick that keeps both engines exact: each vocab
    word is held as its symbol sequence wrapped in single spaces and
    joined by double spaces (" c1  c2  c3 ", symbols are \\S+ so space
    is a free separator). Merging pair (x, y) is then ONE literal
    `replace(s, ' x  y ', ' xy ')`: the flanking spaces force x and y
    to match complete symbols only, and left-to-right non-overlapping
    replace semantics (identical in Spark and DuckDB) ARE greedy BPE
    pair merging — "aaaa" correctly becomes "aa","aa". No lookaround
    regex (RE2-safe), no per-row Python. Ties on pair count break
    lexicographically on (left, right) in both engines."""
    d = load(spark, sf_dir, "documents")
    vocab = (
        d.select(
            F.explode(
                F.regexp_extract_all("text", F.lit(_PRETOKEN_RE), 0)
            ).alias("w")
        )
        .select(F.lower("w").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .select(F.regexp_replace("w", "(.)", " $1 ").alias("s"), "cnt")
        .localCheckpoint()
    )
    merges = []
    for rank in range(1, _BPE_MERGE_ROUNDS + 1):
        pairs = (
            vocab.withColumn("syms", F.split(F.trim("s"), "  "))
            .select(
                F.explode(
                    F.expr(
                        "transform(slice(syms, 1, size(syms) - 1),"
                        " (v, i) -> struct(v AS x,"
                        " element_at(syms, i + 2) AS y))"
                    )
                ).alias("p"),
                "cnt",
            )
            .groupBy(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
            .agg(F.sum("cnt").alias("pc"))
        )
        top = pairs.orderBy(F.desc("pc"), "x", "y").limit(1).collect()
        if not top:
            raise RuntimeError(
                f"text_bpe_merges: vocabulary exhausted at round {rank} — "
                "no adjacent pairs remain"
            )
        x, y, pc = top[0]["x"], top[0]["y"], int(top[0]["pc"])
        merges.append((rank, x, y, x + y, pc))
        vocab = vocab.select(
            F.replace(
                F.col("s"), F.lit(f" {x}  {y} "), F.lit(f" {x}{y} ")
            ).alias("s"),
            "cnt",
        ).localCheckpoint()
    return spark.createDataFrame(
        merges,
        "merge_rank int, lhs string, rhs string, merged string,"
        " pair_count long",
    )


_DSIR_TARGET_LANG = "en"


@query(
    "text_dsir_weights",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source, lang,
             unnest(string_split(lower(text), ' ')) AS token
      FROM documents),
    doc_tf AS (
      SELECT doc_id, any_value(source) AS source, token, count(*) AS tf
      FROM tok GROUP BY doc_id, token),
    raw AS (SELECT token, count(*) AS cr FROM tok GROUP BY token),
    tgt AS (SELECT token, count(*) AS ct FROM tok
            WHERE lang = '{_DSIR_TARGET_LANG}' GROUP BY token),
    v AS (SELECT count(*) AS v FROM raw),
    tr AS (SELECT sum(cr) AS tr FROM raw),
    tt AS (SELECT sum(ct) AS tt FROM tgt),
    q AS (
      SELECT r.token,
             CAST(round((ln((coalesce(g.ct, 0) + 1.0) / (tt.tt + v.v))
                         - ln((r.cr + 1.0) / (tr.tr + v.v))) * 1e6)
                  AS BIGINT) AS q
      FROM raw r LEFT JOIN tgt g ON g.token = r.token
      CROSS JOIN v CROSS JOIN tr CROSS JOIN tt),
    sc AS (
      SELECT d.doc_id, any_value(d.source) AS source, sum(d.tf * q.q) AS score
      FROM doc_tf d JOIN q ON q.token = d.token
      GROUP BY d.doc_id)
    SELECT source, count(*)::BIGINT AS n_docs,
           CAST(sum(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_selected,
           round(CAST(sum(score) AS DOUBLE) / (count(*) * 1e6), 6)
             AS mean_weight_nats,
           round(CAST(sum(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS selected_share
    FROM sc GROUP BY source ORDER BY source
    """,
)
def text_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance-resampling weights (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): score
    every document by log p_target(d) - log p_raw(d) under add-one-
    smoothed unigram LMs, where the target distribution is the corpus's
    own 'en' slice and raw is the full corpus — the principled
    "upweight data that looks like the target domain" selector that
    replaces hand-tuned source weights. Reported per source: document
    count, how many docs importance sampling would SELECT (weight > 0),
    and the mean weight in nats.

    Determinism discipline (same as `text_lang_logprob_audit`): the
    per-token log-ratio is quantized to int64 µnats BEFORE any
    aggregation, so per-doc scores are exact integer sums in any
    partition order; the per-source mean divides two exact integers
    once. Scale: both LMs are vocabulary-sized token tables joined back
    on ``token`` as plain shuffle equi-joins (never broadcast — vocab
    grows with the corpus); the only broadcast is the 1-row
    totals/vocab-size frame; output is bounded by |sources|."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        "source",
        "lang",
        F.explode(F.split(F.lower("text"), " ")).alias("token"),
    )
    doc_tf = tok.groupBy("doc_id", "token").agg(
        F.any_value("source").alias("source"), F.count("*").alias("tf")
    )
    raw = tok.groupBy("token").agg(F.count("*").alias("cr"))
    tgt = (
        tok.filter(F.col("lang") == _DSIR_TARGET_LANG)
        .groupBy("token")
        .agg(F.count("*").alias("ct"))
    )
    tot = (
        raw.agg(
            F.sum("cr").alias("tr"), F.count("*").cast("long").alias("v")
        )
        # both sides are 1-row aggregates; the broadcast hint keeps the
        # pairing a BNLJ instead of a CartesianProduct when stats-based
        # auto-broadcast is off
        .crossJoin(F.broadcast(tgt.agg(F.sum("ct").alias("tt"))))
    )
    q = (
        raw.join(tgt, "token", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "token",
            F.round(
                (
                    F.log(
                        (F.coalesce("ct", F.lit(0)) + 1.0)
                        / (F.col("tt") + F.col("v"))
                    )
                    - F.log((F.col("cr") + 1.0) / (F.col("tr") + F.col("v")))
                )
                * 1e6
            )
            .cast("long")
            .alias("q"),
        )
    )
    sc = (
        doc_tf.join(q, "token")
        .groupBy("doc_id")
        .agg(
            F.any_value("source").alias("source"),
            F.sum(F.col("tf") * F.col("q")).alias("score"),
        )
    )
    n_sel = F.sum(F.when(F.col("score") > 0, 1).otherwise(0))
    return (
        sc.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            n_sel.cast("long").alias("n_selected"),
            F.round(
                F.sum("score").cast("double") / (F.count("*") * 1e6), 6
            ).alias("mean_weight_nats"),
            F.round(
                n_sel.cast("double") / F.count("*"), 6
            ).alias("selected_share"),
        )
        .orderBy("source")
    )


@query(
    "text_dup_spans",
    oracle="""
    WITH t AS (
      SELECT doc_id, source, string_split(lower(text), ' ') AS toks
      FROM documents),
    grams AS (
      SELECT doc_id, i AS pos,
             md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
                 toks[i+3] || ' ' || toks[i+4]) AS g
      FROM (SELECT doc_id, toks,
                   unnest(generate_series(1, len(toks) - 4)) AS i
            FROM t WHERE len(toks) >= 5) q),
    df AS (SELECT g, count(DISTINCT doc_id) AS nd FROM grams GROUP BY g),
    dup AS (
      SELECT gr.doc_id, gr.pos FROM grams gr
      JOIN df ON df.g = gr.g WHERE df.nd > 1),
    runs AS (
      SELECT doc_id, pos - row_number() OVER (PARTITION BY doc_id
                                              ORDER BY pos) AS grp
      FROM dup),
    per_doc AS (
      SELECT doc_id, max(cnt) AS max_run
      FROM (SELECT doc_id, grp, count(*) AS cnt
            FROM runs GROUP BY doc_id, grp) r
      GROUP BY doc_id)
    SELECT d.source,
           count(*)::BIGINT AS n_docs,
           CAST(sum(CASE WHEN coalesce(p.max_run, 0) >= 3
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_spanned,
           round(CAST(sum(coalesce(p.max_run, 0)) AS DOUBLE)
                 / count(*), 6) AS avg_max_run,
           CAST(max(coalesce(p.max_run, 0)) AS BIGINT) AS max_max_run
    FROM documents d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
    GROUP BY d.source ORDER BY d.source
    """,
)
def text_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication SPANS (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): per
    document, the longest run of CONSECUTIVE 5-gram shingles that also
    appear in another document — a run of r duplicated shingles is an
    exact repeated substring of r+4 tokens, which is what substring-
    level dedup removes and what `text_dup_ngram_coverage`'s unordered
    coverage ratio cannot see. Reported per source: docs with a
    ≥3-shingle span (a ≥7-token verbatim repeat), mean and max longest-
    run — the triage table for WHERE cross-doc boilerplate lives.

    Scale shape: shingles collapse to md5 digests map-side (only
    digests shuffle), document frequency is one digest-keyed hash agg,
    the dup flags join back on digest (shuffle equi-join — the digest
    table grows with the corpus, never broadcast), and the runs resolve
    with the classic gaps-and-islands pos − row_number() trick inside a
    doc-keyed window. Docs with no duplicated shingle (or < 5 tokens)
    re-enter via left join as max_run = 0."""
    d = load(spark, sf_dir, "documents")
    grams = (
        d.withColumn("toks", F.split(F.lower("text"), " "))
        .filter(F.size("toks") >= 5)
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    "transform(sequence(1, size(toks) - 4),"
                    " i -> md5(array_join(slice(toks, i, 5), ' ')))"
                )
            ).alias("pos0", "g"),
        )
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "g")
    )
    df_counts = grams.groupBy("g").agg(
        F.count_distinct("doc_id").alias("nd")
    )
    dup = (
        grams.join(df_counts, "g")
        .filter(F.col("nd") > 1)
        .select("doc_id", "pos")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = dup.select(
        "doc_id", (F.col("pos") - F.row_number().over(w)).alias("grp")
    )
    per_doc = (
        runs.groupBy("doc_id", "grp")
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id")
        .agg(F.max("cnt").alias("max_run"))
    )
    mr = F.coalesce("max_run", F.lit(0))
    return (
        d.select("doc_id", "source")
        .join(per_doc, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(mr >= 3, 1).otherwise(0))
            .cast("long")
            .alias("n_docs_spanned"),
            F.round(F.sum(mr).cast("double") / F.count("*"), 6).alias(
                "avg_max_run"
            ),
            F.max(mr).cast("long").alias("max_max_run"),
        )
        .orderBy("source")
    )


@query(
    "dedup_soft_weights",
    oracle="""
    WITH fam AS (
      SELECT doc_id, source, md5(lower(trim(text))) AS digest
      FROM documents),
    sizes AS (SELECT digest, count(*) AS k FROM fam GROUP BY digest),
    per_sk AS (
      SELECT f.source, s.k, count(*) AS n_sk
      FROM fam f JOIN sizes s ON s.digest = f.digest
      GROUP BY f.source, s.k),
    agg_ AS (
      SELECT source, sum(n_sk) AS n_docs,
             sum(CAST(round(1e6 * n_sk / k) AS BIGINT)) AS micro
      FROM per_sk GROUP BY source)
    SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
           round(CAST(micro AS DOUBLE) / 1e6, 6) AS effective_docs,
           round(CAST(micro AS DOUBLE) / (1e6 * n_docs), 6) AS mass_ratio
    FROM agg_ ORDER BY source
    """,
)
def dedup_soft_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SOFT deduplication weights: instead of dropping duplicates, give
    every document sampling weight 1/k where k is its exact-dup family
    size (normalized-text digest, corpus-global) — the downweighting
    scheme production pipelines use when hard dedup would distort the
    source mix. Reported per source: raw docs, effective (weighted)
    docs, and the retained mass ratio — the number that says how much a
    source's apparent size is duplicate inflation.

    Determinism: per-(source, family-size) counts are exact integers
    from two hash aggregations; each n/k quotient quantizes to int64
    micro-docs BEFORE the per-source sum (the µnat discipline), so no
    float accumulates across partitions. Scale: digests move instead of
    text, the family-size table joins back on digest as a shuffle
    equi-join (grows with the corpus, never broadcast), and the
    (source × distinct-family-size) domain is bounded."""
    fam = load(spark, sf_dir, "documents").select(
        "doc_id", "source", F.md5(F.lower(F.trim("text"))).alias("digest")
    )
    sizes = fam.groupBy("digest").agg(F.count("*").alias("k"))
    per_sk = (
        fam.join(sizes, "digest")
        .groupBy("source", "k")
        .agg(F.count("*").alias("n_sk"))
    )
    agg_ = per_sk.groupBy("source").agg(
        F.sum("n_sk").alias("n_docs"),
        F.sum(
            F.round(1e6 * F.col("n_sk") / F.col("k")).cast("long")
        ).alias("micro"),
    )
    return agg_.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.round(F.col("micro").cast("double") / 1e6, 6).alias(
            "effective_docs"
        ),
        F.round(
            F.col("micro").cast("double") / (1e6 * F.col("n_docs")), 6
        ).alias("mass_ratio"),
    ).orderBy("source")


_CONTAINMENT_TAU = 0.9


@query(
    "dedup_containment",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, substr(text, 1, {_DUP_PREFIX_LEN}) AS ckey
      FROM documents),
    tok AS (
      SELECT DISTINCT doc_id, unnest(string_split(lower(text), ' ')) AS t
      FROM documents),
    sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS da, b.doc_id AS db
      FROM d a JOIN d b ON a.ckey = b.ckey AND a.doc_id < b.doc_id),
    inter AS (
      SELECT p.da, p.db, count(*) AS o
      FROM pairs p
      JOIN tok ta ON ta.doc_id = p.da
      JOIN tok tb ON tb.doc_id = p.db AND tb.t = ta.t
      GROUP BY p.da, p.db),
    c AS (
      SELECT i.da, i.db, i.o, sa.n AS na, sb.n AS nb
      FROM inter i
      JOIN sz sa ON sa.doc_id = i.da
      JOIN sz sb ON sb.doc_id = i.db
      WHERE i.o * 10 >= {int(_CONTAINMENT_TAU * 10)} * least(sa.n, sb.n))
    SELECT CAST(CASE WHEN na = nb THEN least(da, db)
                     WHEN na > nb THEN da ELSE db END AS BIGINT) AS outer_doc,
           CAST(CASE WHEN na = nb THEN greatest(da, db)
                     WHEN na > nb THEN db ELSE da END AS BIGINT) AS inner_doc,
           round(CAST(o AS DOUBLE) / least(na, nb), 6) AS containment
    FROM c ORDER BY outer_doc, inner_doc
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric CONTAINMENT dedup: pairs where the smaller document's
    token set is ≥ 90% contained in the larger's — the quoted/embedded
    duplication that symmetric Jaccard MISSES (a tweet quoted inside an
    article has tiny Jaccard but containment ≈ 1). The containment
    predicate cross-multiplies to exact integers (o·10 ≥ 9·min(n_a,n_b)
    — no float threshold), direction is decided by exact set sizes
    (ties to the lower doc_id as outer), and the reported score is one
    final divide.

    Candidates come from the corpus's prefix candidate key
    (`with_candidate_key` discipline, shared with `dedup_keep_best`);
    verification joins each candidate pair to the two distinct-token
    inventories and counts the real intersection — all shuffle
    equi-joins on doc/prefix keys. At 100 TB the candidate generator
    swaps to `dedup_ngram_jaccard`'s hashed prefix-filter machinery
    (PPJoin handles containment with the same prefix bound under the
    |A| ≥ τ·min norm); the verify stage is unchanged."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, _DUP_PREFIX_LEN).alias("ckey")
    )
    tok = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(F.split(F.lower("text"), " ")).alias("t"),
        )
        .distinct()
    )
    tokset = tok.groupBy("doc_id").agg(
        F.sort_array(F.collect_set("t")).alias("toks"),
        F.count("*").alias("n"),
    )
    a, b = d.alias("a"), d.alias("b")
    pairs = a.join(
        b,
        (F.col("a.ckey") == F.col("b.ckey"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db")
    )
    ta = tokset.select(
        F.col("doc_id").alias("da"),
        F.col("toks").alias("toks_a"),
        F.col("n").alias("na"),
    )
    tb = tokset.select(
        F.col("doc_id").alias("db"),
        F.col("toks").alias("toks_b"),
        F.col("n").alias("nb"),
    )
    o = F.size(F.array_intersect("toks_a", "toks_b"))
    scored = (
        pairs.join(ta, "da")
        .join(tb, "db")
        .select("da", "db", "na", "nb", o.alias("o"))
        .filter(
            F.col("o") * 10
            >= int(_CONTAINMENT_TAU * 10) * F.least("na", "nb")
        )
    )
    na, nb = F.col("na"), F.col("nb")
    da, db = F.col("da"), F.col("db")
    return (
        scored.select(
            F.when(na == nb, F.least(da, db))
            .when(na > nb, da)
            .otherwise(db)
            .cast("long")
            .alias("outer_doc"),
            F.when(na == nb, F.greatest(da, db))
            .when(na > nb, db)
            .otherwise(da)
            .cast("long")
            .alias("inner_doc"),
            F.round(
                F.col("o").cast("double") / F.least(na, nb), 6
            ).alias("containment"),
        )
        .orderBy("outer_doc", "inner_doc")
    )


# Fixed, hand-set logistic weights (engine literals — the "apply a
# trained quality classifier at scale" shape with a deterministic stub
# model; a real deployment swaps in fastText/logreg coefficients)
_QC_BIAS = -2.0
_QC_W_LNTOK = 0.6
_QC_W_STOP = 3.0
_QC_W_SHORT = -2.0


@query(
    "text_quality_classifier",
    oracle=f"""
    WITH feat AS (
      SELECT source,
             len(string_split(lower(text), ' ')) AS nt,
             len(list_filter(string_split(lower(text), ' '),
                 x -> list_contains({_STOPWORDS}, x))) AS ns,
             len(list_filter(string_split(lower(text), ' '),
                 x -> length(x) <= 2)) AS nsh
      FROM documents),
    logit AS (
      SELECT source,
             {_QC_BIAS} + {_QC_W_LNTOK} * ln(1.0 + nt)
             + {_QC_W_STOP} * (CAST(ns AS DOUBLE) / nt)
             + {_QC_W_SHORT} * (CAST(nsh AS DOUBLE) / nt) AS z
      FROM feat),
    q AS (
      SELECT source, z,
             CAST(round(1e6 / (1.0 + exp(-z))) AS BIGINT) AS qs
      FROM logit)
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN z > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pass,
           round(CAST(sum(qs) AS DOUBLE) / (count(*) * 1e6), 6)
             AS mean_score
    FROM q GROUP BY source ORDER BY source
    """,
)
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality FILTER application — the fastText/logreg
    classifier pass (CCNet, LLaMA data pipelines) that replaces
    heuristic rules once labels exist: a logistic model over integer
    document features (log token count, stopword ratio, short-token
    ratio) scores every doc; reported per source as docs, passing docs
    (logit > 0 ⇔ score > ½), and mean score. The WEIGHTS are fixed
    engine literals (a deterministic stub model — swapping in trained
    coefficients changes nothing structural), so the per-doc logit is
    one closed-form double over exact integers, identical in both
    engines; per-doc scores quantize to int64 µ-units before the
    per-source mean (no float accumulation). One scan, all features
    row-local in codegen, one bounded hash agg."""
    toks = F.split(F.lower("text"), " ")
    stop = F.array(*[F.lit(s) for s in _STOPWORDS])
    nt = F.size(toks)
    ns = F.size(F.filter(toks, lambda x: F.array_contains(stop, x)))
    nsh = F.size(F.filter(toks, lambda x: F.length(x) <= 2))
    z = (
        F.lit(_QC_BIAS)
        + _QC_W_LNTOK * F.log(1.0 + nt)
        + _QC_W_STOP * (ns.cast("double") / nt)
        + _QC_W_SHORT * (nsh.cast("double") / nt)
    )
    scored = load(spark, sf_dir, "documents").select(
        "source",
        z.alias("z"),
        F.round(1e6 / (1.0 + F.exp(-z))).cast("long").alias("qs"),
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.when(F.col("z") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_pass"),
            F.round(
                F.sum("qs").cast("double") / (F.count("*") * 1e6), 6
            ).alias("mean_score"),
        )
        .orderBy("source")
    )


@query(
    "agg_decile_lift",
    oracle=f"""
    WITH feat AS (
      SELECT doc_id, (lang = 'en') AS pos,
             len(string_split(lower(text), ' ')) AS nt,
             len(list_filter(string_split(lower(text), ' '),
                 x -> list_contains({_STOPWORDS}, x))) AS ns,
             len(list_filter(string_split(lower(text), ' '),
                 x -> length(x) <= 2)) AS nsh
      FROM documents),
    scored AS (
      SELECT doc_id, pos,
             {_QC_BIAS} + {_QC_W_LNTOK} * ln(1.0 + nt)
             + {_QC_W_STOP} * (CAST(ns AS DOUBLE) / nt)
             + {_QC_W_SHORT} * (CAST(nsh AS DOUBLE) / nt) AS z
      FROM feat),
    ranked AS (
      SELECT pos,
             row_number() OVER (ORDER BY z DESC, doc_id) AS rnk,
             count(*) OVER () AS n
      FROM scored),
    dec AS (
      SELECT ((rnk - 1) * 10) // n AS decile, pos, n FROM ranked),
    base AS (SELECT sum(CASE WHEN pos THEN 1 ELSE 0 END) AS tp,
                    count(*) AS tn FROM dec)
    SELECT CAST(d.decile AS INT) AS decile,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN d.pos THEN 1 ELSE 0 END) AS BIGINT)
             AS n_positive,
           round(CAST(sum(CASE WHEN d.pos THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS rate,
           round((CAST(sum(CASE WHEN d.pos THEN 1 ELSE 0 END) AS DOUBLE)
                  / count(*))
                 / (CAST(b.tp AS DOUBLE) / b.tn), 6) AS lift
    FROM dec d CROSS JOIN base b
    GROUP BY d.decile, b.tp, b.tn ORDER BY decile
    """,
)
def agg_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile GAINS/LIFT table — the model-evaluation canon for ranking
    models: sort the corpus by the quality classifier's score
    (`text_quality_classifier`'s fixed logistic model), cut into exact
    score deciles, and report each decile's positive rate (class:
    lang='en') against the base rate — the table that says "the top
    10% of the model's ranking is 1.8× enriched". Ranks come from the
    engine's sampled range-bucketed global rank (NO single-partition
    window over the corpus — the same machinery as `sort_global`),
    decile cuts are exact integer division ((rank−1)·10 div n), and
    rates/lift divide exact integers once per output row. Output is a
    fixed 10-row table."""
    from .ranking import with_global_rank

    toks = F.split(F.lower("text"), " ")
    stop = F.array(*[F.lit(s) for s in _STOPWORDS])
    nt = F.size(toks)
    ns = F.size(F.filter(toks, lambda x: F.array_contains(stop, x)))
    nsh = F.size(F.filter(toks, lambda x: F.length(x) <= 2))
    z = (
        F.lit(_QC_BIAS)
        + _QC_W_LNTOK * F.log(1.0 + nt)
        + _QC_W_STOP * (ns.cast("double") / nt)
        + _QC_W_SHORT * (nsh.cast("double") / nt)
    )
    scored = load(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("lang") == "en").alias("pos"),
        (-z).alias("negz"),  # ascending rank on -z == score-descending
    )
    ranked = with_global_rank(
        scored, [("negz", "asc"), ("doc_id", "asc")], rank_col="rnk"
    )
    n = ranked.count()  # bounded scalar (corpus count)
    dec = ranked.select(
        F.expr(f"CAST((rnk - 1) * 10 div {n} AS INT)").alias("decile"),
        "pos",
    )
    base = dec.agg(
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).alias("tp"),
        F.count("*").alias("tn"),
    )
    g = (
        dec.groupBy("decile")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("pos"), 1).otherwise(0)).alias("np"),
        )
        .crossJoin(F.broadcast(base))
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return g.select(
        F.col("decile").cast("int").alias("decile"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("np").cast("long").alias("n_positive"),
        F.round(d("np") / d("n_docs"), 6).alias("rate"),
        F.round(
            (d("np") / d("n_docs")) / (d("tp") / d("tn")), 6
        ).alias("lift"),
    ).orderBy("decile")


@query(
    "agg_auc_mann_whitney",
    oracle=f"""
    WITH feat AS (
      SELECT doc_id, (lang = 'en') AS pos,
             len(string_split(lower(text), ' ')) AS nt,
             len(list_filter(string_split(lower(text), ' '),
                 x -> list_contains({_STOPWORDS}, x))) AS ns,
             len(list_filter(string_split(lower(text), ' '),
                 x -> length(x) <= 2)) AS nsh
      FROM documents),
    scored AS (
      SELECT doc_id, pos,
             {_QC_BIAS} + {_QC_W_LNTOK} * ln(1.0 + nt)
             + {_QC_W_STOP} * (CAST(ns AS DOUBLE) / nt)
             + {_QC_W_SHORT} * (CAST(nsh AS DOUBLE) / nt) AS z
      FROM feat),
    r AS (
      SELECT pos, z,
             row_number() OVER (ORDER BY z, doc_id) AS rn
      FROM scored),
    tie AS (
      SELECT pos,
             min(rn) OVER (PARTITION BY z) AS mn,
             count(*) OVER (PARTITION BY z) AS cz
      FROM r),
    s AS (
      SELECT sum(CASE WHEN pos THEN 2 * mn + cz - 1 ELSE 0 END) AS r2p,
             sum(CASE WHEN pos THEN 1 ELSE 0 END) AS np,
             sum(CASE WHEN pos THEN 0 ELSE 1 END) AS nn_
      FROM tie)
    SELECT CAST(np AS BIGINT) AS n_pos,
           CAST(nn_ AS BIGINT) AS n_neg,
           CAST(r2p - np * (np + 1) AS BIGINT) AS u_times_2,
           round(CAST(r2p - np * (np + 1) AS DOUBLE)
                 / (2.0 * np * nn_), 6) AS auc,
           round((CAST(r2p - np * (np + 1) AS DOUBLE) / 2.0
                  - CAST(np AS DOUBLE) * nn_ / 2.0)
                 / sqrt(CAST(np AS DOUBLE) * nn_
                        * (np + nn_ + 1.0) / 12.0), 4) AS z_score
    FROM s
    """,
)
def agg_auc_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact AUC / Mann–Whitney U for the quality classifier's ranking
    of the lang='en' class — the threshold-free companion to
    `agg_decile_lift`: AUC = P(score_pos > score_neg) computed from the
    rank-sum identity, with TIES handled by midranks. The all-integer
    trick: midrank = min_rank + (count−1)/2 doubles to
    2·min + count − 1, so the positive rank-sum, U·2, and therefore AUC
    are exact integers/ratios in any partition order — no float rank
    averaging. Ranks come from the sampled range-bucketed global rank
    (no single-partition window); tie groups are a score-keyed window;
    the z approximation is one closed-form double. Output is a single
    row."""
    from .ranking import with_global_rank

    toks = F.split(F.lower("text"), " ")
    stop = F.array(*[F.lit(s) for s in _STOPWORDS])
    nt = F.size(toks)
    ns = F.size(F.filter(toks, lambda x: F.array_contains(stop, x)))
    nsh = F.size(F.filter(toks, lambda x: F.length(x) <= 2))
    z = (
        F.lit(_QC_BIAS)
        + _QC_W_LNTOK * F.log(1.0 + nt)
        + _QC_W_STOP * (ns.cast("double") / nt)
        + _QC_W_SHORT * (nsh.cast("double") / nt)
    )
    scored = load(spark, sf_dir, "documents").select(
        "doc_id", (F.col("lang") == "en").alias("pos"), z.alias("z")
    )
    r = with_global_rank(
        scored, [("z", "asc"), ("doc_id", "asc")], rank_col="rn"
    )
    wz = Window.partitionBy("z")
    tie = r.select(
        "pos",
        F.min("rn").over(wz).alias("mn"),
        F.count("*").over(wz).alias("cz"),
    )
    s = tie.agg(
        F.sum(
            F.when(F.col("pos"), 2 * F.col("mn") + F.col("cz") - 1).otherwise(
                0
            )
        ).alias("r2p"),
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).alias("np"),
        F.sum(F.when(F.col("pos"), 0).otherwise(1)).alias("nn_"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    u2 = F.col("r2p") - F.col("np") * (F.col("np") + 1)
    return s.select(
        F.col("np").cast("long").alias("n_pos"),
        F.col("nn_").cast("long").alias("n_neg"),
        u2.cast("long").alias("u_times_2"),
        F.round(u2.cast("double") / (2.0 * d("np") * d("nn_")), 6).alias(
            "auc"
        ),
        F.round(
            (u2.cast("double") / 2.0 - d("np") * d("nn_") / 2.0)
            / F.sqrt(
                d("np") * d("nn_") * (d("np") + d("nn_") + 1.0) / 12.0
            ),
            4,
        ).alias("z_score"),
    )


@query(
    "agg_calibration_error",
    oracle=f"""
    WITH feat AS (
      SELECT doc_id, (lang = 'en') AS pos,
             len(string_split(lower(text), ' ')) AS nt,
             len(list_filter(string_split(lower(text), ' '),
                 x -> list_contains({_STOPWORDS}, x))) AS ns,
             len(list_filter(string_split(lower(text), ' '),
                 x -> length(x) <= 2)) AS nsh
      FROM documents),
    q AS (
      SELECT pos,
             CAST(round(1e6 / (1.0 + exp(-({_QC_BIAS}
                  + {_QC_W_LNTOK} * ln(1.0 + nt)
                  + {_QC_W_STOP} * (CAST(ns AS DOUBLE) / nt)
                  + {_QC_W_SHORT} * (CAST(nsh AS DOUBLE) / nt)))))
                  AS BIGINT) AS qs
      FROM feat),
    b AS (
      SELECT least(qs // 100000, 9) AS bucket,
             count(*) AS n, sum(qs) AS sq,
             sum(CASE WHEN pos THEN 1 ELSE 0 END) AS np
      FROM q GROUP BY 1),
    tot AS (SELECT sum(n) AS tn FROM b),
    terms AS (
      SELECT b.bucket, b.n, b.np,
             round(CAST(b.sq AS DOUBLE) / (b.n * 1e6), 6) AS avg_pred,
             round(CAST(b.np AS DOUBLE) / b.n, 6) AS obs_rate,
             CAST(round(1e6 * (CAST(b.n AS DOUBLE) / t.tn)
                  * abs(CAST(b.sq AS DOUBLE) / (b.n * 1e6)
                        - CAST(b.np AS DOUBLE) / b.n)) AS BIGINT) AS term_u
      FROM b CROSS JOIN tot t)
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(n AS BIGINT) AS n_docs,
           avg_pred, obs_rate,
           round(CAST(sum(term_u) OVER () AS DOUBLE) / 1e6, 6) AS ece
    FROM terms ORDER BY bucket
    """,
)
def agg_calibration_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected Calibration Error for the quality classifier against
    the lang='en' outcome — the third leg of the eval canon after
    `agg_decile_lift` (ranking) and `agg_auc_mann_whitney`
    (discrimination): per probability bucket, mean predicted score vs
    observed rate, plus the weighted |gap| sum (ECE) stamped on every
    row. Determinism: per-doc sigmoid scores quantize to int64 µ-units
    (same literals as the classifier key), buckets cut by exact integer
    division on the quantized score, and each bucket's weighted gap
    re-quantizes to µ-units before the ≤10-term ECE sum — float
    accumulation appears nowhere. One scan, one bounded hash agg."""
    toks = F.split(F.lower("text"), " ")
    stop = F.array(*[F.lit(s) for s in _STOPWORDS])
    nt = F.size(toks)
    ns = F.size(F.filter(toks, lambda x: F.array_contains(stop, x)))
    nsh = F.size(F.filter(toks, lambda x: F.length(x) <= 2))
    z = (
        F.lit(_QC_BIAS)
        + _QC_W_LNTOK * F.log(1.0 + nt)
        + _QC_W_STOP * (ns.cast("double") / nt)
        + _QC_W_SHORT * (nsh.cast("double") / nt)
    )
    q = load(spark, sf_dir, "documents").select(
        (F.col("lang") == "en").alias("pos"),
        F.round(1e6 / (1.0 + F.exp(-z))).cast("long").alias("qs"),
    )
    b = q.groupBy(
        F.least(F.expr("qs div 100000"), F.lit(9)).alias("bucket")
    ).agg(
        F.count("*").alias("n"),
        F.sum("qs").alias("sq"),
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).alias("np"),
    )
    tot = b.agg(F.sum("n").alias("tn"))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    avg_pred = F.round(d("sq") / (F.col("n") * 1e6), 6)
    obs_rate = F.round(d("np") / F.col("n"), 6)
    term_u = F.round(
        1e6
        * (d("n") / d("tn"))
        * F.abs(d("sq") / (F.col("n") * 1e6) - d("np") / F.col("n"))
    ).cast("long")
    terms = b.crossJoin(F.broadcast(tot)).select(
        F.col("bucket").cast("int").alias("bucket"),
        F.col("n").cast("long").alias("n_docs"),
        avg_pred.alias("avg_pred"),
        obs_rate.alias("obs_rate"),
        term_u.alias("term_u"),
    )
    w_all = Window.partitionBy()
    return (
        terms.select(
            "bucket",
            "n_docs",
            "avg_pred",
            "obs_rate",
            F.round(
                F.sum("term_u").over(w_all).cast("double") / 1e6, 6
            ).alias("ece"),
        )
        .orderBy("bucket")
    )


# Target mixture weights (engine literals, summing to 100): the kind of
# hand-tuned source mix a training run pins in its config.
_BUDGET_WEIGHTS = {
    "src0": 30,
    "src1": 25,
    "src2": 20,
    "src3": 15,
    "src4": 10,
}
_BUDGET_MULTIPLE = 3  # total budget = 3× the corpus's own token count


@query(
    "text_token_budget_plan",
    oracle=f"""
    WITH tok AS (
      SELECT source, len(string_split(lower(text), ' ')) AS nt
      FROM documents),
    per AS (SELECT source, sum(nt) AS avail FROM tok GROUP BY source),
    tot AS (SELECT sum(avail) AS t FROM per),
    w AS (
      SELECT * FROM (VALUES
        {", ".join(f"('{s}', {w})" for s, w in sorted(_BUDGET_WEIGHTS.items()))}
      ) AS v(source, wt)),
    plan AS (
      SELECT p.source, p.avail, w.wt,
             ({_BUDGET_MULTIPLE} * t.t * w.wt) // 100 AS target
      FROM per p JOIN w ON w.source = p.source CROSS JOIN tot t)
    SELECT source,
           CAST(avail AS BIGINT) AS tokens_available,
           CAST(target AS BIGINT) AS tokens_target,
           CAST((2 * target * 10000 + avail) // (2 * avail) AS DOUBLE)
             / 10000.0 AS epochs,
           (target > 4 * avail) AS over_epoch_risk
    FROM plan ORDER BY source
    """,
)
def text_token_budget_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token BUDGET planner (the data-constrained scaling-law worksheet,
    Muennighoff et al. 2023): given hand-pinned target mixture weights
    and a total training budget (3× the corpus's own tokens here), how
    many tokens each source must contribute, how many EPOCHS of that
    source that implies, and whether it crosses the ~4-epoch
    repeated-data degradation threshold — the one-page plan a data lead
    signs off before a run. Exact integer arithmetic throughout: token
    inventories are one hash-agg pass, targets are integer
    `(budget·weight) div 100`, and the epochs ratio is the half-up
    integer-division idiom to 4 decimals. Output is |sources| rows."""
    tok = load(spark, sf_dir, "documents").select(
        "source", F.size(F.split(F.lower("text"), " ")).alias("nt")
    )
    per = tok.groupBy("source").agg(F.sum("nt").alias("avail"))
    tot = per.agg(F.sum("avail").alias("t"))
    w = spark.createDataFrame(
        sorted(_BUDGET_WEIGHTS.items()), "source string, wt int"
    )
    plan = (
        per.join(F.broadcast(w), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "avail",
            F.expr(f"({_BUDGET_MULTIPLE} * t * wt) div 100").alias(
                "target"
            ),
        )
    )
    return plan.select(
        "source",
        F.col("avail").cast("long").alias("tokens_available"),
        F.col("target").cast("long").alias("tokens_target"),
        (
            F.expr("CAST((2 * target * 10000 + avail) div (2 * avail)"
                   " AS DOUBLE)")
            / 10000.0
        ).alias("epochs"),
        (F.col("target") > 4 * F.col("avail")).alias("over_epoch_risk"),
    ).orderBy("source")


@query(
    "agg_effective_sample_size",
    oracle="""
    WITH fam AS (
      SELECT doc_id, source, md5(lower(trim(text))) AS digest
      FROM documents),
    sizes AS (SELECT digest, count(*) AS k FROM fam GROUP BY digest),
    wq AS (
      SELECT f.source,
             CAST(round(1e6 / s.k) AS BIGINT) AS w_u,
             CAST(round(1e12 / (s.k * s.k)) AS BIGINT) AS w2_u
      FROM fam f JOIN sizes s ON s.digest = f.digest),
    agg_ AS (
      SELECT source, count(*) AS n, sum(w_u) AS sw, sum(w2_u) AS sw2
      FROM wq GROUP BY source)
    SELECT source, CAST(n AS BIGINT) AS n_docs,
           round(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)
                 / CAST(sw2 AS DOUBLE) / 1e6, 4) AS ess,
           round(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)
                 / CAST(sw2 AS DOUBLE) / (1e6 * n), 6) AS ess_ratio
    FROM agg_ ORDER BY source
    """,
)
def agg_effective_sample_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective sample size (Kish ESS = (Σw)²/Σw²) of the soft-dedup
    weighting per source — the importance-sampling diagnostic that says
    how many INDEPENDENT documents a weighted source is really worth
    (pairs with `dedup_soft_weights`: identical when weights are equal,
    collapsing toward the family count as duplication concentrates).
    Weights (1/family-size) and their squares quantize to exact int64
    µ-units BEFORE summation, so both sums are partition-order-exact
    and the ESS ratio is one closed-form double per source. Digest
    machinery identical to the soft-weights key: text moves only as
    md5, family sizes join back on digest as a shuffle equi-join."""
    fam = load(spark, sf_dir, "documents").select(
        "doc_id", "source", F.md5(F.lower(F.trim("text"))).alias("digest")
    )
    sizes = fam.groupBy("digest").agg(F.count("*").alias("k"))
    wq = fam.join(sizes, "digest").select(
        "source",
        F.round(1e6 / F.col("k")).cast("long").alias("w_u"),
        F.round(1e12 / (F.col("k") * F.col("k"))).cast("long").alias("w2_u"),
    )
    agg_ = wq.groupBy("source").agg(
        F.count("*").alias("n"),
        F.sum("w_u").alias("sw"),
        F.sum("w2_u").alias("sw2"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    ess = d("sw") * d("sw") / d("sw2") / 1e6
    return agg_.select(
        "source",
        F.col("n").cast("long").alias("n_docs"),
        F.round(ess, 4).alias("ess"),
        F.round(ess / F.col("n"), 6).alias("ess_ratio"),
    ).orderBy("source")


# --- oracle-checked logistic-regression TRAINING (text_quality_train) ---
# The quality-classifier pipeline had apply (text_quality_classifier),
# calibration (agg_calibration_error), AUC, and decile lift — but not the
# TRAINING stage. Same parity discipline as sim_pca_power_iteration:
# per-row gradient contributions quantize to int64 nano-units, so each
# round's gradient is an EXACT integer sum in any partition order; the
# weight update runs through one deterministic double per feature and
# requantizes to micro-units, so both engines walk bit-identical states.
_LR_ROUNDS = 12
_LR_RATE = 16.0

_LR_Q9 = (
    "CAST(CASE WHEN {v} >= 0 THEN floor(({v}) * 1e9 + 0.5)"
    " ELSE -floor(-({v}) * 1e9 + 0.5) END AS BIGINT)"
)
_LR_Z = (
    "(CAST(w.w0 AS DOUBLE) + CAST(w.w1 AS DOUBLE) * t.x1"
    " + CAST(w.w2 AS DOUBLE) * t.x2"
    " + CAST(w.w3 AS DOUBLE) * t.x3) / 1e6"
)
_LR_U = (
    "CAST(w.{wc} AS DOUBLE) / 1e6"
    f" + {_LR_RATE} * (CAST(g.{{sc}} AS DOUBLE) / 1e9) / nn.n"
)
_LR_REQ = (
    "CAST(CASE WHEN {u} >= 0 THEN floor(({u}) * 1e6 + 0.5)"
    " ELSE -floor(-({u}) * 1e6 + 0.5) END AS BIGINT)"
)


def _lr_round_sql(k: int) -> str:
    p = k - 1
    s = ", ".join(
        f"sum(CAST({_LR_Q9.format(v=v)} AS HUGEINT)) AS s{j}"
        for j, v in enumerate(["t.r", "t.r * t.x1", "t.r * t.x2", "t.r * t.x3"])
    )
    upd = ", ".join(
        _LR_REQ.format(u=_LR_U.format(wc=f"w{j}", sc=f"s{j}")) + f" AS w{j}"
        for j in range(4)
    )
    # MATERIALIZED: w{{k}} is referenced by both g{{k+1}} and w{{k+1}} —
    # default CTE inlining would duplicate the whole upstream tree per
    # reference (2^rounds planner blowup; observed as an fd-exhaustion
    # crash at 4 rounds and a planner hang at 12)
    return f"""
    g{k} AS MATERIALIZED (
      SELECT {s}
      FROM (
        SELECT z.y - (0.5 + 0.5 * (z.z / (1.0 + abs(z.z)))) AS r,
               z.x1, z.x2, z.x3
        FROM (
          SELECT f.y, f.x1, f.x2, f.x3,
                 {_LR_Z.replace('t.', 'f.')} AS z
          FROM f CROSS JOIN w{p} w) z) t),
    w{k} AS MATERIALIZED (
      SELECT {upd}
      FROM w{p} w CROSS JOIN g{k} g CROSS JOIN nn)"""


_LR_FEATURES = ["bias", "chars_k", "tokens_h", "stopwords_10"]

_LR_ORACLE = (
    f"""
    WITH base AS MATERIALIZED (
      SELECT n_chars,
             len(string_split(lower(text), ' ')) AS n_tokens,
             len(list_filter(string_split(lower(text), ' '),
                             x -> list_contains({_STOPWORDS}, x))) AS n_stop
      FROM documents),
    f AS MATERIALIZED (
      SELECT CASE WHEN n_tokens >= 20 AND n_stop > 0
                  THEN 1.0 ELSE 0.0 END AS y,
             CAST(n_chars AS DOUBLE) / 1000.0 AS x1,
             CAST(n_tokens AS DOUBLE) / 100.0 AS x2,
             CAST(n_stop AS DOUBLE) / 10.0 AS x3
      FROM base),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM f),
    w0 AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1,
                  CAST(0 AS BIGINT) AS w2, CAST(0 AS BIGINT) AS w3),"""
    + ",".join(_lr_round_sql(k) for k in range(1, _LR_ROUNDS + 1))
    + "".join(
        f"""
    {'SELECT' if j == 0 else 'UNION ALL SELECT'} CAST({j} AS INT) AS j,
           '{name}' AS feature,
           round(CAST(w{_LR_ROUNDS}.w{j} AS DOUBLE) / 1e6, 6) AS weight
    FROM w{_LR_ROUNDS}"""
        for j, name in enumerate(_LR_FEATURES)
    )
    + "\n    ORDER BY j"
)


@query("text_quality_train", oracle=_LR_ORACLE)
def text_quality_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed logistic-regression TRAINING, oracle-checked — the
    stage the quality-classifier pipeline was missing (train → apply
    `text_quality_classifier` → calibrate → AUC). Twelve full-gradient
    rounds distilling `text_quality_score`'s keep/flag rule into a
    continuous model over (bias, n_chars/1000, tokens/100,
    stopwords/10) — the fastText-style practice of training a shallow
    classifier on heuristic-labeled data so the gate generalizes past
    the rule's hard thresholds (train accuracy 0.89 vs 0.86 base rate
    at sf0.01; positive token/stopword weights, negative bias — the
    interpretable shape the rule implies). The squashing function is
    the rational fast sigmoid 0.5 + 0.5·z/(1+|z|), NOT 1/(1+exp(−z)):
    exp is not correctly-rounded-specified, so JVM Math.exp and DuckDB
    libm exp can differ by an ulp, and near a .5 nano-unit boundary one
    ulp flips a quantized per-row gradient — abs/+/×/÷ are all IEEE
    correctly-rounded, making every per-row double bit-identical across
    engines by construction. Parity discipline is
    `sim_pca_power_iteration`'s: each
    per-row gradient contribution (y − σ̃(w·x))·x_j quantizes to an
    int64 NANO-unit, so the round's gradient is an exact integer sum
    (decimal(38,0) / HUGEINT — wrap-free) in any partition order; the
    weight update is one deterministic double per feature, requantized
    to micro-units; both engines therefore walk bit-identical weight
    states through every round, which float gradient descent cannot
    claim. Scale: each round is ONE map-side-combined aggregate over
    the corpus (4 nano-int sums — bytes of shuffle); driver state is 4
    integers; rounds = jobs, the same amortization argument as
    PageRank/BPE."""
    import math

    d = load(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), " ")
    stop = F.array(*[F.lit(s) for s in _STOPWORDS])
    base = d.select(
        "n_chars",
        F.size(toks).alias("n_tokens"),
        F.size(F.filter(toks, lambda x: F.array_contains(stop, x))).alias(
            "n_stop"
        ),
    )
    feat = base.select(
        F.when((F.col("n_tokens") >= 20) & (F.col("n_stop") > 0), 1.0)
        .otherwise(0.0)
        .alias("y"),
        (F.col("n_chars").cast("double") / 1000.0).alias("x1"),
        (F.col("n_tokens").cast("double") / 100.0).alias("x2"),
        (F.col("n_stop").cast("double") / 10.0).alias("x3"),
    )
    n = float(feat.count())

    def q9(c):
        return (
            F.when(c >= 0, F.floor(c * 1e9 + F.lit(0.5)))
            .otherwise(-F.floor((-c) * 1e9 + F.lit(0.5)))
            .cast("long")
        )

    wq = [0, 0, 0, 0]
    for _ in range(_LR_ROUNDS):
        z = (
            F.lit(float(wq[0]))
            + F.lit(float(wq[1])) * F.col("x1")
            + F.lit(float(wq[2])) * F.col("x2")
            + F.lit(float(wq[3])) * F.col("x3")
        ) / 1e6
        # Rational "fast sigmoid" 0.5 + 0.5·z/(1+|z|) instead of
        # 1/(1+exp(−z)): abs/+/×/÷ are correctly-rounded-specified in
        # IEEE-754, so both engines produce the identical double for
        # every input — exp() is NOT (JVM Math.exp vs libm may differ by
        # an ulp, which near a .5 nano-unit boundary would flip a
        # quantized per-row gradient). Same monotone (0,1) squashing,
        # same sign structure for the residual; the trained gate's
        # discriminative power is pinned in tests/test_round6_ops.py.
        r = F.col("y") - (F.lit(0.5) + F.lit(0.5) * (z / (F.lit(1.0) + F.abs(z))))
        row = feat.agg(
            F.sum(q9(r).cast("decimal(38,0)")).alias("s0"),
            F.sum(q9(r * F.col("x1")).cast("decimal(38,0)")).alias("s1"),
            F.sum(q9(r * F.col("x2")).cast("decimal(38,0)")).alias("s2"),
            F.sum(q9(r * F.col("x3")).cast("decimal(38,0)")).alias("s3"),
        ).collect()[0]
        for j, s in enumerate([row.s0, row.s1, row.s2, row.s3]):
            # two-step float conversion mirrors the oracle's
            # CAST(s AS DOUBLE) / 1e9 exactly (a fused int/1e9 true
            # division could differ by an ulp past 2^53)
            u = wq[j] / 1e6 + _LR_RATE * (float(int(s)) / 1e9) / n
            wq[j] = (
                int(math.floor(u * 1e6 + 0.5))
                if u >= 0
                else -int(math.floor(-u * 1e6 + 0.5))
            )

    out = spark.createDataFrame(
        [(j, _LR_FEATURES[j], wq[j]) for j in range(4)],
        "j int, feature string, wq long",
    )
    return out.select(
        "j",
        "feature",
        F.round(F.col("wq").cast("double") / 1e6, 6).alias("weight"),
    ).orderBy("j")
