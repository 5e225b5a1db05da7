"""textops.quality — split from the flat textops.py (r7); operator bodies unchanged, see the package __init__."""


from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query

from .corpus import (  # noqa: F401
    _STOPWORDS,
    _tokens,
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


