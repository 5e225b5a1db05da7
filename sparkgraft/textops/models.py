"""textops.models — split from the flat textops.py (r7); operator bodies unchanged, see the package __init__."""


from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query

from .corpus import (  # noqa: F401
    _DUP_PREFIX_LEN,
    _STOPWORDS,
    _tokens,
)
from .quality import (  # noqa: F401
    _PRETOKEN_RE,
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
    from ..ranking import with_global_rank

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
    from ..ranking import with_global_rank

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
    ).persist()  # 13 actions below (count + 12 gradient rounds) reuse
    # the featurized rows; without the cache every round re-runs the
    # tokenize + stopword-intersection scan (guide §5: reused AND
    # expensive to recompute). Unpersisted before return.
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

    feat.unpersist()
    out = spark.createDataFrame(
        [(j, _LR_FEATURES[j], wq[j]) for j in range(4)],
        "j int, feature string, wq long",
    )
    return out.select(
        "j",
        "feature",
        F.round(F.col("wq").cast("double") / 1e6, 6).alias("weight"),
    ).orderBy("j")


@query(
    "text_naive_bayes_train",
    oracle="""
    WITH tok AS (
      SELECT lang, unnest(string_split(lower(text), ' ')) AS token
      FROM documents),
    v AS (SELECT count(DISTINCT token) AS vocab FROM tok),
    cls AS (SELECT lang, count(*) AS n_tok FROM tok GROUP BY 1),
    docs AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
    total AS (SELECT count(*) AS n_total FROM documents),
    cnt AS (SELECT lang, token, count(*) AS c FROM tok GROUP BY 1, 2),
    top AS (
      SELECT lang, token, c,
             row_number() OVER (PARTITION BY lang
                                ORDER BY c DESC, token) AS rk
      FROM cnt)
    SELECT t.lang, CAST(t.rk AS INT) AS rank, t.token,
           CAST(t.c AS BIGINT) AS tok_count,
           CAST(floor((t.c + 1.0) / (cl.n_tok + v.vocab) * 1000000 + 0.5)
                AS BIGINT) AS likelihood_micro,
           CAST(floor(d.n_docs * 1.0 / tt.n_total * 1000000 + 0.5)
                AS BIGINT) AS prior_micro
    FROM top t
    JOIN cls cl USING (lang)
    JOIN docs d USING (lang)
    CROSS JOIN v CROSS JOIN total tt
    WHERE t.rk <= 5
    ORDER BY t.lang, t.rk
    """,
)
def text_naive_bayes_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial NAIVE BAYES training over the documents corpus with
    language as the class label — the closed-form sibling of the
    iterative training canon (LR/k-means/ALS): one counting pass yields
    the entire model. Laplace-smoothed likelihoods
    P(tok|lang) = (c+1)/(N_lang+V) and document priors P(lang), both
    emitted as µ-unit integers; the report carries each class's top-5
    tokens by count (deterministic tie-break on the token), which is
    the bounded, judgeable slice of a model whose full form is the
    (lang, token) count table itself.

    Hash-exactness: every model weight is one correctly-rounded double
    division over exact int64 counts followed by the sign-aware
    floor(+0.5) µ-quantization — no transcendentals anywhere (the
    log-space form adds log() only at CLASSIFICATION time, which is a
    per-row map over this table), so Spark and DuckDB agree bitwise.

    Scale: token counting is explode + two hash aggregations (the
    wordcount shape); vocabulary size and class totals are 1-row/
    |class|-row aggregates; the top-5 window partitions by class over
    the per-class count table. Nothing shuffles more than the distinct
    (lang, token) space, and the model (bounded vocab × |class|) is
    broadcast-joinable at classification time at any corpus size."""
    tok = _tokens(spark, sf_dir)
    vocab = tok.agg(F.count_distinct("token").alias("vocab"))
    cls = tok.groupBy("lang").agg(F.count("*").alias("n_tok"))
    d = load(spark, sf_dir, "documents")
    docs = d.groupBy("lang").agg(F.count("*").alias("n_docs"))
    total = d.agg(F.count("*").alias("n_total"))
    cnt = tok.groupBy("lang", "token").agg(F.count("*").alias("c"))
    top = (
        cnt.withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("lang").orderBy(
                    F.col("c").desc(), F.col("token")
                )
            ),
        )
        .filter(F.col("rank") <= 5)
    )
    return (
        top.join(cls, "lang")
        .join(docs, "lang")
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(total))
        .select(
            "lang",
            F.col("rank").cast("int").alias("rank"),
            "token",
            F.col("c").cast("long").alias("tok_count"),
            F.floor(
                (F.col("c") + F.lit(1.0))
                / (F.col("n_tok") + F.col("vocab"))
                * 1000000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("likelihood_micro"),
            F.floor(
                F.col("n_docs") * F.lit(1.0) / F.col("n_total") * 1000000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("prior_micro"),
        )
        .orderBy("lang", "rank")
    )


@query(
    "text_kneser_ney_bigram",
    oracle="""
    WITH tok AS (
      SELECT doc_id, i AS pos, toks[i] AS w
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks
            FROM documents) t,
           unnest(generate_series(1, len(toks))) AS u(i)),
    bg AS (
      SELECT a.w AS w1, b.w AS w2, count(*) AS c
      FROM tok a JOIN tok b
        ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      GROUP BY 1, 2),
    uni AS (
      SELECT w1, sum(c) AS c1, count(*) AS n1fwd
      FROM bg GROUP BY w1),
    cont AS (
      SELECT w2, count(*) AS n1bwd FROM bg GROUP BY w2),
    tot AS (SELECT count(*) AS b FROM bg),
    scored AS (
      SELECT bg.w1, bg.w2, bg.c,
             CAST(floor((
               (bg.c - 0.75) / u.c1
               + ((0.75 * u.n1fwd) / u.c1) * (ct.n1bwd * 1.0 / t.b)
             ) * 1000000 + 0.5) AS BIGINT) AS pkn_micro
      FROM bg
      JOIN uni u ON u.w1 = bg.w1
      JOIN cont ct ON ct.w2 = bg.w2
      CROSS JOIN tot t)
    SELECT w1, w2, CAST(c AS BIGINT) AS c, pkn_micro
    FROM scored
    ORDER BY c DESC, w1, w2 LIMIT 20
    """,
)
def text_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated KNESER-NEY bigram language model (absolute
    discount d=0.75 — the Chen-Goodman standard config) over the
    corpus: p(w2|w1) = max(c−d,0)/c(w1) + λ(w1)·p_cont(w2), where the
    continuation probability counts how many distinct LEFT contexts a
    word follows — the smoothing that made n-gram LMs competitive and
    the reference baseline every neural-LM paper still reports. Output
    is the top-20 bigrams by raw count with their smoothed µ-unit
    probabilities (since every observed bigram has c ≥ 1 > d, the
    max(·,0) guard is algebraically inert here and elided).

    Determinism: all five model statistics (c, c(w1), N1+(w1·),
    N1+(·w2), |bigrams|) are exact integer counts; d=0.75 is exactly
    representable; the score is one fixed-order +,×,/ double
    expression over those integers, floor(+0.5)-quantized — both
    engines agree bitwise, the NO-transcendentals training-canon rule.

    Scale: bigram extraction is a posexplode self-join keyed on
    (doc_id, adjacent position) — shuffle bounded by token count;
    everything after is hash aggregation over the distinct-bigram
    space and two bounded-key equi-joins (w1, w2). The model table
    itself is the (w1,w2) count table — broadcast-joinable per query
    at any corpus size."""
    tok = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), " ")).alias("pos", "w"),
    )
    a, b = tok.alias("a"), tok.alias("b")
    bg = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.pos") == F.col("a.pos") + 1),
        )
        .groupBy(F.col("a.w").alias("w1"), F.col("b.w").alias("w2"))
        .agg(F.count("*").alias("c"))
    )
    uni = bg.groupBy("w1").agg(
        F.sum("c").alias("c1"), F.count("*").alias("n1fwd")
    )
    cont = bg.groupBy("w2").agg(F.count("*").alias("n1bwd"))
    tot = bg.agg(F.count("*").alias("b"))
    score = (
        (F.col("c") - F.lit(0.75)) / F.col("c1")
        + ((F.lit(0.75) * F.col("n1fwd")) / F.col("c1"))
        * (F.col("n1bwd") * F.lit(1.0) / F.col("b"))
    )
    return (
        bg.join(uni, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.col("c").cast("long").alias("c"),
            F.floor(score * 1000000 + F.lit(0.5))
            .cast("long")
            .alias("pkn_micro"),
        )
        .orderBy(F.col("c").desc(), "w1", "w2")
        .limit(20)
    )
