"""Vector similarity + multimodal-join operators over the embeddings table
(SURVEY.md §2.11 — sim_*, dedup_embedding_cosine, mm_doc_embedding_join).

Kernels are pure higher-order array functions (zip_with + aggregate), JVM-side
and codegen-friendly — no UDFs. Precision contract: the corpus stores
float32 vectors; every kernel casts element-wise to double BEFORE multiplying
and accumulates left-to-right in double, which is bitwise-reproducible in any
IEEE engine, so the DuckDB oracle uses the identical element-cast formula
(its builtin ``list_cosine_similarity`` accumulates in float32 and diverges
in the 7th decimal — never use it in an oracle).

Scale posture (100 TB): the exact all-pairs kernels (`sim_cosine_topk`,
`dedup_embedding_cosine`) are the small-N verification baseline; the scale
paths are `sim_lsh_buckets` (random-hyperplane bucketing prunes the O(n²)
pair space to within-bucket pairs) and `sim_ivf_knn` (inverted-file cells:
probe-2 of C centroids caps each query's candidate set at ~2N/C). Query sets
and centroid sets are bounded and broadcast; nothing collects vectors to the
driver.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load
from .registry import query

_DIM = 64  # fixed embedding width (FIXTURES.md: embeddings.embedding)

# Broadcast (ids, L2-normalized float64 matrix) per corpus dir — the dense
# "index" every gemm kernel scores against. Building it is one bounded
# Arrow collect (N×64 floats, ~1 MB at sf0.1); caching it across queries is
# the standard ANN index amortization. Keyed by sf_dir: corpora are
# immutable driver fixtures.
_INDEX_CACHE: dict = {}


def _arrow_matrix(arr, n_rows: int):
    """FixedSizeList/List arrow column → (n_rows, _DIM) float64 matrix,
    via the flat values buffer — no per-row Python list objects."""
    import numpy as np
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    return flat.astype(np.float64).reshape(n_rows, _DIM)


def _normalized_index(spark: SparkSession, sf_dir: str):
    """Broadcast of (sorted vec_ids, row-normalized embedding matrix)."""
    import numpy as np

    key = sf_dir.rstrip("/")
    hit = _INDEX_CACHE.get(key)
    if hit is not None:
        return hit
    tbl = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .toArrow()
    )
    ids = tbl["vec_id"].to_numpy()
    mat = _arrow_matrix(tbl["embedding"], len(ids))
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((ids, mat))
    _INDEX_CACHE[key] = bc
    return bc


def dot(a: Column, b: Column) -> Column:
    """Σ double(a_i)·double(b_i), left-to-right double accumulation."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# DuckDB twin of the kernel above — identical cast + accumulation order.
_SQL_DOT = (
    "list_aggregate(list_transform(list_zip({a}, {b}),"
    " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')"
)


def _sql_dot(a: str, b: str) -> str:
    return _SQL_DOT.format(a=a, b=b)


def _sql_cosine(a: str, b: str) -> str:
    return (
        f"({_sql_dot(a, b)} / "
        f"(sqrt({_sql_dot(a, a)}) * sqrt({_sql_dot(b, b)})))"
    )


@query(
    "sim_cosine_topk",
    oracle=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round({_sql_cosine('a.embedding', 'b.embedding')}, 6) AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    ORDER BY cos_sim DESC, vec_a, vec_b
    LIMIT 20
    """,
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 most-similar pairs — the brute-force baseline that
    `sim_lsh_buckets` is measured against, as a blocked matrix multiply:
    the normalized corpus is broadcast once (N×64 doubles), each executor
    scores its Arrow batch against it with one BLAS gemm, pre-reduces to
    a local top-20 (sorted by the SAME (rounded sim, id, id) key as the
    final order, so the global winners provably survive the cut), and the
    tiny candidate union is globally ordered. No O(n²) row join ever
    materializes; executor work is O(rows_per_batch × N) flops. The whole
    Python path is Arrow-native (`mapInArrow`): flat float32 buffers
    reshape straight into the gemm operand, no per-row list objects.

    The broadcast side is the bounded piece (it is the "index" — built
    once per corpus and cached, the standard ANN amortization); at corpus
    scale where N×64 no longer broadcasts, the prune paths
    (`sim_lsh_buckets`, `sim_ivf_knn`) replace the dense gemm.

    Values agree with the oracle's left-to-right double kernel at the
    rounded 6th decimal (float64 dot differs only in the last ulp)."""
    import numpy as np
    import pyarrow as pa

    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    bc = _normalized_index(spark, sf_dir)
    k = 20

    def score(batches):
        ids, index = bc.value
        for rb in batches:
            a_ids = rb.column("vec_id").to_numpy()
            block = _arrow_matrix(rb.column("embedding"), len(a_ids))
            block /= np.linalg.norm(block, axis=1, keepdims=True)
            sims = np.round(block @ index.T, 6)
            # keep only pairs (a, b) with a.vec_id < b.vec_id
            mask = ids[None, :] > a_ids[:, None]
            ai, bi = np.nonzero(mask)
            s = sims[ai, bi]
            sel = np.lexsort((ids[bi], a_ids[ai], -s))[:k]
            yield pa.RecordBatch.from_pydict(
                {"vec_a": a_ids[ai][sel], "vec_b": ids[bi][sel], "cos_sim": s[sel]}
            )

    candidates = e.mapInArrow(score, "vec_a long, vec_b long, cos_sim double")
    return candidates.orderBy(F.desc("cos_sim"), "vec_a", "vec_b").limit(k)


@query(
    "sim_knn_per_query",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings
               WHERE vec_id % 100 = 0),
    scored AS (
      SELECT q.qid, e.vec_id,
             round({_sql_cosine('q.qvec', 'e.embedding')}, 6) AS cos_sim
      FROM q JOIN embeddings e ON e.vec_id <> q.qid)
    SELECT qid, vec_id, cos_sim, rnk FROM (
      SELECT *, row_number() OVER (PARTITION BY qid
                                   ORDER BY cos_sim DESC, vec_id) AS rnk
      FROM scored) t WHERE rnk <= 5
    """,
)
def sim_knn_per_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k=5 nearest neighbors for each query vector (vec_id % 100 = 0 — a
    deterministic arithmetic sample, SURVEY §2.6 policy). The bounded query
    set is broadcast, so the scan of the big side never shuffles; the only
    shuffle is the per-query top-k window over N·Q scored rows."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    scored = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(cosine(F.col("qvec"), F.col("embedding")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), "vec_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("qid", "vec_id", "cos_sim", "rnk")
    )


@query(
    "dedup_embedding_cosine",
    oracle=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round({_sql_cosine('a.embedding', 'b.embedding')}, 6) AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {_sql_cosine('a.embedding', 'b.embedding')} >= 0.4
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space near-duplicate pairs: cosine ≥ τ (τ=0.4 — sized to
    this corpus, whose max pairwise cosine is 0.51; real pipelines run
    τ≈0.95 over `sim_lsh_buckets` candidates instead of all pairs).

    Same blocked-gemm shape as sim_cosine_topk: cached broadcast
    normalized index, one BLAS multiply per Arrow batch, emit only
    qualifying pairs (the output is small — the threshold is the filter).
    The unrounded score does the thresholding, exactly like the oracle."""
    import numpy as np
    import pyarrow as pa

    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    bc = _normalized_index(spark, sf_dir)
    tau = 0.4

    def near_pairs(batches):
        ids, index = bc.value
        for rb in batches:
            a_ids = rb.column("vec_id").to_numpy()
            block = _arrow_matrix(rb.column("embedding"), len(a_ids))
            block /= np.linalg.norm(block, axis=1, keepdims=True)
            sims = block @ index.T
            ai, bi = np.nonzero((sims >= tau) & (ids[None, :] > a_ids[:, None]))
            yield pa.RecordBatch.from_pydict(
                {
                    "vec_a": a_ids[ai],
                    "vec_b": ids[bi],
                    "cos_sim": np.round(sims[ai, bi], 6),
                }
            )

    return e.mapInArrow(near_pairs, "vec_a long, vec_b long, cos_sim double")


# Random-hyperplane LSH: BANDS independent signatures of BITS sign-bits each.
# Fixed seed → the planes are constants of the engine, shipped broadcast.
_LSH_BANDS = 16
_LSH_BITS = 6
_LSH_SEED = 20260813


def _hyperplanes() -> list[tuple[int, int, list[float]]]:
    rng = random.Random(_LSH_SEED)
    return [
        (band, bit, [rng.gauss(0.0, 1.0) for _ in range(_DIM)])
        for band in range(_LSH_BANDS)
        for bit in range(_LSH_BITS)
    ]


def lsh_signatures(spark: SparkSession, vecs: DataFrame) -> DataFrame:
    """(vec_id, band, band_key): sign-bit signature of each vector against
    each band's hyperplanes. The 96 planes are fixed-seed constants
    (engine literals), broadcast as one (bands·bits)×dim matrix; each
    Arrow batch computes every sign bit with a single gemm and packs the
    band keys — linear in N, one Python pass, no per-plane row blow-up."""
    import numpy as np
    import pandas as pd

    planes = np.array(
        [p for _, _, p in _hyperplanes()], dtype=np.float64
    )  # (_LSH_BANDS*_LSH_BITS) × _DIM, ordered band-major then bit
    bc = spark.sparkContext.broadcast(planes)

    def sign_bands(batches):
        mat = bc.value
        weights = (1 << np.arange(_LSH_BITS, dtype=np.int64))[None, None, :]
        for pdf in batches:
            block = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            bits = (block @ mat.T) > 0  # n × (bands·bits)
            keys = (
                bits.reshape(len(block), _LSH_BANDS, _LSH_BITS) * weights
            ).sum(axis=2)
            n = len(block)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].to_numpy(), _LSH_BANDS),
                    "band": np.tile(np.arange(_LSH_BANDS, dtype=np.int32), n),
                    "band_key": keys.reshape(-1),
                }
            )

    return vecs.mapInPandas(sign_bands, "vec_id long, band int, band_key long")


@query("sim_lsh_buckets")  # rows-only: plane seeds are engine-specific
def sim_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate pairs from random-hyperplane LSH (16 bands × 6 bits).

    The O(n²) pair space is pruned to within-bucket pairs; recall against
    the exact `sim_cosine_topk` is invariant-tested (tests/test_vectorops).
    """
    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    sig = lsh_signatures(spark, e)
    a = sig.alias("a")
    b = sig.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )


_IVF_CENTROID_MOD = 50  # centroids = vec_id % 50 == 0 → C ≈ N/50 cells
_IVF_PROBES = 2


@query("sim_ivf_knn")  # rows-only: centroid choice is engine-specific
def sim_ivf_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate kNN — the coarse-quantization scale path.

    Cells: every vector is assigned to its nearest centroid (broadcast
    nested-loop over C centroids, argmax by cosine). Queries probe their 2
    nearest cells and rank only those cells' members — candidate work per
    query drops from N to ~2N/C. Same query set and k as the exact
    `sim_knn_per_query`, which serves as its recall oracle.

    Both dense kernels (cell assignment, candidate scoring) run as one
    gemm per Arrow batch against the broadcast centroid/query matrices —
    the centroid and query sets are the bounded pieces, exactly what IVF
    assumes at corpus scale."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents_pdf = e.filter(F.col("vec_id") % _IVF_CENTROID_MOD == 0).toPandas()
    c_ids = cents_pdf["vec_id"].to_numpy()
    c_mat = np.stack(cents_pdf["embedding"].to_numpy()).astype(np.float64)
    c_mat /= np.linalg.norm(c_mat, axis=1, keepdims=True)

    q_pdf = e.filter(F.col("vec_id") % 100 == 0).toPandas()
    q_ids = q_pdf["vec_id"].to_numpy()
    q_mat = np.stack(q_pdf["embedding"].to_numpy()).astype(np.float64)
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)

    # queries probe their _IVF_PROBES nearest cells (tiny, driver-side)
    qc = q_mat @ c_mat.T
    probe_order = np.argsort(-qc, axis=1, kind="stable")[:, :_IVF_PROBES]
    probed_cells = {
        int(q_ids[i]): {int(c_ids[j]) for j in probe_order[i]}
        for i in range(len(q_ids))
    }
    bc = spark.sparkContext.broadcast(
        (c_ids, c_mat, q_ids, q_mat, probed_cells)
    )

    def score_cells(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cids, cmat, qids, qmat, probes = bc.value
        for pdf in batches:
            v_ids = pdf["vec_id"].to_numpy()
            block = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            block /= np.linalg.norm(block, axis=1, keepdims=True)
            # cell assignment: argmax over centroids (deterministic: ties
            # break to the lowest centroid index)
            cells = cids[np.argmax(block @ cmat.T, axis=1)]
            sims = np.round(block @ qmat.T, 6)
            out_q, out_v, out_s = [], [], []
            for qi, qid in enumerate(qids):
                hit = np.isin(cells, list(probes[int(qid)])) & (v_ids != qid)
                out_q.extend([qid] * int(hit.sum()))
                out_v.extend(v_ids[hit])
                out_s.extend(sims[hit, qi])
            yield pd.DataFrame(
                {"qid": out_q, "vec_id": out_v, "cos_sim": out_s}
            )

    cand = e.mapInPandas(score_cells, "qid long, vec_id long, cos_sim double")
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), "vec_id")
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("qid", "vec_id", "cos_sim", "rnk")
    )


@query(
    "mm_doc_embedding_join",
    oracle=f"""
    SELECT e.label,
           count(*) AS n_docs,
           count(DISTINCT d.lang) AS n_langs,
           round(avg(d.n_chars), 6) AS avg_chars,
           round(avg(sqrt({_sql_dot('e.embedding', 'e.embedding')})), 6) AS avg_norm
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    GROUP BY e.label
    """,
)
def mm_doc_embedding_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal relation: text row ⋈ vector row on the shared id, then
    per-label stats over both modalities (doc lengths + vector norms)."""
    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "embeddings")
    return (
        d.join(e, d["doc_id"] == e["vec_id"])
        .groupBy("label")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
            F.round(F.avg(norm(F.col("embedding"))), 6).alias("avg_norm"),
        )
    )
