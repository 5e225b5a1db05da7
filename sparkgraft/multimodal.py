"""Multimodal column plumbing (SURVEY.md §2.11, BASELINE.json mandate).

Images/audio/video are carried as opaque ``binary`` payload columns with a
typed metadata struct alongside — the storage model a 100 TB multimodal
training corpus uses (payload bytes stay columnar in parquet; all
filtering/joining happens on the typed metadata without touching bytes).

The corpus has no real media files (and this container has no codec
libraries), so the *payload* is derived deterministically from
``documents.text`` (UTF-8 bytes) and the *decode* step is an explicit
stub (``decode_media``) — but everything Spark-side is real and verified:
the binary column flows through Arrow into ``mapInPandas`` workers, the
metadata struct is built/queried with native functions, and frame
sampling fans one row out per fixed-size byte window.

At scale: ``mapInPandas`` processes Arrow batches per partition — no
driver collection, no per-row Python calls; payload bytes are only
deserialized inside the worker that needs them, and batch size is bounded
by ``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkgraft.catalog import load
from sparkgraft.registry import query

_FRAME_BYTES = 256

_MODALITIES = ("image", "audio", "video")
_MIME = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}


# Codec probe, once at import: the image path is real wherever Pillow is
# installed; this container ships no codec libs so the probe comes back
# None here and decode_media falls through to the documented stub.
try:
    import PIL.Image as _pil_image
except ImportError:  # pragma: no cover — exercised in codec-equipped envs
    _pil_image = None


def decode_media(payload: bytes, modality: str) -> dict:
    """Decode a media payload into pixels/samples/frames.

    Images: decoded with Pillow when it is installed — returns width/
    height/mode/n_pixels from the real bitstream (tested behind
    ``pytest.importorskip`` in tests/test_udfs_multimodal.py so the same
    test suite exercises it in codec-equipped deployments).

    Audio/video (and images without Pillow): STUB — this environment
    ships no codec libraries (PIL/librosa/ffmpeg). The Spark-side
    plumbing (binary column, Arrow transfer, batch shape) is real; only
    the innermost codec call is absent. A deployment wires librosa/
    PyAV here; everything around it is already tested.
    """
    if modality == "image" and _pil_image is not None:
        import io

        img = _pil_image.open(io.BytesIO(payload))
        img.load()
        return {
            "modality": "image",
            "width": img.width,
            "height": img.height,
            "mode": img.mode,
            "n_pixels": img.width * img.height,
        }
    raise NotImplementedError(
        "media decoding requires codec libraries not present in this "
        "environment; see decode_media docstring"
    )


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach the opaque binary payload + typed metadata struct to each
    document: modality assigned deterministically (doc_id mod 3), payload
    = UTF-8 bytes standing in for media bytes."""
    modality = F.element_at(
        F.array(*[F.lit(m) for m in _MODALITIES]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    mime = F.element_at(
        F.create_map(
            *[x for m in _MODALITIES for x in (F.lit(m), F.lit(_MIME[m]))]
        ),
        modality,
    )
    payload = F.encode("text", "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            modality.alias("modality"),
            mime.alias("mime"),
            F.octet_length(payload).alias("n_bytes"),
        ).alias("meta"),
    )


# Shared oracle fragment: the same modality assignment in SQL.
_MODALITY_SQL = (
    "case when doc_id % 3 = 0 then 'image' "
    "when doc_id % 3 = 1 then 'audio' else 'video' end"
)


@query(
    "mm_binary_features",
    oracle=f"""
    select doc_id, {_MODALITY_SQL} as modality,
           octet_length(encode(text)) as n_bytes
    from documents
    """,
)
def mm_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction shape: binary payloads stream through Arrow into
    a mapInPandas worker which measures each payload (stand-in for a real
    decode+featurize — see decode_media). Verifies bytes arrive intact:
    the worker-computed length must equal DuckDB's octet_length."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": [m["modality"] for m in pdf["meta"]],
                    # measured from the actual bytes in the worker, NOT
                    # copied from metadata — this is the decode stand-in.
                    "n_bytes": [len(b) for b in pdf["payload"]],
                }
            )

    mm = with_payload(load(spark, sf_dir, "documents"))
    return mm.mapInPandas(extract, "doc_id long, modality string, n_bytes long")


@query(
    "mm_frame_sample",
    oracle=f"""
    with f as (
      select doc_id, octet_length(encode(text)) as n_bytes from documents
    ),
    ex as (
      select doc_id, n_bytes,
             unnest(range(0, cast(ceil(n_bytes / {_FRAME_BYTES}.0) as bigint)))
               as frame_idx
      from f
    )
    select doc_id, frame_idx,
           least({_FRAME_BYTES}, n_bytes - frame_idx * {_FRAME_BYTES}) as frame_len
    from ex
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: fan each payload out to one row per fixed-size byte
    window (the video-frame / audio-chunk extraction shape), inside
    mapInPandas so the fan-out happens executor-side on Arrow batches."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, lens = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                for i in range(0, n, _FRAME_BYTES):
                    ids.append(doc_id)
                    idxs.append(i // _FRAME_BYTES)
                    lens.append(min(_FRAME_BYTES, n - i))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_len": lens}
            )

    mm = with_payload(load(spark, sf_dir, "documents"))
    return mm.mapInPandas(frames, "doc_id long, frame_idx long, frame_len long")


@query(
    "mm_modal_metadata",
    oracle=f"""
    select {_MODALITY_SQL} as modality,
           count(*) as n_docs,
           sum(octet_length(encode(text)))::BIGINT as total_bytes
    from documents
    group by 1
    """,
)
def mm_modal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only scan: aggregate corpus composition from the typed
    metadata struct without ever deserializing a payload byte — the
    cheap-path query pattern that makes opaque-binary tables navigable
    at 100 TB."""
    mm = with_payload(load(spark, sf_dir, "documents"))
    return mm.groupBy(F.col("meta.modality").alias("modality")).agg(
        F.count("*").alias("n_docs"),
        F.sum("meta.n_bytes").alias("total_bytes"),
    )


_THUMB_BYTES = 64


@query(
    "mm_payload_resize",
    oracle=f"""
    select doc_id, {_MODALITY_SQL} as modality,
           least({_THUMB_BYTES}, octet_length(encode(text)))::BIGINT as thumb_len,
           -- byte-based slice: hex(encode(text)) is the UTF-8 BYTE stream
           -- (2 hex chars per byte), so this digests the same prefix the
           -- Spark kernel does even for multi-byte text where a byte slice
           -- can split a codepoint (substr on VARCHAR slices CHARACTERS,
           -- and this DuckDB's md5 only accepts VARCHAR — hence hex).
           md5(lower(substring(hex(encode(text)), 1, {2 * _THUMB_BYTES}))) as thumb_md5
    from documents
    """,
)
def mm_payload_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/downsample shape: derive a bounded 'thumbnail' from each
    payload (its {_THUMB_BYTES}-byte prefix — the stand-in for a real
    decode→resize→re-encode, see decode_media) executor-side in
    mapInPandas, and emit a digest of the DERIVED bytes so the oracle
    verifies the worker transformed the actual payload, not metadata.
    The output is thumbnail-sized regardless of payload size — the
    property that makes the derived table cheap to ship downstream."""
    import hashlib

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = [bytes(b)[:_THUMB_BYTES] for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": [m["modality"] for m in pdf["meta"]],
                    "thumb_len": [len(t) for t in thumbs],
                    # digest the hex spelling of the thumb bytes — the only
                    # byte-faithful form the DuckDB twin can also hash
                    "thumb_md5": [
                        hashlib.md5(t.hex().encode()).hexdigest() for t in thumbs
                    ],
                }
            )

    mm = with_payload(load(spark, sf_dir, "documents"))
    return mm.mapInPandas(
        resize, "doc_id long, modality string, thumb_len long, thumb_md5 string"
    )


@query(
    "mm_chunk_dedup",
    oracle="""
    WITH payload AS (
      -- hex(encode(text)) renders the UTF-8 BYTE stream (2 hex chars per
      -- byte) — this DuckDB build has no BLOB slicing/md5, so both
      -- engines digest the lowercase-hex rendering of each byte chunk
      -- (same carrier as mm_payload_resize).
      SELECT doc_id, source, lower(hex(encode(text))) AS payload_hex,
             octet_length(encode(text)) AS n_bytes
      FROM documents),
    chunks AS (
      -- scalar range() bounded by each row's OWN byte length — a fixed
      -- cap here would silently under-chunk any payload longer than it
      SELECT doc_id, source,
             md5(substring(payload_hex, off::INT * 2 + 1, 64)) AS chunk_digest
      FROM (SELECT doc_id, source, payload_hex,
                   unnest(range(0, n_bytes, 32)) AS off
            FROM payload))
    SELECT source,
           count(*)::BIGINT AS n_chunks,
           count(DISTINCT chunk_digest)::BIGINT AS n_distinct_chunks,
           round(1.0 - count(DISTINCT chunk_digest) * 1.0 / count(*), 6)
             AS chunk_dup_ratio
    FROM chunks GROUP BY source ORDER BY source
    """,
)
def mm_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressable chunk-level dedup over binary payloads — the
    storage-efficiency audit for multimodal blobs: slice every payload
    into fixed 32-byte chunks, digest each, and measure how much of
    each source's byte volume is redundant at chunk granularity (the
    CDC/CAS shape object stores and dataset caches use). Payload bytes
    come from encode(text) on BOTH engines (the corpus's stand-in for
    real media bytes, same carrier as the other mm_* ops); the chunk
    fan-out is a bounded per-row generator and the digest count is a
    two-phase distinct — no payload ever crosses a shuffle, only 16-byte
    digests."""
    d = load(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    chunks = (
        d.select("doc_id", "source", payload.alias("payload"))
        .withColumn(
            "off",
            F.explode(F.sequence(F.lit(0), F.length("payload") - 1, F.lit(32))),
        )
        .select(
            "source",
            F.md5(
                F.lower(F.hex(F.expr("substring(payload, off + 1, 32)")))
            ).alias("chunk_digest"),
        )
    )
    return (
        chunks.groupBy("source")
        .agg(
            F.count("*").alias("n_chunks"),
            F.countDistinct("chunk_digest").alias("n_distinct_chunks"),
            F.round(
                1.0 - F.countDistinct("chunk_digest") * F.lit(1.0) / F.count("*"), 6
            ).alias("chunk_dup_ratio"),
        )
        .orderBy("source")
    )


@query(
    "mm_payload_entropy",
    oracle="""
    WITH b AS (
      SELECT doc_id,
             octet_length(encode(text)) AS n_bytes,
             hex(encode(text)) AS h
      FROM documents),
    pos AS (
      SELECT doc_id, n_bytes, h,
             unnest(range(1, n_bytes + 1)) AS i
      FROM b),
    bytes AS (
      SELECT doc_id, n_bytes,
             (strpos('0123456789ABCDEF', substr(h, CAST(2*i-1 AS BIGINT), 1))
                - 1) * 16
             + strpos('0123456789ABCDEF', substr(h, CAST(2*i AS BIGINT), 1))
                - 1 AS bv
      FROM pos),
    c AS (
      SELECT doc_id, n_bytes, bv, count(*) * 1.0 AS cnt
      FROM bytes GROUP BY doc_id, n_bytes, bv)
    SELECT doc_id,
           CAST(any_value(n_bytes) AS INT) AS n_bytes,
           count(*) AS n_distinct_bytes,
           round(log2(CAST(any_value(n_bytes) AS DOUBLE))
                 - sum(cnt * log2(cnt)) / CAST(any_value(n_bytes) AS DOUBLE),
                 6) AS byte_entropy
    FROM c GROUP BY doc_id ORDER BY doc_id
    """,
)
def mm_payload_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-distribution Shannon entropy per payload — the corruption /
    compressibility probe a multimodal ingest runs before decode (true
    media bytes sit near 8 bits/byte; text-masquerading or zero-padded
    payloads sit far lower). ENTIRELY JVM-side despite operating on
    binary: the payload is hexed ONCE per row behind a projection
    boundary, a `transform(sequence(...))` lambda converts each 2-hex
    window back to its byte value (no Python, no UDF — whole-stage
    codegen end to end), and entropy comes out of two hash aggregates in
    the algebraic form log2(n) − Σc·log2(c)/n, so only exact integer
    counts are aggregated across the cluster before the single float
    divide per document. Scale: the explode fans out n_bytes rows per
    doc — the same linear blow-up every byte-level scan pays — and both
    groupBys are keyed by doc_id, so the work is embarrassingly
    partition-parallel with no corpus-wide shuffle key."""
    mm = with_payload(load(spark, sf_dir, "documents"))
    b = mm.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.hex("payload").alias("h"),
    )
    # ONE linear regexp pass splits the hex string into byte pairs —
    # substring(h, 2i−1, 2) per position would re-scan the string to
    # find each codepoint offset: O(len²) per document, which dies on
    # megabyte media payloads even though it looks innocent at 300 B.
    bytes_ = b.select(
        "doc_id",
        "n_bytes",
        F.explode(
            F.expr(
                "transform(regexp_extract_all(h, '(..)', 1),"
                " p -> conv(p, 16, 10))"
            )
        ).alias("bv"),
    )
    counts = bytes_.groupBy("doc_id", "n_bytes", "bv").agg(
        F.count("*").cast("double").alias("cnt")
    )
    n = F.any_value("n_bytes").cast("double")
    return (
        counts.groupBy("doc_id")
        .agg(
            F.any_value("n_bytes").cast("int").alias("n_bytes"),
            F.count("*").alias("n_distinct_bytes"),
            F.round(
                F.log2(n) - F.sum(F.col("cnt") * F.log2("cnt")) / n, 6
            ).alias("byte_entropy"),
        )
        .orderBy("doc_id")
    )


_MM_PACK_BUDGET = 1024  # tokens per packed multimodal training sequence


@query(
    "mm_interleaved_pack",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             {_MODALITY_SQL} AS modality,
             len(string_split(lower(text), ' ')) AS text_tokens,
             (octet_length(encode(text)) + 255) // 256 AS patch_tokens
      FROM documents),
    cum AS (
      SELECT modality, text_tokens, patch_tokens,
             sum(text_tokens + patch_tokens)
               OVER (PARTITION BY modality ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS cum_before
      FROM toks)
    SELECT modality,
           CAST(COALESCE(cum_before, 0) // {_MM_PACK_BUDGET} AS BIGINT)
             AS seq_id,
           count(*) AS n_docs,
           CAST(sum(text_tokens) AS BIGINT) AS text_tokens,
           CAST(sum(patch_tokens) AS BIGINT) AS patch_tokens,
           CAST(sum(text_tokens + patch_tokens) AS BIGINT) AS total_tokens
    FROM cum
    GROUP BY modality, COALESCE(cum_before, 0) // {_MM_PACK_BUDGET}
    ORDER BY modality, seq_id
    """,
)
def mm_interleaved_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interleaved MULTIMODAL sequence packing: each document costs its
    text tokens PLUS the patch tokens its media payload decodes to
    (⌈bytes/256⌉ — the ViT-style patch budget), and documents pack
    into fixed 1024-token training sequences per modality shard — the
    manifest a multimodal trainer reads. Same scale shape as
    `text_pack_sequences`: the running offset partitions by the shard
    key (NO global window), slot = floor(offset/budget) with a
    power-of-two budget so the double division is exact, and the
    manifest is a bounded keyed rollup. Patch counts are exact integer
    arithmetic on the metadata — payload bytes are never touched."""
    d = load(spark, sf_dir, "documents")
    mm = with_payload(d).select(
        "doc_id",
        F.col("meta.modality").alias("modality"),
        F.col("meta.n_bytes").alias("n_bytes"),
    )
    toks = mm.join(
        d.select(
            "doc_id",
            F.size(F.split(F.lower("text"), " ")).cast("long").alias(
                "text_tokens"
            ),
        ),
        "doc_id",
    ).select(
        "doc_id",
        "modality",
        "text_tokens",
        F.expr("CAST((n_bytes + 255) div 256 AS BIGINT)").alias(
            "patch_tokens"
        ),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("modality")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = toks.select(
        "modality",
        "text_tokens",
        "patch_tokens",
        (
            F.coalesce(
                F.sum(F.col("text_tokens") + F.col("patch_tokens")).over(w),
                F.lit(0),
            )
            / F.lit(_MM_PACK_BUDGET)
        )
        .cast("long")
        .alias("seq_id"),
    )
    return (
        packed.groupBy("modality", "seq_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("text_tokens").cast("long").alias("text_tokens"),
            F.sum("patch_tokens").cast("long").alias("patch_tokens"),
            F.sum(F.col("text_tokens") + F.col("patch_tokens"))
            .cast("long")
            .alias("total_tokens"),
        )
        .orderBy("modality", "seq_id")
    )


_TILE_PX = 512      # tile edge for high-res tiling
_PATCH_PX = 16      # ViT patch edge: (512/16)^2 = 1024 tokens per tile
_TOKENS_PER_TILE = (_TILE_PX // _PATCH_PX) ** 2
_TOKEN_BUDGET = 6 * _TOKENS_PER_TILE  # flag images costlier than 6 tiles

# Deterministic synthetic dimensions for image-modality docs: the corpus
# carries no real media (multimodal module docstring), so width/height
# derive from doc_id with co-prime multipliers — same arithmetic on both
# engines, covering 224..2023 x 224..1423 including multi-tile shapes.
_W_SQL = "224 + (doc_id * 37) % 1800"
_H_SQL = "224 + (doc_id * 53) % 1200"


@query(
    "mm_tile_grid",
    oracle=f"""
    WITH img AS (
      SELECT doc_id, source,
             {_W_SQL} AS w, {_H_SQL} AS h
      FROM documents WHERE doc_id % 3 = 0),
    grid AS (
      SELECT doc_id, source, w, h,
             CAST(floor((w + {_TILE_PX - 1}) / {_TILE_PX}) AS BIGINT) *
             CAST(floor((h + {_TILE_PX - 1}) / {_TILE_PX}) AS BIGINT)
               AS n_tiles
      FROM img),
    cost AS (
      SELECT source, n_tiles,
             (n_tiles + 1) * {_TOKENS_PER_TILE} AS n_tokens
      FROM grid)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_images,
           CAST(sum(n_tiles) AS BIGINT) AS total_tiles,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(max(n_tiles) AS BIGINT) AS max_tiles,
           CAST(sum(CASE WHEN n_tokens > {_TOKEN_BUDGET}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_over_budget
    FROM cost GROUP BY source ORDER BY source
    """,
)
def mm_tile_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VISION TOKEN BUDGETING: the tiling arithmetic a multimodal
    training pipeline runs over every image BEFORE decoding any pixels —
    an image of (w, h) is cut into ceil(w/{_TILE_PX})·ceil(h/{_TILE_PX})
    high-res tiles plus one global thumbnail, each costing
    {_TOKENS_PER_TILE} ViT patch tokens ({_TILE_PX}/{_PATCH_PX} squared);
    the per-source report (image count, total tiles, total tokens,
    hottest image, over-budget count) is what decides packing and
    sampling rates for the vision mix. Dimensions are metadata-derived
    (this corpus carries no real media — deterministic synthetic dims,
    module docstring) so the key measures the PLUMBING: budget math over
    typed metadata with zero payload bytes touched.

    Scale shape: pure row-local integer arithmetic inside whole-stage
    codegen (no UDF — tiling math never needs Python), folded by ONE
    hash aggregate on source; at 100 TB this is a metadata-column scan
    (doc_id, source) with every byte column pruned — the cheap-path
    planning query run before any decode fleet is sized."""
    docs = load(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 3 == 0
    )
    w = F.lit(224) + (F.col("doc_id") * 37) % 1800
    h = F.lit(224) + (F.col("doc_id") * 53) % 1200
    n_tiles = (
        F.floor((w + _TILE_PX - 1) / _TILE_PX)
        * F.floor((h + _TILE_PX - 1) / _TILE_PX)
    ).cast("long")
    cost = docs.select(
        "source",
        n_tiles.alias("n_tiles"),
        ((n_tiles + 1) * _TOKENS_PER_TILE).alias("n_tokens"),
    )
    return (
        cost.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_images"),
            F.sum("n_tiles").cast("long").alias("total_tiles"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.max("n_tiles").cast("long").alias("max_tiles"),
            F.sum(
                F.when(F.col("n_tokens") > _TOKEN_BUDGET, 1).otherwise(0)
            )
            .cast("long")
            .alias("n_over_budget"),
        )
        .orderBy("source")
    )


# Cross-modality token cost model (documented constants — the budgeting
# arithmetic is the key, not the calibration): image = tile grid + global
# thumbnail at _TOKENS_PER_TILE each; audio = 4 tokens per _FRAME_BYTES
# frame; video = 256 thumbnail-tokens per 1024-byte sampled frame;
# text rides everywhere at ceil(n_chars / 4) (the chars-per-token rule).
_AUD_TOK_PER_FRAME = 4
_VID_FRAME_BYTES = 1024
_VID_TOK_PER_FRAME = 256


@query(
    "mm_token_budget_mix",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {_MODALITY_SQL} AS modality,
             octet_length(encode(text)) AS n_bytes, n_chars
      FROM documents),
    costed AS (
      SELECT modality,
             CASE modality
               WHEN 'image' THEN
                 (CAST(floor((224 + (doc_id * 37) % 1800 + {_TILE_PX - 1})
                             / {_TILE_PX}) AS BIGINT) *
                  CAST(floor((224 + (doc_id * 53) % 1200 + {_TILE_PX - 1})
                             / {_TILE_PX}) AS BIGINT) + 1)
                 * {_TOKENS_PER_TILE}
               WHEN 'audio' THEN
                 CAST(ceil(n_bytes / {_FRAME_BYTES}.0) AS BIGINT)
                 * {_AUD_TOK_PER_FRAME}
               ELSE
                 CAST(ceil(n_bytes / {_VID_FRAME_BYTES}.0) AS BIGINT)
                 * {_VID_TOK_PER_FRAME}
             END AS media_tokens,
             CAST(ceil(n_chars / 4.0) AS BIGINT) AS text_tokens
      FROM base),
    per_modal AS (
      SELECT modality, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(media_tokens) AS BIGINT) AS media_tokens,
             CAST(sum(text_tokens) AS BIGINT) AS text_tokens,
             CAST(sum(media_tokens + text_tokens) AS BIGINT) AS total_tokens
      FROM costed GROUP BY modality),
    grand AS (SELECT sum(total_tokens) AS g FROM per_modal)
    SELECT p.modality, p.n_docs, p.media_tokens, p.text_tokens,
           p.total_tokens,
           CAST(floor(1000000.0 * p.total_tokens / g.g + 0.5) AS BIGINT)
             AS share_ppm
    FROM per_modal p CROSS JOIN grand g
    ORDER BY p.modality
    """,
)
def mm_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-MODALITY TOKEN BUDGET — the mix sheet a multimodal training
    run is planned from: every document costs media tokens under its
    modality's model (image = `mm_tile_grid`'s tile arithmetic, audio =
    {_AUD_TOK_PER_FRAME}/frame over {_FRAME_BYTES}-byte frames, video =
    {_VID_TOK_PER_FRAME} thumbnail-tokens per {_VID_FRAME_BYTES}-byte
    sampled frame) plus text tokens (chars/4), aggregated per modality
    with each modality's share of the grand total in exact ppm. This is
    `text_training_mix`'s cross-modal sibling: shares are what set
    per-modality sampling rates, and they must come from TOKEN cost, not
    row counts — one video outweighs hundreds of captions.

    Scale shape: costing is one codegen CASE chain over metadata columns
    (no payload bytes, no UDF); one hash aggregate on modality (3
    groups); the grand total is a 1-row broadcast cross join — the same
    two-pass share shape as `mm_modal_metadata`. Determinism: integer
    token models throughout; shares quantized to ppm via one IEEE
    division on exact ints."""
    modality = F.element_at(
        F.array(*[F.lit(m) for m in _MODALITIES]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    base = load(spark, sf_dir, "documents").select(
        "doc_id",
        modality.alias("modality"),
        F.octet_length(F.encode("text", "UTF-8")).alias("n_bytes"),
        "n_chars",
    )
    w = F.lit(224) + (F.col("doc_id") * 37) % 1800
    h = F.lit(224) + (F.col("doc_id") * 53) % 1200
    img_tokens = (
        (
            F.floor((w + _TILE_PX - 1) / _TILE_PX)
            * F.floor((h + _TILE_PX - 1) / _TILE_PX)
            + 1
        )
        * _TOKENS_PER_TILE
    ).cast("long")
    aud_tokens = (
        F.ceil(F.col("n_bytes") / float(_FRAME_BYTES)) * _AUD_TOK_PER_FRAME
    ).cast("long")
    vid_tokens = (
        F.ceil(F.col("n_bytes") / float(_VID_FRAME_BYTES))
        * _VID_TOK_PER_FRAME
    ).cast("long")
    costed = base.select(
        "modality",
        F.when(F.col("modality") == "image", img_tokens)
        .when(F.col("modality") == "audio", aud_tokens)
        .otherwise(vid_tokens)
        .alias("media_tokens"),
        F.ceil(F.col("n_chars") / 4.0).cast("long").alias("text_tokens"),
    )
    per_modal = costed.groupBy("modality").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("media_tokens").cast("long").alias("media_tokens"),
        F.sum("text_tokens").cast("long").alias("text_tokens"),
        F.sum(F.col("media_tokens") + F.col("text_tokens"))
        .cast("long")
        .alias("total_tokens"),
    )
    grand = per_modal.agg(F.sum("total_tokens").alias("g"))
    return (
        per_modal.crossJoin(F.broadcast(grand))
        .select(
            "modality",
            "n_docs",
            "media_tokens",
            "text_tokens",
            "total_tokens",
            F.floor(
                F.lit(1000000.0) * F.col("total_tokens") / F.col("g")
                + F.lit(0.5)
            )
            .cast("long")
            .alias("share_ppm"),
        )
        .orderBy("modality")
    )
