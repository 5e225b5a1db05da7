"""Tests for the UDF extension surface (§2.10) and multimodal binary
plumbing (§2.11). Oracle parity runs in tools/preflight.py; these assert
the properties the oracle can't see."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import sparkgraft
from conftest import SF_DIR
from sparkgraft.multimodal import _FRAME_BYTES, decode_media, with_payload


def test_scalar_udf_bands_partition_lineitem(spark):
    df = sparkgraft.QUERIES["udf_scalar_arrow"](spark, SF_DIR)
    total = df.agg(F.sum("n")).collect()[0][0]
    assert total == sparkgraft.load(spark, SF_DIR, "lineitem").count()


def test_trimmed_mean_between_min_and_max(spark):
    rows = sparkgraft.QUERIES["udf_grouped_agg"](spark, SF_DIR).collect()
    bounds = (
        sparkgraft.load(spark, SF_DIR, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi"))
        .collect()
    )
    by_flag = {r["l_returnflag"]: (r["lo"], r["hi"]) for r in bounds}
    assert rows
    for r in rows:
        lo, hi = by_flag[r["l_returnflag"]]
        assert lo <= r["trimmed_mean"] <= hi


def test_grouped_map_zscores_standardized(spark):
    df = sparkgraft.QUERIES["udf_grouped_map"](spark, SF_DIR)
    stats = df.groupBy("o_orderpriority").agg(
        F.avg("z").alias("mu"), F.stddev_samp("z").alias("sd")
    ).collect()
    for r in stats:
        assert abs(r["mu"]) < 1e-3
        assert abs(r["sd"] - 1.0) < 1e-3


def test_udtf_matches_builtin_explode(spark):
    via_udtf = sparkgraft.QUERIES["udtf_explode_custom"](spark, SF_DIR)
    docs = sparkgraft.load(spark, SF_DIR, "documents")
    via_explode = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .filter(F.length("token") > 0)
    )
    assert via_udtf.count() == via_explode.count()


def test_decode_media_stub_paths_raise():
    # audio/video decoding has no codec library in any supported env yet;
    # the image path is a stub only where Pillow is absent.
    with pytest.raises(NotImplementedError):
        decode_media(b"RIFF....WAVE", "audio")
    from sparkgraft.multimodal import _pil_image

    if _pil_image is None:
        with pytest.raises(NotImplementedError):
            decode_media(b"\x89PNG", "image")


def test_decode_media_real_image_when_pillow_present():
    # Runs only in codec-equipped deployments; skipped in this container.
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    buf = io.BytesIO()
    PIL_Image.new("RGB", (8, 5)).save(buf, format="PNG")
    out = decode_media(buf.getvalue(), "image")
    assert (out["width"], out["height"], out["n_pixels"]) == (8, 5, 40)


def test_payload_bytes_survive_arrow_roundtrip(spark):
    docs = sparkgraft.load(spark, SF_DIR, "documents").limit(20)
    rows = with_payload(docs).join(docs, "doc_id").collect()
    assert rows
    for r in rows:
        assert bytes(r["payload"]) == r["text"].encode("utf-8")
        assert r["meta"]["n_bytes"] == len(r["text"].encode("utf-8"))
        assert r["meta"]["mime"].split("/")[0] == r["meta"]["modality"]


def test_frame_sample_reassembles_lengths(spark):
    frames = sparkgraft.QUERIES["mm_frame_sample"](spark, SF_DIR)
    per_doc = frames.groupBy("doc_id").agg(
        F.sum("frame_len").alias("total"), F.count("*").alias("n_frames")
    )
    docs = with_payload(sparkgraft.load(spark, SF_DIR, "documents")).select(
        "doc_id", F.col("meta.n_bytes").alias("n_bytes")
    )
    joined = per_doc.join(docs, "doc_id").collect()
    assert joined
    for r in joined:
        assert r["total"] == r["n_bytes"]
        assert r["n_frames"] == -(-r["n_bytes"] // _FRAME_BYTES)


def test_chunk_dedup_oracle_parity_beyond_8k_payloads(tmp_path, spark):
    """Regression: the DuckDB oracle once capped chunk offsets at 8192
    bytes while the Spark side chunked the whole payload, so any doc
    longer than 8 KiB silently diverged. Build a corpus whose largest doc
    is ~20 KiB and assert full strict parity."""
    import os

    import pandas as pd

    from sparkgraft.catalog import TABLES
    from sparkgraft.oracle import compare_frames, duckdb_connect

    for name in TABLES:
        if name != "documents":
            os.symlink(f"{SF_DIR}/{name}.parquet", tmp_path / f"{name}.parquet")
    texts = [
        "short doc",
        "repeated-block " * 40,          # ~600 B, internal dups
        "x" * 8192,                       # exactly at the old cap
        ("abcdefgh" * 4 + " ") * 600,    # ~19.8 KiB, past the old cap
    ]
    pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["web", "web", "books", "books"],
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)

    spark_pdf = sparkgraft.QUERIES["mm_chunk_dedup"](spark, str(tmp_path)).toPandas()
    oracle_pdf = (
        duckdb_connect(str(tmp_path))
        .execute(sparkgraft.ORACLE["mm_chunk_dedup"])
        .fetchdf()
    )
    assert compare_frames(spark_pdf, oracle_pdf) == []
    # the >8 KiB doc alone contributes ceil(19800/32) > 256 chunks, so the
    # books source must exceed the old cap's maximum of 256 chunks per doc
    books = spark_pdf[spark_pdf["source"] == "books"]
    assert int(books["n_chunks"].iloc[0]) > 2 * 256


def test_spark_side_decode_real_png_when_pillow_present(spark):
    """Runs only in codec-equipped deployments: generated PNG payloads
    flow through the REAL Spark plumbing (binary column → Arrow batch →
    mapInPandas → decode_media) and the decoded dimensions come back
    exactly. Pins that the distributed decode path, not just the pure
    function, works wherever Pillow exists."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    import pandas as pd

    def png(w, h):
        buf = io.BytesIO()
        PIL_Image.new("RGB", (w, h)).save(buf, format="PNG")
        return buf.getvalue()

    dims = [(8, 5), (16, 16), (3, 7), (1, 1)]
    src = spark.createDataFrame(
        [(i, bytearray(png(w, h))) for i, (w, h) in enumerate(dims)],
        "doc_id long, payload binary",
    ).repartition(2)

    def decode(batches):
        from sparkgraft.multimodal import decode_media

        for pdf in batches:
            out = [decode_media(bytes(b), "image") for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [o["width"] for o in out],
                    "height": [o["height"] for o in out],
                    "n_pixels": [o["n_pixels"] for o in out],
                }
            )

    rows = src.mapInPandas(
        decode, "doc_id long, width int, height int, n_pixels long"
    ).collect()
    got = {r["doc_id"]: (r["width"], r["height"], r["n_pixels"]) for r in rows}
    assert got == {i: (w, h, w * h) for i, (w, h) in enumerate(dims)}
