"""Round-6 additions: Avro from-spec codec interop, script transform,
and the sampled audit forms (VERDICT r5 asks #1-#5)."""

from __future__ import annotations

import uuid

import sparkgraft
from conftest import SF_DIR, SF_DIR_MID


def test_avro_python_reader_roundtrip(tmp_path):
    from sparkgraft.avroio import (
        _ORDERS_AVRO_SCHEMA,
        read_container_file,
        write_container_file,
    )

    rows = [
        (1, "O", 100.25),
        (-7, "F", -3.5),
        (2**40, "P", 0.0),
        (0, "", 1e300),
    ]
    path = str(tmp_path / "rt.avro")
    n = write_container_file(path, rows, _ORDERS_AVRO_SCHEMA, uuid.uuid4().bytes)
    assert n == len(rows)
    assert list(read_container_file(path)) == rows


def test_avro_java_reference_reader_interop(spark, tmp_path):
    # the written container file must be readable by the REFERENCE Java
    # implementation (avro-1.12.1.jar on Spark's JVM classpath) — this is
    # the proof the from-spec Python writer produces real Avro, not a
    # private format that merely round-trips through its own reader
    from sparkgraft.avroio import _ORDERS_AVRO_SCHEMA, write_container_file

    rows = [(i, f"s{i % 3}", i * 1.5 - 7) for i in range(2500)]  # >1 block
    path = str(tmp_path / "interop.avro")
    write_container_file(path, rows, _ORDERS_AVRO_SCHEMA, uuid.uuid4().bytes)

    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(path), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    got = []
    while reader.hasNext():
        rec = reader.next()
        got.append(
            (
                rec.get("o_orderkey"),
                str(rec.get("o_orderstatus")),
                rec.get("o_totalprice"),
            )
        )
    reader.close()
    assert got == rows


def test_avro_schema_planning_from_header(tmp_path):
    from sparkgraft.avroio import (
        _ORDERS_AVRO_SCHEMA,
        spark_schema_of,
        write_container_file,
    )

    path = str(tmp_path / "hdr.avro")
    write_container_file(path, [(1, "O", 2.0)], _ORDERS_AVRO_SCHEMA, b"\x00" * 16)
    assert (
        spark_schema_of(path)
        == "o_orderkey bigint, o_orderstatus string, o_totalprice double"
    )


def test_script_transform_runs_external_process(spark):
    df = sparkgraft.QUERIES["fn_script_transform"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ScriptTransformation" in plan  # a real piped external process
    rows = {r.status: r for r in df.collect()}
    assert set(rows) == {"F", "O", "P"}
    # cents doubling is exact: recompute one group's expectation in Spark
    from pyspark.sql import functions as F

    from sparkgraft.catalog import load

    want = (
        load(spark, SF_DIR, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long") * 2).alias("s")
        )
        .collect()[0]["s"]
    )
    assert rows["F"].sum_dbl_cents == want


def test_sampled_audits_match_full_on_sampled_subset(spark):
    # the sampled histogram must equal the full histogram computed over
    # the same deterministic subset — i.e. sampling is the ONLY change
    from pyspark.sql import functions as F

    from sparkgraft.catalog import load
    from sparkgraft.vectorops import _AUDIT_SAMPLE_MOD, _pair_histogram

    vecs = (
        load(spark, SF_DIR_MID, "embeddings")
        .filter(F.col("vec_id") % _AUDIT_SAMPLE_MOD == 0)
        .select("vec_id", "embedding")
    )
    direct = {
        (r.bucket, r.n_pairs)
        for r in _pair_histogram(spark, vecs, vecs.count()).collect()
    }
    sampled = {
        (r.bucket, r.n_pairs)
        for r in sparkgraft.QUERIES["sim_pair_histogram_sampled"](
            spark, SF_DIR_MID
        ).collect()
    }
    assert direct == sampled


def test_lsh_bucket_stats_consistency(spark):
    # cand_pairs must be consistent with n_buckets/max_bucket per band,
    # and every band must account for all n vectors
    from sparkgraft.catalog import load

    n = load(spark, SF_DIR_MID, "embeddings").count()
    rows = sparkgraft.QUERIES["sim_lsh_bucket_stats"](spark, SF_DIR_MID).collect()
    assert len(rows) == 32
    for r in rows:
        assert 1 <= r.n_buckets <= n
        assert r.max_bucket <= n
        assert r.cand_pairs <= n * (n - 1) // 2
        assert r.n_oversize >= 0


def test_avro_python_reader_reads_java_written_file(spark, tmp_path):
    # reverse interop: a file produced by the reference Java writer
    # (which uses deflate-capable framing, its own sync marker, and the
    # canonical metadata layout) must decode through the from-spec
    # Python reader — together with the forward test this pins both
    # directions of spec conformance
    import json

    from sparkgraft.avroio import _ORDERS_AVRO_SCHEMA, read_container_file

    jvm = spark._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(
        json.dumps(_ORDERS_AVRO_SCHEMA)
    )
    path = str(tmp_path / "java_written.avro")
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    )
    writer.create(schema, jvm.java.io.File(path))
    want = []
    for i in range(1500):  # java default block size → multiple blocks
        rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
        rec.put("o_orderkey", jvm.java.lang.Long(i * 1000))
        rec.put("o_orderstatus", f"S{i % 3}")
        rec.put("o_totalprice", float(i) * 1.25 - 2)
        writer.append(rec)
        want.append((i * 1000, f"S{i % 3}", float(i) * 1.25 - 2))
    writer.close()
    assert list(read_container_file(path)) == want


def test_avro_codec_property_roundtrip():
    # hypothesis sweep of the binary encoding: arbitrary int64 keys
    # (zigzag edge cases: 0, -1, ±2^62), arbitrary unicode strings
    # (multi-byte UTF-8 lengths), arbitrary finite doubles — every corpus
    # must decode to exactly what was written, across block boundaries
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from sparkgraft.avroio import (
        _ORDERS_AVRO_SCHEMA,
        read_container_file,
        write_container_file,
    )

    rows_strategy = st.lists(
        st.tuples(
            st.integers(min_value=-(2**62), max_value=2**62),
            st.text(max_size=40),
            st.floats(allow_nan=False, allow_infinity=False, width=64),
        ),
        max_size=60,
    )

    @settings(max_examples=60, deadline=None)
    @given(rows=rows_strategy)
    def check(rows):
        import os
        import tempfile

        fd, path = tempfile.mkstemp(suffix=".avro")
        os.close(fd)
        try:
            n = write_container_file(
                path, rows, _ORDERS_AVRO_SCHEMA, b"\x07" * 16
            )
            assert n == len(rows)
            assert list(read_container_file(path)) == rows
        finally:
            os.remove(path)

    check()


def test_quality_train_learns_the_rule(spark):
    # the trained distillation must be discriminative, not just
    # parity-correct: positive weights on the features the keep-rule
    # thresholds (tokens, stopwords), negative bias, and better-than-
    # base-rate training accuracy when the weights are applied back
    import math

    from pyspark.sql import functions as F

    from sparkgraft.catalog import load
    from sparkgraft.textops import _STOPWORDS

    w = {
        r.feature: r.weight
        for r in sparkgraft.QUERIES["text_quality_train"](
            spark, SF_DIR_MID
        ).collect()
    }
    assert w["tokens_h"] > 0 and w["stopwords_10"] > 0 and w["bias"] < 0

    d = load(spark, SF_DIR_MID, "documents")
    toks = F.split(F.lower("text"), " ")
    stop = F.array(*[F.lit(s) for s in _STOPWORDS])
    scored = d.select(
        F.size(toks).alias("n_tokens"),
        F.size(F.filter(toks, lambda x: F.array_contains(stop, x))).alias(
            "n_stop"
        ),
        "n_chars",
    ).select(
        ((F.col("n_tokens") >= 20) & (F.col("n_stop") > 0)).alias("y"),
        (
            F.lit(w["bias"])
            + F.lit(w["chars_k"]) * F.col("n_chars") / 1000.0
            + F.lit(w["tokens_h"]) * F.col("n_tokens") / 100.0
            + F.lit(w["stopwords_10"]) * F.col("n_stop") / 10.0
        ).alias("z"),
    )
    agg = scored.agg(
        F.avg(F.when(F.col("y") == (F.col("z") >= 0), 1.0).otherwise(0.0)).alias(
            "acc"
        ),
        F.avg(F.when(F.col("y"), 1.0).otherwise(0.0)).alias("pos"),
    ).collect()[0]
    base = max(agg.pos, 1 - agg.pos)
    assert agg.acc > base + 0.02


def test_kmeans_train_clusters_everything_and_moves(spark):
    import numpy as np

    from sparkgraft.catalog import load

    rows = sparkgraft.QUERIES["sim_kmeans_train"](spark, SF_DIR_MID).collect()
    n = load(spark, SF_DIR_MID, "embeddings").count()
    assert len(rows) == 8 * 64
    # every vector is in exactly one cluster
    per_cell = {r.cell: r.n_members for r in rows}
    assert sum(per_cell.values()) == n
    # training moved the centroids off their seed vectors
    cent = np.zeros((8, 64))
    for r in rows:
        cent[r.cell, r.pos] = r.centroid
    seeds = (
        load(spark, SF_DIR_MID, "embeddings")
        .filter("vec_id < 8")
        .orderBy("vec_id")
        .toPandas()
    )
    seed_mat = np.stack(seeds["embedding"].to_numpy()).astype(np.float64)
    assert np.abs(cent - seed_mat).max() > 0.01
