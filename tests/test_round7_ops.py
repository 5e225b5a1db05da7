"""Round-7 additions: Avro deflate codec + logical types (both Java
interop directions), writer schema derivation, and the sampled
dedup form's bench contract (VERDICT r6 asks #1, #3; ADVICE #4)."""

from __future__ import annotations

import datetime as dt
import json
import uuid

import pytest

import sparkgraft
from conftest import SF_DIR

_EV_SCHEMA = {
    "type": "record",
    "name": "ev",
    "namespace": "sparkgraft",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "ts", "type": {"type": "long",
                                "logicalType": "timestamp-micros"}},
        {"name": "day", "type": {"type": "int", "logicalType": "date"}},
        {"name": "v", "type": "double"},
    ],
}


def _rows(n):
    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    return [
        (
            i,
            base + dt.timedelta(seconds=i * 37, microseconds=i * 13 % 1000000),
            dt.date(2024, 3, 1) + dt.timedelta(days=i % 5),
            i * 1.25 - 3,
        )
        for i in range(n)
    ]


def _micros(ts: dt.datetime) -> int:
    import calendar

    return calendar.timegm(ts.utctimetuple()) * 1_000_000 + ts.microsecond


def test_avro_deflate_logical_python_roundtrip(tmp_path):
    from sparkgraft.avroio import read_container_file, write_container_file

    rows = _rows(2500)  # > 1 block
    path = str(tmp_path / "defl.avro")
    n = write_container_file(
        path, rows, _EV_SCHEMA, uuid.uuid4().bytes, codec="deflate"
    )
    assert n == len(rows)
    assert list(read_container_file(path)) == rows
    # deflate must actually compress: the null-codec twin is larger
    import os

    null_path = str(tmp_path / "null.avro")
    write_container_file(null_path, rows, _EV_SCHEMA, uuid.uuid4().bytes)
    assert os.path.getsize(path) < os.path.getsize(null_path)


def test_avro_deflate_java_reference_reader_interop(spark, tmp_path):
    # the deflate + logical-type file must decompress and decode through
    # the REFERENCE Java implementation; GenericDatumReader without
    # conversions surfaces the base wire values (epoch-µs long, epoch-day
    # int), which pins the logical-type encoding exactly
    from sparkgraft.avroio import write_container_file

    rows = _rows(2500)
    path = str(tmp_path / "interop_defl.avro")
    write_container_file(
        path, rows, _EV_SCHEMA, uuid.uuid4().bytes, codec="deflate"
    )

    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(path), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    assert str(reader.getMetaString("avro.codec")) == "deflate"
    got = []
    while reader.hasNext():
        rec = reader.next()
        got.append(
            (rec.get("id"), rec.get("ts"), rec.get("day"), rec.get("v"))
        )
    reader.close()
    want = [
        (i, _micros(ts), (day - dt.date(1970, 1, 1)).days, v)
        for i, ts, day, v in rows
    ]
    assert got == want


def test_avro_python_reader_reads_java_deflate_file(spark, tmp_path):
    # reverse interop: Java writer with CodecFactory.deflateCodec and the
    # same logical-type schema → the from-spec Python reader must inflate
    # and resolve logical types back to datetime/date objects
    from sparkgraft.avroio import read_container_file

    jvm = spark._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(_EV_SCHEMA))
    path = str(tmp_path / "java_defl.avro")
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    )
    writer.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    writer.create(schema, jvm.java.io.File(path))
    want = []
    for i, ts, day, v in _rows(1500):
        rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
        rec.put("id", jvm.java.lang.Long(i))
        rec.put("ts", jvm.java.lang.Long(_micros(ts)))
        rec.put("day", jvm.java.lang.Integer((day - dt.date(1970, 1, 1)).days))
        rec.put("v", v)
        writer.append(rec)
        want.append((i, ts, day, v))
    writer.close()
    assert list(read_container_file(path)) == want


def test_avro_writer_schema_derives_from_frame(spark, tmp_path):
    # ADVICE #4: the registered format must serialize whatever frame is
    # written (schema from the writer's own schema argument), and fail
    # loudly on a type the codec does not carry — never silently encode
    # through a hard-coded layout
    from sparkgraft.avroio import _avro_datasource, read_container_file

    spark.dataSource.register(_avro_datasource())
    out = str(tmp_path / "docs_avro")
    import os

    os.makedirs(out, exist_ok=True)  # usage contract: dir pre-created
    df = spark.createDataFrame(
        [(1, "alpha", True), (2, "beta", False)], "k bigint, s string, f boolean"
    )
    df.coalesce(1).write.format("sg_avro").option("path", out).mode(
        "append"
    ).save()
    files = [f for f in os.listdir(out) if f.endswith(".avro")]
    assert len(files) == 1
    got = sorted(read_container_file(os.path.join(out, files[0])))
    assert got == [(1, "alpha", True), (2, "beta", False)]

    bad = spark.createDataFrame([(1, [1, 2])], "k bigint, xs array<int>")
    with pytest.raises(Exception, match="cannot serialize"):
        bad.write.format("sg_avro").option(
            "path", str(tmp_path / "bad_avro")
        ).mode("append").save()


def test_avro_unknown_codec_still_rejected(tmp_path):
    from sparkgraft.avroio import write_container_file

    with pytest.raises(ValueError, match="unsupported Avro codec"):
        write_container_file(
            str(tmp_path / "x.avro"), [], _EV_SCHEMA, b"\x00" * 16,
            codec="snappy",
        )


def test_sampled_jaccard_registered_with_oracle():
    assert "dedup_ngram_jaccard_sampled" in sparkgraft.QUERIES
    assert "dedup_ngram_jaccard_sampled" in sparkgraft.ORACLE


def test_als_train_beats_mean_baseline(spark):
    """The trained factorization must actually FIT the matrix, not just
    hash-match: rank-2 x.y predictions over the observed cells must beat
    the global-mean baseline RMSE (synthetic quantities carry little
    structure, so the bar is beats-baseline, not near-zero error)."""
    import numpy as np
    from pyspark.sql import functions as F

    out = sparkgraft.QUERIES["graph_als_train"](spark, SF_DIR).toPandas()
    x = out[out.entity == "cust"].pivot(index="id", columns="pos", values="factor")
    y = out[out.entity == "part"].pivot(index="id", columns="pos", values="factor")
    o = sparkgraft.load(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    li = sparkgraft.load(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    r = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(F.col("o_custkey").alias("u"), F.col("l_partkey").alias("i"))
        .agg(F.sum("l_quantity").cast("long").alias("q"))
    ).toPandas()
    pred = np.array(
        [
            x.loc[u, 0] * y.loc[i, 0] + x.loc[u, 1] * y.loc[i, 1]
            for u, i in zip(r.u, r.i)
        ]
    )
    rmse = float(np.sqrt(np.mean((pred - r.q) ** 2)))
    base = float(np.sqrt(np.mean((r.q.mean() - r.q) ** 2)))
    assert rmse < 0.97 * base, (rmse, base)
    # factors are bounded (the ridge term keeps the alternating solves
    # from blowing up) and both entity sides are fully covered
    assert out.factor.abs().max() < 1e3
    assert set(out.entity) == {"cust", "part"}


def test_timetravel_snapshot_isolation(spark):
    """AS-OF snapshot 1 must see exactly the pre-cutoff slice while the
    current snapshot sees the whole table — and the two reads happen in
    one invocation, proving old file lists stay readable after the
    append (the time-travel property)."""
    from pyspark.sql import functions as F

    out = {
        r["snapshot"]: r
        for r in sparkgraft.QUERIES["scan_snapshot_timetravel"](
            spark, SF_DIR
        ).collect()
    }
    o = sparkgraft.load(spark, SF_DIR, "orders")
    cutoff = F.lit("1998-01-01").cast("timestamp")
    n_old = o.filter(F.col("o_orderdate") < cutoff).count()
    n_all = o.count()
    assert out[1]["n_rows"] == n_old
    assert out[2]["n_rows"] == n_all
    assert 0 < out[1]["n_rows"] < out[2]["n_rows"]


def test_reconciliation_attributes_the_fault(spark):
    """The injected replication fault (every 997th order key dropped)
    must surface: per-group deltas sum to the exact number of dropped
    rows, and at least one group reports in_sync=false."""
    from pyspark.sql import functions as F

    rep = sparkgraft.QUERIES["dq_reconciliation"](spark, SF_DIR).toPandas()
    o = sparkgraft.load(spark, SF_DIR, "orders")
    dropped = o.filter(F.col("o_orderkey") % 997 == 0).count()
    assert int(rep.row_delta.sum()) == dropped
    assert (~rep.in_sync).any()
    assert (rep.n_src - rep.row_delta == rep.n_tgt).all()


def test_naive_bayes_model_shape(spark):
    """Priors across classes must re-sum to ~1 (µ-rounding slack), each
    class carries exactly its top-5 tokens in non-increasing count
    order, and smoothed likelihoods are strictly positive (Laplace)."""
    nb = sparkgraft.QUERIES["text_naive_bayes_train"](spark, SF_DIR).toPandas()
    assert len(nb) == 5 * nb.lang.nunique()
    priors = nb.groupby("lang").prior_micro.first()
    assert abs(int(priors.sum()) - 1_000_000) <= len(priors)
    assert (nb.likelihood_micro > 0).all()
    for _, grp in nb.groupby("lang"):
        counts = list(grp.sort_values("rank").tok_count)
        assert counts == sorted(counts, reverse=True)


def test_gbt_stumps_training_converges(spark):
    """Each boosting round must strictly shrink the residual L1 norm
    (the fit-is-real check, the ALS beats-baseline analogue), choose a
    split from the quarter-boundary candidate set, and emit distinct
    leaf values (a degenerate equal-leaf stump would mean the split
    carried no signal)."""
    from sparkgraft.aggregates.stats import _GBT_CANDS

    out = (
        sparkgraft.QUERIES["agg_gbt_stumps_train"](spark, SF_DIR)
        .toPandas()
        .sort_values("step")
    )
    assert list(out.step) == [0, 1, 2, 3]
    resid = list(out.resid_abs)
    assert all(b < a for a, b in zip(resid, resid[1:])), resid
    fitted = out[out.step > 0]
    assert fitted.split_day.isin(_GBT_CANDS).all()
    assert (fitted.gamma_left != fitted.gamma_right).all()


def test_scd2_build_versions_chain(spark):
    """Per user: versions are contiguous from 1, exactly one open
    (is_current) row, each closed row's valid_to equals the next
    version's valid_from (the [from, to) chain), and no two consecutive
    versions carry the same state (runs were collapsed)."""
    scd = (
        sparkgraft.QUERIES["win_scd2_build"](spark, SF_DIR)
        .toPandas()
        .sort_values(["user_id", "version"])
    )
    for uid, grp in scd.groupby("user_id"):
        assert list(grp.version) == list(range(1, len(grp) + 1)), uid
        assert int(grp.is_current.sum()) == 1
        assert grp.is_current.iloc[-1]
        tos = list(grp.valid_to_us)[:-1]
        froms = list(grp.valid_from_us)[1:]
        assert tos == froms, uid
        states = list(grp.state)
        assert all(a != b for a, b in zip(states, states[1:])), uid


def test_interpolate_linear_brackets(spark):
    """Interpolated rows only appear strictly BETWEEN observations
    (first/last row per user is observed), and each interpolated value
    lies within [min, max] of its bracketing observations — the
    convexity property of a linear blend."""
    out = (
        sparkgraft.QUERIES["win_interpolate_linear"](spark, SF_DIR)
        .toPandas()
        .sort_values(["user_id", "day"])
    )
    assert set(out.kind) == {"obs", "interp"}
    for uid, grp in out.groupby("user_id"):
        assert grp.kind.iloc[0] == "obs"
        assert grp.kind.iloc[-1] == "obs"
        # consecutive-day spine with no holes between first/last obs
        import pandas as pd

        days = list(pd.to_datetime(grp.day))
        assert all(
            (b - a).days == 1 for a, b in zip(days, days[1:])
        ), uid
        v = list(grp.v_micro)
        kinds = list(grp.kind)
        obs_idx = [i for i, k in enumerate(kinds) if k == "obs"]
        for lo, hi in zip(obs_idx, obs_idx[1:]):
            lov, hiv = sorted((v[lo], v[hi]))
            for i in range(lo + 1, hi):
                assert lov - 1 <= v[i] <= hiv + 1, (uid, i)


def test_label_propagation_communities(spark):
    """The sync-LPA output must be a bounded, size-ordered community
    report whose members total at most the vertex count, and the
    largest community must be a genuine multi-vertex cluster."""
    out = sparkgraft.QUERIES["graph_label_propagation"](
        spark, SF_DIR
    ).toPandas()
    assert len(out) <= 20
    sizes = list(out["size"])
    assert sizes == sorted(sizes, reverse=True)
    assert sizes[0] >= 2
    n_parts = sparkgraft.load(spark, SF_DIR, "part").count()
    assert sum(sizes) <= n_parts


def test_zorder_files_cover_rectangles(spark):
    """THE z-order property: every output file's min/max footprint must
    be a small rectangle in the (custkey, orderdate) plane — mean
    per-file range fraction well under a full-width stripe on BOTH
    dimensions (a single-key sort gives ~1.0 on the other key)."""
    import os

    from pyspark.sql import functions as F

    from sparkgraft.scans import _scratch

    sparkgraft.QUERIES["sink_zorder_write"](spark, SF_DIR).collect()
    out = _scratch(SF_DIR, "orders_zorder")
    files = sorted(
        os.path.join(out, f)
        for f in os.listdir(out)
        if f.endswith(".parquet")
    )
    assert len(files) >= 4
    o = sparkgraft.load(spark, SF_DIR, "orders")
    g = o.agg(
        F.min("o_custkey"), F.max("o_custkey"),
        F.min("o_orderdate"), F.max("o_orderdate"),
    ).collect()[0]
    cspan = g[1] - g[0] + 1
    dspan = (g[3] - g[2]).total_seconds() + 1
    cfr, dfr = [], []
    for f in files:
        st = (
            spark.read.parquet(f)
            .agg(
                F.min("o_custkey"), F.max("o_custkey"),
                F.min("o_orderdate"), F.max("o_orderdate"),
            )
            .collect()[0]
        )
        cfr.append((st[1] - st[0] + 1) / cspan)
        dfr.append(((st[3] - st[2]).total_seconds() + 1) / dspan)
    mean_c = sum(cfr) / len(cfr)
    mean_d = sum(dfr) / len(dfr)
    assert mean_c < 0.6, cfr
    assert mean_d < 0.75, dfr


def test_incremental_read_touches_only_delta_files(spark):
    """THE incremental property: the planned scan's file set must be
    exactly commit 2's files — none of snapshot 1's data is re-read."""
    from sparkgraft.scans import _scratch

    df = sparkgraft.QUERIES["scan_snapshot_incremental"](spark, SF_DIR)
    df.collect()
    touched = {f.split("://")[-1] for f in df.inputFiles()}
    snap1 = _scratch(SF_DIR, "inc_snap1")
    snap2 = _scratch(SF_DIR, "inc_snap2")
    assert touched, "no input files resolved"
    assert all(f.startswith(snap2) for f in touched), touched
    assert not any(f.startswith(snap1) for f in touched), touched


def test_shortest_path_dominates_bfs_reachability(spark):
    """Weighted SSSP sanity: every reported cost is positive and a
    multiple-free sum of edge costs (each edge cost = 1000000 div sup
    with sup >= 2, so costs are <= 500000 per hop and total <= 4 hops
    x 500000); the cheapest non-seed part must sit one strong edge
    away (cost < 500001)."""
    out = sparkgraft.QUERIES["graph_shortest_path_bounded"](
        spark, SF_DIR
    ).toPandas()
    assert 0 < len(out) <= 20
    assert (out.dist_cost > 0).all()
    assert (out.dist_cost <= 4 * 500000).all()
    costs = list(out.dist_cost)
    assert costs == sorted(costs)
    assert costs[0] <= 500000


def test_weighted_sample_rate_tracks_weight(spark):
    """Weight-proportionality: the kept fraction must exceed the naive
    uniform share for heavy docs — overall kept_weight / total_weight
    must exceed n_kept / n_docs (long docs are oversampled), and every
    source must keep a non-degenerate share."""
    from pyspark.sql import functions as F

    rep = sparkgraft.QUERIES["sample_weighted_hash"](spark, SF_DIR).toPandas()
    d = sparkgraft.load(spark, SF_DIR, "documents")
    total_w = d.agg(F.sum(F.col("n_chars").cast("long"))).collect()[0][0]
    frac_rows = rep.n_kept.sum() / rep.n_docs.sum()
    frac_weight = rep.kept_weight.sum() / total_w
    assert 0.05 < frac_rows < 0.95
    assert frac_weight > frac_rows
    assert (rep.n_kept > 0).all()
    assert (rep.n_kept <= rep.n_docs).all()


def test_chain_ladder_triangle_properties(spark):
    """Development factors must be >= 1 (cumulative value never
    decreases within a cohort), ages must be contiguous from 0, and
    the observing-cohort count must shrink (weakly) with age — the
    triangle's diagonal."""
    t = (
        sparkgraft.QUERIES["agg_chain_ladder"](spark, SF_DIR)
        .toPandas()
        .sort_values("age")
    )
    assert len(t) > 3
    assert list(t.age) == list(range(len(t)))
    assert (t.factor_micro >= 1_000_000).all()
    assert (t.sum_next_micro >= t.sum_curr_micro).all()
    ncoh = list(t.n_cohorts)
    assert all(b <= a for a, b in zip(ncoh, ncoh[1:]))


def test_kneser_ney_probabilities_valid(spark):
    """Smoothed bigram probabilities are genuine probabilities (in
    (0, 1]), rows arrive count-descending, and the discount bites:
    every smoothed p must be strictly below the raw MLE c/c(w1) + the
    continuation share it could maximally inherit (i.e. below 1)."""
    kn = sparkgraft.QUERIES["text_kneser_ney_bigram"](
        spark, SF_DIR
    ).toPandas()
    assert len(kn) == 20
    assert (kn.c >= 1).all()
    counts = list(kn.c)
    assert counts == sorted(counts, reverse=True)
    assert (kn.pkn_micro > 0).all()
    assert (kn.pkn_micro <= 1_000_000).all()


def test_poisson_bootstrap_distribution(spark):
    """32 replicas, each with effective mass ~Poisson(1)·n (within 10%
    of n), replica means clustering around the true mean (every
    replica within 5%), and a non-degenerate spread (at least 8
    distinct replica means — identical means would indicate the mix is
    not varying by replica)."""
    from pyspark.sql import functions as F

    bs = sparkgraft.QUERIES["agg_poisson_bootstrap_ci"](
        spark, SF_DIR
    ).toPandas()
    assert len(bs) == 32
    o = sparkgraft.load(spark, SF_DIR, "orders")
    n = o.count()
    true_mean = (
        o.agg(
            F.avg(F.round(F.col("o_totalprice") * 100).cast("long"))
        ).collect()[0][0]
    )
    assert ((bs.n_eff - n).abs() < 0.10 * n).all(), list(bs.n_eff)
    rel = (bs.mean_cents - true_mean).abs() / true_mean
    assert (rel < 0.05).all(), list(bs.mean_cents)
    assert bs.mean_cents.nunique() >= 8


def test_pq_reconstruction_min_snap_bites(spark):
    """The PQ assignment must actually minimize: the reported average
    error per subspace must be <= the average distance to any SINGLE
    fixed codebook entry (recomputed independently in numpy), and
    strictly better for at least one subspace."""
    import numpy as np

    out = (
        sparkgraft.QUERIES["sim_pq_reconstruction"](spark, SF_DIR)
        .toPandas()
        .sort_values("subspace")
    )
    assert list(out.subspace) == list(range(8))
    e = (
        sparkgraft.load(spark, SF_DIR, "embeddings")
        .toPandas()
        .sort_values("vec_id")
    )
    m = np.floor(
        np.stack(e.embedding.to_numpy()).astype(np.float64) * 1e6 + 0.5
    ).astype(np.int64)
    assert (out.n_vecs == len(m)).all()
    c0 = m[list(e.vec_id).index(0)]
    better = 0
    for s in range(8):
        sl = slice(s * 8, (s + 1) * 8)
        base = ((m[:, sl] - c0[sl]) ** 2).sum(axis=1).mean()
        avg = float(out.avg_err.iloc[s])
        assert avg <= base + 1, (s, avg, base)
        if avg < base - 1:
            better += 1
    assert better >= 1
    assert (out.total_err > 0).all()


def test_theil_sen_matches_numpy_median(spark):
    """The reported Theil-Sen slope must equal an independent numpy
    median over all pairwise monthly slopes, and the Mann-Kendall S
    must agree in sign with it (both measure the same monotone
    trend); the variance numerator must match the no-ties closed
    form when no monthly totals collide."""
    import numpy as np
    from pyspark.sql import functions as F

    out = sparkgraft.QUERIES["agg_theil_sen_trend"](spark, SF_DIR).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    m = (
        sparkgraft.load(spark, SF_DIR, "orders")
        .groupBy(
            (F.year("o_orderdate").cast("long") * 12
             + F.month("o_orderdate")).alias("t")
        )
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
             .alias("x"))
        .toPandas()
        .sort_values("t")
    )
    t, x = m.t.to_numpy(), m.x.to_numpy().astype(float)
    slopes = [
        (x[j] - x[i]) / (t[j] - t[i])
        for i in range(len(t))
        for j in range(i + 1, len(t))
    ]
    assert r.n_pairs == len(slopes)
    med = float(np.median(slopes))
    assert abs(r.slope_milli_cents - med * 1000) <= 1, (
        r.slope_milli_cents,
        med * 1000,
    )
    s = sum(np.sign(x[j] - x[i]) for i in range(len(t))
            for j in range(i + 1, len(t)))
    assert r.s_stat == int(s)
    if r.s_stat != 0:
        assert np.sign(r.s_stat) == np.sign(r.slope_milli_cents)
    n = r.n_months
    if m.x.nunique() == len(m):
        assert r.var_num == n * (n - 1) * (2 * n + 5)


def test_kcore_members_are_cohesive(spark):
    """Every reported core member must have induced degree >= k (=3),
    the core size must be consistent across rows, and the core must be
    a strict subset of the co-purchase vertex set (peeling removed
    something on this corpus, where degree-1 leaves abound)."""
    out = sparkgraft.QUERIES["graph_kcore"](spark, SF_DIR).toPandas()
    if len(out) == 0:
        import pytest

        pytest.skip("empty 3-core at this SF")
    assert (out.degree >= 3).all()
    assert out.core_size.nunique() == 1
    assert len(out) <= min(20, int(out.core_size.iloc[0]))


def test_content_uuid_is_idempotent_and_wellformed(spark):
    """Same text -> same UUID (idempotency across a rerun), distinct
    texts -> distinct UUIDs, and every ID matches the RFC-4122 v3
    shape (version nibble 3, variant in 89ab)."""
    import re

    a = sparkgraft.QUERIES["fn_content_uuid"](spark, SF_DIR).toPandas()
    b = sparkgraft.QUERIES["fn_content_uuid"](spark, SF_DIR).toPandas()
    assert a.equals(b)
    pat = re.compile(
        r"^[0-9a-f]{8}-[0-9a-f]{4}-3[0-9a-f]{3}-[89ab][0-9a-f]{3}"
        r"-[0-9a-f]{12}$"
    )
    assert a.content_uuid.map(lambda u: bool(pat.match(u))).all()
    d = sparkgraft.load(spark, SF_DIR, "documents").toPandas()
    n_texts = d.text.nunique()
    assert a.content_uuid.nunique() == n_texts
