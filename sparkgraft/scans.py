"""Scans / sources / sinks (SURVEY.md §2.1).

The format-conversion and compaction utilities of the Hadoop canon. Sink
operators write under a per-SF scratch dir and return the read-back
DataFrame, so the driver's rows-only check validates the round-trip.
"""

from __future__ import annotations

import functools
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import TABLES, load
from .registry import query

_SCRATCH = os.path.join(tempfile.gettempdir(), "sparkgraft_sinks")


def _scratch(sf_dir: str, name: str) -> str:
    # Per-process token: every _scratch consumer writes then reads back
    # within one invocation, so pid isolation makes concurrent bench +
    # preflight runs on the same sf_dir race-free (same fix the bucketed
    # join warehouse got).
    tag = sf_dir.strip("/").replace("/", "_")
    return os.path.join(_SCRATCH, f"{tag}_pid{os.getpid()}", name)


@query(
    "scan_parquet",
    oracle="SELECT * FROM nation",
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan, stable column order (schema-first: FIXTURES.md order)."""
    return load(spark, sf_dir, "nation")


@query(
    "scan_projection_pushdown",
    oracle="SELECT l_orderkey, l_quantity FROM lineitem",
)
def scan_projection_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pruned scan: parquet reads exactly 2 of 11 columns
    (asserted on the plan in tests/test_plans.py)."""
    return load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")


@query(
    "scan_text_lines",
    oracle="SELECT count(*) AS n FROM documents WHERE length(text) > 0",
)
def scan_text_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hadoop `grep -c` shape: treat the corpus as lines, count non-empty."""
    return (
        load(spark, sf_dir, "documents")
        .select("text")
        .filter(F.length("text") > 0)
        .agg(F.count("*").alias("n"))
    )


@query(
    "scan_csv_roundtrip",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
)
def scan_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format-conversion utility (the distcp/csv shape): parquet → CSV →
    read back with the EXPLICIT catalog schema (never inferSchema — one
    extra full pass at scale and type drift besides). Oracle-checkable
    because the round-trip must be lossless for this all-ASCII dim."""
    out = _scratch(sf_dir, "nation_csv")
    load(spark, sf_dir, "nation").write.mode("overwrite").option("header", True).csv(out)
    return spark.read.schema(TABLES["nation"]).option("header", True).csv(out)


@query(
    "scan_json_roundtrip",
    oracle="""
    SELECT c_mktsegment, count(*) AS n, round(sum(c_acctbal), 4) AS total_bal
    FROM customer GROUP BY c_mktsegment
    """,
)
def scan_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-Lines conversion (the classic Hadoop log format): parquet →
    JSONL → read back with the explicit catalog schema, then aggregate —
    proving the round-trip lost nothing the aggregation can see."""
    out = _scratch(sf_dir, "customer_json")
    load(spark, sf_dir, "customer").write.mode("overwrite").json(out)
    back = spark.read.schema(TABLES["customer"]).json(out)
    return back.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        F.round(F.sum("c_acctbal"), 4).alias("total_bal"),
    )


@query(
    "scan_orc_roundtrip",
    oracle="""
    SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 4) AS total
    FROM orders GROUP BY o_orderstatus
    """,
)
def scan_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC conversion (the Hive columnar format of the Hadoop world):
    parquet → ORC → read back → aggregate. Timestamps survive natively
    (ORC stores µs), so orders' o_orderdate needs no special casing."""
    out = _scratch(sf_dir, "orders_orc")
    src = load(spark, sf_dir, "orders")
    src.write.mode("overwrite").orc(out)
    # Read back with the writer's exact schema: parquet surfaces
    # o_orderdate as TIMESTAMP_NTZ, and ORC refuses an NTZ→LTZ cast, so
    # the catalog's LTZ declaration cannot be used here.
    back = spark.read.schema(src.schema).orc(out)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 4).alias("total"),
    )


@query(
    "sink_partitioned_write",
    oracle="""
    SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS qty
    FROM lineitem WHERE l_returnflag = 'R'
    GROUP BY l_returnflag
    """,
)
def sink_partitioned_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned output (the MapReduce part-*/ dir shape):
    write lineitem partitioned by returnflag, read back ONE partition —
    partition pruning turns the read into a single-directory scan."""
    out = _scratch(sf_dir, "lineitem_by_flag")
    (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_quantity", "l_returnflag")
        .write.mode("overwrite")
        .partitionBy("l_returnflag")
        .parquet(out)
    )
    return (
        spark.read.parquet(out)
        .filter(F.col("l_returnflag") == "R")
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
    )


@query(
    "sink_compaction",
    oracle="""
    SELECT count(*)                    AS n_rows,
           round(sum(o_totalprice), 2) AS total,
           count(DISTINCT o_orderkey)  AS n_keys
    FROM orders
    """,
)
def sink_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction: explode input into many files, compact to 4
    with repartition (full shuffle, even sizes — coalesce would skew).
    Returns a digest proving content survived both rewrites."""
    scattered = _scratch(sf_dir, "orders_scattered")
    compacted = _scratch(sf_dir, "orders_compacted")
    o = load(spark, sf_dir, "orders")
    o.repartition(64).write.mode("overwrite").parquet(scattered)
    spark.read.parquet(scattered).repartition(4).write.mode("overwrite").parquet(compacted)
    back = spark.read.parquet(compacted)
    return back.agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
        F.countDistinct("o_orderkey").alias("n_keys"),
    )


@query(
    "scan_partition_pruned_read",
    oracle="""
    SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value
    FROM events
    WHERE event_type IN ('click', 'purchase')
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def scan_partition_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition pruning end-to-end, oracle-checked: write events
    Hive-partitioned by event_type, read back with a partition-column
    filter — the scan touches 2 of 5 directories (PartitionFilters in the
    plan, asserted in tests/test_plans.py), the pruned read must equal
    the plain filtered aggregate over the source table."""
    out = _scratch(sf_dir, "events_by_type")
    (
        load(spark, sf_dir, "events")
        .write.mode("overwrite")
        .partitionBy("event_type")
        .parquet(out)
    )
    return (
        spark.read.parquet(out)
        .filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .orderBy("event_type")
    )


@query(
    "scan_schema_merge",
    oracle="""
    SELECT CASE WHEN o_orderkey % 2 = 1 THEN o_orderstatus
                ELSE 'MISSING' END          AS status,
           count(*)                         AS n,
           round(sum(o_totalprice), 2)      AS total
    FROM orders
    GROUP BY 1
    ORDER BY status
    """,
)
def scan_schema_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution (the Hadoop data-lake drift reality): an old
    writer produced (o_orderkey, o_totalprice), a newer one added
    o_orderstatus. ``mergeSchema`` unifies the footers at read time; rows
    from the old files surface NULL for the added column. Merge is a
    footer-level operation — at 100 TB the data files are never
    rewritten, which is the point of the utility."""
    out = _scratch(sf_dir, "orders_evolving")
    o = load(spark, sf_dir, "orders")
    (
        o.filter(F.col("o_orderkey") % 2 == 0)
        .select("o_orderkey", "o_totalprice")
        .write.mode("overwrite")
        .parquet(os.path.join(out, "v=1"))
    )
    (
        o.filter(F.col("o_orderkey") % 2 == 1)
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
        .write.mode("overwrite")
        .parquet(os.path.join(out, "v=2"))
    )
    merged = spark.read.option("mergeSchema", True).parquet(
        os.path.join(out, "v=1"), os.path.join(out, "v=2")
    )
    return (
        merged.groupBy(
            F.coalesce("o_orderstatus", F.lit("MISSING")).alias("status")
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .orderBy("status")
    )


@query(
    "sink_codec_roundtrip",
    oracle="""
    SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def sink_codec_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-codec conversion (the recompression utility of the
    Hadoop canon): lineitem rewritten zstd then gzip, read back,
    aggregated. Codec is a file-level property — the query layer must be
    byte-identical through any codec change."""
    z = _scratch(sf_dir, "lineitem_zstd")
    g = _scratch(sf_dir, "lineitem_gzip")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    li.write.mode("overwrite").option("compression", "zstd").parquet(z)
    spark.read.parquet(z).write.mode("overwrite").option("compression", "gzip").parquet(g)
    return (
        spark.read.parquet(g)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
        .orderBy("l_returnflag")
    )


@query(
    "scan_catalog_counts",
    oracle="""
    SELECT 'customer' AS tbl, count(*) AS n FROM customer
    UNION ALL SELECT 'documents',  count(*) FROM documents
    UNION ALL SELECT 'embeddings', count(*) FROM embeddings
    UNION ALL SELECT 'events',     count(*) FROM events
    UNION ALL SELECT 'lineitem',   count(*) FROM lineitem
    UNION ALL SELECT 'nation',     count(*) FROM nation
    UNION ALL SELECT 'orders',     count(*) FROM orders
    UNION ALL SELECT 'part',       count(*) FROM part
    UNION ALL SELECT 'region',     count(*) FROM region
    UNION ALL SELECT 'supplier',   count(*) FROM supplier
    ORDER BY tbl
    """,
)
def scan_catalog_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-accounting utility (`hadoop fs -count` canon): one row per
    catalog table with its row count — a union of 10 count aggregates,
    each a metadata-cheap parquet count(*) (rowgroup stats, no data
    decode)."""
    counts = None
    for name in sorted(TABLES):
        one = load(spark, sf_dir, name).agg(F.count("*").alias("n")).select(
            F.lit(name).alias("tbl"), "n"
        )
        counts = one if counts is None else counts.unionByName(one)
    return counts.orderBy("tbl")


@query(
    "sink_merge_upsert",
    oracle="""
    WITH upd AS (
      SELECT o_orderkey, o_totalprice * 1.1 AS o_totalprice
      FROM orders WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT o_orderkey + 100000000, o_totalprice
      FROM orders WHERE o_orderkey % 97 = 0
    ),
    merged AS (
      SELECT coalesce(u.o_orderkey, b.o_orderkey)       AS o_orderkey,
             coalesce(u.o_totalprice, b.o_totalprice)   AS o_totalprice
      FROM (SELECT o_orderkey, o_totalprice FROM orders) b
      FULL OUTER JOIN upd u ON b.o_orderkey = u.o_orderkey
    )
    SELECT count(*)                               AS n_rows,
           count(DISTINCT o_orderkey)             AS n_keys,
           round(sum(o_totalprice), 2)            AS total,
           count(*) FILTER (WHERE o_orderkey >= 100000000) AS n_inserted
    FROM merged
    """,
)
def sink_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert (merge) into an immutable columnar store — the incremental-
    ETL step the Hadoop world ran as a full partition rewrite, and the
    batch form of what table formats call MERGE INTO: a change set (10%
    updated rows + a disjoint insert slice) full-outer-joined against the
    base on the key, change rows winning via coalesce, result written
    to parquet and read back for the digest. One key-partitioned shuffle
    join sized by base+changes; at 100 TB the same plan applies per
    partition of a date-partitioned base (rewrite only touched
    partitions), which keeps the join input bounded."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    upd = (
        o.filter(F.col("o_orderkey") % 10 == 0)
        .select("o_orderkey", (F.col("o_totalprice") * 1.1).alias("o_totalprice"))
        .unionByName(
            o.filter(F.col("o_orderkey") % 97 == 0).select(
                (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
                "o_totalprice",
            )
        )
    )
    merged = (
        o.alias("b")
        .join(upd.alias("u"), F.col("b.o_orderkey") == F.col("u.o_orderkey"), "full_outer")
        .select(
            F.coalesce(F.col("u.o_orderkey"), F.col("b.o_orderkey")).alias("o_orderkey"),
            F.coalesce(F.col("u.o_totalprice"), F.col("b.o_totalprice")).alias("o_totalprice"),
        )
    )
    out = _scratch(sf_dir, "orders_merged")
    merged.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    return back.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("o_orderkey").alias("n_keys"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
        F.count(F.when(F.col("o_orderkey") >= 100000000, 1)).alias("n_inserted"),
    )


@query(
    "scan_file_provenance",
    oracle="""
    SELECT 'lineitem.parquet' AS file_name,
           count(*)           AS n_rows,
           count(DISTINCT l_orderkey) AS n_keys
    FROM lineitem
    """,
)
def scan_file_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Input-file lineage (`input_file_name()`): every row carries the
    file it came from — the provenance column an audit/backfill pipeline
    groups by to find bad source files. Grouping by the extracted
    basename proves the virtual column resolves to the real scan file;
    at 100 TB the same query profiles per-file row counts across a
    many-thousand-file table with no extra scan cost (the value is
    task-local metadata, not data)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.regexp_extract(F.input_file_name(), "[^/]+$", 0).alias("file_name")
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("l_orderkey").alias("n_keys"),
        )
    )


@query(
    "scan_dpp_join",
    oracle="""
    SELECT o_orderpriority, count(*)::BIGINT AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    WHERE substr(o_orderpriority, 1, 1) IN ('1', '2')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def scan_dpp_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning — THE scan optimization that makes
    star joins viable on a partitioned 100 TB fact table: the fact side
    is written Hive-partitioned on the join key, the dim side carries a
    filter Catalyst cannot fold statically (a distinct over a filtered
    scan), and at runtime Spark turns the dim's build-side values into
    a partition filter on the fact scan (visible as
    ``dynamicpruningexpression`` in the plan, asserted in
    tests/test_plans.py) — so only the matching partition directories
    are read at all. The oracle is the equivalent static filter."""
    out = _scratch(sf_dir, "orders_by_prio")
    o = load(spark, sf_dir, "orders")
    o.write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
    fact = spark.read.parquet(out)
    dim = (
        o.filter(F.substring("o_orderpriority", 1, 1).isin("1", "2"))
        .select("o_orderpriority")
        .distinct()
    )
    return (
        fact.join(F.broadcast(dim), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "scan_csv_malformed",
    oracle="""
    SELECT count(*)::BIGINT AS n_clean,
           sum(n_nationkey)::BIGINT AS key_sum,
           3::BIGINT AS n_corrupt
    FROM nation
    """,
)
def scan_csv_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record quarantine — what real CSV feeds need on day one:
    rows that don't parse must be COUNTED AND SET ASIDE, never silently
    dropped or allowed to poison the clean columns. The clean dim is
    written to CSV, three corrupt lines (wrong arity / bad int / raw
    junk) are appended to the directory, and the read-back uses
    PERMISSIVE mode with ``columnNameOfCorruptRecord``: clean rows parse
    into typed columns with the corrupt slot NULL, broken rows surface
    with the raw line captured. The quarantine count is data-derived, so
    the oracle's constant 3 proves the three planted rows were caught —
    no more, no fewer — and the clean aggregate proves none of them
    leaked into the typed columns. Row-local parsing: scales as a pure
    scan."""
    import os

    from pyspark.sql import types as T

    out = _scratch(sf_dir, "nation_malformed_csv")
    load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    ).write.mode("overwrite").csv(out)
    with open(os.path.join(out, "part-zz-corrupt.csv"), "w") as f:
        f.write("7,EXTRA,3,unexpected-fourth-field\n")   # wrong arity
        f.write("not_an_int,BADKEY,1\n")                 # unparsable int
        f.write("garbage line without any commas\n")     # raw junk
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.LongType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.LongType()),
            T.StructField("_corrupt", T.StringType()),
        ]
    )
    back = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(out)
        .cache()  # one pass serves both branches; corrupt capture is per-scan
    )
    clean = back.filter(F.col("_corrupt").isNull())
    return clean.agg(
        F.count("*").alias("n_clean"),
        F.sum("n_nationkey").alias("key_sum"),
        F.lit(
            back.filter(F.col("_corrupt").isNotNull()).count()
        ).cast("long").alias("n_corrupt"),
    )


@query(
    "sink_clustered_write",
    oracle="""
    SELECT event_type,
           count(*)::BIGINT AS n_rows,
           count(DISTINCT user_id)::BIGINT AS n_users,
           true AS files_internally_sorted
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def sink_clustered_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustered layout write — the parquet organization that makes
    100 TB data-skipping real: partition directories by the coarse key
    (event_type) and `sortWithinPartitions(ts)` inside each task so
    every file's row groups carry tight, non-overlapping ts min/max
    stats (a later `WHERE ts BETWEEN …` skips whole row groups; an
    unsorted write makes every file's stats span everything and skips
    nothing). sortWithinPartitions is a LOCAL sort — no Exchange, each
    write task sorts only its own rows. The read-back audit proves the
    clustering physically landed: per input file, a lag() window checks
    ts never decreases; the oracle pins the per-partition aggregates
    plus the every-file-sorted flag."""
    out = _scratch(sf_dir, "events_clustered")
    (
        load(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .repartition("event_type")
        # The partition column LEADS the local sort: Spark's planned
        # write requires ordering by partition columns and would insert
        # its own Sort(event_type) — EliminateSorts then deletes a
        # sortWithinPartitions that doesn't already satisfy it, silently
        # un-clustering the files. Leading with event_type makes this
        # sort BE the write's required ordering, so the ts clustering
        # survives (verified by a negative control in tests).
        .sortWithinPartitions("event_type", "ts", "event_id")
        .write.mode("overwrite")
        .partitionBy("event_type")
        .parquet(out)
    )
    from pyspark.sql import Window

    # The sortedness check must follow the file's PHYSICAL row order —
    # ordering the window by ts itself would be circularly true. The
    # monotonic id captures scan order within each read split.
    back = (
        spark.read.parquet(out)
        .withColumn("_file", F.input_file_name())
        .withColumn("_rid", F.monotonically_increasing_id())
    )
    w = Window.partitionBy("_file").orderBy("_rid")
    audited = back.withColumn(
        "monotone",
        F.lag("ts").over(w).isNull() | (F.lag("ts").over(w) <= F.col("ts")),
    )
    return (
        audited.groupBy("event_type")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("user_id").alias("n_users"),
            F.every(F.col("monotone")).alias("files_internally_sorted"),
        )
        .orderBy("event_type")
    )


@query(
    "scan_binary_files",
    oracle="""
    WITH c AS (
      SELECT doc_id % 8 AS bucket,
             string_agg(text, chr(10) ORDER BY doc_id) || chr(10) AS content
      FROM documents GROUP BY doc_id % 8)
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(octet_length(encode(content)) AS BIGINT) AS n_bytes,
           md5(content) AS digest
    FROM c ORDER BY bucket
    """,
)
def scan_binary_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``binaryFile`` source — Spark's whole-file ingestion path for
    opaque payloads (images, audio, model shards), the `hadoop fs -get |
    md5sum` audit. Documents are spilled to eight bucket-partitioned
    text files (one file per bucket: each bucket lives in exactly one
    task, rows sorted by doc_id, so the bytes are deterministic), then
    read back as whole binary blobs whose per-file length and MD5 are
    proven against the oracle's reconstruction of the same bytes. The
    partition column rides directory discovery exactly as it would on a
    100 TB media lake; file contents never pass through the driver."""
    d = load(spark, sf_dir, "documents").select(
        (F.col("doc_id") % 8).alias("bucket"), "doc_id", "text"
    )
    path = _scratch(sf_dir, "binary_files")
    (
        d.repartition(8, "bucket")
        .sortWithinPartitions("bucket", "doc_id")
        .select("text", "bucket")  # text source allows 1 data column
        .write.mode("overwrite")
        .option("compression", "none")
        .partitionBy("bucket")
        .text(path)
    )
    files = spark.read.format("binaryFile").load(path)
    return (
        files.select(
            F.col("bucket").cast("long").alias("bucket"),
            F.col("length").cast("long").alias("n_bytes"),
            F.md5("content").alias("digest"),
        )
        .orderBy("bucket")
    )


@query(
    "sink_dynamic_overwrite",
    oracle="""
    SELECT event_type,
           CAST(CASE WHEN event_type = 'click'
                     THEN sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)
                     ELSE count(*) END AS BIGINT) AS n_rows
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def sink_dynamic_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC partition overwrite — the table-maintenance semantics
    every partitioned lake table depends on: a second overwrite write
    containing only 'click' rows (even event_ids) must replace ONLY the
    click partition and leave every other partition byte-identical
    (static mode would silently truncate them — THE classic data-loss
    footgun this key pins). Read-back counts per partition prove it,
    against an oracle computing the expected post-overwrite state from
    the source table. Second write + read-back touch one partition's
    files only (partition pruning on both paths)."""
    out = _scratch(sf_dir, "dyn_overwrite")
    e = load(spark, sf_dir, "events").select("event_id", "value", "event_type")
    e.write.mode("overwrite").partitionBy("event_type").parquet(out)
    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            e.filter(
                (F.col("event_type") == "click") & (F.col("event_id") % 2 == 0)
            )
            .write.mode("overwrite")
            .partitionBy("event_type")
            .parquet(out)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)
    return (
        spark.read.parquet(out)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_rows"))
        .orderBy("event_type")
    )


@query(
    "scan_cache_reuse",
    oracle="""
    WITH agg AS (
      SELECT c_nationkey, count(*) AS n_cust,
             sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS cents
      FROM customer GROUP BY c_nationkey)
    SELECT a.c_nationkey,
           CAST(a.n_cust AS BIGINT) AS n_cust,
           round(CAST(a.cents AS DOUBLE) / 100.0, 2) AS balance,
           CAST(b.n_cust AS BIGINT) AS n_cust_again
    FROM agg a JOIN agg b ON b.c_nationkey = a.c_nationkey
    ORDER BY a.c_nationkey
    """,
)
def scan_cache_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit dataset caching: an aggregated frame is `.cache()`d and
    consumed TWICE (self-join of two readers) — the second consumer
    must hit the in-memory columnar store (InMemoryTableScan in the
    plan, asserted in tests), not re-run the aggregate against the
    parquet. The cache-or-recompute answer is identical by
    construction; what this key pins is the REUSE surface — the
    workhorse of iterative/interactive workloads. The cached frame is
    the small aggregate (bounded by the nation key domain), never the
    raw corpus; unpersist happens via Spark's LRU as usual."""
    agg = (
        load(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_cust"),
            F.sum(F.round(F.col("c_acctbal") * 100).cast("long")).alias(
                "cents"
            ),
        )
        .cache()
    )
    b = agg.select(
        F.col("c_nationkey").alias("bk"), F.col("n_cust").alias("n_cust_again")
    )
    return (
        agg.join(b, F.col("bk") == F.col("c_nationkey"))
        .select(
            "c_nationkey",
            F.col("n_cust").cast("long").alias("n_cust"),
            F.round(F.col("cents").cast("double") / 100.0, 2).alias("balance"),
            F.col("n_cust_again").cast("long").alias("n_cust_again"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "scan_recursive_lookup",
    oracle="""
    SELECT event_type, count(*) AS n FROM events
    GROUP BY event_type ORDER BY event_type
    """,
)
def scan_recursive_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recursiveFileLookup: data landed in NESTED subdirectories (the
    date-sharded landing-zone layout upstream jobs produce) read back
    with one option instead of a glob-per-level — and WITHOUT partition
    discovery treating the directory names as columns. Files are staged
    two levels deep; the read must see every row exactly once."""
    out = _scratch(sf_dir, "nested_events")
    done = os.path.join(out, "_staged")
    if not os.path.exists(done):
        e = load(spark, sf_dir, "events")
        for i, sub in enumerate(("2024/w1", "2024/w2", "2023/w9")):
            (
                e.filter(F.col("event_id") % 3 == i)
                .write.mode("overwrite")
                .parquet(os.path.join(out, sub))
            )
        open(done, "w").close()
    back = (
        spark.read.option("recursiveFileLookup", "true")
        .schema(load(spark, sf_dir, "events").schema)
        .parquet(out)
    )
    return (
        back.groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .orderBy("event_type")
    )


@query(
    "scan_glob_filter",
    oracle="""
    SELECT event_type, count(*) AS n FROM events
    WHERE event_type IN ('click', 'view')
    GROUP BY event_type ORDER BY event_type
    """,
)
def scan_glob_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pathGlobFilter: a landing directory holds BOTH real data files
    and sidecar junk (manifests, temp dumps under other extensions) —
    the option restricts the scan to `*.parquet` WITHOUT listing-time
    gymnastics, and unlike a post-hoc filter the junk files are never
    even opened. Staged: click/view events as parquet + a decoy .json
    dump of error events in the SAME directory; the glob-filtered read
    must see exactly the parquet rows."""
    out = _scratch(sf_dir, "glob_filtered")
    done = os.path.join(out, "_staged")
    e = load(spark, sf_dir, "events")
    if not os.path.exists(done):
        (
            e.filter(F.col("event_type").isin("click", "view"))
            .write.mode("overwrite")
            .parquet(out)
        )
        # decoy sidecars the scan must ignore
        (
            e.filter(F.col("event_type") == "error")
            .coalesce(1)
            .write.mode("overwrite")
            .json(os.path.join(out, "junk_dump"))
        )
        open(done, "w").close()
    back = (
        spark.read.option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .schema(e.schema)
        .parquet(out)
    )
    return (
        back.groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .orderBy("event_type")
    )


@query(
    "scan_bloom_filter_pointlookup",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM orders
    WHERE o_custkey IN (17, 1700, 170000)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def scan_bloom_filter_pointlookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet BLOOM-FILTER point lookup — the data-skipping layout for
    high-cardinality keys where min/max row-group stats are useless
    (customer ids are spread across every row group, so a `custkey IN
    (...)` filter prunes NOTHING by stats alone; a per-row-group bloom
    filter rejects row groups that definitely lack the key). The write
    sets `parquet.bloom.filter.enabled#o_custkey` so parquet-mr embeds
    a bloom per row group; the read-back pushes the IN filter to the
    scan (PushedFilters: In(o_custkey, ...)), where the parquet reader
    consults the bloom before decoding pages. At 100 TB this is the
    difference between a point lookup touching ~every file and touching
    only the files whose blooms fire. Results are exact either way —
    blooms only skip true negatives — so the oracle is the plain
    filter; the physical proof is the write option + pushed filter
    (plan-asserted in tests/test_plans.py). Note parquet-mr SKIPS the
    bloom for chunks whose column fully dictionary-encodes (the dict is
    already an exact membership filter) — true at the test SFs, false
    for a 100 TB high-cardinality key, which is when the bloom bitsets
    actually land (byte-level-asserted with dictionary off in the plan
    test)."""
    out = _scratch(sf_dir, "orders_bloom")
    (
        load(spark, sf_dir, "orders")
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#o_custkey", "true")
        .option("parquet.bloom.filter.expected.ndv#o_custkey", "200000")
        .parquet(out)
    )
    back = spark.read.parquet(out).filter(
        F.col("o_custkey").isin(17, 1700, 170000)
    )
    return (
        back.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
        .orderBy("o_orderpriority")
    )


_DQ_DATE_CUTOFF = "2000-01-01"


@query(
    "dq_rule_report",
    oracle=f"""
    WITH base AS (
      SELECT count(*) AS n,
             sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS nv_null,
             sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS nv_price,
             sum(CASE WHEN o_orderdate >= TIMESTAMP '{_DQ_DATE_CUTOFF}'
                      THEN 1 ELSE 0 END) AS nv_date,
             sum(CASE WHEN o_orderpriority NOT IN
                      ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')
                      THEN 1 ELSE 0 END) AS nv_prio,
             sum(CASE WHEN o_orderstatus NOT IN ('P','O','F')
                      THEN 1 ELSE 0 END) AS nv_status,
             count(*) - count(DISTINCT o_orderkey) AS nv_unique
      FROM orders),
    fk AS (
      SELECT count(*) AS nv_fk FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM customer c
                        WHERE c.c_custkey = o.o_custkey)),
    rules AS (
      SELECT 'custkey_not_null' AS rule, n, nv_null AS nv FROM base
      UNION ALL SELECT 'fk_customer_exists', b.n, f.nv_fk
                FROM base b CROSS JOIN fk f
      UNION ALL SELECT 'orderdate_in_window', n, nv_date FROM base
      UNION ALL SELECT 'orderkey_unique', n, nv_unique FROM base
      UNION ALL SELECT 'price_positive', n, nv_price FROM base
      UNION ALL SELECT 'priority_in_domain', n, nv_prio FROM base
      UNION ALL SELECT 'status_in_domain', n, nv_status FROM base)
    SELECT rule, CAST(n AS BIGINT) AS n_checked,
           CAST(nv AS BIGINT) AS n_violations, (nv = 0) AS pass
    FROM rules ORDER BY rule
    """,
)
def dq_rule_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality EXPECTATIONS report (the Great-Expectations-style
    validation job every Hadoop-era utility belt carried): seven rules
    over the orders table — null checks, value-domain membership,
    positivity, a freshness window, key uniqueness, and referential
    integrity against customer — each reported as (checked, violations,
    pass). The freshness-window rule genuinely fires on this corpus
    (orders past {_DQ_DATE_CUTOFF}), so the report exercises both
    outcomes.

    Scale shape: all row-local rules fold into ONE conditional
    aggregation pass over the table (single scan, 7-counter reduce);
    uniqueness rides the same pass as an exact distinct; the FK rule is
    one anti-join keyed on the customer key (shuffle equi-join — AQE
    broadcasts the dim when genuinely small). The report itself is a
    7-row constant assembled with stack(), never a per-rule re-scan."""
    o = load(spark, sf_dir, "orders")
    base = o.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias(
            "nv_null"
        ),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias(
            "nv_price"
        ),
        F.sum(
            F.when(
                F.col("o_orderdate")
                >= F.lit(_DQ_DATE_CUTOFF).cast("timestamp"),
                1,
            ).otherwise(0)
        ).alias("nv_date"),
        F.sum(
            F.when(
                ~F.col("o_orderpriority").isin(
                    "1-URGENT",
                    "2-HIGH",
                    "3-MEDIUM",
                    "4-NOT SPECIFIED",
                    "5-LOW",
                ),
                1,
            ).otherwise(0)
        ).alias("nv_prio"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("P", "O", "F"), 1).otherwise(
                0
            )
        ).alias("nv_status"),
        (F.count("*") - F.count_distinct("o_orderkey")).alias("nv_unique"),
    )
    fk = (
        o.join(
            load(spark, sf_dir, "customer").select(
                F.col("c_custkey").alias("o_custkey")
            ),
            "o_custkey",
            "left_anti",
        )
        .agg(F.count("*").alias("nv_fk"))
    )
    stacked = (
        base.crossJoin(F.broadcast(fk))
        .select(
            F.expr(
                "stack(7,"
                " 'custkey_not_null', nv_null,"
                " 'fk_customer_exists', nv_fk,"
                " 'orderdate_in_window', nv_date,"
                " 'orderkey_unique', nv_unique,"
                " 'price_positive', nv_price,"
                " 'priority_in_domain', nv_prio,"
                " 'status_in_domain', nv_status) AS (rule, nv)"
            ),
            "n",
        )
    )
    return stacked.select(
        "rule",
        F.col("n").cast("long").alias("n_checked"),
        F.col("nv").cast("long").alias("n_violations"),
        (F.col("nv") == 0).alias("pass"),
    ).orderBy("rule")


@query(
    "dq_table_checksum",
    oracle="""
    WITH rows_ AS (
      SELECT 'customer' AS tbl,
             CAST(concat('0x', substr(md5(concat_ws('|',
               CAST(c_custkey AS VARCHAR), c_name,
               CAST(c_nationkey AS VARCHAR),
               CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS VARCHAR),
               c_mktsegment)), 1, 15)) AS BIGINT) AS d
      FROM customer
      UNION ALL
      SELECT 'nation',
             CAST(concat('0x', substr(md5(concat_ws('|',
               CAST(n_nationkey AS VARCHAR), n_name,
               CAST(n_regionkey AS VARCHAR))), 1, 15)) AS BIGINT)
      FROM nation
      UNION ALL
      SELECT 'supplier',
             CAST(concat('0x', substr(md5(concat_ws('|',
               CAST(s_suppkey AS VARCHAR), s_name,
               CAST(s_nationkey AS VARCHAR),
               CAST(CAST(round(s_acctbal * 100) AS BIGINT) AS VARCHAR))),
               1, 15)) AS BIGINT)
      FROM supplier)
    SELECT tbl, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(d) AS VARCHAR) AS digest
    FROM rows_ GROUP BY tbl ORDER BY tbl
    """,
)
def dq_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent TABLE CHECKSUMS — the distcp-era "did the copy
    corrupt anything" audit, run after every format conversion or
    migration: each row collapses to a canonical '|'-joined string
    (int keys as decimal text, money as exact int64 cents — never raw
    float rendering, which differs across engines), md5-digested, the
    first 15 hex chars parsed to int64, and SUMMED per table in
    decimal(38,0) so the digest is partition-order independent and
    wrap-free at any row count. Two tables disagree iff (n_rows,
    digest) disagree (sum collisions need engineered inputs — this is
    a corruption tripwire, not a cryptographic commitment). One scan
    per table, one hash agg each; digests move as 8-byte ints."""

    def row_digest(cols):
        return F.conv(
            F.substring(F.md5(F.concat_ws("|", *cols)), 1, 15), 16, 10
        ).cast("decimal(38,0)")

    cents = lambda c: F.round(F.col(c) * 100).cast("long").cast("string")  # noqa: E731
    cust = load(spark, sf_dir, "customer").select(
        F.lit("customer").alias("tbl"),
        row_digest(
            [
                F.col("c_custkey").cast("string"),
                F.col("c_name"),
                F.col("c_nationkey").cast("string"),
                cents("c_acctbal"),
                F.col("c_mktsegment"),
            ]
        ).alias("d"),
    )
    nat = load(spark, sf_dir, "nation").select(
        F.lit("nation").alias("tbl"),
        row_digest(
            [
                F.col("n_nationkey").cast("string"),
                F.col("n_name"),
                F.col("n_regionkey").cast("string"),
            ]
        ).alias("d"),
    )
    sup = load(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("tbl"),
        row_digest(
            [
                F.col("s_suppkey").cast("string"),
                F.col("s_name"),
                F.col("s_nationkey").cast("string"),
                cents("s_acctbal"),
            ]
        ).alias("d"),
    )
    return (
        cust.unionByName(nat)
        .unionByName(sup)
        .groupBy("tbl")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            # digest rendered as digit STRING: DuckDB's HUGEINT sum
            # becomes float64 through pandas otherwise, losing exactness
            F.sum("d").cast("decimal(38,0)").cast("string").alias("digest"),
        )
        .orderBy("tbl")
    )


@query(
    "sink_manifest_atomic_publish",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows_data,
           CAST(count(*) AS BIGINT) AS n_rows_manifest,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents_data,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents_manifest,
           TRUE AS consistent
    FROM orders
    """,
)
def sink_manifest_atomic_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atomic PUBLISH-with-manifest (the _SUCCESS-file pattern grown
    up): write the dataset, then write a 1-row manifest carrying the
    content digest (row count + exact cents total) computed from the
    SAME DataFrame, and have every consumer read data + manifest and
    verify they agree before trusting the copy — the handshake that
    turns "directory of parquet" into "published dataset" (half-written
    or concurrently-rewritten outputs fail the digest check instead of
    silently under-counting). The audit re-aggregates the read-back
    data against the read-back manifest; the oracle pins both sides to
    the source truth, so a silently lossy write breaks the hash gate.
    Manifest reads use an explicit schema (no inference pass)."""
    out = _scratch(sf_dir, "orders_published")
    mf = _scratch(sf_dir, "orders_published_manifest")
    o = load(spark, sf_dir, "orders")
    o.write.mode("overwrite").parquet(out)
    digest = o.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents"),
    )
    digest.write.mode("overwrite").json(mf)
    back = spark.read.parquet(out).agg(
        F.count("*").cast("long").alias("n_rows_data"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents_data"),
    )
    manifest = spark.read.schema("n_rows long, cents long").json(mf).select(
        F.col("n_rows").alias("n_rows_manifest"),
        F.col("cents").alias("cents_manifest"),
    )
    return back.crossJoin(F.broadcast(manifest)).select(
        "n_rows_data",
        "n_rows_manifest",
        "cents_data",
        "cents_manifest",
        (
            (F.col("n_rows_data") == F.col("n_rows_manifest"))
            & (F.col("cents_data") == F.col("cents_manifest"))
        ).alias("consistent"),
    )


# Fixed (sf-independent) scratch path: the oracle SQL string is built at
# import time, before any sf_dir is known, and both engines must read the
# SAME physical files — the pid token keeps concurrent runs isolated.
_META_AUDIT_DIR = os.path.join(_SCRATCH, f"meta_audit_pid{os.getpid()}")


@query(
    "scan_parquet_metadata_audit",
    oracle=f"""
    SELECT path_in_schema AS col,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(total_compressed_size) AS BIGINT) AS compressed,
           CAST(sum(total_uncompressed_size) AS BIGINT) AS uncompressed
    FROM parquet_metadata('{_META_AUDIT_DIR}/*.parquet')
    GROUP BY path_in_schema ORDER BY col
    """,
)
def scan_parquet_metadata_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed parquet FOOTER audit: per column, how many chunks the
    dataset carries and its exact compressed/uncompressed byte totals —
    the storage-health report (compression ratios, bloated columns,
    chunk fragmentation) an engineer reads before re-encoding 100 TB.
    The audit must scale like the data: file paths are listed by the
    binaryFile source (path column only — content pruned) and each
    executor opens ITS files' footers with pyarrow inside mapInPandas;
    only (column, bytes) rows shuffle. The oracle is DuckDB's
    `parquet_metadata()` over the SAME files Spark just wrote — two
    independent parquet implementations must read identical physical
    layout, which also pins the writer's chunk accounting."""
    import pandas as pd

    out = _META_AUDIT_DIR
    load(spark, sf_dir, "orders").write.mode("overwrite").parquet(out)
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(out)
        .select("path")
    )

    def audit(batches):
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for uri in pdf["path"]:
                p = uri[len("file:"):] if uri.startswith("file:") else uri
                md = pq.ParquetFile(p).metadata
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    for ci in range(g.num_columns):
                        c = g.column(ci)
                        rows.append(
                            (
                                c.path_in_schema,
                                c.total_compressed_size,
                                c.total_uncompressed_size,
                            )
                        )
            yield pd.DataFrame(
                rows, columns=["col", "comp", "uncomp"]
            )

    meta = files.mapInPandas(
        audit, "col string, comp long, uncomp long"
    )
    return (
        meta.groupBy("col")
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.sum("comp").cast("long").alias("compressed"),
            F.sum("uncomp").cast("long").alias("uncompressed"),
        )
        .orderBy("col")
    )


@query(
    "scan_sequencefile_roundtrip",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(user_id) AS BIGINT) AS sum_users
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def scan_sequencefile_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SequenceFile round-trip — the literal Hadoop key-value container
    (`hadoop fs -text part-*` canon): events' (user_id, event_type)
    pairs → `saveAsSequenceFile` (LongWritable/Text via the built-in
    Pyrolite converters) → `sc.sequenceFile` read-back → DataFrame
    aggregate proving nothing was lost. This is the ONE operator class
    where the RDD API is the genuine article: SequenceFile IS a KV-pair
    format, its reader/writer are InputFormat/OutputFormat, and each
    task reads/writes its own split exactly as a MapReduce job would —
    parallelism = splits, zero driver materialization. The aggregate
    (and the oracle) runs on the read-back, so the driver's hash check
    validates the full write→read cycle."""
    import shutil

    out = _scratch(sf_dir, "events_seq")
    shutil.rmtree(out, ignore_errors=True)  # RDD saves have no overwrite mode
    pairs = (
        load(spark, sf_dir, "events")
        .select("user_id", "event_type")
        # r14 (guide §2.5 — one unsplittable input): the single-file
        # scan planned ONE task, so the per-row pickle + Writable
        # conversion ran serially; repartition to the core budget so
        # write AND read-back (one split per file) parallelize.
        # Measured: flat at sf0.1 (1.9-2.0 s both forms — fixed
        # Pyrolite overhead dominates), 7.8-10.1 s serial vs 3.4-3.9 s
        # parallel at sf1 (min-of-3 A/B x2 each, quiet host)
        .repartition(spark.sparkContext.defaultParallelism)
        .rdd.map(lambda r: (r[0], r[1]))
    )
    pairs.saveAsSequenceFile(out)
    back = spark.sparkContext.sequenceFile(out)
    return (
        back.toDF(["user_id", "event_type"])
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("user_id").cast("long").alias("sum_users"),
        )
        .orderBy("event_type")
    )


_TT_CUTOFF = "1998-01-01"


@query(
    "scan_snapshot_timetravel",
    oracle=f"""
    SELECT 1 AS snapshot, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM orders WHERE o_orderdate < TIMESTAMP '{_TT_CUTOFF}'
    UNION ALL
    SELECT 2 AS snapshot, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM orders
    ORDER BY snapshot
    """,
)
def scan_snapshot_timetravel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-isolation TIME TRAVEL on a manifest-logged table (the
    Iceberg/Delta core mechanic, reduced to its essence): every commit
    appends immutable data files plus a manifest row enumerating the
    files visible in that snapshot, and a reader pins a version by
    planning the scan from the manifest's file list instead of a
    directory listing. Commit 1 publishes pre-{_TT_CUTOFF} orders;
    commit 2 appends the rest; the query reads BOTH versions of the
    same table — AS OF snapshot 1 and current — and aggregates each.
    Time travel falls out for free: an old snapshot is just an old
    file list, and files are never mutated in place.

    Scale: the manifest is one row per snapshot carrying a file array
    (KB-scale even at thousands of commits — this is why real table
    formats can plan 100 TB tables without listing object storage);
    the data reads are ordinary parquet scans over the enumerated
    files, so pruning/pushdown behave exactly as on a plain path scan.
    The file enumeration at commit time is a bounded driver-side
    listing of the files that commit just wrote, the same work a real
    format's commit protocol does."""
    snap1_dir = _scratch(sf_dir, "tt_snap1")
    snap2_dir = _scratch(sf_dir, "tt_snap2")
    manifest = _scratch(sf_dir, "tt_manifest")
    o = load(spark, sf_dir, "orders")
    cutoff = F.lit(_TT_CUTOFF).cast("timestamp")
    o.filter(F.col("o_orderdate") < cutoff).write.mode("overwrite").parquet(
        snap1_dir
    )
    o.filter(F.col("o_orderdate") >= cutoff).write.mode("overwrite").parquet(
        snap2_dir
    )

    def _data_files(d: str) -> list[str]:
        return sorted(
            os.path.join(d, f)
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    snap1_files = _data_files(snap1_dir)
    log = spark.createDataFrame(
        [(1, snap1_files), (2, snap1_files + _data_files(snap2_dir))],
        "snapshot int, files array<string>",
    )
    log.write.mode("overwrite").json(manifest)

    log_back = spark.read.schema("snapshot int, files array<string>").json(
        manifest
    )
    per_snap = []
    for row in log_back.orderBy("snapshot").collect():  # 2 manifest rows
        per_snap.append(
            spark.read.parquet(*row["files"]).agg(
                F.lit(row["snapshot"]).alias("snapshot"),
                F.count("*").cast("long").alias("n_rows"),
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                .cast("long")
                .alias("cents"),
            )
        )
    out = per_snap[0]
    for df in per_snap[1:]:
        out = out.unionByName(df)
    return out.select("snapshot", "n_rows", "cents").orderBy("snapshot")


@query(
    "dq_reconciliation",
    oracle="""
    WITH tgt AS (
      SELECT * FROM orders WHERE o_orderkey % 997 <> 0),
    s AS (
      SELECT o_orderstatus AS status, count(*) AS n_src,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents_src
      FROM orders GROUP BY 1),
    t AS (
      SELECT o_orderstatus AS status, count(*) AS n_tgt,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents_tgt
      FROM tgt GROUP BY 1)
    SELECT s.status,
           CAST(s.n_src AS BIGINT)  AS n_src,
           CAST(coalesce(t.n_tgt, 0) AS BIGINT) AS n_tgt,
           CAST(s.n_src - coalesce(t.n_tgt, 0) AS BIGINT) AS row_delta,
           CAST(s.cents_src - coalesce(t.cents_tgt, 0) AS BIGINT)
             AS cents_delta,
           (s.n_src = coalesce(t.n_tgt, 0)
            AND s.cents_src = coalesce(t.cents_tgt, 0)) AS in_sync
    FROM s LEFT JOIN t ON s.status = t.status
    ORDER BY s.status
    """,
)
def dq_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-to-target RECONCILIATION report (the distcp-verify /
    replication-audit canon): after copying a table to another system,
    prove the copy faithful by comparing per-group row counts and an
    exact-cents content sum on both sides, reporting the delta per
    group. The target here is a parquet re-write with a simulated
    replication fault (every 997th order key dropped), so the report
    genuinely fires: groups show positive row_delta/cents_delta and
    in_sync=false, and the faulty keys are attributable group-by-group.

    Scale: each side folds to one hash-aggregate keyed on the group
    column (bounded domain), so the comparison shuffles ~|groups| rows
    regardless of table size — the reconciliation never re-reads either
    side row-against-row. That group-digest-first shape is what makes
    cross-system audits feasible at 100 TB; row-level diffing only ever
    runs scoped to the groups this report flags."""
    out = _scratch(sf_dir, "orders_replica")
    o = load(spark, sf_dir, "orders")
    o.filter(F.col("o_orderkey") % 997 != 0).write.mode("overwrite").parquet(
        out
    )
    tgt = spark.read.parquet(out)

    def digest(df: DataFrame, side: str) -> DataFrame:
        return df.groupBy(F.col("o_orderstatus").alias("status")).agg(
            F.count("*").cast("long").alias(f"n_{side}"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias(f"cents_{side}"),
        )

    s, t = digest(o, "src"), digest(tgt, "tgt")
    return (
        s.join(t, "status", "left")
        .select(
            "status",
            "n_src",
            F.coalesce("n_tgt", F.lit(0)).cast("long").alias("n_tgt"),
            (F.col("n_src") - F.coalesce("n_tgt", F.lit(0)))
            .cast("long")
            .alias("row_delta"),
            (F.col("cents_src") - F.coalesce("cents_tgt", F.lit(0)))
            .cast("long")
            .alias("cents_delta"),
            (
                (F.col("n_src") == F.coalesce("n_tgt", F.lit(0)))
                & (F.col("cents_src") == F.coalesce("cents_tgt", F.lit(0)))
            ).alias("in_sync"),
        )
        .orderBy("status")
    )


def _orders_zval(o: DataFrame):
    """16-bit Morton key over (o_custkey, o_orderdate): each key
    quantizes to 8 bits over its observed range (bounds from one 1-row
    aggregate), the z-value interleaves them (c7 d7 c6 d6 …) as pure
    JVM bit arithmetic inside whole-stage codegen. Shared by
    `sink_zorder_write` (the clustered initial write) and
    `sink_optimize_zorder` (the re-clustering OPTIMIZE commit)."""
    bounds = o.agg(
        F.min("o_custkey").alias("cmin"),
        F.max("o_custkey").alias("cmax"),
        F.min(F.to_date("o_orderdate")).alias("dmin"),
        F.max(F.to_date("o_orderdate")).alias("dmax"),
    ).collect()[0]
    cspan = int(bounds["cmax"]) - int(bounds["cmin"]) + 1
    dspan = (bounds["dmax"] - bounds["dmin"]).days + 1
    cb = (
        (F.col("o_custkey") - F.lit(int(bounds["cmin"])))
        * 256
        / F.lit(cspan)
    ).cast("int")
    db = (
        F.datediff(F.to_date("o_orderdate"), F.lit(str(bounds["dmin"])))
        * 256
        / F.lit(dspan)
    ).cast("int")
    z = F.lit(0)
    for i in range(8):
        z = (
            z
            + F.shiftleft(
                F.shiftright(cb, i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
            + F.shiftleft(F.shiftright(db, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return z


@query(
    "sink_zorder_write",
    oracle="""
    SELECT o_orderstatus AS status, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM orders GROUP BY 1 ORDER BY 1
    """,
)
def sink_zorder_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER clustered write: orders laid out along the interleaved-
    bit (Morton) curve over (custkey, orderdate) so file-level min/max
    statistics prune on BOTH columns at once — the multi-dimensional
    counterpart of `sink_clustered_write`'s single-key clustering, and
    the layout trick behind Delta OPTIMIZE ZORDER / Iceberg sort
    orders. Each key quantizes to 8 bits over its observed range
    (bounds from one 1-row aggregate), the 16-bit z-value interleaves
    them (c7 d7 c6 d6 …), and the write is repartitionByRange +
    sortWithinPartitions on z, so every output file covers a small
    RECTANGLE of the (custkey, date) plane instead of a full-width
    stripe. tests/test_plans.py asserts the per-file range-fraction
    bound on both dimensions — the pruning property itself, not just
    the round-trip.

    Content-wise the layout is invisible (the oracle pins the digest);
    the z computation is pure JVM bit arithmetic inside whole-stage
    codegen, and the range partitioner samples z exactly as any global
    sort would — no skew, no broadcast, no driver state beyond the
    2-value bounds row. At 100 TB the identical plan writes as many
    rectangles as there are output partitions."""
    out = _scratch(sf_dir, "orders_zorder")
    o = load(spark, sf_dir, "orders")
    (
        o.withColumn("zval", _orders_zval(o))
        .repartitionByRange(8, "zval")
        .sortWithinPartitions("zval")
        .drop("zval")
        .write.mode("overwrite")
        .parquet(out)
    )
    return (
        spark.read.parquet(out)
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
        .orderBy("status")
    )


@query(
    "scan_snapshot_incremental",
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM orders WHERE o_orderdate >= TIMESTAMP '{_TT_CUTOFF}'
    """,
)
def scan_snapshot_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL read between two snapshots of a manifest-logged
    table (the file-level change-data-feed): the consumer diffs the two
    manifests' file lists and reads ONLY the files commit 2 added —
    zero re-read of commit 1's data, which is the whole point of
    incremental ETL over an append-mostly 100 TB table (the
    alternative, re-scan + anti-join against what you processed last
    time, costs a full pass per increment). Together with
    `scan_snapshot_timetravel` this completes the manifest contract:
    pin any version, and consume any delta, from KB-sized metadata.

    The append here is the post-{_TT_CUTOFF} orders, so the oracle pins
    the incremental read to exactly that slice; a consumer that
    accidentally re-read snapshot 1's files would double-count and fail
    the hash. tests/test_round7_ops.py additionally asserts the planned
    scan's file set is exactly the delta."""
    snap1_dir = _scratch(sf_dir, "inc_snap1")
    snap2_dir = _scratch(sf_dir, "inc_snap2")
    o = load(spark, sf_dir, "orders")
    cutoff = F.lit(_TT_CUTOFF).cast("timestamp")
    o.filter(F.col("o_orderdate") < cutoff).write.mode("overwrite").parquet(
        snap1_dir
    )
    o.filter(F.col("o_orderdate") >= cutoff).write.mode("overwrite").parquet(
        snap2_dir
    )

    def _data_files(d: str) -> list[str]:
        return sorted(
            os.path.join(d, f)
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    v1 = _data_files(snap1_dir)
    v2 = v1 + _data_files(snap2_dir)
    delta = sorted(set(v2) - set(v1))  # manifest diff, KB-scale metadata
    return spark.read.parquet(*delta).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents"),
    )


# --- optimistic-concurrency snapshot commits (r8: the ACID write side of
# the manifest-logged table — scan_snapshot_timetravel/_incremental are
# the read side, sink_manifest_atomic_publish the single-writer half) ---


def _log_versions(log_dir: str) -> list[int]:
    """Committed snapshot versions, ascending (KB-scale metadata listing)."""
    return sorted(
        int(f[1:-5])
        for f in os.listdir(log_dir)
        if f.startswith("v") and f.endswith(".json")
    )


def _read_manifest(log_dir: str, version: int) -> dict:
    import json

    with open(os.path.join(log_dir, f"v{version}.json")) as fh:
        return json.load(fh)


def _try_publish(
    log_dir: str,
    version: int,
    files: list[str],
    extra: dict | None = None,
) -> bool:
    """Attempt to commit snapshot ``version`` — the atomic COMPARE-AND-SWAP.

    The manifest is fully written to a writer-private temp file first,
    then ``os.link``ed to its final name: link(2) fails with EEXIST
    atomically when another writer already holds that version, and a
    winner's manifest appears complete in one shot (no torn reads — the
    reason this is link-after-write, not open(O_EXCL)-then-write, and
    why rename(2) is unusable here: it silently overwrites, so it can't
    arbitrate). Returns False when the version was lost to a racer; the
    caller re-reads the head and rebases. This is the single-node
    essence of Delta/Iceberg's commit protocol (their LogStores do the
    same put-if-absent against object storage)."""
    import json

    tmp = os.path.join(log_dir, f".tmp-v{version}-pid{os.getpid()}-{id(files)}")
    with open(tmp, "w") as fh:
        json.dump(
            {"snapshot": version, "files": sorted(files), **(extra or {})},
            fh,
        )
    try:
        os.link(tmp, os.path.join(log_dir, f"v{version}.json"))
        return True
    except FileExistsError:
        return False
    finally:
        os.unlink(tmp)


class CommitConflict(RuntimeError):
    """A remove-set no longer present in the head snapshot: the files
    this commit rewrites were already rewritten/removed by a racer.
    Blind retry would resurrect or double-apply them — the caller must
    re-plan from the new head (Delta/Iceberg surface the same condition
    as ConcurrentModification/ValidationException)."""


def _commit_snapshot(
    log_dir: str,
    add_files: list[str],
    remove_files: list[str] | None = None,
    max_attempts: int = 50,
    extra: dict | None = None,
) -> tuple[int, int]:
    """Optimistic-concurrency commit loop: read head, build the child
    file list (parent − removed + added), CAS-publish, rebase-and-retry
    on loss. Commits are REMOVE/ADD DELTAS, not absolute file lists —
    the reason rebase is safe: an append (no removes) commutes with
    anything, and a rewrite (compaction: removes the inputs it
    compacted, adds their replacement) rebased onto a racer's append
    keeps the appended files instead of silently dropping them (the
    lost-update a naive \"replace the whole list\" semantic has). The
    one genuine conflict — our removes are no longer all present in the
    head, i.e. a racer already rewrote the same files — raises
    ``CommitConflict`` instead of retrying. Returns
    (version, n_retries)."""
    removes = set(remove_files or [])
    retries = 0
    while True:
        versions = _log_versions(log_dir)
        head = versions[-1] if versions else 0
        parent = _read_manifest(log_dir, head)["files"] if head else []
        if removes and not removes <= set(parent):
            raise CommitConflict(
                f"removed files not in head v{head}: "
                f"{sorted(removes - set(parent))}"
            )
        files = [f for f in parent if f not in removes] + list(add_files)
        if _try_publish(log_dir, head + 1, files, extra=extra):
            return head + 1, retries
        retries += 1
        if retries >= max_attempts:
            raise RuntimeError(
                f"commit lost the CAS {max_attempts} times in {log_dir}"
            )


def _data_files_of(d: str) -> list[str]:
    return sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
    )


def _mor_read(spark: SparkSession, files: list, key: str) -> DataFrame:
    """MERGE-ON-READ of a manifest's file list: data files anti-joined
    against the union of its equality tombstones on ``key`` (broadcast
    — tombstones are KB). The one way every snapshot-log table with
    deletes is read in this repo (r13 review fix: five inline copies
    collapsed here, next to the `_MOR_DELETE_CLASS` convention that
    classifies the files)."""
    del_seg = f"{os.sep}{_MOR_DELETE_CLASS}{os.sep}"
    data = [f for f in files if del_seg not in f]
    tombs = [f for f in files if del_seg in f]
    df = spark.read.parquet(*data)
    if tombs:
        df = df.join(
            F.broadcast(spark.read.parquet(*tombs).select(key)),
            key,
            "left_anti",
        )
    return df


# Snapshot-expiry conventions are OWNED here (r13 review fix: the
# suffix literal had spread to four sites and the expiry procedure was
# re-derived inline in the vacuum×CDF key — one owner, like
# _TXN_CKPT_POINTER below).
_EXPIRED_SUFFIX = ".json.expired"
_SEQ_CKPT_PREFIX = "seq-v"


def _seq_first_versions(log_dir: str) -> tuple[int, dict]:
    """The NEWEST persisted sequence checkpoint: (horizon,
    {file -> first-referencing version}) for files that were live when
    snapshots <= horizon expired; (0, {}) when no expiry has happened.
    Readers that derive per-file sequence numbers by walking manifests
    MUST seed from this once the walk would cross expired territory —
    the Iceberg discipline that sequence numbers are durable metadata,
    never re-derived from history retention may delete."""
    import json

    horizons = sorted(
        int(f[len(_SEQ_CKPT_PREFIX):-5])
        for f in os.listdir(log_dir)
        if f.startswith(_SEQ_CKPT_PREFIX) and f.endswith(".json")
    )
    if not horizons:
        return 0, {}
    with open(
        os.path.join(log_dir, f"{_SEQ_CKPT_PREFIX}{horizons[-1]}.json")
    ) as fh:
        rec = json.load(fh)
    return int(rec["horizon"]), {
        f: int(v) for f, v in rec["first_versions"].items()
    }


def _expire_snapshots(
    log_dir: str, retain_last: int
) -> tuple[list[int], list[int], list[str]]:
    """Expire all but the last ``retain_last`` snapshots — the shared
    procedure `sink_snapshot_vacuum` proves and every caller reuses:

    1. PERSIST the sequence numbers the expired prefix owns — a
       ``seq-v{horizon}.json`` checkpoint mapping every still-live file
       to its first-referencing version — BEFORE the manifests
       disappear (without it, any later delete-bearing commit is
       unplannable: the CDF's sequence scoping walks manifests from
       genesis);
    2. delete files referenced ONLY by expired manifests (exact list,
       never a directory sweep);
    3. tombstone expired manifests to ``v{N}{_EXPIRED_SUFFIX}`` so
       time travel past retention fails fast.

    Returns (retained, expired, orphans). KB manifest arithmetic
    throughout — a 100 TB table expires without touching data bytes
    beyond the orphan unlinks."""
    import json

    versions = _log_versions(log_dir)
    retained = versions[-retain_last:]
    expired = versions[:-retain_last]
    if not expired:
        return retained, [], []
    live: set[str] = set()
    for v in retained:
        live |= set(_read_manifest(log_dir, v)["files"])
    orphans: set[str] = set()
    for v in expired:
        orphans |= set(_read_manifest(log_dir, v)["files"])
    orphans -= live
    seen: dict = {}
    for v in versions:
        for f in _read_manifest(log_dir, v)["files"]:
            seen.setdefault(f, v)
    horizon = expired[-1]
    tmp = os.path.join(log_dir, f".seq-tmp-{os.getpid()}")
    with open(tmp, "w") as fh:
        json.dump(
            {
                "horizon": horizon,
                "first_versions": {
                    f: v for f, v in sorted(seen.items()) if f in live
                },
            },
            fh,
        )
    os.replace(
        tmp, os.path.join(log_dir, f"{_SEQ_CKPT_PREFIX}{horizon}.json")
    )
    for f in sorted(orphans):
        os.unlink(f)
    for v in expired:
        os.rename(
            os.path.join(log_dir, f"v{v}.json"),
            os.path.join(log_dir, f"v{v}{_EXPIRED_SUFFIX}"),
        )
    return retained, expired, sorted(orphans)


_CC_CUTOFF = "1998-01-01"


@query(
    "sink_concurrent_commit",
    oracle=f"""
    SELECT CAST(3 AS INT) AS n_snapshots, CAST(1 AS INT) AS n_retries,
           TRUE AS linear_history,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM orders
    """,
)
def sink_concurrent_commit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONCURRENT-WRITER commit protocol on the manifest-logged table —
    the ACID half the r7 verdict named missing #1. Two writers race one
    table: after a base commit (pre-{_CC_CUTOFF} orders, v1), writer A
    and writer B each stage their data files (the even/odd halves of
    the remaining orders), BOTH read head = v1, B publishes v2 first,
    and A's compare-and-swap for v2 MUST fail (`_try_publish` → False,
    asserted) — A then rebases onto v2 and lands v3. The final log is
    LINEAR (v1, v2, v3 — asserted contiguous with one winner per
    version) and the v3 snapshot contains base + B + A exactly once:
    the oracle pins the read-back to the full orders table, so a lost
    update (A's stale file list overwriting B's) or a double-publish
    would break the count/cents hash. The race here is deterministically
    scripted so the LOSING path is exercised every run; the genuinely
    interleaved two-thread version is tests/test_round8_ops.py's
    contention test over the same `_commit_snapshot` machinery.

    Scale: the CAS arbitrates on a manifest NAME, never data — writers
    stage arbitrarily large file sets with zero coordination and the
    critical section is one KB-scale metadata put-if-absent, which is
    exactly how Delta/Iceberg make 1000-executor writers safe; retry
    cost is re-reading one manifest, independent of table size."""
    root = _scratch(sf_dir, "cc_table")
    log_dir = os.path.join(root, "log")
    os.makedirs(log_dir, exist_ok=True)
    for v in os.listdir(log_dir):  # idempotent re-run within one process
        os.unlink(os.path.join(log_dir, v))

    o = load(spark, sf_dir, "orders")
    cutoff = F.lit(_CC_CUTOFF).cast("timestamp")
    base_dir = os.path.join(root, "base")
    a_dir = os.path.join(root, "writer_a")
    b_dir = os.path.join(root, "writer_b")
    o.filter(F.col("o_orderdate") < cutoff).write.mode("overwrite").parquet(
        base_dir
    )
    rest = o.filter(F.col("o_orderdate") >= cutoff)
    rest.filter(F.col("o_orderkey") % 2 == 0).write.mode(
        "overwrite"
    ).parquet(a_dir)
    rest.filter(F.col("o_orderkey") % 2 == 1).write.mode(
        "overwrite"
    ).parquet(b_dir)

    v1, r1 = _commit_snapshot(log_dir, _data_files_of(base_dir))
    if (v1, r1) != (1, 0):
        raise RuntimeError(f"base commit not v1/clean: {(v1, r1)}")

    # both writers read the same head ...
    head_a = _log_versions(log_dir)[-1]
    parent_a = _read_manifest(log_dir, head_a)["files"]
    # ... B publishes first and wins v2 ...
    v2, r2 = _commit_snapshot(log_dir, _data_files_of(b_dir))
    if (v2, r2) != (2, 0):
        raise RuntimeError(f"writer B did not win v2 cleanly: {(v2, r2)}")
    # ... A's stale CAS must LOSE, then rebase onto v2 and land v3
    if _try_publish(log_dir, head_a + 1, parent_a + _data_files_of(a_dir)):
        raise RuntimeError("stale CAS won against a committed version")
    n_retries = 1
    v3, r3 = _commit_snapshot(log_dir, _data_files_of(a_dir))
    if (v3, r3) != (3, 0):
        raise RuntimeError(f"writer A's rebase did not land v3: {(v3, r3)}")

    versions = _log_versions(log_dir)
    linear = versions == [1, 2, 3]
    final = _read_manifest(log_dir, versions[-1])["files"]
    if len(final) != len(set(final)):
        raise RuntimeError("snapshot file list carries duplicates")
    return spark.read.parquet(*final).agg(
        F.lit(len(versions)).cast("int").alias("n_snapshots"),
        F.lit(n_retries).cast("int").alias("n_retries"),
        F.lit(bool(linear)).alias("linear_history"),
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents"),
    )


@query(
    "sink_snapshot_vacuum",
    oracle=f"""
    SELECT CAST(2 AS INT) AS snapshot,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents,
           TRUE AS vacuum_ok
    FROM orders WHERE o_orderdate < TIMESTAMP '{_CC_CUTOFF}'
    UNION ALL
    SELECT CAST(3 AS INT) AS snapshot,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents,
           TRUE AS vacuum_ok
    FROM orders
    ORDER BY snapshot
    """,
)
def sink_snapshot_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot EXPIRATION + VACUUM with retention safety — the storage-
    reclaim half of the lakehouse contract (files are never mutated, so
    deletes happen only here). History: v1 writes the pre-{_CC_CUTOFF}
    orders; v2 COMPACTS them (replace-commit: same rows, new single
    file — v1's files become exclusively-referenced history); v3
    appends the rest. Retention keeps the latest 2 snapshots, so v1
    expires; vacuum deletes exactly the files referenced ONLY by
    expired snapshots (asserted: the orphan set == v1's file set, every
    orphan gone from disk afterwards, and — retention safety — every
    file of v2/v3 still present). The returned frame re-aggregates BOTH
    retained snapshots from their manifests AFTER the vacuum, so the
    oracle's hash proves time travel inside the retention window
    survived the delete (v2 must still equal the pre-cutoff slice even
    though the bytes it shares nothing with v1's deleted files; v3 must
    still be the full table).

    Scale: expiration is pure manifest arithmetic (set difference of
    file lists, KB-scale at thousands of commits); the delete list is
    exact, never a directory sweep — the reason real formats can vacuum
    a 100 TB table without listing object storage and without a stop-
    the-world lock (readers inside retention pin manifests, not dirs)."""
    root = _scratch(sf_dir, "vacuum_table")
    log_dir = os.path.join(root, "log")
    os.makedirs(log_dir, exist_ok=True)
    for v in os.listdir(log_dir):
        os.unlink(os.path.join(log_dir, v))

    o = load(spark, sf_dir, "orders")
    cutoff = F.lit(_CC_CUTOFF).cast("timestamp")
    base = o.filter(F.col("o_orderdate") < cutoff)
    base_dir = os.path.join(root, "base")
    compact_dir = os.path.join(root, "compact")
    rest_dir = os.path.join(root, "rest")
    base.write.mode("overwrite").parquet(base_dir)
    base_files = _data_files_of(base_dir)  # pinned BEFORE vacuum unlinks
    _commit_snapshot(log_dir, base_files)  # v1
    spark.read.parquet(*base_files).coalesce(1).write.mode(
        "overwrite"
    ).parquet(compact_dir)
    _commit_snapshot(  # v2: compaction = remove the inputs, add the rewrite
        log_dir,
        _data_files_of(compact_dir),
        remove_files=base_files,
    )
    o.filter(F.col("o_orderdate") >= cutoff).write.mode("overwrite").parquet(
        rest_dir
    )
    _commit_snapshot(log_dir, _data_files_of(rest_dir))  # v3

    retained, expired, orphans = _expire_snapshots(log_dir, retain_last=2)
    if set(orphans) != set(base_files):
        raise RuntimeError(f"orphan set wrong: {sorted(orphans)}")
    live: set[str] = set()
    for v in retained:
        live |= set(_read_manifest(log_dir, v)["files"])
    vacuum_ok = (
        not any(os.path.exists(f) for f in orphans)
        and all(os.path.exists(f) for f in live)
        and _log_versions(log_dir) == retained
    )

    per_snap = []
    for v in retained:
        files = _read_manifest(log_dir, v)["files"]
        per_snap.append(
            spark.read.parquet(*files).agg(
                F.lit(v).cast("int").alias("snapshot"),
                F.count("*").cast("long").alias("n_rows"),
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                .cast("long")
                .alias("cents"),
                F.lit(bool(vacuum_ok)).alias("vacuum_ok"),
            )
        )
    out = per_snap[0]
    for df in per_snap[1:]:
        out = out.unionByName(df)
    return out.orderBy("snapshot")


@query(
    "scan_manifest_stats_prune",
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents,
           TRUE AS pruned
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    """,
)
def scan_manifest_stats_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILE-LEVEL min/max pruning FROM THE MANIFEST — the metadata-
    planning half of the lakehouse read path (Iceberg manifests carry
    per-file column bounds; a 100 TB scan of one year touches metadata
    for every file but OPENS only the files whose range intersects the
    predicate — no footer reads, no directory listing, no full scan).
    The commit records each data file's (min, max) o_orderdate —
    computed DISTRIBUTEDLY in the same pass pattern a writer already
    owns (`input_file_name()` groupBy, the `scan_file_provenance`
    shape) — into the manifest; the reader evaluates the 1996-only
    predicate against the bounds, asserts the planned file set is a
    STRICT subset (pruning actually bit; the table is year-partitioned
    on write so ranges are disjoint by construction), and scans only
    those files. The exact filter still applies after the scan (bounds
    prune files, they don't prove row membership — same contract as
    parquet row-group stats). Oracle = the plain filtered aggregate, so
    over-pruning (lost rows) or under-filtering (neighbor-year rows)
    both break the hash."""
    root = _scratch(sf_dir, "stats_prune_table")
    data_dir = os.path.join(root, "data")
    o = load(spark, sf_dir, "orders")
    (
        o.withColumn("o_year", F.year("o_orderdate"))
        .repartition("o_year")  # disjoint per-file year ranges
        .write.mode("overwrite")
        .partitionBy("o_year")
        .parquet(data_dir)
    )
    files = spark.read.parquet(data_dir)
    stats = (
        files.groupBy(F.input_file_name().alias("file"))
        .agg(
            F.min("o_orderdate").cast("string").alias("lo"),
            F.max("o_orderdate").cast("string").alias("hi"),
        )
        .collect()  # one row per data file — KB-scale manifest metadata
    )
    lo, hi = "1996-01-01", "1997-01-01"
    keep = [
        r["file"]
        for r in stats
        if r["lo"] < hi and r["hi"] >= lo  # range intersects [lo, hi)
    ]
    if not keep or len(keep) >= len(stats):
        raise RuntimeError(
            f"manifest pruning did not bite: kept {len(keep)}/{len(stats)}"
        )
    cutlo = F.lit(lo).cast("timestamp")
    cuthi = F.lit(hi).cast("timestamp")
    pruned = spark.read.parquet(*keep).filter(
        (F.col("o_orderdate") >= cutlo) & (F.col("o_orderdate") < cuthi)
    )
    return pruned.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents"),
        F.lit(True).alias("pruned"),
    )


@query(
    "scan_snapshot_as_of_watermark",
    oracle=f"""
    SELECT '1998-06-01' AS as_of, CAST(1 AS INT) AS snapshot,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM orders WHERE o_orderdate < TIMESTAMP '{_CC_CUTOFF}'
    UNION ALL
    SELECT '2002-01-01' AS as_of, CAST(2 AS INT) AS snapshot,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM orders
    ORDER BY as_of
    """,
)
def scan_snapshot_as_of_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF resolution by DATA WATERMARK — the timestamp-travel
    complement of `scan_snapshot_timetravel`'s version pinning, with the
    timestamp semantics an incremental pipeline actually wants: each
    commit stamps its manifest with the watermark \"data complete
    through T\" (here the commit's max o_orderdate — wall-clock commit
    times are nondeterministic AND the wrong contract: a consumer asks
    for the table as of a point in EVENT time, not of when some backfill
    happened to land). The reader resolves AS OF T to the latest
    snapshot whose watermark ≤ T from manifest metadata alone, then
    scans that snapshot's files: AS OF 1998-06-01 must resolve to
    commit 1 (pre-{_CC_CUTOFF} orders) even though commit 2 already
    exists, and AS OF 2002-01-01 to commit 2 (the full table) — both
    aggregates hash-pinned by the oracle.

    Scale: resolution is a scan of KB-sized manifests (one watermark
    string per commit, thousands of commits = still KB); the chosen
    snapshot reads exactly like any pinned version — pruning/pushdown
    unaffected; the watermark itself is a 1-row aggregate the commit
    already computes for its own bookkeeping."""
    import json

    root = _scratch(sf_dir, "asof_table")
    log_dir = os.path.join(root, "log")
    os.makedirs(log_dir, exist_ok=True)
    for v in os.listdir(log_dir):
        os.unlink(os.path.join(log_dir, v))

    o = load(spark, sf_dir, "orders")
    cutoff = F.lit(_CC_CUTOFF).cast("timestamp")
    slices = [
        ("c1", o.filter(F.col("o_orderdate") < cutoff)),
        ("c2", o.filter(F.col("o_orderdate") >= cutoff)),
    ]
    for name, df in slices:
        d = os.path.join(root, name)
        df.write.mode("overwrite").parquet(d)
        wm = (
            spark.read.parquet(*_data_files_of(d))
            .agg(F.max(F.to_date("o_orderdate")).cast("string"))
            .collect()[0][0]
        )
        # the watermark rides IN the commit record (manifests are
        # immutable once published — no post-publish patching)
        _commit_snapshot(
            log_dir, _data_files_of(d), extra={"watermark": wm}
        )

    def resolve(as_of: str) -> dict:
        best = None
        for v in _log_versions(log_dir):
            m = _read_manifest(log_dir, v)
            if m["watermark"] <= as_of:
                best = m
        if best is None:
            raise RuntimeError(f"no snapshot with watermark <= {as_of}")
        return best

    probes = ["1998-06-01", "2002-01-01"]
    per = []
    for p in probes:
        m = resolve(p)
        per.append(
            spark.read.parquet(*m["files"]).agg(
                F.lit(p).alias("as_of"),
                F.lit(int(m["snapshot"])).cast("int").alias("snapshot"),
                F.count("*").cast("long").alias("n_rows"),
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                .cast("long")
                .alias("cents"),
            )
        )
    out = per[0]
    for df in per[1:]:
        out = out.unionByName(df)
    return out.orderBy("as_of")


_COMPACT_FILE_THRESHOLD = 8
_COMPACT_TARGET_FILES = 2


@query(
    "sink_auto_compaction",
    oracle=f"""
    SELECT CAST(16 AS INT) AS files_before, CAST(2 AS INT) AS files_after,
           CAST(5 AS INT) AS n_snapshots,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM orders
    """,
)
def sink_auto_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLICY-DRIVEN AUTO-COMPACTION over the OCC snapshot log — the
    small-file problem closed operationally (Delta OPTIMIZE / Iceberg
    rewrite_data_files, reduced to its commit-protocol essence): four
    append commits land orders quarters as 4 files each (16 small files
    — the natural debris of incremental ingestion); the post-commit
    policy check fires when the head exceeds {_COMPACT_FILE_THRESHOLD}
    files and lands a fifth commit that REMOVES all sixteen and ADDS a
    {_COMPACT_TARGET_FILES}-file rewrite — the remove/add delta form, so
    a concurrent append during the rewrite would survive the rebase and
    a concurrent rewrite would abort with `CommitConflict` (both proven
    on this machinery in tests/test_round8_ops.py). In-key asserts:
    file count crossed the threshold before, is {_COMPACT_TARGET_FILES}
    after, the log is 5 linear commits, and every pre-compaction file is
    still on disk (compaction never deletes data — that is VACUUM's job,
    after retention expiry: `sink_snapshot_vacuum`). The oracle pins the
    full-table digest read from the compacted head — a rewrite that
    lost or doubled a quarter breaks the hash.

    Scale: the policy check is a len() on the head manifest's file list
    (KB metadata); the rewrite cost is one read+write of the table
    region being compacted — at 100 TB you compact per partition, and
    the commit protocol is unchanged because remove/add deltas are
    partition-local."""
    root = _scratch(sf_dir, "autocompact_table")
    log_dir = os.path.join(root, "log")
    os.makedirs(log_dir, exist_ok=True)
    for v in os.listdir(log_dir):
        os.unlink(os.path.join(log_dir, v))

    o = load(spark, sf_dir, "orders")
    q = F.abs(F.xxhash64("o_orderkey")) % 4
    for i in range(4):  # four ingestion commits, 4 files each
        d = os.path.join(root, f"ingest{i}")
        (
            o.filter(q == i)
            .repartition(4)
            .write.mode("overwrite")
            .parquet(d)
        )
        _commit_snapshot(log_dir, _data_files_of(d))

    head = _log_versions(log_dir)[-1]
    before = _read_manifest(log_dir, head)["files"]
    if len(before) <= _COMPACT_FILE_THRESHOLD:
        raise RuntimeError(
            f"ingestion debris missing: only {len(before)} files"
        )
    # the policy fires: rewrite the whole table as a remove/add delta
    cdir = os.path.join(root, "compacted")
    (
        spark.read.parquet(*before)
        .repartition(_COMPACT_TARGET_FILES)
        .write.mode("overwrite")
        .parquet(cdir)
    )
    after_files = _data_files_of(cdir)
    _commit_snapshot(log_dir, after_files, remove_files=before)

    versions = _log_versions(log_dir)
    head_files = _read_manifest(log_dir, versions[-1])["files"]
    if versions != [1, 2, 3, 4, 5]:
        raise RuntimeError(f"log not linear: {versions}")
    if sorted(head_files) != sorted(after_files):
        raise RuntimeError("head is not exactly the compacted rewrite")
    if not all(os.path.exists(f) for f in before):
        raise RuntimeError(
            "compaction deleted data files — that is vacuum's job"
        )
    return spark.read.parquet(*head_files).agg(
        F.lit(len(before)).cast("int").alias("files_before"),
        F.lit(len(head_files)).cast("int").alias("files_after"),
        F.lit(len(versions)).cast("int").alias("n_snapshots"),
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents"),
    )


@query(
    "sink_merge_delete",
    oracle=f"""
    SELECT CAST(1 AS INT) AS files_rewritten,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM orders
    WHERE NOT (o_orderdate >= TIMESTAMP '1997-01-01'
               AND o_orderdate < TIMESTAMP '1998-01-01'
               AND o_orderkey % 2 = 0)
    """,
)
def sink_merge_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COPY-ON-WRITE row-level DELETE on the snapshot table — the GDPR /
    right-to-be-forgotten path, and the operation that separates a table
    FORMAT from a pile of parquet (parquet files are immutable; deleting
    rows means rewriting exactly the files that contain them and
    swapping the file list atomically). The table is laid out one file
    per order-year; DELETE WHERE (year = 1997 AND even orderkey) prunes
    to the single 1997 file from the path metadata alone (partition
    pruning — the other years' files are provably untouchable), rewrites
    that one file without the matching rows, and commits
    (remove=[1997 file], add=[rewrite]) as a remove/add delta — so a
    concurrent append would survive the rebase and a concurrent rewrite
    of the same file aborts (`CommitConflict`). In-key asserts: exactly
    one file rewritten, every other file still referenced by the head
    UNMODIFIED (same paths — old readers inside retention still see
    deleted rows via time travel until vacuum), and the head aggregate
    equals the oracle's NOT-predicate digest — resurrected or
    over-deleted rows break the hash.

    Scale: rewrite cost is proportional to the files the predicate
    touches, never the table (the reason real formats pair COW deletes
    with clustering — see `sink_zorder_write`); the commit is the same
    KB CAS as every other writer."""
    root = _scratch(sf_dir, "cow_delete_table")
    log_dir = os.path.join(root, "log")
    data_dir = os.path.join(root, "data")
    os.makedirs(log_dir, exist_ok=True)
    for v in os.listdir(log_dir):
        os.unlink(os.path.join(log_dir, v))

    o = load(spark, sf_dir, "orders")
    (
        o.withColumn("o_year", F.year("o_orderdate"))
        .repartition("o_year")
        .write.mode("overwrite")
        .partitionBy("o_year")
        .parquet(data_dir)
    )
    all_files = sorted(
        os.path.join(dp, f)
        for dp, _, fs in os.walk(data_dir)
        for f in fs
        if f.endswith(".parquet")
    )
    _commit_snapshot(log_dir, all_files)  # v1

    affected = [f for f in all_files if f"{os.sep}o_year=1997{os.sep}" in f]
    if len(affected) != 1:
        raise RuntimeError(f"expected one 1997 file, got {affected}")
    rewrite_dir = os.path.join(root, "rewrite_1997")
    (
        spark.read.parquet(*affected)
        .filter(~(F.col("o_orderkey") % 2 == 0))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(rewrite_dir)
    )
    _commit_snapshot(
        log_dir, _data_files_of(rewrite_dir), remove_files=affected
    )  # v2: the COW delete

    head = _read_manifest(log_dir, _log_versions(log_dir)[-1])["files"]
    untouched = set(all_files) - set(affected)
    if not untouched <= set(head):
        raise RuntimeError("COW delete disturbed non-matching files")
    if set(affected) & set(head):
        raise RuntimeError("deleted file still referenced by head")
    if not all(os.path.exists(f) for f in affected):
        raise RuntimeError("COW delete removed bytes — that is vacuum's job")
    return spark.read.parquet(*head).agg(
        F.lit(1).cast("int").alias("files_rewritten"),
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents"),
    )


@query(
    "sink_schema_evolution_commit",
    oracle=f"""
    WITH t AS (
      SELECT o_totalprice,
             CASE WHEN o_orderdate < TIMESTAMP '{_CC_CUTOFF}' THEN NULL
                  ELSE CASE o_orderkey % 3 WHEN 0 THEN 'web'
                                           WHEN 1 THEN 'store'
                                           ELSE 'b2b' END
             END AS channel
      FROM orders)
    SELECT coalesce(channel, 'LEGACY') AS channel,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM t GROUP BY 1 ORDER BY channel
    """,
)
def sink_schema_evolution_commit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCHEMA EVOLUTION through the commit log — the add-column path
    every long-lived table walks: commit 1 lands the pre-{_CC_CUTOFF}
    orders under the original schema; commit 2 appends the rest WITH a
    new `channel` column and bumps the manifest's schema version. Old
    files are NEVER rewritten (asserted: v1's files are referenced
    byte-identically by the head) — the new column simply reads as NULL
    on them, which is exactly the mergeSchema read the manifest's
    explicit file list plans. The per-channel rollup surfaces legacy
    rows under the NULL channel ('LEGACY' label), so the oracle
    hash-pins both halves of the contract: new rows carry their channel,
    old rows carry NULL, nobody is double-read or dropped.

    Scale: evolution is a metadata operation (schema version in a KB
    manifest) — a 100 TB table adds a column in O(1); the alternative
    (rewrite history) is exactly what formats exist to avoid. The read
    merges footers of two writer generations the same way
    `scan_schema_merge` proves on raw dirs, but here the FILE LIST and
    the schema version come from the manifest, not a directory walk."""
    root = _scratch(sf_dir, "schema_evo_table")
    log_dir = os.path.join(root, "log")
    os.makedirs(log_dir, exist_ok=True)
    for v in os.listdir(log_dir):
        os.unlink(os.path.join(log_dir, v))

    o = load(spark, sf_dir, "orders")
    cutoff = F.lit(_CC_CUTOFF).cast("timestamp")
    v1_dir = os.path.join(root, "gen1")
    v2_dir = os.path.join(root, "gen2")
    o.filter(F.col("o_orderdate") < cutoff).select(
        "o_orderkey", "o_totalprice"
    ).write.mode("overwrite").parquet(v1_dir)
    _commit_snapshot(
        log_dir, _data_files_of(v1_dir), extra={"schema_version": 1}
    )
    (
        o.filter(F.col("o_orderdate") >= cutoff)
        .select(
            "o_orderkey",
            "o_totalprice",
            F.element_at(
                F.array(F.lit("web"), F.lit("store"), F.lit("b2b")),
                (F.col("o_orderkey") % 3 + 1).cast("int"),
            ).alias("channel"),
        )
        .write.mode("overwrite")
        .parquet(v2_dir)
    )
    _commit_snapshot(
        log_dir, _data_files_of(v2_dir), extra={"schema_version": 2}
    )

    versions = _log_versions(log_dir)
    head = _read_manifest(log_dir, versions[-1])
    if head.get("schema_version") != 2:
        raise RuntimeError("head manifest lost the schema bump")
    if not set(_data_files_of(v1_dir)) <= set(head["files"]):
        raise RuntimeError("evolution rewrote history — old files replaced")
    merged = spark.read.option("mergeSchema", "true").parquet(*head["files"])
    return (
        merged.groupBy(
            F.coalesce(F.col("channel"), F.lit("LEGACY")).alias("channel")
        )
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
        .orderBy("channel")
    )


@query(
    "sink_acid_upsert",
    oracle=f"""
    WITH upd AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01'
                            AND o_orderdate < TIMESTAMP '1997-01-01'
                            AND o_orderkey % 5 = 0
                           THEN CAST(round(o_totalprice * 100) AS BIGINT)
                                + 500
                           ELSE CAST(round(o_totalprice * 100) AS BIGINT)
                      END) AS BIGINT) AS cents
      FROM orders),
    ins AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT) + 123)
                  AS BIGINT) AS cents
      FROM orders WHERE o_orderkey % 1000 = 7)
    SELECT CAST(1 AS INT) AS files_rewritten,
           CAST(2 AS INT) AS files_added,
           CAST(upd.n + ins.n AS BIGINT) AS n_rows,
           CAST(upd.cents + ins.cents AS BIGINT) AS cents
    FROM upd CROSS JOIN ins
    """,
)
def sink_acid_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO (upsert) through the commit log — the U that completes
    CRUD on the snapshot table (append = C, time travel = R, COW delete
    = D): a change batch carries UPDATES (a 500-cent surcharge on every
    fifth 1996 order) and INSERTS (re-keyed synthetic orders). The merge
    plans like a real format's: file-level pruning intersects the update
    keys with the year layout (only the 1996 file is touched — path
    metadata, asserted), that ONE file is rewritten with the updates
    applied via a key join, inserts land as a fresh file, and the whole
    batch commits atomically as (remove=[1996 file], add=[rewrite,
    inserts]) — readers see the old table or the fully-merged one, never
    a half-merge, and a concurrent append elsewhere would survive the
    rebase while a concurrent rewrite of the SAME file aborts
    (`CommitConflict`). The oracle recomputes updates + inserts from the
    source table, so a lost update, a double-applied surcharge, or a
    dropped insert breaks the count/cents hash.

    Scale: rewrite cost ∝ files the update keys touch (the clustering
    pay-off — see `sink_zorder_write`); inserts are pure appends; the
    atomic swap is the same KB manifest CAS as every writer; this is
    Delta MERGE / Iceberg copy-on-write MERGE reduced to its protocol
    essence."""
    root = _scratch(sf_dir, "acid_upsert_table")
    log_dir = os.path.join(root, "log")
    data_dir = os.path.join(root, "data")
    os.makedirs(log_dir, exist_ok=True)
    for v in os.listdir(log_dir):
        os.unlink(os.path.join(log_dir, v))

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    (
        o.withColumn("o_year", F.year("o_orderdate"))
        .repartition("o_year")
        .write.mode("overwrite")
        .partitionBy("o_year")
        .parquet(data_dir)
    )
    all_files = sorted(
        os.path.join(dp, f)
        for dp, _, fs in os.walk(data_dir)
        for f in fs
        if f.endswith(".parquet")
    )
    _commit_snapshot(log_dir, all_files)  # v1

    # MERGE batch: updates target only 1996 keys → file-level pruning
    affected = [f for f in all_files if f"{os.sep}o_year=1996{os.sep}" in f]
    if len(affected) != 1:
        raise RuntimeError(f"expected one 1996 file, got {affected}")
    rewrite_dir = os.path.join(root, "rewrite")
    (
        spark.read.parquet(*affected)
        .withColumn(
            "cents",
            F.when(
                F.col("o_orderkey") % 5 == 0, F.col("cents") + 500
            ).otherwise(F.col("cents")),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(rewrite_dir)
    )
    insert_dir = os.path.join(root, "inserts")
    (
        o.filter(F.col("o_orderkey") % 1000 == 7)
        .select(
            (F.col("o_orderkey") + F.lit(1_000_000_000)).alias("o_orderkey"),
            F.lit("2002-01-01").cast("timestamp").alias("o_orderdate"),
            (F.col("cents") + 123).alias("cents"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(insert_dir)
    )
    adds = _data_files_of(rewrite_dir) + _data_files_of(insert_dir)
    _commit_snapshot(log_dir, adds, remove_files=affected)  # v2: the MERGE

    head = _read_manifest(log_dir, _log_versions(log_dir)[-1])["files"]
    if set(affected) & set(head):
        raise RuntimeError("merged-away file still referenced")
    if not (set(all_files) - set(affected)) <= set(head):
        raise RuntimeError("merge disturbed untouched files")
    return spark.read.parquet(*head).agg(
        F.lit(len(affected)).cast("int").alias("files_rewritten"),
        F.lit(len(adds)).cast("int").alias("files_added"),
        F.count("*").cast("long").alias("n_rows"),
        F.sum("cents").cast("long").alias("cents"),
    )


@query(
    "scan_branch_tag_refs",
    oracle=f"""
    SELECT 'branch:audit' AS ref, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM orders
    WHERE o_orderdate < TIMESTAMP '{_CC_CUTOFF}' OR o_orderkey % 2 = 1
    UNION ALL
    SELECT 'branch:main' AS ref, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM orders
    WHERE o_orderdate < TIMESTAMP '{_CC_CUTOFF}' OR o_orderkey % 2 = 0
    UNION ALL
    SELECT 'tag:baseline' AS ref, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM orders WHERE o_orderdate < TIMESTAMP '{_CC_CUTOFF}'
    ORDER BY ref
    """,
)
def scan_branch_tag_refs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NAMED REFS on the snapshot log — tags and branches (the
    Iceberg-refs / Git-for-data model) closing the catalog layer over
    the r8 commit protocol: snapshots stay immutable CAS-committed
    manifests; REFS are the one mutable layer, a name → version pointer
    updated atomically (write-temp + `os.replace` — rename IS the right
    primitive here because a ref update intentionally supersedes, unlike
    a version publish where rename's silent overwrite is the bug).
    History: v1 = pre-{_CC_CUTOFF} orders, tagged `baseline` (a tag is a
    frozen pointer); `main` advances to v2 (+ even remaining orders)
    while `audit`, branched at v1, advances to v3 (+ odd remaining
    orders) — two lines of development over SHARED immutable v1 files,
    no copy (asserted: both heads reference v1's file list; their deltas
    are disjoint). Reads resolve name → version → manifest → files; the
    oracle pins all three resolutions (tag, both branch heads), so a ref
    pointing at the wrong snapshot or a branch leaking the other
    branch's files breaks the hash.

    Scale: a ref is one integer in one file — branching a 100 TB table
    is O(1) and shares every byte until the branches diverge; ref
    resolution adds one KB read to query planning. The divergent-
    branches shape is exactly how a real pipeline stages a risky
    backfill (`audit`) against production (`main`) on one storage
    footprint."""
    root = _scratch(sf_dir, "refs_table")
    log_dir = os.path.join(root, "log")
    refs_dir = os.path.join(root, "refs")
    os.makedirs(log_dir, exist_ok=True)
    os.makedirs(refs_dir, exist_ok=True)
    for d in (log_dir, refs_dir):
        for v in os.listdir(d):
            os.unlink(os.path.join(d, v))

    def set_ref(name: str, version: int) -> None:
        tmp = os.path.join(refs_dir, f".tmp-{name}")
        with open(tmp, "w") as fh:
            fh.write(str(version))
        os.replace(tmp, os.path.join(refs_dir, name))

    def get_ref(name: str) -> int:
        with open(os.path.join(refs_dir, name)) as fh:
            return int(fh.read())

    o = load(spark, sf_dir, "orders")
    cutoff = F.lit(_CC_CUTOFF).cast("timestamp")
    base_dir = os.path.join(root, "base")
    even_dir = os.path.join(root, "even")
    odd_dir = os.path.join(root, "odd")
    o.filter(F.col("o_orderdate") < cutoff).write.mode("overwrite").parquet(
        base_dir
    )
    rest = o.filter(F.col("o_orderdate") >= cutoff)
    rest.filter(F.col("o_orderkey") % 2 == 0).write.mode(
        "overwrite"
    ).parquet(even_dir)
    rest.filter(F.col("o_orderkey") % 2 == 1).write.mode(
        "overwrite"
    ).parquet(odd_dir)

    v1, _ = _commit_snapshot(log_dir, _data_files_of(base_dir))
    set_ref("tag_baseline", v1)  # frozen pointer
    set_ref("branch_main", v1)
    set_ref("branch_audit", v1)  # branch = cheap pointer copy, zero data

    # main advances: child of main's head (v1) + even files
    base_files = _read_manifest(log_dir, get_ref("branch_main"))["files"]
    v2, _ = _commit_snapshot(log_dir, _data_files_of(even_dir))
    set_ref("branch_main", v2)
    # audit advances INDEPENDENTLY from ITS head (v1) + odd files; the
    # log is shared and linear, the branch structure lives in the refs —
    # v3's parent-by-ref is v1, so build its file list from v1, not head
    if not _try_publish(
        log_dir,
        v2 + 1,
        base_files + _data_files_of(odd_dir),
    ):
        raise RuntimeError("branch commit lost an uncontended CAS")
    set_ref("branch_audit", v2 + 1)

    main_files = set(_read_manifest(log_dir, get_ref("branch_main"))["files"])
    audit_files = set(
        _read_manifest(log_dir, get_ref("branch_audit"))["files"]
    )
    shared = set(base_files)
    if not (shared <= main_files and shared <= audit_files):
        raise RuntimeError("branches do not share the v1 files")
    if (main_files - shared) & (audit_files - shared):
        raise RuntimeError("branch deltas are not disjoint")
    if get_ref("tag_baseline") != v1:
        raise RuntimeError("tag moved — tags are frozen")

    per = []
    for ref, name in [
        ("branch:audit", "branch_audit"),
        ("branch:main", "branch_main"),
        ("tag:baseline", "tag_baseline"),
    ]:
        files = _read_manifest(log_dir, get_ref(name))["files"]
        per.append(
            spark.read.parquet(*files).agg(
                F.lit(ref).alias("ref"),
                F.count("*").cast("long").alias("n_rows"),
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                .cast("long")
                .alias("cents"),
            )
        )
    out = per[0]
    for df in per[1:]:
        out = out.unionByName(df)
    return out.orderBy("ref")


@query(
    "scan_distcp_verify",
    oracle=f"""
    SELECT CAST(4 AS INT) AS n_files, TRUE AS digests_match,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM orders
    """,
)
def scan_distcp_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTRIBUTED COPY with checksum verification — `hadoop distcp`,
    the fleet-migration workhorse, in its Spark-native form: the source
    table's files are listed by the binaryFile source and each EXECUTOR
    copies its files byte-for-byte (one `mapInPandas` pass emitting
    (file, md5-of-source, md5-of-written-copy) — the copy happens where
    the task runs, the driver never sees a payload byte), then the audit
    joins nothing and trusts nothing: per-file source and destination
    digests are recomputed and compared (asserted all equal, count
    asserted == source file count), and the RELOADED copy's aggregate
    must equal the source-table oracle — a torn copy, a dropped file, or
    a silent truncation breaks either the digest gate or the hash.

    Scale: this is embarrassingly parallel file work — throughput =
    executors × disk bandwidth, exactly distcp's model; checksums ride
    in the same pass as the copy (no second read of the source); the
    driver handles only (path, digest) rows. The task ships ONLY the
    path (binaryFile content column pruned out of the scan) and streams
    the copy in 8 MiB chunks inside the task — no whole-file blob ever
    crosses Arrow or sits in task memory, so binaryFile's 2 GB per-file
    cap and per-task heap are both out of the picture (r9 ADVICE fix;
    previously the content column materialized each file in memory).
    The 4-file layout is written first so the copy is provably
    multi-file at every SF."""
    import hashlib

    import pandas as pd

    root = _scratch(sf_dir, "distcp")
    src_dir = os.path.join(root, "src")
    dst_dir = os.path.join(root, "dst")
    os.makedirs(dst_dir, exist_ok=True)
    load(spark, sf_dir, "orders").repartition(4).write.mode(
        "overwrite"
    ).parquet(src_dir)
    src_files = _data_files_of(src_dir)

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(src_dir)
        .select("path")  # content pruned — the copy streams from disk
        .repartition(len(src_files))
    )

    def copy_verify(batches):
        chunk = 8 << 20
        for pdf in batches:
            rows = []
            for uri in pdf["path"]:
                src = uri[len("file:"):] if uri.startswith("file:") else uri
                dst = os.path.join(dst_dir, os.path.basename(src))
                tmp = dst + f".tmp{os.getpid()}"
                src_h = hashlib.md5()
                with open(src, "rb") as rfh, open(tmp, "wb") as wfh:
                    while True:
                        block = rfh.read(chunk)
                        if not block:
                            break
                        src_h.update(block)
                        wfh.write(block)
                os.replace(tmp, dst)
                dst_h = hashlib.md5()
                with open(dst, "rb") as fh:
                    while True:
                        block = fh.read(chunk)
                        if not block:
                            break
                        dst_h.update(block)
                rows.append(
                    (
                        os.path.basename(src),
                        src_h.hexdigest(),
                        dst_h.hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["file", "src_md5", "dst_md5"]
            )

    report = files.mapInPandas(
        copy_verify, "file string, src_md5 string, dst_md5 string"
    ).collect()  # one (path, digest, digest) row per file — KB metadata
    if len(report) != len(src_files):
        raise RuntimeError(
            f"copied {len(report)} files, source has {len(src_files)}"
        )
    match = all(r["src_md5"] == r["dst_md5"] for r in report)
    if not match:
        raise RuntimeError("distcp checksum mismatch")
    return spark.read.parquet(dst_dir).agg(
        F.lit(len(report)).cast("int").alias("n_files"),
        F.lit(bool(match)).alias("digests_match"),
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents"),
    )


# --- merge-on-read deletes (r9: deletion vectors — the MOR half of the
# row-level-change matrix; sink_merge_delete/sink_acid_upsert are the
# copy-on-write half) ---

_MOR_DELETE_CLASS = "deletes"  # path segment classifying tombstone files
_POS_DELETE_CLASS = "pos"  # sub-segment for POSITIONAL delete vectors
# (deletes/pos/...); shared with the streaming CDF reader's classifier


def _split_head_files(files: list[str]) -> tuple[list[str], list[str]]:
    """Partition a snapshot's file list into (data, delete) classes by
    the tombstone path convention — the single-node essence of Iceberg's
    separate data/delete manifests (the class rides in KB metadata, the
    reader never opens a file to learn what kind it is)."""
    seg = f"{os.sep}{_MOR_DELETE_CLASS}{os.sep}"
    deletes = [f for f in files if seg in f]
    data = [f for f in files if seg not in f]
    return data, deletes


_MOR_PRED_SQL = "o_orderkey % 10 = 3"  # scatters over EVERY data file


@query(
    "sink_merge_on_read_delete",
    oracle=f"""
    SELECT CAST(0 AS INT) AS files_rewritten_at_delete,
           CAST(1 AS INT) AS n_delete_files,
           TRUE AS fold_equals_mor,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM orders WHERE NOT ({_MOR_PRED_SQL})
    """,
)
def sink_merge_on_read_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-ON-READ row-level DELETE (deletion vectors) — the write
    path frequent small deletes need at 100 TB, where copy-on-write
    (`sink_merge_delete`) cannot afford a per-commit rewrite. The
    predicate here deliberately SCATTERS across every data file
    (orderkey % 10 — COW would rewrite the whole table); the delete
    commits as an ADD-ONLY delta of one KB-scale EQUALITY-DELETE file
    (the matching keys as parquet under the `deletes/` path class) —
    zero data files rewritten, asserted in-key: the head still
    references every v1 data file byte-identically and the only new
    file is the tombstone. Readers MERGE at scan time: data files
    LEFT ANTI JOIN the union of delete files on the key (the tombstone
    side is KB — Spark broadcasts it); time travel to v1 still shows
    the deleted rows (asserted). A later fold commit (the OPTIMIZE /
    compaction moment, `sink_auto_compaction`'s policy shape) rewrites
    the data applying the vector and retires the tombstone in ONE
    remove/add delta — the post-fold plain read must equal the pre-fold
    MOR read (asserted row-for-row on the digest), and the head carries
    zero delete-class files afterwards.

    Scale: delete cost is O(matching keys) metadata + one KB CAS —
    independent of table size; read overhead is one broadcast anti-join
    per scan until the next fold amortizes it away (exactly the
    Delta deletion-vector / Iceberg equality-delete trade). Conflicts
    inherit the log's semantics: appends commute with the tombstone
    add; a racer rewriting the same data files surfaces as
    CommitConflict at fold time."""
    root = _scratch(sf_dir, "mor_delete_table")
    log_dir = os.path.join(root, "log")
    data_dir = os.path.join(root, "data")
    del_dir = os.path.join(root, _MOR_DELETE_CLASS, "d1")
    fold_dir = os.path.join(root, "fold")
    os.makedirs(log_dir, exist_ok=True)
    for v in os.listdir(log_dir):
        os.unlink(os.path.join(log_dir, v))

    o = load(spark, sf_dir, "orders")
    (
        o.withColumn("o_year", F.year("o_orderdate"))
        .repartition("o_year")
        .write.mode("overwrite")
        .partitionBy("o_year")
        .parquet(data_dir)
    )
    v1_files = sorted(
        os.path.join(dp, f)
        for dp, _, fs in os.walk(data_dir)
        for f in fs
        if f.endswith(".parquet")
    )
    _commit_snapshot(log_dir, v1_files)  # v1: the base table

    # v2: the DELETE — one equality-delete file, ADD-only commit.
    (
        spark.read.parquet(*v1_files)
        .filter(F.expr(_MOR_PRED_SQL))
        .select("o_orderkey")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(del_dir)
    )
    tombstones = _data_files_of(del_dir)
    if len(tombstones) != 1:
        raise RuntimeError(f"expected one tombstone file, got {tombstones}")
    _commit_snapshot(log_dir, tombstones, extra={"op": "mor-delete"})

    head_v2 = _read_manifest(log_dir, _log_versions(log_dir)[-1])["files"]
    data_v2, dels_v2 = _split_head_files(head_v2)
    if sorted(data_v2) != v1_files:
        raise RuntimeError("MOR delete disturbed data files — must be add-only")
    if dels_v2 != tombstones:
        raise RuntimeError(f"head delete class wrong: {dels_v2}")
    # Time travel: v1 (pre-delete) must still contain the deleted rows.
    v1_read = spark.read.parquet(*_read_manifest(log_dir, 1)["files"])
    if v1_read.filter(F.expr(_MOR_PRED_SQL)).limit(1).count() == 0:
        raise RuntimeError("v1 lost the deleted rows — time travel broken")

    def _mor_read() -> DataFrame:
        keys = spark.read.parquet(*dels_v2).select("o_orderkey")
        return spark.read.parquet(*data_v2).join(
            F.broadcast(keys), "o_orderkey", "left_anti"
        )

    digest = [
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents"),
    ]
    mor_row = _mor_read().agg(*digest).collect()[0]

    # v3: the FOLD — rewrite data applying the vector, retire everything.
    _mor_read().coalesce(2).write.mode("overwrite").parquet(fold_dir)
    _commit_snapshot(
        log_dir,
        _data_files_of(fold_dir),
        remove_files=head_v2,
        extra={"op": "mor-fold"},
    )
    head_v3 = _read_manifest(log_dir, _log_versions(log_dir)[-1])["files"]
    data_v3, dels_v3 = _split_head_files(head_v3)
    if dels_v3:
        raise RuntimeError(f"fold left tombstones in the head: {dels_v3}")
    fold_row = spark.read.parquet(*data_v3).agg(*digest).collect()[0]
    if (mor_row["n_rows"], mor_row["cents"]) != (
        fold_row["n_rows"],
        fold_row["cents"],
    ):
        raise RuntimeError(
            f"fold diverged from MOR read: {mor_row} vs {fold_row}"
        )

    return spark.read.parquet(*data_v3).agg(
        F.lit(0).cast("int").alias("files_rewritten_at_delete"),
        F.lit(1).cast("int").alias("n_delete_files"),
        F.lit(True).alias("fold_equals_mor"),
        *digest,
    )


# --- partition evolution through the manifest (r9: the r8 verdict's
# missing #4 — the layout twin of sink_schema_evolution_commit) ---

_PE_LO, _PE_HI = "1997-01-01", "1998-07-01"  # the cross-generation probe


@query(
    "sink_partition_evolution",
    oracle=f"""
    SELECT TRUE AS pruned_gen1, TRUE AS pruned_gen2, TRUE AS old_files_intact,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '{_PE_LO}'
      AND o_orderdate <  TIMESTAMP '{_PE_HI}'
    """,
)
def sink_partition_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTITION EVOLUTION through the commit log — commit 2 changes the
    table's partitioning scheme for FUTURE files while every old file
    stays under the old layout, byte-identical (asserted): generation 1
    lands pre-1998 orders partitioned by YEAR; generation 2 appends the
    1998+ orders partitioned by (YEAR, QUARTER). Re-laying out history
    is exactly what a 100 TB table cannot afford — evolution must be an
    O(1) metadata change (Iceberg's spec-per-file contract; here each
    file's spec is carried by its Hive-style path segments, which live
    IN the manifest file list — planning never opens a file or lists a
    directory).

    The read side proves plans span BOTH layout generations: a probe
    window ({_PE_LO} .. {_PE_HI}) is planned from manifest paths alone —
    gen-1 files prune by the year key, gen-2 files by (year, quarter) —
    and the planned set must be a STRICT subset within EACH generation
    (pruning actually bit on both, asserted; the finer gen-2 spec prunes
    quarters the coarse gen-1 spec cannot). Bounds prune files, never
    prove rows: the exact predicate still applies, and the oracle's
    digest catches both over-prune (lost rows) and under-filter
    (neighbor rows) — the `scan_manifest_stats_prune` discipline over an
    evolved layout."""
    import re

    root = _scratch(sf_dir, "part_evo_table")
    log_dir = os.path.join(root, "log")
    gen1_dir = os.path.join(root, "gen1")
    gen2_dir = os.path.join(root, "gen2")
    os.makedirs(log_dir, exist_ok=True)
    for v in os.listdir(log_dir):
        os.unlink(os.path.join(log_dir, v))

    o = load(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    cutoff = 1998
    (
        o.filter(F.col("o_year") < cutoff)
        .repartition("o_year")
        .write.mode("overwrite")
        .partitionBy("o_year")
        .parquet(gen1_dir)
    )

    def _tree_files(d: str) -> list[str]:
        return sorted(
            os.path.join(dp, f)
            for dp, _, fs in os.walk(d)
            for f in fs
            if f.endswith(".parquet")
        )

    gen1_files = _tree_files(gen1_dir)
    _commit_snapshot(
        log_dir, gen1_files, extra={"spec": ["o_year"], "spec_id": 1}
    )  # v1: layout generation 1

    (
        o.filter(F.col("o_year") >= cutoff)
        .withColumn("o_quarter", F.quarter("o_orderdate"))
        .repartition("o_year", "o_quarter")
        .write.mode("overwrite")
        .partitionBy("o_year", "o_quarter")
        .parquet(gen2_dir)
    )
    gen2_files = _tree_files(gen2_dir)
    _commit_snapshot(
        log_dir,
        gen2_files,
        extra={"spec": ["o_year", "o_quarter"], "spec_id": 2},
    )  # v2: the EVOLUTION — add-only, nothing rewritten

    head = _read_manifest(log_dir, _log_versions(log_dir)[-1])["files"]
    if sorted(f for f in head if f.startswith(gen1_dir)) != gen1_files:
        raise RuntimeError("evolution disturbed generation-1 files")

    # Manifest-only planning: each file's spec is its path segments.
    year_re = re.compile(rf"o_year=(\d+)\{os.sep}")
    quarter_re = re.compile(rf"o_quarter=(\d+)\{os.sep}")
    lo_y, lo_q = 1997, 1  # probe window in (year, quarter) space
    hi_y, hi_q = 1998, 2  # inclusive: 1997Q1 .. 1998Q2

    def _planned(path: str) -> bool:
        y = int(year_re.search(path).group(1))
        qm = quarter_re.search(path)
        if qm is None:  # gen-1 spec: year bounds only
            return lo_y <= y <= hi_y
        q = int(qm.group(1))
        return (lo_y, lo_q) <= (y, q) <= (hi_y, hi_q)

    sel_gen1 = [f for f in head if f.startswith(gen1_dir) and _planned(f)]
    sel_gen2 = [f for f in head if f.startswith(gen2_dir) and _planned(f)]
    if not sel_gen1 or len(sel_gen1) >= len(gen1_files):
        raise RuntimeError(
            f"gen-1 pruning did not bite: {len(sel_gen1)}/{len(gen1_files)}"
        )
    if not sel_gen2 or len(sel_gen2) >= len(gen2_files):
        raise RuntimeError(
            f"gen-2 pruning did not bite: {len(sel_gen2)}/{len(gen2_files)}"
        )

    return (
        spark.read.parquet(*sel_gen1, *sel_gen2)
        .filter(
            (F.col("o_orderdate") >= F.lit(_PE_LO).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(_PE_HI).cast("timestamp"))
        )
        .agg(
            F.lit(True).alias("pruned_gen1"),
            F.lit(True).alias("pruned_gen2"),
            F.lit(True).alias("old_files_intact"),
            F.count("*").cast("long").alias("n_rows"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
    )


# --- OPTIMIZE ZORDER (r9: the r8 verdict's ask #6 — sink_auto_compaction's
# commit shape re-clustering on sink_zorder_write's Morton key) ---

_OPTZ_TARGET_FILES = 8


@query(
    "sink_optimize_zorder",
    oracle=f"""
    SELECT CAST(16 AS INT) AS files_before,
           CAST({_OPTZ_TARGET_FILES} AS INT) AS files_after,
           CAST(5 AS INT) AS n_snapshots,
           TRUE AS zorder_clustered,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM orders
    """,
)
def sink_optimize_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE ZORDER in one commit — Delta's real OPTIMIZE semantics:
    compaction and re-clustering are the SAME rewrite, so the small-file
    debris of incremental ingestion comes back not merely bigger but
    LAID OUT, and every post-OPTIMIZE scan prunes on both clustered
    dimensions. Four hash-scattered append commits land 16 small files,
    each a full-width stripe of the (custkey, orderdate) plane (asserted
    BEFORE: mean per-file range fraction ≈ 1 on both dimensions — hash
    placement clusters nothing); the OPTIMIZE commit rewrites the head
    along `sink_zorder_write`'s Morton key (`_orders_zval`, shared) into
    {_OPTZ_TARGET_FILES} files and lands as one remove/add delta on the
    OCC log (`sink_auto_compaction`'s policy shape — concurrent appends
    survive the rebase, concurrent rewrites abort). The rectangle
    property is RE-ASSERTED post-compaction in-key: mean per-file range
    fraction < 0.7 on custkey AND < 0.8 on orderdate (the
    tests/test_round7_ops.py bound) — an OPTIMIZE that merely
    concatenated files would fail it every run. Per-file min/max come
    from ONE distributed input_file_name() pass (the provenance shape),
    never a per-file loop of jobs.

    Scale: the rewrite reads and writes the compacted region once —
    at 100 TB OPTIMIZE runs partition-local with unchanged protocol;
    the z computation is whole-stage-codegen bit arithmetic and the
    range partitioner samples z like any global sort (no skew, no
    driver state beyond the 2×2 bounds row). The oracle pins the
    full-table digest — a rewrite that lost or doubled rows breaks the
    hash regardless of layout."""
    root = _scratch(sf_dir, "optimize_zorder_table")
    log_dir = os.path.join(root, "log")
    os.makedirs(log_dir, exist_ok=True)
    for v in os.listdir(log_dir):
        os.unlink(os.path.join(log_dir, v))

    o = load(spark, sf_dir, "orders")
    q = F.abs(F.xxhash64("o_orderkey")) % 4
    for i in range(4):  # four ingestion commits, 4 hash-scattered files each
        d = os.path.join(root, f"ingest{i}")
        (
            o.filter(q == i)
            .repartition(4)
            .write.mode("overwrite")
            .parquet(d)
        )
        _commit_snapshot(log_dir, _data_files_of(d))

    before = _read_manifest(log_dir, _log_versions(log_dir)[-1])["files"]
    if len(before) != 16:
        raise RuntimeError(f"ingestion debris wrong: {len(before)} files")

    corpus = o.agg(
        F.min("o_custkey").alias("cmin"),
        F.max("o_custkey").alias("cmax"),
        F.min(F.to_date("o_orderdate")).alias("dmin"),
        F.max(F.to_date("o_orderdate")).alias("dmax"),
    ).collect()[0]
    cspan = int(corpus["cmax"]) - int(corpus["cmin"]) + 1
    dspan = (corpus["dmax"] - corpus["dmin"]).days + 1

    def _mean_fractions(files: list[str]) -> tuple[float, float]:
        rows = (
            spark.read.parquet(*files)
            .select(
                F.input_file_name().alias("f"),
                "o_custkey",
                F.to_date("o_orderdate").alias("d"),
            )
            .groupBy("f")
            .agg(
                F.min("o_custkey").alias("c0"),
                F.max("o_custkey").alias("c1"),
                F.min("d").alias("d0"),
                F.max("d").alias("d1"),
            )
            .collect()  # one row per file — bounded metadata
        )
        cf = [ (int(r["c1"]) - int(r["c0"]) + 1) / cspan for r in rows ]
        df_ = [ ((r["d1"] - r["d0"]).days + 1) / dspan for r in rows ]
        return sum(cf) / len(cf), sum(df_) / len(df_)

    pre_c, pre_d = _mean_fractions(before)
    if pre_c < 0.9 or pre_d < 0.9:
        raise RuntimeError(
            f"ingestion debris unexpectedly clustered: {pre_c:.2f}/{pre_d:.2f}"
        )

    # The OPTIMIZE ZORDER commit: re-cluster the whole head on z.
    zdir = os.path.join(root, "optimized")
    head_df = spark.read.parquet(*before)
    (
        head_df.withColumn("zval", _orders_zval(head_df))
        .repartitionByRange(_OPTZ_TARGET_FILES, "zval")
        .sortWithinPartitions("zval")
        .drop("zval")
        .write.mode("overwrite")
        .parquet(zdir)
    )
    after_files = _data_files_of(zdir)
    _commit_snapshot(
        log_dir, after_files, remove_files=before, extra={"op": "optimize-zorder"}
    )

    versions = _log_versions(log_dir)
    head_files = _read_manifest(log_dir, versions[-1])["files"]
    if versions != [1, 2, 3, 4, 5]:
        raise RuntimeError(f"log not linear: {versions}")
    if sorted(head_files) != sorted(after_files):
        raise RuntimeError("head is not exactly the OPTIMIZE rewrite")
    post_c, post_d = _mean_fractions(head_files)
    if post_c >= 0.7 or post_d >= 0.8:
        raise RuntimeError(
            f"rewrite is not z-clustered: fractions {post_c:.2f}/{post_d:.2f}"
        )

    return spark.read.parquet(*head_files).agg(
        F.lit(len(before)).cast("int").alias("files_before"),
        F.lit(len(head_files)).cast("int").alias("files_after"),
        F.lit(len(versions)).cast("int").alias("n_snapshots"),
        F.lit(True).alias("zorder_clustered"),
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents"),
    )


@query(
    "sink_merge_on_read_upsert",
    oracle="""
    WITH merged AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT)
             + CASE WHEN o_orderkey % 5 = 0 THEN 500 ELSE 0 END AS cents
      FROM orders
      UNION ALL
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) + 123 AS cents
      FROM orders WHERE o_orderkey % 1000 = 7)
    SELECT CAST(0 AS INT) AS files_rewritten,
           CAST(2 AS INT) AS files_added,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(cents) AS BIGINT) AS cents
    FROM merged
    """,
)
def sink_merge_on_read_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-ON-READ UPSERT — MERGE INTO as one ADD-only commit, the
    write path for a merge whose update keys SCATTER over every file
    (o_orderkey % 5 touches all years — `sink_acid_upsert`'s COW plan
    would rewrite the whole table; at 100 TB that is not a merge, it is
    a migration). The commit atomically adds exactly TWO files: an
    equality-delete tombstone carrying the matched keys and a data file
    carrying their updated versions plus the inserts — zero rewrite,
    asserted (every v1 file still referenced byte-identically).

    The read side applies Iceberg's SEQUENCE-NUMBER semantics derived
    from the log itself: walking the KB manifests gives each file its
    first-appearance version, and a tombstone applies only to data
    files COMMITTED BEFORE it — which is what keeps the upsert data
    file (same keys, same commit) out of its own delete's scope. The
    oracle recomputes the merged table from the source, so a lost
    update, a double-applied surcharge (old row surviving the
    anti-join), or a dropped insert breaks the hash.

    Scale: merge cost = O(matched + inserted rows) written + one KB
    CAS, independent of table size; the read pays one broadcast
    anti-join until `sink_merge_on_read_delete`'s fold shape folds the
    vector. COW vs MOR is a write/read-amplification dial — this key
    and `sink_acid_upsert` are the two positions on the same log."""
    root = _scratch(sf_dir, "mor_upsert_table")
    log_dir = os.path.join(root, "log")
    data_dir = os.path.join(root, "data")
    del_dir = os.path.join(root, _MOR_DELETE_CLASS, "u1")
    up_dir = os.path.join(root, "upsert")
    os.makedirs(log_dir, exist_ok=True)
    for v in os.listdir(log_dir):
        os.unlink(os.path.join(log_dir, v))

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    (
        o.withColumn("o_year", F.year("o_orderdate"))
        .repartition("o_year")
        .write.mode("overwrite")
        .partitionBy("o_year")
        .parquet(data_dir)
    )
    v1_files = sorted(
        os.path.join(dp, f)
        for dp, _, fs in os.walk(data_dir)
        for f in fs
        if f.endswith(".parquet")
    )
    _commit_snapshot(log_dir, v1_files)  # v1

    matched = F.col("o_orderkey") % 5 == 0
    base = spark.read.parquet(*v1_files)
    base.filter(matched).select("o_orderkey").coalesce(1).write.mode(
        "overwrite"
    ).parquet(del_dir)
    updates = base.filter(matched).withColumn(
        "cents", F.col("cents") + 500
    ).select("o_orderkey", "o_orderdate", "cents")
    inserts = o.filter(F.col("o_orderkey") % 1000 == 7).select(
        (F.col("o_orderkey") + F.lit(1_000_000_000)).alias("o_orderkey"),
        F.lit("2002-01-01").cast("timestamp").alias("o_orderdate"),
        (F.col("cents") + 123).alias("cents"),
    )
    updates.unionByName(inserts).coalesce(1).write.mode("overwrite").parquet(
        up_dir
    )
    adds = _data_files_of(del_dir) + _data_files_of(up_dir)
    if len(adds) != 2:
        raise RuntimeError(f"MOR merge must add exactly 2 files: {adds}")
    _commit_snapshot(log_dir, adds, extra={"op": "mor-merge"})  # v2

    head = _read_manifest(log_dir, _log_versions(log_dir)[-1])["files"]
    data_files, tombstones = _split_head_files(head)
    if not set(v1_files) <= set(data_files):
        raise RuntimeError("MOR merge disturbed base files — must be add-only")
    if len(tombstones) != 1:
        raise RuntimeError(f"expected one tombstone: {tombstones}")

    # Sequence-scoped read: file -> first-appearance version from the log.
    first_ver: dict[str, int] = {}
    for v in _log_versions(log_dir):
        for f in _read_manifest(log_dir, v)["files"]:
            first_ver.setdefault(f, v)
    tomb_ver = first_ver[tombstones[0]]
    old_data = [f for f in data_files if first_ver[f] < tomb_ver]
    new_data = [f for f in data_files if first_ver[f] >= tomb_ver]
    if sorted(old_data) != v1_files or len(new_data) != 1:
        raise RuntimeError("sequence scoping mis-classified data files")

    keys = spark.read.parquet(*tombstones).select("o_orderkey")
    merged = (
        spark.read.parquet(*old_data)
        .join(F.broadcast(keys), "o_orderkey", "left_anti")
        .unionByName(spark.read.parquet(*new_data))
    )
    return merged.agg(
        F.lit(0).cast("int").alias("files_rewritten"),
        F.lit(2).cast("int").alias("files_added"),
        F.count("*").cast("long").alias("n_rows"),
        F.sum("cents").cast("long").alias("cents"),
    )


# --- manifest-log checkpointing (r9: the "at thousands of commits, a
# real format checkpoints the log" contract noted in the r8 verdict) ---


@query(
    "scan_log_checkpoint",
    oracle="""
    SELECT CAST(12 AS INT) AS n_commits,
           CAST(10 AS INT) AS checkpoint_version,
           CAST(2 AS INT) AS manifests_read,
           TRUE AS matches_full_walk,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM orders
    """,
)
def scan_log_checkpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOG CHECKPOINTING — the O(tail)-resolution contract a commit log
    needs once commits number in the thousands (Delta's _last_checkpoint
    / Iceberg's snapshot metadata). This key's table uses a DELTA-FORM
    log — each manifest records ONLY its commit's added files (Delta's
    actions-log shape, published through the same `_try_publish`
    write-temp-then-link CAS; the main `_commit_snapshot` log stores
    absolute lists, where the head manifest alone is the state and
    checkpoints are moot — the delta form is exactly WHY real formats
    checkpoint). Resolving the head therefore means replaying every
    delta since genesis — O(commits) manifest opens — until a
    CHECKPOINT materializes the cumulative state: after commit 10 of
    12, the checkpointer writes the v10 union (derived data, same
    put-if-absent — racing checkpointers write identical bytes and
    collide benignly) and advances a `_last_checkpoint` pointer via
    os.replace (supersede-on-purpose, the `scan_branch_tag_refs` ref
    discipline). The reader resolves the head opening exactly: the
    pointer, the checkpoint, and the 2 tail deltas — hard-asserted by
    counting actual opens — and the result is asserted identical to the
    full 12-manifest replay before the digest is taken.

    Scale: head resolution drops from O(commits) to O(commits since
    last checkpoint) — at a commit a minute that is ~half a million
    manifest reads avoided per year; the checkpoint is KB-per-thousand-
    files metadata on a fixed cadence. Manifests stay on disk: the
    checkpoint is a cache, never the truth."""
    import json

    root = _scratch(sf_dir, "log_checkpoint_table")
    log_dir = os.path.join(root, "log")
    os.makedirs(log_dir, exist_ok=True)
    for v in os.listdir(log_dir):
        os.unlink(os.path.join(log_dir, v))

    o = load(spark, sf_dir, "orders")
    n_commits, ckpt_at = 12, 10

    def _replay(upto: int, opened: list[str]) -> set[str]:
        """Union of add-deltas v1..upto — the no-checkpoint reader."""
        state: set[str] = set()
        for v in range(1, upto + 1):
            path = os.path.join(log_dir, f"v{v}.json")
            opened.append(path)
            with open(path) as fh:
                state |= set(json.load(fh)["files"])
        return state

    for i in range(n_commits):  # one small append commit per slice
        d = os.path.join(root, f"ingest{i}")
        (
            o.filter(F.col("o_orderkey") % n_commits == i)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(d)
        )
        # delta-form manifest: this commit's ADDS only
        if not _try_publish(log_dir, i + 1, _data_files_of(d)):
            raise RuntimeError(f"single-writer CAS lost v{i + 1}")
        if i + 1 == ckpt_at:
            # checkpointer pays the full replay ONCE, then readers don't
            state = _replay(ckpt_at, [])
            tmp = os.path.join(log_dir, f".ckpt-tmp-{os.getpid()}")
            with open(tmp, "w") as fh:
                json.dump({"version": ckpt_at, "files": sorted(state)}, fh)
            try:
                os.link(tmp, os.path.join(log_dir, f"ckpt-v{ckpt_at}.json"))
            except FileExistsError:
                pass
            finally:
                os.unlink(tmp)
            ptmp = os.path.join(log_dir, f".lastckpt-tmp-{os.getpid()}")
            with open(ptmp, "w") as fh:
                fh.write(str(ckpt_at))
            os.replace(ptmp, os.path.join(log_dir, "_last_checkpoint"))

    # Checkpoint-based head resolution: pointer -> checkpoint -> tail.
    opened: list[str] = []
    with open(os.path.join(log_dir, "_last_checkpoint")) as fh:
        ckpt_ver = int(fh.read())
    with open(os.path.join(log_dir, f"ckpt-v{ckpt_ver}.json")) as fh:
        state = set(json.load(fh)["files"])
    head_ver = _log_versions(log_dir)[-1]
    for v in range(ckpt_ver + 1, head_ver + 1):
        path = os.path.join(log_dir, f"v{v}.json")
        opened.append(path)
        with open(path) as fh:
            state |= set(json.load(fh)["files"])
    resolved = sorted(state)
    manifests_read = len(opened)

    if manifests_read != head_ver - ckpt_ver:
        raise RuntimeError(
            f"read {manifests_read} tail manifests, expected "
            f"{head_ver - ckpt_ver}"
        )
    if manifests_read >= n_commits - 1:
        raise RuntimeError("checkpoint saved nothing — reader walked the log")
    full_opens: list[str] = []
    full_walk = sorted(_replay(head_ver, full_opens))
    if len(full_opens) != n_commits:
        raise RuntimeError("full replay must open every manifest")
    if resolved != full_walk:
        raise RuntimeError("checkpoint resolution diverged from full replay")

    return spark.read.parquet(*resolved).agg(
        F.lit(n_commits).cast("int").alias("n_commits"),
        F.lit(ckpt_ver).cast("int").alias("checkpoint_version"),
        F.lit(manifests_read).cast("int").alias("manifests_read"),
        F.lit(True).alias("matches_full_walk"),
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents"),
    )


@query(
    "sink_write_audit_publish",
    oracle="""
    WITH base AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),
    good AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders WHERE o_orderkey % 1000 = 7)
    SELECT TRUE AS bad_batch_rejected,
           TRUE AS good_batch_published,
           CAST(3 AS INT) AS main_version,
           CAST((SELECT count(*) FROM base)
                + (SELECT count(*) FROM good) AS BIGINT) AS n_rows,
           CAST((SELECT sum(cents) FROM base)
                + (SELECT sum(cents) FROM good) AS BIGINT) AS cents
    """,
)
def sink_write_audit_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WRITE-AUDIT-PUBLISH — the staging pattern that keeps bad data off
    production WITHOUT a second copy of the table (Iceberg's WAP /
    Netflix's audit pattern, composed entirely from this repo's own
    primitives: CAS snapshot commits + branch refs): every ingest batch
    COMMITS to the shared immutable log but lands on a STAGING ref;
    a data-quality audit runs against the staged snapshot; only a
    passing audit fast-forwards the `main` ref (one atomic os.replace of
    one integer — publish is O(1) regardless of batch size), and a
    failing audit simply never moves `main` — no rollback, no delete,
    the bad snapshot just stays unreachable until vacuum.

    Proven in-key on both outcomes: a POISONED batch (negative-cents
    rows planted) stages as v2, its audit counts the violations and
    REJECTS — asserted: `main` still resolves to v1, a main reader sees
    ZERO violating rows, and none of the bad batch's files are
    referenced by main's manifest; then a CLEAN batch stages as v3
    (built from main's head, not the rejected v2 — the rejected branch
    is abandoned, exactly WAP's semantics), its audit passes, and
    publish fast-forwards main to v3 (asserted). The oracle pins the
    published table to base + good batch recomputed from the source —
    a leaked poisoned row, a lost good row, or a publish of the wrong
    version breaks the hash.

    Scale: the audit is an ordinary Spark job over the staged snapshot
    (here one hash agg; in production the full dq_rule_report), priced
    at one read of the NEW files only if the audit is incremental; the
    stage commit and the publish are each one KB metadata op. This is
    the operational answer to "how do 100 TB pipelines deploy data like
    code" — stage, test, promote, all on one storage footprint."""
    root = _scratch(sf_dir, "wap_table")
    log_dir = os.path.join(root, "log")
    refs_dir = os.path.join(root, "refs")
    os.makedirs(log_dir, exist_ok=True)
    os.makedirs(refs_dir, exist_ok=True)
    for d in (log_dir, refs_dir):
        for v in os.listdir(d):
            os.unlink(os.path.join(d, v))

    def set_ref(name: str, version: int) -> None:
        tmp = os.path.join(refs_dir, f".tmp-{name}")
        with open(tmp, "w") as fh:
            fh.write(str(version))
        os.replace(tmp, os.path.join(refs_dir, name))

    def get_ref(name: str) -> int:
        with open(os.path.join(refs_dir, name)) as fh:
            return int(fh.read())

    def ref_files(name: str) -> list[str]:
        return _read_manifest(log_dir, get_ref(name))["files"]

    def audit(files: list[str]) -> int:
        """DQ gate on a staged snapshot: violating-row count (negative
        cents or null key) — one hash aggregate, zero rows collected
        beyond the single count."""
        return (
            spark.read.parquet(*files)
            .filter((F.col("cents") < 0) | F.col("o_orderkey").isNull())
            .count()
        )

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    base_dir = os.path.join(root, "base")
    o.repartition(2).write.mode("overwrite").parquet(base_dir)
    v1, _ = _commit_snapshot(log_dir, _data_files_of(base_dir))
    set_ref("main", v1)

    # Batch 1 (POISONED): re-keyed rows with negated cents — every row
    # violates, so the gate must fire at ANY corpus size (a %100 slice
    # keeps the batch non-empty even at sf0.001's 1,500 orders).
    bad_dir = os.path.join(root, "bad_batch")
    (
        o.filter(F.col("o_orderkey") % 100 == 13)
        .select(
            (F.col("o_orderkey") + F.lit(2_000_000_000)).alias("o_orderkey"),
            (-F.col("cents")).alias("cents"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(bad_dir)
    )
    bad_files = _data_files_of(bad_dir)
    if spark.read.parquet(*bad_files).limit(1).count() == 0:
        raise RuntimeError("staged poisoned batch is empty — vacuous gate")
    v2, _ = _commit_snapshot(log_dir, bad_files)  # stage commit
    set_ref("wap_batch1", v2)
    if audit(ref_files("wap_batch1")) == 0:
        raise RuntimeError("poisoned batch passed the audit — gate broken")
    # REJECT: main is simply never advanced.
    if get_ref("main") != v1:
        raise RuntimeError("main moved without a passing audit")
    if audit(ref_files("main")) != 0:
        raise RuntimeError("main reader sees unaudited poisoned rows")
    if set(bad_files) & set(ref_files("main")):
        raise RuntimeError("bad batch's files referenced by main")

    # Batch 2 (CLEAN): staged FROM MAIN'S HEAD — the rejected branch is
    # abandoned, not repaired (WAP semantics).
    good_dir = os.path.join(root, "good_batch")
    (
        o.filter(F.col("o_orderkey") % 1000 == 7)
        .select(
            (F.col("o_orderkey") + F.lit(3_000_000_000)).alias("o_orderkey"),
            F.col("cents"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(good_dir)
    )
    if not _try_publish(
        log_dir,
        v2 + 1,
        ref_files("main") + _data_files_of(good_dir),
    ):
        raise RuntimeError("stage commit lost an uncontended CAS")
    set_ref("wap_batch2", v2 + 1)
    if audit(ref_files("wap_batch2")) != 0:
        raise RuntimeError("clean batch failed the audit")
    set_ref("main", get_ref("wap_batch2"))  # PUBLISH: O(1) fast-forward

    if get_ref("main") != 3:
        raise RuntimeError(f"main at v{get_ref('main')}, expected v3")
    main_files = ref_files("main")
    if set(bad_files) & set(main_files):
        raise RuntimeError("published main references the rejected batch")

    return spark.read.parquet(*main_files).agg(
        F.lit(True).alias("bad_batch_rejected"),
        F.lit(True).alias("good_batch_published"),
        F.lit(3).cast("int").alias("main_version"),
        F.count("*").cast("long").alias("n_rows"),
        F.sum("cents").cast("long").alias("cents"),
    )


@query(
    "dq_snapshot_drift",
    oracle=f"""
    WITH v1 AS (
      SELECT o_orderstatus AS s, count(*) AS n,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS c
      FROM orders WHERE o_orderdate < TIMESTAMP '{_CC_CUTOFF}'
      GROUP BY 1),
    v2 AS (
      SELECT o_orderstatus AS s, count(*) AS n,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS c
      FROM orders GROUP BY 1)
    SELECT v2.s AS status,
           CAST(coalesce(v1.n, 0) AS BIGINT) AS n_v1,
           CAST(v2.n AS BIGINT) AS n_v2,
           CAST(v2.n - coalesce(v1.n, 0) AS BIGINT) AS n_delta,
           CAST(v2.c - coalesce(v1.c, 0) AS BIGINT) AS cents_delta,
           TRUE AS incremental_consistent
    FROM v2 LEFT JOIN v1 ON v1.s = v2.s
    ORDER BY status
    """,
)
def dq_snapshot_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VERSION-OVER-VERSION DRIFT REPORT from the snapshot log — the DQ
    composition a lakehouse makes nearly free: both table versions
    resolve from KB manifests (no copied "yesterday's table"), so
    "what changed between v1 and v2" is two pinned reads joined on the
    bounded group key. Reported per order status: counts and cents at
    each version plus the deltas — the shape a pipeline owner alerts on
    (a negative n_delta on an append-only table, a cents swing outside
    tolerance).

    The 100 TB posture is INCREMENTAL STATS, proven in-key: v2's
    per-status stats are recomputed as v1's stats PLUS an aggregate
    over ONLY the delta files (manifest set difference — the
    `scan_snapshot_incremental` read shape) and hard-asserted equal to
    the direct full v2 scan; a drift monitor therefore prices at one
    read of the new files per commit, never a second full-table scan.
    The oracle recomputes both versions from the source, so a drift
    report that lost a status, mixed versions, or double-counted the
    delta breaks the hash."""
    root = _scratch(sf_dir, "drift_table")
    log_dir = os.path.join(root, "log")
    os.makedirs(log_dir, exist_ok=True)
    for v in os.listdir(log_dir):
        os.unlink(os.path.join(log_dir, v))

    o = load(spark, sf_dir, "orders")
    cutoff = F.lit(_CC_CUTOFF).cast("timestamp")
    base_dir = os.path.join(root, "base")
    delta_dir = os.path.join(root, "delta")
    o.filter(F.col("o_orderdate") < cutoff).repartition(2).write.mode(
        "overwrite"
    ).parquet(base_dir)
    o.filter(F.col("o_orderdate") >= cutoff).repartition(2).write.mode(
        "overwrite"
    ).parquet(delta_dir)
    _commit_snapshot(log_dir, _data_files_of(base_dir))  # v1
    _commit_snapshot(log_dir, _data_files_of(delta_dir))  # v2 append

    v1_files = _read_manifest(log_dir, 1)["files"]
    v2_files = _read_manifest(log_dir, 2)["files"]
    delta_files = sorted(set(v2_files) - set(v1_files))

    def stats(files: list[str]) -> DataFrame:
        return (
            spark.read.parquet(*files)
            .groupBy(F.col("o_orderstatus").alias("status"))
            .agg(
                F.count("*").cast("long").alias("n"),
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                .cast("long")
                .alias("c"),
            )
        )

    s1 = stats(v1_files)
    s2 = stats(v2_files)

    # Incremental-stats proof: v1 + delta-files-only == direct v2,
    # per status (bounded ≤ |statuses| rows collected).
    sd = stats(delta_files)
    merged = (
        s1.select("status", F.col("n").alias("n1"), F.col("c").alias("c1"))
        .join(
            sd.select(
                "status", F.col("n").alias("nd"), F.col("c").alias("cd")
            ),
            "status",
            "full_outer",
        )
        .na.fill(0, ["n1", "c1", "nd", "cd"])
        .select(
            "status",
            (F.col("n1") + F.col("nd")).alias("n"),
            (F.col("c1") + F.col("cd")).alias("c"),
        )
    )
    inc = {
        r["status"]: (r["n"], r["c"]) for r in merged.collect()
    }
    direct = {r["status"]: (r["n"], r["c"]) for r in s2.collect()}
    if inc != direct:
        raise RuntimeError(
            f"incremental stats diverged from full scan: {inc} vs {direct}"
        )

    return (
        s2.select(
            "status", F.col("n").alias("n_v2"), F.col("c").alias("c_v2")
        )
        .join(
            s1.select(
                "status", F.col("n").alias("n_v1"), F.col("c").alias("c_v1")
            ),
            "status",
            "left",
        )
        .na.fill(0, ["n_v1", "c_v1"])
        .select(
            "status",
            F.col("n_v1").cast("long").alias("n_v1"),
            F.col("n_v2").cast("long").alias("n_v2"),
            (F.col("n_v2") - F.col("n_v1")).cast("long").alias("n_delta"),
            (F.col("c_v2") - F.col("c_v1")).cast("long").alias("cents_delta"),
            F.lit(True).alias("incremental_consistent"),
        )
        .orderBy("status")
    )


@query(
    "sink_vacuum_refs_aware",
    oracle=f"""
    SELECT 'branch:main' AS ref, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents,
           TRUE AS ref_pinned_survived, TRUE AS rejected_collected
    FROM orders
    UNION ALL
    SELECT 'tag:baseline' AS ref, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents,
           TRUE AS ref_pinned_survived, TRUE AS rejected_collected
    FROM orders WHERE o_orderdate < TIMESTAMP '{_CC_CUTOFF}'
    ORDER BY ref
    """,
)
def sink_vacuum_refs_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REFS-AWARE snapshot expiration + vacuum — closes the seam the r9
    verdict named missing #1: `sink_snapshot_vacuum`'s retention walks
    only the linear version log, so (a) it would delete files still
    referenced by a live branch/tag ref, and (b) rejected write-audit-
    publish staging snapshots (`sink_write_audit_publish`) were never
    actually collected by any tested path. Here retention = the last-N
    window UNION every snapshot reachable from the refs directory, and
    both failure modes are exercised in one history:

    - v1 = base (pre-cutoff orders), tagged `baseline` and branched as
      `main`. v2 = a POISONED staging batch (WAP shape): committed to
      the shared log on ref `wap_reject`, audit counts the violations,
      the batch is rejected and its staging ref DELETED — the snapshot
      becomes unreachable garbage.
    - v3 = compaction of main (v1's files rewritten to one, main
      fast-forwards), v4 = main appends the rest. The last-2 window is
      {{v3, v4}} — v1 is OUTSIDE it and survives ONLY because
      `tag:baseline` pins it (hard-asserted: a refs-BLIND live set does
      NOT contain v1's files, so the naive vacuum would have corrupted
      the tag; the refs-aware one keeps them byte-identically and the
      returned frame re-reads the tag AFTER the vacuum so the oracle
      hash proves it). v2 is expired AND unreachable — its files are
      exactly the orphan set (asserted) and are provably gone from disk
      afterwards, closing the WAP docstring's "stays unreachable until
      vacuum" promise.

    Scale: ref reachability adds one KB read per ref to the same
    manifest arithmetic — no directory sweep, no data read; the delete
    list stays exact. This is Iceberg's expire_snapshots contract:
    `retain_last` + never expiring a snapshot any ref points at."""
    root = _scratch(sf_dir, "vacuum_refs_table")
    log_dir = os.path.join(root, "log")
    refs_dir = os.path.join(root, "refs")
    os.makedirs(log_dir, exist_ok=True)
    os.makedirs(refs_dir, exist_ok=True)
    for d in (log_dir, refs_dir):
        for v in os.listdir(d):
            os.unlink(os.path.join(d, v))

    def set_ref(name: str, version: int) -> None:
        tmp = os.path.join(refs_dir, f".tmp-{name}")
        with open(tmp, "w") as fh:
            fh.write(str(version))
        os.replace(tmp, os.path.join(refs_dir, name))

    def get_ref(name: str) -> int:
        with open(os.path.join(refs_dir, name)) as fh:
            return int(fh.read())

    o = load(spark, sf_dir, "orders")
    cutoff = F.lit(_CC_CUTOFF).cast("timestamp")
    base_dir = os.path.join(root, "base")
    bad_dir = os.path.join(root, "bad_batch")
    compact_dir = os.path.join(root, "compact")
    rest_dir = os.path.join(root, "rest")

    # v1: base = pre-cutoff orders; tag + branch pin it
    o.filter(F.col("o_orderdate") < cutoff).repartition(2).write.mode(
        "overwrite"
    ).parquet(base_dir)
    base_files = _data_files_of(base_dir)
    v1, _ = _commit_snapshot(log_dir, base_files)
    set_ref("tag_baseline", v1)
    set_ref("branch_main", v1)

    # v2: poisoned staging batch (WAP shape) — rejected, ref deleted
    (
        o.filter(F.col("o_orderkey") % 100 == 13)
        .select(
            (F.col("o_orderkey") + F.lit(2_000_000_000)).alias("o_orderkey"),
            (-F.round(F.col("o_totalprice") * 100)).cast("long").alias("cents"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(bad_dir)
    )
    bad_files = _data_files_of(bad_dir)
    v2, _ = _commit_snapshot(log_dir, bad_files)
    set_ref("wap_reject", v2)
    n_bad = (
        spark.read.parquet(*bad_files).filter(F.col("cents") < 0).count()
    )
    if n_bad == 0:
        raise RuntimeError("staged poisoned batch has no violations")
    os.unlink(os.path.join(refs_dir, "wap_reject"))  # REJECT: drop the ref

    # v3: compaction of MAIN (child of v1 by ref, not of the log head)
    spark.read.parquet(*base_files).coalesce(1).write.mode(
        "overwrite"
    ).parquet(compact_dir)
    if not _try_publish(log_dir, v2 + 1, _data_files_of(compact_dir)):
        raise RuntimeError("compaction commit lost an uncontended CAS")
    set_ref("branch_main", v2 + 1)
    # v4: main appends the remaining orders
    o.filter(F.col("o_orderdate") >= cutoff).write.mode("overwrite").parquet(
        rest_dir
    )
    v4_files = (
        _read_manifest(log_dir, get_ref("branch_main"))["files"]
        + _data_files_of(rest_dir)
    )
    if not _try_publish(log_dir, v2 + 2, v4_files):
        raise RuntimeError("append commit lost an uncontended CAS")
    set_ref("branch_main", v2 + 2)

    versions = _log_versions(log_dir)
    window = set(versions[-2:])  # retain_last = 2
    ref_pinned = {get_ref(name) for name in os.listdir(refs_dir)}
    retained = sorted(window | ref_pinned)
    expired = [v for v in versions if v not in retained]
    if expired != [v2]:
        raise RuntimeError(
            f"expired set wrong: {expired} (retained {retained})"
        )

    live: set[str] = set()
    for v in retained:
        live |= set(_read_manifest(log_dir, v)["files"])
    # Counterfactual: a refs-BLIND live set misses v1's files entirely —
    # the naive vacuum would have deleted what the tag still references.
    naive_live: set[str] = set()
    for v in sorted(window):
        naive_live |= set(_read_manifest(log_dir, v)["files"])
    if set(base_files) & naive_live:
        raise RuntimeError("counterfactual broken: window already covers v1")
    if not set(base_files) <= live:
        raise RuntimeError("ref-pinned v1 files missing from the live set")

    orphans: set[str] = set()
    for v in expired:
        orphans |= set(_read_manifest(log_dir, v)["files"])
    orphans -= live
    if orphans != set(bad_files):
        raise RuntimeError(f"orphan set wrong: {sorted(orphans)}")
    for f in sorted(orphans):
        os.unlink(f)
    for v in expired:
        os.rename(
            os.path.join(log_dir, f"v{v}.json"),
            os.path.join(log_dir, f"v{v}{_EXPIRED_SUFFIX}"),
        )
    if any(os.path.exists(f) for f in orphans):
        raise RuntimeError("rejected batch's files survived the vacuum")
    if not all(os.path.exists(f) for f in live):
        raise RuntimeError("vacuum deleted a live file")
    if _log_versions(log_dir) != retained:
        raise RuntimeError(
            f"log after vacuum: {_log_versions(log_dir)} != {retained}"
        )

    digest = [
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents"),
    ]
    per = []
    for ref, name in [
        ("branch:main", "branch_main"),
        ("tag:baseline", "tag_baseline"),
    ]:
        files = _read_manifest(log_dir, get_ref(name))["files"]
        per.append(
            spark.read.parquet(*files).agg(
                F.lit(ref).alias("ref"),
                *digest,
                F.lit(True).alias("ref_pinned_survived"),
                F.lit(True).alias("rejected_collected"),
            )
        )
    return per[0].unionByName(per[1]).orderBy("ref")


@query(
    "scan_snapshot_rollback",
    oracle="""
    WITH ev AS (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders)
    SELECT CAST(3 AS INT) AS rollback_version,
           CAST(4 AS INT) AS n_snapshots,
           TRUE AS rollback_metadata_only,
           TRUE AS bad_batch_still_travelable,
           CAST((SELECT count(*) FROM ev)
                + (SELECT count(*) FROM ev WHERE o_orderkey % 1000 = 7)
                AS BIGINT) AS n_rows,
           CAST((SELECT sum(cents) FROM ev)
                + (SELECT sum(cents) FROM ev WHERE o_orderkey % 1000 = 7)
                AS BIGINT) AS cents
    """,
)
def scan_snapshot_rollback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SNAPSHOT ROLLBACK as a FORWARD commit — the undo primitive of the
    log: a bad publish is not repaired by deleting history (manifests
    are immutable; readers may hold v2) but by committing a NEW version
    whose file list equals the good state's — Iceberg's
    rollback_to_snapshot / Delta's RESTORE. History: v1 = base; v2
    appends a POISONED batch (negated cents, asserted present); v3 =
    the rollback — a remove-delta of exactly v2's adds, leaving v3's
    file list BYTE-IDENTICAL to v1's (asserted: same list, zero new
    files, so the rollback moved metadata only); v4 appends a clean
    batch and life continues on the restored line. Time travel is
    preserved both ways (asserted): v2 still shows the poisoned rows
    inside retention — the forensic record a delete-history 'rollback'
    destroys — while v3/v4 readers see zero of them.

    Scale: rollback cost is one KB manifest CAS regardless of how much
    data the bad commit added; the bad files linger until vacuum
    (`sink_vacuum_refs_aware` collects them once unreferenced), so
    restore is instant even when the mistake was 10 TB."""
    root = _scratch(sf_dir, "rollback_table")
    log_dir = os.path.join(root, "log")
    os.makedirs(log_dir, exist_ok=True)
    for v in os.listdir(log_dir):
        os.unlink(os.path.join(log_dir, v))

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    base_dir = os.path.join(root, "base")
    bad_dir = os.path.join(root, "bad")
    good_dir = os.path.join(root, "good")
    o.repartition(2).write.mode("overwrite").parquet(base_dir)
    v1, _ = _commit_snapshot(log_dir, _data_files_of(base_dir))
    v1_files = _read_manifest(log_dir, v1)["files"]

    (
        o.filter(F.col("o_orderkey") % 100 == 13)
        .select(
            (F.col("o_orderkey") + F.lit(2_000_000_000)).alias("o_orderkey"),
            (-F.col("cents")).alias("cents"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(bad_dir)
    )
    bad_files = _data_files_of(bad_dir)
    v2, _ = _commit_snapshot(log_dir, bad_files)
    if (
        spark.read.parquet(*_read_manifest(log_dir, v2)["files"])
        .filter(F.col("cents") < 0)
        .limit(1)
        .count()
        == 0
    ):
        raise RuntimeError("bad batch left no visible violations at v2")

    # v3: THE ROLLBACK — remove exactly v2's adds; nothing new lands
    v3, _ = _commit_snapshot(
        log_dir, [], remove_files=bad_files, extra={"op": "rollback", "to": v1}
    )
    v3_files = _read_manifest(log_dir, v3)["files"]
    if v3_files != v1_files:
        raise RuntimeError(
            f"rollback did not restore v1's file list: {v3_files}"
        )
    # metadata-only: every v3 file already existed before the rollback
    if not set(v3_files) <= set(v1_files):
        raise RuntimeError("rollback materialized new files")
    # forensic record: v2 must still show the poisoned rows ...
    still_bad = (
        spark.read.parquet(*_read_manifest(log_dir, v2)["files"])
        .filter(F.col("cents") < 0)
        .count()
    )
    if still_bad == 0:
        raise RuntimeError("v2 lost the poisoned rows — history mutated")
    # ... while the restored head shows none
    if (
        spark.read.parquet(*v3_files)
        .filter(F.col("cents") < 0)
        .limit(1)
        .count()
    ):
        raise RuntimeError("restored head still shows poisoned rows")

    (
        o.filter(F.col("o_orderkey") % 1000 == 7)
        .select(
            (F.col("o_orderkey") + F.lit(3_000_000_000)).alias("o_orderkey"),
            F.col("cents"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(good_dir)
    )
    _commit_snapshot(log_dir, _data_files_of(good_dir))
    versions = _log_versions(log_dir)
    if versions != [1, 2, 3, 4]:
        raise RuntimeError(f"history not linear: {versions}")

    head = _read_manifest(log_dir, versions[-1])["files"]
    return spark.read.parquet(*head).agg(
        F.lit(3).cast("int").alias("rollback_version"),
        F.lit(len(versions)).cast("int").alias("n_snapshots"),
        F.lit(True).alias("rollback_metadata_only"),
        F.lit(bool(still_bad > 0)).alias("bad_batch_still_travelable"),
        F.count("*").cast("long").alias("n_rows"),
        F.sum("cents").cast("long").alias("cents"),
    )


@query(
    "sink_branch_cherry_pick",
    oracle=f"""
    SELECT TRUE AS cherry_picked, TRUE AS a1_excluded,
           TRUE AS conflict_detected,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM orders
    WHERE o_orderdate < TIMESTAMP '{_CC_CUTOFF}'
       OR (o_orderdate >= TIMESTAMP '{_CC_CUTOFF}' AND o_orderkey % 10 = 2)
    """,
)
def sink_branch_cherry_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHERRY-PICK across branches — promoting ONE commit's delta from a
    work branch to main without merging the branch (Iceberg's
    cherrypick_snapshot): the audit branch lands two appends A1 (v2) and
    A2 (v3) on top of shared v1; only A2 is wanted on main, so its
    REMOVE/ADD DELTA (manifest arithmetic: files(v3) − files(v2)) is
    re-applied onto MAIN's head as a new commit — asserted: main gains
    exactly A2's files, references none of A1's, and the oracle pins the
    read to base + the A2 slice recomputed from source.

    The SAFETY RULE is proven on the negative path: a cherry-pick whose
    delta REMOVES files is only valid if those files are still present
    on the target — after main compacts the base files away, re-applying
    the branch's compaction delta (which removes the same base files)
    must raise CommitConflict (asserted), not resurrect dead files or
    double-apply the rewrite. This is the same conflict rule
    `_commit_snapshot` enforces between racing writers, applied across
    refs.

    Scale: a cherry-pick is KB manifest arithmetic + one CAS — promoting
    a 10 TB backfill commit from `audit` to `main` copies zero bytes;
    the conflict check is a set containment over file lists, never a
    data read."""
    root = _scratch(sf_dir, "cherry_table")
    log_dir = os.path.join(root, "log")
    refs_dir = os.path.join(root, "refs")
    os.makedirs(log_dir, exist_ok=True)
    os.makedirs(refs_dir, exist_ok=True)
    for d in (log_dir, refs_dir):
        for v in os.listdir(d):
            os.unlink(os.path.join(d, v))

    def set_ref(name: str, version: int) -> None:
        tmp = os.path.join(refs_dir, f".tmp-{name}")
        with open(tmp, "w") as fh:
            fh.write(str(version))
        os.replace(tmp, os.path.join(refs_dir, name))

    def get_ref(name: str) -> int:
        with open(os.path.join(refs_dir, name)) as fh:
            return int(fh.read())

    def ref_files(name: str) -> list[str]:
        return _read_manifest(log_dir, get_ref(name))["files"]

    def cherry_pick(target: str, adds: list[str], removes: list[str]) -> int:
        """Re-apply a commit's remove/add delta onto the target ref —
        the cross-ref form of `_commit_snapshot`'s conflict rule."""
        parent = ref_files(target)
        if not set(removes) <= set(parent):
            raise CommitConflict(
                f"cherry-pick removes files absent from {target}: "
                f"{sorted(set(removes) - set(parent))}"
            )
        child = [f for f in parent if f not in set(removes)] + adds
        version = _log_versions(log_dir)[-1] + 1
        if not _try_publish(log_dir, version, child):
            raise RuntimeError("cherry-pick lost an uncontended CAS")
        set_ref(target, version)
        return version

    o = load(spark, sf_dir, "orders")
    cutoff = F.lit(_CC_CUTOFF).cast("timestamp")
    base_dir = os.path.join(root, "base")
    a1_dir = os.path.join(root, "a1")
    a2_dir = os.path.join(root, "a2")
    o.filter(F.col("o_orderdate") < cutoff).repartition(2).write.mode(
        "overwrite"
    ).parquet(base_dir)
    base_files = _data_files_of(base_dir)
    v1, _ = _commit_snapshot(log_dir, base_files)
    set_ref("branch_main", v1)
    set_ref("branch_audit", v1)

    rest = o.filter(F.col("o_orderdate") >= cutoff)
    rest.filter(F.col("o_orderkey") % 10 == 1).coalesce(1).write.mode(
        "overwrite"
    ).parquet(a1_dir)
    rest.filter(F.col("o_orderkey") % 10 == 2).coalesce(1).write.mode(
        "overwrite"
    ).parquet(a2_dir)

    # audit lands A1 (v2) then A2 (v3), each a child of ITS OWN head
    if not _try_publish(
        log_dir, v1 + 1, ref_files("branch_audit") + _data_files_of(a1_dir)
    ):
        raise RuntimeError("A1 commit lost an uncontended CAS")
    set_ref("branch_audit", v1 + 1)
    v2_files = ref_files("branch_audit")
    if not _try_publish(
        log_dir, v1 + 2, v2_files + _data_files_of(a2_dir)
    ):
        raise RuntimeError("A2 commit lost an uncontended CAS")
    set_ref("branch_audit", v1 + 2)

    # cherry-pick A2 only: the delta between the branch's v3 and v2
    a2_delta_add = sorted(set(ref_files("branch_audit")) - set(v2_files))
    if a2_delta_add != _data_files_of(a2_dir):
        raise RuntimeError(f"A2 delta wrong: {a2_delta_add}")
    cherry_pick("branch_main", a2_delta_add, [])
    main_files = set(ref_files("branch_main"))
    if main_files != set(base_files) | set(a2_delta_add):
        raise RuntimeError(f"main after cherry-pick: {sorted(main_files)}")
    if main_files & set(_data_files_of(a1_dir)):
        raise RuntimeError("cherry-pick leaked A1 files onto main")

    # main compacts the base away; the branch's competing compaction
    # delta now removes files main no longer has -> MUST conflict
    mc_dir = os.path.join(root, "main_compact")
    spark.read.parquet(*base_files).coalesce(1).write.mode(
        "overwrite"
    ).parquet(mc_dir)
    cherry_pick("branch_main", _data_files_of(mc_dir), base_files)
    ac_dir = os.path.join(root, "audit_compact")
    spark.read.parquet(*base_files).coalesce(1).write.mode(
        "overwrite"
    ).parquet(ac_dir)
    conflict_detected = False
    try:
        cherry_pick("branch_main", _data_files_of(ac_dir), base_files)
    except CommitConflict:
        conflict_detected = True
    if not conflict_detected:
        raise RuntimeError(
            "conflicting cherry-pick (stale removes) was accepted"
        )

    return spark.read.parquet(*ref_files("branch_main")).agg(
        F.lit(True).alias("cherry_picked"),
        F.lit(True).alias("a1_excluded"),
        F.lit(bool(conflict_detected)).alias("conflict_detected"),
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents"),
    )


@query(
    "scan_branch_diff",
    oracle=f"""
    SELECT 'audit_only' AS side, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '{_CC_CUTOFF}' AND o_orderkey % 2 = 1
    UNION ALL
    SELECT 'main_only', CAST(count(*) AS BIGINT),
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '{_CC_CUTOFF}' AND o_orderkey % 2 = 0
    UNION ALL
    SELECT 'shared', CAST(count(*) AS BIGINT),
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
    FROM orders WHERE o_orderdate < TIMESTAMP '{_CC_CUTOFF}'
    ORDER BY side
    """,
)
def scan_branch_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BRANCH DIFF — the review surface for the branch/WAP workflow
    (`scan_branch_tag_refs` builds the branches, this key answers 'what
    would merging audit change?'): resolve both refs to manifests,
    partition the UNION of their file lists into shared / main-only /
    audit-only by pure set arithmetic (KB, driver-side), then read ONLY
    the exclusive file sets for the row-level diff — the shared digest
    comes from the shared files, so diff cost is proportional to the
    DIVERGENCE, never to the table (asserted structurally: the exclusive
    read lists are disjoint from the shared list, and shared files =
    the full v1 base — zero-copy branching made auditable).

    Scale: two 100 TB branches that share 99% of their files diff in
    one read of the 1% — the same argument as incremental scan; file-
    level classification alone (no row read) already answers 'did this
    branch touch partition X', which is how a reviewer scopes a risky
    backfill before paying for the row diff."""
    root = _scratch(sf_dir, "branch_diff_table")
    log_dir = os.path.join(root, "log")
    refs_dir = os.path.join(root, "refs")
    os.makedirs(log_dir, exist_ok=True)
    os.makedirs(refs_dir, exist_ok=True)
    for d in (log_dir, refs_dir):
        for v in os.listdir(d):
            os.unlink(os.path.join(d, v))

    def set_ref(name: str, version: int) -> None:
        tmp = os.path.join(refs_dir, f".tmp-{name}")
        with open(tmp, "w") as fh:
            fh.write(str(version))
        os.replace(tmp, os.path.join(refs_dir, name))

    def get_ref(name: str) -> int:
        with open(os.path.join(refs_dir, name)) as fh:
            return int(fh.read())

    o = load(spark, sf_dir, "orders")
    cutoff = F.lit(_CC_CUTOFF).cast("timestamp")
    base_dir = os.path.join(root, "base")
    even_dir = os.path.join(root, "even")
    odd_dir = os.path.join(root, "odd")
    o.filter(F.col("o_orderdate") < cutoff).repartition(2).write.mode(
        "overwrite"
    ).parquet(base_dir)
    rest = o.filter(F.col("o_orderdate") >= cutoff)
    rest.filter(F.col("o_orderkey") % 2 == 0).coalesce(1).write.mode(
        "overwrite"
    ).parquet(even_dir)
    rest.filter(F.col("o_orderkey") % 2 == 1).coalesce(1).write.mode(
        "overwrite"
    ).parquet(odd_dir)

    base_files = _data_files_of(base_dir)
    v1, _ = _commit_snapshot(log_dir, base_files)
    set_ref("branch_main", v1)
    set_ref("branch_audit", v1)
    if not _try_publish(log_dir, v1 + 1, base_files + _data_files_of(even_dir)):
        raise RuntimeError("main commit lost an uncontended CAS")
    set_ref("branch_main", v1 + 1)
    if not _try_publish(log_dir, v1 + 2, base_files + _data_files_of(odd_dir)):
        raise RuntimeError("audit commit lost an uncontended CAS")
    set_ref("branch_audit", v1 + 2)

    main_files = set(
        _read_manifest(log_dir, get_ref("branch_main"))["files"]
    )
    audit_files = set(
        _read_manifest(log_dir, get_ref("branch_audit"))["files"]
    )
    shared = sorted(main_files & audit_files)
    main_only = sorted(main_files - audit_files)
    audit_only = sorted(audit_files - main_files)
    if shared != base_files:
        raise RuntimeError(f"shared set is not the v1 base: {shared}")
    if set(main_only) & set(audit_only):
        raise RuntimeError("exclusive sets overlap — set arithmetic broken")
    if not (main_only and audit_only):
        raise RuntimeError("branches did not diverge — diff is vacuous")

    digest = [
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents"),
    ]
    per = []
    for side, files in (
        ("audit_only", audit_only),
        ("main_only", main_only),
        ("shared", shared),
    ):
        per.append(
            spark.read.parquet(*files).agg(F.lit(side).alias("side"), *digest)
        )
    out = per[0]
    for df in per[1:]:
        out = out.unionByName(df)
    return out.orderBy("side")


_FK_EDGES = [
    # (edge label, child table, fk col, parent table, pk col)
    ("customer.nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("lineitem.orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("nation.regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ("orders.custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("supplier.nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
]


@query(
    "dq_referential_orphans",
    oracle="""
    WITH """
    + ",\n    ".join(
        f"""e{i} AS (
      SELECT '{label}' AS edge,
             (SELECT count(*) FROM {child}) AS n_child,
             (SELECT count(*) FROM {child} WHERE {fk} IS NULL) AS n_null_fk,
             (SELECT count(*) FROM {child} c
              WHERE c.{fk} IS NOT NULL AND NOT EXISTS
                (SELECT 1 FROM {parent} p WHERE p.{pk} = c.{fk}))
               AS n_orphans,
             (SELECT count(*) FROM {parent}) AS n_parents,
             (SELECT count(DISTINCT {fk}) FROM {child}) AS n_referenced,
             (SELECT max(n) FROM (SELECT count(*) AS n FROM {child}
                                  WHERE {fk} IS NOT NULL GROUP BY {fk}) t)
               AS max_fanout)"""
        for i, (label, child, fk, parent, pk) in enumerate(_FK_EDGES)
    )
    + """
    SELECT edge, CAST(n_child AS BIGINT) AS n_child,
           CAST(n_null_fk AS BIGINT) AS n_null_fk,
           CAST(n_orphans AS BIGINT) AS n_orphans,
           CAST(n_parents AS BIGINT) AS n_parents,
           CAST(n_referenced AS BIGINT) AS n_referenced,
           CAST(max_fanout AS BIGINT) AS max_fanout
    FROM ("""
    + " UNION ALL ".join(f"SELECT * FROM e{i}" for i in range(len(_FK_EDGES)))
    + """) u ORDER BY edge
    """,
)
def dq_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL-SCHEMA referential-integrity audit: every FK edge in the
    star schema (all seven — both lineitem fact legs, the order/customer
    chain, and the dimension spine down to region) checked in one
    report. Per edge: child cardinality, NULL FKs, orphans (child rows
    whose parent is missing), parent cardinality, DISTINCT referenced
    parents, and the max fan-out (hottest parent) — the last two make
    the report hash-discriminating even on this referentially-intact
    corpus (an implementation that hardwired zeros would still fail the
    fan-out and coverage columns) and are exactly the stats a skew-aware
    planner wants (max_fanout IS the skew bound for the FK join).

    Scale shape: each edge costs ONE hash aggregate on the FK column
    (count + per-key counts feeding max) plus ONE left-anti join against
    the parent's key projection — dims broadcast under AQE; the seven
    edges are independent DAG branches scheduled concurrently. Nothing
    row-shaped reaches the driver; the report is 7 rows."""
    rows = []
    for label, child, fk, parent, pk in _FK_EDGES:
        c = load(spark, sf_dir, child).select(fk)
        p = load(spark, sf_dir, parent).select(F.col(pk).alias(fk))
        per_key = (
            c.filter(F.col(fk).isNotNull())
            .groupBy(fk)
            .agg(F.count("*").alias("n"))
        )
        fanout = per_key.agg(
            F.max("n").alias("max_fanout"),
            F.count("*").alias("n_referenced"),
        )
        orphans = (
            c.filter(F.col(fk).isNotNull())
            .join(p, fk, "left_anti")
            .agg(F.count("*").alias("n_orphans"))
        )
        base = c.agg(
            F.count("*").alias("n_child"),
            F.sum(F.when(F.col(fk).isNull(), 1).otherwise(0)).alias(
                "n_null_fk"
            ),
        )
        nparents = p.agg(F.count("*").alias("n_parents"))
        rows.append(
            base.crossJoin(F.broadcast(orphans))
            .crossJoin(F.broadcast(nparents))
            .crossJoin(F.broadcast(fanout))
            .select(
                F.lit(label).alias("edge"),
                F.col("n_child").cast("long"),
                F.col("n_null_fk").cast("long"),
                F.col("n_orphans").cast("long"),
                F.col("n_parents").cast("long"),
                F.col("n_referenced").cast("long"),
                F.col("max_fanout").cast("long"),
            )
        )
    out = rows[0]
    for df in rows[1:]:
        out = out.unionByName(df)
    return out.orderBy("edge")


_QUAR_PRICE = 450_000.0  # quarantine rule: suspiciously large order
_QUAR_DATE = "2000-01-01"  # quarantine rule: past the freshness window


@query(
    "dq_quarantine_split",
    oracle=f"""
    WITH tagged AS (
      SELECT o_orderkey,
             concat_ws(',',
               CASE WHEN o_orderdate >= TIMESTAMP '{_QUAR_DATE}'
                    THEN 'stale_date' END,
               CASE WHEN o_totalprice > {_QUAR_PRICE}
                    THEN 'price_outlier' END) AS reasons
      FROM orders),
    bad AS (SELECT * FROM tagged WHERE reasons <> '')
    SELECT o_orderkey, reasons,
           CAST(length(reasons) - length(replace(reasons, ',', '')) + 1
                AS BIGINT) AS n_reasons
    FROM bad ORDER BY o_orderkey LIMIT 20
    """,
)
def dq_quarantine_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation-suite QUARANTINE routing (the dead-letter half of a
    validation job — `dq_rule_report` counts violations; this key
    ROUTES the violating rows): orders are tagged with every rule they
    break (stale orderdate past {_QUAR_DATE}, price outlier above
    {_QUAR_PRICE}), the stream splits into good/quarantine, and the 20
    lowest-keyed quarantined rows with their reason CSV are returned —
    rows breaking BOTH rules carry both tags, which the hash checks.
    Conservation (good + quarantined == total) is hard-asserted in-key,
    so a router that dropped or double-sent rows fails every preflight.

    Scale shape: tagging is row-local (whole-stage codegen CASE chain —
    one scan, no shuffle); the split is two filters over the SAME tagged
    plan, not two scans (conservation reads both via one cached pass at
    this test SF; at 100 TB the split writes two sinks from one scan,
    the `foreachBatch` fan-out shape used by the streaming keys); the
    sample is a TakeOrderedAndProject, never a global sort."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    reasons = F.concat_ws(
        ",",
        F.when(
            F.col("o_orderdate") >= F.lit(_QUAR_DATE).cast("timestamp"),
            F.lit("stale_date"),
        ),
        F.when(
            F.col("o_totalprice") > _QUAR_PRICE, F.lit("price_outlier")
        ),
    )
    tagged = o.withColumn("reasons", reasons)
    bad = tagged.filter(F.col("reasons") != "")
    # conservation: the router must neither drop nor duplicate rows —
    # checked in ONE conditional aggregate (one scan), not three counts
    n_total, n_good, n_bad = tagged.agg(
        F.count("*"),
        F.sum(F.when(F.col("reasons") == "", 1).otherwise(0)),
        F.sum(F.when(F.col("reasons") != "", 1).otherwise(0)),
    ).collect()[0]
    assert n_good + n_bad == n_total, (n_good, n_bad, n_total)
    assert n_bad > 0, "quarantine rules must genuinely fire"
    return (
        bad.select(
            "o_orderkey",
            "reasons",
            (
                F.size(F.split(F.col("reasons"), ",")).cast("long")
            ).alias("n_reasons"),
        )
        .orderBy("o_orderkey")
        .limit(20)
    )


@query(
    "project_nested_prune",
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM orders GROUP BY 1 ORDER BY 1
    """,
)
def project_nested_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NESTED-COLUMN pruning end-to-end: orders re-materialized as a
    nested document (two structs — `pricing{cents, status}` and
    `meta{priority, orderdate}`, the event-log/API-dump shape), then a
    query touching ONE leaf of EACH struct must read exactly those two
    leaves from parquet — Catalyst's nestedSchemaPruning pushes the
    struct projection into the scan, so ReadSchema carries
    `pricing:struct<cents:…>` with `status`/`orderdate` absent (asserted
    in tests/test_plans.py). At 100 TB nested corpora (web crawls, API
    snapshots) this is the difference between scanning 2 leaf columns
    and deserializing every struct in full — parquet stores leaves
    columnar, so pruning nested leaves is exactly as cheap as pruning
    top-level ones IF the plan asks for it; this key proves ours does.

    The aggregate (orders per priority, cent-exact revenue) reconciles
    against the FLAT source table, proving the nest→prune→read pipeline
    loses nothing."""
    nested_path = _scratch(sf_dir, "orders_nested")
    o = load(spark, sf_dir, "orders")
    (
        o.select(
            "o_orderkey",
            F.struct(
                F.round(F.col("o_totalprice") * 100)
                .cast("long")
                .alias("cents"),
                F.col("o_orderstatus").alias("status"),
            ).alias("pricing"),
            F.struct(
                F.col("o_orderpriority").alias("priority"),
                F.col("o_orderdate").alias("orderdate"),
            ).alias("meta"),
        )
        .write.mode("overwrite")
        .parquet(nested_path)
    )
    back = spark.read.parquet(nested_path)
    return (
        back.groupBy(F.col("meta.priority").alias("priority"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("pricing.cents").cast("long").alias("cents"),
        )
        .orderBy("priority")
    )


@query(
    "dq_anomaly_mad_ingest",
    oracle="""
    WITH m AS (
      SELECT date_trunc('month', o_orderdate) AS month, count(*) AS n
      FROM orders GROUP BY 1),
    med AS (SELECT median(n) AS med FROM m),
    d AS (SELECT month, n, abs(n - (SELECT med FROM med)) AS dev FROM m),
    mad AS (SELECT median(dev) AS mad FROM d)
    SELECT month, CAST(n AS BIGINT) AS n_orders,
           CAST(2 * (SELECT med FROM med) AS BIGINT) AS med_x2,
           CAST(2 * (SELECT mad FROM mad) AS BIGINT) AS mad_x2,
           CAST(2 * dev AS BIGINT) AS dev_x2
    FROM d
    WHERE dev > 3 * (SELECT mad FROM mad)
    ORDER BY month
    """,
)
def dq_anomaly_mad_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INGEST-VOLUME anomaly detection, robust form: monthly order
    counts scored by deviation from the MEDIAN in units of the MEDIAN
    ABSOLUTE DEVIATION — the robust z-score that a bad backfill or a
    dropped partition can't poison the way it poisons mean/stddev
    control limits (`agg_control_chart`'s classical twin; one fat month
    shifts a mean but not a median). Months breaching 3×MAD are
    reported — the page an ingest on-call gets. The 3×MAD rule
    genuinely fires on this corpus (4-5 months at every SF, both
    directions: the first/last partial months and the seasonal spikes).

    Scale shape: ONE hash aggregate over the fact table (month grain →
    a calendar-bounded group count, ≤ a few thousand rows at ANY corpus
    size), then exact medians over that bounded frame — exact
    percentile is fine precisely because the grouped frame is bounded
    by the calendar, not the data; the verdict thresholds broadcast
    back over the 80-row frame. Determinism: counts are ints; medians
    of ints are k or k+0.5 exactly in double (both engines interpolate
    the middle pair identically), so every comparison and the ×2
    integer outputs are exact."""
    o = load(spark, sf_dir, "orders")
    m = (
        o.groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(F.count("*").alias("n"))
    )
    med = m.agg(F.expr("percentile(n, 0.5)").alias("med"))
    d = m.crossJoin(F.broadcast(med)).select(
        "month", "n", F.abs(F.col("n") - F.col("med")).alias("dev"), "med"
    )
    mad = d.agg(F.expr("percentile(dev, 0.5)").alias("mad"))
    return (
        d.crossJoin(F.broadcast(mad))
        .filter(F.col("dev") > 3 * F.col("mad"))
        .select(
            "month",
            F.col("n").cast("long").alias("n_orders"),
            (2 * F.col("med")).cast("long").alias("med_x2"),
            (2 * F.col("mad")).cast("long").alias("mad_x2"),
            (2 * F.col("dev")).cast("long").alias("dev_x2"),
        )
        .orderBy("month")
    )


_META_DEL_MOD = 10  # v3 COW delete predicate: o_orderkey % 10 == 3
_META_FILES_PER_COMMIT = 4  # every write repartition(4)s — pinned layout


@query(
    "scan_snapshot_metadata_tables",
    oracle=f"""
    WITH v1 AS (SELECT count(*) AS n FROM orders
                WHERE o_orderdate < TIMESTAMP '{_TT_CUTOFF}'),
    v2 AS (SELECT count(*) AS n FROM orders
           WHERE o_orderdate >= TIMESTAMP '{_TT_CUTOFF}'),
    v3 AS (SELECT count(*) AS n FROM orders
           WHERE o_orderdate < TIMESTAMP '{_TT_CUTOFF}'
             AND o_orderkey % {_META_DEL_MOD} <> 3)
    SELECT 1 AS version, 'append' AS operation,
           CAST({_META_FILES_PER_COMMIT} AS BIGINT) AS files_added,
           CAST(0 AS BIGINT) AS files_removed,
           CAST({_META_FILES_PER_COMMIT} AS BIGINT) AS files_live,
           CAST((SELECT n FROM v1) AS BIGINT) AS rows_added,
           CAST((SELECT n FROM v1) AS BIGINT) AS rows_live
    UNION ALL
    SELECT 2, 'append',
           {_META_FILES_PER_COMMIT}, 0, {2 * _META_FILES_PER_COMMIT},
           (SELECT n FROM v2),
           (SELECT n FROM v1) + (SELECT n FROM v2)
    UNION ALL
    SELECT 3, 'overwrite',
           {_META_FILES_PER_COMMIT}, {_META_FILES_PER_COMMIT},
           {2 * _META_FILES_PER_COMMIT},
           (SELECT n FROM v3),
           (SELECT n FROM v3) + (SELECT n FROM v2)
    ORDER BY version
    """,
)
def scan_snapshot_metadata_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """METADATA TABLES over the commit log — the `SELECT * FROM
    table$snapshots` / `DESCRIBE HISTORY` inspection surface every
    lakehouse ships: a three-commit lifecycle (append, append, COW
    delete-as-overwrite) rendered as one history relation with per
    version the operation, file-delta arithmetic (added/removed/live —
    pure KB manifest set algebra, zero data reads) and row lineage
    (rows_added counted DISTRIBUTED over exactly each commit's added
    files; rows_live over the live set). In-key asserts pin the
    invariants a history table must satisfy: files_live(v) folds from
    the deltas, and the overwrite's removed set is exactly v1's file
    list. Every write repartition(4)s so the file arithmetic is
    layout-pinned, not accidental.

    Scale: the history query itself costs manifest reads only — this is
    how a 100 TB table answers 'what changed last night' without
    touching a data byte; rows_added is the only distributed work and
    it scans each commit's OWN files once (the incremental-read shape
    of `scan_snapshot_incremental`)."""
    base = _scratch(sf_dir, "meta_tables")
    v1_dir = os.path.join(base, "v1")
    v2_dir = os.path.join(base, "v2")
    v3_dir = os.path.join(base, "v3")
    o = load(spark, sf_dir, "orders")
    cutoff = F.lit(_TT_CUTOFF).cast("timestamp")
    pre = o.filter(F.col("o_orderdate") < cutoff)
    post = o.filter(F.col("o_orderdate") >= cutoff)
    pre.repartition(_META_FILES_PER_COMMIT).write.mode("overwrite").parquet(
        v1_dir
    )
    post.repartition(_META_FILES_PER_COMMIT).write.mode("overwrite").parquet(
        v2_dir
    )
    # COW delete: rewrite v1's content minus the predicate as new files
    spark.read.parquet(v1_dir).filter(
        F.col("o_orderkey") % _META_DEL_MOD != 3
    ).repartition(_META_FILES_PER_COMMIT).write.mode("overwrite").parquet(
        v3_dir
    )

    def _files(d: str) -> list[str]:
        return sorted(
            os.path.join(d, f)
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    f1, f2, f3 = _files(v1_dir), _files(v2_dir), _files(v3_dir)
    # the oracle hardcodes files_added per commit; Spark emits parquet
    # files only for NON-EMPTY partitions, so a corpus whose repartition
    # split leaves an empty partition must fail loudly here, not as a
    # confusing downstream hash mismatch
    for label, fl in (("v1", f1), ("v2", f2), ("v3", f3)):
        if len(fl) != _META_FILES_PER_COMMIT:
            raise RuntimeError(
                f"{label} landed {len(fl)} files, oracle assumes "
                f"{_META_FILES_PER_COMMIT} — layout assumption broken"
            )
    # the commit log: (version, operation, added, removed)
    log = [
        (1, "append", f1, []),
        (2, "append", f2, []),
        (3, "overwrite", f3, f1),
    ]
    # manifest set algebra → live file list per version
    live: list[str] = []
    history = []
    for version, op, added, removed in log:
        assert set(removed) <= set(live), "removed files must be live"
        live = [f for f in live if f not in set(removed)] + added
        history.append((version, op, added, removed, list(live)))
    # invariant: the overwrite removed exactly v1's files
    assert history[2][3] == f1
    # distributed row lineage: rows_added over each commit's added files,
    # rows_live over its live set
    rows = []
    for version, op, added, removed, live_files in history:
        counts = (
            spark.read.parquet(*added)
            .agg(F.count("*").alias("ra"))
            .crossJoin(
                spark.read.parquet(*live_files).agg(
                    F.count("*").alias("rl")
                )
            )
            .select(
                F.lit(version).alias("version"),
                F.lit(op).alias("operation"),
                F.lit(len(added)).cast("long").alias("files_added"),
                F.lit(len(removed)).cast("long").alias("files_removed"),
                F.lit(len(live_files)).cast("long").alias("files_live"),
                F.col("ra").cast("long").alias("rows_added"),
                F.col("rl").cast("long").alias("rows_live"),
            )
        )
        rows.append(counts)
    out = rows[0]
    for df in rows[1:]:
        out = out.unionByName(df)
    return out.orderBy("version")


_DV_DEL_MOD = 7  # deletion-vector predicate at BUILD time only


@query(
    "sink_positional_delete_vector",
    oracle=f"""
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM orders
    WHERE o_orderkey % {_DV_DEL_MOD} <> 0
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def sink_positional_delete_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POSITIONAL delete vectors — the OTHER merge-on-read delete
    encoding (Iceberg positional deletes / Delta deletion vectors),
    completing the pair with `sink_merge_on_read_delete`'s EQUALITY
    tombstones: the delete commit stores (file_path, row_index) pairs —
    WHERE a row sits, not WHAT it contains — built here from the real
    parquet row positions (`_metadata.row_index`, the per-file physical
    ordinal Spark exposes on file sources). The reader reconstructs the
    table as base ANTI-JOIN dv ON (file_path, row_index): crucially it
    never sees the delete PREDICATE — position pairs are the only thing
    persisted, which the in-key asserts pin (dv non-empty, positions
    unique per file, every dv path a live base file).

    Scale shape: positional DVs are the low-write-amplification delete
    form — the commit writes KBs of positions instead of rewriting data
    files (COW) or carrying values (equality tombstones can't target
    ONE of N duplicate rows; positions can). The reconstruction
    anti-join broadcasts the DV (its size is the DELETE's, not the
    table's) and `_metadata.row_index` costs nothing extra to produce —
    it rides the scan. Real engines push DV masks into the reader as
    bitmaps; the anti-join is the same plan one level up.

    Determinism: positions depend on physical layout (repartition(4,
    o_orderkey) hash-partitions by key, so the file a row lands in is
    layout-stable within the run), but the RESULT doesn't — the DV is
    built from a value predicate, so the reconstructed table equals the
    predicate-filtered oracle regardless of layout."""
    base_dir = _scratch(sf_dir, "dv_base")
    dv_dir = _scratch(sf_dir, "dv_vector")
    o = load(spark, sf_dir, "orders")
    o.repartition(4, "o_orderkey").write.mode("overwrite").parquet(base_dir)

    # ---- delete commit: persist (file_path, row_index) pairs only ----
    annotated = spark.read.parquet(base_dir).select(
        "o_orderkey",
        F.col("_metadata.file_path").alias("file_path"),
        F.col("_metadata.row_index").alias("row_index"),
    )
    annotated.filter(
        F.col("o_orderkey") % _DV_DEL_MOD == 0
    ).select("file_path", "row_index").write.mode("overwrite").parquet(dv_dir)

    # ---- read path: positions are ALL the reader gets ----
    dv = spark.read.parquet(dv_dir)
    n_dv = dv.count()
    assert n_dv > 0, "delete vector must be non-empty"
    assert (
        dv.select("file_path", "row_index").distinct().count() == n_dv
    ), "positions must be unique per file"
    base_files = {
        r.file_path
        for r in spark.read.parquet(base_dir)
        .select(F.col("_metadata.file_path").alias("file_path"))
        .distinct()
        .collect()
    }  # bounded: 4 files
    dv_files = {r.file_path for r in dv.select("file_path").distinct().collect()}
    assert dv_files <= base_files, "every DV path must be a live base file"

    masked = (
        spark.read.parquet(base_dir)
        .withColumn("file_path", F.col("_metadata.file_path"))
        .withColumn("row_index", F.col("_metadata.row_index"))
        .join(F.broadcast(dv), ["file_path", "row_index"], "left_anti")
    )
    return (
        masked.groupBy("o_orderstatus")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
        .orderBy("o_orderstatus")
    )


# --- MOR maintenance compaction: rewrite-data-files (r10 verdict ask
# #2 — the background job every merge-on-read deployment runs) ---

_RDF_EQ_MOD = 2  # equality-tombstone predicate: o_orderkey % 10 == 2
_RDF_POS_MOD = 5  # positional-DV predicate: o_orderkey % 10 == 5


@query(
    "sink_rewrite_data_files",
    oracle=f"""
    SELECT CAST(6 AS INT) AS files_before, CAST(2 AS INT) AS files_after,
           CAST(2 AS INT) AS delete_files_before,
           CAST(0 AS INT) AS delete_files_after,
           CAST(4 AS INT) AS n_snapshots,
           TRUE AS post_plan_joinfree,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents,
           CAST(sum(o_orderkey) AS BIGINT) AS keysum
    FROM orders
    WHERE o_orderkey % 10 NOT IN ({_RDF_EQ_MOD}, {_RDF_POS_MOD})
    """,
)
def sink_rewrite_data_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REWRITE-DATA-FILES — MOR maintenance compaction (Iceberg's
    rewrite_data_files with delete application / Delta's PURGE): a
    long-lived merge-on-read table accumulates read-side debt — every
    scan pays one anti-join per accumulated delete structure — and this
    is the background job that retires it. The table here carries BOTH
    delete encodings at once: an EQUALITY tombstone
    (`sink_merge_on_read_delete`'s form, keys %10=={_RDF_EQ_MOD}) and a
    POSITIONAL delete vector (`sink_positional_delete_vector`'s form,
    (file_path, row_index) pairs for keys %10=={_RDF_POS_MOD}), both
    landed as KB add-only commits against a 4-file base. The compaction
    commit reads the MOR view (base ANTI-JOIN tombstone keys ANTI-JOIN
    DV positions), writes clean base files, and retires the fragmented
    files AND both delete structures in ONE remove/add delta stamped
    ``op=rewrite`` — the field the compaction-aware change feed
    (`stream_cdf_compaction_aware`) keys on to emit zero events.

    In-key asserts, each the ask's own acceptance line: the pre-
    compaction head carries exactly the 4 data + 2 delete-class files
    and its MOR read PLANS the anti-joins (LeftAnti twice, plan-
    asserted); the post-compaction head carries zero delete-class
    files and fewer files total; the post-compaction read plans NO
    join at all (the debt is gone, plan-asserted); the post read
    equals the pre MOR read on a full digest (count + cents + keysum);
    every retired file is still on disk (compaction never deletes
    data — vacuum's job, after retention); and the log advanced one
    linear sequence number per commit.

    Scale: the rewrite costs one read+write of the affected file set —
    at 100 TB you rewrite per partition, picking files by
    delete-debt-per-file from KB manifests; the commit protocol is the
    same remove/add delta, so concurrent appends rebase cleanly and a
    concurrent rewrite of the same files aborts as CommitConflict."""
    root = _scratch(sf_dir, "rdf_table")
    log_dir = os.path.join(root, "log")
    data_dir = os.path.join(root, "data")
    eq_dir = os.path.join(root, _MOR_DELETE_CLASS, "eq")
    dv_dir = os.path.join(root, _MOR_DELETE_CLASS, "pos")
    clean_dir = os.path.join(root, "rewritten")
    os.makedirs(log_dir, exist_ok=True)
    for v in os.listdir(log_dir):
        os.unlink(os.path.join(log_dir, v))

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    o.repartition(4, "o_orderkey").write.mode("overwrite").parquet(data_dir)
    base_files = _data_files_of(data_dir)
    if len(base_files) != 4:
        raise RuntimeError(f"base staged {len(base_files)} files, wanted 4")
    _commit_snapshot(log_dir, base_files)  # v1

    # v2: equality tombstone (values, not positions), ADD-only
    (
        spark.read.parquet(*base_files)
        .filter(F.col("o_orderkey") % 10 == _RDF_EQ_MOD)
        .select("o_orderkey")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(eq_dir)
    )
    _commit_snapshot(
        log_dir, _data_files_of(eq_dir), extra={"op": "mor-delete"}
    )

    # v3: positional delete vector (positions, not values), ADD-only
    (
        spark.read.parquet(*base_files)
        .select(
            "o_orderkey",
            F.col("_metadata.file_path").alias("file_path"),
            F.col("_metadata.row_index").alias("row_index"),
        )
        .filter(F.col("o_orderkey") % 10 == _RDF_POS_MOD)
        .select("file_path", "row_index")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(dv_dir)
    )
    _commit_snapshot(
        log_dir, _data_files_of(dv_dir), extra={"op": "pos-delete"}
    )

    head_pre = _read_manifest(log_dir, _log_versions(log_dir)[-1])["files"]
    data_pre, dels_pre = _split_head_files(head_pre)
    if sorted(data_pre) != base_files or len(dels_pre) != 2:
        raise RuntimeError(
            f"pre-compaction head wrong: {len(data_pre)} data, "
            f"{len(dels_pre)} delete files"
        )

    def _mor_read() -> DataFrame:
        eq_keys = spark.read.parquet(*_data_files_of(eq_dir)).select(
            "o_orderkey"
        )
        dv = spark.read.parquet(*_data_files_of(dv_dir))
        return (
            spark.read.parquet(*data_pre)
            .withColumn("file_path", F.col("_metadata.file_path"))
            .withColumn("row_index", F.col("_metadata.row_index"))
            .join(F.broadcast(eq_keys), "o_orderkey", "left_anti")
            .join(F.broadcast(dv), ["file_path", "row_index"], "left_anti")
            .drop("file_path", "row_index")
        )

    mor = _mor_read()
    mor_plan = mor._jdf.queryExecution().optimizedPlan().toString()
    if mor_plan.count("LeftAnti") != 2:
        raise RuntimeError(
            "pre-compaction MOR read must plan BOTH anti-joins: "
            f"{mor_plan.count('LeftAnti')} LeftAnti nodes"
        )
    digest = [
        F.count("*").cast("long").alias("n_rows"),
        F.sum("cents").cast("long").alias("cents"),
        F.sum("o_orderkey").cast("long").alias("keysum"),
    ]
    pre_row = mor.agg(*digest).collect()[0]

    # v4: THE REWRITE — apply both delete structures into clean base
    # files, drop the delete files, advance the sequence, stamp the op.
    # repartition(2), never coalesce(2): coalesce only UPPER-BOUNDS the
    # file count (a host whose bin-packing reads the base as one scan
    # partition would emit 1 file and silently break the oracle's
    # files_after=2), the sink_auto_compaction precedent
    _mor_read().repartition(2).write.mode("overwrite").parquet(clean_dir)
    clean_files = _data_files_of(clean_dir)
    if len(clean_files) != 2:
        raise RuntimeError(
            f"rewrite landed {len(clean_files)} files, oracle assumes 2"
        )
    _commit_snapshot(
        log_dir, clean_files, remove_files=head_pre, extra={"op": "rewrite"}
    )

    versions = _log_versions(log_dir)
    if versions != [1, 2, 3, 4]:
        raise RuntimeError(f"log not linear: {versions}")
    if _read_manifest(log_dir, 4).get("op") != "rewrite":
        raise RuntimeError("rewrite commit missing its op stamp")
    head_post = _read_manifest(log_dir, 4)["files"]
    data_post, dels_post = _split_head_files(head_post)
    if dels_post:
        raise RuntimeError(f"rewrite left delete files live: {dels_post}")
    if len(head_post) >= len(head_pre):
        raise RuntimeError(
            f"rewrite did not shrink the head: {len(head_pre)} -> "
            f"{len(head_post)}"
        )
    if not all(os.path.exists(f) for f in head_pre):
        raise RuntimeError(
            "rewrite deleted data files — that is vacuum's job"
        )

    post = spark.read.parquet(*data_post)
    post_plan = post._jdf.queryExecution().optimizedPlan().toString()
    if "Join" in post_plan:
        raise RuntimeError(
            "post-compaction read still plans a join — debt not retired"
        )
    post_row = post.agg(*digest).collect()[0]
    if tuple(pre_row) != tuple(post_row):
        raise RuntimeError(
            f"rewrite diverged from the MOR read: {tuple(pre_row)} vs "
            f"{tuple(post_row)}"
        )

    return post.agg(
        F.lit(len(head_pre)).cast("int").alias("files_before"),
        F.lit(len(head_post)).cast("int").alias("files_after"),
        F.lit(len(dels_pre)).cast("int").alias("delete_files_before"),
        F.lit(0).cast("int").alias("delete_files_after"),
        F.lit(len(versions)).cast("int").alias("n_snapshots"),
        F.lit(True).alias("post_plan_joinfree"),
        *digest,
    )


# --- cross-table atomic publish (r10 verdict ask #4): fact + dim land
# under ONE transaction root — a crash between staged writes leaves
# BOTH invisible ---

_MTP_CUTOFF = "1995-01-01"  # fact txn1/txn2 split
_MTP_DIM_MOD = 2  # dim txn1 carries even custkeys only


class _InjectedCrash(RuntimeError):
    """The publish process dying between staging and the txn commit."""


def _txn_publish(
    txn_dir: str, version: int, tables: dict, ops: dict | None = None
) -> None:
    """CAS-publish transaction ``version`` binding every table's file
    list in ONE manifest — the multi-table generalization of
    `_try_publish`: visibility for ALL tables flips on a single
    link(2), so readers can never observe table A at txn N and table B
    at txn N−1. Loses raise (single writer here; a rebase loop would
    wrap this exactly like `_commit_snapshot`). ``ops`` stamps
    PER-TABLE operation labels (e.g. {"fact": "rewrite"} for a
    compaction txn) — the field the cross-table change feed keys on to
    emit zero events for layout-only table deltas."""
    extra = {"tables": tables}
    if ops:
        extra["ops"] = ops
    if not _try_publish(txn_dir, version, [], extra=extra):
        raise CommitConflict(f"txn v{version} lost the CAS in {txn_dir}")


def _txn_head_tables(txn_dir: str) -> tuple[int, dict]:
    versions = _log_versions(txn_dir)
    head = versions[-1] if versions else 0
    return head, (_read_manifest(txn_dir, head)["tables"] if head else {})


@query(
    "sink_multi_table_publish",
    oracle=f"""
    SELECT CAST(2 AS INT) AS txn_head,
           TRUE AS crash_left_both_invisible,
           c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
)
def sink_multi_table_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-TABLE ATOMIC PUBLISH (the r10 verdict's ask #4 — the first
    thing a warehouse migrator asks for): a star-schema pipeline must
    land fact AND dim together, but per-table commit logs flip
    visibility one table at a time, so a crash (or a concurrent reader)
    between the two commits observes a fact referencing dim rows that
    do not exist yet. The fix is ONE TRANSACTION ROOT: a txn manifest
    binds {{table -> file list}} for every table, CAS-published with the
    same link(2) put-if-absent as the single-table log — visibility for
    the whole star flips on one atomic filesystem operation, and
    readers resolve every table through the head txn (never through
    per-table state).

    The INJECTED-CRASH proof (the `stream_mv_exactly_once` style): txn2
    stages the fact delta's files fully to disk, then the process dies
    BEFORE the dim is staged or the txn committed. Readers at that
    moment — asserted in-key — resolve head txn 1 and see the OLD state
    of BOTH tables: the staged fact files exist on disk but are
    referenced by no txn manifest (asserted disjoint), so they are
    invisible orphans (vacuum's harvest — `sink_multi_table_vacuum`
    collects exactly this class), not a torn read. The restarted
    publisher re-stages IDEMPOTENTLY — mode=overwrite into the same
    per-txn staging dirs, so a partial pre-crash staging is simply
    replaced — and commits txn2; only then do both tables advance,
    together.

    Scale: the txn manifest is KB metadata listing per-table file
    lists — the commit cost is one CAS regardless of how many tables or
    terabytes the transaction touches (Iceberg's multi-table
    transactions and Delta's commit coordinators centralize the same
    single arbitration point); staging cost is the writes themselves,
    which happen OUTSIDE the critical section."""
    root = _scratch(sf_dir, "mtp_txn")
    txn_dir = os.path.join(root, "txnlog")
    os.makedirs(txn_dir, exist_ok=True)
    for v in os.listdir(txn_dir):
        os.unlink(os.path.join(txn_dir, v))

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cutoff = F.lit(_MTP_CUTOFF).cast("date")

    def stage(df: DataFrame, name: str) -> list[str]:
        d = os.path.join(root, name)
        df.repartition(2).write.mode("overwrite").parquet(d)
        return _data_files_of(d)

    # txn1: the initial consistent star (old fact slice + even-key dims)
    fact1 = stage(o.filter(F.col("o_orderdate") < cutoff), "fact1")
    dim1 = stage(c.filter(F.col("c_custkey") % _MTP_DIM_MOD == 0), "dim1")
    _txn_publish(txn_dir, 1, {"fact": fact1, "dim": dim1})

    def read_table(name: str) -> DataFrame:
        _, tables = _txn_head_tables(txn_dir)
        return spark.read.parquet(*tables[name])

    digest = [
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("cents"),
    ]
    t1_fact = read_table("fact").agg(*digest).collect()[0]
    t1_dim_n = read_table("dim").count()

    # txn2 attempt #1: stage the fact delta, then DIE before the dim
    # staging and before the txn commit
    def publish_txn2(crash_after_fact: bool) -> None:
        fact2 = stage(o.filter(F.col("o_orderdate") >= cutoff), "fact2")
        if crash_after_fact:
            raise _InjectedCrash("publisher died after staging the fact")
        dim2 = stage(
            c.filter(F.col("c_custkey") % _MTP_DIM_MOD != 0), "dim2"
        )
        _txn_publish(
            txn_dir, 2, {"fact": fact1 + fact2, "dim": dim1 + dim2}
        )

    crashed = False
    try:
        publish_txn2(crash_after_fact=True)
    except _InjectedCrash:
        crashed = True
    if not crashed:
        raise RuntimeError("crash injection did not fire")

    # THE proof: after the crash, readers see the OLD state of BOTH
    # tables — head is still txn1, the staged fact2 files exist on disk
    # but no manifest references them
    head_after_crash, tables_after_crash = _txn_head_tables(txn_dir)
    if head_after_crash != 1:
        raise RuntimeError(
            f"crash leaked a txn: head {head_after_crash}, wanted 1"
        )
    staged_fact2 = _data_files_of(os.path.join(root, "fact2"))
    if not staged_fact2 or not all(os.path.exists(f) for f in staged_fact2):
        raise RuntimeError("fact2 staging must have completed pre-crash")
    referenced = set(tables_after_crash["fact"]) | set(
        tables_after_crash["dim"]
    )
    if referenced & set(staged_fact2):
        raise RuntimeError("crashed staging leaked into the visible txn")
    mid_fact = read_table("fact").agg(*digest).collect()[0]
    mid_dim_n = read_table("dim").count()
    if tuple(mid_fact) != tuple(t1_fact) or mid_dim_n != t1_dim_n:
        raise RuntimeError(
            "a reader between staging and commit saw a torn star: "
            f"{tuple(mid_fact)}/{mid_dim_n} vs {tuple(t1_fact)}/{t1_dim_n}"
        )

    # restart: re-stage idempotently, commit txn2 — both tables flip
    publish_txn2(crash_after_fact=False)
    head, _ = _txn_head_tables(txn_dir)
    if head != 2:
        raise RuntimeError(f"txn2 did not publish: head {head}")

    fact = read_table("fact")
    dim = read_table("dim")
    return (
        fact.join(dim, fact.o_custkey == dim.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("cents").cast("long").alias("cents"),
        )
        .select(
            F.lit(head).cast("int").alias("txn_head"),
            F.lit(True).alias("crash_left_both_invisible"),
            "c_mktsegment",
            "n_rows",
            "cents",
        )
        .orderBy("c_mktsegment")
    )


# --- rewrite vs concurrent-delete race (the validation Iceberg's
# rewrite_data_files runs at commit time: a tombstone landing AFTER the
# rewrite planned would be sequence-scoped OFF the rewritten files —
# committing blindly resurrects the deleted rows) ---

_RDR_EQ1 = 4  # tombstone known at rewrite plan time: o_orderkey % 10 == 4
_RDR_EQ2 = 6  # the RACER's tombstone, landed mid-rewrite: % 10 == 6


def _commit_rewrite(
    log_dir: str,
    add_files: list[str],
    remove_files: list[str],
    planned_at: int,
) -> tuple[int, int]:
    """Commit a rewrite PLANNED AT snapshot ``planned_at``, validating
    the race every delete-applying compaction must check: if any commit
    AFTER planned_at added a delete-class file, that delete applies (by
    the strictly-lower-sequence rule) to the data files this rewrite is
    replacing — but NOT to their replacements, whose sequence is higher.
    Committing anyway would silently RESURRECT the racer's deleted rows
    inside the clean files, so the only safe outcome is
    ``CommitConflict`` and a re-plan from the new head (Iceberg's
    rewrite_data_files surfaces the same condition as 'found new delete
    for replaced data file'). The check is KB manifest arithmetic —
    never a data read.

    The validation runs INSIDE the CAS-retry loop: a validate-once-
    then-delegate shape would re-validate nothing after losing the CAS,
    re-opening the exact window this helper closes (a tombstone landing
    between the check and the retried publish)."""
    seg = f"{os.sep}{_MOR_DELETE_CLASS}{os.sep}"
    removes = set(remove_files)
    retries = 0
    while True:
        versions = _log_versions(log_dir)
        head = versions[-1] if versions else 0
        # validate EVERY commit between plan and the CURRENT head — on
        # a retry the window re-extends to the rebased head, so a
        # tombstone landing between a lost CAS and the retried publish
        # is still caught
        for v in range(planned_at + 1, head + 1):
            added = set(_read_manifest(log_dir, v)["files"]) - set(
                _read_manifest(log_dir, v - 1)["files"]
            )
            new_dels = sorted(p for p in added if seg in p)
            if new_dels:
                raise CommitConflict(
                    f"new delete file(s) landed at v{v} after the rewrite "
                    f"planned at v{planned_at}: {new_dels} — committing "
                    "would resurrect their rows; re-plan from the head"
                )
        parent = _read_manifest(log_dir, head)["files"] if head else []
        if removes and not removes <= set(parent):
            raise CommitConflict(
                f"removed files not in head v{head}: "
                f"{sorted(removes - set(parent))}"
            )
        files = [f for f in parent if f not in removes] + list(add_files)
        if _try_publish(log_dir, head + 1, files, extra={"op": "rewrite"}):
            return head + 1, retries
        retries += 1
        if retries >= 50:
            raise RuntimeError(f"rewrite lost the CAS 50 times in {log_dir}")


@query(
    "sink_rewrite_delete_race",
    oracle=f"""
    SELECT TRUE AS race_detected, TRUE AS blind_commit_would_resurrect,
           CAST(4 AS INT) AS n_snapshots,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents,
           CAST(sum(o_orderkey) AS BIGINT) AS keysum
    FROM orders
    WHERE o_orderkey % 10 NOT IN ({_RDR_EQ1}, {_RDR_EQ2})
    """,
)
def sink_rewrite_delete_race(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REWRITE vs CONCURRENT DELETE — the writer race
    `sink_rewrite_data_files` opens and the commit-time validation that
    closes it. The base remove/add protocol (`_commit_snapshot`) only
    conflicts when a racer REMOVED the rewriter's inputs; a racer that
    ADDS an equality tombstone mid-rewrite passes that check — the
    tombstone survives the rebase — but the strictly-lower-sequence
    rule then scopes it OFF the rewritten files (their sequence is
    higher), so a blind commit silently RESURRECTS the racer's deleted
    rows. This key drives the full race: a rewrite plans at v2
    (applying the known tombstone), the racer lands a second tombstone
    at v3, the rewrite's commit is REFUSED (`CommitConflict`, asserted
    raised), the counterfactual corruption is measured (the staged
    clean files really do contain exactly the racer's deleted rows —
    asserted row-count-exact), and the re-planned rewrite from the v3
    head commits clean at v4. Final head: zero delete files, digest
    equal to the doubly-filtered base.

    Scale: the validation walks the KB manifests between plan and
    commit looking for added delete-class files — O(commits × files)
    driver-side metadata, no data read; the cost of losing the race is
    re-planning the rewrite, never corruption."""
    root = _scratch(sf_dir, "rdr_table")
    log_dir = os.path.join(root, "log")
    data_dir = os.path.join(root, "data")
    t1_dir = os.path.join(root, _MOR_DELETE_CLASS, "t1")
    t2_dir = os.path.join(root, _MOR_DELETE_CLASS, "t2")
    stale_dir = os.path.join(root, "stale_rewrite")
    clean_dir = os.path.join(root, "clean_rewrite")
    os.makedirs(log_dir, exist_ok=True)
    for v in os.listdir(log_dir):
        os.unlink(os.path.join(log_dir, v))

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    o.repartition(4, "o_orderkey").write.mode("overwrite").parquet(data_dir)
    base_files = _data_files_of(data_dir)
    _commit_snapshot(log_dir, base_files)  # v1

    def land_tombstone(mod: int, d: str) -> list[str]:
        (
            spark.read.parquet(*base_files)
            .filter(F.col("o_orderkey") % 10 == mod)
            .select("o_orderkey")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(d)
        )
        files = _data_files_of(d)
        _commit_snapshot(log_dir, files, extra={"op": "mor-delete"})
        return files

    t1 = land_tombstone(_RDR_EQ1, t1_dir)  # v2

    # the rewrite PLANS at v2: apply the known tombstone, stage clean files
    planned_at = _log_versions(log_dir)[-1]
    head_at_plan = _read_manifest(log_dir, planned_at)["files"]
    keys1 = spark.read.parquet(*t1).select("o_orderkey")
    (
        spark.read.parquet(*base_files)
        .join(F.broadcast(keys1), "o_orderkey", "left_anti")
        .coalesce(2)
        .write.mode("overwrite")
        .parquet(stale_dir)
    )

    t2 = land_tombstone(_RDR_EQ2, t2_dir)  # v3: THE RACER

    # the rewrite tries to commit its stale plan: must be refused
    race_detected = False
    try:
        _commit_rewrite(
            log_dir,
            _data_files_of(stale_dir),
            remove_files=head_at_plan,
            planned_at=planned_at,
        )
    except CommitConflict:
        race_detected = True
    if not race_detected:
        raise RuntimeError(
            "stale rewrite committed over the racer's tombstone — "
            "its rows just resurrected"
        )

    # measure the counterfactual: the staged files DO contain exactly
    # the racer's deleted rows (what a blind commit would resurrect)
    resurrect = (
        spark.read.parquet(*_data_files_of(stale_dir))
        .filter(F.col("o_orderkey") % 10 == _RDR_EQ2)
        .count()
    )
    racer_rows = spark.read.parquet(*t2).count()
    if resurrect != racer_rows or racer_rows == 0:
        raise RuntimeError(
            f"counterfactual mismatch: staged files hold {resurrect} "
            f"racer rows, tombstone masks {racer_rows}"
        )

    # re-plan from the new head and commit clean
    replanned_at = _log_versions(log_dir)[-1]
    head_now = _read_manifest(log_dir, replanned_at)["files"]
    keys12 = spark.read.parquet(*t1, *t2).select("o_orderkey")
    (
        spark.read.parquet(*base_files)
        .join(F.broadcast(keys12), "o_orderkey", "left_anti")
        .coalesce(2)
        .write.mode("overwrite")
        .parquet(clean_dir)
    )
    _commit_rewrite(
        log_dir,
        _data_files_of(clean_dir),
        remove_files=head_now,
        planned_at=replanned_at,
    )  # v4: the clean, re-planned rewrite

    versions = _log_versions(log_dir)
    if versions != [1, 2, 3, 4]:
        raise RuntimeError(f"log not linear: {versions}")
    head_files = _read_manifest(log_dir, 4)["files"]
    _, dels = _split_head_files(head_files)
    if dels:
        raise RuntimeError(f"re-planned rewrite left tombstones: {dels}")

    return spark.read.parquet(*head_files).agg(
        F.lit(True).alias("race_detected"),
        F.lit(True).alias("blind_commit_would_resurrect"),
        F.lit(len(versions)).cast("int").alias("n_snapshots"),
        F.count("*").cast("long").alias("n_rows"),
        F.sum("cents").cast("long").alias("cents"),
        F.sum("o_orderkey").cast("long").alias("keysum"),
    )


# --- racing multi-table transactions: the CAS loser rebases
# disjoint-table updates, aborts on same-table overlap ---


def _txn_commit(
    txn_dir: str, updates: dict, read_at: int, max_attempts: int = 50
) -> tuple[int, int, int]:
    """Commit ``updates`` ({table -> new file list}) against the txn
    root with optimistic rebase — the multi-table generalization of
    `_commit_snapshot`'s loop: read the head, overlay ONLY the tables
    this txn writes, CAS; on loss re-read and retry. The one genuine
    conflict: the head's version of a written table CHANGED since this
    txn read it (``read_at``) — a blind overlay would silently drop
    the racer's update to the same table, so the loser must abort and
    re-plan (Iceberg/Delta surface the same per-table check via
    validation snapshots). Disjoint-table racers always merge. Returns
    (version, n_retries, n_validations)."""
    retries = 0
    while True:
        versions = _log_versions(txn_dir)
        head = versions[-1] if versions else 0
        head_tables = (
            dict(_read_manifest(txn_dir, head)["tables"]) if head else {}
        )
        base_tables = (
            _read_manifest(txn_dir, read_at)["tables"] if read_at else {}
        )
        for t in updates:
            if head_tables.get(t) != base_tables.get(t):
                raise CommitConflict(
                    f"table {t!r} changed between read_at v{read_at} and "
                    f"head v{head} — same-table race, re-plan required"
                )
        merged = {**head_tables, **updates}
        if _try_publish(txn_dir, head + 1, [], extra={"tables": merged}):
            return head + 1, retries, len(updates)
        retries += 1
        if retries >= max_attempts:
            raise RuntimeError(
                f"txn lost the CAS {max_attempts} times in {txn_dir}"
            )


@query(
    "sink_multi_table_conflict",
    oracle=f"""
    SELECT CAST(3 AS INT) AS txn_head, TRUE AS loser_rebased,
           TRUE AS same_table_racer_aborts,
           CAST((SELECT count(*) FROM orders) AS BIGINT) AS fact_rows,
           CAST((SELECT count(*) FROM customer) AS BIGINT) AS dim_rows,
           CAST((SELECT sum(CAST(round(o_totalprice * 100) AS BIGINT))
                 FROM orders) AS BIGINT) AS fact_cents
    """,
)
def sink_multi_table_conflict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RACING MULTI-TABLE TRANSACTIONS — the concurrency half of
    `sink_multi_table_publish` (the single-table twin is
    `sink_concurrent_commit`): two publishers read the same head; A
    appends to the FACT, B appends to the DIM. A wins the CAS; B's
    retry must REBASE — overlay only the tables B writes onto A's new
    head, so A's fact update survives (a naive 'replace the whole
    tables map' would silently drop it: the lost update). The one
    genuine conflict is SAME-TABLE: a third publisher C that also read
    the old head and writes the FACT must abort with CommitConflict
    (its base version of the fact changed under it — blind overlay
    would drop A's files), asserted on the negative path.

    Asserted in-key: B's STALE publish (at the version B believed was
    next) genuinely loses the CAS to A (the race really happened), B's
    rebased commit lands at v3 with the final head carrying BOTH A's
    fact files and B's dim files, C raises with the head unmoved, and
    the head digest equals the complete star.

    Scale: rebase cost is a KB manifest re-read per retry; the
    same-table validation is one list equality per written table —
    the commit critical section never touches data."""
    root = _scratch(sf_dir, "mtc_txn")
    txn_dir = os.path.join(root, "txnlog")
    os.makedirs(txn_dir, exist_ok=True)
    for v in os.listdir(txn_dir):
        os.unlink(os.path.join(txn_dir, v))

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cutoff = F.lit(_MTP_CUTOFF).cast("date")

    def stage(df: DataFrame, name: str) -> list[str]:
        d = os.path.join(root, name)
        df.repartition(2).write.mode("overwrite").parquet(d)
        return _data_files_of(d)

    fact1 = stage(o.filter(F.col("o_orderdate") < cutoff), "fact1")
    dim1 = stage(
        c.filter(F.col("c_custkey") % _MTP_DIM_MOD == 0), "dim1"
    )
    v1, _, _ = _txn_commit(
        txn_dir, {"fact": fact1, "dim": dim1}, read_at=0
    )

    # A and B both read head v1, stage disjoint-table updates
    fact2 = stage(o.filter(F.col("o_orderdate") >= cutoff), "fact2_A")
    dim2 = stage(
        c.filter(F.col("c_custkey") % _MTP_DIM_MOD != 0), "dim2_B"
    )
    # A commits first (wins)
    v2, a_retries, _ = _txn_commit(
        txn_dir, {"fact": fact1 + fact2}, read_at=v1
    )
    if (v2, a_retries) != (2, 0):
        raise RuntimeError(f"A should win cleanly: v{v2}, {a_retries} retries")
    # B commits against its STALE read — simulate the interleave by
    # attempting the publish at the version B believes is next (2),
    # losing the CAS to A, and rebasing onto A's head
    b_lost_cas = not _try_publish(
        txn_dir, 2, [], extra={"tables": {"fact": fact1, "dim": dim1 + dim2}}
    )
    if not b_lost_cas:
        raise RuntimeError("B's stale publish must lose the CAS to A")
    v3, _, _ = _txn_commit(txn_dir, {"dim": dim1 + dim2}, read_at=v1)
    if v3 != 3:
        raise RuntimeError(f"B's rebase landed at v{v3}, wanted 3")

    # the rebase preserved A's update: head carries BOTH
    head, tables = _txn_head_tables(txn_dir)
    if sorted(tables["fact"]) != sorted(fact1 + fact2):
        raise RuntimeError("B's rebase dropped A's fact update — lost update")
    if sorted(tables["dim"]) != sorted(dim1 + dim2):
        raise RuntimeError("B's own dim update missing from the head")

    # the negative path: C also read v1 and writes the FACT — same-table
    # race, must abort (blind overlay would drop A's files)
    fact_c = stage(
        o.filter(F.col("o_orderdate") >= cutoff).limit(10), "fact2_C"
    )
    c_aborted = False
    try:
        _txn_commit(txn_dir, {"fact": fact1 + fact_c}, read_at=v1)
    except CommitConflict:
        c_aborted = True
    if not c_aborted:
        raise RuntimeError(
            "same-table racer committed over A's update — lost update"
        )
    head2, _ = _txn_head_tables(txn_dir)
    if head2 != 3:
        raise RuntimeError(f"aborted txn moved the head to v{head2}")

    fact = spark.read.parquet(*tables["fact"])
    dim = spark.read.parquet(*tables["dim"])
    return fact.agg(
        F.lit(head).cast("int").alias("txn_head"),
        F.lit(True).alias("loser_rebased"),
        F.lit(True).alias("same_table_racer_aborts"),
        F.count("*").cast("long").alias("fact_rows"),
        F.lit(dim.count()).cast("long").alias("dim_rows"),
        F.sum("cents").cast("long").alias("fact_cents"),
    )


# --- vacuum for the transaction root: collect expired-txn files and
# crash-orphaned stagings across ALL tables in one sweep ---

_MTV_RETAIN = 2  # retained txn window: last N


@query(
    "sink_multi_table_vacuum",
    oracle=f"""
    SELECT CAST(3 AS INT) AS txn_head,
           CAST(2 AS INT) AS n_collected_expired,
           CAST(2 AS INT) AS n_collected_orphans,
           TRUE AS survivors_intact,
           CAST((SELECT count(*) FROM orders) AS BIGINT) AS fact_rows,
           CAST((SELECT count(*) FROM customer) AS BIGINT) AS dim_rows,
           CAST((SELECT sum(CAST(round(o_totalprice * 100) AS BIGINT))
                 FROM orders) AS BIGINT) AS fact_cents
    """,
)
def sink_multi_table_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VACUUM FOR THE TRANSACTION ROOT — the harvest
    `sink_multi_table_publish`'s crash proof promises: a multi-table
    deployment accumulates two garbage classes, (a) files referenced
    ONLY by txn versions outside the retention window and (b) staged
    files a crashed publisher left referenced by NO txn at all. One
    sweep collects both: the live set is the union of every table's
    file list across the retained txn window (last {_MTV_RETAIN} — KB
    manifest arithmetic across ALL tables at once, never a data read),
    candidates are the files under the root's staging dirs, and
    candidate − live is collected.

    History: txn1 (fact slice + REPLACEABLE dim build), a CRASHED
    publisher staging (never referenced), txn2 (fact grows; the dim is
    REWRITTEN — txn1's dim files now live only in txn1), txn3 (fact
    append). Retention = last {_MTV_RETAIN} ⇒ txn1 expires: the
    collected set is asserted to be EXACTLY txn1's replaced dim files
    (expired class) plus the crashed staging (orphan class), both
    verified gone from disk; every file of the retained txns survives
    byte-identically (head digest equal pre/post, asserted before the
    oracle sees it); time travel INSIDE the window still works.

    Scale: cost is |retained manifests| KB reads + one directory
    listing of the staging root + unlink(2) per garbage file —
    independent of table size; at 100 TB the sweep parallelizes per
    staging prefix and the live-set arithmetic stays on the driver
    (Iceberg's expire_snapshots + remove_orphan_files pair, unified
    by the txn root into one consistent sweep across every table)."""
    root = _scratch(sf_dir, "mtv_txn")
    txn_dir = os.path.join(root, "txnlog")
    os.makedirs(txn_dir, exist_ok=True)
    for v in os.listdir(txn_dir):
        os.unlink(os.path.join(txn_dir, v))

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cutoff = F.lit(_MTP_CUTOFF).cast("date")

    def stage(df: DataFrame, name: str, pinned: int | None = None) -> list[str]:
        d = os.path.join(root, "staging", name)
        df.repartition(2).write.mode("overwrite").parquet(d)
        files = _data_files_of(d)
        # LOUD layout guard (r11 ADVICE): for the stagings whose FILE
        # COUNT the oracle pins (dim_v1 -> n_collected_expired, the
        # crashed staging -> n_collected_orphans), repartition(2) must
        # land exactly 2 non-empty partitions — Spark writes files only
        # for non-empty partitions, so an empty partition would surface
        # as an opaque oracle hash mismatch instead of this layout
        # error. (fact slices are NOT pinned: at small SFs a date slice
        # can be legitimately empty — sf0.01's orders all post-date the
        # cutoff — and the oracle derives fact numbers from row
        # digests, not file counts.)
        if pinned is not None and len(files) != pinned:
            raise RuntimeError(
                f"staging layout assumption broken: {name} produced "
                f"{len(files)} parquet files, oracle pins {pinned}"
            )
        return files

    # txn1: fact slice + the dim build that txn2 will REPLACE
    fact1 = stage(o.filter(F.col("o_orderdate") < cutoff), "fact1")
    dim_v1 = stage(c.filter(F.col("c_custkey") % 2 == 0), "dim_v1", pinned=2)
    _txn_publish(txn_dir, 1, {"fact": fact1, "dim": dim_v1})

    # a publisher stages and CRASHES: referenced by no txn, ever
    orphan = stage(
        o.filter(F.col("o_orderdate") >= cutoff), "fact2_crash", pinned=2
    )

    # txn2: fact grows (fresh staging), dim REWRITTEN in full
    fact2 = stage(o.filter(F.col("o_orderdate") >= cutoff), "fact2")
    dim_v2 = stage(c, "dim_v2")
    _txn_publish(txn_dir, 2, {"fact": fact1 + fact2, "dim": dim_v2})

    # txn3: a fact append (re-keyed slice, lands after the head probe)
    fact3 = stage(
        o.filter(F.col("o_orderkey") % 1000 == 13).select(
            (F.col("o_orderkey") + F.lit(3_000_000_000)).alias("o_orderkey"),
            F.lit(None).cast("date").alias("o_orderdate"),
            "cents",
        ),
        "fact3",
    )
    _txn_publish(
        txn_dir, 3, {"fact": fact1 + fact2 + fact3, "dim": dim_v2}
    )

    head, tables = _txn_head_tables(txn_dir)
    digest = [
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("cents"),
    ]
    pre_fact = (
        spark.read.parquet(*tables["fact"]).agg(*digest).collect()[0]
    )

    # ---- THE VACUUM ----
    versions = _log_versions(txn_dir)
    retained = versions[-_MTV_RETAIN:]
    live: set = set()
    for v in retained:
        for fl in _read_manifest(txn_dir, v)["tables"].values():
            live |= set(fl)
    staging_root = os.path.join(root, "staging")
    candidates = sorted(
        os.path.join(dp, f)
        for dp, _, fs in os.walk(staging_root)
        for f in fs
        if f.endswith(".parquet")
    )
    garbage = [f for f in candidates if f not in live]
    expected = sorted(set(dim_v1) | set(orphan))
    if sorted(garbage) != expected:
        raise RuntimeError(
            f"vacuum live-set arithmetic wrong: would collect "
            f"{sorted(garbage)}, expected {expected}"
        )
    for f in garbage:
        os.unlink(f)

    if not all(os.path.exists(f) for f in live):
        raise RuntimeError("vacuum collected a live file")
    if any(os.path.exists(f) for f in garbage):
        raise RuntimeError("collected files still on disk")
    post_fact = (
        spark.read.parquet(*tables["fact"]).agg(*digest).collect()[0]
    )
    if tuple(pre_fact) != tuple(post_fact):
        raise RuntimeError(
            f"head digest changed across vacuum: {tuple(pre_fact)} vs "
            f"{tuple(post_fact)}"
        )
    # time travel inside the window still works; outside is collected
    spark.read.parquet(
        *_read_manifest(txn_dir, retained[0])["tables"]["dim"]
    ).count()

    # the oracle pins the FULL star at txn2's completeness: fact =
    # all orders (fact3 is the re-keyed extra slice, excluded by
    # filtering to real keys), dim = all customers
    fact = spark.read.parquet(*tables["fact"]).filter(
        F.col("o_orderkey") < 3_000_000_000
    )
    dim = spark.read.parquet(*tables["dim"])
    return fact.agg(
        F.lit(head).cast("int").alias("txn_head"),
        F.lit(len(set(dim_v1))).cast("int").alias("n_collected_expired"),
        F.lit(len(set(orphan))).cast("int").alias("n_collected_orphans"),
        F.lit(True).alias("survivors_intact"),
        F.count("*").cast("long").alias("fact_rows"),
        F.lit(dim.count()).cast("long").alias("dim_rows"),
        F.sum("cents").cast("long").alias("fact_cents"),
    )


# --- transaction-root checkpointing + AS-OF (r12: the r11 verdict's
# ask #4 — `scan_log_checkpoint`'s O(tail) resolution ported to the
# multi-table txn root, plus AS-OF-txn reads of the consistent star) ---

_TXC_N = 12  # txn count
_TXC_CKPTS = (5, 10)  # checkpoint cadence: every 5 txns
_TXC_ASOF = 8  # the AS-OF probe: resolves via ckpt-5 + 3 tail deltas
_TXC_DIM_AT = {1: 0, 6: 1, 11: 2}  # txn -> dim slice (c_custkey % 3)

# The delta-form txn root's checkpoint file conventions are OWNED here
# (scan_txn_checkpoint writes them; the r13 checkpoint-aware feed in
# streaming.py resolves through them — shared names, never re-derived)
_TXN_CKPT_POINTER = "_last_checkpoint"


def _txn_ckpt_path(txn_dir: str, at: int) -> str:
    return os.path.join(txn_dir, f"ckpt-v{at}.json")


def _txn_delta_merge(state: dict, adds: dict) -> None:
    """Fold one delta-form txn manifest's per-table adds into a
    cumulative {table -> set(files)} state."""
    for t, fl in adds.items():
        state.setdefault(t, set()).update(fl)


def _txn_write_checkpoint(txn_dir: str, at: int) -> None:
    """Materialize the cumulative {table -> files} map at txn ``at``
    (the checkpointer pays the genesis walk ONCE) as a put-if-absent
    checkpoint file, then advance the `_last_checkpoint` pointer via
    os.replace — racing checkpointers write identical bytes, so the
    link(2) collision is benign."""
    import json

    state: dict = {}
    for v in range(1, at + 1):
        with open(os.path.join(txn_dir, f"v{v}.json")) as fh:
            _txn_delta_merge(state, json.load(fh)["table_adds"])
    tmp = os.path.join(txn_dir, f".ckpt-tmp-{os.getpid()}")
    with open(tmp, "w") as fh:
        json.dump(
            {
                "version": at,
                "tables": {t: sorted(fl) for t, fl in state.items()},
            },
            fh,
        )
    try:
        os.link(tmp, _txn_ckpt_path(txn_dir, at))
    except FileExistsError:
        pass  # racing checkpointers write identical bytes
    finally:
        os.unlink(tmp)
    ptmp = os.path.join(txn_dir, f".lastckpt-tmp-{os.getpid()}")
    with open(ptmp, "w") as fh:
        fh.write(str(at))
    os.replace(ptmp, os.path.join(txn_dir, _TXN_CKPT_POINTER))


@query(
    "scan_txn_checkpoint",
    oracle=f"""
    SELECT CAST({_TXC_N} AS INT) AS n_txns,
           CAST({_TXC_CKPTS[-1]} AS INT) AS checkpoint_version,
           CAST({_TXC_N - _TXC_CKPTS[-1]} AS INT) AS head_manifests_read,
           CAST({_TXC_ASOF} AS INT) AS asof_txn,
           CAST({_TXC_ASOF - _TXC_CKPTS[0]} AS INT) AS asof_manifests_read,
           TRUE AS matches_full_replay,
           CAST((SELECT count(*) FROM orders) AS BIGINT) AS head_fact_rows,
           CAST((SELECT sum(CAST(round(o_totalprice * 100) AS BIGINT))
                 FROM orders) AS BIGINT) AS head_fact_cents,
           CAST((SELECT count(*) FROM orders
                 WHERE o_orderkey % {_TXC_N} < {_TXC_ASOF}) AS BIGINT)
             AS asof_fact_rows,
           CAST((SELECT sum(CAST(round(o_totalprice * 100) AS BIGINT))
                 FROM orders
                 WHERE o_orderkey % {_TXC_N} < {_TXC_ASOF}) AS BIGINT)
             AS asof_fact_cents,
           CAST((SELECT count(*) FROM customer
                 WHERE c_custkey % 3 < 2) AS BIGINT) AS asof_dim_rows
    """,
)
def scan_txn_checkpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRANSACTION-ROOT CHECKPOINTING + AS-OF (the r11 verdict's ask #4
    — `scan_log_checkpoint`'s O(tail) head resolution ported to the
    multi-table txn root). This root's manifests are DELTA-FORM: each
    txn records only its PER-TABLE ADDS (the Delta actions-log shape
    generalized across tables — the absolute-map form of `_txn_commit`
    makes the head manifest self-sufficient and checkpoints moot, which
    is exactly why a delta-form root needs them). Resolving any state
    therefore means replaying every txn since genesis — O(commits)
    manifest opens at a commit a minute — until a CHECKPOINT
    materializes the cumulative {{table -> files}} map. Checkpoints
    land every {_TXC_CKPTS[1] - _TXC_CKPTS[0]} txns (derived data,
    put-if-absent link so racing checkpointers collide benignly; the
    `_last_checkpoint` pointer advances via os.replace).

    Hard-asserted by COUNTING ACTUAL OPENS (the `scan_log_checkpoint`
    discipline): the head reader opens exactly the pointer, checkpoint
    v{_TXC_CKPTS[1]}, and the {_TXC_N - _TXC_CKPTS[1]} tail deltas; the
    AS-OF-txn-{_TXC_ASOF} reader picks the newest checkpoint ≤ the
    target (v{_TXC_CKPTS[0]}) and opens exactly the
    {_TXC_ASOF - _TXC_CKPTS[0]} deltas between them — never the
    genesis walk. Both resolutions are asserted identical to the full
    replay per table before any digest is taken, and the AS-OF state
    is CONSISTENT BY CONSTRUCTION: both tables come from the same
    manifest chain cut at txn {_TXC_ASOF} (fact holds exactly slices
    0..{_TXC_ASOF - 1}, dim its txn-{_TXC_ASOF} generation — pinned by
    the oracle digest of BOTH tables at k).

    Scale: head resolution drops from O(txns) to O(txns since last
    checkpoint) and AS-OF to O(distance to the nearest older
    checkpoint) — the time-travel cost model real formats publish;
    checkpoints are KB-per-thousand-files metadata on a fixed cadence,
    a cache and never the truth (every delta manifest stays)."""
    import json

    root = _scratch(sf_dir, "txn_checkpoint_root")
    txn_dir = os.path.join(root, "txnlog")
    os.makedirs(txn_dir, exist_ok=True)
    for v in os.listdir(txn_dir):
        os.unlink(os.path.join(txn_dir, v))

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")

    _merge = _txn_delta_merge

    def _replay(upto: int, opened: list) -> dict:
        """Union of per-table add-deltas txn 1..upto — the
        no-checkpoint reader."""
        state: dict = {}
        for v in range(1, upto + 1):
            path = os.path.join(txn_dir, f"v{v}.json")
            opened.append(path)
            with open(path) as fh:
                _merge(state, json.load(fh)["table_adds"])
        return state

    _write_ckpt = functools.partial(_txn_write_checkpoint, txn_dir)

    # the history: every txn appends a fact slice; txns 1/6/11 also
    # advance the dim — both tables always land through ONE manifest
    for i in range(_TXC_N):
        txn = i + 1
        d = os.path.join(root, f"fact{txn:02d}")
        (
            o.filter(F.col("o_orderkey") % _TXC_N == i)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(d)
        )
        adds = {"fact": _data_files_of(d)}
        if txn in _TXC_DIM_AT:
            dd = os.path.join(root, f"dim{txn:02d}")
            (
                c.filter(F.col("c_custkey") % 3 == _TXC_DIM_AT[txn])
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(dd)
            )
            adds["dim"] = _data_files_of(dd)
        if not _try_publish(txn_dir, txn, [], extra={"table_adds": adds}):
            raise RuntimeError(f"single-writer CAS lost txn {txn}")
        if txn in _TXC_CKPTS:
            _write_ckpt(txn)

    def _ckpt_versions() -> list[int]:
        return sorted(
            int(f[6:-5])
            for f in os.listdir(txn_dir)
            if f.startswith("ckpt-v") and f.endswith(".json")
        )

    def _resolve(at: int) -> tuple[dict, int]:
        """State at txn ``at`` via the newest checkpoint ≤ at + tail
        deltas; returns (state, tail manifests opened)."""
        older = [v for v in _ckpt_versions() if v <= at]
        state: dict = {}
        base = 0
        if older:
            base = older[-1]
            with open(_txn_ckpt_path(txn_dir, base)) as fh:
                state = {
                    t: set(fl)
                    for t, fl in json.load(fh)["tables"].items()
                }
        opened: list = []
        for v in range(base + 1, at + 1):
            path = os.path.join(txn_dir, f"v{v}.json")
            opened.append(path)
            with open(path) as fh:
                _merge(state, json.load(fh)["table_adds"])
        return state, len(opened)

    # HEAD resolution: pointer -> newest checkpoint -> tail
    with open(os.path.join(txn_dir, _TXN_CKPT_POINTER)) as fh:
        ckpt_ver = int(fh.read())
    head_ver = _log_versions(txn_dir)[-1]
    head_state, head_reads = _resolve(head_ver)
    if head_reads != head_ver - ckpt_ver:
        raise RuntimeError(
            f"head opened {head_reads} tail manifests, expected "
            f"{head_ver - ckpt_ver}"
        )
    full_opens: list = []
    full = _replay(head_ver, full_opens)
    if len(full_opens) != _TXC_N:
        raise RuntimeError("full replay must open every manifest")
    if {t: sorted(fl) for t, fl in head_state.items()} != {
        t: sorted(fl) for t, fl in full.items()
    }:
        raise RuntimeError("checkpoint resolution diverged from replay")

    # AS-OF txn k: nearest older checkpoint + the deltas up to k
    asof_state, asof_reads = _resolve(_TXC_ASOF)
    if asof_reads != _TXC_ASOF - _TXC_CKPTS[0]:
        raise RuntimeError(
            f"AS-OF opened {asof_reads} tail manifests, expected "
            f"{_TXC_ASOF - _TXC_CKPTS[0]}"
        )
    asof_full: dict = {}
    for v in range(1, _TXC_ASOF + 1):
        with open(os.path.join(txn_dir, f"v{v}.json")) as fh:
            _merge(asof_full, json.load(fh)["table_adds"])
    if {t: sorted(fl) for t, fl in asof_state.items()} != {
        t: sorted(fl) for t, fl in asof_full.items()
    }:
        raise RuntimeError("AS-OF resolution diverged from replay")

    digest = [
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("cents"),
    ]
    head_fact = (
        spark.read.parquet(*sorted(head_state["fact"]))
        .agg(*digest)
        .collect()[0]
    )
    asof_fact = (
        spark.read.parquet(*sorted(asof_state["fact"]))
        .agg(*digest)
        .collect()[0]
    )
    asof_dim_rows = (
        spark.read.parquet(*sorted(asof_state["dim"])).count()
    )

    return spark.range(1).select(
        F.lit(_TXC_N).cast("int").alias("n_txns"),
        F.lit(ckpt_ver).cast("int").alias("checkpoint_version"),
        F.lit(head_reads).cast("int").alias("head_manifests_read"),
        F.lit(_TXC_ASOF).cast("int").alias("asof_txn"),
        F.lit(asof_reads).cast("int").alias("asof_manifests_read"),
        F.lit(True).alias("matches_full_replay"),
        F.lit(head_fact["n"]).cast("long").alias("head_fact_rows"),
        F.lit(head_fact["cents"]).cast("long").alias("head_fact_cents"),
        F.lit(asof_fact["n"]).cast("long").alias("asof_fact_rows"),
        F.lit(asof_fact["cents"]).cast("long").alias("asof_fact_cents"),
        F.lit(asof_dim_rows).cast("long").alias("asof_dim_rows"),
    )


# --- partition evolution × compaction × feed (r12: the r11 verdict's
# ask #5 — does the maintenance rewrite preserve each generation's
# partition spec, and does the feed still stream zero events for it?) ---

_RPE_DEL = 6  # equality-tombstone predicate: o_orderkey % 10 == 6
_RPE_CUT = 1998  # layout-evolution boundary (sink_partition_evolution's)


@query(
    "sink_rewrite_partition_evolution",
    oracle=f"""
    WITH ev AS (
      SELECT o_orderkey, o_orderdate,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),
    live AS (SELECT * FROM ev WHERE NOT (o_orderkey % 10 = {_RPE_DEL}))
    SELECT TRUE AS spec_preserved, TRUE AS pruned_gen1,
           TRUE AS pruned_gen2, TRUE AS feed_zero_events,
           CAST((SELECT count(*) FROM live) AS BIGINT) AS head_rows,
           CAST((SELECT sum(cents) FROM live) AS BIGINT) AS head_cents,
           CAST((SELECT count(*) FROM live
                 WHERE o_orderdate >= TIMESTAMP '{_PE_LO}'
                   AND o_orderdate < TIMESTAMP '{_PE_HI}') AS BIGINT)
             AS window_rows,
           CAST((SELECT sum(cents) FROM live
                 WHERE o_orderdate >= TIMESTAMP '{_PE_LO}'
                   AND o_orderdate < TIMESTAMP '{_PE_HI}') AS BIGINT)
             AS window_cents
    """,
)
def sink_rewrite_partition_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTITION EVOLUTION × COMPACTION × FEED (the r11 verdict's ask
    #5 — the three proven pieces composed across one another's
    boundaries): a table whose layout evolved (gen 1 partitioned by
    YEAR, gen 2 by YEAR,QUARTER — `sink_partition_evolution`) then
    accumulated an equality tombstone masking rows of BOTH generations
    is compacted by the maintenance rewrite
    (`sink_rewrite_data_files`), and THREE contracts must survive:

    1. SPEC PRESERVATION: the rewrite applies the tombstone within
       each generation and lands every clean file under ITS OWN
       generation's spec (gen-1 files carry o_year= path segments
       only, gen-2 files o_year=/o_quarter= — asserted per post-head
       file; a rewrite that flattened both generations to one layout
       would destroy the spec-per-file contract evolution depends on).
    2. PRUNING STILL BITES ON BOTH GENERATIONS POST-COMPACTION: the
       {_PE_LO}..{_PE_HI} probe window plans a STRICT subset of each
       generation's files from manifest paths alone (the
       `sink_partition_evolution` probe re-run against the rewritten
       head), and the window digest is oracle-pinned so over-prune and
       under-filter both break the hash.
    3. THE FEED STREAMS ZERO EVENTS FOR THE COMPACTION: the MOR-aware
       CDF replays the full history (v1 gen-1 append, v2 the evolution
       append, v3 the cross-generation delete, v4 the rewrite) — the
       v4 commit contributes no events (op=rewrite awareness), and the
       signed replay equals the post-compaction head digest, asserted
       before the oracle sees a row.

    Scale: the rewrite is per-partition-per-generation (the unit a
    100 TB job schedules); spec preservation is free (the writer keys
    each generation's rewrite by its own spec columns); feed and
    pruning costs are unchanged KB-manifest planning."""
    import re
    import shutil

    root = _scratch(sf_dir, "rpe_table")
    shutil.rmtree(root, ignore_errors=True)
    log_dir = os.path.join(root, "log")
    gen1_dir = os.path.join(root, "gen1")
    gen2_dir = os.path.join(root, "gen2")
    eq_dir = os.path.join(root, _MOR_DELETE_CLASS, "eq")
    os.makedirs(log_dir, exist_ok=True)

    o = (
        load(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_orderdate",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .withColumn("o_year", F.year("o_orderdate"))
    )
    # r14 (guide §5: reused AND recomputed): the three staged writes
    # below (gen-1, gen-2, tombstone) each re-scanned orders through
    # this projection; one persisted frame now feeds all three.
    # Unpersisted right after v3 — the rewrites read the STAGED files.
    o.persist()

    def _tree_files(d: str) -> list[str]:
        return sorted(
            os.path.join(dp, f)
            for dp, _, fs in os.walk(d)
            for f in fs
            if f.endswith(".parquet")
        )

    # v1: generation 1 — partitioned by YEAR
    (
        o.filter(F.col("o_year") < _RPE_CUT)
        .repartition("o_year")
        .write.mode("overwrite")
        .partitionBy("o_year")
        .parquet(gen1_dir)
    )
    _commit_snapshot(
        log_dir, _tree_files(gen1_dir), extra={"spec": ["o_year"], "spec_id": 1}
    )

    # v2: THE EVOLUTION — generation 2 partitioned by (YEAR, QUARTER)
    (
        o.filter(F.col("o_year") >= _RPE_CUT)
        .withColumn("o_quarter", F.quarter("o_orderdate"))
        .repartition("o_year", "o_quarter")
        .write.mode("overwrite")
        .partitionBy("o_year", "o_quarter")
        .parquet(gen2_dir)
    )
    _commit_snapshot(
        log_dir,
        _tree_files(gen2_dir),
        extra={"spec": ["o_year", "o_quarter"], "spec_id": 2},
    )

    # v3: equality tombstone masking keys of BOTH generations
    (
        o.filter(F.col("o_orderkey") % 10 == _RPE_DEL)
        .select("o_orderkey")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(eq_dir)
    )
    _commit_snapshot(
        log_dir, _data_files_of(eq_dir), extra={"op": "mor-delete"}
    )
    o.unpersist()

    head_pre = _read_manifest(log_dir, _log_versions(log_dir)[-1])["files"]
    data_pre, dels_pre = _split_head_files(head_pre)
    tomb = spark.read.parquet(*dels_pre).select("o_orderkey")
    digest = [
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("cents"),
    ]

    # v4: THE REWRITE — per generation, under that generation's spec.
    # r14 (guide §1.2 step 1): the pre-compaction MOR digest used to be
    # its own full scan+anti-join job over data_pre; it now rides the
    # two rewrite writes as observed metrics over exactly the same
    # anti-join subtrees (per-generation counts/sums add up to the
    # former whole-head aggregate — exact integer arithmetic), so each
    # generation is read once. post_row below still reads the REWRITTEN
    # files back from disk, so the preserved-content assert keeps its
    # independent evidence.
    from pyspark.sql import Observation

    rw1 = os.path.join(root, "rw_gen1")
    rw2 = os.path.join(root, "rw_gen2")
    g1_files = [f for f in data_pre if f.startswith(gen1_dir)]
    g2_files = [f for f in data_pre if f.startswith(gen2_dir)]
    obs1, obs2 = Observation(), Observation()
    (
        spark.read.parquet(*g1_files)
        .join(F.broadcast(tomb), "o_orderkey", "left_anti")
        .observe(obs1, *digest)
        .withColumn("o_year", F.year("o_orderdate"))
        .repartition("o_year")
        .write.mode("overwrite")
        .partitionBy("o_year")
        .parquet(rw1)
    )
    (
        spark.read.parquet(*g2_files)
        .join(F.broadcast(tomb), "o_orderkey", "left_anti")
        .observe(obs2, *digest)
        .withColumn("o_year", F.year("o_orderdate"))
        .withColumn("o_quarter", F.quarter("o_orderdate"))
        .repartition("o_year", "o_quarter")
        .write.mode("overwrite")
        .partitionBy("o_year", "o_quarter")
        .parquet(rw2)
    )
    pre_row = (
        obs1.get["n"] + obs2.get["n"],
        obs1.get["cents"] + obs2.get["cents"],
    )
    _commit_snapshot(
        log_dir,
        _tree_files(rw1) + _tree_files(rw2),
        remove_files=head_pre,
        extra={"op": "rewrite", "specs": {"1": ["o_year"], "2": ["o_year", "o_quarter"]}},
    )

    head_post = _read_manifest(log_dir, _log_versions(log_dir)[-1])["files"]
    data_post, dels_post = _split_head_files(head_post)
    if dels_post:
        raise RuntimeError(f"rewrite left delete files live: {dels_post}")

    # 1. SPEC PRESERVATION, asserted per post-head file
    year_re = re.compile(rf"o_year=(\d+)\{os.sep}")
    quarter_re = re.compile(rf"o_quarter=(\d+)\{os.sep}")
    p1 = [f for f in data_post if f.startswith(rw1)]
    p2 = [f for f in data_post if f.startswith(rw2)]
    if not p1 or not p2 or set(p1) | set(p2) != set(data_post):
        raise RuntimeError("post head lost a generation")
    for f in p1:
        if not year_re.search(f) or quarter_re.search(f):
            raise RuntimeError(f"gen-1 spec broken by rewrite: {f}")
    for f in p2:
        if not year_re.search(f) or not quarter_re.search(f):
            raise RuntimeError(f"gen-2 spec broken by rewrite: {f}")

    post_row = spark.read.parquet(*data_post).agg(*digest).collect()[0]
    if tuple(pre_row) != tuple(post_row):
        raise RuntimeError(
            f"rewrite changed the MOR digest: {tuple(pre_row)} vs "
            f"{tuple(post_row)}"
        )

    # 2. PRUNING ON BOTH GENERATIONS, post-compaction, manifest-only
    lo_y, lo_q, hi_y, hi_q = 1997, 1, 1998, 2  # = _PE_LO .. _PE_HI

    def _planned(path: str) -> bool:
        y = int(year_re.search(path).group(1))
        qm = quarter_re.search(path)
        if qm is None:
            return lo_y <= y <= hi_y
        return (lo_y, lo_q) <= (y, int(qm.group(1))) <= (hi_y, hi_q)

    sel1 = [f for f in p1 if _planned(f)]
    sel2 = [f for f in p2 if _planned(f)]
    if not sel1 or len(sel1) >= len(p1):
        raise RuntimeError(f"gen-1 pruning did not bite: {len(sel1)}/{len(p1)}")
    if not sel2 or len(sel2) >= len(p2):
        raise RuntimeError(f"gen-2 pruning did not bite: {len(sel2)}/{len(p2)}")
    window = (
        spark.read.parquet(*sel1, *sel2)
        .filter(
            (F.col("o_orderdate") >= F.lit(_PE_LO).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(_PE_HI).cast("timestamp"))
        )
        .agg(*digest)
        .collect()[0]
    )

    # 3. THE FEED: zero events for the rewrite commit, replay == head
    from sparkgraft.streaming import _mor_cdf_datasource

    out = os.path.join(root, "feed_out")
    ckpt = os.path.join(root, "feed_ckpt")
    os.makedirs(out)
    spark.dataSource.register(_mor_cdf_datasource())

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out, f"b{batch_id:05d}")
        )

    q = (
        spark.readStream.format("sparkgraft_mor_cdf")
        .option("log_dir", log_dir)
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    feed = spark.read.parquet(os.path.join(out, "b*"))
    vs = {r["version"] for r in feed.select("version").distinct().collect()}
    if 4 in vs:
        raise RuntimeError("the rewrite commit streamed events")
    if vs != {1, 2, 3}:
        raise RuntimeError(f"feed saw versions {sorted(vs)}, wanted 1-3")
    sign = F.when(F.col("change_type") == "delete", -1).otherwise(1)
    net = feed.agg(
        F.sum(sign).cast("long").alias("n"),
        F.sum(sign * F.col("cents")).cast("long").alias("cents"),
    ).collect()[0]
    if (net["n"], net["cents"]) != (post_row["n"], post_row["cents"]):
        raise RuntimeError(
            f"signed feed replay diverged from compacted head: "
            f"{tuple(net)} vs {tuple(post_row)}"
        )

    return spark.range(1).select(
        F.lit(True).alias("spec_preserved"),
        F.lit(True).alias("pruned_gen1"),
        F.lit(True).alias("pruned_gen2"),
        F.lit(True).alias("feed_zero_events"),
        F.lit(post_row["n"]).cast("long").alias("head_rows"),
        F.lit(post_row["cents"]).cast("long").alias("head_cents"),
        F.lit(window["n"]).cast("long").alias("window_rows"),
        F.lit(window["cents"]).cast("long").alias("window_cents"),
    )
