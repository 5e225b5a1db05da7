"""Table catalog: explicit schemas for the ten driver tables.

Ground truth is FIXTURES.md (pyarrow inspection of the driver testdata).
Schemas are declared, never inferred — the driver's oracle compares result
schemas, so the engine must be deterministic about types from the scan up
(SURVEY.md §1.1). At 100 TB the same discipline avoids a schema-inference
pass over the whole dataset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TABLES: dict[str, T.StructType] = {
    "region": T.StructType([
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]),
    "nation": T.StructType([
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]),
    "customer": T.StructType([
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]),
    "supplier": T.StructType([
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]),
    "part": T.StructType([
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]),
    "orders": T.StructType([
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]),
    "lineitem": T.StructType([
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampType()),
    ]),
    "events": T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]),
    "documents": T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]),
    "embeddings": T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]),
}

# Dimension tables small enough to broadcast at ANY scale factor — region
# and nation are bounded by geography, not data volume, so broadcasting
# them is safe even at 100 TB fact-table scale.
BROADCAST_SAFE = frozenset({"region", "nation"})


def path_for(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one catalog table. Parquet scan + Catalyst gives predicate
    pushdown and column pruning downstream for free.

    ``events.ts`` is TIMESTAMP(NANOS) in parquet, which Spark's vectorized
    reader rejects outright; we read it as a nanos long (legacy conf) and
    convert to a µs timestamp. Integer division is mandatory — the nanos
    magnitude (~1.7e18) exceeds double's 2^53 exact range. Sub-µs bits are
    all zero in this corpus (verified), so the conversion is lossless.
    Trade-off noted for scale: ts predicates no longer push into the
    parquet scan; a production layout would partition by date instead.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; catalog has {sorted(TABLES)}")
    # The driver builds its own SparkSession (not session.get_session), so
    # pin timestamp semantics here on the query path: the DuckDB oracle
    # sees UTC-naive timestamps, and every date_trunc/window/cast must
    # render identically regardless of the host session's timezone.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        from pyspark.sql import functions as F

        # Spark builds differ in how they surface parquet TIMESTAMP(NANOS):
        # with the legacy conf honored the column reads as a nanos BIGINT;
        # newer readers return TIMESTAMP_NTZ (already µs-truncated). Branch
        # on the actual read dtype so both shapes land on the same µs
        # TimestampType the rest of the engine (and the DuckDB oracle's
        # UTC-naive view) expects.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path_for(sf_dir, name))
        ts_type = df.schema["ts"].dataType.typeName()
        if ts_type == "long":
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        if ts_type == "timestamp_ntz":
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path_for(sf_dir, name))


def register_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Create temp views named exactly like the oracle's pre-registered
    views, enabling the spark.sql entry path (SURVEY.md §3 entry point 3)."""
    for name in names or TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
