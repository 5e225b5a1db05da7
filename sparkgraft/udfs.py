"""UDF / UDAF / UDTF extension surface (SURVEY.md §2.10).

Policy: every relational operator in the engine is pure
``pyspark.sql.functions`` (Catalyst-optimizable, codegen-able). The
queries here exist to prove the *extension* path for logic Spark
genuinely cannot express — and they use only the Arrow-vectorized
variants (``pandas_udf`` / ``applyInPandas`` / cogrouped
``applyInPandas`` / ``mapInArrow`` / Python UDTF), never row-at-a-time
Python UDFs. Each mirrors its logic in plain SQL for the oracle, so the
UDF machinery itself (Arrow batch transfer, grouped-map schema contract,
co-grouped two-frame alignment, zero-copy RecordBatch crossing, lateral
UDTF expansion) is what's under test.

Scale posture: pandas UDFs stream Arrow batches per partition (no
driver-side collection); grouped-map state is bounded by the largest
single group, so group keys are chosen with bounded cardinality domains
(returnflag, orderpriority) whose per-group size grows linearly and
spills via Arrow chunking.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from sparkgraft.catalog import load, register_tables
from sparkgraft.registry import query

_TRIM_FRAC = 0.1


@query(
    "udf_scalar_arrow",
    oracle="""
    select case when l_discount < 0.03 then 'LOW'
                when l_discount < 0.07 then 'MID'
                else 'HIGH' end                         as band,
           count(*)                                     as n,
           round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue
    from lineitem
    group by 1
    """,
)
def udf_scalar_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF: label each line item with a discount
    band, then aggregate per band. The banding logic is mirrored in the
    oracle's CASE WHEN — what's verified is the Arrow scalar-UDF path."""

    @pandas_udf("string")
    def discount_band(d: pd.Series) -> pd.Series:
        out = pd.Series("HIGH", index=d.index, dtype="object")
        out[d < 0.07] = "MID"
        out[d < 0.03] = "LOW"
        return out

    li = load(spark, sf_dir, "lineitem")
    return (
        li.withColumn("band", discount_band("l_discount"))
        .groupBy("band")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


@query(
    "udf_grouped_agg",
    oracle=f"""
    with ranked as (
      select l_returnflag, l_extendedprice,
             row_number() over (partition by l_returnflag
                                order by l_extendedprice) as rn,
             count(*) over (partition by l_returnflag) as n
      from lineitem
    )
    select l_returnflag,
           round(avg(l_extendedprice), 4) as trimmed_mean
    from ranked
    where rn > floor(n * {_TRIM_FRAC}) and rn <= n - floor(n * {_TRIM_FRAC})
    group by l_returnflag
    """,
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom grouped aggregate (10% trimmed mean) as a grouped-agg pandas
    UDF — an aggregate Spark has no builtin for. Trimming by rank keeps
    the retained multiset deterministic even under ties, so the SQL twin
    (drop the bottom/top floor(n*0.1) by value rank) is exact."""

    @pandas_udf("double")
    def trimmed_mean(v: pd.Series) -> float:
        s = v.sort_values()
        k = int(len(s) * _TRIM_FRAC)
        kept = s.iloc[k : len(s) - k] if k > 0 else s
        return round(float(kept.mean()), 4)

    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        trimmed_mean("l_extendedprice").alias("trimmed_mean")
    )


@query(
    "udf_grouped_map",
    oracle="""
    select o_orderkey, o_orderpriority,
           round((o_totalprice
                  - avg(o_totalprice) over (partition by o_orderpriority))
                 / stddev_samp(o_totalprice) over (partition by o_orderpriority),
                 4) as z
    from orders
    """,
)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map transform via applyInPandas: z-score-normalize order
    totals within each priority class (the feature-normalization shape of
    a training-data pipeline). The oracle recomputes the same z-scores
    with window functions."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["o_totalprice"].mean()
        sd = pdf["o_totalprice"].std(ddof=1)
        return pd.DataFrame(
            {
                "o_orderkey": pdf["o_orderkey"],
                "o_orderpriority": pdf["o_orderpriority"],
                "z": ((pdf["o_totalprice"] - mu) / sd).round(4),
            }
        )

    orders = load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").applyInPandas(
        zscore, "o_orderkey long, o_orderpriority string, z double"
    )


@udtf(returnType="token: string, token_len: int")
class _SplitTokens:
    """Row→N generator: whitespace tokens with their lengths. The sample
    UDTF shape — real uses are parsers/chunkers that emit a variable
    number of typed rows per input row."""

    def eval(self, text: str):  # noqa: D102 — UDTF contract method
        for tok in (text or "").split(" "):
            if tok:
                yield tok, len(tok)


@query(
    "udtf_explode_custom",
    oracle="""
    select doc_id, t as token, length(t) as token_len
    from (select doc_id, unnest(string_split(text, ' ')) as t
          from documents)
    where length(t) > 0
    """,
)
def udtf_explode_custom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF applied laterally: one documents row expands to one row
    per token. The oracle is the unnest twin."""
    spark.udtf.register("sg_split_tokens", _SplitTokens)
    register_tables(spark, sf_dir, ["documents"])
    return spark.sql(
        """
        SELECT d.doc_id, t.token, t.token_len
        FROM documents d, LATERAL sg_split_tokens(d.text) t
        """
    )


@query(
    "udf_scalar_iter",
    oracle="""
    SELECT doc_id,
           round(1.0 / (1.0 + exp(-( (n_chars - 250.0) / 100.0 ))), 6)
             AS model_score
    FROM documents
    """,
)
def udf_scalar_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-of-batches pandas UDF — THE inference-UDF pattern for
    scoring 100 TB with an expensive model: the function body runs ONCE
    per partition, so model load / tokenizer init / session setup is
    amortized across every Arrow batch that partition streams, instead
    of being paid per batch (scalar UDF) or per row (classic UDF). The
    'model' here is a deterministic logistic on n_chars so the oracle
    can mirror it exactly; in production the np.exp line is where the
    real forward pass goes — the Spark-side contract (init placement,
    batch iteration, Arrow transfer) is identical."""
    import numpy as np

    @pandas_udf("double")
    def model_score(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # Expensive one-time init would go HERE (runs once per partition,
        # not per batch): load weights, build the tokenizer, open a
        # session. The constants stand in for loaded weights.
        mu, scale = 250.0, 100.0
        for n_chars in batches:
            z = (n_chars.astype("float64") - mu) / scale
            yield 1.0 / (1.0 + np.exp(-z))

    d = load(spark, sf_dir, "documents")
    # Round OUTSIDE the UDF with F.round (HALF_UP): pandas' .round is
    # IEEE half-even, which would diverge from the oracle's round() on an
    # exact 6th-decimal tie. Same rounding discipline as every operator.
    return d.select(
        "doc_id", F.round(model_score("n_chars"), 6).alias("model_score")
    )


@query(
    "udf_struct_return",
    oracle="""
    WITH s AS (
      SELECT o_orderkey,
             round(1.0 / (1.0 + exp(-((o_totalprice - 200000.0)
                                      / 100000.0))), 6) AS score
      FROM orders)
    SELECT o_orderkey, score,
           CASE WHEN score >= 0.75 THEN 'A'
                WHEN score >= 0.5  THEN 'B'
                ELSE 'C' END AS grade
    FROM s ORDER BY o_orderkey
    """,
)
def udf_struct_return(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct-returning vectorized pandas UDF — the 'model inference'
    shape where one Arrow pass emits several derived fields (score +
    grade) as a single struct column that is then unpacked natively.
    One batch crossing per row batch, no second UDF call for the second
    field. The sigmoid is computed in float64 NumPy — bit-identical to
    the engines' exp() — and the grade thresholds compare the ROUNDED
    score on both sides so a boundary landing cannot diverge."""
    import numpy as np

    @pandas_udf("struct<score: double, grade: string>")
    def score_struct(p: pd.Series) -> pd.DataFrame:
        score = (1.0 / (1.0 + np.exp(-((p - 200000.0) / 100000.0)))).round(6)
        grade = pd.Series("C", index=p.index, dtype="object")
        grade[score >= 0.5] = "B"
        grade[score >= 0.75] = "A"
        return pd.DataFrame({"score": score, "grade": grade})

    o = load(spark, sf_dir, "orders")
    return (
        o.withColumn("s", score_struct("o_totalprice"))
        .select(
            "o_orderkey",
            F.col("s.score").alias("score"),
            F.col("s.grade").alias("grade"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "udf_cogroup_asof",
    oracle="""
    WITH p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
         m AS (
           SELECT p.user_id, epoch_us(p.ts) AS purchase_us,
                  (SELECT max(epoch_us(c.ts)) FROM c
                   WHERE c.user_id = p.user_id AND c.ts <= p.ts) AS click_us
           FROM p)
    SELECT user_id, purchase_us, click_us,
           purchase_us - click_us AS lag_us
    FROM m
    """,
)
def udf_cogroup_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COGROUP surface (`groupBy().cogroup().applyInPandas` — the custom
    merge-join extension point §2.10 previously lacked): per user, the
    purchase stream and the click stream arrive as two aligned pandas
    frames in ONE task, and a binary-search as-of merge labels every
    purchase with its latest at-or-before click — the pattern for custom
    stream-alignment logic (sessions ⋈ bids, trades ⋈ quotes) when the
    windowed `join_asof` construction can't express the per-group logic.
    Scale: one co-partitioned shuffle on user_id; task memory is bounded
    by the largest single user's two streams; the merge is O(n log m)
    NumPy searchsorted, no pandas merge machinery. Ties (click exactly
    at purchase ts) match, like the oracle's `c.ts <= p.ts`; users with
    clicks but no purchases produce empty frames and vanish."""
    import numpy as np

    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros("ts").alias("ts_us")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.unix_micros("ts").alias("ts_us")
    )

    def asof_merge(key, purchases: pd.DataFrame, clicks: pd.DataFrame):
        if purchases.empty:
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype="int64"),
                    "purchase_us": pd.Series([], dtype="int64"),
                    "click_us": pd.Series([], dtype="Int64"),
                    "lag_us": pd.Series([], dtype="Int64"),
                }
            )
        t = np.sort(purchases["ts_us"].to_numpy())
        if clicks.empty:
            has = np.zeros(len(t), dtype=bool)
            click = np.zeros(len(t), dtype=np.int64)
        else:
            ct = np.sort(clicks["ts_us"].to_numpy())
            idx = np.searchsorted(ct, t, side="right") - 1
            has = idx >= 0
            click = ct[np.clip(idx, 0, None)]
        click_col = pd.array(
            [int(v) if h else None for v, h in zip(click, has)],
            dtype="Int64",
        )
        return pd.DataFrame(
            {
                "user_id": np.repeat(key[0], len(t)),
                "purchase_us": t,
                "click_us": click_col,
                "lag_us": pd.array(
                    [
                        int(pv - cv) if h else None
                        for pv, cv, h in zip(t, click, has)
                    ],
                    dtype="Int64",
                ),
            }
        )

    return (
        p.groupBy("user_id")
        .cogroup(c.groupBy("user_id"))
        .applyInPandas(
            asof_merge,
            "user_id long, purchase_us long, click_us long, lag_us long",
        )
    )


@query(
    "udf_map_arrow",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def udf_map_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`mapInArrow` surface — the zero-copy sibling of mapInPandas: the
    UDF receives raw `pyarrow.RecordBatch`es and computes UTF-8 byte
    lengths with Arrow compute kernels, never materializing a pandas
    object column (for wide binary/string payloads this skips the
    Arrow→pandas→Arrow conversion entirely — the right crossing for
    byte-level feature extraction at 100 TB). The per-doc lengths then
    aggregate JVM-side per language; the oracle recomputes them as
    `octet_length(encode(text))`."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def byte_len(batches):
        for batch in batches:
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(0),
                    pc.binary_length(
                        pc.cast(batch.column(1), pa.large_binary())
                    ).cast(pa.int64()),
                ],
                names=["lang", "n_bytes"],
            )

    docs = load(spark, sf_dir, "documents").select("lang", "text")
    lens = docs.mapInArrow(byte_len, "lang string, n_bytes long")
    return (
        lens.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_bytes").cast("long").alias("total_bytes"),
            F.max("n_bytes").cast("long").alias("max_bytes"),
        )
        .orderBy("lang")
    )


@query(
    "udtf_polymorphic_analyze",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), t -> t <> '') AS l
      FROM documents)
    SELECT doc_id, l[1] AS t0, l[2] AS t1, l[3] AS t2
    FROM toks ORDER BY doc_id
    """,
)
def udtf_polymorphic_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4 `analyze()`): the output schema
    is computed at PLAN TIME from the call's literal argument — here
    `k=3` produces columns t0..t2 — the table-function shape for
    parsers whose width is a parameter (fixed-field extractors, top-k
    wideners) without hardcoding a schema per call site. The driver
    runs `analyze()` once during resolution; executors then stream rows
    against the resolved schema as usual. One row per document (padded
    with NULLs when fewer tokens), mirrored by the oracle's
    list-indexing twin, so the dynamic-schema machinery itself is the
    thing under test."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import udtf as udtf_fn
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class FirstTokens:
        @staticmethod
        def analyze(
            text: AnalyzeArgument, k: AnalyzeArgument
        ) -> AnalyzeResult:
            n = k.value
            return AnalyzeResult(
                schema=T.StructType(
                    [T.StructField(f"t{i}", T.StringType()) for i in range(n)]
                )
            )

        def eval(self, text, k):  # noqa: D102 — UDTF contract method
            toks = [t for t in (text or "").split(" ") if t]
            yield tuple((toks + [None] * k)[:k])

    spark.udtf.register("sg_first_tokens", udtf_fn(FirstTokens))
    register_tables(spark, sf_dir, ["documents"])
    return spark.sql(
        """
        SELECT d.doc_id, s.t0, s.t1, s.t2
        FROM documents d, LATERAL sg_first_tokens(d.text, 3) s
        ORDER BY d.doc_id
        """
    )


_SESS_GAP_US = 1800 * 1_000_000  # 30-minute session gap, in exact µs


@query(
    "udtf_partitioned_table_arg",
    oracle=f"""
    WITH e AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
      FROM events),
    s AS (
      SELECT user_id, ts,
             CASE WHEN prev IS NULL
                       OR epoch_us(ts) - epoch_us(prev) > {_SESS_GAP_US}
                  THEN 1 ELSE 0 END AS ns
      FROM e)
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(ns) AS BIGINT) AS n_sessions,
           CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT) AS span_us
    FROM s GROUP BY user_id ORDER BY user_id
    """,
)
def udtf_partitioned_table_arg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTITIONED TABLE-ARGUMENT UDTF (Spark 4's
    `udtf(TABLE(t) PARTITION BY k ORDER BY ts)`): the engine feeds each
    user's events to a FRESH stateful Python instance in timestamp
    order — eval() folds running state row-by-row (session counter on a
    30-minute gap, first/last touch), terminate() emits one summary row
    per partition. This is the third UDTF surface next to the lateral
    exploder (`udtf_explode_custom`) and plan-time polymorphism
    (`udtf_polymorphic_analyze`): imperative PER-GROUP streaming logic
    in SQL position, the shape that absorbs the sessionizers/legacy
    reducers a declarative window can't express — while the oracle
    proves THIS one with a window twin, pinning the partition/order
    contract exactly.

    Scale shape: PARTITION BY hash-shuffles once on user_id and
    ORDER BY sorts within partitions — identical physical cost to the
    window formulation; state is O(1) per open group, rows stream
    through Python without materializing a group. Determinism: all
    time arithmetic in exact integer MICROSECONDS on both sides
    (timedelta-µs in Python, epoch_us in DuckDB — fractional-second
    truncation never enters); equal-timestamp ties can reorder but
    every output is order-insensitive at equal ts (counts, min/max,
    gap>threshold on zero gaps)."""
    from pyspark.sql.functions import udtf as udtf_fn

    class SessionSummary:
        def __init__(self) -> None:
            self.user = None
            self.n = 0
            self.sessions = 0
            self.first = None
            self.last = None

        @staticmethod
        def _us(delta) -> int:
            return (
                delta.days * 86_400 + delta.seconds
            ) * 1_000_000 + delta.microseconds

        def eval(self, row) -> None:  # noqa: D102 — UDTF contract method
            ts = row["ts"]
            if self.n == 0:
                self.first = ts
                self.sessions = 1
            elif self._us(ts - self.last) > _SESS_GAP_US:
                self.sessions += 1
            self.user = row["user_id"]
            self.last = ts
            self.n += 1

        def terminate(self):  # noqa: D102 — UDTF contract method
            if self.n:
                yield (
                    self.user,
                    self.n,
                    self.sessions,
                    self._us(self.last - self.first),
                )

    spark.udtf.register(
        "sg_session_summary",
        udtf_fn(
            SessionSummary,
            returnType=(
                "user_id bigint, n_events bigint, "
                "n_sessions bigint, span_us bigint"
            ),
        ),
    )
    register_tables(spark, sf_dir, ["events"])
    return spark.sql(
        """
        SELECT * FROM sg_session_summary(
          TABLE(events) PARTITION BY user_id ORDER BY ts)
        ORDER BY user_id
        """
    )
