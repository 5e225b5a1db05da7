"""Scalar function families (SURVEY.md §2.8): string / regex / date / math
/ array / lambda / map / json.

All JVM-side ``pyspark.sql.functions`` — these run inside whole-stage
codegen, never in Python. Dialect-parity notes are inline where Spark and
DuckDB disagree (dayofweek numbering, libm last-ulp drift, map types).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load
from .registry import query


@query(
    "fn_string_core",
    oracle="""
    SELECT p_partkey,
           lower(p_name)                       AS name_lower,
           upper(p_brand)                      AS brand_upper,
           trim(concat('  ', p_type, ' '))     AS type_trim,
           substr(p_name, 1, 8)                AS name_prefix,
           concat_ws('|', p_brand, p_type)     AS brand_type,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           length(p_name)                      AS name_len
    FROM part
    """,
)
def fn_string_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.trim(F.concat(F.lit("  "), F.col("p_type"), F.lit(" "))).alias("type_trim"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.length("p_name").alias("name_len"),
    )


@query(
    "fn_string_split_explode",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS token
    FROM documents
    """,
)
def fn_string_split_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The wordcount mapper: one row per token. explode is a generator —
    no shuffle, output partitioning follows the input."""
    return (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    )


@query(
    "fn_string_regex",
    oracle=r"""
    SELECT doc_id,
           regexp_extract(text, '([a-z]{6,})', 1)          AS first_long_word,
           regexp_replace(text, 'data', 'DATA', 'g')       AS shouted,
           regexp_matches(text, 'merge (join|sort)')       AS has_merge_phrase
    FROM documents
    """,
)
def fn_string_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex family. Patterns restricted to syntax Java regex and RE2
    interpret identically; NB Spark regexp_replace is global by default,
    DuckDB needs the 'g' flag."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"([a-z]{6,})", 1).alias("first_long_word"),
        F.regexp_replace("text", "data", "DATA").alias("shouted"),
        F.col("text").rlike("merge (join|sort)").alias("has_merge_phrase"),
    )


@query(
    "fn_date_parts",
    oracle="""
    SELECT o_orderkey,
           date_part('year', o_orderdate)::INT       AS yr,
           date_part('month', o_orderdate)::INT      AS mon,
           date_part('day', o_orderdate)::INT        AS dom,
           date_part('dow', o_orderdate)::INT + 1    AS dow_sunday1,
           date_trunc('month', o_orderdate)          AS month_start,
           date_diff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00')::INT AS days_to_y2k
    FROM orders
    """,
)
def fn_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part family. dayofweek numbering differs (Spark: Sunday=1;
    DuckDB dow: Sunday=0) — aligned explicitly in the oracle."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mon"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.dayofweek("o_orderdate").alias("dow_sunday1"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("2000-01-01").cast("timestamp"), F.col("o_orderdate")).alias("days_to_y2k"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT p_partkey,
           abs(p_retailprice - 1000.0)            AS abs_diff,
           floor(p_retailprice)::BIGINT           AS price_floor,
           ceil(p_retailprice)::BIGINT            AS price_ceil,
           round(sqrt(p_retailprice), 6)          AS price_sqrt,
           round(ln(p_retailprice), 6)            AS price_ln,
           round(pow(p_size, 2.0), 6)             AS size_sq,
           p_size % 7                             AS size_mod
    FROM part
    WHERE p_retailprice > 0
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family. abs/floor/ceil/% are exact; sqrt/ln/pow go through
    libm whose last ulp is implementation-defined → rounded to 6.
    Spark floor/ceil return BIGINT while DuckDB's return DOUBLE — the
    oracle casts to BIGINT so the value hash sees 740, not 740.0."""
    p = load(spark, sf_dir, "part").filter(F.col("p_retailprice") > 0)
    return p.select(
        "p_partkey",
        F.abs(F.col("p_retailprice") - 1000.0).alias("abs_diff"),
        F.floor("p_retailprice").alias("price_floor"),
        F.ceil("p_retailprice").alias("price_ceil"),
        F.round(F.sqrt("p_retailprice"), 6).alias("price_sqrt"),
        F.round(F.log("p_retailprice"), 6).alias("price_ln"),
        F.round(F.pow("p_size", F.lit(2.0)), 6).alias("size_sq"),
        (F.col("p_size") % 7).alias("size_mod"),
    )


@query(
    "fn_array_ops",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' '))                         AS n_tokens,
           array_to_string(string_split(text, ' ')[1:3], '|')   AS first3,
           list_contains(string_split(text, ' '), 'data')       AS has_data,
           len(list_distinct(string_split(text, ' ')))          AS n_unique,
           array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:5], '|')
             AS first_unique
    FROM documents
    """,
)
def fn_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family over the tokenized documents. NB slice is 1-based in
    both engines; DuckDB's [a:b] is inclusive → slice(arr, 1, 3) == [1:3].
    Array-valued results are projected to '|'-joined strings at the query
    surface — the driver's canonicalizer can't hash list cells — while the
    array ops themselves stay native (array internals unchanged)."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_join(F.slice(toks, 1, 3), "|").alias("first3"),
        F.array_contains(toks, "data").alias("has_data"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        F.array_join(F.slice(F.array_sort(F.array_distinct(toks)), 1, 5), "|").alias("first_unique"),
    )


@query(
    "fn_array_lambda",
    oracle="""
    SELECT doc_id,
           array_to_string(list_transform(string_split(text, ' ')[1:5], t -> length(t)), '|')
             AS first5_lens,
           len(list_filter(string_split(text, ' '), t -> length(t) > 4)) AS n_long,
           list_aggregate(list_transform(string_split(text, ' '), t -> length(t)), 'sum')::BIGINT
             AS total_chars
    FROM documents
    """,
)
def fn_array_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (transform / filter / aggregate) on
    integer values — exact parity; float lambda kernels (dot products)
    live in vectorops where the comparison is designed for them.
    The transform result is '|'-joined at the surface (driver hashability);
    the lambda pipeline underneath is unchanged."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.array_join(
            F.transform(F.slice(toks, 1, 5), lambda t: F.length(t).cast("string")), "|"
        ).alias("first5_lens"),
        F.size(F.filter(toks, lambda t: F.length(t) > 4)).alias("n_long"),
        F.aggregate(
            F.transform(toks, lambda t: F.length(t)),
            F.lit(0),
            lambda acc, x: acc + x,
        ).cast("bigint").alias("total_chars"),
    )


@query(
    "fn_map_ops",
    oracle="""
    SELECT event_id,
           'type=' || event_type || ',user=' || CAST(user_id AS VARCHAR) AS kv_string,
           event_type               AS map_type,
           CAST(user_id AS VARCHAR) AS map_user
    FROM events
    """,
)
def fn_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """str_to_map + element extraction. The map itself is not returned
    (map cell encodings aren't dialect-portable); extracted values are —
    the oracle recomputes them from source, proving the round-trip."""
    e = load(spark, sf_dir, "events")
    kv = F.concat(F.lit("type="), F.col("event_type"), F.lit(",user="), F.col("user_id").cast("string"))
    m = F.str_to_map(kv, F.lit(","), F.lit("="))
    return e.select(
        "event_id",
        kv.alias("kv_string"),
        m.getItem("type").alias("map_type"),
        m.getItem("user").alias("map_user"),
    )


@query(
    "fn_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_value,
           CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) >= 50
                THEN 'hi' ELSE 'lo' END AS k_band
    FROM events
    """,
)
def fn_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction from events.props (literally '{"k": <int>}').
    get_json_object is the codegen-friendly path; from_json with an
    explicit schema is exercised in the streaming module."""
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.select(
        "event_id",
        k.alias("k_value"),
        F.when(k >= 50, "hi").otherwise("lo").alias("k_band"),
    )


@query(
    "fn_null_conditional",
    oracle="""
    SELECT c_custkey,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
           greatest(round(c_acctbal, 2), 0.0)                  AS bal_floor0,
           least(round(c_acctbal, 2), 5000.0)                  AS bal_cap5k,
           CASE WHEN c_acctbal IS NULL THEN -1.0
                ELSE round(c_acctbal, 2) END                   AS bal_or_neg1
    FROM customer
    """,
)
def fn_null_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling conditional family: coalesce / nullif / greatest /
    least / ifnull — all Catalyst expressions, null-safe by definition."""
    c = load(spark, sf_dir, "customer")
    bal = F.round(F.col("c_acctbal"), 2)
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias("seg_or_other"),
        F.greatest(bal, F.lit(0.0)).alias("bal_floor0"),
        F.least(bal, F.lit(5000.0)).alias("bal_cap5k"),
        F.ifnull(bal, F.lit(-1.0)).alias("bal_or_neg1"),
    )


@query(
    "fn_bitwise",
    oracle="""
    SELECT event_id,
           event_id & 255                   AS low_byte,
           event_id | 4096                  AS with_flag,
           xor(event_id, 21845)             AS toggled,
           CAST(event_id * 8 AS BIGINT)     AS shifted_l,
           CAST(event_id // 16 AS BIGINT)   AS shifted_r,
           bit_count(event_id)              AS popcount
    FROM events
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family: AND/OR/XOR, shifts, popcount — the bit-packing
    toolkit behind SimHash/bloom-style sketches (dedup_simhash uses these
    in anger). Shifts are written as *8 and //16 in the oracle (DuckDB
    shift operators differ in type promotion; arithmetic is exact on
    non-negative ids)."""
    e = load(spark, sf_dir, "events")
    eid = F.col("event_id")
    return e.select(
        "event_id",
        eid.bitwiseAND(F.lit(255)).alias("low_byte"),
        eid.bitwiseOR(F.lit(4096)).alias("with_flag"),
        eid.bitwiseXOR(F.lit(21845)).alias("toggled"),
        F.shiftleft(eid, 3).cast("bigint").alias("shifted_l"),
        F.shiftright(eid, 4).cast("bigint").alias("shifted_r"),
        F.bit_count(eid).alias("popcount"),
    )


@query(
    "fn_string_codecs",
    oracle="""
    SELECT p_partkey,
           base64(encode(p_name))        AS name_b64,
           hex(encode(p_name))           AS name_hex,
           md5(p_name)                   AS name_md5,
           sha256(p_name)                AS name_sha256
    FROM part
    """,
)
def fn_string_codecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding/digest family — base64, hex, md5, sha256 over UTF-8 bytes.
    The content-addressing toolkit (manifest digests, cache keys) of any
    data lake; byte-level parity with the oracle proves the UTF-8
    round-trip."""
    p = load(spark, sf_dir, "part")
    name_bin = F.encode("p_name", "UTF-8")
    return p.select(
        "p_partkey",
        F.base64(name_bin).alias("name_b64"),
        F.hex(name_bin).alias("name_hex"),
        F.md5(name_bin).alias("name_md5"),
        F.sha2(name_bin, 256).alias("name_sha256"),
    )


@query(
    "fn_date_arith",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d')     AS due_date,
           strftime(o_orderdate + INTERVAL 2 MONTH, '%Y-%m-%d')    AS review_date,
           strftime(last_day(o_orderdate), '%Y-%m-%d')             AS month_end,
           date_diff('month', date_trunc('month', o_orderdate),
                     TIMESTAMP '1998-01-01')                       AS whole_months_to_98
    FROM orders
    """,
)
def fn_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic family: day/month offsets, month-end, whole-month
    distance. All results cross the comparison boundary as 'yyyy-MM-dd'
    STRINGS — Spark date_add returns DATE while DuckDB interval addition
    yields TIMESTAMP, and month arithmetic (add_months clamping to
    month-end) is the part worth pinning, not the carrier type."""
    o = load(spark, sf_dir, "orders")
    fmt = "yyyy-MM-dd"
    return o.select(
        "o_orderkey",
        F.date_format(F.date_add("o_orderdate", 30), fmt).alias("due_date"),
        F.date_format(F.add_months("o_orderdate", 2), fmt).alias("review_date"),
        F.date_format(F.last_day("o_orderdate"), fmt).alias("month_end"),
        (
            (F.lit(1998) - F.year("o_orderdate")) * 12 - F.month("o_orderdate") + 1
        ).cast("long").alias("whole_months_to_98"),
    )


@query(
    "fn_url_parse",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.org/d/' || doc_id ||
             '?lang=' || lang || '&sf=1' AS url
      FROM documents)
    SELECT doc_id,
           regexp_extract(url, '^https://([^/]+)', 1)      AS host,
           regexp_extract(url, '^https://[^/]+([^?]*)', 1) AS path,
           regexp_extract(url, '\\?(.*)$', 1)              AS query_string,
           regexp_extract(url, '[?&]lang=([^&]*)', 1)      AS lang_param
    FROM u
    """,
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition (host/path/query/parameter) via Spark's native
    ``parse_url`` — a JVM expression inside codegen. The oracle mirrors it
    with anchored regexes; URLs are synthesized deterministically from
    catalog columns so both engines parse identical strings."""
    d = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), "source", F.lit(".example.org/d/"),
        F.col("doc_id").cast("string"), F.lit("?lang="), "lang", F.lit("&sf=1"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query_string"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


@query(
    "fn_struct_ops",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             struct_pack(src := source, lang := lang, id := doc_id) AS meta
      FROM documents)
    SELECT doc_id,
           meta.src                 AS src_field,
           meta.lang                AS lang_field,
           meta.id + 1              AS id_plus,
           to_json(meta)::VARCHAR   AS meta_json
    FROM s
    """,
)
def fn_struct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construction, field access, and JSON serialization. Field
    order is pinned in both engines so ``to_json`` renders byte-identical
    text; all fields are non-null strings/ints (Spark's to_json drops null
    fields while DuckDB keeps them — avoided by construction)."""
    d = load(spark, sf_dir, "documents")
    meta = F.struct(
        F.col("source").alias("src"), F.col("lang").alias("lang"),
        F.col("doc_id").alias("id"),
    )
    return d.select(
        "doc_id",
        meta.getField("src").alias("src_field"),
        meta.getField("lang").alias("lang_field"),
        (meta.getField("id") + 1).alias("id_plus"),
        F.to_json(meta).alias("meta_json"),
    )


@query(
    "fn_trig",
    oracle="""
    SELECT event_id,
           round(sin(value), 6)                    AS sin_v,
           round(cos(value), 6)                    AS cos_v,
           round(atan2(value, 1.0 + value), 6)     AS atan2_v,
           round(degrees(atan(value)), 6)          AS deg_atan,
           round(radians(value), 6)                AS rad_v,
           round(exp(-value / 100.0), 6)           AS exp_decay
    FROM events
    WHERE value IS NOT NULL
    """,
)
def fn_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigonometric + transcendental family (sin/cos/atan2/degrees/
    radians/exp) — rounds out the §2.8 math surface. All go through
    libm whose last ulp is implementation-defined, so every column is
    rounded to 6 decimals on both engines (same policy as fn_math).
    Pure codegen'd map stage: no shuffle, pushdown-eligible filter."""
    e = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return e.select(
        "event_id",
        F.round(F.sin("value"), 6).alias("sin_v"),
        F.round(F.cos("value"), 6).alias("cos_v"),
        F.round(F.atan2(F.col("value"), F.col("value") + 1.0), 6).alias("atan2_v"),
        F.round(F.degrees(F.atan("value")), 6).alias("deg_atan"),
        F.round(F.radians("value"), 6).alias("rad_v"),
        F.round(F.exp(F.col("value") / F.lit(-100.0)), 6).alias("exp_decay"),
    )


@query(
    "fn_variant_json",
    oracle="""
    SELECT event_id,
           json_extract(props, '$.k')::INT AS k,
           CASE WHEN json_extract(props, '$.k')::INT % 2 = 0 THEN 'even'
                ELSE 'odd' END AS k_parity
    FROM events
    """,
)
def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type: parse the
    JSON props column ONCE into the binary variant encoding, then do
    typed path extraction — the modern engine path that replaces
    repeated get_json_object string re-parsing (fn_json_extract keeps
    the classic form for contrast). At scale the parse cost is paid a
    single time per row however many fields are read. The oracle is
    DuckDB's native JSON extraction over the same path."""
    e = load(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'int')")
    return e.select(
        "event_id",
        k.alias("k"),
        F.when(k % 2 == 0, "even").otherwise("odd").alias("k_parity"),
    )


@query(
    "fn_try_arith",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             count(CASE WHEN event_type = 'click' THEN 1 END) AS n_clicks,
             count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchases
      FROM events GROUP BY user_id)
    SELECT user_id, n_clicks::BIGINT AS n_clicks,
           n_purchases::BIGINT AS n_purchases,
           round(n_purchases * 1.0 / nullif(n_clicks, 0), 6) AS conv_rate
    FROM per_user
    """,
)
def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic (ANSI-mode ETL defense): conversion rate
    per user computed with try_divide, which yields NULL for the
    zero-click users instead of failing the job under ANSI SQL mode —
    the behavior a 100 TB batch needs when one bad row must not kill
    the stage. The oracle expresses the identical semantics portably
    via nullif. One hash aggregate; the division is row-local."""
    e = load(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("n_clicks"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purchases"),
    )
    return per_user.select(
        "user_id",
        "n_clicks",
        "n_purchases",
        F.round(
            F.try_divide(F.col("n_purchases") * F.lit(1.0), F.col("n_clicks")), 6
        ).alias("conv_rate"),
    )


@query(
    "fn_split_posexplode",
    oracle="""
    SELECT p_partkey,
           CAST(generate_subscripts(string_split(p_name, ' '), 1) AS BIGINT)
             AS pos,
           unnest(string_split(p_name, ' ')) AS word
    FROM part
    ORDER BY p_partkey, pos
    """,
)
def fn_split_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinal-preserving tokenization: split + posexplode keeps each
    word's 1-based position — the structure chunkers and sequence
    labelers need that a bare explode throws away. posexplode is
    map-side generate (pipelined, never materialized); the ordinal is
    aligned to DuckDB's 1-based generate_subscripts by the +1 in the
    projection."""
    return (
        load(spark, sf_dir, "part")
        .select(
            "p_partkey",
            F.posexplode(F.split("p_name", " ")).alias("pos", "word"),
        )
        .select(
            "p_partkey",
            (F.col("pos") + 1).cast("long").alias("pos"),
            "word",
        )
        .orderBy("p_partkey", "pos")
    )


@query(
    "fn_collation_group",
    oracle="""
    SELECT lower(CASE WHEN c_custkey % 2 = 0 THEN lower(c_mktsegment)
                      ELSE c_mktsegment END) AS segment,
           count(*) AS n,
           round(sum(c_acctbal), 2) AS bal
    FROM customer GROUP BY 1 ORDER BY segment
    """,
)
def fn_collation_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (Spark 4 `COLLATE UTF8_LCASE`): group
    case-drifted strings WITHOUT materializing a normalized key column —
    the engine's comparator itself is case-insensitive, which is the
    Spark-4-native answer to the classic lower()-wrapper workaround (and
    unlike lower() it extends to locale-aware collations). Case drift is
    synthesized deterministically (even keys lowered), the group key is
    the collated column, and the display key is normalized + cast back
    to a plain string so the result schema is collation-free. Hash
    aggregate, partial+final, same plan class as any groupBy."""
    c = load(spark, sf_dir, "customer")
    seg = F.when(
        F.col("c_custkey") % 2 == 0, F.lower("c_mktsegment")
    ).otherwise(F.col("c_mktsegment"))
    return (
        c.select(seg.alias("seg"), "c_acctbal")
        .groupBy(F.expr("collate(seg, 'UTF8_LCASE')").alias("k"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("c_acctbal"), 2).alias("bal"),
        )
        .select(
            F.lower("k").cast("string").alias("segment"), "n", "bal"
        )
        .orderBy("segment")
    )


@query(
    "fn_sequence_gap_fill",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             count(*) AS n, round(sum(value), 2) AS v
      FROM events GROUP BY user_id, CAST(ts AS DATE)),
    rng AS (
      SELECT user_id, min(day) AS d0, max(day) AS d1
      FROM daily GROUP BY user_id),
    spine AS (
      SELECT user_id,
             CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
               AS day
      FROM rng)
    SELECT s.user_id, CAST(s.day AS VARCHAR(10)) AS day,
           COALESCE(d.n, 0) AS n_events,
           COALESCE(d.v, 0.0) AS daily_value
    FROM spine s
    LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
    ORDER BY s.user_id, s.day
    """,
)
def fn_sequence_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification (gap fill): every user gets a COMPLETE
    day spine from their first to last active day, with zero-filled
    rows on silent days — the step that turns an event log into a
    regular time series (without it, rolling averages silently skip
    gaps and look healthier than they are). Complements
    `win_forward_fill`, which fills VALUES over existing rows but can't
    create the missing rows. The spine is F.sequence + explode over a
    per-user (min, max) day pair — fan-out bounded by the calendar span,
    never by event volume — and rejoins the daily aggregate on
    (user_id, day): two hash aggregates and one equi shuffle, the same
    plan at any corpus size."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("v"),
        )
    )
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(
                F.expr("sequence(d0, d1, interval 1 day)")
            ).alias("day"),
        )
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.col("day").cast("string").alias("day"),
            F.coalesce("n", F.lit(0)).alias("n_events"),
            F.coalesce("v", F.lit(0.0)).alias("daily_value"),
        )
        .orderBy("user_id", "day")
    )


@query(
    "fn_round_modes",
    oracle="""
    WITH v AS (
      SELECT DISTINCT CAST(o_orderkey % 40 AS DOUBLE) / 4.0 AS v FROM orders)
    SELECT v,
           round(v, 1) AS half_up,
           round_even(v, 1) AS half_even,
           ceil(v * 10) / 10 AS ceil_1,
           floor(v * 10) / 10 AS floor_1
    FROM v ORDER BY v
    """,
)
def fn_round_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rounding-mode parity audit: HALF_UP (``round``) vs banker's
    HALF_EVEN (``bround``) vs directed ceil/floor at one decimal — the
    dialect trap behind every cross-engine financial reconciliation.
    The probe domain is quarters (k/4: exactly representable dyadic
    doubles), so every tie (x.25 / x.75) sits EXACTLY on the boundary
    in both engines and the modes must visibly disagree (…25 → HALF_UP
    up, HALF_EVEN down). Pure row-local map + one distinct over a
    40-value domain; ceil/floor take the scaled-integer route
    (ceil(v·10)/10) because DuckDB's ceil has no scale argument."""
    v = (
        load(spark, sf_dir, "orders")
        .select(
            ((F.col("o_orderkey") % 40).cast("double") / 4.0).alias("v")
        )
        .distinct()
    )
    return v.select(
        "v",
        F.round("v", 1).alias("half_up"),
        F.bround("v", 1).alias("half_even"),
        (F.ceil(F.col("v") * 10) / 10).alias("ceil_1"),
        (F.floor(F.col("v") * 10) / 10).alias("floor_1"),
    ).orderBy("v")


@query(
    "fn_regex_extract_all",
    oracle=r"""
    SELECT doc_id,
           COALESCE(array_to_string(regexp_extract_all(text, '[a-z]{7,}'), '|'),
                    '') AS long_words,
           CAST(len(regexp_extract_all(text, '[a-z]{7,}')) AS INT) AS n_long,
           CAST(len(list_distinct(regexp_extract_all(text, '[a-z]{7,}')))
                AS INT) AS n_unique
    FROM documents
    """,
)
def fn_regex_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all — the multi-match extraction surface
    (`fn_string_regex` covers only first-match). Matches arrive in
    document order in both engines (leftmost scan of the same RE2/Java-
    compatible pattern); the match array is projected to a '|'-joined
    string at the query surface (the driver's canonicalizer can't hash
    list cells — the `fn_array_ops` discipline). Pure row-local map,
    zero shuffle; distinct-counting uses an order-insensitive set
    size."""
    d = load(spark, sf_dir, "documents")
    all_words = F.expr("regexp_extract_all(text, '[a-z]{7,}', 0)")
    return d.select(
        "doc_id",
        F.array_join(all_words, "|").alias("long_words"),
        F.size(all_words).alias("n_long"),
        F.size(F.array_distinct(all_words)).alias("n_unique"),
    )


@query(
    "fn_haversine",
    oracle="""
    WITH pts AS (
      SELECT c_custkey,
             (c_custkey * 7919 % 17000) / 100.0 - 85.0 AS lat1,
             (c_custkey * 104729 % 36000) / 100.0 - 180.0 AS lon1,
             (c_nationkey * 7919 % 17000) / 100.0 - 85.0 AS lat2,
             (c_nationkey * 104729 % 36000) / 100.0 - 180.0 AS lon2
      FROM customer),
    hv AS (
      SELECT c_custkey, lat1, lon1, lat2, lon2,
             sin(radians(lat2 - lat1) / 2)
               * sin(radians(lat2 - lat1) / 2)
             + cos(radians(lat1)) * cos(radians(lat2))
               * sin(radians(lon2 - lon1) / 2)
               * sin(radians(lon2 - lon1) / 2) AS a
      FROM pts)
    SELECT c_custkey, round(lat1, 2) AS lat1, round(lon1, 2) AS lon1,
           round(2 * 6371.0088 * asin(least(1.0, sqrt(a))), 3) AS dist_km
    FROM hv ORDER BY c_custkey
    """,
)
def fn_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Great-circle (haversine) distance scalar family — radians/trig/
    asin/sqrt composed row-locally, the geo primitive behind any
    store-to-customer or geo-dedup query. Coordinates are derived
    DETERMINISTICALLY from integer keys (prime-modulus spread — the
    corpus carries no geo columns), clamped off the poles; the asin
    argument is clamped to 1.0 on both engines so a last-ulp excursion
    can never produce NaN. Pure codegen map — no shuffle, no UDF; both
    engines evaluate the identical expression tree on exact integer
    inputs, and the ~1e-11 km transcendental drift is far below the
    3-decimal output rounding."""
    c = load(spark, sf_dir, "customer")
    lat1 = (F.col("c_custkey") * 7919 % 17000) / 100.0 - 85.0
    lon1 = (F.col("c_custkey") * 104729 % 36000) / 100.0 - 180.0
    lat2 = (F.col("c_nationkey").cast("long") * 7919 % 17000) / 100.0 - 85.0
    lon2 = (
        F.col("c_nationkey").cast("long") * 104729 % 36000
    ) / 100.0 - 180.0
    dphi = F.radians(lat2 - lat1) / 2
    dlmb = F.radians(lon2 - lon1) / 2
    a = F.sin(dphi) * F.sin(dphi) + F.cos(F.radians(lat1)) * F.cos(
        F.radians(lat2)
    ) * F.sin(dlmb) * F.sin(dlmb)
    return c.select(
        "c_custkey",
        F.round(lat1, 2).alias("lat1"),
        F.round(lon1, 2).alias("lon1"),
        F.round(
            2 * 6371.0088 * F.asin(F.least(F.lit(1.0), F.sqrt(a))), 3
        ).alias("dist_km"),
    ).orderBy("c_custkey")


@query(
    "fn_luhn_check",
    oracle="""
    WITH nums AS (
      SELECT o_orderkey,
             (o_orderkey * 37 + 11) % 1000000000000 AS card_num
      FROM orders),
    digits AS (
      SELECT o_orderkey, card_num,
             list_sum(list_transform(range(0, 12), i ->
               CASE WHEN i % 2 = 1
                    THEN CASE WHEN ((card_num // CAST(pow(10, i) AS BIGINT))
                                    % 10) * 2 > 9
                              THEN ((card_num // CAST(pow(10, i) AS BIGINT))
                                    % 10) * 2 - 9
                              ELSE ((card_num // CAST(pow(10, i) AS BIGINT))
                                    % 10) * 2 END
                    ELSE (card_num // CAST(pow(10, i) AS BIGINT)) % 10
               END)) AS luhn_sum
      FROM nums)
    SELECT o_orderkey, card_num,
           CAST(luhn_sum AS BIGINT) AS luhn_sum,
           (luhn_sum % 10 = 0) AS is_valid
    FROM digits ORDER BY o_orderkey
    """,
)
def fn_luhn_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn (mod-10) checksum validation over synthetic 12-digit
    account numbers — the array-lambda showcase for EXACT integer
    digit manipulation: digits come from integer div/mod (never string
    parsing), the every-second-digit doubling and the 9-subtraction
    run inside a transform() lambda, and the fold is a plain
    aggregate over 12 constants — all whole-stage codegen, no shuffle,
    bit-identical across engines by construction."""
    o = load(spark, sf_dir, "orders")
    card = (F.col("o_orderkey") * 37 + 11) % F.lit(1000000000000)
    digits = F.expr(
        "aggregate(transform(sequence(0, 11), i -> "
        " CASE WHEN i % 2 = 1"
        "      THEN CASE WHEN ((card_num div CAST(pow(10, i) AS BIGINT))"
        "                      % 10) * 2 > 9"
        "                THEN ((card_num div CAST(pow(10, i) AS BIGINT))"
        "                      % 10) * 2 - 9"
        "                ELSE ((card_num div CAST(pow(10, i) AS BIGINT))"
        "                      % 10) * 2 END"
        "      ELSE (card_num div CAST(pow(10, i) AS BIGINT)) % 10"
        " END), 0L, (acc, x) -> acc + x)"
    )
    return (
        o.select("o_orderkey", card.alias("card_num"))
        .select(
            "o_orderkey",
            "card_num",
            digits.alias("luhn_sum"),
            (digits % 10 == 0).alias("is_valid"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "fn_business_days",
    oracle="""
    WITH lt AS (
      SELECT l_orderkey, l_linenumber,
             datediff('day', DATE '1970-01-05',
                      CAST(o.o_orderdate AS DATE)) AS d1,
             datediff('day', DATE '1970-01-05',
                      CAST(l.l_shipdate AS DATE)) AS d2
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
    f AS (
      SELECT l_orderkey, l_linenumber, d2 - d1 AS cal_days,
             (5 * (d2 // 7) + least(d2 % 7, 5))
             - (5 * (d1 // 7) + least(d1 % 7, 5)) AS biz_days
      FROM lt)
    SELECT l_orderkey, l_linenumber,
           CAST(cal_days AS INT) AS cal_days,
           CAST(biz_days AS INT) AS biz_days
    FROM f ORDER BY l_orderkey, l_linenumber
    """,
)
def fn_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Business-day (Mon–Fri) lead time per line item — the SLA
    arithmetic finance and logistics actually bill in. NO calendar
    table and NO per-day iteration: days are numbered from a MONDAY
    epoch (1970-01-05), and the closed form f(d) = 5·⌊d/7⌋ +
    min(d mod 7, 5) counts business days in [epoch, d) — the
    difference f(d2) − f(d1) is the answer in O(1) exact integer ops
    per row, identical on both engines (day-of-week never consults the
    engines' differing DOW numbering). Codegen map; the only shuffle
    is the orderkey equi-join."""
    d1 = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1970-01-05").cast("date")
    )
    d2 = F.datediff(
        F.col("l_shipdate").cast("date"), F.lit("1970-01-05").cast("date")
    )

    def f(d):
        return 5 * F.expr(f"({d}) div 7") + F.least(
            F.expr(f"({d}) % 7"), F.lit(5)
        )

    j = (
        load(spark, sf_dir, "lineitem")
        .join(
            load(spark, sf_dir, "orders"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            d1.alias("d1"),
            d2.alias("d2"),
        )
    )
    return j.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("d2") - F.col("d1")).cast("int").alias("cal_days"),
        (f("d2") - f("d1")).cast("int").alias("biz_days"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "fn_multiformat_timestamp",
    oracle="""
    WITH rendered AS (
      SELECT event_id,
             CASE WHEN event_id % 2 = 0
                  THEN strftime(ts, '%Y-%m-%dT%H:%M:%S')
                  ELSE strftime(ts, '%m/%d/%Y %H:%M:%S') END AS raw,
             CASE WHEN event_id % 2 = 0 THEN 'iso' ELSE 'us' END AS fmt
      FROM events),
    parsed AS (
      SELECT event_id, fmt,
             coalesce(try_strptime(raw, '%Y-%m-%dT%H:%M:%S'),
                      try_strptime(raw, '%m/%d/%Y %H:%M:%S')) AS ts2
      FROM rendered)
    SELECT fmt, count(*) AS n,
           CAST(sum(CASE WHEN ts2 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unparsed,
           strftime(min(ts2), '%Y-%m-%d %H:%M:%S') AS first_ts,
           strftime(max(ts2), '%Y-%m-%d %H:%M:%S') AS last_ts
    FROM parsed GROUP BY fmt ORDER BY fmt
    """,
)
def fn_multiformat_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-format timestamp ingestion: raw strings arrive in TWO
    layouts (ISO-8601 and US slash-dates — the reality of any log
    merge), and a coalesce(try_parse, try_parse) chain recovers every
    row without a single task-killing parse exception (`try_` variants
    return NULL, never throw). Each engine states the format in its own
    pattern dialect (JDK vs strptime) with identical semantics — pinned
    by round-tripping to second precision and comparing the canonical
    rendering; the unparsed count must be zero on both."""
    e = load(spark, sf_dir, "events")
    raw = F.when(
        F.col("event_id") % 2 == 0,
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss"),
    ).otherwise(F.date_format("ts", "MM/dd/yyyy HH:mm:ss"))
    fmt = F.when(F.col("event_id") % 2 == 0, "iso").otherwise("us")
    parsed = e.select(
        fmt.alias("fmt"),
        F.coalesce(
            F.try_to_timestamp(raw, F.lit("yyyy-MM-dd'T'HH:mm:ss")),
            F.try_to_timestamp(raw, F.lit("MM/dd/yyyy HH:mm:ss")),
        ).alias("ts2"),
    )
    return (
        parsed.groupBy("fmt")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("ts2").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_unparsed"),
            F.date_format(F.min("ts2"), "yyyy-MM-dd HH:mm:ss").alias(
                "first_ts"
            ),
            F.date_format(F.max("ts2"), "yyyy-MM-dd HH:mm:ss").alias(
                "last_ts"
            ),
        )
        .orderBy("fmt")
    )


@query(
    "fn_id_gap_audit",
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             count(*) AS n,
             min(event_id) AS lo,
             max(event_id) AS hi,
             count(DISTINCT event_id) AS n_distinct
      FROM events GROUP BY CAST(ts AS DATE))
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(n AS BIGINT) AS n_rows,
           CAST(lo AS BIGINT) AS first_id,
           CAST(hi AS BIGINT) AS last_id,
           CAST(hi - lo + 1 - n_distinct AS BIGINT) AS missing_in_span,
           CAST(n - n_distinct AS BIGINT) AS duplicate_ids
    FROM d ORDER BY day
    """,
)
def fn_id_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-ID integrity audit per day: rows, id span, ids MISSING
    inside the span (span − distinct) and duplicate ids (rows −
    distinct) — the exactly-once delivery check run against any
    monotonically-assigned event stream. Pure arithmetic on exact
    integer aggregates from ONE hash pass; zero means clean, a nonzero
    missing count localizes the loss to a day without scanning
    neighbors."""
    return (
        load(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.count("*").alias("n"),
            F.min("event_id").alias("lo"),
            F.max("event_id").alias("hi"),
            F.countDistinct("event_id").alias("n_distinct"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("n").cast("long").alias("n_rows"),
            F.col("lo").cast("long").alias("first_id"),
            F.col("hi").cast("long").alias("last_id"),
            (F.col("hi") - F.col("lo") + 1 - F.col("n_distinct"))
            .cast("long")
            .alias("missing_in_span"),
            (F.col("n") - F.col("n_distinct")).cast("long").alias(
                "duplicate_ids"
            ),
        )
        .orderBy("day")
    )


_SCRIPT_TRANSFORM_SQL = r"""
  WITH piped AS (
    SELECT TRANSFORM (o_orderkey, o_orderstatus,
                      CAST(round(o_totalprice * 100) AS BIGINT))
      ROW FORMAT DELIMITED FIELDS TERMINATED BY ','
      USING 'awk \'BEGIN {FS=","; OFS=","} {print $2, $1 % 97, $3 * 2}\''
      AS (status STRING, keymod STRING, dbl_cents STRING)
      ROW FORMAT DELIMITED FIELDS TERMINATED BY ','
    FROM orders
  )
  SELECT status,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(CAST(keymod AS BIGINT)) AS BIGINT) AS sum_keymod,
         CAST(sum(CAST(dbl_cents AS BIGINT)) AS BIGINT) AS sum_dbl_cents
  FROM piped GROUP BY status ORDER BY status
"""


@query(
    "fn_script_transform",
    oracle="""
    SELECT o_orderstatus AS status,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(o_orderkey % 97) AS BIGINT) AS sum_keymod,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT) * 2)
                AS BIGINT) AS sum_dbl_cents
    FROM orders GROUP BY status ORDER BY status
    """,
)
def fn_script_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hadoop-streaming canon: pipe rows through an external script with
    `SELECT TRANSFORM ... USING 'awk ...'` (Spark SQL script transform,
    no Hive needed since 3.0) — THE shape of every streaming-jar mapper
    (`hadoop jar hadoop-streaming.jar -mapper 'awk ...'`). Each task
    feeds its partition's rows to one awk process over comma-delimited
    pipes and reads transformed rows back; the computation (status
    passthrough, o_orderkey mod 97, cents doubling) is integer-only so
    awk's number formatting is exact, and the outer aggregate reduces
    the piped rows to a 3-row summary the pure-SQL oracle states
    independently. Scale: the script runs inside each task — per-
    partition pipes, zero driver involvement, parallelism = input
    partitions, exactly the Hadoop-streaming execution model."""
    from .catalog import register_tables

    register_tables(spark, sf_dir, ["orders"])
    return spark.sql(_SCRIPT_TRANSFORM_SQL)


@query(
    "fn_content_uuid",
    oracle="""
    WITH h AS (
      SELECT doc_id, md5('sparkgraft:doc:' || text) AS hx
      FROM documents),
    u AS (
      SELECT doc_id,
             substr(hx, 1, 8) || '-' || substr(hx, 9, 4) || '-3'
             || substr(hx, 14, 3) || '-'
             || substr('89ab',
                       CAST((strpos('0123456789abcdef', substr(hx, 17, 1))
                             - 1) % 4 AS INT) + 1, 1)
             || substr(hx, 18, 3) || '-' || substr(hx, 21, 12)
               AS content_uuid
      FROM h)
    SELECT doc_id, content_uuid FROM u ORDER BY doc_id
    """,
)
def fn_content_uuid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic CONTENT-DERIVED UUID minting (RFC-4122 v3 shape:
    md5 of namespace‖content with the version nibble forced to 3 and
    the variant nibble folded into 8/9/a/b) — the idempotent-ID
    primitive every ingestion pipeline needs: re-ingesting the same
    document yields the same ID on any engine, any partitioning, any
    day, so downstream dedup/merge keys never depend on arrival order
    or a sequence generator (which can't be idempotent across retries).

    Determinism: md5 is bit-identical everywhere; the nibble surgery is
    pure substring arithmetic (hex-digit index mod 4 picks the variant
    character), no RNG, no time, no engine-specific hash.

    Scale: row-local codegen expressions end-to-end — the minting adds
    zero shuffles to whatever pipeline it joins, and the IDs are
    uniformly distributed by construction (ideal shuffle/bucket
    keys)."""
    h = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.concat(F.lit("sparkgraft:doc:"), F.col("text"))).alias(
            "hx"
        ),
    )
    variant = F.substring(
        F.lit("89ab"),
        (
            F.conv(F.substring("hx", 17, 1), 16, 10).cast("int") % 4 + 1
        ).cast("int"),
        1,
    )
    return h.select(
        "doc_id",
        F.concat(
            F.substring("hx", 1, 8),
            F.lit("-"),
            F.substring("hx", 9, 4),
            F.lit("-3"),
            F.substring("hx", 14, 3),
            F.lit("-"),
            variant,
            F.substring("hx", 18, 3),
            F.lit("-"),
            F.substring("hx", 21, 12),
        ).alias("content_uuid"),
    ).orderBy("doc_id")


# CIDR blocks for fn_ip_cidr — engine literals (network int, prefix len).
# 10.0.0.0/8, 172.16.0.0/12, 192.168.0.0/16, 0.0.0.0/0 fallback order.
_CIDR_BLOCKS = [
    ("10.0.0.0/8", 10 << 24, 8),
    ("172.16.0.0/12", (172 << 24) + (16 << 16), 12),
    ("192.168.0.0/16", (192 << 24) + (168 << 16), 16),
]


@query(
    "fn_ip_cidr",
    oracle=f"""
    WITH ips AS (
      SELECT e.event_id,
             CAST(64 + e.user_id % 128 AS VARCHAR) || '.' ||
             CAST(e.user_id % 256 AS VARCHAR) || '.' ||
             CAST(e.event_id % 256 AS VARCHAR) || '.' ||
             CAST(1 + e.event_id % 254 AS VARCHAR) AS ip,
             CASE e.event_id % 4
               WHEN 0 THEN '10.' || CAST(e.user_id % 256 AS VARCHAR)
                          || '.0.' || CAST(1 + e.event_id % 254 AS VARCHAR)
               WHEN 1 THEN '172.' || CAST(16 + e.event_id % 16 AS VARCHAR)
                          || '.5.' || CAST(1 + e.user_id % 254 AS VARCHAR)
               WHEN 2 THEN '192.168.' || CAST(e.user_id % 256 AS VARCHAR)
                          || '.' || CAST(1 + e.event_id % 254 AS VARCHAR)
               ELSE '203.0.113.' || CAST(1 + e.event_id % 254 AS VARCHAR)
             END AS src_ip
      FROM events e),
    parsed AS (
      SELECT event_id,
             CAST(string_split(src_ip, '.')[1] AS BIGINT) * 16777216
           + CAST(string_split(src_ip, '.')[2] AS BIGINT) * 65536
           + CAST(string_split(src_ip, '.')[3] AS BIGINT) * 256
           + CAST(string_split(src_ip, '.')[4] AS BIGINT) AS ip_int
      FROM ips),
    tagged AS (
      SELECT event_id, ip_int,
             CASE
               WHEN ip_int // 16777216 = {_CIDR_BLOCKS[0][1]} // 16777216
                 THEN '{_CIDR_BLOCKS[0][0]}'
               WHEN ip_int // 1048576 = {_CIDR_BLOCKS[1][1]} // 1048576
                 THEN '{_CIDR_BLOCKS[1][0]}'
               WHEN ip_int // 65536 = {_CIDR_BLOCKS[2][1]} // 65536
                 THEN '{_CIDR_BLOCKS[2][0]}'
               ELSE 'public'
             END AS block
      FROM parsed)
    SELECT block,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(ip_int) AS BIGINT) AS lo_ip,
           CAST(max(ip_int) AS BIGINT) AS hi_ip
    FROM tagged GROUP BY block ORDER BY block
    """,
)
def fn_ip_cidr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 parsing + CIDR-block classification — the log-analytics canon
    (every access-log pipeline tags client IPs into private/public
    ranges before geo or abuse rollups). Dotted-quad strings are
    synthesized deterministically from catalog columns (the
    `fn_url_parse` discipline — both engines parse IDENTICAL strings;
    the corpus has no real IPs), split and folded to a single int64,
    then classified by prefix arithmetic: membership in a /p block is
    `ip_int >> (32−p) == net >> (32−p)` — integer division in both
    engines, no string prefix hacks, no UDFs, all inside codegen. The
    rollup reports per-block counts and the exact int range observed.

    Scale: row-local expressions end-to-end plus one bounded hash
    aggregate (≤ #blocks+1 rows); a CIDR table of thousands of blocks
    becomes a broadcast range join on the same ints — this key pins the
    arithmetic that join would reuse."""
    e = load(spark, sf_dir, "events")
    src_ip = (
        F.when(
            F.col("event_id") % 4 == 0,
            F.concat(
                F.lit("10."), (F.col("user_id") % 256).cast("string"),
                F.lit(".0."), (1 + F.col("event_id") % 254).cast("string"),
            ),
        )
        .when(
            F.col("event_id") % 4 == 1,
            F.concat(
                F.lit("172."), (16 + F.col("event_id") % 16).cast("string"),
                F.lit(".5."), (1 + F.col("user_id") % 254).cast("string"),
            ),
        )
        .when(
            F.col("event_id") % 4 == 2,
            F.concat(
                F.lit("192.168."), (F.col("user_id") % 256).cast("string"),
                F.lit("."), (1 + F.col("event_id") % 254).cast("string"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("203.0.113."),
                (1 + F.col("event_id") % 254).cast("string"),
            )
        )
    )
    parts = F.split(src_ip, r"\.")
    ip_int = (
        F.element_at(parts, 1).cast("long") * 16777216
        + F.element_at(parts, 2).cast("long") * 65536
        + F.element_at(parts, 3).cast("long") * 256
        + F.element_at(parts, 4).cast("long")
    )
    # Column arithmetic built once from _CIDR_BLOCKS (r9 ADVICE fix: was
    # stray-f-string F.expr references to the "ip_int" alias); the prefix
    # compare ip >> (32−p) == net >> (32−p) is pure int64 shifts, the
    # oracle's integer division by 2^(32−p) is the same value.
    block = None
    for name, net, p in _CIDR_BLOCKS:
        cond = F.shiftright(F.col("ip_int"), 32 - p) == (net >> (32 - p))
        block = (
            F.when(cond, F.lit(name))
            if block is None
            else block.when(cond, F.lit(name))
        )
    block = block.otherwise(F.lit("public"))
    return (
        e.select(ip_int.alias("ip_int"))
        .select("ip_int", block.alias("block"))
        .groupBy("block")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("ip_int").cast("long").alias("lo_ip"),
            F.max("ip_int").cast("long").alias("hi_ip"),
        )
        .orderBy("block")
    )
