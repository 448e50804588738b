"""Scalar-function coverage: string, date/time, math/conditional,
array/struct, and JSON extraction.

The reference's entire expression language is a 2-line tokenizer
(Worker/Worker.py:11-12); this module is the SURVEY.md §2.2 gap filled
with built-in ``pyspark.sql.functions`` so every expression stays inside
whole-stage codegen — zero Python in the row path.

Oracle parity notes: only functions with identical cross-engine
semantics are used (e.g. no round() on binary-tie values, no
dayofweek whose base differs, no libm-dependent transcendentals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducegcp_spark.registry import register
from mapreducegcp_spark.sources.catalog import load_table

_STRING_ORACLE = """
SELECT p_partkey,
       upper(p_name)                         AS name_upper,
       length(p_name)                        AS name_len,
       substr(p_type, 1, 5)                  AS type_prefix,
       p_brand || '#' || p_type              AS brand_type,
       replace(p_name, ' ', '_')             AS name_snake,
       ltrim(rtrim(p_name))                  AS name_trim,
       CASE WHEN p_name LIKE '%a%' THEN 1 ELSE 0 END AS has_a,
       position('e' IN p_name)               AS first_e,
       reverse(p_name)                       AS name_rev,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded
FROM part
"""


@register("scalar_string", oracle=_STRING_ORACLE, tags=("relational",))
def q_scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat_ws("#", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.trim(F.col("p_name")).alias("name_trim"),
        F.when(F.col("p_name").like("%a%"), 1).otherwise(0).alias("has_a"),
        F.instr(F.col("p_name"), "e").alias("first_e"),
        F.reverse(F.col("p_name")).alias("name_rev"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
    )


_DATE_ORACLE = """
SELECT o_orderkey,
       year(o_orderdate)                        AS order_year,
       month(o_orderdate)                       AS order_month,
       day(o_orderdate)                         AS order_day,
       quarter(o_orderdate)                     AS order_quarter,
       date_trunc('month', o_orderdate)         AS month_start,
       datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch_start,
       o_orderdate + INTERVAL 30 DAY            AS due_date
FROM orders
"""


@register("scalar_datetime", oracle=_DATE_ORACLE, tags=("relational",))
def q_scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lit("1995-01-01").cast("date"),
        ).cast("bigint").alias("days_since_epoch_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_date"),
    )


_MATH_ORACLE = """
SELECT l_orderkey, l_linenumber,
       abs(l_discount - 0.05)                       AS disc_dev,
       CAST(floor(l_extendedprice) AS BIGINT)       AS price_floor,
       CAST(ceil(l_quantity) AS BIGINT)             AS qty_ceil,
       greatest(l_quantity, 25.0)                   AS qty_at_least,
       least(l_tax, 0.04)                           AS tax_capped,
       l_partkey % 10                               AS part_bucket,
       CAST(sign(l_discount - 0.05) AS DOUBLE)      AS disc_sign,
       CASE WHEN l_quantity < 10 THEN 'low'
            WHEN l_quantity < 40 THEN 'mid'
            ELSE 'high' END                         AS qty_band
FROM lineitem
"""


@register("scalar_math", oracle=_MATH_ORACLE, tags=("relational",))
def q_scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.greatest(F.col("l_quantity"), F.lit(25.0)).alias("qty_at_least"),
        F.least(F.col("l_tax"), F.lit(0.04)).alias("tax_capped"),
        (F.col("l_partkey") % 10).alias("part_bucket"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        F.when(F.col("l_quantity") < 10, "low")
        .when(F.col("l_quantity") < 40, "mid")
        .otherwise("high")
        .alias("qty_band"),
    )


_JSON_ORACLE = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
       event_type
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
"""


@register("scalar_json", oracle=_JSON_ORACLE, tags=("relational",))
def q_scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction + predicate on the extracted value —
    semi-structured props on the event stream (events.props is a JSON
    string column)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.select("event_id", k.alias("prop_k"), "event_type").filter(
        k > 50
    )


# Arrays: only order-stable scalars derived from arrays are exposed to
# the hash compare (split order is deterministic in both engines; being
# conservative about cross-engine array normalization anyway).
_ARRAY_SAFE_ORACLE = """
SELECT doc_id,
       len(string_split(text, ' '))                       AS n_ws_tokens,
       len(list_distinct(string_split(text, ' ')))        AS n_distinct_tokens,
       list_contains(string_split(text, ' '), 'spark')    AS mentions_spark,
       string_split(text, ' ')[1]                         AS first_token
FROM documents
"""


@register("scalar_array", oracle=_ARRAY_SAFE_ORACLE, tags=("relational",))
def q_scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions over a split column: size, distinct-size,
    membership, element access — all codegen'd, no UDF."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_ws_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.array_contains(toks, "spark").alias("mentions_spark"),
        F.element_at(toks, 1).alias("first_token"),
    )


_NULL_ORACLE = """
WITH t AS (
  SELECT nullif(l_returnflag, 'R') AS flag,
         CASE WHEN l_quantity < 10 THEN NULL ELSE l_quantity END AS qty
  FROM lineitem
)
SELECT count(*) AS n_rows,
       count(flag) AS n_flag_nonnull,
       count(qty) AS n_qty_nonnull,
       CAST(sum(CAST(qty AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty_skipnull,
       CAST(sum(CASE WHEN flag IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_flag_null,
       CAST(sum(CASE WHEN flag IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_nullsafe_eq_null,
       coalesce(min(flag), '<none>') AS min_flag,
       max(qty) AS max_qty
FROM t
"""


@register("scalar_null_semantics", oracle=_NULL_ORACLE, tags=("relational",))
def q_scalar_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics corner-cases on a derived nullable column (the
    driver tables are null-free, so nullif/CASE manufacture them):
    count(*) vs count(col), null-skipping SUM/MIN/MAX, null-safe
    equality (<=>), coalesce defaulting. Both engines implement ANSI
    three-valued logic identically for every expression used here."""
    li = load_table(spark, sf_dir, "lineitem")
    t = li.select(
        F.nullif(F.col("l_returnflag"), F.lit("R")).alias("flag"),
        F.when(F.col("l_quantity") < 10, None).otherwise(F.col("l_quantity")).alias("qty"),
    )
    return t.agg(
        F.count("*").alias("n_rows"),
        F.count("flag").alias("n_flag_nonnull"),
        F.count("qty").alias("n_qty_nonnull"),
        F.sum(F.col("qty").cast("decimal(12,2)")).cast("double").alias("sum_qty_skipnull"),
        F.sum(F.when(F.col("flag").isNull(), 1).otherwise(0)).alias("n_flag_null"),
        F.sum(F.when(F.col("flag").eqNullSafe(F.lit(None)), 1).otherwise(0)).alias(
            "n_nullsafe_eq_null"
        ),
        F.coalesce(F.min("flag"), F.lit("<none>")).alias("min_flag"),
        F.max("qty").alias("max_qty"),
    )


_VARIANT_ORACLE = """
SELECT event_type,
       count(*) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
"""


@register("scalar_variant", oracle=_VARIANT_ORACLE, tags=("relational",))
def q_scalar_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4): parse the JSON props
    column into a variant once, extract typed fields with
    variant_get — the open-schema ingestion pattern (vs scalar_json's
    per-path string extraction). The binary variant encoding is parsed
    once per row; every extraction after that is a cheap typed probe,
    which is the at-scale argument for variant over repeated
    get_json_object calls."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )


_BITWISE_ORACLE = """
SELECT event_id,
       user_id & event_id AS b_and,
       user_id | event_id AS b_or,
       xor(user_id, event_id) AS b_xor,
       CAST(bit_count(CAST(user_id AS BIGINT)) AS INT) AS popcount,
       user_id << 3 AS shl,
       user_id >> 2 AS shr,
       CAST((user_id >> 5) & 1 AS INT) AS bit5
FROM events
WHERE event_id < 1000
"""


@register("scalar_bitwise", oracle=_BITWISE_ORACLE, tags=("relational",))
def q_scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise function coverage — and/or/xor, popcount, shifts, bit
    probes — the toolkit behind the engine's own bitmap operators
    (Bloom membership, SimHash bands, pHash hamming). Two's-complement
    semantics on BIGINT agree across engines; only the xor SPELLING
    differs (infix ^ in Spark, xor() in DuckDB)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") < 1000)
    u, e = F.col("user_id"), F.col("event_id")
    return ev.select(
        "event_id",
        u.bitwiseAND(e).alias("b_and"),
        u.bitwiseOR(e).alias("b_or"),
        u.bitwiseXOR(e).alias("b_xor"),
        F.bit_count(u).alias("popcount"),
        F.shiftleft(u, 3).alias("shl"),
        F.shiftright(u, 2).alias("shr"),
        F.shiftright(u, 5).bitwiseAND(F.lit(1)).cast("int").alias("bit5"),
    )


# ------------------------------------------------ URL function family

_URL_ORACLE = """
WITH u AS (
  SELECT doc_id,
         'https://' || source || '.example.com/corpus/' || lang
           || '/doc?id=' || CAST(doc_id AS VARCHAR) || '&v=2' AS url
  FROM documents
)
SELECT doc_id, url,
       regexp_extract(url, '^([a-z]+)://', 1) AS protocol,
       regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
       regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
       regexp_extract(url, '\\?(.*)$', 1) AS query,
       regexp_extract(url, '[?&]id=([^&]*)', 1) AS id_param
FROM u
"""


@register("scalar_url", oracle=_URL_ORACLE, tags=("scalars",))
def q_scalar_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition — the first transform of every web-corpus
    pipeline (host for per-domain quality priors and robots rules,
    path/query for canonicalization before URL dedup). Spark's native
    parse_url runs per component JVM-side; URLs are synthesized
    deterministically from documents columns (the corpus has no real
    ones), and the oracle re-derives each component with regexes, so
    the check pins Spark's parse_url semantics on these shapes to the
    grammar, not to another engine's URL parser."""
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/corpus/"),
        F.col("lang"),
        F.lit("/doc?id="),
        F.col("doc_id").cast("string"),
        F.lit("&v=2"),
    )
    u = docs.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        "url",
        F.lower(F.parse_url("url", F.lit("PROTOCOL"))).alias("protocol"),
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("id")).alias("id_param"),
    )
