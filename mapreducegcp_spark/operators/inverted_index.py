"""InvertedIndex — the reference's second built-in application.

Reference: ``InvertedIndexMapper`` emits ``(word, filename)`` per token
(Worker/Worker.py:10-16); ``InvertedIndexReducer`` builds
``{word: {filename: occurrence_count}}`` (Worker/Worker.py:30-41) — a
count per (word, file), not just a posting list (SURVEY.md §2.3).

Spark form: the normalized relational table ``(word, doc_id, cnt)`` is
primary (oracle-checkable, joinable, columnar); the nested
``map<doc_id, cnt>`` presentation matches the reference's output shape
via ``map_from_entries(collect_list(struct(...)))``.

Scale: two-key groupBy is a single hash Exchange with map-side partial
aggregation. The nested variant adds one more word-keyed aggregation;
``collect_list`` per word is bounded by corpus doc count per word —
at 100 TB a stop-word's postings map would be huge, so the normalized
table is the scalable form and the nested one is presentation-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducegcp_spark.functions.text import TOKEN_ORACLE_EXPR, words_of
from mapreducegcp_spark.registry import register
from mapreducegcp_spark.sources.catalog import load_table


def inverted_index(docs: DataFrame, doc_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(word, doc_id, cnt) — normalized semantics of Worker/Worker.py:30-41."""
    return (
        docs.select(F.col(doc_col), words_of(text_col).alias("word"))
        .groupBy("word", doc_col)
        .agg(F.count("*").alias("cnt"))
    )


def inverted_index_nested(
    docs: DataFrame, doc_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(word, postings map<string,bigint>) — the reference's literal shape."""
    norm = inverted_index(docs, doc_col, text_col)
    return norm.groupBy("word").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col(doc_col).cast("string"), F.col("cnt")))
        ).alias("postings")
    )


_INVERTED_ORACLE = f"""
SELECT word, doc_id, count(*) AS cnt
FROM (
  SELECT doc_id, unnest({TOKEN_ORACLE_EXPR.format(col='text')}) AS word
  FROM documents
)
WHERE word <> ''
GROUP BY word, doc_id
"""


@register("inverted_index", oracle=_INVERTED_ORACLE, tags=("reference-parity",))
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    return inverted_index(load_table(spark, sf_dir, "documents"))


_NESTED_ORACLE = f"""
WITH norm AS (
  SELECT word, doc_id, count(*) AS cnt
  FROM (
    SELECT doc_id, unnest({TOKEN_ORACLE_EXPR.format(col='text')}) AS word
    FROM documents
  )
  WHERE word <> ''
  GROUP BY word, doc_id
)
SELECT word,
       to_json(map_from_entries(list_sort(
         list({{'key': CAST(doc_id AS VARCHAR), 'value': cnt}})
       ))) AS postings_json
FROM norm GROUP BY word
"""


@register("inverted_index_nested", oracle=_NESTED_ORACLE, tags=("reference-parity",))
def q_inverted_index_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested postings-map output, serialized as canonical JSON with
    entries sorted by (string) doc key — both engines emit the byte-
    identical ``{"doc":cnt,...}`` string, which upgrades the
    reference's literal ``{word: {filename: count}}`` shape from a
    rows-only check to a full value-hash oracle. The raw MapType
    presentation stays available via ``inverted_index_nested()``."""
    norm = inverted_index(load_table(spark, sf_dir, "documents"))
    entries = F.sort_array(
        F.collect_list(
            F.struct(
                F.col("doc_id").cast("string").alias("key"),
                F.col("cnt").alias("value"),
            )
        )
    )
    return norm.groupBy("word").agg(
        F.to_json(F.map_from_entries(entries)).alias("postings_json")
    )
