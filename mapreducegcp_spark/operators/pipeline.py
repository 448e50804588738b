"""End-to-end corpus-cleaning pipeline — the composition the individual
LLM-pipeline operators exist for (quality filter -> language slice ->
exact dedup keep-first -> corpus stats), in ONE declarative plan.

The reference could only run one map/reduce pair per job and persist
every intermediate to its KV store (Master/Master.py:61-94); here the
whole pipeline is a single Catalyst plan — no materialization between
stages, filters fused into the scan, one shuffle for the dedup and one
for the final rollup.

Scale: the quality/language filters run map-side and cut the corpus
before the only wide operations; the dedup shuffle key is a sha256
digest (uniform); the rollup is low-cardinality. At 100 TB this plan
reads the text column once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mapreducegcp_spark.functions.text import TOKEN_ORACLE_EXPR, tokens
from mapreducegcp_spark.registry import register
from mapreducegcp_spark.sources.catalog import load_table

MIN_TOKENS = 20

_TOKS = f"list_filter({TOKEN_ORACLE_EXPR.format(col='text')}, t -> t <> '')"

_PIPELINE_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, source, lang, text, len({_TOKS}) AS n_tokens
  FROM documents
),
kept AS (
  SELECT * FROM scored WHERE n_tokens >= {MIN_TOKENS} AND lang = 'en'
),
dedup AS (
  SELECT *, row_number() OVER (
           PARTITION BY sha256(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
           ORDER BY doc_id) AS rn
  FROM kept
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(n_tokens) AS DOUBLE) / count(*) AS avg_tokens
FROM dedup
WHERE rn = 1
GROUP BY source
"""


@register("pipeline_corpus_clean", oracle=_PIPELINE_ORACLE, tags=("llm-pipeline",))
def q_pipeline_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter (>=20 tokens) -> English slice -> exact dedup on
    normalized text (keep lowest doc_id) -> per-source corpus stats.
    One plan, two shuffles (dedup window, final rollup)."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "source", "lang", "text", F.size(tokens("text")).alias("n_tokens")
    )
    kept = scored.filter((F.col("n_tokens") >= MIN_TOKENS) & (F.col("lang") == "en"))
    norm = F.sha2(F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " "), 256)
    w = Window.partitionBy(norm).orderBy("doc_id")
    deduped = kept.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return deduped.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        (F.sum("n_tokens").cast("double") / F.count("*")).alias("avg_tokens"),
    )
