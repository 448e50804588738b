"""WordCount — the reference's first built-in application.

Reference dataflow (SURVEY.md §3.1): chunk the corpus, run
``WordCountMapper`` emitting ``(word, 1)`` per token
(Worker/Worker.py:20-26), hash-shuffle on the master
(Master/Master.py:130-163), then ``WordCountReducer`` counting pairs per
key (Worker/Worker.py:45-49).

Spark dataflow: one declarative plan — scan -> tokenize/explode ->
groupBy(word).count — compiled by Catalyst into two stages with a single
Exchange. Map-side partial aggregation (HashAggregate partial -> final)
gives the combiner the reference never had, so shuffle volume is
O(distinct words per partition), not O(tokens): the property that makes
this survive 100 TB of text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducegcp_spark.functions.text import (
    TOKEN_ORACLE_EXPR,
    TOKEN_UNICODE_ORACLE_EXPR,
    tokens_unicode,
    words_of,
)
from mapreducegcp_spark.registry import register
from mapreducegcp_spark.sources.catalog import load_table


def word_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) — semantics of Worker/Worker.py:45-49."""
    return (
        docs.select(words_of(text_col).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


_WORDCOUNT_ORACLE = f"""
SELECT word, count(*) AS cnt
FROM (SELECT unnest({TOKEN_ORACLE_EXPR.format(col='text')}) AS word FROM documents)
WHERE word <> ''
GROUP BY word
"""


@register("wordcount", oracle=_WORDCOUNT_ORACLE, tags=("reference-parity",))
def q_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    return word_count(load_table(spark, sf_dir, "documents"))


_DOC_WORDCOUNT_ORACLE = f"""
SELECT doc_id, count(*) AS n_tokens, count(DISTINCT word) AS n_distinct
FROM (
  SELECT doc_id, unnest({TOKEN_ORACLE_EXPR.format(col='text')}) AS word
  FROM documents
)
WHERE word <> ''
GROUP BY doc_id
"""


@register("wordcount_per_doc", oracle=_DOC_WORDCOUNT_ORACLE, tags=("reference-parity",))
def q_wordcount_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token totals per document — the per-chunk view the reference's
    mapper output files held (Worker/Worker.py:92-93), as a table."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", words_of("text").alias("word"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.countDistinct("word").alias("n_distinct"),
        )
    )


# Non-ASCII fixture derived deterministically from the corpus: both
# engines translate a/e/o -> ä/é/ø BEFORE tokenizing, so the Unicode
# letter class is actually exercised (the ASCII tokenizer would split
# "wörd" into "w" and "rd"). translate() is per-code-point in both.
_UNI_FIXTURE = "translate(text, 'aeo', 'äéø')"
_UNICODE_WORDCOUNT_ORACLE = f"""
SELECT word, count(*) AS cnt
FROM (
  SELECT unnest({TOKEN_UNICODE_ORACLE_EXPR.format(col=_UNI_FIXTURE)}) AS word
  FROM documents
)
WHERE word <> ''
GROUP BY word
"""


@register(
    "wordcount_unicode",
    oracle=_UNICODE_WORDCOUNT_ORACLE,
    tags=("reference-parity",),
)
def q_wordcount_unicode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordCount with the reference's full Unicode ``str.isalpha()``
    tokenizer contract (Worker/Worker.py:11-12), proven on a non-ASCII
    fixture: the corpus is accented (a/e/o -> ä/é/ø) identically in
    both engines, then tokenized with the ``\\p{L}`` letter class —
    hash-matching the DuckDB twin shows the Unicode variant's parity
    is measured, not assumed (SURVEY.md §2.3)."""
    docs = load_table(spark, sf_dir, "documents")
    accented = F.translate("text", "aeo", "äéø")
    return (
        docs.select(F.explode(tokens_unicode(accented)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


@register("wordcount_pandas_api", oracle=_WORDCOUNT_ORACLE, tags=("reference-parity",))
def q_wordcount_pandas_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordCount through the pandas API on Spark — the third API
    surface (DataFrame, SQL, pandas-on-Spark) computing the identical
    result, hash-checked against the same oracle. A pandas user can
    drive this engine with .str/.groupby idioms; everything still
    compiles to the same distributed plans (regex + explode + hash
    aggregate), nothing runs on the driver.

    The regex differs in spelling from functions/text.py (pandas
    .str.replace semantics) but matches the reference tokenizer
    contract exactly: lowercase, [^a-z]+ -> space, drop empties
    (SURVEY.md §2.3)."""
    import os

    import pyspark.pandas as ps

    psdf = ps.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    toks = (
        psdf["text"].str.lower().str.replace(r"[^a-z]+", " ", regex=True).str.split()
    )
    ex = toks.explode().to_frame("word")
    ex = ex[ex["word"].notna() & (ex["word"] != "")]
    counts = ex.groupby("word").size().to_frame("cnt").reset_index()
    return counts.to_spark().select("word", F.col("cnt").cast("long").alias("cnt"))
