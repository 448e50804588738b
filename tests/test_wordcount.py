from __future__ import annotations

from mapreducegcp_spark.operators.inverted_index import (
    inverted_index,
    inverted_index_nested,
)
from mapreducegcp_spark.operators.wordcount import word_count
from mapreducegcp_spark.sources.catalog import docs_from_string, load_table


def test_tokenizer_semantics(spark):
    # Reference contract (Worker/Worker.py:11-12): lowercase, every
    # non-alphabetic char is a separator — "Don't" -> "don", "t".
    docs = docs_from_string(spark, "Don't stop 123 ABC abc--abc")
    got = {(r.word, r.cnt) for r in word_count(docs).collect()}
    assert got == {("don", 1), ("t", 1), ("stop", 1), ("abc", 3)}


def test_wordcount_totals(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    wc = word_count(docs)
    rows = wc.collect()
    assert len(rows) > 0
    # total counts must equal total token count
    from pyspark.sql import functions as F

    from mapreducegcp_spark.functions.text import tokens

    n_tokens = docs.select(
        F.sum(F.size(tokens("text"))).alias("n")
    ).collect()[0].n
    assert sum(r.cnt for r in rows) == n_tokens


def test_inverted_index_counts_per_doc(spark):
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "b b c")], "doc_id long, text string"
    )
    got = {(r.word, r.doc_id, r.cnt) for r in inverted_index(docs).collect()}
    assert got == {("a", 1, 2), ("b", 1, 1), ("b", 2, 2), ("c", 2, 1)}


def test_inverted_index_nested_shape(spark):
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "b b c")], "doc_id long, text string"
    )
    rows = {r.word: r.postings for r in inverted_index_nested(docs).collect()}
    assert rows["a"] == {"1": 2}
    assert rows["b"] == {"1": 1, "2": 2}


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs = e.queries()
    oracles = e.oracle_sql()
    assert "wordcount" in qs and "wordcount" in oracles
    assert set(oracles) <= set(qs)
