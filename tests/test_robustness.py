"""Edge-input behavior and observability.

Operators must degrade to empty/NULL results — never throw — when a
filter leaves nothing behind, and pipelines expose row-level metrics
through the Observation API without a second pass over the data.
"""

from pyspark.sql import Observation
from pyspark.sql import functions as F

from mapreducegcp_spark.registry import all_queries
from mapreducegcp_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


def _empty_docs(spark):
    return (
        load_table(spark, SF_DIR, "documents").filter(F.lit(False))
    )


def test_wordcount_on_empty_corpus(spark, monkeypatch):
    import mapreducegcp_spark.operators.wordcount as wc

    empty = _empty_docs(spark)
    monkeypatch.setattr(wc, "load_table", lambda *a, **k: empty)
    assert all_queries()["wordcount"].fn(spark, SF_DIR).count() == 0


def test_jaccard_on_empty_corpus(spark, monkeypatch):
    import mapreducegcp_spark.operators.dedup as dd

    empty = _empty_docs(spark)
    monkeypatch.setattr(dd, "load_table", lambda *a, **k: empty)
    assert all_queries()["dedup_ngram_jaccard"].fn(spark, SF_DIR).count() == 0


def test_asof_with_no_clicks(spark, monkeypatch):
    import mapreducegcp_spark.operators.timeseries as ts

    ev = load_table(spark, SF_DIR, "events").filter(F.col("event_type") != "click")
    monkeypatch.setattr(ts, "load_table", lambda *a, **k: ev)
    out = all_queries()["asof_join_last_click"].fn(spark, SF_DIR)
    rows = out.collect()
    assert rows  # purchases still present
    assert all(r.last_click_us is None and r.gap_us is None for r in rows)


def test_observe_emits_metrics_without_second_pass(spark):
    # Observation metrics ride the same action as the result — the
    # pattern for row-count / quality accounting in production sinks
    docs = load_table(spark, SF_DIR, "documents")
    obs = Observation("corpus")
    observed = docs.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.length("text")).alias("n_chars"),
    )
    kept = observed.filter(F.col("lang") == "en").count()
    assert obs.get["n_rows"] == docs.count()
    assert obs.get["n_chars"] > 0
    assert 0 < kept <= obs.get["n_rows"]
